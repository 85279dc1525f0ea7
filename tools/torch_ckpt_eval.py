"""Cross-framework checkpoint parity: evaluate a REFERENCE-trained MT_UBPL
checkpoint inside THIS framework and compare PCK to the values the reference
itself logged for those weights.

Loads a reference ckpts/checkpoint.pth.tar (projects/MT_UBPL.py:96-103),
imports both EMA teachers via ubpl_tpu.models.torch_import, stacks them as
our dual-branch state, and runs our full validation (identical Mouse
100/500/0.3 split via the byte-compatible cache) — the reference's
checkpointed best_acc [teacher1, teacher2, ensemble] should be reproduced
by our decode+PCK pipeline to within float/resize tolerance.

Usage: python tools/torch_ckpt_eval.py [ckpt_path]
Writes TORCH_CKPT_EVAL.json at the repo root.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/ref_ckpt_mt_ubpl_e19.pth.tar"
    import jax
    if os.environ.get("UBPL_EVAL_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from parity_run import pin_reference_split
    from ubpl_tpu.config import Config
    from ubpl_tpu.models.torch_import import load_reference_checkpoint
    from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer

    p1, s1, meta = load_reference_checkpoint(path, n_stack=3, branch=1)
    p2, s2, _ = load_reference_checkpoint(path, n_stack=3, branch=2)
    stack = lambda a, b: jax.tree_util.tree_map(
        lambda x, y: jnp.stack([jnp.asarray(x), jnp.asarray(y)]), a, b)

    cfg = Config(model="HG3", data_source="Mouse", train_count=100,
                 valid_count=500, label_ratio=0.3, epochs=1,
                 compute_dtype="float32", cache_dir=pin_reference_split())
    trainer = MTUBPLTrainer(cfg)
    trainer.state = trainer.state._replace(
        ema_params=stack(p1, p2), ema_batch_stats=stack(s1, s2))
    _, accs, errs = trainer.validate()

    ref_best = [float(a) for a in (meta["best_acc"] or [])]
    ours = [float(a[-1]) for a in accs]   # [teacher1, teacher2, ensemble]
    out = {"checkpoint": path, "source_epoch": meta["current_epoch"],
           "reference_logged_pck": ref_best,
           "ours_recomputed_pck": ours,
           "deltas": [round(o - r, 4) for o, r in zip(ours, ref_best)],
           "err_means": [float(e[-1]) for e in errs],
           "note": "reference EMA teachers imported via "
                   "ubpl_tpu.models.torch_import and validated by OUR "
                   "pipeline (decode+PCK golden-matched) on the identical "
                   "split/valid set"}
    with open(os.path.join(REPO, "TORCH_CKPT_EVAL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
