"""Ours-vs-reference supervised comparison on the identical split.

Trains our supervised HG3 on the reference's shipped Mouse_100_500_0.3 split
cache (temp_data JSON format is byte-compatible), evaluating PCK@0.2 on the
same fixed 48-image validation subset at the same epochs as
tools' reference-side run (tools/ref notes), writing COMPARE_ours.json.
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(epochs=40, eval_every=10, valid_n=48):
    import jax.numpy as jnp
    from ubpl_tpu.config import Config
    from ubpl_tpu.train.supervised import SupervisedTrainer
    from ubpl_tpu.train.common import update_pck_counters
    from ubpl_tpu.train import losses as L

    # pin OUR split to the reference's shipped cache (identical data), with
    # its hardcoded Windows roots rewritten to the bundled data location
    cache_dir = "/tmp/ubpl_compare_cache"
    os.makedirs(cache_dir, exist_ok=True)
    ref_cache = "/root/reference/datasources/temp_data/Mouse_100_500_0.3.json"
    with open(ref_cache) as f:
        raw = f.read().replace("D:/00Data", "/root/reference/data")
    with open(os.path.join(cache_dir, "Mouse_100_500_0.3.json"), "w") as f:
        f.write(raw)

    cfg = Config(model="HG3", data_source="Mouse", train_count=100,
                 valid_count=500, label_ratio=0.3, epochs=epochs,
                 cache_dir=cache_dir)
    trainer = SupervisedTrainer(cfg)

    def eval_subset():
        acc_c, err_c = L.AvgCounters(), L.AvgCounters()
        k = cfg.kps_count
        for lo in range(0, valid_n, 16):
            idxs = jnp.arange(lo, min(lo + 16, valid_n))
            imgs = trainer.valid_data.images[idxs]
            kps = trainer.valid_data.kps[idxs]
            coords, scores, errs, accs = trainer.validate_step(
                trainer.state.params, trainer.state.batch_stats, imgs, kps)
            update_pck_counters(acc_c, err_c, np.asarray(accs),
                                np.asarray(errs), int(idxs.shape[0]), k)
        return acc_c.avg()[-1]

    out = {"losses": [], "pck": {}}
    for epo in range(epochs):
        losses = trainer.train_epoch(epo, {})
        out["losses"].append(losses["pec_loss"])
        if (epo + 1) % eval_every == 0:
            out["pck"][str(epo + 1)] = eval_subset()
            print(f"epoch {epo + 1}: loss={losses['pec_loss']:.4f} "
                  f"pck={out['pck']}", flush=True)
        with open(os.path.join(REPO, "COMPARE_ours.json"), "w") as f:
            json.dump(out, f)
    print("DONE", out["pck"])


if __name__ == "__main__":
    main()
