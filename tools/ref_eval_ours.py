"""Reverse cross-framework check: the REFERENCE evaluates OUR weights.

Exports our trained MT_UBPL EMA teachers (orbax checkpoint -> torch-layout
state_dicts via models/torch_import.export_hourglass) and runs the
reference's own MT_UBPL validation (projects/MT_UBPL.py:355-408, its
dataloader + decode + acc_pck) on them, on the identical split.  The PCK the
reference computes for our weights should match what our validation logged
for the same checkpoint — the export direction of the interop, proven live
end-to-end (the import direction is TORCH_CKPT_EVAL.json).

Usage: python tools/ref_eval_ours.py [our_ckpt_dir] [expected_pck]
Writes REF_EVAL_OURS.json at the repo root.
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ubpl_parity/mt_ubpl"
    expected = float(sys.argv[2]) if len(sys.argv) > 2 else None

    # ---- our side: restore the orbax checkpoint, export both EMA teachers
    import jax
    jax.config.update("jax_platforms", "cpu")   # pure host work
    from ubpl_tpu.train.checkpointing import restore_checkpoint
    from ubpl_tpu.models.torch_import import export_hourglass
    restored, meta = restore_checkpoint(ckpt_dir, best=True)
    if restored is None:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")
    ema_p, ema_s = restored["ema_params"], restored["ema_batch_stats"]
    take = lambda tree, m: jax.tree_util.tree_map(lambda t: np.asarray(t[m]),
                                                  tree)
    sds = [export_hourglass(take(ema_p, m), take(ema_s, m), n_stack=3)
           for m in (0, 1)]
    print(f"[ref_eval_ours] exported 2 EMA teachers from {ckpt_dir} "
          f"(epoch {meta.get('current_epoch')})", flush=True)

    # ---- reference side: shims + data-root rewrites (as tools/ref_run.py)
    import torch
    from ref_run import _install_skimage_shim, _install_openpyxl_stub
    _install_skimage_shim()
    _install_openpyxl_stub()
    sys.path.insert(0, "/root/reference")
    import GLOB as glob
    glob.expr, glob.temp, glob.stat = ("/tmp/ref_expr", "/tmp/ref_temp",
                                       "/tmp/ref_stat")
    for d in (glob.expr, glob.temp, glob.stat):
        os.makedirs(d, exist_ok=True)
    from utils.base.comm import CommUtils

    def json_load(p):
        with open(p, "r") as f:
            raw = f.read().replace("D:/00Data", "/root/reference/data")
        return json.loads(raw)
    CommUtils.json_load = classmethod(lambda cls, p: json_load(p))
    from datasources.mouse import MouseData
    _orig_init = MouseData.__init__

    def _init(self):
        _orig_init(self)
        self.labelPathname = self.labelPathname.replace(
            "D:/00Data", "/root/reference/data")
        self.imgPath = self.imgPath.replace("D:/00Data",
                                            "/root/reference/data")
    MouseData.__init__ = _init
    sys.argv = [sys.argv[0]]

    from projects import MT_UBPL as mod
    result = {}

    def train(trainLoader, models, models_ema, optims, args):
        for b in range(len(models_ema)):
            tsd = {k: torch.from_numpy(np.array(v))
                   for k, v in sds[b].items()}
            models_ema[b].load_state_dict(tsd, strict=True)
            models_ema[b].eval()
        return [0.0] * len(models), [0.0] * len(models), \
            [0.0] * len(models), 0.0

    orig_validate = mod.validate

    def validate(validLoader, models_ema, args):
        out = orig_validate(validLoader, models_ema, args)
        result["accs"] = out[1]
        print(f"[ref_eval_ours] reference-computed PCK: "
              f"t1={out[1][0][-1]:.5f} t2={out[1][1][-1]:.5f} "
              f"ensemble={out[1][-1][-1]:.5f}", flush=True)
        return out

    mod.train = train
    mod.validate = validate
    mod.comm.ckpt_save = lambda *a, **k: None
    mod.exec("MT_UBPL", {"dataSource": "Mouse", "trainCount": 100,
                         "validCount": 500, "labelRatio": 0.3, "epochs": 1})

    ens = float(result["accs"][-1][-1])
    out = {"our_checkpoint": ckpt_dir,
           "reference_computed_pck": [float(a[-1]) for a in result["accs"]],
           "our_logged_pck": expected,
           "delta_ensemble": (None if expected is None
                              else round(ens - expected, 4)),
           "note": "our EMA teachers exported via export_hourglass and "
                   "validated by the REFERENCE'S own pipeline (dataloader + "
                   "decode + acc_pck) on the identical split"}
    with open(os.path.join(REPO, "REF_EVAL_OURS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
