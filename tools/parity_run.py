"""Ours side of the quality-gate table: full-length runs on the reference's
exact split (shipped temp_data cache, byte-compatible format) with full
500-image validation, mirroring tools/ref_run.py on the reference side.

Writes PARITY_ours_{regime}.json at the repo root with epochwise losses and
full-valid-set PCK (per-joint + mean), harvested from the trainer's own
logData files.

Usage: python tools/parity_run.py {supervised|mt|mt_ubpl|dualpose_ubpl}
       [epochs] [--resume]
       python tools/parity_run.py {regime} --harvest   # mid-run snapshot

--harvest rebuilds PARITY_ours_{regime}.json from whatever logData epochs the
(possibly still-running) trainer has written so far, so partial runs survive
a round boundary (the run dir itself is gitignored).

The run dir defaults to a repo-local gitignored root (UBPL_PARITY_ROOT,
default /root/repo/.parityrun) — /tmp is wiped across driver restarts and
has already cost one full ours-side DualPose run (TODO.md).
"""
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def pin_reference_split(cache_dir="/tmp/ubpl_parity_cache"):
    """Copy the reference's shipped Mouse_100_500_0.3 split cache (identical
    data records) with its Windows data roots rewritten to the bundled data."""
    os.makedirs(cache_dir, exist_ok=True)
    ref_cache = "/root/reference/datasources/temp_data/Mouse_100_500_0.3.json"
    with open(ref_cache) as f:
        raw = f.read().replace("D:/00Data", "/root/reference/data")
    with open(os.path.join(cache_dir, "Mouse_100_500_0.3.json"), "w") as f:
        f.write(raw)
    return cache_dir


def main():
    argv = sys.argv[1:]
    resume = "--resume" in argv
    argv = [a for a in argv if a != "--resume"]
    regime = argv[0] if argv else "supervised"
    epochs = int(argv[1]) if len(argv) > 1 else 100

    from ubpl_tpu.config import Config
    cache_dir = pin_reference_split()
    root = os.environ.get("UBPL_PARITY_ROOT", "/root/repo/.parityrun")
    base_path = os.path.join(root, regime)
    if not resume:
        shutil.rmtree(base_path, ignore_errors=True)

    extra = {}
    if regime == "dualpose_ubpl":
        # reference DualPose_UBPL weak-teacher-view defaults
        # (reference projects/DualPose_UBPL.py:420-421); Config's own
        # defaults are the MT-style 0.25/30.0
        extra = dict(scale_range_ema=0.05, rot_range_ema=5.0)
    cfg = Config(model="HG3", data_source="Mouse", train_count=100,
                 valid_count=500, label_ratio=0.3, epochs=epochs,
                 cache_dir=cache_dir, **extra)
    if regime == "supervised":
        from ubpl_tpu.train.supervised import SupervisedTrainer as Trainer
    elif regime == "mt":
        from ubpl_tpu.train.mean_teacher import MeanTeacherTrainer as Trainer
    elif regime == "mt_ubpl":
        from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer as Trainer
    elif regime == "dualpose_ubpl":
        from ubpl_tpu.train.dualpose_ubpl import DualPoseUBPLTrainer as Trainer
    else:
        raise SystemExit(f"unknown regime {regime}")

    trainer = Trainer(cfg)
    trainer.run(base_path, resume=resume)
    harvest(regime, base_path, epochs)


def harvest(regime, base_path, epochs=None):
    """Build PARITY_ours_{regime}.json from the run's logData epochs written
    so far.  Safe to call while the trainer is still running.  Never shrinks
    the committed artifact (a fresh restart of the run must not clobber a
    deeper previously-harvested one)."""
    out = {"regime": regime, "split": "Mouse_100_500_0.3",
           "valid_n": 500, "per_epoch": {}}
    if epochs is not None:
        out["epochs"] = epochs
    log_dir = os.path.join(base_path, "logs", "logData")
    if not os.path.isdir(log_dir):
        print(f"harvest {regime}: no logData at {log_dir}")
        return
    for name in sorted(os.listdir(log_dir),
                       key=lambda s: int(s.split("_")[1].split(".")[0])):
        epo = int(name.split("_")[1].split(".")[0])
        try:
            with open(os.path.join(log_dir, name)) as f:
                d = json.load(f)
        except ValueError:
            continue  # epoch file mid-write by the live trainer
        entry = {k: v for k, v in d.items() if k not in ("accs", "errs")}
        # accs/errs: [head][k+1]; last head is the selection head (ensemble
        # mean for MT_UBPL, the model itself for supervised)
        entry["pck_mean"] = d["accs"][-1][-1]
        entry["err_mean"] = d["errs"][-1][-1]
        entry["pck_per_joint"] = d["accs"][-1][:-1]
        out["per_epoch"][str(epo)] = entry
    if not out["per_epoch"]:
        print(f"harvest {regime}: no completed epochs yet")
        return
    art = os.path.join(REPO, f"PARITY_ours_{regime}.json")
    if os.path.exists(art):
        with open(art) as f:
            old = json.load(f).get("per_epoch", {})
        if len(old) > len(out["per_epoch"]):
            print(f"harvest {regime}: keeping committed artifact "
                  f"({len(old)} epochs > harvested {len(out['per_epoch'])})")
            return
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    final = out["per_epoch"][str(max(int(k) for k in out["per_epoch"]))]
    print("harvested", regime, len(out["per_epoch"]), "epochs; last PCK(mean) =",
          final["pck_mean"])


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "--harvest":
        _regime = sys.argv[1]
        _root = os.environ.get("UBPL_PARITY_ROOT", "/root/repo/.parityrun")
        harvest(_regime, os.path.join(_root, _regime))
    else:
        main()
