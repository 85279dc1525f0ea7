"""Training-quality demonstration on bundled Mouse data.

Runs the reference's first grid cell (Mouse, trainCount=100, labelRatio=0.3,
validCount=500) for a configurable number of epochs with the reference
hyper-parameters and records per-epoch PCK@0.2 to TRAIN_DEMO_<regime>.json.

    python tools/train_demo.py supervised 50
    python tools/train_demo.py mt_ubpl 30
    python tools/train_demo.py mt_ubpl 30 2 10   # + 2 UBPL rounds, every 10
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    regime = sys.argv[1] if len(sys.argv) > 1 else "supervised"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    pseudo_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    pseudo_interval = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    from ubpl_tpu.config import Config
    cfg = Config(model="HG3", data_source="Mouse", train_count=100,
                 valid_count=500, label_ratio=0.3, epochs=epochs,
                 pseudo_rounds=pseudo_rounds, pseudo_interval=pseudo_interval,
                 cache_dir=os.path.join(REPO, "temp_data"))
    if regime == "supervised":
        from ubpl_tpu.train.supervised import SupervisedTrainer as T
    elif regime == "mt":
        from ubpl_tpu.train.mean_teacher import MeanTeacherTrainer as T
    elif regime == "mt_ubpl":
        from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer as T
    elif regime == "dualpose_ubpl":
        from ubpl_tpu.train.dualpose_ubpl import DualPoseUBPLTrainer as T
        cfg.scale_range_ema, cfg.rot_range_ema = 0.05, 5.0
    else:
        raise SystemExit(f"unknown regime {regime}")
    t0 = time.time()
    trainer = T(cfg)
    # base_path => per-epoch logData written as the run progresses, so a
    # wall-clock-cut run is still harvestable; UBPL_DEMO_RESUME=1 continues
    # a cut run from its latest checkpoint (restores pseudo-round state too)
    suffix = f"{regime}_pseudo" if pseudo_rounds else regime
    base = f"/tmp/ubpl_demo/{suffix}"
    resume = os.environ.get("UBPL_DEMO_RESUME") == "1"
    history = trainer.run(base, resume=resume)
    # rebuild the full curve from the per-epoch logData files so a resumed
    # run reports all epochs, not just the post-resume ones
    log_dir = os.path.join(base, "logs", "logData")
    curve = []
    if os.path.isdir(log_dir):
        for epo in range(cfg.epochs):
            fn = os.path.join(log_dir, f"logData_{epo}.json")
            if not os.path.isfile(fn):
                break
            with open(fn) as f:
                curve.append(json.load(f)["accs"][-1][-1])
    else:
        curve = [h["accs"][-1][-1] for h in history]
    out = {
        "regime": regime, "epochs": epochs,
        "best_acc": trainer.best_acc, "best_epoch": trainer.best_epoch,
        "final_accs": history[-1]["accs"] if history else None,
        "acc_curve": curve,
        "resumed": resume,
        "wallclock_s": time.time() - t0,
    }
    if pseudo_rounds:
        out["pseudo_rounds"] = trainer._pseudo_rounds_done
        rounds_dir = f"/tmp/ubpl_demo/{suffix}/logs/pseudoRounds"
        if os.path.isdir(rounds_dir):
            out["rounds"] = {}
            for fn in sorted(os.listdir(rounds_dir)):
                with open(os.path.join(rounds_dir, fn)) as f:
                    out["rounds"][fn] = json.load(f)
    path = os.path.join(REPO, f"TRAIN_DEMO_{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    print("best acc:", trainer.best_acc)


if __name__ == "__main__":
    main()
