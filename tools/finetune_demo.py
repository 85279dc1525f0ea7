"""Fine-tune a REFERENCE-trained checkpoint inside this framework.

Continues the reference's own MT_UBPL training (epoch-19 checkpoint,
ensemble PCK 0.198 on the identical Mouse 100/0.3 split) here via
Config.torch_init, with full 500-image validation every epoch — the PCK
curve should continue climbing from where the reference left it, which is
end-to-end evidence the imported weights are semantically live (not just
forward-parity on fixed inputs).

Note: schedules restart at epoch 0 (the reference pins start_epoch=0 the
same way, projects/supervised.py:30): the consistency/pseudo ramps re-ramp
over the first 5 epochs and the EMA teacher re-seeds from the (imported)
student at step 1.

Usage: python tools/finetune_demo.py [epochs] [ckpt]
Writes FINETUNE_DEMO.json at the repo root.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ckpt = sys.argv[2] if len(sys.argv) > 2 else \
        "/tmp/ref_ckpt_mt_ubpl_e19.pth.tar"
    from parity_run import pin_reference_split
    from ubpl_tpu.config import Config
    from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer

    cfg = Config(model="HG3", data_source="Mouse", train_count=100,
                 valid_count=500, label_ratio=0.3, epochs=epochs,
                 torch_init=ckpt, cache_dir=pin_reference_split())
    base = "/tmp/ubpl_finetune_demo"
    import shutil
    shutil.rmtree(base, ignore_errors=True)
    trainer = MTUBPLTrainer(cfg)
    trainer.run(base)

    out = {"checkpoint": ckpt, "source": "reference MT_UBPL epoch 19, "
           "ensemble PCK 0.1980 (its own log)", "epochs_here": epochs,
           "per_epoch_pck": {}}
    log_dir = os.path.join(base, "logs", "logData")
    for name in sorted(os.listdir(log_dir),
                       key=lambda s: int(s.split("_")[1].split(".")[0])):
        epo = int(name.split("_")[1].split(".")[0])
        with open(os.path.join(log_dir, name)) as f:
            d = json.load(f)
        out["per_epoch_pck"][str(epo)] = d["accs"][-1][-1]
    with open(os.path.join(REPO, "FINETUNE_DEMO.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["per_epoch_pck"], indent=1))


if __name__ == "__main__":
    main()
