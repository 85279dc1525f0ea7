"""UBPL pseudo-label selection demo on bundled Mouse data.

Trains MT_UBPL briefly, then runs the offline pseudo-labeling loop and
reports selection quality (precision of the selected pseudo keypoints vs the
retained ground truth) — the audit loop the reference keeps kps_test for.

    python tools/pseudo_demo.py [epochs]
"""
import json
import os
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(epochs=30):
    from ubpl_tpu.config import Config
    from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer
    from ubpl_tpu.train.pseudo_loop import PseudoLabelingLoop

    cfg = Config(model="HG3", data_source="Mouse", train_count=100,
                 valid_count=200, label_ratio=0.3, epochs=epochs,
                 cache_dir=os.path.join(REPO, "temp_data"))
    trainer = MTUBPLTrainer(cfg)
    trainer.run()
    loop = PseudoLabelingLoop(trainer, aug_views=3, reliable_pct=0.5,
                              reliable_thr=0.2)
    out = {"epochs": epochs, "rounds": []}
    for r in range(3):
        sel, ens = loop.round(jax.random.PRNGKey(100 + r), apply=(r == 2))
        n_sel = int(sel.sel_counts[-1])
        total = sel.enable.size
        round_info = {
            "selected": n_sel, "total": total,
            "selected_frac": n_sel / total,
            "precision_selected": float(sel.sel_accs[-1]),
            "precision_all": float(np.mean(ens.acc_flags)),
            "mean_err_selected": float(sel.sel_errs[-1]),
            "mean_err_all": float(np.mean(ens.errors)),
        }
        out["rounds"].append(round_info)
        print(f"round {r}: selected {n_sel}/{total} "
              f"({round_info['selected_frac']:.2f}); "
              f"PCK-flag precision selected {round_info['precision_selected']:.3f}"
              f" vs all {round_info['precision_all']:.3f}; "
              f"err selected {round_info['mean_err_selected']:.2f}px"
              f" vs all {round_info['mean_err_all']:.2f}px", flush=True)
    with open(os.path.join(REPO, "PSEUDO_DEMO.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote PSEUDO_DEMO.json")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
