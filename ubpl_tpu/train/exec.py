"""Batch sweep driver (reference projects/exec.py).

Runs all five regime configurations over the {Mouse, FLIC, LSP} x
{trainCount, labelRatio} grid — the reference's de-facto benchmark suite.

    python -m ubpl_tpu.train.exec            # full grid
    python -m ubpl_tpu.train.exec --quick    # 2-epoch smoke over Mouse only
"""
from .supervised import exec_regime as Supervised
from .mean_teacher import exec_regime as MT
from .mt_ubpl import exec_regime as MT_UBPL
from .dualpose_ubpl import exec_regime as DualPose_UBPL

GRID = [["Mouse", 100, 0.3], ["Mouse", 200, 0.15],
        ["FLIC", 100, 0.3], ["FLIC", 200, 0.15],
        ["LSP", 500, 0.2], ["LSP", 500, 0.4]]


def exec_home(grid=None, extra=None):
    from ..utils.preemption import PreemptionGuard
    PreemptionGuard.get()  # SIGTERM -> checkpoint at epoch boundary
    extra = extra or {}
    for data_source, train_count, rate in (grid or GRID):
        base = {"data_source": data_source, "train_count": train_count,
                "label_ratio": rate, **extra}
        Supervised("Supervised", dict(base))
        MT("MT", dict(base))
        MT_UBPL("MT_UBPL", {**base, "fdl_weight_max": 1.0,
                            "fdl_weight_min": 1.0,
                            "use_ensemble_pseudo": True})
        DualPose_UBPL("DualPose", {**base, "fdl_weight_max": 0.0,
                                   "fdl_weight_min": 0.0,
                                   "use_ensemble_pseudo": False})
        DualPose_UBPL("DualPose_UBPL", {**base, "fdl_weight_max": 1.0,
                                        "fdl_weight_min": 1.0,
                                        "use_ensemble_pseudo": True})


if __name__ == "__main__":
    import sys
    if "--quick" in sys.argv:
        exec_home(grid=[["Mouse", 24, 0.5]],
                  extra={"epochs": 2, "valid_count": 16, "model": "HG2"})
    else:
        exec_home()
