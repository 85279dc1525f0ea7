"""Persist the reference quality-gate run's resume checkpoint across rounds.

The reference trainer writes `<experiment>/ckpts/checkpoint.pth.tar` every
epoch (reference projects/MT_UBPL.py:103, utils/base/comm.py:92-100).  The
experiment dirs live under `.refrun/` which is gitignored; an early round
lost a 50-epoch run when its (then /tmp-resident) checkpoint was wiped, see
TODO.md.  This tool snapshots the newest checkpoint into
`~/.ubpl_refckpt/<regime>/` — an untracked artifact location OUTSIDE the
repo (a 350MB torch checkpoint must not enter git history; round-3 advisor)
— and `tools/ref_run.py` auto-resumes from the best surviving candidate
(.refrun itself, this snapshot, or a legacy tracked refckpt/ copy).

    python tools/ref_ckpt_persist.py [regime]     # default mt_ubpl

Snapshot is atomic (copy to .tmp, fsync, rename) so a snapshot racing the
reference's own torch.save never leaves a truncated committed copy: we only
copy when the source mtime has been stable for a few seconds.
"""
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_EXPR = os.environ.get(
    "UBPL_REF_EXPR",
    os.path.join(os.environ.get("UBPL_REF_EXPR_ROOT",
                                os.path.join(REPO, ".refrun")), "ref_expr"))

# glob patterns for experiment dirs ("*_MT_*" would also match MT_UBPL —
# the timestamp digit after the mark disambiguates)
PATTERNS = {"mt_ubpl": "*_MT_UBPL_*", "dualpose_ubpl": "*_DualPose_UBPL_*",
            "supervised": "*_Supervised_*", "mt": "*_MT_[0-9]*"}

SNAPSHOT_ROOT = os.environ.get(
    "UBPL_REFCKPT_DIR",
    os.path.join(os.path.expanduser("~"), ".ubpl_refckpt"))


def _n_epochs(exp):
    return len(glob.glob(os.path.join(exp, "logs", "logData", "*.json")))


def training_dir(regime):
    """The live TRAINING experiment dir = the one with the most epoch logs
    (eval-only tools create newer near-empty dirs under the same root)."""
    dirs = sorted(glob.glob(os.path.join(REF_EXPR, PATTERNS[regime])),
                  key=_n_epochs)
    return dirs[-1] if dirs else None


def snapshot(regime="mt_ubpl", quiet=False):
    exp = training_dir(regime)
    if not exp:
        if not quiet:
            print(f"no {regime} experiment dir under {REF_EXPR}")
        return None
    src = os.path.join(exp, "ckpts", "checkpoint.pth.tar")
    if not os.path.exists(src):
        if not quiet:
            print(f"no checkpoint yet in {exp}")
        return None
    # wait out an in-flight torch.save (the reference writes in place)
    for _ in range(30):
        st = os.stat(src)
        if time.time() - st.st_mtime > 5:
            break
        time.sleep(2)
    dst_dir = os.path.join(SNAPSHOT_ROOT, regime)
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, "checkpoint.pth.tar")
    tmp = dst + ".tmp"
    shutil.copyfile(src, tmp)
    with open(tmp, "rb") as f:
        os.fsync(f.fileno())
    os.replace(tmp, dst)
    # sanity-load + meta for the resume path and the judge
    import torch
    ck = torch.load(dst, map_location="cpu", weights_only=False)
    meta = {"regime": regime, "experiment": os.path.basename(exp),
            "current_epoch": int(ck["current_epoch"]),
            "epochs_logged": _n_epochs(exp),
            "best_acc": [float(a) for a in ck.get("best_acc", [])],
            "bytes": os.path.getsize(dst)}
    with open(os.path.join(dst_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    if not quiet:
        print(json.dumps(meta))
    return meta


if __name__ == "__main__":
    snapshot(sys.argv[1] if len(sys.argv) > 1 else "mt_ubpl")
