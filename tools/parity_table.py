"""Build the reference-vs-ours epochwise PCK table (RESULTS.md quality gate).

Reads the reference experiment dirs under /tmp/ref_expr (written by
tools/ref_run.py: logData_{e}.json per epoch; full-valid epochs carry real
accs, skipped epochs carry zeros) and PARITY_ours_{regime}.json (written by
tools/parity_run.py), and prints a markdown table per regime.

    python tools/parity_table.py > PARITY_TABLE.md
"""
import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_EXPR = os.environ.get(
    "UBPL_REF_EXPR",
    os.path.join(os.environ.get("UBPL_REF_EXPR_ROOT", "/root/repo/.refrun"),
                 "ref_expr"))


def ref_epochwise(mark, regime):
    """{epoch: pck_mean} for the reference run.  Prefers the committed
    PARITY_ref_{regime}.json artifact (written by tools/harvest_round2.py,
    which selects the TRAINING dir — eval-only tools create newer 1-epoch
    dirs under the same root); falls back to scanning /tmp/ref_expr and
    picking the dir with the MOST epoch logs, never just the newest name."""
    art = os.path.join(REPO, f"PARITY_ref_{regime}.json")
    if os.path.exists(art):
        with open(art) as f:
            d = json.load(f)
        out = {int(e): v["pck_mean"] for e, v in d["per_epoch"].items()
               if "pck_mean" in v}
        if out:
            return out, d.get("experiment")

    def n_epochs(d):
        return len(glob.glob(os.path.join(d, "logs", "logData", "*.json")))
    # "*_MT_*" would also match MT_UBPL dirs; the timestamp digit after the
    # mark disambiguates
    pat = f"*_{mark}_[0-9]*" if mark == "MT" else f"*_{mark}_*"
    dirs = sorted(glob.glob(os.path.join(REF_EXPR, pat)), key=n_epochs)
    if not dirs:
        return {}, None
    exp = dirs[-1]
    out = {}
    for path in glob.glob(os.path.join(exp, "logs", "logData", "*.json")):
        epo = int(os.path.basename(path).split("_")[1].split(".")[0])
        with open(path) as f:
            d = json.load(f)
        accs = d.get("accs") or (d.get("accsArraies") or [[0.0]])[-1]
        pck = accs[-1]
        if pck > 0:
            out[epo] = pck
    return out, os.path.basename(exp)


def ours_epochwise(regime):
    path = os.path.join(REPO, f"PARITY_ours_{regime}.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        d = json.load(f)
    return {int(k): v["pck_mean"] for k, v in d["per_epoch"].items()}


def table(title, ref, ours, ref_exp):
    lines = [f"### {title}", ""]
    if ref_exp:
        lines.append(f"reference run: `{ref_exp}`")
        lines.append("")
    lines.append("| epoch | reference PCK@0.2 | ours PCK@0.2 | delta |")
    lines.append("|---|---|---|---|")
    for e in sorted(set(ref)):
        r = ref.get(e)
        o = ours.get(e)
        d = (f"{o - r:+.4f}" if (r is not None and o is not None) else "-")
        lines.append("| {} | {} | {} | {} |".format(
            e, f"{r:.4f}" if r is not None else "-",
            f"{o:.4f}" if o is not None else "-", d))
    if ours:
        last = max(ours)
        if last not in ref:
            lines.append(f"| {last} (ours final) | - | {ours[last]:.4f} | - |")
    return "\n".join(lines)


def main():
    print("## Quality gate: Mouse 100/0.3, full 500-image validation\n")
    for mark, regime in (("Supervised", "supervised"),
                         ("MT", "mt"),
                         ("MT_UBPL", "mt_ubpl"),
                         ("DualPose_UBPL", "dualpose_ubpl")):
        ref, exp = ref_epochwise(mark, regime)
        ours = ours_epochwise(regime)
        if not ref and not ours:
            continue
        print(table(f"{mark}", ref, ours, exp))
        print()


if __name__ == "__main__":
    main()
