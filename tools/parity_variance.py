"""Quantify reference run-to-run variance vs the ours-vs-reference delta.

The parity gate (RESULTS.md) compares epochwise full-valid PCK between the
reference (torch CPU) and this framework on the Mouse 100/0.3 cell.  A
natural question is what delta counts as "parity": two independent runs of
the REFERENCE itself differ by seed + augmentation-RNG noise, and an
ours-vs-reference gap within that band is indistinguishable from rerunning
the reference.  The /tmp wipe that forced a second reference run (TODO.md)
gives us exactly that band for free.

Reads PARITY_ref_<regime>_runs.json (tools/harvest_round2.py) and
PARITY_ours_<regime>.json, prints per-epoch columns for every run plus
summary stats:

    python tools/parity_variance.py [regime]
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(regime):
    with open(os.path.join(REPO, f"PARITY_ref_{regime}_runs.json")) as f:
        art = json.load(f)
    runs, continuations = art["runs"], art.get("continuations", {})
    ref = {}
    for name, per in sorted(runs.items()):
        pts = {int(e): v["pck_mean"] for e, v in per.items()
               if "pck_mean" in v}
        if pts:
            ref[name] = pts
    ours_path = os.path.join(REPO, f"PARITY_ours_{regime}.json")
    ours = {}
    if os.path.exists(ours_path):
        with open(ours_path) as f:
            ours = {int(e): v["pck_mean"]
                    for e, v in json.load(f)["per_epoch"].items()}
    return ref, ours, continuations


def main():
    regime = sys.argv[1] if len(sys.argv) > 1 else "mt_ubpl"
    ref, ours, continuations = load(regime)
    names = list(ref)
    print(f"### {regime}: reference seed-variance vs ours "
          f"({len(names)} reference runs)\n")
    for name, rec in continuations.items():
        if isinstance(rec, dict) and rec.get("merged_into"):
            print(f"NOTE: `{name}` is a checkpoint-resumed extension of "
                  f"`{rec['merged_into']}` from epoch {rec['start']} "
                  "(harvest merged them into one logical run).\n")
        elif name in names:
            print(f"NOTE: `{name}` resumed from an earlier run's checkpoint "
                  f"at epoch {rec}; its deltas against the "
                  "parent measure augmentation-RNG variance from a shared "
                  "prefix (a LOWER bound on independent-seed variance).\n")
    header = ["epoch"] + [f"ref run{i+1}" for i in range(len(names))] + \
             ["ours", "|ref1-ref2|", "|ours-ref1|"]
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    all_epochs = sorted(set().union(*[set(r) for r in ref.values()]))
    rr, ro = [], []
    for e in all_epochs:
        vals = [ref[n].get(e) for n in names]
        o = ours.get(e)
        cells = [str(e)] + [f"{v:.4f}" if v is not None else "-"
                            for v in vals]
        cells.append(f"{o:.4f}" if o is not None else "-")
        if len(vals) >= 2 and None not in vals[:2]:
            d = abs(vals[0] - vals[1])
            rr.append(d)
            cells.append(f"{d:.4f}")
        else:
            cells.append("-")
        if o is not None and vals[0] is not None:
            d = abs(o - vals[0])
            ro.append(d)
            cells.append(f"{d:.4f}")
        else:
            cells.append("-")
        print("| " + " | ".join(cells) + " |")
    print()
    if rr:
        print(f"reference run-to-run |delta|: mean {np.mean(rr):.4f}, "
              f"max {np.max(rr):.4f}  (n={len(rr)} shared epochs)")
    if ro:
        print(f"ours-vs-reference |delta|:   mean {np.mean(ro):.4f}, "
              f"max {np.max(ro):.4f}  (n={len(ro)} shared epochs)")
    if rr and ro:
        verdict = ("WITHIN" if np.mean(ro) <= np.mean(rr) * 1.5
                   else "ABOVE")
        band = ("run-to-run noise band (shared-prefix continuation — a "
                "lower bound on independent-seed noise)"
                if any(n in continuations for n in names)
                else "own seed-noise band")
        print(f"\nours-vs-reference mean delta is {verdict} the reference's "
              f"{band}")


if __name__ == "__main__":
    main()
