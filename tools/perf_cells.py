"""Measure specific train-step configuration cells on the live chip and
merge them into AUTOTUNE.json (complements tools/autotune.py's standard
sweep with hand-picked combos, e.g. fold_views at the reference's bs=4 or
the bs=64 remat cell that hit a remote-compile 500 in round 3).

    python tools/perf_cells.py bs=4:fold bs=4:fold,scan=8 bs=64:remat

Cell syntax: ``bs=<N>:<knob>[,<knob>...]`` with knobs
``fold | fuse | remat | unroll | nounroll | scan=<k>``.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def parse_cell(spec):
    """Parse ``bs=<N>:<knob>[,...]`` into a FULLY-RESOLVED knob dict.

    Every knob is pinned explicitly (advisor r4): unspecified knobs take
    the same defaults tools/autotune.py measures with, computed from the
    CELL's bs — not from bench.py's UBPL_BENCH_* env fallbacks, which are
    derived from the env BENCH_BS and would make cells incomparable with
    the autotune sweep (e.g. a bs=4 cell silently running scan=1)."""
    head, _, knobstr = spec.partition(":")
    bs = int(head.split("=")[1])
    # autotune-sweep defaults for this bs: scan amortizes dispatch at small
    # batch; unroll=None lets Config auto-pick (unroll at bs>=16)
    kw = {"scan": 8 if bs <= 8 else 1, "fuse": False, "fold": False,
          "unroll": None, "remat": False, "stream": False}
    label_parts = []
    for knob in filter(None, knobstr.split(",")):
        if knob == "fold":
            kw["fold"] = True
        elif knob == "fuse":
            kw["fuse"] = True
        elif knob == "remat":
            kw["remat"] = True
        elif knob == "unroll":
            kw["unroll"] = True
        elif knob == "nounroll":
            kw["unroll"] = False
        elif knob == "stream":
            kw["stream"] = True
        elif knob.startswith("scan="):
            kw["scan"] = int(knob.split("=")[1])
        else:
            raise SystemExit(f"unknown knob {knob!r} in {spec!r}")
        label_parts.append(knob)
    return bs, ",".join(label_parts) or "default", kw


def main():
    specs = sys.argv[1:]
    if not specs:
        raise SystemExit(__doc__)
    art = os.path.join(REPO, "AUTOTUNE.json")
    out = {"device": None, "results": {}, "best": {}}
    if os.path.exists(art):
        with open(art) as f:
            out = json.load(f)
    import time
    import jax
    out["device"] = str(jax.devices()[0].platform)
    for spec in specs:
        bs, label, kw = parse_cell(spec)
        print(f"[perf_cells] measuring bs={bs} {label} ...", flush=True)
        t0 = time.time()
        try:
            v = bench.measure_ours(batch_size=bs, **kw)
            cell = {"img_per_s": round(v, 1),
                    "wall_s": round(time.time() - t0, 1)}
        except Exception as e:  # record the failure; keep other cells
            cell = {"error": repr(e)[:300]}
        cell["knobs"] = kw      # full resolved config, for reproducibility
        print(f"[perf_cells] bs={bs} {label}: {cell}", flush=True)
        out["results"].setdefault(str(bs), {})[label] = cell
        # recompute best from ALL merged rows (tools/autotune.py:73-81 does
        # the same) — comparing only against the stored best leaves a stale
        # higher number if re-measuring the current best config comes in
        # lower or fails (advisor r4)
        rows = out["results"][str(bs)]
        scored = [(c["img_per_s"], lab) for lab, c in rows.items()
                  if "img_per_s" in c]
        if scored:
            v_best, lab_best = max(scored)
            out["best"][str(bs)] = {"config": lab_best,
                                    **rows[lab_best]}
        else:
            out["best"].pop(str(bs), None)
        with open(art, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
