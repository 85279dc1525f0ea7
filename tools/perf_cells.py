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
    head, _, knobstr = spec.partition(":")
    bs = int(head.split("=")[1])
    kw = {}
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
            cell = {"img_per_s": round(v, 1), "wall_s": round(time.time() - t0, 1)}
        except Exception as e:  # record the failure; keep other cells
            cell = {"error": repr(e)[:300]}
        print(f"[perf_cells] bs={bs} {label}: {cell}", flush=True)
        out["results"].setdefault(str(bs), {})[label] = cell
        best = out["best"].get(str(bs))
        if "img_per_s" in cell and (not best
                                    or cell["img_per_s"] > best["img_per_s"]):
            out["best"][str(bs)] = {"config": label, **cell}
        with open(art, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
