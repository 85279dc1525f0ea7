"""Autotune the train-step composition knobs on the live chip.

The best lowering of the MT_UBPL step depends on batch size and hardware
generation (docs/PERF.md: grouped-conv vmap wins at bs=4, per-branch unroll
at bs>=32, remat targets the bs>=64 activation-memory wall).  This tool
measures every relevant combination on THE ACTUAL device and writes the
winner, so deployments don't inherit another host's defaults.

    python tools/autotune.py [bs ...]        # default: 4 32 64
    python tools/autotune.py --full 32       # also re-try fuse/fold variants

Output: AUTOTUNE.json {device, per-bs results, best config + Config flags}.
Each configuration compiles once (~2-3 min on TPU first-compile), so a
3-batch-size sweep is ~20-40 min of chip time.
"""
import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def candidates(bs, full=False):
    """(label, kwargs) combos worth measuring at this batch size."""
    combos = []
    for unroll, remat in itertools.product((False, True), (False, True)):
        combos.append((f"unroll={int(unroll)},remat={int(remat)}",
                       dict(unroll=unroll, remat=remat)))
    if bs <= 8:
        # dispatch-bound regime: scan variant on the best lowering
        combos.append(("scan=8", dict(scan=8)))
    if full:
        combos.append(("fuse", dict(fuse=True)))
        combos.append(("fold", dict(fold=True)))
    return combos


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv
    sizes = [int(a) for a in args] or [4, 32, 64]
    import jax
    device = str(jax.devices()[0].platform)
    out = {"device": device, "results": {}, "best": {}}
    # merge into prior measurements so re-tuning one batch size (e.g. after
    # a failed cell) doesn't discard the others' rows
    path = os.path.join(REPO, "AUTOTUNE.json")
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        if prior.get("device") == device:
            out["results"].update(prior.get("results", {}))
            out["best"].update(prior.get("best", {}))
    for bs in sizes:
        rows = {}
        for label, kw in candidates(bs, full):
            t0 = time.time()
            try:
                ips = bench.measure_ours(batch_size=bs, **kw)
            except Exception as e:  # OOM etc. — record and continue
                rows[label] = {"error": str(e)[:200]}
                print(f"bs={bs} {label}: FAILED {e}", flush=True)
                continue
            rows[label] = {"img_per_s": round(ips, 1),
                           "wall_s": round(time.time() - t0, 1)}
            print(f"bs={bs} {label}: {ips:.1f} img/s", flush=True)
        # merge rows into any prior measurements for this bs, then recompute
        # best from the MERGED rows — a re-tune where every candidate fails
        # must not leave a stale best citing a row the new results dropped
        merged = dict(out["results"].get(str(bs), {}))
        merged.update(rows)
        out["results"][str(bs)] = merged
        ok = {k: v for k, v in merged.items() if "img_per_s" in v}
        if ok:
            best = max(ok, key=lambda k: ok[k]["img_per_s"])
            out["best"][str(bs)] = {"config": best, **ok[best]}
        else:
            out["best"].pop(str(bs), None)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    for bs, b in out["best"].items():
        print(f"bs={bs}: best {b['config']} @ {b['img_per_s']} img/s")


if __name__ == "__main__":
    main()
