"""Benchmark: MT_UBPL training throughput (images/sec/chip).

Runs the flagship fused MT_UBPL step (HG3, 2 branches x 2 views, full
on-device augmentation + target synthesis) on the default JAX device and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Baseline: the reference PyTorch implementation measured on this machine's
CPU (torch wheels here are CPU-only; no CUDA device exists in this
environment).  The first run measures it and caches to BENCH_BASELINE.json;
see BASELINE.md for the caveat that the reference's intended hardware is a
single CUDA GPU.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")

BENCH_BS = int(os.environ.get("UBPL_BENCH_BS", "32"))
BENCH_STEPS = int(os.environ.get("UBPL_BENCH_STEPS", "20"))
# small-batch steps are dispatch-bound as single device calls; scan k of them
# per call (Config.scan_batches)
BENCH_SCAN = int(os.environ.get("UBPL_BENCH_SCAN",
                                "8" if BENCH_BS <= 8 else "1"))
# default follows Config.fuse_teacher_forward (off: measured 40% slower on
# v5e — docs/PERF.md round-2 A/B); set UBPL_BENCH_FUSE=1 to re-measure
BENCH_FUSE = os.environ.get("UBPL_BENCH_FUSE", "0") == "1"
BENCH_FOLD = os.environ.get("UBPL_BENCH_FOLD", "0") == "1"
# unset = Config auto (unroll at bs>=16); "1"/"0" force on/off for A/B
_unroll_env = os.environ.get("UBPL_BENCH_UNROLL")
BENCH_UNROLL = None if _unroll_env is None else _unroll_env == "1"
# remat the training forward (Config.remat) — targets bs>=64 activation
# memory pressure; set UBPL_BENCH_REMAT=1 to A/B
BENCH_REMAT = os.environ.get("UBPL_BENCH_REMAT", "0") == "1"
# lax.scan the branch ensemble (Config.scan_branches): per-branch fwd/bwd
# body compiled once — ~2x smaller program than unroll at the same
# full-rate convs; set UBPL_BENCH_SCANBR=0 to A/B against unroll
BENCH_SCANBR = os.environ.get("UBPL_BENCH_SCANBR", "0") == "1"
# stream_data (host-resident training set, per-batch H2D with one-batch
# prefetch) — set UBPL_BENCH_STREAM=1 to measure the streaming path's
# overhead vs the HBM-resident gather (quantifies the prefetch overlap)
BENCH_STREAM = os.environ.get("UBPL_BENCH_STREAM", "0") == "1"


_UNSET = object()

_T0 = time.perf_counter()


def _phase(name):
    """Wall-clock phase marker on stderr (stdout carries only the JSON
    line the driver parses).  Lets a timed-out driver run's log tail show
    WHERE the budget went (remote compile vs data staging vs steps)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {name}",
          file=sys.stderr, flush=True)


def measure_ours(batch_size=BENCH_BS, steps=BENCH_STEPS, scan=BENCH_SCAN,
                 fuse=None, fold=None, unroll=_UNSET, remat=None,
                 stream=None, scanbr=None):
    """Measure the MT_UBPL train step (img/s).  Knobs default to the
    UBPL_BENCH_* env settings; tools/autotune.py passes them explicitly."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ubpl_tpu.config import Config
    from ubpl_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()
    from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer

    fuse = BENCH_FUSE if fuse is None else fuse
    fold = BENCH_FOLD if fold is None else fold
    unroll = BENCH_UNROLL if unroll is _UNSET else unroll
    remat = BENCH_REMAT if remat is None else remat
    stream = BENCH_STREAM if stream is None else stream
    scanbr = BENCH_SCANBR if scanbr is None else scanbr
    if stream:
        scan = 1   # stream_data excludes scan_batches>1
    cfg = Config(model="HG3", synthetic_data=True, synthetic_kps=9,
                 inp_res=256, out_res=64,
                 # 2x batch is enough index variety for a throughput
                 # measurement; halving the staged dataset halves the H2D
                 # upload through the ~0.5 MB/s tunnel (docs/PERF.md r5)
                 train_count=max(2 * batch_size, 64),
                 valid_count=8, label_ratio=0.5,
                 train_bs=batch_size, train_bs_labeled=batch_size // 2,
                 infer_bs=8, epochs=1, compute_dtype="bfloat16",
                 scan_batches=scan, fuse_teacher_forward=fuse,
                 fold_views=fold, unroll_branches=unroll,
                 remat=remat, stream_data=stream, scan_branches=scanbr)
    cfg.pck_ref = (1, 2)
    cfg.pck_thr = 0.2
    _phase("imports + jax init done, constructing trainer")
    trainer = MTUBPLTrainer(cfg)
    _phase("trainer constructed (dataset staged, state built)")
    sched = trainer.epoch_schedules(0)
    args = (sched["cons_weight"], sched["fdl_weight"],
            sched["pseudo_weight"], sched["ema_alpha"])
    it = iter(trainer.make_sampler())

    def next_batch():
        nonlocal it
        try:
            return np.asarray(next(it))
        except StopIteration:
            it = iter(trainer.make_sampler())
            return np.asarray(next(it))

    n_calls = (steps + scan - 1) // scan if scan > 1 else steps
    if stream:
        # drive the real streaming path (host gather + prefetched H2D + step)
        idx_batches = [next_batch() for _ in range(n_calls + 1)]
        trainer.run_train_steps(iter(idx_batches[:1]), *args)   # compile
        jax.block_until_ready(trainer.state)
        t0 = time.perf_counter()
        trainer.run_train_steps(iter(idx_batches[1:]), *args)
        jax.block_until_ready(trainer.state)
        dt = time.perf_counter() - t0
        return batch_size * n_calls / dt
    if scan > 1:
        batches = [jnp.asarray(np.stack([next_batch() for _ in range(scan)]))
                   for _ in range(n_calls + 1)]
        run = lambda st, b, s0: trainer.train_scan_step(st, b, s0, *args)
        per_call = scan
    else:
        batches = [jnp.asarray(next_batch()) for _ in range(n_calls + 3)]
        run = lambda st, b, s0: trainer.train_step(st, b, s0, *args)
        per_call = 1

    state = trainer.state
    _phase("batches staged, warmup step (compile or cache load)")
    state, m = run(state, batches[0], 1)   # warmup / compile
    jax.block_until_ready(m)
    _phase("warmup done, measuring")
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, m = run(state, batches[(i % (len(batches) - 1)) + 1],
                       100 + i * per_call)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return batch_size * n_calls * per_call / dt


def measure_reference_cpu(steps=3):
    """Measure the reference MT_UBPL train loop (PyTorch, CPU) on synthetic
    Mouse-shaped batches.  Heavy; result is cached to BENCH_BASELINE.json."""
    import types
    import numpy as np
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    for m in ("skimage", "skimage.transform", "openpyxl", "openpyxl.styles",
              "tqdm"):
        mod = types.ModuleType(m)
        mod.PatternFill = object
        mod.tqdm = lambda x: x
        sys.modules.setdefault(m, mod)
    sys.path.insert(0, "/root/reference")
    from models.pose.hourglass import StackedHourglass
    from utils.losses import JointMSELoss, JointDistLoss, JointPseudoLoss3
    from utils.process import ProcessUtils as proc

    torch.set_num_threads(os.cpu_count() or 8)
    bs, K = 4, 9
    models = [StackedHourglass(K, 3, "AvgPool") for _ in range(2)]
    teachers = [StackedHourglass(K, 3, "AvgPool") for _ in range(2)]
    for t in teachers:
        for p in t.parameters():
            p.detach_()
    optims = [torch.optim.AdamW(m.parameters(), lr=2.5e-4) for m in models]
    pose_c = JointMSELoss(nStack=3, useKPsGate=True, useSampleWeight=True)
    cons_c = JointDistLoss()
    pseudo_c = JointPseudoLoss3(nStack=3, scoreThr=0.95)
    imgs = [torch.randn(bs, 3, 256, 256) for _ in range(2)]
    hm = torch.rand(bs, K, 64, 64)
    gate = torch.ones(bs, K)
    sw = torch.tensor([[0.], [0.], [1.], [1.]])
    sw_nega = torch.tensor([[1.], [1.], [0.], [0.]])

    def one_step():
        for o in optims:
            o.zero_grad()
        outs, feats, outs_ema = [], [], []
        for m_i, model in enumerate(models):
            po, fo, eo = [], [], []
            for im in imgs:
                out, feat = model(im)
                po.append(out)
                fo.append(feat)
                with torch.no_grad():
                    out_e, _ = teachers[m_i](im)
                    eo.append(out_e)
            outs.append(torch.stack(po))
            feats.append(torch.stack(fo))
            outs_ema.append(torch.stack(eo))
        outs = torch.stack(outs)
        feats = torch.stack(feats)
        outs_ema = torch.stack(outs_ema)
        totals = []
        for m_i in range(2):
            mtc = sum(cons_c(outs[m_i, a, :, -1], outs_ema[m_i, a, :, -1])[0]
                      for a in range(2))
            pec = sum(pose_c(outs[m_i, a], hm, gate, sw)[0] for a in range(2))
            epc = sum(pseudo_c(outs[m_i, a], outs_ema[:, a].detach(),
                               sw_nega)[0] for a in range(2))
            fdc, _ = proc.features_cov(feats[0, 0], feats[1, 0])
            totals.append(pec + mtc + epc + fdc)
        for t in totals:
            t.backward(retain_graph=True)
        for o in optims:
            o.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return bs * steps / dt


def get_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    base = {"reference_torch_cpu_images_per_sec": measure_reference_cpu(),
            "note": "reference measured on host CPU (torch-cpu wheels; no "
                    "CUDA device in this environment); reference's intended "
                    "hardware is 1x CUDA GPU"}
    with open(BASELINE_CACHE, "w") as f:
        json.dump(base, f, indent=2)
    return base


LAST_GOOD = os.path.join(REPO, "BENCH_LAST.json")


def _load_last_good():
    """Best prior measurement for the stale-fallback line.

    BENCH_LAST.json (gitignored) is the freshest, but the workspace reset at
    round boundaries wipes it; fall back to the committed BENCH_r{N}.json
    driver artifacts (newest round first) so a post-reset timeout still
    reports a real, labeled prior number instead of nothing (round 3's
    driver run recorded rc=124 with no JSON at all)."""
    try:
        with open(LAST_GOOD) as f:
            last = json.load(f)
        return last["value"], last.get("knobs") or {"bs": last.get("bs",
                                                                   BENCH_BS)}
    except Exception:
        pass
    import glob as _glob
    import re

    def _round_no(path):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    # numeric sort: lexical reverse-sort would pick r99 over r100
    for art in sorted(_glob.glob(os.path.join(REPO, "BENCH_r*.json")),
                      key=_round_no, reverse=True):
        try:
            with open(art) as f:
                parsed = json.load(f).get("parsed") or {}
            metric = parsed.get("metric", "")
            if parsed.get("value") and "STALE" not in metric:
                knobs = {"bs": BENCH_BS}
                m = re.search(r"bs=(\d+)", metric)
                if m:
                    knobs["bs"] = int(m.group(1))
                # recover any non-default knobs the stale line recorded
                # ("[measured with {'fuse': True, ...}]") so a replayed
                # fallback keeps its measured-with qualifier
                m = re.search(r"\[measured with (\{.*?\})\]", metric)
                if m:
                    import ast
                    try:
                        knobs.update(ast.literal_eval(m.group(1)))
                    except (ValueError, SyntaxError):
                        pass
                return parsed["value"], knobs
        except Exception:
            continue
    return None


def _knobs():
    """The measurement-affecting config of THIS run, recorded alongside the
    value so a stale replay is labeled with the config it was measured at."""
    return {"bs": BENCH_BS, "steps": BENCH_STEPS, "scan": BENCH_SCAN,
            "fuse": BENCH_FUSE, "fold": BENCH_FOLD, "unroll": BENCH_UNROLL,
            "remat": BENCH_REMAT, "stream": BENCH_STREAM,
            "scanbr": BENCH_SCANBR}


def _result_line(value, ref, stale=False, knobs=None):
    bs = (knobs or _knobs())["bs"]
    metric = ("MT_UBPL train throughput (HG3, fused step, "
              f"bs={bs}, incl. on-device augmentation)")
    if stale:
        metric += " [STALE: last completed measurement; live run interrupted]"
        nondefault = {k: v for k, v in (knobs or {}).items()
                      if k not in ("bs", "steps") and v not in (False, None)
                      and not (k == "scan" and v == 1)}
        if nondefault:
            metric += f" [measured with {nondefault}]"
    return json.dumps({"metric": metric, "value": round(value, 2),
                       "unit": "images/sec/chip",
                       "vs_baseline": round(value / ref, 2)})


def _install_deadline_fallback(ref):
    """Print the last completed measurement (clearly labeled stale) if the
    caller's timeout kills us mid-run.

    The driver runs `python bench.py` under a hard wall-clock cap while
    long-lived baseline jobs contend for this host's single CPU core; round 3
    recorded rc=124 and no JSON at all.  A labeled stale line beats silence —
    the value is a real prior measurement from this same code path."""
    import signal

    def on_term(signum, frame):
        last = _load_last_good()
        if last is not None:
            value, knobs = last
            print(_result_line(value, ref, stale=True, knobs=knobs),
                  flush=True)
        os._exit(124)

    signal.signal(signal.SIGTERM, on_term)


def main():
    baseline = get_baseline()
    ref = baseline["reference_torch_cpu_images_per_sec"]
    _install_deadline_fallback(ref)
    try:
        value = measure_ours()
    except Exception:
        # e.g. a long-lived training run owns the chip's HBM when the driver
        # invokes us: a labeled stale line still beats no JSON at all
        import traceback
        traceback.print_exc()
        last = _load_last_good()
        if last is None:
            raise SystemExit(1)
        value, knobs = last
        print(_result_line(value, ref, stale=True, knobs=knobs), flush=True)
        return
    # atomic write: a SIGTERM landing mid-dump must not leave a truncated
    # LAST_GOOD for the next timed-out run's fallback handler
    tmp = LAST_GOOD + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"value": value, "ts": time.time(),
                   "knobs": _knobs()}, f)
    os.replace(tmp, LAST_GOOD)
    print(_result_line(value, ref))


if __name__ == "__main__":
    main()
