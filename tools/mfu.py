"""MFU + roofline methodology (docs/PERF.md): measured FLOPs/step and HBM
bytes/step from the compiled executable's own cost analysis, divided by
step time and chip peaks.

    python tools/mfu.py [batch_size] [steps]

Prints flops/step and bytes/step (XLA cost_analysis), step time, achieved
TFLOP/s + GB/s, MFU against the bf16 peak (UBPL_PEAK_TFLOPS env, default
197 = TPU v5e) and HBM-bandwidth utilization (UBPL_PEAK_GBPS, default 819
= v5e).  Both cost-analysis numbers are XLA's static estimates of the
optimized HLO — the same program that runs — so they are reproducible from
this script alone.  The program's arithmetic intensity (flops/byte) vs the
chip ridge point (peak_flops/peak_bw) says which roof binds: the hourglass
family's 1x1 bottleneck convs + BN sit well below the v5e ridge (~240
flops/byte), so the step is HBM-bandwidth-bound by construction and BW
utilization, not MFU, is the headroom metric.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_TFLOPS = float(os.environ.get("UBPL_PEAK_TFLOPS", "197"))
PEAK_GBPS = float(os.environ.get("UBPL_PEAK_GBPS", "819"))


def main(batch_size=32, steps=20):
    import jax
    import jax.numpy as jnp
    from ubpl_tpu.config import Config
    from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer

    cfg = Config(model="HG3", synthetic_data=True, synthetic_kps=9,
                 inp_res=256, out_res=64,
                 train_count=max(4 * batch_size, 64), valid_count=8,
                 label_ratio=0.5, train_bs=batch_size,
                 train_bs_labeled=batch_size // 2, infer_bs=8, epochs=1,
                 compute_dtype="bfloat16")
    cfg.pck_ref, cfg.pck_thr = (1, 2), 0.2
    trainer = MTUBPLTrainer(cfg)
    sched = trainer.epoch_schedules(0)
    args = (sched["cons_weight"], sched["fdl_weight"],
            sched["pseudo_weight"], sched["ema_alpha"])
    idxs = jnp.asarray(next(iter(trainer.make_sampler())))

    lowered = trainer.train_step.lower(trainer.state, idxs, 1, *args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    state = trainer.state
    for i in range(3):
        state, m = trainer.train_step(state, idxs, i + 1, *args)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = trainer.train_step(state, idxs, 100 + i, *args)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / steps

    tflops_sec = flops / dt / 1e12
    gb_sec = bytes_acc / dt / 1e9
    print(f"backend={jax.default_backend()} bs={batch_size}")
    print(f"flops/step (XLA cost_analysis) = {flops:.3e}")
    print(f"bytes/step (XLA cost_analysis) = {bytes_acc:.3e}   "
          f"arith intensity = {flops / max(bytes_acc, 1):.0f} flops/byte "
          f"(v5e ridge ~{1e3 * PEAK_TFLOPS / PEAK_GBPS:.0f})")
    print(f"step time = {dt * 1e3:.2f} ms   images/s = {batch_size / dt:.1f}")
    print(f"achieved = {tflops_sec:.1f} TFLOP/s   "
          f"MFU vs {PEAK_TFLOPS:.0f} TF bf16 peak = "
          f"{100 * tflops_sec / PEAK_TFLOPS:.1f}%")
    print(f"achieved HBM = {gb_sec:.0f} GB/s   "
          f"BW utilization vs {PEAK_GBPS:.0f} GB/s = "
          f"{100 * gb_sec / PEAK_GBPS:.1f}%")
    # note: 'bytes accessed' counts each fusion's operand/result traffic at
    # HBM granularity; re-use inside a fusion is already excluded, so this
    # is the right numerator for an HBM roofline.


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(bs, n)
