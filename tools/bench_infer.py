"""Serving/inference throughput benchmark (single chip).

The reference has no deployment path at all (inference exists only inside
its validation loops, single-image host loops in utils/process.py); this
measures the PoseEstimator serving surface end-to-end — uint8 images in,
decoded keypoints + scores out, including normalization and heatmap decode —
at several batch sizes, and prints one JSON line per point.

    python tools/bench_infer.py [batch_sizes...]   # default 1 8 32 64
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = int(os.environ.get("UBPL_BENCH_STEPS", "30"))


def _device_input():
    return os.environ.get("UBPL_INFER_DEVICE_INPUT") == "1"


def _chunks():
    # pipelining only applies to the host-input predict() path; the
    # device-input mode drives a single pre-staged batch
    if _device_input():
        return 1
    return int(os.environ.get("UBPL_INFER_CHUNKS", "1"))


def measure(batch_size, model="HG3", steps=STEPS):
    import numpy as np
    import jax
    from ubpl_tpu.config import Config
    from ubpl_tpu.infer import PoseEstimator
    from ubpl_tpu.models import create_pose_model, init_model
    import jax.numpy as jnp

    cfg = Config(model=model, compute_dtype="bfloat16", kps_count=9)
    m = create_pose_model(model, cfg.kps_count, cfg.feature_mode,
                          dtype=jnp.bfloat16)
    sample = jnp.zeros((1, cfg.inp_res, cfg.inp_res, 3), jnp.float32)
    params, batch_stats = init_model(m, jax.random.PRNGKey(0), sample)
    est = PoseEstimator(m, params, batch_stats, (0.45, 0.45, 0.45), cfg,
                        batch_size=batch_size)
    rng = np.random.default_rng(0)
    chunks = _chunks()                                      # >1: pipelined
    imgs = rng.integers(0, 256,
                        (batch_size * chunks, cfg.inp_res, cfg.inp_res, 3),
                        dtype=np.uint8)
    if _device_input():
        # compute-only rate: input pre-staged in HBM (how a production
        # pipeline feeds the chip); excludes this host's tunnel transfer
        # (PoseEstimator.predict round-trips numpy, so drive the jitted
        # program directly)
        imgs_d = jax.device_put(jnp.asarray(imgs[:batch_size]))
        out = est._predict(est.params, est.batch_stats, imgs_d)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = est._predict(est.params, est.batch_stats, imgs_d)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        return batch_size * steps / dt, dt / steps * 1000.0
    kps, scores = est.predict(imgs)          # warmup / compile
    np.asarray(kps)
    t0 = time.perf_counter()
    for _ in range(steps):
        kps, scores = est.predict(imgs)
    np.asarray(kps)
    dt = time.perf_counter() - t0
    return imgs.shape[0] * steps / dt, dt / steps * 1000.0


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 8, 32, 64]
    mode = ("device-resident input" if _device_input()
            else "host input (includes this dev host's tunnel transfer)")
    if _chunks() > 1:
        mode += f", {_chunks()} pipelined chunks/request"
    for bs in sizes:
        ips, ms = measure(bs)
        print(json.dumps({
            "metric": f"PoseEstimator serving throughput (HG3, bs={bs}, "
                      f"uint8 in -> keypoints out, {mode})",
            "value": round(ips, 2), "unit": "images/sec/chip",
            "latency_ms": round(ms, 2)}))


if __name__ == "__main__":
    main()
