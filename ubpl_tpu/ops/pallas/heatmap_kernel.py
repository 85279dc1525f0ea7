"""Pallas TPU kernel: fused Gaussian heatmap synthesis.

Computes the reference kps_heatmap semantics (utils/process.py:252-318) for a
whole batch in one VMEM-resident pass: truncated centers, exp(-D^2/2sigma^2)
over the output grid, <0.01 clamp.  Per grid step (one sample) the K joint
maps are built as [K, H, W] tiles (H sublanes x W lanes) without any HBM
intermediate.

Visibility gating stays in the XLA wrapper (a handful of scalar ops).

Note on kernel strategy for this framework (see docs/PERF.md): the other
augmentation hot op — the bilinear affine warp — was also prototyped as a
Pallas kernel; its per-(row,column)-varying interpolation weights make the
VPU-select formulation ~1.7 ms/pass, no better than the MXU tent-matmul
einsum XLA already runs (4 ms for both taps incl. weight materialization),
so the einsum stayed.  This synthesis kernel is the profitable fusion.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _synth_kernel(cx_ref, cy_ref, out_ref, *, out_res, sig, k):
    # cx/cy: [B, K] SMEM scalars (full array; indexed by program id);
    # out: [1, K, H, W] VMEM block for this sample
    b = pl.program_id(0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (out_res, out_res), 0
                                  ).astype(jnp.float32)
    gx = jax.lax.broadcasted_iota(jnp.int32, (out_res, out_res), 1
                                  ).astype(jnp.float32)
    inv = 1.0 / (2.0 * sig * sig)
    for j in range(k):
        d2 = (gx - cx_ref[b, j]) ** 2 + (gy - cy_ref[b, j]) ** 2
        kern = jnp.exp(-d2 * inv)
        out_ref[0, j] = jnp.where(kern < 0.01, 0.0, jnp.minimum(kern, 1.0))


@functools.partial(jax.jit, static_argnames=("inp_res", "out_res",
                                             "kernel_size", "sigma",
                                             "interpret"))
def synthesize_heatmaps_pallas(kps, inp_res=256, out_res=64, kernel_size=3.0,
                               sigma=1.0, interpret=False):
    """Drop-in for ops.heatmap.synthesize_heatmaps (same returns/layout)."""
    B, K = kps.shape[0], kps.shape[1]
    stride = inp_res / out_res
    sig = sigma * kernel_size
    x, y, vis = kps[..., 0], kps[..., 1], kps[..., 2]
    xi, yi = jnp.trunc(x), jnp.trunc(y)
    in_bounds = ((xi + sig + 1 < inp_res) & (yi + sig + 1 < inp_res)
                 & (xi - sig >= 0) & (yi - sig >= 0))
    kps_new = jnp.stack([x, y, vis * in_bounds.astype(vis.dtype)], axis=-1)

    cx = (xi / stride).astype(jnp.float32)   # [B, K]
    cy = (yi / stride).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_synth_kernel, out_res=out_res, sig=float(sig),
                          k=K),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, K, out_res, out_res),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, out_res, out_res), jnp.float32),
        interpret=interpret,
    )(cx, cy)
    # [B, K, H, W] -> framework layout [B, H, W, K]
    return jnp.moveaxis(out, 1, -1), kps_new
