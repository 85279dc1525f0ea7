"""Batched MPII-style coordinate transforms and bilinear warps (pure XLA).

Re-implements — as fixed-shape, fully batched device ops — the semantics of
the reference's per-point host loops:

  - 200px-unit crop transform        reference utils/udaap/transforms.py:119-158
  - point transform w/ trunc(+1)     reference utils/udaap/transforms.py:151-158
  - inverse-warp matrix              reference utils/augment.py:158-164
  - heatmap affine-back (grid_sample) reference utils/augment.py:36-47

Conventions: points are (x, y); matrices act on 1-indexed coordinates the way
the reference does (subtract 1, apply, add 1, truncate toward zero for the
integer variant).  Everything accepts a leading batch dimension.
"""
from functools import partial

import jax
import jax.numpy as jnp


def compose_affine3(a, b):
    """Exact batched composition of affine 3x3s (last row [0,0,1]).

    Written with scalar arithmetic rather than matmul so TPU execution stays
    in float32 (MXU matmuls default to bfloat16 inputs)."""
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a10, a11, a12 = a[..., 1, 0], a[..., 1, 1], a[..., 1, 2]
    b00, b01, b02 = b[..., 0, 0], b[..., 0, 1], b[..., 0, 2]
    b10, b11, b12 = b[..., 1, 0], b[..., 1, 1], b[..., 1, 2]
    zero = jnp.zeros_like(a00)
    one = jnp.ones_like(a00)
    return jnp.stack([
        jnp.stack([a00 * b00 + a01 * b10, a00 * b01 + a01 * b11,
                   a00 * b02 + a01 * b12 + a02], -1),
        jnp.stack([a10 * b00 + a11 * b10, a10 * b01 + a11 * b11,
                   a10 * b02 + a11 * b12 + a12], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)


def get_transform_matrix(center, scale, res, rot=None):
    """Batched 3x3 crop transform (reference get_transform).

    center: [..., 2] (x, y); scale: [...]; res: (h, w) static pair;
    rot: [...] degrees or None.  Returns [..., 3, 3].
    """
    center = jnp.asarray(center)
    scale = jnp.asarray(scale)
    dtype = jnp.promote_types(center.dtype, jnp.float32)
    h = 200.0 * scale.astype(dtype)
    res_h, res_w = float(res[0]), float(res[1])
    zero = jnp.zeros_like(h)
    one = jnp.ones_like(h)
    t00 = res_w / h
    t11 = res_h / h
    t02 = res_w * (-center[..., 0].astype(dtype) / h + 0.5)
    t12 = res_h * (-center[..., 1].astype(dtype) / h + 0.5)
    t = jnp.stack([
        jnp.stack([t00, zero, t02], -1),
        jnp.stack([zero, t11, t12], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    if rot is None:
        return t
    rot = jnp.asarray(rot).astype(dtype)
    # match reference: rotate by -rot about the crop center
    rr = -rot * (jnp.pi / 180.0)
    sn, cs = jnp.sin(rr), jnp.cos(rr)
    rot_mat = jnp.stack([
        jnp.stack([cs, -sn, zero], -1),
        jnp.stack([sn, cs, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    t_mat = jnp.eye(3, dtype=dtype) + jnp.zeros_like(t)
    t_mat = t_mat.at[..., 0, 2].set(-res_w / 2)
    t_mat = t_mat.at[..., 1, 2].set(-res_h / 2)
    t_inv = jnp.eye(3, dtype=dtype) + jnp.zeros_like(t)
    t_inv = t_inv.at[..., 0, 2].set(res_w / 2)
    t_inv = t_inv.at[..., 1, 2].set(res_h / 2)
    full = compose_affine3(t_inv, compose_affine3(rot_mat, compose_affine3(t_mat, t)))
    return jnp.where((rot == 0.0)[..., None, None], t, full)


def invert_affine3(t):
    """Closed-form inverse of a batched affine 3x3 (last row [0,0,1])."""
    a, b, c = t[..., 0, 0], t[..., 0, 1], t[..., 0, 2]
    d, e, f = t[..., 1, 0], t[..., 1, 1], t[..., 1, 2]
    det = a * e - b * d
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    zero = jnp.zeros_like(a)
    one = jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([ia, ib, ic], -1),
        jnp.stack([id_, ie, if_], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)


def transform_points_cont(pts, mat):
    """Continuous point transform: mat @ [x-1, y-1, 1] + nothing (reference
    drops the +1 into the integer step).  pts [..., 2], mat [..., 3, 3]."""
    x = pts[..., 0] - 1.0
    y = pts[..., 1] - 1.0
    nx = mat[..., 0, 0] * x + mat[..., 0, 1] * y + mat[..., 0, 2]
    ny = mat[..., 1, 0] * x + mat[..., 1, 1] * y + mat[..., 1, 2]
    return jnp.stack([nx, ny], -1)


def transform_points(pts, center, scale, res, invert=False, rot=None):
    """Reference `transform` (utils/udaap/transforms.py:151-158), batched.

    Returns trunc(mat @ (pt - 1)) + 1 as the reference's astype(int)+1 does.
    pts/center [..., 2]; scale/rot broadcastable [...].
    """
    mat = get_transform_matrix(center, scale, res, rot)
    if invert:
        mat = invert_affine3(mat)
    cont = transform_points_cont(pts, mat)
    return jnp.trunc(cont).astype(jnp.int32) + 1


def transform_preds(coords, center, scale, res):
    """Reference transform_preds: per-point inverse transform (rot=0).

    coords [B, K, 2] (1-indexed heatmap coords); center [B, 2]; scale [B].
    Returns float coords in original image space (integer-valued).
    """
    mat = invert_affine3(get_transform_matrix(center, scale, res))
    out = transform_points_cont(coords, mat[..., None, :, :])
    return (jnp.trunc(out) + 1.0).astype(coords.dtype)


def affine_warp_matrix(center, scale, angle, res):
    """Continuous input->output matrix used by the on-device image warp.

    Matches the geometry of the reference crop pipeline
    (utils/augment.py:86-138): output = crop(center, scale) rotated by angle,
    resized to `res`.  Keypoints transform via `transform_points` with the
    same parameters.
    """
    return get_transform_matrix(center, scale, res, angle)


def grid_sample_bilinear(img, src_x, src_y):
    """Bilinear sample with zero padding (torch grid_sample semantics).

    img: [H, W, C]; src_x/src_y: [Ho, Wo] float pixel coords (0-indexed).
    Returns [Ho, Wo, C].
    """
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        vals = img[yi_c, xi_c]  # [Ho, Wo, C]
        return vals * valid[..., None].astype(img.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def warp_image_affine(img, mat_in2out, out_res):
    """Warp one image [H, W, C] through the input->output affine `mat_in2out`
    (3x3, 1-indexed convention) producing [out_res, out_res, C]."""
    inv = invert_affine3(mat_in2out)
    ys, xs = jnp.meshgrid(jnp.arange(out_res, dtype=img.dtype),
                          jnp.arange(out_res, dtype=img.dtype), indexing="ij")
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    return grid_sample_bilinear(img, sx, sy)


warp_images_affine_gather = jax.vmap(warp_image_affine, in_axes=(0, 0, None))


def _tent_weights(src, n_in, dtype):
    """Linear-interpolation weight matrix via the tent function.

    src: [..., N_out] float source positions.  Returns [..., N_out, n_in]
    where W[..., o, u] = max(0, 1 - |src[o] - u|) — exactly the two-tap
    bilinear weights including zero padding outside [0, n_in - 1].
    """
    u = jnp.arange(n_in, dtype=src.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - u)).astype(dtype)


def _resample_axis1(img, src, H):
    """Linear resample along axis 1 with zero padding, as an MXU matmul.

    img: [B, H, W, C]; src: [B, Ho, W] float source row per output position.
    Returns [B, Ho, W, C].  TPU gathers cost ~20 ms per tap for this shape;
    expressing the two-tap interpolation as a tent-weight contraction runs
    on the MXU instead (~4x faster end to end).
    """
    # bf16 weights halve the dominant HBM traffic on TPU; CPU's dot thunk
    # lacks the BF16xBF16->F32 path, so stay f32 there
    wt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    w = _tent_weights(src, H, wt)                        # [B, Ho, W, H]
    out = jnp.einsum("bowu,buwc->bowc", w, img.astype(wt),
                     preferred_element_type=jnp.float32)
    return out.astype(img.dtype)


def warp_images_affine(imgs, mats_in2out, out_res):
    """Batched affine warp via the two-pass Catmull-Smith decomposition.

    imgs: [B, H, W, C]; mats_in2out: [B, 3, 3] input->output affines
    (1-indexed convention as produced by affine_warp_matrix).

    The generic gather-based warp costs ~75 ms for a bs=32 256^2 batch on a
    v5e chip; splitting the affine into a vertical then a horizontal 1D
    resample turns it into two single-axis take_along_axis ops.  Valid while
    |m00| of the inverse stays away from 0 (rotations well below 90 deg —
    the reference's rotRange is 30).
    """
    B, H, W, C = imgs.shape
    inv = invert_affine3(mats_in2out).astype(imgs.dtype)
    m00, m01, m02 = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    m10, m11, m12 = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]
    # account for the reference's 1-indexed convention: src = M @ (p - 1) + 1
    # => src0 = m.. (x-1) + ... + 1; fold the +-1 into the offsets
    c0 = m02 - m00 - m01 + 1.0
    c1 = m12 - m10 - m11 + 1.0

    xs = jnp.arange(out_res, dtype=imgs.dtype)
    ys = jnp.arange(out_res, dtype=imgs.dtype)

    # pass 1 (vertical): tmp(x', y) = in(x', k(x', y))
    #   k(x', y) = (m10/m00) x' + (m11 - m10 m01 / m00) y + (c1 - m10 c0/m00)
    r = m10 / m00
    ky = (m11 - r * m01)[:, None, None] * ys[None, :, None]
    kx = r[:, None, None] * xs[None, None, :]
    k = kx + ky + (c1 - r * c0)[:, None, None]          # [B, Ho, W]
    tmp = _resample_axis1(imgs, k, H)

    # pass 2 (horizontal): out(x, y) = tmp(sx(x, y), y)
    sx = (m00[:, None, None] * xs[None, None, :]
          + m01[:, None, None] * ys[None, :, None] + c0[:, None, None])
    tmp_t = jnp.swapaxes(tmp, 1, 2)                      # [B, W, Ho, C]
    out_t = _resample_axis1(tmp_t, jnp.swapaxes(sx, 1, 2), W)
    return jnp.swapaxes(out_t, 1, 2)


def affine_warpmat(angle, scale):
    """Reference warpmat as consumed by the datasets, batched.

    datasets/dataset.py:74 calls affine_getWarpmat(-angle, 1/scale), and
    affine_getWarpmat (utils/augment.py:158-164) divides by its scale
    argument *again* inside getRotationMatrix2D before inverting; the net
    closed form (translation zeroed) is (1/scale) * R(-angle):

        [[cos(a)/s,  sin(a)/s, 0],
         [-sin(a)/s, cos(a)/s, 0]]

    angle in degrees; angle/scale broadcastable [...]. Returns [..., 2, 3].
    """
    angle = jnp.asarray(angle, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rad = -angle * (jnp.pi / 180.0)  # R(-angle) given the caller's -angle
    cs, sn = jnp.cos(rad) / scale, jnp.sin(rad) / scale
    zero = jnp.zeros_like(cs)
    return jnp.stack([
        jnp.stack([cs, -sn, zero], -1),
        jnp.stack([sn, cs, zero], -1),
    ], -2)


def affine_back(heatmap, warpmat, isflip):
    """Reference affine_back2: warp heatmaps back through `warpmat` with
    torch affine_grid/grid_sample (align_corners=True) semantics, then undo
    horizontal flips.

    heatmap: [B, H, W, K]; warpmat: [B, 2, 3]; isflip: [B] bool.
    """
    B, H, W, K = heatmap.shape
    dtype = heatmap.dtype
    # normalized output grid, align_corners=True: -1..1 over W/H
    xn = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
    yn = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
    gy, gx = jnp.meshgrid(yn, xn, indexing="ij")

    def one(hm, m, flip):
        sxn = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
        syn = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
        # normalized -> pixel (align_corners=True)
        sx = (sxn + 1.0) * 0.5 * (W - 1)
        sy = (syn + 1.0) * 0.5 * (H - 1)
        out = grid_sample_bilinear(hm, sx, sy)
        return jnp.where(flip, out[:, ::-1, :], out)

    return jax.vmap(one)(heatmap, warpmat.astype(dtype), isflip)


def fliplr_images(img):
    """Horizontal flip of [..., H, W, C] images."""
    return img[..., :, ::-1, :]


def fliplr_kps(kps, img_width):
    """Reference kps_fliplr: x -> width - x (no joint-pair swap; the
    reference deliberately disables pair swapping, utils/udaap/transforms.py:93-95)."""
    return kps.at[..., 0].set(img_width - kps[..., 0])


@partial(jax.jit, static_argnames=("res",))
def decode_warp_matrices(center, scale, res):
    return invert_affine3(get_transform_matrix(center, scale, res))
