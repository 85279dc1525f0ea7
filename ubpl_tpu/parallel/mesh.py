"""Device mesh + sharding utilities.

The reference is strictly single-GPU (no torch.distributed anywhere;
SURVEY.md §2).  The TPU-native scaling surface is new: a
jax.sharding.Mesh over ICI with

  * "data"  — batch (data parallel); gradients/metrics reduce via XLA
              collectives inserted by GSPMD
  * "model" — the ensemble-branch axis of the dual-network regimes
              (MT_UBPL/DualPose stack 2 students + 2 teachers on a leading
              axis; sharding it gives branch parallelism)
  * "dcn"   — OUTER batch axis across pod slices (multi-slice pods connect
              slices over DCN, which is far slower than ICI).  The batch dim
              shards over ("dcn", "data") so the only cross-slice traffic is
              the once-per-step gradient all-reduce; everything
              bandwidth-hungry (activations, branch parallelism) stays on
              ICI inside a slice.  On real multi-slice hardware build_mesh
              orders devices so "dcn" coincides with the physical slice
              boundary (mesh_utils.create_hybrid_device_mesh).

No explicit psum/all_reduce calls are needed: jit + sharding annotations let
XLA place the collectives on ICI.  Cross-replica BatchNorm is available via
the models' axis_name when shard_map-style semantics are wanted; under plain
GSPMD the batch statistics are computed globally by construction.
"""
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axes: Sequence[str] = ("data",), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
        axes = axes[:1]
    arr = np.asarray(devices[:int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, tuple(axes))


def parse_axis_spec(value, cast=int) -> Tuple:
    """Accept a tuple/list or a CLI string like "2,4" / "model,data"."""
    if isinstance(value, str):
        return tuple(cast(v.strip()) for v in value.split(",") if v.strip())
    if isinstance(value, (int, float)):
        return (cast(value),)
    return tuple(cast(v) for v in value)


def build_mesh(cfg, devices=None) -> Optional[Mesh]:
    """Mesh for the production entry points, from Config.mesh_shape/mesh_axes.

    mesh_shape None (default): all local devices on a ("data",) axis; returns
    None on a single device (plain single-chip jit).  This is the new-surface
    distributed backend (SURVEY §5) — the reference is strictly single-GPU.
    """
    devices = list(devices if devices is not None else jax.devices())
    if cfg.mesh_shape is None:
        if len(devices) <= 1:
            return None
        # auto mode must not break reference-parity small-batch configs
        # (e.g. trainBS=4 on an 8-chip host): use the largest data axis that
        # divides the global batch.  An explicit mesh_shape always wins.
        n = len(devices)
        bs = int(getattr(cfg, "train_bs", 0) or 0)
        if bs > 0:
            while n > 1 and bs % n != 0:
                n -= 1
        if n < len(devices):
            import warnings
            warnings.warn(
                f"auto mesh shrunk to {n} of {len(devices)} local devices: "
                f"train_bs={bs} is not divisible by the device count; set "
                "train_bs to a multiple of it (or mesh_shape explicitly) to "
                "use every chip")
        if n <= 1:
            return None
        return make_mesh((n,), ("data",), devices[:n])
    shape = parse_axis_spec(cfg.mesh_shape, int)
    axes = parse_axis_spec(cfg.mesh_axes, str)
    need = int(np.prod(shape))
    if need > len(devices):
        raise ValueError(f"mesh_shape {shape} needs {need} devices, "
                         f"have {len(devices)}")
    if "dcn" in axes:
        hybrid = _hybrid_mesh(shape, axes, devices)
        if hybrid is not None:
            return hybrid
    return make_mesh(shape, axes, devices)


def _hybrid_mesh(shape, axes, devices) -> Optional[Mesh]:
    """Slice-aware device order for a mesh with a "dcn" axis.

    On multi-slice hardware (devices carry distinct .slice_index), lay the
    "dcn" axis along the physical slice boundary via
    mesh_utils.create_hybrid_device_mesh so every other axis rides ICI.
    Returns None when the devices are single-slice (or don't report slices,
    e.g. the CPU test mesh) — a plain reshape is then both correct and the
    only option."""
    slices = {getattr(d, "slice_index", None) for d in devices}
    if len(slices) <= 1 or None in slices:
        return None
    from jax.experimental import mesh_utils
    i = axes.index("dcn")
    per_slice = tuple(1 if a == "dcn" else s for a, s in zip(axes, shape))
    dcn_shape = tuple(shape[i] if a == "dcn" else 1 for a in axes)
    arr = mesh_utils.create_hybrid_device_mesh(
        per_slice, dcn_shape, devices=devices)
    return Mesh(arr, tuple(axes))


#: mesh axes a batch dimension shards over, outermost first
BATCH_AXES = ("dcn", "data")


def batch_axes(mesh: Optional[Mesh]) -> Tuple[str, ...]:
    """The batch-dim mesh axes present in `mesh` ("data", plus an outer
    "dcn" on multi-slice meshes); () when unsharded."""
    if mesh is None:
        return ()
    return tuple(a for a in BATCH_AXES if a in mesh.axis_names)


def batch_mult(mesh: Optional[Mesh]) -> int:
    """Total ways the batch dim splits (dataset/batch sizes must be
    multiples of this)."""
    n = 1
    for a in batch_axes(mesh):
        n *= mesh.shape[a]
    return n


def batch_spec(mesh: Optional[Mesh], ndim: int) -> P:
    """PartitionSpec pinning dim 0 to the batch axes, rest replicated."""
    axes = batch_axes(mesh)
    if not axes:
        return P()
    first = axes[0] if len(axes) == 1 else tuple(axes)
    return P(first, *([None] * (ndim - 1)))


def local_mesh_size() -> int:
    return len(jax.devices())


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_over(mesh: Mesh, *axes) -> NamedSharding:
    """NamedSharding spreading leading dims over the given mesh axes
    (None entries replicate that dim)."""
    return NamedSharding(mesh, P(*axes))


def constrain_batch(x, mesh: Mesh, axis: str = "data"):
    """Inside jit: pin the leading dim of x to the data axis."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))
