"""Device mesh + sharding utilities.

The reference is strictly single-GPU (no torch.distributed anywhere;
SURVEY.md §2).  The TPU-native scaling surface is new: a
jax.sharding.Mesh over ICI with

  * "data"  — batch (data parallel); gradients/metrics reduce via XLA
              collectives inserted by GSPMD
  * "model" — the ensemble-branch axis of the dual-network regimes
              (MT_UBPL/DualPose stack 2 students + 2 teachers on a leading
              axis; sharding it gives branch parallelism)

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
    return make_mesh(shape, axes, devices)


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
