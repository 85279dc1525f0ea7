"""Model factories (reference models/pose/pose_model.py, models/classification/class_model.py).

The torch factory hardcodes .cuda() and mutates params for the teacher
("nograd"); in JAX device placement belongs to the caller's sharding and a
teacher is simply a second param pytree updated by EMA under
jax.lax.stop_gradient — so the factory only resolves architectures.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .hourglass import StackedHourglass
from .litepose import LitePose
from .classification import VGG, ResNet, MobileNet

POSE_MODELS = ("HG2", "HG3", "LitePose")
CLASS_MODELS = ("VGG", "ResNet", "MobileNet")


def create_pose_model(model_type: str, kps_count: int, mode: str = "AvgPool",
                      dtype=None):
    """Reference PoseModel factory: "HG{n}" -> StackedHourglass(nStack=n),
    "LitePose" -> LitePose."""
    if model_type.startswith("HG"):
        n_stack = int(model_type[2:])
        return StackedHourglass(k=kps_count, n_stack=n_stack, mode=mode,
                                dtype=dtype)
    if model_type == "LitePose":
        return LitePose(k=kps_count, mode=mode, dtype=dtype)
    raise ValueError(f"unknown pose model {model_type!r}")


def create_class_model(model_type: str, num_classes: int, mode: str = "AvgPool",
                      dtype=None):
    """Reference ClassModel factory: VGG / ResNet / MobileNet CIFAR nets.

    Accepts bare family names ("VGG" -> VGG11, "ResNet" -> ResNet18) or the
    reference's full variants ("VGG13", "ResNet50", ...)."""
    if model_type.startswith("VGG"):
        variant = model_type if len(model_type) > 3 else "VGG11"
        return VGG(num_classes=num_classes, model_type=variant, mode=mode,
                   dtype=dtype)
    if model_type.startswith("ResNet"):
        variant = model_type if len(model_type) > 6 else "ResNet18"
        return ResNet(num_classes=num_classes, model_type=variant, mode=mode,
                      dtype=dtype)
    if model_type == "MobileNet":
        return MobileNet(num_classes=num_classes, mode=mode,
                         dtype=dtype)
    raise ValueError(f"unknown classification model {model_type!r}")


@functools.lru_cache(maxsize=32)
def _jitted_init(model, train):
    """One compiled XLA program per (model, train) instead of eager
    per-op dispatch.  Un-jitted flax ``model.init`` executes hundreds of
    tiny ops individually; over a high-latency device link (the axon
    tunnel here) that costs minutes per HG3 init (~150 s measured, the
    round-3 bench timeout).  Jitted it is one program — persisted by the
    XLA compilation cache, so repeat startups are a disk read + one call.
    flax Modules are frozen dataclasses (hashable), so they key the cache."""
    return jax.jit(lambda rng, sample: model.init(rng, sample, train=train))


def init_model(model, rng, sample_input, train=True):
    """Initialize (params, batch_stats) for a model on a sample batch."""
    variables = _jitted_init(model, train)(rng, sample_input)
    return variables["params"], variables.get("batch_stats", {})


@functools.lru_cache(maxsize=32)
def _jitted_init_stacked(model, train):
    return jax.jit(jax.vmap(
        lambda rng, sample: model.init(rng, sample, train=train),
        in_axes=(0, None)))


def init_model_stacked(model, rngs, sample_input, train=True):
    """Initialize n stacked (branch-axis) variable sets in ONE program.

    ``vmap`` over the per-branch PRNG keys is exactly ``jnp.stack`` of n
    independent inits (same per-key initializer draws), without n separate
    device calls + per-leaf eager stacking."""
    variables = _jitted_init_stacked(model, train)(rngs, sample_input)
    return variables["params"], variables.get("batch_stats", {})


def param_count(params):
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
