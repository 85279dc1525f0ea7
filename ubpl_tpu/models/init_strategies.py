"""Parameter (re)initialization strategies (reference models/base/initStrategy.py).

The reference class is dormant (never called from the trainers) but part of
the component inventory: constant / uniform / normal / xavier / kaiming
re-initialization of conv + BN parameters.  Here each strategy is a pure
function over a flax params pytree.
"""
import jax
import jax.numpy as jnp
from jax.nn.initializers import (constant, uniform, normal, xavier_uniform,
                                 he_uniform, he_normal)

_STRATEGIES = {
    "constant": lambda: constant(0.5),
    "uniform": lambda: uniform(1.0),
    "normal": lambda: normal(1.0),
    "xavier": lambda: xavier_uniform(),
    "kaiming_uniform": lambda: he_uniform(),
    "kaiming_normal": lambda: he_normal(),
}


def parameters_initialize(params, rng, mode="kaiming_normal"):
    """Reinitialize every kernel leaf with the chosen strategy; biases and
    BN scales/means keep torch-style defaults (bias 0, scale 1)."""
    if mode not in _STRATEGIES:
        raise ValueError(f"unknown init strategy {mode!r}; "
                         f"choices: {sorted(_STRATEGIES)}")
    init = _STRATEGIES[mode]()
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(leaves))
    new = []
    for (path, leaf), key in zip(leaves, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim >= 2:
            new.append(init(key, leaf.shape, leaf.dtype))
        elif name in ("bias", "mean"):
            new.append(jnp.zeros_like(leaf))
        elif name in ("scale", "var"):
            new.append(jnp.ones_like(leaf))
        else:
            new.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new)
