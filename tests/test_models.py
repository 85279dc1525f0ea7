"""Model zoo shape + parameter-count parity tests.

Parameter counts come from instantiating the reference torch models
(models/pose/hourglass.py) and counting *used* parameters: the reference's
Residual allocates a skip conv even when inp==out (models/base/layers.py:63)
that never runs; excluding those dead weights the reference has
HG2 = 6,565,010 and HG3 = 9,705,371 parameters, which we match exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubpl_tpu.models import (create_pose_model, create_class_model, init_model,
                             param_count, parameters_initialize)

REF_PARAMS = {"HG2": 6565010, "HG3": 9705371}


@pytest.mark.parametrize("model_type,n_stack", [("HG2", 2), ("HG3", 3)])
def test_hourglass_shapes_and_params(model_type, n_stack):
    model = create_pose_model(model_type, kps_count=9, mode="AvgPool")
    x = jnp.zeros((2, 256, 256, 3), jnp.float32)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), x)
    assert param_count(params) == REF_PARAMS[model_type]
    (preds, feats), _ = model.apply({"params": params, "batch_stats": batch_stats},
                                    x, train=True, mutable=["batch_stats"])
    assert preds.shape == (2, n_stack, 64, 64, 9)
    assert feats.shape == (2, n_stack, 32, 32, 256)


def test_hourglass_default_mode():
    model = create_pose_model("HG2", kps_count=5, mode="default")
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), x)
    preds = model.apply({"params": params, "batch_stats": bs}, x, train=False)
    assert preds.shape == (1, 2, 64, 64, 5)


def test_litepose_shapes():
    model = create_pose_model("LitePose", kps_count=9, mode="default")
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), x)
    outs = model.apply({"params": params, "batch_stats": bs}, x, train=False)
    assert outs[0].shape == (1, 64, 64, 9)
    assert outs[1].shape == (1, 128, 128, 9)


@pytest.mark.parametrize("name,feat_shape", [
    ("VGG", (2, 2, 2, 512)),
    ("ResNet", (2, 4, 4, 256)),
    ("MobileNet", (2, 2, 2, 128)),
])
def test_classifiers(name, feat_shape):
    model = create_class_model(name, num_classes=10, mode="AvgPool")
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), x)
    (logits, feat), _ = model.apply({"params": params, "batch_stats": bs}, x,
                                    train=True, mutable=["batch_stats"])
    assert logits[0].shape == (2, 10) and logits[1].shape == (2, 10)
    assert feat.shape == feat_shape


def test_init_strategies():
    model = create_pose_model("HG2", kps_count=3, mode="default")
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params, _ = init_model(model, jax.random.PRNGKey(0), x)
    p2 = parameters_initialize(params, jax.random.PRNGKey(1), "constant")
    leaves = jax.tree_util.tree_leaves_with_path(p2)
    kernels = [l for (p, l) in leaves
               if getattr(p[-1], "key", "") == "kernel" and l.ndim >= 2]
    assert all(np.allclose(np.asarray(k), 0.5) for k in kernels)
    with pytest.raises(ValueError):
        parameters_initialize(params, jax.random.PRNGKey(1), "bogus")
