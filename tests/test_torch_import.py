"""Torch-checkpoint import: reference-trained weights must run here.

Fixture: tests/goldens/torch_import_hg2.npz (tools/make_torch_import_golden.py)
— a reference StackedHourglass (HG2, k=5, AvgPool) state_dict with moved BN
running stats, plus its eval-mode forward on a fixed input.  Importing that
state_dict into our flax StackedHourglass must reproduce the same heatmaps
and features (NHWC vs NCHW is the only difference).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ubpl_tpu.models import create_pose_model, init_model
from ubpl_tpu.models.torch_import import (export_hourglass,
                                          hourglass_entries, import_hourglass)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "torch_import_hg2.npz")


def _load():
    g = np.load(GOLDEN)
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    return g, sd, int(g["k"]), int(g["n_stack"])


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def test_import_tree_matches_init():
    """The imported (params, batch_stats) trees carry exactly the paths and
    shapes of a fresh init — nothing missing, nothing extra, no transposed
    shapes silently accepted."""
    g, sd, k, n_stack = _load()
    params, stats = import_hourglass(sd, n_stack)
    model = create_pose_model(f"HG{n_stack}", k, "AvgPool", dtype=None)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ref_params, ref_stats = init_model(model, jax.random.PRNGKey(0), x)
    assert _paths(params) == _paths(ref_params)
    assert _paths(stats) == _paths(ref_stats)


def test_import_consumes_every_live_torch_key():
    """Every reference state_dict entry is either mapped or a documented
    drop: num_batches_tracked counters and the never-executed skip convs
    (reference layers.py:64-74 creates skip_layer params even when
    inp_dim == out_dim but the forward bypasses them)."""
    g, sd, k, n_stack = _load()
    mapped = {tkey for _, _, tkey, _ in hourglass_entries(n_stack)}
    assert mapped <= set(sd), sorted(mapped - set(sd))[:5]
    leftovers = [t for t in sd if t not in mapped
                 and not t.endswith("num_batches_tracked")
                 and ".skip_layer." not in t]
    assert leftovers == []


def test_export_roundtrip():
    """export_hourglass is the exact inverse of import_hourglass, and its
    key set equals the reference state_dict's key set exactly (including
    the synthesized dead skip convs and num_batches_tracked counters), so
    the reference's strict load_state_dict accepts it."""
    g, sd, k, n_stack = _load()
    params, stats = import_hourglass(sd, n_stack)
    out = export_hourglass(params, stats, n_stack)
    assert set(out) == set(sd)
    live = {tkey for _, _, tkey, _ in hourglass_entries(n_stack)}
    for key in live:
        np.testing.assert_array_equal(out[key], np.array(sd[key]),
                                      err_msg=key)
    # and import(export(x)) == x
    p2, s2 = import_hourglass(out, n_stack)
    assert _paths(p2) == _paths(params)
    for path, shape in _paths(params).items():
        a, b = params, p2
        for p in path:
            a, b = a[p], b[p]
        np.testing.assert_array_equal(a, b)


def test_torch_init_warm_start(tmp_path):
    """Config.torch_init replaces the fresh init with reference-checkpoint
    weights: dual regimes load both branches' students AND EMA teachers
    into the stacked state; single regimes load branch 1."""
    import torch
    from ubpl_tpu.config import Config
    from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer
    from ubpl_tpu.train.supervised import SupervisedTrainer

    g, sd, k, n_stack = _load()
    t_sd = {key: torch.from_numpy(np.array(v)) for key, v in sd.items()}
    # EMA marker: scaled stem kernel distinguishes teacher from student
    ema_sd = {key: (v * 1.5 if key == "pre.0.conv.weight" else v)
              for key, v in t_sd.items()}
    ckpt = {"current_epoch": 7, "best_acc": [0.5],
            "model1_state": t_sd, "model1_ema_state": ema_sd,
            "model2_state": t_sd, "model2_ema_state": ema_sd}
    path = str(tmp_path / "checkpoint.pth.tar")
    torch.save(ckpt, path)

    def cfg(**kw):
        kw.setdefault("torch_init", path)
        c = Config(model=f"HG{n_stack}", synthetic_data=True,
                   synthetic_kps=k, inp_res=64, out_res=16, train_count=8,
                   valid_count=4, label_ratio=0.5, train_bs=4,
                   train_bs_labeled=2, infer_bs=4, epochs=1,
                   compute_dtype="float32", **kw)
        c.pck_ref, c.pck_thr = (1, 2), 0.2
        return c

    expected = np.transpose(np.array(sd["pre.0.conv.weight"]), (2, 3, 1, 0))
    tr = MTUBPLTrainer(cfg())
    kern = np.asarray(tr.state.params["ConvBlock_0"]["Conv_0"]["kernel"])
    assert kern.shape[0] == 2
    np.testing.assert_allclose(kern[0], expected, rtol=1e-6)
    np.testing.assert_allclose(kern[1], expected, rtol=1e-6)
    ema = np.asarray(tr.state.ema_params["ConvBlock_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(ema[0], expected * 1.5, rtol=1e-6)

    torch.save({"current_epoch": 3, "model_state": t_sd},
               str(tmp_path / "sup.pth.tar"))
    tr2 = SupervisedTrainer(cfg(torch_init=str(tmp_path / "sup.pth.tar")))
    kern2 = np.asarray(tr2.state.params["ConvBlock_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(kern2, expected, rtol=1e-6)


def test_import_forward_parity():
    """Imported weights reproduce the reference's eval-mode forward:
    heatmap stacks and projected features match to float tolerance."""
    g, sd, k, n_stack = _load()
    params, stats = import_hourglass(sd, n_stack)
    model = create_pose_model(f"HG{n_stack}", k, "AvgPool", dtype=None)
    x = jnp.asarray(np.transpose(g["input"], (0, 2, 3, 1)))
    preds, feats = model.apply({"params": params, "batch_stats": stats},
                               x, train=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(preds), (0, 1, 4, 2, 3)), g["preds"],
        rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(feats), (0, 1, 4, 2, 3)), g["feats"],
        rtol=1e-4, atol=2e-4)
