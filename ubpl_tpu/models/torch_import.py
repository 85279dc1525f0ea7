"""Import reference PyTorch checkpoints into the flax hourglass.

Maps the reference StackedHourglass state_dict — the module tree built in
reference models/pose/hourglass.py:21-51 out of models/base/layers.py Conv
(:31-50), Residual (:53-84), recursive Hourglass (:87-111) and Merge
(:123-130), saved by the trainers as ``model_state`` /
``model{1,2}[_ema]_state`` (projects/supervised.py:90,
projects/MT_UBPL.py:96-103) — onto our flax StackedHourglass
(models/hourglass.py), so reference-trained weights can be served or
fine-tuned here without retraining.

Layout translation:
  * conv kernels  torch OIHW  ->  flax HWIO
  * BatchNorm     weight/bias -> params.scale/.bias,
                  running_mean/var -> batch_stats.mean/.var
  * ``num_batches_tracked`` and the reference's never-executed skip convs
    (``Residual.skip_layer`` params exist even when ``inp_dim == out_dim``
    but the forward skips them, layers.py:64-74) are dropped.

The mapping is derived structurally from both constructors (module
instantiation order fixes flax's auto names), not from key-string
heuristics, so it is exact for any ``n_stack``/``mode``.
"""
import numpy as np

__all__ = ["hourglass_entries", "import_hourglass", "export_hourglass",
           "load_reference_checkpoint", "warm_start_trainer"]


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


def _conv(entries, t, f, bn):
    """Reference Conv module at torch prefix `t` -> flax ConvBlock at `f`."""
    entries.append(("p", f + ("Conv_0", "kernel"), t + ".conv.weight", True))
    entries.append(("p", f + ("Conv_0", "bias"), t + ".conv.bias", False))
    if bn:
        entries.append(("p", f + ("BatchNorm_0", "scale"),
                        t + ".bn.weight", False))
        entries.append(("p", f + ("BatchNorm_0", "bias"),
                        t + ".bn.bias", False))
        entries.append(("s", f + ("BatchNorm_0", "mean"),
                        t + ".bn.running_mean", False))
        entries.append(("s", f + ("BatchNorm_0", "var"),
                        t + ".bn.running_var", False))


def _residual(entries, t, f, skip):
    """Reference Residual -> flax ResidualBlock.  `skip` mirrors the
    reference's need_skip (inp_dim != out_dim); when False the torch
    skip_layer params exist but are dead and are not mapped."""
    for i, bn in enumerate(("bn1", "bn2", "bn3")):
        entries.append(("p", f + (f"BatchNorm_{i}", "scale"),
                        f"{t}.{bn}.weight", False))
        entries.append(("p", f + (f"BatchNorm_{i}", "bias"),
                        f"{t}.{bn}.bias", False))
        entries.append(("s", f + (f"BatchNorm_{i}", "mean"),
                        f"{t}.{bn}.running_mean", False))
        entries.append(("s", f + (f"BatchNorm_{i}", "var"),
                        f"{t}.{bn}.running_var", False))
    off = 0
    if skip:
        _conv(entries, f"{t}.skip_layer", f + ("ConvBlock_0",), False)
        off = 1
    for j, c in enumerate(("conv1", "conv2", "conv3")):
        _conv(entries, f"{t}.{c}", f + (f"ConvBlock_{j + off}",), False)


def _hourglass(entries, t, f, n):
    """Reference recursive Hourglass -> flax HourglassBlock (increase=0, so
    every internal Residual is dim-preserving: no live skip convs)."""
    _residual(entries, f"{t}.up1", f + ("ResidualBlock_0",), False)
    _residual(entries, f"{t}.low1", f + ("ResidualBlock_1",), False)
    if n > 1:
        _hourglass(entries, f"{t}.low2", f + ("HourglassBlock_0",), n - 1)
        _residual(entries, f"{t}.low3", f + ("ResidualBlock_2",), False)
    else:
        _residual(entries, f"{t}.low2", f + ("ResidualBlock_2",), False)
        _residual(entries, f"{t}.low3", f + ("ResidualBlock_3",), False)


def hourglass_entries(n_stack, mode="AvgPool"):
    """(kind, flax_path, torch_key, is_conv_kernel) tuples for the whole
    StackedHourglass.  kind: "p" -> params, "s" -> batch_stats."""
    e = []
    # stem (reference hourglass.py:21-27): Conv7s2+BN, Residual 64->128
    # (live skip), Pool, Residual 128->128, Residual 128->256 (live skip)
    _conv(e, "pre.0", ("ConvBlock_0",), True)
    _residual(e, "pre.1", ("ResidualBlock_0",), True)
    _residual(e, "pre.3", ("ResidualBlock_1",), False)
    _residual(e, "pre.4", ("ResidualBlock_2",), True)
    convs_per_stack = 3 if mode == "ConvOne" else 2
    for i in range(n_stack):
        _hourglass(e, f"hgs.{i}.0", (f"HourglassBlock_{i}",), 4)
        _residual(e, f"features.{i}.0", (f"ResidualBlock_{3 + i}",), False)
        base = 1 + convs_per_stack * i
        _conv(e, f"features.{i}.1", (f"ConvBlock_{base}",), True)
        # mode="ConvOne": our ConvBlock_{base+1} projection has no runnable
        # torch counterpart (the reference declares a 128-ch conv that cannot
        # consume the 256-ch features, hourglass.py:98) — left at init.
        _conv(e, f"preds.{i}",
              (f"ConvBlock_{base + convs_per_stack - 1}",), False)
        if i < n_stack - 1:
            _conv(e, f"merge_preds.{i}.conv",
                  (f"Merge_{2 * i}", "ConvBlock_0"), False)
            _conv(e, f"merge_features.{i}.conv",
                  (f"Merge_{2 * i + 1}", "ConvBlock_0"), False)
    return e


def import_hourglass(state_dict, n_stack, mode="AvgPool", dtype=np.float32):
    """Convert a reference StackedHourglass state_dict (torch tensors or
    numpy arrays) into (params, batch_stats) nested dicts for our flax
    StackedHourglass.apply.  Raises KeyError on a missing torch key (wrong
    n_stack / not an hourglass checkpoint)."""
    params, stats = {}, {}
    for kind, fpath, tkey, is_kernel in hourglass_entries(n_stack, mode):
        w = np.asarray(state_dict[tkey], dtype)
        if is_kernel and w.ndim == 4:
            w = np.transpose(w, (2, 3, 1, 0))   # OIHW -> HWIO
        _set(params if kind == "p" else stats, fpath, w)
    return params, stats


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def export_hourglass(params, batch_stats, n_stack, mode="AvgPool"):
    """Inverse of import_hourglass: our flax (params, batch_stats) -> a
    reference-layout state_dict (numpy, torch key names, OIHW kernels), so
    models trained HERE can be evaluated/resumed by the reference code.

    The reference's dead parameters (skip_layer convs of dim-preserving
    Residuals, num_batches_tracked) have no counterpart here; they are
    synthesized (zeros / identity-shaped zeros are never executed by the
    reference forward, layers.py:64-74) so strict load_state_dict passes.
    """
    sd = {}
    for kind, fpath, tkey, is_kernel in hourglass_entries(n_stack, mode):
        w = np.asarray(_get(params if kind == "p" else batch_stats, fpath))
        if is_kernel and w.ndim == 4:
            w = np.transpose(w, (3, 2, 0, 1))   # HWIO -> OIHW
        sd[tkey] = w
    # synthesize the dead skip convs: every mapped Residual prefix that has
    # no live skip gets zero skip params shaped [out, inp, 1, 1]
    residuals = {}
    for key in list(sd):
        if key.endswith(".bn1.weight"):
            prefix = key[:-len(".bn1.weight")]
            inp = sd[prefix + ".bn1.weight"].shape[0]
            out = sd[prefix + ".conv3.conv.weight"].shape[0]
            residuals[prefix] = (inp, out)
    for prefix, (inp, out) in residuals.items():
        wkey = prefix + ".skip_layer.conv.weight"
        if wkey not in sd:
            sd[wkey] = np.zeros((out, inp, 1, 1), np.float32)
            sd[prefix + ".skip_layer.conv.bias"] = np.zeros(out, np.float32)
    for key in [k for k in sd if k.endswith(".running_mean")]:
        sd[key[:-len("running_mean")] + "num_batches_tracked"] = \
            np.asarray(0, np.int64)
    return sd


def load_reference_checkpoint(path, n_stack=3, mode="AvgPool", branch=1,
                              head="ema"):
    """Load a reference ``checkpoint[_best].pth.tar`` and import one network.

    branch: 1 or 2 (MT_UBPL/DualPose save two); head: "ema" prefers the
    teacher weights when present (validation/serving weights in every
    reference regime), "student" forces the student.  Falls back across the
    three reference layouts: model{branch}[_ema]_state (MT_UBPL/DualPose),
    model[_ema]_state (MT), model_state (supervised).
    """
    import torch
    ckpt = torch.load(path, map_location="cpu")
    candidates = ([f"model{branch}_ema_state", "model_ema_state"]
                  if head == "ema" else [])
    candidates += [f"model{branch}_state", "model_state"]
    key = next((k for k in candidates if k in ckpt), None)
    if key is None:
        raise KeyError(f"no model state in {path}: keys={list(ckpt)}")
    sd = {k: v.detach().cpu().numpy() for k, v in ckpt[key].items()}
    params, stats = import_hourglass(sd, n_stack, mode)
    meta = {"source_key": key,
            "current_epoch": int(ckpt.get("current_epoch", -1)),
            "best_acc": ckpt.get("best_acc")}
    return params, stats, meta


def warm_start_trainer(trainer, path):
    """Replace a freshly-constructed trainer's network weights with a
    reference checkpoint's (Config.torch_init): fine-tune reference-trained
    models here without retraining from scratch.

    Dual-branch regimes (MT_UBPL/DualPose) import both students and both
    EMA teachers; single regimes import branch 1 (EMA head falls back to
    the student for supervised checkpoints).  The optimizer state is
    re-initialized — the reference's Adam moments live in a different
    layout and a fresh fine-tune start is the standard choice.
    """
    import jax
    import jax.numpy as jnp
    cfg = trainer.cfg
    if not cfg.model.startswith("HG"):
        raise ValueError(f"torch_init supports the hourglass family, "
                         f"not {cfg.model}")
    n_stack = int(cfg.model[2:])
    mode = cfg.feature_mode

    def load(branch, head):
        p, s, meta = load_reference_checkpoint(path, n_stack, mode,
                                               branch, head)
        return (jax.tree_util.tree_map(jnp.asarray, p),
                jax.tree_util.tree_map(jnp.asarray, s), meta)

    def stack(a, b):
        return jax.tree_util.tree_map(lambda x, y: jnp.stack([x, y]), a, b)

    state = trainer.state
    fields = state._asdict()
    p1, s1, meta = load(1, "student")
    lead = jax.tree_util.tree_leaves(fields["params"])[0]
    stacked = lead.ndim == jax.tree_util.tree_leaves(p1)[0].ndim + 1
    if stacked:
        p2, s2, _ = load(2, "student")
        fields["params"], fields["batch_stats"] = stack(p1, p2), stack(s1, s2)
        if "ema_params" in fields:
            e1, t1, _ = load(1, "ema")
            e2, t2, _ = load(2, "ema")
            fields["ema_params"] = stack(e1, e2)
            fields["ema_batch_stats"] = stack(t1, t2)
    else:
        fields["params"], fields["batch_stats"] = p1, s1
        if "ema_params" in fields:
            e1, t1, _ = load(1, "ema")
            fields["ema_params"], fields["ema_batch_stats"] = e1, t1
    if "opt_state" in fields:
        fields["opt_state"] = trainer.tx.init(fields["params"])
    trainer.state = type(state)(**fields)
    return meta
