"""Shared trainer skeleton for all four regimes.

The reference duplicates the main()/train()/validate()/exec() skeleton across
projects/{supervised,MT,MT_UBPL,DualPose_UBPL}.py; here the common epoch
loop, data setup, multi-model validation, checkpointing, and JSON logging
live once, and each regime supplies its compiled train step.
"""
import datetime
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import get_datasource, materialize, valid_batches
from ..models import (create_pose_model, init_model, init_model_stacked,
                      param_count)
from ..ops import heatmap as HM
from ..ops import pck as PCK
from ..ops import augment as A
from ..utils import Logger, json_save
from . import losses as L
from ..data.arrays import pad_to_multiple
from .common import forward_heatmaps, put_dataset, update_pck_counters


def build_ema_state(tx, state_cls, params, batch_stats):
    """Construct a student/EMA-teacher state — state_cls's first five fields
    are (params, batch_stats, ema_params, ema_batch_stats, opt_state), the
    shape shared by the MT-family and classification trainers — in ONE
    jitted program.  Eager construction dispatches one tiny device op per
    leaf (seconds-to-minutes over a tunneled device link for HG3's hundreds
    of leaves); ``jnp.copy`` inside jit lowers to an HLO copy, so the EMA
    trees keep buffers distinct from the student params (the train step
    donates the state; aliased leaves must not be donated twice)."""
    cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    return jax.jit(
        lambda p, b: state_cls(p, b, cp(p), cp(b), tx.init(p)))(
            params, batch_stats)


class BaseTrainer:
    regime = "Base"
    #: names of the validated heads; "mean" appends an ensemble-mean row
    valid_heads: Tuple[str, ...] = ("model",)
    #: dual-teacher regimes can run the UBPL selection loop during training
    supports_pseudo_loop = False
    #: regimes with a primary/secondary loss split can run Config.optimizer
    #: = "mld" (reference utils/MLDOptim.py two-loss gradient surgery)
    supports_mld = False

    def __init__(self, cfg: Config, logger=None, mesh=None):
        from ..utils.xla_cache import enable_compilation_cache
        enable_compilation_cache()
        if cfg.optimizer not in ("adamw", "mld"):
            raise ValueError(f"unknown optimizer {cfg.optimizer!r} "
                             "(adamw | mld)")
        if cfg.optimizer == "mld" and not self.supports_mld:
            raise ValueError(
                "optimizer='mld' needs a primary/secondary loss split; "
                f"{self.regime} has a single loss group "
                "(supported: MT_UBPL, DualPose_UBPL)")
        if cfg.stream_data and cfg.scan_batches > 1:
            raise ValueError(
                "stream_data streams one batch per device call; "
                "scan_batches>1 gathers from the device-resident dataset "
                "inside lax.scan — pick one")
        if cfg.stream_data and cfg.pseudo_rounds > 0:
            raise ValueError(
                "pseudo_rounds runs UBPL selection over the device-resident "
                "training set; stream_data keeps it on host — pick one")
        self.cfg = cfg
        self.logger = logger or Logger(f"{cfg.data_source}_{self.regime}")
        self.mesh = mesh
        self._setup_data()
        self._setup_model()
        if cfg.torch_init:
            from ..models.torch_import import warm_start_trainer
            meta = warm_start_trainer(self, cfg.torch_init)
            self.logger.print(
                "L1", "=> warm start from reference checkpoint {} "
                "(epoch {}, {})".format(cfg.torch_init,
                                        meta["current_epoch"],
                                        meta["source_key"]))
        if mesh is not None:
            self._shard_for_mesh()
        self._build_steps()
        n = len(self.valid_heads)
        self.best_acc = [-1.0] * n
        self.best_epoch = [0] * n
        self.epoch = 0
        self._step_num = 0
        self._pseudo_loop = None
        self._pseudo_rounds_done = 0

    # ------------------------------------------------------------------ data
    def _setup_data(self):
        if self.cfg.synthetic_data:
            return self._setup_synthetic_data()
        cfg = self.cfg
        ds = get_datasource(cfg.data_source, data_root=cfg.data_root,
                            cache_dir=cfg.cache_dir, seed=cfg.seed)
        semi = ds.get_semi_data(cfg.train_count, cfg.valid_count,
                                cfg.label_ratio)
        cfg.kps_count = ds.kps_count
        cfg.inp_res, cfg.out_res = ds.inp_res, ds.out_res
        if cfg.force_inp_res:
            cfg.inp_res = cfg.force_inp_res
        if cfg.force_out_res:
            cfg.out_res = cfg.force_out_res
        cfg.pck_ref, cfg.pck_thr = tuple(ds.pck_ref), ds.pck_thr
        self.semi = semi
        self.labeled_idxs = list(semi.labeled_idxs)
        self.unlabeled_idxs = list(semi.unlabeled_idxs)
        self.n_train = len(semi.semi_train)
        self.n_valid = len(semi.valid)
        sharding, mult = self._dataset_sharding()
        self._place_train(
            pad_to_multiple(materialize(semi.semi_train, cfg.inp_res,
                                        cfg.io_workers), mult),
            semi.means, sharding)
        self.valid_data = put_dataset(
            pad_to_multiple(materialize(semi.valid, cfg.inp_res,
                                        cfg.io_workers), mult),
            semi.means, sharding)
        self.rng = np.random.default_rng(cfg.seed)
        self.means = jnp.asarray(semi.means, jnp.float32)
        self._setup_occluders()

    def _place_train(self, arrays, means, sharding):
        """Training-set placement: HBM-resident (default; per-step batch
        gathers happen inside the jitted step) or host-resident with
        per-batch streaming (Config.stream_data — for datasets larger than
        per-chip HBM; run_train_steps prefetches batch i+1's H2D transfer
        under step i's compute)."""
        if self.cfg.stream_data:
            self.train_host = arrays
            self.train_data = None
        else:
            self.train_host = None
            self.train_data = put_dataset(arrays, means, sharding)

    def _dataset_sharding(self):
        """HBM layout for the device-resident dataset: sample axis sharded
        over the batch mesh axes ('data', plus the outer cross-slice 'dcn'
        axis on multi-slice meshes — parallel/mesh.py): each chip holds N/d
        samples; per-step batch gathers lower to masked local gathers + a
        batch-sized all-reduce, NOT a dataset all-gather.  Replicated when
        there is no batch axis."""
        from ..parallel import mesh as pmesh
        axes = pmesh.batch_axes(self.mesh)
        if not axes:
            return None, 1
        from jax.sharding import NamedSharding
        return (NamedSharding(self.mesh, pmesh.batch_spec(self.mesh, 1)),
                pmesh.batch_mult(self.mesh))

    def _setup_occluders(self):
        """Occluder bank for use_occlusion (VOC2012 harvest or synthetic)."""
        self.occluder_bank = None
        cfg = self.cfg
        if not cfg.use_occlusion:
            return
        from ..data.occluders import build_occluder_bank
        from ..data.base import default_data_root
        voc = os.path.join(cfg.data_root or default_data_root(), "pascal",
                           "VOCdevkit", "VOC2012")
        rgb, alpha = build_occluder_bank(voc_root=voc, seed=cfg.seed)
        self.occluder_bank = (jax.device_put(rgb), jax.device_put(alpha))

    def _setup_synthetic_data(self):
        """Random in-memory dataset for benchmarks and multi-chip dryruns."""
        from ..data.arrays import PoseArrays
        cfg = self.cfg
        cfg.kps_count = cfg.synthetic_kps
        cfg.pck_ref = cfg.pck_ref or (1, 2)
        nprng = np.random.default_rng(cfg.seed)
        n_train, n_valid = cfg.train_count, cfg.valid_count
        K, R = cfg.kps_count, cfg.inp_res

        def make(n):
            imgs = nprng.integers(0, 256, (n, R, R, 3), dtype=np.uint8)
            kps = np.zeros((n, K, 3), np.float32)
            kps[..., 0:2] = nprng.uniform(16, R - 16, (n, K, 2))
            kps[..., 2] = 1.0
            return PoseArrays(imgs, kps, kps.copy(),
                              np.ones((n,), np.int32),
                              [str(i) for i in range(n)])

        train = make(n_train)
        n_lab = max(1, int(n_train * cfg.label_ratio))
        train.islabeled[n_lab:] = 0
        train.kps[n_lab:] = 0
        self.semi = None
        self.labeled_idxs = list(range(n_lab))
        self.unlabeled_idxs = list(range(n_lab, n_train))
        self.n_train, self.n_valid = n_train, n_valid
        means = [0.5, 0.5, 0.5]
        sharding, mult = self._dataset_sharding()
        self._place_train(pad_to_multiple(train, mult), means, sharding)
        self.valid_data = put_dataset(pad_to_multiple(make(n_valid), mult),
                                      means, sharding)
        self.rng = np.random.default_rng(cfg.seed)
        self.means = jnp.asarray(means, jnp.float32)
        self._setup_occluders()

    # ------------------------------------------------------------------ mesh
    def _shard_for_mesh(self):
        """Lay the model/optimizer state out over the mesh: stacked branch
        axis over 'model' (when present), everything else replicated; the
        dataset is already sharded over 'data' at placement time
        (_dataset_sharding) and batches get constrained to 'data' inside the
        step.  GSPMD inserts the ICI collectives."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self.mesh
        repl = NamedSharding(mesh, P())
        has_model = "model" in mesh.axis_names
        n_branch = getattr(self, "n_models", None)

        def place_state(x):
            if (has_model and hasattr(x, "ndim") and x.ndim >= 1
                    and n_branch and x.shape[0] == n_branch):
                return jax.device_put(x, NamedSharding(
                    mesh, P("model", *([None] * (x.ndim - 1)))))
            return jax.device_put(x, repl)

        self.state = jax.tree_util.tree_map(place_state, self.state)
        self.means = jax.device_put(self.means, repl)

    def make_branch_forward(self, model, dtype, train=True, n_branch=None,
                            stacked_images=False):
        """Forward over a stacked branch axis [n_branch, ...].

        Without a 'model' mesh axis: vmap over stacked params (images
        broadcast to a mapped axis — an unmapped conv operand makes vmap emit
        grouped convs the SPMD partitioner can't split).

        With a 'model' mesh axis: shard_map manual over 'model' (each branch
        runs plain convs on its own submesh; 'data' stays GSPMD-auto inside)
        — real branch parallelism on ICI.  n_branch may be any multiple of
        the axis size (e.g. 2 students + 2 teachers stacked as 4 over
        model=2: each submesh runs its local branches via vmap).

        stacked_images=True: images arrive pre-stacked [n_branch, B, ...]
        (per-branch views, e.g. DualPose's strong student / weak teacher).
        """
        n_branch = n_branch or self.n_models
        mesh = self.mesh
        remat = bool(self.cfg.remat) and train
        use_smap = mesh is not None and "model" in mesh.axis_names

        if not use_smap:
            if self.cfg.scan_branches:
                # lax.scan over the stacked branch axis: the per-branch
                # forward (and, under grad, its backward) is compiled ONCE
                # as the loop body instead of once per branch — each
                # iteration runs full-rate plain convs on the whole batch
                # (no grouped-conv penalty), with program size / compile
                # time / serialized-executable size ~independent of the
                # branch count.  The compile-time lever this environment
                # needs: the remote XLA compile of the fully-unrolled
                # MT_UBPL step costs ~6 min (docs/PERF.md round-5).
                #
                # The body is ALWAYS checkpointed under grad (scan-over-
                # layers + remat, the standard TPU pairing): without it the
                # scanned backward stacks every branch's full activation
                # set as loop residuals, which XLA schedules far less
                # tightly than the unrolled program's (measured: 50G HBM
                # demand vs ~14G unrolled at bs=32) — recomputing the
                # per-branch forward bounds residuals to the iteration
                # inputs.
                has_feats = getattr(model, "mode", "default") != "default"
                scan_remat = remat or train

                def fwd(params_m, bs_m, images):
                    def body(_, xs):
                        if stacked_images:
                            p, b, x = xs
                        else:
                            p, b = xs
                            x = images
                        (preds, feats), new_bs = forward_heatmaps(
                            model, p, b, x, train, dtype, remat=scan_remat)
                        ys = ((preds, feats, new_bs) if has_feats
                              else (preds, new_bs))
                        return (), ys

                    xs = ((params_m, bs_m, images) if stacked_images
                          else (params_m, bs_m))
                    _, ys = jax.lax.scan(body, (), xs)
                    if has_feats:
                        preds, feats, new_bs_m = ys
                    else:
                        (preds, new_bs_m), feats = ys, None
                    return (preds, feats), new_bs_m
                return fwd

            unroll = self.cfg.unroll_branches
            if unroll is None:          # auto: see Config.unroll_branches
                unroll = self.cfg.train_bs >= 16
            if unroll:
                # Unrolled: one plain (ungrouped) conv program per branch.
                # vmap over stacked params lowers every conv to an M-group
                # grouped convolution, which the TPU conv codegen runs below
                # the plain one (the 4-group fuse_teacher_forward variant
                # measured 40% slower, docs/PERF.md); unrolling trades a
                # bigger program for full-rate convs.
                def fwd(params_m, bs_m, images):
                    outs, bss = [], []
                    for m in range(n_branch):
                        take = lambda t: t[m]
                        out, new_bs = forward_heatmaps(
                            model, jax.tree_util.tree_map(take, params_m),
                            jax.tree_util.tree_map(take, bs_m),
                            images[m] if stacked_images else images,
                            train, dtype, remat=remat)
                        outs.append(out)
                        bss.append(new_bs)
                    preds = jnp.stack([o[0] for o in outs])
                    feats = (jnp.stack([o[1] for o in outs])
                             if outs[0][1] is not None else None)
                    new_bs_m = jax.tree_util.tree_map(
                        lambda *ts: jnp.stack(ts), *bss)
                    return (preds, feats), new_bs_m
                return fwd

            def fwd(params_m, bs_m, images):
                images_m = (images if stacked_images else jnp.broadcast_to(
                    images, (n_branch,) + images.shape))

                def one(p, b, x):
                    return forward_heatmaps(model, p, b, x, train, dtype,
                                            remat=remat)

                return jax.vmap(one)(params_m, bs_m, images_m)
            return fwd

        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        m_size = mesh.shape["model"]
        if n_branch % m_size != 0:
            raise ValueError(f"branch axis {n_branch} not divisible by "
                             f"'model' mesh axis ({m_size})")
        local_n = n_branch // m_size

        def body(p_local, b_local, images):
            if local_n == 1 and not stacked_images:
                p = jax.tree_util.tree_map(lambda t: t[0], p_local)
                b = jax.tree_util.tree_map(lambda t: t[0], b_local)
                (preds, feats), new_b = forward_heatmaps(model, p, b, images,
                                                         train, dtype,
                                                         remat=remat)
                expand = lambda t: t[None]
                return (expand(preds), expand(feats),
                        jax.tree_util.tree_map(expand, new_b))
            images_l = (images if stacked_images else jnp.broadcast_to(
                images, (local_n,) + images.shape))
            (preds, feats), new_b = jax.vmap(
                lambda p, b, x: forward_heatmaps(model, p, b, x, train,
                                                 dtype, remat=remat))(
                                                     p_local, b_local,
                                                     images_l)
            return preds, feats, new_b

        img_spec = P("model") if stacked_images else P()
        sm = shard_map(body, mesh=mesh,
                       in_specs=(P("model"), P("model"), img_spec),
                       out_specs=P("model"), check_vma=False,
                       axis_names={"model"})

        def fwd(params_m, bs_m, images):
            preds, feats, new_bs = sm(params_m, bs_m, images)
            return (preds, feats), new_bs

        return fwd

    def constrain_batch(self, x):
        """Inside-step hint: shard the batch dim over the batch mesh axes
        ('data', plus 'dcn' across slices on multi-slice meshes)."""
        from ..parallel import mesh as pmesh
        axes = pmesh.batch_axes(self.mesh)
        if not axes:
            return x
        d = pmesh.batch_mult(self.mesh)
        if x.shape[0] % d != 0:
            raise ValueError(
                f"global batch {x.shape[0]} is not divisible by the batch "
                f"mesh axes {axes} (x{d}); set train_bs to a multiple of "
                "it, shrink the mesh (e.g. --mesh_shape=1 runs "
                "single-device, matching the reference's small-batch "
                "configs), or see docs/MIGRATION.md §meshes")
        from jax.sharding import NamedSharding
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, pmesh.batch_spec(self.mesh, x.ndim)))

    # ------------------------------------------------------------- step exec
    def compile_train_step(self, step):
        """jit the per-batch step; with cfg.scan_batches > 1 also build a
        lax.scan variant running k stacked batches per device call (amortizes
        dispatch overhead — the reference's bs=4 configs are dispatch-bound
        as single steps)."""
        cfg = self.cfg
        donate = (0,) if cfg.donate_state else ()
        self.train_step = jax.jit(step, donate_argnums=donate)
        self.train_scan_step = None
        if cfg.scan_batches > 1:
            def scan_step(state, idxs_stack, step0, *sched):
                offs = jnp.arange(idxs_stack.shape[0])

                def body(st, inp):
                    off, idxs = inp
                    return step(st, idxs, step0 + 1 + off, *sched)

                return jax.lax.scan(body, state, (offs, idxs_stack))

            self.train_scan_step = jax.jit(scan_step, donate_argnums=donate)

    def fetch_batch(self, data, batch):
        """Per-step data entry inside the jitted step.  Resident mode: `batch`
        is the index vector, gathered from the HBM dataset.  stream_data:
        `batch` is the already-transferred (images, kps, islabeled) triple."""
        if self.cfg.stream_data:
            imgs, kps, islabeled = batch
            return (self.constrain_batch(imgs), self.constrain_batch(kps),
                    islabeled)
        return (self.constrain_batch(data.images[batch]),
                self.constrain_batch(data.kps[batch]),
                data.islabeled[batch])

    def _batch_put(self):
        """H2D placement for streamed batches (batch dim over the batch mesh
        axes — 'data', plus 'dcn' on multi-slice meshes)."""
        from ..parallel import mesh as pmesh
        if pmesh.batch_axes(self.mesh):
            from jax.sharding import NamedSharding
            mesh = self.mesh

            def put(arrs):
                return tuple(
                    jax.device_put(x, NamedSharding(
                        mesh, pmesh.batch_spec(mesh, x.ndim)))
                    for x in arrs)
            return put
        return lambda arrs: tuple(jnp.asarray(x) for x in arrs)

    def _stream_batches(self, batch_iter):
        """Host-gather each batch and issue its H2D transfer one batch ahead
        of consumption, so the copy of batch i+1 overlaps step i's compute
        (jax device_put is async)."""
        host = self.train_host
        put = self._batch_put()
        pending = None
        for idxs in batch_iter:
            i = np.asarray(idxs)
            nxt = put((host.images[i], host.kps[i], host.islabeled[i]))
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    def run_train_steps(self, batch_iter, *sched_args):
        """Drive one epoch's batches through train_step (and the scan variant
        for full k-chunks).  Returns per-step metric dicts; host sync is
        deferred to the caller's reduction (keeps the device queue full)."""
        k = self.cfg.scan_batches
        raw = []
        stream = self.cfg.stream_data

        def plain(batch):
            self._step_num += 1
            self.state, m = self.train_step(
                self.state, batch if stream else jnp.asarray(batch),
                self._step_num, *sched_args)
            raw.append((m, 0))

        if stream:
            for batch in self._stream_batches(batch_iter):
                plain(batch)
        elif k <= 1 or self.train_scan_step is None:
            for idxs in batch_iter:
                plain(idxs)
        else:
            buf = []
            for idxs in batch_iter:
                buf.append(np.asarray(idxs))
                if len(buf) == k:
                    stack = jnp.asarray(np.stack(buf))
                    step0 = self._step_num
                    self._step_num += k
                    self.state, ms = self.train_scan_step(
                        self.state, stack, step0, *sched_args)
                    raw.append((ms, k))
                    buf = []
            for idxs in buf:    # leftover partial chunk: plain steps
                plain(idxs)
        metrics = []
        for m, kk in raw:
            if kk == 0:
                metrics.append(m)
            else:
                for i in range(kk):
                    metrics.append(jax.tree_util.tree_map(
                        lambda t, i=i: t[i], m))
        return metrics

    # ----------------------------------------------------------------- model
    def _make_model(self):
        cfg = self.cfg
        self.compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                              else None)
        return create_pose_model(cfg.model, cfg.kps_count, cfg.feature_mode,
                                 dtype=self.compute_dtype)

    def _init_n(self, model, n: Optional[int]):
        """Init one set of variables (n=None) or n stacked sets (branch axis).

        Both paths are single jitted programs (models/factory.py): eager
        flax init dispatches hundreds of tiny ops individually, which costs
        minutes over a high-latency device link (the round-3 bench timeout
        was exactly this)."""
        cfg = self.cfg
        sample = jnp.zeros((1, cfg.inp_res, cfg.inp_res, 3), jnp.float32)
        if n is None:
            return init_model(model, jax.random.PRNGKey(cfg.seed), sample)
        rngs = jnp.stack([jax.random.PRNGKey(cfg.seed + i) for i in range(n)])
        return init_model_stacked(model, rngs, sample)

    def _jit_build_state(self, build, params, batch_stats):
        """Construct the trainer state pytree in ONE jitted program.

        Eager construction (EMA tree copies + optimizer init) dispatches
        one tiny device op per leaf — seconds-to-minutes over a tunneled
        device link for HG3's hundreds of leaves.  ``jnp.copy`` inside jit
        lowers to an HLO copy, so EMA leaves keep buffers distinct from
        the student params (the train step donates the state; aliased
        leaves must not be donated twice)."""
        return jax.jit(build)(params, batch_stats)

    def _jit_build_ema_state(self, state_cls, params, batch_stats):
        return build_ema_state(self.tx, state_cls, params, batch_stats)

    def _log_model_init(self, params, label):
        self.logger.print("L1", "=> initialized {} ({}) Structure (params: {:.2f}M)"
                          .format(label, self.cfg.model,
                                  param_count(params) / 1024 ** 2))

    # ------------------------------------------------------------ validation
    def _build_validate_multi(self, model, n_heads, with_mean):
        """Jitted eval over stacked head variables [n_heads, ...]."""
        cfg = self.cfg
        means = self.means
        dtype = self.compute_dtype
        pck_ref = tuple(int(i) for i in cfg.pck_ref)
        pck_thr = float(cfg.pck_thr)

        @jax.jit
        def step(params_stacked, bs_stacked, images_u8, kps):
            B = images_u8.shape[0]
            imgs = A.color_normalize(images_u8.astype(jnp.float32) / 255.0,
                                     means)

            def fwd(p, b):
                (preds, _), _ = forward_heatmaps(model, p, b, imgs, False,
                                                 dtype)
                return preds[:, -1]

            last = jax.vmap(fwd)(params_stacked, bs_stacked)  # [M, B, H, W, K]
            center = jnp.full((B, 2), cfg.inp_res // 2, jnp.float32)
            scale = jnp.full((B,), cfg.inp_res / 200.0, jnp.float32)
            coords, coords_mean, scores, _ = HM.decode_heatmaps_mul(
                last, center, scale, (cfg.out_res, cfg.out_res))
            if with_mean:
                coords = jnp.concatenate([coords, coords_mean[None]], 0)
            errs, accs = jax.vmap(
                lambda c: PCK.acc_pck(c, kps, pck_ref, pck_thr))(coords)
            return coords, errs, accs

        return step

    def _validate_heads(self, validate_step, params_stacked, bs_stacked):
        """Generic multi-head validation loop with reference counter weighting."""
        cfg = self.cfg
        n_heads = len(self.valid_heads)
        acc_cs = [L.AvgCounters() for _ in range(n_heads)]
        err_cs = [L.AvgCounters() for _ in range(n_heads)]
        preds_arrays = [[] for _ in range(n_heads)]
        k = cfg.kps_count
        for idxs in valid_batches(self.n_valid, cfg.infer_bs):
            imgs = self.valid_data.images[jnp.asarray(idxs)]
            kps = self.valid_data.kps[jnp.asarray(idxs)]
            coords, errs, accs = validate_step(params_stacked, bs_stacked,
                                               imgs, kps)
            coords, errs, accs = (np.asarray(coords), np.asarray(errs),
                                  np.asarray(accs))
            for m in range(n_heads):
                preds_arrays[m] += coords[m].tolist()
                update_pck_counters(acc_cs[m], err_cs[m], accs[m], errs[m],
                                    len(idxs), k)
        return (preds_arrays, [c.avg() for c in acc_cs],
                [c.avg() for c in err_cs])

    # ------------------------------------------------------------- main loop
    def epoch_schedules(self, epo) -> dict:
        """Per-epoch scalar hyper-params (overridden by SSL regimes)."""
        return {}

    def train_epoch(self, epo, schedules) -> dict:
        raise NotImplementedError

    def validate(self):
        raise NotImplementedError

    def format_epoch_log(self, losses, accs, errs) -> str:
        head = self.valid_heads[-1]
        return ("losses: " + ", ".join(f"{k}={v:.5f}" for k, v in losses.items())
                + f" | [{head}] acc: {accs[-1][-1]:.5f}, err: {errs[-1][-1]:.3f}")

    def resume(self, base_path, best=False):
        """Restore state + counters; returns the epoch to continue from.
        (The reference saves checkpoints but start_epoch is pinned 0 —
        resume is new, working surface here.)"""
        from .checkpointing import restore_checkpoint
        state, meta = restore_checkpoint(base_path, self.state, best=best)
        if state is None:
            return 0
        self.state = state
        ba = meta.get("best_acc", self.best_acc)
        be = meta.get("best_epoch", self.best_epoch)
        self.best_acc = list(np.atleast_1d(ba))
        self.best_epoch = [int(e) for e in np.atleast_1d(be)]
        self._restore_pseudo_state(meta)
        return int(meta["current_epoch"]) + 1

    def _ensure_pseudo_loop(self):
        """Construct the PseudoLabelingLoop lazily.  Must run while
        train_data is pristine (the loop snapshots the pre-injection
        kps/islabeled arrays as its reset baseline)."""
        if self._pseudo_loop is None:
            from .pseudo_loop import PseudoLabelingLoop
            cfg = self.cfg
            self._pseudo_loop = PseudoLabelingLoop(
                self, aug_views=cfg.pseudo_aug_views,
                reliable_pct=cfg.pseudo_reliable_pct,
                batch_size=cfg.infer_bs)
        return self._pseudo_loop

    def _pseudo_checkpoint_meta(self):
        """Pseudo-round state for the checkpoint: rounds spent, the injected
        train arrays, and the LMA distance histories, so a resumed run
        continues from the same dataset and round budget as an uninterrupted
        one (rather than silently resetting both)."""
        if self._pseudo_rounds_done == 0:
            return {}
        meta = {"pseudo_rounds_done": self._pseudo_rounds_done,
                "pseudo_kps": np.asarray(self.train_data.kps),
                "pseudo_islabeled": np.asarray(self.train_data.islabeled)}
        loop = self._pseudo_loop
        if loop is not None and loop.lma_ext is not None:
            meta["pseudo_lma"] = np.stack(
                [loop.lma_int[0].history, loop.lma_int[1].history,
                 loop.lma_ext.history])
        return meta

    def _restore_pseudo_state(self, meta):
        rounds = meta.get("pseudo_rounds_done")
        if not rounds or not self.supports_pseudo_loop:
            return
        saved_kps = np.asarray(meta["pseudo_kps"])
        if saved_kps.shape != tuple(self.train_data.kps.shape):
            # dataset padding depends on the mesh ('data'-axis multiple), so
            # a checkpoint from a host with a different device count can
            # carry differently-padded arrays — fail loudly rather than
            # swap in mismatched rows
            raise ValueError(
                f"pseudo-state resume: checkpointed kps {saved_kps.shape} "
                f"vs dataset {tuple(self.train_data.kps.shape)} — the "
                "checkpoint was written with a different mesh/device count; "
                "resume on a matching mesh (mesh_shape) or restart the "
                "pseudo rounds")
        # build the loop first: its reset baseline must be the PRISTINE
        # arrays, and train_data is still pristine at resume time
        loop = self._ensure_pseudo_loop()
        self._pseudo_rounds_done = int(rounds)
        self.train_data = self.train_data._replace(
            kps=jax.device_put(np.asarray(meta["pseudo_kps"]),
                               self.train_data.kps.sharding),
            islabeled=jax.device_put(np.asarray(meta["pseudo_islabeled"]),
                                     self.train_data.islabeled.sharding))
        self._build_steps()
        lma = meta.get("pseudo_lma")
        if lma is not None and loop.lma_ext is not None:
            lma = np.asarray(lma)
            loop.lma_int[0].history = lma[0]
            loop.lma_int[1].history = lma[1]
            loop.lma_ext.history = lma[2]
        self.logger.print(
            "L2", "resumed pseudo-round state: {} round(s) spent, "
            "{} sample(s) in the labeled pool".format(
                self._pseudo_rounds_done,
                int(np.asarray(self.train_data.islabeled).sum())))

    def maybe_pseudo_round(self, epo, base_path=None):
        """cfg.pseudo_rounds > 0: run one UBPL selection round every
        pseudo_interval epochs (dual-teacher regimes only) — the reference's
        dormant business.py + dataset.update workflow as a first-class
        trainer feature.  Returns the Selection or None."""
        cfg = self.cfg
        if not (self.supports_pseudo_loop and cfg.pseudo_rounds > 0):
            return None
        if (epo + 1) % max(cfg.pseudo_interval, 1) != 0:
            return None
        if self._pseudo_rounds_done >= cfg.pseudo_rounds:
            return None
        if not self.unlabeled_idxs:
            return None
        self._ensure_pseudo_loop()
        sel, ens = self._pseudo_loop.round(
            jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 7919 + epo))
        self._pseudo_rounds_done += 1
        n_sel = int(sel.sel_counts[-1])
        self.logger.print(
            "L1", "[pseudo round {}/{}] selected {} kps "
            "(sel acc: {:.4f}, sel err: {:.3f}, thr: {:.4f})".format(
                self._pseudo_rounds_done, cfg.pseudo_rounds, n_sel,
                float(sel.sel_accs[-1]), float(sel.sel_errs[-1]),
                sel.threshold))
        if base_path:
            json_save({"epoch": epo + 1, "selected": n_sel,
                       "threshold": sel.threshold,
                       "sel_counts": np.asarray(sel.sel_counts).tolist(),
                       "sel_accs": np.asarray(sel.sel_accs).tolist(),
                       "sel_errs": np.asarray(sel.sel_errs).tolist()},
                      f"{base_path}/logs/pseudoRounds/round_{epo + 1}.json",
                      is_cover=True)
        return sel

    def maybe_debug_draw(self, base_path, epo):
        """cfg.debug: dump the first labeled batch's augmentation stages
        (reference --debug draw surface)."""
        if not (self.cfg.debug and base_path):
            return
        from ..utils.draw import DebugDrawer
        from .common import make_view
        cfg = self.cfg
        idxs = np.asarray(self.labeled_idxs[:min(4, len(self.labeled_idxs))])
        if self.train_data is not None:
            imgs = self.train_data.images[jnp.asarray(idxs)]
            kps = self.train_data.kps[jnp.asarray(idxs)]
        else:   # stream_data: gather from the host-resident arrays
            imgs = jnp.asarray(self.train_host.images[idxs])
            kps = jnp.asarray(self.train_host.kps[idxs])
        view = make_view(jax.random.PRNGKey(cfg.seed + epo), imgs, kps,
                         jnp.zeros(3), cfg, augment=True)
        ids = [str(i) for i in idxs]
        DebugDrawer(base_path).dump_view(ids, view, prefix=f"epo{epo + 1}_")

    def run(self, base_path=None, start_epoch=0, resume=False):
        cfg = self.cfg
        if resume and base_path:
            start_epoch = self.resume(base_path)
        history = []
        for epo in range(start_epoch, cfg.epochs):
            epo_tm = datetime.datetime.now()
            self.epoch = epo
            self.maybe_debug_draw(base_path, epo)
            schedules = self.epoch_schedules(epo)
            from ..utils.profiling import trace
            with trace(cfg.profile_dir,
                       enabled=cfg.profile_dir is not None
                       and epo == start_epoch):
                losses = self.train_epoch(epo, schedules)
            preds, accs, errs = self.validate()
            self.maybe_pseudo_round(epo, base_path)
            is_best = []
            for m in range(len(self.valid_heads)):
                flag = accs[m][-1] > self.best_acc[m]
                is_best.append(flag)
                if flag:
                    self.best_epoch[m], self.best_acc[m] = epo, accs[m][-1]
            if base_path:
                from .checkpointing import save_checkpoint
                save_checkpoint(base_path, epo, self.state, is_best[-1],
                                extra={"best_acc": self.best_acc,
                                       "best_epoch": self.best_epoch,
                                       **self._pseudo_checkpoint_meta()})
                if epo == start_epoch:
                    cfg.to_json(f"{base_path}/logs/args.json")
                json_save({**losses, "accs": accs, "errs": errs},
                          f"{base_path}/logs/logData/logData_{epo + 1}.json",
                          is_cover=True)
                json_save({"predsArraies": preds},
                          f"{base_path}/logs/pseudoData/pseudoData_{epo + 1}.json",
                          is_cover=True)
            self.logger.print(
                "L1", "[{:3d}/{:3d}] | best acc: {:.5f} (epo: {:3d}) | {}"
                .format(epo + 1, cfg.epochs, self.best_acc[-1],
                        self.best_epoch[-1] + 1,
                        self.format_epoch_log(losses, accs, errs)),
                start=epo_tm)
            history.append({**losses, "accs": accs, "errs": errs})
            if base_path and self._preemption_requested():
                self.logger.print("L1", "preemption requested — checkpointed "
                                        f"at epoch {epo + 1}; resume with "
                                        "run(resume=True)")
                break
        if base_path:
            self._write_report(base_path, history)
        return history

    def _preemption_requested(self):
        # opt-in: only honored when a PreemptionGuard was installed
        # (e.g. by exec_home / production drivers)
        from ..utils.preemption import PreemptionGuard
        guard = PreemptionGuard._installed
        return bool(guard and guard.requested)

    def _write_report(self, base_path, history):
        """End-of-run metric table (reference xlsx dumps -> CSV/markdown)."""
        from ..utils.report import RunReport
        loss_keys = [k for k in history[0] if k not in ("accs", "errs")]
        rep = RunReport(["epoch", *loss_keys, "acc", "err"])
        for epo, h in enumerate(history):
            row = {"epoch": epo + 1, "acc": h["accs"][-1][-1],
                   "err": h["errs"][-1][-1]}
            for k in loss_keys:
                v = h[k]
                row[k] = float(np.mean(v)) if isinstance(v, (list, tuple)) else v
            rep.add_row(**row)
        rep.to_csv(f"{base_path}/logs/report.csv", highlight_column="acc")
        rep.to_markdown(f"{base_path}/logs/report.md", highlight_column="acc")
        rep.to_xlsx(f"{base_path}/logs/report.xlsx", highlight_column="acc")

    # --------------------------------------------------------------- helpers
    def sample_weights(self, islabeled, pseudo_weight):
        """Reference ProjectTools weights (projects/tools.py:14-54):
        pos (labeled=1, else 0), nega (unlabeled=pseudoWeight, else 0),
        cons (labeled=1, unlabeled=pseudoWeight)."""
        lab = (islabeled > 0).astype(jnp.float32)
        pos = lab
        nega = (1.0 - lab) * pseudo_weight
        cons = lab + (1.0 - lab) * pseudo_weight
        return pos, nega, cons


def make_experiment(cfg: Config, exp_mark: str):
    """Reference exec(): experiment naming + logger + base path."""
    experiment = "{}({}_{})_{}_{}".format(
        cfg.data_source, cfg.train_count, cfg.label_ratio, exp_mark,
        datetime.datetime.now().strftime("%Y%m%d%H%M%S"))
    base_path = f"{cfg.experiment_root}/{experiment}"
    logger = Logger(experiment, base_path=base_path)
    return experiment, base_path, logger


def run_regime(trainer_cls, exp_mark: str, params=None):
    """Shared exec() body for every regime's entry point: config override,
    experiment naming, and the production device mesh (Config.mesh_shape/
    mesh_axes via parallel.build_mesh — default: all local devices as 'data')."""
    from ..parallel import build_mesh
    cfg = Config().override(params)
    np.random.seed(cfg.seed)
    _, base_path, logger = make_experiment(cfg, exp_mark)
    mesh = build_mesh(cfg)
    if mesh is not None:
        logger.print("L1", "=> mesh {} over {} devices".format(
            dict(mesh.shape), mesh.devices.size))
    return trainer_cls(cfg, logger, mesh=mesh).run(base_path)
