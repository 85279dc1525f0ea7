"""Experiment configuration (replaces the reference's per-trainer argparse +
GLOB.py hardcoded paths).

One dataclass carries the ~30 flags shared by the four regimes
(projects/supervised.py:245-289, projects/MT_UBPL.py:444-508) plus TPU-native
knobs (mesh shape, dtype, donation).  String-boolean coercion ("True"/"False")
from the reference's setArgs is handled in `override`.
"""
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass
class Config:
    # Model
    model: str = "HG3"                  # HG3 | HG2 | LitePose
    feature_mode: str = "AvgPool"       # default | MaxPool | AvgPool | ConvOne
    br_num: int = 2                     # ensemble branches (MT_UBPL/DualPose)
    br_aug_num: int = 1                 # augmented views per branch
    br_gt_num: int = 1                  # ground-truth sets per view; accepted
                                        # for reference flag parity (its
                                        # gtCount>1 path is never exercised
                                        # by any reference trainer either)

    # Dataset
    data_source: str = "Mouse"          # Mouse | FLIC | LSP | AP10K | FLY | Pranav
    train_count: int = 100
    valid_count: int = 500
    label_ratio: float = 0.3
    data_root: Optional[str] = None
    cache_dir: Optional[str] = None

    # Training strategy
    epochs: int = 100
    train_bs: int = 4
    train_bs_labeled: int = 2
    infer_bs: int = 128
    lr: float = 2.5e-4
    wd: float = 0.0
    optimizer: str = "adamw"            # adamw | mld.  "mld" wraps adamw in
                                        # the reference's Multiple-Loss-
                                        # Decomposition surgery (utils/
                                        # MLDOptim.py — shipped but dormant
                                        # upstream; first-class here on the
                                        # dual-branch trainers): primary =
                                        # supervised pose loss, secondary =
                                        # consistency terms (MTC+EPC+FDC)
    mld_alpha: float = 0.5              # fraction of the secondary gradient's
                                        # vertical component removed (the
                                        # reference exposes alpha with no
                                        # default; 0.5 is ours)
    power: float = 0.9                  # reference --power (lr-decay power);
                                        # the reference parses but never
                                        # consumes it — kept so reference
                                        # param dicts round-trip

    # Augmentation
    use_flip: bool = True
    scale_range: float = 0.25
    rot_range: float = 30.0
    use_occlusion: bool = False
    num_occluder: int = 8
    # teacher-view augmentation (DualPose weak view)
    scale_range_ema: float = 0.25
    rot_range_ema: float = 30.0
    use_occlusion_ema: bool = False
    num_occluder_ema: int = 8

    # Loss weights / SSL hyper-params
    pose_weight: float = 10.0
    cons_weight_max: float = 10.0
    cons_weight_min: float = 0.0
    cons_weight_rampup: int = 5
    fdl_type: str = "covariance"        # covariance | distance
    fdl_label: str = "labeled"          # all | labeled | unlabeled
    fdl_weight_max: float = 1.0
    fdl_weight_min: float = 1.0
    fdl_weight_rampup: int = 100
    use_ensemble_pseudo: bool = True
    ensemble_pseudo_weight: float = 10.0
    pseudo_weight_max: float = 1.0
    pseudo_weight_min: float = 1.0
    pseudo_weight_rampup: int = 100
    pseudo_score_thr: float = 0.95
    ema_decay: float = 0.999
    # UBPL selection loop (reference utils/business.py + dataset.update —
    # shipped but never wired into a trainer there; first-class here).
    # pseudo_rounds > 0 runs a selection round every pseudo_interval epochs
    # during MT_UBPL/DualPose training: dual-teacher ensemble scoring,
    # reliability-quantile selection, selected keypoints injected into the
    # training pool (islabeled flips to 1, as dataset_mds.update:14-25 does).
    pseudo_rounds: int = 0
    pseudo_interval: int = 10
    pseudo_reliable_pct: float = 0.5
    pseudo_aug_views: int = 2

    # migration: path to a reference ckpts/checkpoint[_best].pth.tar — the
    # trainer starts from its weights (models/torch_import.py; dual regimes
    # import both branches + EMA teachers) instead of fresh init
    torch_init: str = ""

    # misc
    seed: int = 1388
    debug: bool = False
    profile_dir: Optional[str] = None   # capture a jax.profiler trace of the
                                        # first training epoch into this dir
    experiment_root: str = field(
        default_factory=lambda: os.environ.get("UBPL_EXPR_ROOT", "./experiments"))
    program: str = "ubpl_tpu-0.1"

    # TPU-native
    # mesh_shape None -> all local devices on a ("data",) axis (single-device
    # -> no mesh).  CLI strings accepted: --mesh_shape=2,4 --mesh_axes=model,data
    # Multi-slice pods: include a "dcn" axis (e.g. --mesh_shape=2,8
    # --mesh_axes=dcn,data) — the batch shards over ("dcn","data") and the
    # only cross-slice traffic is the per-step gradient all-reduce; on real
    # multi-slice hardware the axis is laid along the physical slice boundary
    # (parallel/mesh.py:_hybrid_mesh).
    mesh_shape: Optional[Tuple[int, ...]] = None
    mesh_axes: Tuple[str, ...] = ("data",)
    compute_dtype: str = "bfloat16"     # conv/matmul compute dtype
    donate_state: bool = True
    fold_views: bool = False            # concat the 2 views into one batched
                                        # forward (BN stats pool over both
                                        # views; reference computes them
                                        # per-view).  Measured neutral on
                                        # v5e at bs=32 (128 vs 133 img/s)
    fuse_teacher_forward: bool = False  # stack students+teachers as one
                                        # 2M-network branch axis (one batched
                                        # forward per view).  Semantically
                                        # equivalent (tests/test_step_exec)
                                        # but measured SLOWER on v5e: the
                                        # 4-group grouped convs run ~40%
                                        # under the 2-group ones (78 vs 133
                                        # img/s at bs=32) — default off.
    stream_data: bool = False           # keep the TRAINING set host-resident
                                        # and stream each batch to HBM with a
                                        # one-batch prefetch (batch i+1's H2D
                                        # overlaps step i's compute) instead
                                        # of staging the whole set in HBM —
                                        # for datasets larger than per-chip
                                        # HBM.  Validation stays resident.
                                        # Incompatible with scan_batches>1
                                        # and pseudo_rounds>0 (both gather
                                        # from the resident set)
    remat: bool = False                 # jax.checkpoint the training forward:
                                        # backward recomputes activations
                                        # instead of holding them in HBM —
                                        # enables memory-bound batch sizes
                                        # (bs=64 measured activation-pressure-
                                        # limited, docs/PERF.md) at ~1 extra
                                        # forward of FLOPs.  Identical math
                                        # (tests/test_step_exec.py)
    scan_batches: int = 1               # >1: lax.scan k train batches per
                                        # device call (amortizes dispatch for
                                        # the reference's small bs=4 steps)
    unroll_branches: Optional[bool] = None
                                        # forward the branch ensemble as one
                                        # plain conv program per branch
                                        # instead of one vmap (grouped-conv)
                                        # program over stacked params.  None
                                        # = auto: unroll when train_bs >= 16
                                        # (measured +4% at bs=32; the grouped
                                        # conv is FASTER at bs=4 where it
                                        # feeds the MXU a 2x batch) — see
                                        # make_branch_forward + docs/PERF.md
    scan_branches: bool = False         # lax.scan the branch ensemble: the
                                        # per-branch fwd (+bwd) body compiles
                                        # ONCE regardless of branch count —
                                        # plain full-rate convs like unroll
                                        # but ~2x smaller program / compile
                                        # time.  Takes precedence over
                                        # unroll_branches (single-host path)
    # NOTE on BatchNorm under data parallelism: batches are sharded over the
    # 'data' mesh axis with GSPMD, so BN statistics are computed over the
    # GLOBAL logical batch by construction — identical math to single-device
    # execution (asserted by tests/test_sharding.py equivalence test).  There
    # is deliberately no sync_bn knob: nothing to toggle.
    io_workers: int = 16

    # synthetic data (benchmarks / multi-chip dryruns — no disk IO)
    synthetic_data: bool = False
    synthetic_kps: int = 9
    # shrink resolutions below the datasource's native 256/64 (fast tests)
    force_inp_res: Optional[int] = None
    force_out_res: Optional[int] = None

    # filled from the datasource at setup
    kps_count: int = 0
    inp_res: int = 256
    out_res: int = 64
    pck_ref: Sequence[int] = ()
    pck_thr: float = 0.5

    # reference argparse flag -> Config field (so reference-style param
    # dicts, e.g. exec.py's {"dataSource": ..., "trainCount": ...}, work)
    REFERENCE_ALIASES = {
        "dataSource": "data_source", "trainCount": "train_count",
        "validCount": "valid_count", "labelRatio": "label_ratio",
        "trainBS": "train_bs", "trainBS_labeled": "train_bs_labeled",
        "inferBS": "infer_bs", "useFlip": "use_flip",
        "scaleRange": "scale_range", "rotRange": "rot_range",
        "useOcclusion": "use_occlusion", "numOccluder": "num_occluder",
        "scaleRange_ema": "scale_range_ema", "rotRange_ema": "rot_range_ema",
        "useOcclusion_ema": "use_occlusion_ema",
        "numOccluder_ema": "num_occluder_ema",
        "poseWeight": "pose_weight",
        "consWeight_max": "cons_weight_max",
        "consWeight_min": "cons_weight_min",
        "consWeight_rampup": "cons_weight_rampup",
        "FDL_type": "fdl_type", "FDL_label": "fdl_label",
        "FDLWeight_max": "fdl_weight_max", "FDLWeight_min": "fdl_weight_min",
        "FDLWeight_rampup": "fdl_weight_rampup",
        "useEnsemblePseudo": "use_ensemble_pseudo",
        "ensemblePseudoWeight": "ensemble_pseudo_weight",
        "pseudoWeight_max": "pseudo_weight_max",
        "pseudoWeight_min": "pseudo_weight_min",
        "pseudoWeight_rampup": "pseudo_weight_rampup",
        "pseudoScoreThr": "pseudo_score_thr",
        "ema_decay": "ema_decay", "feature_mode": "feature_mode",
        "brNum": "br_num", "br_augNum": "br_aug_num", "br_gtNum": "br_gt_num",
    }

    def override(self, params: Optional[dict]):
        """Reference setArgs: dict override + "True"/"False" coercion;
        accepts both Config field names and reference argparse names."""
        if not params:
            return self
        for k, v in params.items():
            k = self.REFERENCE_ALIASES.get(k, k)
            if hasattr(self, k):
                if v == "True":
                    v = True
                elif v == "False":
                    v = False
                if k in ("mesh_shape", "mesh_axes") and v is not None:
                    from .parallel import parse_axis_spec
                    v = parse_axis_spec(v, int if k == "mesh_shape" else str)
                setattr(self, k, v)
        return self

    def to_json(self, path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, default=str)

    @property
    def n_stack(self):
        if self.model.startswith("HG"):
            return int(self.model[2:])
        return 1
