"""Generate golden parity fixtures by executing the *reference* implementation.

Runs the upstream UBPL-PoseEstimation code (mounted read-only at
/root/reference) on randomized inputs and dumps the outputs to
``tests/goldens/*.npz``.  Our JAX/TPU ops are then tested against these
fixtures for bit-for-bit (float-tolerance) parity.  Only fixture *data* enters
the repo; no reference code is copied.

Parity surfaces covered (reference file:line):
  - Gaussian heatmap synthesis      utils/process.py:252-318
  - MPII 200px-unit transform       utils/udaap/transforms.py:119-158
  - Heatmap argmax decode           utils/udaap/evaluation.py:13-30,215-238
  - PCK evaluation                  utils/evaluation.py:92-139
  - Inverse-warp matrix             utils/augment.py:158-164
  - Heatmap affine-back             utils/augment.py:36-47
  - All Joint* losses               utils/losses.py:8-286
  - features_cov                    utils/process.py:18-31
  - EMA/ramp schedules              utils/parameters.py:4-114

Usage:  python tools/make_goldens.py
"""
import os
import sys
import types

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLD = os.path.join(REPO, "tests", "goldens")
REF = "/root/reference"

# The reference imports skimage/openpyxl at module scope; neither is needed
# for the functions we exercise, so stub them before import.
for missing in ("skimage", "skimage.transform", "openpyxl", "openpyxl.styles", "tqdm"):
    if missing not in sys.modules:
        mod = types.ModuleType(missing)
        if missing == "openpyxl.styles":
            mod.PatternFill = object
        if missing == "tqdm":
            mod.tqdm = lambda x: x
        sys.modules[missing] = mod

# reference modules call .cuda() at import time (imutils.py:190); neutralize.
torch.Tensor.cuda = lambda self, *a, **k: self

sys.path.insert(0, REF)

from utils.process import ProcessUtils as proc              # noqa: E402
from utils.udaap.transforms import get_transform, transform  # noqa: E402
from utils.udaap.evaluation import get_preds, final_preds    # noqa: E402
from utils.evaluation import EvaluationUtils as refeval      # noqa: E402
from utils.augment import AugmentUtils as refaug             # noqa: E402
from utils import losses as reflosses                        # noqa: E402
from utils import parameters as refparams                    # noqa: E402


def save(name, **arrs):
    os.makedirs(GOLD, exist_ok=True)
    np.savez(os.path.join(GOLD, name + ".npz"), **arrs)
    print("wrote", name, {k: np.asarray(v).shape for k, v in arrs.items()})


def gold_heatmap(rng):
    """kps_heatmap: visibility-gated Gaussian synthesis at 64x64."""
    B, K = 16, 9
    kps = rng.uniform(-10, 266, size=(B, K, 3)).astype(np.float32)
    kps[:, :, 2] = (rng.random((B, K)) > 0.2).astype(np.float32)
    # a few exactly-at-edge / negative / zero cases
    kps[0, 0] = [0, 0, 1]
    kps[0, 1] = [255, 255, 1]
    kps[0, 2] = [252, 252, 1]
    kps[0, 3] = [3, 3, 1]
    kps[0, 4] = [2.99, 3.01, 1]
    kps[0, 5] = [-0.5, 100, 1]
    kps[1, 0] = [128.7, 64.2, 0]
    hms, kps_new = [], []
    for b in range(B):
        km = torch.from_numpy(kps[b].copy())
        hm, km2 = proc.kps_heatmap(km, (3, 256, 256), 256, 64)
        hms.append(hm.numpy())
        kps_new.append(km2.numpy())
    save("heatmap", kps=kps, heatmaps=np.stack(hms), kps_new=np.stack(kps_new))


def gold_transform(rng):
    """get_transform / transform point mapping incl. rotation + inversion."""
    N = 64
    pts = rng.uniform(-20, 280, size=(N, 2)).astype(np.float64)
    centers = rng.uniform(100, 156, size=(N, 2)).astype(np.float64)
    scales = rng.uniform(0.9, 1.8, size=(N,)).astype(np.float64)
    rots = rng.uniform(-30, 30, size=(N,)).astype(np.float64)
    rots[:8] = 0.0
    invert = (rng.random(N) > 0.5).astype(np.int64)
    res = np.array([64.0, 64.0])
    mats, outs = [], []
    for i in range(N):
        t = get_transform(centers[i], scales[i], res, rot=rots[i])
        mats.append(t)
        o = transform(pts[i], centers[i], scales[i], res, invert=int(invert[i]), rot=rots[i])
        outs.append(o)
    save("transform", pts=pts, centers=centers, scales=scales, rots=rots,
         invert=invert, res=res, mats=np.stack(mats), outs=np.stack(outs).astype(np.int64))


def gold_decode(rng):
    """get_preds + final_preds (argmax decode -> original coords) + scores."""
    B, K, H, W = 8, 9, 64, 64
    hm = rng.standard_normal((B, K, H, W)).astype(np.float32)
    # ensure some maps have all-negative values (mask path) and ties
    hm[0, 0] = -np.abs(hm[0, 0]) - 0.1
    hm[1, 1, 10, 20] = hm[1, 1].max() + 1.0
    hm[2, 2] = 0.5  # constant map -> first index wins
    centers = np.tile(np.array([[128.0, 128.0]]), (B, 1)).astype(np.float32)
    centers[4:] = rng.uniform(100, 156, size=(4, 2)).astype(np.float32)
    scales = np.full((B,), 256.0 / 200.0, dtype=np.float32)
    scales[4:] = rng.uniform(1.0, 1.6, size=(4,)).astype(np.float32)
    t_hm = torch.from_numpy(hm.copy())
    preds_raw = get_preds(t_hm).numpy()
    preds = final_preds(torch.from_numpy(hm.copy()), torch.from_numpy(centers),
                        torch.from_numpy(scales), [H, W]).numpy()
    scores = np.max(hm, axis=(2, 3))
    save("decode", hm=hm, centers=centers, scales=scales,
         preds_raw=preds_raw, preds=preds, scores=scores)


def gold_pck(rng):
    """acc_pck errs/accs arrays (Mouse config: ref=[1,2], thr=0.2)."""
    B, K = 32, 9
    preds = rng.uniform(0, 256, size=(B, K, 2)).astype(np.float32)
    gts = rng.uniform(0, 256, size=(B, K, 3)).astype(np.float32)
    gts[:, :, 2] = 1.0
    gts[0, 0, :2] = 0.5   # invalid joint (<=1) branch
    gts[1, 3, :2] = 1.0
    errs, accs = refeval.acc_pck(torch.from_numpy(preds.copy()),
                                 torch.from_numpy(gts.copy()), [1, 2], 0.2)
    save("pck", preds=preds, gts=gts, errs=errs.numpy(), accs=accs.numpy())


def gold_warpmat(rng):
    """affine_getWarpmat + affine_back2 (grid_sample heatmap back-warp)."""
    B, K, H, W = 6, 9, 64, 64
    angles = rng.uniform(-30, 30, size=(B,)).astype(np.float64)
    scales = rng.uniform(0.96, 1.6, size=(B,)).astype(np.float64)
    isflip = (rng.random(B) > 0.5).astype(bool)
    hm = rng.random((B, K, H, W)).astype(np.float32)
    warpmats = np.stack([
        refaug.affine_getWarpmat(-angles[b], 1.0 / scales[b], matrixRes=[256, 256]).numpy()
        for b in range(B)
    ])
    back = refaug.affine_back2(torch.from_numpy(hm.copy()),
                               torch.from_numpy(warpmats.astype(np.float32)),
                               torch.from_numpy(isflip)).numpy()
    save("warpmat", angles=angles, scales=scales, isflip=isflip, hm=hm,
         warpmats=warpmats, back=back)


def gold_losses(rng):
    """All reference loss modules on random tensors (nStack=3 shapes)."""
    B, S, K, H, W = 4, 3, 9, 64, 64
    preds = rng.standard_normal((B, S, K, H, W)).astype(np.float32)
    preds2 = rng.standard_normal((B, S, K, H, W)).astype(np.float32)
    gts = rng.random((B, K, H, W)).astype(np.float32)
    gate = (rng.random((B, K)) > 0.3).astype(np.float32)
    sw_pos = np.array([0.0, 0.0, 1.0, 1.0], dtype=np.float32)[:, None]
    sw_nega = np.array([7.0, 7.0, 0.0, 0.0], dtype=np.float32)[:, None]
    teachers = rng.standard_normal((2, B, S, K, H, W)).astype(np.float32)
    # lift some maxima above the 0.95 confidence threshold
    preds[2, :, 0] += 2.0
    teachers[:, 2, :, 0] += 2.0

    t = torch.from_numpy
    out = {}

    mse = reflosses.JointMSELoss(nStack=S, useKPsGate=True, useSampleWeight=True)
    s, n = mse(t(preds.copy()), t(gts.copy()), t(gate.copy()), t(sw_pos.copy()))
    out["mse_sum"], out["mse_n"] = s.item(), n

    mse_plain = reflosses.JointMSELoss(nStack=S)
    s, n = mse_plain(t(preds.copy()), t(gts.copy()))
    out["mse_plain_sum"], out["mse_plain_n"] = s.item(), n

    dist = reflosses.JointDistLoss()
    s, n = dist(t(preds[:, -1].copy()), t(preds2[:, -1].copy()))
    out["dist_sum"], out["dist_n"] = s.item(), n

    pseudo3 = reflosses.JointPseudoLoss3(nStack=S, scoreThr=0.95)
    s, n, n_sel, jsm, _, _ = pseudo3(t(preds.copy()), t(teachers.copy()), t(sw_nega.copy()))
    out["p3_sum"], out["p3_n"], out["p3_nsel"] = s.item(), n, n_sel
    out["p3_jsm"] = jsm.numpy()

    mt2 = reflosses.JointDistLoss_mt2(nStack=1, useKPsGate=False,
                                      useSampleWeight=True, scoreThr=0.95)
    s, n, n_p, n_s, jsm = mt2(t(preds[:, -1].copy()), t(preds2[:, -1].copy()),
                              sampleWeight=t(np.array([1., 1., 7., 7.], dtype=np.float32)[:, None]))
    out["mt2_sum"], out["mt2_n"], out["mt2_np"], out["mt2_nsel"] = s.item(), n, n_p, n_s
    out["mt2_jsm"] = jsm.numpy()

    pseudo1 = reflosses.JointPseudoLoss(nStack=S, scoreThr=0.0008)
    s, n, n_sel, jsm = pseudo1(t(preds.copy()), t(teachers.copy()),
                               t(sw_nega.copy()))
    out["p1_sum"], out["p1_n"], out["p1_nsel"] = s.item(), n, n_sel
    out["p1_jsm"] = jsm.numpy()

    pseudo2 = reflosses.JointPseudoLoss2(nStack=S, selRate=0.4)
    s, n, n_sel, jsm, thr1, thr2 = pseudo2(t(preds.copy()), t(teachers.copy()),
                                           t(sw_nega.copy()))
    out["p2_sum"], out["p2_n"], out["p2_nsel"] = s.item(), n, n_sel
    out["p2_jsm"] = jsm.numpy()
    out["p2_thr1"], out["p2_thr2"] = thr1.numpy(), thr2.numpy()

    mt1 = reflosses.JointDistLoss_mt(nStack=1, useSampleWeight=True,
                                     selRate=0.4)
    s, n = mt1(t(preds[:, -1].copy()), t(preds2[:, -1].copy()),
               sampleWeight=t(np.array([1., 1., 7., 7.],
                                       dtype=np.float32)[:, None]))
    out["mt1_sum"], out["mt1_n"] = s.item(), n

    feat1 = rng.standard_normal((B, S, 256, 32, 32)).astype(np.float32)
    feat2 = rng.standard_normal((B, S, 256, 32, 32)).astype(np.float32)
    c, cn = proc.features_cov(t(feat1.copy()), t(feat2.copy()))
    out["cov"], out["cov_n"] = c.item() if c.dim() == 0 else c.mean().item(), cn
    # features_cov returns per-?? check shape: mean over dims -> scalar per batch? store raw
    c2, _ = proc.features_cov(t(feat1.copy()), t(feat2.copy()))
    out["cov_raw"] = np.asarray(c2.detach().numpy())

    fdist = reflosses.JointFeatureDistLoss()
    s, n = fdist(t(feat1.copy()), t(feat2.copy()))
    out["fdist_sum"], out["fdist_n"] = s.item(), n

    save("losses", preds=preds, preds2=preds2, gts=gts, gate=gate,
         sw_pos=sw_pos, sw_nega=sw_nega, teachers=teachers,
         feat1=feat1, feat2=feat2,
         **{k: np.asarray(v) for k, v in out.items()})


def gold_schedules():
    """Sigmoid ramps + EMA alpha schedule."""
    import argparse
    epochs = np.arange(0, 110)
    args = argparse.Namespace(consWeight_max=10.0, consWeight_min=0.0, consWeight_rampup=5,
                              pseudoWeight_max=1.0, pseudoWeight_min=1.0, pseudoWeight_rampup=100,
                              FDLWeight_max=1.0, FDLWeight_min=1.0, FDLWeight_rampup=100)
    cons = np.array([refparams.consWeight_increase(e, args) for e in epochs])
    pseudo = np.array([refparams.pseudoWeight_increase(e, args) for e in epochs])
    fdl = np.array([refparams.FDLWeight_decrease(e, args) for e in epochs])
    alpha = np.array([min(1 - 1 / (e + 1), 0.999) for e in epochs])
    save("schedules", epochs=epochs, cons=cons, pseudo=pseudo, fdl=fdl, alpha=alpha)


def gold_mld():
    """MLD optimizer gradient surgery, executed semantics (utils/MLDOptim.py).

    Runs the reference optimizer's secondary_loss_backward +
    primary_loss_backward flow on a tiny MLP and records the pure per-loss
    gradients (inputs) and the post-surgery .grad (output).  Because
    ``.backward`` accumulates, the executed math differs from the idealised
    decomposition formula — the golden pins the executed version.
    """
    from utils.MLDOptim import MLDOptim

    def run_case(alpha, pri_scale):
        torch.manual_seed(99)
        model = torch.nn.Sequential(torch.nn.Linear(3, 4), torch.nn.Tanh(),
                                    torch.nn.Linear(4, 2))
        x1 = torch.randn(5, 3)
        x2 = torch.randn(5, 3)
        y = torch.randn(5, 2)
        loss_sec = (model(x2) ** 2).mean()
        if pri_scale is None:
            loss_pri = ((model(x1) - y) ** 2).mean()
        else:
            loss_pri = pri_scale * (model(x2) ** 2).mean()
        params = list(model.parameters())
        g_pri = torch.autograd.grad(loss_pri, params, retain_graph=True,
                                    create_graph=False)
        g_sec = torch.autograd.grad(loss_sec, params, retain_graph=True,
                                    create_graph=False)
        base = torch.optim.SGD(params, lr=0.1)
        opt = MLDOptim(params, base, model, alpha)
        opt.secondary_loss_backward(loss_sec)
        opt.primary_loss_backward(loss_pri)
        g_final = [p.grad.detach().clone() for p in params]
        return g_pri, g_sec, g_final

    arrs = {}
    # (alpha, pri_scale): None = independent MSE primary (gate fires);
    # -3.0 makes g_tot = -2*g_sec so <g_sec, g_tot> < 0 (gate closed).
    for i, (alpha, scale) in enumerate([(0.5, None), (1.0, None),
                                        (0.7, -3.0)]):
        g_pri, g_sec, g_final = run_case(alpha, scale)
        arrs[f"alpha_{i}"] = np.float32(alpha)
        for j, (gp, gs, gf) in enumerate(zip(g_pri, g_sec, g_final)):
            arrs[f"case{i}_pri_{j}"] = gp.numpy()
            arrs[f"case{i}_sec_{j}"] = gs.numpy()
            arrs[f"case{i}_final_{j}"] = gf.numpy()
    arrs["n_cases"] = np.int32(3)
    arrs["n_params"] = np.int32(4)
    save("mld", **arrs)


def main():
    rng = np.random.default_rng(1388)
    torch.manual_seed(1388)
    gold_heatmap(rng)
    gold_transform(rng)
    gold_decode(rng)
    gold_pck(rng)
    gold_warpmat(rng)
    gold_losses(rng)
    gold_schedules()
    gold_mld()


if __name__ == "__main__":
    main()
