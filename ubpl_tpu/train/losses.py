"""Heatmap-regression and SSL losses as fixed-shape masked reductions.

Re-implements every loss in reference utils/losses.py (8-354) for channel-last
JAX tensors.  All losses return ``(sum, count)`` — the caller divides and
scales by the regime weight, exactly like the reference trainers.  Dynamic
Python filtering (e.g. "stack scores of unlabeled samples") becomes masked
arithmetic so shapes stay static under jit.

Layouts: preds [B, S, H, W, K] (S = hourglass stacks); gts [B, H, W, K];
kps gate [B, K]; sample weight [B] or [B, 1]; features [B, N, Hf, Wf, C].
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _flatten_hw(x):
    """[B, S, H, W, K] -> [B, S, K, H*W] (or [B, H, W, K] -> [B, K, H*W])."""
    x = jnp.moveaxis(x, -1, -3)
    return x.reshape(x.shape[:-2] + (-1,))


def _as_bs1(w):
    w = jnp.asarray(w)
    return w.reshape(w.shape[0])


def kps_labeled_count(gate):
    """Reference kps_getLabeledCount: #entries > 0."""
    return jnp.sum(gate > 0).astype(jnp.float32)


def joint_mse(preds, gts, kps_gate=None, sample_weight=None,
              use_gate=False, use_sample_weight=False):
    """Reference JointMSELoss: per-stack heatmap MSE, visibility/sample gated.

    Returns (loss_sum, count) with count = S * #(gate > 0).
    """
    if preds.ndim == 4:  # single-stack convenience
        preds = preds[:, None]
    B, S = preds.shape[0], preds.shape[1]
    K = preds.shape[-1]
    v1 = _flatten_hw(preds)                       # [B, S, K, HW]
    v2 = _flatten_hw(gts)[:, None]                # [B, 1, K, HW]
    loss = jnp.mean((v1 - v2) ** 2, axis=-1)      # [B, S, K]
    gate = jnp.ones((B, K), preds.dtype) if kps_gate is None else kps_gate
    if use_gate:
        loss = loss * gate[:, None, :]
    if use_sample_weight and sample_weight is not None:
        loss = loss * _as_bs1(sample_weight)[:, None, None]
    return jnp.sum(loss), S * kps_labeled_count(gate)


def joint_dist(preds1, preds2, kps_gate=None, sample_weight=None,
               use_gate=False, use_sample_weight=False):
    """Reference JointDistLoss: MSE between two prediction stacks."""
    if preds1.ndim == 4:
        preds1, preds2 = preds1[:, None], preds2[:, None]
    B, S, K = preds1.shape[0], preds1.shape[1], preds1.shape[-1]
    v1, v2 = _flatten_hw(preds1), _flatten_hw(preds2)
    loss = jnp.mean((v1 - v2) ** 2, axis=-1)
    gate = jnp.ones((B, K), preds1.dtype) if kps_gate is None else kps_gate
    if use_gate:
        loss = loss * gate[:, None, :]
    if use_sample_weight and sample_weight is not None:
        loss = loss * _as_bs1(sample_weight)[:, None, None]
    return jnp.sum(loss), S * kps_labeled_count(gate)


def joint_feature_dist(f1, f2):
    """Reference JointFeatureDistLoss: per-channel MSE between feature stacks.

    f1, f2: [B, N, Hf, Wf, C].  Returns (sum, B*N).
    """
    B, N = f1.shape[0], f1.shape[1]
    C = f1.shape[-1]
    v1 = jnp.moveaxis(f1, -1, 2).reshape(B, N, C, -1)
    v2 = jnp.moveaxis(f2, -1, 2).reshape(B, N, C, -1)
    loss = jnp.mean((v1 - v2) ** 2, axis=-1)  # [B, N, C]
    return jnp.sum(loss), B * N


def joint_feature_dist_masked(f1, f2, sample_mask):
    """JointFeatureDistLoss restricted to samples with mask > 0 — the
    fixed-shape equivalent of the reference's Python selection loop
    (projects/MT_UBPL.py:306-320).  Returns (sum, count = n_sel * N)."""
    B, N = f1.shape[0], f1.shape[1]
    C = f1.shape[-1]
    v1 = jnp.moveaxis(f1, -1, 2).reshape(B, N, C, -1)
    v2 = jnp.moveaxis(f2, -1, 2).reshape(B, N, C, -1)
    loss = jnp.mean((v1 - v2) ** 2, axis=-1)  # [B, N, C]
    m = (sample_mask > 0).astype(loss.dtype)
    return jnp.sum(loss * m[:, None, None]), jnp.sum(m) * N


def features_cov_masked(f1, f2, sample_mask):
    """features_cov restricted to samples with mask > 0.

    Matches stacking the selected samples then calling the reference
    features_cov (utils/process.py:18-31): returns (mean |cov01| over the
    selected set, count = n_sel * N * C).
    """
    B, N = f1.shape[0], f1.shape[1]
    C = f1.shape[-1]
    v1 = jnp.moveaxis(f1, -1, 2).reshape(B, N, C, -1)
    v2 = jnp.moveaxis(f2, -1, 2).reshape(B, N, C, -1)
    hw = v1.shape[-1]
    m1 = v1 - jnp.mean(v1, axis=-1, keepdims=True)
    m2 = v2 - jnp.mean(v2, axis=-1, keepdims=True)
    cov01 = jnp.sum(m1 * m2, axis=-1) / (hw - 1)          # [B, N, C]
    m = (sample_mask > 0).astype(cov01.dtype)
    n_sel = jnp.sum(m)
    mean_val = jnp.sum(jnp.abs(cov01) * m[:, None, None]) / (
        jnp.maximum(n_sel, 1) * N * C)
    return mean_val, n_sel * N * C


class PseudoStats(NamedTuple):
    num_pseudo: jnp.ndarray       # #loss entries > 0 (reference n)
    num_selected: jnp.ndarray     # #mask entries > 0
    joint_score_mean: jnp.ndarray  # [K] mean confidence over weighted samples


def joint_pseudo3(preds, teacher_outs, sample_weight, score_thr=0.95):
    """Reference JointPseudoLoss3: ensemble-pseudo-label constraint (EPC).

    preds: [B, S, H, W, K] student stacks; teacher_outs: [M, B, S, H, W, K]
    (all teachers; the target is the mean of their LAST stacks);
    sample_weight: [B] "nega" weights (labeled=0, unlabeled=pseudoWeight).

    Per-joint confidence mask: max(student stack) >= thr AND
    max(target) >= thr.  Returns (loss_sum, PseudoStats).
    """
    B, S, K = preds.shape[0], preds.shape[1], preds.shape[-1]
    sw = _as_bs1(sample_weight)
    target = jnp.mean(teacher_outs[:, :, -1], axis=0)      # [B, H, W, K]
    v2 = _flatten_hw(target)                               # [B, K, HW]
    v1 = _flatten_hw(preds)                                # [B, S, K, HW]
    loss = jnp.mean((v1 - v2[:, None]) ** 2, axis=-1)      # [B, S, K]
    loss = loss * sw[:, None, None]
    v1_score = jnp.max(v1, axis=-1)                        # [B, S, K]
    v2_score = jnp.max(v2, axis=-1)                        # [B, K]
    mask = ((v1_score >= score_thr) &
            (v2_score[:, None] >= score_thr)).astype(loss.dtype)
    total = jnp.sum(loss * mask)
    num_pseudo = jnp.sum(loss > 0)
    num_selected = jnp.sum(mask > 0)
    wpos = (sw > 0).astype(loss.dtype)
    denom = jnp.maximum(jnp.sum(wpos), 1.0)
    v1_mean = jnp.sum(v1_score * wpos[:, None, None], axis=0) / denom  # [S, K]
    v2_mean = jnp.sum(v2_score * wpos[:, None], axis=0) / denom        # [K]
    jsm = jnp.mean((v1_mean + v2_mean[None, :]) / 2.0, axis=0)         # [K]
    return total, PseudoStats(num_pseudo, num_selected, jsm)


def _softmax_k_score(v):
    """Reference confidence score for the v1/v2 pseudo losses: softmax over
    the JOINT axis (torch dim=-2 of [bs, k, HW]) then max over HW."""
    sm = jax.nn.softmax(v, axis=-2)
    return jnp.max(sm, axis=-1)         # [..., K]


def _rate_threshold(scores, sel_rate):
    """Reference quantile threshold: ascending-sorted flat scores at index
    int(len * (1 - selRate))."""
    flat = jnp.sort(scores.reshape(-1))
    idx = int(flat.shape[0] * (1.0 - sel_rate))
    return flat[min(idx, flat.shape[0] - 1)]


def joint_pseudo(preds, teacher_outs, sample_weight, score_thr=0.8):
    """Reference JointPseudoLoss (dormant): like joint_pseudo3 but the
    confidence is a softmax-over-joints score thresholded at scoreThr."""
    B, S, K = preds.shape[0], preds.shape[1], preds.shape[-1]
    sw = _as_bs1(sample_weight)
    target = jnp.mean(teacher_outs[:, :, -1], axis=0)
    v2 = _flatten_hw(target)                               # [B, K, HW]
    v1 = _flatten_hw(preds)                                # [B, S, K, HW]
    loss = jnp.mean((v1 - v2[:, None]) ** 2, axis=-1) * sw[:, None, None]
    v1_score = _softmax_k_score(v1)                        # [B, S, K]
    v2_score = _softmax_k_score(v2)                        # [B, K]
    mask = ((v1_score >= score_thr)
            & (v2_score[:, None] >= score_thr)).astype(loss.dtype)
    total = jnp.sum(loss * mask)
    wpos = (sw > 0).astype(loss.dtype)
    denom = jnp.maximum(jnp.sum(wpos), 1.0)
    v1_mean = jnp.sum(v1_score * wpos[:, None, None], axis=0) / denom
    v2_mean = jnp.sum(v2_score * wpos[:, None], axis=0) / denom
    jsm = jnp.mean((v1_mean + v2_mean[None, :]) / 2.0, axis=0)
    return total, PseudoStats(jnp.sum(loss > 0), jnp.sum(mask > 0), jsm)


def joint_pseudo2(preds, teacher_outs, sample_weight, sel_rate=0.5):
    """Reference JointPseudoLoss2 (dormant): per-stack top-selRate quantile
    thresholds on the softmax-over-joints scores.

    Returns (sum, PseudoStats, thr1 [S], thr2 [S]).
    """
    B, S, K = preds.shape[0], preds.shape[1], preds.shape[-1]
    sw = _as_bs1(sample_weight)
    target = jnp.mean(teacher_outs[:, :, -1], axis=0)
    v2 = _flatten_hw(target)
    v1 = _flatten_hw(preds)
    loss = jnp.mean((v1 - v2[:, None]) ** 2, axis=-1) * sw[:, None, None]
    v1_score = _softmax_k_score(v1)                        # [B, S, K]
    v2_score = _softmax_k_score(v2)                        # [B, K]
    thr1 = jnp.stack([_rate_threshold(v1_score[:, s], sel_rate)
                      for s in range(S)])                  # [S]
    thr2_scalar = _rate_threshold(v2_score, sel_rate)
    thr2 = jnp.full((S,), thr2_scalar)
    mask = ((v1_score >= thr1[None, :, None])
            & (v2_score[:, None] >= thr2_scalar)).astype(loss.dtype)
    total = jnp.sum(loss * mask)
    wpos = (sw > 0).astype(loss.dtype)
    denom = jnp.maximum(jnp.sum(wpos), 1.0)
    v1_mean = jnp.sum(v1_score * wpos[:, None, None], axis=0) / denom
    v2_mean = jnp.sum(v2_score * wpos[:, None], axis=0) / denom
    jsm = jnp.mean((v1_mean + v2_mean[None, :]) / 2.0, axis=0)
    return total, PseudoStats(jnp.sum(loss > 0), jnp.sum(mask > 0),
                              jsm), thr1, thr2


def joint_dist_mt(preds1, preds2, kps_gate=None, sample_weight=None,
                  use_gate=False, use_sample_weight=False, sel_rate=0.5):
    """Reference JointDistLoss_mt (dormant): consistency masked by the
    top-selRate quantile of the teacher's softmax-over-joints confidence."""
    if preds1.ndim == 4:
        preds1, preds2 = preds1[:, None], preds2[:, None]
    B, S, K = preds1.shape[0], preds1.shape[1], preds1.shape[-1]
    v1, v2 = _flatten_hw(preds1), _flatten_hw(preds2)
    loss = jnp.mean((v1 - v2) ** 2, axis=-1)
    gate = jnp.ones((B, K), preds1.dtype) if kps_gate is None else kps_gate
    if use_gate:
        loss = loss * gate[:, None, :]
    if use_sample_weight and sample_weight is not None:
        loss = loss * _as_bs1(sample_weight)[:, None, None]
    v2_score = _softmax_k_score(v2)                        # [B, S, K]
    masks = []
    for s in range(S):
        thr = _rate_threshold(v2_score[:, s], sel_rate)
        masks.append((v2_score[:, s] >= thr).astype(loss.dtype))
    mask = jnp.stack(masks, axis=1)
    return jnp.sum(loss * mask), S * kps_labeled_count(gate)


def joint_dist_mt2(preds1, preds2, kps_gate=None, sample_weight=None,
                   use_gate=False, use_sample_weight=False, score_thr=0.95):
    """Reference JointDistLoss_mt2: consistency masked by raw teacher-map max.

    preds1/preds2: [B, H, W, K] or [B, S, H, W, K].
    Returns (loss_sum, count, PseudoStats).
    """
    if preds1.ndim == 4:
        preds1, preds2 = preds1[:, None], preds2[:, None]
    B, S, K = preds1.shape[0], preds1.shape[1], preds1.shape[-1]
    v1, v2 = _flatten_hw(preds1), _flatten_hw(preds2)
    loss = jnp.mean((v1 - v2) ** 2, axis=-1)               # [B, S, K]
    gate = jnp.ones((B, K), preds1.dtype) if kps_gate is None else kps_gate
    if use_gate:
        loss = loss * gate[:, None, :]
    sw = None
    if use_sample_weight and sample_weight is not None:
        sw = _as_bs1(sample_weight)
        loss = loss * sw[:, None, None]
    v2_score = jnp.max(v2, axis=-1)                        # [B, S, K]
    mask = (v2_score >= score_thr).astype(loss.dtype)
    total = jnp.sum(loss * mask)
    count = S * kps_labeled_count(gate)
    num_pseudo = jnp.sum(loss > 0)
    num_selected = jnp.sum(mask > 0)
    if sw is None:
        sw = jnp.ones((B,), loss.dtype)
    wpos = (sw > 0).astype(loss.dtype)
    denom = jnp.maximum(jnp.sum(wpos), 1.0)
    jsm = jnp.mean(jnp.sum(v2_score * wpos[:, None, None], axis=0) / denom,
                   axis=0)                                 # [K]
    return total, count, PseudoStats(num_pseudo, num_selected, jsm)


# ---------------------------------------------------------------------------
# Classification-branch losses (reference utils/losses.py:289-354)
# ---------------------------------------------------------------------------

def class_loss(logits, labels, sample_weight=None, use_sample_weight=False):
    """Reference ClassLoss: CE with ignore_index=-1, optional sample weights."""
    num_classes = logits.shape[-1]
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    logp = logits - jnp.log(jnp.sum(jnp.exp(logits - jnp.max(
        logits, -1, keepdims=True)), -1, keepdims=True)) - jnp.max(
        logits, -1, keepdims=True)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = nll * valid.astype(nll.dtype)
    if use_sample_weight and sample_weight is not None:
        nll = nll * _as_bs1(sample_weight)
    return jnp.sum(nll), jnp.sum(valid)


def class_dist(logits1, logits2):
    """Reference ClassDistLoss: MSE between softmaxes, / num_classes."""
    import jax.nn as jnn
    bs, c = logits1.shape
    return jnp.sum((jnn.softmax(logits1, -1) - jnn.softmax(logits2, -1)) ** 2) / c, bs


def class_sym_dist(logits1, logits2):
    """Reference ClassSymDistLoss: raw squared distance / num_classes."""
    bs, c = logits1.shape
    return jnp.sum((logits1 - logits2) ** 2) / c, bs


def class_pseudo(logits, teacher_logits, sample_weight):
    """Reference ClassPseudoLoss: MSE to the mean teacher softmax."""
    import jax.nn as jnn
    t = jnp.mean(jnn.softmax(teacher_logits, -1), axis=0)  # [B, C]
    sw = _as_bs1(sample_weight)
    loss = jnp.mean((jnn.softmax(logits, -1) - t) ** 2, axis=-1) * sw
    return jnp.sum(loss), jnp.sum(sw > 0)


def class_feature_dist(f1, f2):
    """Reference ClassFeatureDistLoss: inverse-distance penalty."""
    bs, c = f1.shape[0], f1.shape[-1]
    v1 = jnp.moveaxis(f1, -1, 1).reshape(bs, c, -1)
    v2 = jnp.moveaxis(f2, -1, 1).reshape(bs, c, -1)
    dists = jnp.mean(jnp.mean((v1 - v2) ** 2, axis=-1), axis=-1)  # [bs]
    return jnp.sum(1.0 / dists), bs


# ---------------------------------------------------------------------------
# Running means (reference AvgCounter/AvgCounters) — host-side helpers
# ---------------------------------------------------------------------------

class AvgCounter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        n = int(n)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = 0.0 if self.count == 0 else self.sum / self.count


class AvgCounters:
    def __init__(self, num=1):
        self.counters = [AvgCounter() for _ in range(num)]

    def reset(self):
        for c in self.counters:
            c.reset()

    def _ensure(self, idx):
        while len(self.counters) < idx + 1:
            self.counters.append(AvgCounter())

    def update(self, idx, val, n=1):
        self._ensure(idx)
        self.counters[idx].update(val, n)

    def avg(self):
        return [c.avg for c in self.counters]

    def sum(self):
        return [c.sum for c in self.counters]
