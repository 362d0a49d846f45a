"""Losses, fully vectorized in-graph.

Mirror of reference ``lib/loss_helper.py``'s live path (``get_loss``,
``:196-269``), with the host-numpy IoU target assignment (``:233-258``) moved
onto the device as masked ops — one of the defining de-bottleneckings of this
rebuild (the reference round-trips labels through ``.detach().cpu().numpy()``
mid-step).

Semantics preserved exactly, in masked form:

* ContrastiveLoss (margin 0.2, γ=5, reference ``:93-107``) including its quirk
  that the positive enters the negatives' logsumexp as a *zero* logit (the
  reference multiplies scores by ``label.logical_not()`` rather than masking,
  so exp(0)=1 is always in the sum).  Padded candidate slots are -inf
  (truly excluded).
* per-sample rules: 0 candidates -> no ref loss (box_mask), 1 candidate ->
  skipped, max IoU < 0.2 -> skipped (``:248-256``); division by batch size.
* 9-region scene CE with the exact 3x3-grid truth table (``:131-161``).
* language classification CE (``:189-193``).
* total = 10 * ref + lang + seg (``:263``).

Unused reference variants (SoftmaxRankingLoss, RankingLoss, SimCLRLoss,
SegLoss, compute_box_loss) are provided in masked form below for capability
parity; note the reference's ``SoftmaxRankingLoss`` has a latent ``F``
NameError and is dead code there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from instancerefer_tpu.ops.boxes import box3d_iou_aabb, param2obb

NEG_INF = -1e30


def contrastive_loss_masked(score, label, mask, margin=0.2, gamma=5.0):
    """Per-sample ContrastiveLoss over padded candidates.

    Args:
      score: [B, C] summed matching scores.
      label: [B, C] one-hot (float) IoU-argmax target, zero where invalid.
      mask:  [B, C] candidate validity.
    Returns: [B] per-sample losses (callers apply the skip rules).
    """
    s = score * gamma
    sim = jnp.sum(s * label * mask, axis=1)
    # negatives: real negatives keep γ·score; the positive contributes logit 0
    # (reference quirk, lib/loss_helper.py:104-105); padding is excluded.
    neg_logits = jnp.where(mask & (label < 0.5), s, jnp.where(mask, 0.0, NEG_INF))
    neg_sim = jax.nn.logsumexp(neg_logits, axis=1)
    return jnp.maximum(neg_sim - sim + margin, 0.0)


def scene_region_label(ref_center, point_min, point_max):
    """9-region label truth table; verbatim port of lib/loss_helper.py:142-153."""
    first = point_min + (point_max - point_min) / 3.0
    second = point_min + (point_max - point_min) / 3.0 * 2.0
    rf = ref_center <= first  # result_first
    rs = ref_center <= second  # result_second
    rf0, rf1 = rf[:, 0], rf[:, 1]
    rs0, rs1 = rs[:, 0], rs[:, 1]
    label = jnp.where(rf0 & rf1, 0, 4)
    label = jnp.where(~rf0 & rs0 & rf1, 1, label)
    label = jnp.where(~rs0 & rf1, 2, label)
    label = jnp.where(rf0 & ~rf1 & rs1, 3, label)
    label = jnp.where(~rs0 & ~rf1 & rs1, 5, label)
    label = jnp.where(rf0 & ~rs1, 6, label)
    label = jnp.where(~rf0 & rs0 & ~rs1, 7, label)
    label = jnp.where(~rs0 & ~rs1, 8, label)
    return label.astype(jnp.int32)


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def _masked_mean(values, valid):
    """Mean over rows where ``valid``; equals plain mean when all rows valid."""
    vf = valid.astype(jnp.float32)
    return jnp.sum(values * vf) / jnp.maximum(jnp.sum(vf), 1.0)


def compute_scene_mask_loss(data_dict, valid=None):
    """CE over the 9 BEV regions + accuracy (lib/loss_helper.py:131-161)."""
    pred = data_dict["seg_scores"]  # [B, 9]
    label = scene_region_label(
        data_dict["ref_center_label"], data_dict["point_min"], data_dict["point_max"]
    )
    if valid is None:
        valid = jnp.ones(pred.shape[0], bool)
    loss = _masked_mean(cross_entropy(pred, label), valid)
    acc = _masked_mean((jnp.argmax(pred, axis=1) == label).astype(jnp.float32), valid)
    return loss, acc, label


def compute_lang_classification_loss(data_dict, valid=None):
    ce = cross_entropy(data_dict["lang_scores"], data_dict["object_cat"])
    if valid is None:
        valid = jnp.ones(ce.shape[0], bool)
    return _masked_mean(ce, valid)


def get_loss(data_dict, mean_size_arr):
    """Full loss; returns data_dict updated with loss/cluster_label keys.

    The returned ``cluster_label`` ([B, C] float one-hot) and
    ``cluster_label_mask`` ([B] bool: sample had >=1 candidate) reproduce the
    reference's ragged ``cluster_label`` list (``lib/loss_helper.py:233-247``)
    in padded form; ``get_eval`` consumes them just as the reference does.

    If the batch carries ``sample_valid`` (rows duplicated by the loader to
    fill a partial final batch are False), every mean/denominator counts only
    valid rows — equivalent to the reference's genuinely-smaller last torch
    batch (``lib/loss_helper.py:263`` divides by the actual batch size).
    """
    out = dict(data_dict)
    valid = data_dict.get("sample_valid")
    if valid is None:
        valid = jnp.ones(data_dict["lang_scores"].shape[0], bool)
    lang_loss = compute_lang_classification_loss(data_dict, valid)
    seg_loss, seg_acc, region_label = compute_scene_mask_loss(data_dict, valid)

    ref_gt_obb = param2obb(
        data_dict["ref_center_label"],
        data_dict["ref_heading_class_label"],
        data_dict["ref_heading_residual_label"],
        data_dict["ref_size_class_label"],
        data_dict["ref_size_residual_label"],
        mean_size_arr,
    )  # [B, 7]
    out["ref_gt_obb"] = ref_gt_obb

    pred_obb = data_dict["pred_obb_batch"]  # [B, C, 7]
    cand_mask = data_dict["cand_mask"]  # [B, C]
    num_cand = jnp.sum(cand_mask, axis=1)  # [B]
    bsz, cdim = cand_mask.shape

    ious = box3d_iou_aabb(pred_obb, ref_gt_obb[:, None, :])  # [B, C]
    ious = jnp.where(cand_mask, ious, -1.0)
    best = jnp.argmax(ious, axis=1)  # [B] first max among valid (ref :244)
    cluster_label = jax.nn.one_hot(best, cdim, dtype=jnp.float32) * cand_mask
    max_iou = jnp.max(ious, axis=1)

    per_sample = contrastive_loss_masked(
        data_dict["attribute_scores"]
        + data_dict["relation_scores"]
        + data_dict["scene_scores"],
        cluster_label,
        cand_mask,
    )
    # skip rules (lib/loss_helper.py:236-256): need >=2 candidates and IoU>=0.2
    use = (num_cand >= 2) & (max_iou >= 0.2) & valid
    ref_loss = jnp.sum(jnp.where(use, per_sample, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0
    )

    out["ref_loss"] = ref_loss
    out["lang_loss"] = lang_loss
    out["seg_loss"] = seg_loss
    out["seg_acc"] = seg_acc
    out["loss"] = 10.0 * ref_loss + lang_loss + seg_loss
    out["cluster_label"] = cluster_label
    out["cluster_label_mask"] = num_cand > 0
    out["scene_region_label"] = region_label
    return out


# ---------------------------------------------------------------------------
# Capability-parity ports of the reference's unused loss variants
# ---------------------------------------------------------------------------

def softmax_ranking_loss(inputs, targets, mask):
    """lib/loss_helper.py:17-30 (fixed: the reference references undefined F)."""
    logits = jnp.where(mask, inputs + 1e-8, NEG_INF)
    probs = jax.nn.softmax(logits, axis=0)
    return jnp.mean(-jnp.sum(jnp.log(probs + 1e-8) * targets * mask, axis=0))


def simclr_loss(sim, label, mask, temp=7.0):
    """lib/loss_helper.py:78-90 in masked form."""
    e = jnp.where(mask, jnp.exp(temp * sim), 0.0)
    pos = jnp.sum(e * label)
    return -jnp.log(pos / (jnp.sum(e) - pos + 1e-8))


def ranking_loss(sim, label, mask, m=0.2, gamma=64.0):
    """Circle-loss style RankingLoss (lib/loss_helper.py:33-75), masked.

    Per-sample over the candidate axis; the reference's "keep only the top 10
    negatives when there are more than 20" subsample is reproduced by ranking
    all masked negatives and dropping ranks >= 10 for such samples.
    """
    delta_p, delta_n = 1 - m, m
    pos_mask = mask & (label > 0.5)
    neg_mask = mask & (label < 0.25)

    alpha_p = jnp.maximum(0.8 - jax.lax.stop_gradient(sim), 0.0)
    logit_p = jnp.where(pos_mask, -alpha_p * (sim - delta_p) * gamma, NEG_INF)
    has_pos = jnp.any(pos_mask, axis=-1)
    lse_p = jnp.where(has_pos, jax.nn.logsumexp(logit_p, axis=-1), 0.0)

    n_neg = jnp.sum(neg_mask, axis=-1, keepdims=True)
    neg_sim = jnp.where(neg_mask, sim, NEG_INF)
    # rank of each negative among its sample's negatives (0 = largest)
    rank = jnp.sum(neg_sim[..., None, :] > neg_sim[..., :, None], axis=-1)
    keep = neg_mask & ((n_neg <= 20) | (rank < 10))
    alpha_n = jnp.maximum(jax.lax.stop_gradient(sim) - 0.2, 0.0)
    logit_n = jnp.where(keep, alpha_n * (sim - delta_n) * gamma, NEG_INF)
    lse_n = jax.nn.logsumexp(logit_n, axis=-1)
    return jnp.mean(jax.nn.softplus(lse_n + lse_p))


def seg_focal_loss(preds, labels, mask, alpha=0.25, gamma=2.0):
    """Focal BCE SegLoss (lib/loss_helper.py:110-128), masked."""
    logpt = -(
        jnp.maximum(preds, 0) - preds * labels + jnp.log1p(jnp.exp(-jnp.abs(preds)))
    )
    logpt = jnp.sum(jnp.where(mask, logpt, 0.0)) / jnp.maximum(jnp.sum(mask), 1.0)
    pt = jnp.exp(logpt)
    return -((1 - pt) ** gamma) * alpha * logpt


def compute_box_loss(pred_center, pred_size_residual, gt_center, gt_size_residual, box_mask):
    """Smooth-L1 center/size losses (lib/loss_helper.py:164-186)."""

    def smooth_l1(x):
        a = jnp.abs(x)
        return jnp.where(a < 1.0, 0.5 * x * x, a - 0.5)

    denom = jnp.sum(box_mask) + 1e-6
    center_loss = jnp.sum(smooth_l1(pred_center - gt_center) * box_mask[:, None]) / denom
    size_loss = jnp.sum(
        smooth_l1(pred_size_residual - gt_size_residual) * box_mask[:, None]
    ) / denom
    return center_loss, size_loss
