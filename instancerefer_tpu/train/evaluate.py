"""Evaluation: prediction selection + Acc@IoU, bit-compatible with the reference.

Mirror of ``lib/eval_helper.py:get_eval`` in fully-vectorized masked form:

* 0 candidates  -> zero box (counted as a miss; reference ``:55-57``),
* 1 candidate   -> that candidate trivially selected (``:58-59``),
* >=2 candidates-> argmax of attribute+relation+scene scores (``:61-74``),
* ``ref_acc``: for >=2, pred==IoU-argmax-target; for <=1, IoU>0.25
  (``:69-72,86-90``),
* IoU vs GT via the axis-aligned corner IoU (``:77-79``),
* unique/multiple and "others" (object_cat == 17) masks (``:95-100``).

The reference requires ``get_loss`` to run first because ``cluster_label`` is
produced there (``lib/loss_helper.py:267``); same contract here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from instancerefer_tpu.ops.boxes import box3d_iou_aabb, get_3d_box_corners


def get_eval(data_dict):
    """Returns data_dict updated with eval keys (all jnp, per-sample).

    ``sample_valid`` (loader padding mask for partial final batches) excludes
    duplicated rows from every scalar metric, matching the reference whose
    last torch batch is genuinely smaller.  Per-sample keys (``ref_iou``,
    ``ref_acc``, ``lang_correct``) stay unmasked — callers filter rows.
    """
    out = dict(data_dict)
    lang_scores = data_dict["lang_scores"]
    valid = data_dict.get("sample_valid")
    if valid is None:
        valid = jnp.ones(lang_scores.shape[0], bool)
    vf = valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(vf), 1.0)
    lang_cls_pred = jnp.argmax(lang_scores, axis=1)
    lang_correct = (lang_cls_pred == data_dict["object_cat"]).astype(jnp.float32)
    out["lang_correct"] = lang_correct
    out["lang_acc"] = jnp.sum(lang_correct * vf) / n_valid

    scores = (
        data_dict["attribute_scores"]
        + data_dict["relation_scores"]
        + data_dict["scene_scores"]
    )  # [B, C]
    cand_mask = data_dict["cand_mask"]
    num_cand = jnp.sum(cand_mask, axis=1)
    pred_obb_batch = data_dict["pred_obb_batch"]  # [B, C, 7]
    cluster_label = data_dict["cluster_label"]  # [B, C]
    ref_gt_obb = data_dict["ref_gt_obb"]  # [B, 7]
    bsz, cdim = cand_mask.shape

    neg = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(cand_mask, scores, neg)
    cluster_pred = jnp.argmax(masked_scores, axis=1)  # [B]
    target = jnp.argmax(cluster_label, axis=1)

    # candidate index actually used per the 0/1/>=2 rules
    first_valid = jnp.argmax(cand_mask, axis=1)
    sel = jnp.where(num_cand >= 2, cluster_pred, first_valid)
    pred_obb = jnp.take_along_axis(pred_obb_batch, sel[:, None, None], axis=1)[:, 0]
    pred_obb = jnp.where((num_cand > 0)[:, None], pred_obb, 0.0)  # zero box on miss

    iou = box3d_iou_aabb(pred_obb, ref_gt_obb)  # [B]
    ref_acc = jnp.where(
        num_cand >= 2,
        (cluster_pred == target).astype(jnp.float32),
        (iou > 0.25).astype(jnp.float32),
    )

    out["ref_acc"] = ref_acc
    out["ref_acc_mean"] = jnp.sum(ref_acc * vf) / n_valid
    out["ref_iou"] = iou
    out["ref_iou_rate_0.25"] = jnp.sum((iou >= 0.25) * vf) / n_valid
    out["ref_iou_rate_0.5"] = jnp.sum((iou >= 0.5) * vf) / n_valid
    out["ref_multiple_mask"] = data_dict["unique_multiple"]
    out["ref_others_mask"] = (data_dict["object_cat"] == 17).astype(jnp.int32)
    out["pred_bboxes"] = get_3d_box_corners(pred_obb)
    out["gt_bboxes"] = get_3d_box_corners(ref_gt_obb)
    out["num_missed"] = jnp.sum((num_cand == 0) & valid)
    out["sample_valid"] = valid
    return out


def aggregate_scores(ious, ref_acc, multiple, others):
    """Host-side unique/multiple x others aggregation table.

    Mirrors ``scripts/eval.py:201-334``: masks are combined into the four
    published cells (unique/multiple x w/ and w/o "others") plus overall, each
    with ref_acc / Acc@0.25 / Acc@0.5.
    """
    ious = np.asarray(ious)
    ref_acc = np.asarray(ref_acc)
    multiple = np.asarray(multiple).astype(bool)
    others = np.asarray(others).astype(bool)

    def cell(mask):
        if mask.sum() == 0:
            # the reference reports 0 for empty cells (scripts/eval.py:235)
            return {"ref_acc": 0.0, "acc@0.25iou": 0.0, "acc@0.5iou": 0.0,
                    "count": 0}
        return {
            "ref_acc": float(ref_acc[mask].mean()),
            "acc@0.25iou": float((ious[mask] >= 0.25).mean()),
            "acc@0.5iou": float((ious[mask] >= 0.5).mean()),
            "count": int(mask.sum()),
        }

    # the reference's full {unique, multiple, overall} x
    # {not_in_others, in_others, overall} table (scripts/eval.py:201-334)
    all_mask = np.ones_like(multiple)
    rows = {"unique": ~multiple, "multiple": multiple, "overall": all_mask}
    cols = {"not_in_others": ~others, "in_others": others, "overall": all_mask}
    return {
        rk: {ck: cell(rm & cm) for ck, cm in cols.items()}
        for rk, rm in rows.items()
    }
