"""Loss/eval semantics vs direct numpy ports of the reference formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

from instancerefer_tpu.train.losses import (
    contrastive_loss_masked,
    cross_entropy,
    scene_region_label,
)


def ref_contrastive(score, label, margin=0.2, gamma=5.0):
    """Direct numpy port of lib/loss_helper.py:101-107 on a ragged vector."""
    score = score * gamma
    sim = (score * label).sum()
    neg = score * (1 - label)  # positive entry becomes logit 0 (the ref quirk)
    neg_sim = np.log(np.exp(neg).sum())
    return max(neg_sim - sim + margin, 0.0)


def test_contrastive_matches_reference(rng):
    for _ in range(20):
        n = rng.integers(2, 8)
        score = rng.normal(size=n).astype(np.float32)
        label = np.zeros(n, np.float32)
        label[rng.integers(0, n)] = 1.0
        want = ref_contrastive(score, label)

        c = 10  # padded width
        pscore = np.zeros((1, c), np.float32)
        plabel = np.zeros((1, c), np.float32)
        pmask = np.zeros((1, c), bool)
        pscore[0, :n] = score
        plabel[0, :n] = label
        pmask[0, :n] = True
        got = float(
            contrastive_loss_masked(
                jnp.asarray(pscore), jnp.asarray(plabel), jnp.asarray(pmask)
            )[0]
        )
        # f32 device math vs f64 numpy oracle
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_contrastive_padding_invariance(rng):
    """Padding width must not change the loss."""
    score = rng.normal(size=4).astype(np.float32)
    label = np.array([0, 1, 0, 0], np.float32)

    def padded(c):
        ps = np.zeros((1, c), np.float32)
        pl = np.zeros((1, c), np.float32)
        pm = np.zeros((1, c), bool)
        ps[0, :4] = score
        pl[0, :4] = label
        pm[0, :4] = True
        return float(
            contrastive_loss_masked(jnp.asarray(ps), jnp.asarray(pl), jnp.asarray(pm))[0]
        )

    np.testing.assert_allclose(padded(4), padded(16), rtol=1e-6)


def test_cross_entropy_matches_numpy(rng):
    logits = rng.normal(size=(5, 18)).astype(np.float32)
    labels = rng.integers(0, 18, size=5)
    got = np.asarray(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    want = -np.log(p[np.arange(5), labels])
    # f32 device math vs f64 numpy oracle
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_scene_region_edges():
    """Boundary behavior: <= comparisons as in lib/loss_helper.py:143-153."""
    pmin = jnp.zeros((1, 3))
    pmax = jnp.full((1, 3), 3.0)
    # exactly on the first boundary (x=1) -> le() is True -> column 0
    lab = scene_region_label(jnp.asarray([[1.0, 1.0, 0.0]]), pmin, pmax)
    assert int(lab[0]) == 0
    # just beyond -> column 1
    lab = scene_region_label(jnp.asarray([[1.0001, 1.0, 0.0]]), pmin, pmax)
    assert int(lab[0]) == 1


def test_eval_candidate_rules(rng):
    """0/1/>=2-candidate selection rules of lib/eval_helper.py:52-74."""
    from instancerefer_tpu.train.evaluate import get_eval

    b, c = 3, 4
    cand_mask = np.array(
        [[False] * 4, [True] + [False] * 3, [True, True, True, False]]
    )
    pred_obb = np.zeros((b, c, 7), np.float32)
    pred_obb[1, 0] = [0, 0, 0, 1, 1, 1, 0]
    pred_obb[2, 0] = [5, 5, 5, 1, 1, 1, 0]
    pred_obb[2, 1] = [0, 0, 0, 1, 1, 1, 0]  # overlaps GT
    pred_obb[2, 2] = [9, 9, 9, 1, 1, 1, 0]

    gt = np.zeros((b, 7), np.float32)
    gt[:, 3:6] = 1.0  # unit box at origin

    scores = np.zeros((b, c), np.float32)
    scores[2] = [0.1, 0.9, 0.2, 99.0]  # argmax among valid = candidate 1

    cluster_label = np.zeros((b, c), np.float32)
    cluster_label[1, 0] = 1
    cluster_label[2, 1] = 1

    dd = {
        "lang_scores": jnp.asarray(rng.normal(size=(b, 18)).astype(np.float32)),
        "object_cat": jnp.asarray(np.array([0, 1, 2])),
        "attribute_scores": jnp.asarray(scores),
        "relation_scores": jnp.zeros((b, c)),
        "scene_scores": jnp.zeros((b, c)),
        "cand_mask": jnp.asarray(cand_mask),
        "pred_obb_batch": jnp.asarray(pred_obb),
        "cluster_label": jnp.asarray(cluster_label),
        "ref_gt_obb": jnp.asarray(gt),
        "unique_multiple": jnp.asarray(np.array([0, 1, 1])),
    }
    out = get_eval(dd)
    iou = np.asarray(out["ref_iou"])
    acc = np.asarray(out["ref_acc"])
    # sample 0: no candidates -> zero box -> iou 0, acc by iou>0.25 -> 0
    assert iou[0] == 0.0 and acc[0] == 0.0
    # sample 1: single candidate == GT -> iou 1, acc 1
    np.testing.assert_allclose(iou[1], 1.0, atol=1e-5)
    assert acc[1] == 1.0
    # sample 2: argmax picks candidate 1 (the padded 99 must be ignored)
    np.testing.assert_allclose(iou[2], 1.0, atol=1e-5)
    assert acc[2] == 1.0  # pred == target


def test_aggregate_scores_table(rng):
    """The unique/multiple x others aggregation table (scripts/eval.py:201-334)."""
    from instancerefer_tpu.train.evaluate import aggregate_scores

    ious = np.array([0.6, 0.1, 0.3, 0.9])
    acc = np.array([1.0, 0.0, 1.0, 1.0])
    multiple = np.array([0, 1, 1, 0])
    others = np.array([0, 0, 1, 1])
    t = aggregate_scores(ious, acc, multiple, others)
    assert set(t) == {"unique", "multiple", "overall"}
    assert set(t["unique"]) == {"not_in_others", "in_others", "overall"}
    # overall/overall over all 4 samples
    oo = t["overall"]["overall"]
    assert oo["count"] == 4
    np.testing.assert_allclose(oo["acc@0.25iou"], 3 / 4)
    np.testing.assert_allclose(oo["acc@0.5iou"], 2 / 4)
    np.testing.assert_allclose(oo["ref_acc"], 3 / 4)
    # unique x not_in_others = sample 0 only
    u = t["unique"]["not_in_others"]
    assert u["count"] == 1 and u["acc@0.5iou"] == 1.0
    # empty cells report 0 like the reference
    t2 = aggregate_scores(ious[:1], acc[:1], np.array([0]), np.array([0]))
    assert t2["multiple"]["overall"]["ref_acc"] == 0.0


def test_get_loss_skip_rules(rng):
    """<2 candidates and max-IoU<0.2 samples contribute zero ref loss."""
    from instancerefer_tpu.train.losses import get_loss

    b, c = 2, 3
    mean_size = jnp.asarray(np.ones((18, 3), np.float32))
    base = {
        "lang_scores": jnp.asarray(rng.normal(size=(b, 18)).astype(np.float32)),
        "object_cat": jnp.zeros(b, jnp.int32),
        "seg_scores": jnp.asarray(rng.normal(size=(b, 9)).astype(np.float32)),
        "ref_center_label": jnp.zeros((b, 3)),
        "point_min": jnp.zeros((b, 3)),
        "point_max": jnp.ones((b, 3)),
        "ref_heading_class_label": jnp.zeros(b, jnp.int32),
        "ref_heading_residual_label": jnp.zeros(b, jnp.int32),
        "ref_size_class_label": jnp.zeros(b, jnp.int32),
        "ref_size_residual_label": jnp.zeros((b, 3)),
        "attribute_scores": jnp.asarray(rng.normal(size=(b, c)).astype(np.float32)),
        "relation_scores": jnp.zeros((b, c)),
        "scene_scores": jnp.zeros((b, c)),
    }
    # case 1: both samples have 1 or 0 candidates -> ref_loss must be 0
    dd = dict(base)
    dd["cand_mask"] = jnp.asarray(np.array([[True, False, False], [False] * 3]))
    dd["pred_obb_batch"] = jnp.zeros((b, c, 7))
    out = get_loss(dd, mean_size)
    assert float(out["ref_loss"]) == 0.0

    # case 2: >=2 candidates but all far from GT (iou < 0.2) -> still 0
    dd = dict(base)
    dd["cand_mask"] = jnp.asarray(np.array([[True, True, False], [False] * 3]))
    far = np.zeros((b, c, 7), np.float32)
    far[0, :, :3] = 50.0
    far[0, :, 3:6] = 1.0
    dd["pred_obb_batch"] = jnp.asarray(far)
    out = get_loss(dd, mean_size)
    assert float(out["ref_loss"]) == 0.0

    # case 3: >=2 candidates, one overlapping -> positive loss possible
    dd = dict(base)
    dd["cand_mask"] = jnp.asarray(np.array([[True, True, False], [False] * 3]))
    near = far.copy()
    near[0, 0] = [0, 0, 0, 1, 1, 1, 0]
    dd["pred_obb_batch"] = jnp.asarray(near)
    out = get_loss(dd, mean_size)
    assert float(out["ref_loss"]) >= 0.0
    assert np.isfinite(float(out["loss"]))
