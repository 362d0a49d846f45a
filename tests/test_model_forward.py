"""End-to-end forward smoke test on synthetic scenes: pipeline -> model -> loss -> eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancerefer_tpu.data.synthetic import TEST_SPEC, make_device_batch
from instancerefer_tpu.models.instancerefer import InstanceRefer
from instancerefer_tpu.train.evaluate import get_eval
from instancerefer_tpu.train.losses import get_loss, scene_region_label

B = 2


@pytest.fixture(scope="module")
def model_and_batch():
    batch = make_device_batch(B, TEST_SPEC, seed=1)
    model = InstanceRefer(
        input_feature_dim=TEST_SPEC.feat_dim,
        num_classes=TEST_SPEC.num_classes,
        max_candidates=TEST_SPEC.max_candidates,
    )
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch
    )
    return model, variables, batch


def test_forward_shapes_and_finiteness(model_and_batch):
    model, variables, batch = model_and_batch
    out = model.apply(variables, batch, train=False)
    c = TEST_SPEC.max_candidates
    assert out["lang_scores"].shape == (B, 18)
    assert out["attribute_scores"].shape == (B, c)
    assert out["relation_scores"].shape == (B, c)
    assert out["scene_scores"].shape == (B, c)
    assert out["seg_scores"].shape == (B, 9)
    assert out["obj_feats"].shape == (B, c, 128)
    for k in ["lang_scores", "attribute_scores", "relation_scores", "scene_scores", "seg_scores"]:
        assert np.isfinite(np.asarray(out[k])).all(), k
    # cosine/dot scores of L2-normalized vectors are bounded
    assert (np.abs(np.asarray(out["attribute_scores"])) <= 1.0 + 1e-5).all()
    assert (np.abs(np.asarray(out["relation_scores"])) <= 1.0 + 1e-5).all()


def test_loss_and_eval(model_and_batch):
    model, variables, batch = model_and_batch
    out = model.apply(variables, batch, train=False)
    mean_size = jnp.asarray(np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]]))
    out = get_loss(out, mean_size)
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["ref_loss"]))
    assert float(out["ref_loss"]) >= 0.0
    out = get_eval(out)
    assert out["ref_iou"].shape == (B,)
    assert ((np.asarray(out["ref_iou"]) >= 0) & (np.asarray(out["ref_iou"]) <= 1)).all()
    assert out["pred_bboxes"].shape == (B, 8, 3)


def test_train_mode_mutates_batch_stats(model_and_batch):
    model, variables, batch = model_and_batch
    out, updates = model.apply(
        variables,
        batch,
        train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    # running stats must move away from init after one training step
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )
    assert changed


def test_scene_region_label_truth_table():
    # 3x3 grid over [0,3]^2: centers of each cell must map to labels 0..8
    point_min = jnp.zeros((9, 3))
    point_max = jnp.full((9, 3), 3.0)
    centers = []
    for iy in range(3):
        for ix in range(3):
            centers.append([ix + 0.5, iy + 0.5, 1.0])
    labels = scene_region_label(jnp.asarray(centers), point_min, point_max)
    assert labels.tolist() == list(range(9))
