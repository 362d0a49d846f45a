"""Padding-mask metric correctness: a partial final batch filled with
duplicated rows (PaddedLoader.finalize) must report exactly the metrics of
the unpadded batch — reference semantics, where the last torch batch is
genuinely smaller (``lib/solver.py:295-319``)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancerefer_tpu.data.pipeline import batch_to_device_dict, collate, pad_sample
from instancerefer_tpu.data.synthetic import TEST_SPEC, make_core_sample
from instancerefer_tpu.models.instancerefer import InstanceRefer
from instancerefer_tpu.train.evaluate import get_eval
from instancerefer_tpu.train.losses import get_loss

SCALAR_KEYS = [
    "loss", "ref_loss", "lang_loss", "seg_loss", "lang_acc", "seg_acc",
    "ref_acc_mean", "ref_iou_rate_0.25", "ref_iou_rate_0.5",
]


@pytest.fixture(scope="module")
def clean_and_padded():
    rng = np.random.default_rng(7)
    cores = [make_core_sample(rng, scan_idx=i) for i in range(2)]
    padded = [pad_sample(c, TEST_SPEC) for c in cores]

    clean = collate(padded, TEST_SPEC)
    clean["sample_valid"] = np.array([True, True])

    # what PaddedLoader.finalize produces for a 2-sample tail at batch size 4
    dup = collate([padded[0], padded[1], padded[1], padded[1]], TEST_SPEC)
    dup["sample_valid"] = np.array([True, True, False, False])

    model = InstanceRefer(
        input_feature_dim=TEST_SPEC.feat_dim,
        num_classes=TEST_SPEC.num_classes,
        max_candidates=TEST_SPEC.max_candidates,
    )
    dd_clean = batch_to_device_dict(clean, TEST_SPEC)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, dd_clean
    )
    mean_size = jnp.asarray(
        np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
    )

    def run(batch):
        dd = batch_to_device_dict(batch, TEST_SPEC)
        out = model.apply(variables, dd, train=False)
        return get_eval(get_loss(out, mean_size))

    return run(clean), run(dup)


def test_scalar_metrics_ignore_duplicated_rows(clean_and_padded):
    out_clean, out_dup = clean_and_padded
    for k in SCALAR_KEYS:
        np.testing.assert_allclose(
            float(out_dup[k]), float(out_clean[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )


def test_per_sample_rows_match_on_valid(clean_and_padded):
    out_clean, out_dup = clean_and_padded
    valid = np.asarray(out_dup["sample_valid"]).astype(bool)
    assert valid.tolist() == [True, True, False, False]
    for k in ["ref_iou", "ref_acc", "lang_correct"]:
        np.testing.assert_allclose(
            np.asarray(out_dup[k])[valid], np.asarray(out_clean[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def test_num_missed_counts_valid_rows_only(clean_and_padded):
    out_clean, out_dup = clean_and_padded
    assert int(out_dup["num_missed"]) == int(out_clean["num_missed"])


@pytest.mark.slow  # compiles a full train step (~3.5 min on this box)
def test_tail_batch_train_step_grads_match_clean():
    """A loader-finalized tail batch (duplicated rows, owners cleared) must
    produce EXACTLY the clean smaller batch's loss, parameter gradients, and
    train-mode BatchNorm batch-stats updates — the reference trains on the
    genuinely smaller final torch batch (``scripts/train.py:61-68``,
    ``lib/loss_helper.py:263``), so drop_last=False parity is gradient-level,
    not just metric-level."""
    from instancerefer_tpu.data.pipeline import finalize_batch

    rng = np.random.default_rng(11)
    cores = [make_core_sample(rng, scan_idx=i) for i in range(3)]
    padded = [pad_sample(c, TEST_SPEC) for c in cores]
    clean = collate(padded, TEST_SPEC)
    clean["sample_valid"] = np.ones(3, bool)
    tail = finalize_batch(padded, 4, TEST_SPEC)
    assert tail["sample_valid"].tolist() == [True, True, True, False]
    # duplicated sample's voxel rows are padding at every stage
    for s, cap in enumerate(TEST_SPEC.scene_caps):
        assert (tail[f"scene_owner_{s}"][3 * cap:] == -1).all()

    model = InstanceRefer(
        input_feature_dim=TEST_SPEC.feat_dim,
        num_classes=TEST_SPEC.num_classes,
        max_candidates=TEST_SPEC.max_candidates,
        dropout_override=0.0,  # remove train-mode stochasticity
    )
    dd_clean = batch_to_device_dict(clean, TEST_SPEC)
    dd_tail = batch_to_device_dict(tail, TEST_SPEC)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, dd_clean
    )
    mean_size = jnp.asarray(
        np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
    )

    def loss_fn(params, dd):
        out, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            dd, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)},
        )
        return get_loss(out, mean_size)["loss"], upd["batch_stats"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (loss_c, stats_c), g_c = jax.device_get(grad_fn(variables["params"], dd_clean))
    (loss_t, stats_t), g_t = jax.device_get(grad_fn(variables["params"], dd_tail))

    np.testing.assert_allclose(loss_t, loss_c, rtol=1e-5, atol=1e-7)
    paths_c = jax.tree_util.tree_leaves_with_path(g_c)
    flat_t = jax.tree_util.tree_leaves(g_t)
    for (path, a), b in zip(paths_c, flat_t):
        # atol floor: biases feeding straight into BatchNorm have exactly-zero
        # true gradients (mean subtraction cancels them), so those leaves are
        # pure f32 reduction noise (up to ~2e-5 after the BN inv-sigma
        # amplification); leaves with real signal are O(1e-3..1) and the
        # rtol binds
        np.testing.assert_allclose(
            b, a, rtol=1e-4, atol=5e-5, err_msg=jax.tree_util.keystr(path)
        )
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(stats_c),
        jax.tree_util.tree_leaves(stats_t),
    ):
        np.testing.assert_allclose(
            b, a, rtol=1e-5, atol=1e-7, err_msg=jax.tree_util.keystr(path)
        )
