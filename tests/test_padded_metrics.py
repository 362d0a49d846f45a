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
