"""Production-numerics goldens: the shipped config computes GEMMs in bf16
(``config/InstanceRefer.yaml`` TPU section, ``ops/precision.py``), but every
parity oracle runs the f32 passthrough.  This suite bounds what bf16 does at
the MODEL level on the golden fixture batch (the same 0/1/>=2-candidate
coverage as tests/test_golden_model.py):

* eval DECISIONS are identical: candidate argmax, ref_acc, Acc@0.25/0.5,
  missed count, language argmax;
* scores stay within stated tolerances of the f32 run;
* a short optimizer trajectory (the real ``make_optimizer`` step) tracks the
  f32 trajectory within a stated loss bound and keeps learning.

The reference trains f32 end-to-end (lib/solver.py:195-229), so f32 remains
the parity dtype; this file is the evidence that the bf16 production mode
preserves its decisions.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instancerefer_tpu.data.pipeline import (
    BatchSpec,
    batch_to_device_dict,
    collate,
    pad_sample,
)
from instancerefer_tpu.data.synthetic import make_core_sample
from instancerefer_tpu.models.instancerefer import InstanceRefer
from instancerefer_tpu.ops.precision import set_compute_dtype
from instancerefer_tpu.train.evaluate import get_eval
from instancerefer_tpu.train.losses import get_loss

# full-tier only: compiles the model twice (f32 + bf16) on golden-scale shapes
pytestmark = pytest.mark.slow

SPEC = BatchSpec(
    max_tokens=24,
    max_instances=16,
    max_candidates=8,
    scene_caps=(4096, 2048, 1024, 512, 256),
    inst_caps=(2048, 1024, 1024, 512, 256),
)
MEAN_SIZE = np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
TARGET = 5
EVAL_KEYS = (
    "attribute_scores", "relation_scores", "scene_scores", "lang_scores",
    "ref_iou", "ref_acc", "ref_iou_rate_0.25", "ref_iou_rate_0.5",
    "num_missed", "lang_acc", "loss", "ref_loss", "lang_loss", "seg_loss",
)


def _make_batch():
    rng = np.random.default_rng(11)
    cores = []
    class_plans = [
        [TARGET, TARGET, TARGET, 1, 2, 3],
        [TARGET, 0, 1, 2, 3, 4],
        [0, 1, 2, 3, 4, 6],
        [TARGET, TARGET, TARGET, TARGET, 2, 3],
    ]
    for i, plan in enumerate(class_plans):
        core = make_core_sample(
            rng, num_points=1500, num_instances=6, points_per_instance=256,
            target_class=TARGET, num_candidates=0, scan_idx=i,
            mean_size_arr=MEAN_SIZE,
        )
        core.instance_class = list(plan)
        cores.append(core)
    cores[3].ref_center_label = cores[3].ref_center_label + 50.0
    return batch_to_device_dict(
        collate([pad_sample(c, SPEC) for c in cores], SPEC), SPEC
    )


@pytest.fixture(scope="module")
def runs():
    """{dtype: eval outputs} for the SAME weights/batch under f32 and bf16."""
    dd = _make_batch()
    model = InstanceRefer(
        input_feature_dim=SPEC.feat_dim, num_classes=18,
        max_candidates=SPEC.max_candidates,
    )
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(3), "dropout": jax.random.key(4)}, dd
    )
    out = {}
    try:
        for dtype in ("float32", "bfloat16"):
            # the compute-dtype global is read at TRACE time: set it, then
            # build a fresh jitted program
            set_compute_dtype(dtype)

            @jax.jit
            def run(variables, dd):
                o = model.apply(variables, dd, train=False)
                o = get_loss(o, jnp.asarray(MEAN_SIZE))
                o = get_eval(o)
                return {k: o[k] for k in EVAL_KEYS}

            out[dtype] = jax.tree.map(np.asarray, jax.device_get(run(variables, dd)))
    finally:
        set_compute_dtype(None)
    return out


def test_bf16_scores_close_to_f32(runs):
    f32, bf16 = runs["float32"], runs["bfloat16"]
    # cosine-similarity scores live in [-1, 1]; bf16 has ~3 decimal digits,
    # and the encoders stack ~12 GEMMs — 0.02 absolute is the stated bound
    for k in ("attribute_scores", "relation_scores", "scene_scores"):
        np.testing.assert_allclose(bf16[k], f32[k], atol=2e-2, err_msg=k)
    # language logits are one GRU + small MLPs; unnormalized, bound looser
    np.testing.assert_allclose(
        bf16["lang_scores"], f32["lang_scores"], atol=1e-1, rtol=2e-2,
    )


def test_bf16_identical_eval_decisions(runs):
    """Candidate selection and every eval decision must be IDENTICAL —
    bf16 may move scores, not answers, on the golden fixtures."""
    f32, bf16 = runs["float32"], runs["bfloat16"]
    np.testing.assert_array_equal(bf16["ref_acc"], f32["ref_acc"])
    np.testing.assert_allclose(bf16["ref_iou"], f32["ref_iou"], atol=1e-5)
    assert float(bf16["ref_iou_rate_0.25"]) == float(f32["ref_iou_rate_0.25"])
    assert float(bf16["ref_iou_rate_0.5"]) == float(f32["ref_iou_rate_0.5"])
    assert int(bf16["num_missed"]) == int(f32["num_missed"])
    assert float(bf16["lang_acc"]) == float(f32["lang_acc"])


def test_bf16_losses_close(runs):
    f32, bf16 = runs["float32"], runs["bfloat16"]
    for k in ("loss", "ref_loss", "lang_loss", "seg_loss"):
        np.testing.assert_allclose(
            float(bf16[k]), float(f32[k]), rtol=2e-2, atol=2e-3, err_msg=k
        )


def test_bf16_trajectory_tracks_f32():
    """4 steps of the REAL solver optimizer (make_optimizer: Adam + weight
    decay + schedules) under bf16 GEMMs: the loss curve must track the f32
    curve within 3% relative at every step and strictly decrease overall."""
    from instancerefer_tpu.train.solver import make_optimizer

    dd = _make_batch()
    model = InstanceRefer(
        input_feature_dim=SPEC.feat_dim, num_classes=18,
        max_candidates=SPEC.max_candidates,
    )
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.key(3), "dropout": jax.random.key(4)}, dd
    )
    mean_size = jnp.asarray(MEAN_SIZE)
    curves = {}
    try:
        for dtype in ("float32", "bfloat16"):
            set_compute_dtype(dtype)
            tx = make_optimizer(lr=1e-3, wd=1e-5, lr_decay_step=(15, 20),
                                lr_decay_rate=0.1, steps_per_epoch=4)
            params = variables["params"]
            stats = variables["batch_stats"]
            opt_state = tx.init(params)

            @jax.jit
            def step(params, stats, opt_state, dd):
                def loss_fn(p):
                    out, upd = model.apply(
                        {"params": p, "batch_stats": stats}, dd, train=True,
                        rngs={"dropout": jax.random.key(7)},
                        mutable=["batch_stats"],
                    )
                    out = get_loss(out, mean_size)
                    return out["loss"], upd["batch_stats"]

                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                import optax

                updates, opt2 = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), new_stats, opt2, loss

            losses = []
            for _ in range(4):
                params, stats, opt_state, loss = step(params, stats, opt_state, dd)
                losses.append(float(loss))
            curves[dtype] = losses
    finally:
        set_compute_dtype(None)
    f32, bf16 = curves["float32"], curves["bfloat16"]
    for i, (a, b) in enumerate(zip(f32, bf16)):
        assert abs(a - b) <= 0.03 * abs(a) + 1e-3, (i, f32, bf16)
    assert bf16[-1] < bf16[0], bf16  # still learning under bf16
