"""Train-mode forward golden: one key-by-key comparison of the flax model in
train mode (dropout 0) against the train-mode CPU replica
(golden_replica.ReplicaTrain) — torch BN batch statistics over the collated
batch, plus the resulting running-stat update.

Closes the last untested model mode: the eval goldens (test_golden_model)
pin BN-on-running-stats; the trajectory golden (test_golden_trajectory) pins
multi-step dynamics; this pins a single train-mode forward's observable
outputs key by key, so a train-mode-only wiring bug (masked batch stats,
momentum application, joint-batch pooling) is localized to a key.
Reference: torchsparse spnn.BatchNorm / torch BN train semantics under
models/attribute_module.py:101 (all candidates in one SparseTensor) and
models/scene_module.py (dense-head BNs over the whole batch).
"""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import golden_replica as gr
import test_golden_model as tgm
from test_golden_trajectory import _torch_ddt

from instancerefer_tpu.data.pipeline import batch_to_device_dict, collate, pad_sample
from instancerefer_tpu.models.instancerefer import InstanceRefer
from instancerefer_tpu.train.losses import get_loss

# full-tier only: heavy compiles / torch oracles (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def train_forward():
    cores = tgm._make_cores()
    padded = [pad_sample(c, tgm.SPEC) for c in cores]
    dd = batch_to_device_dict(collate(padded, tgm.SPEC), tgm.SPEC)

    model = InstanceRefer(
        input_feature_dim=tgm.SPEC.feat_dim, num_classes=18,
        max_candidates=tgm.SPEC.max_candidates, dropout_override=0.0,
    )
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(3), "dropout": jax.random.key(4)}, dd
    )
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    @jax.jit
    def run(variables, dd):
        out, upd = model.apply(
            variables, dd, train=True, bn_momentum=0.1,
            rngs={"dropout": jax.random.key(0)}, mutable=["batch_stats"],
        )
        out = get_loss(out, jnp.asarray(tgm.MEAN_SIZE))
        keys = ["lang_scores", "attribute_scores", "relation_scores",
                "scene_scores", "seg_scores", "vis_atten", "obj_feats",
                "loss", "ref_loss", "lang_loss", "seg_loss", "seg_acc"]
        return {k: out[k] for k in keys}, upd["batch_stats"]

    out, new_stats = jax.device_get(run(variables, dd))
    out = jax.tree.map(np.asarray, out)

    replica = gr.ReplicaTrain(params, stats, voxel_size_ap=0.02)
    ddt = _torch_ddt(cores, tgm.SPEC)
    with torch.no_grad():
        ddt = replica.forward(ddt)
        ddt = gr.replica_get_loss(ddt, tgm.MEAN_SIZE)
    ncand = np.array([len(ddt["pred_obb_batch"][i]) for i in range(len(cores))])
    return out, ddt, ncand, new_stats, replica.running_stats_tree()


def _flat(padded_arr, ncand):
    rows = [np.asarray(padded_arr)[b, : int(n)] for b, n in enumerate(ncand) if n >= 2]
    return np.concatenate(rows) if rows else np.zeros(0)


def test_train_mode_scores_match(train_forward):
    out, ddt, ncand, _, _ = train_forward
    np.testing.assert_allclose(
        out["lang_scores"], ddt["lang_scores"].numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        _flat(out["attribute_scores"], ncand), ddt["attribute_scores"].numpy(),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        _flat(out["relation_scores"], ncand), ddt["relation_scores"].numpy(),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        _flat(out["scene_scores"], ncand), ddt["scene_scores"].numpy(),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        out["seg_scores"], ddt["seg_scores"].numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        out["vis_atten"], ddt["vis_atten"].numpy(), atol=2e-4
    )


def test_train_mode_losses_match(train_forward):
    out, ddt, _, _, _ = train_forward
    for k in ("loss", "ref_loss", "lang_loss", "seg_loss"):
        np.testing.assert_allclose(
            float(out[k]), float(ddt[k]), rtol=2e-3, atol=1e-4, err_msg=k
        )
    assert float(out["seg_acc"]) == pytest.approx(float(ddt["seg_acc"]))


def test_train_mode_stat_update_matches(train_forward):
    """One forward's running-stat update (masked batch stats + momentum)
    matches torch BN exactly, key by key."""
    _, _, _, jx_stats, t_stats = train_forward

    def leaves(tree, prefix=""):
        if isinstance(tree, dict):
            for k in sorted(tree):
                yield from leaves(tree[k], f"{prefix}/{k}")
        else:
            yield prefix, np.asarray(tree)

    jl, tl = dict(leaves(jx_stats)), dict(leaves(t_stats))
    assert set(jl) == set(tl)
    for name in sorted(jl):
        scale = max(float(np.abs(tl[name]).max()), 1e-2)
        np.testing.assert_allclose(
            jl[name], tl[name], rtol=2e-3, atol=2e-3 * scale, err_msg=name
        )
