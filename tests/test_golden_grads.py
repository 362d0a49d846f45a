"""Gradient goldens: d(loss)/d(params) of the flax model vs torch autograd
through the CPU replica (tests/golden_replica.py), same shared weights.

The forward goldens (test_golden_model.py) pin every activation; this pins
the whole backward — any mis-specified custom VJP (mirrored-gather subm
conv, inverse-map down conv, banded kernels' fused backward share these
rules), stop-gradient mistake, or mask that silently blocks gradients would
show up as a diverging parameter gradient.  Reference semantics:
/root/reference/lib/loss_helper.py:196-269 define the loss both frameworks
differentiate.
"""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import golden_replica as gr
import test_golden_model as tgm

from instancerefer_tpu.data.pipeline import batch_to_device_dict, collate, pad_sample
from instancerefer_tpu.models.instancerefer import InstanceRefer
from instancerefer_tpu.train.losses import get_loss

# full-tier only: heavy compiles / torch oracles (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def golden_grads():
    cores = tgm._make_cores()
    padded = [pad_sample(c, tgm.SPEC) for c in cores]
    batch = collate(padded, tgm.SPEC)
    dd = batch_to_device_dict(batch, tgm.SPEC)

    model = InstanceRefer(
        input_feature_dim=tgm.SPEC.feat_dim, num_classes=18,
        max_candidates=tgm.SPEC.max_candidates,
    )
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(3), "dropout": jax.random.key(4)}, dd
    )
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    @jax.jit
    def grad_fn(p, dd):
        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": stats}, dd, train=False)
            return get_loss(out, jnp.asarray(tgm.MEAN_SIZE))["loss"]

        return jax.grad(loss_fn)(p)

    grads_jax = jax.device_get(grad_fn(params, dd))

    # torch side: same weights as requires_grad leaves
    params_t = gr.torch_param_tree(params)
    replica = gr.Replica(params_t, stats, voxel_size_ap=0.02)
    tmax = tgm.SPEC.max_tokens
    lang_feat = np.zeros((len(cores), tmax, 300), np.float32)
    for i, c in enumerate(cores):
        lang_feat[i, : c.lang_feat.shape[0]] = c.lang_feat[:tmax]
    ddt = {
        "lang_feat": torch.tensor(lang_feat),
        "lang_len": np.array([c.lang_len for c in cores], np.int64),
        "object_cat": np.array([c.object_cat for c in cores], np.int64),
        "instance_points": [c.instance_points for c in cores],
        "instance_class": [c.instance_class for c in cores],
        "instance_obbs": [c.instance_obbs for c in cores],
        "point_min": np.stack([c.point_cloud[:, :3].min(0) for c in cores]),
        "point_max": np.stack([c.point_cloud[:, :3].max(0) for c in cores]),
        "ref_center_label": np.stack([c.ref_center_label for c in cores]),
        "ref_size_class_label": np.array([c.ref_size_class_label for c in cores]),
        "ref_size_residual_label": np.stack(
            [c.ref_size_residual_label for c in cores]
        ),
        "lidar": [
            gr.quantize_first(c.point_cloud[:, :3], c.point_cloud[:, :7], 0.05)
            for c in cores
        ],
    }
    ddt = replica.forward(ddt, enable_grad=True)
    ddt = gr.replica_get_loss(ddt, tgm.MEAN_SIZE)
    ddt["loss"].backward()
    grads_torch = gr.collect_param_grads(params_t, replica)
    return grads_jax, grads_torch


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaves(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


def test_every_param_gradient_matches(golden_grads):
    grads_jax, grads_torch = golden_grads
    jl = dict(_leaves(grads_jax))
    tl = dict(_leaves(grads_torch))
    assert set(jl) == set(tl)
    for name in sorted(jl):
        gj, gt = jl[name], tl[name]
        assert gj.shape == gt.shape, name
        scale = max(float(np.abs(gt).max()), 1e-6)
        # absolute floor 1e-6: analytically-zero grads (e.g. attention-logit
        # biases, where a constant shift cannot move the softmax) come out as
        # ~1e-9 roundoff on one side and exact 0 on the other
        np.testing.assert_allclose(
            gj, gt, rtol=2e-3, atol=max(2e-3 * scale, 1e-6),
            err_msg=f"param {name} (|g|max={scale:.2e})",
        )


def test_gradients_reach_every_module(golden_grads):
    """Sanity that the comparison is not trivially 0 == 0: each submodule
    must receive a nonzero gradient somewhere."""
    grads_jax, _ = golden_grads
    for mod in ("lang", "attribute", "relation", "scene"):
        total = sum(
            float(np.abs(g).sum()) for _, g in _leaves(grads_jax[mod])
        )
        assert total > 0, mod
