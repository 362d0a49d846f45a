"""DP sharding over the virtual 8-device CPU mesh (the fake-backend analogue)."""

import jax
import numpy as np
import pytest


def test_eight_fake_devices_present():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip_8():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dp_grads_match_single_device():
    """One DP step over 8 devices must equal the same step on 1 device."""
    from instancerefer_tpu.data.synthetic import TEST_SPEC, make_device_batch
    from instancerefer_tpu.models.instancerefer import InstanceRefer
    from instancerefer_tpu.parallel.mesh import make_mesh, shard_batch
    from instancerefer_tpu.train.losses import get_loss
    import jax.numpy as jnp

    spec = TEST_SPEC
    batch = make_device_batch(8, spec, seed=3)
    model = InstanceRefer(
        input_feature_dim=spec.feat_dim,
        num_classes=spec.num_classes,
        max_candidates=spec.max_candidates,
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False
    )
    mean_size = jnp.asarray(
        np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
    )

    def loss_fn(params, batch):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch,
            train=False,
        )
        return get_loss(out, mean_size)["loss"]

    grad_fn = jax.jit(jax.grad(loss_fn))
    g_single = jax.device_get(grad_fn(variables["params"], batch))

    mesh = make_mesh(jax.devices()[:8])
    sharded = shard_batch(batch, mesh)
    g_dp = jax.device_get(grad_fn(variables["params"], sharded))

    flat_s = jax.tree_util.tree_leaves(g_single)
    flat_d = jax.tree_util.tree_leaves(g_dp)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)
