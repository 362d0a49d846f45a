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


def test_sharded_banded_localization_harness():
    """The DP index-localization harness for the banded convs: a shard_map'd
    conv over block-clamped metadata with per-shard offset subtraction must
    equal the global conv.  (The local conv here is the XLA gather path —
    this jax's interpret mode mis-shards pallas_calls with scalar prefetch
    under shard_map, so the Pallas kernels themselves run single-device; the
    metadata/localization math validated here is what a future shard_map
    integration of the real kernels reuses, see ops/voxelize
    compute_offset_window_starts(block=...).)"""
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from instancerefer_tpu.ops import voxelize as V
    from instancerefer_tpu.ops.sparse import gather_conv

    rng = np.random.default_rng(0)
    n_dev, cap = 8, 256
    nbrs = []
    for b in range(n_dev):
        pts = rng.uniform(0, 3, size=(1200, 3))
        coords, _ = V.quantize(pts, pts.astype(np.float32), 0.05, raster_order=True)
        pyr = V.build_pyramid(coords, owner=0, num_stages=2, caps=[4096, cap], raster=True)
        st = V.pad_stage(pyr[1], cap, 4096)
        nbrs.append(np.where(st.nbr3 >= 0, st.nbr3 + b * cap, -1))
    nbr = np.concatenate(nbrs)
    v = len(nbr)
    chunk = window = subwin = block = 256  # one sample per shard
    ws, wskt = V.compute_offset_window_starts(
        nbr, chunk, window, subwin, v, block=block
    )
    # block clamping keeps every window inside its shard's rows
    n = v // chunk
    blk_lo = (np.arange(n) * chunk // block) * block
    live = ws >= 0
    assert (ws[live] >= blk_lo[live]).all()
    assert (ws[live] + window <= blk_lo[live] + block).all()

    feats = rng.normal(size=(v, 16)).astype(np.float32)
    kernel = (rng.normal(size=(27, 16, 16)) * 0.1).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
    local_rows = v // n_dev

    def local_fn(feats_l, nbr_l, ws_l, wskt_l, kern):
        off = jax.lax.axis_index("data") * local_rows
        nbr_adj = jnp.where(nbr_l >= 0, nbr_l - off, -1)
        del ws_l, wskt_l  # the XLA stand-in needs only the localized map
        return gather_conv(feats_l, nbr_adj, kern)

    @jax.jit
    def run(feats, nbr, ws, wskt, kern):
        f = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P(None, "data"), P()),
            out_specs=P("data"), check_vma=False,
        )
        return f(feats, nbr, ws, wskt, kern)

    out = np.asarray(run(*map(jnp.asarray, (feats, nbr, ws, wskt, kernel))))
    ref = np.asarray(gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
