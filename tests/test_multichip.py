"""DP sharding over the virtual 8-device CPU mesh (the fake-backend analogue)."""

import jax
import numpy as np
import pytest

# full-tier only: heavy compiles / torch oracles (see pytest.ini)
pytestmark = pytest.mark.slow


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


def _banded_fixture(rng, n_dev=8, cap=256):
    """Per-shard samples -> concatenated nbr map + block-clamped metadata."""
    from instancerefer_tpu.ops import voxelize as V

    nbrs = []
    for b in range(n_dev):
        pts = rng.uniform(0, 3, size=(1200, 3))
        coords, _ = V.quantize(pts, pts.astype(np.float32), 0.05, raster_order=True)
        pyr = V.build_pyramid(coords, owner=0, num_stages=2, caps=[4096, cap], raster=True)
        st = V.pad_stage(pyr[1], cap, 4096)
        nbrs.append(np.where(st.nbr3 >= 0, st.nbr3 + b * cap, -1))
    nbr = np.concatenate(nbrs)
    v = len(nbr)
    chunk = 64
    window = subwin = block = cap  # one sample per shard; window = whole shard
    ws, wskt, dropped, total = V.compute_offset_window_starts(
        nbr, chunk, window, subwin, v, block=block, count_drops=True
    )
    assert dropped == 0 and total > 0
    # block clamping keeps every window inside its shard's rows
    n = v // chunk
    blk_lo = (np.arange(n) * chunk // block) * block
    live = ws >= 0
    assert (ws[live] >= blk_lo[live]).all()
    assert (ws[live] + window <= blk_lo[live] + block).all()
    return nbr, ws, wskt, v, chunk, window, subwin


def test_sharded_banded_conv_matches_global():
    """The REAL banded Pallas kernel (interpret mode) under shard_map over
    block-clamped, per-shard-localized metadata must equal the global XLA
    conv — the multi-chip DP fast path (ops/pallas_conv.sharded_gather_conv)."""
    import jax.numpy as jnp

    from instancerefer_tpu.ops.pallas_conv import sharded_gather_conv
    from instancerefer_tpu.ops.sparse import gather_conv
    from instancerefer_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n_dev = 8
    nbr, ws, wskt, v, chunk, window, subwin = _banded_fixture(rng, n_dev)
    feats = rng.normal(size=(v, 16)).astype(np.float32)
    kernel = (rng.normal(size=(27, 16, 16)) * 0.1).astype(np.float32)
    make_mesh(jax.devices()[:n_dev])

    out = sharded_gather_conv(
        jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel),
        jnp.asarray(ws), jnp.asarray(wskt),
        window=window, chunk=chunk, subwin=subwin, shards=n_dev,
        interpret=True,
    )[:, :16]
    ref = np.asarray(gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_sharded_banded_grads_match_global():
    """Differentiable banded conv with shards=8: forward AND the fused
    banded backward (dX row-sharded, dW psum'd over the mesh) must match the
    global mirrored-gather XLA path's gradients."""
    import jax.numpy as jnp

    from instancerefer_tpu.ops.pallas_conv import banded_subm_conv
    from instancerefer_tpu.ops.sparse import subm_gather_conv
    from instancerefer_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(1)
    n_dev = 8
    nbr, ws, wskt, v, chunk, window, subwin = _banded_fixture(rng, n_dev)
    feats = rng.normal(size=(v, 16)).astype(np.float32)
    kernel = (rng.normal(size=(27, 16, 16)) * 0.1).astype(np.float32)
    cot = rng.normal(size=(v, 16)).astype(np.float32)
    make_mesh(jax.devices()[:n_dev])

    def banded(f, k):
        out = banded_subm_conv(
            f, jnp.asarray(nbr), k, jnp.asarray(ws), jnp.asarray(wskt),
            window=window, chunk=chunk, subwin=subwin, shards=n_dev,
            interpret=True,
        )[:, :16]
        return jnp.sum(out * cot)

    def xla(f, k):
        return jnp.sum(subm_gather_conv(f, jnp.asarray(nbr), k) * cot)

    gb = jax.grad(banded, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(kernel))
    gx = jax.grad(xla, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(kernel))
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gx[0]), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gx[1]), rtol=2e-3, atol=2e-4)


def test_sharded_wrapper_fallback_unsharded():
    """shards>1 with no matching active mesh must fall back to the plain
    kernel call — and block-clamped metadata is still VALID globally
    (clamping only restricts windows to slabs that already contain all
    their neighbors), so the fallback is exact, not just safe."""
    import jax.numpy as jnp

    from instancerefer_tpu.ops.pallas_conv import sharded_gather_conv
    from instancerefer_tpu.ops.sparse import gather_conv
    from instancerefer_tpu.parallel.mesh import active_mesh, set_active_mesh

    rng = np.random.default_rng(2)
    n_dev = 8
    nbr, ws, wskt, v, chunk, window, subwin = _banded_fixture(rng, n_dev)
    feats = rng.normal(size=(v, 16)).astype(np.float32)
    kernel = (rng.normal(size=(27, 16, 16)) * 0.1).astype(np.float32)

    prev = active_mesh()
    try:
        set_active_mesh(None)  # no mesh registered -> unsharded fallback
        out = sharded_gather_conv(
            jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel),
            jnp.asarray(ws), jnp.asarray(wskt),
            window=window, chunk=chunk, subwin=subwin, shards=n_dev,
            interpret=True,
        )[:, :16]
    finally:
        set_active_mesh(prev)
    ref = np.asarray(
        gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel))
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_dp_banded_model_grads_match_xla():
    """Full-model gradients through the shard_map'd banded kernels (8-device
    DP, interpret mode, incl. banded down-conv fwd/dW and inverse-map dX)
    must match the single-program XLA conv path on the same batch."""
    import dataclasses

    import jax.numpy as jnp

    from instancerefer_tpu.data.pipeline import BatchSpec, batch_to_device_dict
    from instancerefer_tpu.data.synthetic import make_batch
    from instancerefer_tpu.models.instancerefer import InstanceRefer
    from instancerefer_tpu.parallel.mesh import make_mesh, shard_batch
    from instancerefer_tpu.train.losses import get_loss

    n_dev = 8
    spec = BatchSpec(
        max_tokens=12,
        max_instances=8,
        max_candidates=4,
        scene_caps=(128, 64, 32, 16, 16),
        inst_caps=(128, 64, 32, 16, 16),
        pallas_conv=True,
        pallas_interpret=True,
        data_shards=n_dev,
        pallas_chunk=32,
        pallas_window=128,
        pallas_subwin=128,
        pallas_subwin_inst=128,
        pallas_down_chunk=32,
        pallas_down_window=(0, 128, 0, 0, 0),
        pallas_down_subwin=(0, 128, 0, 0, 0),
        pallas_down_window_inst=(0, 128, 0, 0, 0),
        pallas_down_subwin_inst=(0, 128, 0, 0, 0),
        pallas_up_window=64,
        pallas_up_subwin=64,
    )
    batch = make_batch(n_dev, spec, seed=7, num_points=600, num_instances=5)
    dd_banded = batch_to_device_dict(dict(batch), spec)
    dd_banded.pop("scene_band_drop", None)
    dd_banded.pop("inst_band_drop", None)
    # the banded path must actually engage on the stem + stage-1 down maps
    assert dd_banded["scene_pyramid"][0].ws3 is not None
    assert dd_banded["scene_pyramid"][1].wsd is not None
    dd_xla = batch_to_device_dict(
        dict(batch), dataclasses.replace(spec, pallas_conv=False)
    )

    model = InstanceRefer(
        input_feature_dim=spec.feat_dim,
        num_classes=spec.num_classes,
        max_candidates=spec.max_candidates,
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        dd_xla, train=False,
    )
    mean_size = jnp.asarray(
        np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
    )

    def loss_fn(params, dd):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            dd, train=False,
        )
        return get_loss(out, mean_size)["loss"]

    g_xla = jax.device_get(jax.jit(jax.grad(loss_fn))(variables["params"], dd_xla))

    mesh = make_mesh(jax.devices()[:n_dev])
    sharded = shard_batch(dd_banded, mesh)
    g_dp = jax.device_get(jax.jit(jax.grad(loss_fn))(variables["params"], sharded))

    flat_x, flat_d = jax.tree_util.tree_leaves(g_xla), jax.tree_util.tree_leaves(g_dp)
    for a, b in zip(flat_x, flat_d):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)


def test_multihost_globalize_indices_assembles_global_batch():
    """Two fake hosts' device dicts, index-globalized and concatenated in
    process order, must equal the single-host device dict of the global batch.

    This pins the multi-host contract end-to-end at the data layer: each host
    collates its own ``host_shard_indices`` slice with HOST-LOCAL offsets, and
    ``parallel.mesh.globalize_batch_indices`` (called by ``shard_batch`` when
    ``process_count > 1``) rebases every index family — voxel owners,
    nbr3/down/up8/up_row maps, banded window starts — to the global layout
    that ``jax.make_array_from_process_local_data`` produces.  Without the
    rebase, host p>0's gathers/scatters/poolings would silently read and
    write host 0's rows."""
    from instancerefer_tpu.data.pipeline import (
        BatchSpec,
        batch_to_device_dict,
        finalize_batch,
        pad_sample,
        pop_band_diagnostics,
    )
    from instancerefer_tpu.data.synthetic import make_core_sample
    from instancerefer_tpu.parallel.mesh import (
        globalize_batch_indices,
        host_shard_indices,
    )

    spec = BatchSpec(
        max_tokens=12,
        max_instances=8,
        max_candidates=4,
        scene_caps=(128, 64, 32, 16, 16),
        inst_caps=(128, 64, 32, 16, 16),
        pallas_conv=True,
        pallas_interpret=True,
        pallas_chunk=32,
        pallas_window=128,
        pallas_subwin=128,
        pallas_subwin_inst=128,
        pallas_down_chunk=32,
        pallas_down_window=(0, 128, 0, 0, 0),
        pallas_down_subwin=(0, 128, 0, 0, 0),
        pallas_down_window_inst=(0, 128, 0, 0, 0),
        pallas_down_subwin_inst=(0, 128, 0, 0, 0),
        pallas_up_window=64,
        pallas_up_subwin=64,
    )
    rng = np.random.default_rng(11)
    padded = [
        pad_sample(
            make_core_sample(rng, num_points=600, num_instances=5, scan_idx=i), spec
        )
        for i in range(4)
    ]

    # per-host sample slices exactly as scripts/train.py wires them
    pc = 2
    host_dds = []
    host_order = []
    for pi in range(pc):
        mine = host_shard_indices(4, process_index=pi, process_count=pc)
        host_order += list(mine)
        dd = batch_to_device_dict(
            finalize_batch([padded[i] for i in mine], len(mine), spec), spec
        )
        pop_band_diagnostics(dd)
        host_dds.append(
            globalize_batch_indices(dd, process_index=pi, process_count=pc)
        )

    g = batch_to_device_dict(
        finalize_batch([padded[i] for i in host_order], 4, spec), spec
    )
    pop_band_diagnostics(g)

    # the banded metadata must actually be present, or the test proves nothing
    assert g["scene_pyramid"][0].ws3 is not None
    assert g["scene_pyramid"][1].wsd is not None
    assert g["scene_pyramid"][1].wsu is not None

    transposed = ("wsk3", "wskd", "wsktu")
    arrays = (
        "coords", "owner", "mask", "nbr3", "down", "ws3", "wsk3",
        "up_row", "up_k", "wsd", "wskd", "up8", "wsu", "wsktu",
    )
    for key in g:
        if key in ("scene_pyramid", "inst_pyramid"):
            for s, gst in enumerate(g[key]):
                for f in arrays:
                    gv = getattr(gst, f)
                    hvs = [getattr(dd[key][s], f) for dd in host_dds]
                    if gv is None:
                        assert all(h is None for h in hvs), (key, s, f)
                        continue
                    got = np.concatenate(
                        [np.asarray(h) for h in hvs],
                        axis=1 if f in transposed else 0,
                    )
                    np.testing.assert_array_equal(
                        got, np.asarray(gv), err_msg=f"{key}[{s}].{f}"
                    )
        else:
            got = np.concatenate([np.asarray(dd[key]) for dd in host_dds], axis=0)
            np.testing.assert_array_equal(got, np.asarray(g[key]), err_msg=key)


def test_host_local_orders_shards_by_leading_offset():
    """host_local's non-addressable fallback must order shards by their
    leading-axis slice start (Shard.index is a tuple of slices — not
    directly comparable) and concatenate this process's rows in order."""
    import numpy as np

    from instancerefer_tpu.parallel.mesh import host_local

    class FakeShard:
        def __init__(self, start, stop, data):
            self.index = (slice(start, stop), slice(None))
            self.data = data

    class FakeArray:
        def __init__(self):
            rows = np.arange(8, dtype=np.float32)[:, None] * np.ones((1, 3))
            # addressable_shards deliberately out of order
            self.addressable_shards = [
                FakeShard(4, 8, rows[4:8]),
                FakeShard(0, 4, rows[0:4]),
            ]
            self.rows = rows

    import jax

    fake = FakeArray()
    orig = jax.device_get

    def raising_get(x):
        raise RuntimeError("not fully addressable")

    jax.device_get = raising_get
    try:
        out = host_local(fake)
    finally:
        jax.device_get = orig
    np.testing.assert_array_equal(out, fake.rows)
