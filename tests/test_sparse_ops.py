"""gather_conv / pooling vs dense-conv brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from instancerefer_tpu.ops import voxelize as V
from instancerefer_tpu.ops.sparse import (
    gather_conv,
    gather_rows,
    masked_global_max_pool,
    masked_mean,
)


def test_gather_rows_zero_fill(rng):
    feats = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    idx = jnp.array([[0, -1], [4, 2]])
    out = gather_rows(feats, idx)
    np.testing.assert_allclose(out[0, 0], feats[0])
    np.testing.assert_allclose(out[0, 1], np.zeros(3))
    np.testing.assert_allclose(out[1, 0], feats[4])


def dense_subm_conv(coords, feats, kernel):
    """Brute-force submanifold 3^3 conv on a dict grid."""
    lut = {tuple(c): i for i, c in enumerate(coords)}
    out = np.zeros((len(coords), kernel.shape[-1]), np.float32)
    for i, c in enumerate(coords):
        for k, off in enumerate(V.KERNEL_OFFSETS_3):
            j = lut.get(tuple(c + off))
            if j is not None:
                out[i] += feats[j] @ kernel[k]
    return out


@pytest.mark.parametrize("cin,cout", [(7, 32), (64, 64)])
def test_gather_conv_matches_dense(rng, cin, cout):
    coords = np.unique(rng.integers(0, 6, size=(100, 3)).astype(np.int32), axis=0)
    feats = rng.normal(size=(len(coords), cin)).astype(np.float32)
    kernel = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
    nbr = V.build_nbr3(coords, stride=1)
    got = gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel))
    want = dense_subm_conv(coords, feats, kernel)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_gather_conv_im2col_equals_loop(rng):
    coords = np.unique(rng.integers(0, 5, size=(60, 3)).astype(np.int32), axis=0)
    feats = rng.normal(size=(len(coords), 16)).astype(np.float32)
    kernel = rng.normal(size=(27, 16, 8)).astype(np.float32)
    nbr = jnp.asarray(V.build_nbr3(coords, stride=1))
    a = gather_conv(jnp.asarray(feats), nbr, jnp.asarray(kernel), im2col_limit=10_000)
    b = gather_conv(jnp.asarray(feats), nbr, jnp.asarray(kernel), im2col_limit=0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_downsample_conv_matches_dense(rng):
    coords = np.unique(rng.integers(0, 8, size=(150, 3)).astype(np.int32), axis=0)
    feats = rng.normal(size=(len(coords), 8)).astype(np.float32)
    kernel = rng.normal(size=(8, 8, 4)).astype(np.float32)
    out_coords, down = V.build_downsample(coords, stride=1)
    got = gather_conv(jnp.asarray(feats), jnp.asarray(down), jnp.asarray(kernel))
    lut = {tuple(c): i for i, c in enumerate(coords)}
    want = np.zeros((len(out_coords), 4), np.float32)
    for i, oc in enumerate(out_coords):
        for k, off in enumerate(V.KERNEL_OFFSETS_2):
            j = lut.get(tuple(oc + off))
            if j is not None:
                want[i] += feats[j] @ kernel[k]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_subm_conv_custom_vjp_matches_autodiff(rng):
    """The mirrored-gather backward must equal XLA's scatter-based autodiff."""
    import jax

    from instancerefer_tpu.ops.sparse import subm_gather_conv

    coords = np.unique(rng.integers(0, 6, size=(120, 3)).astype(np.int32), axis=0)
    nbr = jnp.asarray(V.build_nbr3(coords, 1))
    x = jnp.asarray(rng.normal(size=(len(coords), 16)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(27, 16, 8)) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(len(coords), 8)).astype(np.float32))

    ref = jax.grad(lambda x, w: jnp.vdot(gather_conv(x, nbr, w), g), argnums=(0, 1))(x, w)
    got = jax.grad(lambda x, w: jnp.vdot(subm_gather_conv(x, nbr, w), g), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-5, atol=1e-5)
    # forward identical too
    np.testing.assert_allclose(
        np.asarray(subm_gather_conv(x, nbr, w)), np.asarray(gather_conv(x, nbr, w)),
        rtol=1e-6,
    )


def test_down_conv_custom_vjp_matches_autodiff(rng):
    """The inverse-map (scatter-free) down-conv backward must equal XLA's
    scatter-based autodiff of the same forward."""
    import jax

    from instancerefer_tpu.ops.sparse import down_gather_conv

    coords = np.unique(rng.integers(0, 8, size=(200, 3)).astype(np.int32), axis=0)
    _, down = V.build_downsample(coords, stride=1)
    down = jnp.asarray(down)
    # host inversion mirroring data/pipeline.batch_to_device_dict
    up_row = np.full(len(coords), -1, np.int32)
    up_k = np.full(len(coords), -1, np.int32)
    vv, kk = np.nonzero(np.asarray(down) >= 0)
    tgt = np.asarray(down)[vv, kk]
    up_row[tgt] = vv.astype(np.int32)
    up_k[tgt] = kk.astype(np.int32)
    # the stride-2 map must be non-overlapping for the inversion to be exact
    assert len(tgt) == len(np.unique(tgt))
    up_row, up_k = jnp.asarray(up_row), jnp.asarray(up_k)

    x = jnp.asarray(rng.normal(size=(len(coords), 16)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(8, 16, 8)) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(down.shape[0], 8)).astype(np.float32))

    ref = jax.grad(lambda x, w: jnp.vdot(gather_conv(x, down, w), g), argnums=(0, 1))(x, w)
    got = jax.grad(
        lambda x, w: jnp.vdot(down_gather_conv(x, down, up_row, up_k, w), g),
        argnums=(0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(down_gather_conv(x, down, up_row, up_k, w)),
        np.asarray(gather_conv(x, down, w)),
        rtol=1e-6,
    )


def test_banded_down_conv_matches_xla(rng):
    """The banded Pallas down-conv forward + banded inverse-map backward
    (dX over the up8 table, dW over the down bands) must match the XLA
    gather path and its grads."""
    import jax

    from instancerefer_tpu.ops.sparse import down_gather_conv

    rng2 = np.random.default_rng(7)
    coords = np.unique(rng2.integers(0, 24, size=(4000, 3)).astype(np.int32), axis=0)
    keys = V.pack_coords(coords)
    coords = coords[np.argsort(keys)]
    out_coords, down = V.build_downsample(coords, stride=1)
    order = np.argsort(V.pack_coords(out_coords))
    down = down[order]
    chunk = 64
    # pad both stages to chunk multiples (the pipeline's caps guarantee this)
    v_prev = len(coords) + ((-len(coords)) % chunk)
    v_out = down.shape[0] + ((-down.shape[0]) % chunk)
    down = np.concatenate([down, np.full((v_out - down.shape[0], 8), -1, np.int32)])

    up_row, up_k = V.invert_down(down, v_prev)
    up8 = np.where(
        up_k[:, None] == np.arange(8, dtype=np.int32)[None, :],
        up_row[:, None], -1,
    ).astype(np.int32)

    window, subwin = 1024, 512
    wsd, wskd = V.compute_offset_window_starts(down, chunk, window, subwin, v_prev)
    up_window, up_subwin = 512, 384
    wsu, wsktu = V.compute_offset_window_starts(up8, chunk, up_window, up_subwin, v_out)

    x = np.zeros((v_prev, 16), np.float32)
    x[: len(coords)] = rng2.normal(size=(len(coords), 16))
    x = jnp.asarray(x)
    w = jnp.asarray((rng2.normal(size=(8, 16, 8)) * 0.1).astype(np.float32))
    g = jnp.asarray(rng2.normal(size=(v_out, 8)).astype(np.float32))
    jd, jur, juk, jup8 = map(jnp.asarray, (down, up_row, up_k, up8))
    jwsd, jwskd = jnp.asarray(wsd), jnp.asarray(wskd)
    jwsu, jwsktu = jnp.asarray(wsu), jnp.asarray(wsktu)

    def banded(x, w):
        return down_gather_conv(
            x, jd, jur, juk, w, jwsd, jwskd, jup8, jwsu, jwsktu,
            window=window, chunk=chunk, subwin=subwin,
            up_chunk=chunk, up_window=up_window, up_subwin=up_subwin,
            interpret=True,
        )

    out = banded(x, w)
    ref = gather_conv(x, jd, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    got = jax.grad(lambda x, w: jnp.vdot(banded(x, w), g), argnums=(0, 1))(x, w)
    want = jax.grad(lambda x, w: jnp.vdot(gather_conv(x, jd, w), g), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), rtol=1e-4, atol=1e-4)


def test_masked_global_max_pool(rng):
    feats = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    owner = jnp.array([0, 0, 2, 2, 2, -1, -1, 1, 1, 0])
    pooled = masked_global_max_pool(feats, owner, num_segments=4)
    f = np.asarray(feats)
    np.testing.assert_allclose(pooled[0], f[[0, 1, 9]].max(0))
    np.testing.assert_allclose(pooled[1], f[[7, 8]].max(0))
    np.testing.assert_allclose(pooled[2], f[[2, 3, 4]].max(0))
    np.testing.assert_allclose(pooled[3], np.zeros(4))  # empty segment -> zeros


def test_masked_mean(rng):
    feats = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    mask = jnp.array([1, 1, 0, 1, 0, 0], dtype=bool)
    got = masked_mean(feats, mask)
    want = np.asarray(feats)[[0, 1, 3]].mean(0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_down_fused_eval_grads_exact_on_empty_chunks(rng):
    """The down-conv fused eval epilogue's recompute VJP must be the exact
    VJP of its primal, which skips fully-empty output chunks (writes 0, not
    relu(bias)) — checked under an UNMASKED cotangent."""
    import jax

    from instancerefer_tpu.ops.sparse import down_gather_conv

    rng2 = np.random.default_rng(11)
    coords = np.unique(rng2.integers(0, 24, size=(4000, 3)).astype(np.int32), axis=0)
    keys = V.pack_coords(coords)
    coords = coords[np.argsort(keys)]
    out_coords, down = V.build_downsample(coords, stride=1)
    order = np.argsort(V.pack_coords(out_coords))
    down = down[order]
    chunk = 64
    v_prev = len(coords) + ((-len(coords)) % chunk)
    # pad the OUTPUT stage by a full extra chunk to force an empty chunk
    v_out = down.shape[0] + ((-down.shape[0]) % chunk) + chunk
    down = np.concatenate([down, np.full((v_out - down.shape[0], 8), -1, np.int32)])

    up_row, up_k = V.invert_down(down, v_prev)
    up8 = np.where(
        up_k[:, None] == np.arange(8, dtype=np.int32)[None, :],
        up_row[:, None], -1,
    ).astype(np.int32)

    window, subwin = 1024, 512
    wsd, wskd = V.compute_offset_window_starts(down, chunk, window, subwin, v_prev)
    assert (np.asarray(wsd) < 0).any(), "fixture must contain empty chunks"
    chunk_live = np.repeat(np.asarray(wsd) >= 0, chunk).astype(np.float32)[:, None]
    up_window, up_subwin = 512, 384
    wsu, wsktu = V.compute_offset_window_starts(up8, chunk, up_window, up_subwin, v_out)

    x = np.zeros((v_prev, 16), np.float32)
    x[: len(coords)] = rng2.normal(size=(len(coords), 16))
    x = jnp.asarray(x)
    w = jnp.asarray((rng2.normal(size=(8, 16, 8)) * 0.1).astype(np.float32))
    sc = jnp.asarray(rng2.normal(size=(8,)).astype(np.float32))
    bi = jnp.asarray(rng2.normal(size=(8,)).astype(np.float32))
    cot = jnp.asarray(rng2.normal(size=(v_out, 8)).astype(np.float32))  # unmasked
    jd, jur, juk, jup8 = map(jnp.asarray, (down, up_row, up_k, up8))
    jwsd, jwskd = jnp.asarray(wsd), jnp.asarray(wskd)
    jwsu, jwsktu = jnp.asarray(wsu), jnp.asarray(wsktu)
    kw = dict(
        window=window, chunk=chunk, subwin=subwin, up_chunk=chunk,
        up_window=up_window, up_subwin=up_subwin, interpret=True,
    )

    def ref_fn(x, w, s, b):
        out = down_gather_conv(x, jd, jur, juk, w, jwsd, jwskd, jup8, jwsu,
                               jwsktu, **kw)
        return jnp.sum(
            jnp.maximum(out * s[None, :] + b[None, :], 0.0)
            * jnp.asarray(chunk_live) * cot
        )

    def fused_fn(x, w, s, b):
        out = down_gather_conv(x, jd, jur, juk, w, jwsd, jwskd, jup8, jwsu,
                               jwsktu, epilogue=(s, b, True), **kw)
        return jnp.sum(out * cot)

    v_ref, g_ref = jax.value_and_grad(ref_fn, argnums=(0, 1, 2, 3))(x, w, sc, bi)
    v_got, g_got = jax.value_and_grad(fused_fn, argnums=(0, 1, 2, 3))(x, w, sc, bi)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)
