"""Windowed Pallas sparse conv vs the XLA gather-GEMM reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from instancerefer_tpu.ops import voxelize as V
from instancerefer_tpu.ops.pallas_conv import windowed_gather_conv
from instancerefer_tpu.ops.sparse import gather_conv


def _build_case(rng, n_samples=2, cap=512):
    nbrs = []
    for b in range(n_samples):
        pts = rng.uniform(0, 3, size=(3000, 3))
        coords, _ = V.quantize(pts, pts.astype(np.float32), 0.05, raster_order=True)
        pyr = V.build_pyramid(coords, owner=0, num_stages=2, caps=[4096, cap], raster=True)
        st = V.pad_stage(pyr[1], cap, 4096)
        nbrs.append(np.where(st.nbr3 >= 0, st.nbr3 + b * cap, -1))
    return np.concatenate(nbrs)


@pytest.mark.parametrize("cin,cout", [(64, 64), (7, 32)])
def test_windowed_conv_matches_xla(rng, cin, cout):
    nbr = _build_case(rng)
    v = len(nbr)
    feats = rng.normal(size=(v, cin)).astype(np.float32)
    kernel = (rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32)
    chunk, window = 128, 512
    ws = V.compute_window_starts(nbr, chunk, window, v)
    # verify full coverage on this small case
    for i in range(len(ws)):
        blk = nbr[i * chunk : (i + 1) * chunk]
        valid = blk[blk >= 0]
        if len(valid):
            assert valid.max() - ws[i] < window

    ref = np.asarray(gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel)))
    got = np.asarray(
        windowed_gather_conv(
            jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel),
            jnp.asarray(ws), window=window, chunk=chunk, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_out_of_window_neighbors_degrade_to_empty(rng):
    """Neighbors outside [ws, ws+window) count as empty, like nbr == -1."""
    v, chunk, window = 256, 128, 128
    nbr = np.full((v, 27), -1, np.int32)
    nbr[:, 13] = np.arange(v)  # identity
    nbr[0, 0] = v - 1  # far neighbor, outside window of chunk 0
    feats = rng.normal(size=(v, 8)).astype(np.float32)
    kernel = (rng.normal(size=(27, 8, 8)) * 0.1).astype(np.float32)
    ws = V.compute_window_starts(nbr, chunk, window, v)
    got = np.asarray(
        windowed_gather_conv(
            jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel),
            jnp.asarray(ws), window=window, chunk=chunk, interpret=True,
        )
    )
    nbr_clean = nbr.copy()
    nbr_clean[0, 0] = -1
    ref = np.asarray(
        gather_conv(jnp.asarray(feats), jnp.asarray(nbr_clean), jnp.asarray(kernel))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_banded_subwindows_match_xla(rng):
    """Per-offset sub-window (banded) variant must match the full-window one."""
    nbr = _build_case(rng)
    v = len(nbr)
    feats = rng.normal(size=(v, 32)).astype(np.float32)
    kernel = (rng.normal(size=(27, 32, 32)) * 0.1).astype(np.float32)
    chunk, window, subwin = 128, 512, 256
    ws, wsk_t, dropped, total = V.compute_offset_window_starts(
        nbr, chunk, window, subwin, v, count_drops=True
    )
    wsk = wsk_t.T  # stored transposed ([K, n]) for the kernels' SMEM layout
    assert (wsk % 16 == 0).all()
    assert (wsk >= ws[:, None]).all()
    assert (wsk <= (ws + window - subwin)[:, None]).all()
    # full coverage of every offset's band on this small case
    n = v // chunk
    blk = np.where(nbr[: n * chunk] >= 0, nbr[: n * chunk], -(2**30)).reshape(n, chunk, 27)
    hi_k = blk.max(axis=1)
    covered = (hi_k < wsk + subwin) | (hi_k < 0)
    assert covered.all()
    assert dropped == 0 and total == int((nbr >= 0).sum())

    ref = np.asarray(gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel)))
    got = np.asarray(
        windowed_gather_conv(
            jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(kernel),
            jnp.asarray(ws), jnp.asarray(wsk_t),
            window=window, chunk=chunk, subwin=subwin, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_banded_vjp_matches_xla_grads(rng):
    """banded_subm_conv's custom VJP (mirrored-gather dX + band-reduction dW)
    must match XLA autodiff of the gather-GEMM reference."""
    import jax

    from instancerefer_tpu.ops.pallas_conv import banded_subm_conv

    nbr = _build_case(rng)
    v = len(nbr)
    cin, cout = 16, 24
    feats = rng.normal(size=(v, cin)).astype(np.float32)
    kernel = (rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32)
    cot = rng.normal(size=(v, cout)).astype(np.float32)
    chunk, window, subwin = 128, 512, 256
    ws, wsk_t = V.compute_offset_window_starts(nbr, chunk, window, subwin, v)
    jnbr, jws, jwsk, jcot = map(jnp.asarray, (nbr, ws, wsk_t, cot))

    def loss_ref(f, k):
        return jnp.sum(gather_conv(f, jnbr, k) * jcot)

    def loss_banded(f, k):
        return jnp.sum(
            banded_subm_conv(
                f, jnbr, k, jws, jwsk,
                window=window, chunk=chunk, subwin=subwin, interpret=True,
            )
            * jcot
        )

    gf_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(kernel)
    )
    gf, gk = jax.grad(loss_banded, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(kernel)
    )
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-4, atol=1e-4)


def test_empty_chunk_skip_is_exact(rng):
    """Chunks whose rows are all padding get ws = -1 and are skipped by the
    kernels (zero output / zero grads) — bit-identical to the XLA path."""
    import jax

    from instancerefer_tpu.ops.pallas_conv import banded_subm_conv

    nbr = _build_case(rng)
    v, chunk, window, subwin = len(nbr), 128, 512, 256
    # turn two full chunks into padding: like the pipeline's pad_stage, a
    # padding row has no neighbors AND is nobody's neighbor
    lo, hi = 3 * chunk, 5 * chunk
    nbr[lo:hi] = -1
    nbr = np.where((nbr >= lo) & (nbr < hi), -1, nbr)
    ws, wsk_t = V.compute_offset_window_starts(nbr, chunk, window, subwin, v)
    assert (ws[3:5] == -1).all() and (ws[:3] >= 0).all()

    feats = jnp.asarray(rng.normal(size=(v, 16)).astype(np.float32))
    kernel = jnp.asarray((rng.normal(size=(27, 16, 8)) * 0.1).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(v, 8)).astype(np.float32))
    jnbr, jws, jwsk = map(jnp.asarray, (nbr, ws, wsk_t))

    def loss_banded(f, k):
        return jnp.sum(
            banded_subm_conv(
                f, jnbr, k, jws, jwsk,
                window=window, chunk=chunk, subwin=subwin, interpret=True,
            )
            * cot
        )

    def loss_ref(f, k):
        return jnp.sum(gather_conv(f, jnbr, k) * cot)

    out = banded_subm_conv(
        feats, jnbr, kernel, jws, jwsk,
        window=window, chunk=chunk, subwin=subwin, interpret=True,
    )
    ref = gather_conv(feats, jnbr, kernel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(out[3 * chunk : 5 * chunk]) == 0.0)

    gf, gk = jax.grad(loss_banded, argnums=(0, 1))(feats, kernel)
    gf_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(feats, kernel)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r), rtol=1e-4, atol=1e-4)


def test_window_starts_alignment(rng):
    nbr = _build_case(rng)
    ws = V.compute_window_starts(nbr, 128, 512, len(nbr))
    assert (ws % 16 == 0).all()
    assert (ws >= 0).all()
    assert (ws <= len(nbr) - 512).all()


def test_fused_eval_epilogue_matches_unfused(rng):
    """banded_subm_conv_eval (folded BN affine + ReLU inside the kernel) must
    match conv -> affine -> relu on live rows, in value AND in gradients
    (the recompute VJP), including d/dscale and d/dbias."""
    import jax

    from instancerefer_tpu.ops.pallas_conv import (
        banded_subm_conv,
        banded_subm_conv_eval,
    )

    nbr = _build_case(rng)
    v = len(nbr)
    c = 16
    feats = rng.normal(size=(v, c)).astype(np.float32)
    kernel = (rng.normal(size=(27, c, c)) * 0.1).astype(np.float32)
    sc = rng.normal(size=(c,)).astype(np.float32)
    bi = rng.normal(size=(c,)).astype(np.float32)
    cot = rng.normal(size=(v, c)).astype(np.float32)
    live = (nbr[:, 13] >= 0).astype(np.float32)[:, None]  # padding rows differ
    chunk, window, subwin = 128, 512, 256
    ws, wsk_t = V.compute_offset_window_starts(nbr, chunk, window, subwin, v)
    jn, jws, jwsk = map(jnp.asarray, (nbr, ws, wsk_t))
    kw = dict(window=window, chunk=chunk, subwin=subwin, interpret=True)

    def ref_fn(f, k, s, b):
        out = banded_subm_conv(f, jn, k, jws, jwsk, **kw)
        return jnp.sum(
            jnp.maximum(out * s[None, :] + b[None, :], 0.0) * cot * live
        )

    def fused_fn(f, k, s, b):
        out = banded_subm_conv_eval(
            f, jn, k, jws, jwsk, scale=s, bias=b, relu=True, **kw
        )
        return jnp.sum(out * cot * live)

    args = tuple(map(jnp.asarray, (feats, kernel, sc, bi)))
    v_ref, g_ref = jax.value_and_grad(ref_fn, argnums=(0, 1, 2, 3))(*args)
    v_got, g_got = jax.value_and_grad(fused_fn, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_dwonly_backward_matches_fused(rng):
    """grad_input=False (stem fast path) must produce the identical dW while
    returning zero dX — valid because the stems' inputs are autodiff leaves."""
    import jax

    from instancerefer_tpu.ops.pallas_conv import banded_subm_conv

    nbr = _build_case(rng)
    v = len(nbr)
    c = 16
    feats = rng.normal(size=(v, c)).astype(np.float32)
    kernel = (rng.normal(size=(27, c, c)) * 0.1).astype(np.float32)
    cot = rng.normal(size=(v, c)).astype(np.float32)
    chunk, window, subwin = 128, 512, 256
    ws, wsk_t = V.compute_offset_window_starts(nbr, chunk, window, subwin, v)
    jn, jws, jwsk, jc = map(jnp.asarray, (nbr, ws, wsk_t, cot))
    kw = dict(window=window, chunk=chunk, subwin=subwin, interpret=True)

    def loss(f, k, gi):
        return jnp.sum(
            banded_subm_conv(f, jn, k, jws, jwsk, grad_input=gi, **kw) * jc
        )

    args = (jnp.asarray(feats), jnp.asarray(kernel))
    gf_ref, gk_ref = jax.grad(loss, argnums=(0, 1))(*args, True)
    gf, gk = jax.grad(loss, argnums=(0, 1))(*args, False)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(gf) == 0.0)
    assert np.any(np.asarray(gf_ref) != 0.0)


def test_fused_eval_grads_exact_on_empty_chunks(rng):
    """The recompute VJP must be the exact VJP of the fused primal — which
    writes 0 (not relu(bias)) on rows of fully-empty chunks — under an
    UNMASKED cotangent: d/dbias must not accumulate from skipped rows."""
    import jax

    from instancerefer_tpu.ops.pallas_conv import (
        banded_subm_conv,
        banded_subm_conv_eval,
    )

    # explicit map: live rows only in chunk 0 -> chunks 1..3 fully empty
    v, c = 512, 16
    chunk, window, subwin = 128, 256, 128
    nbr = np.full((v, 27), -1, np.int32)
    nbr[:128, 13] = np.arange(128)
    nbr[1:128, 12] = np.arange(127)
    nbr[:127, 14] = np.arange(1, 128)
    ws, wsk_t = V.compute_offset_window_starts(nbr, chunk, window, subwin, v)
    assert (np.asarray(ws) < 0).any(), "fixture must contain empty chunks"
    chunk_live = np.repeat(np.asarray(ws) >= 0, chunk).astype(np.float32)[:, None]

    feats = rng.normal(size=(v, c)).astype(np.float32)
    kernel = (rng.normal(size=(27, c, c)) * 0.1).astype(np.float32)
    sc = rng.normal(size=(c,)).astype(np.float32)
    bi = rng.normal(size=(c,)).astype(np.float32)
    cot = rng.normal(size=(v, c)).astype(np.float32)  # unmasked
    jn, jws, jwsk = map(jnp.asarray, (nbr, ws, wsk_t))
    kw = dict(window=window, chunk=chunk, subwin=subwin, interpret=True)

    def ref_fn(f, k, s, b):
        # the fused primal == chunk_live * relu(conv * s + b) exactly
        out = banded_subm_conv(f, jn, k, jws, jwsk, **kw)
        return jnp.sum(
            jnp.maximum(out * s[None, :] + b[None, :], 0.0) * chunk_live * cot
        )

    def fused_fn(f, k, s, b):
        out = banded_subm_conv_eval(
            f, jn, k, jws, jwsk, scale=s, bias=b, relu=True, **kw
        )
        return jnp.sum(out * cot)

    args = tuple(map(jnp.asarray, (feats, kernel, sc, bi)))
    v_ref, g_ref = jax.value_and_grad(ref_fn, argnums=(0, 1, 2, 3))(*args)
    v_got, g_got = jax.value_and_grad(fused_fn, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)
