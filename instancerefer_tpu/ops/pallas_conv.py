"""Pallas TPU kernel: windowed gather-GEMM sparse convolution.

Why: XLA lowers a row-gather from an HBM-resident [V, C] table to one
(8,128)-tile fetch (~4 KB) per row, so a 27-offset submanifold conv pays
27 x 4 KB of HBM traffic per output row — measured as the dominant cost of
the whole forward pass (~123 ms for one 262k x 64-channel conv at batch 32).

This kernel exploits spatial locality instead: the host raster-sorts voxels
(``ops/voxelize.quantize(raster_order=True)``), so all neighbors of a
contiguous chunk of output rows live in a bounded window of input rows.  Per
chunk, ONE contiguous window DMA (full HBM bandwidth) brings the working set
into VMEM; the per-offset gathers become VMEM-local ``jnp.take`` (VPU sublane
gathers) feeding MXU GEMM accumulation.  Windows are double-buffered: chunk
i+1's DMA overlaps chunk i's compute.

Host contract (``ops/voxelize.compute_window_starts``): for chunk i, valid
``nbr`` entries lie in [window_start[i], window_start[i] + window).  Entries
outside (possible only for pathological geometry or capacity-overflow
truncation) are treated as empty neighbors — the same policy as the padded
XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(
    ws_ref, wsk_ref, nbr_ref, w_ref, feats_hbm, out_ref, win, sem,
    *, chunk, window, subwin, k_offsets, out_dtype,
):
    # ws_ref: scalar-prefetched [n_chunks] (drives the window DMA);
    # wsk_ref: VMEM-blocked [1, K] per-offset band starts (SMEM lane-pads the
    # K axis to 128, which overflows SMEM for small chunks on big stages).
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    def dma(slot, chunk_idx):
        # window starts are host-aligned to 16 rows (compute_window_starts);
        # the hint lets Mosaic prove the sublane-tile alignment of the slice
        start = pl.multiple_of(ws_ref[chunk_idx], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, window), :],
            win.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_chunks)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    slot = i % 2
    ws = ws_ref[i]

    cout = w_ref.shape[-1]
    acc = jnp.zeros((chunk, cout), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, subwin), 1)
    dtype = win.dtype
    for k in range(k_offsets):
        # Per-offset sub-window: each offset's neighbor indices over a
        # raster-sorted chunk are nearly monotone, so they fit a band of
        # ~chunk + halo rows.  The host clamps wsk into
        # [ws, ws + window - subwin] and aligns it to 16.
        base = wsk_ref[i % 8, k]
        off = pl.multiple_of(base - ws, 16)
        sub = win[slot, pl.ds(off, subwin), :]  # [subwin, C] ref read
        g_idx = nbr_ref[:, k]
        local = g_idx - base
        valid = (g_idx >= 0) & (local >= 0) & (local < subwin)
        safe = jnp.where(valid, local, -1)
        # The gather is a one-hot matmul: Mosaic's native dynamic_gather is
        # limited to one vreg of sublanes, but the MXU eats a
        # [chunk, subwin] @ [subwin, C] contraction for breakfast — and the
        # one-hot never leaves VMEM/VREGs.  Invalid rows get all-zero one-hots.
        oh = (col == safe[:, None]).astype(dtype)
        rows = jnp.dot(oh, sub, preferred_element_type=jnp.float32)  # [chunk, C]
        acc = acc + jnp.dot(
            rows.astype(dtype), w_ref[k], preferred_element_type=jnp.float32
        )
    out_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window", "chunk", "subwin", "out_dtype", "interpret"),
)
def windowed_gather_conv(
    feats: jnp.ndarray,
    nbr: jnp.ndarray,
    kernel: jnp.ndarray,
    window_start: jnp.ndarray,
    offset_window_start: jnp.ndarray = None,
    *,
    window: int,
    chunk: int = 1024,
    subwin: int = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """sum_k gather(feats, nbr[:, k]) @ kernel[k], windowed.

    Args:
      feats:  [V_in, C] voxel features (bf16 or f32; raster-sorted rows).
      nbr:    [V_out, K] int32 global row indices into feats, -1 = empty.
      kernel: [K, C, Cout] weights (resident in VMEM).
      window_start: [V_out // chunk] int32 host-computed window origins,
        each in [0, V_in - window], 16-aligned.
      offset_window_start: [V_out // chunk, K] int32 per-offset sub-window
        origins, each in [ws, ws + window - subwin], 16-aligned.  Defaults to
        broadcasting window_start with subwin = window.
      window: static window length (rows) — the per-chunk DMA size.
      subwin: static per-offset one-hot width (the banded-gather optimization).
    """
    v_out, k = nbr.shape
    assert v_out % chunk == 0, (v_out, chunk)
    n_chunks = v_out // chunk
    if subwin is None:
        subwin = window
    if offset_window_start is None:
        offset_window_start = jnp.broadcast_to(window_start[:, None], (n_chunks, k))

    # HBM DMA slices must be 128-lane aligned: pad channels to 128 multiples
    # (zero lanes are free wrt the one-hot matmul's result).
    cin = feats.shape[-1]
    cin_pad = -(-cin // 128) * 128
    cout = kernel.shape[-1]
    cout_pad = -(-cout // 128) * 128
    if cin_pad != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_pad - cin)))
        kernel = jnp.pad(kernel, ((0, 0), (0, cin_pad - cin), (0, 0)))
    if cout_pad != cout:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cout_pad - cout)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # window_start
        grid=(n_chunks,),
        in_specs=[
            # wsk in VMEM, 8 chunks per block (sublane-divisibility rule);
            # the kernel indexes row i % 8
            pl.BlockSpec((8, k), lambda i, ws: (i // 8, 0)),
            pl.BlockSpec((chunk, k), lambda i, ws: (i, 0)),  # nbr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, fully resident
            pl.BlockSpec(memory_space=pltpu.ANY),  # feats stay off-chip
        ],
        out_specs=pl.BlockSpec((chunk, cout_pad), lambda i, ws: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, cin_pad), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    fn = pl.pallas_call(
        functools.partial(
            _conv_kernel, chunk=chunk, window=window, subwin=subwin,
            k_offsets=k, out_dtype=out_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((v_out, cout_pad), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    out = fn(window_start, offset_window_start, nbr, kernel, feats)
    return out[:, :cout] if cout_pad != cout else out


# ---------------------------------------------------------------------------
# Banded backward kernels: dW band-reduction + the mirrored-gather dX
# ---------------------------------------------------------------------------


def _dw_kernel(
    ws_ref, wsk_ref, nbr_ref, g_ref, feats_hbm, out_ref, win, sem,
    *, chunk, window, subwin, k_offsets,
):
    """dW[k] = sum over chunks of gathered_x_k^T @ g_chunk.

    Same window DMA + banded one-hot gather as the forward kernel; the output
    block index is constant across the grid, so out_ref accumulates in VMEM
    over the (sequential) chunk iterations.
    """
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    def dma(slot, chunk_idx):
        start = pl.multiple_of(ws_ref[chunk_idx], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, window), :], win.at[slot], sem.at[slot]
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(i + 1 < n_chunks)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    slot = i % 2
    ws = ws_ref[i]
    dtype = win.dtype
    g = g_ref[...].astype(dtype)  # [chunk, Cout]
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, subwin), 1)
    for k in range(k_offsets):
        base = wsk_ref[i % 8, k]
        off = pl.multiple_of(base - ws, 16)
        sub = win[slot, pl.ds(off, subwin), :]  # [subwin, Cin]
        g_idx = nbr_ref[:, k]
        local = g_idx - base
        valid = (g_idx >= 0) & (local >= 0) & (local < subwin)
        safe = jnp.where(valid, local, -1)
        oh = (col == safe[:, None]).astype(dtype)
        rows = jnp.dot(oh, sub, preferred_element_type=jnp.float32)  # [chunk, Cin]
        contrib = jax.lax.dot_general(
            rows.astype(dtype), g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Cin, Cout]
        out_ref[k, :, :] += contrib


@functools.partial(
    jax.jit, static_argnames=("window", "chunk", "subwin", "interpret")
)
def windowed_conv_dw(
    feats: jnp.ndarray,
    nbr: jnp.ndarray,
    g: jnp.ndarray,
    window_start: jnp.ndarray,
    offset_window_start: jnp.ndarray,
    *,
    window: int,
    chunk: int,
    subwin: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """dW[k] = sum_v feats[nbr[v, k]]^T g[v] (banded).  Returns [K, Cin, Cout] f32."""
    v_out, k = nbr.shape
    assert v_out % chunk == 0, (v_out, chunk)
    n_chunks = v_out // chunk
    cin = feats.shape[-1]
    cout = g.shape[-1]
    cin_pad = -(-cin // 128) * 128
    cout_pad = -(-cout // 128) * 128
    if cin_pad != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_pad - cin)))
    if cout_pad != cout:
        g = jnp.pad(g, ((0, 0), (0, cout_pad - cout)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((8, k), lambda i, ws: (i // 8, 0)),  # wsk
            pl.BlockSpec((chunk, k), lambda i, ws: (i, 0)),  # nbr
            pl.BlockSpec((chunk, cout_pad), lambda i, ws: (i, 0)),  # g
            pl.BlockSpec(memory_space=pltpu.ANY),  # feats in HBM
        ],
        out_specs=pl.BlockSpec((k, cin_pad, cout_pad), lambda i, ws: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, cin_pad), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(
            _dw_kernel, chunk=chunk, window=window, subwin=subwin, k_offsets=k
        ),
        out_shape=jax.ShapeDtypeStruct((k, cin_pad, cout_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    out = fn(window_start, offset_window_start, nbr, g, feats)
    return out[:, :cin, :cout]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _banded_core(window, chunk, subwin, interpret, feats, nbr, kernel, ws, wsk):
    return windowed_gather_conv(
        feats, nbr, kernel, ws, wsk,
        window=window, chunk=chunk, subwin=subwin, interpret=interpret,
    )


def _banded_fwd(window, chunk, subwin, interpret, feats, nbr, kernel, ws, wsk):
    out = windowed_gather_conv(
        feats, nbr, kernel, ws, wsk,
        window=window, chunk=chunk, subwin=subwin, interpret=interpret,
    )
    return out, (feats, nbr, kernel, ws, wsk)


def _banded_bwd(window, chunk, subwin, interpret, res, g):
    """Banded backward for the symmetric submanifold conv.

    dX reuses the forward kernel via the mirrored-offset identity
    (nbr(i,k)=j <=> nbr(j,26-k)=i, see ops/sparse._subm_conv_bwd): gathering g
    over the SAME nbr map with mirror-transposed weights IS dX — and the
    band metadata applies unchanged because the access pattern is identical.
    dW is the banded band-reduction kernel above.

    Exactness caveat: gradients are exact for the function the banded forward
    actually computes.  When bands cover every neighbor (the measured case —
    zero drops at production geometry), that function equals the dense conv.
    """
    feats, nbr, kernel, ws, wsk = res
    g32 = g.astype(jnp.float32)
    from instancerefer_tpu.ops.precision import cast_in

    gc = cast_in(g32)
    w_t = jnp.transpose(cast_in(kernel)[::-1], (0, 2, 1))  # w_t[k] = W[K-1-k]^T
    dx = _banded_core(window, chunk, subwin, interpret, gc, nbr, w_t, ws, wsk)
    dx = dx.astype(feats.dtype)
    dw = windowed_conv_dw(
        cast_in(feats), nbr, gc, ws, wsk,
        window=window, chunk=chunk, subwin=subwin, interpret=interpret,
    ).astype(kernel.dtype)
    return dx, None, dw, None, None


_banded_core.defvjp(_banded_fwd, _banded_bwd)


def banded_subm_conv(
    feats: jnp.ndarray,
    nbr: jnp.ndarray,
    kernel: jnp.ndarray,
    ws: jnp.ndarray,
    wsk: jnp.ndarray,
    *,
    window: int,
    chunk: int,
    subwin: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable banded 3^3 submanifold conv (train + eval path).

    Requires a symmetric-offset same-coordinate map (``nbr3``) with banded
    window metadata from ``ops/voxelize.compute_offset_window_starts``.
    """
    return _banded_core(window, chunk, subwin, interpret, feats, nbr, kernel, ws, wsk)
