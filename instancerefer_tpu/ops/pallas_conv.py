"""Pallas TPU kernels: banded windowed gather-GEMM sparse convolution.

Why: XLA lowers a row-gather from an HBM-resident [V, C] table to one
(8,128)-tile fetch (~4 KB) per row, so a 27-offset submanifold conv pays
27 x 4 KB of HBM traffic per output row — measured as the dominant cost of
the whole forward pass (~123 ms for one 262k x 64-channel conv at batch 32).

This kernel exploits spatial locality instead: the host raster-sorts voxels
(``ops/voxelize.quantize(raster_order=True)``), so all neighbors of a
contiguous chunk of output rows live in a bounded window of input rows.  Per
chunk, ONE contiguous window DMA (full HBM bandwidth) brings the working set
into VMEM; each offset's gather is a one-hot matmul over a per-offset
sub-band of the window (``subwin`` rows) — the MXU eats the
[chunk, subwin] @ [subwin, C] contraction, and the one-hot never leaves
VMEM/VREGs.  Windows are double-buffered: chunk i+1's DMA overlaps chunk i's
compute.

Measured design notes (TPU v5e, batch 32 production shapes):
* The gather matmul runs at ~MXU peak: ablating the one-hot construction
  changes nothing (Mosaic fuses the iota-compare into operand generation),
  and stacking G offsets' one-hots into one tall [G*chunk, subwin] matmul
  (M=2304) is not faster.  Kernel time is therefore ∝ V * subwin * K —
  per-stage band geometry (ops/voxelize.compute_offset_window_starts) is the
  lever, not MXU shaping.
* ``wsk`` lives in SMEM, transposed to [K, n_chunks] so the (large) chunk
  axis is the lane axis — scalar-prefetch would lane-pad a [n_chunks, K]
  layout's K axis to 128 and overflow SMEM on big stages.  SMEM scalar reads
  beat VMEM ones by ~4-13% of whole-kernel time (27 reads/chunk).
* chunk=256 beats 128 (small-M matmuls underfill the MXU pipeline) and 512
  (subwin must grow by the extra chunk rows; net loss).

Host contract (``ops/voxelize.compute_offset_window_starts``): for chunk i,
valid ``nbr`` entries lie in [window_start[i], window_start[i] + window), and
per offset k within [wsk[k, i], wsk[k, i] + subwin).  Entries outside
(possible only for pathological geometry or capacity-overflow truncation)
are treated as empty neighbors — the same policy as the padded XLA path; the
host can count them (``count_drops=True``) for observability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(
    ws_ref, wskt_ref, nbr_ref, w_ref, *rest,
    chunk, window, subwin, k_offsets, out_dtype, center_k=None,
    has_affine=False, relu=False,
):
    if has_affine:
        # eval-only fused BN epilogue: y = acc * scale + bias (+ ReLU) —
        # eliminates the per-conv BN elementwise HBM pass
        sc_ref, bi_ref, feats_hbm, out_ref, win, sem = rest
    else:
        sc_ref = bi_ref = None
        feats_hbm, out_ref, win, sem = rest
    # ws_ref: scalar-prefetched [n_chunks] (drives the window DMA; -1 marks a
    # fully-empty padding chunk — skipped entirely, zero output);
    # wskt_ref: scalar-prefetched [K, n_chunks] per-offset band starts.
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    def dma(slot, chunk_idx):
        # window starts are host-aligned to 16 rows (compute_window_starts /
        # compute_offset_window_starts — the production producer); the hint
        # lets Mosaic prove the sublane-tile alignment of the slice
        start = pl.multiple_of(ws_ref[chunk_idx], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, window), :],
            win.at[slot],
            sem.at[slot],
        )

    @pl.when((i == 0) & (ws_ref[0] >= 0))
    def _():
        dma(0, 0).start()

    @pl.when((i + 1 < n_chunks) & (ws_ref[jnp.minimum(i + 1, n_chunks - 1)] >= 0))
    def _():
        dma((i + 1) % 2, i + 1).start()

    @pl.when(ws_ref[i] < 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(ws_ref[i] >= 0)
    def _():
        dma(i % 2, i).wait()
        slot = i % 2
        ws = ws_ref[i]

        cout = w_ref.shape[-1]
        acc = jnp.zeros((chunk, cout), jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, subwin), 1)
        dtype = win.dtype
        for k in range(k_offsets):
            if k == center_k:
                # Identity offset of the symmetric subm map: nbr[v, k] is v
                # itself (or -1), so the gathered rows are the chunk's own
                # rows — a direct VMEM slice of the window replaces the
                # [chunk, subwin] one-hot matmul.  The band-validity mask
                # reproduces the one-hot's drop semantics exactly; `ok`
                # zeroes the (counted-as-dropped) case where the window
                # cannot hold the chunk's diagonal at all.
                base = wskt_ref[k, i]
                diag = i * chunk - ws
                ok = (diag >= 0) & (diag <= window - chunk)
                off2 = pl.multiple_of(
                    jnp.clip(diag, 0, window - chunk), 16
                )
                rows_c = win[slot, pl.ds(off2, chunk), :]
                g_idx = nbr_ref[:, k]
                local = g_idx - base
                valid = ok & (g_idx >= 0) & (local >= 0) & (local < subwin)
                rows_c = jnp.where(valid[:, None], rows_c, 0)
                acc = acc + jnp.dot(
                    rows_c, w_ref[k], preferred_element_type=jnp.float32
                )
                continue
            # Per-offset sub-window: each offset's neighbor indices over a
            # raster-sorted chunk are nearly monotone, so they fit a band of
            # ~chunk + halo rows.  The host clamps wsk into
            # [ws, ws + window - subwin] and aligns it to 16.
            base = wskt_ref[k, i]
            off = pl.multiple_of(base - ws, 16)
            sub = win[slot, pl.ds(off, subwin), :]  # [subwin, C] ref read
            g_idx = nbr_ref[:, k]
            local = g_idx - base
            valid = (g_idx >= 0) & (local >= 0) & (local < subwin)
            safe = jnp.where(valid, local, -1)
            # The gather is a one-hot matmul: Mosaic's native dynamic_gather
            # is limited to one vreg of sublanes, but the MXU eats a
            # [chunk, subwin] @ [subwin, C] contraction for breakfast — and the
            # one-hot never leaves VMEM/VREGs.  Invalid rows get all-zero
            # one-hots.
            oh = (col == safe[:, None]).astype(dtype)
            rows = jnp.dot(oh, sub, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(
                rows.astype(dtype), w_ref[k], preferred_element_type=jnp.float32
            )
        if has_affine:
            acc = acc * sc_ref[0, :] + bi_ref[0, :]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "chunk", "subwin", "out_dtype", "interpret", "center_k",
        "relu",
    ),
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
    center_k: int = None,
    affine_scale: jnp.ndarray = None,
    affine_bias: jnp.ndarray = None,
    relu: bool = False,
) -> jnp.ndarray:
    """sum_k gather(feats, nbr[:, k]) @ kernel[k], windowed.

    Args:
      feats:  [V_in, C] voxel features (bf16 or f32; raster-sorted rows).
      nbr:    [V_out, K] int32 global row indices into feats, -1 = empty.
      kernel: [K, C, Cout] weights (resident in VMEM).
      window_start: [V_out // chunk] int32 host-computed window origins,
        each in [0, V_in - window], 16-aligned.
      offset_window_start: [K, V_out // chunk] int32 per-offset sub-window
        origins (transposed for SMEM), each in [ws, ws + window - subwin],
        16-aligned.  Defaults to broadcasting window_start, subwin = window.
      window: static window length (rows) — the per-chunk DMA size.
      subwin: static per-offset one-hot width (the banded-gather optimization).
      center_k: offset index whose map is the identity (nbr[v, k] in {v, -1}
        — the 3^3 submanifold center).  Its gather becomes a direct window
        slice instead of a one-hot matmul; None disables (down/up maps).
      affine_scale/affine_bias: optional [Cout] f32 per-channel epilogue
        (folded eval-mode BatchNorm), applied to the f32 accumulator before
        the output cast; ``relu`` additionally clamps at 0.  EVAL-ONLY fast
        path — this wrapper has no VJP for the epilogue.
    """
    v_out, k = nbr.shape
    assert v_out % chunk == 0, (v_out, chunk)
    n_chunks = v_out // chunk
    if subwin is None:
        subwin = window
    if offset_window_start is None:
        offset_window_start = jnp.broadcast_to(window_start[None, :], (k, n_chunks))

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

    has_affine = affine_scale is not None
    in_specs = [
        pl.BlockSpec((chunk, k), lambda i, ws, wskt: (i, 0)),  # nbr
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, fully resident
    ]
    extra = []
    if has_affine:
        sc = jnp.pad(affine_scale.astype(jnp.float32),
                     (0, cout_pad - affine_scale.shape[0]))
        bi = jnp.pad(affine_bias.astype(jnp.float32),
                     (0, cout_pad - affine_bias.shape[0]))
        extra = [sc.reshape(1, cout_pad), bi.reshape(1, cout_pad)]
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # feats stay off-chip

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # window_start, offset_window_start (SMEM)
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk, cout_pad), lambda i, ws, wskt: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, cin_pad), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    fn = pl.pallas_call(
        functools.partial(
            _conv_kernel, chunk=chunk, window=window, subwin=subwin,
            k_offsets=k, out_dtype=out_dtype, center_k=center_k,
            has_affine=has_affine, relu=relu,
        ),
        out_shape=jax.ShapeDtypeStruct((v_out, cout_pad), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    out = fn(window_start, offset_window_start, nbr, kernel, *extra, feats)
    return out[:, :cout] if cout_pad != cout else out


# ---------------------------------------------------------------------------
# Fused banded backward: one mirrored-gather pass produces BOTH dX and dW
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(
    ws_ref, wskt_ref, nbr_ref, x_ref, wt_ref, g_hbm, dx_ref, dw_ref, win, sem,
    *, chunk, window, subwin, k_offsets, center_k=None,
):
    """One pass over the mirrored gather produces BOTH dX and dW.

    By the mirror identity (nbr(v,k)=u <=> nbr(u,K-1-k)=v):
      dX[u]      = sum_k' g[nbr(u,k')] @ W[K-1-k']^T          (rows_g @ wt[k'])
      dW[K-1-k'] = sum_u  x[u]^T g[nbr(u,k')]                 (x_chunk^T @ rows_g)
    so the expensive banded one-hot gather of g (rows_g) is shared — half the
    MXU gather work and half the window DMA traffic of running a dX and a dW
    kernel separately.  ``x_ref`` is the chunk's own input rows (a plain
    blocked input — no gather needed on the dW side).  ``dw_ref``'s block
    index is constant across the (sequential) grid, so it accumulates in VMEM.
    """
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    def dma(slot, chunk_idx):
        start = pl.multiple_of(ws_ref[chunk_idx], 16)
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(start, window), :], win.at[slot], sem.at[slot]
        )

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    @pl.when((i == 0) & (ws_ref[0] >= 0))
    def _():
        dma(0, 0).start()

    @pl.when((i + 1 < n_chunks) & (ws_ref[jnp.minimum(i + 1, n_chunks - 1)] >= 0))
    def _():
        dma((i + 1) % 2, i + 1).start()

    @pl.when(ws_ref[i] < 0)
    def _():
        # fully-empty padding chunk: its rows are nobody's neighbors, so both
        # its dX rows and its dW contribution are exactly zero
        dx_ref[:] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    @pl.when(ws_ref[i] >= 0)
    def _():
        dma(i % 2, i).wait()
        slot = i % 2
        ws = ws_ref[i]
        dtype = win.dtype
        x = x_ref[...].astype(dtype)  # [chunk, Cin]
        cin = x_ref.shape[-1]
        acc = jnp.zeros((chunk, cin), jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, subwin), 1)
        for k in range(k_offsets):
            g_idx = nbr_ref[:, k]
            base = wskt_ref[k, i]
            local = g_idx - base
            if k == center_k:
                # Identity offset (see _conv_kernel): the mirrored center is
                # itself (K-1-13 == 13), so the gathered g rows are the
                # chunk's own rows — direct window slice, no one-hot matmul.
                diag = i * chunk - ws
                ok = (diag >= 0) & (diag <= window - chunk)
                off2 = pl.multiple_of(
                    jnp.clip(diag, 0, window - chunk), 16
                )
                rows_c = win[slot, pl.ds(off2, chunk), :]
                valid = ok & (g_idx >= 0) & (local >= 0) & (local < subwin)
                rg = jnp.where(valid[:, None], rows_c, 0)
            else:
                off = pl.multiple_of(base - ws, 16)
                sub = win[slot, pl.ds(off, subwin), :]  # [subwin, Cout]
                valid = (g_idx >= 0) & (local >= 0) & (local < subwin)
                safe = jnp.where(valid, local, -1)
                oh = (col == safe[:, None]).astype(dtype)
                rows_g = jnp.dot(oh, sub, preferred_element_type=jnp.float32)
                rg = rows_g.astype(dtype)
            acc = acc + jnp.dot(rg, wt_ref[k], preferred_element_type=jnp.float32)
            contrib = jax.lax.dot_general(
                x, rg,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Cin, Cout]
            dw_ref[k_offsets - 1 - k, :, :] += contrib
        dx_ref[:] = acc.astype(dx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "chunk", "subwin", "interpret", "center_k", "dx_dtype"
    ),
)
def windowed_conv_bwd_fused(
    feats: jnp.ndarray,
    nbr: jnp.ndarray,
    g: jnp.ndarray,
    w_t: jnp.ndarray,
    window_start: jnp.ndarray,
    offset_window_start: jnp.ndarray,
    *,
    window: int,
    chunk: int,
    subwin: int,
    interpret: bool = False,
    center_k: int = None,
    dx_dtype=jnp.float32,
):
    """(dX [V, Cin] f32, dW [K, Cin, Cout] f32) in one banded pass.

    Args:
      feats: [V, Cin] the conv's own input rows (read per-chunk, not gathered).
      g:     [V, Cout] upstream cotangent (the windowed-DMA gather table).
      w_t:   [K, Cout, Cin] mirrored-transposed weights, w_t[k] = W[K-1-k]^T.
      offset_window_start: [K, V // chunk] (transposed for SMEM).
    """
    v_out, k = nbr.shape
    assert v_out % chunk == 0, (v_out, chunk)
    n_chunks = v_out // chunk
    cin = feats.shape[-1]
    cout = g.shape[-1]
    cin_pad = -(-cin // 128) * 128
    cout_pad = -(-cout // 128) * 128
    if cin_pad != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_pad - cin)))
        w_t = jnp.pad(w_t, ((0, 0), (0, 0), (0, cin_pad - cin)))
    if cout_pad != cout:
        g = jnp.pad(g, ((0, 0), (0, cout_pad - cout)))
        w_t = jnp.pad(w_t, ((0, 0), (0, cout_pad - cout), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, k), lambda i, ws, wskt: (i, 0)),  # nbr
            pl.BlockSpec((chunk, cin_pad), lambda i, ws, wskt: (i, 0)),  # feats
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_t, fully resident
            pl.BlockSpec(memory_space=pl.ANY),  # g in HBM
        ],
        out_specs=[
            pl.BlockSpec((chunk, cin_pad), lambda i, ws, wskt: (i, 0)),  # dX
            pl.BlockSpec(
                (k, cin_pad, cout_pad), lambda i, ws, wskt: (0, 0, 0)
            ),  # dW
        ],
        scratch_shapes=[
            pltpu.VMEM((2, window, cout_pad), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, chunk=chunk, window=window, subwin=subwin,
            k_offsets=k, center_k=center_k,
        ),
        out_shape=[
            # dX may store in the activation dtype (bf16 mixed precision) —
            # the accumulator stays f32 in-kernel; dW always accumulates and
            # stores f32 (it is summed across the whole grid in VMEM)
            jax.ShapeDtypeStruct((v_out, cin_pad), dx_dtype),
            jax.ShapeDtypeStruct((k, cin_pad, cout_pad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )
    dx, dw = fn(window_start, offset_window_start, nbr, feats, w_t, g)
    if cin_pad != cin:
        dx = dx[:, :cin]
        dw = dw[:, :cin, :]
    if cout_pad != cout:
        dw = dw[:, :, :cout]
    return dx, dw


def _dw_kernel(
    ws_ref, wskt_ref, nbr_ref, g_ref, feats_hbm, dw_ref, win, sem,
    *, chunk, window, subwin, k_offsets,
):
    """dW[k] = sum_v feats[nbr(v,k)]^T g[v], banded.

    Used for the stride-2 down conv's weight gradient: its dX comes from the
    host-inverted up map (ops/sparse.down_gather_conv), but dW needs the
    gathered-feats rows — the same banded one-hot gather as the forward, so
    the same (wsd, wskt) metadata drives it.  The output block index is
    constant across the (sequential) grid, so dw accumulates in VMEM.
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
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    @pl.when((i == 0) & (ws_ref[0] >= 0))
    def _():
        dma(0, 0).start()

    @pl.when((i + 1 < n_chunks) & (ws_ref[jnp.minimum(i + 1, n_chunks - 1)] >= 0))
    def _():
        dma((i + 1) % 2, i + 1).start()

    @pl.when(ws_ref[i] >= 0)
    def _():
        dma(i % 2, i).wait()
        slot = i % 2
        ws = ws_ref[i]
        dtype = win.dtype
        g = g_ref[...].astype(dtype)  # [chunk, Cout]
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, subwin), 1)
        for k in range(k_offsets):
            base = wskt_ref[k, i]
            off = pl.multiple_of(base - ws, 16)
            sub = win[slot, pl.ds(off, subwin), :]  # [subwin, Cin]
            g_idx = nbr_ref[:, k]
            local = g_idx - base
            valid = (g_idx >= 0) & (local >= 0) & (local < subwin)
            safe = jnp.where(valid, local, -1)
            oh = (col == safe[:, None]).astype(dtype)
            rows = jnp.dot(oh, sub, preferred_element_type=jnp.float32)
            contrib = jax.lax.dot_general(
                rows.astype(dtype), g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Cin, Cout]
            dw_ref[k, :, :] += contrib


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
    """dW[k] = sum_v feats[nbr[v, k]]^T g[v] (banded).  Returns
    [K, Cin_pad, Cout_pad] f32 at the padded operand widths."""
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
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, k), lambda i, ws, wskt: (i, 0)),  # nbr
            pl.BlockSpec((chunk, cout_pad), lambda i, ws, wskt: (i, 0)),  # g
            pl.BlockSpec(memory_space=pl.ANY),  # feats in HBM
        ],
        out_specs=pl.BlockSpec(
            (k, cin_pad, cout_pad), lambda i, ws, wskt: (0, 0, 0)
        ),
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
    return fn(window_start, offset_window_start, nbr, g, feats)


# ---------------------------------------------------------------------------
# Data-parallel execution: shard_map'd wrappers over the banded kernels
# ---------------------------------------------------------------------------
#
# A pallas_call's row indices are global, so GSPMD cannot partition it; the
# DP path instead shard_maps each kernel over the 1-D ``data`` mesh and
# localizes the metadata per shard.  Correctness rests on two host-side
# invariants: (a) per-sample voxel blocks mean no valid ``nbr`` entry ever
# crosses a sample (hence shard) boundary, and (b) band metadata built with
# ``compute_offset_window_starts(block=rows_per_shard, block_in=...)`` clamps
# every DMA window inside its shard's input rows.  Each shard then subtracts
# its input-row offset from nbr/ws/wskt (-1 sentinels preserved) and runs the
# unmodified single-device kernel on purely local rows.  Weight gradients are
# partial sums per shard and psum over the mesh inside the wrapper.


def _data_mesh(shards: int):
    """The active mesh iff it matches ``shards``; None selects the unsharded
    call (block-clamped metadata stays valid globally — clamping only
    restricts windows to slabs that already contain all their neighbors)."""
    if shards <= 1:
        return None
    from instancerefer_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None or mesh.size != shards:
        return None
    return mesh


def _localize(nbr, ws, wskt, off):
    nbr_adj = jnp.where(nbr >= 0, nbr - off, -1)
    ws_adj = jnp.where(ws >= 0, ws - off, -1)
    return nbr_adj, ws_adj, wskt - off


def sharded_gather_conv(
    feats, nbr, kernel, ws, wskt, *, window, chunk, subwin, shards,
    interpret=False, center_k=None, out_dtype=jnp.float32,
    affine_scale=None, affine_bias=None, relu=False,
):
    """windowed_gather_conv, shard_map'd over the data mesh when shards > 1.

    Serves both the submanifold forward (v_in == v_out) and the banded
    down-conv forward / inverse-map dX (v_in != v_out): the localization
    offset is in *input*-row space, ``feats.shape[0] // shards``.
    """
    mesh = _data_mesh(shards)
    kw = dict(
        window=window, chunk=chunk, subwin=subwin, interpret=interpret,
        center_k=center_k, out_dtype=out_dtype, relu=relu,
    )
    if mesh is None:
        return windowed_gather_conv(
            feats, nbr, kernel, ws, wskt,
            affine_scale=affine_scale, affine_bias=affine_bias, **kw,
        )
    axis = mesh.axis_names[0]
    in_rows = feats.shape[0] // shards
    assert in_rows % 16 == 0, in_rows  # window starts stay 16-aligned per shard
    from jax.sharding import PartitionSpec as P

    if affine_scale is None:
        affine_scale = affine_bias = jnp.zeros((0,), jnp.float32)

    def local_fn(feats_l, nbr_l, ws_l, wskt_l, kern, sc, bi):
        off = jax.lax.axis_index(axis) * in_rows
        nbr_a, ws_a, wskt_a = _localize(nbr_l, ws_l, wskt_l, off)
        return windowed_gather_conv(
            feats_l, nbr_a, kern, ws_a, wskt_a,
            affine_scale=sc if sc.shape[0] else None,
            affine_bias=bi if bi.shape[0] else None, **kw,
        )

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(None, axis), P(), P(), P()),
        out_specs=P(axis), check_vma=False,
    )(feats, nbr, ws, wskt, kernel, affine_scale, affine_bias)


def sharded_conv_bwd_fused(
    feats, nbr, g, w_t, ws, wskt, *, window, chunk, subwin, shards,
    interpret=False, center_k=None, dx_dtype=jnp.float32,
):
    """Fused banded backward under shard_map: dX stays row-sharded, the
    per-shard partial dW is psum'd over the mesh (the DP gradient
    reduction, folded into the island)."""
    mesh = _data_mesh(shards)
    kw = dict(
        window=window, chunk=chunk, subwin=subwin, interpret=interpret,
        center_k=center_k, dx_dtype=dx_dtype,
    )
    if mesh is None:
        return windowed_conv_bwd_fused(feats, nbr, g, w_t, ws, wskt, **kw)
    axis = mesh.axis_names[0]
    rows = g.shape[0] // shards  # v_in == v_out for the mirrored-gather bwd
    assert rows % 16 == 0, rows
    from jax.sharding import PartitionSpec as P

    def local_fn(feats_l, nbr_l, g_l, wt, ws_l, wskt_l):
        off = jax.lax.axis_index(axis) * rows
        nbr_a, ws_a, wskt_a = _localize(nbr_l, ws_l, wskt_l, off)
        dx, dw = windowed_conv_bwd_fused(feats_l, nbr_a, g_l, wt, ws_a, wskt_a, **kw)
        return dx, jax.lax.psum(dw, axis)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(axis), P(None, axis)),
        out_specs=(P(axis), P()), check_vma=False,
    )(feats, nbr, g, w_t, ws, wskt)


def sharded_conv_dw(
    feats, nbr, g, ws, wskt, *, window, chunk, subwin, shards, interpret=False
):
    """Banded dW under shard_map (down-conv weight gradient): the gather
    table ``feats`` is the previous stage, so localization uses its
    per-shard row count; the dW partial sums psum over the mesh."""
    mesh = _data_mesh(shards)
    kw = dict(window=window, chunk=chunk, subwin=subwin, interpret=interpret)
    if mesh is None:
        return windowed_conv_dw(feats, nbr, g, ws, wskt, **kw)
    axis = mesh.axis_names[0]
    in_rows = feats.shape[0] // shards
    assert in_rows % 16 == 0, in_rows
    from jax.sharding import PartitionSpec as P

    def local_fn(feats_l, nbr_l, g_l, ws_l, wskt_l):
        off = jax.lax.axis_index(axis) * in_rows
        nbr_a, ws_a, wskt_a = _localize(nbr_l, ws_l, wskt_l, off)
        dw = windowed_conv_dw(feats_l, nbr_a, g_l, ws_a, wskt_a, **kw)
        return jax.lax.psum(dw, axis)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(None, axis)),
        out_specs=P(), check_vma=False,
    )(feats, nbr, g, ws, wskt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _banded_core(
    window, chunk, subwin, interpret, shards, center_k, out_dtype, grad_input,
    feats, nbr, kernel, ws, wsk,
):
    return sharded_gather_conv(
        feats, nbr, kernel, ws, wsk,
        window=window, chunk=chunk, subwin=subwin, shards=shards,
        interpret=interpret, center_k=center_k, out_dtype=out_dtype,
    )


def _banded_fwd(
    window, chunk, subwin, interpret, shards, center_k, out_dtype, grad_input,
    feats, nbr, kernel, ws, wsk,
):
    out = sharded_gather_conv(
        feats, nbr, kernel, ws, wsk,
        window=window, chunk=chunk, subwin=subwin, shards=shards,
        interpret=interpret, center_k=center_k, out_dtype=out_dtype,
    )
    return out, (feats, nbr, kernel, ws, wsk)


def _banded_bwd(
    window, chunk, subwin, interpret, shards, center_k, out_dtype, grad_input,
    res, g,
):
    """Banded backward for the symmetric submanifold conv.

    ``grad_input=True`` (the default): the fused kernel gathers g once per
    offset via the mirrored-offset identity (nbr(i,k)=j <=> nbr(j,26-k)=i,
    see ops/sparse._subm_conv_bwd) and emits both dX and dW — the band
    metadata applies unchanged because the access pattern is identical to
    the forward's.

    ``grad_input=False`` (stem convs whose INPUT is a leaf — raw point
    features): the fused kernel would spend chunk x C x C MACs per offset
    producing a dX that autodiff immediately discards, and being one
    monolithic pallas_call, XLA cannot DCE it.  dW[k] = sum_v x[nbr(v,k)]^T
    g[v] is exactly the down-conv dW kernel over the forward's own band
    metadata; dX returns zeros (callers assert the input is a
    stop_gradient leaf).

    Exactness caveat: these gradients equal the dense conv's exactly iff
    BOTH the forward bands and the mirrored backward bands drop nothing —
    when drops > 0 the forward drops entry (v, k) by band(chunk(v), k) while
    the mirrored backward drops by band(chunk(u), K-1-k), different entries,
    so the banded backward is then not the exact VJP of the banded forward
    either.  The host drop counter (``count_drops``) covers both cases (the
    mirrored map visits the same (u, v, k) triples), and the solver warns on
    any nonzero count; production band profiles are sized for zero drops.
    """
    feats, nbr, kernel, ws, wsk = res
    from instancerefer_tpu.ops.precision import cast_in

    gc = cast_in(g.astype(jnp.float32))
    if not grad_input:
        dw = sharded_conv_dw(
            cast_in(feats), nbr, gc, ws, wsk,
            window=window, chunk=chunk, subwin=subwin, shards=shards,
            interpret=interpret,
        )[:, : kernel.shape[1], : kernel.shape[2]].astype(kernel.dtype)
        return jnp.zeros_like(feats), None, dw, None, None
    w_t = jnp.transpose(cast_in(kernel)[::-1], (0, 2, 1))  # w_t[k] = W[K-1-k]^T
    # the mirrored center offset is the center itself (K-1-c == c for the
    # odd symmetric 3^3 map), so the fast path carries over unchanged
    # dX stays f32: bf16 cotangents measured SLOWER end-to-end (the
    # upstream BN/residual backwards re-convert them, adding elementwise
    # passes that outweigh the halved dX write) — see PERF.md round 3
    dx, dw = sharded_conv_bwd_fused(
        cast_in(feats), nbr, gc, w_t, ws, wsk,
        window=window, chunk=chunk, subwin=subwin, shards=shards,
        interpret=interpret, center_k=center_k, dx_dtype=jnp.float32,
    )
    return dx.astype(feats.dtype), None, dw.astype(kernel.dtype), None, None


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
    shards: int = 1,
    grad_input: bool = True,
) -> jnp.ndarray:
    """Differentiable banded 3^3 submanifold conv (train + eval path).

    ``grad_input=False`` selects a dW-only backward (dX returned as zeros):
    valid ONLY when the conv input is an autodiff leaf (the encoders' stems,
    fed by raw point features) — it skips the fused backward's dX GEMMs and
    output entirely.

    Requires a symmetric-offset same-coordinate map (``nbr3``) with banded
    window metadata from ``ops/voxelize.compute_offset_window_starts``
    (``wsk`` in its transposed [K, n_chunks] SMEM layout).  ``shards > 1``
    runs fwd and bwd kernels shard_map'd over the active data mesh
    (metadata must then be block-clamped, block = rows per shard).

    The symmetric map's center offset (index K // 2) is the identity —
    both kernels fetch its rows by a direct window slice instead of the
    one-hot gather matmul (and the mirror maps it to itself in the bwd).
    """
    center_k = nbr.shape[1] // 2  # 13 for the 3^3 map
    # activations store in the compute dtype (bf16 mixed precision halves
    # the conv-output + BN HBM traffic); accumulation is f32 in-kernel
    from instancerefer_tpu.ops.precision import get_compute_dtype

    out_dtype = get_compute_dtype() or jnp.float32
    return _banded_core(
        window, chunk, subwin, interpret, shards, center_k, out_dtype,
        grad_input, feats, nbr, kernel, ws, wsk,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_eval_core(cfg, feats, nbr, kernel, ws, wsk, sc, bi):
    window, chunk, subwin, interpret, shards, relu, out_dtype = cfg
    return sharded_gather_conv(
        feats, nbr, kernel, ws, wsk,
        window=window, chunk=chunk, subwin=subwin, shards=shards,
        interpret=interpret, center_k=nbr.shape[1] // 2,
        out_dtype=out_dtype, affine_scale=sc, affine_bias=bi, relu=relu,
    )


def _fused_eval_fwd(cfg, feats, nbr, kernel, ws, wsk, sc, bi):
    out = _fused_eval_core(cfg, feats, nbr, kernel, ws, wsk, sc, bi)
    return out, (feats, nbr, kernel, ws, wsk, sc, bi)


def _fused_eval_bwd(cfg, res, g):
    """Gradients for the fused eval conv by recompute: the forward's speed is
    what matters (production eval takes no gradients); tests and any
    eval-mode grad consumers re-derive base = conv(x) through the
    differentiable banded core and apply the affine/ReLU chain rule."""
    window, chunk, subwin, interpret, shards, relu, _ = cfg
    feats, nbr, kernel, ws, wsk, sc, bi = res
    base, vjp = jax.vjp(
        lambda f, k: banded_subm_conv(
            f, nbr, k, ws, wsk, window=window, chunk=chunk, subwin=subwin,
            interpret=interpret, shards=shards,
        ),
        feats, kernel,
    )
    g = g.astype(jnp.float32)
    # rows of fully-empty chunks are identically 0 in the fused primal (the
    # kernel skips them); zero their cotangent so dbi/dsc match the fused
    # function, not the unfused relu(bias') padding values
    live = jnp.broadcast_to((ws >= 0)[:, None], (ws.shape[0], chunk))
    g = g * live.reshape(-1)[:, None]
    h = base.astype(jnp.float32) * sc[None, :] + bi[None, :]
    if relu:
        g = g * (h > 0)
    dsc = jnp.sum(g * base, axis=0).astype(sc.dtype)
    dbi = jnp.sum(g, axis=0).astype(bi.dtype)
    df, dk = vjp((g * sc[None, :]).astype(base.dtype))
    return df, None, dk, None, None, dsc, dbi


_fused_eval_core.defvjp(_fused_eval_fwd, _fused_eval_bwd)


def banded_subm_conv_eval(
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
    shards: int = 1,
    scale: jnp.ndarray = None,
    bias: jnp.ndarray = None,
    relu: bool = False,
) -> jnp.ndarray:
    """Eval-mode fused banded 3^3 submanifold conv + BN affine (+ ReLU).

    The folded BN epilogue (MaskedBatchNorm.fold_eval) is applied to the f32
    accumulator inside the kernel, eliminating the separate BN elementwise
    pass over HBM.  Differentiable via a recompute VJP (eval-mode grads are
    test-only; the train path uses ``banded_subm_conv`` + module BatchNorm).
    Padding rows of fully-empty chunks stay 0 (the unfused path leaves
    relu(bias') there) — observably identical because padding rows are never
    anyone's neighbor and all consumers mask.
    """
    from instancerefer_tpu.ops.precision import get_compute_dtype

    cfg = (window, chunk, subwin, interpret, shards, relu,
           get_compute_dtype() or jnp.float32)
    return _fused_eval_core(cfg, feats, nbr, kernel, ws, wsk, scale, bias)
