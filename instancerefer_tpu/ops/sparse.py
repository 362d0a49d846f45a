"""Fixed-capacity sparse voxel tensors for TPU.

The reference represents sparse 3D data as torchsparse ``SparseTensor`` COO
objects with dynamic row counts (reference ``models/basic_blocks.py``,
``lib/dataset.py:256-261``).  On TPU everything under ``jit`` must be statically
shaped, so a batched sparse tensor becomes a *pyramid* of ``SparseStage``
pytrees: flat padded row arrays plus host-precomputed neighbor (kernel) maps.

Per-sample rows live in uniform blocks of ``cap`` rows (sample ``b`` owns rows
``[b*cap, (b+1)*cap)``), which keeps collation trivial and makes the leading
dimension divisible by the batch size for data-parallel sharding.

The kernel maps replace torchsparse's CUDA kernel-map hash build
(reference ``torchsparse spnn.Conv3d``; see SURVEY.md §2.3 N3):

* ``nbr3[V, 27]``  — for each output voxel, the row index (same stage) of the
  input voxel at each 3x3x3 kernel offset, or -1 if that voxel is empty.
  Used by stride-1 *submanifold* convolutions (output coords == input coords).
* ``down[V, 8]``   — for each voxel of this stage, the row index *in the
  previous stage* of the input voxel at each 2x2x2 kernel offset (stride-2
  downsampling, matching torchsparse ks=2/stride=2 semantics where output
  coords are the unique ``floor(c / (2*stride)) * (2*stride)``).

Convolution is then gather -> GEMM -> accumulate, which XLA maps onto the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from instancerefer_tpu.ops.precision import cast_in


@struct.dataclass
class SparseStage:
    """One resolution level of a batched sparse voxel tensor.

    Attributes:
      coords: [V, 3] int32 voxel coordinates in units of the *base* voxel size
        (i.e. at tensor stride ``stride`` the coords are multiples of it),
        following the torchsparse convention the reference relies on
        (``models/basic_blocks.py:226-243`` divides coords by the stride).
      owner:  [V] int32 owner id of each row (-1 for padding).  For scene
        tensors this is the batch index; for instance tensors it is the flat
        candidate id ``b * max_candidates + c``.
      mask:   [V] bool row validity.
      nbr3:   [V, 27] int32 same-stage neighbor map for 3^3 submanifold conv
        (-1 = empty neighbor).  May be a [V, 0] placeholder when unused.
      down:   [V, 8] int32 previous-stage map for 2^3 stride-2 conv
        (-1 = empty).  [V, 0] placeholder on the base stage.
      stride: static python int tensor stride (1, 2, 4, 8, 16).
      ws3/wsk3: optional window origins ([n_chunks] / [27, n_chunks],
        transposed for the kernels' SMEM scalar-prefetch layout) for the
        banded Pallas submanifold conv (ops/pallas_conv); None selects the
        XLA gather-GEMM path.
      up_row/up_k: optional [V_prev] inverse of ``down`` (the stride-2 map is
        non-overlapping, so each previous-stage row feeds at most one
        (row, offset) here): the output row / offset that previous-stage row
        feeds, -1 if none.  Drives the scatter-free down-conv backward
        (ops/sparse.down_gather_conv).
    """

    coords: jnp.ndarray
    owner: jnp.ndarray
    mask: jnp.ndarray
    nbr3: jnp.ndarray
    down: jnp.ndarray
    stride: int = struct.field(pytree_node=False, default=1)
    ws3: Optional[jnp.ndarray] = None
    wsk3: Optional[jnp.ndarray] = None
    up_row: Optional[jnp.ndarray] = None
    up_k: Optional[jnp.ndarray] = None
    # banded metadata for the stride-2 ``down`` map (None = XLA gather path)
    wsd: Optional[jnp.ndarray] = None
    wskd: Optional[jnp.ndarray] = None
    # inverse map as an 8-offset neighbor table (up8[u, k] = the row of THIS
    # stage that previous-stage row u feeds at offset k, else -1) + its band
    # metadata — drives the banded down-conv dX
    up8: Optional[jnp.ndarray] = None
    wsu: Optional[jnp.ndarray] = None
    wsktu: Optional[jnp.ndarray] = None
    # static banded-conv geometry (must match what the pipeline used when
    # computing ws3/wsk3 and wsd/wskd); 0 = unset
    pallas_chunk: int = struct.field(pytree_node=False, default=0)
    pallas_window: int = struct.field(pytree_node=False, default=0)
    pallas_subwin: int = struct.field(pytree_node=False, default=0)
    pallas_down_chunk: int = struct.field(pytree_node=False, default=0)
    pallas_down_window: int = struct.field(pytree_node=False, default=0)
    pallas_down_subwin: int = struct.field(pytree_node=False, default=0)
    pallas_up_chunk: int = struct.field(pytree_node=False, default=0)
    pallas_up_window: int = struct.field(pytree_node=False, default=0)
    pallas_up_subwin: int = struct.field(pytree_node=False, default=0)
    # data-parallel execution: number of shards the banded kernels shard_map
    # over (1 = single-device; >1 requires block-clamped band metadata with
    # block = rows per shard — see ops/pallas_conv sharded wrappers)
    data_shards: int = struct.field(pytree_node=False, default=1)
    # run the Pallas kernels in interpret mode (CPU testing / dryrun)
    pallas_interpret: bool = struct.field(pytree_node=False, default=False)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


def gather_rows(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of ``feats`` at ``idx``; idx < 0 yields zero rows.

    This is the padded equivalent of torchsparse's kernel-map gather: an empty
    neighbor contributes zeros to the convolution sum.
    """
    safe = jnp.maximum(idx, 0)
    out = jnp.take(feats, safe, axis=0)
    return out * (idx >= 0)[..., None].astype(feats.dtype)


def gather_conv(
    feats: jnp.ndarray,
    nbr: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    im2col_limit: int = 0,
    precision=None,
) -> jnp.ndarray:
    """Sparse convolution core: sum_k gather(feats, nbr[:, k]) @ kernel[k].

    Equivalent math to torchsparse ``spnn.Conv3d`` (gather-scatter GEMM) but
    expressed as dense gathers over padded rows so XLA can tile the GEMMs onto
    the MXU.  Two schedules:

    * offset loop (default): K accumulated [V, Cin] @ [Cin, Cout] matmuls,
      measured at full f32 MXU throughput for Cin=128 on v5e.
    * im2col: materialize [V, K*Cin] and do one big matmul.  AVOID on TPU:
      the [V, K, Cin] intermediate is lane/sublane padded (Cin -> 128), an
      ~18x memory blowup for the 7-channel stems — measured as the dominant
      cost of the whole forward pass before the default was flipped to 0.

    Args:
      feats:  [V_in, Cin] input features (padded rows must be zero or masked
        by nbr == -1 at every consumer).
      nbr:    [V_out, K] int32 map into rows of ``feats``.
      kernel: [K, Cin, Cout] weights.
    """
    k, cin, cout = kernel.shape
    feats = cast_in(feats)
    kernel = cast_in(kernel)
    if k * cin <= im2col_limit:
        gathered = gather_rows(feats, nbr)  # [V, K, Cin]
        gathered = gathered.reshape(nbr.shape[0], k * cin)
        return jnp.dot(
            gathered,
            kernel.reshape(k * cin, cout),
            precision=precision,
            preferred_element_type=jnp.float32,
        )

    # Unrolled python loop: K is a small static constant (8 or 27); XLA fuses
    # each gather into its GEMM without a K-times larger intermediate.
    acc = jnp.zeros((nbr.shape[0], cout), dtype=jnp.float32)
    for i in range(k):
        g = gather_rows(feats, nbr[:, i])
        acc = acc + jnp.dot(
            g, kernel[i], precision=precision, preferred_element_type=jnp.float32
        )
    return acc


@jax.custom_vjp
def _subm_conv_core(feats, nbr, kernel):
    return gather_conv(feats, nbr, kernel)


def _subm_conv_fwd(feats, nbr, kernel):
    return gather_conv(feats, nbr, kernel), (feats, nbr, kernel)


def _subm_conv_bwd(res, g):
    """Exact scatter-free backward for the symmetric submanifold conv.

    XLA autodiffs the forward gathers into scatter-adds, which are several
    times slower than gathers on TPU (measured 569 ms for one 262k x 64 conv's
    backward).  For a 3^3 *submanifold* map the transpose is itself a gather:
    offsets come in +/- pairs (KERNEL_OFFSETS_3[26-k] == -KERNEL_OFFSETS_3[k])
    and output coords == input coords, so nbr(i,k) = j  <=>  nbr(j, 26-k) = i.
    Hence dX[j] = sum_k g[nbr(j,k)] W_{26-k}^T — a gather_conv over the SAME
    map with mirror-transposed kernels — and dW[k] = gathered_x_k^T @ g
    (gathers recomputed — cheaper than saving them).
    """
    feats, nbr, kernel = res
    g32 = g.astype(jnp.float32)
    gc = cast_in(g32)
    w_t = jnp.transpose(cast_in(kernel)[::-1], (0, 2, 1))  # w_t[k] = W[26-k]^T
    dx = gather_conv(gc, nbr, w_t).astype(feats.dtype)
    k = nbr.shape[1]
    xc = cast_in(feats)
    dws = []
    for i in range(k):
        xk = gather_rows(xc, nbr[:, i])
        dws.append(
            jnp.einsum("vc,vd->cd", xk, gc, preferred_element_type=jnp.float32)
        )
    dw = jnp.stack(dws).astype(kernel.dtype)
    return dx, None, dw


_subm_conv_core.defvjp(_subm_conv_fwd, _subm_conv_bwd)


def subm_gather_conv(feats: jnp.ndarray, nbr: jnp.ndarray, kernel: jnp.ndarray):
    """3^3 submanifold conv with the fast mirrored-gather backward.

    Requires a symmetric-offset same-coordinate map (``nbr3`` of a
    SparseStage).  Down-sampling maps are NOT symmetric — use
    ``down_gather_conv`` (inverse-map backward) for those.
    """
    return _subm_conv_core(feats, nbr, kernel)


@jax.custom_vjp
def _down_conv_core(feats, down, up_row, up_k, kernel):
    return gather_conv(feats, down, kernel)


def _down_conv_fwd(feats, down, up_row, up_k, kernel):
    return gather_conv(feats, down, kernel), (feats, down, up_row, up_k, kernel)


def _down_conv_bwd(res, g):
    """Scatter-free backward for the stride-2 2^3 down-conv.

    The 2^3/stride-2 kernel map is NON-overlapping: every input row feeds at
    most one (output row, offset) pair, so its transpose is a host-invertible
    permutation — ``up_row[u]`` is the output row input u feeds (-1 if none)
    and ``up_k[u]`` its offset.  Hence

        dX[u] = g[up_row[u]] @ W[up_k[u]]^T

    ONE plain row-gather (tmp = g[up_row]) serves both outputs — the same
    inverse-map substitution u = down(v, k) rewrites dW as

        dW[k] = sum_v x[down(v,k)]^T g[v] = x^T @ (tmp ⊙ [up_k == k])

    so the backward is 1 gather + 2K masked GEMMs, where XLA autodiff would
    emit K scatter-adds and the naive dW another K gathers (both measured
    several times slower than this on TPU).
    """
    feats, down, up_row, up_k, kernel = res
    g32 = g.astype(jnp.float32)
    gc = cast_in(g32)
    k = kernel.shape[0]
    tmp = gather_rows(gc, up_row)  # [V_in, Cout]
    w_t = jnp.transpose(cast_in(kernel), (0, 2, 1))  # [K, Cout, Cin]
    xc = cast_in(feats)
    dx = jnp.zeros((feats.shape[0], kernel.shape[1]), jnp.float32)
    dws = []
    for i in range(k):
        sel = (up_k == i)[:, None].astype(tmp.dtype)
        tsel = tmp * sel
        dx = dx + jnp.dot(tsel, w_t[i], preferred_element_type=jnp.float32)
        dws.append(
            jnp.einsum("vc,vd->cd", xc, tsel, preferred_element_type=jnp.float32)
        )
    dw = jnp.stack(dws).astype(kernel.dtype)
    return dx.astype(feats.dtype), None, None, None, dw


_down_conv_core.defvjp(_down_conv_fwd, _down_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _down_conv_banded_core(window, chunk, subwin, up_chunk, up_window,
                           up_subwin, interpret, shards, feats, down, up_row,
                           up_k, kernel, wsd, wskd, up8, wsu, wsktu):
    from instancerefer_tpu.ops.pallas_conv import sharded_gather_conv
    from instancerefer_tpu.ops.precision import get_compute_dtype

    return sharded_gather_conv(
        cast_in(feats), down, cast_in(kernel), wsd, wskd,
        window=window, chunk=chunk, subwin=subwin, shards=shards,
        interpret=interpret, out_dtype=get_compute_dtype() or jnp.float32,
    )


def _down_conv_banded_fwd(window, chunk, subwin, up_chunk, up_window,
                          up_subwin, interpret, shards, feats, down, up_row,
                          up_k, kernel, wsd, wskd, up8, wsu, wsktu):
    out = _down_conv_banded_core(
        window, chunk, subwin, up_chunk, up_window, up_subwin, interpret,
        shards, feats, down, up_row, up_k, kernel, wsd, wskd, up8, wsu, wsktu
    )
    return out, (feats, down, up_row, up_k, kernel, wsd, wskd, up8, wsu, wsktu)


def _down_conv_banded_bwd(window, chunk, subwin, up_chunk, up_window,
                          up_subwin, interpret, shards, res, g):
    """Both gradient legs go through banded kernels:

    dW reuses the forward's (wsd, wskd) band metadata — one windowed pass
    instead of K full-size einsum passes over the previous stage (~17 ms of
    the scene backward).  dX runs the forward kernel over the INVERSE map
    (up8: each previous-stage row feeds at most one (row, offset) of this
    stage) with W^T — replacing a row-gather plus K full-size masked GEMM
    passes (~10 ms more).  When up-band metadata is absent, dX falls back to
    the gather + masked-GEMM form.
    """
    feats, down, up_row, up_k, kernel, wsd, wskd, up8, wsu, wsktu = res
    from instancerefer_tpu.ops.pallas_conv import (
        sharded_conv_dw,
        sharded_gather_conv,
    )

    g32 = g.astype(jnp.float32)
    gc = cast_in(g32)
    k = kernel.shape[0]
    w_t = jnp.transpose(cast_in(kernel), (0, 2, 1))  # [K, Cout, Cin]
    if up8 is not None and wsu is not None:
        dx = sharded_gather_conv(
            gc, up8, w_t, wsu, wsktu,
            window=up_window, chunk=up_chunk, subwin=up_subwin,
            shards=shards, interpret=interpret,
        )[:, : kernel.shape[1]]
    else:
        tmp = gather_rows(gc, up_row)  # [V_in, Cout]
        dx = jnp.zeros((feats.shape[0], kernel.shape[1]), jnp.float32)
        for i in range(k):
            sel = (up_k == i)[:, None].astype(tmp.dtype)
            dx = dx + jnp.dot(
                tmp * sel, w_t[i], preferred_element_type=jnp.float32
            )
    dw = sharded_conv_dw(
        cast_in(feats), down, gc, wsd, wskd,
        window=window, chunk=chunk, subwin=subwin, shards=shards,
        interpret=interpret,
    )[:, : kernel.shape[1], : kernel.shape[2]].astype(kernel.dtype)
    return (dx.astype(feats.dtype), None, None, None, dw, None, None, None,
            None, None)


_down_conv_banded_core.defvjp(_down_conv_banded_fwd, _down_conv_banded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _down_fused_eval_core(cfg, feats, down, up_row, up_k, kernel, wsd, wskd,
                          up8, wsu, wsktu, sc, bi):
    """Eval-mode fused down conv + BN affine (+ ReLU): the folded epilogue
    runs inside the banded kernel; gradients (test-only in eval mode) go
    through a recompute VJP over the differentiable down-conv core."""
    (window, chunk, subwin, up_chunk, up_window, up_subwin, interpret,
     shards, relu, out_dtype) = cfg
    from instancerefer_tpu.ops.pallas_conv import sharded_gather_conv

    return sharded_gather_conv(
        cast_in(feats), down, cast_in(kernel), wsd, wskd,
        window=window, chunk=chunk, subwin=subwin, shards=shards,
        interpret=interpret, out_dtype=out_dtype,
        affine_scale=sc, affine_bias=bi, relu=relu,
    )


def _down_fused_eval_fwd(cfg, feats, down, up_row, up_k, kernel, wsd, wskd,
                         up8, wsu, wsktu, sc, bi):
    out = _down_fused_eval_core(
        cfg, feats, down, up_row, up_k, kernel, wsd, wskd, up8, wsu, wsktu,
        sc, bi,
    )
    return out, (feats, down, up_row, up_k, kernel, wsd, wskd, up8, wsu,
                 wsktu, sc, bi)


def _down_fused_eval_bwd(cfg, res, g):
    (window, chunk, subwin, up_chunk, up_window, up_subwin, interpret,
     shards, relu, _) = cfg
    (feats, down, up_row, up_k, kernel, wsd, wskd, up8, wsu, wsktu, sc,
     bi) = res
    base, vjp = jax.vjp(
        lambda f, k: down_gather_conv(
            f, down, up_row, up_k, k, wsd, wskd, up8, wsu, wsktu,
            window=window, chunk=chunk, subwin=subwin, up_chunk=up_chunk,
            up_window=up_window, up_subwin=up_subwin, interpret=interpret,
            shards=shards,
        ),
        feats, kernel,
    )
    g = g.astype(jnp.float32)
    if wsd is not None:
        # fully-empty chunks are skipped (exact zeros) in the fused primal —
        # zero their cotangent so dbi/dsc match the fused function
        live = jnp.broadcast_to((wsd >= 0)[:, None], (wsd.shape[0], chunk))
        g = g * live.reshape(-1)[:, None]
    h = base.astype(jnp.float32) * sc[None, :] + bi[None, :]
    if relu:
        g = g * (h > 0)
    dsc = jnp.sum(g * base, axis=0).astype(sc.dtype)
    dbi = jnp.sum(g, axis=0).astype(bi.dtype)
    df, dk = vjp((g * sc[None, :]).astype(base.dtype))
    return (df, None, None, None, dk, None, None, None, None, None, dsc, dbi)


_down_fused_eval_core.defvjp(_down_fused_eval_fwd, _down_fused_eval_bwd)


def down_gather_conv(
    feats: jnp.ndarray,
    down: jnp.ndarray,
    up_row: jnp.ndarray,
    up_k: jnp.ndarray,
    kernel: jnp.ndarray,
    wsd=None,
    wskd=None,
    up8=None,
    wsu=None,
    wsktu=None,
    *,
    window: int = 0,
    chunk: int = 0,
    subwin: int = 0,
    up_chunk: int = 0,
    up_window: int = 0,
    up_subwin: int = 0,
    interpret: bool = False,
    shards: int = 1,
    epilogue=None,
):
    """2^3 stride-2 conv with the inverse-map (scatter-free) backward.

    ``up_row``/``up_k`` come from the host pipeline
    (``data/pipeline.batch_to_device_dict``), which inverts the batch's
    ``down`` map.  When the batch also carries banded down-map metadata
    (``wsd``/``wskd``), the forward runs through the banded Pallas kernel
    (with its exact empty-chunk skip); the backward is the inverse-map one
    either way.  Falls back to plain ``gather_conv`` when maps are absent.
    ``shards > 1`` shard_maps the banded kernels over the active data mesh.

    ``epilogue=(scale, bias, relu)`` is the EVAL-ONLY fused BN affine
    (+ReLU): applied inside the banded kernel (no VJP — bypasses the
    custom-vjp core), or as plain XLA ops on the fallback paths.
    """
    if epilogue is not None:
        sc, bi, relu = epilogue
        if (up_row is not None and wsd is not None and wskd is not None
                and subwin > 0):
            from instancerefer_tpu.ops.precision import get_compute_dtype

            cfg = (window, chunk, subwin, up_chunk, up_window, up_subwin,
                   interpret, shards, relu,
                   get_compute_dtype() or jnp.float32)
            return _down_fused_eval_core(
                cfg, feats, down, up_row, up_k, kernel, wsd, wskd, up8, wsu,
                wsktu, sc, bi,
            )
        out = down_gather_conv(
            feats, down, up_row, up_k, kernel, wsd, wskd, up8, wsu, wsktu,
            window=window, chunk=chunk, subwin=subwin, up_chunk=up_chunk,
            up_window=up_window, up_subwin=up_subwin, interpret=interpret,
            shards=shards,
        )
        out = out * sc[None, :] + bi[None, :]
        return jnp.maximum(out, 0.0) if relu else out
    if up_row is None or up_k is None:
        return gather_conv(feats, down, kernel)
    if wsd is not None and wskd is not None and subwin > 0:
        return _down_conv_banded_core(
            window, chunk, subwin, up_chunk, up_window, up_subwin, interpret,
            shards, feats, down, up_row, up_k, kernel, wsd, wskd, up8, wsu,
            wsktu
        )
    return _down_conv_core(feats, down, up_row, up_k, kernel)


def masked_global_max_pool(
    feats: jnp.ndarray, owner: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Per-owner max over voxel rows; owners with no rows pool to zeros.

    Replaces torchsparse ``spnn.GlobalMaxPooling`` (CUDA segment max; reference
    ``models/attribute_module.py:20,105``).  ``owner`` is -1 for padding rows.
    """
    neg = jnp.finfo(feats.dtype).min
    valid = owner >= 0
    safe_owner = jnp.where(valid, owner, num_segments)  # dump padding in an extra bin
    masked = jnp.where(valid[:, None], feats, neg)
    pooled = jax.ops.segment_max(
        masked, safe_owner, num_segments=num_segments + 1, indices_are_sorted=False
    )[:num_segments]
    has_rows = jax.ops.segment_sum(
        valid.astype(jnp.int32), safe_owner, num_segments=num_segments + 1
    )[:num_segments]
    return jnp.where((has_rows > 0)[:, None], pooled, 0.0)


def masked_mean(feats: jnp.ndarray, mask: jnp.ndarray, axis=0, eps: float = 1e-12):
    m = mask.astype(feats.dtype)
    while m.ndim < feats.ndim:
        m = m[..., None]
    total = jnp.sum(feats * m, axis=axis)
    count = jnp.sum(m, axis=axis)
    return total / jnp.maximum(count, eps)
