"""Host-side voxelization and kernel-map construction (numpy, C++-accelerated).

TPU-native replacement for torchsparse's C++ ``sparse_quantize`` and the CUDA
kernel-map hash build inside ``spnn.Conv3d`` (reference ``lib/dataset.py:228-261``,
``models/attribute_module.py:65-69``; SURVEY.md §2.3 N1-N3).  Everything here
runs in the input pipeline (dataloader workers), producing the static padded
``SparseStage`` arrays the device step consumes — so the forward pass never
bounces back to the host the way the reference's does
(reference ``models/attribute_module.py:99-101``).

Coordinate/key scheme: voxel coords are int32 and may be negative (floor of
xyz/voxel_size, matching ``sparse_quantize``).  They are packed into int64 keys
with 14 bits per axis (offset 2^13 ≈ ±8000 voxels ≈ ±160 m at 2 cm) so that
unique/sort/searchsorted give O(N log N) hash-free lookups.

A C++ implementation of the same routines lives in ``native/voxelizer.cpp``
(loaded via ctypes when built); the numpy path is the always-available
reference implementation and is what the unit tests validate against
brute force.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _load_native():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
        "libirvoxelizer.so",
    )
    src = os.path.join(os.path.dirname(path), "voxelizer.cpp")
    stale = (
        not os.path.exists(path)
        or (os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(path))
    )
    if stale and os.environ.get("IR_TPU_NO_BUILD") == "1" and os.path.exists(path):
        # a stale .so can silently diverge from the numpy-validated semantics
        # even at an unchanged ABI — say so instead of quietly loading it
        import warnings

        warnings.warn(
            "IR_TPU_NO_BUILD=1: loading libirvoxelizer.so older than "
            "voxelizer.cpp — native kernel-map semantics may be stale",
            stacklevel=2,
        )
    if stale and os.environ.get("IR_TPU_NO_BUILD") != "1":
        # best-effort (re)build; numpy fallback on any failure
        try:
            from instancerefer_tpu.native.build import build

            build(verbose=False)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    try:
        lib.ir_unique_first.restype = ctypes.c_int64
        lib.ir_unique_first.argtypes = [i32p, ctypes.c_int64, i64p]
        lib.ir_build_nbr.restype = None
        lib.ir_build_nbr.argtypes = [i32p, ctypes.c_int64, i32p, ctypes.c_int32,
                                     ctypes.c_int32, i32p]
        lib.ir_downsample.restype = ctypes.c_int64
        lib.ir_downsample.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p]
        lib.ir_band_starts.restype = None
        lib.ir_band_starts.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, i32p, i32p, i64p, i64p,
        ]
        # version probe: v3 added ir_unique_raster + the fused ir_pyramid;
        # v4 added ir_minmax3 (+ the hash-free downsample inside ir_pyramid)
        lib.ir_abi_version.restype = ctypes.c_int32
        lib.ir_abi_version.argtypes = []
        if lib.ir_abi_version() < 4:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.ir_minmax3.restype = None
        lib.ir_minmax3.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, f32p, f32p]
        lib.ir_invert_down.restype = None
        lib.ir_invert_down.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64, i32p, i32p,
        ]
        lib.ir_unique_raster.restype = ctypes.c_int64
        lib.ir_unique_raster.argtypes = [i32p, ctypes.c_int64, i64p]
        lib.ir_pyramid.restype = None
        lib.ir_pyramid.argtypes = [
            i32p, i64p, i32p, ctypes.c_int64, ctypes.c_int32, i64p,
            ctypes.c_int32, i32p, i32p, i32p, i32p, i64p,
        ]
    except AttributeError:
        # an .so from an older source revision without the newer entry points
        return None
    return lib


_NATIVE = _load_native()


def native_available() -> bool:
    return _NATIVE is not None


_COORD_BITS = 14
_COORD_OFF = 1 << (_COORD_BITS - 1)
_COORD_MASK = (1 << _COORD_BITS) - 1

# 3x3x3 kernel offsets in torchsparse's canonical (x-fastest) enumeration order.
# Order only affects which weight slice learns which offset, not the math.
KERNEL_OFFSETS_3 = np.array(
    [[dx, dy, dz] for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
    dtype=np.int32,
)
# 2x2x2 stride-2 offsets: {0, 1} per axis in units of the input stride.
KERNEL_OFFSETS_2 = np.array(
    [[dx, dy, dz] for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
    dtype=np.int32,
)


def pack_coords(coords: np.ndarray) -> np.ndarray:
    """Pack int coords [N, 3] into sortable int64 keys.

    Out-of-range coords (beyond ±8191 voxels, i.e. ±160 m at 2 cm) are
    CLIPPED to the boundary — they alias onto boundary voxels rather than
    raising (same policy in the C++ ``pack``; mirrors the reference hashing
    whatever it is given).  Callers needing corrupt-input detection must
    range-check before packing."""
    c = coords.astype(np.int64) + _COORD_OFF
    if c.size and (c.min() < 0 or c.max() > _COORD_MASK):
        # Out-of-range coords (> ±160 m at 2 cm) indicate corrupt input; clip
        # like the reference's implicit behavior of just hashing whatever came in.
        c = np.clip(c, 0, _COORD_MASK)
    return (c[:, 0] << (2 * _COORD_BITS)) | (c[:, 1] << _COORD_BITS) | c[:, 2]


def quantize(
    xyz: np.ndarray, feats: np.ndarray, voxel_size: float, raster_order: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """floor-quantize points to voxels, keeping one feature row per voxel.

    Mirrors torchsparse 1.2 ``sparse_quantize(pc, feats, quantization_size)``:
    integer coords = floor(xyz / voxel_size); duplicates are dropped keeping
    the first occurrence (reference ``lib/dataset.py:256-261``).

    ``raster_order=True`` emits rows sorted by the packed x-major raster key
    instead of first-occurrence order.  Row order is semantically invisible
    (all consumers go through kernel maps / owner ids), but the spatial sort
    gives the neighbor-index locality the windowed Pallas conv kernel relies
    on.  (Raster measured strictly better than Morton/tiled orders here:
    neighbor-index span is bounded by the surface's per-slab occupancy, and
    z-curve discontinuities on sparse surfaces blow past it.)
    """
    coords = np.ascontiguousarray(np.floor(xyz / voxel_size), dtype=np.int32)
    if _NATIVE is not None:
        keep = np.empty(len(coords), np.int64)
        if raster_order:
            # fused first-occurrence dedup + raster sort (radix, one pass)
            m = _NATIVE.ir_unique_raster(coords, len(coords), keep)
            return coords[keep[:m]], feats[keep[:m]]
        m = _NATIVE.ir_unique_first(coords, len(coords), keep)
        first = keep[:m]
    else:
        keys = pack_coords(coords)
        # np.unique(return_index) returns the first occurrence per key.
        _, first = np.unique(keys, return_index=True)
        first.sort()
    if raster_order:
        first = first[np.argsort(pack_coords(coords[first]), kind="stable")]
    return coords[first], feats[first]


def compute_window_starts(
    nbr: np.ndarray, chunk: int, window: int, v_in: int, align: int = 16
) -> np.ndarray:
    """Window origin per output chunk for the Pallas windowed conv.

    start[i] = clamp(align_down(min valid nbr of chunk i), 0, v_in - window).
    Starts are aligned down to ``align`` rows (bf16 VMEM slices need 16-row
    sublane alignment).  Neighbors beyond start+window (only possible when a
    chunk's index span exceeds the window, i.e. degenerate geometry or
    capacity overflow) degrade to empty in the kernel.

    Simple/test-oriented producer: production exclusively builds window
    metadata through ``compute_offset_window_starts`` (per-offset bands,
    ``-1`` empty-chunk markers — data/pipeline.py), which must uphold the
    same alignment contract.
    """
    v_out = len(nbr)
    n = v_out // chunk
    blk = nbr[: n * chunk].reshape(n, chunk * nbr.shape[1])
    masked = np.where(blk >= 0, blk, np.iinfo(np.int32).max)
    lo = masked.min(axis=1)
    lo = np.where(lo == np.iinfo(np.int32).max, 0, lo)
    lo = (lo // align) * align
    return np.clip(lo, 0, max(v_in - window, 0)).astype(np.int32)


def compute_offset_window_starts(
    nbr: np.ndarray,
    chunk: int,
    window: int,
    subwin: int,
    v_in: int,
    align: int = 16,
    count_drops: bool = False,
    block: int = 0,
    block_in: Optional[int] = None,
):
    """(window_start [n], offset_window_start [K, n]) for the banded conv.

    Per-offset neighbor indices over raster-sorted chunks are nearly monotone,
    so each offset k fits a sub-window of ``subwin`` rows starting at its own
    (aligned) minimum; sub-windows are clamped inside the chunk's global
    window.  ``window`` and ``subwin`` must be multiples of ``align``.

    The offset-window array is returned TRANSPOSED ([K, n_chunks]) — the
    kernels keep it in SMEM, and scalar prefetch lane-pads the minor axis to
    128, which would overflow SMEM with K (=27) minor on large stages.

    With ``count_drops=True`` also returns (dropped, total): how many valid
    neighbor entries fall outside their offset's sub-window (the kernel
    treats those as empty — a silent numeric deviation worth observing; the
    count reflects the FINAL clamped bands, so block clamping is priced in).

    ``block > 0`` additionally clamps every window inside one slab per
    ``block`` output rows (block must be a multiple of chunk); the slab in
    *input-row* space spans ``block_in`` rows (default ``block``, which is
    right for submanifold maps where v_in == v_out; down/up maps pass the
    input stage's per-shard row count).  ``block_in`` must be >= window.
    This makes the metadata shard-safe for data-parallel execution: with
    block(_in) = rows_per_shard, windows never cross shard boundaries, so a
    shard_map'd kernel subtracts its shard's input-row offset and runs on
    purely local rows.
    """
    v_out, k = nbr.shape
    n = v_out // chunk
    if block:
        block_in = block if block_in is None else block_in
        assert block % chunk == 0 and block_in >= window, (block, chunk, block_in, window)
    else:
        block_in = 0
    if _NATIVE is not None and v_out == n * chunk:
        nbr_c = np.ascontiguousarray(nbr, dtype=np.int32)
        ws = np.empty(n, np.int32)
        wsk_t = np.empty((k, n), np.int32)
        dropped = np.zeros(1, np.int64)
        total = np.zeros(1, np.int64)
        _NATIVE.ir_band_starts(
            nbr_c, v_out, k, chunk, window, subwin, v_in, align, block,
            block_in, ws, wsk_t, dropped, total,
        )
        if not count_drops:
            return ws, wsk_t
        return ws, wsk_t, int(dropped[0]), int(total[0])
    big = np.iinfo(np.int32).max
    blk = nbr[: n * chunk].reshape(n, chunk, k)
    masked = np.where(blk >= 0, blk, big)
    lo_k = masked.min(axis=1)  # [n, K]; big where an offset has no valid nbr
    lo_global = lo_k.min(axis=1)  # big only when the whole chunk is empty
    empty = lo_global == big
    lo = np.where(empty, 0, lo_global)
    lo = (lo // align) * align
    ws = np.clip(lo, 0, max(v_in - window, 0)).astype(np.int32)
    if block:
        blk_lo = (np.arange(n) * chunk // block) * block_in
        ws = np.clip(ws, blk_lo, blk_lo + block_in - window).astype(np.int32)
    # empty offsets take the chunk's window start (no valid nbr to cover)
    lo_k = np.where(lo_k == big, ws[:, None], lo_k)
    wsk = (lo_k // align) * align
    wsk = np.clip(wsk, ws[:, None], (ws + window - subwin)[:, None]).astype(np.int32)
    # fully-empty chunks (all rows padding: a valid row always has its self
    # neighbor) are marked ws = -1 — the kernels skip their DMA and compute
    # entirely and write zero outputs, which is EXACT (padding rows are never
    # anyone's neighbor).  Typical cap utilization makes this a 1.3-4x win.
    ws = np.where(empty, -1, ws).astype(np.int32)
    wsk_t = np.ascontiguousarray(wsk.T)
    if not count_drops:
        return ws, wsk_t
    valid = blk >= 0
    local = blk - wsk[:, None, :]
    ok = valid & (local >= 0) & (local < subwin)
    if k == 27:
        # The kernels' center-offset (k=13 identity) fast path is
        # all-or-nothing per chunk: when the window cannot hold the chunk's
        # diagonal it zeroes EVERY center row, including ones whose band
        # entry the one-hot would keep — count them all as dropped so the
        # zero-drop invariant protecting the fast path stays sound.
        diag = np.arange(n) * chunk
        bad = (ws >= 0) & ~((diag >= ws) & (diag + chunk <= ws + window))
        if bad.any():
            ok[bad, :, 13] = False
    total = int(valid.sum())
    dropped = total - int(ok.sum())
    return ws, wsk_t, dropped, total


def invert_down(down: np.ndarray, v_prev: int):
    """Invert a (non-overlapping) stride-2 map: previous-stage row ->
    (this-stage row, offset), -1 where a row feeds nothing.

    Drives the scatter-free down-conv backward (ops/sparse.down_gather_conv).
    """
    if _NATIVE is not None:
        down_c = np.ascontiguousarray(down, dtype=np.int32)
        up_row = np.empty(v_prev, np.int32)
        up_k = np.empty(v_prev, np.int32)
        _NATIVE.ir_invert_down(
            down_c, down.shape[0], down.shape[1], v_prev, up_row, up_k
        )
        return up_row, up_k
    up_row = np.full(v_prev, -1, np.int32)
    up_k = np.full(v_prev, -1, np.int32)
    vv, kk = np.nonzero(down >= 0)
    tgt = down[vv, kk]
    # match the native guard (voxelizer.cpp ir_invert_down): refs >= v_prev
    # are dropped, not an IndexError — both paths behave identically on
    # (upstream-bug) out-of-range data
    ok = tgt < v_prev
    up_row[tgt[ok]] = vv[ok].astype(np.int32)
    up_k[tgt[ok]] = kk[ok].astype(np.int32)
    return up_row, up_k


def point_minmax3(pts: np.ndarray):
    """(min, max) of the first 3 columns of an [n, >=3] float array — the
    xyz extent the scene block carries (reference keeps point_min/point_max,
    ``lib/dataset.py:263-299``).  Native path is one vectorized pass; the
    numpy strided reduction it replaces was ~2 ms/sample at 40k points."""
    if (
        _NATIVE is not None
        and pts.dtype == np.float32
        and pts.ndim == 2
        and pts.shape[0] > 0
        and pts.shape[1] >= 3
        and pts.flags.c_contiguous
    ):
        mn = np.empty(3, np.float32)
        mx = np.empty(3, np.float32)
        _NATIVE.ir_minmax3(pts, pts.shape[0], pts.shape[1], mn, mx)
        return mn, mx
    x = pts[:, :3]
    return x.min(0).astype(np.float32), x.max(0).astype(np.float32)


def build_up8(up_row: np.ndarray, up_k: np.ndarray) -> np.ndarray:
    """One-hot expansion of an inverted down map: ``up8[u, k] = up_row[u]``
    where ``up_k[u] == k``, else -1 ([v_prev, 8] int32).  Drives the banded
    down-conv dX (ops/sparse.down_gather_conv's inverse-map band path).

    Single fancy-index pass — the broadcast ``np.where(up_k[:, None] ==
    arange(8), ...)`` it replaces materialized two [v_prev, 8] temporaries
    per stage and was the biggest single slice of the scene pack phase
    (VERDICT r4 #3)."""
    out = np.full((len(up_row), 8), -1, np.int32)
    ok = up_k >= 0
    out[np.nonzero(ok)[0], up_k[ok]] = up_row[ok]
    return out


def _lookup(sorted_keys: np.ndarray, order: np.ndarray, query_keys: np.ndarray) -> np.ndarray:
    """Row index for each query key, -1 if absent.  sorted_keys = keys[order]."""
    pos = np.searchsorted(sorted_keys, query_keys)
    pos_c = np.minimum(pos, len(sorted_keys) - 1) if len(sorted_keys) else pos
    if len(sorted_keys) == 0:
        return np.full(query_keys.shape, -1, dtype=np.int32)
    found = sorted_keys[pos_c] == query_keys
    idx = order[pos_c].astype(np.int32)
    return np.where(found, idx, np.int32(-1))


def build_nbr3(coords: np.ndarray, stride: int) -> np.ndarray:
    """Submanifold 3^3 neighbor map: nbr3[i, k] = row of coords + offset_k*stride."""
    n = len(coords)
    if n == 0:
        return np.zeros((0, 27), dtype=np.int32)
    if _NATIVE is not None:
        coords = np.ascontiguousarray(coords, dtype=np.int32)
        out = np.empty((n, 27), dtype=np.int32)
        _NATIVE.ir_build_nbr(coords, n, KERNEL_OFFSETS_3, 27, stride, out)
        return out
    keys = pack_coords(coords)
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    out = np.empty((n, 27), dtype=np.int32)
    for k, off in enumerate(KERNEL_OFFSETS_3):
        q = pack_coords(coords + off[None, :] * stride)
        out[:, k] = _lookup(sorted_keys, order, q)
    return out


def build_downsample(
    coords: np.ndarray, stride: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Stride-2 downsample: output coords + 2^3 kernel map into the input rows.

    torchsparse ks=2/stride=2 semantics: output coordinates are the unique
    ``floor(c / (2*stride)) * (2*stride)`` and each output gathers the inputs at
    ``out + {0, stride}^3``.
    """
    if len(coords) == 0:
        return np.zeros((0, 3), dtype=np.int32), np.zeros((0, 8), dtype=np.int32)
    if _NATIVE is not None:
        coords = np.ascontiguousarray(coords, dtype=np.int32)
        out_coords = np.empty((len(coords), 3), np.int32)
        down = np.empty((len(coords), 8), np.int32)
        m = _NATIVE.ir_downsample(coords, len(coords), stride, out_coords, down)
        return out_coords[:m].copy(), down[:m].copy()
    new_stride = stride * 2
    down_coords = (coords // new_stride) * new_stride
    keys = pack_coords(down_coords)
    _, first = np.unique(keys, return_index=True)
    first.sort()
    out_coords = down_coords[first]

    in_keys = pack_coords(coords)
    order = np.argsort(in_keys, kind="stable")
    sorted_keys = in_keys[order]
    down = np.empty((len(out_coords), 8), dtype=np.int32)
    for k, off in enumerate(KERNEL_OFFSETS_2):
        q = pack_coords(out_coords + off[None, :] * stride)
        down[:, k] = _lookup(sorted_keys, order, q)
    return out_coords, down


@dataclasses.dataclass
class StageArrays:
    """Unpadded per-sample stage, host-side (numpy, local row indices)."""

    coords: np.ndarray  # [n, 3] int32
    owner: np.ndarray  # [n] int32
    nbr3: np.ndarray  # [n, 27] int32 (local)
    down: np.ndarray  # [n, 8] int32 (local, into previous stage), [n,0] on stage 0
    stride: int


def _truncate_stage(stage: StageArrays, cap: int, prev_cap: Optional[int]) -> StageArrays:
    """Enforce a row budget; neighbor refs to dropped rows become -1 (empty)."""
    n = min(len(stage.coords), cap)
    nbr3 = stage.nbr3[:n]
    nbr3 = np.where(nbr3 < cap, nbr3, np.int32(-1))
    down = stage.down[:n]
    if prev_cap is not None and down.shape[1]:
        down = np.where(down < prev_cap, down, np.int32(-1))
    return StageArrays(stage.coords[:n], stage.owner[:n], nbr3, down, stage.stride)


def build_pyramid(
    coords: np.ndarray,
    owner: np.ndarray,
    num_stages: int,
    caps: Optional[Sequence[int]] = None,
    raster: bool = False,
) -> List[StageArrays]:
    """Build the full conv pyramid for one sample (or one candidate group).

    Stage 0 is the input resolution with a 3^3 submanifold map (for the stem,
    reference ``models/basic_blocks.py:63-65``); stages 1..num_stages-1 each
    halve resolution (ks=2 stride=2 downsample conv) and carry a 3^3 map for
    their residual blocks (reference ``models/basic_blocks.py:67-86``).

    ``owner`` labels rows (batch index or flat candidate id); downsampled
    stages inherit the owner of any contributing input row.  Rows are assumed
    to belong to a single owner per call unless callers concatenate afterwards
    (instance pyramids are built per candidate then concatenated).
    """
    stages: List[StageArrays] = []
    cur_coords, stride = coords.astype(np.int32), 1
    cur_owner = np.broadcast_to(np.asarray(owner, dtype=np.int32), (len(cur_coords),))
    for s in range(num_stages):
        if s == 0:
            down = np.zeros((len(cur_coords), 0), dtype=np.int32)
        else:
            prev = stages[-1]
            cur_coords, down = build_downsample(prev.coords, prev.stride)
            stride = prev.stride * 2
            if raster:
                # coordinate-wise floor does NOT preserve the spatial order,
                # so re-sort every stage (the windowed Pallas conv relies on
                # bounded neighbor spans over raster-sorted rows)
                perm = np.argsort(pack_coords(cur_coords), kind="stable")
                cur_coords = cur_coords[perm]
                down = down[perm]
            # owner of an output voxel = owner of its first contributing input
            first_valid = np.argmax(down >= 0, axis=1)
            src = down[np.arange(len(down)), first_valid]
            cur_owner = prev.owner[np.maximum(src, 0)]
        nbr3 = build_nbr3(cur_coords, stride)
        stages.append(StageArrays(cur_coords, cur_owner, nbr3, down, stride))

    if caps is not None:
        out: List[StageArrays] = []
        for s, stage in enumerate(stages):
            prev_cap = caps[s - 1] if s > 0 else None
            out.append(_truncate_stage(stage, caps[s], prev_cap))
        stages = out
    return stages


def concat_stages(groups: List[List[StageArrays]], num_stages: int) -> List[StageArrays]:
    """Concatenate per-candidate pyramids into one per-sample pyramid.

    Local neighbor indices are offset by each group's running row count per
    stage; cross-group neighbors never exist because candidates are distinct
    sparse tensors (torchsparse ``sparse_collate_tensors`` keeps them separate
    via the batch coordinate, reference ``models/attribute_module.py:101``).
    """
    out: List[StageArrays] = []
    for s in range(num_stages):
        coords, owner, nbr3, down = [], [], [], []
        off = 0
        prev_off = 0
        for g in groups:
            st = g[s]
            coords.append(st.coords)
            owner.append(st.owner)
            nbr3.append(np.where(st.nbr3 >= 0, st.nbr3 + off, st.nbr3))
            if s > 0:
                down.append(np.where(st.down >= 0, st.down + prev_off, st.down))
                prev_off += len(g[s - 1].coords)
            off += len(st.coords)
        if not groups:
            coords = [np.zeros((0, 3), dtype=np.int32)]
            owner = [np.zeros((0,), dtype=np.int32)]
            nbr3 = [np.zeros((0, 27), dtype=np.int32)]
            down = [np.zeros((0, 8), dtype=np.int32)]
        stride = groups[0][s].stride if groups else (1 << s)
        out.append(
            StageArrays(
                np.concatenate(coords, axis=0),
                np.concatenate(owner, axis=0),
                np.concatenate(nbr3, axis=0),
                np.concatenate(down, axis=0) if s > 0 else np.zeros((sum(len(c) for c in coords), 0), np.int32),
                stride,
            )
        )
    return out


def build_pyramid_padded(
    group_coords: List[np.ndarray],
    owners: Sequence[int],
    caps: Sequence[int],
    raster: bool,
) -> Tuple[List[StageArrays], List[int]]:
    """Fused pyramid build for the hot input-pipeline path: per-group
    pyramids -> concatenated per stage -> truncated + padded to ``caps``.

    Exactly ``pad_stage(concat_stages([build_pyramid(c, o, S, raster=r)
    for ...]), cap, prev_cap)`` per stage (a parity test pins this), plus the
    pre-truncation merged row count per stage (the caller's overflow
    accounting).  With the native library present this is ONE C call per
    sample pyramid — merge-join neighbor maps over the raster-sorted rows
    instead of per-stage hash probes, and no intermediate numpy arrays.
    """
    num_stages = len(caps)
    if _NATIVE is not None:
        g = len(group_coords)
        if g:
            flat = np.ascontiguousarray(
                np.concatenate(group_coords, axis=0), dtype=np.int32
            )
        else:
            flat = np.zeros((0, 3), np.int32)
        group_off = np.zeros(g + 1, np.int64)
        np.cumsum([len(c) for c in group_coords], out=group_off[1:])
        owners_a = np.asarray(list(owners), np.int32)
        caps_a = np.asarray(list(caps), np.int64)
        total = int(caps_a.sum())
        out_coords = np.empty((total, 3), np.int32)
        out_owner = np.empty(total, np.int32)
        out_nbr3 = np.empty((total, 27), np.int32)
        out_down = np.empty((total, 8), np.int32)
        out_counts = np.empty(num_stages, np.int64)
        _NATIVE.ir_pyramid(
            flat, group_off, owners_a, g, num_stages, caps_a,
            1 if raster else 0, out_coords, out_owner, out_nbr3, out_down,
            out_counts,
        )
        stages = []
        lo = 0
        for s, cap in enumerate(caps):
            hi = lo + cap
            down = (
                out_down[lo:hi]
                if s > 0
                else np.zeros((cap, 0), np.int32)
            )
            stages.append(
                StageArrays(
                    out_coords[lo:hi], out_owner[lo:hi], out_nbr3[lo:hi],
                    down, 1 << s,
                )
            )
            lo = hi
        return stages, [int(c) for c in out_counts]

    groups = [
        build_pyramid(c, owner=o, num_stages=num_stages, raster=raster)
        for c, o in zip(group_coords, owners)
    ]
    merged = concat_stages(groups, num_stages)
    counts = [len(merged[s].coords) for s in range(num_stages)]
    stages = [
        pad_stage(merged[s], caps[s], caps[s - 1] if s > 0 else None)
        for s in range(num_stages)
    ]
    return stages, counts


def pad_stage(stage: StageArrays, cap: int, prev_cap: Optional[int]) -> StageArrays:
    """Pad (or truncate) a per-sample stage to exactly ``cap`` rows."""
    stage = _truncate_stage(stage, cap, prev_cap)
    n = len(stage.coords)
    pad = cap - n
    if pad == 0:
        return stage
    coords = np.concatenate([stage.coords, np.zeros((pad, 3), np.int32)])
    owner = np.concatenate([stage.owner, np.full((pad,), -1, np.int32)])
    nbr3 = np.concatenate([stage.nbr3, np.full((pad, 27), -1, np.int32)])
    down_w = stage.down.shape[1]
    down = np.concatenate([stage.down, np.full((pad, down_w), -1, np.int32)])
    return StageArrays(coords, owner, nbr3, down, stage.stride)
