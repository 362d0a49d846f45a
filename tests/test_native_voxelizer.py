"""C++ voxelizer must be bit-identical to the numpy reference implementation."""

import numpy as np
import pytest

from instancerefer_tpu.ops import voxelize as V

pytestmark = pytest.mark.skipif(
    not V.native_available(), reason="native voxelizer not built"
)


def _numpy_quantize(xyz, feats, vs):
    coords = np.floor(xyz / vs).astype(np.int32)
    keys = V.pack_coords(coords)
    _, first = np.unique(keys, return_index=True)
    first.sort()
    return coords[first], feats[first]


def _numpy_nbr3(coords, stride):
    keys = V.pack_coords(coords)
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    out = np.empty((len(coords), 27), np.int32)
    for k, off in enumerate(V.KERNEL_OFFSETS_3):
        q = V.pack_coords(coords + off[None, :] * stride)
        out[:, k] = V._lookup(sorted_keys, order, q)
    return out


def _numpy_downsample(coords, stride):
    new_stride = stride * 2
    down_coords = (coords // new_stride) * new_stride
    keys = V.pack_coords(down_coords)
    _, first = np.unique(keys, return_index=True)
    first.sort()
    out_coords = down_coords[first]
    in_keys = V.pack_coords(coords)
    order = np.argsort(in_keys, kind="stable")
    sorted_keys = in_keys[order]
    down = np.empty((len(out_coords), 8), np.int32)
    for k, off in enumerate(V.KERNEL_OFFSETS_2):
        q = V.pack_coords(out_coords + off[None, :] * stride)
        down[:, k] = V._lookup(sorted_keys, order, q)
    return out_coords, down


def test_native_quantize_identical(rng):
    xyz = rng.uniform(-5, 5, size=(3000, 3))
    feats = rng.normal(size=(3000, 7)).astype(np.float32)
    c_native, f_native = V.quantize(xyz, feats, 0.05)
    c_np, f_np = _numpy_quantize(xyz, feats, 0.05)
    np.testing.assert_array_equal(c_native, c_np)
    np.testing.assert_array_equal(f_native, f_np)


@pytest.mark.parametrize("stride", [1, 2, 4])
def test_native_nbr3_identical(rng, stride):
    base = np.unique(rng.integers(-8, 8, size=(400, 3)).astype(np.int32), axis=0)
    coords = base * stride
    np.testing.assert_array_equal(V.build_nbr3(coords, stride), _numpy_nbr3(coords, stride))


@pytest.mark.parametrize("stride", [1, 2])
def test_native_downsample_identical(rng, stride):
    base = np.unique(rng.integers(-8, 8, size=(500, 3)).astype(np.int32), axis=0)
    coords = base * stride
    oc_n, dn_n = V.build_downsample(coords, stride)
    oc_p, dn_p = _numpy_downsample(coords, stride)
    np.testing.assert_array_equal(oc_n, oc_p)
    np.testing.assert_array_equal(dn_n, dn_p)


def test_native_negative_coords(rng):
    coords = rng.integers(-50, 50, size=(300, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    np.testing.assert_array_equal(V.build_nbr3(coords, 1), _numpy_nbr3(coords, 1))
    oc_n, dn_n = V.build_downsample(coords, 1)
    oc_p, dn_p = _numpy_downsample(coords, 1)
    np.testing.assert_array_equal(oc_n, oc_p)
    np.testing.assert_array_equal(dn_n, dn_p)


def _numpy_band_starts(nbr, chunk, window, subwin, v_in, align=16,
                       count_drops=False, block=0):
    """The pure-numpy reference of compute_offset_window_starts."""
    v_out, k = nbr.shape
    n = v_out // chunk
    big = np.iinfo(np.int32).max
    blk = nbr[: n * chunk].reshape(n, chunk, k)
    masked = np.where(blk >= 0, blk, big)
    lo_k = masked.min(axis=1)
    lo_global = lo_k.min(axis=1)
    empty = lo_global == big
    lo = np.where(empty, 0, lo_global)
    lo = (lo // align) * align
    ws = np.clip(lo, 0, max(v_in - window, 0)).astype(np.int32)
    if block:
        blk_lo = (np.arange(n) * chunk // block) * block
        ws = np.clip(ws, blk_lo, blk_lo + block - window).astype(np.int32)
    lo_k = np.where(lo_k == big, ws[:, None], lo_k)
    wsk = (lo_k // align) * align
    wsk = np.clip(wsk, ws[:, None], (ws + window - subwin)[:, None]).astype(np.int32)
    ws = np.where(empty, -1, ws).astype(np.int32)
    wsk_t = np.ascontiguousarray(wsk.T)
    if not count_drops:
        return ws, wsk_t
    valid = blk >= 0
    local = blk - wsk[:, None, :]
    ok = valid & (local >= 0) & (local < subwin)
    if k == 27:
        # center-offset fast-path rule: all-or-nothing chunks count fully
        diag = np.arange(n) * chunk
        bad = (ws >= 0) & ~((diag >= ws) & (diag + chunk <= ws + window))
        if bad.any():
            ok[bad, :, 13] = False
    total = int(valid.sum())
    return ws, wsk_t, total - int(ok.sum()), total


@pytest.mark.parametrize("block", [0, 512])
def test_native_band_starts_identical(rng, block):
    if not V.native_available():
        pytest.skip("native lib unavailable")
    # two samples of 512 rows with an all-padding hole in the middle
    nbr = rng.integers(-1, 512, size=(1024, 27)).astype(np.int32)
    # make rows sample-local like the pipeline (second block offsets by 512)
    nbr[512:] = np.where(nbr[512:] >= 0, nbr[512:] + 512, -1)
    nbr[256:384] = -1  # padding chunk(s)
    chunk, window, subwin = 128, 512, 256
    got = V.compute_offset_window_starts(
        nbr, chunk, window, subwin, 1024, count_drops=True, block=block
    )
    want = _numpy_band_starts(
        nbr, chunk, window, subwin, 1024, count_drops=True, block=block
    )
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    assert got[2] == want[2] and got[3] == want[3]


def test_native_invert_down_identical(rng):
    if not V.native_available():
        pytest.skip("native lib unavailable")
    coords = np.unique(rng.integers(-8, 8, size=(500, 3)).astype(np.int32), axis=0)
    _, down = V.build_downsample(coords, 1)
    got = V.invert_down(down, len(coords))
    up_row = np.full(len(coords), -1, np.int32)
    up_k = np.full(len(coords), -1, np.int32)
    vv, kk = np.nonzero(down >= 0)
    tgt = down[vv, kk]
    up_row[tgt] = vv.astype(np.int32)
    up_k[tgt] = kk.astype(np.int32)
    np.testing.assert_array_equal(got[0], up_row)
    np.testing.assert_array_equal(got[1], up_k)


def test_center_misaligned_chunks_counted_as_dropped(rng):
    """The kernels' center-offset (k=13 identity) fast path zeroes a whole
    chunk's center contribution when the window cannot hold the chunk's
    diagonal; the drop counter must count ALL its live center entries so the
    zero-drop invariant protecting the fast path stays sound (native and
    numpy paths agree)."""
    v, chunk, window, subwin = 512, 64, 128, 64
    nbr = np.full((v, 27), -1, np.int32)
    nbr[:, 13] = np.arange(v)  # identity center (subm semantics)
    # chunk 3 (rows 192..255): a far-back neighbor pulls ws to 0, and the
    # window [0, 128) cannot hold the diagonal -> all 64 center rows must
    # count as dropped even though the one-hot band would keep none/some
    nbr[192, 0] = 0
    res = V.compute_offset_window_starts(
        nbr, chunk, window, subwin, v, count_drops=True
    )
    ws, wsk_t, dropped, total = res
    assert ws[3] == 0  # pulled back by the far neighbor
    assert dropped >= 64  # every center row of chunk 3
    if V.native_available():
        V2 = V._NATIVE
        V._NATIVE = None
        try:
            py = V.compute_offset_window_starts(
                nbr, chunk, window, subwin, v, count_drops=True
            )
        finally:
            V._NATIVE = V2
        np.testing.assert_array_equal(ws, py[0])
        np.testing.assert_array_equal(wsk_t, py[1])
        assert dropped == py[2] and total == py[3]


def _numpy_pyramid_padded(group_coords, owners, caps, raster):
    """Reference chain: build_pyramid per group -> concat -> pad_stage."""
    groups = [
        V.build_pyramid(c, owner=o, num_stages=len(caps), raster=raster)
        for c, o in zip(group_coords, owners)
    ]
    merged = V.concat_stages(groups, len(caps))
    counts = [len(merged[s].coords) for s in range(len(caps))]
    stages = [
        V.pad_stage(merged[s], caps[s], caps[s - 1] if s else None)
        for s in range(len(caps))
    ]
    return stages, counts


@pytest.mark.parametrize("raster", [True, False])
@pytest.mark.parametrize("caps", [(256, 128, 64, 32, 16), (64, 32, 16, 16, 16)])
def test_native_pyramid_identical(rng, raster, caps):
    """The fused ir_pyramid (merge-join neighbor maps, in-C++ truncation and
    padding) must be bit-identical to the numpy build_pyramid -> concat ->
    pad_stage chain, including cap truncation turning refs into -1."""
    group_coords = []
    for _ in range(int(rng.integers(1, 5))):
        npts = int(rng.integers(50, 1500))
        xyz = rng.normal(scale=2.0, size=(npts, 3)) + rng.normal(scale=5, size=3)
        coords, _ = V.quantize(xyz, xyz, 0.05, raster_order=raster)
        group_coords.append(coords)
    owners = list(range(len(group_coords)))
    got_stages, got_counts = V.build_pyramid_padded(
        group_coords, owners, caps, raster
    )
    saved = V._NATIVE
    V._NATIVE = None
    try:
        want_stages, want_counts = _numpy_pyramid_padded(
            group_coords, owners, caps, raster
        )
    finally:
        V._NATIVE = saved
    assert got_counts == want_counts
    for s in range(len(caps)):
        a, b = got_stages[s], want_stages[s]
        np.testing.assert_array_equal(a.coords, b.coords, err_msg=f"coords s{s}")
        np.testing.assert_array_equal(a.owner, b.owner, err_msg=f"owner s{s}")
        np.testing.assert_array_equal(a.nbr3, b.nbr3, err_msg=f"nbr3 s{s}")
        if s:
            np.testing.assert_array_equal(a.down, b.down, err_msg=f"down s{s}")


def test_native_pyramid_empty_groups():
    """num_cand < 2 path: no groups -> all stages pure padding, zero counts."""
    caps = (32, 16, 16)
    stages, counts = V.build_pyramid_padded([], [], caps, raster=True)
    assert counts == [0, 0, 0]
    for s, cap in enumerate(caps):
        assert stages[s].coords.shape == (cap, 3)
        assert (stages[s].owner == -1).all()
        assert (stages[s].nbr3 == -1).all()


def test_native_pyramid_boundary_clip_falls_back(rng):
    """Coords near the ±8191 packing boundary disable the merge join (clipped
    neighbor keys would alias); the hash fallback must keep native == numpy."""
    coords = np.unique(
        rng.integers(8150, 8191, size=(200, 3)).astype(np.int32), axis=0
    )
    order = np.argsort(V.pack_coords(coords), kind="stable")
    coords = coords[order]
    caps = (128, 64, 32)
    got_stages, got_counts = V.build_pyramid_padded([coords], [0], caps, True)
    saved = V._NATIVE
    V._NATIVE = None
    try:
        want_stages, want_counts = _numpy_pyramid_padded([coords], [0], caps, True)
    finally:
        V._NATIVE = saved
    assert got_counts == want_counts
    for s in range(len(caps)):
        np.testing.assert_array_equal(got_stages[s].nbr3, want_stages[s].nbr3)
        if s:
            np.testing.assert_array_equal(got_stages[s].down, want_stages[s].down)


def test_native_unique_raster_identical(rng):
    xyz = rng.uniform(-5, 5, size=(4000, 3))
    feats = rng.normal(size=(4000, 7)).astype(np.float32)
    c_native, f_native = V.quantize(xyz, feats, 0.05, raster_order=True)
    saved = V._NATIVE
    V._NATIVE = None
    try:
        c_np, f_np = V.quantize(xyz, feats, 0.05, raster_order=True)
    finally:
        V._NATIVE = saved
    np.testing.assert_array_equal(c_native, c_np)
    np.testing.assert_array_equal(f_native, f_np)
