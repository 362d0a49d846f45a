"""Voxelize / kernel-map construction vs brute force."""

import numpy as np
import pytest

from instancerefer_tpu.ops import voxelize as V


def brute_quantize(xyz, feats, vs):
    coords = np.floor(xyz / vs).astype(np.int32)
    seen = {}
    keep = []
    for i, c in enumerate(map(tuple, coords)):
        if c not in seen:
            seen[c] = i
            keep.append(i)
    keep = np.array(keep)
    return coords[keep], feats[keep]


def test_quantize_matches_bruteforce(rng):
    xyz = rng.uniform(-3, 3, size=(500, 3))
    feats = rng.normal(size=(500, 7)).astype(np.float32)
    c1, f1 = V.quantize(xyz, feats, 0.05)
    c2, f2 = brute_quantize(xyz, feats, 0.05)
    # same voxel set
    assert set(map(tuple, c1)) == set(map(tuple, c2))
    # first-occurrence feature selection: map voxel -> feat must agree
    m1 = {tuple(c): tuple(f) for c, f in zip(c1, f1)}
    m2 = {tuple(c): tuple(f) for c, f in zip(c2, f2)}
    assert m1 == m2


def test_nbr3_bruteforce(rng):
    coords = np.unique(rng.integers(-4, 4, size=(80, 3)).astype(np.int32), axis=0)
    nbr = V.build_nbr3(coords, stride=1)
    lut = {tuple(c): i for i, c in enumerate(coords)}
    for i, c in enumerate(coords):
        for k, off in enumerate(V.KERNEL_OFFSETS_3):
            expect = lut.get(tuple(c + off), -1)
            assert nbr[i, k] == expect


def test_nbr3_respects_stride(rng):
    base = np.unique(rng.integers(-4, 4, size=(40, 3)).astype(np.int32), axis=0) * 2
    nbr = V.build_nbr3(base, stride=2)
    lut = {tuple(c): i for i, c in enumerate(base)}
    for i, c in enumerate(base):
        for k, off in enumerate(V.KERNEL_OFFSETS_3):
            assert nbr[i, k] == lut.get(tuple(c + off * 2), -1)


def test_downsample_bruteforce(rng):
    coords = np.unique(rng.integers(-6, 6, size=(120, 3)).astype(np.int32), axis=0)
    out_coords, down = V.build_downsample(coords, stride=1)
    # output coords are unique floor(c/2)*2
    expect = np.unique((coords // 2) * 2, axis=0)
    assert set(map(tuple, out_coords)) == set(map(tuple, expect))
    lut = {tuple(c): i for i, c in enumerate(coords)}
    for i, oc in enumerate(out_coords):
        for k, off in enumerate(V.KERNEL_OFFSETS_2):
            assert down[i, k] == lut.get(tuple(oc + off), -1)


def test_pyramid_strides_and_caps(rng):
    xyz = rng.uniform(0, 2, size=(600, 3))
    coords, _ = V.quantize(xyz, xyz.astype(np.float32), 0.02)
    stages = V.build_pyramid(coords, owner=3, num_stages=5)
    assert [s.stride for s in stages] == [1, 2, 4, 8, 16]
    for s in stages:
        assert (s.owner == 3).all()
    # each stage's coords are multiples of its stride
    for s in stages[1:]:
        assert (s.coords % s.stride == 0).all()
    # caps truncate and clean dangling references
    capped = V.build_pyramid(coords, owner=0, num_stages=3, caps=[64, 32, 16])
    for s, cap in zip(capped, [64, 32, 16]):
        assert len(s.coords) <= cap
        assert s.nbr3.max(initial=-1) < cap
    assert capped[1].down.max(initial=-1) < 64
    assert capped[2].down.max(initial=-1) < 32


def test_concat_and_pad(rng):
    groups = []
    for g in range(3):
        xyz = rng.uniform(0, 1, size=(50, 3))
        coords, _ = V.quantize(xyz, xyz.astype(np.float32), 0.05)
        groups.append(V.build_pyramid(coords, owner=g, num_stages=2))
    merged = V.concat_stages(groups, num_stages=2)
    total0 = sum(len(g[0].coords) for g in groups)
    assert len(merged[0].coords) == total0
    # neighbor offsets stay within each group's block
    off = 0
    for g in groups:
        n = len(g[0].coords)
        blk = merged[0].nbr3[off : off + n]
        valid = blk[blk >= 0]
        assert ((valid >= off) & (valid < off + n)).all()
        off += n
    padded = V.pad_stage(merged[0], cap=256, prev_cap=None)
    assert len(padded.coords) == 256
    assert (padded.owner[total0:] == -1).all()
    assert (padded.nbr3[total0:] == -1).all()


def test_invert_down_out_of_range_refs_drop_identically():
    """Out-of-range down refs (an upstream-bug regime) must be dropped the
    same way by the numpy fallback and the C++ voxelizer — silently masked,
    not an IndexError — so both deployments behave identically."""
    down = np.array([[5, -1], [2, 7]], np.int32)  # 5 and 7 >= v_prev
    native = V._NATIVE
    V._NATIVE = None
    try:
        row_np, k_np = V.invert_down(down, 3)
    finally:
        V._NATIVE = native
    assert row_np.tolist() == [-1, -1, 1] and k_np.tolist() == [-1, -1, 0]
    if native is not None:
        row_nat, k_nat = V.invert_down(down, 3)
        np.testing.assert_array_equal(row_nat, row_np)
        np.testing.assert_array_equal(k_nat, k_np)
