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
