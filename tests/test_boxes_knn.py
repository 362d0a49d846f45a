"""Box IoU vs reference numpy semantics; padded kNN vs brute force."""

import jax.numpy as jnp
import numpy as np

from instancerefer_tpu.ops import boxes as B
from instancerefer_tpu.ops.knn import knn_padded


def ref_box3d_iou(c1, c2):
    """Verbatim semantics of utils/box_util.py:120-133 on corner arrays."""
    mn1, mx1 = c1.min(0), c1.max(0)
    mn2, mx2 = c2.min(0), c2.max(0)
    lo = np.maximum(mn1, mn2)
    hi = np.minimum(mx1, mx2)
    inter = np.prod(np.maximum(hi - lo, 0))
    v1 = np.prod(mx1 - mn1)
    v2 = np.prod(mx2 - mn2)
    return inter / (v1 + v2 - inter + 1e-8)


def test_iou_matches_reference_corners(rng):
    for _ in range(50):
        obb1 = np.concatenate([rng.normal(size=3), rng.uniform(0.1, 2, 3), [0]]).astype(np.float32)
        obb2 = np.concatenate([rng.normal(size=3), rng.uniform(0.1, 2, 3), [0]]).astype(np.float32)
        c1 = np.asarray(B.get_3d_box_corners(jnp.asarray(obb1)))
        c2 = np.asarray(B.get_3d_box_corners(jnp.asarray(obb2)))
        want = ref_box3d_iou(c1, c2)
        got = float(B.box3d_iou_aabb(jnp.asarray(obb1), jnp.asarray(obb2)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_zero_box_is_miss():
    gt = jnp.array([1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 0.0])
    zero = jnp.zeros(7)
    assert float(B.box3d_iou_aabb(zero, gt)) == 0.0


def test_param2obb(rng):
    mean_size = rng.uniform(0.5, 2.0, size=(18, 3)).astype(np.float32)
    center = rng.normal(size=(4, 3)).astype(np.float32)
    size_class = np.array([0, 3, 17, 5])
    resid = rng.normal(size=(4, 3)).astype(np.float32) * 0.1
    obb = np.asarray(
        B.param2obb(
            jnp.asarray(center),
            jnp.zeros(4, jnp.int32),
            jnp.zeros(4, jnp.int32),
            jnp.asarray(size_class),
            jnp.asarray(resid),
            jnp.asarray(mean_size),
        )
    )
    np.testing.assert_allclose(obb[:, :3], center, rtol=1e-6)
    np.testing.assert_allclose(obb[:, 3:6], mean_size[size_class] + resid, rtol=1e-6)
    assert (obb[:, 6] == 0).all()


def test_knn_padded_bruteforce(rng):
    b, q, m, k = 3, 5, 12, 4
    qx = rng.normal(size=(b, q, 3)).astype(np.float32)
    sx = rng.normal(size=(b, m, 3)).astype(np.float32)
    mask = rng.uniform(size=(b, m)) > 0.3
    mask[:, 0] = True  # at least one valid support per scene
    idx, valid = knn_padded(jnp.asarray(qx), jnp.asarray(sx), jnp.asarray(mask), k)
    idx = np.asarray(idx)
    assert np.asarray(valid).all()
    for bi in range(b):
        vs = np.where(mask[bi])[0]
        for qi in range(q):
            d = np.sum((qx[bi, qi] - sx[bi, vs]) ** 2, axis=-1)
            want = set(vs[np.argsort(d)[:k]]) if len(vs) >= k else set(vs)
            got = set(idx[bi, qi].tolist())
            assert got.issuperset(want) or got == want
            # all returned indices are valid supports
            assert got.issubset(set(vs.tolist()))


def test_knn_fewer_than_k_duplicates_nearest(rng):
    qx = jnp.asarray(rng.normal(size=(1, 2, 3)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(1, 6, 3)).astype(np.float32))
    mask = jnp.array([[True, True, False, False, False, False]])
    idx, valid = knn_padded(qx, sx, mask, k=4)
    assert np.asarray(valid).all()
    assert set(np.asarray(idx).ravel().tolist()).issubset({0, 1})
