"""Axis-aligned 3D box utilities, jnp-vectorized.

Mirrors the *live* code path of the reference's box math: ScanNet boxes are
axis-aligned (heading always 0, reference ``data/scannet/model_util_scannet.py:134-144``),
so ``get_3d_box`` corners reduce to ``center ± size/2`` and ``box3d_iou`` is the
min/max AABB IoU with a 1e-8 denominator epsilon
(reference ``utils/box_util.py:95-133,154-179``).  The Sutherland–Hodgman /
convex-hull path is dead code in the reference and intentionally not ported.

These run *inside* the jitted step: the reference does IoU target assignment on
host numpy per batch (``lib/loss_helper.py:233-258``) which is one of its
defining CPU bottlenecks; here it is a fully vectorized device op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def obb_to_minmax(obb):
    """[..., 7] (cx,cy,cz,dx,dy,dz,heading=0) -> (min [...,3], max [...,3])."""
    center = obb[..., 0:3]
    half = obb[..., 3:6] * 0.5
    return center - half, center + half


def box3d_iou_aabb(obb1, obb2, eps: float = 1e-8):
    """Axis-aligned IoU between obb param boxes; broadcasts over leading dims.

    Matches ``utils/box_util.py:120-133`` exactly (including the epsilon and
    the zero-box behavior: a degenerate all-zero box yields IoU 0).
    """
    mn1, mx1 = obb_to_minmax(obb1)
    mn2, mx2 = obb_to_minmax(obb2)
    lo = jnp.maximum(mn1, mn2)
    hi = jnp.minimum(mx1, mx2)
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol1 = jnp.prod(mx1 - mn1, axis=-1)
    vol2 = jnp.prod(mx2 - mn2, axis=-1)
    return inter / (vol1 + vol2 - inter + eps)


def get_3d_box_corners(obb):
    """[..., 7] -> [..., 8, 3] corner boxes (heading 0; axis aligned).

    Corner ordering matches ``utils/util.py:21-32`` ``construct_bbox_corners``.
    """
    mn, mx = obb_to_minmax(obb)
    xs = jnp.stack([mn[..., 0], mx[..., 0]], axis=-1)
    ys = jnp.stack([mn[..., 1], mx[..., 1]], axis=-1)
    zs = jnp.stack([mn[..., 2], mx[..., 2]], axis=-1)
    corners = jnp.stack(
        [
            jnp.stack([xs[..., ix], ys[..., iy], zs[..., iz]], axis=-1)
            for ix, iy, iz in [
                (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
            ]
        ],
        axis=-2,
    )
    return corners


def param2obb(center, heading_class, heading_residual, size_class, size_residual, mean_size_arr):
    """Reconstruct obb params from the VoteNet-style codec.

    Mirrors ``data/scannet/model_util_scannet.py:174-181``: heading is always 0
    for ScanNet; size = mean_size_arr[size_class] + size_residual.
    Works for jnp or numpy inputs.
    """
    xp = jnp if isinstance(center, jnp.ndarray) else np
    size = jnp.take(mean_size_arr, size_class, axis=0) + size_residual \
        if xp is jnp else mean_size_arr[size_class] + size_residual
    heading = xp.zeros(center.shape[:-1] + (1,), dtype=center.dtype)
    return xp.concatenate([center, size.astype(center.dtype), heading], axis=-1)


# ---------------------------------------------------------------------------
# numpy variants (host-side data prep / visualization tooling)
# ---------------------------------------------------------------------------

def np_box3d_iou_aabb(obb1, obb2, eps: float = 1e-8):
    mn1 = obb1[..., 0:3] - obb1[..., 3:6] * 0.5
    mx1 = obb1[..., 0:3] + obb1[..., 3:6] * 0.5
    mn2 = obb2[..., 0:3] - obb2[..., 3:6] * 0.5
    mx2 = obb2[..., 0:3] + obb2[..., 3:6] * 0.5
    lo = np.maximum(mn1, mn2)
    hi = np.minimum(mx1, mx2)
    inter = np.prod(np.maximum(hi - lo, 0.0), axis=-1)
    vol1 = np.prod(mx1 - mn1, axis=-1)
    vol2 = np.prod(mx2 - mn2, axis=-1)
    return inter / (vol1 + vol2 - inter + eps)
