"""Multiview 2D<->3D projection: frustum culling + pixel correspondence + fusion.

Port of reference ``lib/projection.py`` (``ProjectionHelper``) with the same
mathematical semantics, vectorized in numpy (this is offline preprocessing:
per SURVEY.md §2.3 N11 the multiview chain is a host-side batch job; the
per-frame feature back-projection itself is a trivial gather/scatter).

Key semantics preserved:

* frustum corners from min/max-depth image corners through the intrinsics
  (``:29-47``), inward normals of the 6 planes (``:79-120``), and the
  round(x*100)/100 < 0 half-space test (``:122-155``),
* world->camera->pixel projection with rounding and bounds check
  (``:224-238``), the ``|depth(pixel) - z| <= accuracy`` occlusion test
  (``:240-244``),
* index arrays in the reference's layout: element 0 holds the count
  (``:249-254``),
* ``project``: scatter pixel features onto point indices (``:258-279``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class ProjectionHelper:
    def __init__(self, intrinsic, depth_min, depth_max, image_dims, accuracy):
        self.intrinsic = np.asarray(intrinsic, dtype=np.float64)
        self.depth_min = depth_min
        self.depth_max = depth_max
        self.image_dims = image_dims  # (W, H) — reference convention
        self.accuracy = accuracy
        self.corner_points = self._compute_corner_points()

    def depth_to_skeleton(self, ux, uy, depth):
        x = (ux - self.intrinsic[0][2]) / self.intrinsic[0][0]
        y = (uy - self.intrinsic[1][2]) / self.intrinsic[1][1]
        return np.array([depth * x, depth * y, depth])

    def skeleton_to_depth(self, p):
        x = (p[0] * self.intrinsic[0][0]) / p[2] + self.intrinsic[0][2]
        y = (p[1] * self.intrinsic[1][1]) / p[2] + self.intrinsic[1][2]
        return np.array([x, y, p[2]])

    def _compute_corner_points(self):
        w, h = self.image_dims
        corners = np.ones((8, 4))
        for i, (ux, uy, d) in enumerate(
            [
                (0, 0, self.depth_min), (w - 1, 0, self.depth_min),
                (w - 1, h - 1, self.depth_min), (0, h - 1, self.depth_min),
                (0, 0, self.depth_max), (w - 1, 0, self.depth_max),
                (w - 1, h - 1, self.depth_max), (0, h - 1, self.depth_max),
            ]
        ):
            corners[i, :3] = self.depth_to_skeleton(ux, uy, d)
        return corners

    def compute_frustum_corners(self, camera_to_world):
        return (np.asarray(camera_to_world) @ self.corner_points.T).T  # [8, 4]

    def compute_frustum_normals(self, corner_coords):
        c = corner_coords[:, :3]
        normals = np.empty((6, 3))
        normals[0] = np.cross(c[3] - c[0], c[1] - c[0])  # front
        normals[1] = np.cross(c[2] - c[1], c[5] - c[1])  # right
        normals[2] = np.cross(c[3] - c[2], c[6] - c[2])  # roof
        normals[3] = np.cross(c[0] - c[3], c[7] - c[3])  # left
        normals[4] = np.cross(c[1] - c[0], c[4] - c[0])  # bottom
        normals[5] = np.cross(c[6] - c[5], c[4] - c[5])  # back
        return normals

    def points_in_frustum(self, corner_coords, normals, points, return_mask=True):
        """Half-space test with the reference's round-to-2-decimals tolerance."""
        p1 = points - corner_coords[2, :3]
        p2 = points - corner_coords[4, :3]
        mask = np.ones(len(points), dtype=bool)
        for k in range(6):
            ref = p1 if k < 3 else p2
            dot = np.round(ref @ normals[k] * 100) / 100
            mask &= dot < 0
        return mask if return_mask else int(mask.sum())

    def compute_projection(
        self, points: np.ndarray, depth: np.ndarray, camera_to_world: np.ndarray
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """3d<->2d correspondence; returns (indices_3d, indices_2d) or None.

        Layout matches the reference: arrays of length num_points+1 whose
        first element is the correspondence count.
        """
        num_points = len(points)
        world_to_camera = np.linalg.inv(camera_to_world)

        corner_coords = self.compute_frustum_corners(camera_to_world)
        normals = self.compute_frustum_normals(corner_coords)
        mask = self.points_in_frustum(corner_coords, normals, points)
        if not mask.any():
            return None
        ind_points = np.flatnonzero(mask)

        coords = np.ones((4, len(ind_points)))
        coords[:3] = points[ind_points].T
        camera = world_to_camera @ coords
        px = np.round(
            camera[0] * self.intrinsic[0][0] / camera[2] + self.intrinsic[0][2]
        ).astype(np.int64)
        py = np.round(
            camera[1] * self.intrinsic[1][1] / camera[2] + self.intrinsic[1][2]
        ).astype(np.int64)

        w, h = self.image_dims
        valid = (px >= 0) & (py >= 0) & (px < w) & (py < h)
        if not valid.any():
            return None
        image_ind = py[valid] * w + px[valid]
        depth_vals = depth.reshape(-1)[image_ind]
        z = camera[2][valid]
        depth_mask = (
            (depth_vals >= self.depth_min)
            & (depth_vals <= self.depth_max)
            & (np.abs(depth_vals - z) <= self.accuracy)
        )
        if not depth_mask.any():
            return None

        ind_update = ind_points[valid][depth_mask]
        indices_3d = np.zeros(num_points + 1, dtype=np.int64)
        indices_2d = np.zeros(num_points + 1, dtype=np.int64)
        n = len(ind_update)
        indices_3d[0] = n
        indices_2d[0] = n
        indices_3d[1 : 1 + n] = ind_update
        indices_2d[1 : 1 + n] = image_ind[depth_mask]
        return indices_3d, indices_2d

    def project(self, label, lin_indices_3d, lin_indices_2d, num_points):
        """Back-project 2D features/labels onto points (``:258-279``).

        label: [C, H, W] (or [H, W]); returns [C, num_points] with zeros where
        no correspondence exists.
        """
        label = np.asarray(label)
        if label.ndim == 2:
            label = label[None]
        c = label.shape[0]
        output = np.zeros((c, num_points), dtype=label.dtype)
        n = int(lin_indices_3d[0])
        if n > 0:
            vals = label.reshape(c, -1)[:, lin_indices_2d[1 : 1 + n]]
            output[:, lin_indices_3d[1 : 1 + n]] = vals
        return output


# ScanNet frame intrinsics used by the reference multiview scripts
# (scripts/project_multiview_features.py:28-29)
def scannet_projection_helper(
    image_dims=(41, 32), depth_min=0.1, depth_max=4.0, accuracy=0.05
) -> ProjectionHelper:
    """Intrinsics of the 328x256 ScanNet frames scaled to the feature/depth
    resolution (fx=fy=577.87 at 640x480 -> scaled), matching the constants
    the reference computes via ``adjust_intrinsic``."""
    # 640x480 intrinsics
    intrinsic = np.array(
        [[577.870605, 0.0, 319.5], [0.0, 577.870605, 239.5], [0.0, 0.0, 1.0]]
    )
    # scale to image_dims
    sx = image_dims[0] / 640.0
    sy = image_dims[1] / 480.0
    out = intrinsic.copy()
    out[0, 0] *= sx
    out[0, 2] = (out[0, 2] + 0.5) * sx - 0.5
    out[1, 1] *= sy
    out[1, 2] = (out[1, 2] + 0.5) * sy - 0.5
    return ProjectionHelper(out, depth_min, depth_max, image_dims, accuracy)


class FrameFeatureFuser:
    """Incremental per-frame fusion with the reference's exact overlap policies
    (``scripts/project_multiview_features.py:180-213``).

    ``maxpool``: a point not yet covered takes the frame's features; a point
    covered by both takes the elementwise max (only over *covering* frames —
    an uncovered frame's zeros never clip negative features).
    ``first``: first covering frame wins ("covered" = any nonzero channel).
    """

    def __init__(self, num_points: int, num_channels: int, mode: str = "maxpool"):
        if mode not in ("maxpool", "first"):
            raise ValueError(f"unknown fusion mode {mode!r}")
        self.mode = mode
        self.point_features = np.zeros((num_points, num_channels), np.float32)
        self._first = True

    def add(self, proj_feat: np.ndarray):
        """proj_feat: [N, C] back-projected features of one frame."""
        c = proj_feat.shape[1]
        if self.mode == "maxpool":
            feat_mask = (proj_feat == 0).sum(1) != c  # covered by this frame
            point_mask = (self.point_features == 0).sum(1) == c  # still empty
            fill = point_mask & feat_mask
            self.point_features[fill] = proj_feat[fill]
            pool = ~point_mask & feat_mask
            self.point_features[pool] = np.maximum(
                self.point_features[pool], proj_feat[pool]
            )
        else:
            if self._first:
                self.point_features = proj_feat.astype(np.float32).copy()
            else:
                mask = (self.point_features == 0).sum(1) == c
                self.point_features[mask] = proj_feat[mask]
        self._first = False

    def result(self) -> np.ndarray:
        return self.point_features
