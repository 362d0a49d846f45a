"""Point-cloud utilities: rotations, sampling, PLY/OBJ mesh writers.

Capability port of reference ``utils/pc_utils.py`` (C14 in SURVEY.md §2.1):
rotation matrices, random sampling, and the visualization writers the
reference uses for manual inspection (``write_ply``, ``write_ply_rgb``,
``write_bbox``, OBJ dumps).  Writers are dependency-free (no plyfile/trimesh):
they emit standard ascii PLY / OBJ.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np


# ---------------------------------------------------------------------------
# rotations (utils/pc_utils.py rotx/roty/rotz)
# ---------------------------------------------------------------------------

def rotx(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def roty(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotz(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def random_sampling(pc: np.ndarray, num_sample: int, replace: Optional[bool] = None,
                    return_choices: bool = False, rng=None):
    """utils/pc_utils.py:32-40 semantics (module-level RNG unless given)."""
    rng = rng or np.random
    if replace is None:
        replace = pc.shape[0] < num_sample
    choices = rng.choice(pc.shape[0], num_sample, replace=replace)
    if return_choices:
        return pc[choices], choices
    return pc[choices]


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def write_ply(points: np.ndarray, filename: str, text: bool = True):
    """Write xyz points to an ascii PLY."""
    points = np.asarray(points)
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in points:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def write_ply_rgb(points: np.ndarray, colors: np.ndarray, filename: str):
    """Write colored points to an ascii PLY (colors uint8 0-255)."""
    points = np.asarray(points)
    colors = np.asarray(colors).astype(np.uint8)
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(points, colors):
            f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")


def write_obj(points: np.ndarray, faces: Optional[np.ndarray], filename: str,
              colors: Optional[np.ndarray] = None):
    """OBJ dump (data/scannet/visualize.py capability)."""
    with open(filename, "w") as f:
        for i, p in enumerate(np.asarray(points)):
            if colors is not None:
                c = colors[i]
                f.write(f"v {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        if faces is not None:
            for face in np.asarray(faces):
                f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")


_BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]

_BOX_FACES = [
    (0, 1, 2), (0, 2, 3), (4, 6, 5), (4, 7, 6),
    (0, 4, 5), (0, 5, 1), (1, 5, 6), (1, 6, 2),
    (2, 6, 7), (2, 7, 3), (3, 7, 4), (3, 4, 0),
]


def construct_bbox_corners(center, box_size):
    """utils/util.py:21-32 corner ordering."""
    cx, cy, cz = center
    sx, sy, sz = box_size
    x = [cx - sx / 2, cx + sx / 2]
    y = [cy - sy / 2, cy + sy / 2]
    z = [cz - sz / 2, cz + sz / 2]
    order = [
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    ]
    return np.array([[x[i], y[j], z[k]] for i, j, k in order])


def write_bbox(obbs: np.ndarray, filename: str):
    """Write axis-aligned obb boxes ([K, 7] cx..dz,heading) as an OBJ mesh
    (capability of utils/pc_utils.py write_bbox/write_oriented_bbox; ScanNet
    headings are always 0)."""
    verts = []
    faces = []
    for k, obb in enumerate(np.asarray(obbs).reshape(-1, 7)):
        corners = construct_bbox_corners(obb[:3], obb[3:6])
        base = len(verts)
        verts.extend(corners.tolist())
        faces.extend([(a + base, b + base, c + base) for a, b, c in _BOX_FACES])
    write_obj(np.array(verts), np.array(faces), filename)


def point_cloud_to_bev(points: np.ndarray, xy_min, xy_max, resolution: int = 64):
    """Occupancy BEV image from points (volume/image conversion capability)."""
    xy = points[:, :2]
    grid = np.zeros((resolution, resolution), np.float32)
    scale = (np.asarray(xy_max) - np.asarray(xy_min)) / resolution
    idx = np.floor((xy - np.asarray(xy_min)) / np.maximum(scale, 1e-9)).astype(int)
    ok = ((idx >= 0) & (idx < resolution)).all(1)
    np.add.at(grid, (idx[ok, 0], idx[ok, 1]), 1.0)
    return grid
