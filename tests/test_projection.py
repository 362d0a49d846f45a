"""Multiview projection: geometric correctness of the 2d<->3d correspondence."""

import numpy as np
import pytest

from instancerefer_tpu.data.projection import (
    FrameFeatureFuser,
    ProjectionHelper,
    scannet_projection_helper,
)

INTRINSICS = np.array([[37.01983, 0, 20], [0, 38.52470, 15.5], [0, 0, 1.0]])


@pytest.fixture
def projector():
    return ProjectionHelper(INTRINSICS, 0.1, 4.0, (41, 32), 0.05)


def test_skeleton_roundtrip(projector):
    p = projector.depth_to_skeleton(10, 20, 2.0)
    back = projector.skeleton_to_depth(p)
    np.testing.assert_allclose(back, [10, 20, 2.0], atol=1e-9)


def test_identity_pose_projection(projector):
    """Points placed on the camera axis must project to their own pixels."""
    # build points at known pixels, depth 2.0, camera at origin (identity pose)
    pixels = [(5, 7), (20, 15), (35, 30)]
    pts = np.stack([projector.depth_to_skeleton(u, v, 2.0) for u, v in pixels])
    depth = np.full((32, 41), 2.0, np.float32)
    pose = np.eye(4)
    res = projector.compute_projection(pts, depth, pose)
    assert res is not None
    ind3, ind2 = res
    assert ind3[0] == len(pixels)
    got_pixels = set()
    for i in range(int(ind3[0])):
        lin = int(ind2[1 + i])
        got_pixels.add((lin % 41, lin // 41))
    assert got_pixels == set(pixels)


def test_occlusion_rejects_mismatched_depth(projector):
    pts = np.stack([projector.depth_to_skeleton(20, 15, 2.0)])
    depth = np.full((32, 41), 3.5, np.float32)  # depth map says 3.5, point at 2.0
    res = projector.compute_projection(pts, depth, np.eye(4))
    assert res is None  # |3.5 - 2.0| > accuracy -> no correspondence


def test_frustum_culling_behind_camera(projector):
    pts = np.array([[0.0, 0.0, -2.0]])  # behind the camera
    depth = np.full((32, 41), 2.0, np.float32)
    assert projector.compute_projection(pts, depth, np.eye(4)) is None


def test_camera_pose_transform(projector):
    """A translated camera sees the translated point at the same pixel."""
    offset = np.array([1.0, -2.0, 0.5])
    pose = np.eye(4)
    pose[:3, 3] = offset
    pt_cam = projector.depth_to_skeleton(20, 15, 2.0)
    pts = (pt_cam + offset)[None]
    depth = np.full((32, 41), 2.0, np.float32)
    res = projector.compute_projection(pts, depth, pose)
    assert res is not None and res[0][0] == 1
    lin = int(res[1][1])
    assert (lin % 41, lin // 41) == (20, 15)


def test_project_scatter(projector):
    feat = np.zeros((4, 32, 41), np.float32)
    feat[:, 15, 20] = [1, 2, 3, 4]
    ind3 = np.zeros(11, np.int64)
    ind2 = np.zeros(11, np.int64)
    ind3[0] = ind2[0] = 1
    ind3[1] = 7  # point index
    ind2[1] = 15 * 41 + 20
    out = projector.project(feat, ind3, ind2, 10)
    np.testing.assert_allclose(out[:, 7], [1, 2, 3, 4])
    assert np.abs(out).sum() == 10.0


def test_fuser_maxpool_keeps_negatives():
    """maxpool must only pool over covering frames (negatives survive)."""
    fuser = FrameFeatureFuser(3, 2, "maxpool")
    a = np.zeros((3, 2), np.float32)
    a[0] = [-1.0, -2.0]  # frame A covers point 0 with negative features
    fuser.add(a)
    b = np.zeros((3, 2), np.float32)
    b[1] = [5.0, 6.0]  # frame B covers point 1 only
    fuser.add(b)
    out = fuser.result()
    np.testing.assert_allclose(out[0], [-1.0, -2.0])  # not clipped to 0
    np.testing.assert_allclose(out[1], [5.0, 6.0])
    np.testing.assert_allclose(out[2], [0.0, 0.0])
    # overlapping coverage max-pools
    c = np.zeros((3, 2), np.float32)
    c[0] = [-0.5, -3.0]
    fuser.add(c)
    np.testing.assert_allclose(fuser.result()[0], [-0.5, -2.0])


def test_fuser_first_hit():
    fuser = FrameFeatureFuser(2, 2, "first")
    a = np.zeros((2, 2), np.float32)
    a[0] = [1, 1]
    fuser.add(a)
    b = np.ones((2, 2), np.float32) * 9
    fuser.add(b)
    out = fuser.result()
    np.testing.assert_allclose(out[0], [1, 1])  # first frame wins
    np.testing.assert_allclose(out[1], [9, 9])


def test_scannet_projection_helper_scaling():
    p = scannet_projection_helper()
    # fx scaled by 41/640
    np.testing.assert_allclose(p.intrinsic[0][0], 577.870605 * 41 / 640, rtol=1e-6)
