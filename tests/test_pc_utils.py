"""Long-tail pc_utils capability tests (reference utils/pc_utils.py:46-537)."""

import numpy as np

from instancerefer_tpu.utils import pc_utils as pu


def test_volume_roundtrip(rng):
    pts = rng.uniform(-0.9, 0.9, size=(50, 3))
    vol = pu.point_cloud_to_volume(pts, vsize=12, radius=1.0)
    assert vol.shape == (12, 12, 12)
    back = pu.volume_to_point_cloud(vol)
    # every occupied voxel appears exactly once
    assert len(back) == int(vol.sum())
    occ = {tuple(v) for v in back.astype(int)}
    loc = ((pts + 1.0) / (2.0 / 12)).astype(int)
    assert occ == {tuple(v) for v in loc}


def test_volume_batch_shapes(rng):
    pcs = rng.uniform(-0.9, 0.9, size=(3, 40, 3))
    flat = pu.point_cloud_to_volume_batch(pcs, vsize=8, flatten=True)
    assert flat.shape == (3, 512)
    vols = pu.point_cloud_to_volume_batch(pcs, vsize=8, flatten=False)
    assert vols.shape == (3, 8, 8, 8, 1)


def test_volume_v2_normalization(rng):
    pts = rng.uniform(-0.9, 0.9, size=(64, 3))
    vol = pu.point_cloud_to_volume_v2(pts, vsize=4, radius=1.0, num_sample=8,
                                      rng=np.random.default_rng(0))
    assert vol.shape == (4, 4, 4, 8, 3)
    # normalized samples lie within half a voxel of their cell center
    assert np.abs(vol).max() <= 0.5 + 1e-6
    batch = pu.point_cloud_to_volume_v2_batch(pts[None], vsize=4, num_sample=8,
                                              rng=np.random.default_rng(0))
    assert batch.shape == (1, 4, 4, 4, 8, 3)


def test_image_converters(rng):
    pts = rng.uniform(-0.9, 0.9, size=(64, 3))
    img = pu.point_cloud_to_image(pts, imgsize=4, num_sample=8,
                                  rng=np.random.default_rng(0))
    assert img.shape == (4, 4, 8, 3)
    # xy are cell-normalized; z passes through unnormalized (reference :177)
    assert np.abs(img[..., :2]).max() <= 0.5 + 1e-6
    batch = pu.point_cloud_to_image_batch(pts[None], imgsize=4, num_sample=8,
                                          rng=np.random.default_rng(0))
    assert batch.shape == (1, 4, 4, 8, 3)


def test_point_cloud_to_bbox(rng):
    pts = rng.uniform(size=(16, 3))
    box = pu.point_cloud_to_bbox(pts)
    assert box.shape == (6,)
    np.testing.assert_allclose(box[:3], (pts.min(0) + pts.max(0)) / 2)
    np.testing.assert_allclose(box[3:], pts.max(0) - pts.min(0))
    boxes = pu.point_cloud_to_bbox(rng.uniform(size=(5, 16, 3)))
    assert boxes.shape == (5, 6)


def test_bbox_corner_dist_measure():
    crnr = pu.construct_bbox_corners([0, 0, 0], [1, 2, 3])
    assert pu.bbox_corner_dist_measure(crnr, crnr) == 1.0
    far = pu.construct_bbox_corners([100, 0, 0], [1, 2, 3])
    assert pu.bbox_corner_dist_measure(crnr, far) == 0.0


def _read_ply_counts(path):
    verts = faces = None
    with open(path) as f:
        for line in f:
            if line.startswith("element vertex"):
                verts = int(line.split()[-1])
            if line.startswith("element face"):
                faces = int(line.split()[-1])
            if line.strip() == "end_header":
                break
    return verts, faces


def test_oriented_bbox_writers(tmp_path, rng):
    boxes = np.zeros((2, 7))
    boxes[:, 3:6] = [[1, 2, 3], [2, 2, 2]]
    boxes[0, 6] = np.pi / 4
    out = str(tmp_path / "obb.ply")
    pu.write_oriented_bbox(boxes, out)
    v, f = _read_ply_counts(out)
    assert (v, f) == (16, 24)
    out2 = str(tmp_path / "obb_cam.ply")
    pu.write_oriented_bbox_camera_coord(boxes, out2)
    assert _read_ply_counts(out2) == (16, 24)


def test_oriented_bbox_rotation_geometry(tmp_path):
    """A 90-degree Z heading swaps the box's x/y extents."""
    box = np.array([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, np.pi / 2]])
    out = str(tmp_path / "rot.ply")
    pu.write_oriented_bbox(box, out)
    verts = []
    with open(out) as fh:
        lines = fh.read().splitlines()
    start = lines.index("end_header") + 1
    for line in lines[start : start + 8]:
        verts.append([float(x) for x in line.split()])
    verts = np.array(verts)
    ext = verts.max(0) - verts.min(0)
    np.testing.assert_allclose(ext, [1.0, 2.0, 1.0], atol=1e-6)


def test_write_lines_as_cylinders(tmp_path, rng):
    pcl = rng.normal(size=(3, 2, 3))
    base = str(tmp_path / "lines")
    pu.write_lines_as_cylinders(pcl, base, rad=0.01, res=8)
    v, f = _read_ply_counts(base + ".ply")
    assert (v, f) == (3 * 16, 3 * 16)


def test_write_ply_color(tmp_path, rng):
    pts = rng.normal(size=(10, 3))
    labels = np.arange(10) % 3
    out = str(tmp_path / "colored.ply")
    pu.write_ply_color(pts, labels, out, num_classes=4)
    v, _ = _read_ply_counts(out)
    assert v == 10


def test_rotate_helpers(rng):
    pts = rng.normal(size=(20, 3))
    rot, mat = pu.rotate_point_cloud(pts.copy(), rng=np.random.default_rng(1))
    # centroid-preserving rigid rotation
    np.testing.assert_allclose(rot.mean(0), pts.mean(0), atol=1e-9)
    np.testing.assert_allclose(mat @ mat.T, np.eye(3), atol=1e-12)
    pc = pts.copy()
    out = pu.rotate_pc_along_y(pc, np.pi / 2)
    # y untouched; xz rotated
    np.testing.assert_allclose(out[:, 1], pts[:, 1])
    np.testing.assert_allclose(
        np.linalg.norm(out[:, [0, 2]], axis=1),
        np.linalg.norm(pts[:, [0, 2]], axis=1),
    )
