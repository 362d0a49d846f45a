"""ScanNet exporter: PLY round-trip, normals, aggregation/segmentation, boxes."""

import json
import os
import struct

import numpy as np
import pytest

from instancerefer_tpu.data import prepare as P


def write_binary_ply(path, verts_xyz, colors, faces):
    n, f = len(verts_xyz), len(faces)
    with open(path, "wb") as fh:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "property uchar alpha\n"
            f"element face {f}\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
        )
        fh.write(header.encode("ascii"))
        for p, c in zip(verts_xyz, colors):
            fh.write(struct.pack("<fffBBBB", p[0], p[1], p[2], c[0], c[1], c[2], 255))
        for face in faces:
            fh.write(struct.pack("<Biii", 3, *face))


@pytest.fixture
def tiny_scene(tmp_path, rng):
    verts = rng.uniform(0, 2, size=(20, 3)).astype(np.float32)
    colors = rng.integers(0, 255, size=(20, 3)).astype(np.uint8)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8], [1, 2, 3]])
    ply = tmp_path / "scene_vh_clean_2.ply"
    write_binary_ply(ply, verts, colors, faces)
    return tmp_path, verts, colors, faces, ply


def test_read_ply_binary(tiny_scene):
    tmp, verts, colors, faces, ply = tiny_scene
    data = P.read_ply(str(ply))
    np.testing.assert_allclose(data["vertex"]["x"], verts[:, 0], rtol=1e-6)
    np.testing.assert_array_equal(data["vertex"]["red"], colors[:, 0])
    np.testing.assert_array_equal(
        np.asarray(data["face"]["vertex_indices"], dtype=np.int64), faces
    )


def test_read_mesh_vertices_rgb_normal(tiny_scene):
    tmp, verts, colors, faces, ply = tiny_scene
    out = P.read_mesh_vertices_rgb_normal(str(ply))
    assert out.shape == (20, 9)
    np.testing.assert_allclose(out[:, :3], verts, rtol=1e-6)
    # normals of vertices on faces are unit-ish; isolated vertices are zero
    norms = np.linalg.norm(out[:, 6:9], axis=1)
    on_face = np.zeros(20, bool)
    on_face[np.unique(faces)] = True
    np.testing.assert_allclose(norms[on_face], 1.0, atol=1e-5)
    np.testing.assert_allclose(norms[~on_face], 0.0, atol=1e-8)


def test_export_scene_end_to_end(tmp_path, rng):
    # build a fake full ScanNet scan directory
    scan = tmp_path / "scene0000_00"
    scan.mkdir()
    n = 30
    verts = rng.uniform(0, 3, size=(n, 3)).astype(np.float32)
    colors = rng.integers(0, 255, size=(n, 3)).astype(np.uint8)
    faces = np.array([[i, i + 1, i + 2] for i in range(0, n - 2, 3)])
    write_binary_ply(scan / "scene0000_00_vh_clean_2.ply", verts, colors, faces)

    # two objects over two segments each
    seg_indices = ([0] * 8 + [1] * 7 + [2] * 8 + [3] * 7)[:n]
    (scan / "scene0000_00_vh_clean_2.0.010000.segs.json").write_text(
        json.dumps({"segIndices": seg_indices})
    )
    (scan / "scene0000_00.aggregation.json").write_text(
        json.dumps(
            {
                "segGroups": [
                    {"objectId": 0, "label": "chair", "segments": [0, 1]},
                    {"objectId": 1, "label": "table", "segments": [2, 3]},
                ]
            }
        )
    )
    (scan / "scene0000_00.txt").write_text(
        "axisAlignment = 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\n"
    )
    tsv = tmp_path / "labels.tsv"
    tsv.write_text(
        "id\traw_category\tcategory\tcount\tnyu40id\teigen13id\tnyuClass\tnyu40class\n"
        "1\tchair\tchair\t10\t5\t4\tchair\tchair\n"
        "2\ttable\ttable\t10\t7\t10\ttable\ttable\n"
    )

    arts = P.export_scene(
        str(scan / "scene0000_00_vh_clean_2.ply"),
        str(scan / "scene0000_00.aggregation.json"),
        str(scan / "scene0000_00_vh_clean_2.0.010000.segs.json"),
        str(scan / "scene0000_00.txt"),
        str(tsv),
    )
    assert arts["vert"].shape == (n, 9)
    # identity alignment -> aligned == raw
    np.testing.assert_allclose(arts["aligned_vert"][:, :3], arts["vert"][:, :3], atol=1e-6)
    # instance 1 covers segments 0,1 -> first 15 verts
    assert set(np.unique(arts["ins_label"][:15])) == {1}
    assert set(np.unique(arts["ins_label"][15:])) == {2}
    assert set(np.unique(arts["sem_label"][:15])) == {5}
    # boxes: [2, 8], classes 5 and 7, object ids 0 and 1
    assert arts["bbox"].shape == (2, 8)
    assert arts["bbox"][0, 6] == 5 and arts["bbox"][1, 6] == 7
    assert arts["bbox"][0, 7] == 0 and arts["bbox"][1, 7] == 1
    # box geometry = min/max of member points
    pc = verts[:15]
    np.testing.assert_allclose(arts["bbox"][0, :3], (pc.min(0) + pc.max(0)) / 2, rtol=1e-5)
    np.testing.assert_allclose(arts["bbox"][0, 3:6], pc.max(0) - pc.min(0), rtol=1e-5)
