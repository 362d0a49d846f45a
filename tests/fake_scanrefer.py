"""Fake on-disk ScanRefer/ScanNet root for end-to-end drives.

Writes the exact directory layout the CLIs expect (reference
``lib/config.py:49-63``; see ``instancerefer_tpu/data/dataset.py`` docstring):
per-scene PointGroup npys, the class-mapping tsv, a tiny GloVe pickle, and
``ScanRefer_filtered_{train,val}.json``.  Used by tests/test_dataset.py-style
unit tests AND the subprocess CLI smoke test (tests/test_cli_e2e.py).
"""

import json
import pickle

import numpy as np


def make_fake_root(root, rng, num_scenes: int = 2, points_per_scene: int = 800):
    """Create the fake tree under ``root`` (a pathlib.Path).  Returns the
    annotation list (same entries for the train and val splits).

    Verts carry 9 columns (xyz + rgb + normals, the ``prepare_data.py``
    layout with normals on — reference ``scannet_utils.py:79-116``) so the
    ``use_normal`` input config is drivable end-to-end; a tiny
    ``enet_feats_maxpool.hdf5`` (per-scene [n, 128] float32, the
    ``project_multiview_features.py`` output layout) backs ``use_multiview``.
    """
    pg = root / "scannet" / "pointgroup_data"
    pg.mkdir(parents=True, exist_ok=True)
    (root / "scannet" / "meta_data").mkdir(parents=True, exist_ok=True)

    import h5py

    mv_h5 = h5py.File(root / "enet_feats_maxpool.hdf5", "w")
    scanrefer = []
    for si in range(num_scenes):
        n = points_per_scene
        scene_id = f"scene{si:04d}_00"
        xyz = rng.uniform(0, 4, size=(n, 3)) + si  # offset scenes apart
        rgb = rng.uniform(0, 255, size=(n, 3))
        nrm = rng.normal(size=(n, 3))
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        verts = np.concatenate([xyz, rgb, nrm], axis=1).astype(np.float32)
        mv_h5.create_dataset(
            scene_id, data=rng.normal(size=(n, 128)).astype(np.float32)
        )
        # 3 instances: two chairs (nyu40 5), one table (nyu40 7)
        ins = np.zeros(n, np.int64)
        sem = np.zeros(n, np.int64)
        ins[0:200] = 1; sem[0:200] = 5
        ins[200:400] = 2; sem[200:400] = 5
        ins[400:600] = 3; sem[400:600] = 7
        boxes = []
        for i in (1, 2, 3):
            pc = xyz[ins == i]
            mn, mx = pc.min(0), pc.max(0)
            boxes.append(
                np.concatenate([(mn + mx) / 2, mx - mn, [5 if i < 3 else 7, i - 1]])
            )
        np.save(pg / f"{scene_id}_aligned_vert.npy", verts)
        np.save(pg / f"{scene_id}_ins_label_pg.npy", ins)
        np.save(pg / f"{scene_id}_sem_label_pg.npy", sem)
        np.save(pg / f"{scene_id}_aligned_bbox.npy", np.stack(boxes))

        scanrefer += [
            {
                "scene_id": scene_id, "object_id": "0", "object_name": "chair",
                "ann_id": "0",
                "token": ["the", "chair", "next", "to", "the", "table"],
                "description": "the chair next to the table",
            },
            {
                "scene_id": scene_id, "object_id": "2", "object_name": "table",
                "ann_id": "0", "token": ["the", "table"],
                "description": "the table",
            },
            {
                "scene_id": scene_id, "object_id": "1", "object_name": "chair",
                "ann_id": "1", "token": ["the", "chair"],
                "description": "the chair",
            },
        ]

    (root / "scannet" / "meta_data" / "scannetv2-labels.combined.tsv").write_text(
        "id\traw_category\tcategory\tcount\tnyu40id\teigen13id\tnyuClass\tnyu40class\n"
        "1\tchair\tchair\t10\t5\t4\tchair\tchair\n"
        "2\ttable\ttable\t10\t7\t10\ttable\ttable\n"
    )
    glove = {
        w: rng.normal(size=300)
        for w in ["the", "chair", "next", "to", "table", "unk"]
    }
    with open(root / "glove.p", "wb") as f:
        pickle.dump(glove, f)
    for split in ("train", "val"):
        with open(root / f"ScanRefer_filtered_{split}.json", "w") as f:
            json.dump(scanrefer, f)
    return scanrefer
