"""ScanNet exporter: raw scans + PointGroup outputs -> per-scene npy files.

Capability port of reference ``data/scannet/prepare_data.py`` +
``load_scannet_data.py`` + ``scannet_utils.py`` (C2 in SURVEY.md §2.1),
producing the exact artifact set ``lib/dataset.py`` consumes:

  {scene}_vert.npy            [N, 9]  xyz rgb(0-255) normals
  {scene}_aligned_vert.npy    [N, 9]  axis-aligned via the scene's 4x4 matrix
  {scene}_sem_label.npy       [N]     nyu40 ids (GT)
  {scene}_ins_label.npy       [N]     1..#instances (GT)
  {scene}_sem_label_pg.npy    [N]     nyu40 ids (PointGroup predictions)
  {scene}_ins_label_pg.npy    [N]     1..#instances (PointGroup)
  {scene}_bbox.npy            [K, 8]  cx cy cz dx dy dz nyu40id objid
  {scene}_aligned_bbox.npy    [K, 8]

Self-contained PLY reading (no plyfile dependency): a minimal parser for the
binary-little-endian ScanNet meshes plus per-vertex normal computation by
area-weighted face-normal accumulation.

CLI: python scripts/prepare_data.py --split train --scannet_path ... \
        --pointgroupinst_path ... --output_path ...
"""

from __future__ import annotations

import csv
import json
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

MAX_NUM_POINT = 50000
# exclude wall (1), floor (2), ceiling (22)
OBJ_CLASS_IDS = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 23,
     24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40]
)

_PLY_TYPES = {
    "char": ("b", 1), "int8": ("b", 1),
    "uchar": ("B", 1), "uint8": ("B", 1),
    "short": ("h", 2), "int16": ("h", 2),
    "ushort": ("H", 2), "uint16": ("H", 2),
    "int": ("i", 4), "int32": ("i", 4),
    "uint": ("I", 4), "uint32": ("I", 4),
    "float": ("f", 4), "float32": ("f", 4),
    "double": ("d", 8), "float64": ("d", 8),
}


def read_ply(path: str):
    """Minimal PLY reader (ascii + binary_little_endian) for mesh files.

    Returns {element_name: {prop_name: np.ndarray}}; list properties (faces)
    come back as an object array of int arrays or an [F, 3] int array when
    uniform.
    """
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply", "not a PLY file"
        fmt = None
        elements: List[Tuple[str, int, list]] = []
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("comment"):
                continue
            elif line.startswith("element"):
                _, name, count = line.split()
                elements.append((name, int(count), []))
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
                else:
                    elements[-1][2].append(("scalar", parts[1], parts[2]))
            elif line == "end_header":
                break

        out: Dict[str, Dict[str, np.ndarray]] = {}
        if fmt == "ascii":
            for name, count, props in elements:
                cols: Dict[str, list] = {p[-1]: [] for p in props}
                for _ in range(count):
                    vals = f.readline().decode("ascii").split()
                    i = 0
                    for p in props:
                        if p[0] == "scalar":
                            cols[p[2]].append(float(vals[i]))
                            i += 1
                        else:
                            n = int(vals[i])
                            cols[p[3]].append([float(v) for v in vals[i + 1 : i + 1 + n]])
                            i += 1 + n
                out[name] = {
                    k: np.array(v) for k, v in cols.items()
                }
            return out

        assert fmt == "binary_little_endian", f"unsupported PLY format {fmt}"
        for name, count, props in elements:
            fixed = all(p[0] == "scalar" for p in props)
            if fixed:
                fmt_str = "<" + "".join(_PLY_TYPES[p[1]][0] for p in props)
                rec = struct.calcsize(fmt_str)
                buf = f.read(rec * count)
                arr = np.frombuffer(
                    buf,
                    dtype=np.dtype(
                        [(p[2], "<" + _PLY_TYPES[p[1]][0]) for p in props]
                    ),
                )
                out[name] = {p[2]: np.array(arr[p[2]]) for p in props}
            else:
                cols = {p[-1]: [] for p in props}
                for _ in range(count):
                    for p in props:
                        if p[0] == "scalar":
                            c, sz = _PLY_TYPES[p[1]]
                            (v,) = struct.unpack("<" + c, f.read(sz))
                            cols[p[2]].append(v)
                        else:
                            cc, csz = _PLY_TYPES[p[1]]
                            (n,) = struct.unpack("<" + cc, f.read(csz))
                            ic, isz = _PLY_TYPES[p[2]]
                            vals = struct.unpack("<" + ic * n, f.read(isz * n))
                            cols[p[3]].append(list(vals))
                lists = {
                    k: (np.array(v) if v and all(len(x) == len(v[0]) for x in v)
                        else np.array(v, dtype=object))
                    for k, v in cols.items()
                }
                out[name] = lists
        return out


def normalize_v3(arr: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    lens = np.linalg.norm(arr, axis=1)
    return arr / (lens + eps)[:, None]


def compute_normal(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Per-vertex normals by accumulating face normals (scannet_utils.py:26-45
    semantics)."""
    normals = np.zeros_like(vertices)
    tris = vertices[faces]
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    n = normalize_v3(n)
    np.add.at(normals, faces[:, 0], n)
    np.add.at(normals, faces[:, 1], n)
    np.add.at(normals, faces[:, 2], n)
    return normalize_v3(normals)


def read_mesh_vertices_rgb_normal(path: str) -> np.ndarray:
    """[N, 9] xyz rgb normals from a ScanNet mesh PLY."""
    ply = read_ply(path)
    v = ply["vertex"]
    n = len(v["x"])
    verts = np.zeros((n, 9), np.float32)
    verts[:, 0] = v["x"]
    verts[:, 1] = v["y"]
    verts[:, 2] = v["z"]
    verts[:, 3] = v["red"]
    verts[:, 4] = v["green"]
    verts[:, 5] = v["blue"]
    face_key = "vertex_indices" if "vertex_indices" in ply.get("face", {}) else "vertex_index"
    if "face" in ply:
        faces = np.asarray(ply["face"][face_key], dtype=np.int64)
        verts[:, 6:9] = compute_normal(verts[:, :3].astype(np.float64), faces)
    return verts


def read_label_mapping(path: str, label_from="raw_category", label_to="nyu40id"):
    mapping = {}
    with open(path, newline="") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            mapping[row[label_from]] = int(row[label_to])
    return mapping


def read_aggregation(path: str):
    """aggregation json -> (object_id->segs, label->segs); ids 1-indexed."""
    object_id_to_segs: Dict[int, list] = {}
    label_to_segs: Dict[str, list] = {}
    with open(path) as f:
        data = json.load(f)
    for group in data["segGroups"]:
        object_id = group["objectId"] + 1
        object_id_to_segs[object_id] = group["segments"]
        label_to_segs.setdefault(group["label"], []).extend(group["segments"])
    return object_id_to_segs, label_to_segs


def read_segmentation(path: str):
    with open(path) as f:
        data = json.load(f)
    seg_indices = np.asarray(data["segIndices"])
    seg_to_verts: Dict[int, np.ndarray] = {}
    order = np.argsort(seg_indices, kind="stable")
    sorted_segs = seg_indices[order]
    bounds = np.flatnonzero(np.diff(sorted_segs)) + 1
    for chunk, seg in zip(
        np.split(order, bounds), sorted_segs[np.concatenate([[0], bounds])]
    ):
        seg_to_verts[int(seg)] = chunk
    return seg_to_verts, len(seg_indices)


def _axis_align_matrix(meta_file: str) -> Optional[np.ndarray]:
    for line in open(meta_file):
        if "axisAlignment" in line:
            vals = [float(x) for x in line.rstrip().strip("axisAlignment = ").split(" ")]
            return np.array(vals).reshape(4, 4)
    return None


def _instance_bboxes(verts, instance_ids, object_id_to_label_id, num_instances):
    boxes = np.zeros((num_instances, 8))
    for obj_id, label_id in object_id_to_label_id.items():
        pc = verts[instance_ids == obj_id, 0:3]
        if len(pc) == 0:
            continue
        mn, mx = pc.min(0), pc.max(0)
        boxes[obj_id - 1] = np.concatenate(
            [(mn + mx) / 2, mx - mn, [label_id, obj_id - 1]]
        )
    return boxes


def export_scene(
    mesh_file: str,
    agg_file: str,
    seg_file: str,
    meta_file: str,
    label_map_file: str,
    pointgroup_dir: Optional[str] = None,
    scene_id: Optional[str] = None,
):
    """One scene -> the artifact dict (prepare_data.py export semantics)."""
    mesh_vertices = read_mesh_vertices_rgb_normal(mesh_file)
    label_map = read_label_mapping(label_map_file)

    align = _axis_align_matrix(meta_file) if os.path.exists(meta_file) else None
    aligned = mesh_vertices.copy()
    if align is not None:
        pts = np.ones((len(mesh_vertices), 4))
        pts[:, :3] = mesh_vertices[:, :3]
        aligned[:, :3] = (pts @ align.T)[:, :3]

    if os.path.isfile(agg_file):
        object_id_to_segs, label_to_segs = read_aggregation(agg_file)
        seg_to_verts, num_verts = read_segmentation(seg_file)
        label_ids = np.zeros(num_verts, np.uint32)
        for label, segs in label_to_segs.items():
            label_id = label_map.get(label, 0)
            for seg in segs:
                label_ids[seg_to_verts[seg]] = label_id
        instance_ids = np.zeros(num_verts, np.uint32)
        object_id_to_label_id: Dict[int, int] = {}
        for object_id, segs in object_id_to_segs.items():
            for seg in segs:
                verts = seg_to_verts[seg]
                instance_ids[verts] = object_id
                if object_id not in object_id_to_label_id and len(verts):
                    object_id_to_label_id[object_id] = int(label_ids[verts[0]])
        num_instances = len(object_id_to_segs)
        bboxes = _instance_bboxes(
            mesh_vertices, instance_ids, object_id_to_label_id, num_instances
        )
        aligned_bboxes = _instance_bboxes(
            aligned, instance_ids, object_id_to_label_id, num_instances
        )
    else:
        num_verts = len(mesh_vertices)
        label_ids = np.zeros(num_verts, np.uint32)
        instance_ids = np.zeros(num_verts, np.uint32)
        bboxes = np.zeros((1, 8))
        aligned_bboxes = np.zeros((1, 8))

    # PointGroup predicted labels (prepare_data.py:144-151)
    label_ids_pg = np.zeros(num_verts, np.uint32)
    instance_ids_pg = np.zeros(num_verts, np.uint32)
    if pointgroup_dir is not None and scene_id is not None:
        list_file = None
        for split_dir in ("train", "val", "test"):
            cand = os.path.join(pointgroup_dir, split_dir, scene_id + ".txt")
            if os.path.exists(cand):
                list_file = cand
                break
        if list_file:
            base = os.path.dirname(list_file)
            with open(list_file) as f:
                for inst_id, line in enumerate(l.strip() for l in f if l.strip()):
                    txt_path, cls, _ = line.split(" ")
                    mask = np.loadtxt(os.path.join(base, txt_path))
                    instance_ids_pg[mask != 0] = inst_id + 1
                    label_ids_pg[mask != 0] = int(cls)

    return {
        "vert": mesh_vertices,
        "aligned_vert": aligned,
        "sem_label": label_ids,
        "ins_label": instance_ids,
        "sem_label_pg": label_ids_pg,
        "ins_label_pg": instance_ids_pg,
        "bbox": bboxes,
        "aligned_bbox": aligned_bboxes,
    }


def export_one_scan(
    scannet_dir: str,
    scan_name: str,
    output_prefix: str,
    label_map_file: str,
    pointgroup_dir: Optional[str],
    rng: Optional[np.random.Generator] = None,
):
    """Filter + subsample + save (prepare_data.py:166-216)."""
    scan = os.path.join(scannet_dir, scan_name)
    arts = export_scene(
        os.path.join(scan, scan_name + "_vh_clean_2.ply"),
        os.path.join(scan, scan_name + ".aggregation.json"),
        os.path.join(scan, scan_name + "_vh_clean_2.0.010000.segs.json"),
        os.path.join(scan, scan_name + ".txt"),
        label_map_file,
        pointgroup_dir,
        scan_name,
    )

    if arts["bbox"].shape[0] > 1:
        keep = np.in1d(arts["bbox"][:, -2], OBJ_CLASS_IDS)
        arts["bbox"] = arts["bbox"][keep]
        arts["aligned_bbox"] = arts["aligned_bbox"][keep]

    n = len(arts["vert"])
    if n > MAX_NUM_POINT:
        rng = rng or np.random.default_rng(0)
        choices = rng.choice(n, MAX_NUM_POINT, replace=False)
        for key in ["vert", "aligned_vert", "sem_label", "ins_label",
                    "sem_label_pg", "ins_label_pg"]:
            arts[key] = arts[key][choices]

    for key, arr in arts.items():
        np.save(f"{output_prefix}_{key}.npy", arr)
    return arts


def batch_export(split: str, scannet_dir: str, pointgroup_dir: str,
                 output_dir: str, meta_dir: str):
    os.makedirs(output_dir, exist_ok=True)
    split_file = os.path.join(meta_dir, f"scannetv2_{split}.txt")
    scan_names = sorted(line.strip() for line in open(split_file))
    label_map = os.path.join(meta_dir, "scannetv2-labels.combined.tsv")
    for scan_name in scan_names:
        print(scan_name)
        export_one_scan(
            scannet_dir, scan_name, os.path.join(output_dir, scan_name),
            label_map, pointgroup_dir,
        )
