"""Dump prepared scene npys to OBJ for manual inspection.

Port of reference ``data/scannet/visualize.py`` (C22): writes
``{scene_id}_vert.obj`` / ``{scene_id}_aligned_vert.obj`` with vertex colors,
plus optionally the instance boxes as a wireframe-ish OBJ mesh.

    python scripts/visualize.py --scene scene0000_00 \
        --data data/scannet/pointgroup_data --out outputs/viz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from instancerefer_tpu.utils.pc_utils import write_bbox, write_obj


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--data", type=str, default="data/scannet/pointgroup_data")
    parser.add_argument("--out", type=str, default="outputs/viz")
    parser.add_argument("--boxes", action="store_true", help="also dump instance boxes")
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for suffix in ("vert", "aligned_vert"):
        path = os.path.join(args.data, f"{args.scene}_{suffix}.npy")
        if not os.path.exists(path):
            print(f"missing {path}")
            continue
        verts = np.load(path)
        out = os.path.join(args.out, f"{args.scene}_{suffix}.obj")
        write_obj(verts[:, :3], None, out, colors=verts[:, 3:6] / 255.0)
        print(f"wrote {out}")

    if args.boxes:
        path = os.path.join(args.data, f"{args.scene}_aligned_bbox.npy")
        if os.path.exists(path):
            boxes = np.load(path)
            obbs = np.concatenate(
                [boxes[:, :6], np.zeros((len(boxes), 1))], axis=1
            )
            out = os.path.join(args.out, f"{args.scene}_bbox.obj")
            write_bbox(obbs, out)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
