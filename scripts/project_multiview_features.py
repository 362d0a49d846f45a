"""Project per-frame ENet features onto scene points -> one HDF5 database.

Port of reference ``scripts/project_multiview_features.py`` (C20): for every
scene, load its frames' depth maps (32x41) and camera poses, compute 3d<->2d
correspondences with frustum culling + occlusion tests, back-project the
128-ch features, fuse across frames (maxpool or first-hit), and write
``enet_feats_maxpool.hdf5`` with one [N, 128] dataset per scene.

    python scripts/project_multiview_features.py --maxpool \
        --scannet_data data/scannet/pointgroup_data \
        --frames data/scanrefer/frames_square \
        --features data/scanrefer/enet_features \
        --out data/enet_feats_maxpool.hdf5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from instancerefer_tpu.data.projection import FrameFeatureFuser, ProjectionHelper

# 41x32 feature-resolution intrinsics (reference :28-29)
INTRINSICS = [[37.01983, 0, 20, 0], [0, 38.52470, 15.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]]


def load_pose(filename):
    lines = open(filename).read().splitlines()
    assert len(lines) == 4
    return np.array([[float(v) for v in line.split()] for line in lines], np.float32)


def load_depth(path, image_dims=(41, 32)):
    from imageio.v2 import imread

    from scripts.compute_multiview_features import resize_crop_image

    depth = imread(path)
    depth = resize_crop_image(depth, image_dims)
    return depth.astype(np.float32) / 1000.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--maxpool", action="store_true",
                        help="max-pool overlapping points (else first-hit)")
    parser.add_argument("--scannet_data", type=str, default="data/scannet/pointgroup_data")
    parser.add_argument("--frames", type=str, default="data/scanrefer/frames_square")
    parser.add_argument("--features", type=str, default="data/scanrefer/enet_features")
    parser.add_argument("--out", type=str, default="data/enet_feats_maxpool.hdf5")
    parser.add_argument("--scene_list", type=str, default="")
    args = parser.parse_args()

    import h5py

    projector = ProjectionHelper(
        np.array(INTRINSICS)[:3, :3], 0.1, 4.0, (41, 32), 0.05
    )

    if args.scene_list:
        scene_list = sorted(set(open(args.scene_list).read().splitlines()))
    else:
        scene_list = sorted(os.listdir(args.frames))

    with h5py.File(args.out, "w", libver="latest") as database:
        print("projecting multiview features to point cloud...")
        for scene_id in scene_list:
            vert_path = os.path.join(args.scannet_data, scene_id + "_vert.npy")
            if not os.path.exists(vert_path):
                print(f"skipping {scene_id}: no {vert_path}")
                continue
            # the original (unaligned) vertices — cameras live in that frame
            scene = np.load(vert_path)[:, :3]
            color_dir = os.path.join(args.frames, scene_id, "color")
            frame_list = [f.split(".")[0] for f in sorted(os.listdir(color_dir))]
            print(f"processing {scene_id} ({len(frame_list)} frames)...")

            fuser = FrameFeatureFuser(
                len(scene), 128, "maxpool" if args.maxpool else "first"
            )
            for frame_id in frame_list:
                depth = load_depth(
                    os.path.join(args.frames, scene_id, "depth", frame_id + ".png")
                )
                pose = load_pose(
                    os.path.join(args.frames, scene_id, "pose", frame_id + ".txt")
                )
                indices = projector.compute_projection(scene, depth, pose)
                if indices is None:
                    continue
                feat = np.load(
                    os.path.join(args.features, scene_id, frame_id + ".npy")
                )  # [128, 32, 41]
                proj = projector.project(feat, indices[0], indices[1], len(scene)).T
                fuser.add(proj)
            database.create_dataset(scene_id, data=fuser.result())
    print("done!")


if __name__ == "__main__":
    main()
