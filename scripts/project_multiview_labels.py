"""Project ENet *label* maps onto scene points with majority vote + PLY viz.

Port of reference ``scripts/project_multiview_labels.py`` (C21, debug/aux):
runs the full ENet (encoder + classifier) per frame, argmaxes per-pixel nyu40
labels, back-projects them onto the scene points, fuses by majority vote
(or first-hit), and writes a label-colored PLY per scene for inspection.

    python scripts/project_multiview_labels.py --maxpool \
        --scannet_data data/scannet/pointgroup_data \
        --frames data/scanrefer/frames_square --out outputs/projections
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from instancerefer_tpu.data.projection import ProjectionHelper
from instancerefer_tpu.utils.pc_utils import write_ply_rgb

INTRINSICS = [[37.01983, 0, 20, 0], [0, 38.52470, 15.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]]

# NYU40 color palette (standard ScanNet visualization colors)
NYU40_COLORS = np.array(
    [
        (0, 0, 0), (174, 199, 232), (152, 223, 138), (31, 119, 180), (255, 187, 120),
        (188, 189, 34), (140, 86, 75), (255, 152, 150), (214, 39, 40), (197, 176, 213),
        (148, 103, 189), (196, 156, 148), (23, 190, 207), (178, 76, 76), (247, 182, 210),
        (66, 188, 102), (219, 219, 141), (140, 57, 197), (202, 185, 52), (51, 176, 203),
        (200, 54, 131), (92, 193, 61), (78, 71, 183), (172, 114, 82), (255, 127, 14),
        (91, 163, 138), (153, 98, 156), (140, 153, 101), (158, 218, 229), (100, 125, 154),
        (178, 127, 135), (120, 185, 128), (146, 111, 194), (44, 160, 44), (112, 128, 144),
        (96, 207, 209), (227, 119, 194), (213, 92, 176), (94, 106, 211), (82, 84, 163),
        (100, 85, 144),
    ],
    dtype=np.uint8,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--maxpool", action="store_true",
                        help="majority vote across frames (else first-hit)")
    parser.add_argument("--scannet_data", type=str, default="data/scannet/pointgroup_data")
    parser.add_argument("--frames", type=str, default="data/scanrefer/frames_square")
    parser.add_argument("--out", type=str, default="outputs/projections")
    parser.add_argument("--weights", type=str, default="")
    parser.add_argument("--scene_list", type=str, default="")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from instancerefer_tpu.models.enet import Enet, normalize_frame
    from scripts.compute_multiview_features import load_image
    from scripts.project_multiview_features import load_depth, load_pose

    model = Enet(num_classes=41)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.key(0), jnp.zeros((1, 256, 328, 3))
    )
    if args.weights:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            variables = ckptr.restore(os.path.abspath(args.weights), variables)

    @jax.jit
    def predict(batch):
        logits, _ = model.apply(variables, normalize_frame(batch), train=False)
        # labels at the 1/8 feature resolution used for projection
        small = jax.image.resize(
            logits, (logits.shape[0], 32, 41, logits.shape[-1]), "linear"
        )
        return jnp.argmax(small, axis=-1)

    projector = ProjectionHelper(np.array(INTRINSICS)[:3, :3], 0.1, 4.0, (41, 32), 0.05)
    os.makedirs(args.out, exist_ok=True)

    scene_list = (
        sorted(set(open(args.scene_list).read().splitlines()))
        if args.scene_list
        else sorted(os.listdir(args.frames))
    )
    for scene_id in scene_list:
        vert_path = os.path.join(args.scannet_data, scene_id + "_vert.npy")
        if not os.path.exists(vert_path):
            continue
        scene = np.load(vert_path)[:, :3]
        color_dir = os.path.join(args.frames, scene_id, "color")
        frame_list = [f.split(".")[0] for f in sorted(os.listdir(color_dir))]
        print(f"processing {scene_id} ({len(frame_list)} frames)...")

        votes = np.zeros((len(scene), 41), np.int32)
        first = np.zeros(len(scene), np.int64)
        for frame_id in frame_list:
            img = load_image(os.path.join(color_dir, frame_id + ".jpg"), (328, 256))
            depth = load_depth(os.path.join(args.frames, scene_id, "depth", frame_id + ".png"))
            pose = load_pose(os.path.join(args.frames, scene_id, "pose", frame_id + ".txt"))
            indices = projector.compute_projection(scene, depth, pose)
            if indices is None:
                continue
            labels = np.asarray(predict(jnp.asarray(img[None])))[0]  # [32, 41]
            proj = projector.project(labels, indices[0], indices[1], len(scene))[0]
            covered = np.zeros(len(scene), bool)
            n = int(indices[0][0])
            covered[indices[0][1 : 1 + n]] = True
            lab = proj.astype(np.int64)
            votes[covered, lab[covered]] += 1
            newly = covered & (first == 0)
            first[newly] = lab[newly]

        final = votes.argmax(1) if args.maxpool else first
        colors = NYU40_COLORS[np.clip(final, 0, 40)]
        out_path = os.path.join(args.out, f"{scene_id}.ply")
        write_ply_rgb(scene, colors, out_path)
        print(f"  wrote {out_path}")
    print("done!")


if __name__ == "__main__":
    main()
