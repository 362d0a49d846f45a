"""Batched ENet inference over ScanNet frames -> per-frame 128-ch feature npys.

Port of reference ``scripts/compute_multiview_features.py`` (C19): loads the
328x256 color frames of every scene, runs the (frozen) ENet encoder, and dumps
one ``[128, 32, 41]`` feature array per frame to
``{data_root}/enet_features/{scene_id}/{frame_id}.npy``.

Weights: ``--weights`` may point to an orbax/flax checkpoint of
``EnetEncoder`` params (e.g. produced by training the flax ENet on ScanNet
frames); without weights the encoder runs randomly initialized — fine for
pipeline plumbing tests, not for real features.

    python scripts/compute_multiview_features.py \
        --frames data/scanrefer/frames_square --out data/scanrefer/enet_features
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def resize_crop_image(image: np.ndarray, new_dims):
    """Nearest resize to height + center crop to width (reference :41-50)."""
    h, w = image.shape[:2]
    new_w, new_h = new_dims
    if (w, h) == (new_w, new_h):
        return image
    resize_w = int(np.floor(new_h * float(w) / float(h)))
    ys = (np.arange(new_h) * (h / new_h)).astype(int).clip(0, h - 1)
    xs = (np.arange(resize_w) * (w / resize_w)).astype(int).clip(0, w - 1)
    image = image[ys][:, xs]
    # center crop width
    x0 = max((resize_w - new_w) // 2, 0)
    return image[:, x0 : x0 + new_w]


def load_image(path, image_dims):
    from imageio.v2 import imread

    img = imread(path)
    img = resize_crop_image(img, image_dims)
    return img.astype(np.float32) / 255.0  # [H, W, 3]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=str, default="data/scanrefer/frames_square")
    parser.add_argument("--out", type=str, default="data/scanrefer/enet_features")
    parser.add_argument("--weights", type=str, default="")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--scene_list", type=str, default="")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from instancerefer_tpu.models.enet import EnetEncoder, normalize_frame

    model = EnetEncoder()
    rng = jax.random.key(0)
    example = jnp.zeros((1, 256, 328, 3))
    variables = jax.jit(functools.partial(model.init, train=False))(rng, example)
    if args.weights:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            variables = ckptr.restore(os.path.abspath(args.weights), variables)

    @jax.jit
    def run(batch):
        feats = model.apply(variables, normalize_frame(batch), train=False)
        return jnp.transpose(feats, (0, 3, 1, 2))  # -> [B, 128, 32, 41]

    if args.scene_list:
        scene_list = sorted(open(args.scene_list).read().splitlines())
    else:
        scene_list = sorted(os.listdir(args.frames))

    for scene_id in scene_list:
        color_dir = os.path.join(args.frames, scene_id, "color")
        if not os.path.isdir(color_dir):
            continue
        frame_list = sorted(os.listdir(color_dir), key=lambda x: int(x.split(".")[0]))
        out_dir = os.path.join(args.out, scene_id)
        os.makedirs(out_dir, exist_ok=True)
        print(f"{scene_id}: {len(frame_list)} frames")
        for i in range(0, len(frame_list), args.batch):
            chunk = frame_list[i : i + args.batch]
            imgs = np.stack(
                [load_image(os.path.join(color_dir, f), (328, 256)) for f in chunk]
            )
            feats = np.asarray(run(jnp.asarray(imgs)))
            for f, feat in zip(chunk, feats):
                frame_id = f.split(".")[0]
                np.save(os.path.join(out_dir, f"{frame_id}.npy"), feat)
    print("done!")


if __name__ == "__main__":
    main()
