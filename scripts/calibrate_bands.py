"""Calibrate the banded-conv geometry profiles against a dataset.

The banded Pallas kernels (ops/pallas_conv.py) cost time proportional to
V * subwin, and a band that is too narrow silently drops neighbors (counted
and warned about by the solver).  This tool measures, over real batches, the
minimal zero-drop sub-window per (prefix, stage) for the submanifold, down
and inverse (up) maps, and prints a ready-to-paste TPU config section using
the smallest 128-multiples with a safety margin.

    python scripts/calibrate_bands.py --config config/InstanceRefer.yaml \
        --data_root data --batches 8 --margin 32

Works without a dataset too (--synthetic) to recalibrate after changing
capacities.  CPU-only; does not touch the TPU.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

ALIGN = 16


def min_subwin(nbr: np.ndarray, chunk: int) -> int:
    """Smallest aligned band width covering every offset's neighbors."""
    v_out, k = nbr.shape
    n = v_out // chunk
    if n == 0:
        return 0
    big = np.iinfo(np.int32).max
    blk = nbr[: n * chunk].reshape(n, chunk, k)
    lo_k = np.where(blk >= 0, blk, big).min(axis=1)
    hi_k = np.where(blk >= 0, blk, -1).max(axis=1)
    wsk = np.where(lo_k == big, big, (lo_k // ALIGN) * ALIGN)
    ok = (hi_k >= 0) & (wsk < big)
    if not ok.any():
        return 0
    need = int((hi_k[ok] - wsk[ok] + 1).max())
    return -(-need // ALIGN) * ALIGN


def roundup128(n: int) -> int:
    return -(-n // 128) * 128


def recommend(minimum: int, margin: int) -> int:
    """Smallest 128-multiple with at least ``margin`` rows of slack (the MXU
    lane-pads sub-windows to 128 multiples, so finer steps buy nothing)."""
    return roundup128(minimum + margin) if minimum else 0


def calibrate(batches, spec, margin):
    subm = {}
    down = {}
    up = {}
    for batch in batches:
        for prefix in ("scene", "inst"):
            prev_v = 0
            for s in range(spec.num_stages):
                nbr3 = batch[f"{prefix}_nbr3_{s}"]
                key = (prefix, s)
                subm[key] = max(
                    subm.get(key, 0), min_subwin(nbr3, spec.pallas_chunk)
                )
                if s > 0:
                    d = batch[f"{prefix}_down_{s}"]
                    down[key] = max(
                        down.get(key, 0), min_subwin(d, spec.pallas_down_chunk)
                    )
                    from instancerefer_tpu.ops.voxelize import invert_down

                    up_row, up_k = invert_down(d, prev_v)
                    up8 = np.where(
                        up_k[:, None] == np.arange(8, dtype=np.int32)[None, :],
                        up_row[:, None], -1,
                    ).astype(np.int32)
                    up[key] = max(
                        up.get(key, 0), min_subwin(up8, spec.pallas_chunk)
                    )
                prev_v = nbr3.shape[0]
    return subm, down, up


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default="config/InstanceRefer.yaml")
    ap.add_argument("--data_root", default="data")
    ap.add_argument("--split", default="train")
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--margin", type=int, default=32)
    ap.add_argument(
        "--synthetic", action="store_true",
        help="calibrate on synthetic ScanRefer-scale scenes (no dataset needed)",
    )
    args = ap.parse_args(argv)

    from instancerefer_tpu.config import load_config

    cfg = load_config(["--config", args.config, "--data_root", args.data_root])
    spec = cfg.batch_spec()
    import dataclasses

    spec = dataclasses.replace(spec, pallas_conv=True)

    def batches():
        if args.synthetic:
            from instancerefer_tpu.data.synthetic import make_batch

            mean_size = np.linspace(0.3, 2.0, 18)[:, None] * np.array(
                [[1.0, 0.9, 0.8]]
            )
            for seed in range(args.batches):
                yield make_batch(
                    args.batch_size, spec, seed=seed, num_points=cfg.num_points,
                    num_instances=12, num_candidates=4, mean_size_arr=mean_size,
                )
        else:
            from instancerefer_tpu.data.dataset import (
                PaddedLoader,
                ScannetReferenceDataset,
                get_scanrefer,
            )

            scanrefer = get_scanrefer(args.data_root, args.split)
            ds = ScannetReferenceDataset(
                scanrefer, args.split, data_root=args.data_root,
                num_points=cfg.num_points, use_augment=False,
                use_color=cfg.use_color, use_normal=cfg.use_normal,
                use_multiview=cfg.use_multiview, use_height=cfg.use_height,
            )
            loader = PaddedLoader(ds, spec, batch_size=args.batch_size,
                                  shuffle=True, seed=0)
            it = iter(loader)
            for _ in range(args.batches):
                try:
                    yield next(it)
                except StopIteration:
                    return

    subm, down, up = calibrate(batches(), spec, args.margin)

    def profile(table, prefix):
        return [
            recommend(table.get((prefix, s), 0), args.margin)
            for s in range(spec.num_stages)
        ]

    print("# measured minimal zero-drop sub-windows (chunk "
          f"{spec.pallas_chunk} subm/up, {spec.pallas_down_chunk} down):")
    for name, table in (("subm", subm), ("down", down), ("up", up)):
        for prefix in ("scene", "inst"):
            row = [table.get((prefix, s), 0) for s in range(spec.num_stages)]
            print(f"#   {name:4s} {prefix:5s}: {row}")
    up_all = max(up.values()) if up else 0
    print("\n# paste into the TPU section of your yaml "
          f"(margin {args.margin} rows, rounded to 128-lane multiples):")
    print(f"  pallas_subwin: {profile(subm, 'scene')}")
    print(f"  pallas_subwin_inst: {profile(subm, 'inst')}")
    print(f"  pallas_down_subwin: {profile(down, 'scene')}")
    print(f"  pallas_down_subwin_inst: {profile(down, 'inst')}")
    print(f"  pallas_up_subwin: {recommend(up_all, args.margin)}")
    print("# down/up windows must be >= the matching subwin; widen the")
    print("# window profiles if you raised a subwin beyond them.")


if __name__ == "__main__":
    main()
