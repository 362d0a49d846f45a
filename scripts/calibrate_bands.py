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


def min_subwin(nbr: np.ndarray, chunk: int):
    """(smallest aligned band width covering every offset's neighbors,
    band-start spread).

    The kernels clamp each offset's band start into
    [ws, ws + window - subwin], so a subwin recommendation alone is not
    drop-free: the chunk's *window* must also cover the spread between the
    chunk-global aligned start and the widest offset's aligned start plus
    subwin.  ``spread`` is that max offset, so window >= spread + subwin
    guarantees the clamp never pushes a band off its neighbors.
    """
    v_out, k = nbr.shape
    n = v_out // chunk
    if n == 0:
        return 0, 0
    big = np.iinfo(np.int32).max
    blk = nbr[: n * chunk].reshape(n, chunk, k)
    lo_k = np.where(blk >= 0, blk, big).min(axis=1)
    hi_k = np.where(blk >= 0, blk, -1).max(axis=1)
    wsk = np.where(lo_k == big, big, (lo_k // ALIGN) * ALIGN)
    ok = (hi_k >= 0) & (wsk < big)
    if not ok.any():
        return 0, 0
    need = int((hi_k[ok] - wsk[ok] + 1).max())
    ws = np.where(
        lo_k.min(axis=1) == big, 0, (lo_k.min(axis=1) // ALIGN) * ALIGN
    )
    spread = int((wsk[ok] - np.broadcast_to(ws[:, None], wsk.shape)[ok]).max())
    return -(-need // ALIGN) * ALIGN, spread


def roundup128(n: int) -> int:
    return -(-n // 128) * 128


def recommend(minimum: int, margin: int) -> int:
    """Smallest 128-multiple with at least ``margin`` rows of slack (the MXU
    lane-pads sub-windows to 128 multiples, so finer steps buy nothing)."""
    return roundup128(minimum + margin) if minimum else 0


def calibrate(batches, spec, margin):
    subm, down, up = {}, {}, {}
    spreads = {"subm": {}, "down": {}, "up": {}}

    def acc(table, name, key, nbr, chunk):
        sw, spread = min_subwin(nbr, chunk)
        table[key] = max(table.get(key, 0), sw)
        spreads[name][key] = max(spreads[name].get(key, 0), spread)

    for batch in batches:
        for prefix in ("scene", "inst"):
            prev_v = 0
            for s in range(spec.num_stages):
                nbr3 = batch[f"{prefix}_nbr3_{s}"]
                key = (prefix, s)
                acc(subm, "subm", key, nbr3, spec.pallas_chunk)
                if s > 0:
                    d = batch[f"{prefix}_down_{s}"]
                    acc(down, "down", key, d, spec.pallas_down_chunk)
                    from instancerefer_tpu.ops.voxelize import invert_down

                    up_row, up_k = invert_down(d, prev_v)
                    up8 = np.where(
                        up_k[:, None] == np.arange(8, dtype=np.int32)[None, :],
                        up_row[:, None], -1,
                    ).astype(np.int32)
                    acc(up, "up", key, up8, spec.pallas_chunk)
                prev_v = nbr3.shape[0]
    return subm, down, up, spreads


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

    subm, down, up, spreads = calibrate(batches(), spec, args.margin)

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

    # --- window sufficiency: the kernels clamp band starts into
    # [ws, ws + window - subwin], so window must cover the measured
    # band-start spread + the recommended subwin or neighbors still drop.
    def window_req(name, table, key):
        rec = recommend(table.get(key, 0), args.margin)
        if not rec:
            return 0
        spread = spreads[name].get(key, 0)
        return -(-(spread + rec) // ALIGN) * ALIGN

    problems = []
    for prefix in ("scene", "inst"):
        for s in range(spec.num_stages):
            key = (prefix, s)
            checks = [
                ("window", "subm", subm, spec.pallas_window, "pallas_window"),
                ("down_window", "down", down,
                 spec.down_geom_for(s, prefix)[1], "pallas_down_window"),
                ("up_window", "up", up, spec.pallas_up_window, "pallas_up_window"),
            ]
            for label, name, table, have, yaml_key in checks:
                need = window_req(name, table, key)
                if need and need > have:
                    problems.append(
                        f"#   {prefix} stage {s}: {yaml_key} window {have} < "
                        f"required {need} (band-start spread "
                        f"{spreads[name].get(key, 0)} + subwin)"
                    )
    if problems:
        print("\n# WARNING: recommended subwins need WIDER windows (the band")
        print("# clamp would otherwise still drop neighbors):")
        for p in problems:
            print(p)
    else:
        print("# window check: current window profiles cover the measured")
        print("# band-start spreads — recommendations above are drop-free.")


if __name__ == "__main__":
    main()
