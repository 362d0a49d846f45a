"""Host input-pipeline benchmark: PaddedLoader samples/s vs worker count and
the per-sample phase split (voxelize / kernel maps / band metadata / pack).

The device step consumes ~1k scenes/s on one v5e chip (bench.py); feeding it
is pure host work done in PaddedLoader threads (the C++ voxelizer releases
the GIL).  This measures where the per-sample milliseconds go and how
throughput scales with workers — on a 1-core box the scaling ceiling IS the
core count, so the numbers here bound the per-core rate that a ~100-core
production TPU host multiplies (PERF.md "Headroom").

    python scripts/bench_host_pipeline.py [--samples 32] [--points 40000]

CPU-only; does not touch the TPU.
"""

import argparse
import os
import sys
import time

if __name__ == "__main__":  # script-mode side effects only
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def median_ms(fn, reps=7, warm=True):
    """Median wall-clock milliseconds of ``fn`` over ``reps`` runs — the one
    timing discipline every host-side measurement uses (VERDICT r3: no more
    single-shot numbers on the 1-core box)."""
    if warm:
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def phase_split(core, spec, voxel_size_glp=0.05, reps=7):
    """Per-sample phase timings, medians of ``reps`` (the scene pyramid path,
    the dominant cost).  Uses the production fused path
    (``build_pyramid_padded`` — one native call per pyramid).  Shared with
    ``bench.py``'s JSON artifact so the two measurements cannot drift."""
    from instancerefer_tpu.data.pipeline import pad_sample
    from instancerefer_tpu.ops import voxelize as V

    out = {}

    def timeit(name, fn):
        r = fn()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            ts.append((time.perf_counter() - t0) * 1e3)
        out[name] = float(np.median(ts))
        return r

    pc = core.point_cloud
    coords, feats = timeit(
        "quantize_ms",
        lambda: V.quantize(pc[:, :3], pc[:, : spec.feat_dim], voxel_size_glp,
                           raster_order=spec.pallas_conv),
    )
    stages, _counts = timeit(
        "pyramid_ms",
        lambda: V.build_pyramid_padded(
            [coords], [0], spec.scene_caps, raster=spec.pallas_conv
        ),
    )
    if spec.pallas_conv:
        def bands():
            for s, cap in enumerate(spec.scene_caps):
                V.compute_offset_window_starts(
                    stages[s].nbr3, spec.pallas_chunk, spec.pallas_window,
                    spec.subwin_for(s), cap, count_drops=True,
                )
        timeit("band_metadata_ms", bands)
    timeit("pad_sample_total_ms", lambda: pad_sample(core, spec))
    return out


def loader_scaling(cores, spec, batch_size, worker_counts):
    """samples/s through the real PaddedLoader at different worker counts."""
    from instancerefer_tpu.data.dataset import PaddedLoader

    class _SyntheticDS:
        """Duck-typed stand-in for ScannetReferenceDataset (get_core/len)."""

        def __init__(self, cores):
            self.cores = cores

        def __len__(self):
            return len(self.cores)

        def get_core(self, idx, rng=None, class_override=None):
            return self.cores[idx]

    ds = _SyntheticDS(cores)
    results = {}
    for w in worker_counts:
        loader = PaddedLoader(
            ds, spec, batch_size, shuffle=False, num_workers=w, drop_last=False
        )
        t0 = time.perf_counter()
        n = 0
        for batch in loader:
            n += int(batch["sample_valid"].sum())
        dt = time.perf_counter() - t0
        results[w] = n / dt
        print(f"[host-bench] workers={w}: {n / dt:.2f} samples/s "
              f"({dt / n * 1e3:.1f} ms/sample)", file=sys.stderr)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--points", type=int, default=40000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 1, 2, 4, 8])
    args = ap.parse_args(argv)

    from instancerefer_tpu.data.pipeline import BatchSpec
    from instancerefer_tpu.data.synthetic import make_core_sample
    from instancerefer_tpu.ops.voxelize import native_available

    spec = BatchSpec(pallas_conv=True)
    rng = np.random.default_rng(0)
    mean_size = np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
    print(f"[host-bench] native voxelizer: {native_available()}", file=sys.stderr)
    cores = [
        make_core_sample(rng, num_points=args.points, num_instances=12,
                         num_candidates=4, scan_idx=i, mean_size_arr=mean_size)
        for i in range(args.samples)
    ]

    phases = phase_split(cores[0], spec)
    for k, v in phases.items():
        print(f"[host-bench] {k}: {v:.1f}", file=sys.stderr)

    scaling = loader_scaling(cores, spec, args.batch_size, args.workers)

    import json

    print(json.dumps({
        "native_voxelizer": native_available(),
        "points_per_scene": args.points,
        "phase_ms": {k: round(v, 2) for k, v in phases.items()},
        "samples_per_sec_by_workers": {str(k): round(v, 2) for k, v in scaling.items()},
        "ncpu": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
