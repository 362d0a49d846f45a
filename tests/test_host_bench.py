"""The bench.py <-> scripts/bench_host_pipeline.py shared measurement
contract: bench.py imports ``phase_split``/``median_ms`` from the host-bench
script (one timing discipline, VERDICT r3) — pin the import path and the
phase-key schema so the BENCH JSON artifact's ``host_phase_ms`` can't
silently drift or break."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _host_bench():
    # the exact import bench.py performs (scripts/ on sys.path, plain module)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import bench_host_pipeline as hb
    finally:
        sys.path.pop(0)
    return hb


def test_phase_split_schema_and_median_ms():
    hb = _host_bench()

    from instancerefer_tpu.data.pipeline import BatchSpec
    from instancerefer_tpu.data.synthetic import make_core_sample

    mean_size = np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
    core = make_core_sample(
        np.random.default_rng(0), num_points=2000, num_instances=4,
        points_per_instance=128, num_candidates=2, mean_size_arr=mean_size,
    )
    spec = BatchSpec(pallas_conv=True)
    out = hb.phase_split(core, spec, reps=3)
    # bench.py emits these keys verbatim as host_phase_ms (plus collate_ms).
    # The split is measured INSIDE pad_sample (VERDICT r4 #3): named phases
    # must cover >= 85% of the total by construction.
    required = {
        "scene_quantize_ms", "scene_pyramid_ms", "scene_bands_ms",
        "scene_inverse_ms", "inst_pyramid_ms", "sample_misc_ms",
        "pad_sample_total_ms", "accounted_frac",
    }
    assert required <= set(out), (required - set(out), out)
    assert all(np.isfinite(v) and v >= 0 for v in out.values()), out
    assert out["accounted_frac"] >= 0.85, out

    ticks = []
    m = hb.median_ms(lambda: ticks.append(1), reps=3)
    assert m >= 0 and len(ticks) == 4  # 1 warm + 3 timed


def test_module_import_has_no_env_side_effects():
    """Importing the host bench as a module (what bench.py does mid-TPU-run)
    must not touch JAX_PLATFORMS — the cpu default is script-mode only."""
    before = os.environ.get("JAX_PLATFORMS")
    _host_bench()
    assert os.environ.get("JAX_PLATFORMS") == before
