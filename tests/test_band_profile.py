"""Calibration feedback loop (scripts/calibrate_bands.py --emit-yaml).

The shipped band geometry must be provably derived from measurement: the
tool writes a profile yaml, configs overlay it via the ``band_profile`` key,
bench.py consumes it — and the generated profile must be drop-free on the
occupancy scales it was calibrated over.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIPPED = os.path.join(REPO, "config", "band_profile.synthetic.yaml")
MEAN_SIZE = np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])


def _spec_with_profile(path):
    from instancerefer_tpu.config import band_profile_kwargs
    from instancerefer_tpu.data.pipeline import BatchSpec

    return BatchSpec(pallas_conv=True, **band_profile_kwargs(path))


def test_calibrate_emit_yaml_roundtrip(tmp_path):
    """--emit-yaml writes a profile that (a) parses, (b) load_config overlays
    onto the pallas_* keys, (c) replays drop-free on the data it measured."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import calibrate_bands

    out = tmp_path / "profile.yaml"
    calibrate_bands.main([
        "--synthetic", "--batches", "1", "--batch_size", "2",
        "--points", "6000", "--margin", "32", "--emit-yaml", str(out),
    ])
    assert out.exists()
    spec = _spec_with_profile(out)
    assert spec.pallas_subwin[0] > 0

    # load_config applies the profile over the yaml's keys
    from instancerefer_tpu.config import load_config

    main_yaml = tmp_path / "main.yaml"
    main_yaml.write_text(
        "TPU:\n  band_profile: profile.yaml\n  pallas_subwin: [128,128,128,128,128]\n"
    )
    cfg = load_config(["--config", str(main_yaml)])
    assert tuple(cfg.pallas_subwin) == tuple(spec.pallas_subwin), (
        "band_profile must override the hand-written subwin"
    )

    # drop-free on the measured data (same seeds the tool used)
    from instancerefer_tpu.data.synthetic import make_batch

    batch = make_batch(
        2, spec, seed=0, num_points=6000, num_instances=6,
        num_candidates=4, mean_size_arr=MEAN_SIZE,
    )
    for prefix in ("scene", "inst"):
        assert int(batch[f"{prefix}_band_dropped"]) == 0, prefix


def test_fit_caps_profile_overflow_free(tmp_path):
    """--fit-caps emits measured capacities into the profile; a pipeline run
    with the fitted spec must see ZERO overflow on the calibration data
    (VERDICT r4 #2: caps fitted to data, not hand-sized)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import calibrate_bands

    out = tmp_path / "profile.yaml"
    calibrate_bands.main([
        "--synthetic", "--batches", "1", "--batch_size", "4",
        "--points", "6000", "--margin", "32", "--fit-caps",
        "--cap-margin", "0.1", "--emit-yaml", str(out),
    ])
    from instancerefer_tpu.config import band_profile_kwargs

    kw = band_profile_kwargs(out)
    for key in ("scene_caps", "inst_caps", "max_candidates", "max_instances"):
        assert key in kw, (key, kw)
    spec = _spec_with_profile(out)
    # fitted caps keep banding available: chunk-divisible
    chunk = max(spec.pallas_chunk, spec.pallas_down_chunk)
    assert all(c % chunk == 0 for c in spec.scene_caps), spec.scene_caps
    assert all(c % chunk == 0 for c in spec.inst_caps), spec.inst_caps

    # zero overflow AND zero band drops on the data the tool measured
    from instancerefer_tpu.data.synthetic import make_batch

    batch = make_batch(
        4, spec, seed=0, num_points=6000, num_instances=6,
        num_candidates=4, mean_size_arr=MEAN_SIZE,
    )
    for key in ("scene_overflow", "inst_overflow", "cand_overflow"):
        assert float(np.asarray(batch[key]).max()) == 0.0, key
    for prefix in ("scene", "inst"):
        assert int(batch[f"{prefix}_band_dropped"]) == 0, prefix


def test_eval_overflow_gate():
    """scripts/eval.py fails loud on eval-time capacity overflow unless
    --allow_overflow downgrades it to a warning."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eval_cli", os.path.join(REPO, "scripts", "eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    mod.check_eval_overflow({"scene": 0.0, "inst": 0.0, "cand": 0.0}, False)
    with pytest.raises(SystemExit, match="capacity overflow"):
        mod.check_eval_overflow({"scene": 0.0, "inst": 0.02, "cand": 0.0}, False)
    # --allow_overflow: warns, does not raise
    mod.check_eval_overflow({"scene": 0.0, "inst": 0.02, "cand": 0.0}, True)


@pytest.mark.skipif(not os.path.exists(SHIPPED), reason="shipped profile not generated")
@pytest.mark.parametrize("pts,ninst", [(10000, 6), (40000, 12), (80000, 16)])
def test_shipped_profile_drop_free_at_bench_scales(pts, ninst):
    """The checked-in profile (generated over the bench's three occupancy
    scales) must band every neighbor at those scales — zero drops."""
    from instancerefer_tpu.data.synthetic import make_batch

    spec = _spec_with_profile(SHIPPED)
    batch = make_batch(
        2, spec, seed=2, num_points=pts, num_instances=ninst,
        num_candidates=4, mean_size_arr=MEAN_SIZE,
    )
    for prefix in ("scene", "inst"):
        dropped = int(batch[f"{prefix}_band_dropped"])
        total = int(batch[f"{prefix}_band_total"])
        assert dropped == 0, f"{prefix}: {dropped}/{total} dropped at {pts} pts"
    # the shipped profile carries --fit-caps capacities: they must hold these
    # scales without truncation (the hand-sized caps they replaced silently
    # overflowed inst stage 2 at 80k points — exactly what VERDICT r4 #2
    # was about)
    for key in ("scene_overflow", "inst_overflow", "cand_overflow"):
        assert float(np.asarray(batch[key]).max()) == 0.0, (key, pts)
