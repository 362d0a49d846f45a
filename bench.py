"""Benchmark: val-forward scenes/sec/chip on realistic ScanRefer-scale shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline context (BASELINE.md): the reference publishes no throughput numbers;
its forward pass is CPU-bound by per-sample Python candidate filtering and
mid-forward host<->device collation (SURVEY.md §3.2).  We estimate the
reference at ~15 scenes/sec forward on an A100 (batch 64, dominated by the
host loops), and the BASELINE.json north star asks for >=5x that on one v5e
chip.  ``vs_baseline`` here is ours / 15.0 — i.e. >=5.0 means target met.

Scene shapes mirror the real dataset: 40k points/scene at 0.05 m (~20k scene
voxels), ~1024-pt instances at 0.02 m, ~3-6 candidates/sample.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Estimated, not measured: the reference publishes no throughput numbers
# (SURVEY.md §6); ~15 scenes/s is our A100 estimate of its host-loop-bound
# forward (PERF.md).  vs_baseline is ours / this estimate.
A100_REFERENCE_SCENES_PER_SEC = 15.0
V5E_PEAK_BF16_FLOPS = 197e12  # TPU v5e peak dense bf16 (per chip)


def model_flops_per_batch(spec, batch_size: int) -> float:
    """Mathematical (useful) FLOPs of one forward batch at padded capacities:
    the gather-GEMM convs dominate; heads/GRU/MLPs added coarsely."""
    widths = (32, 64, 128, 128, 128)
    total = 0.0
    for caps in (spec.scene_caps, spec.inst_caps):
        cin = spec.feat_dim
        for s, cap in enumerate(caps):
            v = batch_size * cap
            if s == 0:
                total += 2 * v * 27 * cin * widths[0]  # stem 3^3
            else:
                total += 2 * v * 8 * widths[s - 1] * widths[s]  # down 2^3
                total += 2 * 2 * v * 27 * widths[s] * widths[s]  # residual
    # BEV head: ToDenseBEV + 2x 3^3 conv2d on 15x25 -> 11x21
    total += 2 * batch_size * spec.scene_caps[-1] * 128 * 128
    total += 2 * batch_size * 13 * 23 * 9 * 128 * 128
    total += 2 * batch_size * 11 * 21 * 9 * 128 * 128
    # GRU: T steps x 2 layers x 2 dirs x ([256,384] + [128,384]) + word proj
    total += 2 * batch_size * spec.max_tokens * 2 * 2 * (256 * 384 + 128 * 384)
    total += 2 * batch_size * spec.max_tokens * (300 * 256 + 256 * 256)
    return total


def main(batch_size: int = 32, iters: int = 20):
    import jax

    from instancerefer_tpu.utils.compile_cache import enable_compilation_cache

    cache = enable_compilation_cache()
    if cache:
        print(f"[bench] xla compilation cache: {cache}", file=sys.stderr)

    from instancerefer_tpu.data.pipeline import (
        BatchSpec,
        batch_to_device_dict,
        pop_band_diagnostics,
    )
    from instancerefer_tpu.data.synthetic import make_batch
    from instancerefer_tpu.models.instancerefer import InstanceRefer
    from instancerefer_tpu.train.evaluate import get_eval
    from instancerefer_tpu.train.losses import get_loss

    from instancerefer_tpu.ops.precision import set_compute_dtype

    set_compute_dtype("bfloat16")  # production policy: bf16 GEMMs, f32 accum

    # production capacities + the banded Pallas conv, with the band geometry
    # from the MEASURED profile (scripts/calibrate_bands.py --emit-yaml over
    # the 10k/40k/80k-point scales this file runs — the calibration feedback
    # loop; tests/test_band_profile.py asserts it is drop-free).  Fallback
    # literals cover a checkout without the generated profile: down-map
    # stage 4 widened 256->384 for 80k-point scenes.  The runtime drop
    # counters verify zero drops on every batch below either way.
    spec_kwargs = dict(
        pallas_conv=True,
        pallas_down_subwin=(0, 1280, 768, 768, 384),
        pallas_down_window=(0, 1536, 1024, 1024, 512),
    )
    prof_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "config",
        "band_profile.synthetic.yaml",
    )
    if os.path.exists(prof_path):
        from instancerefer_tpu.config import band_profile_kwargs

        spec_kwargs.update(band_profile_kwargs(prof_path))
        print(f"[bench] band profile: {prof_path}", file=sys.stderr)
    spec = BatchSpec(**spec_kwargs)
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)

    t0 = time.time()
    mean_size = np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
    np_batch = make_batch(
        batch_size,
        spec,
        seed=0,
        num_points=40000,
        num_instances=12,
        num_candidates=4,
        mean_size_arr=mean_size,
    )
    batch = batch_to_device_dict(np_batch, spec)
    band_drops = pop_band_diagnostics(batch)
    if any(d > 0 for d in band_drops.values()):
        print(f"[bench] WARNING: banded conv dropped neighbors {band_drops}", file=sys.stderr)
    print(f"[bench] data built in {time.time() - t0:.1f}s", file=sys.stderr)

    model = InstanceRefer(
        input_feature_dim=spec.feat_dim,
        num_classes=spec.num_classes,
        max_candidates=spec.max_candidates,
    )
    import functools

    t0 = time.time()
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch)
    jax.block_until_ready(variables)
    print(f"[bench] init in {time.time() - t0:.1f}s", file=sys.stderr)
    mean_size_j = jax.numpy.asarray(mean_size)

    @jax.jit
    def eval_step(variables, batch):
        out = model.apply(variables, batch, train=False)
        out = get_loss(out, mean_size_j)
        out = get_eval(out)
        return out["ref_iou"], out["ref_acc"], out["loss"]

    # one host->device transfer up front: the metric is device throughput
    # (training/eval overlap the per-batch feed with compute via prefetching)
    t0 = time.time()
    batch = jax.device_put(batch)
    jax.block_until_ready(jax.tree_util.tree_leaves(batch))
    print(f"[bench] h2d transfer {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    r = eval_step(variables, batch)
    jax.block_until_ready(r)
    print(f"[bench] compile+first step {time.time() - t0:.1f}s", file=sys.stderr)
    r = eval_step(variables, batch)
    jax.block_until_ready(r)

    t0 = time.time()
    for _ in range(iters):
        r = eval_step(variables, batch)
    np.asarray(r[0])  # full fetch: block_until_ready is unreliable on this backend
    dt = time.time() - t0
    scenes_per_sec = batch_size * iters / dt
    print(
        f"[bench] {iters} iters x {batch_size} scenes in {dt:.2f}s "
        f"-> {scenes_per_sec:.1f} scenes/s",
        file=sys.stderr,
    )

    # secondary: full training-step (fwd + loss + bwd + adam) throughput
    try:
        import optax

        from instancerefer_tpu.train.losses import get_loss

        tx = optax.adam(1e-3)
        opt_state = tx.init(variables["params"])

        @jax.jit
        def train_step(params, batch_stats, opt_state, batch):
            def loss_fn(p):
                out, upd = model.apply(
                    {"params": p, "batch_stats": batch_stats}, batch,
                    train=True, rngs={"dropout": jax.random.key(0)},
                    mutable=["batch_stats"],
                )
                out = get_loss(out, mean_size_j)
                return out["loss"], upd["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, stats, opt_state2, loss

        t0 = time.time()
        p, s, o, l = train_step(
            variables["params"], variables["batch_stats"], opt_state, batch
        )
        np.asarray(l)
        print(f"[bench] train-step compile {time.time() - t0:.1f}s", file=sys.stderr)
        n_train = max(iters // 2, 3)
        t0 = time.time()
        for _ in range(n_train):
            p, s, o, l = train_step(p, s, o, batch)
        np.asarray(l)
        tps = batch_size * n_train / (time.time() - t0)
        print(f"[bench] train throughput: {tps:.1f} scenes/s", file=sys.stderr)
    except Exception as e:  # secondary metric must never break the bench
        tps = 0.0
        print(f"[bench] train-step bench skipped: {e}", file=sys.stderr)

    # end-to-end: host pipeline (pad_sample/collate in threads, PaddedLoader
    # mechanics) feeding the device step.  NOTE this box has ONE cpu core;
    # production TPU hosts have ~100 (PERF.md) — e2e here is host-bound and
    # reported as the honest single-core floor, not the device capability.
    # Measurement discipline (VERDICT r3: a single-shot run recorded 9.4 ->
    # 2.2 scenes/s across rounds while the code got faster): MEDIANS over
    # >= 5 repeats, a worker count pinned to the core count, and the
    # per-phase split + provenance embedded in the JSON so a regression is
    # diagnosable from the artifact alone.
    e2e_scenes_per_sec = 0.0
    e2e_with_transfer = 0.0
    e2e_workers = min(4, os.cpu_count() or 1)
    n_e2e = 5
    phase_ms: dict = {}
    try:
        from concurrent.futures import ThreadPoolExecutor

        from instancerefer_tpu.data.pipeline import collate, pad_sample
        from instancerefer_tpu.data.synthetic import make_core_sample

        rng = np.random.default_rng(1)
        cores = [
            make_core_sample(
                rng, num_points=40000, num_instances=12, num_candidates=4,
                scan_idx=i, mean_size_arr=mean_size,
            )
            for i in range(batch_size)
        ]

        # per-sample phase split on one representative core — the SAME
        # implementation scripts/bench_host_pipeline.py reports, so the JSON
        # artifact and the dedicated host bench can never disagree.  Loaded
        # by file path (not sys.path) so scripts/ can never shadow later
        # imports of same-named modules (ADVICE r4).
        import importlib.util

        _bhp_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts",
            "bench_host_pipeline.py",
        )
        _bhp_spec = importlib.util.spec_from_file_location(
            "bench_host_pipeline", _bhp_path
        )
        _bhp = importlib.util.module_from_spec(_bhp_spec)
        _bhp_spec.loader.exec_module(_bhp)
        median_ms, phase_split = _bhp.median_ms, _bhp.phase_split

        phase_ms.update(phase_split(cores[0], spec, reps=5))
        padded_once = [pad_sample(c, spec) for c in cores]
        phase_ms["collate_ms"] = median_ms(
            lambda: collate(padded_once, spec), reps=5
        )
        print(f"[bench] host phase split (ms, median of 5): {phase_ms}", file=sys.stderr)

        def build_batch(pool):
            padded = list(pool.map(lambda c: pad_sample(c, spec), cores, chunksize=2))
            # per-key parallel collate (safe: called from this thread, not
            # from inside the pool)
            dd = batch_to_device_dict(collate(padded, spec, pool=pool), spec)
            pop_band_diagnostics(dd)
            return dd

        host_ts, full_ts = [], []
        with ThreadPoolExecutor(e2e_workers) as pool:
            warm = eval_step(variables, jax.device_put(build_batch(pool)))
            np.asarray(warm[0])
            for i in range(n_e2e):
                t0 = time.time()
                bb = build_batch(pool)
                host_ts.append(time.time() - t0)
                b = jax.device_put(bb)
                r = eval_step(variables, b)
                np.asarray(r[0])
                full_ts.append(time.time() - t0)
        # The transfer leg here crosses the remote-TPU *tunnel* (~200 MB/batch
        # at whatever the tunnel gives that day — measured 1.7-10.4 scenes/s
        # across sessions for the same code).  Production hosts feed their
        # chips over local PCIe, so the host-build rate is the stable,
        # representative number; the tunnel-inclusive rate is reported
        # separately for completeness.
        e2e_scenes_per_sec = batch_size / float(np.median(host_ts))
        e2e_with_transfer = batch_size / float(np.median(full_ts))
        print(
            f"[bench] e2e host build ({e2e_workers} workers, median of {n_e2e}): "
            f"{e2e_scenes_per_sec:.1f} scenes/s; incl. tunnel transfer+step: "
            f"{e2e_with_transfer:.1f} scenes/s "
            f"(host_s={[round(t, 2) for t in host_ts]})",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] e2e bench skipped: {e}", file=sys.stderr)

    # occupancy sweep: the exact empty-chunk skip makes throughput track LIVE
    # voxels, not the static caps — measure eval scenes/s at three scene
    # scales through the SAME compiled program (shapes are identical; only
    # the occupancy of the padded arrays changes)
    occupancy_curve = []
    try:
        for pts, ninst in ((10000, 6), (40000, 12), (80000, 16)):
            if pts == 40000:
                occ_batch, live = batch, None
            else:
                nb = make_batch(
                    batch_size, spec, seed=2, num_points=pts,
                    num_instances=ninst, num_candidates=4,
                    mean_size_arr=mean_size,
                )
                live = float((nb["scene_owner_0"] >= 0).mean())
                occ_batch = batch_to_device_dict(nb, spec)
                occ_drops = pop_band_diagnostics(occ_batch)
                if any(d > 0 for d in occ_drops.values()):
                    print(
                        f"[bench] WARNING: band drops at {pts} pts: {occ_drops}",
                        file=sys.stderr,
                    )
                occ_batch = jax.device_put(occ_batch)
            if live is None:
                live = float(np.asarray(np_batch["scene_owner_0"] >= 0).mean())
            r = eval_step(variables, occ_batch)
            np.asarray(r[0])  # warm (no recompile: same shapes)
            t0 = time.time()
            n_occ = max(iters // 2, 3)
            for _ in range(n_occ):
                r = eval_step(variables, occ_batch)
            np.asarray(r[0])
            sps = batch_size * n_occ / (time.time() - t0)
            occupancy_curve.append(
                {"points": pts, "live_voxel_frac": round(live, 3),
                 "eval_scenes_s": round(sps, 1)}
            )
            print(
                f"[bench] occupancy {pts} pts (live {live:.2f}) -> {sps:.1f} scenes/s",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"[bench] occupancy sweep skipped: {e}", file=sys.stderr)

    flops = model_flops_per_batch(spec, batch_size)
    mfu = flops * (scenes_per_sec / batch_size) / V5E_PEAK_BF16_FLOPS
    # train step = forward + dX + dW passes over the same convs (~3x the
    # useful forward FLOPs, the standard fwd:bwd accounting)
    train_mfu = 3 * flops * (tps / batch_size) / V5E_PEAK_BF16_FLOPS if tps else 0.0
    print(
        f"[bench] model flops/batch {flops/1e9:.1f} GF -> eval MFU {mfu:.3f}, "
        f"train MFU {train_mfu:.3f}",
        file=sys.stderr,
    )

    try:
        git_sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        git_sha = ""
    from instancerefer_tpu.ops.voxelize import native_available

    print(
        json.dumps(
            {
                "metric": "val_scenes_per_sec_per_chip",
                "value": round(scenes_per_sec, 2),
                "unit": "scenes/s",
                "vs_baseline": round(scenes_per_sec / A100_REFERENCE_SCENES_PER_SEC, 2),
                "baseline_note": "vs_baseline divides by a 15 scenes/s A100 ESTIMATE (reference publishes no throughput)",
                "device_scenes_s": round(scenes_per_sec, 2),
                "train_scenes_s": round(tps, 2),
                "e2e_scenes_s_1core_host": round(e2e_scenes_per_sec, 2),
                "e2e_scenes_s_incl_tunnel_transfer": round(e2e_with_transfer, 2),
                "eval_mfu": round(mfu, 4),
                "train_mfu": round(train_mfu, 4),
                "occupancy_curve": occupancy_curve,
                # host-side provenance: e2e numbers are medians; a regression
                # must be attributable from this artifact alone (VERDICT r3)
                "host_phase_ms": {k: round(v, 2) for k, v in phase_ms.items()},
                "e2e_workers": e2e_workers,
                "e2e_median_of": n_e2e,
                "native_voxelizer": native_available(),
                "nproc": os.cpu_count(),
                "git_sha": git_sha,
            }
        )
    )


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(bs, it)
