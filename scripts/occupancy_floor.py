"""Decompose the low-occupancy eval floor (VERDICT r4 #6).

The round-4 occupancy curve showed throughput does NOT track live occupancy
1:1 — live fraction 0.40 vs 0.73 nearly halves the work but only gains ~23%
throughput, so a large occupancy-INDEPENDENT floor dominates the 10k-pt eval
step.  "Throughput tracks live occupancy" (PERF.md round-3) is only honest if
stated with its intercept.  This script measures that intercept and breaks it
into components.

Method: the top model is four flag-gated modules (lang -> attribute ->
relation -> scene, `models/instancerefer.py`); loss+eval is an epilogue over
the forward output.  We time forward-only programs for nested flag subsets
and difference them:

    lang                = t(lang only)
    attribute           = t(lang+attr)       - t(lang)
    relation            = t(lang+attr+rel)   - t(lang+attr)
    scene (convs + BEV) = t(full forward)    - t(lang+attr+rel)
    loss+eval epilogue  = t(loss+eval on a captured forward output)
    dispatch residue    = t(full eval step)  - t(full forward) - epilogue

each at the three bench occupancies (10k/40k/80k points through the SAME
compiled program per variant — shapes are static, only the data's live
fraction changes).  A component whose time is flat across occupancies is
floor; one that moves is the part the empty-chunk skip already harvests.
Differencing shares the caveat that XLA fuses across module boundaries, so
per-module times are additive estimates, not exact schedules — but the
fixed-vs-scaling split (the question VERDICT asks) is robust to that: a
fused boundary moves cost between adjacent rows, not between the flat and
scaling buckets.

Run on the real TPU (single-tenant — nothing else may touch it):

    python scripts/occupancy_floor.py [batch=32] [iters=20]

Prints a per-component table (stderr) and one JSON line (stdout).
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALES = ((10000, 6), (40000, 12), (80000, 16))  # bench.py occupancy sweep


def time_ms(fn, *args, iters=20):
    """Median-free single-window timing, matching bench.py discipline: warm
    once (fetch to sync — block_until_ready is unreliable on the tunnel),
    then one timed window of `iters` calls with a single trailing fetch."""
    r = fn(*args)
    _fetch(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    _fetch(r)
    return (time.time() - t0) * 1000.0 / iters


def _fetch(r):
    # sync on a COMPUTED output (lang_scores exists in every forward
    # variant), not an arbitrary leaf that might be an input pass-through
    if isinstance(r, dict) and "lang_scores" in r:
        np.asarray(r["lang_scores"])
        return
    leaves = [x for x in _leaves(r)]
    np.asarray(leaves[-1])


def _leaves(r):
    import jax

    return jax.tree_util.tree_leaves(r)


def main(batch_size=32, iters=20):
    import jax

    from instancerefer_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from instancerefer_tpu.config import band_profile_kwargs
    from instancerefer_tpu.data.pipeline import (
        BatchSpec,
        batch_to_device_dict,
        pop_band_diagnostics,
    )
    from instancerefer_tpu.data.synthetic import make_batch
    from instancerefer_tpu.models.instancerefer import InstanceRefer
    from instancerefer_tpu.ops.precision import set_compute_dtype
    from instancerefer_tpu.train.evaluate import get_eval
    from instancerefer_tpu.train.losses import get_loss

    set_compute_dtype("bfloat16")

    spec_kwargs = dict(
        pallas_conv=True,
        pallas_down_subwin=(0, 1280, 768, 768, 384),
        pallas_down_window=(0, 1536, 1024, 1024, 512),
    )
    prof = os.path.join(REPO, "config", "band_profile.synthetic.yaml")
    if os.path.exists(prof):
        spec_kwargs.update(band_profile_kwargs(prof))
    spec = BatchSpec(**spec_kwargs)
    mean_size = np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])
    mean_size_j = jax.numpy.asarray(mean_size)

    print(f"[floor] devices: {jax.devices()}", file=sys.stderr)
    batches, lives = [], []
    for pts, ninst in SCALES:
        nb = make_batch(
            batch_size, spec, seed=2 if pts != 40000 else 0, num_points=pts,
            num_instances=ninst, num_candidates=4, mean_size_arr=mean_size,
        )
        lives.append(float((nb["scene_owner_0"] >= 0).mean()))
        dd = batch_to_device_dict(nb, spec)
        pop_band_diagnostics(dd)
        batches.append(jax.device_put(dd))
    print(
        f"[floor] live voxel fracs: {[round(l, 3) for l in lives]}",
        file=sys.stderr,
    )

    # nested module subsets (scene consumes attribute's obj_feats, so the
    # chain is the only valid nesting order)
    variants = [
        ("lang", dict(use_attribute=False, use_relation=False, use_scene=False)),
        ("+attribute", dict(use_relation=False, use_scene=False)),
        ("+relation", dict(use_scene=False)),
        ("+scene", dict()),
    ]
    fwd_ms = {}  # name -> [ms at each scale]
    full_variables = None
    for name, flags in variants:
        model = InstanceRefer(
            input_feature_dim=spec.feat_dim, num_classes=spec.num_classes,
            max_candidates=spec.max_candidates, **flags,
        )
        t0 = time.time()
        variables = jax.jit(functools.partial(model.init, train=False))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batches[1],
        )
        _fetch(variables)
        fwd = jax.jit(functools.partial(model.apply, train=False))
        ts = [time_ms(fwd, variables, b, iters=iters) for b in batches]
        fwd_ms[name] = ts
        print(
            f"[floor] forward {name:11s}: "
            + "  ".join(f"{t:7.2f} ms" for t in ts)
            + f"  (init+compile {time.time() - t0 - sum(ts) * iters / 1000:.0f}s)",
            file=sys.stderr,
        )
        if name == "+scene":
            full_variables, full_model = variables, model

    # epilogue: loss+eval on a captured forward output (per scale — candidate
    # occupancy differs across scales)
    out_by_scale = [
        jax.jit(functools.partial(full_model.apply, train=False))(
            full_variables, b
        )
        for b in batches
    ]
    _fetch(out_by_scale[-1])

    @jax.jit
    def epilogue(out):
        o = get_eval(get_loss(out, mean_size_j))
        return o["ref_iou"], o["ref_acc"], o["loss"]

    epi_ms = [time_ms(epilogue, o, iters=iters) for o in out_by_scale]
    print(
        "[floor] loss+eval epi : " + "  ".join(f"{t:7.2f} ms" for t in epi_ms),
        file=sys.stderr,
    )

    # the production fused program, for the dispatch/fusion residue
    @jax.jit
    def eval_step(variables, batch):
        out = full_model.apply(variables, batch, train=False)
        out = get_eval(get_loss(out, mean_size_j))
        return out["ref_iou"], out["ref_acc"], out["loss"]

    step_ms = [time_ms(eval_step, full_variables, b, iters=iters) for b in batches]
    print(
        "[floor] full eval step: " + "  ".join(f"{t:7.2f} ms" for t in step_ms),
        file=sys.stderr,
    )

    comp = {
        "lang": fwd_ms["lang"],
        "attribute": [b - a for a, b in zip(fwd_ms["lang"], fwd_ms["+attribute"])],
        "relation": [b - a for a, b in zip(fwd_ms["+attribute"], fwd_ms["+relation"])],
        "scene": [b - a for a, b in zip(fwd_ms["+relation"], fwd_ms["+scene"])],
        "epilogue": epi_ms,
        "fusion_residue": [
            s - f - e for s, f, e in zip(step_ms, fwd_ms["+scene"], epi_ms)
        ],
    }

    # intercept: least-squares step_ms = a * live + b over the three scales
    a, b = np.polyfit(lives, step_ms, 1)
    hdr = "  ".join(f"{p[0] // 1000:>5d}k" for p in SCALES)
    print(f"\n[floor] component         {hdr}   (ms/batch of {batch_size})", file=sys.stderr)
    for k, v in comp.items():
        flat = max(v) - min(v) < 0.15 * max(max(v), 1e-9)
        tag = "FLOOR" if flat else "scales"
        print(
            f"[floor] {k:15s} " + "  ".join(f"{t:6.2f}" for t in v) + f"   {tag}",
            file=sys.stderr,
        )
    print(
        f"[floor] linear fit: step_ms = {a:.1f} * live_frac + {b:.1f} "
        f"(intercept {b:.1f} ms = {100 * b / step_ms[0]:.0f}% of the 10k step)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "batch": batch_size,
                "iters": iters,
                "live_voxel_frac": [round(l, 3) for l in lives],
                "forward_ms": {k: [round(t, 2) for t in v] for k, v in fwd_ms.items()},
                "component_ms": {k: [round(t, 2) for t in v] for k, v in comp.items()},
                "eval_step_ms": [round(t, 2) for t in step_ms],
                "fit_slope_ms": round(float(a), 2),
                "fit_intercept_ms": round(float(b), 2),
            }
        )
    )


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(bs, it)
