"""Overfit sanity check: train on learnable synthetic scenes, watch ref_acc.

The synthetic 'largest' rule makes the referred object always the biggest
same-class instance — a signal the attribute encoder can learn.  A healthy
model should drive train ref_acc well above the 1/num_candidates chance level
within ~100 steps.  This is the TPU equivalent of the classic
"can it overfit one batch" check (the reference has no such tool).

    python scripts/sanity_train.py [steps] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(steps: int = 60, batch_size: int = 16):
    import jax

    from instancerefer_tpu.data.pipeline import BatchSpec, batch_to_device_dict
    from instancerefer_tpu.data.synthetic import make_batch
    from instancerefer_tpu.models.instancerefer import InstanceRefer
    from instancerefer_tpu.ops.precision import set_compute_dtype
    from instancerefer_tpu.train.solver import Solver

    from instancerefer_tpu.data.pipeline import pop_band_diagnostics

    set_compute_dtype("bfloat16")
    # banded Pallas path on a real TPU backend (the production train path);
    # XLA gather path elsewhere
    use_pallas = jax.default_backend() not in ("cpu", "gpu")
    spec = BatchSpec(
        max_tokens=24, max_instances=16, max_candidates=4,
        scene_caps=(4096, 2048, 1024, 512, 256),
        inst_caps=(4096, 2048, 1024, 512, 256),
        pallas_conv=use_pallas,
        data_shards=len(jax.devices()) if use_pallas else 1,
    )
    mean_size = np.linspace(0.3, 2.0, 18)[:, None] * np.array([[1.0, 0.9, 0.8]])

    print(f"building synthetic batches (largest-instance rule, pallas={use_pallas})...")
    n_batches = 4
    batches = []
    for s in range(n_batches):
        dd = batch_to_device_dict(
            make_batch(
                batch_size, spec, seed=s, num_points=8000, num_instances=8,
                num_candidates=3, mean_size_arr=mean_size, target_rule="largest",
            ),
            spec,
        )
        pop_band_diagnostics(dd)
        batches.append(dd)

    model = InstanceRefer(
        input_feature_dim=spec.feat_dim, num_classes=spec.num_classes,
        max_candidates=spec.max_candidates,
    )
    solver = Solver(
        model, mean_size, steps_per_epoch=n_batches, stamp="sanity",
        output_dir="/tmp/ir_tpu_sanity", lr=1e-3,
    )
    batches = [jax.device_put(b) for b in batches]
    solver.init_params(batches[0])
    solver._build_steps()

    t0 = time.time()
    accs, losses = [], []
    for step in range(steps):
        b = batches[step % n_batches]
        solver.rng, r = jax.random.split(solver.rng)
        params, stats, opt_state, metrics = solver._train_step(
            solver.state["params"], solver.state["batch_stats"],
            solver.state["opt_state"], b, r,
        )
        solver.state.update(params=params, batch_stats=stats, opt_state=opt_state)
        m = jax.device_get(metrics)
        accs.append(float(np.mean(m["ref_acc"])))
        losses.append(float(np.mean(m["loss"])))
        if step % 10 == 0 or step == steps - 1:
            print(
                f"step {step:4d}  loss {losses[-1]:7.3f}  ref_acc {accs[-1]:.3f}"
                f"  (elapsed {time.time()-t0:.0f}s)", flush=True,
            )

    early = float(np.mean(accs[: max(steps // 6, 1)]))
    late = float(np.mean(accs[-max(steps // 6, 1):]))
    print(f"\nref_acc early {early:.3f} -> late {late:.3f} (chance ~0.33)")
    if late >= 0.6 and losses[-1] < losses[0]:
        print("SANITY PASS: the model learns the synthetic signal")
        return 0
    print("SANITY WEAK: ref_acc did not clearly improve")
    return 1


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sys.exit(main(steps, bs))
