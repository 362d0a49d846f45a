"""Training-trajectory golden: the REAL solver optimizer stack (torch-Adam
semantics via ``make_optimizer``, MultiStepLR epoch mapping, BN-momentum
schedule, train-mode BN stat flow, masked-loss averaging) run for several
steps against torch ``optim.Adam`` + ``MultiStepLR`` + the BN-momentum
scheduler driving the train-mode CPU replica (golden_replica.ReplicaTrain).

Reference semantics being pinned as a SYSTEM (not per-part):
  /root/reference/scripts/train.py:112    optim.Adam(lr, weight_decay)
  /root/reference/lib/solver.py:119-126   MultiStepLR per epoch
  /root/reference/lib/solver.py:128-137   BNMomentumScheduler
  /root/reference/lib/loss_helper.py:263  loss division by batch size

Both sides start from identical weights and batch_stats, consume the same
fixture batch every step (dropout 0 — ``dropout_override=0.0`` on the flax
model; the replica has no dropout), and must produce parameter AND running-
stat trajectories that track within fp tolerance across lr boundaries and a
BN-momentum change.
"""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import golden_replica as gr
import test_golden_model as tgm

from instancerefer_tpu.data.pipeline import batch_to_device_dict, collate, pad_sample
from instancerefer_tpu.models.instancerefer import InstanceRefer
from instancerefer_tpu.train.losses import get_loss
from instancerefer_tpu.train.solver import bn_momentum_for_epoch, make_optimizer

# full-tier only: heavy compiles / torch oracles (see pytest.ini)
pytestmark = pytest.mark.slow

N_STEPS = 4
# wd larger than the reference's 1e-5 so the L2-into-grad fold is actually
# visible at trajectory tolerances (wd*p must rival real gradient scale for
# an ordering bug to move parameters measurably); the semantics under test
# are identical at any wd
LR, WD = 1e-3, 1e-2
MILESTONES, GAMMA = [1, 3], 0.1  # two lr boundaries inside the trajectory
BN_STEP, BN_RATE = 2, 0.5  # momentum changes at step 2

# torch MultiStepLR lr at step k (0-indexed; scheduler steps after each
# epoch): lr * gamma^(#milestones <= k)
LR_AT = [LR * GAMMA ** sum(m <= k for m in MILESTONES) for k in range(N_STEPS)]
LR_CUM = np.cumsum(LR_AT)


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaves(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


def _torch_ddt(cores, spec):
    tmax = spec.max_tokens
    lang_feat = np.zeros((len(cores), tmax, 300), np.float32)
    for i, c in enumerate(cores):
        lang_feat[i, : c.lang_feat.shape[0]] = c.lang_feat[:tmax]
    return {
        "lang_feat": torch.tensor(lang_feat),
        "lang_len": np.array([c.lang_len for c in cores], np.int64),
        "object_cat": np.array([c.object_cat for c in cores], np.int64),
        "instance_points": [c.instance_points for c in cores],
        "instance_class": [c.instance_class for c in cores],
        "instance_obbs": [c.instance_obbs for c in cores],
        "point_min": np.stack([c.point_cloud[:, :3].min(0) for c in cores]),
        "point_max": np.stack([c.point_cloud[:, :3].max(0) for c in cores]),
        "ref_center_label": np.stack([c.ref_center_label for c in cores]),
        "ref_size_class_label": np.array([c.ref_size_class_label for c in cores]),
        "ref_size_residual_label": np.stack(
            [c.ref_size_residual_label for c in cores]
        ),
        "lidar": [
            gr.quantize_first(c.point_cloud[:, :3], c.point_cloud[:, :7], 0.05)
            for c in cores
        ],
    }


@pytest.fixture(scope="module")
def trajectories():
    cores = tgm._make_cores()
    padded = [pad_sample(c, tgm.SPEC) for c in cores]
    dd = batch_to_device_dict(collate(padded, tgm.SPEC), tgm.SPEC)

    model = InstanceRefer(
        input_feature_dim=tgm.SPEC.feat_dim, num_classes=18,
        max_candidates=tgm.SPEC.max_candidates, dropout_override=0.0,
    )
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(3), "dropout": jax.random.key(4)}, dd
    )
    params0 = jax.device_get(variables["params"])
    stats0 = jax.device_get(variables["batch_stats"])

    # ---- flax side: the solver's real optimizer + train-step semantics
    tx = make_optimizer(LR, WD, MILESTONES, GAMMA, steps_per_epoch=1)

    @functools.partial(jax.jit, static_argnames=("bn_momentum",))
    def train_step(params, batch_stats, opt_state, dd, bn_momentum):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, dd, train=True,
                bn_momentum=bn_momentum, rngs={"dropout": jax.random.key(0)},
                mutable=["batch_stats"],
            )
            out = get_loss(out, jnp.asarray(tgm.MEAN_SIZE))
            return out["loss"], (upd["batch_stats"], out["loss"])

        (loss, (stats, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, stats, opt_state, loss

    params, stats = params0, stats0
    opt_state = tx.init(params)
    jx_traj, jx_stats, jx_loss = [], [], []
    for step in range(N_STEPS):
        bn_m = bn_momentum_for_epoch(step, BN_STEP, BN_RATE)
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, dd, bn_momentum=bn_m
        )
        jx_traj.append(jax.device_get(params))
        jx_stats.append(jax.device_get(stats))
        jx_loss.append(float(loss))

    # ---- torch side: Adam + MultiStepLR + BN momentum over the replica
    params_t = gr.torch_param_tree(params0)
    replica = gr.ReplicaTrain(params_t, stats0, voxel_size_ap=0.02)

    def leaves_excluding_gru(t, path=""):
        if isinstance(t, dict):
            out = []
            for k, v in t.items():
                if path == "/lang" and k == "gru":
                    continue  # trained via the nn.GRU module's own params
                out += leaves_excluding_gru(v, f"{path}/{k}")
            return out
        return [t]

    opt_params = leaves_excluding_gru(params_t) + list(replica.lang.gru.parameters())
    opt = torch.optim.Adam(opt_params, lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=MILESTONES, gamma=GAMMA)

    t_traj, t_stats, t_loss = [], [], []
    grads0 = None
    for step in range(N_STEPS):
        replica.set_bn_momentum(bn_momentum_for_epoch(step, BN_STEP, BN_RATE))
        opt.zero_grad()
        ddt = _torch_ddt(cores, tgm.SPEC)
        out = replica.forward(ddt)
        out = gr.replica_get_loss(out, tgm.MEAN_SIZE)
        out["loss"].backward()
        if step == 0:
            grads0 = gr.collect_param_grads(params_t, replica)
        t_loss.append(float(out["loss"].detach()))
        opt.step()
        sched.step()
        t_traj.append(gr.param_value_tree(params_t, replica))
        t_stats.append(replica.running_stats_tree())

    return jx_traj, jx_stats, jx_loss, t_traj, t_stats, t_loss, grads0


def test_losses_track(trajectories):
    _, _, jx_loss, _, _, t_loss, _ = trajectories
    np.testing.assert_allclose(jx_loss, t_loss, rtol=2e-3, atol=2e-3)
    # the trajectory is non-trivial: the loss actually moves
    assert abs(jx_loss[-1] - jx_loss[0]) > 1e-3


def _two_tier(a, b, step, name, tight_frac=0.998):
    """Trajectory comparison that tolerates Adam's gauge random-walk.

    Adam normalizes gradient magnitude away, so any element whose true
    gradient is ~0 (gauge directions: biases feeding straight into
    BatchNorm, attention-logit biases under softmax shift invariance, and
    individual near-zero-grad elements inside otherwise-live kernels) moves
    by +-lr_k per step with a SIGN decided by fp noise — on both sides,
    with no loss consequence.  So: (1) every element must lie within the
    cumulative-lr random-walk envelope, and (2) at least ``tight_frac`` of
    elements must match tightly.  A real semantic bug (wrong wd fold,
    schedule off-by-one, BN momentum mismatch) perturbs most elements of
    most leaves beyond the tight tolerance and fails (2)."""
    diff = np.abs(a - b)
    loose = 2.5 * LR_CUM[step] + 5e-3 * np.abs(b)
    bad = diff > loose
    assert not bad.any(), (
        f"step {step} {name}: {bad.sum()} elements beyond the lr random-walk "
        f"envelope (max diff {diff.max():.2e}, envelope {2.5 * LR_CUM[step]:.2e})"
    )
    scale = max(float(np.abs(b).max()), 1e-3)
    # absolute floor 2e-5 per elapsed step: f32 reduction noise accumulates
    # on leaves still near their (zero) init, e.g. BN biases after a few
    # ~lr-sized steps; a semantic bug moves elements by >= ~0.1*lr = 1e-4
    tight = diff <= 5e-3 * np.abs(b) + max(5e-3 * scale, 2e-5 * (step + 1))
    frac = float(tight.mean())
    assert frac >= tight_frac, (
        f"step {step} {name}: only {frac:.4f} of elements match tightly "
        f"(max diff {diff.max():.2e}, |b|max {scale:.2e})"
    )


def test_param_trajectories_track(trajectories):
    """Every parameter tracks torch's trajectory at every step (two-tier:
    see _two_tier for the Adam gauge-direction rationale)."""
    jx_traj, _, _, t_traj, _, _, grads0 = trajectories
    g0 = dict(_leaves(grads0))
    gauge = []
    for step in range(N_STEPS):
        jl = dict(_leaves(jx_traj[step]))
        tl = dict(_leaves(t_traj[step]))
        assert set(jl) == set(tl)
        for name in sorted(jl):
            if float(np.abs(g0[name]).max()) < 1e-4:
                # whole leaf is a gauge direction — the envelope bound is the
                # only meaningful check
                if step == 0:
                    gauge.append(name)
                _two_tier(jl[name], tl[name], step, name, tight_frac=0.0)
                continue
            _two_tier(jl[name], tl[name], step, name)
    # the gauge list must stay small (else we'd be testing air)
    assert len(gauge) < 0.15 * len(g0), gauge


def test_running_stat_trajectories_track(trajectories):
    """Train-mode BN running statistics (incl. the momentum schedule change
    at step 2) track torch BN's across all steps.  Running MEANS of BNs fed
    by biased layers inherit the bias gauge random-walk (the mean shifts
    with the bias while the BN output is invariant), so they get the same
    two-tier treatment; variances are shift-invariant and must track."""
    _, jx_stats, _, _, t_stats, _, _ = trajectories
    for step in range(N_STEPS):
        jl = dict(_leaves(jx_stats[step]))
        tl = dict(_leaves(t_stats[step]))
        assert set(jl) == set(tl)
        for name in sorted(jl):
            _two_tier(jl[name], tl[name], step, name)
