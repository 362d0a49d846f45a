"""MaskedBatchNorm + BN-momentum schedule vs torch oracles.

The reference's BN is torch BatchNorm1d driven by BNMomentumScheduler
(``lib/scheduler_helper.py``, ``lib/solver.py:128-137``).  MaskedBatchNorm
claims exact torch semantics (biased batch variance for normalization,
unbiased running_var, momentum = new-batch weight); this proves it the same
way test_gru.py proves the GRU — weight copy + multi-step stat tracking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancerefer_tpu.models.basic_blocks import MaskedBatchNorm
from instancerefer_tpu.train.solver import bn_momentum_for_epoch

torch = pytest.importorskip("torch")


def _run_flax_steps(x_steps, mask, momenta, scale, bias):
    """Run K training steps through MaskedBatchNorm; return per-step outputs,
    final running stats, and an eval-mode output on the last step's input."""
    c = x_steps[0].shape[-1]
    bn = MaskedBatchNorm(c)
    variables = bn.init(
        jax.random.key(0), jnp.asarray(x_steps[0]), jnp.asarray(mask),
        train=True, momentum=momenta[0],
    )
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }
    outs = []
    for x, m in zip(x_steps, momenta):
        y, updates = bn.apply(
            variables, jnp.asarray(x), jnp.asarray(mask),
            train=True, momentum=m, mutable=["batch_stats"],
        )
        variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}
        outs.append(np.asarray(y))
    y_eval = np.asarray(
        bn.apply(variables, jnp.asarray(x_steps[-1]), jnp.asarray(mask), train=False)
    )
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    return outs, stats, y_eval


def test_masked_bn_matches_torch_multistep(rng):
    n, c, valid = 32, 5, 20
    mask = np.zeros(n, bool)
    mask[:valid] = True
    momenta = [0.5, 0.1, 0.05]  # a BNMomentumScheduler-style decaying sequence
    x_steps = [rng.normal(size=(n, c)).astype(np.float32) * 3 + 1 for _ in momenta]
    scale = rng.normal(size=c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(scale))
        tbn.bias.copy_(torch.tensor(bias))

    torch_outs = []
    tbn.train()
    for x, m in zip(x_steps, momenta):
        tbn.momentum = m  # what set_bn_momentum_default does per epoch
        with torch.no_grad():
            torch_outs.append(tbn(torch.tensor(x[mask])).numpy())
    tbn.eval()
    with torch.no_grad():
        torch_eval = tbn(torch.tensor(x_steps[-1][mask])).numpy()

    flax_outs, stats, y_eval = _run_flax_steps(x_steps, mask, momenta, scale, bias)

    for got, want in zip(flax_outs, torch_outs):
        np.testing.assert_allclose(got[mask], want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(stats["mean"], tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["var"], tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(y_eval[mask], torch_eval, rtol=1e-5, atol=1e-5)


def test_masked_bn_ignores_padding_rows(rng):
    """Garbage in padded rows must not affect valid-row outputs or stats."""
    n, c = 16, 3
    mask = np.zeros(n, bool)
    mask[:10] = True
    x = rng.normal(size=(n, c)).astype(np.float32)
    x2 = x.copy()
    x2[~mask] = 1e6  # poison the padding
    scale = np.ones(c, np.float32)
    bias = np.zeros(c, np.float32)
    out1, stats1, _ = _run_flax_steps([x], mask, [0.1], scale, bias)
    out2, stats2, _ = _run_flax_steps([x2], mask, [0.1], scale, bias)
    np.testing.assert_allclose(out1[0][mask], out2[0][mask], rtol=1e-6)
    np.testing.assert_allclose(stats1["mean"], stats2["mean"], rtol=1e-6)
    np.testing.assert_allclose(stats1["var"], stats2["var"], rtol=1e-6)


def test_bn_momentum_schedule_matches_reference():
    """lib/solver.py:128-137: lmbd = max(0.5 * rate^(epoch//step), 0.001),
    applied as module.momentum at the start of each epoch."""
    step, rate = 10, 0.5
    for epoch in range(0, 120, 7):
        want = max(0.5 * rate ** (epoch // step), 0.001)
        assert bn_momentum_for_epoch(epoch, step, rate) == pytest.approx(want)
    # clamp engages for late epochs
    assert bn_momentum_for_epoch(200, step, rate) == pytest.approx(0.001)
    # disabled schedule -> torch default momentum
    assert bn_momentum_for_epoch(5, None, None) == 0.1


def test_bn_stats_stay_f32_for_bf16_activations(rng):
    """bf16 activation storage (round 3) must not corrupt BN statistics:
    jnp.square on bf16 loses the E[x^2] - mean^2 cancellation (measured
    12x-wrong variance for |mean| >> std), so the stats path must upcast.
    Tested for both the masked and the mask-free branches."""
    c = 8
    x = (10.0 + 0.1 * rng.normal(size=(4096, c))).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    true_var = np.var(np.asarray(xb, np.float32), axis=0)

    for mask in (jnp.ones((4096,), jnp.float32), None):
        bn = MaskedBatchNorm(c)
        variables = bn.init(jax.random.key(0), xb, mask, train=True)
        _, upd = bn.apply(
            variables, xb, mask, train=True, momentum=1.0,
            mutable=["batch_stats"],
        )
        got_var = np.asarray(upd["batch_stats"]["var"])
        unbiased = true_var * 4096 / 4095
        np.testing.assert_allclose(got_var, unbiased, rtol=0.05)
