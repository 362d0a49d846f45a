"""Masked GRU vs torch's cuDNN-semantics pack/pad GRU (CPU torch as oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancerefer_tpu.ops.gru import MaskedGRU, length_mask

torch = pytest.importorskip("torch")


def _copy_torch_weights(params, tgru, num_layers, bidirectional):
    """Overwrite MaskedGRU params with torch GRU weights (torch layout: [3H, C])."""
    out = dict(params)
    for layer in range(num_layers):
        for d, suffix in enumerate(["fwd", "bwd"] if bidirectional else ["fwd"]):
            sfx = "_reverse" if d == 1 else ""
            wih = getattr(tgru, f"weight_ih_l{layer}{sfx}").detach().numpy()
            whh = getattr(tgru, f"weight_hh_l{layer}{sfx}").detach().numpy()
            bih = getattr(tgru, f"bias_ih_l{layer}{sfx}").detach().numpy()
            bhh = getattr(tgru, f"bias_hh_l{layer}{sfx}").detach().numpy()
            out[f"l{layer}_{suffix}"] = {
                "wx": jnp.asarray(wih.T),
                "wh": jnp.asarray(whh.T),
                "bx": jnp.asarray(bih),
                "bh": jnp.asarray(bhh),
            }
    return out


@pytest.mark.parametrize("bidirectional", [False, True])
def test_masked_gru_matches_torch_pack(rng, bidirectional):
    b, t, c, h = 4, 11, 6, 5
    lengths = np.array([11, 7, 3, 1])
    x = rng.normal(size=(b, t, c)).astype(np.float32)

    tgru = torch.nn.GRU(c, h, num_layers=2, batch_first=True, bidirectional=bidirectional)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        yp, _ = tgru(packed)
    want, _ = torch.nn.utils.rnn.pad_packed_sequence(yp, batch_first=True, total_length=t)
    want = want.numpy()

    model = MaskedGRU(hidden_size=h, num_layers=2, bidirectional=bidirectional)
    # default (fast) matmul precision rounds through bf16 on some backends;
    # pin to highest for the numerical-parity comparison.
    with jax.default_matmul_precision("highest"):
        params = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lengths))["params"]
        params = _copy_torch_weights(params, tgru, 2, bidirectional)
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x), jnp.asarray(lengths)))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # pack semantics: outputs past each length are exactly zero
    for i, L in enumerate(lengths):
        assert np.all(got[i, L:] == 0.0)


def test_length_mask():
    m = np.asarray(length_mask(jnp.array([0, 2, 5]), 5))
    assert m.sum(1).tolist() == [0, 2, 5]
    assert m[1, :2].all() and not m[1, 2:].any()
