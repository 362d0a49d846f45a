"""Length-masked multi-layer bidirectional GRU as a `lax.scan`.

TPU-native replacement for the reference's cuDNN GRU +
``pack_padded_sequence``/``pad_packed_sequence`` (reference
``models/lang_module.py:22-28,53-57``; SURVEY.md §2.3 N8).  Pack/pad semantics
are reproduced with masks over a fixed ``T`` (=126, ``lib/config.py:74``) grid:

* forward direction: the hidden state stops updating at ``t >= length`` and
  outputs there are zero;
* backward direction: scanning t = T-1 .. 0 with updates gated on
  ``t < length`` makes the first effective step land exactly on the last valid
  token, which is precisely what packing achieves for the reverse pass;
* layer 2 consumes the (zero-padded) concatenated layer-1 outputs, matching
  the stacked-bidirectional layout of ``nn.GRU(num_layers=2)``.

Gate math follows torch's GRU cell:
  r = σ(x W_ir + b_ir + h W_hr + b_hr)
  z = σ(x W_iz + b_iz + h W_hz + b_hz)
  n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
  h' = (1 - z) * n + z * h
The three gates are fused into single [*, 3H] matmuls per step (two GEMMs per
timestep per direction), which is the efficient layout for the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class GRUCellScan(nn.Module):
    """One direction of one GRU layer, scanned over time with length masking."""

    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        """x: [B, T, C] -> outputs [B, T, H] (zeros past lengths)."""
        b, t, c = x.shape
        h = self.hidden_size
        scale = h ** -0.5  # torch GRU init: U(-1/sqrt(hidden), 1/sqrt(hidden))
        wx = self.param("wx", _uniform(scale), (c, 3 * h))
        wh = self.param("wh", _uniform(scale), (h, 3 * h))
        bx = self.param("bx", _uniform(scale), (3 * h,))
        bh = self.param("bh", _uniform(scale), (3 * h,))

        # Precompute all input projections in one big MXU matmul: [B*T, 3H].
        xproj = (x.reshape(b * t, c) @ wx + bx).reshape(b, t, 3 * h)

        ts = jnp.arange(t)
        if self.reverse:
            ts = ts[::-1]

        def step(hprev, ti):
            xp = xproj[:, ti]  # [B, 3H]
            hp = hprev @ wh + bh
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            hnew = (1.0 - z) * n + z * hprev
            valid = (ti < lengths)[:, None]
            hnext = jnp.where(valid, hnew, hprev)
            out = jnp.where(valid, hnew, 0.0)
            return hnext, out

        h0 = jnp.zeros((b, h), dtype=x.dtype)
        _, outs = jax.lax.scan(step, h0, ts)
        outs = jnp.swapaxes(outs, 0, 1)  # [B, T, H]
        if self.reverse:
            outs = outs[:, ::-1]
        return outs


class MaskedGRU(nn.Module):
    """Stacked (bi)directional GRU matching ``nn.GRU(batch_first=True)``."""

    hidden_size: int
    num_layers: int = 2
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        out = x
        for layer in range(self.num_layers):
            fwd = GRUCellScan(self.hidden_size, reverse=False, name=f"l{layer}_fwd")(
                out, lengths
            )
            if self.bidirectional:
                bwd = GRUCellScan(self.hidden_size, reverse=True, name=f"l{layer}_bwd")(
                    out, lengths
                )
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
        return out


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] -> [B, T] bool; mirrors ``models/lang_module.py:127-139``."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]
