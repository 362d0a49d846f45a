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

# `lax.scan` unroll factor for the sequential GRU time loop.  The per-step
# body is a latency-bound [2,B,H]x[2,H,3H] dot_general; unrolling amortizes
# loop overhead and lets XLA fuse gate math across k steps.  Measured on
# v5e (scripts/bench_gru_unroll.py); module-level so the bench can sweep it.
SCAN_UNROLL = 1


def _uniform(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class GRUCellScan(nn.Module):
    """One direction of one GRU layer, scanned over time with length masking."""

    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray, params_only=False):
        """x: [B, T, C] -> outputs [B, T, H] (zeros past lengths).

        ``params_only=True`` just defines/returns (wx, wh, bx, bh) so
        ``MaskedGRU`` can run both directions of a layer in ONE fused scan
        while the parameter tree keeps the exact per-direction layout the
        torch converter and goldens pin."""
        b, t, c = x.shape
        h = self.hidden_size
        scale = h ** -0.5  # torch GRU init: U(-1/sqrt(hidden), 1/sqrt(hidden))
        wx = self.param("wx", _uniform(scale), (c, 3 * h))
        wh = self.param("wh", _uniform(scale), (h, 3 * h))
        bx = self.param("bx", _uniform(scale), (3 * h,))
        bh = self.param("bh", _uniform(scale), (3 * h,))
        if params_only:
            return wx, wh, bx, bh

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
        _, outs = jax.lax.scan(step, h0, ts, unroll=SCAN_UNROLL)
        outs = jnp.swapaxes(outs, 0, 1)  # [B, T, H]
        if self.reverse:
            outs = outs[:, ::-1]
        return outs


class MaskedGRU(nn.Module):
    """Stacked (bi)directional GRU matching ``nn.GRU(batch_first=True)``.

    The bidirectional case runs BOTH directions of a layer in one fused
    ``lax.scan``: the backward direction consumes the time-reversed input
    stream, the two hidden states ride a stacked [2, B, H] carry, and the
    per-step recurrent matmul is one batched [2,B,H]x[2,H,3H] dot_general.
    The scan step is latency-bound at these shapes (measured: the lang
    module is a ~3.7 ms/batch occupancy-independent floor of the eval
    step, scripts/occupancy_floor.py), so halving the sequential step
    count (4T -> 2T per 2-layer stack) attacks the floor directly while
    the math and the per-direction parameter tree stay exactly those of
    torch ``nn.GRU`` (oracle-pinned by tests/test_gru.py)."""

    hidden_size: int
    num_layers: int = 2
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        out = x
        for layer in range(self.num_layers):
            fwd_mod = GRUCellScan(self.hidden_size, reverse=False,
                                  name=f"l{layer}_fwd")
            if not self.bidirectional:
                out = fwd_mod(out, lengths)
                continue
            bwd_mod = GRUCellScan(self.hidden_size, reverse=True,
                                  name=f"l{layer}_bwd")
            pf = fwd_mod(out, lengths, params_only=True)
            pb = bwd_mod(out, lengths, params_only=True)
            out = _fused_bidir_scan(out, lengths, pf, pb)
        return out


def _fused_bidir_scan(x, lengths, pf, pb):
    """One scan for both directions: j indexes forward time for direction 0
    and reversed time (t = T-1-j) for direction 1, reproducing the packed
    reverse-pass semantics of GRUCellScan(reverse=True)."""
    b, t, c = x.shape
    h = pf[1].shape[0]
    # input projections for all timesteps, one GEMM per direction
    xproj_f = (x.reshape(b * t, c) @ pf[0] + pf[2]).reshape(b, t, 3 * h)
    xproj_b = (x.reshape(b * t, c) @ pb[0] + pb[2]).reshape(b, t, 3 * h)
    # direction 1 sees reversed time; stack to [T, 2, B, 3H] scan stream
    xp = jnp.stack([xproj_f, xproj_b[:, ::-1]], axis=0)  # [2, B, T, 3H]
    xp = jnp.moveaxis(xp, 2, 0)  # [T, 2, B, 3H]
    ts = jnp.arange(t)
    tval = jnp.stack([ts, ts[::-1]], axis=1)  # [T, 2] real time per direction
    wh = jnp.stack([pf[1], pb[1]], axis=0)  # [2, H, 3H]
    bh = jnp.stack([pf[3], pb[3]], axis=0)  # [2, 3H]

    def step(hprev, inp):
        xp_j, tv = inp  # [2, B, 3H], [2]
        hp = (
            jax.lax.dot_general(
                hprev, wh, (((2,), (1,)), ((0,), (0,)))
            )
            + bh[:, None]
        )
        xr, xz, xn = jnp.split(xp_j, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        hnew = (1.0 - z) * n + z * hprev
        valid = (tv[:, None] < lengths[None, :])[..., None]  # [2, B, 1]
        hnext = jnp.where(valid, hnew, hprev)
        out = jnp.where(valid, hnew, 0.0)
        return hnext, out

    h0 = jnp.zeros((2, b, h), dtype=x.dtype)
    _, outs = jax.lax.scan(step, h0, (xp, tval),
                           unroll=SCAN_UNROLL)  # outs [T, 2, B, H]
    fwd = jnp.moveaxis(outs[:, 0], 0, 1)  # [B, T, H]
    bwd = jnp.moveaxis(outs[:, 1], 0, 1)[:, ::-1]
    return jnp.concatenate([fwd, bwd], axis=-1)


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] -> [B, T] bool; mirrors ``models/lang_module.py:127-139``."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]
