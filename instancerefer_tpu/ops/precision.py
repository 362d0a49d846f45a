"""Compute-dtype policy for the hot GEMMs.

The MXU natively multiplies bf16; f32 matmuls cost multiple passes.  The
policy casts matmul *inputs* (activations + weights) to a compute dtype while
keeping accumulation, parameters, normalization statistics and all
loss/eval math in f32 — the standard mixed-precision recipe for TPU training.

Global because it's read at trace time: set it once before jitting
(``set_compute_dtype(jnp.bfloat16)`` in bench/train CLIs; tests leave the
default f32 passthrough so numerical-parity oracles hold).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_COMPUTE_DTYPE: Optional[jnp.dtype] = None  # None => f32 passthrough


def set_compute_dtype(dtype) -> None:
    """dtype: None / 'float32' for full f32; 'bfloat16' for MXU-fast GEMMs."""
    global _COMPUTE_DTYPE
    if dtype is None or dtype == "float32" or dtype == jnp.float32:
        _COMPUTE_DTYPE = None
    else:
        _COMPUTE_DTYPE = jnp.dtype(dtype)


def get_compute_dtype():
    return _COMPUTE_DTYPE


def cast_in(x):
    """Cast a matmul input to the compute dtype (no-op in f32 mode)."""
    if _COMPUTE_DTYPE is not None and x.dtype == jnp.float32:
        return x.astype(_COMPUTE_DTYPE)
    return x
