"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md §4 plan: multi-chip logic is tested with fake CPU
devices, the TPU analogue of a fake backend.  Must run before jax executes
any operation.
"""

import os

# Force cpu: the environment may preset JAX_PLATFORMS to a (single-tenant)
# remote TPU, which tests must never contend for.
os.environ["JAX_PLATFORMS"] = "cpu"
# torch's OpenMP runtime deadlocks against jax's thread pools in one process;
# single-threaded OpenMP avoids it (torch is only used as a tiny test oracle).
os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
# 8 virtual devices for data-parallel sharding tests (the
# --xla_force_host_platform_device_count XLA flag is ignored on this jax).
jax.config.update("jax_num_cpu_devices", 8)
# This environment's default matmul precision rounds f32 through bf16 (the
# fast MXU path the production model intentionally uses); numerical-parity
# tests need true f32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
