"""Persistent XLA compilation cache.

First compilation of the full model through a remote-TPU tunnel costs
~7-11 minutes; the persistent cache reduces repeat runs (same jax/XLA
version, same program) to seconds.  Opt-out with IR_TPU_COMPILE_CACHE=0,
redirect with IR_TPU_COMPILE_CACHE=/path.

The reference has no analogue (torch eager doesn't compile); this is part
of the TPU-native runtime story (SURVEY.md §5 aux subsystems).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Best-effort enable; returns the cache dir or None."""
    cache = os.environ.get(
        "IR_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/ir_tpu_xla")
    )
    if not cache or cache == "0":
        return None
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache anything that took >= 10 s to compile (the model steps);
        # skip tiny throwaway programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        return cache
    except Exception:
        return None
