"""Micro-bench: MaskedGRU scan `unroll` factor on the real TPU.

The lang module is a ~3.5 ms/batch occupancy-independent floor of the eval
step (scripts/occupancy_floor.py), dominated by the 2T sequential scan steps
of the fused bidirectional GRU (ops/gru.py).  Each step is a latency-bound
[2,B,H]x[2,H,3H] dot_general; `lax.scan(unroll=k)` amortizes loop overhead
across k steps and lets XLA fuse the elementwise gate math across them.

Run solo on the TPU (single-tenant):  python scripts/bench_gru_unroll.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main(batch=32, tokens=126, emb=300, hidden=128, iters=50):
    from instancerefer_tpu.ops import gru as gru_mod

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, tokens, emb)), jnp.float32)
    lengths = jnp.asarray(rng.integers(5, tokens + 1, size=(batch,)), jnp.int32)

    results = {}
    ref_out = None
    for unroll in (1, 2, 4, 8, 16):
        gru_mod.SCAN_UNROLL = unroll
        model = gru_mod.MaskedGRU(hidden_size=hidden, num_layers=2)
        variables = model.init(jax.random.key(0), x, lengths)
        fn = jax.jit(lambda v, x, l: model.apply(v, x, l))
        out = fn(variables, x, lengths)
        jax.block_until_ready(out)
        if ref_out is None:
            ref_out = np.asarray(out)
        else:
            err = float(np.max(np.abs(np.asarray(out) - ref_out)))
            assert err < 1e-5, f"unroll={unroll} changed outputs: {err}"
        t0 = time.time()
        for _ in range(iters):
            out = fn(variables, x, lengths)
        np.asarray(out)
        ms = (time.time() - t0) / iters * 1e3
        results[unroll] = ms
        print(f"unroll={unroll:2d}: {ms:.3f} ms/batch", file=sys.stderr)
    best = min(results, key=results.get)
    print(f"best: unroll={best} ({results[best]:.3f} ms vs "
          f"unroll=1 {results[1]:.3f} ms)", file=sys.stderr)


if __name__ == "__main__":
    main()
