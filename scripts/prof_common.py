"""Shared timing harness for the prof_* scripts.

Import from HERE, not from prof_bg_stem (whose module body runs its whole
benchmark suite at import — several prof scripts used to pay ~3 min of
someone else's measurements before their own first line).

The scan harness carries a ~1.7-2.1 ms fixed floor per measurement (the
tunneled dispatch+readback divided by K; docs/perf_notes.md) — subtract it
when comparing absolute numbers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

K = 20


def scan_loop(body, k: int = K):
    """Jit ``body(x, i)`` into a K-iteration scan with one scalar readback."""

    @jax.jit
    def run(x, salt):
        def step(c, i):
            out = body(x, i + salt)
            return c + jax.tree_util.tree_reduce(
                lambda a, b: a + b.ravel()[::65536].astype(jnp.float32).sum(),
                out,
                jnp.float32(0),
            ), ()

        return jax.lax.scan(
            step, jnp.float32(0), jnp.arange(k, dtype=jnp.float32)
        )[0]

    return run
