"""Measure lax.sort superlinearity at fine split granularity (v5e).

Question (VERDICT r04 item 2): the fused pc stage spends ~10 ms in
3x2.1M-pair sorts. Bitonic stage count is (log n)(log n + 1)/2, so K
sequential sorts of N/K pairs move ~stages(N/K)/stages(N) of the
traffic. Does the measured win track that model at splits in {2..64},
or do small sorts lose it to fixed overheads?

Each variant sorts the SAME 3x2.1M-pair per-frame stream (projected-
coordinate-like group distribution) as sequential (group, key)
lax.sorts, is_stable=False, inside one scan-harness jit (the plain
dispatch-loop harness reads ~0 through the tunnel — use scan_loop).

Usage: python scripts/prof_sort_split.py   (needs the TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import K, _timed
from prof_common import scan_loop

H, W = 1024, 2048
N = H * W  # per-frame stream (2^21)
FRAMES = 3

print("canary:", float(jnp.ones(8).sum()), flush=True)
rng = np.random.RandomState(0)
base = np.arange(N, dtype=np.int64)
jitter = (rng.randn(FRAMES, N) * W * 3).astype(np.int64)
corner = rng.randint(0, 4, size=(FRAMES, N)).astype(np.int64)
G = jnp.asarray(np.clip(base[None] + jitter, 0, N - 1) + corner * N,
                jnp.int32)
KEYS = jnp.asarray(
    rng.randint(0, 1 << 30, size=(FRAMES, N), dtype=np.int64), jnp.int32
)


def split_sort(runs):
    def body(g, s):
        outs = []
        for f in range(FRAMES):
            gs = (g[f] + s.astype(jnp.int32)).reshape(runs, -1)
            ks = KEYS[f].reshape(runs, -1)
            for r in range(runs):
                outs.append(jax.lax.sort((gs[r], ks[r]), num_keys=2,
                                         is_stable=False))
        return [o[0] for o in outs] + [o[1] for o in outs]

    return body


def batched_sort(runs):
    def body(g, s):
        gs = (g + s.astype(jnp.int32)).reshape(FRAMES * runs, -1)
        ks = KEYS.reshape(FRAMES * runs, -1)
        o = jax.lax.sort((gs, ks), num_keys=2, dimension=1,
                         is_stable=False)
        return list(o)

    return body


def timed(label, body):
    r = _timed(scan_loop(body), (G,), K)
    print(f"{label}: {r * 1e3:7.3f} ms", flush=True)
    return r


base_ms = timed(f"runs= 1 (3x{N})", split_sort(1))
for runs in (64, 256, 1024):
    r = timed(f"batched runs={runs:4d} (rows of {N // runs})",
              batched_sort(runs))
    print(f"    -> {r / base_ms:.2f}x vs one sort", flush=True)
