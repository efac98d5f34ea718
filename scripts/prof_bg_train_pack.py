"""Measure the packed bg TRAINING step vs the plain one.

The packed serving pipeline won 1.3× by stopping XLA's conv emitter
relayouting the small-channel high-res layers; training (159 ms/step,
19% MFU, bs 8 × crop 800, train-mode BN) plausibly pays the same copies
twice (fwd+bwd). model.packed_train enters packed space at base_0 via
the 5×5 stride-4 entry conv with per-logical-channel BN — exact in f64
(fwd 0.0, grads 5e-11 vs plain).

    python scripts/prof_bg_train_pack.py
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: F401
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

print("canary:", float(jnp.ones(8).sum()), flush=True)

import bench

plain = bench.measure_train_step(k=10)
print("plain:", plain, flush=True)
packed = bench.measure_train_step(k=10, packed=True)
print("packed:", packed, flush=True)
print(
    f"speedup: {plain['bg_train_step_ms'] / packed['bg_train_step_ms']:.3f}x",
    flush=True,
)
