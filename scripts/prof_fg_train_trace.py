"""Trace the fg TRAINING step (coupled GRU/ConvLSTM fwd+bwd+Adam).

    python scripts/prof_fg_train_trace.py
    python scripts/prof_trace_summary.py /tmp/pf_fg_train_trace jit_run_k
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

out = "/tmp/pf_fg_train_trace"
os.makedirs(out, exist_ok=True)
res = bench.measure_train_step_fg()
print(res, flush=True)
jax.profiler.start_trace(out)
res = bench.measure_train_step_fg()
jax.profiler.stop_trace()
print("traced:", res, flush=True)
