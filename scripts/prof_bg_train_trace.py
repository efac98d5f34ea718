"""Trace the bg TRAINING step (fwd+bwd+SGD, train-mode BN) and summarize.

The 159 ms/step (50 imgs/s) bg train number has never had a trace-driven
decomposition — serving got three rounds of layout attacks while
training's 19% MFU is unexplained beyond "pass-latency/layout-bound"
(docs/perf_notes.md r04). This captures the per-op breakdown.

    python scripts/prof_bg_train_trace.py [k]
    python scripts/prof_trace_summary.py /tmp/pf_bg_train_trace jit_run_k
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

k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
packed = "--plain" not in sys.argv
out = "/tmp/pf_bg_train_trace"
os.makedirs(out, exist_ok=True)
res = bench.measure_train_step(k=k, packed=packed)  # warm + official
print(res, flush=True)
jax.profiler.start_trace(out)
res = bench.measure_train_step(k=k, packed=packed)
jax.profiler.stop_trace()
print("traced:", res, flush=True)
print("trace written to", out, flush=True)
