"""Capture a jax.profiler trace of the fused forecast on the attached TPU.

If trace collection works through the tunneled attachment, the
device-timeline breakdown of the ONE-program fused forecast (pc sort /
placement / HarDNet / FG scan / fusion) shows where XLA's overlap
stalls. Writes to /tmp/pf_fused_trace (inspect op times with
scripts' summarize pass below — full TensorBoard isn't available here,
but the .xplane.pb protos record per-op durations).

    python scripts/prof_fused_trace.py
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

out = "/tmp/pf_fused_trace"
os.makedirs(out, exist_ok=True)
jax.profiler.start_trace(out)
ms = bench.measure_fused(k=bench.K)
jax.profiler.stop_trace()
print("fused_ms:", round(ms, 3), flush=True)

# Inventory what landed.
for root, _dirs, files in os.walk(out):
    for f in files:
        p = os.path.join(root, f)
        print(os.path.relpath(p, out), os.path.getsize(p), flush=True)
