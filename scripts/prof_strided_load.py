"""Probe: does Mosaic support lane-strided loads from VMEM refs?

    python scripts/prof_strided_load.py
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("canary:", float(jnp.ones(8).sum()), flush=True)


def k_strided_ref(x_ref, o_ref):
    # even lanes of each row, read straight from the ref
    o_ref[...] = x_ref[:, 0 : 2048 : 2]


def k_strided_val(x_ref, o_ref):
    v = x_ref[...]
    o_ref[...] = v[:, 0 : 2048 : 2]


def k_dyn_row_strided(x_ref, o_ref):
    # strided load combined with a dynamic sublane index (the stem
    # kernel's access pattern)
    def body(i, c):
        row = x_ref[pl.ds(i, 1), 1 : 2048 : 2]
        o_ref[pl.ds(i, 1), :] = row
        return c

    jax.lax.fori_loop(0, 8, body, 0)


x = jnp.arange(8 * 2048, dtype=jnp.float32).reshape(8, 2048)

for name, kern in [
    ("strided_ref", k_strided_ref),
    ("strided_val", k_strided_val),
    ("dyn_row_strided", k_dyn_row_strided),
]:
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32),
        )(x)
        start = 1 if name == "dyn_row_strided" else 0
        ref = np.asarray(x)[:, start:2048:2]
        ok = np.array_equal(np.asarray(out), ref)
        print(name, "OK" if ok else "WRONG", flush=True)
    except Exception as e:  # noqa
        print(name, "FAIL:", str(e).split("\n")[0][:120], flush=True)
print("DONE", flush=True)
