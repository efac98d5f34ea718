"""Worker for test_parallel.py's two-process DP tests (not a test module).

Run as:  python two_process_worker.py ADDR PID REF_NPZ

Covers the reference's real multi-process axis (torchrun + NCCL DDP,
utils/dist.py:12-32 / training/train.py:99-103) with actual process
boundaries: two processes x 2 virtual CPU devices rendezvous through
``jax.distributed.initialize``, then

  1. run ONE DP odometry train step (loss -> grads -> adam update) over
     the GLOBAL 4-device mesh on a globally-sharded batch and assert the
     updated parameters equal the single-process reference (REF_NPZ,
     computed by the pytest process on the same batch/seeds) — the DDP
     gradient-all-reduce equivalence, across a real process boundary;
  2. run the fused single-jit forecast with frames sharded over the
     global mesh and assert each process gets back exactly its local
     frame shards (the DP-serving contract of __graft_entry__).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402


def make_train_batch(n: int = 16):
    rng = np.random.RandomState(0)
    return {
        "inputs": {"odometry": (rng.rand(n, 9, 2) * 8).astype(np.float32)},
        "labels": {"odometry": (rng.rand(n, 9, 2) * 8).astype(np.float32)},
    }


def build_model_and_opt():
    import optax

    from panoptic_forecasting_tpu.models.base import split_variables
    from panoptic_forecasting_tpu.models.odom import OdomModel

    model = OdomModel(
        {"model": {"rnn_hidden": 16, "normalize_input": True,
                   "use_normalized_loss": True},
         "data": {"output_len": 9}},
    )
    batch = make_train_batch()
    variables = model.init(jax.random.PRNGKey(2), batch)
    params, state = split_variables(variables)
    opt = optax.adam(5e-4)
    return model, state, params, opt, opt.init(params), batch


def train_step_fn(model, state, opt):
    import optax

    @jax.jit
    def step(p, o, b):
        def loss_fn(p):
            mean_loss, _, _ = model.loss(p, state, b, train=True)
            return mean_loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    return step


def say(pid, msg):
    # non-main prints are monkey-patched silent; force is their escape
    # hatch (rank 0 keeps the plain builtin, which has no force kwarg)
    if pid == 0:
        print(msg)
    else:
        print(msg, force=True)


def main():
    addr, pid, ref_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from panoptic_forecasting_tpu.parallel.mesh import (
        data_sharding,
        init_distributed,
        make_mesh,
        replicate,
    )

    cfg = {"distributed": True, "coordinator_address": addr,
           "num_processes": 2, "process_id": pid}
    assert init_distributed(cfg)
    assert jax.process_count() == 2
    assert jax.device_count() == 4 and jax.local_device_count() == 2
    mesh = make_mesh()
    repl, dp = replicate(mesh), data_sharding(mesh)

    # ---- 1. DP train step == single-process reference --------------------
    model, state, params, opt, opt_state, batch = build_model_and_opt()
    # Global placement from identical per-process host values: params/opt
    # replicated, batch dp-sharded over the 2-process mesh.
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    gbatch = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), dp), batch
    )
    params, opt_state, loss = train_step_fn(model, state, opt)(
        params, opt_state, gbatch
    )
    ref = np.load(ref_path)
    leaves = jax.tree_util.tree_leaves(params)
    assert len(leaves) == len(ref.files)
    for i, leaf in enumerate(leaves):
        # post-step params stay replicated -> fully addressable
        np.testing.assert_allclose(
            np.asarray(leaf), ref[f"p{i}"], rtol=1e-5, atol=1e-6
        )
    say(pid, f"TRAIN-OK rank={pid} loss={float(loss):.6f}")

    # ---- 2. fused DP serving: local frame shards come back ---------------
    import __graft_entry__ as ge

    n_ids = ge._dryrun_fused(jax.device_count(), repl, dp)
    say(pid, f"FUSED-OK rank={pid} ids={n_ids}")


if __name__ == "__main__":
    main()
