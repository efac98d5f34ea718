"""Data-parallel sharding over the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from panoptic_forecasting_tpu.parallel import make_mesh, shard_batch, data_sharding


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_splits_leading_dim():
    mesh = make_mesh()
    batch = {
        "inputs": {"odometry": np.zeros((16, 9, 2), np.float32)},
        "labels": {"odometry": np.zeros((16, 9, 2), np.float32)},
    }
    out = shard_batch(mesh, batch)
    x = out["inputs"]["odometry"]
    assert x.sharding.is_equivalent_to(data_sharding(mesh), x.ndim)
    # each device holds 16/8 = 2 samples
    assert x.addressable_shards[0].data.shape == (2, 9, 2)


def test_shard_batch_replicates_indivisible():
    mesh = make_mesh()
    out = shard_batch(mesh, {"x": np.zeros((3, 4))})
    assert out["x"].sharding.is_fully_replicated


def test_odom_train_on_mesh(tmp_path):
    """Full DP train step over all 8 devices: grad mean == ICI all-reduce."""
    from panoptic_forecasting_tpu.core import build_dataset, build_model
    from panoptic_forecasting_tpu.data.synthetic import write_odom_fixture
    from panoptic_forecasting_tpu.train.loop import train

    data_dir = str(tmp_path / "data")
    write_odom_fixture(data_dir, n_snippets=3)
    cfg = {
        "task": "odom",
        "seed": 0,
        "working_dir": str(tmp_path / "run"),
        "data": {"data_splits": ["train", "val"], "data_dir": data_dir},
        "model": {
            "predict_type": "offset",
            "normalize_input": True,
            "use_normalized_loss": True,
            "rnn_hidden": 16,
            "loss_fn": "smooth_l1",
        },
        "training": {
            "batch_size": 16,
            "steps_per_epoch": 4,
            "num_epochs": 2,
            "lr": 1e-3,
            "use_adam": True,
        },
    }
    data = build_dataset(cfg)
    model = build_model(cfg, data.card)
    mesh = make_mesh()
    result = train(model, data, cfg, mesh=mesh)
    assert np.isfinite(result["best_val_result"])
    # params remain replicated across the mesh
    leaf = jax.tree_util.tree_leaves(result["params"])[0]
    assert leaf.sharding.is_fully_replicated
