"""End-to-end odometry vertical slice: dataset → train → checkpoint → export."""

import os

import h5py
import numpy as np
import pytest
import yaml

from panoptic_forecasting_tpu.core import build_dataset, build_model
from panoptic_forecasting_tpu.core import checkpoint as ckpt
from panoptic_forecasting_tpu.data.synthetic import write_odom_fixture
from panoptic_forecasting_tpu.train.loop import train


@pytest.fixture(scope="module")
def odom_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("odom")
    data_dir = str(root / "data")
    write_odom_fixture(data_dir, n_snippets=4)
    return {
        "task": "odom",
        "seed": 0,
        "working_dir": str(root / "run"),
        "data": {
            "data_splits": ["train", "val"],
            "data_dir": data_dir,
            "input_len": 9,
            "output_len": 9,
        },
        "model": {
            "predict_type": "direct",
            "normalize_input": True,
            "use_normalized_loss": True,
            "rnn_hidden": 32,
            "loss_fn": "mse",
        },
        "training": {
            "batch_size": 8,
            "steps_per_epoch": 6,
            "num_epochs": 3,
            "lr": 5.0e-3,
            "clip_grad_norm": 5.0,
            "use_adam": True,
        },
    }


def test_dataset_windows(odom_cfg):
    data = build_dataset(odom_cfg)
    ds = data.datasets["train"]
    # 4 snippets x (30-18+1 offsets + 2 padded) samples
    assert len(ds) == 4 * (13 + 2)
    s = ds[0]
    assert s["inputs"]["odometry"].shape == (9, 2)
    assert s["labels"]["odometry"].shape == (9, 2)
    # padded short-history sample repeats the first frame
    padded = ds[13]  # (row 0, start -1)
    np.testing.assert_allclose(
        padded["inputs"]["odometry"][0], padded["inputs"]["odometry"][1]
    )
    # stats landed on the card
    assert "odom" in data.card.stats
    assert data.card.mean("odom").shape == (2,)


def test_dataset_test_mode_window_count(odom_cfg):
    data = build_dataset(odom_cfg, test=True)
    ds = data.datasets["val"]
    assert len(ds) == 4 * ((30 - 9 + 1) + 2)


def test_train_improves_and_checkpoints(odom_cfg):
    data = build_dataset(odom_cfg)
    model = build_model(odom_cfg, data.card)
    os.makedirs(odom_cfg["working_dir"], exist_ok=True)
    result = train(model, data, odom_cfg)
    assert result["best_val_result"] < 1.0  # normalized mse should drop fast
    assert os.path.isdir(os.path.join(odom_cfg["working_dir"], "best_model"))
    assert os.path.isdir(os.path.join(odom_cfg["working_dir"], "model_checkpoint"))
    # loss decreased across epochs
    losses = [h["train"]["loss"] for h in result["history"]]
    assert losses[-1] < losses[0]


def test_resume_continues(odom_cfg):
    data = build_dataset(odom_cfg)
    model = build_model(odom_cfg, data.card)
    cfg = dict(odom_cfg)
    cfg["continue_training"] = True
    cfg["training"] = dict(cfg["training"], num_epochs=4)
    result = train(model, data, cfg)
    # resumed from epoch 4 (3 already done) and ran exactly one more epoch
    assert [h["epoch"] for h in result["history"]] == [4]


def test_export_odom(odom_cfg):
    from panoptic_forecasting_tpu.cli.export_odom import export_split
    from panoptic_forecasting_tpu.cli.common import restore_params

    data = build_dataset(odom_cfg, test=True)
    model = build_model(odom_cfg, data.card)
    params = restore_params(odom_cfg, model, data)
    out = export_split(model, params, data, "val", odom_cfg)
    with h5py.File(out) as f:
        cities = list(f)
        assert cities == ["synthcity"]
        seqs = list(f["synthcity"])
        assert len(seqs) == 4
        sample = f["synthcity"][seqs[0]]["19"]
        frames = list(sample)
        arr = sample[frames[0]][()]
        assert arr.shape == (9, 2)
        assert np.isfinite(arr).all()


def test_gradient_accumulation_matches_big_batch(odom_cfg):
    """accum=2 with bs=4 should behave like bs=8 statistically (loss drops)."""
    data = build_dataset(odom_cfg)
    model = build_model(odom_cfg, data.card)
    cfg = dict(odom_cfg)
    cfg["working_dir"] = odom_cfg["working_dir"] + "_accum"
    os.makedirs(cfg["working_dir"], exist_ok=True)
    cfg["training"] = dict(
        cfg["training"], batch_size=4, accumulate_steps=2, num_epochs=2
    )
    result = train(model, data, cfg)
    assert result["step"] == 2 * 6  # steps_per_epoch*accum batches / accum
    assert np.isfinite(result["best_val_result"])


@pytest.mark.slow
def test_profiler_trace_capture(odom_cfg, tmp_path):
    """training.profile_dir writes a jax.profiler trace (SURVEY §5.1).

    Slow-marked: the trace collection itself takes ~30s on a 1-core host."""
    import glob as _glob

    from panoptic_forecasting_tpu.train.loop import train

    cfg = dict(odom_cfg)
    cfg["working_dir"] = str(tmp_path / "run")
    os.makedirs(cfg["working_dir"], exist_ok=True)
    prof = str(tmp_path / "prof")
    cfg["training"] = dict(
        cfg["training"], num_epochs=1, steps_per_epoch=3,
        profile_dir=prof, profile_steps=2,
    )
    data = build_dataset(cfg)
    model = build_model(cfg, data.card)
    train(model, data, cfg)
    traces = _glob.glob(os.path.join(prof, "**", "*.trace.json.gz"),
                        recursive=True) + _glob.glob(
        os.path.join(prof, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no trace files under {prof}"


def test_dataset_load_imgs(odom_cfg, tmp_path):
    """Optional per-input-frame video loading (odom_dataset.py:130-148):
    images resized so the short side hits min_img_len, short-history
    samples repeat-padded at the front."""
    from panoptic_forecasting_tpu.data.io import save_png
    from panoptic_forecasting_tpu.data.odom_data import OdomDataset
    from panoptic_forecasting_tpu.data.cards import DataCard

    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in odom_cfg.items()}
    cs = tmp_path / "cityscapes"
    cfg["data"] = dict(
        cfg["data"], load_imgs=True, min_img_len=16,
        cityscapes_dir=str(cs),
    )
    import pandas as pd
    tbl = pd.read_pickle(
        os.path.join(cfg["data"]["data_dir"], "train_3d_info.pkl")
    )
    rng = np.random.RandomState(0)
    for _, rec in tbl.iterrows():
        d = cs / "leftImg8bit_sequence" / "train" / rec["city"]
        d.mkdir(parents=True, exist_ok=True)
        for fr in range(int(rec["frame"]) - 19, int(rec["frame"]) + 11):
            save_png(
                str(d / f"{rec['city']}_{rec['seq']}_{fr:06d}_leftImg8bit.png"),
                rng.randint(0, 255, (32, 64, 3), dtype=np.uint8),
            )
    ds = OdomDataset("train", cfg, DataCard("odom"))
    s = ds[0]
    imgs = s["inputs"]["imgs"]
    assert imgs.shape == (9, 16, 32, 3)  # short side 16, aspect kept
    assert imgs.dtype == np.float32 and 0.0 <= imgs.min() <= imgs.max() <= 1.0
    # short-history sample: first frames repeat-padded
    padded = ds[13]
    pi = padded["inputs"]["imgs"]
    assert pi.shape == (9, 16, 32, 3)
    np.testing.assert_array_equal(pi[0], pi[1])
