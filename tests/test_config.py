"""Direct unit tests for the L0 config system (core/config.py).

Pins the reference-parity behaviors: convert_val-style coercion
(utils/config.py:12-32), recursive merge (:81-93), dotted overrides
(:68-77), and the resume/load config-reload precedence (:51-58).
"""

import os

import yaml

from panoptic_forecasting_tpu.core.config import (
    Config,
    apply_dotted_override,
    coerce_value,
    load_config,
    merge_config,
    save_config,
)


def test_coerce_value_scalars():
    assert coerce_value("true") is True
    assert coerce_value("False") is False
    assert coerce_value("none") is None
    assert coerce_value("null") is None
    assert coerce_value("42") == 42 and isinstance(coerce_value("42"), int)
    assert coerce_value("2e-3") == 2e-3
    assert coerce_value("-1.5") == -1.5
    assert coerce_value("hello") == "hello"
    # non-strings pass through untouched
    assert coerce_value(7) == 7


def test_coerce_value_lists():
    assert coerce_value("[1,2,3]") == [1, 2, 3]
    assert coerce_value("[a, b]") == ["a", "b"]
    assert coerce_value("[9,3]") == [9, 3]          # bg gap_len style
    assert coerce_value("[true, none, 1.5]") == [True, None, 1.5]
    assert coerce_value("[]") == []


def test_merge_config_recursive_override_wins():
    base = {"a": 1, "m": {"x": 1, "y": 2}, "keep": "k"}
    over = {"a": 2, "m": {"y": 3, "z": 4}}
    out = merge_config(base, over)
    assert out == {"a": 2, "m": {"x": 1, "y": 3, "z": 4}, "keep": "k"}
    # non-dict override replaces a dict wholesale
    assert merge_config({"m": {"x": 1}}, {"m": 5})["m"] == 5
    # inputs not mutated
    assert base["a"] == 1 and over["m"] == {"y": 3, "z": 4}


def test_apply_dotted_override_creates_path():
    cfg = {"model": {"rnn_hidden": 64}}
    apply_dotted_override(cfg, "model.rnn_hidden", 128)
    apply_dotted_override(cfg, "training.opt.lr", 1e-3)
    assert cfg["model"]["rnn_hidden"] == 128
    assert cfg["training"]["opt"]["lr"] == 1e-3
    # a scalar in the way is replaced by a dict
    apply_dotted_override(cfg, "model.rnn_hidden.sub", 1)
    assert cfg["model"]["rnn_hidden"] == {"sub": 1}


def test_config_attribute_access_and_roundtrip(tmp_path):
    cfg = Config({"model": {"rnn_hidden": 128}, "seed": 3})
    assert cfg.model.rnn_hidden == 128
    assert cfg.get("missing", "d") == "d"
    path = save_config(cfg, str(tmp_path))
    assert yaml.safe_load(open(path)) == cfg.to_dict()


def test_load_config_precedence_file_then_set(tmp_path):
    yml = tmp_path / "c.yaml"
    yml.write_text("training:\n  lr: 0.01\n  batch_size: 8\nseed: 5\n")
    cfg = load_config([
        "--working_dir", str(tmp_path / "run"),
        "--config_file", str(yml),
        "--seed", "9",
        "--set", "training.lr", "2e-3",
        "--set", "training.gaps", "[9,3]",
    ])
    assert cfg["training"]["lr"] == 2e-3            # --set beats YAML
    assert cfg["training"]["batch_size"] == 8       # YAML survives
    assert cfg["seed"] == 9                         # CLI flag beats YAML
    assert cfg["training"]["gaps"] == [9, 3]


def test_load_config_resume_reloads_saved(tmp_path):
    """--continue_training reloads working_dir/config.yaml, and the new
    --config_file / --set still override it (reference config.py:51-58)."""
    wd = tmp_path / "run"
    save_config({"training": {"lr": 0.5, "epochs": 7}}, str(wd))
    cfg = load_config([
        "--working_dir", str(wd), "--continue_training",
        "--set", "training.lr", "0.25",
    ])
    assert cfg["continue_training"] is True
    assert cfg["training"]["epochs"] == 7           # from the saved run
    assert cfg["training"]["lr"] == 0.25            # override wins


def test_load_config_load_model_reads_adjacent_config(tmp_path):
    ckpt_dir = tmp_path / "pretrained"
    os.makedirs(ckpt_dir)
    (ckpt_dir / "config.yaml").write_text("model:\n  rnn_hidden: 256\n")
    (ckpt_dir / "best_model").write_text("")
    cfg = load_config([
        "--working_dir", str(tmp_path / "run"),
        "--load_model", str(ckpt_dir / "best_model"),
    ])
    assert cfg["model"]["rnn_hidden"] == 256
    assert cfg["load_model"] == str(ckpt_dir / "best_model")
