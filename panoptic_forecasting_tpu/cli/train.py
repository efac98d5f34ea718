"""Train any task model. Reference: experiments/train_model.py:16-26.

Usage:
    python -m panoptic_forecasting_tpu.cli.train --working_dir DIR \
        --config_file cfg.yaml [--set a.b v ...]
"""

from __future__ import annotations

import sys

from ..core.config import save_config
from ..core.metrics import build_writers
from ..train.loop import train
from .common import setup


def main(argv=None) -> None:
    cfg, task_data, model = setup(argv, test=False)
    save_config(cfg, cfg["working_dir"])
    task_data.card.save(cfg["working_dir"])
    splits = [s for s in ("train", "val") if s in task_data.datasets]
    with build_writers(cfg["working_dir"], splits) as writers:
        train(model, task_data, cfg, writers)


if __name__ == "__main__":
    main(sys.argv[1:])
