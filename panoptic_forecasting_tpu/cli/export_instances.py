"""Export per-instance forecast masks in Cityscapes AP format.

Reference capability: experiments/export_cityscapes_instance_results.py —
per instance a binary mask PNG ``{city}_{seq}_{frame:06d}_{labelId}_{k}.png``
(mask*255, :68-83), per frame a ``.txt`` manifest of ``name labelId score``
lines (:85-92), and empty txts for instance-free gt frames (:94-113).

Usage:
    python -m panoptic_forecasting_tpu.cli.export_instances \
        --working_dir DIR --config_file cfg.yaml [--set export_name NAME]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

import numpy as np

from ..data.cityscapes import TRAIN_ID_TO_ID
from ..data.io import PNG_IDS, save_png
from ..eval import fusion
from ..train.loop import _strip_meta
from .common import export_writer, restore_params, setup


def export_split(model, params, task_data, split, cfg) -> str:
    wd = cfg["working_dir"]
    export_name = cfg.get("export_name") or "exported_instances"
    base = os.path.join(wd, f"{export_name}_{split}")
    os.makedirs(base, exist_ok=True)

    entries = defaultdict(lambda: defaultdict(list))  # name -> cl -> scores
    loader = task_data.loader(split, cfg, test=True)
    # Mask PNG writes overlap the next batch's device step (JAX stays on
    # this thread — AsyncWriter docs).
    with export_writer(cfg) as w:
        for batch in loader:
            preds = fusion.predict_instances(
                model, params, _strip_meta(batch)
            )
            meta = batch["meta"]
            for i, insts in enumerate(preds["instances"]):
                city = meta["city"][i]
                seq = meta["seq"][i]
                frame = int(meta["target_frame"][i])
                name = f"{city}_{seq}_{frame:06d}"
                for inst in insts:
                    cl = TRAIN_ID_TO_ID[inst["class_train_id"]]
                    k = len(entries[name][cl])
                    entries[name][cl].append(float(inst["score"]))
                    w.submit(
                        save_png,
                        os.path.join(base, f"{name}_{cl}_{k}.png"),
                        (inst["mask"].astype(np.uint8) * 255),
                        **PNG_IDS,
                    )

    for name, by_class in entries.items():
        with open(os.path.join(base, f"{name}.txt"), "w") as f:
            for cl, scores in by_class.items():
                for k, score in enumerate(scores):
                    f.write(f"{name}_{cl}_{k}.png {cl} {score:f}\n")

    cityscapes_dir = cfg.get("data", {}).get("cityscapes_dir")
    if cityscapes_dir:
        gt_dir = os.path.join(cityscapes_dir, "gtFine", split)
        missing = 0
        for path in glob.glob(
            os.path.join(gt_dir, "*", "*_gtFine_labelIds.png")
        ):
            name = "_".join(os.path.basename(path).split("_")[:3])
            if name not in entries:
                missing += 1
                open(os.path.join(base, f"{name}.txt"), "w").close()
        print("NUM MISSING:", missing)
    print(f"[{split}] exported instance masks for {len(entries)} frames")
    return base


def main(argv=None) -> None:
    cfg, task_data, model = setup(argv, test=True)
    params = restore_params(cfg, model, task_data)
    for split in task_data.datasets:
        export_split(model, params, task_data, split, cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
