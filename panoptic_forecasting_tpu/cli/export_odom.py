"""Export forecast odometry to HDF5.

Reference: experiments/export_cityscapes_odom.py — one dataset per key
``city/seq/frame/start_frame`` holding the (output_len, 2) forecast, file
``{export_name|odometry}_{split}.h5`` in the working dir
(export_cityscapes_odom.py:30-54).

TPU re-design: prediction runs as one jitted batched forward; the per-key
h5 fan-out is host-side.
"""

from __future__ import annotations

import os
import sys

import h5py
import jax
import numpy as np

from ..train.loop import _strip_meta
from .common import restore_params, setup


def export_split(model, params, task_data, split, cfg) -> str:
    export_name = cfg.get("export_name") or "odometry"
    os.makedirs(cfg["working_dir"], exist_ok=True)
    out_file = os.path.join(cfg["working_dir"], f"{export_name}_{split}.h5")
    loader = task_data.loader(split, cfg, test=True)
    predict = jax.jit(model.predict)
    with h5py.File(out_file, "w") as fout:
        for batch in loader:
            preds = predict(params, _strip_meta(batch))
            odom = np.asarray(preds["odometry"])
            meta = batch["meta"]
            for i in range(len(odom)):
                key = (
                    f"{meta['city'][i]}/{meta['seq'][i]}/"
                    f"{int(meta['frame'][i])}/{int(meta['start_frame'][i])}"
                )
                if key not in fout:
                    fout.create_dataset(key, data=odom[i])
    return out_file


def main(argv=None) -> None:
    cfg, task_data, model = setup(argv, test=True)
    params = restore_params(cfg, model, task_data)
    for split in task_data.datasets:
        out = export_split(model, params, task_data, split, cfg)
        print(f"exported {split} -> {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
