"""Build BG-model training data from point-cloud reprojections.

Reference capability gap: the reference TRAINS its bg model on
``point_cloud_static_nomoving_ind{0,1,2}_all/exported_predictions`` dirs +
``depths_decompressed_{split}.h5`` — artifacts shipped via download_data.sh,
with no in-repo code to produce them (SURVEY §2.12). This CLI closes the
loop: it runs the PC transform once per input frame index (the reference's
``only_this_ind`` exports, pc_transform_model.py:21,33-37) and writes

    {out_dir}/point_cloud_static_ind{i}_all/exported_predictions/{split}/
        {city}/{city}_{seq}_{frame:06d}_gtFine_labelIds.png   (trainId content)
    {out_dir}/depths_decompressed_{split}.h5                  (H, W, 3) uint16
        keyed city/seq/frame:06d/start_fr, encoded (depth+1)*256, 0 invalid

matching what BGDataset reads (data/bg_data.py; reference
bg_dataset.py:183-190, 224-228). Output labels are converted
labelId→trainId so the 11-class stuff one-hot sees trainIds.

Throughput knobs (these are OUR OWN training artifacts — the format is
an internal interface, not reference protocol):
  * ``bg_out_format: npy`` writes the seg maps as raw ``.npy`` instead
    of PNG — the training loader then memory-maps them (zero decode;
    PNG decode is ~75% of the bg sample cost after the depth fixes,
    docs/perf_notes.md) at ~20x the disk footprint.
  * ``bg_depth_compression: gzip`` re-enables h5 gzip (the default is
    uncompressed/contiguous so the loader's shared-mmap fast path
    applies — consistent with the reference's own artifact name,
    ``depths_DECOMPRESSED_{split}.h5``).

Usage:
    python -m panoptic_forecasting_tpu.cli.prepare_bg_data \
        --working_dir DIR --config_file configs/pc_transform/pc_export.yaml \
        --set bg_out DIR [--set data.gap_len 3] [--set bg_out_format npy]
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..data.cityscapes import id_to_train_id_lut
from ..data.io import PNG_IDS, save_png
from ..train.loop import _strip_meta
from .common import setup


def prepare_split(task_data, split, cfg, out_dir: str) -> None:
    import h5py

    from ..core import build_dataset, build_model

    gap = int(cfg.get("data", {}).get("gap_len", 9))
    start_fr = int((9 - gap) / 3)
    lut = id_to_train_id_lut()
    fmt = cfg.get("bg_out_format", "png")
    depth_comp = cfg.get("bg_depth_compression", "none")
    h5_kw = {} if depth_comp in ("none", None, False) else {
        "compression": depth_comp
    }
    h5_path = os.path.join(out_dir, f"depths_decompressed_{split}.h5")
    os.makedirs(out_dir, exist_ok=True)
    with h5py.File(h5_path, "a") as h5:
        for ind in range(3):
            sub = dict(cfg)
            sub["model"] = dict(cfg.get("model", {}), only_this_ind=ind)
            data = build_dataset(sub, test=True)
            model = build_model(sub, data.card)
            seg_root = os.path.join(
                out_dir, f"point_cloud_static_ind{ind}_all",
                "exported_predictions", split,
            )
            loader = data.loader(split, sub, test=True)
            n = 0
            for batch in loader:
                preds = model.predict(None, _strip_meta(batch))
                segs = np.asarray(preds["seg"])
                deps = np.asarray(preds["depth"])
                meta = batch["meta"]
                for i in range(len(segs)):
                    city = meta["city"][i]
                    seq = meta["seq"][i]
                    frame = int(meta["frame"][i])
                    tgt = int(meta["target_frame"][i]) if "target_frame" in meta else frame
                    name = f"{city}_{seq}_{tgt:06d}"
                    seg_train = lut[np.clip(segs[i], 0, 255)].astype(np.uint8)
                    base = os.path.join(
                        seg_root, city, f"{name}_gtFine_labelIds"
                    )
                    if fmt == "npy":
                        os.makedirs(os.path.dirname(base), exist_ok=True)
                        np.save(base + ".npy", seg_train)
                    else:
                        save_png(base + ".png", seg_train, **PNG_IDS)
                    key = f"{city}/{seq}/{frame:06d}/{start_fr}"
                    enc = np.where(
                        deps[i] > 0,
                        np.clip((deps[i] + 1.0) * 256.0, 0, 65535),
                        0,
                    ).astype(np.uint16)
                    if key not in h5:
                        h5.create_dataset(
                            key,
                            shape=enc.shape + (3,),
                            dtype=np.uint16,
                            **h5_kw,
                        )
                    h5[key][:, :, ind] = enc
                    n += 1
            print(f"[{split}] ind{ind}: {n} frames -> {seg_root}")
    print(f"depth h5 -> {h5_path}")


def main(argv=None) -> None:
    cfg, task_data, _ = setup(argv, test=True)
    out_dir = cfg.get("bg_out") or os.path.join(cfg["working_dir"], "bg_data")
    for split in task_data.datasets:
        prepare_split(task_data, split, cfg, out_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
