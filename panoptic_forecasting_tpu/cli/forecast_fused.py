"""Serve panoptic forecasts through the SINGLE-JIT fused pipeline.

The staged CLIs mirror the reference's file-interface chain (odom h5 →
reprojected PNGs → bg canvas PNGs → panoptic export,
scripts/fg/run_fg_eval_panoptic.sh). This entry point is the serving-path
alternative: one XLA program per target frame runs pc reprojection → bg
refinement → fg rollout → in-graph fusion (eval/forecast.build_forecast_step)
with zero intermediate files or host round trips, and writes the SAME
COCO-panoptic PNG/json protocol as cli/export_panoptic — so the PQ
evaluator and all downstream tooling work unchanged. The E2E suite pins
this path to the staged export's outputs (tests/test_e2e_pipeline.py).

Usage (config keys under ``fused.``):
    python -m panoptic_forecasting_tpu.cli.forecast_fused \
        --working_dir FG_RUN --config_file fg_scene.yaml \
        --set fused.bg_config bg.yaml --set fused.bg_dir BG_RUN \
        --set fused.pc_config pc.yaml [--set export_name NAME]

The main config is the fg-scene eval config (same as export_panoptic);
``fused.bg_config``/``fused.bg_dir`` locate the trained background model,
``fused.pc_config`` the point-cloud reprojection inputs (depth/seg/camera
sequences + odometry), both in their standard formats.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import yaml

from ..data.cityscapes import id_to_train_id_lut
from ..eval.forecast import build_forecast_step
from ..eval.panoptic_protocol import (
    relabel_panoptic_trainid_to_labelid,
    segments_info_from_labelid_seg,
    write_panoptic_png,
)
from .common import export_writer, pipelined_map, restore_params, setup
from .export_panoptic import backfill_missing

FG_KEYS = ("trajectories", "bbox_masks", "bbox_vel_masks", "depths",
           "depth_masks", "feats", "odometry", "classes", "valid")


def _load_sub_cfg(path: str, working_dir: str) -> dict:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    cfg["working_dir"] = working_dir
    return cfg


def _build_bg(fused_cfg):
    from ..core import build_dataset, build_model

    cfg = _load_sub_cfg(fused_cfg["bg_config"], fused_cfg["bg_dir"])
    data = build_dataset(cfg, test=True)
    model = build_model(cfg, data.card)
    variables = restore_params(cfg, model, data)
    return model, model.maybe_fold(variables)


def _pc_index(fused_cfg, split):
    """(dataset, {frame_name: item_index}) for lazy per-frame fetch."""
    from ..core import build_dataset

    cfg = _load_sub_cfg(
        fused_cfg["pc_config"],
        fused_cfg.get("pc_dir") or fused_cfg["bg_dir"],
    )
    cfg.setdefault("data", {})["data_splits"] = [split]
    data = build_dataset(cfg, test=True)
    ds = data.datasets[split]
    index = {}
    for i, (idx, _inds, target) in enumerate(ds.items):
        rec = ds.data.iloc[idx]
        name = (f"{rec['city']}_{rec['seq']}_"
                f"{int(rec['frame']) - 19 + target:06d}")
        index[name] = i
    return ds, index


def _pc_inputs(ds, i, lut):
    """One pc sample -> fused-step pc_in dict (seg converted to trainIds:
    the staged chain reprojects labelIds and converts after,
    cli/prepare_bg_data; reprojecting trainIds directly is equivalent)."""
    s = ds[i]
    inp = s["inputs"]
    return {
        "seg": lut[np.clip(np.asarray(inp["seg"])[None], 0, 255)].astype(
            np.int32
        ),
        "depth": np.asarray(inp["depth"], np.float32)[None],
        "depth_mask": np.asarray(inp["depth_mask"])[None],
        "intrinsics": np.asarray(inp["intrinsics"], np.float32)[None],
        "extrinsics": np.asarray(inp["extrinsics"], np.float32)[None],
        "target_T": np.asarray(inp["target_T"], np.float32)[None],
    }


def export_split(fg_model, fg_vars, bg_model, bg_vars, task_data, split,
                 cfg) -> str:
    import jax.numpy as jnp

    fused_cfg = cfg.get("fused", {})
    wd = cfg["working_dir"]
    export_name = f"{cfg.get('export_name') or 'fused_panoptics'}_{split}"
    result_dir = os.path.join(wd, export_name)
    seg_dir = os.path.join(result_dir, export_name)
    os.makedirs(seg_dir, exist_ok=True)

    pc_ds, pc_idx = _pc_index(fused_cfg, split)
    lut = id_to_train_id_lut()
    height = int(fused_cfg.get("height", 1024))
    width = int(fused_cfg.get("width", 2048))

    step = None
    annotations = []
    exported = set()
    n_done = n_skipped = 0
    loader = task_data.loader(split, cfg, test=True)

    def frame_stream():
        """(batch, i, name) per forecastable frame; builds the fused step
        on first use. Advanced on the caller's thread by pipelined_map."""
        nonlocal step, n_skipped
        for batch in loader:
            meta = batch["meta"]
            out_t = int(
                np.asarray(batch["labels"]["trajectories"]).shape[2]
            )
            if step is None:
                step = build_forecast_step(
                    bg_model, fg_model, height=height, width=width,
                    out_t=out_t,
                )
            for i in range(len(meta["city"])):
                name = (f"{meta['city'][i]}_{meta['seq'][i]}_"
                        f"{int(meta['target_frame'][i]):06d}")
                if name not in pc_idx:
                    n_skipped += 1
                    continue
                yield batch, i, name

    # Two host-side overlaps around the fused device step, both pure
    # host work (JAX stays on this thread — tunnel deadlock otherwise):
    # the NEXT frame's pc input fetch (3 full-res PNG decodes + depth,
    # pipelined_map's single worker) and the PREVIOUS frame's panoptic
    # PNG encode+write (AsyncWriter pool).
    with export_writer(cfg) as w:
        for pc_np, (batch, i, name) in pipelined_map(
            lambda t: _pc_inputs(pc_ds, pc_idx[t[2]], lut),
            frame_stream(),
            depth=2,
        ):
            fg_in = {
                k: jnp.asarray(np.asarray(batch["inputs"][k])[i : i + 1])
                for k in FG_KEYS
            }
            fg_in["output_inds"] = jnp.asarray(
                np.asarray(batch["labels"]["output_inds"])[i : i + 1]
            )
            pc_in = {k: jnp.asarray(v) for k, v in pc_np.items()}
            fused = step(bg_vars, fg_vars, pc_in, fg_in)
            seg = relabel_panoptic_trainid_to_labelid(
                np.asarray(fused["panoptic"][0]).astype(np.int64)
            )
            file_name = f"{name}_pred_panoptic.png"
            w.submit(
                write_panoptic_png,
                os.path.join(seg_dir, file_name), seg,
            )
            annotations.append({
                "image_id": name,
                "file_name": file_name,
                "segments_info": segments_info_from_labelid_seg(seg),
            })
            exported.add(name)
            n_done += 1

    # Frames without pc inputs (or filtered from the fg loader) get the
    # same defensive backfill as the staged exporter — without it the PQ
    # protocol scorer hard-fails on the first un-forecast gt frame
    # (reference export_cityscapes_panoptic_results.py:124-168).
    backfill_missing(cfg, split, seg_dir, exported, annotations)

    with open(os.path.join(result_dir, f"{export_name}.json"), "w",
              encoding="utf-8") as f:
        json.dump({"annotations": annotations}, f, ensure_ascii=False,
                  indent=4)
    print(f"[{split}] fused-forecast {n_done} frames "
          f"({n_skipped} without pc inputs) -> {seg_dir}")
    return result_dir


def main(argv=None) -> None:
    cfg, task_data, fg_model = setup(argv, test=True)
    fused_cfg = cfg.get("fused", {})
    for key in ("bg_config", "bg_dir", "pc_config"):
        if not fused_cfg.get(key):
            raise SystemExit(
                f"missing --set fused.{key} (see module docstring)"
            )
    fg_vars = restore_params(cfg, fg_model, task_data)
    bg_model, bg_vars = _build_bg(fused_cfg)
    for split in task_data.datasets:
        export_split(
            fg_model, fg_vars, bg_model, bg_vars, task_data, split, cfg
        )


if __name__ == "__main__":
    main(sys.argv[1:])
