"""Measure the REAL bg training pipeline — loader + augmentation +
transfer + device step — not just the device program (VERDICT r04 item 4).

The bench's 159 ms/step (50 imgs/s) is device-only: inputs live on the
chip and are perturbed in-graph. This script answers whether the actual
input pipeline (PNG decode, depth h5, crop-800 scale-jitter augmentation,
host->device transfer) can keep that device rate fed, at the shipped
config's shapes (configs/bg/bg_train.yaml: bs 8, crop 800, 3 frames,
num_data_workers 8 -> loader threads):

  phase A (--loader-only, CPU-safe): host-side loader imgs/s over a
      full-resolution synthetic fixture whose PNGs carry realistic
      entropy (banded scenes + 10% salt noise so zlib can't cheat).
  phase B (needs the TPU): one measured epoch through the REAL train()
      loop (train/loop.py) on the same fixture — epoch wall seconds,
      imgs/s, and the device-idle fraction implied by the bench's
      device-only step time.

Usage:
    python scripts/prof_train_pipeline.py --loader-only
    python scripts/prof_train_pipeline.py            # both phases
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

H, W = 1024, 2048
DEVICE_MS = 159.4  # bench.py bg_train_step_ms (BENCH_r04, device-only)
STEPS = 30
BS = 8


def build_fixture(root: str, n_train: int = 12, n_val: int = 2) -> dict:
    """Full-res bg training tree (write_bg_fixture layout) with
    realistic-entropy content; cached across runs."""
    import h5py
    from PIL import Image

    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return _frag(root)
    rng = np.random.RandomState(0)
    city = "synthcity"
    data_dirs = [os.path.join(root, f"pc_ind{i}") for i in range(3)]
    gt_dir = os.path.join(root, "gtFine_nofg")
    for split, n in (("train", n_train), ("val", n_val)):
        with h5py.File(os.path.join(root, f"depths_{split}.h5"), "a") as h5:
            for snip in range(n):
                seq = f"{snip:06d}"
                name = f"{city}_{seq}_000019"
                base = np.zeros((H, W), np.uint8)
                n_bands = 6
                for bi, cl in enumerate(
                    rng.choice(11, size=n_bands, replace=False)
                ):
                    base[bi * H // n_bands : (bi + 1) * H // n_bands] = cl
                gt = base.copy()
                noise = rng.rand(H, W) < 0.1
                gt[noise] = rng.randint(0, 11, noise.sum())
                gt[rng.rand(H, W) < 0.05] = 255
                os.makedirs(os.path.join(gt_dir, split, city), exist_ok=True)
                Image.fromarray(gt).save(os.path.join(
                    gt_dir, split, city, f"{name}_gtFine_labelTrainIds.png"
                ))
                dep_block = np.zeros((H, W, 3), np.uint16)
                for i in range(3):
                    arr = base.copy()
                    m = rng.rand(H, W) < 0.1
                    arr[m] = rng.randint(0, 11, m.sum())
                    arr[rng.rand(H, W) < 0.03] = 255
                    os.makedirs(
                        os.path.join(data_dirs[i], split, city), exist_ok=True
                    )
                    Image.fromarray(arr).save(os.path.join(
                        data_dirs[i], split, city, f"{name}_gtFine_labelIds.png"
                    ))
                    d = 5.0 + 30.0 * rng.rand() + rng.rand(H, W) * 3.0
                    dep_block[:, :, i] = ((d + 1) * 256).astype(np.uint16)
                h5.create_dataset(f"{city}/{seq}/000019/0", data=dep_block)
    open(marker, "w").close()
    return _frag(root)


def _frag(root):
    return {
        "data_dir": [os.path.join(root, f"pc_ind{i}") for i in range(3)],
        "gt_dir": os.path.join(root, "gtFine_nofg"),
        "depth_h5_path": os.path.join(root, "depths_%s.h5"),
        "cityscapes_dir": root,
    }


def make_cfg(frag, steps=STEPS):
    return {
        "task": "bg",
        "seed": 0,
        "working_dir": os.path.join("/tmp", "pf_train_pipe_run"),
        "data": {
            "data_splits": ["train", "val"], **frag, "data_inp_size": 3,
            "gap_len": [9], "use_depths": True, "load_depths": True,
            "min_depth": 0.1, "max_depth": 200, "only_background": True,
            "crop_size": 800, "scale_min": 0.5, "scale_max": 2.0,
        },
        "model": {"num_inputs": 3, "use_depth_inps": True,
                  "convert2onehot": True, "hardnet": {}},
        "training": {"batch_size": BS, "steps_per_epoch": steps,
                     "num_epochs": 1, "lr": 2.0e-3, "mom": 0.9,
                     "wd": 1.0e-4, "clip_grad_norm": 5.0,
                     "num_data_threads": 8, "prefetch_batches": 2},
    }


def phase_a(cfg):
    from panoptic_forecasting_tpu.core import build_dataset

    data = build_dataset(cfg)
    loader = data.loader("train", cfg)
    it = iter(loader)
    next(it)  # warm: first sample opens h5 handles, fills page cache
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += batch["labels"]["seg"].shape[0]
    dt = time.perf_counter() - t0
    rate = n / dt
    print(f"[loader] {n} imgs in {dt:.1f} s = {rate:.1f} imgs/s "
          f"(device-only rate {BS * 1000 / DEVICE_MS:.1f}; "
          f"headroom {rate * DEVICE_MS / 1000 / BS:.2f}x)", flush=True)
    return rate


def phase_b(cfg):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from panoptic_forecasting_tpu.core import build_dataset, build_model
    from panoptic_forecasting_tpu.train.loop import train

    data = build_dataset(cfg)
    model = build_model(cfg, data.card)
    # compile epoch (not timed), then the measured epoch
    t0 = time.perf_counter()
    result = train(model, data, cfg)
    wall = time.perf_counter() - t0
    n_imgs = STEPS * BS
    # The first epoch carries the compile; run a second epoch fresh for
    # the steady-state number.
    cfg2 = dict(cfg, working_dir=cfg["working_dir"] + "_b")
    t0 = time.perf_counter()
    train(model, data, cfg2)
    wall2 = time.perf_counter() - t0
    device_s = STEPS * DEVICE_MS / 1000
    print(f"[epoch] cold {wall:.1f} s; steady {wall2:.1f} s for {STEPS} "
          f"steps x bs {BS} = {n_imgs / wall2:.1f} imgs/s "
          f"(device-only share {device_s:.1f} s -> idle fraction "
          f"{max(0.0, 1 - device_s / wall2):.1%}); "
          f"best_val={result.get('best_val_result')}", flush=True)


def main():
    root = "/tmp/pf_train_pipe_fixture"
    os.makedirs(root, exist_ok=True)
    t0 = time.perf_counter()
    frag = build_fixture(root)
    print(f"[fixture] ready in {time.perf_counter() - t0:.1f} s", flush=True)
    cfg = make_cfg(frag)
    phase_a(cfg)
    if "--loader-only" not in sys.argv:
        phase_b(cfg)


if __name__ == "__main__":
    main()
