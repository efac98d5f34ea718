"""Background semantic forecaster: FCHarDNet over one-hot reprojected segs.

Reference capability: ``BGModel`` (models/bg/bg_model.py:15-102) — stack
``num_inputs`` past (reprojected) segmentations one-hot encoded to
num_classes channels each, plus normalized masked depth channels, through
FCHarDNet-70; CrossEntropy(ignore 255) vs fg-removed GT with a pixel
accuracy metric; ``predict`` returns argmax seg + full-res and pre-resize
logits. The first HarDNet conv is widened to the (num_classes+1)·T input
(reference mean-replicates pretrained RGB weights, hardnet.py:329-332 —
done here by the weight importer; fresh init just sizes the conv directly).

Layout: NHWC (TPU-native); channel order inside the stacked input is
t-major ((t0·c0..t0·cC)…, then depth channels) matching the reference's
``reshape(b, t*c, h, w)`` + concat (bg_model.py:64-69) so imported torch
weights drop in without permutation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .base import TaskModel
from .hardnet import HarDNet, fold_batchnorm_variables


class BGModel(TaskModel):
    def __init__(self, cfg: Dict[str, Any], data_card=None):
        m = cfg.get("model", {})
        d = cfg.get("data", {})
        self.num_classes = int(
            (data_card.num_classes if data_card and data_card.num_classes else None)
            or d.get("num_classes", 19)
        )
        self.use_depth_inps = bool(m.get("use_depth_inps"))
        self.num_inputs = int(m.get("num_inputs", 1))
        self.convert2onehot = bool(m.get("convert2onehot"))
        # device-side decode of RAW uint16 depth blocks (see _prep_inputs)
        self.min_depth = float(d.get("min_depth", 0.1))
        self.max_depth = float(d.get("max_depth", 200.0))
        fw, fh = m.get("final_w"), m.get("final_h")
        self.final_size = (int(fh), int(fw)) if fw and fh else None
        if self.use_depth_inps:
            if data_card is not None and "depth" in getattr(data_card, "stats", {}):
                self.depth_mean = float(data_card.mean("depth")[0])
                self.depth_std = float(data_card.std("depth")[0])
            else:
                self.depth_mean, self.depth_std = 0.0, 1.0
        import os

        hp = m.get("hardnet", {}) or {}
        self.pretrain_path = hp.get("pretrain_path")
        if self.pretrain_path and not os.path.exists(self.pretrain_path):
            print(
                f"WARNING: hardnet pretrain {self.pretrain_path} not found; "
                "using fresh init"
            )
            self.pretrain_path = None
        dt = m.get("compute_dtype")
        self.compute_dtype = jnp.bfloat16 if dt in ("bfloat16", "bf16") else jnp.float32
        self.fold_bn = bool(m.get("fold_bn", True))
        # Packed TRAINING path (round 5): enter packed space at base_0
        # via the 5×5 stride-4 entry conv, BN reshaped per logical
        # channel — mathematically exact (f64 fwd diff 0.0, grads 5e-11
        # vs plain; f32 differs only by reassociation through the BN
        # chain). Off by default pending an on-device win.
        self.module = HarDNet(
            n_classes=self.num_classes, dtype=self.compute_dtype,
            packed_full=bool(m.get("packed_train", False)),
            packed_levels=1 if m.get("packed_train") else 0,
        )
        self._folded_module = HarDNet(
            n_classes=self.num_classes, dtype=self.compute_dtype, folded=True
        )
        # 'auto' runs the fused one-hot Pallas stem (kernels/stem.py) for
        # folded inference on TPU; True forces it, False disables.
        self.stem_kernel = m.get("stem_kernel", "auto")
        # The packed serving pipeline runs the high-res small-channel
        # sections (base_1..base_5+pool, and the last decoder stage +
        # finalConv) over 2×2-packed space — 4× the channels stops XLA's
        # conv emitter relayouting every tensor: 9.64 → 7.59 ms on the
        # v5e serving stage, argmax bit-identical (docs/perf_notes.md
        # round 5). ``model.packed_stem: false`` restores the plain path.
        pk = bool(m.get("packed_stem", True))
        self._folded_nostem_module = HarDNet(
            n_classes=self.num_classes, dtype=self.compute_dtype,
            folded=True, skip_stem0=True,
            packed_stem=pk,
            packed_levels=int(m.get("packed_levels", 1)) if pk else 0,
        )

    # -- inference-time conv+BN folding (v2_transform capability) ----------
    fold_variables = staticmethod(fold_batchnorm_variables)

    def maybe_fold(self, variables):
        """Inference runs the folded (BN-free) graph by default — the
        capability the reference's dead v2_transform encoded
        (hardnet.py:341-351); disable with ``model.fold_bn: false``.
        Exact to ~1e-7 (argmax maps unchanged, tests/test_bg_slice.py).
        Single source of the fold-gating policy for every serving
        consumer (export CLI, fused forecast CLI, benchmarks)."""
        if self.fold_bn and "batch_stats" in variables:
            return self.fold_variables(variables)
        return variables

    def _module_for(self, variables):
        """Folded variables (no BN params) route to the folded graph —
        ``forward``/``predict`` accept either form transparently."""
        p = variables.get("params", {})
        if "base_0" in p and "norm" not in p["base_0"]:
            return self._folded_module
        return self.module

    # -- input assembly ----------------------------------------------------
    def _inp2onehot(self, seg: jax.Array) -> jax.Array:
        """(..., ) int map -> (..., C) one-hot along a NEW trailing axis;
        ids ≥ C are zeroed (bg_model.py:53-59). Axis-agnostic so
        ``_assemble`` can feed the (B, H, W, T)-transposed map."""
        mask = seg < self.num_classes
        safe = jnp.where(mask, seg, 0)
        oh = jax.nn.one_hot(safe, self.num_classes, dtype=jnp.float32)
        return oh * mask[..., None]

    def _assemble(self, seg, depth, depth_mask) -> jax.Array:
        """-> (B, H, W, T*C [+T]) network input.

        The T axis is transposed on the INT map before one-hot expansion:
        relaying out the (B, T, H, W) int32 costs C× less HBM traffic
        than relaying the (B, T, H, W, C) one-hot (~0.7 ms at bench
        scale), and one-hot along a trailing new axis needs no layout
        change at all.
        """
        seg_t = jnp.transpose(seg, (0, 2, 3, 1))  # (B, H, W, T) int
        if self.convert2onehot:
            x = self._inp2onehot(seg_t)  # (B, H, W, T, C)
        else:
            x = seg_t[..., None].astype(jnp.float32)
        b, h, w, t, c = x.shape
        x = x.reshape(b, h, w, t * c)
        if self.use_depth_inps:
            dep = (depth - self.depth_mean) / self.depth_std
            dep = dep * depth_mask.astype(dep.dtype)
            dep = jnp.transpose(dep, (0, 2, 3, 1))  # (B, H, W, T)
            x = jnp.concatenate([x, dep.astype(x.dtype)], axis=-1)
        return x

    def _stem_kernel_on(self, module, seg, depth, train) -> bool:
        """Route folded TPU inference through the fused one-hot Pallas
        stem (kernels/stem.py) — the assembly + base_0 conv otherwise
        cost ~8.4 ms of the ~14 ms bg step at 1024x2048 (lane-padded
        one-hot traffic + an off-roofline 36-ch conv; docs/perf_notes.md).
        """
        if train or not self.convert2onehot:
            return False
        if module is not self._folded_module:
            return False
        if seg.shape[-1] % 2 or seg.shape[-2] % 2:
            return False
        if self.use_depth_inps != (depth is not None):
            return False
        if self.stem_kernel == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return bool(self.stem_kernel)  # True / "interpret" force it on

    @property
    def _stem_interpret(self) -> bool:
        return self.stem_kernel == "interpret"

    def _prep_inputs(self, inp):
        """-> (seg int32, depth f32 | None, depth_mask | None).

        The loader may ship COMPACT encodings and let the (otherwise
        loader-starved) device pay the elementwise decode: seg as uint8
        and depth as the RAW uint16 h5 block (``d/256 - 1``, 0 = invalid,
        clamped — bg_dataset.py:224-228 semantics, bit-identical to the
        host decode since /256 and the comparisons are exact in f32;
        pinned by tests/test_bg_slice.py). Saves ~25 ms/sample of host
        numpy + 2x transfer bytes (scripts/prof_train_pipeline.py).
        """
        seg = jnp.asarray(inp["seg"])
        if seg.dtype != jnp.int32:
            seg = seg.astype(jnp.int32)
        depth = jnp.asarray(inp["depth"]) if "depth" in inp else None
        dmask = (
            jnp.asarray(inp["depth_mask"]) if "depth_mask" in inp else None
        )
        if depth is not None and depth.dtype == jnp.uint16:
            dep = depth.astype(jnp.float32) / 256.0 - 1.0
            dmask = dep > 0
            depth = jnp.where(
                dmask, jnp.clip(dep, self.min_depth, self.max_depth), -1.0
            )
        return seg, depth, dmask

    def forward(self, variables, batch, train=False, return_orig_size=False,
                mutable=False, return_argmax=False):
        seg, depth, dmask = self._prep_inputs(batch["inputs"])
        kwargs = dict(
            train=train,
            final_size=self.final_size,
            return_orig_size=return_orig_size,
            return_argmax=return_argmax,
        )
        module = self._module_for(variables)
        if self._stem_kernel_on(module, seg, depth, train):
            from ..kernels.stem import onehot_stem_conv

            dep = None
            if self.use_depth_inps:
                dep = (depth - self.depth_mean) / self.depth_std
                if dmask is not None:
                    dep = dep * dmask.astype(dep.dtype)
            p0 = variables["params"]["base_0"]["conv"]
            y0 = onehot_stem_conv(
                seg, dep, p0["kernel"], p0["bias"],
                num_classes=self.num_classes,
                interpret=self._stem_interpret,
            )
            return self._folded_nostem_module.apply(variables, y0, **kwargs)
        x = self._assemble(seg, depth, dmask)
        if mutable:
            return module.apply(
                variables, x, **kwargs, mutable=["batch_stats"]
            )
        return module.apply(variables, x, **kwargs)

    # -- TaskModel protocol -------------------------------------------------
    def init(self, rng, batch):
        x = self._assemble(*self._prep_inputs(batch["inputs"]))
        variables = self.module.init(rng, x)
        if self.pretrain_path:
            variables = self._load_pretrained(variables)
        return variables

    def _load_pretrained(self, variables):
        """Merge Cityscapes FCHarDNet-70 weights (build_hardnet parity,
        hardnet.py:390-404): widen the stem conv to our input channels by
        mean-replication (expand_first_layer, :329-332) and keep the fresh
        class head when num_classes != 19 (expand_last_layer, :334-339)."""
        import flax

        from .torch_import import load_hardnet_pickle

        loaded = load_hardnet_pickle(self.pretrain_path)
        params = flax.core.unfreeze(variables["params"])
        stats = flax.core.unfreeze(variables.get("batch_stats", {}))
        init_stem = params["base_0"]["conv"]["kernel"]
        for name, p in loaded["params"].items():
            if name == "base_0":
                k = p["conv"]["kernel"]
                c_in = init_stem.shape[2]
                if k.shape[2] != c_in:
                    k = jnp.broadcast_to(
                        jnp.asarray(k).mean(axis=2, keepdims=True),
                        k.shape[:2] + (c_in,) + k.shape[3:],
                    )
                params[name] = {"conv": {"kernel": k}, "norm": p["norm"]}
            elif name == "finalConv":
                if (
                    p["kernel"].shape[-1]
                    == params["finalConv"]["kernel"].shape[-1]
                ):
                    params[name] = p
            else:
                params[name] = p
        for name, s in loaded["batch_stats"].items():
            stats[name] = s
        out = {"params": params}
        if stats:
            out["batch_stats"] = stats
        return jax.tree_util.tree_map(jnp.asarray, out)

    def loss(self, params, state, batch, rng=None, train=True):
        variables = {"params": params, **state}
        if train:
            logits, new_state = self.forward(
                variables, batch, train=True, mutable=True
            )
        else:
            logits, new_state = self.forward(variables, batch, train=False), state
        labels = jnp.asarray(batch["labels"]["seg"])
        valid = labels != 255
        safe = jnp.where(valid, labels, 0)
        # logits (B, H, W, C); CE mean over non-ignored pixels (torch
        # CrossEntropyLoss(ignore_index=255) semantics, bg_model.py:44,80).
        # The label logit is selected with a one-hot multiply-sum, NOT
        # take_along_axis: the per-pixel class gather lowers to a
        # serialized TPU custom fusion that measured 79.5 ms of the
        # 124 ms train step (docs/perf_notes.md round 5). Exactly one
        # nonzero term per pixel → bit-identical to the gather.
        shifted = logits - jax.lax.stop_gradient(
            logits.max(axis=-1, keepdims=True)
        )
        label_logit = jnp.sum(
            shifted
            * jax.nn.one_hot(safe, shifted.shape[-1], dtype=shifted.dtype),
            axis=-1,
        )
        ce = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1)) - label_logit
        total_valid = jnp.maximum(valid.sum(), 1)
        loss = jnp.where(valid, ce, 0.0).sum() / total_valid
        preds = jnp.argmax(logits, axis=-1)
        acc = (jnp.where(valid, preds == safe, False)).sum() / total_valid
        return loss, {"loss": loss, "accuracy": acc}, new_state

    def predict(self, variables, batch):
        logits, orig = self.forward(
            variables, batch, train=False, return_orig_size=True
        )
        return {
            "seg": jnp.argmax(logits, axis=-1),
            "logits": logits,
            "orig_size_logits": orig,
        }
