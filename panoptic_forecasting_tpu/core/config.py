"""Config system: YAML trees + CLI with dotted overrides.

Capability parity with the reference's ``utils/config.py``
(``load_config`` at config.py:34, ``merge_config`` at config.py:81-93,
``convert_val`` at config.py:12-32), redesigned:

* precedence (low→high): saved run config < ``--config_file`` YAML
  < first-class CLI flags < dotted ``--set a.b.c value`` overrides;
* typed coercion of string overrides, including ``[a,b]`` lists;
* on ``--continue_training`` / ``--load_best_model`` the config saved in
  ``working_dir/config.yaml`` is reloaded; ``--load_model PATH`` loads the
  ``config.yaml`` sitting next to the checkpoint (reference config.py:51-58).

Unlike the reference (raw nested dicts mutated by datasets at construction
time), the pipeline-level data↔model contract is an explicit ``DataCard``
(see data/cards.py); the config tree itself stays a plain nested mapping so
YAML round-trips losslessly.
"""

from __future__ import annotations

import argparse
import copy
import os
from typing import Any, Dict, List, Optional, Sequence

import yaml


def coerce_value(val: str) -> Any:
    """Coerce a CLI string into bool/int/float/None/list, else keep str.

    Mirrors the coercion surface of the reference's ``convert_val``
    (utils/config.py:12-32): ``[a,b,c]`` becomes a list with element-wise
    coercion; bare scalars try bool, None, int, float in that order.
    """
    if not isinstance(val, str):
        return val
    s = val.strip()
    if s.startswith("[") and s.endswith("]"):
        inner = s[1:-1].strip()
        if not inner:
            return []
        return [coerce_value(tok) for tok in inner.split(",")]
    low = s.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("none", "null"):
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def merge_config(base: Dict, override: Dict) -> Dict:
    """Recursive dict merge; ``override`` wins (reference config.py:81-93)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = v
    return out


def apply_dotted_override(cfg: Dict, dotted: str, value: Any) -> None:
    """Set ``cfg['a']['b']['c'] = value`` for dotted path ``a.b.c`` in place."""
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        nxt = node.get(k)
        if not isinstance(nxt, dict):
            nxt = {}
            node[k] = nxt
        node = nxt
    node[keys[-1]] = value


class Config(dict):
    """A nested mapping with attribute access and safe ``get`` chains.

    ``cfg.model.rnn_hidden`` works when the keys exist; ``cfg.get('model', {})``
    always works. Values are plain dicts/lists/scalars so ``yaml.safe_dump``
    round-trips.
    """

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(v, dict) and not isinstance(v, Config):
            return Config(v)
        return v

    def to_dict(self) -> Dict:
        def conv(x):
            if isinstance(x, dict):
                return {k: conv(v) for k, v in x.items()}
            if isinstance(x, list):
                return [conv(v) for v in x]
            return x

        return conv(dict(self))


def _read_yaml(path: str) -> Dict:
    with open(path) as f:
        out = yaml.safe_load(f)
    return out or {}


def save_config(cfg: Dict, working_dir: str) -> str:
    """Persist the merged config to ``working_dir/config.yaml``.

    Reference equivalent: ``utils/misc.py:22-26`` (copy_config).
    """
    os.makedirs(working_dir, exist_ok=True)
    path = os.path.join(working_dir, "config.yaml")
    cfg = dict(cfg)
    with open(path, "w") as f:
        yaml.safe_dump(Config(cfg).to_dict(), f, sort_keys=False)
    return path


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="panoptic_forecasting_tpu")
    p.add_argument("--working_dir", required=True)
    p.add_argument("--config_file", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--load_model", default=None)
    p.add_argument(
        "--load_torch_model", default=None,
        help="reference *.pt checkpoint to convert and load "
             "(models/reference_import.py)",
    )
    p.add_argument("--continue_training", action="store_true")
    p.add_argument("--load_best_model", action="store_true")
    p.add_argument("--platform", default=None, help="jax platform override (cpu/tpu)")
    # Multi-host SPMD (reference utils/dist.py:12-32 torchrun env rendezvous).
    # On TPU pods --distributed alone auto-detects topology; the explicit
    # coordinator/process args exist for CPU tests and manual launches.
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() before building")
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument(
        "--set",
        dest="overrides",
        nargs=2,
        action="append",
        metavar=("PATH", "VALUE"),
        default=[],
        help="dotted config override, e.g. --set training.lr 1e-3",
    )
    return p


def load_config(argv: Optional[Sequence[str]] = None) -> Config:
    """Build the run config from CLI + YAML with reference-parity precedence."""
    args = build_arg_parser().parse_args(argv)
    cfg: Dict = {}

    saved = os.path.join(args.working_dir, "config.yaml")
    if (args.continue_training or args.load_best_model) and os.path.exists(saved):
        cfg = merge_config(cfg, _read_yaml(saved))
    if args.load_model:
        near = os.path.join(os.path.dirname(args.load_model), "config.yaml")
        if os.path.exists(near):
            cfg = merge_config(cfg, _read_yaml(near))
    if args.config_file:
        cfg = merge_config(cfg, _read_yaml(args.config_file))

    cfg["working_dir"] = args.working_dir
    if args.seed is not None:
        cfg["seed"] = args.seed
    cfg.setdefault("seed", 0)
    if args.load_model:
        cfg["load_model"] = args.load_model
    if args.load_torch_model:
        cfg["load_torch_model"] = args.load_torch_model
    cfg["continue_training"] = bool(args.continue_training)
    cfg["load_best_model"] = bool(args.load_best_model)
    if args.platform:
        cfg["platform"] = args.platform
    if args.distributed:
        cfg["distributed"] = True
        for k in ("coordinator_address", "num_processes", "process_id"):
            if getattr(args, k) is not None:
                cfg[k] = getattr(args, k)

    for dotted, raw in args.overrides:
        apply_dotted_override(cfg, dotted, coerce_value(raw))
    return Config(cfg)
