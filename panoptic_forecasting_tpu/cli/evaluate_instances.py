"""Score an instance-mask export with Cityscapes instance AP (in-tree).

Reference capability: the reference exports forecasts "in Cityscapes AP
format" (experiments/export_cityscapes_instance_results.py:61-92) for the
external ``cityscapesscripts.evaluation.evalInstanceLevelSemanticLabeling``
tool. This CLI scores the same export layout in-tree (eval/instance_ap.py)
against ``*_gtFine_instanceIds.png`` maps, so the whole pipeline runs
without that package.

Usage:
    python -m panoptic_forecasting_tpu.cli.evaluate_instances \
        --pred_dir EXPORT_DIR \
        (--gt_dir INSTANCE_ID_DIR | --cityscapes_dir DIR --split val) \
        [--results_json OUT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from ..eval import instance_ap


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--pred_dir", required=True,
                   help="export dir of {name}.txt manifests + mask PNGs")
    p.add_argument("--gt_dir",
                   help="dir searched recursively for *_gtFine_instanceIds.png")
    p.add_argument("--cityscapes_dir")
    p.add_argument("--split", default="val")
    p.add_argument("--results_json")
    args = p.parse_args(argv)

    gt_dir = args.gt_dir
    if gt_dir is None:
        if not args.cityscapes_dir:
            p.error("need --gt_dir or --cityscapes_dir")
        gt_dir = os.path.join(args.cityscapes_dir, "gtFine", args.split)

    results = instance_ap.ap_compute_folders(args.pred_dir, gt_dir)
    print(instance_ap.format_results(results))
    if args.results_json:
        # NaN (class has no gt instances) is not valid RFC JSON; emit null
        # so jq/strict parsers can read the artifact.
        def denan(x):
            if isinstance(x, dict):
                return {k: denan(v) for k, v in x.items()}
            if isinstance(x, float) and x != x:
                return None
            return x

        with open(args.results_json, "w") as f:
            json.dump(denan(results), f, indent=2)
    return results


def cli_main(argv=None) -> None:
    """Console-script wrapper: ``main`` returns the results dict (useful
    in-process), which would read as a nonzero exit status here."""
    main(argv)


if __name__ == "__main__":
    main(sys.argv[1:])
