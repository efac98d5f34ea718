"""Score a panoptic export against Cityscapes GT (in-tree PQ).

Reference capability: the external
``cityscapesscripts.evaluation.evalPanopticSemanticLabeling`` invocation in
scripts/fg/run_fg_eval_panoptic.sh:28-33. Implemented in-tree (eval/pq.py)
so the whole pipeline runs without that package. GT panoptic files are
produced on the fly from ``gtFine`` when ``--gt_json`` isn't given.

Usage:
    python -m panoptic_forecasting_tpu.cli.evaluate_panoptic \
        --pred_json PRED.json --pred_dir PRED_DIR \
        (--gt_json GT.json --gt_dir GT_DIR |
         --cityscapes_dir DIR --split val [--gt_out DIR]) \
        [--results_json OUT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from ..eval import pq
from ..eval.panoptic_protocol import convert_gt_split


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--pred_json", required=True)
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--gt_json")
    p.add_argument("--gt_dir")
    p.add_argument("--cityscapes_dir")
    p.add_argument("--split", default="val")
    p.add_argument("--gt_out")
    p.add_argument("--results_json")
    args = p.parse_args(argv)

    gt_json, gt_dir = args.gt_json, args.gt_dir
    if gt_json is None:
        if not args.cityscapes_dir:
            p.error("need --gt_json/--gt_dir or --cityscapes_dir")
        out = args.gt_out or os.path.join(
            os.path.dirname(args.pred_json), "gt_panoptic"
        )
        gt_json = convert_gt_split(args.cityscapes_dir, args.split, out)
        gt_dir = os.path.join(out, f"cityscapes_panoptic_{args.split}")

    results = pq.pq_compute_folders(
        gt_json, gt_dir, args.pred_json, args.pred_dir
    )
    print(pq.format_results(results))
    if args.results_json:
        with open(args.results_json, "w") as f:
            json.dump(results, f, indent=2)
    return results


def cli_main(argv=None) -> None:
    """Console-script wrapper: ``main`` returns the results dict (useful
    in-process), which would read as a nonzero exit status here."""
    main(argv)


if __name__ == "__main__":
    main(sys.argv[1:])
