"""Literal-oracle fixtures for the in-tree PQ / instance-AP evaluators.

The reference scores its exports with the EXTERNAL cityscapesscripts
tools (scripts/fg/run_fg_eval_panoptic.sh:28-33 —
evalPanopticSemanticLabeling / evalInstanceLevelSemanticLabeling). The
in-tree evaluators (eval/pq.py, eval/instance_ap.py) were previously
cross-checked only against same-author naive reimplementations; a shared
misreading of the protocol would pass both sides. Every expected value
in this file is therefore a LITERAL constant hand-derived from the
official algorithm definitions (the panopticapi pq_compute matching that
evalPanopticSemanticLabeling embeds, and evalInstanceLevelSemanticLabeling's
evaluateMatches / match-curve integration), with the full derivation in
comments — no expected value is computed by either in-repo
implementation.

Official algorithm facts these fixtures pin:

PQ (panopticapi pq_compute_single_core):
  * union = gt_area + pred_area - inter - |pred ∩ gt-VOID|  (VOID only,
    not other unmatched segments);
  * a match requires IoU STRICTLY > 0.5;
  * crowd gt never matches and never counts FN; unmatched preds are
    discarded (not FP) iff (pred∩VOID + pred∩same-category-crowd)/area
    is STRICTLY > 0.5;
  * per-class PQ = ΣIoU / (TP + FP/2 + FN/2); classes with
    TP+FP+FN == 0 are excluded from the average.

AP (evalInstanceLevelSemanticLabeling.evaluateMatches):
  * match requires inter/union STRICTLY > threshold, thresholds
    0.50..0.95;
  * duplicate detections of one gt: highest confidence stays TP, the
    rest demote to FP at their own scores;
  * group regions (instID < 1000) and too-small gt (< minRegionSize) are
    neither TP-matchable nor FN, but DO suppress any unmatched pred that
    overlaps them above threshold (the foundGt loop checks ALL
    overlapped gt), and their overlap discounts FP candidates through
    TWO INDEPENDENT checks — a region that is both group and small
    counts its intersection twice;
  * unmatched true gt instances are hard FNs at every confidence;
  * AP integrates precision over centered-difference recall steps
    (np.convolve(recall', [-0.5, 0, 0.5])) with an artificial
    (precision=1, recall=0) final point.
"""

import numpy as np
import pytest

from panoptic_forecasting_tpu.eval.instance_ap import (
    _class_overlap_ap,
    match_single_image,
    summarize as ap_summarize,
)
from panoptic_forecasting_tpu.eval.pq import (
    eval_categories,
    pq_compute_single_image,
    summarize as pq_summarize,
)

CAR, ROAD, SIDEWALK, PERSON = 26, 7, 8, 24


def _strip(spans, fill=0, n=100):
    """1x n id map from [(start, end_inclusive, id), ...]."""
    a = np.full((1, n), fill, np.int64)
    for s, e, v in spans:
        a[0, s : e + 1] = v
    return a


# ---------------------------------------------------------------------------
# PQ fixture 1 — void-union subtraction.
#
# gt   (1x100): [0..59] segment 1 = car; [60..99] VOID(0).
# pred (1x100): [0..79] segment 2 = car; [80..99] VOID(0).
#
# Official matching: inter(1,2) = 60; pred∩gtVOID = pixels 60..79 = 20.
#   union = gt_area + pred_area - inter - pred∩VOID
#         = 60 + 80 - 60 - 20 = 60          -> IoU = 60/60 = 1.0 -> TP.
# WITHOUT the void subtraction union would be 80 and IoU 0.75 — the SQ
# asserts below (1.0, not 0.75) pin the subtraction exactly.
# car: TP=1, ΣIoU=1.0 -> PQ = SQ = RQ = 1.0. Only car has TP+FP+FN > 0,
# so All averages over n=1 -> PQ 1.0.
# ---------------------------------------------------------------------------

def test_pq_oracle_void_union():
    gt = _strip([(0, 59, 1)])
    pred = _strip([(0, 79, 2)])
    stat = pq_compute_single_image(
        gt, [{"id": 1, "category_id": CAR}],
        pred, [{"id": 2, "category_id": CAR}],
    )
    res = pq_summarize(stat)
    assert res["All"]["n"] == 1
    assert res["All"]["pq"] == pytest.approx(1.0)
    car = res["per_class"]["car"]
    assert car["pq"] == pytest.approx(1.0)
    assert car["sq"] == pytest.approx(1.0)  # 0.75 would mean no void sub
    assert car["rq"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# PQ fixture 2 — IoU exactly 0.5 is NOT a match (strict >).
#
# gt   (1x100): [0..29] segment 1 = road (30); [30..99] segment 2 =
#               sidewalk (70). No void anywhere.
# pred (1x100): [0..9] VOID; [10..39] segment 3 = road (30);
#               [40..99] segment 4 = sidewalk (60).
#
# road: inter(1,3) = pixels 10..29 = 20; union = 30+30-20-0 = 40;
#   IoU = 20/40 = 0.5 exactly -> NO match (strict >).
#   -> gt 1 is FN(road); pred 3 unmatched, ignore = pred∩VOID = 0
#      -> 0/30 <= 0.5 -> FP(road).   road: tp=0 fp=1 fn=1.
# sidewalk: inter(2,4) = pixels 40..99 = 60; union = 70+60-60-0 = 70;
#   IoU = 60/70 = 6/7 > 0.5 -> TP, ΣIoU = 6/7.
# Per class: road PQ = 0/(0+0.5+0.5) = 0 (valid: denom > 0);
#            sidewalk PQ = SQ = 6/7, RQ = 1.
# All (n=2): PQ = (0 + 6/7)/2 = 3/7; RQ = (0+1)/2 = 0.5.
# ---------------------------------------------------------------------------

def test_pq_oracle_exact_half_iou_no_match():
    gt = _strip([(0, 29, 1), (30, 99, 2)])
    pred = _strip([(10, 39, 3), (40, 99, 4)])
    stat = pq_compute_single_image(
        gt,
        [{"id": 1, "category_id": ROAD}, {"id": 2, "category_id": SIDEWALK}],
        pred,
        [{"id": 3, "category_id": ROAD}, {"id": 4, "category_id": SIDEWALK}],
    )
    res = pq_summarize(stat)
    assert res["All"]["n"] == 2
    assert res["per_class"]["road"]["pq"] == pytest.approx(0.0)
    assert res["per_class"]["road"]["valid"] is True  # FP+FN, not absent
    assert res["per_class"]["sidewalk"]["pq"] == pytest.approx(6 / 7)
    assert res["per_class"]["sidewalk"]["rq"] == pytest.approx(1.0)
    assert res["All"]["pq"] == pytest.approx(3 / 7)
    assert res["All"]["rq"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# PQ fixture 3 — crowd + void interplay on FP discarding.
#
# gt   (1x100): [0..39] segment 1 = car, iscrowd=1 (40);
#               [40..59] VOID (20); [60..99] segment 2 = road (40).
# pred (1x100): [0..49]  segment 11 = car (50);
#               [50..51] VOID (2);
#               [52..67] segment 14 = car (16);
#               [68..99] segment 13 = road (32).
#
# Matching:
#   (1,11): gt iscrowd -> SKIPPED (crowd never matches).
#   (2,13): inter = 32; union = 40+32-32-pred13∩VOID(0) = 40;
#           IoU = 0.8 > 0.5 -> TP(road), ΣIoU = 0.8.
#   (no same-category pair for 14).
# FN loop: gt 1 crowd -> never FN. gt 2 matched. -> no FN anywhere.
# FP loop:
#   pred 11: ignore = pred∩VOID (pixels 40..49 = 10)
#                   + pred∩same-cat-crowd (pixels 0..39 = 40) = 50;
#            50/50 = 1.0 > 0.5 -> DISCARDED (not FP).
#   pred 14: ignore = pred∩VOID (pixels 52..59 = 8) + crowd car inter
#            (0) = 8; 8/16 = 0.5 exactly, NOT > 0.5 -> counts FP(car).
# Per class: car tp=0 fp=1 fn=0 -> PQ 0 (valid, denom 0.5);
#            road PQ = SQ = 0.8, RQ = 1.
# All (n=2): PQ = 0.4, SQ = 0.4, RQ = 0.5.
# Things (car): PQ 0. Stuff (road): PQ 0.8.
# ---------------------------------------------------------------------------

def test_pq_oracle_crowd_void_fp_discard():
    gt = _strip([(0, 39, 1), (60, 99, 2)])
    pred = _strip([(0, 49, 11), (52, 67, 14), (68, 99, 13)])
    stat = pq_compute_single_image(
        gt,
        [
            {"id": 1, "category_id": CAR, "iscrowd": 1},
            {"id": 2, "category_id": ROAD},
        ],
        pred,
        [
            {"id": 11, "category_id": CAR},
            {"id": 14, "category_id": CAR},
            {"id": 13, "category_id": ROAD},
        ],
    )
    res = pq_summarize(stat)
    assert res["All"]["n"] == 2
    assert res["per_class"]["car"]["pq"] == pytest.approx(0.0)
    assert res["per_class"]["car"]["valid"] is True   # the 0.5-edge FP
    assert res["per_class"]["road"]["pq"] == pytest.approx(0.8)
    assert res["per_class"]["road"]["sq"] == pytest.approx(0.8)
    assert res["per_class"]["road"]["rq"] == pytest.approx(1.0)
    assert res["All"]["pq"] == pytest.approx(0.4)
    assert res["All"]["rq"] == pytest.approx(0.5)
    assert res["Things"]["pq"] == pytest.approx(0.0)
    assert res["Stuff"]["pq"] == pytest.approx(0.8)


# ---------------------------------------------------------------------------
# AP fixture 1 — duplicate demotion + group/small suppression + hard FN.
#
# gt map (10x100), rows x cols:
#   G1 = 26000: cols 0..19               (area 200, real car)
#   G2 = 26001: cols 20..39              (area 200, real car)
#   GRP = 26  : cols 40..49              (area 100, GROUP: bare labelId)
#   SML = 26002: rows 0..4, cols 50..51  (area 10 < 100 -> too small)
#   PER = 24000: rows 5..9, cols 52..71  (area 100, real person)
#   everything else road(7) — NOT void (road is an eval stuff class).
#
# car predictions:
#   P1 cols 0..19  score 0.90: IoU(G1) = 200/200 = 1.0
#   P2 cols 0..15  score 0.80: IoU(G1) = 160/(200+160-160) = 0.8
#   P6 cols 20..34 score 0.85: IoU(G2) = 150/(200+150-150) = 0.75
#   P3 cols 40..49 score 0.70: IoU(GRP) = 100/100 = 1.0
#   P5 rows 0..4 cols 50..51 score 0.50: IoU(SML) = 10/10 = 1.0
#   P4 cols 60..79 score 0.60: overlaps road + person only (cross-class
#      overlap is invisible to the car sweep); ignore = void∩P4 = 0.
# person predictions: none.
#
# Per-threshold car outcome:
#   P3 and P5 are suppressed at EVERY threshold (IoU 1.0 > th against an
#   ignored gt — the foundGt loop includes group/small). P4 is an FP at
#   every threshold (ignore fraction 0 <= th).
#   th in {0.50, 0.55, 0.60, 0.65, 0.70}  ("scenario A"):
#     G1: matches P1 (1.0 > th) and P2 (0.8 > th) -> TP@0.90 + dup FP@0.80.
#     G2: matches P6 (0.75 > th) -> TP@0.85.
#     y (ascending score) = [0.6 F, 0.8 F, 0.85 T, 0.9 T], hardFns = 0.
#     Official sweep (cumsum = [0,0,1,2], n=4, nTrue=2):
#       cutoff 0.60: tp=2 fp=2 fn=0 -> p=1/2, r=1
#       cutoff 0.80: tp=2 fp=1 fn=0 -> p=2/3, r=1
#       cutoff 0.85: tp=2 fp=0 fn=0 -> p=1,   r=1
#       cutoff 0.90: tp=1 fp=0 fn=1 -> p=1,   r=1/2
#       artificial:                     p=1,   r=0
#     precision = [1/2, 2/3, 1, 1, 1], recall = [1, 1, 1, 1/2, 0]
#     recall' = [1, 1, 1, 1, 1/2, 0, 0]; steps s_j = (r'_j - r'_{j+2})/2
#       = [0, 0, 1/4, 1/2, 1/4]
#     AP = 1*(1/4) + 1*(1/2) + 1*(1/4) = 1.0
#   th in {0.75, 0.80, 0.85, 0.90, 0.95}  ("scenario B"):
#     P6 no longer matches G2 (0.75 > 0.75 is false) -> G2 hard FN, P6
#     FP@0.85 (ignore 0). P2 stops matching at th >= 0.80 but becomes a
#     plain FP@0.80 instead of a duplicate FP@0.80 — same y either way.
#     y = [0.6 F, 0.8 F, 0.85 F, 0.9 T], hardFns = 1 (n=4, nTrue=1):
#       cutoff 0.60: tp=1 fp=3 fn=1 -> p=1/4, r=1/2
#       cutoff 0.80: tp=1 fp=2 fn=1 -> p=1/3, r=1/2
#       cutoff 0.85: tp=1 fp=1 fn=1 -> p=1/2, r=1/2
#       cutoff 0.90: tp=1 fp=0 fn=1 -> p=1,   r=1/2
#       artificial:                     p=1,   r=0
#     precision = [1/4, 1/3, 1/2, 1, 1], recall = [1/2]*4 + [0]
#     recall' = [1/2, 1/2, 1/2, 1/2, 1/2, 0, 0]; steps = [0,0,0,1/4,1/4]
#     AP = 1*(1/4) + 1*(1/4) = 0.5
#   car AP = mean(5x 1.0, 5x 0.5) = 0.75;  car AP50 = 1.0.
# person: gt exists, no person prediction anywhere -> AP = AP50 = 0.0
#   (officially: haveGt and not havePred -> 0), and person IS averaged.
# all other classes: no gt -> nan -> excluded.
#   allAp = (0.75 + 0)/2 = 0.375;  allAp50 = (1.0 + 0)/2 = 0.5.
# ---------------------------------------------------------------------------

def _ap_fixture_image():
    gt = np.full((10, 100), ROAD, np.int64)
    gt[:, 0:20] = 26000
    gt[:, 20:40] = 26001
    gt[:, 40:50] = 26
    gt[0:5, 50:52] = 26002
    gt[5:10, 52:72] = 24000

    def mask(rows, cols):
        m = np.zeros((10, 100), np.uint8)
        m[rows[0] : rows[1], cols[0] : cols[1]] = 1
        return m

    preds = [
        (mask((0, 10), (0, 20)), CAR, 0.90),    # P1
        (mask((0, 10), (0, 16)), CAR, 0.80),    # P2 (duplicate of G1)
        (mask((0, 10), (20, 35)), CAR, 0.85),   # P6
        (mask((0, 10), (40, 50)), CAR, 0.70),   # P3 (group-suppressed)
        (mask((0, 5), (50, 52)), CAR, 0.50),    # P5 (small-suppressed)
        (mask((0, 10), (60, 80)), CAR, 0.60),   # P4 (plain FP)
    ]
    return gt, preds


def test_ap_oracle_duplicates_groups_hard_fns():
    gt, preds = _ap_fixture_image()
    stat = match_single_image(gt, preds)
    # per-threshold literals first — they localize a failure precisely
    for th in (0.50, 0.55, 0.60, 0.65, 0.70):
        assert _class_overlap_ap(stat.gts[CAR], stat.preds[CAR], th) == \
            pytest.approx(1.0), th
    for th in (0.75, 0.80, 0.85, 0.90, 0.95):
        assert _class_overlap_ap(stat.gts[CAR], stat.preds[CAR], th) == \
            pytest.approx(0.5), th
    res = ap_summarize(stat)
    assert res["per_class"]["car"]["ap"] == pytest.approx(0.75)
    assert res["per_class"]["car"]["ap50"] == pytest.approx(1.0)
    assert res["per_class"]["person"]["ap"] == pytest.approx(0.0)
    assert np.isnan(res["per_class"]["rider"]["ap"])  # no gt -> excluded
    assert res["allAp"] == pytest.approx(0.375)
    assert res["allAp50"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# AP fixture 2 — the group+small DOUBLE-COUNT in FP discounting.
#
# The official FP loop discounts ignored overlap via two INDEPENDENT
# checks (group: instID < 1000; small: pixelCount < minRegionSize); a
# region that is both adds its intersection TWICE.
#
# gt map (10x100): GRP = 26 at rows 0..3 cols 0..9 (area 40 — a group
# AND, under the default minRegionSize=100, too small);
# G = 26000 at cols 50..69 (area 200); rest road.
# preds: PT cols 50..69 score 0.90 (IoU(G) = 1.0 -> TP at every th);
#        P7 rows 0..9 cols 0..9, area 100, score 0.95 (ABOVE the TP):
#          overlap with GRP: inter 40 -> IoU = 40/(40+100-40) = 0.4,
#          NOT > 0.5 -> not suppressed by foundGt.
#
# Case A (minRegionSize = 100, the protocol default): GRP is group AND
#   small -> ignore = 40 + 40 = 80; 80/100 = 0.8 > 0.5 -> P7 DISCARDED.
#   y = [0.9 T]: cutoff 0.90: tp=1 fp=0 fn=0 -> p=1, r=1; artificial
#   p=1, r=0. precision=[1,1], recall=[1,0]; recall'=[1,1,0,0];
#   steps=[1/2,1/2] -> AP(0.5) = 1.0.
#   A single-count reading (ignore = 40, 0.4 <= 0.5 -> FP) would score
#   0.25 instead — this literal pins the double-count.
# Case B (minRegionSize = 30): GRP (40 px) is NOT small -> ignore = 40
#   single-counted; 0.4 <= 0.5 -> P7 is an FP at score 0.95, ABOVE the TP.
#   y ascending = [0.9 T, 0.95 F], cumsum=[1,1]->+0, n=2, nTrue=1:
#     cutoff 0.90: tp=1 fp=1 fn=0 -> p=1/2, r=1
#     cutoff 0.95: below=cumsum[0]=1 -> tp=0 fp=1 fn=1 -> p=0, r=0
#     artificial:                       p=1, r=0
#   precision=[1/2, 0, 1], recall=[1, 0, 0]; recall'=[1,1,0,0,0];
#   steps=[(1-0)/2, (1-0)/2, 0]=[1/2,1/2,0] -> AP(0.5) = 1/4.
# ---------------------------------------------------------------------------

def test_ap_oracle_group_small_double_count():
    gt = np.full((10, 100), ROAD, np.int64)
    gt[0:4, 0:10] = 26
    gt[:, 50:70] = 26000
    pt = np.zeros((10, 100), np.uint8)
    pt[:, 50:70] = 1
    p7 = np.zeros((10, 100), np.uint8)
    p7[:, 0:10] = 1
    preds = [(pt, CAR, 0.90), (p7, CAR, 0.95)]

    stat_a = match_single_image(gt, preds, min_region_size=100)
    assert _class_overlap_ap(stat_a.gts[CAR], stat_a.preds[CAR], 0.5) == \
        pytest.approx(1.0)

    stat_b = match_single_image(gt, preds, min_region_size=30)
    assert _class_overlap_ap(stat_b.gts[CAR], stat_b.preds[CAR], 0.5) == \
        pytest.approx(0.25)
