"""Instance-AP evaluator: hand-computed golden cases (Cityscapes protocol)."""

import os

import numpy as np
import pytest

from panoptic_forecasting_tpu.eval import instance_ap
from panoptic_forecasting_tpu.eval.instance_ap import (
    APStat,
    ap_compute_folders,
    eval_label_ids,
    match_single_image,
    summarize,
)

CAR = 26
PERSON = 24
ROAD = 7


def box_mask(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), bool)
    m[r0:r1, c0:c1] = True
    return m


def gt_map(h, w, *instances):
    """instances = (labelId, k, r0, r1, c0, c1); background = ROAD (void)."""
    g = np.full((h, w), ROAD, np.int64)
    for lid, k, r0, r1, c0, c1 in instances:
        g[r0:r1, c0:c1] = lid * 1000 + k
    return g


def test_eval_label_ids_are_the_8_things():
    assert eval_label_ids() == [24, 25, 26, 27, 28, 31, 32, 33]


def test_perfect_prediction_ap_one():
    g = gt_map(40, 40, (CAR, 0, 0, 20, 0, 20))
    stat = match_single_image(g, [(g == CAR * 1000, CAR, 0.9)])
    res = summarize(stat)
    assert res["allAp"] == pytest.approx(1.0)
    assert res["allAp50"] == pytest.approx(1.0)
    assert res["per_class"]["car"]["ap"] == pytest.approx(1.0)
    # classes with no gt don't enter the average
    assert np.isnan(res["per_class"]["person"]["ap"])


def test_partial_overlap_counts_at_low_thresholds_only():
    # gt rows 0..20, pred rows 0..30 of a 20-wide column:
    # inter 400, union 600 -> IoU 2/3: TP for th in {.50,.55,.60,.65},
    # FP for th >= .70 (ignored-fraction 200/600 = 1/3 <= th never skips it
    # ... 1/3 < .70 so it IS an FP there), and the gt is a hard FN there.
    g = gt_map(40, 40, (CAR, 0, 0, 20, 10, 30))
    pred = box_mask(40, 40, 0, 30, 10, 30)
    stat = match_single_image(g, [(pred, CAR, 0.9)])
    res = summarize(stat)
    # 4 thresholds at AP 1, 6 at AP 0
    assert res["per_class"]["car"]["ap"] == pytest.approx(0.4)
    assert res["per_class"]["car"]["ap50"] == pytest.approx(1.0)


def test_strictly_greater_than_threshold():
    # IoU exactly 0.5: inter 100, union 200 (gt 2x disjoint halves trick
    # not needed -- pred 200 px, gt 100 px, inter 100).
    g = gt_map(40, 40, (CAR, 0, 0, 10, 0, 10))
    pred = box_mask(40, 40, 0, 20, 0, 10)
    stat = match_single_image(g, [(pred, CAR, 0.9)])
    res = summarize(stat)
    assert res["per_class"]["car"]["ap50"] == pytest.approx(0.0)


def test_duplicate_detection_is_fp():
    # Two identical predictions of one gt: the higher score is TP, the
    # lower is FP. Curve: scores [.9 TP, .4 FP] -> precision 1 at r=1
    # (cutoff .9), so AP 1.0... the FP only hurts below the TP score.
    g = gt_map(40, 40, (CAR, 0, 0, 20, 0, 20))
    m = g == CAR * 1000
    stat = match_single_image(g, [(m, CAR, 0.9), (m, CAR, 0.4)])
    res = summarize(stat)
    assert res["per_class"]["car"]["ap50"] == pytest.approx(1.0)
    # Reverse: FP outranks the TP -> at cutoff .9 precision 1 but that IS
    # the FP... duplicate resolution keeps the max score as the TP, so the
    # result is symmetric: still AP 1.
    stat2 = match_single_image(g, [(m, CAR, 0.4), (m, CAR, 0.9)])
    assert summarize(stat2)["per_class"]["car"]["ap50"] == \
        pytest.approx(1.0)


def test_false_positive_above_tp_costs_three_quarters():
    # One TP (score .5) + one disjoint FP at HIGHER score (.9).
    # Curve points (cutoff .5): p=.5, r=1; (cutoff .9): p=0, r=0; plus the
    # artificial (p=1, r=0). Centered-difference steps: [.5, .5, 0] ->
    # AP = .5*.5 + .5*0 + 0*1 = 0.25 (the protocol's exact integration).
    g = gt_map(40, 40, (CAR, 0, 0, 20, 0, 20))
    tp_mask = g == CAR * 1000
    fp_mask = box_mask(40, 40, 25, 39, 25, 39)
    stat = match_single_image(g, [(tp_mask, CAR, 0.5), (fp_mask, CAR, 0.9)])
    res = summarize(stat)
    assert res["per_class"]["car"]["ap50"] == pytest.approx(0.25)


def test_missed_gt_is_hard_fn():
    # Two gts, one perfect pred: recall saturates at 0.5 -> AP 0.5.
    g = gt_map(40, 40, (CAR, 0, 0, 15, 0, 15), (CAR, 1, 20, 35, 20, 35))
    stat = match_single_image(g, [(g == CAR * 1000, CAR, 0.9)])
    res = summarize(stat)
    assert res["per_class"]["car"]["ap50"] == pytest.approx(0.5)


def test_void_overlap_discounts_false_positive():
    # Prediction entirely over an ignore_in_eval region (4 = "static"):
    # ignored fraction 1.0 > th at every threshold -> never an FP; with a
    # separate perfect TP the class stays at AP 1. A prediction on ROAD
    # (a *stuff eval* class, NOT void) is by contrast a real FP.
    g = gt_map(40, 40, (CAR, 0, 0, 20, 0, 20))
    g[25:, :] = 4  # static: ignore_in_eval
    void_pred = box_mask(40, 40, 25, 39, 0, 39)
    stat = match_single_image(
        g, [(g == CAR * 1000, CAR, 0.9), (void_pred, CAR, 0.95)]
    )
    res = summarize(stat)
    assert res["per_class"]["car"]["ap"] == pytest.approx(1.0)


def test_stuff_pixels_are_not_void():
    # The same high-scored hallucination over ROAD is a real FP: AP drops
    # to 0.25 exactly as in the disjoint-FP case.
    g = gt_map(40, 40, (CAR, 0, 0, 20, 0, 20))
    road_pred = box_mask(40, 40, 25, 39, 0, 39)
    stat = match_single_image(
        g, [(g == CAR * 1000, CAR, 0.5), (road_pred, CAR, 0.9)]
    )
    res = summarize(stat)
    assert res["per_class"]["car"]["ap50"] == pytest.approx(0.25)


def test_group_region_suppresses_but_never_matches():
    # A bare-labelId car region (crowd/group): a pred covering it exactly
    # is suppressed (overlap > th via the group) -- no TP, no FP -- and
    # the group itself is never a false negative. With no real car gt the
    # class has no valid AP.
    g = gt_map(40, 40)
    g[0:20, 0:20] = CAR  # group region: raw labelId, no *1000
    pred = box_mask(40, 40, 0, 20, 0, 20)
    stat = match_single_image(g, [(pred, CAR, 0.9)])
    res = summarize(stat)
    assert np.isnan(res["per_class"]["car"]["ap"])

    # Alongside a real instance, a half-group-covering pred is discounted
    # (group inter fraction > th) rather than counted FP at th=0.5.
    g2 = gt_map(40, 40, (CAR, 0, 0, 20, 0, 20))
    g2[25:, :] = CAR  # big group strip
    half_group = box_mask(40, 40, 25, 39, 0, 20)  # inside the group
    stat2 = match_single_image(
        g2, [(g2 == CAR * 1000, CAR, 0.9), (half_group, CAR, 0.95)]
    )
    res2 = summarize(stat2)
    assert res2["per_class"]["car"]["ap50"] == pytest.approx(1.0)


def test_small_gt_is_ignored_not_fn_and_discounts_pred():
    # gt below min_region_size (100 px): a pred covering it exactly is
    # neither TP nor FP (covered pixels are all ignore), and the gt is not
    # a hard FN. With no other gt the class has no valid AP -> excluded.
    g = gt_map(40, 40, (CAR, 0, 0, 5, 0, 5))  # 25 px < 100
    stat = match_single_image(g, [(g == CAR * 1000, CAR, 0.9)])
    res = summarize(stat)
    assert np.isnan(res["per_class"]["car"]["ap"])
    assert res["allAp"] == pytest.approx(0.0)  # nothing valid anywhere


def test_wrong_class_prediction_is_fp_for_its_own_class():
    # A person-labeled pred exactly on a car gt: car gets a hard FN
    # (AP 0); person has no gt -> nan, the pred overlaps only void+car
    # (void fraction counts gt-car pixels? no -- car gt >= 1000 is NOT
    # void, and it isn't matched cross-class, so the pred is a clean FP
    # for person... but person has no gt so its AP is nan and the FP
    # never surfaces in the averages).
    g = gt_map(40, 40, (CAR, 0, 0, 20, 0, 20))
    stat = match_single_image(g, [(g == CAR * 1000, PERSON, 0.9)])
    res = summarize(stat)
    assert res["per_class"]["car"]["ap"] == pytest.approx(0.0)
    assert np.isnan(res["per_class"]["person"]["ap"])


def test_multi_image_accumulation():
    g1 = gt_map(40, 40, (CAR, 0, 0, 20, 0, 20))
    g2 = gt_map(40, 40, (CAR, 0, 10, 30, 10, 30))
    stat = match_single_image(g1, [(g1 == CAR * 1000, CAR, 0.9)])
    stat += match_single_image(g2, [(g2 == CAR * 1000, CAR, 0.8)])
    res = summarize(stat)
    assert res["per_class"]["car"]["ap"] == pytest.approx(1.0)


def test_ap_folder_protocol_roundtrip(tmp_path):
    """Write the export layout cli/export_instances.py produces, score it."""
    from panoptic_forecasting_tpu.data.io import save_png

    h, w = 48, 64
    g = gt_map(h, w, (CAR, 0, 0, 24, 0, 24), (PERSON, 3, 30, 44, 30, 44))
    gt_dir = tmp_path / "gtFine" / "val" / "city"
    gt_dir.mkdir(parents=True)
    save_png(str(gt_dir / "city_000000_000019_gtFine_instanceIds.png"),
             g.astype(np.int32))

    pred_dir = tmp_path / "pred"
    pred_dir.mkdir()
    name = "city_000000_000019"
    car_mask = (g == CAR * 1000).astype(np.uint8) * 255
    person_mask = (g == PERSON * 1000 + 3).astype(np.uint8) * 255
    save_png(str(pred_dir / f"{name}_{CAR}_0.png"), car_mask)
    save_png(str(pred_dir / f"{name}_{PERSON}_0.png"), person_mask)
    with open(pred_dir / f"{name}.txt", "w") as f:
        f.write(f"{name}_{CAR}_0.png {CAR} 0.900000\n")
        f.write(f"{name}_{PERSON}_0.png {PERSON} 0.800000\n")

    res = ap_compute_folders(str(pred_dir), str(tmp_path / "gtFine" / "val"))
    assert res["allAp"] == pytest.approx(1.0)
    assert res["allAp50"] == pytest.approx(1.0)
    assert res["per_class"]["car"]["ap"] == pytest.approx(1.0)
    assert res["per_class"]["person"]["ap"] == pytest.approx(1.0)

    out = instance_ap.format_results(res)
    assert "all" in out and "car" in out


def test_ap_folder_missing_prediction_raises(tmp_path):
    """The sweep is driven from the GT list (evalInstanceLevelSemantic-
    Labeling protocol): a gt frame with no manifest is an error, never a
    silent skip that would drop its instances from the FN pool."""
    from panoptic_forecasting_tpu.data.io import save_png

    h, w = 48, 64
    gt_dir = tmp_path / "gtFine" / "val" / "city"
    gt_dir.mkdir(parents=True)
    for frame in ("000019", "000049"):
        g = gt_map(h, w, (CAR, 0, 0, 24, 0, 24))
        save_png(
            str(gt_dir / f"city_000000_{frame}_gtFine_instanceIds.png"),
            g.astype(np.int32),
        )
    pred_dir = tmp_path / "pred"
    pred_dir.mkdir()
    # Manifest (perfect) for the first frame only.
    name = "city_000000_000019"
    car_mask = (gt_map(h, w, (CAR, 0, 0, 24, 0, 24)) == CAR * 1000)
    save_png(str(pred_dir / f"{name}_{CAR}_0.png"),
             car_mask.astype(np.uint8) * 255)
    with open(pred_dir / f"{name}.txt", "w") as f:
        f.write(f"{name}_{CAR}_0.png {CAR} 0.900000\n")

    with pytest.raises(ValueError, match="no prediction manifest"):
        ap_compute_folders(str(pred_dir), str(tmp_path / "gtFine" / "val"))


def test_instance_ids_png_16bit_roundtrip(tmp_path):
    """Cityscapes instanceIds PNGs are 16-bit; io must preserve >255."""
    from panoptic_forecasting_tpu.data.io import load_png, save_png

    g = np.full((8, 8), CAR * 1000 + 7, np.int32)
    p = str(tmp_path / "ids.png")
    save_png(p, g)
    back = load_png(p)
    assert back.dtype.itemsize >= 2
    np.testing.assert_array_equal(back, g)


# ---------------------------------------------------------------------------
# Randomized cross-check against an independently-coded naive scorer.
# ---------------------------------------------------------------------------

def _naive_ap(images, label_id, th, min_region=100):
    """Straightforward per-pixel re-implementation of the protocol for one
    (class, threshold): no shared code with eval/instance_ap.py."""
    import math

    ys, ss = [], []
    hard_fns = 0
    void_ids = {l.id for l in
                __import__("panoptic_forecasting_tpu.data.cityscapes",
                           fromlist=["LABELS"]).LABELS
                if l.ignore_in_eval and l.id >= 0}
    for g, preds in images:
        ids = [int(v) for v in np.unique(g)]
        real = [i for i in ids if i >= 1000 and i // 1000 == label_id
                and (g == i).sum() >= min_region]
        ignore_insts = [i for i in ids
                        if ((i >= 1000 and i // 1000 == label_id
                             and (g == i).sum() < min_region)
                            or (i < 1000 and i == label_id))]
        groups = [i for i in ids if i < 1000 and i == label_id]
        small = [i for i in ids
                 if ((i >= 1000 and i // 1000 == label_id) or
                     (i < 1000 and i == label_id))
                 and (g == i).sum() < min_region]
        mine = [(m != 0, s) for m, lid, s in preds if lid == label_id
                and (m != 0).sum() > 0]
        # gt side
        for i in real:
            gm = g == i
            ga = gm.sum()
            hits = []
            for pm, s in mine:
                inter = (gm & pm).sum()
                if inter and inter / (ga + pm.sum() - inter) > th:
                    hits.append(s)
            if hits:
                hits.sort(reverse=True)
                ys.append(1); ss.append(hits[0])
                for s in hits[1:]:
                    ys.append(0); ss.append(s)
            else:
                hard_fns += 1
        # pred side
        cand = [i for i in ids if (i >= 1000 and i // 1000 == label_id)
                or (i < 1000 and i == label_id)]
        for pm, s in mine:
            pa = pm.sum()
            found = False
            for i in cand:
                gm = g == i
                inter = (gm & pm).sum()
                if inter and inter / (gm.sum() + pa - inter) > th:
                    found = True
                    break
            if found:
                continue
            ig = sum(pm[g == v].sum() for v in void_ids)
            for i in cand:
                inter = (pm & (g == i)).sum()
                if i in groups:
                    ig += inter
                if i in small:
                    ig += inter
            if ig / pa <= th:
                ys.append(0); ss.append(s)
    if not any((g == i).sum() >= min_region for g, _ in images
               for i in np.unique(g)
               if i >= 1000 and i // 1000 == label_id):
        return float("nan")
    if not ys and hard_fns == 0:
        return float("nan")
    if not any(True for g, preds in images
               for m, lid, s in preds
               if lid == label_id and (m != 0).sum() > 0):
        return 0.0
    # PR-curve integration re-derived from the protocol definition with
    # explicit per-threshold filtering — deliberately NOT the
    # cumsum/unique-index/convolve arithmetic of _curve_ap, so that code
    # is independently checked too: for each unique confidence cutoff
    # keep predictions with score >= cutoff, compute (precision, recall),
    # close the curve with the (recall 0, precision 1) sentinel, and
    # integrate with centered recall differences.
    total_true = sum(ys)
    pts = []
    for t in sorted(set(ss)):
        kept = [(s2, y2) for s2, y2 in zip(ss, ys) if s2 >= t]
        tp = float(sum(y2 for _, y2 in kept))
        fp = float(len(kept)) - tp
        fn = (total_true - tp) + hard_fns
        prec_t = tp / (tp + fp)
        rec_t = tp / (tp + fn) if (tp + fn) else 0.0
        pts.append((rec_t, prec_t))
    pts.append((0.0, 1.0))
    recs = [pts[0][0]] + [r for r, _ in pts] + [0.0]
    return float(sum(
        p * (recs[i] - recs[i + 2]) / 2.0
        for i, (_, p) in enumerate(pts)
    ))


def test_randomized_cross_check_vs_naive():
    rng = np.random.RandomState(7)
    for trial in range(8):
        images = []
        for _ in range(rng.randint(1, 4)):
            g = np.full((48, 48), ROAD, np.int64)
            # sprinkle ignore region
            if rng.rand() < 0.5:
                g[:rng.randint(4, 16), :] = 4
            # gt instances (some small), occasional group
            for k in range(rng.randint(0, 4)):
                r0, c0 = rng.randint(0, 40, 2)
                h, w = rng.randint(2, 20, 2)
                g[r0:r0 + h, c0:c0 + w] = CAR * 1000 + k
            if rng.rand() < 0.4:
                r0, c0 = rng.randint(0, 40, 2)
                g[r0:r0 + 8, c0:c0 + 8] = CAR
            preds = []
            for _ in range(rng.randint(0, 5)):
                r0, c0 = rng.randint(0, 40, 2)
                h, w = rng.randint(2, 24, 2)
                m = np.zeros_like(g, bool)
                m[r0:r0 + h, c0:c0 + w] = True
                preds.append((m, CAR, float(rng.rand())))
            images.append((g, preds))
        stat = APStat()
        for g, preds in images:
            stat += match_single_image(g, preds)
        from panoptic_forecasting_tpu.eval.instance_ap import (
            OVERLAPS, _class_overlap_ap)
        for th in OVERLAPS:
            got = _class_overlap_ap(stat.gts[CAR], stat.preds[CAR], th)
            want = _naive_ap(images, CAR, th)
            if math_isnan := (np.isnan(want) or np.isnan(got)):
                assert np.isnan(want) == np.isnan(got), (trial, th)
            else:
                assert got == pytest.approx(want), (trial, th)
