"""PQ evaluator + panoptic file protocol: hand-computed golden cases."""

import glob
import json
import os

import numpy as np
import pytest

from panoptic_forecasting_tpu.eval import pq
from panoptic_forecasting_tpu.eval.panoptic_protocol import (
    gt_panoptic_from_instance_ids,
    relabel_panoptic_trainid_to_labelid,
    segments_info_from_labelid_seg,
    write_panoptic_png,
)

CAR = 26        # labelId, thing
ROAD = 7        # labelId, stuff
BUILDING = 11   # labelId, stuff


def seg_info(*entries):
    return [{"id": i, "category_id": c, "iscrowd": cr}
            for i, c, cr in entries]


def test_perfect_match_pq_one():
    gt = np.zeros((10, 10), np.int64)
    gt[:5] = CAR * 1000 + 0
    gt[5:] = ROAD
    res_stat = pq.pq_compute_single_image(
        gt, seg_info((CAR * 1000, CAR, 0), (ROAD, ROAD, 0)),
        gt.copy(), seg_info((CAR * 1000, CAR, 0), (ROAD, ROAD, 0)),
    )
    res = pq.summarize(res_stat)
    # panopticapi averages only over classes with tp+fp+fn > 0
    assert res["All"]["pq"] == pytest.approx(1.0)
    assert res["All"]["n"] == 2
    assert res["per_class"]["car"]["pq"] == pytest.approx(1.0)
    assert res["per_class"]["road"]["pq"] == pytest.approx(1.0)
    assert res["Things"]["pq"] == pytest.approx(1.0)
    assert res["Stuff"]["pq"] == pytest.approx(1.0)


def test_iou_exactly_half_does_not_match():
    # Surround with ROAD (not void) so the void-discount doesn't shrink
    # the union: inter 8, union 16 -> iou exactly 0.5 -> no match (strict >).
    gt = np.full((2, 10), ROAD, np.int64)
    gt[:, :6] = CAR * 1000
    pred = np.full((2, 10), ROAD, np.int64)
    pred[:, 2:8] = CAR * 1000
    stat = pq.pq_compute_single_image(
        gt, seg_info((CAR * 1000, CAR, 0), (ROAD, ROAD, 0)),
        pred, seg_info((CAR * 1000, CAR, 0), (ROAD, ROAD, 0)),
    )
    s = stat.per_cat[CAR]
    assert (s.tp, s.fp, s.fn) == (0, 1, 1)


def test_partial_match_stats():
    gt = np.zeros((4, 10), np.int64)
    gt[0] = CAR * 1000 + 0
    gt[1] = CAR * 1000 + 1
    pred = np.zeros((4, 10), np.int64)
    pred[0] = CAR * 1000 + 7  # matches gt instance 0 exactly
    stat = pq.pq_compute_single_image(
        gt, seg_info((CAR * 1000, CAR, 0), (CAR * 1000 + 1, CAR, 0)),
        pred, seg_info((CAR * 1000 + 7, CAR, 0)),
    )
    s = stat.per_cat[CAR]
    assert (s.tp, s.fp, s.fn) == (1, 0, 1)
    assert s.iou == pytest.approx(1.0)
    res = pq.summarize(stat)
    assert res["per_class"]["car"]["pq"] == pytest.approx(1.0 / 1.5)


def test_crowd_gt_absorbs_unmatched_pred_and_is_not_fn():
    gt = np.zeros((4, 10), np.int64)
    gt[:2] = CAR  # plain thing labelId < 1000 == crowd region
    pred = np.zeros((4, 10), np.int64)
    pred[:2] = CAR * 1000  # pred fully inside crowd, no real gt instance
    stat = pq.pq_compute_single_image(
        gt, seg_info((CAR, CAR, 1)),
        pred, seg_info((CAR * 1000, CAR, 0)),
    )
    s = stat.per_cat.get(CAR, pq.PQStatCat())
    assert (s.tp, s.fp, s.fn) == (0, 0, 0)


def test_void_overlap_discounted_from_union():
    # gt: half the pred's pixels are void (0); pred extends over both.
    gt = np.zeros((2, 10), np.int64)
    gt[0] = CAR * 1000
    pred = np.zeros((2, 10), np.int64)
    pred[:] = CAR * 1000
    # inter 10, pred 20, gt 10; union = 10+20-10-|void∩pred|=10 -> iou 1.0
    stat = pq.pq_compute_single_image(
        gt, seg_info((CAR * 1000, CAR, 0)),
        pred, seg_info((CAR * 1000, CAR, 0)),
    )
    s = stat.per_cat[CAR]
    assert s.tp == 1
    assert s.iou == pytest.approx(1.0)


def test_mostly_void_pred_not_fp():
    gt = np.zeros((2, 10), np.int64)  # all void
    pred = np.zeros((2, 10), np.int64)
    pred[0, :6] = CAR * 1000
    stat = pq.pq_compute_single_image(
        gt, [], pred, seg_info((CAR * 1000, CAR, 0)),
    )
    s = stat.per_cat.get(CAR, pq.PQStatCat())
    assert s.fp == 0  # 100% void overlap -> discarded


def test_relabel_trainid_to_labelid():
    seg = np.array([[255, 0, 10], [13 * 1000 + 5, 11 * 1000, 2]], np.int64)
    out = relabel_panoptic_trainid_to_labelid(seg)
    assert out[0, 0] == 0            # void -> 0
    assert out[0, 1] == 7            # road
    assert out[0, 2] == 23           # sky
    assert out[1, 0] == 26 * 1000 + 5  # car inst 5
    assert out[1, 1] == 24 * 1000      # person inst 0
    assert out[1, 2] == 11             # building


def test_segments_info_and_png_roundtrip(tmp_path):
    seg = np.zeros((8, 8), np.int64)
    seg[:4] = 26 * 1000 + 3
    seg[4:6] = 7
    info = segments_info_from_labelid_seg(seg)
    by_id = {s["id"]: s for s in info}
    assert by_id[26 * 1000 + 3]["category_id"] == 26
    assert by_id[7]["category_id"] == 7
    assert 0 not in by_id
    path = str(tmp_path / "pan.png")
    write_panoptic_png(path, seg)
    from panoptic_forecasting_tpu.data.io import load_png

    decoded = pq.decode_panoptic_png(load_png(path))
    np.testing.assert_array_equal(decoded, seg)


def test_gt_conversion_from_instance_ids():
    inst = np.zeros((6, 6), np.int64)
    inst[0] = 7                # road stuff
    inst[1] = 26               # car crowd region
    inst[2] = 26002            # car instance
    inst[3] = 9                # parking: ignored -> void
    seg, segments = gt_panoptic_from_instance_ids(inst)
    by_id = {s["id"]: s for s in segments}
    assert by_id[7]["iscrowd"] == 0
    assert by_id[26]["iscrowd"] == 1
    assert by_id[26002] == {"id": 26002, "category_id": 26, "area": 6,
                            "iscrowd": 0}
    assert 9 not in by_id
    assert (seg[3] == 0).all()


def test_folder_protocol_self_eval_is_perfect(tmp_path):
    rng = np.random.RandomState(0)
    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    anns = []
    for i in range(2):
        seg = np.zeros((16, 32), np.int64)
        seg[:8] = ROAD
        seg[8:12] = 26 * 1000 + i
        seg[12:, rng.randint(0, 32)] = BUILDING
        name = f"city_{i:06d}_000019"
        fn = f"{name}_panoptic.png"
        write_panoptic_png(str(gt_dir / fn), seg)
        anns.append({"image_id": name, "file_name": fn,
                     "segments_info": segments_info_from_labelid_seg(seg)})
    jp = str(tmp_path / "gt.json")
    with open(jp, "w") as f:
        json.dump({"annotations": anns}, f)
    res = pq.pq_compute_folders(jp, str(gt_dir), jp, str(gt_dir))
    assert res["per_class"]["car"]["pq"] == pytest.approx(1.0)
    assert res["per_class"]["road"]["pq"] == pytest.approx(1.0)
    assert res["per_class"]["building"]["pq"] == pytest.approx(1.0)


def _naive_pq_stats(gt, gt_info, pr, pr_info, categories):
    """From-scratch per-pixel reimplementation of the panopticapi matching
    for the cross-check below — no shared code with eval/pq.py."""
    gt = np.asarray(gt); pr = np.asarray(pr)
    g_by_id = {s["id"]: s for s in gt_info if (gt == s["id"]).any()}
    p_by_id = {s["id"]: s for s in pr_info if (pr == s["id"]).any()}
    g_by_id = {i: s for i, s in g_by_id.items()
               if s["category_id"] in categories}
    p_by_id = {i: s for i, s in p_by_id.items()
               if s["category_id"] in categories}
    gt_void = ~np.isin(gt, list(g_by_id) or [0])
    out = {}  # cat -> [iou_sum, tp, fp, fn]

    def acc(c):
        return out.setdefault(c, [0.0, 0, 0, 0])

    matched_g, matched_p = set(), set()
    for gid, gs in g_by_id.items():
        if gs.get("iscrowd"):
            continue
        gm = gt == gid
        for pid, ps in p_by_id.items():
            if ps["category_id"] != gs["category_id"]:
                continue
            pm = pr == pid
            inter = (gm & pm).sum()
            if not inter:
                continue
            union = gm.sum() + pm.sum() - inter - (pm & gt_void).sum()
            iou = inter / union if union > 0 else 0.0
            if iou > 0.5:
                a = acc(gs["category_id"])
                a[0] += iou; a[1] += 1
                matched_g.add(gid); matched_p.add(pid)
    for gid, gs in g_by_id.items():
        if not gs.get("iscrowd") and gid not in matched_g:
            acc(gs["category_id"])[3] += 1
    crowd = {s["category_id"]: i for i, s in g_by_id.items()
             if s.get("iscrowd")}
    for pid, ps in p_by_id.items():
        if pid in matched_p:
            continue
        pm = pr == pid
        ig = (pm & gt_void).sum()
        cg = crowd.get(ps["category_id"])
        if cg is not None:
            ig += (pm & (gt == cg)).sum()
        if ig / pm.sum() > 0.5:
            continue
        acc(ps["category_id"])[2] += 1
    return out


def test_randomized_cross_check_vs_naive():
    cats = pq.eval_categories()
    rng = np.random.RandomState(11)
    for trial in range(8):
        h, w = 24, 32
        gt = np.zeros((h, w), np.int64)
        pr = np.zeros((h, w), np.int64)
        gt_info, pr_info = [], []
        used_g, used_p = set(), set()
        for arr, info, used in ((gt, gt_info, used_g),
                                (pr, pr_info, used_p)):
            for _ in range(rng.randint(2, 7)):
                cat = int(rng.choice([ROAD, BUILDING, CAR, 24]))
                sid = cat * 1000 + rng.randint(0, 3) if cat >= 24 else cat
                r0, c0 = rng.randint(0, h - 4), rng.randint(0, w - 4)
                hh, ww = rng.randint(2, 12, 2)
                arr[r0:r0 + hh, c0:c0 + ww] = sid
                if sid not in used:
                    used.add(sid)
                    info.append({"id": sid, "category_id": cat,
                                 "iscrowd": int(cat >= 24
                                                and rng.rand() < 0.2
                                                and sid % 1000 == 0)})
        gt_info = [s for s in gt_info if (gt == s["id"]).any()]
        pr_info = [s for s in pr_info if (pr == s["id"]).any()]
        # preds never carry iscrowd
        for s in pr_info:
            s["iscrowd"] = 0
        stat = pq.pq_compute_single_image(gt, gt_info, pr, pr_info, cats)
        want = _naive_pq_stats(gt, gt_info, pr, pr_info, cats)
        for c in set(list(want) + list(stat.per_cat)):
            s = stat.per_cat.get(c)
            wv = want.get(c, [0.0, 0, 0, 0])
            got = ([s.iou, s.tp, s.fp, s.fn] if s else [0.0, 0, 0, 0])
            assert got[1:] == wv[1:], (trial, c, got, wv)
            assert got[0] == pytest.approx(wv[0]), (trial, c)


def test_convert_gt_split_reuses_complete_conversion(tmp_path):
    """GT conversion is reused when it covers exactly the requested frame
    set (GT is immutable; reconverting a full split costs ~a minute per
    eval run), and redone when incomplete."""
    import time

    from panoptic_forecasting_tpu.data.io import save_png
    from panoptic_forecasting_tpu.eval.panoptic_protocol import (
        convert_gt_split,
    )

    cs = tmp_path / "cs"
    gt_dir = cs / "gtFine" / "val" / "city"
    os.makedirs(gt_dir)
    for fr in ("000019", "000049"):
        inst = np.full((16, 32), 7, np.int32)
        inst[8:, :8] = 26000 + int(fr[-2:])
        save_png(str(gt_dir / f"city_000000_{fr}_gtFine_instanceIds.png"),
                 inst)
    out = str(tmp_path / "conv")
    jp = convert_gt_split(str(cs), "val", out)
    png_dir = os.path.join(out, "cityscapes_panoptic_val")
    pngs = sorted(glob.glob(os.path.join(png_dir, "*.png")))
    assert len(pngs) == 2
    mtimes = [os.path.getmtime(p) for p in pngs]

    time.sleep(0.05)
    assert convert_gt_split(str(cs), "val", out) == jp
    assert [os.path.getmtime(p) for p in pngs] == mtimes  # reused, no rewrite

    # A missing PNG invalidates the reuse: conversion runs again.
    os.remove(pngs[0])
    convert_gt_split(str(cs), "val", out)
    assert os.path.exists(pngs[0])

    # A narrower frame filter does not reuse the full-split conversion.
    jp2 = convert_gt_split(str(cs), "val", str(tmp_path / "conv2"),
                           frames={"city_000000_000019"})
    with open(jp2) as f:
        assert len(json.load(f)["annotations"]) == 1
