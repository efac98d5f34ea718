"""Attribute bg-stage trace time to HarDNet layers.

Joins the xplane op durations (scripts/prof_trace_summary.py machinery)
with the optimized-HLO metadata (op_name=".../HarDNet/<layer>/...") so
each layer's conv + its layout copies are charged together.

    python scripts/prof_bg_hlo.py > /tmp/bg_hlo.txt   # first
    python scripts/prof_bg_layout.py                  # writes the trace
    python scripts/prof_bg_attrib.py /tmp/pf_bg_trace /tmp/bg_hlo.txt
"""
from __future__ import annotations

import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from prof_trace_summary import _load_xplane_pb2

K = 20


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pf_bg_trace"
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bg_hlo.txt"

    # op name -> (layer, kind) from the HLO text.
    layer_of = {}
    pat = re.compile(r"%(\S+) = .*?op_name=\"([^\"]*)\"")
    for line in open(hlo_path):
        m = pat.search(line)
        if not m:
            continue
        nm, meta = m.groups()
        lm = re.search(r"HarDNet/([\w./]+?)/", meta)
        layer_of[nm] = lm.group(1) if lm else meta.split("/")[-1][:40]

    pbs = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    xplane_pb2 = _load_xplane_pb2()
    sp = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        sp.ParseFromString(f.read())
    tpu = [p for p in sp.planes if p.name.startswith("/device:TPU")][0]
    em = tpu.event_metadata
    lines = {l.name: l for l in tpu.lines}
    mods, ops = lines["XLA Modules"], lines["XLA Ops"]
    execs = [e for e in mods.events
             if em[e.metadata_id].name.startswith("jit_run")]
    last = max(execs, key=lambda e: e.offset_ps)
    lo, hi = last.offset_ps, last.offset_ps + last.duration_ps

    sm = tpu.stat_metadata
    cat_ids = [k for k, v in sm.items() if v.name == "hlo_category"]
    cat_id = cat_ids[0] if cat_ids else None

    def cat_of(e):
        for st in list(e.stats) + list(em[e.metadata_id].stats):
            if st.metadata_id == cat_id:
                return st.str_value
        return "?"

    per_layer = collections.defaultdict(lambda: collections.defaultdict(int))
    for e in ops.events:
        if e.offset_ps < lo or e.offset_ps >= hi:
            continue
        c = cat_of(e)
        if c == "while":
            continue
        # Event names are the full HLO instruction text ("%name = ...").
        nm = em[e.metadata_id].name.lstrip("%").split(" ")[0]
        layer = layer_of.get(nm, "(unattributed)")
        kind = ("copy" if c in ("data formatting", "copy-done", "copy-start",
                                "pad", "slice", "concatenate")
                else "conv" if "convolution" in c
                else c)
        per_layer[layer][kind] += e.duration_ps

    rows = sorted(per_layer.items(),
                  key=lambda kv: -sum(kv[1].values()))
    print(f"{'layer':30s} {'total':>7s} {'conv':>7s} {'copy':>7s}  other")
    for layer, kinds in rows:
        tot = sum(kinds.values()) / 1e9 / K
        conv = kinds.get("conv", 0) / 1e9 / K
        cp = kinds.get("copy", 0) / 1e9 / K
        other = {k: round(v / 1e9 / K, 3) for k, v in kinds.items()
                 if k not in ("conv", "copy") and v / 1e9 / K >= 0.005}
        print(f"{layer:30s} {tot:7.3f} {conv:7.3f} {cp:7.3f}  {other or ''}")


if __name__ == "__main__":
    main()
