"""Summarize a jax.profiler TPU trace: modules, categories, top ops.

Round 4 established that trace capture works through the tunneled
attachment (scripts/prof_fused_trace.py) and that the xplane.pb is the
only complete record (the chrome-trace json truncates at 1M events).
No xplane proto ships in this image, so scripts/xplane.proto carries a
hand-reconstruction of the public tsl XSpace schema; this script
compiles it with the baked-in protoc on first use.

Usage:
    python scripts/prof_trace_summary.py /tmp/pf_fused_trace [module-prefix]

Finds the newest plugins/profile/*/ *.xplane.pb under the given dir,
picks the LAST execution of the jit module whose name starts with
module-prefix (default 'jit_loop'), and prints: total span, per-HLO-
category totals, and the top ops by accumulated duration. When the
module wraps a K-iteration scan (the bench harness), divide by K for
per-frame numbers.

This workflow found round-4's two fused-program wins: the corner-fold
T(4,128) transpose and the sort stability iota (docs/perf_notes.md).
"""
from __future__ import annotations

import collections
import glob
import os
import subprocess
import sys


def _load_xplane_pb2():
    here = os.path.dirname(os.path.abspath(__file__))
    out = "/tmp/pf_xplane_gen"
    os.makedirs(out, exist_ok=True)
    gen = os.path.join(out, "xplane_pb2.py")
    if not os.path.exists(gen):
        subprocess.run(
            ["protoc", f"--python_out={out}",
             "--proto_path", here, "xplane.proto"],
            check=True,
        )
    sys.path.insert(0, out)
    import xplane_pb2  # noqa: E402

    return xplane_pb2


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pf_fused_trace"
    prefix = sys.argv[2] if len(sys.argv) > 2 else "jit_loop"
    pbs = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")
    ))
    if not pbs:
        sys.exit(f"no *.xplane.pb under {trace_dir}/plugins/profile/*/")
    pb = pbs[-1]
    print(f"trace: {pb}")

    xplane_pb2 = _load_xplane_pb2()
    sp = xplane_pb2.XSpace()
    with open(pb, "rb") as f:
        sp.ParseFromString(f.read())
    tpus = [p for p in sp.planes if p.name.startswith("/device:TPU")]
    if not tpus:
        sys.exit("no TPU plane in trace")
    tpu = tpus[0]
    em, sm = tpu.event_metadata, tpu.stat_metadata
    lines = {l.name: l for l in tpu.lines}
    mods, ops = lines.get("XLA Modules"), lines.get("XLA Ops")
    if mods is None or ops is None:
        sys.exit("trace lacks XLA Modules / XLA Ops lines")

    execs = [e for e in mods.events
             if em[e.metadata_id].name.startswith(prefix)]
    if not execs:
        names = collections.Counter(
            em[e.metadata_id].name for e in mods.events
        )
        sys.exit(f"no module starts with {prefix!r}; have: "
                 f"{[n for n, _ in names.most_common(8)]}")
    last = max(execs, key=lambda e: e.offset_ps)
    lo, hi = last.offset_ps, last.offset_ps + last.duration_ps
    print(f"module {em[last.metadata_id].name!r}: "
          f"{last.duration_ps / 1e9:.2f} ms span")

    cat_ids = [k for k, v in sm.items() if v.name == "hlo_category"]
    cat_id = cat_ids[0] if cat_ids else None

    def cat_of(e):
        for st in list(e.stats) + list(em[e.metadata_id].stats):
            if st.metadata_id == cat_id:
                return st.str_value
        return "?"

    cats = collections.defaultdict(int)
    per_op = collections.defaultdict(lambda: [0, 0])
    for e in ops.events:
        if e.offset_ps < lo or e.offset_ps >= hi:
            continue
        c = cat_of(e)
        if c == "while":  # outer loop wrapper double-counts its body
            continue
        cats[c] += e.duration_ps
        nm = em[e.metadata_id].name
        per_op[nm][0] += e.duration_ps
        per_op[nm][1] += 1

    print("\n-- by HLO category --")
    for c, tot in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{tot / 1e9:10.2f} ms  {c}")
    print("\n-- top 25 ops --")
    for nm, (tot, n) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{tot / 1e9:9.2f} ms x{n:5d}  {nm[:110]}")


if __name__ == "__main__":
    main()
