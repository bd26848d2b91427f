"""Summarize a jax.profiler device trace (xplane.pb) without tensorflow.

Minimal protobuf wire-format walker over the XSpace proto: aggregates
per-op durations on the TPU device plane's "XLA Ops" line, grouped by op
category and by source location (extracted from the embedded HLO
metadata). Used to attribute scene time to kernels/fusions/copies through
the remote tunnel (full xprof is unavailable in this image).

Wire layout (verified against traces from this box's libtpu):
  XSpace.planes = 1; XPlane{id=1, name=2, lines=3, event_metadata=4}
  XLine{id=1, name=2, timestamp=3, events=4}
  XEvent{metadata_id=1, offset_ps=2, duration_ps=3, stats=4}
  XEventMetadata{id=1, name=2 (full HLO), display_name=4, stats=5}

Usage:
  python tools/trace_summary.py <trace_dir_or_xplane.pb> [top_n]
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import defaultdict

_CATS = [
    b"loop fusion", b"input fusion", b"output fusion", b"kLoop", b"kInput",
    b"data formatting", b"convolution", b"custom-call", b"copy",
    b"all-reduce", b"all-gather", b"reduce", b"scatter", b"gather",
    b"dot", b"dynamic-update-slice", b"dynamic-slice", b"fusion",
    b"infeed", b"outfeed", b"host",
]
_SRC = re.compile(rb"/root/repo/[\w/\.]+\.py:\d+")


def _varint(buf, i):
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, v


def _parse_meta(v):
    """event_metadata map entry -> (id, short_name, category, source)."""
    mid, short, cat, src = None, "", "", ""
    for f2, w2, v2 in fields(v):
        if f2 == 2 and w2 == 2:  # XEventMetadata
            blob = v2
            for f3, w3, v3 in fields(v2):
                if f3 == 1 and w3 == 0:
                    mid = v3
                elif f3 == 4 and w3 == 2:
                    short = v3.decode("utf-8", "replace")
                elif f3 == 2 and w3 == 2 and not short:
                    short = v3.decode("utf-8", "replace")[:60]
            for c in _CATS:
                if c in blob:
                    cat = c.decode()
                    break
            m = _SRC.search(blob)
            if m:
                src = m.group(0).decode()
        elif f2 == 1 and w2 == 0 and mid is None:
            mid = v2
    return mid, short, cat, src


def summarize(path, top_n=30):
    if os.path.isdir(path):
        cands = glob.glob(
            os.path.join(path, "**", "*.xplane.pb"), recursive=True
        )
        if not cands:
            raise FileNotFoundError(f"no xplane.pb under {path}")
        path = max(cands, key=os.path.getmtime)
    buf = open(path, "rb").read()
    print(f"# {path} ({len(buf) / 1e6:.1f} MB)")
    for fnum, wt, v in fields(buf):
        if fnum != 1 or wt != 2:
            continue
        name = ""
        meta = {}
        lines = []
        for f2, w2, v2 in fields(v):
            if f2 == 2 and w2 == 2:
                name = v2.decode("utf-8", "replace")
            elif f2 == 4 and w2 == 2:
                mid, short, cat, src = _parse_meta(v2)
                if mid is not None:
                    meta[mid] = (short, cat, src)
            elif f2 == 3 and w2 == 2:
                lname = ""
                evs = []
                for f3, w3, v3 in fields(v2):
                    if f3 == 2 and w3 == 2:
                        lname = v3.decode("utf-8", "replace")
                    elif f3 == 4 and w3 == 2:
                        mid, dur = 0, 0
                        for f4, w4, v4 in fields(v3):
                            if f4 == 1 and w4 == 0:
                                mid = v4
                            elif f4 == 3 and w4 == 0:
                                dur = v4
                        evs.append((mid, dur))
                lines.append((lname, evs))
        if "TPU" not in name or not lines:
            continue
        for lname, evs in lines:
            if "op" not in lname.lower() and len(lines) > 1:
                continue
            total = sum(d for _, d in evs)
            print(f"\n== {name} / line '{lname}': total {total / 1e9:.3f} ms"
                  f" ({len(evs)} events)")
            by_cat = defaultdict(lambda: [0, 0])
            by_src = defaultdict(lambda: [0, 0])
            by_op = defaultdict(lambda: [0, 0])
            for mid, dur in evs:
                short, cat, src = meta.get(mid, (f"#{mid}", "", ""))
                base = re.sub(r"[.\d]+$", "", short)
                for agg, key in ((by_cat, cat or "?"),
                                 (by_src, src or "?"),
                                 (by_op, base)):
                    agg[key][0] += dur
                    agg[key][1] += 1
            for title, agg in (("by category", by_cat),
                               ("by source", by_src), ("by op", by_op)):
                print(f"-- {title}")
                rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
                for nm, (dur, cnt) in rows[:top_n]:
                    print(f"{dur / 1e9:9.3f} ms  x{cnt:<5d} {nm[:100]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
