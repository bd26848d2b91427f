"""Summarize a jax.profiler device trace (xplane.pb) without tensorflow.

Minimal protobuf wire-format walker over the XSpace proto: aggregates
per-op durations on the TPU device plane(s), grouped by event name. Used
to attribute scene time to kernels/fusions/copies through the remote
tunnel (full xprof is unavailable in this image).

Usage:
  python tools/trace_summary.py <trace_dir_or_xplane.pb> [top_n]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


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


def parse_plane(buf):
    """XPlane -> (name, {metadata_id: name}, [(metadata_id, dur_ps)])."""
    name = ""
    meta = {}
    events = []
    for fnum, wt, v in fields(buf):
        if fnum == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fnum == 4 and wt == 2:  # event_metadata map entry
            mid, mname = None, ""
            for f2, w2, v2 in fields(v):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3 if mid is None else mid
                        elif f3 == 2 and w3 == 2:
                            mname = v3.decode("utf-8", "replace")
            if mid is not None:
                meta[mid] = mname
        elif fnum == 3 and wt == 2:  # XLine
            for f2, w2, v2 in fields(v):
                if f2 == 7 and w2 == 2:  # XEvent
                    mid, dur = 0, 0
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    events.append((mid, dur))
    return name, meta, events


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
        name, meta, events = parse_plane(v)
        if "TPU" not in name and "Device" not in name:
            continue
        agg = defaultdict(lambda: [0, 0])
        total = 0
        for mid, dur in events:
            a = agg[meta.get(mid, f"#{mid}")]
            a[0] += dur
            a[1] += 1
            total += dur
        print(f"\n== plane: {name}  total {total / 1e9:.3f} ms "
              f"({len(events)} events)")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
        for nm, (dur, cnt) in rows:
            print(f"{dur / 1e9:9.3f} ms  x{cnt:<5d} {nm[:110]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
