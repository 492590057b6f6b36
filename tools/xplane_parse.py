"""Minimal XSpace (.xplane.pb) parser — no tensorboard_plugin_profile
dependency (its bundled protobuf bindings are incompatible with this
image's protobuf). Decodes the protobuf wire format directly and prints
per-op total device times for the "XLA Ops" line of the TPU plane.

Usage: python tools/xplane_parse.py <trace_dir_or_pb> [n_img] [top_n]
"""

import glob
import os
import struct
import sys
from collections import defaultdict


def _varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) for a serialized message."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val = struct.unpack("<Q", buf[i : i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:
            val = struct.unpack("<I", buf[i : i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf):
    """XPlane -> (name, {metadata_id: name}, [(line_name, [(mid, dur_ps)])])."""
    name = ""
    meta = {}
    lines = []
    for fnum, _, val in fields(buf):
        if fnum == 2:
            name = val.decode(errors="replace")
        elif fnum == 4:  # event_metadata map entry {1: id, 2: XEventMetadata}
            mid, mname = None, ""
            for f2, _, v2 in fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 2:
                    for f3, _, v3 in fields(v2):
                        if f3 == 2:
                            mname = v3.decode(errors="replace")
            if mid is not None:
                meta[mid] = mname
        elif fnum == 3:  # XLine {1: id, 2: name, 4: XEvent*}
            lname = ""
            events = []
            for f2, wt2, v2 in fields(val):
                if f2 == 2 and wt2 == 2:
                    lname = v2.decode(errors="replace")
                elif f2 == 4 and wt2 == 2:
                    mid = dur = 0
                    for f3, _, v3 in fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 3:
                            dur = v3
                    events.append((mid, dur))
            lines.append((lname, events))
    return name, meta, lines


def op_times(path):
    """trace dir or xplane.pb -> {op_name: total_ps} for TPU XLA Ops."""
    if os.path.isdir(path):
        pbs = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
        assert pbs, f"no xplane.pb under {path}"
        path = pbs[0]
    buf = open(path, "rb").read()
    agg = defaultdict(int)
    for fnum, _, val in fields(buf):
        if fnum != 1:
            continue
        pname, meta, lines = parse_plane(val)
        if "TPU" not in pname or "Host" in pname:
            continue
        for lname, events in lines:
            if lname != "XLA Ops":
                continue
            for mid, dur in events:
                agg[meta.get(mid, f"#{mid}")] += dur
    return dict(agg)


import re

_CONV_RE = re.compile(r"fusion\((bf16|f32)\[[1357],[1357],\d+,\d+\]")

_GROUPS = [
    # (label, substring tests on the HLO text) — first match wins
    ("head_kernels", ("fused_head_tail",)),
    ("sort_topk", ("sort(", " sort.", "partial_reduce", "approx")),
    ("gather", ("gather",)),
    ("pad", ("= pad(", " pad(",)),
    ("copy_transpose", ("copy(", "transpose(",)),
    ("nms_window", ("reduce-window",)),
    ("conv", ("convolution", "conv(",)),
    ("reduce", ("reduce(",)),
]


def is_wrapper(text):
    """Control-flow ops contain their body's time — exclude from totals."""
    head = text.split("=", 1)[-1].lstrip().lstrip("(")
    return text.startswith(("%while", "%conditional", "%call")) or (
        head.startswith(("while(", "conditional(", "call("))
    ) or " while(" in text[:140]


def group_of(text):
    # conv fusions carry the [kh,kw,Cin,Cout] kernel as an operand
    if _CONV_RE.search(text):
        return "conv"
    for label, needles in _GROUPS:
        if any(n in text for n in needles):
            return label
    return "other"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/posfeat_trace"
    n_img = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    agg = op_times(path)
    items = sorted(
        ((k, v) for k, v in agg.items() if not is_wrapper(k)),
        key=lambda kv: -kv[1],
    )
    total = sum(ps for _, ps in items)
    print(f"total XLA-op device time: {total / 1e12 * 1e3 / n_img:.3f} ms/img "
          f"({len(items)} distinct ops, /{n_img} images; "
          f"control-flow wrappers excluded)")

    # grouped totals INCLUDING the long tail below the per-op cutoff —
    # the tail of sub-0.01ms ops is where thin-strip/stat machinery hides
    shown = set()
    for name, ps in items[:top_n]:
        if ps / 1e12 * 1e3 / n_img >= 0.001:
            shown.add(name)
    groups = defaultdict(lambda: [0, 0, 0])  # ps, n_ops, tail_ps
    for name, ps in items:
        g = groups[group_of(name)]
        g[0] += ps
        g[1] += 1
        if name not in shown:
            g[2] += ps
    print("\nby group (tail = ops below the per-op print cutoff):")
    for label, (ps, n, tail_ps) in sorted(
        groups.items(), key=lambda kv: -kv[1][0]
    ):
        print(f"{ps / 1e12 * 1e3 / n_img:8.4f} ms/img  {label:<16} "
              f"({n} ops, tail {tail_ps / 1e12 * 1e3 / n_img:.4f})")
    print()
    for name, ps in items[:top_n]:
        ms = ps / 1e12 * 1e3 / n_img
        if ms < 0.001:
            break
        print(f"{ms:8.4f} ms/img  {name[:110]}")


if __name__ == "__main__":
    main()
