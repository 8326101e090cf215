"""Minimal XPlane (jax.profiler) parser — no tensorflow/tsl dependency.

Decodes the protobuf wire format of the xplane.pb that jax.profiler.trace
writes and prints per-op total device time, aggregated by event metadata
name. Field numbers from tsl/profiler/protobuf/xplane.proto:

  XSpace.planes = 1
  XPlane.name = 2, XPlane.lines = 3, XPlane.event_metadata = 4 (map)
  XLine.name = 2, XLine.events = 4
  XEvent.metadata_id = 1, XEvent.duration_ps = 3
  XEventMetadata (map value).id = 1, .name = 2, .display_name = 4

Usage: python benchmarks/xprof_parse.py <path/to/*.xplane.pb> [top_n]
"""

import collections
import struct
import sys


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        f, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield f, wt, v


def parse_plane(buf):
    name = b""
    lines = []
    meta = {}
    for f, wt, v in _fields(buf):
        if f == 2 and wt == 2:
            name = v
        elif f == 3 and wt == 2:
            lines.append(v)
        elif f == 4 and wt == 2:
            # map entry: key=1 varint, value=2 XEventMetadata
            k = None
            em = None
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    em = v2
            if em is not None:
                mid, mname, mdisp = None, b"", b""
                for f3, _, v3 in _fields(em):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 2:
                        mname = v3
                    elif f3 == 4:
                        mdisp = v3
                meta[mid if mid is not None else k] = (
                    mdisp or mname
                ).decode(errors="replace")
    return name.decode(errors="replace"), lines, meta


def plane_op_times(buf):
    """(plane_name, {op_name: (total_ps, count)}) for one XPlane buffer."""
    name, lines, meta = parse_plane(buf)
    agg = collections.defaultdict(lambda: [0, 0])
    for lbuf in lines:
        for f, wt, v in _fields(lbuf):
            if f == 4 and wt == 2:                    # XEvent
                mid, dur = None, 0
                for f2, _, v2 in _fields(v):
                    if f2 == 1:
                        mid = v2
                    elif f2 == 3:
                        dur = v2
                nm = meta.get(mid, f"id{mid}")
                agg[nm][0] += dur
                agg[nm][1] += 1
    return name, agg


def main(path, top=30):
    space = open(path, "rb").read()
    for f, wt, v in _fields(space):
        if f != 1 or wt != 2:
            continue
        name, agg = plane_op_times(v)
        if not agg:
            continue
        total = sum(a[0] for a in agg.values())
        print(f"\n== plane: {name}  (sum {total/1e12*1000:.2f} ms over "
              f"{sum(a[1] for a in agg.values())} events)")
        for nm, (ps, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
            print(f"  {ps/1e12*1000:9.3f} ms  x{cnt:<6d} {nm[:110]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
