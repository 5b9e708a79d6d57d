"""Parse a jax.profiler .xplane.pb directly (no tensorboard plugin) and print
aggregate event time per XLA op name on the TPU device plane.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/xplane_report.py [logdir] [top_n]
"""

import glob
import os
import sys
from collections import defaultdict

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jb_trace"
TOP_N = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def load_xspace(path):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    paths = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {LOGDIR}"
    path = max(paths, key=os.path.getmtime)
    xs = load_xspace(path)

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        # aggregate on the XLA-op line(s): durations per metadata name
        by_line = {}
        for line in plane.lines:
            agg = defaultdict(lambda: [0.0, 0])
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                agg[name][0] += ev.duration_ps / 1e9  # ps → ms
                agg[name][1] += 1
            if agg:
                by_line[line.name] = agg
        print(f"== plane: {plane.name}")
        for lname, agg in by_line.items():
            total = sum(v[0] for v in agg.values())
            print(f"-- line: {lname}  total {total:.1f} ms, {len(agg)} distinct ops")
        # pick the busiest line (XLA Ops)
        if not by_line:
            continue
        lname, agg = max(by_line.items(), key=lambda kv: sum(v[0] for v in kv[1].values()))
        total = sum(v[0] for v in agg.values())
        print(f"== busiest line: {lname}  ({total:.1f} ms total)")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        print(f"{'ms':>9} {'%':>5} {'occ':>6}  op")
        for name, (ms, occ) in rows[:TOP_N]:
            print(f"{ms:9.2f} {100*ms/total:5.1f} {occ:6d}  {name[:120]}")


if __name__ == "__main__":
    main()
