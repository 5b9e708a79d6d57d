"""Aggregate the XLA Ops line of a jax.profiler trace by op kind and by
individual op (top N). Direct xplane.pb parse, no tensorboard plugin.

Usage: python scripts/xplane_report2.py [logdir] [top_n]
"""

import glob
import os
import re
import sys
from collections import defaultdict

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jb_trace"
TOP_N = int(sys.argv[2]) if len(sys.argv) > 2 else 40


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"), recursive=True)
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(lambda: [0.0, 0])
            kind_agg = defaultdict(lambda: [0.0, 0])
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                ms = ev.duration_ps / 1e9
                agg[name][0] += ms
                agg[name][1] += 1
                m = re.match(r"%?([a-zA-Z][\w-]*?)[.\s]", name)
                kind = m.group(1) if m else name[:20]
                # annotate fusions by payload hints
                if "custom-call" in name:
                    kind = "custom-call(pallas)"
                kind_agg[kind][0] += ms
                kind_agg[kind][1] += 1
            total = sum(v[0] for v in agg.values())
            print(f"== XLA Ops total {total:.1f} ms over 10 steps")
            print("-- by kind:")
            for kind, (ms, occ) in sorted(kind_agg.items(), key=lambda kv: -kv[1][0]):
                print(f"{ms:9.2f} {100*ms/total:5.1f} {occ:6d}  {kind}")
            print("-- top ops:")
            for name, (ms, occ) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:TOP_N]:
                print(f"{ms:9.2f} {100*ms/total:5.1f} {occ:6d}  {name[:150]}")


if __name__ == "__main__":
    main()
