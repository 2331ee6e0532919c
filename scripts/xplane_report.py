"""Print an XLA-op device-time breakdown straight from an .xplane.pb file
(tensorboard-plugin-profile's converters are proto-broken in this image;
tensorflow.tsl's generated xplane proto parses fine).

Usage: python scripts/xplane_report.py /tmp/jaxtrace_train/.../vm.xplane.pb [reps]
"""

import sys
from collections import defaultdict


def load(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def report(path, reps=1, top=45):
    xs = load(path)
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        metas = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(int)
        counts = defaultdict(int)
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "annotation" in lname:
                continue
            for ev in line.events:
                name = metas.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps
                counts[name] += 1
        grand = sum(totals.values())
        print(f"\nplane: {plane.name}  lines={len(plane.lines)}  "
              f"total={grand / 1e6 / reps:.1f} us/rep")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        for name, ps in rows[:top]:
            us = ps / 1e6 / reps
            pct = 100.0 * ps / max(grand, 1)
            print(f"{us:10.1f} us/rep  {pct:5.1f}%  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    report(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
