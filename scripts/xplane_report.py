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


#: control-flow / dispatch wrappers whose duration double-counts children
_WRAPPERS = ("jit_", "%while", "%body", "%cond", "%call")


def _category(name):
    """Coarse bucket for an HLO op-level event name (the full instruction
    text, e.g. '%convert_add_fusion.3 = f32[432,...] fusion(...)')."""
    head = name.lstrip("%").split(".")[0].split(" ")[0]
    if "convolution" in name.split("=")[-1][:200] or head.startswith(
            ("conv", "convolution")):
        return "conv"
    if " dot(" in name or head == "dot":
        return "dot"
    if head.startswith(("copy", "slice-start", "slice-done", "dynamic-slice",
                        "dynamic-update-slice", "bitcast", "transpose",
                        "reshape", "pad", "concatenate")):
        return "data-movement"
    if head.startswith(("all-reduce", "all-gather", "reduce-scatter",
                        "collective", "send", "recv")):
        return "collective"
    if head.startswith(("sort",)):
        return "sort"
    if head.startswith(("scatter", "gather")):
        return "scatter/gather"
    if "fusion" in head:
        return "fusion:" + head.replace("_fusion", "")
    return "other:" + head


def report(path, reps=1, top=45, by_category=False):
    """Per-op breakdown of the traced TPU timeline.

    Line-aware (round 5): the xplane TPU plane carries separate lines —
    'Steps'/'XLA Modules' (the true wall time of each dispatched program),
    'XLA Ops' (compute-stream leaf events) and 'Async XLA Ops' (DMA
    copy-start/done WINDOWS that overlap compute). Summing all lines
    double-counts the async windows and misreads overlapped DMA as 81%+
    "data-movement"; the breakdown below therefore uses the XLA Ops line
    only, and the module wall time + async overlap total are printed
    separately as context.
    """
    xs = load(path)
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        metas = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(int)
        counts = defaultdict(int)
        module_ps = 0
        async_ps = 0
        for line in plane.lines:
            lname = line.name.lower()
            if "module" in lname:
                module_ps = sum(ev.duration_ps for ev in line.events)
            if "async" in lname:
                async_ps = sum(ev.duration_ps for ev in line.events)
            if ("step" in lname or "annotation" in lname
                    or "module" in lname or "async" in lname):
                continue
            for ev in line.events:
                name = metas.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps
                counts[name] += 1
        if module_ps:
            print(f"\nmodule wall time: {module_ps / 1e6 / reps:.1f} us/rep"
                  f"  (async DMA overlap windows: "
                  f"{async_ps / 1e6 / reps:.1f} us/rep, excluded below)")
        wrap = {n: ps for n, ps in totals.items()
                if n.lstrip("%").startswith(_WRAPPERS)
                or n.split("(")[0].startswith(_WRAPPERS)}
        leaf = {n: ps for n, ps in totals.items() if n not in wrap}
        grand = sum(leaf.values())
        print(f"\nplane: {plane.name}  lines={len(plane.lines)}  "
              f"leaf total={grand / 1e6 / reps:.1f} us/rep  "
              f"(+ {len(wrap)} wrapper events excluded)")
        if by_category:
            cats = defaultdict(int)
            ccnt = defaultdict(int)
            for n, ps in leaf.items():
                cats[_category(n)] += ps
                ccnt[_category(n)] += counts[n]
            for cat, ps in sorted(cats.items(), key=lambda kv: -kv[1]):
                us = ps / 1e6 / reps
                pct = 100.0 * ps / max(grand, 1)
                print(f"{us:10.1f} us/rep  {pct:5.1f}%  x{ccnt[cat]:<6d} {cat}")
            print()
        rows = sorted(leaf.items(), key=lambda kv: -kv[1])
        for name, ps in rows[:top]:
            us = ps / 1e6 / reps
            pct = 100.0 * ps / max(grand, 1)
            print(f"{us:10.1f} us/rep  {pct:5.1f}%  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--by-category"]
    report(argv[0], int(argv[1]) if len(argv) > 1 else 1,
           by_category="--by-category" in sys.argv)
