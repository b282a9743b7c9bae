"""Categorize a captured .xplane.pb: aggregate TPU op time by kind.

Separates the synchronous 'XLA Ops' line (true serialized device time) from
'Async XLA Ops' (DMA that may overlap compute), buckets ops by name pattern,
and prints per-step costs (divide by the number of traced steps).

Usage: python benchmarks/trace_categories.py /tmp/step_trace [n_traced_steps]
"""

import collections
import glob
import re
import sys


CATEGORIES = [
    # (label, regex on op name)
    ("scatter(table grads)", r"fusion\.(3[5-9]|4[0-2])\b"),  # matched by shape below instead
]


def categorize(name: str) -> str:
    n = name.lower()
    if "scatter" in n:
        return "scatter"
    if "gather" in n:
        return "gather"
    if "sort" in n:
        return "sort"
    if "convolution" in n or "conv" in n:
        return "conv/matmul"
    if "dot" in n:
        return "conv/matmul"
    if "reduce-window" in n:
        return "reduce-window"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    if n.startswith("%copy") or ".copy" in n or "copy-start" in n or "copy-done" in n:
        return "copy/relayout"
    if "slice" in n:
        return "slice"
    if "transpose" in n:
        return "transpose"
    if "reshape" in n or "bitcast" in n:
        return "reshape"
    if "rng" in n:
        return "rng"
    if "reduce" in n:
        return "reduce"
    if "iota" in n or "broadcast" in n or "constant" in n:
        return "broadcast/iota"
    if "fusion" in n:
        return "fusion(elementwise/other)"
    return "other"


def main():
    trace_dir = sys.argv[1]
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    xp = paths[-1]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xp, "rb") as fh:
        space.ParseFromString(fh.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            agg = collections.Counter()
            big = collections.Counter()
            total = 0
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                if name.startswith("jit_"):
                    continue  # module-level envelope event
                cat = categorize(name)
                agg[cat] += ev.duration_ps
                big[name.split(" = ")[0]] += ev.duration_ps
                total += ev.duration_ps
            if not total:
                continue
            print(f"== {plane.name} / {line.name}: {total/1e9/nsteps:.2f} ms/step", flush=True)
            for cat, ps in agg.most_common():
                print(f"  {ps/1e9/nsteps:9.2f} ms/step  {100*ps/total:5.1f}%  {cat}", flush=True)
            print("  -- top individual ops --", flush=True)
            for name, ps in big.most_common(25):
                print(f"  {ps/1e9/nsteps:9.2f} ms/step  {name[:100]}", flush=True)


if __name__ == "__main__":
    main()
