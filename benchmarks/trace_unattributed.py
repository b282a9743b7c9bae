"""Break down the ops with NO tf_op source attribution in a captured
.xplane.pb (the `(no source attribution)` bucket of trace_by_component.py):
group them by hlo_category + operand signature so the bucket maps to causes
(layout copies, while-loop transposes, optimizer fusions, ...).

Usage: python benchmarks/trace_unattributed.py /tmp/step_trace [n_steps]
"""

import collections
import glob
import re
import sys


def main():
    trace_dir = sys.argv[1]
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        space.ParseFromString(fh.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        stat_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        agg = collections.Counter()
        examples = {}
        total = 0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                name = meta.name if meta else ""
                if name.startswith("jit_"):
                    continue
                tf_op, category, expr = "", "", ""
                for st in list(ev.stats) + (list(meta.stats) if meta else []):
                    sname = stat_meta.get(st.metadata_id, "")
                    if sname == "tf_op":
                        tf_op = st.str_value
                    elif sname == "hlo_category":
                        category = st.str_value
                    elif sname in ("hlo_expression", "long_name", "expression"):
                        expr = st.str_value
                if tf_op:
                    continue
                # key by category + first result shape in the expression
                m = re.match(r"%\S+ = (\S+?)[({]", expr or name)
                shape = m.group(1) if m else "?"
                key = f"{category or '?':<22} {shape}"
                agg[key] += ev.duration_ps
                total += ev.duration_ps
                if key not in examples:
                    examples[key] = (expr or name)[:180]
        print(f"== unattributed total: {total / 1e9 / nsteps:.2f} ms/step", flush=True)
        for key, ps in agg.most_common(30):
            print(f"  {ps / 1e9 / nsteps:8.2f} ms/step  {key}", flush=True)
            print(f"           e.g. {examples[key]}", flush=True)


if __name__ == "__main__":
    main()
