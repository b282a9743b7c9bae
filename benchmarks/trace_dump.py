"""Dump full metadata for the top ops in a captured .xplane.pb: name,
display name, and any stat fields (HLO expression, shapes, program id) so a
trace category like 'copy/relayout' can be attributed to source ops.

Usage: python benchmarks/trace_dump.py /tmp/step_trace [n_traced_steps] [top_k]
"""

import collections
import glob
import sys


def main():
    trace_dir = sys.argv[1]
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 40
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
        for line in plane.lines:
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            agg = collections.Counter()
            details = {}
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                if name.startswith("jit_"):
                    continue
                agg[name] += ev.duration_ps
                if name not in details:
                    stats = {}
                    for st in list(ev.stats) + (list(meta.stats) if meta else []):
                        key = stat_meta.get(st.metadata_id, str(st.metadata_id))
                        val = st.str_value or st.int64_value or st.uint64_value or st.double_value
                        if st.ref_value:
                            val = stat_meta.get(st.ref_value, st.ref_value)
                        stats[key] = val
                    details[name] = (getattr(meta, "display_name", ""), stats)
            print(f"\n==== {plane.name} / {line.name} ====", flush=True)
            for name, ps in agg.most_common(top_k):
                disp, stats = details[name]
                keep = {k: v for k, v in stats.items() if k in (
                    "hlo_op", "hlo_category", "tf_op", "shape", "long_name", "hlo_module", "equation",
                    "expression", "memory_bandwidth", "bytes_accessed")}
                print(f"{ps/1e9/nsteps:9.2f} ms/step  {name}  disp={disp[:160]}", flush=True)
                for k, v in keep.items():
                    print(f"            {k}: {str(v)[:400]}", flush=True)


if __name__ == "__main__":
    main()
