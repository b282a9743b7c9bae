"""Parse a captured .xplane.pb directly (tsl XSpace proto) and print top TPU
ops by aggregated duration.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python benchmarks/parse_trace.py /tmp/step_trace [nrows]
"""

import collections
import glob
import sys


def main():
    trace_dir = sys.argv[1]
    nrows = int(sys.argv[2]) if len(sys.argv) > 2 else 45
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
        # aggregate over XLA-op lines (line name often 'XLA Ops' / 'Steps')
        agg = collections.Counter()
        cnt = collections.Counter()
        total_ps = 0
        for line in plane.lines:
            lname = line.name.lower()
            if "op" not in lname and "xla" not in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name] += ev.duration_ps
                cnt[name] += 1
                total_ps += ev.duration_ps
        if not agg:
            continue
        print(f"== plane: {plane.name}  lines: {[l.name for l in plane.lines]}", flush=True)
        print(f"   total op time: {total_ps/1e9:.2f} ms (over the traced window)", flush=True)
        run = 0
        for name, ps in agg.most_common(nrows):
            run += ps
            print(f"  {ps/1e9:9.2f} ms {100*ps/total_ps:5.1f}% (cum {100*run/total_ps:5.1f}%)  x{cnt[name]:<5} {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
