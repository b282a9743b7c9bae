"""Aggregate a captured .xplane.pb's synchronous op time by SOURCE component
(the jax tf_op path recorded per HLO op), so device time maps to model parts
(field/hashgrid, proposal_field_0, rgb_decoder, losses, adam, ...).

Usage: python benchmarks/trace_by_component.py /tmp/step_trace [n_steps]
"""

import collections
import glob
import re
import sys


def component(tf_op: str, hlo: str) -> str:
    if not tf_op:
        return "(no source attribution)"
    # strip the jit wrapper and transpose/jvp markers but keep fwd/bwd split
    direction = "bwd" if "transpose(" in tf_op else "fwd"
    path = re.sub(r"(jit\(step\)/|jvp\(|transpose\(|\)+)", "", tf_op)
    parts = [p for p in path.split("/") if p]
    # find the most specific interesting segment
    keys = [
        "hashgrid", "proposal_field_0", "proposal_field_1", "mlp_geo", "mlp_feature",
        "rgb_decoder", "lidar_decoder", "appearance_embedding", "camera_optimizer",
        "actors", "sdf_to_alpha",
    ]
    for k in keys:
        for p in parts:
            if k in p:
                return f"{k} [{direction}]"
    for marker, label in (
        ("_get_ray_samples", "sampling machinery"),
        ("get_loss_dict", "losses"),
        ("get_metrics_dict", "losses"),
        ("vgg", "vgg"),
        ("adam", "adam/optimizer"),
        ("multi_transform", "adam/optimizer"),
        ("get_nff_outputs", "nff render math"),
        ("decode_features", "decode"),
    ):
        for p in parts:
            if marker in p:
                return f"{label} [{direction}]"
    return f"{parts[-1][:40]} [{direction}]" if parts else "(?)"


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
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.Counter()
            total = 0
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                name = meta.name if meta else ""
                if name.startswith("jit_"):
                    continue
                tf_op = ""
                for st in list(ev.stats) + (list(meta.stats) if meta else []):
                    if stat_meta.get(st.metadata_id, "") == "tf_op":
                        tf_op = st.str_value
                agg[component(tf_op, name)] += ev.duration_ps
                total += ev.duration_ps
            print(f"== {plane.name} / {line.name}: {total/1e9/nsteps:.2f} ms/step", flush=True)
            for comp, ps in agg.most_common(40):
                print(f"  {ps/1e9/nsteps:9.2f} ms/step  {100*ps/total:5.1f}%  {comp}", flush=True)


if __name__ == "__main__":
    main()
