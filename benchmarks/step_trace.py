"""Capture an XLA op-level profile of the NeuRAD train step on the real TPU and
print the top ops by self time (via tensorboard_plugin_profile's xplane parser).

Usage: python benchmarks/step_trace.py [trace_dir] [num_cam_patches] [num_lidar_rays]
(defaults: 20 patches + 8192 lidar = 28,672 rays; the full bench batch is 40 + 16384 = 57,344)
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_trace"
    n_patches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_lidar = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    os.makedirs(trace_dir, exist_ok=True)

    from neurad_tpu.data.datamanager import ADDataManagerConfig
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.models.neurad import SamplingSettings
    from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig

    parser = SyntheticDataParserConfig(num_frames=10, image_height=192, image_width=288).setup()
    outputs = parser.get_dataparser_outputs()
    pipe = ADPipeline(outputs, ADPipelineConfig(
        datamanager=ADDataManagerConfig(num_cam_patches=n_patches, patch_size=32, num_lidar_rays=n_lidar),
        model_overrides=dict(sampling=SamplingSettings()),
        train_ray_chunk=0,
    ))
    state, tx = pipe.init_state()
    step = pipe.make_train_step(tx)
    b = pipe.datamanager.next_train()
    print("[trace] compiling...", flush=True)
    state, m = step(state, *b)
    fetch(m["total_loss"])
    print("[trace] tracing 2 steps...", flush=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            state, m = step(state, *b)
        fetch(m["total_loss"])

    # parse the xplane
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane captured", flush=True)
        return
    xp = paths[-1]
    print(f"[trace] parsing {xp}", flush=True)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xp], "framework_op_stats^", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except Exception:
            pass
        data = data.decode("utf-8", "replace")
    out = os.path.join(trace_dir, "op_stats.json")
    with open(out, "w") as fh:
        fh.write(data)
    try:
        rows = json.loads(data)
        # gviz table format: {cols, rows}
        tables = rows if isinstance(rows, list) else [rows]
        t = tables[0]
        cols = [c.get("label", c.get("id")) for c in t["cols"]]
        print("  " + " | ".join(cols[:8]), flush=True)
        for r in t["rows"][:40]:
            vals = [str(c.get("v")) for c in r["c"]]
            print("  " + " | ".join(vals[:8]), flush=True)
    except Exception as e:
        print(f"parse note: {type(e).__name__}: {e}; raw saved to {out}", flush=True)


if __name__ == "__main__":
    main()
