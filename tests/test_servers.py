"""Viewer + closed-loop HTTP server plumbing tests (no model load)."""

import json
import threading
import urllib.request

import numpy as np

from neurad_tpu.scripts.closed_loop import make_handler
from neurad_tpu.viewer.server import ViewerServer


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def test_viewer_server_renders():
    calls = {}

    def render_fn(pose, w, h, t01, edits=None):
        calls["pose"] = np.asarray(pose)
        calls["edits"] = edits
        return np.full((h, w, 3), 0.5, dtype=np.float32)

    def lidar_fn(t01, channels, azim_res, drop_threshold, edits=None):
        calls["lidar"] = (t01, channels, azim_res, drop_threshold)
        return np.zeros((5, 4), dtype=np.float32)

    def export_fn():
        calls["export"] = True
        return "/tmp/fake.ply"

    server = ViewerServer(render_fn, port=17707, lidar_fn=lidar_fn, export_fn=export_fn)
    server.start(background=True)
    try:
        # page served
        with urllib.request.urlopen("http://127.0.0.1:17707/", timeout=10) as r:
            assert b"neurad_tpu viewer" in r.read()
        # render round trip
        pose = np.eye(4)[:3].tolist()
        out = _post("http://127.0.0.1:17707/render", {"pose": pose, "quality": "low", "t01": 0.2,
                                                       "edits": {"lateral": 1.0}})
        assert "png" in out and len(out["png"]) > 100
        assert calls["pose"].shape == (3, 4)
        assert calls["edits"] == {"lateral": 1.0}
        # virtual lidar endpoint
        out = _post("http://127.0.0.1:17707/lidar", {"t01": 0.5, "channels": 16, "azim_res": 2.0,
                                                     "drop_threshold": 0.4})
        assert len(out["pts"]) == 5
        assert calls["lidar"] == (0.5, 16, 2.0, 0.4)
        # export endpoint
        out = _post("http://127.0.0.1:17707/export", {})
        assert out["path"] == "/tmp/fake.ply" and calls.get("export")
    finally:
        server.stop()


class _FakeState:
    time_offset = 123.0

    def get_actors(self):
        return [{"poses": [np.eye(4).tolist()], "timestamps": [0.0], "dims": [1, 2, 3]}]

    def render_image(self, pose, timestamp, camera_name):
        self.last = (np.asarray(pose), timestamp, camera_name)
        return np.zeros((4, 6, 3), dtype=np.float32)

    def update_actors(self, actors):
        self.updated = actors


def test_closed_loop_endpoints():
    from http.server import ThreadingHTTPServer

    state = _FakeState()
    server = ThreadingHTTPServer(("127.0.0.1", 17808), make_handler(state))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        assert _get("http://127.0.0.1:17808/start_time")["start_time"] == 123.0
        actors = _get("http://127.0.0.1:17808/get_actors")["actors"]
        assert len(actors) == 1
        img = _post(
            "http://127.0.0.1:17808/render_image",
            {"pose": np.eye(4).tolist(), "timestamp": 1.5, "camera_name": "front"},
        )["image"]
        assert np.asarray(img).shape == (4, 6, 3)
        assert state.last[1] == 1.5
        out = _post("http://127.0.0.1:17808/update_actors", {"actors": actors})
        assert out["status"] == "ok"
        assert hasattr(state, "updated")
    finally:
        server.shutdown()


def test_viewer_train_control_and_per_client_state():
    """Train-rate control (/train pause + util) and per-client stale-drop
    (reference: Viewer controls `viewer.py:58` + per-client
    RenderStateMachine `render_state_machine.py:57`)."""
    import time

    def render_fn(pose, w, h, t01, edits=None):
        return np.full((h, w, 3), 0.5, dtype=np.float32)

    server = ViewerServer(render_fn, port=17709)
    server.start(background=True)
    try:
        # stats round trip + pause
        s = _post("http://127.0.0.1:17709/train", {})
        assert s["paused"] is False and s["train_util"] == 0.9
        server.update_train_stats(120, loss=0.42, steps_per_sec=1.5)
        s = _post("http://127.0.0.1:17709/train", {"paused": True, "train_util": 0.5})
        assert s["paused"] and s["train_util"] == 0.5
        assert s["step"] == 120 and abs(s["loss"] - 0.42) < 1e-9

        # train_gate blocks while paused, resumes on unpause
        done = []

        def loop():
            server.train_gate()
            done.append(True)

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        time.sleep(0.15)
        assert not done, "train_gate must block while paused"
        _post("http://127.0.0.1:17709/train", {"paused": False})
        t.join(timeout=5)
        assert done

        # util throttle: consecutive gates sleep ~ (1-u)/u x busy time
        _post("http://127.0.0.1:17709/train", {"train_util": 0.5})
        server.train_gate()
        time.sleep(0.1)  # "busy" training for 100 ms
        t0 = time.perf_counter()
        server.train_gate()  # should sleep ~100 ms at util 0.5
        slept = time.perf_counter() - t0
        assert 0.04 < slept < 0.6, f"expected ~0.1s throttle sleep, got {slept:.3f}"

        # per-client stale-drop: older seq returns stale once newer seq seen
        pose = np.eye(4)[:3].tolist()
        out_new = _post("http://127.0.0.1:17709/render",
                        {"pose": pose, "client": "c1", "seq": 5})
        assert "png" in out_new
        out_old = _post("http://127.0.0.1:17709/render",
                        {"pose": pose, "client": "c1", "seq": 3})
        assert out_old.get("stale") is True
        # a DIFFERENT client's low seq is not stale
        out_c2 = _post("http://127.0.0.1:17709/render",
                       {"pose": pose, "client": "c2", "seq": 1})
        assert "png" in out_c2
    finally:
        server.stop()
