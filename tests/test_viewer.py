"""Live terminal viewer (scripts/live_view.py): fold a metrics stream and
render the dashboard — the out-of-process observability layer standing in
for the reference's Pangolin GUI (SURVEY.md §1 L8)."""
import json
import io
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _write_stream(path, n=120):
    with open(path, "w") as f:
        for i in range(n):
            a = 2 * math.pi * i / n
            rec = {"t": "frame", "id": i, "ts": i / 20.0,
                   "kf": i % 5 == 0, "rmse": 8.0 + math.sin(a),
                   "pose_valid": True, "reloc": i == 70,
                   "p": [3 * math.cos(a), 0.1, 3 * math.sin(a)]}
            f.write(json.dumps(rec) + "\n")
            if i % 5 == 0:
                f.write(json.dumps({
                    "t": "kf", "id": i, "kf_id": i // 5,
                    "ba_rmse": 6.0 + 0.5 * math.cos(a), "n_active": 1500 + i,
                    "n_ind": 40, "n_marg_frames": 0,
                    "latency_ms": 12.0 + i % 7}) + "\n")
        # a partial trailing line, as a live writer produces mid-record
        f.write('{"t": "frame", "id":')


def test_dashboard_render(tmp_path):
    from live_view import follow

    path = str(tmp_path / "m.jsonl")
    _write_stream(path)
    out = io.StringIO()
    dash = follow(path, once=True, out=out)
    txt = out.getvalue()

    assert dash.n_frames == 120
    assert dash.n_kf == 24
    assert dash.n_reloc == 1
    assert dash.n_active == 1615
    assert "frames   120" in txt
    assert "□" in txt          # keyframe marker on the map
    assert "R" in txt          # relocalization marker
    assert "●" in txt          # current-position marker
    assert "track rmse" in txt and "BA rmse" in txt and "KF latency" in txt
    # the circle must occupy the braille canvas (some braille cells set)
    assert any(0x2800 < ord(c) <= 0x28FF for c in txt)


def test_dashboard_empty_file(tmp_path):
    from live_view import follow

    path = str(tmp_path / "empty.jsonl")
    open(path, "w").close()
    out = io.StringIO()
    dash = follow(path, once=True, out=out)
    assert dash.n_frames == 0
    assert "frames" in out.getvalue()


def test_map_server_stream_schema(tmp_path):
    """The live-3D-view HTTP streamer (hslam_tpu/viz/view3d.py): serves the
    self-contained WebGL page and incremental JSONL reads, tolerating the
    partial trailing lines a live writer produces."""
    import urllib.request

    from hslam_tpu.viz.view3d import MapServer

    path = tmp_path / "m.jsonl"
    recs = [
        {"t": "frame", "id": 0, "kf": True, "p": [0.0, 0.0, 0.0]},
        {"t": "map", "kf_id": 1,
         "pts": [[0.1, 0.2, 1.0, 128.0], [0.3, -0.1, 2.0, 90.0]],
         "kfs": [{"kf": 0, "R": [1, 0, 0, 0, 1, 0, 0, 0, 1],
                  "t": [0, 0, 0]}]},
    ]
    path.write_text("".join(json.dumps(r) + "\n" for r in recs))

    srv = MapServer(str(path), port=0).start()
    try:
        html = urllib.request.urlopen(srv.url + "/").read().decode()
        assert "webgl" in html and "frustumLines" in html

        d = json.loads(
            urllib.request.urlopen(srv.url + "/data?from=0").read())
        assert d["records"] == json.loads(json.dumps(recs))
        off = d["next"]
        assert off == path.stat().st_size

        # incremental read picks up ONLY new complete lines
        with open(path, "a") as f:
            f.write(json.dumps(
                {"t": "frame", "id": 1, "kf": False, "p": [1, 0, 0]}) + "\n")
            f.write('{"t": "frame", "id":')   # partial tail stays pending
        d2 = json.loads(
            urllib.request.urlopen(srv.url + f"/data?from={off}").read())
        assert len(d2["records"]) == 1
        assert d2["records"][0]["id"] == 1
    finally:
        srv.stop()
