"""Live-viewer tests: the interactive-loop analog must serve frames,
apply WASD/mouse input, and reset accumulation on camera moves
(reference main.cpp:204-205, 239-282)."""

import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

import rayaccel_tpu as racc
from rayaccel_tpu.camera import Camera
from rayaccel_tpu.scene.loader import make_test_scene
from rayaccel_tpu.utils.viewer import Viewer


@pytest.fixture(scope="module")
def viewer():
    s = make_test_scene(viewport=(64, 64), max_depth=1)
    ctx = racc.create_context(racc.Configuration(wave_size=4096,
                                                 backend="mxu"))
    cam = Camera.look_at(s.cam_origin, s.cam_dir, s.cam_up, s.cam_fov,
                         s.viewport_width, s.viewport_height)
    r = racc.PathTracingRenderer(ctx, cam, s)
    v = Viewer(r, jax.random.PRNGKey(0), s.cam_up, port=18931)
    t = threading.Thread(target=v.run, kwargs={"quiet": True}, daemon=True)
    t.start()
    # Wait for the first real frame to be published.
    deadline = time.time() + 120
    while time.time() < deadline and v.renderer.spp == 0:
        time.sleep(0.2)
    assert v.renderer.spp > 0
    yield v
    v.stop()


def _get(path, timeout=30):
    with urllib.request.urlopen(f"http://127.0.0.1:18931{path}",
                                timeout=timeout) as r:
        return r.read()


def test_viewer_serves_page_and_frames(viewer):
    page = _get("/")
    assert b"rayaccel_tpu live" in page
    png = _get("/frame.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    stats = json.loads(_get("/stats"))
    assert stats["spp"] >= 1


def test_viewer_camera_input_resets_accumulation(viewer):
    origin_before = viewer.renderer.camera.origin.copy()
    spp_before = viewer.renderer.spp
    assert spp_before >= 1
    # Polling viewer.renderer.spp for the post-reset dip is racy: small
    # scenes render faster than any sane sampling interval, so the dip
    # below spp_before can pass unobserved (flaked under host load).
    # Record the reset deterministically by wrapping clear() instead.
    cleared = threading.Event()
    orig_clear = viewer.renderer.clear

    def record_clear():
        cleared.set()
        return orig_clear()

    viewer.renderer.clear = record_clear
    try:
        _get("/input?key=w")
        deadline = time.time() + 60
        while time.time() < deadline:
            if not np.allclose(viewer.renderer.camera.origin,
                               origin_before):
                break
            time.sleep(0.1)
        assert not np.allclose(viewer.renderer.camera.origin,
                               origin_before)
        # Accumulation restarted after the move.
        assert cleared.wait(60)
    finally:
        viewer.renderer.clear = orig_clear

    # Mouse look also moves the camera (view direction changes).
    view_before = viewer.renderer.camera.view.copy()
    _get("/input?yaw=80&pitch=0")
    deadline = time.time() + 60
    while time.time() < deadline:
        if not np.allclose(viewer.renderer.camera.view, view_before):
            break
        time.sleep(0.1)
    assert not np.allclose(viewer.renderer.camera.view, view_before)
