"""Live interactive demo: the full input->impulse->render loop, headless.

Covers the reference's interactive semantics (sph2d_cpu_demo.rs): pointer
drag becomes a world-space impulse on nearby particles, Space toggles the
view mode, frames keep flowing — through the same HTTP surface a browser
drives."""

import json
import sys
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def app():
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/examples")
    from interactive import InteractiveApp
    a = InteractiveApp(n=256, substeps=2, raster_width=256)
    a._run_one_frame()
    return a


def test_pointer_drag_kicks_fluid(app):
    spec = app.sim.spec
    v0 = float(np.abs(np.asarray(app.sim.state.vx)).max())
    # drag rightward through the middle of the block (canvas row 0 = top)
    bx = (0.0 - spec.x0) * spec.scale + 10
    by = spec.height - (0.3 - spec.y0) * spec.scale
    app.pointer_drag(bx, by, 8.0, 0.0)
    app._run_one_frame()
    v1 = float(np.abs(np.asarray(app.sim.state.vx)).max())
    assert v1 > max(v0, 5.0), (v0, v1)     # IMPULSE=10 along +x
    assert bool(np.isfinite(np.asarray(app.sim.state.x)).all())


def test_view_toggle_changes_frame(app):
    app._run_one_frame()
    f_density = app.latest_frame().copy()
    assert app.mode == "density"
    app.toggle_view()
    assert app.mode == "const"
    # the frame loop is pipelined one frame deep (render.pump.FramePump):
    # a toggle lands in the NEXT dispatched frame, published one push later
    app._run_one_frame()
    app._run_one_frame()
    f_const = app.latest_frame()
    assert not np.array_equal(f_density, f_const)
    app.toggle_view()
    assert app.mode == "density"


def test_http_surface(app):
    from interactive import make_server
    import threading
    srv = make_server(app, 0)                  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(f"{url}/").read().decode()
        assert "pointermove" in page and "Space" in page
        png = urllib.request.urlopen(f"{url}/frame.png").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        stats = json.loads(urllib.request.urlopen(f"{url}/stats").read())
        assert stats["n"] == 256
        req = urllib.request.Request(
            f"{url}/impulse", method="POST",
            data=json.dumps({"px": 10, "py": 10, "dx": 3, "dy": -2}).encode())
        assert urllib.request.urlopen(req).status == 200
        assert len(app._impulses) >= 1          # queued for the next frame
        req = urllib.request.Request(f"{url}/toggle", method="POST", data=b"")
        urllib.request.urlopen(req)
        assert app.mode == "const"
    finally:
        srv.shutdown()


def test_session_mode_selfdrive():
    """The Session-backed large-N mode (resident dense state + field
    raster + dense impulses) drives the same loop end-to-end."""
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/examples")
    from interactive import InteractiveApp, selfdrive
    a = InteractiveApp(n=256, substeps=2, session=True)
    a._run_one_frame()
    assert selfdrive(a, 8) == 0


def test_sharded_mode_selfdrive():
    """The multi-chip mode (ShardedSession: per-slab stepping + raster
    strips, cross-slab impulses) drives the same loop end-to-end on a
    2-device mesh."""
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/examples")
    from interactive import InteractiveApp, selfdrive
    a = InteractiveApp(n=256, substeps=2, sharded=2)
    a._run_one_frame()
    assert a.sim.overflow == 0
    assert selfdrive(a, 8) == 0
