"""Browser live-view server (render/httpview.py): the headless
replacement for the reference's PyGame window (nuclear_sim.py:33-35,
589-606) — endpoints, stream framing, and the control surface."""

import json
import time
import urllib.error
import urllib.request

import pytest

from pyqmd_tpu.render.httpview import LiveViewServer
from pyqmd_tpu.sim import Simulation


@pytest.fixture(scope="module")
def server():
    sim = Simulation(z=6, n=8, pad_to=16)
    sim.set_time_scale(3.15576e10)
    srv = LiveViewServer(sim, port=0, fps=20, width=160, height=120)
    srv.start_background()
    yield srv
    srv.close()


def _get(srv, path, timeout=60):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=timeout
    ).read()


def test_page_and_frame(server):
    page = _get(server, "/")
    assert b"/stream" in page and b"/control" in page
    png = _get(server, "/frame")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(png) > 500  # a real image, not a stub


def test_status_json(server):
    st = json.loads(_get(server, "/status"))
    # C-14 or its daughter N-14 (the keymap test restores the fixture's
    # isotope, so no other element is reachable in any test order).
    assert st["isotope"].split("-")[0] in ("C", "N")
    assert "time_scale" in st and "decay_counts" in st


def test_controls_mirror_reference_keymap(server):
    """force decay (SPACE), time-scale steps (arrows), preset, isotope
    select (1-9) — nuclear_sim.py:430-521 semantics over HTTP."""
    ts0 = json.loads(_get(server, "/status"))["time_scale"]
    _get(server, "/control?do=faster")
    assert json.loads(_get(server, "/status"))["time_scale"] == ts0 * 10
    _get(server, "/control?do=slower")
    _get(server, "/control?preset=year")
    assert json.loads(_get(server, "/status"))["time_scale"] == 31557600.0
    _get(server, "/control?iso=U-238")
    st = json.loads(_get(server, "/status"))
    assert st["isotope"] == "U-238"
    counts0 = sum(st["decay_counts"])
    _get(server, "/control?do=decay")
    st2 = json.loads(_get(server, "/status"))
    assert sum(st2["decay_counts"]) == counts0 + 1  # forced decay landed
    # Restore the module fixture's state: later tests in this module run
    # against the original C-14 isotope and time scale, not this test's
    # leftovers (definition-order coupling otherwise).
    _get(server, "/control?iso=C-14")
    with server.lock:
        server.sim.set_time_scale(3.15576e10)
    assert json.loads(_get(server, "/status"))["isotope"] == "C-14"


def test_stream_multipart_parts(server):
    req = urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/stream", timeout=60
    )
    assert "multipart/x-mixed-replace" in req.headers["Content-Type"]
    buf = b""
    t0 = time.time()
    while buf.count(b"--pyqmd-frame") < 3 and time.time() - t0 < 60:
        buf += req.read(4096)
    req.close()
    assert buf.count(b"image/png") >= 2
    # Each part carries a well-formed PNG signature after its headers.
    first = buf.index(b"\x89PNG\r\n\x1a\n")
    assert first > 0


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/nope")
    assert e.value.code == 404


def test_bad_control_returns_400(server):
    """Invalid preset/isotope/action answer 400, not an aborted
    connection with a handler traceback."""
    for q in ("preset=bogus", "iso=Xx-999", "do=teleport"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server, f"/control?{q}")
        assert e.value.code == 400
        body = json.loads(e.value.read())
        assert body["ok"] is False and body["error"]
    # The simulation is still healthy afterwards.
    assert json.loads(_get(server, "/status"))["time_scale"] > 0


def test_status_is_strict_json_for_stable_isotope():
    """A stable isotope's half_life=inf must not serialize as the
    non-standard `Infinity` token — the browser's strict JSON.parse
    rejects it and the status panel would silently die."""
    sim = Simulation(z=2, n=2, pad_to=8)  # He-4: stable, half_life=inf
    srv = LiveViewServer(sim, port=0, fps=20, width=80, height=60)
    srv.start_background()
    try:
        raw = _get(srv, "/status")
        assert b"Infinity" not in raw and b"NaN" not in raw
        st = json.loads(
            raw, parse_constant=lambda c: pytest.fail(f"non-JSON {c}")
        )
        assert st["half_life"] is None  # inf -> null
    finally:
        srv.close()


def test_pump_frame_shares_one_stepping_cadence():
    """N concurrent /stream viewers must NOT advance simulated time N
    times faster: pump_frame steps at most once per fps budget and hands
    every caller the same frame + sequence number."""
    sim = Simulation(z=6, n=8, pad_to=16)
    srv = LiveViewServer(sim, port=0, fps=10, width=80, height=60)
    srv.start_background()
    try:
        seq1, png1, due1 = srv.pump_frame()
        seq2, png2, _ = srv.pump_frame()  # immediate second viewer
        assert seq2 == seq1 and png2 is png1
        time.sleep(max(0.0, due1 - time.monotonic()) + 0.01)
        seq3, _, _ = srv.pump_frame()
        assert seq3 == seq1 + 1
    finally:
        srv.close()


def test_pump_cadence_not_halved_by_due_keyed_polls():
    """A viewer sleeping until the pump's returned due time must get a
    NEW frame on every poll — the old loop slept a full local budget
    keyed to its own start time, landing production-time short of the
    completion-stamped gate and skipping every other frame (half fps)."""
    sim = Simulation(z=6, n=8, pad_to=16)
    srv = LiveViewServer(sim, port=0, fps=20, width=80, height=60)
    srv.start_background()
    try:
        seq, _, due = srv.pump_frame()  # cold frame (compiles)
        for _ in range(5):
            time.sleep(max(0.0, due - time.monotonic()) + 0.002)
            seq2, png, due = srv.pump_frame()
            assert png is not None and seq2 == seq + 1
            seq = seq2
    finally:
        srv.close()


def test_ensemble_force_decay_answers_400():
    """/control?do=decay on an ensemble view must answer 400 (force_decay
    is single-nucleus only), not abort the connection with a traceback."""
    sim = Simulation(z=6, n=8, pad_to=16, ensemble=4)
    srv = LiveViewServer(sim, port=0, fps=10, width=80, height=60)
    srv.start_background()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(srv, "/control?do=decay")
        assert e.value.code == 400
        # Batched /status still serves (aggregate branch).
        st = json.loads(_get(srv, "/status"))
        assert st["ensemble"] == 4 and st["alive"] > 0
    finally:
        srv.close()
