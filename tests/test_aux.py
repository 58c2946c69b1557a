"""Aux subsystem tests (SURVEY §5): NaN guard, backend fallback, profiling."""

import logging
import os
import time

import jax.numpy as jnp
import numpy as np

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.init import init_state
from pyqmd_tpu.core.step import simulate_frame
from pyqmd_tpu.sim import Simulation
from pyqmd_tpu.utils.profiling import StepTimer


def test_nan_guard_metric():
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    st = init_state(cfg, seed=0)
    _, m = simulate_frame(st, cfg, 1.0, 1 / 60.0, 2)
    assert not bool(m["nan"])
    # Poison the state: the guard must fire.
    bad = st.replace(pos=st.pos.at[0, 0].set(jnp.nan))
    _, m = simulate_frame(bad, cfg, 1.0, 1 / 60.0, 2)
    assert bool(m["nan"])


def test_nan_guard_logs(caplog):
    sim = Simulation(z=2, n=2, pad_to=8)
    sim.nan_check_interval = 1  # default cadence is every 30 frames
    sim.state = sim.state.replace(pos=sim.state.pos.at[0, 0].set(jnp.inf))
    with caplog.at_level(logging.ERROR, logger="pyqmd_tpu"):
        sim.frame()
    assert any("non-finite" in r.message for r in caplog.records)


def test_nan_guard_default_cadence(caplog):
    """The guard reads back only every nan_check_interval frames (the
    per-frame device sync was the interactive-path bottleneck, VERDICT r2)."""
    sim = Simulation(z=2, n=2, pad_to=8)
    sim.state = sim.state.replace(pos=sim.state.pos.at[0, 0].set(jnp.inf))
    with caplog.at_level(logging.ERROR, logger="pyqmd_tpu"):
        for _ in range(sim.nan_check_interval - 1):
            sim.frame()
        assert not any("non-finite" in r.message for r in caplog.records)
        sim.frame()  # the Nth frame triggers the readback
    assert any("non-finite" in r.message for r in caplog.records)


def test_backend_fallback_pallas_to_jnp(caplog, monkeypatch):
    """Pallas failure falls back to jnp — the OpenCL->CPU fallback analog
    (nuclear_sim.py:40-45)."""
    # Unaligned capacity makes the pallas wrapper raise ValueError.
    sim = Simulation(z=2, n=2, pad_to=8, force_backend="pallas")
    assert sim.cfg.force_backend == "pallas"
    with caplog.at_level(logging.ERROR, logger="pyqmd_tpu"):
        sim.frame()
    assert sim.cfg.force_backend == "jnp"
    assert np.isfinite(np.asarray(sim.state.pos)).all()


def test_step_timer():
    t = StepTimer(window=4)
    t.start()
    for _ in range(3):
        t.lap(jnp.zeros(4), steps=10)
    assert t.steps_per_sec > 0


def test_render_ascii():
    sim = Simulation(z=6, n=8, pad_to=8)
    art = sim.render_ascii(width=48, height=20)
    lines = art.splitlines()
    assert len(lines) == 20 and all(len(l) == 48 for l in lines)
    assert "o" in art and "." in art  # protons and neutrons visible


def test_version_consistent_with_pyproject():
    """__version__ and pyproject.toml must agree (r4 shipped them split:
    pyproject 0.5.0 vs __version__ 0.4.0)."""
    import tomllib
    import pyqmd_tpu

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        pyproject = tomllib.load(f)
    assert pyqmd_tpu.__version__ == pyproject["project"]["version"]


def test_bench_device_reachable_happy_path():
    """bench._device_reachable returns True promptly when the backend
    works (CPU here); the tunnel-down branch was driven live in r5."""
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    added = root not in sys.path
    if added:
        sys.path.insert(0, root)
    try:
        import bench

        t0 = time.perf_counter()
        assert bench._device_reachable(total_budget_s=60, probe_timeout_s=30)
        # Bounded-promptness claim, with slack for a loaded host: the
        # point is "no hang", not a latency SLO.
        assert time.perf_counter() - t0 < 30
    finally:
        if added:
            sys.path.remove(root)
