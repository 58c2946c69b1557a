"""Frame-step tests: scan substeps, ejecta advection, overlap resolution.

The jit'd equivalents of /root/reference/nuclear_sim.py:118-210 and
:355-379.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.dynamics import FrameDynamics
from pyqmd_tpu.core.init import init_state
from pyqmd_tpu.core.overlap import resolve_overlaps
from pyqmd_tpu.core.step import advance_ejecta, make_frame_fn, simulate_frame
from pyqmd_tpu.state import ALPHA, GAMMA, NEUTRON, PROTON, empty_state


def test_substep_count_matches_reference_truncation():
    """cfg.num_substeps reproduces nuclear_sim.py:153:
    max(1, min(max_substeps, int(desired_dt / effective_dt)))."""
    cfg = SimConfig()
    assert cfg.num_substeps(1 / 60, 1.0) == max(
        1, min(20, int((1 / 60) / (1 / 240)))
    )
    assert cfg.num_substeps(1 / 60, 1.0) == 4
    assert cfg.num_substeps(1 / 60, 1e9) == 20  # clamped to max
    assert cfg.num_substeps(1 / 60, 1e-6) == 1  # floor at 1


def test_frame_advances_time_and_stays_finite():
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    st = init_state(cfg, seed=0)
    st2, m = jax.jit(
        lambda s: simulate_frame(s, cfg, 1.0, 1 / 60.0, 4)
    )(st)
    assert float(m["time_passed"]) == pytest.approx(1 / 60, rel=1e-5)
    assert int(m["alive"]) == 14
    assert bool(jnp.all(jnp.isfinite(st2.pos)))
    assert bool(jnp.all(jnp.isfinite(st2.vel)))
    # rng advanced.
    assert not np.array_equal(np.asarray(st.rng), np.asarray(st2.rng))


def test_frame_reproducible():
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    st = init_state(cfg, seed=1)
    a, _ = simulate_frame(st, cfg, 1.0, 1 / 60.0, 4)
    b, _ = simulate_frame(st, cfg, 1.0, 1 / 60.0, 4)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_nucleus_relaxes_to_packing_equilibrium():
    """The overlap-resolved, force-bound cluster settles at nearest-neighbor
    spacing near the 5.0 overlap distance (nuclear_sim.py:357) with a
    bounded radius — neither collapsed nor exploding."""
    cfg = SimConfig.for_isotope(26, 30, pad_to=8)  # Fe-56, stable
    st = init_state(cfg, seed=0)
    fn = make_frame_fn(cfg, 8)
    for _ in range(80):
        st, m = fn(st, 1.0, 1 / 60.0)
    pos = np.asarray(st.pos)[np.asarray(st.alive)]
    com = pos.mean(0)
    r = np.sqrt(((pos - com) ** 2).sum(-1))
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    d += np.eye(len(pos)) * 1e9
    nn = d.min(1).mean()
    assert 3.5 < nn < 6.0  # packed at ~overlap_min_dist
    # Bounded: a 56-nucleon disc at ~5 spacing has radius ~20.
    assert r.max() < 30.0
    assert np.isfinite(pos).all()


def test_ejecta_advection_and_expiry():
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    st = empty_state(cfg)
    # One animated alpha, one emitted neutron.
    st = st.replace(
        ej_pos=st.ej_pos.at[0].set(jnp.array([0.0, 0.0])).at[1].set(jnp.array([0.0, 0.0])),
        ej_vel=st.ej_vel.at[0].set(jnp.array([30.0, 0.0])).at[1].set(jnp.array([60.0, 0.0])),
        ej_type=st.ej_type.at[0].set(ALPHA).at[1].set(NEUTRON),
        ej_life=st.ej_life.at[0].set(2.0),
        ej_alive=st.ej_alive.at[0].set(True).at[1].set(True),
    )
    dyn = FrameDynamics(
        jnp.float32(1.0), jnp.float32(10.0), jnp.float32(1 / 240), jnp.float32(0.5)
    )
    st2 = advance_ejecta(st, cfg, dyn)
    # Animated: fixed animation step 1/240 * 0.3 * (10/10) (nuclear_sim.py:185-194).
    assert float(st2.ej_pos[0, 0]) == pytest.approx(30.0 * (1 / 240) * 0.3, rel=1e-4)
    # Nucleon: dt * sqrt(ts) advection (nuclear_sim.py:206-208).
    assert float(st2.ej_pos[1, 0]) == pytest.approx(60.0 * (1 / 240) * 1.0, rel=1e-4)
    # Aging: animated ages by step_time * aging_scale (=0.5 here), nucleon by step_time.
    assert float(st2.ej_age[0]) == pytest.approx(0.5, rel=1e-4)
    assert float(st2.ej_age[1]) == pytest.approx(0.5, rel=1e-4)
    # Expiry: age the alpha past its lifetime.
    for _ in range(4):
        st2 = advance_ejecta(st2, cfg, dyn)
    assert not bool(st2.ej_alive[0])  # expired (age 2.5 >= 2.0)
    assert bool(st2.ej_alive[1])  # nucleons never expire


def test_ejecta_aging_scale_slows_at_high_timescale():
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    st = empty_state(cfg)
    st = st.replace(
        ej_type=st.ej_type.at[0].set(GAMMA),
        ej_life=st.ej_life.at[0].set(1e9),
        ej_alive=st.ej_alive.at[0].set(True),
    )
    dyn = FrameDynamics(
        jnp.float32(1e6), jnp.float32(10.0), jnp.float32(1 / 240), jnp.float32(1.0)
    )
    st2 = advance_ejecta(st, cfg, dyn)
    expected = 1.0 / math.sqrt(1e6 / 100.0)  # nuclear_sim.py:198-200
    assert float(st2.ej_age[0]) == pytest.approx(expected, rel=1e-3)


def test_resolve_overlaps_separates_pairs():
    cfg = SimConfig()
    pos = jnp.array([[0.0, 0.0], [1.0, 0.0], [100.0, 0.0]], jnp.float32)
    alive = jnp.array([True, True, True])
    out = resolve_overlaps(pos, alive, jax.random.PRNGKey(0), cfg)
    d01 = float(jnp.linalg.norm(out[0] - out[1]))
    assert d01 > 1.0  # pushed apart toward min_dist=5
    # Far particle untouched.
    np.testing.assert_allclose(np.asarray(out[2]), [100.0, 0.0], atol=1e-5)
    # Symmetric push: midpoint preserved.
    mid = (out[0] + out[1]) / 2
    np.testing.assert_allclose(np.asarray(mid), [0.5, 0.0], atol=1e-4)


def test_resolve_overlaps_degenerate_pair():
    cfg = SimConfig()
    pos = jnp.zeros((2, 2), jnp.float32)  # coincident
    alive = jnp.array([True, True])
    out = resolve_overlaps(pos, alive, jax.random.PRNGKey(1), cfg)
    d = float(jnp.linalg.norm(out[0] - out[1]))
    assert d > 1.0  # random-direction separation fired
    assert np.isfinite(np.asarray(out)).all()


def test_decay_happens_in_frame_at_extreme_timescale():
    """C-14 at ~1e5 years/frame must decay within a few frames and the
    frame must log it (decay inside jit end to end)."""
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    st = init_state(cfg, seed=2)
    fn = make_frame_fn(cfg, 4)
    ts = 3.15e12 * 60  # ~1e5 years per 1/60s frame
    decayed = False
    for _ in range(50):
        st, m = fn(st, ts, 1 / 60.0)
        if int(m["z"]) == 7:
            decayed = True
            break
    assert decayed
    assert int(st.decay_counts.sum()) == 1
    assert int(st.chain_cursor) == 2


def test_make_frame_fn_caches():
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    assert make_frame_fn(cfg, 4) is make_frame_fn(cfg, 4)
    assert make_frame_fn(cfg, 4) is not make_frame_fn(cfg, 5)


def test_empty_state_steps_safely():
    """An all-dead state (no nucleons) steps without NaNs: masked forces,
    guarded center of mass, no decays (half-life inf)."""
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    st = empty_state(cfg)
    st2, m = simulate_frame(st, cfg, 1e20, 1 / 60.0, 4)
    assert int(m["alive"]) == 0
    assert not bool(m["nan"])
    assert int(st2.decay_counts.sum()) == 0
    assert np.isfinite(np.asarray(st2.pos)).all()


def test_batched_overlap_prime_batch_pads():
    """A prime batch must pad up to a chunk multiple, not degrade to
    chunk=1 sequential dispatches (VERDICT r2 weak #7)."""
    from pyqmd_tpu.core.step import _batched_overlap

    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    b = 13  # prime, > max_chunk below
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (b, 8, 2), minval=0.0, maxval=3.0)
    alive = jnp.ones((b, 8), bool)
    keys = jax.random.split(jax.random.PRNGKey(1), b)
    out = _batched_overlap(pos, alive, keys, cfg, max_chunk=4)
    assert out.shape == (b, 8, 2)
    # Matches the unchunked vmap on every real member.
    ref = jax.vmap(lambda p, a, k: resolve_overlaps(p, a, k, cfg))(
        pos, alive, keys
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_ejecta_lifetime_uses_raw_physics_dt():
    """The lifetime dt factor reads the raw physics dt, not the
    accuracy-scaled effective dt (nuclear_sim.py:327; ADVICE r2)."""
    from pyqmd_tpu.core.decay import ejecta_lifetime

    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    raw = 1.0 / 240.0
    eff = raw * 1.5  # accuracy = 0.5
    dyn = FrameDynamics(
        jnp.float32(1000.0), jnp.float32(4.0), jnp.float32(eff),
        jnp.float32(1.0), jnp.float32(raw),
    )
    life = float(ejecta_lifetime(jnp.asarray(ALPHA), dyn, cfg))
    # fast branch: base * max(tf*sf*df, sf) with df from the RAW dt.
    tf, sf, df = 10.0, 2.0, 0.016 / raw
    assert life == pytest.approx(5.0 * tf * sf * df, rel=1e-5)
    # Backward-compatible default: raw omitted -> falls back to physics_dt.
    dyn4 = FrameDynamics(
        jnp.float32(1000.0), jnp.float32(4.0), jnp.float32(raw), jnp.float32(1.0)
    )
    assert float(ejecta_lifetime(jnp.asarray(ALPHA), dyn4, cfg)) == pytest.approx(
        life, rel=1e-5
    )


def test_rms_radius_observable():
    """rms_radius matches the hand-computed value, appears in frame
    metrics, and orders physically (He-4 smaller than U-238)."""
    cfg = SimConfig.for_isotope(92, 146, pad_to=128)
    st = init_state(cfg, seed=0)
    pos = np.asarray(st.pos)
    alive = np.asarray(st.alive)
    com = (pos * alive[:, None]).sum(0) / alive.sum()
    expect = math.sqrt(
        ((((pos - com) ** 2).sum(-1)) * alive).sum() / alive.sum()
    )
    got = float(st.rms_radius())
    assert abs(got - expect) < 1e-4 * expect

    fn = make_frame_fn(cfg, 4)
    st2, m = fn(st, 1.0, 1 / 60)
    assert "rms_radius" in m and np.isfinite(float(m["rms_radius"]))

    cfg_he = SimConfig.for_isotope(2, 2, pad_to=8)
    he = init_state(cfg_he, seed=0)
    fn_he = make_frame_fn(cfg_he, 4)
    for _ in range(10):
        he, m_he = fn_he(he, 1.0, 1 / 60)
        st2, m_u = fn(st2, 1.0, 1 / 60)
    assert float(m_he["rms_radius"]) < float(m_u["rms_radius"])
