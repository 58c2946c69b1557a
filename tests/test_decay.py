"""Decay-engine tests (SURVEY §4 tiers 1 and 3).

Probability math (particles.py:126-147), masked particle adjustment
(particles.py:149-203), ejecta creation (nuclear_sim.py:294-342,
decay_chains.py:331-388), counters, chain log — and the end-to-end seeded
U-238 walk through its 14-step chain to stable Pb-206.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.decay import (
    apply_decay,
    decay_probability,
    ejecta_lifetime,
    force_decay,
    maybe_decay,
)
from pyqmd_tpu.core.dynamics import FrameDynamics
from pyqmd_tpu.core.init import init_state
from pyqmd_tpu.data.halflives import YEAR
from pyqmd_tpu.state import (
    ALPHA,
    DECAY_ALPHA,
    DECAY_BETA_MINUS,
    ELECTRON,
    NEUTRON,
    PROTON,
)


def _dyn(ts=1.0, ss=1.0, pdt=1 / 240, step=1 / 240):
    return FrameDynamics(
        jnp.float32(ts), jnp.float32(ss), jnp.float32(pdt), jnp.float32(step)
    )


# --- probability -----------------------------------------------------------


def test_decay_probability_regimes():
    hl = 100.0
    # Small dt: linearized lambda*dt with the reference's 0.693.
    p = float(decay_probability(jnp.float32(hl), jnp.float32(0.5)))
    assert p == pytest.approx(0.693 / hl * 0.5, rel=1e-5)
    # Large dt: exact 1 - 0.5^(dt/T).
    p = float(decay_probability(jnp.float32(hl), jnp.float32(200.0)))
    assert p == pytest.approx(1.0 - 0.5 ** (200.0 / hl), rel=1e-5)
    # Stable: never.
    assert float(decay_probability(jnp.float32(np.inf), jnp.float32(1e30))) == 0.0
    # Enormous dt/T: saturates at 1.
    assert float(decay_probability(jnp.float32(1e-6), jnp.float32(1e20))) == 1.0
    # Clamped to [0, 1] in the linear regime too.
    assert 0.0 <= float(decay_probability(jnp.float32(1e30), jnp.float32(1e-9))) <= 1.0


# --- particle adjustment ----------------------------------------------------


def _decay_with(z, n, seed=0, key=7):
    cfg = SimConfig.for_isotope(z, n, pad_to=8)
    st = init_state(cfg, seed=seed)
    st2, dtype = force_decay(st, cfg, jax.random.PRNGKey(key), _dyn())
    return cfg, st, st2, int(dtype)


def test_alpha_decay_removes_2p2n():
    cfg, st, st2, dtype = _decay_with(92, 146)
    assert dtype == DECAY_ALPHA
    assert (int(st2.z), int(st2.n)) == (90, 144)  # U-238 -> Th-234
    alive, ptype = np.asarray(st2.alive), np.asarray(st2.ptype)
    assert int(((ptype == PROTON) & alive).sum()) == 90
    assert int(((ptype == NEUTRON) & alive).sum()) == 144
    # The removed nucleons are the lowest-indexed ones of each type
    # (particles.py:183-189 removes first-encountered).
    gone = np.asarray(st.alive) & ~alive
    assert gone.sum() == 4
    # Velocity damping 0.8 applied to survivors (particles.py:200-203).
    np.testing.assert_allclose(
        np.asarray(st2.vel)[alive], np.asarray(st.vel)[alive] * 0.8, rtol=1e-6
    )
    # Ejecta: one alpha at the post-decay center of mass.
    assert int(st2.ej_alive.sum()) == 1
    slot = int(np.argmax(np.asarray(st2.ej_alive)))
    assert int(st2.ej_type[slot]) == ALPHA
    w = alive.astype(np.float64)
    com = (np.asarray(st2.pos) * w[:, None]).sum(0) / w.sum()
    np.testing.assert_allclose(np.asarray(st2.ej_pos[slot]), com, rtol=1e-4)
    # Alpha ejecta speed renormalized to 30 (nuclear_sim.py:297-298).
    assert float(jnp.linalg.norm(st2.ej_vel[slot])) == pytest.approx(30.0, rel=1e-4)
    # Counter incremented (fixes reference C15 bug).
    assert int(st2.decay_counts[DECAY_ALPHA]) == 1
    # Chain log records U-238 -> Th-234.
    c = int(st2.chain_cursor) - 1
    L = cfg.max_chain_log
    assert (int(st2.chain_z0[c % L]), int(st2.chain_n0[c % L])) == (92, 146)
    assert (int(st2.chain_z1[c % L]), int(st2.chain_n1[c % L])) == (90, 144)
    assert int(st2.chain_dtype[c % L]) == DECAY_ALPHA


def test_beta_minus_flips_one_neutron():
    cfg, st, st2, dtype = _decay_with(6, 8)  # C-14 -> N-14
    assert dtype == DECAY_BETA_MINUS
    assert (int(st2.z), int(st2.n)) == (7, 7)
    alive, ptype = np.asarray(st2.alive), np.asarray(st2.ptype)
    assert alive.sum() == 14  # no nucleon removed
    assert int(((ptype == PROTON) & alive).sum()) == 7
    # The flipped nucleon is the first alive neutron of the old state.
    old = np.asarray(st.ptype)
    flipped = np.flatnonzero((old == NEUTRON) & np.asarray(st.alive))[0]
    assert ptype[flipped] == PROTON
    # No velocity damping on beta (particles.py:158-164 returns early).
    np.testing.assert_array_equal(np.asarray(st2.vel), np.asarray(st.vel))
    # Electron ejecta at speed 50.
    slot = int(np.argmax(np.asarray(st2.ej_alive)))
    assert int(st2.ej_type[slot]) == ELECTRON
    assert float(jnp.linalg.norm(st2.ej_vel[slot])) == pytest.approx(50.0, rel=1e-4)
    # Daughter N-14 is stable.
    assert math.isinf(float(st2.half_life))


def test_masked_no_decay_is_identity():
    cfg = SimConfig.for_isotope(92, 146, pad_to=8)
    st = init_state(cfg, seed=0)
    st2, dtype = apply_decay(st, cfg, jax.random.PRNGKey(0), jnp.asarray(False), _dyn())
    assert int(dtype) == 0
    for name in ("pos", "vel", "ptype", "alive", "z", "n", "decay_counts",
                 "ej_alive", "chain_cursor", "half_life"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st, name)), np.asarray(getattr(st2, name)), err_msg=name
        )


def test_stable_isotope_never_decays():
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)  # He-4 stable
    st = init_state(cfg, seed=0)
    dyn = _dyn(step=1e30)
    for k in range(5):
        st, dtype = maybe_decay(st, cfg, jax.random.PRNGKey(k), dyn)
        assert int(dtype) == 0
    assert int(st.decay_counts.sum()) == 0


def test_u238_chain_walk_to_pb206():
    """Seeded forced decays walk U-238 -> ... -> Pb-206 (14 steps), with
    counters matching the event log (SURVEY §4 tier 3)."""
    cfg = SimConfig.for_isotope(92, 146, pad_to=8, max_chain_log=32)
    st = init_state(cfg, seed=5)
    fd = jax.jit(lambda s, k: force_decay(s, cfg, k, _dyn()))
    key = jax.random.PRNGKey(123)
    path = [(92, 146)]
    for _ in range(14):
        key, k = jax.random.split(key)
        st, _ = fd(st, k)
        path.append((int(st.z), int(st.n)))
    assert path[-1] == (82, 124)  # Pb-206
    assert path[1] == (90, 144)  # first step Th-234
    assert math.isinf(float(st.half_life))  # stable end of chain
    # Dominant path: 8 alphas + 6 beta-minus.
    counts = np.asarray(st.decay_counts)
    assert counts[DECAY_ALPHA] == 8
    assert counts[DECAY_BETA_MINUS] == 6
    assert counts.sum() == 14
    # Chain log cursor: 1 initial entry + 14 decays.
    assert int(st.chain_cursor) == 15
    # Nucleon bookkeeping: Pb-206 = 82p + 124n alive.
    alive, ptype = np.asarray(st.alive), np.asarray(st.ptype)
    assert int(((ptype == PROTON) & alive).sum()) == 82
    assert int(((ptype == NEUTRON) & alive).sum()) == 124


def test_ejecta_ring_buffer_wraps():
    cfg = SimConfig.for_isotope(92, 146, pad_to=8, max_ejecta=4)
    st = init_state(cfg, seed=0)
    fd = jax.jit(lambda s, k: force_decay(s, cfg, k, _dyn()))
    key = jax.random.PRNGKey(9)
    for _ in range(6):  # more events than slots
        key, k = jax.random.split(key)
        st, _ = fd(st, k)
    assert int(st.ej_cursor) == 6
    assert int(st.ej_alive.sum()) == 4  # all slots recycled, none lost


def test_ejecta_lifetime_formula():
    cfg = SimConfig()
    # Fast time: ts=1e4, ss=10, pdt=1/240 (nuclear_sim.py:318-339).
    dyn = _dyn(ts=1e4, ss=10.0, pdt=1 / 240)
    tf = max(1.0, 1e4 / 100.0)
    sf = max(1.0, math.sqrt(10.0))
    df = max(1.0, 0.016 * 240.0)
    expected = max(5.0 * sf, 5.0 * tf * sf * df)
    got = float(ejecta_lifetime(jnp.asarray([ALPHA]), dyn, cfg)[0])
    assert got == pytest.approx(expected, rel=1e-4)
    # Real time: per-type base lifetime floor (particles.py:31-38).
    dyn = _dyn(ts=1.0, ss=1.0)
    got = float(ejecta_lifetime(jnp.asarray([ALPHA]), dyn, cfg)[0])
    assert got == pytest.approx(5.0)  # max(2.0 base, 5.0)
    # >15 substeps multiplies again (nuclear_sim.py:338-339).
    dyn = _dyn(ts=1e4, ss=20.0)
    got20 = float(ejecta_lifetime(jnp.asarray([ALPHA]), dyn, cfg)[0])
    dyn15 = _dyn(ts=1e4, ss=15.0)
    got15 = float(ejecta_lifetime(jnp.asarray([ALPHA]), dyn15, cfg)[0])
    assert got20 > got15


def test_statistical_decay_rate_matches_half_life():
    """Bernoulli sampling at fixed dt reproduces P = 0.693/T*dt."""
    hl = 1000.0
    dt = 10.0
    p_expected = 0.693 / hl * dt
    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    p = decay_probability(jnp.float32(hl), jnp.float32(dt))
    draws = jax.vmap(lambda k: jax.random.uniform(k) < p)(keys)
    rate = float(jnp.mean(draws))
    assert rate == pytest.approx(p_expected, rel=0.1)


def test_chain_duration_measured_vs_synthetic():
    """Chain-log durations follow nuclear_sim.py:239-255: the measured sim
    time since the last decay when significant, otherwise an exponential
    synthetic draw capped by (measured or half-life)."""
    cfg = SimConfig.for_isotope(92, 146, pad_to=8)
    st = init_state(cfg, seed=0)
    # Advance the frame clock by a known significant interval.
    elapsed = 1.0e15  # sim seconds since last decay
    st = st.replace(time_passed=st.time_passed + elapsed)
    st2, _ = force_decay(st, cfg, jax.random.PRNGKey(1), _dyn())
    i = (int(st2.chain_cursor) - 1) % cfg.max_chain_log
    # Measured branch: duration == elapsed exactly.
    assert float(st2.chain_time[i]) == pytest.approx(elapsed, rel=1e-6)
    assert float(st2.last_decay_time) == pytest.approx(float(st2.time_passed))

    # Immediate second decay: measured ~0 -> synthetic Exp draw bounded by
    # min(T*Exp/0.693, half_life) and positive.
    st3, _ = force_decay(st2, cfg, jax.random.PRNGKey(2), _dyn())
    j = (int(st3.chain_cursor) - 1) % cfg.max_chain_log
    dur = float(st3.chain_time[j])
    hl = float(st2.half_life)  # Th-234 half-life (parent of this decay)
    assert 0.0 < dur <= hl * 30  # exponential tail, overwhelmingly < 30 T


def test_every_db_isotope_decay_walk_invariants():
    """Walk EVERY tabulated isotope through forced decays: after each event
    the alive proton/neutron counts must equal the (Z, N) identity the
    branch tables assigned — a database-wide consistency check of
    DECAY_CHAINS, the predictor, and the masked adjust_particles rewrite
    (particles.py:149-203 + decay_chains.py end to end)."""
    from pyqmd_tpu.data.halflives import HALF_LIVES
    from pyqmd_tpu.state import empty_state

    cfg = SimConfig.for_isotope(94, 150, pad_to=256)  # capacity fits all
    dyn = _dyn()
    fd = jax.jit(lambda s, k: force_decay(s, cfg, k, dyn))

    def make(z, n):
        st = empty_state(cfg)
        p = cfg.max_particles
        ptype = np.full(p, NEUTRON, np.int32)
        ptype[:z] = PROTON
        alive = np.arange(p) < z + n
        rng = np.random.default_rng(z * 1000 + n)
        pos = 400.0 + rng.uniform(-3, 3, (p, 2)).astype(np.float32)
        return st.replace(
            pos=jnp.asarray(pos),
            ptype=jnp.asarray(ptype),
            alive=jnp.asarray(alive),
            z=jnp.asarray(z, jnp.int32),
            n=jnp.asarray(n, jnp.int32),
            half_life=jnp.asarray(HALF_LIVES[(z, n)], jnp.float32),
        )

    from pyqmd_tpu.state import (
        DECAY_BETA_PLUS,
        DECAY_NEUTRON_EMISSION,
        DECAY_PROTON_EMISSION,
    )

    # (dZ, dN) each particle-changing decay type implies.
    expect_delta = {
        DECAY_ALPHA: (-2, -2),
        DECAY_BETA_MINUS: (1, -1),
        DECAY_BETA_PLUS: (-1, 1),
        DECAY_NEUTRON_EMISSION: (0, -1),
        DECAY_PROTON_EMISSION: (-1, 0),
    }

    for (z, n), hl in sorted(HALF_LIVES.items()):
        if hl == float("inf"):
            continue  # stable: force_decay would sample its predictor mode
        st = make(z, n)
        key = jax.random.PRNGKey(z * 131 + n)
        for step in range(40):
            prev = (int(st.z), int(st.n))
            key, k = jax.random.split(key)
            st, dtype = fd(st, k)
            zz, nn = int(st.z), int(st.n)
            d = int(dtype)
            if d in expect_delta and (zz - prev[0], nn - prev[1]) != expect_delta[d]:
                # A reference-inherited inconsistent chain row fired (the
                # tabled daughter's arithmetic disagrees with the decay
                # type — see PARITY.md departure #8). The particle
                # adjustment follows the type while the identity follows
                # the table, exactly as the reference behaves; stop
                # validating this walk — but ONLY for the documented quirk
                # parents, so a future DB edit that breaks a main branch
                # fails loudly instead of vacuously ending the walk.
                assert prev in {(84, 134), (83, 131), (43, 56)}, (
                    f"undocumented chain/type mismatch at {prev}: "
                    f"type {d} produced ({zz}, {nn})"
                )
                break
            alive = np.asarray(st.alive)
            ptype = np.asarray(st.ptype)
            pz = int(((ptype == PROTON) & alive).sum())
            pn = int(((ptype == NEUTRON) & alive).sum())
            assert zz >= 0 and nn >= 0, (z, n, step, zz, nn)
            assert (pz, pn) == (zz, nn), (
                f"{z},{n} step {step}: state says Z={zz} N={nn} but alive "
                f"nucleons are {pz}p+{pn}n"
            )
            assert np.isfinite(float(st.half_life)) or float(
                st.half_life
            ) == float("inf")
            if float(st.half_life) == float("inf"):
                break  # reached a stable end of the chain
