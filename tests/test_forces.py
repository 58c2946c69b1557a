"""Force-law unit tests (SURVEY §4 tier 1-2).

Pins the piecewise force at hand-picked radii against closed-form values
from the reference kernel constants (/root/reference/nuclear_forces.py:100-137),
and checks the vectorized jnp step against the pure-Python scalar oracle on
random states.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.init import init_state
from pyqmd_tpu.core.forces import (
    compute_forces,
    force_step,
    force_step_scalar,
    pair_net_force,
)
from pyqmd_tpu.state import NEUTRON, PROTON

CFG = SimConfig()


def net(dist, pp=False, same=False):
    d = jnp.asarray(dist, jnp.float32)
    return float(
        pair_net_force(d, d * d, jnp.asarray(pp), jnp.asarray(same), CFG)
    )


def test_hard_core_at_contact():
    # dist = 2.0 < 4.25: hard core -60*(overlap/4.25)^1.5 plus repulsive core.
    d = 2.0
    overlap = (4.25 - d) / 4.25
    expected = -60.0 * overlap**1.5 - 0.7 * 150.0 / (d * d + 0.15)
    expected = max(-12.0, expected)  # clamp
    assert net(d) == pytest.approx(expected, rel=1e-5)
    assert net(d) == -12.0  # deep core saturates the clamp


def test_attractive_region():
    # dist = 5.0 in [2.8, 9.0): attraction saturates the +12 clamp
    # (raw value 17.8; nuclear_forces.py:137).
    assert net(5.0) == 12.0
    # dist = 7.0: pure attraction below the clamp — exact closed form.
    d = 7.0
    expected = 1.25 * 150.0 * math.exp(-d / 7.0) / (d + 0.15)
    assert expected < 12.0
    assert net(d) == pytest.approx(expected, rel=1e-5)


def test_tail_region():
    d = 12.0
    expected = 0.15 * 150.0 * math.exp(-d / 7.0 * 1.8) / (d + 0.15)
    assert net(d) == pytest.approx(expected, rel=1e-4)


def test_piecewise_boundaries():
    # Just below/above the 2.8 cut the sign flips (core repulsive).
    assert net(2.79) < 0 < net(2.81)
    # The 9.0 cut drops the magnitude (attract -> tail).
    assert net(8.99) > net(9.01) > 0


def test_coulomb_only_protons():
    d = 7.0  # both sides below the clamp here
    diff = net(d, pp=True, same=True) - net(d, pp=False, same=True)
    assert diff == pytest.approx(-30.0 / (d * d + 0.15), rel=1e-5)


def test_pauli_same_type_within_range():
    d = 7.0  # both sides below the clamp here
    diff = net(d, pp=False, same=True) - net(d, pp=False, same=False)
    assert diff == pytest.approx(-35.0 * math.exp(-d / 8.0 * 2.0), rel=1e-5)
    # Out of range: no Pauli term.
    d = 8.5
    assert net(d, same=True) == pytest.approx(net(d, same=False), rel=1e-6)


def test_clamp():
    assert net(0.2) == -12.0
    for d in [3.0, 5.0, 7.0, 11.0]:
        assert -12.0 <= net(d, pp=True, same=True) <= 12.0


@pytest.mark.parametrize("n_alive", [2, 4, 17, 60])
def test_step_matches_scalar_oracle(n_alive):
    rng = np.random.default_rng(n_alive)
    p = 64
    pos = rng.uniform(390, 410, (p, 2)).astype(np.float32)
    vel = rng.normal(0, 1, (p, 2)).astype(np.float32)
    ptype = rng.integers(0, 2, p).astype(np.int32)
    alive = np.zeros(p, bool)
    alive[:n_alive] = True
    dt = 1.0 / 240.0

    jp, jv = jax.jit(lambda *a: force_step(*a, dt, CFG))(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(ptype), jnp.asarray(alive)
    )
    sp, sv = force_step_scalar(pos.tolist(), vel.tolist(), ptype.tolist(), alive.tolist(), dt, CFG)
    np.testing.assert_allclose(np.asarray(jp), np.asarray(sp), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jv), np.asarray(sv), rtol=2e-4, atol=2e-4)
    # Dead slots untouched.
    np.testing.assert_array_equal(np.asarray(jp)[n_alive:], pos[n_alive:])


def test_com_spring_pulls_back_strays():
    # One particle far outside 1.5x nuclear radius feels a restoring force.
    p = 8
    pos = np.full((p, 2), 400.0, np.float32)
    pos[:, 0] += np.linspace(-3, 3, p)
    pos[0] = (500.0, 400.0)  # stray
    ptype = np.array([PROTON, NEUTRON] * 4, np.int32)
    alive = np.ones(p, bool)
    f = compute_forces(jnp.asarray(pos), jnp.asarray(ptype), jnp.asarray(alive), CFG)
    assert float(f[0, 0]) < 0  # pulled back toward the cluster (negative x)


def test_damping_and_integration():
    # Two distant particles: pair force ~0, only the CoM spring acts.
    # Check the exact update chain v = (v + F*dt)*0.85; x += v*dt
    # (nuclear_forces.py:156-171).
    pos = np.array([[0.0, 0.0], [1000.0, 0.0]], np.float32)
    vel = np.array([[10.0, -4.0], [0.0, 0.0]], np.float32)
    ptype = np.array([PROTON, NEUTRON], np.int32)
    alive = np.ones(2, bool)
    dt = 0.01
    # CoM spring on particle 0: center (500, 0), dist 500, R = 1.2*2^(1/3)*2.
    r_nuc = 1.2 * 2 ** (1 / 3) * 2.0
    f0 = np.array([0.03 * (500.0 - r_nuc), 0.0])
    exp_v0 = (vel[0] + f0 * dt) * 0.85
    exp_p0 = pos[0] + exp_v0 * dt
    np_, nv = force_step(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(ptype), jnp.asarray(alive), dt, CFG
    )
    np.testing.assert_allclose(np.asarray(nv[0]), exp_v0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(np_[0]), exp_p0, rtol=1e-4)


def test_determinism():
    rng = np.random.default_rng(0)
    pos = rng.uniform(390, 410, (32, 2)).astype(np.float32)
    args = (
        jnp.asarray(pos),
        jnp.zeros((32, 2), jnp.float32),
        jnp.zeros(32, jnp.int32),
        jnp.ones(32, bool),
    )
    a = force_step(*args, 1 / 240, CFG)
    b = force_step(*args, 1 / 240, CFG)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_leapfrog_converges_faster_than_euler():
    """The flagged velocity-Verlet integrator (SURVEY §7 step 2) is more
    accurate than the reference Euler scheme at the same dt: both compared
    against a fine-step Euler 'truth' on a smooth (unclamped) configuration
    with damping off."""
    base = dict(z=2, n=2, max_particles=8, damping=1.0)
    cfg_e = SimConfig(**base, integrator="euler")
    cfg_l = SimConfig(**base, integrator="leapfrog")

    # Three nucleons at ~7-unit spacing: smooth attractive regime.
    pos0 = np.zeros((8, 2), np.float32)
    pos0[0] = (0.0, 0.0)
    pos0[1] = (7.0, 0.0)
    pos0[2] = (3.5, 6.0)
    vel0 = np.zeros((8, 2), np.float32)
    ptype = np.array([PROTON, NEUTRON, NEUTRON] + [0] * 5, np.int32)
    alive = np.array([True] * 3 + [False] * 5)

    def rollout(cfg, dt, steps):
        p = jnp.asarray(pos0)
        v = jnp.asarray(vel0)
        for _ in range(steps):
            p, v = force_step(p, v, jnp.asarray(ptype), jnp.asarray(alive), dt, cfg)
        return np.asarray(p)[:3]

    dt, steps = 1 / 60.0, 12
    truth = rollout(cfg_e, dt / 64, steps * 64)
    err_e = np.abs(rollout(cfg_e, dt, steps) - truth).max()
    err_l = np.abs(rollout(cfg_l, dt, steps) - truth).max()
    assert err_l < err_e * 0.5  # second order beats first order


def test_unknown_integrator_rejected():
    # Rejected at configuration time since r4 (SimConfig.__post_init__).
    with pytest.raises(ValueError):
        SimConfig(z=2, n=2, max_particles=8, integrator="rk9000")


def test_degenerate_schedule_values_rejected():
    """accuracy >= 2 zeroes effective_dt (divide-by-zero in the substep
    scheduler); physics_dt <= 0 and max_substeps < 1 are equally
    degenerate — all must fail at configuration time, not first frame."""
    for kw in ({"accuracy": 2.0}, {"accuracy": -0.1},
               {"physics_dt": 0.0}, {"max_substeps": 0}):
        with pytest.raises(ValueError):
            SimConfig(z=2, n=2, max_particles=8, **kw)


def test_force_step_differentiable():
    """The jnp force path is grad-safe (pure functional, no data-dependent
    Python control flow): the adjoint through 5 fused substeps is finite
    and matches a central finite difference. No reference analog — the
    OpenCL kernel is a dead end for sensitivities."""
    cfg = SimConfig.for_isotope(6, 8, pad_to=16)
    st = init_state(cfg, seed=0)
    dt = cfg.effective_dt()

    def loss(pos):
        p, v = pos, st.vel
        for _ in range(5):
            p, v = force_step(p, v, st.ptype, st.alive, dt, cfg)
        return 0.5 * jnp.sum(jnp.sum(v * v, -1) * st.alive)

    g = jax.jit(jax.grad(loss))(st.pos)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 1e-3  # non-degenerate adjoint
    i, d, eps = 3, 0, 1e-3
    e = jnp.zeros_like(st.pos).at[i, d].set(eps)
    fd = (loss(st.pos + e) - loss(st.pos - e)) / (2 * eps)
    assert abs(float(g[i, d]) - float(fd)) < 0.15 * abs(float(fd))


def test_prime_batch_chunking_pads_not_degrades():
    """A prime batch bigger than max_chunk must pad up to a chunk multiple
    (dead members) instead of shrinking the divisor to 1 — B sequential
    dispatches (VERDICT r3 weak #4). Results must match the unchunked vmap
    on every real member."""
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    key = jax.random.PRNGKey(7)
    b, p = 13, 8  # prime batch, > max_chunk below
    pos = jax.random.uniform(key, (b, p, 2), minval=390.0, maxval=410.0)
    vel = jnp.zeros((b, p, 2))
    ptype = jnp.tile(jnp.asarray([PROTON, NEUTRON] * 4, jnp.int32), (b, 1))
    alive = jnp.ones((b, p), bool).at[:, 4:].set(False)
    dt = cfg.effective_dt()

    full_p, full_v = force_step(pos, vel, ptype, alive, dt, cfg)
    chunk_p, chunk_v = force_step(pos, vel, ptype, alive, dt, cfg, max_chunk=4)
    assert chunk_p.shape == pos.shape and chunk_v.shape == vel.shape
    np.testing.assert_allclose(np.asarray(full_p), np.asarray(chunk_p), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(full_v), np.asarray(chunk_v), rtol=0, atol=1e-6)


def test_chunk_plan_minimal_waste():
    """Chunking must never waste more than chunk-1 padded rows (VERDICT r4
    item 2 — the r4 scheme padded b=10240 up to 2x8192, 60% dead rows)."""
    from pyqmd_tpu.core.forces import chunk_plan

    for b in (8192, 8209, 10240, 65536, 3, 8193, 100000):
        for max_chunk in (1024, 8192):
            n, chunk, pad = chunk_plan(b, max_chunk)
            assert chunk <= max_chunk
            assert n * chunk == b + pad
            assert 0 <= pad < chunk, (b, max_chunk, n, chunk, pad)
    # The regression case: 10240 over 8192-chunks must waste zero rows.
    assert chunk_plan(10240, 8192) == (2, 5120, 0)
    assert chunk_plan(8209, 8192) == (2, 4105, 1)
