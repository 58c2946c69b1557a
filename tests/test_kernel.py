"""Pallas kernel equivalence tests (SURVEY §4 tier 2).

The fused Mosaic kernel must match the jnp oracle to f32 tolerance across
nucleus sizes and batch shapes. On CPU the kernel runs in interpret mode —
the "fake backend" for CI without a TPU; the same assertions run compiled
on real TPU hardware via bench.py / the driver's entry check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.forces import force_step
from pyqmd_tpu.kernels.forces_pallas import TILE_B, force_step_pallas

# Equivalence tests pin the exact kernel; fast_math (approx reciprocals,
# the -cl-fast-relaxed-math analog and the default) is bounded separately.
CFG = SimConfig.for_isotope(92, 146, pad_to=128, fast_math=False)


def _random_state(p, n_alive, seed, spread=40.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(400 - spread / 2, 400 + spread / 2, (p, 2)).astype(np.float32)
    vel = rng.normal(0, 2, (p, 2)).astype(np.float32)
    ptype = rng.integers(0, 2, p).astype(np.int32)
    alive = np.arange(p) < n_alive
    return (
        jnp.asarray(pos),
        jnp.asarray(vel),
        jnp.asarray(ptype),
        jnp.asarray(alive),
    )


@pytest.mark.parametrize("n_alive", [4, 56, 238, 256])
def test_kernel_matches_jnp(n_alive):
    pos, vel, ptype, alive = _random_state(256, n_alive, n_alive)
    dt = 1 / 240.0
    jp, jv = force_step(pos, vel, ptype, alive, dt, CFG)
    pp, pv = force_step_pallas(pos, vel, ptype, alive, dt, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(jp), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=1e-4, atol=1e-4)


def test_kernel_batched_and_tile_padding():
    """Batch sizes that don't divide TILE_B are padded and unpadded."""
    b = TILE_B + 3
    states = [_random_state(128, 100, s) for s in range(b)]
    pos = jnp.stack([s[0] for s in states])
    vel = jnp.stack([s[1] for s in states])
    ptype = jnp.stack([s[2] for s in states])
    alive = jnp.stack([s[3] for s in states])
    dt = 1 / 240.0

    pp, pv = force_step_pallas(pos, vel, ptype, alive, dt, CFG, interpret=True)
    ref = [force_step(*_random_state(128, 100, s), dt, CFG) for s in range(b)]
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(pp[i]), np.asarray(ref[i][0]), rtol=1e-4, atol=1e-4
        )
        # Velocities too: padded-tile garbage would corrupt v before it
        # shows in x after a single dt step.
        np.testing.assert_allclose(
            np.asarray(pv[i]), np.asarray(ref[i][1]), rtol=1e-4, atol=1e-4
        )


def test_kernel_dense_cluster():
    """Hard-core regime: everything overlapping (post-init state)."""
    pos, vel, ptype, alive = _random_state(128, 64, 7, spread=4.0)
    dt = 1 / 240.0
    jp, jv = force_step(pos, vel, ptype, alive, dt, CFG)
    pp, pv = force_step_pallas(pos, vel, ptype, alive, dt, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(jp), rtol=2e-4, atol=2e-4)


def test_kernel_unaligned_capacity_pads():
    """P=100 (not a lane multiple) pads to 128 with dead slots (the r3
    P % 128 restriction is lifted)."""
    pos, vel, ptype, alive = _random_state(100, 50, 0)
    dt = 1 / 240.0
    jp, jv = force_step(pos, vel, ptype, alive, dt, CFG)
    pp, pv = force_step_pallas(pos, vel, ptype, alive, dt, CFG, interpret=True)
    assert pp.shape == pos.shape
    np.testing.assert_allclose(np.asarray(pp), np.asarray(jp), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("p,batch", [(8, 1), (8, 37), (16, 19), (6, 21)])
def test_kernel_packed_small_nuclei(p, batch):
    """Small capacities pack G = 128//next_pow2(P) nuclei per lane row with
    block-diagonal pair masks and per-group CoM (VERDICT r3 weak #1).
    Mixed alive counts and batches that straddle row/tile boundaries must
    match the per-nucleus jnp oracle."""
    cfg = SimConfig.for_isotope(2, 2, pad_to=p, fast_math=False)
    rng = np.random.default_rng(p * 100 + batch)
    dt = 1 / 240.0
    states = []
    for i in range(batch):
        # Varying alive counts, including fully-dead members.
        n_alive = int(rng.integers(0, p + 1))
        states.append(_random_state(p, n_alive, seed=i, spread=12.0))
    pos = jnp.stack([s[0] for s in states])
    vel = jnp.stack([s[1] for s in states])
    ptype = jnp.stack([s[2] for s in states])
    alive = jnp.stack([s[3] for s in states])

    pp, pv = force_step_pallas(pos, vel, ptype, alive, dt, cfg, interpret=True)
    assert pp.shape == pos.shape
    for i in range(batch):
        jp, jv = force_step(*states[i], dt, cfg)
        np.testing.assert_allclose(
            np.asarray(pp[i]), np.asarray(jp), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(pv[i]), np.asarray(jv), rtol=1e-4, atol=1e-4
        )


def test_kernel_packed_groups_independent():
    """Nuclei packed into the same lane row must not interact: a packed
    row computes the same forces as each nucleus alone."""
    cfg = SimConfig.for_isotope(2, 2, pad_to=8, fast_math=False)
    dt = 1 / 240.0
    # 16 nuclei all clustered at the SAME world position — cross-group
    # pairs would be inside every force range if the mask leaked.
    states = [_random_state(8, 8, seed=i, spread=6.0) for i in range(16)]
    pos = jnp.stack([s[0] for s in states])
    vel = jnp.stack([s[1] for s in states])
    ptype = jnp.stack([s[2] for s in states])
    alive = jnp.stack([s[3] for s in states])
    pp, pv = force_step_pallas(pos, vel, ptype, alive, dt, cfg, interpret=True)
    for i in range(16):
        sp, sv = force_step_pallas(*states[i], dt, cfg, interpret=True)
        np.testing.assert_allclose(np.asarray(pp[i]), np.asarray(sp), rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pv[i]), np.asarray(sv), rtol=0, atol=1e-5)


@pytest.mark.parametrize("p,n_alive", [(256, 238), (8, 4)])
def test_kernel_leapfrog_matches_jnp(p, n_alive):
    """The leapfrog (velocity-Verlet) integrator runs in-kernel — two fused
    force sweeps — and matches core.forces._leapfrog_step (VERDICT r3
    weak #6: leapfrog no longer forces the jnp backend)."""
    cfg = SimConfig.for_isotope(
        92, 146, pad_to=p, fast_math=False, integrator="leapfrog"
    )
    pos, vel, ptype, alive = _random_state(p, n_alive, seed=p)
    dt = 1 / 240.0
    jp, jv = force_step(pos, vel, ptype, alive, dt, cfg)
    pp, pv = force_step_pallas(pos, vel, ptype, alive, dt, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(jp), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=1e-4, atol=1e-4)


def test_fast_math_bounded():
    """fast_math (approx reciprocals) stays within loose tolerance of the
    exact kernel — the accuracy contract of the default mode."""
    cfg_fast = SimConfig.for_isotope(92, 146, pad_to=128, fast_math=True)
    pos, vel, ptype, alive = _random_state(256, 238, 0)
    dt = 1 / 240.0
    pe, ve = force_step_pallas(pos, vel, ptype, alive, dt, CFG, interpret=True)
    pf, vf = force_step_pallas(pos, vel, ptype, alive, dt, cfg_fast, interpret=True)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pe), rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(ve), rtol=0, atol=5e-3)


# --- overlap kernel (kernels/overlap_pallas.py vs core/overlap oracle) -------


def _overlap_oracle(pos, alive, u, cfg):
    from pyqmd_tpu.core.overlap import _resolve_once

    return _resolve_once(pos, alive, u, cfg)


@pytest.mark.parametrize("n_alive", [4, 100, 238, 256])
def test_overlap_kernel_matches_jnp(n_alive):
    from pyqmd_tpu.kernels.overlap_pallas import overlap_step_pallas

    rng = np.random.default_rng(n_alive)
    p = 256
    # Tight cluster so plenty of pairs are inside overlap_min_dist.
    pos = jnp.asarray(
        rng.uniform(395, 405, (p, 2)).astype(np.float32)
    )
    alive = jnp.asarray(np.arange(p) < n_alive)
    u = jnp.asarray(rng.uniform(0, 2 * np.pi, p).astype(np.float32))
    ref = _overlap_oracle(pos, alive, u, CFG)
    out = overlap_step_pallas(pos, alive, u, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_overlap_kernel_degenerate_pairs():
    """Coincident particles separate along the same angle-sum direction as
    the oracle (nuclear_sim.py:367-369 analog)."""
    from pyqmd_tpu.kernels.overlap_pallas import overlap_step_pallas

    p = 128
    pos = jnp.broadcast_to(jnp.array([400.0, 400.0], jnp.float32), (p, 2))
    alive = jnp.asarray(np.arange(p) < 3)  # three coincident nucleons
    u = jnp.asarray(np.linspace(0.1, 6.0, p).astype(np.float32))
    cfg = SimConfig.for_isotope(2, 2, pad_to=128, fast_math=False)
    ref = _overlap_oracle(pos, alive, u, cfg)
    out = overlap_step_pallas(pos, alive, u, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    # They actually separated.
    d01 = float(jnp.linalg.norm(out[0] - out[1]))
    assert d01 > 1.0


def test_overlap_kernel_batched():
    from pyqmd_tpu.kernels.overlap_pallas import overlap_step_pallas

    rng = np.random.default_rng(7)
    b, p = TILE_B + 2, 128
    pos = jnp.asarray(rng.uniform(395, 405, (b, p, 2)).astype(np.float32))
    alive = jnp.asarray(rng.uniform(size=(b, p)) < 0.8)
    u = jnp.asarray(rng.uniform(0, 2 * np.pi, (b, p)).astype(np.float32))
    cfg = SimConfig.for_isotope(26, 30, pad_to=128, fast_math=False)
    out = overlap_step_pallas(pos, alive, u, cfg, interpret=True)
    for i in range(b):
        ref = _overlap_oracle(pos[i], alive[i], u[i], cfg)
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


# --- fused stats-only decay kernel (kernels/decay_pallas.py) ----------------


def _assert_float_fields_close(ref, ker, tol=1e-5):
    """Relative comparison where inf == inf counts as equal (stable
    half-lives); an inf-vs-finite mismatch still fails (rel = inf)."""
    for f in ("half_life", "last_decay_time", "chain_time"):
        a = np.asarray(getattr(ref, f))
        c = np.asarray(getattr(ker, f))
        both_inf = np.isinf(a) & np.isinf(c)
        with np.errstate(invalid="ignore"):  # inf - inf, zeroed below
            rel = np.abs(a - c) / np.maximum(np.abs(a), 1e-30)
        rel[both_inf] = 0.0
        assert float(rel.max()) < tol, f


def test_decay_stats_kernel_matches_jnp():
    """The fused decay kernel walks the exact trajectories of the vmapped
    stats-only jnp path: integer fields bitwise, float records to
    transcendental ULP. Pb-214 at a hot time scale so both chain stages
    (beta -> beta) fire across the ensemble."""
    from pyqmd_tpu.core.decay import maybe_decay
    from pyqmd_tpu.core.dynamics import FrameDynamics
    from pyqmd_tpu.core.init import ensemble_init
    from pyqmd_tpu.kernels.decay_pallas import (
        decay_stats_substep_t,
        transpose_state_for_decay,
        untranspose_decay_fields,
    )

    cfg = SimConfig.for_isotope(82, 132, pad_to=8)
    b = 64
    states = ensemble_init(cfg, b, seed=0)
    ts = 3e5
    dyn = FrameDynamics(
        time_scale=jnp.float32(ts),
        substeps=jnp.float32(6.0),
        physics_dt=jnp.float32(cfg.effective_dt()),
        step_time=jnp.float32(ts / 60 / 6),
        raw_physics_dt=jnp.float32(cfg.physics_dt),
    )
    key = jax.random.PRNGKey(3)
    ref = ker = states
    for s in range(25):
        keys = jax.random.split(jax.random.fold_in(key, s), b)
        ref = jax.vmap(
            lambda st, k: maybe_decay(
                st, cfg, k, dyn, row_tables=True, stats_only=True
            )[0]
        )(ref, keys)
        ref = ref.replace(time_passed=ref.time_passed + dyn.step_time)
        fields = transpose_state_for_decay(ker)
        fields = decay_stats_substep_t(fields, cfg, keys, dyn, interpret=True)
        ker = untranspose_decay_fields(ker, fields)
        ker = ker.replace(time_passed=ker.time_passed + dyn.step_time)
    assert int(np.asarray(ref.decay_counts).sum()) > 30  # non-vacuous
    for f in ("z", "n", "chain_cursor", "decay_counts", "alive", "ptype",
              "chain_z0", "chain_n0", "chain_dtype", "chain_z1", "chain_n1"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(ker, f)), err_msg=f
        )
    _assert_float_fields_close(ref, ker)


def test_decay_frame_kernel_backend_matches_jnp_backend(monkeypatch):
    """The WHOLE decay frame with decay_backend='pallas' (kernel forced
    into interpret mode for CPU) walks the same isotope trajectories as
    the jnp-backend frame — the frame-level twin of the substep-level
    equivalence above (transpose/pad/untranspose plumbing included)."""
    import dataclasses
    import functools

    from pyqmd_tpu.core.init import ensemble_init
    from pyqmd_tpu.core.step import decay_ensemble_step
    from pyqmd_tpu.kernels import decay_pallas as dp

    orig = dp.decay_stats_substep_t
    monkeypatch.setattr(
        dp, "decay_stats_substep_t", functools.partial(orig, interpret=True)
    )
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    assert cfg.decay_backend == "auto"  # auto resolves to jnp (measured)
    cfg_k = dataclasses.replace(cfg, decay_backend="pallas")
    states = ensemble_init(cfg, 64, seed=0)
    # C-14 at ~1000 years/frame: decays actually happen in 3 frames.
    ts = 3.15576e10
    ref, mr = jax.jit(
        lambda s: decay_ensemble_step(s, cfg, ts, 1.0 / 60.0, 3)
    )(states)
    ker, mk = jax.jit(
        lambda s: decay_ensemble_step(s, cfg_k, ts, 1.0 / 60.0, 3)
    )(states)
    assert int(np.asarray(mr["total_decay_counts"]).sum()) > 0
    for f in ("z", "n", "decay_counts", "chain_cursor", "chain_z0",
              "chain_n0", "chain_dtype", "chain_z1", "chain_n1", "alive",
              "ptype", "rng"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(ker, f)),
            err_msg=f,
        )
    _assert_float_fields_close(ref, ker)


def test_packing_and_tile_rows_math():
    """The capacity→(padded, group) map and the tile-height policy."""
    from pyqmd_tpu.kernels.forces_pallas import (
        TILE_B_CAP, TILE_B_CAP_PACKED, _packing, _tile_rows,
    )

    assert _packing(1) == (1, 128)
    assert _packing(2) == (2, 64)
    assert _packing(8) == (8, 16)
    assert _packing(6) == (8, 16)   # pad up to next divisor of 128
    assert _packing(16) == (16, 8)
    assert _packing(65) == (128, 1)
    assert _packing(128) == (128, 1)
    assert _packing(200) == (256, 1)  # pad up to next lane multiple
    assert _packing(256) == (256, 1)

    assert _tile_rows(1) == 8          # never below the sublane tile
    assert _tile_rows(9) == 16
    assert _tile_rows(10240) == TILE_B_CAP
    assert _tile_rows(10240, TILE_B_CAP_PACKED) == TILE_B_CAP_PACKED
    # padding never exceeds 2x the rows above the minimum tile
    for rows in (1, 3, 8, 11, 31, 100, 640):
        t = _tile_rows(rows)
        assert t >= 8 and (rows <= 8 or t <= 2 * rows)


def test_device_mode_caps():
    """Mode selection drives the live tile caps (r5: adaptive caps)."""
    from pyqmd_tpu.kernels import device_mode as dm

    try:
        assert dm.set_device_mode("overlapped") == (128, 128)
        assert dm.current_caps() == (128, 128)
        assert dm.set_device_mode("serialized") == dm.CONSERVATIVE_CAPS
        with pytest.raises(ValueError):
            dm.set_device_mode("bogus")
        # Off-TPU the probe declines and keeps the conservative caps.
        assert dm.probe_device_mode(force=True) == "unknown"
        assert dm.current_caps() == dm.CONSERVATIVE_CAPS
    finally:
        dm.set_device_mode("unknown")  # leave the suite in the default state


def test_tile_cap_override_equivalence():
    """The probe's explicit tile_cap produces the same numbers as the
    default cap (it only changes the grid shape)."""
    from pyqmd_tpu.core.init import ensemble_init
    from pyqmd_tpu.kernels.forces_pallas import _force_step_batched

    cfg = SimConfig.for_isotope(2, 2, pad_to=8, force_backend="pallas")
    states = ensemble_init(cfg, 64, seed=3)
    dt = cfg.effective_dt()
    args = (states.pos, states.vel, states.ptype, states.alive)
    p0, v0 = _force_step_batched(*args, dt, cfg, interpret=True)
    p1, v1 = _force_step_batched(*args, dt, cfg, interpret=True, tile_cap=8)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
