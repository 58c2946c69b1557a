"""Statistical ensemble tests (SURVEY §4 tier 3, BASELINE acceptance bar).

A C-14 ensemble's survival curve must track exp(-lambda*t) and the fitted
half-life must match the tabulated 5730 years. Reference decay math:
/root/reference/particles.py:126-147; tabulated value
/root/reference/decay_chains.py:42.
"""

import math

import jax
import numpy as np
import pytest

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.init import ensemble_init
from pyqmd_tpu.core.step import make_frame_fn
from pyqmd_tpu.data.halflives import YEAR
from pyqmd_tpu.parallel import make_mesh, make_sharded_frame_fn, shard_ensemble

C14_HL = 5730 * YEAR


def _run_survival(batch, frames, sim_dt_per_frame, num_steps, seed=0):
    """Run a C-14 ensemble; returns (times, survival fractions)."""
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    states = ensemble_init(cfg, batch, seed=seed)
    # time_scale such that one frame advances sim_dt_per_frame sim-seconds
    # with frame_dt = 1.0 wall-seconds.
    fn = make_frame_fn(cfg, num_steps, batched=True)
    times, surv = [0.0], [1.0]
    for f in range(frames):
        states, m = fn(states, sim_dt_per_frame, 1.0)
        alive_c14 = np.asarray((m["z"] == 6) & (m["n"] == 8)).sum()
        times.append((f + 1) * sim_dt_per_frame)
        surv.append(alive_c14 / batch)
    return np.array(times), np.array(surv)


def test_c14_survival_matches_exponential():
    """Ensemble survival within statistical tolerance of exp(-lambda t) at
    every checkpoint, and the endpoint-MLE half-life within 5% of the
    tabulated 5730 years (2.5 sigma at this ensemble size)."""
    batch = 4096
    # Frame = 0.1 half-lives over 10 substeps -> per-substep p ~ 0.0069
    # (linear regime, negligible discretization bias).
    sim_dt = 0.1 * C14_HL
    times, surv = _run_survival(batch, frames=20, sim_dt_per_frame=sim_dt, num_steps=10)

    lam = math.log(2) / C14_HL
    expected = np.exp(-lam * times)
    # Pointwise: within ~3.5 sigma of the binomial std at each time.
    sigma = np.sqrt(np.maximum(expected * (1 - expected), 1e-9) / batch)
    assert np.all(np.abs(surv - expected) < 3.5 * sigma + 1e-9), (
        np.abs(surv - expected) / sigma
    )
    # Endpoint MLE: lambda_hat = -ln(S)/T at T = 2 half-lives.
    fit_lam = -math.log(surv[-1]) / times[-1]
    fit_hl = math.log(2) / fit_lam
    assert fit_hl == pytest.approx(C14_HL, rel=0.05)


def test_c14_survival_sharded_8dev(eight_devices):
    """Same statistical bar through the shard_map path on the 8-device CPU
    mesh — the multichip decay-statistics flow."""
    batch = 1024
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    mesh = make_mesh()
    states = shard_ensemble(ensemble_init(cfg, batch, seed=1), mesh)
    fn = make_sharded_frame_fn(cfg, 10, mesh)
    sim_dt = 0.05 * C14_HL
    lam = math.log(2) / C14_HL
    for f in range(20):
        states, m = fn(states, sim_dt, 1.0)
    t = 20 * sim_dt
    expected = math.exp(-lam * t)
    got = int(m["survivors"]) / batch
    sigma = math.sqrt(expected * (1 - expected) / batch)
    assert abs(got - expected) < 4 * sigma
    # Decay counters: every C-14 decay is a beta-minus.
    counts = np.asarray(m["total_decay_counts"])
    assert counts[2] == batch - int(m["survivors"])  # DECAY_BETA_MINUS
    assert counts.sum() == counts[2]


def test_ensemble_members_independent():
    """Different ensemble members decay at different times (independent
    per-nucleus keys), not in lockstep."""
    batch = 256
    sim_dt = 0.2 * C14_HL
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    states = ensemble_init(cfg, batch, seed=2)
    fn = make_frame_fn(cfg, 4, batched=True)
    states, m = fn(states, sim_dt, 1.0)
    decayed = np.asarray(m["z"] == 7)
    assert 0 < decayed.sum() < batch  # some decayed, some not


def test_mixed_isotope_ensemble():
    """A single batch holding different isotopes decays each by its own
    physics: C-14 members beta-decay on the C-14 clock while U-238 members
    stay put (half-life 780,000x longer)."""
    from pyqmd_tpu.core.init import mixed_ensemble_init

    cfg = SimConfig.for_isotope(92, 146, pad_to=8)
    states = mixed_ensemble_init(cfg, [(92, 146, 8), (6, 8, 64)], seed=0)
    assert states.pos.shape[0] == 72
    z0 = np.asarray(states.z)
    assert (z0[:8] == 92).all() and (z0[8:] == 6).all()
    assert int(states.alive_count().sum()) == 8 * 238 + 64 * 14

    fn = make_frame_fn(cfg, 10, batched=True)
    sim_dt = 2.0 * C14_HL  # two C-14 half-lives per frame
    states, m = fn(states, sim_dt, 1.0)
    z = np.asarray(m["z"])
    # U-238 members untouched (P(decay) ~ 2.6e-6 per member-frame).
    assert (z[:8] == 92).all()
    # Most C-14 members decayed to N-14 (expect ~75%).
    decayed = (z[8:] == 7).sum()
    assert decayed > 30


def test_mixed_ensemble_preserves_caller_config():
    """mixed_ensemble_init must size every species' state from the
    CALLER'S config — a custom max_ejecta/origin used to be silently
    replaced by for_isotope defaults, and the first frame traced with
    the parent cfg then failed on the ejecta-ring shape mismatch."""
    import dataclasses

    from pyqmd_tpu.core.init import mixed_ensemble_init

    base = SimConfig.for_isotope(92, 146, pad_to=8)
    cfg = dataclasses.replace(
        base, max_ejecta=base.max_ejecta * 2, origin_x=123.0, origin_y=45.0
    )
    states = mixed_ensemble_init(cfg, [(92, 146, 2), (6, 8, 3)], seed=0)
    assert states.ej_type.shape == (5, cfg.max_ejecta)
    com = np.asarray(states.center_of_mass())
    assert np.allclose(com[:, 0], 123.0, atol=2.0)
    assert np.allclose(com[:, 1], 45.0, atol=2.0)
    # And the frame traced with the caller's cfg runs.
    fn = make_frame_fn(cfg, 2, batched=True)
    states, _ = fn(states, 1.0, 1 / 60)
    # Oversized species still raise.
    small = SimConfig.for_isotope(6, 8, pad_to=8)
    with pytest.raises(ValueError):
        mixed_ensemble_init(small, [(92, 146, 1)], seed=0)


def test_u238_ensemble_reaches_pb206():
    """Population-level chain traversal: a U-238 ensemble run for ~20
    half-lives ends as stable Pb-206 (the 14-step chain walked
    statistically, intermediate short-lived isotopes flushed through)."""
    cfg = SimConfig.for_isotope(92, 146, pad_to=8)
    batch = 12
    states = ensemble_init(cfg, batch, seed=0)
    fn = make_frame_fn(cfg, 20, batched=True)
    u238_hl = 4.468e9 * YEAR
    sim_dt = 1.0 * u238_hl  # one U-238 half-life per frame
    for _ in range(25):
        states, m = fn(states, sim_dt, 1.0)
    z = np.asarray(m["z"])
    n = np.asarray(m["n"])
    done = (z == 82) & (n == 124)
    assert done.sum() >= batch - 1  # ~1e-7 chance a member survives 25 T
    # Nucleon bookkeeping for finished members: 82p + 124n alive.
    alive = np.asarray(states.alive_count())
    assert (alive[done] == 206).all()
    # Every finished member logged >= 14 chain entries (+1 initial).
    assert (np.asarray(m["chain_cursor"])[done] >= 15).all()
