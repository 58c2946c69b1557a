"""Batch-native ensemble_step must equal vmap(simulate_frame) bitwise
(same per-nucleus PRNG derivation, same physics ops per nucleus)."""

import jax
import numpy as np

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.init import ensemble_init
from pyqmd_tpu.core.step import ensemble_step, simulate_frame


def test_ensemble_step_matches_vmapped_simulate_frame():
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    states = ensemble_init(cfg, 16, seed=0)

    vs, vm = jax.jit(
        jax.vmap(lambda s: simulate_frame(s, cfg, 3.0e10, 1.0, 3))
    )(states)
    bs, bm = jax.jit(lambda s: ensemble_step(s, cfg, 3.0e10, 1.0, 3))(states)

    for name in ("pos", "vel", "alive", "ptype", "z", "n", "half_life",
                 "decay_counts", "ej_pos", "ej_alive", "rng", "chain_cursor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(vs, name)), np.asarray(getattr(bs, name)),
            err_msg=name,
        )
    np.testing.assert_array_equal(np.asarray(vm["alive"]), np.asarray(bm["alive"]))
    np.testing.assert_array_equal(
        np.asarray(vm["decay_counts"]), np.asarray(bm["decay_counts"])
    )


def test_chunked_overlap_matches_vmap():
    """lax.map-chunked overlap (the 64k OOM fix) matches plain vmap to ulp."""
    import jax
    from pyqmd_tpu.core.overlap import resolve_overlaps
    from pyqmd_tpu.core.step import _batched_overlap

    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    st = ensemble_init(cfg, 12, seed=0)
    keys = jax.random.split(jax.random.PRNGKey(1), 12)
    full = jax.vmap(lambda p, a, k: resolve_overlaps(p, a, k, cfg))(
        st.pos, st.alive, keys
    )
    chunked = _batched_overlap(st.pos, st.alive, keys, cfg, max_chunk=4)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), rtol=0, atol=1e-4
    )


def test_fused_run_matches_frame_loop():
    """make_run_fn (frames fused under one scan) equals the per-frame loop."""
    from pyqmd_tpu import Simulation

    a = Simulation(z=6, n=8, seed=3, pad_to=8)
    b = Simulation(z=6, n=8, seed=3, pad_to=8)
    a.set_time_scale(3e10)
    b.set_time_scale(3e10)
    a.run(10)
    b.run(10, fused=True)
    np.testing.assert_array_equal(np.asarray(a.state.pos), np.asarray(b.state.pos))
    np.testing.assert_array_equal(
        np.asarray(a.state.decay_counts), np.asarray(b.state.decay_counts)
    )
    assert a.decay_log == b.decay_log


def test_decay_only_frame_bitwise_isotope_trajectories():
    """decay_ensemble_step (forces/ejecta/overlap skipped) walks the exact
    same isotope trajectories as the full-physics ensemble frame: the PRNG
    split structure is shared and forces consume no randomness."""
    from pyqmd_tpu.core.step import make_decay_frame_fn, make_frame_fn

    cfg = SimConfig.for_isotope(82, 132, pad_to=8)  # Pb-214 two-stage chain
    full = ensemble_init(cfg, 48, seed=0)
    fast = ensemble_init(cfg, 48, seed=0)
    f_full = make_frame_fn(cfg, 6, batched=True)
    f_fast = make_decay_frame_fn(cfg, 6)
    for _ in range(5):
        full, mf = f_full(full, 400.0, 1.0)
        fast, md = f_fast(fast, 400.0, 1.0)
    assert int(np.asarray(mf["total_decay_counts"]).sum()) > 10  # events happened
    for k in ("z", "n", "half_life", "decay_counts", "chain_cursor",
              "time_passed"):
        np.testing.assert_array_equal(np.asarray(mf[k]), np.asarray(md[k]))
    for fld in ("chain_z0", "chain_n0", "chain_dtype", "chain_z1", "chain_n1",
                "chain_time", "rng"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full, fld)), np.asarray(getattr(fast, fld))
        )


def test_decay_only_counts_survive_beyond_uint16():
    """Per-nucleus decay counts are UNBOUNDED on self-looping chains
    (Tc-99m's γ branch re-enters (43,56) per the reference data), so the
    stats frame's narrowed scan carry must keep counts int32 — a uint16
    carry silently wrapped at 65535 on long statistics runs."""
    from pyqmd_tpu.core.step import make_decay_frame_fn

    cfg = SimConfig.for_isotope(2, 2, pad_to=8)  # He-4: no new decays
    states = ensemble_init(cfg, 8, seed=0)
    states = states.replace(
        decay_counts=states.decay_counts.at[:, :].set(70000)
    )
    fn = make_decay_frame_fn(cfg, 4)
    states, m = fn(states, 1.0e6, 1.0)
    assert (np.asarray(states.decay_counts) == 70000).all()
    assert (np.asarray(m["decay_counts"]) == 70000).all()
