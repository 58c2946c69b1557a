"""Shell-initializer invariants (SURVEY §4 tier 1).

Counts, radius bound, placement order, determinism — the invariants of
/root/reference/particles.py:62-124 under the vectorized rebuild.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.init import ensemble_init, init_state, placement_order
from pyqmd_tpu.state import NEUTRON, PROTON


@pytest.mark.parametrize("z,n", [(1, 0), (2, 2), (6, 8), (26, 33), (92, 146)])
def test_placement_order_counts(z, n):
    shell_idx, is_proton = placement_order(z, n)
    assert len(shell_idx) == z + n
    assert int(is_proton.sum()) == z
    assert int((~is_proton).sum()) == n
    assert shell_idx.min() >= 0 and shell_idx.max() <= 6
    # Shells fill outward: the pair phase advances monotonically and every
    # remainder lands on the single (clamped) shell where pairing stopped,
    # so the whole sequence is non-decreasing for EVERY (z, n).
    assert np.all(np.diff(shell_idx) >= 0)


def test_placement_order_pairs_alternate():
    shell_idx, is_proton = placement_order(8, 8)
    # O-16: pure pair phase, strict p/n alternation.
    assert list(is_proton) == [True, False] * 8


@pytest.mark.parametrize("z,n", [(2, 2), (6, 8), (92, 146)])
def test_init_state_invariants(z, n):
    cfg = SimConfig.for_isotope(z, n, pad_to=8)
    st = init_state(cfg, seed=3)
    a = z + n
    alive = np.asarray(st.alive)
    ptype = np.asarray(st.ptype)
    assert int(alive.sum()) == a
    assert int(((ptype == PROTON) & alive).sum()) == z
    assert int(((ptype == NEUTRON) & alive).sum()) == n
    # All placements inside the outermost shell radius (initial_radius * 1.0).
    pos = np.asarray(st.pos)[alive]
    r = np.linalg.norm(pos - np.array([cfg.origin_x, cfg.origin_y]), axis=-1)
    r_max = 1.2 * a ** (1 / 3) * 0.7
    assert r.max() <= r_max + 1e-4
    assert np.all(np.isfinite(pos))
    # Identity and data wiring.
    assert int(st.z) == z and int(st.n) == n
    assert float(st.half_life) > 0
    assert int(st.chain_cursor) == 1  # initial chain entry seeded
    assert int(st.chain_z0[0]) == z and int(st.chain_n1[0]) == n


def test_init_deterministic_per_seed():
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    a = init_state(cfg, seed=7)
    b = init_state(cfg, seed=7)
    c = init_state(cfg, seed=8)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert not np.array_equal(np.asarray(a.pos), np.asarray(c.pos))


def test_ensemble_init_batch():
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    st = ensemble_init(cfg, batch=16, seed=0)
    assert st.pos.shape == (16, cfg.max_particles, 2)
    assert np.asarray(st.alive_count()).tolist() == [4] * 16
    # Nuclei differ across the batch (independent keys).
    p = np.asarray(st.pos)
    assert not np.array_equal(p[0], p[1])


def test_init_rejects_overflow():
    with pytest.raises(ValueError):
        init_state(SimConfig(z=92, n=146, max_particles=64))


def test_ensemble_init_pool_method():
    """Pool init (VERDICT r2 weak #3): same invariants as exact init, with
    per-member geometry varied by rotation and independent RNG streams."""
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    st = ensemble_init(cfg, batch=64, seed=0, method="pool", pool=8)
    alive = np.asarray(st.alive)
    ptype = np.asarray(st.ptype)
    assert alive.sum(-1).tolist() == [14] * 64
    assert (((ptype == PROTON) & alive).sum(-1) == 6).all()
    assert (((ptype == NEUTRON) & alive).sum(-1) == 8).all()
    pos = np.asarray(st.pos)
    origin = np.array([cfg.origin_x, cfg.origin_y])
    r = np.linalg.norm(pos - origin, axis=-1)
    r_max = 1.2 * 14 ** (1 / 3) * 0.7
    assert r[alive].max() <= r_max + 1e-4
    # Members differ (rotations + pool sampling).
    assert not np.array_equal(pos[0], pos[1])
    # Rotation preserves radii: each member's radius multiset matches one of
    # the 8 pool geometries'.
    pool_st = ensemble_init(cfg, batch=8, seed=1, method="exact")
    pool_r = np.sort(
        np.linalg.norm(np.asarray(pool_st.pos) - origin, axis=-1), axis=-1
    )
    member_r = np.sort(r, axis=-1)
    for b in range(8):
        diffs = np.abs(pool_r - member_r[b]).max(-1)
        assert diffs.min() < 1e-3, b
    # Independent RNG streams per member.
    rng = np.asarray(st.rng)
    assert len({tuple(k) for k in rng}) == 64
    # Deterministic per seed.
    st2 = ensemble_init(cfg, batch=64, seed=0, method="pool", pool=8)
    np.testing.assert_array_equal(pos, np.asarray(st2.pos))


def test_ensemble_init_auto_switches():
    cfg = SimConfig.for_isotope(2, 2, pad_to=8)
    small = ensemble_init(cfg, batch=4, seed=0)  # auto -> exact
    exact = ensemble_init(cfg, batch=4, seed=0, method="exact")
    np.testing.assert_array_equal(np.asarray(small.pos), np.asarray(exact.pos))
    big = ensemble_init(cfg, batch=300, seed=0)  # auto -> pool
    assert big.pos.shape[0] == 300
    assert np.asarray(big.alive_count()).tolist() == [4] * 300
