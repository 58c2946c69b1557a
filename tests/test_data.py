"""Nuclear-data tests: half-life DB, chains, predictor, estimator, tables.

SURVEY §4 tier 1: lookups must match the reference databases
(/root/reference/decay_chains.py:13-167) for every tabulated isotope, and
the dense device tables must agree with the source-of-truth dicts.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyqmd_tpu.data import (
    DECAY_CHAINS,
    HALF_LIVES,
    YEAR,
    decay_branches,
    predict_decay,
    stability_score,
    estimate_half_life,
)
from pyqmd_tpu.data import tables
from pyqmd_tpu.data.elements import element_name, element_symbol, parse_isotope
from pyqmd_tpu.state import (
    DECAY_ALPHA,
    DECAY_BETA_MINUS,
    DECAY_BETA_PLUS,
    DECAY_NONE,
    DECAY_PROTON_EMISSION,
)


def test_halflife_db_values():
    assert HALF_LIVES[(92, 146)] == pytest.approx(4.468e9 * YEAR)
    assert HALF_LIVES[(6, 8)] == pytest.approx(5730 * YEAR)
    assert math.isinf(HALF_LIVES[(82, 124)])  # Pb-206 stable
    assert HALF_LIVES[(84, 130)] == pytest.approx(164.3e-6)  # Po-214
    assert len(HALF_LIVES) >= 70


def test_dense_halflife_matches_db():
    for (z, n), hl in HALF_LIVES.items():
        got = float(tables.half_life(jnp.asarray(z), jnp.asarray(n), jnp.asarray(0.3)))
        if math.isinf(hl):
            assert math.isinf(got), (z, n)
        else:
            assert got == pytest.approx(hl, rel=1e-5), (z, n)


def test_dense_branch_matches_chains():
    for (z, n), branches in DECAY_CHAINS.items():
        # r=0 always selects branch 0.
        bz, bn, bt = tables.sample_branch(jnp.asarray(z), jnp.asarray(n), jnp.asarray(0.0))
        assert (int(bz), int(bn), int(bt)) == branches[0][:3], (z, n)
        if len(branches) > 1:
            # r just above p0 selects branch 1.
            r = branches[0][3] + 1e-6
            bz, bn, bt = tables.sample_branch(
                jnp.asarray(z), jnp.asarray(n), jnp.asarray(r)
            )
            assert (int(bz), int(bn), int(bt)) == branches[1][:3], (z, n)


def test_u238_chain_walk_to_pb206():
    """Follow dominant branches: U-238 must reach stable Pb-206 in 14 steps
    (decay_chains.py:128-143)."""
    z, n = 92, 146
    steps = 0
    while True:
        branches = decay_branches(z, n)
        bz, bn, bt, _ = branches[0]
        if bt == DECAY_NONE:
            break
        z, n = bz, bn
        steps += 1
        assert steps <= 14
        if (z, n) == (82, 124):
            break
    assert (z, n) == (82, 124)
    assert steps == 14


def test_predictor_modes():
    # Very heavy -> alpha (decay_chains.py:190-191).
    assert predict_decay(95, 150)[0][2] == DECAY_ALPHA
    # Neutron-rich light -> beta minus (:192-193).
    assert predict_decay(6, 10)[0][2] == DECAY_BETA_MINUS
    assert predict_decay(6, 10)[0][:2] == (7, 9)
    # Proton-rich heavy -> beta plus (:194-196).
    assert predict_decay(50, 50)[0][2] == DECAY_BETA_PLUS
    # Proton-rich light -> proton emission (:197-198).
    assert predict_decay(8, 4)[0][2] == DECAY_PROTON_EMISSION
    # In-band -> none (:199-201).
    assert predict_decay(10, 10)[0][2] == DECAY_NONE


def test_predictor_is_pure():
    before = dict(DECAY_CHAINS)
    predict_decay(99, 160)
    decay_branches(99, 160)
    assert DECAY_CHAINS == before  # no dict mutation, unlike the reference


def test_estimator_buckets_and_determinism():
    # Magic doubly-even nuclei score as stable.
    assert math.isinf(estimate_half_life(8, 8, 0.5))  # O-16
    # A clearly unstable combination returns a finite keyed estimate.
    hl1 = estimate_half_life(60, 120, 0.25)
    hl2 = estimate_half_life(60, 120, 0.25)
    assert hl1 == hl2 and math.isfinite(hl1) and hl1 > 0
    # Different draws move within the bucket, monotonic in u.
    assert estimate_half_life(60, 120, 0.9) > estimate_half_life(60, 120, 0.1)


def test_stability_score_features():
    # Note: for Z >= 20 the reference's stable_ratio = 1 + 0.015*Z^1.3
    # (decay_chains.py:282) blows up (e.g. 2.14 at Z=28), zeroing most
    # mid-Z scores — a faithful reference quirk; meaningful comparisons
    # live at Z < 20 where the band is N = Z.
    # Even-even (with magic Z=8) > even-odd > odd-odd near N = Z.
    assert stability_score(8, 8) > stability_score(8, 9) > stability_score(9, 9)
    # Magic-number bonus: Z=8 vs neighboring non-magic Z at similar N/Z.
    assert stability_score(8, 6) > stability_score(7, 6)
    # z>83 penalty halves the score (here: to zero, band deviation is huge).
    assert stability_score(84, 100) == 0.0


def test_dense_estimator_agrees_with_host():
    for z, n in [(60, 120), (45, 80), (84, 100), (20, 40)]:
        if (z, n) in HALF_LIVES:
            continue
        u = 0.37
        host = estimate_half_life(z, n, u)
        dev = float(tables.half_life(jnp.asarray(z), jnp.asarray(n), jnp.asarray(u)))
        if math.isinf(host):
            assert math.isinf(dev)
        else:
            assert dev == pytest.approx(host, rel=1e-4), (z, n)


def test_elements():
    assert element_symbol(92) == "U"
    assert element_name(82) == ("Lead", "Pb")
    assert element_symbol(119) == "E119"
    assert parse_isotope("U-238") == (92, 146)
    assert parse_isotope("C14") == (6, 8)
    assert parse_isotope("92:146") == (92, 146)
    with pytest.raises(ValueError):
        parse_isotope("Xx-999")


def test_lookups_work_under_jit():
    @jax.jit
    def f(z, n, u):
        return tables.half_life(z, n, u), tables.sample_branch(z, n, u)

    hl, (bz, bn, bt) = f(jnp.asarray(92), jnp.asarray(146), jnp.asarray(0.0))
    assert float(hl) == pytest.approx(4.468e9 * YEAR, rel=1e-5)
    assert (int(bz), int(bn), int(bt)) == (90, 144, DECAY_ALPHA)
    # Out-of-grid indices clamp instead of crashing.
    hl, _ = f(jnp.asarray(500), jnp.asarray(500), jnp.asarray(0.5))
    assert np.isfinite(float(hl)) or np.isinf(float(hl))


def test_all_element_symbols_unique():
    symbols = [element_symbol(z) for z in range(1, 119)]
    assert len(set(symbols)) == 118
    assert symbols[0] == "H" and symbols[-1] == "Og"
    # Every symbol round-trips through the isotope parser.
    for z in (1, 26, 92, 118):
        a = z + z  # arbitrary valid mass
        assert parse_isotope(f"{element_symbol(z)}-{a}") == (z, a - z)


def test_branch_sampling_statistics():
    """The rare branches at the U-238 series branch points sample at their
    tabulated probabilities (Po-218 and Bi-214: 0.9998/0.0002 split,
    decay_chains.py:135-139 / cumulative sampling at :221-229)."""
    import jax

    from pyqmd_tpu.data import tables
    from pyqmd_tpu.state import DECAY_ALPHA, DECAY_BETA_PLUS

    n_draws = 200_000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n_draws,))
    z2, n2, dt = jax.vmap(lambda r: tables.sample_branch(84, 134, r))(u)
    dt = np.asarray(dt)
    # Main branch alpha; rare branch is tabled as (83, 133, BETA_PLUS) —
    # the reference's own data (its comment says At-218 but the tuple is
    # Bi-218 via beta+; reproduced for parity, decay_chains.py:135-136).
    n_rare = int((dt == DECAY_BETA_PLUS).sum())
    assert int((dt == DECAY_ALPHA).sum()) == n_draws - n_rare
    # Expect 40 +- ~6.3 (Poisson); accept a generous 5-sigma band.
    assert 8 <= n_rare <= 80, n_rare
    rare_z = np.asarray(z2)[dt == DECAY_BETA_PLUS]
    rare_n = np.asarray(n2)[dt == DECAY_BETA_PLUS]
    assert (rare_z == 83).all() and (rare_n == 133).all()


def _walk_main_chain(z, n, max_steps=25):
    """Follow the highest-probability branch of tabulated chains until a
    stable isotope (host-side walk over the source-of-truth dicts)."""
    from pyqmd_tpu.data.chains import DECAY_CHAINS
    from pyqmd_tpu.data.halflives import HALF_LIVES

    path = [(z, n)]
    for _ in range(max_steps):
        if HALF_LIVES.get((z, n)) == float("inf"):
            return path
        branches = DECAY_CHAINS.get((z, n))
        assert branches is not None, f"chain gap at {(z, n)} along {path}"
        z, n, _, _ = max(branches, key=lambda b: b[3])
        path.append((z, n))
    raise AssertionError(f"no stable end within {max_steps} steps: {path}")


def test_u235_series_complete_to_pb207():
    """Beyond-reference: the actinium series runs fully tabulated from
    U-235 to stable Pb-207 (the reference stops at Ac-227)."""
    path = _walk_main_chain(92, 143)
    assert path[-1] == (82, 125)  # Pb-207
    assert (89, 138) in path and (84, 131) in path  # Ac-227, Po-215
    assert len(path) == 12
    # Every member has a tabulated (non-estimated) half-life.
    from pyqmd_tpu.data.halflives import HALF_LIVES

    assert all(p in HALF_LIVES for p in path)
    # The rare Bi-211 branch also reaches Pb-207, via Po-211.
    rare = _walk_main_chain(84, 127)
    assert rare[-1] == (82, 125)


def test_th232_series_complete_to_pb208():
    """Beyond-reference: the thorium series runs fully tabulated from
    Th-232 to stable Pb-208 (the reference stops at Ac-228)."""
    path = _walk_main_chain(90, 142)
    assert path[-1] == (82, 126)  # Pb-208
    assert (83, 129) in path  # Bi-212 branch point
    assert len(path) == 11
    from pyqmd_tpu.data.halflives import HALF_LIVES

    assert all(p in HALF_LIVES for p in path)
    # The alpha branch (Bi-212 -> Tl-208) also ends at Pb-208.
    rare = _walk_main_chain(81, 127)
    assert rare[-1] == (82, 126)


def test_natural_series_arithmetic_consistent():
    """Every beyond-reference chain entry conserves nucleons with its
    decay type (alpha: Z-2/N-2; beta-: Z+1/N-1) — the property the
    DB-wide decay-walk test checks dynamically, here pinned statically."""
    from pyqmd_tpu.data.chains import DECAY_CHAINS
    from pyqmd_tpu.state import DECAY_ALPHA, DECAY_BETA_MINUS

    # Reference-inherited quirky rows exempted in PARITY.md departure #8.
    quirks = {(84, 134), (83, 131), (43, 56)}
    for (z, n), branches in DECAY_CHAINS.items():
        if (z, n) in quirks:
            continue
        for z2, n2, dtype, _p in branches:
            if dtype == DECAY_ALPHA:
                assert (z2, n2) == (z - 2, n - 2), (z, n, branches)
            elif dtype == DECAY_BETA_MINUS:
                assert (z2, n2) == (z + 1, n - 1), (z, n, branches)


def test_row_tables_bitwise_match_flat():
    """The packed-row table form (batched-frame fast path) is bitwise
    identical to the flat-table form on every (Z, N) grid cell for both
    lookups and both branch outcomes."""
    import jax

    from pyqmd_tpu.data import tables

    zs, ns = np.meshgrid(
        np.arange(tables.Z_DIM), np.arange(tables.N_DIM), indexing="ij"
    )
    zs, ns = zs.reshape(-1), ns.reshape(-1)
    for u in (0.0, 0.3, 0.99995):
        a = np.asarray(jax.vmap(lambda z, n: tables.half_life(z, n, u))(zs, ns))
        b = np.asarray(
            jax.vmap(
                lambda z, n: tables.half_life_from_row(tables.lookup_row(z, n), u)
            )(zs, ns)
        )
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        r1 = jax.vmap(lambda z, n: tables.sample_branch(z, n, u))(zs, ns)
        r2 = jax.vmap(
            lambda z, n: tables.sample_branch_from_row(tables.lookup_row(z, n), u)
        )(zs, ns)
        for x, y in zip(r1, r2):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_np237_series_complete_to_tl205():
    """Beyond-reference: the neptunium (4n+1) series — the fourth natural
    decay series, extinct in nature and entirely absent from the
    reference — runs fully tabulated from Np-237 through the Bi-213
    branch point and the 2e19-year Bi-209 alpha decay to stable Tl-205."""
    path = _walk_main_chain(93, 144)
    assert path[-1] == (81, 124)  # Tl-205
    assert (83, 130) in path  # Bi-213 branch point
    assert (83, 126) in path  # Bi-209 (near-stable alpha emitter)
    assert (82, 127) in path  # Pb-209 — keymap isotope 8 now tabulated
    assert len(path) == 13
    from pyqmd_tpu.data.halflives import HALF_LIVES

    assert all(p in HALF_LIVES for p in path)
    # The rare Bi-213 alpha branch (-> Tl-209) also converges to Tl-205.
    rare = _walk_main_chain(81, 128)
    assert rare[-1] == (81, 124)
