"""Analysis module tests: survival curves and half-life fits."""

import math

import numpy as np
import pytest

from pyqmd_tpu.analysis import decay_rate_summary, survival_curve


def test_survival_curve_c14():
    res = survival_curve(6, 8, batch=1024, frames=10, half_lives=1.0, seed=0)
    assert res.times.shape == (11,)
    assert res.survival[0] == 1.0
    # Monotone non-increasing.
    assert np.all(np.diff(res.survival) <= 0)
    # One half-life: ~50% survive.
    assert abs(res.survival[-1] - 0.5) < 0.06
    assert res.rel_error < 0.15
    # All decays are beta-minus (C-14 -> N-14).
    assert res.decay_counts[2] == round((1 - res.survival[-1]) * 1024)
    s = decay_rate_summary(res)
    assert s["isotope"] == "6:8"
    csv = res.to_csv()
    assert csv.startswith("time_s,survival")
    assert len(csv.strip().splitlines()) == 12


def test_survival_rejects_stable():
    with pytest.raises(ValueError):
        survival_curve(2, 2)  # He-4


def test_survival_deterministic():
    a = survival_curve(6, 8, batch=256, frames=5, seed=3)
    b = survival_curve(6, 8, batch=256, frames=5, seed=3)
    np.testing.assert_array_equal(a.survival, b.survival)


def test_survival_all_survivors_reports_inf_not_crash():
    """Tc-99m's tabulated branches both re-enter (43,56) (reference data
    quirk, PARITY departure 8), so the survivor count never drops and the
    endpoint survival stays 1.0 — the MLE fit must report inf, not divide
    by -log(1.0) = -0.0."""
    import math

    res = survival_curve(43, 56, batch=32, frames=2)
    assert res.survival[-1] == 1.0
    assert math.isinf(res.fitted_half_life)


def test_survival_rejects_bad_frames_and_plumbs_overrides():
    with pytest.raises(ValueError):
        survival_curve(6, 8, batch=16, frames=0)
    # overrides reach the SimConfig (validated at construction): an
    # impossible capacity proves the CLI --set surface is not ignored.
    with pytest.raises(ValueError):
        survival_curve(6, 8, batch=16, frames=2, overrides={"max_particles": 4})


def test_chain_populations_flow():
    """A Rn-222 ensemble (3.8-day half-life, alpha chain) flows population
    into its daughters; totals conserved each frame."""
    from pyqmd_tpu.analysis import chain_populations

    out = chain_populations(86, 136, batch=256, frames=8, half_lives=2.0, seed=1)
    pops = out["populations"]
    assert pops["86:136"][0] == 256
    # Parent population decreased; Po-218 daughter appeared.
    assert pops["86:136"][-1] < 256
    assert "84:134" in pops and max(pops["84:134"]) > 0
    # Conservation: populations sum to the batch at every time point.
    n_t = len(out["times"])
    for t in range(n_t):
        assert sum(v[t] for v in pops.values()) == 256


def test_activity_curve():
    """Activity A(t) ~ lambda * N(t): the measured initial activity of a
    C-14 ensemble matches ln2/T * N0 within sampling tolerance."""
    res = survival_curve(6, 8, batch=4096, frames=10, half_lives=1.0, seed=0)
    act = res.activity()
    lam = math.log(2) / res.tabulated_half_life
    expected0 = lam * 4096
    assert act[0] == pytest.approx(expected0, rel=0.25)
    assert (act[1:-1] >= 0).all()  # monotone-decay population
    assert "activity_per_s" in res.to_csv().splitlines()[0]


def test_chain_populations_csv():
    from pyqmd_tpu.analysis import chain_populations, chain_populations_csv

    out = chain_populations(86, 136, batch=64, frames=4, half_lives=1.0, seed=0)
    csv = chain_populations_csv(out)
    lines = csv.strip().splitlines()
    assert lines[0].startswith("time_s,")
    assert len(lines) == len(out["times"]) + 1
    # Row sums conserve the batch.
    for row in lines[1:]:
        assert sum(int(v) for v in row.split(",")[1:]) == 64


def test_decay_chain_graph_u238():
    """Graph mirrors the engine's own tables: 81 reachable nodes (the 14
    main-series steps plus the rare-branch predictor ladders), and every
    column of the rate matrix sums to ~0 (decays conserve nuclei)."""
    from pyqmd_tpu.analysis import decay_chain_graph

    nodes, a = decay_chain_graph(92, 146)
    assert nodes[0] == (92, 146)
    assert (82, 124) in nodes  # Pb-206 reachable
    assert len(nodes) == 81
    np.testing.assert_allclose(a.sum(axis=0), 0.0, atol=1e-12)
    # Pb-206 is terminal: zero column.
    j = nodes.index((82, 124))
    assert np.all(a[:, j] == 0.0)


def test_bateman_matches_two_stage_closed_form():
    """Pb-214 -> Bi-214: the general matrix-exponential solution equals
    the classical two-species Bateman formula to float64 precision."""
    from pyqmd_tpu.analysis import bateman_populations

    l1, l2 = math.log(2) / 1608.0, math.log(2) / 1194.0
    t = np.linspace(0.0, 8000.0, 17)
    r = bateman_populations(82, 132, t)
    np.testing.assert_allclose(r["populations"]["82:132"], np.exp(-l1 * t), atol=1e-12)
    n2 = l1 / (l2 - l1) * (np.exp(-l1 * t) - np.exp(-l2 * t))
    np.testing.assert_allclose(r["populations"]["83:131"], n2, atol=1e-12)


def test_bateman_u238_conservation_and_halflife():
    from pyqmd_tpu.analysis import bateman_populations

    yr = 31557600.0
    t = np.array([0.0, 4.468e9 * yr, 2e10 * yr])
    r = bateman_populations(92, 146, t)
    total = sum(v for v in r["populations"].values())
    np.testing.assert_allclose(total, 1.0, atol=1e-9)
    # By definition of the half-life, exactly half the parents remain.
    assert abs(r["populations"]["92:146"][1] - 0.5) < 1e-6
    # Essentially everything that left U-238 has piled up in stable Pb-206
    # (intermediate half-lives are all << 4.5 Gyr).
    assert r["populations"]["82:124"][2] > 0.9
    assert r["populations"]["82:124"][0] == 0.0


def test_bateman_theory_matches_simulation():
    """An actual engine run (chain_populations over the decay-only frame)
    agrees with the analytical solver on every substantial population of
    the Pb-214 chain segment — the measured-vs-theory loop, in-suite."""
    from pyqmd_tpu.analysis import bateman_populations, chain_populations

    batch = 2048
    measured = chain_populations(
        82, 132, batch=batch, frames=8, half_lives=2.0, seed=0
    )
    theory = bateman_populations(82, 132, np.asarray(measured["times"]))
    sigma = 1.0 / math.sqrt(batch)  # binomial sd bound at p=0.5
    checked = 0
    for key, th in theory["populations"].items():
        ms = np.asarray(measured["populations"].get(key, [0] * len(th)))
        th = np.asarray(th)
        sel = th > 0.05  # where the expected population is substantial
        if not sel.any():
            continue
        checked += 1
        diff = np.abs(ms[sel] / batch - th[sel])
        assert diff.max() < 5 * sigma, (key, diff.max())
    assert checked >= 3  # parent + intermediate + sink all exercised
    # Spot value from the closed form at the Bi-214 peak.
    l1, l2 = math.log(2) / 1608.0, math.log(2) / 1194.0
    tpk = math.log(l2 / l1) / (l2 - l1)
    rp = bateman_populations(82, 132, np.array([tpk]))
    n2pk = l1 / (l2 - l1) * (math.exp(-l1 * tpk) - math.exp(-l2 * tpk))
    assert abs(rp["populations"]["83:131"][0] - n2pk) < 1e-12


def test_expm_taylor_fallback():
    """The no-scipy matrix exponential handles defective matrices (equal
    decay constants, where eigendecomposition blows up) and matches scipy
    where scipy applies."""
    from pyqmd_tpu.analysis import _expm_taylor

    lam = 0.3
    # Defective: parent -> child with the SAME lambda (Jordan block).
    a = np.array([[-lam, 0.0], [lam, -lam]])
    for t in (0.1, 1.0, 10.0):
        got = _expm_taylor(a * t)
        # Closed form for the Jordan case: N2 = lam*t*exp(-lam*t).
        assert np.isfinite(got).all()
        assert abs(got[0, 0] - math.exp(-lam * t)) < 1e-12
        assert abs(got[1, 0] - lam * t * math.exp(-lam * t)) < 1e-12
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.default_rng(0)
    m = rng.normal(size=(6, 6))
    np.testing.assert_allclose(
        _expm_taylor(m), scipy_linalg.expm(m), rtol=1e-9, atol=1e-9
    )


def test_bateman_activity():
    """Analytical activity: the single-species case equals the textbook
    A(t) = lambda*exp(-lambda*t); at secular equilibrium every fast
    daughter's activity approaches the parent's."""
    from pyqmd_tpu.analysis import bateman_activity

    # C-14: one-species chain.
    lam = math.log(2) / (5730 * 31557600.0)
    t = np.linspace(0.0, 3.0 / lam, 7)
    act = bateman_activity(6, 8, t)
    np.testing.assert_allclose(
        act["populations"]["6:8"], lam * np.exp(-lam * t), rtol=1e-9
    )
    # Stable daughter N-14 has zero activity.
    assert np.all(act["populations"]["7:7"] == 0.0)

    # Pb-214 -> Bi-214 transient equilibrium: the activity ratio follows
    # the exact closed form A2/A1 = l2/(l2-l1) * (1 - exp(-(l2-l1) t)).
    l1, l2 = math.log(2) / 1608.0, math.log(2) / 1194.0
    tt = np.array([6.0 * 1608.0])
    a2 = bateman_activity(82, 132, tt)
    ratio = float(a2["populations"]["83:131"][0] / a2["populations"]["82:132"][0])
    expect = l2 / (l2 - l1) * (1.0 - math.exp(-(l2 - l1) * tt[0]))
    assert abs(ratio - expect) < 1e-9 * expect


def test_bateman_exact_on_predictor_estimated_nodes():
    """Theory must match the engine on a chain of PREDICTOR-ESTIMATED
    isotopes, where each nucleus samples its half-life log-uniformly from
    the estimator bucket (decay_chains.py:309-328 semantics) — the case
    the old log-midpoint rate matrix got wrong (VERDICT r4 item 8). Root:
    O-12 (8,4), untabulated, minutes bucket spanning [6 s, 6e4 s]."""
    from pyqmd_tpu.analysis import bateman_populations, chain_populations

    batch = 4096
    measured = chain_populations(
        8, 4, batch=batch, frames=6, half_lives=2.0, substeps=4, seed=2
    )
    t = np.asarray(measured["times"])
    theory = bateman_populations(8, 4, t)
    sigma = 1.0 / math.sqrt(batch)
    checked = 0
    for key, th in theory["populations"].items():
        ms = np.asarray(measured["populations"].get(key, [0] * len(th)))
        th = np.asarray(th)
        sel = th > 0.05
        if not sel.any():
            continue
        checked += 1
        diff = np.abs(ms[sel] / batch - th[sel])
        assert diff.max() < 5 * sigma, (key, diff.max())
    assert checked >= 2  # root + at least one estimated descendant
    # The exact mixture expectation is decisively different from the
    # discarded log-midpoint model: at t = 3·T_mid the midpoint predicts
    # 2^-3 = 12.5% survival, the log-uniform mixture ~33% — the engine
    # data above can only match one of them.
    mid_model = 0.5 ** (t[-1] / 600.0)
    root = theory["populations"]["8:4"][-1]
    assert abs(root - mid_model) > 8 * sigma
