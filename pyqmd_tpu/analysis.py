"""Ensemble analysis: survival curves, decay statistics, half-life fits.

The reference can only watch one nucleus decay at a time
(/root/reference/nuclear_sim.py:48); the population-statistics workflow —
N independent nuclei, survival fraction vs exp(-lambda t), half-life
estimation — is the TPU build's headline capability (BASELINE north star:
C-14 ensemble half-life within 1% of the tabulated value).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.init import ensemble_init
from pyqmd_tpu.core.step import make_decay_frame_fn, make_frame_fn
from pyqmd_tpu.data.tables import half_life_host


# Jitted survivor count — one program dispatch and one scalar readback per
# frame instead of three eager op dispatches (z/n ride as traced scalars,
# so isotope changes don't recompile).
_count_isotope = jax.jit(lambda mz, mn, z, n: ((mz == z) & (mn == n)).sum())


@dataclasses.dataclass
class SurvivalResult:
    """Survival-curve measurement for one isotope ensemble."""

    z: int
    n: int
    batch: int
    times: np.ndarray  # (F+1,) sim seconds
    survival: np.ndarray  # (F+1,) fraction still the initial isotope
    decay_counts: np.ndarray  # (NUM_DECAY_TYPES,) totals at the end
    tabulated_half_life: float
    fitted_half_life: float

    @property
    def rel_error(self) -> float:
        if not math.isfinite(self.tabulated_half_life):
            return float("nan")
        return abs(self.fitted_half_life - self.tabulated_half_life) / (
            self.tabulated_half_life
        )

    def activity(self) -> np.ndarray:
        """Decays per second at each time point (A = -dN/dt), the quantity
        a detector measures; A(t) = lambda*N(t) for a pure species."""
        return -np.gradient(self.survival * self.batch, self.times)

    def to_csv(self) -> str:
        lines = ["time_s,survival,activity_per_s"]
        act = self.activity()
        lines += [
            f"{t},{s},{a}" for t, s, a in zip(self.times, self.survival, act)
        ]
        return "\n".join(lines) + "\n"


def survival_curve(
    z: int,
    n: int,
    batch: int = 4096,
    frames: int = 20,
    half_lives: float = 2.0,
    substeps: int = 10,
    seed: int = 0,
    pad_to: int = 8,
    decay_only: bool = True,
    max_chain_log: int = 8,
) -> SurvivalResult:
    """Run a `batch`-nucleus ensemble of isotope (z, n) for `half_lives`
    tabulated half-lives and record the survival curve.

    The MLE half-life fit uses the endpoint survivor count:
    ``T = ln2 * t_end / -ln(S)``.

    ``decay_only=True`` (default) skips forces/ejecta/overlap — the
    isotope trajectories are bitwise identical either way (see
    :func:`pyqmd_tpu.core.step.decay_ensemble_step`), orders of magnitude
    cheaper for heavy isotopes; pass False to pay for full dynamics.

    ``max_chain_log`` sizes the per-member chain-log ring. Statistics
    workflows never read it, but it IS per-substep HBM traffic (measured
    1.4x at a 2M ensemble going 64 -> 8); raise it if you also want deep
    per-member event logs out of the run.
    """
    hl = half_life_host(z, n)
    if not math.isfinite(hl):
        raise ValueError(f"isotope ({z},{n}) is stable; no half-life to measure")
    cfg = SimConfig.for_isotope(z, n, pad_to=pad_to, max_chain_log=max_chain_log)
    states = ensemble_init(cfg, batch, seed=seed)
    fn = (
        make_decay_frame_fn(cfg, substeps)
        if decay_only
        else make_frame_fn(cfg, substeps, batched=True)
    )
    sim_dt = half_lives * hl / frames

    times = [0.0]
    survival = [1.0]
    m = None
    for f in range(frames):
        states, m = fn(states, sim_dt, 1.0)
        # Jitted on-device reduction, ONE scalar readback per frame.
        alive = int(_count_isotope(m["z"], m["n"], z, n))
        times.append((f + 1) * sim_dt)
        survival.append(alive / batch)

    s_end = max(survival[-1], 1e-12)
    fitted = math.log(2) * times[-1] / -math.log(s_end)
    return SurvivalResult(
        z=z,
        n=n,
        batch=batch,
        times=np.asarray(times),
        survival=np.asarray(survival),
        decay_counts=np.asarray(m["total_decay_counts"]),
        tabulated_half_life=hl,
        fitted_half_life=fitted,
    )


def chain_populations(
    z: int,
    n: int,
    batch: int = 4096,
    frames: int = 30,
    half_lives: float = 3.0,
    substeps: int = 10,
    seed: int = 0,
    pad_to: int = 8,
    decay_only: bool = True,
    max_chain_log: int = 8,
) -> dict:
    """Track the isotope populations of a decaying ensemble over time.

    Runs a `batch`-nucleus ensemble of (z, n) and, each frame, histograms
    the per-nucleus (Z, N) — the population view of the reference's
    decay-chain panel (rendering.py:248-380), resolved statistically: e.g.
    a U-238 ensemble shows daughters flowing down the chain toward secular
    equilibrium. Returns ``{"times": [...], "populations": {"Z:N": [...]}}``
    whose keys are the reachable chain nodes (:func:`decay_chain_graph`),
    plus an ``"other"`` row if any member leaves the predicted graph.
    ``decay_only`` as in :func:`survival_curve`.

    The histogram is computed ON DEVICE against the chain-node list, so
    host readback is O(nodes) scalars per frame, not O(batch) — at a
    2M-nucleus ensemble the per-frame readback drops from ~16 MB of
    (Z, N) arrays to a few hundred bytes.
    """
    import jax.numpy as jnp

    hl = half_life_host(z, n)
    if not math.isfinite(hl):
        raise ValueError(f"isotope ({z},{n}) is stable")
    cfg = SimConfig.for_isotope(z, n, pad_to=pad_to, max_chain_log=max_chain_log)
    states = ensemble_init(cfg, batch, seed=seed)
    fn = (
        make_decay_frame_fn(cfg, substeps)
        if decay_only
        else make_frame_fn(cfg, substeps, batched=True)
    )
    sim_dt = half_lives * hl / frames

    nodes, _ = decay_chain_graph(z, n)
    node_z = jnp.asarray([zz for zz, _ in nodes], jnp.int32)
    node_n = jnp.asarray([nn for _, nn in nodes], jnp.int32)

    @jax.jit
    def hist(zs, ns):
        eq = (zs[:, None] == node_z[None, :]) & (ns[:, None] == node_n[None, :])
        counts = jnp.sum(eq, axis=0)
        return counts, zs.shape[0] - jnp.sum(counts)

    keys = [f"{zz}:{nn}" for zz, nn in nodes]
    times = [0.0]
    pops: dict[str, list[int]] = {k: [0] for k in keys}
    pops[f"{z}:{n}"][0] = batch
    other: list[int] = [0]
    for f in range(frames):
        states, m = fn(states, sim_dt, 1.0)
        # ONE combined host transfer per frame (each readback is a ~30 ms
        # RPC through the axon tunnel).
        counts, extra = jax.device_get(hist(m["z"], m["n"]))
        times.append((f + 1) * sim_dt)
        for k, c in zip(keys, counts):
            pops[k].append(int(c))
        other.append(int(extra))
    if any(other):
        pops["other"] = other
    return {"times": times, "populations": pops}


def chain_populations_csv(result: dict) -> str:
    """CSV form of a :func:`chain_populations` result (one column per
    isotope, rows = time points). Also accepts a
    :func:`bateman_populations` result — the dicts share a shape, so the
    measured and theoretical curves export identically."""
    keys = sorted(result["populations"])
    lines = ["time_s," + ",".join(keys)]
    for t_idx, t in enumerate(result["times"]):
        row = [str(t)] + [str(result["populations"][k][t_idx]) for k in keys]
        lines.append(",".join(row))
    return "\n".join(lines) + "\n"


def decay_chain_graph(
    z: int, n: int, max_nodes: int = 128
) -> tuple[list[tuple[int, int]], np.ndarray]:
    """Reachable-isotope decay DAG rooted at (z, n).

    Returns ``(nodes, rates)``: the isotopes reachable through the chain
    database (tabulated chains + the N/Z-ratio predictor for untabulated
    isotopes, decay_chains.py:126-201) in BFS order, and the (K, K) rate
    matrix A of the linear decay ODE dN/dt = A·N — A[j][j] = -λ_j and
    A[child][parent] = λ_parent · branch_probability. Stable nuclides
    (infinite half-life or a NONE mode) have λ = 0. Branch probabilities
    are renormalized to sum to 1 over real decay modes (the predictor
    reports a lone branch as 0.9, mirroring the reference).

    Accuracy note (ADVICE r3): for isotopes NOT in the half-life DB the
    rate uses ``half_life_host``'s deterministic log-midpoint (u = 0.5) of
    the estimator bucket, but the engine samples each nucleus's half-life
    log-uniformly from that bucket — so theory curves built from this
    matrix are exact on tabulated chain segments and only approximate on
    predictor-estimated nodes (rare-branch sub-chains, ~2e-4 populations
    in the natural series): E[exp(-λt)] under the sampled distribution
    differs from exp(-λ_mid·t).
    """
    from pyqmd_tpu.data.chains import decay_branches
    from pyqmd_tpu.state import DECAY_NONE

    nodes: list[tuple[int, int]] = [(z, n)]
    index = {(z, n): 0}
    edges: list[tuple[int, int, float]] = []  # (parent_idx, child_idx, prob)
    lam: list[float] = []
    i = 0
    while i < len(nodes):
        zz, nn = nodes[i]
        hl = half_life_host(zz, nn)
        branches = [
            b for b in decay_branches(zz, nn) if b[2] != DECAY_NONE
        ]
        if not math.isfinite(hl) or hl <= 0 or not branches:
            lam.append(0.0)
            i += 1
            continue
        lam.append(math.log(2) / hl)
        total = sum(b[3] for b in branches)
        for bz, bn, _mode, prob in branches:
            key = (bz, bn)
            if key not in index:
                if len(nodes) >= max_nodes:
                    raise ValueError(
                        f"decay graph of ({z},{n}) exceeds {max_nodes} nodes"
                    )
                index[key] = len(nodes)
                nodes.append(key)
            edges.append((i, index[key], prob / total))
        i += 1
    k = len(nodes)
    a = np.zeros((k, k), np.float64)
    for j in range(k):
        a[j, j] = -lam[j]
    for p, c, prob in edges:
        a[c, p] += lam[p] * prob
    return nodes, a


def _expm_taylor(m: np.ndarray) -> np.ndarray:
    """Matrix exponential by scaling-and-squaring + Taylor — the no-scipy
    fallback for :func:`bateman_populations`. Unlike plain
    eigendecomposition it stays finite for *defective* rate matrices
    (e.g. two chained isotopes that happen to share a decay constant)."""
    norm = float(np.linalg.norm(m, 1))
    k = max(0, int(np.ceil(np.log2(norm)))) + 1 if norm > 1e-300 else 0
    a = m / (2.0 ** k)
    out = np.eye(m.shape[0])
    term = np.eye(m.shape[0])
    for i in range(1, 40):
        term = term @ a / i
        out = out + term
        if np.abs(term).max() < 1e-18:
            break
    for _ in range(k):
        out = out @ out
    return out


def bateman_populations(
    z: int, n: int, times: np.ndarray, max_nodes: int = 128
) -> dict:
    """Analytical expected populations of every isotope in the decay chain
    of (z, n) at the given times — the theory curve for
    :func:`chain_populations` (same ``{"times", "populations"}`` shape, but
    population *fractions* of the initial ensemble, not member counts).

    Solves the Bateman equations dN/dt = A·N (A from
    :func:`decay_chain_graph`) by matrix exponential, which handles the
    chain DB's branch points (e.g. Po-218, Bi-214) and arbitrary-length
    series without the classical formula's catastrophic cancellation for
    near-equal decay constants. The reference has no analytical
    machinery at all; this is the validation companion the statistical
    workflow needs.

    Exact only on tabulated chain segments: predictor-estimated nodes use
    the estimator bucket's log-midpoint rate while the engine samples
    log-uniformly per nucleus (see :func:`decay_chain_graph`).
    """
    try:
        from scipy.linalg import expm
    except ImportError:  # pragma: no cover - scipy is in the image
        expm = _expm_taylor

    nodes, a = decay_chain_graph(z, n, max_nodes=max_nodes)
    times = np.asarray(times, np.float64)
    n0 = np.zeros(len(nodes), np.float64)
    n0[0] = 1.0
    pops = np.empty((times.size, len(nodes)), np.float64)
    for ti, t in enumerate(times.reshape(-1)):
        pops[ti] = np.real(expm(a * float(t)) @ n0)
    pops = np.clip(pops, 0.0, 1.0)
    return {
        "times": times,
        "populations": {
            f"{zz}:{nn}": pops[:, j] for j, (zz, nn) in enumerate(nodes)
        },
    }


def bateman_activity(z: int, n: int, times: np.ndarray, max_nodes: int = 128) -> dict:
    """Analytical activity curves A_i(t) = λ_i·N_i(t) (decays per second
    per initial nucleus) for every isotope in the chain of (z, n) — the
    theory companion to :func:`SurvivalResult.activity`, resolved per
    species instead of for the parent alone. Same ``{"times",
    "populations"}`` shape as :func:`bateman_populations` (so
    :func:`chain_populations_csv` exports it), with activities in the
    value arrays."""
    nodes, a = decay_chain_graph(z, n, max_nodes=max_nodes)
    lam = {f"{zz}:{nn}": -a[j, j] for j, (zz, nn) in enumerate(nodes)}
    pops = bateman_populations(z, n, times, max_nodes=max_nodes)
    return {
        "times": pops["times"],
        "populations": {
            k: lam[k] * np.asarray(v) for k, v in pops["populations"].items()
        },
    }


def decay_rate_summary(result: SurvivalResult) -> dict:
    """Compact JSON-able summary of a survival run."""
    return {
        "isotope": f"{result.z}:{result.n}",
        "batch": result.batch,
        "tabulated_half_life_s": result.tabulated_half_life,
        "fitted_half_life_s": result.fitted_half_life,
        "rel_error": result.rel_error,
        "final_survival": float(result.survival[-1]),
        "decay_counts": result.decay_counts.tolist(),
    }
