"""Fused Pallas decay kernel for the statistics-only batched frame.

The stats-only decay pass (`core.decay.maybe_decay(..., stats_only=True)`)
is ~30 small XLA fusions per substep — Bernoulli check, branch select,
duration record, rank masks, alive/ptype adjustment, counters, chain-ring
writes — each a separate launch and a separate HBM pass over (B, ...)
arrays. At a 2M-nucleus C-14 ensemble that measures ~2.5-3x the minimal
HBM traffic (docs/PERFORMANCE.md). This kernel fuses the whole transition
into ONE program per batch tile:

  * nuclei ride SUBLANES (batch-major blocks), per-nucleus scalars are
    (T, 1) columns broadcast along lanes, the particle/ring axes are
    lanes — every update is elementwise on its natural block;
  * the substep's randomness (one uniform vector per nucleus) and the
    THREE nuclear-data row gathers (parent cell + both daughter-candidate
    cells of the packed (CELLS, 16) table, `data.tables._ROWS`) stay
    OUTSIDE in XLA — gathers don't lower well in Mosaic, and drawing
    outside keeps the PRNG stream identical to the jnp path;
  * the tiny decay-mode property tables (_REMOVE_P/_REMOVE_N, the
    mode→ejecta map) become arithmetic selects on the mode index.

Semantics mirror `core.decay._apply_decay_from_draws(stats_only=True)`
term for term (reference behavior: particles.py:126-203,
decay_chains.py:203-328, nuclear_sim.py:212-353); equivalence vs the jnp
path is pinned by tests/test_kernel.py (integer fields exact, float
fields to transcendental ULP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.decay import LN2_REF, _decay_draw_count
from pyqmd_tpu.core.dynamics import FrameDynamics
from pyqmd_tpu.data import tables
from pyqmd_tpu.state import (
    DECAY_ALPHA,
    DECAY_BETA_MINUS,
    DECAY_BETA_PLUS,
    DECAY_NEUTRON_EMISSION,
    DECAY_NONE,
    DECAY_PROTON_EMISSION,
    NEUTRON,
    PROTON,
    NucleusState,
)

# Nuclei per grid program. Tall tiles amortize per-grid-step overhead
# (the kernel is HBM-traffic-bound, not compute-bound); VMEM per program
# is ~(P + C + ~60) lanes x T x 4 B x 2 (double buffering).
TILE_T = 2048


def _lane_cumsum(x):
    """Inclusive prefix sum along lanes (axis=1): Hillis-Steele over
    log2(width) lane rolls — Mosaic has no cumsum lowering."""
    t, w = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
    out = x
    k = 1
    while k < w:
        shifted = pltpu.roll(out, k, 1)
        out = out + jnp.where(lane >= k, shifted, jnp.zeros_like(out))
        k *= 2
    return out


def _decay_stats_kernel(
    dt_ref,  # (1, 1) SMEM step_time
    u_ref,  # (T, 4) f32: bernoulli, branch, duration, half-life draws
    prow_ref, d0_ref, d1_ref,  # (T, 16) f32 packed nuclear-data rows
    z_ref, n_ref, cc_ref,  # (T, 1) i32
    hl_ref, tp_ref, ld_ref,  # (T, 1) f32
    counts_ref,  # (T, 8) i32
    alive_ref, ptype_ref,  # (T, P) i32
    cz0_ref, cn0_ref, cdt_ref, cz1_ref, cn1_ref,  # (T, C) i32
    ct_ref,  # (T, C) f32
    # outputs
    oz_ref, on_ref, occ_ref,  # (T, 1) i32
    ohl_ref, old_ref,  # (T, 1) f32
    ocounts_ref,  # (T, 8) i32
    oalive_ref, optype_ref,  # (T, P) i32
    ocz0_ref, ocn0_ref, ocdt_ref, ocz1_ref, ocn1_ref,  # (T, C) i32
    oct_ref,  # (T, C) f32
    *,
    cfg: SimConfig,
):
    step_time = dt_ref[0, 0]
    inf = jnp.float32(jnp.inf)

    hl = hl_ref[...]  # (T, 1)
    z = z_ref[...]
    n = n_ref[...]
    tp = tp_ref[...]
    ld = ld_ref[...]
    cc = cc_ref[...]
    u_bern = u_ref[:, 0:1]
    u_branch = u_ref[:, 1:2]
    u_dur = u_ref[:, 2:3]
    u_hl = u_ref[:, 3:4]

    # --- Bernoulli decay probability (particles.py:126-147).
    hl_pos = jnp.maximum(hl, 1e-30)
    big = 1.0 - jnp.exp2(-step_time / hl_pos)
    small = LN2_REF / hl_pos * step_time
    p = jnp.where(step_time > hl_pos * 0.01, big, small)
    p = jnp.clip(p, 0.0, 1.0)
    p = jnp.where(hl == inf, 0.0, p)
    did = u_bern < p

    # --- branch selection over the pre-gathered packed parent row
    # (tables.sample_branch_from_row).
    prow = prow_ref[...]
    pick1 = u_branch > prow[:, 5:6]
    new_z = jnp.where(pick1, prow[:, 9:10], prow[:, 6:7]).astype(jnp.int32)
    new_n = jnp.where(pick1, prow[:, 10:11], prow[:, 7:8]).astype(jnp.int32)
    dtype = jnp.where(pick1, prow[:, 11:12], prow[:, 8:9]).astype(jnp.int32)
    eff = did & (dtype != DECAY_NONE)
    effi = eff.astype(jnp.int32)
    efff = eff.astype(jnp.float32)

    # --- chain-record duration (nuclear_sim.py:239-255).
    measured = tp - ld
    hl_inf = hl == inf
    hl_safe = jnp.where(hl_inf, 1.0, hl)
    rand_factor = -jnp.log(jnp.maximum(u_dur, 1e-20))
    alt = jnp.where(measured > 0.0, measured, hl_safe)
    synth = jnp.minimum(hl_safe * rand_factor / LN2_REF, alt)
    synth = jnp.where(hl_inf, 0.0, synth)
    duration = jnp.where((measured < 0.001) | (hl < 0.001), synth, measured)

    # --- nucleon adjustment (particles.py:149-203): rank masks via a lane
    # cumsum over the particle axis.
    alive = alive_ref[...]
    ptype = ptype_ref[...]
    is_p = ptype == PROTON
    is_n = ptype == NEUTRON
    alive_b = alive != 0
    alive_p = alive_b & is_p
    alive_n = alive_b & is_n
    prank = _lane_cumsum(alive_p.astype(jnp.int32)) - 1
    nrank = _lane_cumsum(alive_n.astype(jnp.int32)) - 1
    # _REMOVE_P = [0,2,0,0,0,0,1,0], _REMOVE_N = [0,2,0,0,0,1,0,0] as
    # arithmetic selects on the mode index.
    rm_p = (
        jnp.where(dtype == DECAY_ALPHA, 2, 0)
        + jnp.where(dtype == DECAY_PROTON_EMISSION, 1, 0)
    )
    rm_n = (
        jnp.where(dtype == DECAY_ALPHA, 2, 0)
        + jnp.where(dtype == DECAY_NEUTRON_EMISSION, 1, 0)
    )
    kill = (alive_p & (prank < rm_p)) | (alive_n & (nrank < rm_n))
    new_alive = alive_b & ~(kill & eff)

    flip_to_p = eff & (dtype == DECAY_BETA_MINUS) & alive_n & (nrank == 0)
    flip_to_n = eff & (dtype == DECAY_BETA_PLUS) & alive_p & (prank == 0)
    new_ptype = jnp.where(flip_to_p, PROTON, ptype)
    new_ptype = jnp.where(flip_to_n, NEUTRON, new_ptype)

    # --- daughter half-life from the selected pre-gathered candidate row
    # (tables.half_life_from_row).
    drow = jnp.where(pick1, d1_ref[...], d0_ref[...])
    est = jnp.where(
        drow[:, 4:5] > 0.5,
        inf,
        jnp.exp2(jnp.log2(jnp.float32(10.0)) * (drow[:, 1:2] + u_hl * drow[:, 2:3]))
        * drow[:, 3:4],
    )
    tab = drow[:, 0:1]
    hl_new = jnp.where(tab != tab, est, tab)  # NaN row slot 0 = "estimate"
    hl2 = jnp.where(eff, hl_new, hl)

    z2 = jnp.where(eff, new_z, z)
    n2 = jnp.where(eff, new_n, n)

    # --- decay counters (fixing the reference's never-incremented
    # decay_counts, SURVEY C15).
    cidx = jax.lax.broadcasted_iota(jnp.int32, counts_ref.shape, 1)
    ocounts_ref[...] = counts_ref[...] + jnp.where(cidx == dtype, effi, 0)

    # --- chain-ring append as a masked lane write.
    c_cap = ct_ref.shape[1]
    slot = cc - (cc // c_cap) * c_cap
    lidx = jax.lax.broadcasted_iota(jnp.int32, ct_ref.shape, 1)
    smask = (lidx == slot) & eff

    ocz0_ref[...] = jnp.where(smask, z, cz0_ref[...])
    ocn0_ref[...] = jnp.where(smask, n, cn0_ref[...])
    ocdt_ref[...] = jnp.where(smask, dtype, cdt_ref[...])
    ocz1_ref[...] = jnp.where(smask, new_z, cz1_ref[...])
    ocn1_ref[...] = jnp.where(smask, new_n, cn1_ref[...])
    oct_ref[...] = jnp.where(smask, duration * efff, ct_ref[...])

    oz_ref[...] = z2
    on_ref[...] = n2
    occ_ref[...] = cc + effi
    ohl_ref[...] = hl2
    old_ref[...] = jnp.where(eff, tp, ld)
    oalive_ref[...] = new_alive.astype(jnp.int32)
    optype_ref[...] = new_ptype


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _decay_stats_batched(state: NucleusState, cfg: SimConfig, u, dyn_step_time,
                         interpret=False):
    """One stats-only decay substep over a batched state via the fused
    kernel. ``u`` is the (B, 1 + draw_count) uniform block (only the first
    4 columns are consumed — same stream as the jnp path)."""
    b = state.z.shape[0]
    pad = (-b) % TILE_T
    tiles = (b + pad) // TILE_T

    rows_tab = jnp.asarray(tables._ROWS)
    prow = jnp.take(rows_tab, tables._flat_index(state.z, state.n), axis=0)
    d0 = jnp.take(
        rows_tab,
        tables._flat_index(prow[:, 6].astype(jnp.int32), prow[:, 7].astype(jnp.int32)),
        axis=0,
    )
    d1 = jnp.take(
        rows_tab,
        tables._flat_index(prow[:, 9].astype(jnp.int32), prow[:, 10].astype(jnp.int32)),
        axis=0,
    )

    def col(a, dt_):
        return jnp.pad(a.astype(dt_)[:, None], ((0, pad), (0, 0)))

    def wide(a, dt_):
        return jnp.pad(a.astype(dt_), ((0, pad), (0, 0)))

    args = (
        jnp.asarray(dyn_step_time, jnp.float32).reshape(1, 1),
        wide(u[:, :4], jnp.float32),
        wide(prow, jnp.float32), wide(d0, jnp.float32), wide(d1, jnp.float32),
        col(state.z, jnp.int32), col(state.n, jnp.int32),
        col(state.chain_cursor, jnp.int32),
        col(state.half_life, jnp.float32), col(state.time_passed, jnp.float32),
        col(state.last_decay_time, jnp.float32),
        wide(state.decay_counts, jnp.int32),
        wide(state.alive, jnp.int32), wide(state.ptype, jnp.int32),
        wide(state.chain_z0, jnp.int32), wide(state.chain_n0, jnp.int32),
        wide(state.chain_dtype, jnp.int32),
        wide(state.chain_z1, jnp.int32), wide(state.chain_n1, jnp.int32),
        wide(state.chain_time, jnp.float32),
    )
    p_cap = state.alive.shape[1]
    c_cap = state.chain_time.shape[1]
    bb = b + pad

    def spec(w):
        return pl.BlockSpec((TILE_T, w), lambda i: (i, 0), memory_space=pltpu.VMEM)

    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        sspec, spec(4), spec(16), spec(16), spec(16),
        spec(1), spec(1), spec(1), spec(1), spec(1), spec(1),
        spec(8), spec(p_cap), spec(p_cap),
        spec(c_cap), spec(c_cap), spec(c_cap), spec(c_cap), spec(c_cap),
        spec(c_cap),
    ]
    out_specs = [
        spec(1), spec(1), spec(1), spec(1), spec(1),
        spec(8), spec(p_cap), spec(p_cap),
        spec(c_cap), spec(c_cap), spec(c_cap), spec(c_cap), spec(c_cap),
        spec(c_cap),
    ]
    i32 = jnp.int32
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((bb, 1), i32),  # z
        jax.ShapeDtypeStruct((bb, 1), i32),  # n
        jax.ShapeDtypeStruct((bb, 1), i32),  # chain_cursor
        jax.ShapeDtypeStruct((bb, 1), f32),  # half_life
        jax.ShapeDtypeStruct((bb, 1), f32),  # last_decay_time
        jax.ShapeDtypeStruct((bb, 8), i32),  # decay_counts
        jax.ShapeDtypeStruct((bb, p_cap), i32),  # alive
        jax.ShapeDtypeStruct((bb, p_cap), i32),  # ptype
        jax.ShapeDtypeStruct((bb, c_cap), i32),  # chain_z0
        jax.ShapeDtypeStruct((bb, c_cap), i32),  # chain_n0
        jax.ShapeDtypeStruct((bb, c_cap), i32),  # chain_dtype
        jax.ShapeDtypeStruct((bb, c_cap), i32),  # chain_z1
        jax.ShapeDtypeStruct((bb, c_cap), i32),  # chain_n1
        jax.ShapeDtypeStruct((bb, c_cap), f32),  # chain_time
    ]
    outs = pl.pallas_call(
        functools.partial(_decay_stats_kernel, cfg=cfg),
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=100 * TILE_T * (p_cap + c_cap + 16),
            bytes_accessed=2 * TILE_T * (2 * p_cap + 6 * c_cap + 80) * 4,
            transcendentals=4 * TILE_T,
        ),
    )(*args)
    (z2, n2, cc2, hl2, ld2, counts2, alive2, ptype2,
     cz0, cn0, cdt, cz1, cn1, ct) = outs

    clip = lambda a: a[:b]  # noqa: E731
    return state.replace(
        z=clip(z2)[:, 0],
        n=clip(n2)[:, 0],
        chain_cursor=clip(cc2)[:, 0],
        half_life=clip(hl2)[:, 0],
        last_decay_time=clip(ld2)[:, 0],
        decay_counts=clip(counts2),
        alive=clip(alive2) != 0,
        ptype=clip(ptype2),
        chain_z0=clip(cz0), chain_n0=clip(cn0), chain_dtype=clip(cdt),
        chain_z1=clip(cz1), chain_n1=clip(cn1), chain_time=clip(ct),
    )


def decay_stats_step_pallas(
    states: NucleusState, cfg: SimConfig, keys, dyn: FrameDynamics,
    interpret=False,
) -> NucleusState:
    """Batched stats-only decay substep — the fused-kernel twin of
    ``vmap(maybe_decay(..., row_tables=True, stats_only=True))``.

    ``keys`` is the (B,) per-nucleus substep key array; the uniform vector
    per nucleus is drawn exactly as the jnp path draws it, so decisions
    are identical up to transcendental ULP in the probability math.
    """
    ndraw = 1 + _decay_draw_count(cfg)
    u = jax.vmap(lambda k: jax.random.uniform(k, (ndraw,)))(keys)
    return _decay_stats_batched(states, cfg, u, dyn.step_time, interpret)
