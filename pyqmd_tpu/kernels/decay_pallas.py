"""Fused Pallas decay kernel for the statistics-only batched frame.

The stats-only decay pass (`core.decay.maybe_decay(..., stats_only=True)`)
is ~30 small XLA fusions per substep — Bernoulli check, branch select,
duration record, rank masks, alive/ptype adjustment, counters, chain-ring
writes — each a separate launch and a separate HBM pass over (B, ...)
arrays. At a 2M-nucleus C-14 ensemble that measures ~2.5-3x the minimal
HBM traffic (docs/PERFORMANCE.md). This kernel fuses the whole transition
into ONE program per batch tile, in the TPU-natural orientation:

  * nuclei ride LANES (batch-minor), so per-nucleus scalars are (1, T)
    rows, the particle and chain-ring axes are SUBLANES — no VMEM lane
    padding anywhere (the nucleus-major formulation OOM'd scoped VMEM:
    every narrow (T, k) block pads its lane dim to 128);
  * the frame transposes the per-nucleus arrays once OUTSIDE the substep
    scan (`decay_ensemble_step`), so the kernel is the only consumer of
    the transposed carry — per-substep transpose traffic is zero;
  * the substep's randomness (one uniform vector per nucleus) and the
    THREE nuclear-data row gathers (parent cell + both daughter-candidate
    cells of the packed (CELLS, 16) table, `data.tables._ROWS`) stay
    OUTSIDE in XLA — gathers don't lower well in Mosaic, and drawing
    outside keeps the PRNG stream identical to the jnp path;
  * the tiny decay-mode property tables (_REMOVE_P/_REMOVE_N) become
    arithmetic selects on the mode index; the particle-rank cumsum is a
    sublane Hillis-Steele (Mosaic has no cumsum lowering).

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
)

# Nuclei (lanes) per grid program. The kernel is HBM-traffic-bound; tall
# tiles amortize per-grid-step overhead. VMEM per program is roughly
# (2*(P + 16) + 12*C + ~90) sublane rows x TILE_T x 4 B x 2 (double
# buffering) — ~10 MB at the defaults (P=16, C=8).
TILE_T = 4096

def _sublane_cumsum(x):
    """Inclusive prefix sum along sublanes (axis=0): Hillis-Steele over
    log2(height) sublane rolls — Mosaic has no cumsum lowering."""
    h = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    out = x
    k = 1
    while k < h:
        shifted = pltpu.roll(out, k, 0)
        out = out + jnp.where(row >= k, shifted, jnp.zeros_like(out))
        k *= 2
    return out


def _decay_stats_kernel(
    dt_ref,  # (1, 1) SMEM step_time
    u_ref,  # (4, T) f32: bernoulli, branch, duration, half-life draws
    prow_ref, d0_ref, d1_ref,  # (16, T) f32 packed nuclear-data rows
    z_ref, n_ref, cc_ref,  # (1, T) i32
    hl_ref, tp_ref, ld_ref,  # (1, T) f32
    counts_ref,  # (8, T) i32
    alive_ref, ptype_ref,  # (P, T) i32
    cz0_ref, cn0_ref, cdt_ref, cz1_ref, cn1_ref,  # (C, T) i32
    ct_ref,  # (C, T) f32
    # outputs
    oz_ref, on_ref, occ_ref,  # (1, T) i32
    ohl_ref, old_ref,  # (1, T) f32
    ocounts_ref,  # (8, T) i32
    oalive_ref, optype_ref,  # (P, T) i32
    ocz0_ref, ocn0_ref, ocdt_ref, ocz1_ref, ocn1_ref,  # (C, T) i32
    oct_ref,  # (C, T) f32
    *,
    cfg: SimConfig,
):
    step_time = dt_ref[0, 0]
    inf = jnp.float32(jnp.inf)

    hl = hl_ref[...]  # (1, T)
    z = z_ref[...]
    n = n_ref[...]
    tp = tp_ref[...]
    ld = ld_ref[...]
    cc = cc_ref[...]
    u_bern = u_ref[0:1, :]
    u_branch = u_ref[1:2, :]
    u_dur = u_ref[2:3, :]
    u_hl = u_ref[3:4, :]

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
    pick1 = u_branch > prow[5:6, :]
    new_z = jnp.where(pick1, prow[9:10, :], prow[6:7, :]).astype(jnp.int32)
    new_n = jnp.where(pick1, prow[10:11, :], prow[7:8, :]).astype(jnp.int32)
    dtype = jnp.where(pick1, prow[11:12, :], prow[8:9, :]).astype(jnp.int32)
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

    # --- nucleon adjustment (particles.py:149-203): rank masks via a
    # sublane prefix sum over the particle axis.
    alive = alive_ref[...]
    ptype = ptype_ref[...]
    alive_b = alive != 0
    alive_p = alive_b & (ptype == PROTON)
    alive_n = alive_b & (ptype == NEUTRON)
    prank = _sublane_cumsum(alive_p.astype(jnp.int32)) - 1
    nrank = _sublane_cumsum(alive_n.astype(jnp.int32)) - 1
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
        drow[4:5, :] > 0.5,
        inf,
        jnp.exp2(
            jnp.log2(jnp.float32(10.0)) * (drow[1:2, :] + u_hl * drow[2:3, :])
        )
        * drow[3:4, :],
    )
    tab = drow[0:1, :]
    hl_new = jnp.where(tab != tab, est, tab)  # NaN row slot 0 = "estimate"
    hl2 = jnp.where(eff, hl_new, hl)

    # --- decay counters (fixing the reference's never-incremented
    # decay_counts, SURVEY C15).
    cidx = jax.lax.broadcasted_iota(jnp.int32, counts_ref.shape, 0)
    ocounts_ref[...] = counts_ref[...] + jnp.where(cidx == dtype, effi, 0)

    # --- chain-ring append as a masked sublane write.
    c_cap = ct_ref.shape[0]
    slot = cc - (cc // c_cap) * c_cap
    ridx = jax.lax.broadcasted_iota(jnp.int32, ct_ref.shape, 0)
    smask = (ridx == slot) & eff

    ocz0_ref[...] = jnp.where(smask, z, cz0_ref[...])
    ocn0_ref[...] = jnp.where(smask, n, cn0_ref[...])
    ocdt_ref[...] = jnp.where(smask, dtype, cdt_ref[...])
    ocz1_ref[...] = jnp.where(smask, new_z, cz1_ref[...])
    ocn1_ref[...] = jnp.where(smask, new_n, cn1_ref[...])
    oct_ref[...] = jnp.where(smask, duration * efff, ct_ref[...])

    oz_ref[...] = jnp.where(eff, new_z, z)
    on_ref[...] = jnp.where(eff, new_n, n)
    occ_ref[...] = cc + effi
    ohl_ref[...] = hl2
    old_ref[...] = jnp.where(eff, tp, ld)
    oalive_ref[...] = new_alive.astype(jnp.int32)
    optype_ref[...] = new_ptype


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _decay_stats_batched_t(fields: dict, cfg: SimConfig, u_t, dyn_step_time,
                           interpret=False):
    """One stats-only decay substep over TRANSPOSED per-nucleus fields.

    ``fields`` is a dict of batch-minor arrays — scalars (1, B), alive and
    ptype (P, B), chain rings (C, B) — as produced by
    :func:`transpose_state_for_decay`; ``u_t`` is the (4, B) uniform block
    (same threefry stream as the jnp path). Returns the updated dict.
    """
    b = fields["z"].shape[1]
    pad = (-b) % TILE_T
    tiles = (b + pad) // TILE_T
    bb = b + pad
    # The frame path (transpose_state_for_decay) pre-pads the carry to a
    # TILE_T multiple so pad == 0 here and the rp() calls below no-op:
    # padding ~14 full-width arrays every substep inside the scan is real
    # per-substep HBM traffic. Direct (test) callers may pass unpadded
    # fields; only the fresh per-substep uniforms still need widening.
    # Pad draws with 1.0: u_bern = 1.0 is never < p, so a padded lane
    # can never decay or touch its chain ring.
    if u_t.shape[1] != b:
        u_t = jnp.pad(
            u_t, ((0, 0), (0, b - u_t.shape[1])), constant_values=1.0
        )

    # Nuclear-data row gathers (XLA): parent cell + both daughter
    # candidates, transposed to (16, B).
    rows_t = jnp.asarray(tables._ROWS.T)
    z_flat = fields["z"][0]
    n_flat = fields["n"][0]
    prow = jnp.take(rows_t, tables._flat_index(z_flat, n_flat), axis=1)
    d0 = jnp.take(
        rows_t,
        tables._flat_index(prow[6].astype(jnp.int32), prow[7].astype(jnp.int32)),
        axis=1,
    )
    d1 = jnp.take(
        rows_t,
        tables._flat_index(prow[9].astype(jnp.int32), prow[10].astype(jnp.int32)),
        axis=1,
    )

    rp = lambda a: jnp.pad(a, ((0, 0), (0, pad)))  # noqa: E731
    args = (
        jnp.asarray(dyn_step_time, jnp.float32).reshape(1, 1),
        rp(u_t),
        rp(prow), rp(d0), rp(d1),
        rp(fields["z"]), rp(fields["n"]), rp(fields["chain_cursor"]),
        rp(fields["half_life"]), rp(fields["time_passed"]),
        rp(fields["last_decay_time"]),
        rp(fields["decay_counts"]),
        rp(fields["alive"]), rp(fields["ptype"]),
        rp(fields["chain_z0"]), rp(fields["chain_n0"]),
        rp(fields["chain_dtype"]),
        rp(fields["chain_z1"]), rp(fields["chain_n1"]),
        rp(fields["chain_time"]),
    )
    p_cap = fields["alive"].shape[0]
    c_cap = fields["chain_time"].shape[0]

    def spec(h):
        return pl.BlockSpec((h, TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM)

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
        jax.ShapeDtypeStruct((1, bb), i32),  # z
        jax.ShapeDtypeStruct((1, bb), i32),  # n
        jax.ShapeDtypeStruct((1, bb), i32),  # chain_cursor
        jax.ShapeDtypeStruct((1, bb), f32),  # half_life
        jax.ShapeDtypeStruct((1, bb), f32),  # last_decay_time
        jax.ShapeDtypeStruct((8, bb), i32),  # decay_counts
        jax.ShapeDtypeStruct((p_cap, bb), i32),  # alive
        jax.ShapeDtypeStruct((p_cap, bb), i32),  # ptype
        jax.ShapeDtypeStruct((c_cap, bb), i32),  # chain_z0
        jax.ShapeDtypeStruct((c_cap, bb), i32),  # chain_n0
        jax.ShapeDtypeStruct((c_cap, bb), i32),  # chain_dtype
        jax.ShapeDtypeStruct((c_cap, bb), i32),  # chain_z1
        jax.ShapeDtypeStruct((c_cap, bb), i32),  # chain_n1
        jax.ShapeDtypeStruct((c_cap, bb), f32),  # chain_time
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

    clip = lambda a: a[:, :b]  # noqa: E731
    out = dict(fields)
    out.update(
        z=clip(z2), n=clip(n2), chain_cursor=clip(cc2),
        half_life=clip(hl2), last_decay_time=clip(ld2),
        decay_counts=clip(counts2), alive=clip(alive2), ptype=clip(ptype2),
        chain_z0=clip(cz0), chain_n0=clip(cn0), chain_dtype=clip(cdt),
        chain_z1=clip(cz1), chain_n1=clip(cn1), chain_time=clip(ct),
    )
    return out


DECAY_T_FIELDS = (
    "z", "n", "chain_cursor", "half_life", "time_passed", "last_decay_time",
    "decay_counts", "alive", "ptype",
    "chain_z0", "chain_n0", "chain_dtype", "chain_z1", "chain_n1",
    "chain_time",
)


def transpose_state_for_decay(states) -> dict:
    """Batch-minor views of the state fields the decay kernel touches:
    scalars (1, B), everything else (k, B). One transpose per frame — the
    substep scan carries these directly.

    The batch axis is padded HERE, once, to a TILE_T multiple (zeros;
    padded lanes can never decay — their draws are padded with 1.0 in
    ``_decay_stats_batched_t``): padding inside the substep would copy
    the whole carry every substep. ``untranspose_decay_fields`` clips
    the padding back off."""
    b = getattr(states, DECAY_T_FIELDS[0]).shape[0]
    pad = (-b) % TILE_T
    out = {}
    for f in DECAY_T_FIELDS:
        a = getattr(states, f)
        if a.ndim == 1:
            a = a[None, :]
        else:
            a = a.T
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        out[f] = a
    out["alive"] = out["alive"].astype(jnp.int32)
    return out


def untranspose_decay_fields(states, fields: dict):
    """Write the kernel's batch-minor fields back into the state pytree,
    clipping off the batch padding ``transpose_state_for_decay`` added."""
    upd = {}
    for f in DECAY_T_FIELDS:
        orig = getattr(states, f)
        b = orig.shape[0]
        a = fields[f][:, :b]
        if orig.ndim == 1:
            upd[f] = a[0].astype(orig.dtype)
        else:
            upd[f] = a.T.astype(orig.dtype)
    return states.replace(**upd)


def decay_stats_substep_t(fields: dict, cfg: SimConfig, keys,
                          dyn: FrameDynamics, interpret=False) -> dict:
    """Batched stats-only decay substep on transposed fields — the
    fused-kernel twin of ``vmap(maybe_decay(..., stats_only=True))``.

    ``keys`` is the (B,) per-nucleus substep key array; each nucleus's
    uniform vector is drawn exactly as the jnp path draws it (same key,
    same shape), so decisions are identical up to transcendental ULP in
    the probability math. Only the first 4 of the 1+draw_count uniforms
    are consumed (the rest parameterize ejecta, skipped in stats mode).
    """
    ndraw = 1 + _decay_draw_count(cfg)
    u_t = jax.vmap(lambda k: jax.random.uniform(k, (ndraw,)), out_axes=1)(keys)
    return _decay_stats_batched_t(fields, cfg, u_t[:4], dyn.step_time, interpret)
