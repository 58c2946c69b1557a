"""Fused Pallas force + integrate kernel (Mosaic / TPU).

This is the native-code equivalent of the reference's single native
component: the embedded OpenCL kernel ``update_forces_and_positions``
(/root/reference/nuclear_forces.py:57-173). Same physics as
:func:`pyqmd_tpu.core.forces.force_step` (the jnp oracle) — hard core,
piecewise strong force, p-p Coulomb, same-type Pauli, per-pair clamp, CoM
spring, semi-implicit Euler with 0.85 damping — but with the TPU-first
execution shape:

  * grid over batch tiles (TILE_B nuclei per program), the ensemble being
    the scale axis (SURVEY §2 P2: kernel tiling);
  * all state for a tile resident in VMEM; the (P, P) pair interaction is
    computed per nucleus with VPU elementwise ops and accumulated with a
    negated sublane-axis reduction (g symmetric, dx antisymmetric), never
    spilling pair matrices to HBM;
  * center of mass and alive counts computed in-kernel (the reference
    computes the center on host each substep, nuclear_forces.py:206-208);
  * integration fused into the same kernel — one HBM read + one HBM write
    of the state per substep, the speed-of-light minimum.

The kernel works on any padded particle capacity that is a multiple of 128
(lane width). Equivalence with the jnp path is pinned by
tests/test_kernel.py in interpret mode and on real TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.state import PROTON

TILE_B = 8  # nuclei per program: matches the f32 (8, 128) sublane tile

def _force_kernel(
    dt_ref,  # (1, 1) SMEM
    px_ref, py_ref, vx_ref, vy_ref,  # (TILE_B, P) VMEM f32
    isp_ref, m_ref,  # (TILE_B, P) VMEM f32: proton indicator, alive mask
    ox_ref, oy_ref, ovx_ref, ovy_ref,  # outputs (TILE_B, P)
    *,
    cfg: SimConfig,
):
    dt = dt_ref[0, 0]
    eps = cfg.epsilon
    s = cfg.strong_strength
    min_allowed = cfg.nucleon_radius * cfg.hard_core_scale

    if cfg.fast_math:
        # -cl-fast-relaxed-math analog (nuclear_forces.py:175).
        recip = lambda x: pl.reciprocal(x, approx=True)  # noqa: E731
    else:
        recip = lambda x: 1.0 / x  # noqa: E731
    # Note: a polynomial exp2 replacement was measured SLOWER than the
    # hardware exp (733 vs 587 ms/frame at 10k) — the VPU transcendental
    # unit beats a ~10-op software pipeline; keep jnp.exp.

    p = px_ref.shape[1]
    t_sz = 128  # pair-tile edge (lane width)
    ntiles = p // t_sz
    eye = jnp.eye(t_sz, dtype=jnp.float32)

    def pair_block(xi, yi, mi, ispi, xj, yj, mj, ispj, diagonal):
        """g*dx, g*dy for one (128, 128) tile pair: rows = i-tile,
        cols = j-tile. The full reference pair chain (nuclear_forces.py:100-137)."""
        dx = xj[None, :] - xi[:, None]
        dy = yj[None, :] - yi[:, None]
        dist2 = dx * dx + dy * dy
        pair = (mi[:, None] * mj[None, :]) * (dist2 >= 0.01).astype(jnp.float32)
        if diagonal:
            pair = pair * (1.0 - eye)
        # One rsqrt yields both dist and 1/dist (saves the g = f/dist divide).
        inv_dist = jax.lax.rsqrt(jnp.maximum(dist2, 1e-12))
        dist = dist2 * inv_dist

        overlap = jnp.maximum(min_allowed - dist, 0.0) / min_allowed
        f = -cfg.hard_core_strength * overlap * jnp.sqrt(overlap)  # x**1.5

        # Single-exp piecewise strong force (same trick as the jnp oracle).
        inv_d2e = recip(dist2 + eps)
        inv_de = recip(dist + eps)
        r_ratio = dist / cfg.strong_range
        in_attract = dist < cfg.strong_attract_cut
        amp = jnp.where(in_attract, 1.25 * s, 0.15 * s)
        k = jnp.where(in_attract, 1.0, 1.8)
        outer = amp * jnp.exp(-r_ratio * k) * inv_de
        core = -0.7 * s * inv_d2e
        f = f + jnp.where(dist < cfg.strong_core_cut, core, outer)

        f = f - (ispi[:, None] * ispj[None, :]) * (cfg.coulomb_strength * inv_d2e)

        same = 1.0 - jnp.abs(ispi[:, None] - ispj[None, :])
        pauli = cfg.pauli_strength * jnp.exp(-dist / cfg.pauli_range * 2.0)
        f = f - jnp.where(dist < cfg.pauli_range, same * pauli, 0.0)

        f = jnp.clip(f, -cfg.max_pair_force, cfg.max_pair_force)
        g = pair * f * inv_dist
        return g * dx, g * dy

    for b in range(TILE_B):  # static unroll over the batch tile
        x = px_ref[b, :]
        y = py_ref[b, :]
        m = m_ref[b, :]
        isp = isp_ref[b, :]

        count = jnp.sum(m)
        safe = jnp.maximum(count, 1.0)
        cx = jnp.sum(x * m) / safe
        cy = jnp.sum(y * m) / safe

        # Block-antisymmetric pair sweep: the pair force magnitude is
        # symmetric and the offsets antisymmetric, so the lower-triangle
        # tile blocks are the exact negated transposes of the upper ones —
        # only ntiles*(ntiles+1)/2 of ntiles^2 blocks are computed (25%
        # saved at P=256). Diagonal blocks reduce along sublanes (fast);
        # each off-diagonal block pays one cross-lane reduction for its
        # i-tile rows and reuses the sublane reduction for the j-tile.
        xs = [x[t * t_sz:(t + 1) * t_sz] for t in range(ntiles)]
        ys = [y[t * t_sz:(t + 1) * t_sz] for t in range(ntiles)]
        ms = [m[t * t_sz:(t + 1) * t_sz] for t in range(ntiles)]
        isps = [isp[t * t_sz:(t + 1) * t_sz] for t in range(ntiles)]
        fx_t = [jnp.zeros((t_sz,), jnp.float32) for _ in range(ntiles)]
        fy_t = [jnp.zeros((t_sz,), jnp.float32) for _ in range(ntiles)]
        for ti in range(ntiles):
            for tj in range(ti, ntiles):
                mx, my = pair_block(
                    xs[ti], ys[ti], ms[ti], isps[ti],
                    xs[tj], ys[tj], ms[tj], isps[tj],
                    diagonal=(ti == tj),
                )
                if ti == tj:
                    fx_t[ti] = fx_t[ti] - jnp.sum(mx, axis=0)
                    fy_t[ti] = fy_t[ti] - jnp.sum(my, axis=0)
                else:
                    fx_t[ti] = fx_t[ti] + jnp.sum(mx, axis=1)
                    fy_t[ti] = fy_t[ti] + jnp.sum(my, axis=1)
                    fx_t[tj] = fx_t[tj] - jnp.sum(mx, axis=0)
                    fy_t[tj] = fy_t[tj] - jnp.sum(my, axis=0)
        # Cube root via exp/log (safe >= 1): Mosaic has no powf lowering.
        nuclear_radius = 1.2 * jnp.exp(jnp.log(safe) / 3.0) * 2.0

        # CoM spring + fused integrate, written back per tile (Mosaic cannot
        # concatenate offset 1-D vectors; per-tile static slices avoid it).
        for t in range(ntiles):
            sl = slice(t * t_sz, (t + 1) * t_sz)
            xt, yt, mt = xs[t], ys[t], ms[t]
            # CoM containment spring (nuclear_forces.py:144-154).
            cdx = cx - xt
            cdy = cy - yt
            cdist = jnp.sqrt(cdx * cdx + cdy * cdy)
            active = ((cdist > nuclear_radius * 1.5) & (cdist > 0.01)).astype(
                jnp.float32
            )
            mag = cfg.com_spring * (cdist - nuclear_radius)
            scale = active * mag / jnp.maximum(cdist, 1e-9)
            fx = (fx_t[t] + scale * cdx) * mt
            fy = (fy_t[t] + scale * cdy) * mt

            # Fused semi-implicit Euler + damping (nuclear_forces.py:156-171).
            vx = (vx_ref[b, sl] + fx * dt) * cfg.damping
            vy = (vy_ref[b, sl] + fy * dt) * cfg.damping
            ovx_ref[b, sl] = jnp.where(mt > 0, vx, vx_ref[b, sl])
            ovy_ref[b, sl] = jnp.where(mt > 0, vy, vy_ref[b, sl])
            ox_ref[b, sl] = jnp.where(mt > 0, xt + vx * dt, xt)
            oy_ref[b, sl] = jnp.where(mt > 0, yt + vy * dt, yt)


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret")
)
def _force_step_batched(pos, vel, ptype, alive, dt, cfg: SimConfig, interpret=False):
    """Fused kernel over a batch: pos/vel (B, P, 2), ptype/alive (B, P)."""
    b, p = ptype.shape
    if p % 128 != 0:
        raise ValueError(f"pallas backend needs P % 128 == 0, got {p}")
    pad_b = (-b) % TILE_B
    if pad_b:
        pos = jnp.pad(pos, ((0, pad_b), (0, 0), (0, 0)))
        vel = jnp.pad(vel, ((0, pad_b), (0, 0), (0, 0)))
        ptype = jnp.pad(ptype, ((0, pad_b), (0, 0)))
        alive = jnp.pad(alive, ((0, pad_b), (0, 0)))
    bb = b + pad_b

    px, py = pos[..., 0], pos[..., 1]
    vx, vy = vel[..., 0], vel[..., 1]
    isp = ((ptype == PROTON) & alive).astype(jnp.float32)
    m = alive.astype(jnp.float32)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)

    grid = (bb // TILE_B,)
    vspec = pl.BlockSpec((TILE_B, p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct((bb, p), jnp.float32)] * 4

    flops_per = 2 * p * p * 40  # rough: ~40 ops per pair interaction
    ox, oy, ovx, ovy = pl.pallas_call(
        functools.partial(_force_kernel, cfg=cfg),
        grid=grid,
        in_specs=[sspec] + [vspec] * 6,
        out_specs=[vspec] * 4,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per * TILE_B,
            bytes_accessed=10 * TILE_B * p * 4,
            transcendentals=3 * TILE_B * p * p,
        ),
    )(dt_arr, px, py, vx, vy, isp, m)

    new_pos = jnp.stack([ox, oy], axis=-1)[:b]
    new_vel = jnp.stack([ovx, ovy], axis=-1)[:b]
    return new_pos, new_vel


def force_step_pallas(pos, vel, ptype, alive, dt, cfg: SimConfig, interpret=False):
    """Drop-in replacement for :func:`pyqmd_tpu.core.forces.force_step`.

    Accepts unbatched (P, 2) state (adds a singleton batch) or batched
    (B, P, 2) state. Call it batch-native for ensembles — vmapping the
    unbatched form pads every nucleus to a full TILE_B tile (8x wasted
    work; see ``ensemble_step``).
    """
    if pos.ndim == 2:
        new_pos, new_vel = _force_step_batched(
            pos[None], vel[None], ptype[None], alive[None], dt, cfg, interpret
        )
        return new_pos[0], new_vel[0]
    return _force_step_batched(pos, vel, ptype, alive, dt, cfg, interpret)
