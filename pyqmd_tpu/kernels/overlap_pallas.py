"""Pallas overlap-resolution kernel (Mosaic / TPU).

The device-native form of :func:`pyqmd_tpu.core.overlap._resolve_once`
(itself the Jacobi reformulation of the reference's host-side O(N^2)
sweep, /root/reference/nuclear_sim.py:355-379). Same math as the jnp
oracle — pair mask under ``overlap_min_dist``, half-overlap push,
angle-sum random directions for coincident pairs, capped per-particle
displacement — with the force kernel's execution shape
(:mod:`pyqmd_tpu.kernels.forces_pallas`):

  * grid over tall batch tiles (up to 128 rows per program — see
    forces_pallas.TILE_B_CAP), planar (B, P) arrays so lanes are the
    particle axis;
  * (128, 128) pair blocks in VMEM, block-antisymmetric sweep: the push
    direction is antisymmetric and the push magnitude symmetric, so only
    the upper-triangle blocks are computed;
  * diagonal blocks reduce along sublanes (cheap) via the negation trick.

The jnp path materializes (B, P, P, 2) temporaries in HBM (chunked to
bound memory) and was ~65 ms per 10k-ensemble frame; this kernel keeps
pair blocks in VMEM. Equivalence with the oracle is pinned by
tests/test_kernel.py (interpret mode) and exercised on real TPU by the
bench.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyqmd_tpu.config import SimConfig


def _overlap_kernel(
    px_ref, py_ref, m_ref, cu_ref, su_ref,  # (tile_b, P) VMEM f32
    ox_ref, oy_ref,  # outputs (tile_b, P)
    *,
    cfg: SimConfig,
    group: int = 1,
):
    md = cfg.overlap_min_dist
    p = px_ref.shape[1]
    t_sz = 128
    ntiles = p // t_sz
    eye = jnp.eye(t_sz, dtype=jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (t_sz, t_sz), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (t_sz, t_sz), 1)
    diag_sign = jnp.where(iota_r < iota_c, 1.0, -1.0)
    if group > 1:
        # Packed rows (see forces_pallas._packing): group nuclei share the
        # 128-lane row; cross-nucleus pairs are masked out block-diagonally.
        sub = t_sz // group
        diag_mask = (
            ((iota_r // sub) == (iota_c // sub)).astype(jnp.float32)
            * (1.0 - eye)
        )
    else:
        diag_mask = 1.0 - eye

    def pair_block(xi, yi, mi, cui, sui, xj, yj, mj, cuj, suj, diagonal):
        """push*dir for one (128, 128) block: rows = i-tile, cols = j-tile.
        Antisymmetric in (i, j) — the d/dist branch by dx's sign, the
        random branch by the triangle sign flip."""
        dx = xj[None, :] - xi[:, None]
        dy = yj[None, :] - yi[:, None]
        dist2 = dx * dx + dy * dy
        pair = (mi[:, None] * mj[None, :]) * (dist2 < md * md).astype(jnp.float32)
        if diagonal:
            pair = pair * diag_mask
        inv = jax.lax.rsqrt(jnp.maximum(dist2, 1e-12))
        dist = dist2 * inv
        degen = dist < 0.001
        # cos/sin(u_i + u_j) by the angle-sum identity (matches the oracle).
        cs = cui[:, None] * cuj[None, :] - sui[:, None] * suj[None, :]
        ss = sui[:, None] * cuj[None, :] + cui[:, None] * suj[None, :]
        sign = diag_sign if diagonal else 1.0
        dirx = jnp.where(degen, sign * cs, dx * inv)
        diry = jnp.where(degen, sign * ss, dy * inv)
        push = pair * (md - jnp.where(degen, 0.001, dist)) * 0.5
        return push * dirx, push * diry

    for b in range(px_ref.shape[0]):  # static unroll over the batch tile
        xs = [px_ref[b, t * t_sz:(t + 1) * t_sz] for t in range(ntiles)]
        ys = [py_ref[b, t * t_sz:(t + 1) * t_sz] for t in range(ntiles)]
        ms = [m_ref[b, t * t_sz:(t + 1) * t_sz] for t in range(ntiles)]
        cus = [cu_ref[b, t * t_sz:(t + 1) * t_sz] for t in range(ntiles)]
        sus = [su_ref[b, t * t_sz:(t + 1) * t_sz] for t in range(ntiles)]
        ax = [jnp.zeros((t_sz,), jnp.float32) for _ in range(ntiles)]
        ay = [jnp.zeros((t_sz,), jnp.float32) for _ in range(ntiles)]
        # delta_i = -sum_j push*dir[i, j]; antisymmetry makes the diagonal
        # block's -sum(axis=1) equal +sum(axis=0) (sublane reduction), and
        # gives the j-tile of an off-diagonal block for free.
        for ti in range(ntiles):
            for tj in range(ti, ntiles):
                mx, my = pair_block(
                    xs[ti], ys[ti], ms[ti], cus[ti], sus[ti],
                    xs[tj], ys[tj], ms[tj], cus[tj], sus[tj],
                    diagonal=(ti == tj),
                )
                if ti == tj:
                    ax[ti] = ax[ti] + jnp.sum(mx, axis=0)
                    ay[ti] = ay[ti] + jnp.sum(my, axis=0)
                else:
                    ax[ti] = ax[ti] - jnp.sum(mx, axis=1)
                    ay[ti] = ay[ti] - jnp.sum(my, axis=1)
                    ax[tj] = ax[tj] + jnp.sum(mx, axis=0)
                    ay[tj] = ay[tj] + jnp.sum(my, axis=0)
        max_step = md * 0.5
        for t in range(ntiles):
            sl = slice(t * t_sz, (t + 1) * t_sz)
            mag = jnp.sqrt(ax[t] * ax[t] + ay[t] * ay[t])
            scale = jnp.minimum(1.0, max_step / jnp.maximum(mag, 1e-9))
            keep = ms[t] > 0
            ox_ref[b, sl] = jnp.where(keep, xs[t] + ax[t] * scale, xs[t])
            oy_ref[b, sl] = jnp.where(keep, ys[t] + ay[t] * scale, ys[t])


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _overlap_batched(pos, alive, u, cfg: SimConfig, interpret=False):
    from pyqmd_tpu.kernels.device_mode import current_caps
    from pyqmd_tpu.kernels.forces_pallas import _packing, _tile_rows

    b, p = alive.shape
    p_sub, group = _packing(p)
    pad_p = p_sub - p
    if pad_p:
        pos = jnp.pad(pos, ((0, 0), (0, pad_p), (0, 0)))
        alive = jnp.pad(alive, ((0, 0), (0, pad_p)))
        u = jnp.pad(u, ((0, 0), (0, pad_p)))
    # Tall batch tiles: same two-device-mode tradeoff as the force kernel
    # (see forces_pallas.TILE_B_CAP). Live caps come from the device-mode
    # probe (kernels/device_mode.py): 32 unrolled / 64 packed by default,
    # both 128 when the device's overlapped grid mode is detected.
    cap_unrolled, cap_packed = current_caps()
    tile_b = _tile_rows(-(-b // group), cap_packed if group > 1 else cap_unrolled)
    row_quota = group * tile_b
    pad_b = (-b) % row_quota
    if pad_b:
        pos = jnp.pad(pos, ((0, pad_b), (0, 0), (0, 0)))
        alive = jnp.pad(alive, ((0, pad_b), (0, 0)))
        u = jnp.pad(u, ((0, pad_b), (0, 0)))
    bb = b + pad_b
    rows = bb // group
    row_p = p_sub * group

    px = pos[..., 0].reshape(rows, row_p)
    py = pos[..., 1].reshape(rows, row_p)
    m = alive.astype(jnp.float32).reshape(rows, row_p)
    cu = jnp.cos(u).reshape(rows, row_p)
    su = jnp.sin(u).reshape(rows, row_p)

    grid = (rows // tile_b,)
    vspec = pl.BlockSpec((tile_b, row_p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ox, oy = pl.pallas_call(
        functools.partial(_overlap_kernel, cfg=cfg, group=group),
        grid=grid,
        in_specs=[vspec] * 5,
        out_specs=[vspec] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, row_p), jnp.float32)] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * row_p * row_p * 15 * tile_b,
            bytes_accessed=7 * tile_b * row_p * 4,
            transcendentals=0,
        ),
    )(px, py, m, cu, su)
    unpack = lambda a: a.reshape(bb, p_sub)[:b, :p]  # noqa: E731
    return jnp.stack([unpack(ox), unpack(oy)], axis=-1)


def overlap_step_pallas(pos, alive, u, cfg: SimConfig, interpret=False):
    """One Jacobi overlap pass; (P, 2) or batched (B, P, 2) state, with
    ``u`` the per-particle degenerate-separation angles ((P,) or (B, P))."""
    if pos.ndim == 2:
        return _overlap_batched(
            pos[None], alive[None], u[None], cfg, interpret
        )[0]
    return _overlap_batched(pos, alive, u, cfg, interpret)
