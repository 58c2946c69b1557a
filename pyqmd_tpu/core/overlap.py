"""Nucleon overlap resolution.

The reference separates overlapping pairs with an O(N^2) sequential
Gauss-Seidel sweep on the host every frame
(/root/reference/nuclear_sim.py:355-379): each pair closer than 5.0 is
pushed apart by half the overlap, degenerate pairs get a random direction.

TPU-first reformulation: a Jacobi projection — all pair pushes are computed
against the *same* snapshot and summed per particle, so the pass is one
masked (P, P) broadcast instead of a data-dependent sequential loop. One
Jacobi iteration resolves typical frame-to-frame overlap as effectively as
the reference's single sweep (both are approximate projections repeated
every frame); ``cfg.overlap_iterations`` allows more.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pyqmd_tpu.config import SimConfig


def _resolve_once(pos, alive, key, cfg: SimConfig):
    p = pos.shape[0]
    md = cfg.overlap_min_dist
    d = pos[None, :, :] - pos[:, None, :]  # d[i, j] = pos_j - pos_i
    dist2 = jnp.sum(d * d, axis=-1)
    eye = jnp.eye(p, dtype=bool)
    pair = alive[:, None] & alive[None, :] & ~eye & (dist2 < md * md)

    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    # Degenerate (coincident) pairs get a random separation direction
    # (nuclear_sim.py:367-369); antisymmetrized so the two sides of each
    # unordered pair push in opposite directions. The angle for pair (i, j)
    # is u_i + u_j from a (P,)-sized draw (+pi on the j side) instead of a
    # (P, P) random tensor: coincident pairs are vanishingly rare, and the
    # per-pair threefry draw was ~40% of the whole overlap pass at a 10k
    # ensemble (671M draws/frame). A sum of uniforms mod 2pi is uniform.
    row = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    u = jax.random.uniform(key, (p,), maxval=2.0 * jnp.pi)
    s = u[:, None] + u[None, :]
    ang = jnp.where(row < col, s, s + jnp.pi)
    rand_dir = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    degen = dist < 0.001
    direction = jnp.where(degen[..., None], rand_dir, d / dist[..., None])

    push = jnp.where(pair, (md - jnp.where(degen, 0.001, dist)) * 0.5, 0.0)
    # Sum the pair corrections per particle, but cap the displacement at
    # half the separation distance: a freshly placed nucleus has every
    # nucleon overlapping dozens of others, and an uncapped Jacobi sum
    # overshoots by the neighbor count and explodes the cluster in one
    # frame. The cap makes dense clusters peel outward a bounded amount per
    # frame — the gradual diffusive expansion of the reference's sequential
    # Gauss-Seidel sweep repeated every frame.
    delta = -jnp.sum(direction * push[..., None], axis=1)
    mag = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    max_step = md * 0.5
    delta = delta * jnp.minimum(1.0, max_step / jnp.maximum(mag, 1e-9))
    return pos + jnp.where(alive[:, None], delta, 0.0)


def resolve_overlaps(pos, alive, key, cfg: SimConfig):
    """Run ``cfg.overlap_iterations`` Jacobi projection passes."""
    for i in range(cfg.overlap_iterations):
        pos = _resolve_once(pos, alive, jax.random.fold_in(key, i), cfg)
    return pos
