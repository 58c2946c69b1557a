"""Particle-axis sharded force: the ppermute ring (SURVEY §2 P5).

The n-body equivalent of ring attention: when one nucleus's O(N^2) pair
sweep exceeds a core (or to demonstrate the pattern at A <= 238), shard the
particle axis over a ``model`` mesh axis. Each device keeps its i-block
fixed and accumulates forces from a j-block that rotates around the ring
via ``lax.ppermute``; after D hops every i-block has seen every j-block.
Center of mass and alive counts are psum'd first, so the physics is exactly
:func:`pyqmd_tpu.core.forces.force_step` up to f32 reduction order.

The reference's closest concept is the per-work-item j-loop inside its
OpenCL kernel (/root/reference/nuclear_forces.py:85-142) — single device,
no sharding of any kind.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.forces import com_force, pair_forces_block
from pyqmd_tpu.parallel.mesh import MODEL_AXIS


def _ring_force_local(pos, vel, ptype, alive, dt, cfg: SimConfig, axis: str):
    """Body run per shard under shard_map: inputs are local blocks."""
    d_devs = jax.lax.axis_size(axis)
    m = alive.astype(jnp.float32)

    # Global alive count (kernel computes it over the full particle set,
    # nuclear_forces.py:148) — position-independent.
    count = jax.lax.psum(jnp.sum(m), axis)
    safe = jnp.maximum(count, 1.0)

    perm = [(i, (i + 1) % d_devs) for i in range(d_devs)]

    def total_force(p):
        """Pair sweep (ppermute ring over j-blocks) + CoM spring at
        positions ``p`` — matches compute_forces, which leapfrog
        evaluates at two positions (center psum'd per evaluation,
        nuclear_forces.py:206-208)."""
        center = jax.lax.psum(jnp.sum(p * m[:, None], axis=0), axis) / safe

        def body(carry, _):
            j_pos, j_type, j_alive, acc = carry
            acc = acc + pair_forces_block(p, ptype, alive, j_pos, j_type, j_alive, cfg)
            # Rotate the j-block to the next device; overlappable with the
            # next block's compute by XLA's latency-hiding scheduler.
            j_pos = jax.lax.ppermute(j_pos, axis, perm)
            j_type = jax.lax.ppermute(j_type, axis, perm)
            j_alive = jax.lax.ppermute(j_alive, axis, perm)
            return (j_pos, j_type, j_alive, acc), None

        init = (p, ptype, alive, jnp.zeros_like(p))
        (_, _, _, force), _ = jax.lax.scan(body, init, None, length=d_devs)
        return force + com_force(p, center, safe, cfg) * m[:, None]

    keep = alive[:, None]
    if cfg.integrator == "leapfrog":
        # Velocity-Verlet (core.forces._leapfrog_step semantics): two ring
        # sweeps per step, CoM re-psum'd at the drifted positions.
        f1 = total_force(pos)
        v_half = vel + f1 * (0.5 * dt)
        new_pos = pos + v_half * dt
        f2 = total_force(new_pos)
        new_vel = (v_half + f2 * (0.5 * dt)) * cfg.damping
    else:
        force = total_force(pos)
        new_vel = (vel + force * dt) * cfg.damping
        new_pos = pos + new_vel * dt
    return jnp.where(keep, new_pos, pos), jnp.where(keep, new_vel, vel)


def _make_ring_shard(cfg: SimConfig, mesh, axis: str):
    spec2 = P(axis, None)
    spec1 = P(axis)
    local = functools.partial(_ring_force_local, cfg=cfg, axis=axis)
    return jax.shard_map(
        lambda pos, vel, t, a, dt: local(pos, vel, t, a, dt),
        mesh=mesh,
        in_specs=(spec2, spec2, spec1, spec1, P()),
        out_specs=(spec2, spec2),
        check_vma=False,
    )


def make_ring_frame_fn(cfg: SimConfig, num_steps: int, mesh, axis: str = MODEL_AXIS):
    """Jit-compiled FULL frame with the force step model-sharded.

    The complete workload of :func:`pyqmd_tpu.core.step.simulate_frame`
    (ejecta advection, decay sampling + masked transitions, chain log,
    overlap resolution) runs replicated over ``axis`` while every substep's
    O(N^2) force+integrate runs as the ppermute ring over the particle
    axis — the sequence-parallel layout where one nucleus is too big for a
    core but decay bookkeeping is tiny. GSPMD inserts the gather from the
    ring's sharded output back to the replicated layout the decay masks
    need. Equality with the dense frame is pinned by
    ``tests/test_parallel.py``.

    ``cfg.max_particles`` must be divisible by the ``axis`` mesh size.
    """
    from pyqmd_tpu.core.step import simulate_frame

    if cfg.max_particles % mesh.shape[axis]:
        raise ValueError(
            f"max_particles={cfg.max_particles} not divisible by "
            f"mesh axis {axis!r} size {mesh.shape[axis]}"
        )
    ring = _make_ring_shard(cfg, mesh, axis)

    def fstep(pos, vel, ptype, alive, dt, _cfg):
        return ring(pos, vel, ptype, alive, jnp.asarray(dt, jnp.float32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def frame(state, time_scale, frame_dt):
        return simulate_frame(
            state, cfg, time_scale, frame_dt, num_steps, force_step_fn=fstep
        )

    return frame


def make_ring_force_step(cfg: SimConfig, mesh, axis: str = MODEL_AXIS):
    """Build a jitted force step with the particle axis sharded over
    ``axis``. Drop-in semantics of :func:`core.forces.force_step` for
    (P, 2) arrays with P divisible by the axis size."""
    shard = _make_ring_shard(cfg, mesh, axis)

    @jax.jit
    def step(pos, vel, ptype, alive, dt):
        return shard(pos, vel, ptype, alive, jnp.asarray(dt, jnp.float32))

    return step
