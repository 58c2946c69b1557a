"""Hybrid data x model (dp x sp) sharded ensemble frame.

The composed form of the two parallelism axes (SURVEY §2 P1 + P5): the
ensemble batch shards over the ``data`` mesh axis (each device group owns
B/data nuclei) while *within* each data shard every substep's O(N^2) force
sweep shards the particle axis over ``model`` via the ppermute ring — the
n-body analog of combining data parallelism with sequence/context
parallelism in a transformer stack. Per-device force work scales as
B·P² / (data·model); the cheap per-nucleus bookkeeping (decay sampling,
ejecta, chain log, overlap) runs replicated across ``model`` (identical
deterministic computation per replica), and aggregate statistics psum over
``data``.

The reference is one nucleus on one device (SURVEY §2 "Parallelism &
communication"); there is no counterpart to cite. Equality with the dense
:func:`pyqmd_tpu.core.step.ensemble_step` is pinned on the 8-virtual-device
CPU mesh by ``tests/test_parallel.py`` and exercised by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools

import jax

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.step import ensemble_step
from pyqmd_tpu.parallel.ensemble import make_sharded_caller, psum_aggregates
from pyqmd_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from pyqmd_tpu.parallel.ring import _ring_force_local


def make_hybrid_frame_fn(
    cfg: SimConfig,
    num_steps: int,
    mesh,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
):
    """Jit-compiled ensemble frame sharded over BOTH mesh axes.

    Returns ``fn(states, time_scale, frame_dt) -> (states, metrics)``;
    ``states`` has a leading batch axis divisible by the ``data`` axis size
    and ``cfg.max_particles`` must divide by the ``model`` axis size.
    """
    n_model = mesh.shape[model_axis]
    p = cfg.max_particles
    if p % n_model:
        raise ValueError(
            f"max_particles={p} not divisible by mesh axis "
            f"{model_axis!r} size {n_model}"
        )
    p_local = p // n_model
    ring_one = functools.partial(_ring_force_local, cfg=cfg, axis=model_axis)

    def ring_force(pos, vel, ptype, alive, dt, _cfg):
        """Force override for ensemble_step: inputs (B_local, P, ...) are
        replicated over ``model``; each model shard advances its own
        particle rows through the ring, then the full particle axis is
        regathered so the (replicated) decay path sees all nucleons."""
        mi = jax.lax.axis_index(model_axis)
        start = mi * p_local

        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, start, p_local, axis=1)

        npos, nvel = jax.vmap(
            lambda p_, v_, t_, a_: ring_one(p_, v_, t_, a_, dt)
        )(sl(pos), sl(vel), sl(ptype), sl(alive))
        full_pos = jax.lax.all_gather(npos, model_axis, axis=1, tiled=True)
        full_vel = jax.lax.all_gather(nvel, model_axis, axis=1, tiled=True)
        return full_pos, full_vel

    def local_frame(states, time_scale, frame_dt):
        new_states, metrics = ensemble_step(
            states, cfg, time_scale, frame_dt, num_steps,
            force_step_fn=ring_force,
        )
        return new_states, psum_aggregates(metrics, cfg, data_axis)

    return make_sharded_caller(local_frame, mesh, data_axis)
