"""Per-frame dynamic scalars threaded through the jit'd step.

The reference reads these off mutable ``self`` mid-loop
(/root/reference/nuclear_sim.py:118-176). Here they are traced scalars so
changing the time scale interactively never retriggers compilation (only
the substep count is static — it is the ``lax.scan`` length).
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class FrameDynamics(NamedTuple):
    """Traced per-frame scalars.

    time_scale  — sim-seconds per wall-second (nuclear_sim.py:50).
    substeps    — substep count this frame as f32 (nuclear_sim.py:153-154);
                  used in ejecta speed/aging/lifetime formulas.
    physics_dt  — effective physics timestep (nuclear_sim.py:145).
    step_time   — sim-seconds per substep = frame_dt*time_scale/substeps
                  (nuclear_sim.py:165), the decay-Bernoulli dt and the
                  ejecta aging dt.
    raw_physics_dt — the *unscaled* physics timestep (nuclear_sim.py:59),
                  before the accuracy factor; the ejecta-lifetime dt factor
                  reads this one (nuclear_sim.py:327 uses self.physics_dt
                  raw). ``None`` means equal to ``physics_dt`` (the
                  accuracy=1.0 case).
    """

    time_scale: jax.Array
    substeps: jax.Array
    physics_dt: jax.Array
    step_time: jax.Array
    raw_physics_dt: jax.Array | None = None
