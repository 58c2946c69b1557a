"""Core simulation engine: init, forces, decay, overlap, step."""

from pyqmd_tpu.core.decay import (
    apply_decay,
    decay_probability,
    force_decay,
    maybe_decay,
)
from pyqmd_tpu.core.dynamics import FrameDynamics
from pyqmd_tpu.core.forces import compute_forces, force_step, force_step_scalar
from pyqmd_tpu.core.init import (
    ensemble_init,
    init_state,
    mixed_ensemble_init,
    placement_order,
)
from pyqmd_tpu.core.overlap import resolve_overlaps
from pyqmd_tpu.core.step import (
    advance_ejecta,
    ensemble_step,
    make_frame_fn,
    make_run_fn,
    simulate_frame,
    state_metrics,
    substep,
)

__all__ = [
    "FrameDynamics",
    "advance_ejecta",
    "apply_decay",
    "compute_forces",
    "decay_probability",
    "ensemble_init",
    "mixed_ensemble_init",
    "ensemble_step",
    "force_decay",
    "force_step",
    "force_step_scalar",
    "init_state",
    "make_frame_fn",
    "make_run_fn",
    "maybe_decay",
    "state_metrics",
    "placement_order",
    "resolve_overlaps",
    "simulate_frame",
    "substep",
]
