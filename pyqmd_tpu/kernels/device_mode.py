"""Grid-execution-mode probe and adaptive batch-tile caps.

The TPU device executes Pallas grids in one of two modes that persist for
tens of minutes (docs/PERFORMANCE.md "tile height and the two device
modes"): an *overlapped* mode where wall time scales with the number of
GRID STEPS — tall batch tiles are huge wins (U-238 b10240 measured
11.54/6.05/3.31/1.94/1.19 ms/substep at tile heights 8/16/32/64/128) —
and a *serialized* mode where time scales with ROWS and tall tiles cost a
few percent (same sweep: 11.5/11.5/11.5/12.9/12.3). Round 4 froze the
caps at the never-worse-in-either-mode point (32 unrolled / 64 packed),
leaving a measured ~2.8x on the table whenever the device is overlapped.

This module closes that gap (round-5 verdict item 3): a short fenced
probe times the SAME force kernel at tile 32 vs tile 128 and selects the
caps per process. The probe follows the bench timing protocol
(bench.py): substeps dispatch as one dependent chain and the clock stops
on a host readback of a small leaf of the LAST output — FIFO program
order fences the chain, immune to the tunnel's enqueue-time fence acks.
A/B rounds interleave within one process and the per-variant minimum is
compared, per the measurement rules in docs/PERFORMANCE.md.

Caps are read at TRACE time by the kernels; ``set_device_mode`` clears
the kernel jit caches so later traces pick the new caps up. Frame
functions built BEFORE a mode change keep their old (still correct,
possibly slower) tiling — probe first, then build. The probe is only
meaningful on the TPU backend; elsewhere the conservative caps stand.

No analog exists in the reference (its OpenCL dispatch is a fixed global
size, nuclear_forces.py:202-234); this is TPU-operations tooling.
"""

from __future__ import annotations

import time

import numpy as np

import jax

# (unrolled, packed) batch-tile row caps.
CONSERVATIVE_CAPS = (32, 64)  # never-worse in BOTH device modes (r4 sweep)
OVERLAPPED_CAPS = (128, 128)  # wall time ~ grid steps: tall tiles win ~2.8x

_mode: str | None = None  # None = not probed yet
_caps = CONSERVATIVE_CAPS


def current_mode() -> str | None:
    """Last probed/set mode: "overlapped" | "serialized" | "unknown" | None."""
    return _mode


def current_caps() -> tuple[int, int]:
    """Active (unrolled, packed) batch-tile caps."""
    return _caps


def set_device_mode(mode: str) -> tuple[int, int]:
    """Force the mode and return the resulting caps.

    Clears the batched kernel jit caches so subsequently traced programs
    (including frame functions built after this call) use the new caps.
    """
    global _mode, _caps
    if mode not in ("overlapped", "serialized", "unknown"):
        raise ValueError(f"unknown device mode {mode!r}")
    _mode = mode
    _caps = OVERLAPPED_CAPS if mode == "overlapped" else CONSERVATIVE_CAPS
    from pyqmd_tpu.kernels import forces_pallas, overlap_pallas

    forces_pallas._force_step_batched.clear_cache()
    overlap_pallas._overlap_batched.clear_cache()
    return _caps


def probe_device_mode(
    batch: int = 10240,
    substeps: int = 20,
    rounds: int = 3,
    threshold: float = 1.5,
    force: bool = False,
) -> str:
    """Measure tile-32 vs tile-128 kernel time and set the mode.

    Returns the detected mode. Idempotent per process unless ``force``:
    the mode persists for tens of minutes, so one probe at startup (or at
    the top of a bench run) is the intended use. Costs two extra kernel
    variants' compiles on a cold .jax_cache (~seconds warm) plus
    ``rounds`` interleaved timed chains of ``substeps`` each (~1 s).

    ``threshold`` is the tile-32/tile-128 speedup ratio above which the
    device counts as overlapped — measured ratios are ~2.8 (overlapped)
    vs ~0.93 (serialized), so 1.5 splits them with wide margin.
    """
    global _mode
    if _mode is not None and not force:
        return _mode
    if jax.default_backend() != "tpu":
        set_device_mode("unknown")
        return "unknown"

    from pyqmd_tpu.config import SimConfig
    from pyqmd_tpu.core.init import ensemble_init
    from pyqmd_tpu.kernels.forces_pallas import _force_step_batched

    cfg = SimConfig.for_isotope(92, 146, pad_to=128, force_backend="pallas")
    st = ensemble_init(cfg, batch, seed=0)
    dt = cfg.effective_dt()

    def chain(cap: int) -> float:
        pos, vel = st.pos, st.vel
        t0 = time.perf_counter()
        for _ in range(substeps):
            pos, vel = _force_step_batched(
                pos, vel, st.ptype, st.alive, dt, cfg, tile_cap=cap
            )
        np.asarray(pos[0, 0])  # FIFO fence: one small readback ends the chain
        return time.perf_counter() - t0

    for cap in (32, 128):  # compile + warm both variants
        chain(cap)
    # Interleaved A/B rounds, best-of-N per variant: a mid-probe mode flip
    # or a single tunnel hiccup cannot split the variants across modes.
    t32 = t128 = float("inf")
    for _ in range(rounds):
        t32 = min(t32, chain(32))
        t128 = min(t128, chain(128))
    mode = "overlapped" if t32 / t128 >= threshold else "serialized"
    set_device_mode(mode)
    return mode
