"""Benchmark harness — prints progressive JSON result lines; the LAST
complete line is the result (earlier lines are partial snapshots so a
killed cold-cache run still records its headline).

Headline: U-238 full-physics nucleus-substeps per second on a 10k-nucleus
ensemble (force + integrate + decay sampling + ejecta, the complete substep
path), on whichever force backend (jnp / pallas) is faster.

Baseline: the reference can execute at most 1200 force substeps per second
on its single nucleus — 60 fps cap x 20 max substeps
(/root/reference/nuclear_sim.py:59, 63, 594) — and that ceiling is
structural (blocking host<->device round trip per substep,
nuclear_forces.py:202-234). ``vs_baseline`` is the ratio of our per-chip
nucleus-substeps/s to that 1200/s figure. A measured datum for the
reference's *CPU fallback* physics (same O(N^2) double loop, pure Python)
is included in extras for honesty — no OpenCL GPU exists on this machine.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax

# Persistent compilation cache: TPU compiles go through a slow remote
# helper (~1-4 min per jit variant); the cache makes warm re-runs of this
# bench near-instant on compiles.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.forces import force_step_scalar
from pyqmd_tpu.core.init import ensemble_init, init_state
from pyqmd_tpu.core.step import make_frame_fn

FRAME_DT = 1.0 / 60.0
NUM_STEPS = 20  # the reference's max substeps per frame


def bench_ensemble(z, n, batch, backend, frames=5, pad_to=128):
    """Time `frames` full frames of a `batch`-nucleus ensemble; returns
    nucleus-substeps per second.

    Methodology: frames dispatch back-to-back (each one's output state is
    the next one's donated input, so device execution is a serialized
    dependency chain) and the clock stops on a host readback of the LAST
    state — a ground-truth fence for the whole chain that cannot be faked
    by the axon tunnel's enqueue-time fence acks, and one that doesn't
    serialize a ~30 ms tunnel RPC into every frame the way a per-frame
    ``block_until_ready`` does. This is the interactive dispatch pattern
    (one program per frame), not the fused-scan throughput mode.
    """
    cfg = SimConfig.for_isotope(z, n, pad_to=pad_to, force_backend=backend)
    states = ensemble_init(cfg, batch, seed=0) if batch > 1 else init_state(cfg, seed=0)
    fn = make_frame_fn(cfg, NUM_STEPS, batched=batch > 1)
    states, m = fn(states, 1.0, FRAME_DT)  # compile + warmup
    np.asarray(states.z)  # hard fence (small leaf: O(B) bytes, not O(B*P))
    t0 = time.perf_counter()
    for _ in range(frames):
        states, m = fn(states, 1.0, FRAME_DT)
    np.asarray(states.z)  # fences the full dependent chain
    dt = time.perf_counter() - t0
    return frames * NUM_STEPS * batch / dt


def bench_python_reference(z=92, n=146, steps=10, reps=5):
    """Measured datum: the reference CPU-fallback physics (pure-Python
    O(N^2), nuclear_forces.py:236-323) on this machine.

    Best-of-``reps`` over ``steps``-step runs: the r4 verdict (weak #6)
    flagged that a single 3-step timing swung 15.47 → 10.13 steps/s
    between rounds, making the cross-round multiplier incomparable. The
    frozen companion datum lives in BASELINE.json ``measured`` and is
    reported alongside this fresh one.
    """
    cfg = SimConfig.for_isotope(z, n, pad_to=8)
    st = init_state(cfg, seed=0)
    pos = np.asarray(st.pos).tolist()
    vel = np.asarray(st.vel).tolist()
    ptype = np.asarray(st.ptype).tolist()
    alive = np.asarray(st.alive).tolist()
    best = 0.0
    for _ in range(reps):
        p, v = pos, vel
        t0 = time.perf_counter()
        for _ in range(steps):
            p, v = force_step_scalar(p, v, ptype, alive, 1 / 240, cfg)
        best = max(best, steps / (time.perf_counter() - t0))
    return best


def bench_fused_single(backend="pallas", frames_per_dispatch=50, reps=4):
    """Single-nucleus throughput with frame-fused dispatch (the reference's
    literal workload: one U-238 nucleus). One jit dispatch = 50 frames x 20
    substeps, amortizing host/tunnel latency."""
    from pyqmd_tpu.core.step import make_run_fn

    cfg = SimConfig.for_isotope(92, 146, pad_to=128, force_backend=backend)
    state = init_state(cfg, seed=0)
    fn = make_run_fn(cfg, NUM_STEPS, frames_per_dispatch)
    state, m = fn(state, 1.0, FRAME_DT)
    np.asarray(state.z)  # hard fence
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = fn(state, 1.0, FRAME_DT)
    np.asarray(state.z)  # ground-truth fence of the dependent chain
    dt = time.perf_counter() - t0
    return reps * frames_per_dispatch * NUM_STEPS / dt


def bench_halflife_accuracy(batch=32768, frames=20, decay_only=False):
    """BASELINE acceptance bar: C-14 ensemble half-life within 1%.

    Runs `batch` C-14 nuclei for 2 tabulated half-lives and MLE-fits the
    half-life from the survivor count. Statistical error at this ensemble
    size is ~0.7%, so a healthy run lands within 1%.

    ``decay_only=True`` uses the statistics-only frame (bitwise-identical
    isotope trajectories, no O(P²) forces), making million-nucleus
    ensembles cheap — statistical error ~0.1% at batch=2**21.
    """
    import math

    from pyqmd_tpu.core.step import make_decay_frame_fn

    hl_true = 5730 * 31557600.0
    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    states = ensemble_init(cfg, batch, seed=0)
    fn = (
        make_decay_frame_fn(cfg, 10)
        if decay_only
        else make_frame_fn(cfg, 10, batched=True)
    )
    sim_dt = 0.1 * hl_true  # per frame, over 10 substeps
    for _ in range(frames):
        states, m = fn(states, sim_dt, 1.0)
    surv = float(
        np.asarray((m["z"] == 6) & (m["n"] == 8)).sum()
    ) / batch
    if surv >= 1.0:  # zero decays: -log(1.0) = -0.0 would divide by zero
        return math.inf
    fit_hl = math.log(2) * (frames * sim_dt) / -math.log(max(surv, 1e-9))
    return abs(fit_hl - hl_true) / hl_true


def bench_decay_only_throughput(batch=1 << 21, frames=4, substeps=10, reps=3):
    """Decay-only statistics frame throughput (VERDICT r3 weak #2): the
    O(B·P) pod-scale half-life machinery finally gets a number. Same
    fencing protocol as bench_ensemble; best-of-``reps`` windows because a
    single 4-frame window swung 82M vs 128M on this path between runs
    (CLAUDE.md measurement protocol: never report from one window)."""
    from pyqmd_tpu.core.step import make_decay_frame_fn

    hl_true = 5730 * 31557600.0
    # Ring of 8 = the analysis-workflow default (statistics never read the
    # chain log; measured 1.4x at 2M going 64 -> 8).
    cfg = SimConfig.for_isotope(6, 8, pad_to=8, max_chain_log=8)
    states = ensemble_init(cfg, batch, seed=0)
    fn = make_decay_frame_fn(cfg, substeps)
    sim_dt = 0.01 * hl_true  # slow enough that most of the run has decays left
    states, m = fn(states, sim_dt, 1.0)  # compile + warmup
    np.asarray(states.z)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(frames):
            states, m = fn(states, sim_dt, 1.0)
        np.asarray(states.z)
        best = max(best, frames * substeps * batch / (time.perf_counter() - t0))
    return best


def bench_sharded_tpu(frames=3):
    """Prove shard_map + psum + ppermute lowering on the REAL TPU backend
    with a 1-device mesh (VERDICT r3 weak #3): the multi-chip code paths
    have so far only executed on virtual CPU devices. Returns
    (frame_substeps_per_sec, ring_ok)."""
    from pyqmd_tpu.parallel.ensemble import make_sharded_frame_fn
    from pyqmd_tpu.parallel.mesh import make_mesh, shard_ensemble
    from pyqmd_tpu.parallel.ring import make_ring_force_step

    mesh = make_mesh()  # every available device (1 here)
    batch = 1024 * mesh.devices.size
    # The pallas backend inside shard_map — the exact configuration a real
    # pod run would use (per-shard Mosaic kernel + GSPMD collectives).
    cfg = SimConfig.for_isotope(92, 146, pad_to=128, force_backend="pallas")
    states = shard_ensemble(ensemble_init(cfg, batch, seed=0), mesh)
    fn = make_sharded_frame_fn(cfg, NUM_STEPS, mesh)
    states, m = fn(states, 1.0, FRAME_DT)
    np.asarray(m["survivors"])  # execution fence (psum output)
    t0 = time.perf_counter()
    for _ in range(frames):
        states, m = fn(states, 1.0, FRAME_DT)
    np.asarray(m["survivors"])
    rate = frames * NUM_STEPS * batch / (time.perf_counter() - t0)

    # Particle-axis ppermute ring on a 1-shard model mesh: the CP-analog
    # force sweep must lower and match the dense jnp step on hardware.
    ring_mesh = make_mesh(axis_names=("model",))
    st = init_state(cfg, seed=0)
    ring_step = make_ring_force_step(cfg, ring_mesh, axis="model")
    rp, rv = ring_step(st.pos, st.vel, st.ptype, st.alive, cfg.effective_dt())
    from pyqmd_tpu.core.forces import force_step

    jp, jv = jax.jit(
        lambda *a: force_step(*a, cfg.effective_dt(), cfg)
    )(st.pos, st.vel, st.ptype, st.alive)
    ring_diff = float(
        max(
            np.abs(np.asarray(rp) - np.asarray(jp)).max(),
            np.abs(np.asarray(rv) - np.asarray(jv)).max(),
        )
    )
    return rate, ring_diff


def bench_leapfrog_equivalence():
    """Pallas leapfrog (two fused in-kernel force sweeps) vs the jnp
    velocity-Verlet oracle on the real device (VERDICT r3 weak #6)."""
    from pyqmd_tpu.core.forces import force_step
    from pyqmd_tpu.kernels.forces_pallas import force_step_pallas

    cfg = SimConfig.for_isotope(
        92, 146, pad_to=128, fast_math=False, integrator="leapfrog"
    )
    states = ensemble_init(cfg, 32, seed=0)
    dt = cfg.effective_dt()
    args = (states.pos, states.vel, states.ptype, states.alive)
    jp, jv = jax.jit(lambda *a: force_step(*a, dt, cfg))(*args)
    pp, pv = jax.jit(lambda *a: force_step_pallas(*a, dt, cfg))(*args)
    return float(
        np.maximum(
            np.abs(np.asarray(pp) - np.asarray(jp)).max(),
            np.abs(np.asarray(pv) - np.asarray(jv)).max(),
        )
    )


def bench_kernel_equivalence():
    """Compiled-Mosaic vs jnp force step on the REAL device (VERDICT r2
    weak #6 — tests/test_kernel.py pins this in interpret mode on CPU;
    this records the compiled-kernel deviation on actual hardware).

    Returns (exact_diff, fastmath_diff): max |pos,vel| deviation of the
    Pallas kernel (exact and fast-math builds) from the jnp oracle after
    one force step on a settled U-238 batch.
    """
    from pyqmd_tpu.core.forces import force_step
    from pyqmd_tpu.kernels.forces_pallas import force_step_pallas

    cfg = SimConfig.for_isotope(92, 146, pad_to=128)
    states = ensemble_init(cfg, 32, seed=0)
    # Settle a few frames so positions are post-dynamics, not the initial
    # shell lattice.
    fn = make_frame_fn(cfg, 4, batched=True)
    for _ in range(3):
        states, _ = fn(states, 1.0, FRAME_DT)
    args = (states.pos, states.vel, states.ptype, states.alive)
    dt = cfg.effective_dt()
    jp, jv = jax.jit(lambda *a: force_step(*a, dt, cfg))(*args)
    diffs = {}
    for fast in (False, True):
        kcfg = SimConfig.for_isotope(
            92, 146, pad_to=128, force_backend="pallas", fast_math=fast
        )
        pp, pv = jax.jit(lambda *a: force_step_pallas(*a, dt, kcfg))(*args)
        diffs[fast] = float(
            np.maximum(
                np.abs(np.asarray(pp) - np.asarray(jp)).max(),
                np.abs(np.asarray(pv) - np.asarray(jv)).max(),
            )
        )
    return diffs[False], diffs[True]


def bench_packed_kernel_equivalence():
    """Compiled packed rolled-partner kernel vs the jnp oracle on the REAL
    device (VERDICT r4 weak #7): the He-4 kernel (16 nuclei per 128-lane
    row, lane-roll partner sweep, per-group CoM) was equivalence-pinned
    only in interpret mode on CPU — interpret mode has missed Mosaic-only
    behavior before. Covers Euler + leapfrog, exact + fast-math; returns
    (exact_diff, fastmath_diff), each the max over both integrators.
    """
    from pyqmd_tpu.core.forces import force_step
    from pyqmd_tpu.kernels.forces_pallas import force_step_pallas

    diffs = {False: 0.0, True: 0.0}
    for integrator in ("euler", "leapfrog"):
        cfg = SimConfig.for_isotope(2, 2, pad_to=8, integrator=integrator)
        states = ensemble_init(cfg, 64, seed=0)
        # Settle a few frames so positions are post-dynamics.
        fn = make_frame_fn(cfg, 4, batched=True)
        for _ in range(3):
            states, _ = fn(states, 1.0, FRAME_DT)
        args = (states.pos, states.vel, states.ptype, states.alive)
        dt = cfg.effective_dt()
        jp, jv = jax.jit(lambda *a: force_step(*a, dt, cfg))(*args)
        for fast in (False, True):
            kcfg = SimConfig.for_isotope(
                2, 2, pad_to=8, force_backend="pallas",
                fast_math=fast, integrator=integrator,
            )
            pp, pv = jax.jit(lambda *a: force_step_pallas(*a, dt, kcfg))(*args)
            diffs[fast] = max(
                diffs[fast],
                float(
                    np.maximum(
                        np.abs(np.asarray(pp) - np.asarray(jp)).max(),
                        np.abs(np.asarray(pv) - np.asarray(jv)).max(),
                    )
                ),
            )
    return diffs[False], diffs[True]


def bench_render(fps_frames=60):
    """Render throughput (fps) at 800x600.

    Same methodology as bench_ensemble: frames dispatch back-to-back and
    the clock stops on a full host readback of the LAST image — a valid
    fence for every frame because the TPU executes enqueued programs in
    FIFO order, and immune to both of the axon tunnel's fence artifacts
    (enqueue-time acks on some runs, a ~30 ms blocking RPC per fence on
    others — neither is renderer time). The per-frame-full-readback rate
    is also measured for transparency: one 1.4 MB image readback through
    the tunnel is an RPC-bound ~67 ms (≈1 ms on a directly-attached
    host), so that number reflects the tunnel, not the renderer.

    The INTERACTIVE number (the reference comparison point — its PyGame
    loop displays at 60 fps, nuclear_sim.py:594) uses the r5 indexed +
    pipelined path (render/interactive.py): the device palettizes each
    frame to a 3x-smaller uint8 payload and host copies overlap via
    ``copy_to_host_async``, so every frame fully lands on the host (one
    frame of latency) including the host-side palette expansion. The raw
    serial-RGB readback rate is kept as a transparency extra.

    Returns (fps, interactive_fps, rgb_readback_fps, packed_exact).
    """
    from pyqmd_tpu.render import (
        PipelinedFrameReader, render_frame, render_frame_packed, unpack_frame,
    )

    cfg = SimConfig.for_isotope(92, 146, pad_to=128)
    st = init_state(cfg, seed=0)
    img = render_frame(st, (400.0, 400.0), 10.0, 800, 600)
    np.asarray(img)  # compile + hard fence
    t0 = time.perf_counter()
    for _ in range(fps_frames):
        img = render_frame(st, (400.0, 400.0), 10.0, 800, 600)
    np.asarray(img)  # FIFO order: fences every frame above
    fps = fps_frames / (time.perf_counter() - t0)

    # Interactive pipeline: packed frame per iteration, previous frame's
    # RGB expanded on host. Delivered = n (the last drains in flush()).
    packed = render_frame_packed(st, (400.0, 400.0), 10.0, 800, 600)
    rgb0 = unpack_frame(np.asarray(packed))  # compile + warm + exactness
    exact = rgb0 is not None and np.array_equal(rgb0, np.asarray(img))
    # Best-of-3 windows: a single window swung 23 vs 35 fps between runs
    # (tunnel RPC jitter, not renderer time — CLAUDE.md protocol).
    n_i = max(10, fps_frames // 2)
    ifps = 0.0
    for _ in range(3):
        reader = PipelinedFrameReader()
        delivered = 0
        t0 = time.perf_counter()
        for _ in range(n_i):
            out = reader.submit(
                render_frame_packed(st, (400.0, 400.0), 10.0, 800, 600)
            )
            delivered += out is not None
        delivered += len(reader.flush())
        ifps = max(ifps, delivered / (time.perf_counter() - t0))

    n_rb = max(5, fps_frames // 12)
    t0 = time.perf_counter()
    for _ in range(n_rb):
        img = render_frame(st, (400.0, 400.0), 10.0, 800, 600)
        np.asarray(img)
    rb_fps = n_rb / (time.perf_counter() - t0)
    return fps, ifps, rb_fps, exact


def _best_b10240(results):
    """Key of the fastest 10k-ensemble measurement (the headline)."""
    return max(
        (k for k in results if k.endswith("b10240")),
        key=lambda k: results[k],
        default=None,
    )


def _emit(results, extras):
    """Print the result line with everything gathered SO FAR. Called after
    each major section as well as at the end: the driver reads the LAST
    complete JSON line, so if a cold-cache run is killed mid-way (every
    compile goes through a 1-4 min remote helper), the most recent
    partial line still records the headline."""
    value = results.get(_best_b10240(results), 0.0)
    print(
        json.dumps(
            {
                "metric": "u238_10k_ensemble_nucleus_substeps_per_sec",
                "value": round(value, 1),
                "unit": "nucleus-substeps/s",
                "vs_baseline": round(value / 1200.0, 1),
                "extra": extras,
            }
        ),
        flush=True,
    )


def _device_reachable(total_budget_s: float = 1800.0,
                      probe_timeout_s: float = 300.0) -> bool:
    """Bounded reachability check for the TPU tunnel.

    The axon tunnel can go fully down for stretches (observed r5: >20 min
    where even ``jax.devices()`` hangs at ~0 CPU). An unbounded hang here
    would leave the driver's round-end bench with NO recorded result, so:
    probe with a tiny fenced op in daemon threads, retrying within a total
    budget, and let the caller emit an honest error line on failure. A
    probe thread stuck in the tunnel RPC cannot be cancelled — each retry
    starts a fresh thread; daemon threads don't block interpreter exit.
    """
    import threading

    done = threading.Event()

    def tiny_op():
        import jax.numpy as jnp

        np.asarray(jnp.ones((8, 128)).sum())
        done.set()

    deadline = time.monotonic() + total_budget_s
    while time.monotonic() < deadline:
        t = threading.Thread(target=tiny_op, daemon=True)
        t.start()
        if done.wait(timeout=min(probe_timeout_s,
                                 max(1.0, deadline - time.monotonic()))):
            return True
        print(
            json.dumps({"bench_probe": "device unreachable, retrying",
                        "budget_left_s": round(deadline - time.monotonic())}),
            flush=True,
        )
    return done.is_set()


def main():
    if not _device_reachable():
        # Emit a well-formed final line so the driver records SOMETHING
        # honest instead of hanging forever on a dead tunnel.
        print(json.dumps({
            "metric": "u238_10k_ensemble_nucleus_substeps_per_sec",
            "value": 0,
            "unit": "nucleus-substeps/s",
            "vs_baseline": 0,
            "extra": {"error": "TPU tunnel unreachable for 30 min "
                               "(jax op never completed); no measurement"},
        }), flush=True)
        os._exit(1)

    device = jax.devices()[0]
    extras = {"device": str(device), "backend": jax.default_backend()}

    # Detect the device's grid-execution mode FIRST (r4 found it bimodal,
    # persisting tens of minutes): the probe raises the Pallas batch-tile
    # caps to 128 when the device overlaps grid steps (measured ~2.8x on
    # the U-238 kernel) and keeps the never-worse 32/64 caps when it
    # serializes rows. Everything below traces after this, so every
    # pallas number picks the caps up.
    try:
        from pyqmd_tpu.kernels import device_mode

        extras["device_mode"] = device_mode.probe_device_mode()
        extras["tile_caps"] = list(device_mode.current_caps())
    except Exception as e:
        extras["device_mode_error"] = f"{type(e).__name__}: {e}"[:200]

    # Fresh measurement AND the frozen r5 datum (BASELINE.json "measured"):
    # the fresh one tracks this machine today, the frozen one keeps the
    # cross-round multiplier on a shared denominator (r4 verdict weak #6).
    extras["python_reference_steps_per_sec"] = round(bench_python_reference(), 2)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")
        ) as f:
            extras["python_reference_steps_per_sec_frozen"] = json.load(f)[
                "measured"
            ]["python_reference_steps_per_sec"]
    except Exception:
        pass

    results = {}
    for backend in ("jnp", "pallas"):
        try:
            # More frames at small batches to amortize the single
            # end-of-chain readback RPC (~30 ms through the axon tunnel).
            for batch, frames in ((1, 100), (1024, 10), (10240, 5)):
                key = f"u238_{backend}_b{batch}"
                results[key] = bench_ensemble(92, 146, batch, backend, frames=frames)
                extras[key + "_nucleus_substeps_per_sec"] = round(results[key])
        except Exception as e:  # a backend failing must not kill the bench
            extras[f"{backend}_error"] = f"{type(e).__name__}: {e}"[:200]
        _emit(results, extras)  # partial line: headline known per backend

    # 64k-nucleus config (BASELINE bench matrix) on the faster backend.
    # frames=4: the r3 run used 2 and recorded a ~4% dip vs b10240 that
    # did not reproduce under longer measurement (VERDICT r3 weak #5a).
    best10k = _best_b10240(results)
    if best10k:
        backend = best10k.split("_")[1]
        try:
            v = bench_ensemble(92, 146, 65536, backend, frames=4)
            extras[f"u238_{backend}_b65536_nucleus_substeps_per_sec"] = round(v)
            results[f"u238_{backend}_b65536"] = v
        except Exception as e:
            extras["b65536_error"] = f"{type(e).__name__}: {e}"[:200]

    # 64k ensemble init time (pool method; VERDICT r2 weak #3). Warm
    # number: the compile is cached persistently in .jax_cache.
    try:
        st0 = ensemble_init(
            SimConfig.for_isotope(92, 146, pad_to=128), 65536, seed=0
        )
        np.asarray(st0.z)
        t0 = time.perf_counter()
        st0 = ensemble_init(
            SimConfig.for_isotope(92, 146, pad_to=128), 65536, seed=1
        )
        np.asarray(st0.z)
        extras["init_64k_seconds"] = round(time.perf_counter() - t0, 2)
        del st0
    except Exception as e:
        extras["init_error"] = f"{type(e).__name__}: {e}"[:200]

    # He-4 small-nucleus throughput, both backends: since r4 the Pallas
    # kernel packs 16 He-4 nuclei per 128-lane row (no P % 128 floor).
    # Completes the BASELINE bench matrix {He-4, U-238} x {1, 1k, 10k, 64k}.
    for backend in ("jnp", "pallas"):
        for batch, frames in ((1, 100), (1024, 10), (10240, 5), (65536, 2)):
            try:
                extras[f"he4_{backend}_b{batch}_nucleus_substeps_per_sec"] = round(
                    bench_ensemble(2, 2, batch, backend, frames=frames, pad_to=8)
                )
            except Exception as e:
                extras[f"he4_{backend}_b{batch}_error"] = f"{type(e).__name__}: {e}"[:200]
    _emit(results, extras)  # partial line: full throughput matrix done

    # Decay-only statistics throughput at 2M nuclei (VERDICT r3 weak #2).
    try:
        extras["c14_decay_only_b2m_nucleus_substeps_per_sec"] = round(
            bench_decay_only_throughput()
        )
    except Exception as e:
        extras["decay_only_error"] = f"{type(e).__name__}: {e}"[:200]

    # Sharded paths on the real TPU backend, 1-device mesh (r3 weak #3).
    try:
        rate, ring_diff = bench_sharded_tpu()
        extras["sharded_frame_tpu_ok"] = True
        extras["sharded_frame_tpu_nucleus_substeps_per_sec"] = round(rate)
        extras["ring_force_tpu_max_abs_diff"] = ring_diff
        extras["ring_force_tpu_ok"] = ring_diff < 1e-3
    except Exception as e:
        extras["sharded_frame_tpu_ok"] = False
        extras["sharded_tpu_error"] = f"{type(e).__name__}: {e}"[:200]
    _emit(results, extras)

    try:
        fps, ifps, rb_fps, exact = bench_render()
        extras["render_fps_800x600"] = round(fps, 1)
        # NOTE a protocol change under this key: r4 and earlier measured a
        # SERIAL full-RGB readback here (~13 fps); since r5 it is the
        # shipped interactive path (palettized uint8 payload, depth-6
        # async copy pipeline — VERDICT r4 item 4). The r4-comparable
        # serial number continues under render_fps_serial_rgb_readback.
        extras["render_fps_with_per_frame_tunnel_readback"] = round(ifps, 1)
        extras["render_fps_readback_protocol"] = (
            "palettized+pipelined depth6 (r5); r4 value was serial RGB"
        )
        extras["render_fps_serial_rgb_readback"] = round(rb_fps, 1)
        extras["render_packed_exact"] = bool(exact)
    except Exception as e:
        extras["render_error"] = f"{type(e).__name__}: {e}"[:200]

    try:
        extras["c14_halflife_rel_error_32k"] = round(bench_halflife_accuracy(), 5)
    except Exception as e:
        extras["halflife_error"] = f"{type(e).__name__}: {e}"[:200]

    # Million-nucleus statistics via the decay-only frame (forces skipped;
    # isotope trajectories bitwise-identical — see decay_ensemble_step).
    try:
        extras["c14_halflife_rel_error_2m_decay_only"] = round(
            bench_halflife_accuracy(batch=1 << 21, decay_only=True), 5
        )
    except Exception as e:
        extras["halflife_2m_error"] = f"{type(e).__name__}: {e}"[:200]

    try:
        extras["u238_b1_fused_substeps_per_sec"] = round(bench_fused_single())
    except Exception as e:
        extras["fused_error"] = f"{type(e).__name__}: {e}"[:200]

    try:
        exact_diff, fast_diff = bench_kernel_equivalence()
        extras["kernel_max_abs_diff"] = exact_diff
        extras["fastmath_max_abs_diff"] = fast_diff
    except Exception as e:
        extras["kernel_equiv_error"] = f"{type(e).__name__}: {e}"[:200]

    try:
        extras["leapfrog_max_abs_diff"] = bench_leapfrog_equivalence()
    except Exception as e:
        extras["leapfrog_error"] = f"{type(e).__name__}: {e}"[:200]

    try:
        p_exact, p_fast = bench_packed_kernel_equivalence()
        extras["he4_packed_max_abs_diff"] = p_exact
        extras["he4_packed_max_abs_diff_fastmath"] = p_fast
    except Exception as e:
        extras["packed_equiv_error"] = f"{type(e).__name__}: {e}"[:200]

    # Re-probe at the end: if the device flipped modes mid-bench the two
    # fields disagree, flagging which numbers to distrust.
    try:
        from pyqmd_tpu.kernels import device_mode

        extras["device_mode_end"] = device_mode.probe_device_mode(force=True)
    except Exception as e:
        extras["device_mode_end_error"] = f"{type(e).__name__}: {e}"[:200]

    _emit(results, extras)  # final line: everything


if __name__ == "__main__":
    main()
