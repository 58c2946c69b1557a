"""Sharded C-14 survival statistics on a device mesh.

Demonstrates the multi-chip workflow end to end on ANY machine: with real
TPUs the mesh spans the chips; here it runs identically on 8 virtual CPU
devices. The same code scales to a pod by calling
``initialize_multihost()`` first (the ``data`` axis then lays across DCN).

  * ``ensemble_init`` (pool placement) -> ``shard_ensemble`` over a 1-D
    ``data`` mesh,
  * ``make_sharded_run_fn``: whole frame sequences in ONE sharded dispatch,
    decay counters and survivor counts psum'd over ICI,
  * half-life recovered from the psum'd survivor count.

Run: python examples/sharded_survival.py
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# With real TPUs the mesh spans them; pass --platform cpu to demo the
# 8-virtual-device mesh anywhere (this image pins TPU via sitecustomize,
# so the override must go through jax.config, not env vars).
if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
elif jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.init import ensemble_init
from pyqmd_tpu.parallel import (
    initialize_multihost,
    make_mesh,
    make_sharded_run_fn,
    shard_ensemble,
)

HL = 5730 * 31557600.0  # C-14 (decay_chains.py:37)


def main():
    initialize_multihost()  # no-op on one host; DCN init on a pod
    mesh = make_mesh()  # 1-D 'data' axis over every device
    n_dev = mesh.devices.size

    cfg = SimConfig.for_isotope(6, 8, pad_to=8)
    batch = 1024 * n_dev
    states = shard_ensemble(ensemble_init(cfg, batch, seed=0), mesh)
    print(f"{batch} C-14 nuclei over {n_dev} devices ({jax.default_backend()})")

    # 2 tabulated half-lives of sim time in 20 fused dispatches.
    frames_per_dispatch, dispatches, substeps = 5, 4, 10
    sim_seconds = 2.0 * HL
    frame_dt = 1.0
    time_scale = sim_seconds / (frames_per_dispatch * dispatches * frame_dt)
    run = make_sharded_run_fn(cfg, substeps, frames_per_dispatch, mesh)
    for _ in range(dispatches):
        states, metrics = run(states, time_scale, frame_dt)

    surv = int(metrics["survivors"]) / batch
    fit_hl = math.log(2) * sim_seconds / -math.log(max(surv, 1e-9))
    err = abs(fit_hl - HL) / HL
    print(f"survival after 2 T1/2: {surv:.4f} (expect 0.25)")
    print(f"fitted half-life: {fit_hl / 31557600.0:.0f} yr "
          f"(tabulated 5730; rel. error {err:.2%})")
    assert err < 0.05, "statistical fit out of tolerance"


if __name__ == "__main__":
    main()
