"""Immutable SoA simulation state.

The reference keeps mutable Python ``Particle`` objects in lists
(particles.py:23-50, 58) and marshals them to flat arrays on every kernel
launch (nuclear_forces.py:190-199). Here the arrays *are* the state: a
registered-dataclass pytree with static shapes, so the whole step — forces,
integration, decay, ejecta — compiles into one XLA program and an ensemble
is just a leading batch axis added by ``vmap``.

Particle types and decay types follow particles.py:5-21; they are plain
ints (module-level constants) because enum objects cannot live in traced
arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pyqmd_tpu.config import SimConfig

# ParticleType (particles.py:5-11)
PROTON = 0
NEUTRON = 1
ALPHA = 2
ELECTRON = 3
GAMMA = 4
POSITRON = 5
NUM_PARTICLE_TYPES = 6

PARTICLE_TYPE_NAMES = ["PROTON", "NEUTRON", "ALPHA", "ELECTRON", "GAMMA", "POSITRON"]

# DecayType (particles.py:13-21)
DECAY_NONE = 0
DECAY_ALPHA = 1
DECAY_BETA_MINUS = 2
DECAY_BETA_PLUS = 3
DECAY_GAMMA = 4
DECAY_NEUTRON_EMISSION = 5
DECAY_PROTON_EMISSION = 6
DECAY_SPONTANEOUS_FISSION = 7
NUM_DECAY_TYPES = 8

DECAY_TYPE_NAMES = [
    "NONE",
    "ALPHA",
    "BETA_MINUS",
    "BETA_PLUS",
    "GAMMA",
    "NEUTRON_EMISSION",
    "PROTON_EMISSION",
    "SPONTANEOUS_FISSION",
]

# Decay symbols (nuclear_sim.py:548-559)
DECAY_SYMBOLS = ["-", "α", "β-", "β+", "γ", "n", "p", "SF"]

# Particle display radius (particles.py:30): nucleons 2.5, ejecta 1.0.
NUCLEON_RADIUS = 2.5
EJECTA_RADIUS = 1.0

# Base ejecta lifetimes by particle type (particles.py:31-38).
BASE_LIFETIMES = np.array([np.inf, np.inf, 2.0, 3.0, 1.0, 3.0], dtype=np.float32)

# Post-decay ejecta speed by particle type (nuclear_sim.py:296-313: the
# creator velocity is renormalized to a fixed per-type base speed, so the
# creator-side speeds at decay_chains.py:331-388 never survive).
EJECTA_SPEEDS = np.array([40.0, 40.0, 30.0, 50.0, 60.0, 50.0], dtype=np.float32)

# Particle colors, RGB 0-255 (particles.py:41-50).
PARTICLE_COLORS = np.array(
    [
        [255, 100, 100],  # proton
        [100, 100, 255],  # neutron
        [255, 200, 0],  # alpha
        [0, 255, 255],  # electron
        [0, 255, 0],  # gamma
        [255, 0, 255],  # positron
    ],
    dtype=np.uint8,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NucleusState:
    """State of one nucleus + its ejecta pool. Batch by vmapping.

    Nucleon arrays are padded to ``cfg.max_particles`` with ``alive``
    masks; ejecta live in a fixed ring buffer of ``cfg.max_ejecta`` slots
    (slot reuse replaces the reference's list append/remove,
    nuclear_sim.py:162, 349).
    """

    # Nucleons (the particles the force kernel acts on).
    pos: jax.Array  # (P, 2) f32
    vel: jax.Array  # (P, 2) f32
    ptype: jax.Array  # (P,) i32 — PROTON or NEUTRON
    alive: jax.Array  # (P,) bool

    # Nuclear identity.
    z: jax.Array  # () i32 protons
    n: jax.Array  # () i32 neutrons
    half_life: jax.Array  # () f32 seconds; +inf = stable (nucleus.stability)

    # Ejecta ring buffer.
    ej_pos: jax.Array  # (E, 2) f32
    ej_vel: jax.Array  # (E, 2) f32
    ej_type: jax.Array  # (E,) i32
    ej_age: jax.Array  # (E,) f32
    ej_life: jax.Array  # (E,) f32
    ej_alive: jax.Array  # (E,) bool
    ej_cursor: jax.Array  # () i32 next write slot

    # Reproducible in-step randomness (replaces random.random() at
    # particles.py:147, decay_chains.py:221, 332).
    rng: jax.Array  # (2,) uint32 raw key data

    # Metrics carried in-state so ensembles aggregate on device. Fixes the
    # reference's never-incremented decay_counts (rendering.py:208-212,
    # SURVEY C15).
    decay_counts: jax.Array  # (NUM_DECAY_TYPES,) i32

    # Simulation clock (sim seconds; nuclear_sim.py:54, 124) and the time
    # of the last decay event (nuclear_sim.py:113, 281), used for the
    # measured-or-synthetic decay-duration record (nuclear_sim.py:239-255).
    time_passed: jax.Array  # () f32
    last_decay_time: jax.Array  # () f32

    # Decay-chain event log: a fixed ring buffer replacing the reference's
    # unbounded ``nucleus.decay_chain`` list (nuclear_sim.py:271-278).
    # Entry i % L: parent (Z, N), decay type, daughter (Z, N), duration.
    chain_z0: jax.Array  # (L,) i32
    chain_n0: jax.Array  # (L,) i32
    chain_dtype: jax.Array  # (L,) i32
    chain_z1: jax.Array  # (L,) i32
    chain_n1: jax.Array  # (L,) i32
    chain_time: jax.Array  # (L,) f32
    chain_cursor: jax.Array  # () i32 — total entries ever written

    @property
    def capacity(self) -> int:
        return self.pos.shape[-2]

    @property
    def ejecta_capacity(self) -> int:
        return self.ej_pos.shape[-2]

    def alive_count(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32), axis=-1)

    def center_of_mass(self) -> jax.Array:
        """Mean position of alive nucleons (particles.py:205-208)."""
        w = self.alive.astype(self.pos.dtype)
        cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
        return jnp.sum(self.pos * w[..., None], axis=-2) / cnt

    def kinetic_energy(self) -> jax.Array:
        """Total kinetic energy of alive nucleons, ½Σ|v|² (unit masses) —
        the single definition used by both the metrics path and the
        driver's status panel."""
        w = self.alive.astype(self.vel.dtype)
        return 0.5 * jnp.sum(jnp.sum(self.vel * self.vel, axis=-1) * w, axis=-1)

    def rms_radius(self) -> jax.Array:
        """RMS distance of alive nucleons from the center of mass — the
        matter-radius observable (compare to the shell initializer's
        R = 1.2·A^(1/3) scale, particles.py:69). No reference analog; the
        reference never measures its own nuclei."""
        w = self.alive.astype(self.pos.dtype)
        cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
        d2 = jnp.sum(
            (self.pos - self.center_of_mass()[..., None, :]) ** 2, axis=-1
        )
        return jnp.sqrt(jnp.sum(d2 * w, axis=-1) / cnt)

    def replace(self, **kw: Any) -> "NucleusState":
        return dataclasses.replace(self, **kw)


def empty_state(cfg: SimConfig, seed: int = 0) -> NucleusState:
    """All-dead state with the right shapes/dtypes (no placement)."""
    p, e, l = cfg.max_particles, cfg.max_ejecta, cfg.max_chain_log
    key = jax.random.key_data(jax.random.PRNGKey(seed)).astype(jnp.uint32)
    return NucleusState(
        pos=jnp.zeros((p, 2), jnp.float32),
        vel=jnp.zeros((p, 2), jnp.float32),
        ptype=jnp.zeros((p,), jnp.int32),
        alive=jnp.zeros((p,), bool),
        z=jnp.asarray(0, jnp.int32),
        n=jnp.asarray(0, jnp.int32),
        half_life=jnp.asarray(jnp.inf, jnp.float32),
        ej_pos=jnp.zeros((e, 2), jnp.float32),
        ej_vel=jnp.zeros((e, 2), jnp.float32),
        ej_type=jnp.zeros((e,), jnp.int32),
        ej_age=jnp.zeros((e,), jnp.float32),
        ej_life=jnp.full((e,), jnp.inf, jnp.float32),
        ej_alive=jnp.zeros((e,), bool),
        ej_cursor=jnp.asarray(0, jnp.int32),
        rng=key,
        decay_counts=jnp.zeros((NUM_DECAY_TYPES,), jnp.int32),
        time_passed=jnp.asarray(0.0, jnp.float32),
        last_decay_time=jnp.asarray(0.0, jnp.float32),
        chain_z0=jnp.zeros((l,), jnp.int32),
        chain_n0=jnp.zeros((l,), jnp.int32),
        chain_dtype=jnp.zeros((l,), jnp.int32),
        chain_z1=jnp.zeros((l,), jnp.int32),
        chain_n1=jnp.zeros((l,), jnp.int32),
        chain_time=jnp.zeros((l,), jnp.float32),
        chain_cursor=jnp.asarray(0, jnp.int32),
    )
