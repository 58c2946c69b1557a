"""Checkpoint / resume: serialize the simulation state pytree.

The reference has no persistence at all — state lives in Python objects
and an isotope switch is a full reset (/root/reference/nuclear_sim.py:92-116,
SURVEY §5). Here the SoA pytree maps 1:1 onto an ``.npz`` archive (works
for single nuclei and batched ensembles alike), with the static config
stored alongside so a resume can rebuild the exact jit signature.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

import jax

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.state import NucleusState

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: NucleusState, cfg: SimConfig) -> None:
    """Write state + config to ``path`` (.npz)."""
    arrays = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }
    meta = json.dumps(
        {"version": _FORMAT_VERSION, "config": dataclasses.asdict(cfg)}
    )
    np.savez_compressed(path, __meta__=np.frombuffer(meta.encode(), np.uint8), **arrays)


def save_checkpoint_orbax(path: str, state: NucleusState, cfg: SimConfig) -> None:
    """Orbax variant for large / sharded ensembles: writes device arrays
    without gathering through host numpy (multi-host safe). ``path`` is a
    directory."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(path, "state"),
            {f.name: getattr(state, f.name) for f in dataclasses.fields(state)},
        )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"version": _FORMAT_VERSION, "config": dataclasses.asdict(cfg)}, f)


def load_checkpoint_orbax(
    path: str, sharding_state: NucleusState | None = None
) -> tuple[NucleusState, SimConfig]:
    """Restore an Orbax checkpoint.

    ``sharding_state`` (optional) is a template pytree — typically the
    sharded ensemble about to be replaced — whose shapes/dtypes/shardings
    the restore reproduces, so a mesh-sharded ensemble loads directly into
    its device layout instead of through replicated host arrays."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    if meta.get("version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta.get('version')}")
    cfg = SimConfig(**meta["config"])
    target = None
    if sharding_state is not None:
        target = {
            f.name: jax.ShapeDtypeStruct(
                getattr(sharding_state, f.name).shape,
                getattr(sharding_state, f.name).dtype,
                sharding=getattr(sharding_state, f.name).sharding,
            )
            for f in dataclasses.fields(sharding_state)
        }
    with ocp.StandardCheckpointer() as ckptr:
        arrays = ckptr.restore(os.path.join(path, "state"), target)
    return NucleusState(**{k: jax.numpy.asarray(v) for k, v in arrays.items()}), cfg


def load_checkpoint(path: str) -> tuple[NucleusState, SimConfig]:
    """Load (state, config) from an ``.npz`` checkpoint."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        if meta.get("version") != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta.get('version')}")
        cfg = SimConfig(**meta["config"])
        fields = {f.name for f in dataclasses.fields(NucleusState)}
        arrays = {k: jax.numpy.asarray(v) for k, v in data.items() if k in fields}
    missing = fields - set(arrays)
    if missing:
        raise ValueError(f"checkpoint missing fields: {sorted(missing)}")
    return NucleusState(**arrays), cfg
