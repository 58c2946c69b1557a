"""Spontaneous-fission engine path.

No tabulated or predicted chain emits SPONTANEOUS_FISSION (exactly as in
the reference, where create_fission at decay_chains.py:373-388 is
unreachable from DECAY_CHAINS), so the table sampler is monkeypatched to
exercise the masked multi-fragment path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core import decay as decay_mod
from pyqmd_tpu.core.decay import apply_decay
from pyqmd_tpu.core.dynamics import FrameDynamics
from pyqmd_tpu.core.init import init_state
from pyqmd_tpu.state import ALPHA, DECAY_SPONTANEOUS_FISSION, NEUTRON


def test_fission_emits_2_or_3_fragments(monkeypatch):
    cfg = SimConfig.for_isotope(94, 150, pad_to=8)  # Pu-244
    dyn = FrameDynamics(
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1 / 240), jnp.float32(1 / 240)
    )

    def fake_branch(z, n, r):
        return (
            jnp.asarray(92, jnp.int32),
            jnp.asarray(148, jnp.int32),
            jnp.asarray(DECAY_SPONTANEOUS_FISSION, jnp.int32),
        )

    monkeypatch.setattr(decay_mod.tables, "sample_branch", fake_branch)

    frag_counts = set()
    for k in range(8):
        st = init_state(cfg, seed=0)
        st2, dtype = apply_decay(
            st, cfg, jax.random.PRNGKey(k), jnp.asarray(True), dyn
        )
        assert int(dtype) == DECAY_SPONTANEOUS_FISSION
        n_frag = int(st2.ej_alive.sum())
        frag_counts.add(n_frag)
        assert n_frag in (2, 3)  # randint(2,3), decay_chains.py:377
        types = np.asarray(st2.ej_type)[np.asarray(st2.ej_alive)]
        assert set(types.tolist()) <= {ALPHA, NEUTRON}  # decay_chains.py:383-388
        # Fragment speeds renormalized per type: alpha 30, neutron 40.
        speeds = np.linalg.norm(
            np.asarray(st2.ej_vel)[np.asarray(st2.ej_alive)], axis=-1
        )
        for t, s in zip(types, speeds):
            np.testing.assert_allclose(s, 30.0 if t == ALPHA else 40.0, rtol=1e-5)
        # Fission adjusts no nucleons (reference else-branch returns early).
        assert int(st2.alive.sum()) == int(st.alive.sum())
        np.testing.assert_array_equal(np.asarray(st2.vel), np.asarray(st.vel))
        # Z/N still update from the branch table.
        assert (int(st2.z), int(st2.n)) == (92, 148)
    assert frag_counts == {2, 3}  # both counts occur across seeds


def test_chain_log_ring_wraps():
    cfg = SimConfig.for_isotope(92, 146, pad_to=8, max_chain_log=4)
    st = init_state(cfg, seed=0)
    from pyqmd_tpu.core.decay import force_decay

    dyn = FrameDynamics(
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1 / 240), jnp.float32(1 / 240)
    )
    fd = jax.jit(lambda s, k: force_decay(s, cfg, k, dyn))
    key = jax.random.PRNGKey(0)
    for _ in range(6):
        key, k = jax.random.split(key)
        st, _ = fd(st, k)
    assert int(st.chain_cursor) == 7  # 1 initial + 6 decays
    # The last entry is at slot 6 % 4 = 2 and records the 6th decay.
    assert int(st.chain_z0[6 % 4]) == int(st.chain_z1[5 % 4])
