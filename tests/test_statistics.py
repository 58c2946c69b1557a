"""Statistical physics validation beyond single-stage decay.

The C-14 tests pin one-stage exponential decay (BASELINE 1% bar); this
module validates SEQUENTIAL decay — an ensemble walking a real chain
segment matches the closed-form Bateman solution for the intermediate
population. Forces are irrelevant to decay statistics, so the test drives
``maybe_decay`` directly (cheap on the CPU harness).

Chain segment: Pb-214 (T1/2 = 1608 s) -> Bi-214 (1194 s) -> Po-214
(164 us, i.e. instantly gone at this resolution). Bateman:
N2(t) = N0 * l1/(l2-l1) * (exp(-l1 t) - exp(-l2 t)).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from pyqmd_tpu.config import SimConfig
from pyqmd_tpu.core.decay import maybe_decay
from pyqmd_tpu.core.dynamics import FrameDynamics
from pyqmd_tpu.core.init import ensemble_init


def test_bateman_two_stage_chain():
    batch = 4096
    cfg = SimConfig.for_isotope(82, 132, pad_to=8)  # Pb-214
    states = ensemble_init(cfg, batch, seed=0)

    dt = 20.0  # sim-seconds per substep; dt > 0.01*T1/2 -> exact regime
    steps = 400  # 8000 s ~ 5 half-lives of the parent
    dyn = FrameDynamics(
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1 / 240), jnp.float32(dt)
    )

    def body(carry, _):
        st, key = carry
        key, k = jax.random.split(key)
        ks = jax.random.split(k, batch)
        st = jax.vmap(lambda s, kk: maybe_decay(s, cfg, kk, dyn)[0])(st, ks)
        n1 = jnp.sum((st.z == 82) & (st.n == 132))
        n2 = jnp.sum((st.z == 83) & (st.n == 131))
        return (st, key), (n1, n2)

    (_, _), (n1s, n2s) = jax.lax.scan(
        body, (states, jax.random.PRNGKey(7)), None, length=steps
    )
    n1s = np.asarray(n1s, np.float64)
    n2s = np.asarray(n2s, np.float64)
    t = dt * (np.arange(steps) + 1)

    # The engine uses the reference's truncated ln2 = 0.693 in the exact
    # regime via 1 - 2**(-dt/T): the effective per-step survival is
    # exactly 2**(-dt/T), i.e. lambda = ln(2)/T.
    l1 = math.log(2) / 1608.0
    l2 = math.log(2) / 1194.0
    n1_expect = batch * np.exp(-l1 * t)
    n2_expect = batch * l1 / (l2 - l1) * (np.exp(-l1 * t) - np.exp(-l2 * t))

    # Sigma-scaled bands (binomial sd), robust to the PRNG stream: accept
    # 5 sigma pointwise wherever the expected population is substantial.
    def sigma(expect):
        return np.sqrt(np.maximum(expect * (1.0 - expect / batch), 1.0))

    sel = n1_expect > 200
    dev1 = (np.abs(n1s - n1_expect) / sigma(n1_expect))[sel]
    assert dev1.max() < 5.0, dev1.max()

    sel = n2_expect > 300
    dev2 = (np.abs(n2s - n2_expect) / sigma(n2_expect))[sel]
    assert dev2.max() < 5.0, dev2.max()

    # Shape: the intermediate population rises then falls (a real peak
    # inside the window), unlike one-stage decay.
    peak = int(np.argmax(n2s))
    assert 0 < peak < steps - 1
    assert n2s[peak] > n2s[0] and n2s[peak] > n2s[-1]


def test_th232_series_end_to_end_simulation():
    """A Th-232 nucleus walks the completed thorium series to stable Pb-208
    inside the full jit'd frame loop (beyond-reference data through the
    whole stack: Bernoulli decay, branch tables, masked adjustment)."""
    from pyqmd_tpu import SimConfig, init_state, make_frame_fn

    cfg = SimConfig.for_isotope(90, 142, pad_to=8)
    fn = make_frame_fn(cfg, cfg.num_substeps(1 / 60, 3.15576e16))
    st = init_state(cfg, seed=7)  # seeded: decays early
    for _ in range(60):
        st, m = fn(st, 3.15576e16, 1 / 60)
        if int(st.z) == 82 and int(st.n) == 126:
            break
    assert (int(st.z), int(st.n)) == (82, 126)  # Pb-208
    counts = np.asarray(st.decay_counts)
    # Main path: 6 alpha + 4 beta- (the Bi-212 beta branch); the alpha
    # branch variant is 6a+4b too (orders differ), totals are fixed.
    assert counts[1] == 6 and counts[2] == 4, counts
    assert bool(jnp.all(jnp.isfinite(st.pos)))


def test_np237_series_end_to_end_simulation():
    """An Np-237 nucleus walks the (4n+1) neptunium series to Bi-209 —
    the series' effective endpoint at any simulated time scale (its
    2e19-year alpha decay to Tl-205 is tabulated but essentially frozen)
    — inside the full jit'd frame loop: 7 alpha + 4 beta-minus."""
    from pyqmd_tpu import SimConfig, init_state, make_frame_fn

    cfg = SimConfig.for_isotope(93, 144, pad_to=8)
    fn = make_frame_fn(cfg, cfg.num_substeps(1 / 60, 3.15576e16))
    st = init_state(cfg, seed=0)
    for _ in range(40):
        st, m = fn(st, 3.15576e16, 1 / 60)
        if int(st.z) == 83 and int(st.n) == 126:
            break
    assert (int(st.z), int(st.n)) == (83, 126)  # Bi-209
    counts = np.asarray(st.decay_counts)
    assert counts[1] == 7 and counts[2] == 4, counts
    assert bool(jnp.all(jnp.isfinite(st.pos)))
