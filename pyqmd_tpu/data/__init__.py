"""Nuclear data: half-life DB, decay chains, predictor, estimator, elements.

Source-of-truth Python tables (halflives/chains/elements) plus their dense
(Z, N)-indexed device form (tables) used inside the jit-compiled step.
Reference equivalents live in /root/reference/decay_chains.py and the
element tables in nuclear_sim.py:524-546 / rendering.py:480-526.
"""

from pyqmd_tpu.data.chains import DECAY_CHAINS, decay_branches, predict_decay
from pyqmd_tpu.data.elements import (
    element_name,
    element_symbol,
    isotope_label,
    parse_isotope,
)
from pyqmd_tpu.data.estimator import estimate_half_life, stability_score
from pyqmd_tpu.data.halflives import DAY, HALF_LIVES, HOUR, MINUTE, YEAR
from pyqmd_tpu.data.tables import half_life, half_life_host, sample_branch

__all__ = [
    "DECAY_CHAINS",
    "HALF_LIVES",
    "YEAR", "DAY", "HOUR", "MINUTE",
    "decay_branches",
    "predict_decay",
    "estimate_half_life",
    "stability_score",
    "element_name",
    "element_symbol",
    "isotope_label",
    "parse_isotope",
    "half_life",
    "half_life_host",
    "sample_branch",
]
