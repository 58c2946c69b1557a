"""Nuclear data: element names, half-life DB, decay-chain DB, and the dense
(Z, N)-indexed device tables derived from them."""

from pyqmd_tpu.data.elements import element_symbol, element_name
from pyqmd_tpu.data.halflives import HALF_LIVES, estimate_half_life, half_life_of
from pyqmd_tpu.data.chains import DECAY_CHAINS, predict_decay_modes, decay_modes_of
from pyqmd_tpu.data.tables import NuclearTables, get_tables

__all__ = [
    "element_symbol",
    "element_name",
    "HALF_LIVES",
    "estimate_half_life",
    "half_life_of",
    "DECAY_CHAINS",
    "predict_decay_modes",
    "decay_modes_of",
    "NuclearTables",
    "get_tables",
]
