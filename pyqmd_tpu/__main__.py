"""``python -m pyqmd_tpu`` — alias for the CLI (the reference's entry
point is ``python nuclear_sim.py``, /root/reference/nuclear_sim.py:615-617).
"""

import sys

from pyqmd_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
