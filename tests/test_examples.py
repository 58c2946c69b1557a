"""Every example under examples/ runs end to end (small sizes).

The examples are living documentation of the library surface; until this
module they were only exercised manually — a refactor could silently break
them between rounds (a prior review caught exactly that for the movie
example's time scale). Each runs in a subprocess so its own
platform/XLA_FLAGS setup applies, with sizes small enough for the CPU
suite.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CASES = {
    "survival_curve.py": ["--cpu", "--batch", "512"],
    "mixed_population.py": ["--cpu", "--quick"],
    "sharded_survival.py": ["--cpu", "--per-device", "64"],
    "bateman_vs_ensemble.py": ["--cpu", "--batch", "512"],
    "decay_chain_movie.py": ["--cpu", "--frames", "40"],
}


@pytest.mark.parametrize("script", sorted(_CASES))
def test_example_runs(script, tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "examples", script)]
        + _CASES[script],
        cwd=tmp_path,  # examples write CSVs/PNGs into the CWD
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, (
        f"{script} failed:\n--- stdout ---\n{proc.stdout[-2000:]}"
        f"\n--- stderr ---\n{proc.stderr[-2000:]}"
    )
    assert proc.stdout.strip()  # every example reports something


def test_examples_list_is_complete():
    """A new example must be added to the smoke matrix."""
    on_disk = {
        f for f in os.listdir(os.path.join(_REPO, "examples"))
        if f.endswith(".py") and not f.startswith("_")  # _helpers exempt
    }
    assert on_disk == set(_CASES), on_disk ^ set(_CASES)
