"""Example: population half-life statistics from a C-14 ensemble.

Runs a 16k-nucleus C-14 ensemble for three half-lives, writes the survival
curve as CSV, and prints the MLE half-life against the tabulated 5,730
years. This is the workflow the reference cannot do at all (one nucleus
per process, nuclear_sim.py:48).

    python examples/survival_curve.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true", help="run on the CPU backend")
parser.add_argument("--batch", type=int, default=16384)
args = parser.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from pyqmd_tpu.analysis import decay_rate_summary, survival_curve  # noqa: E402

res = survival_curve(6, 8, batch=args.batch, frames=30, half_lives=3.0, seed=0)
with open("c14_survival.csv", "w") as f:
    f.write(res.to_csv())
print(json.dumps(decay_rate_summary(res), indent=2))
print(f"fitted half-life error: {res.rel_error * 100:.2f}%")
print("curve written to c14_survival.csv")
