#!/usr/bin/env python3
"""Pairwise comparison of saved state files — the parity tool
(reference scripts/compare_states.py). Prints norms and the matrix of
relative differences; states written by the reference framework load too
(same on-disk format)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.realpath(__file__)), ".."))

from wxfactory_tpu.output.state import load_state  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("files", nargs="+", help="State files (.npy) to compare")
    parser.add_argument("--plot", action="store_true", help="Plot the difference fields")
    args = parser.parse_args(argv)

    states = []
    for f in args.files:
        state, _config, _version = load_state(f, panel_major=False)
        states.append(np.asarray(state))

    norms = [np.linalg.norm(s) for s in states]
    print("Norms:", np.array(norms))

    n = len(states)
    print("Relative differences:")
    header = "    " + "  ".join(f"{j:9d}" for j in range(n))
    print(header)
    for i in range(n):
        row = [f"{i:3d}"]
        for j in range(n):
            if j <= i:
                row.append(" " * 9)
            else:
                d = np.linalg.norm(states[i] - states[j]) / max(np.linalg.norm(states[i]), 1e-300)
                row.append(f"{d:9.2e}")
        print("  ".join(row))

    if args.plot and n >= 2:
        import matplotlib.pyplot as plt

        diff = np.abs(states[0] - states[1])
        flat = diff.reshape(diff.shape[0] * diff.shape[1], -1) if diff.ndim > 2 else diff
        plt.imshow(flat, aspect="auto")
        plt.colorbar()
        plt.title("abs difference, state 0 vs 1")
        plt.savefig("state_diff.png", dpi=120)
        print("Wrote state_diff.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
