#!/usr/bin/env python3
"""Regenerate field output (NetCDF / plots) from a saved state file
(reference scripts/output_from_state.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.realpath(__file__)), ".."))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("state_file", help="Saved state (.npy with embedded config)")
    parser.add_argument("--plot", default=None, help="Write a PNG of the first variable to this path")
    args = parser.parse_args(argv)

    from wxfactory_tpu.output.state import load_state

    state, config, version = load_state(args.state_file)
    if config is None:
        print("State file has no embedded configuration")
        return 1
    print(f"State version {version}: {config.equations} case {config.case_number}, shape {state.shape}")

    if args.plot:
        import matplotlib.pyplot as plt

        from wxfactory_tpu.geometry import make_cubed_sphere_2d

        if config.grid_type == "cubed_sphere" and config.equations == "shallow_water":
            geom = make_cubed_sphere_2d(config.num_elements_horizontal, config.num_solpts,
                                        config.lambda0, config.phi0, config.alpha0)
            blocks = geom.to_single_block(state[0])
            fig, axes = plt.subplots(2, 3, figsize=(12, 7))
            for p in range(6):
                ax = axes[p // 3][p % 3]
                im = ax.imshow(np.asarray(blocks[p]), origin="lower")
                ax.set_title(f"panel {p}")
                fig.colorbar(im, ax=ax, shrink=0.8)
            fig.suptitle(f"h — {os.path.basename(args.state_file)}")
        else:
            fig = plt.figure(figsize=(8, 5))
            flat = state[0].reshape(state.shape[1], -1) if state.ndim > 2 else state
            plt.imshow(np.asarray(flat), aspect="auto", origin="lower")
            plt.colorbar()
        fig.savefig(args.plot, dpi=120)
        print(f"Wrote {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
