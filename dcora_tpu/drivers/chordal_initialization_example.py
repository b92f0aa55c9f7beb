"""Chordal initialization demo
(mirrors examples/ChordalInitializationExample.cpp).

Usage: python -m dcora_tpu.drivers.chordal_initialization_example file.g2o
"""

from __future__ import annotations

import argparse
import time

import dcora_tpu  # noqa: F401
from dcora_tpu.core import lifted, problem as prob
from dcora_tpu.core.graph import LocalGraph
from dcora_tpu.core.init import chordal_initialization
from dcora_tpu.io import read_g2o_file
from dcora_tpu.utils.logger import Logger


def run(g2o_path: str, log_directory: str = "", verbose: bool = True):
    ds = read_g2o_file(g2o_path)
    t0 = time.time()
    T = chordal_initialization(ds.pose_pose_measurements)
    g = LocalGraph(0, ds.dim, ds.dim)
    g.set_measurements(ds.pose_pose_measurements)
    f = float(prob.cost(g.problem_data(), lifted.from_pose_array(T)))
    if verbose:
        print(
            f"chordal initialization: n={len(T)} f={f:.6f} "
            f"elapsed={time.time() - t0:.2f}s"
        )
    if log_directory:
        Logger(log_directory).log_trajectory(
            ds.dim, len(T), T, "chordal.txt"
        )
    return T, f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("g2o")
    ap.add_argument("--log-dir", default="")
    args = ap.parse_args()
    run(args.g2o, log_directory=args.log_dir)


if __name__ == "__main__":
    main()
