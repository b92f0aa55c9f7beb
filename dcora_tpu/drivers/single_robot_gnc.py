"""Robust single-robot PGO with GNC-TLS
(mirrors examples/SingleRobotGNCExample.cpp).

Usage: python -m dcora_tpu.drivers.single_robot_gnc file.g2o
"""

from __future__ import annotations

import argparse
import logging
import time

import dcora_tpu  # noqa: F401
from dcora_tpu.io import read_g2o_file
from dcora_tpu.solvers import SolveRobustPGOParams, solve_robust_pgo
from dcora_tpu.types import ROptParameters, RobustCostParameters, RobustCostType
from dcora_tpu.utils.logger import Logger


def run(g2o_path: str, log_directory: str = "", verbose: bool = True,
        robust_params: RobustCostParameters = None):
    ds = read_g2o_file(g2o_path)
    ms = [m for m in ds.pose_pose_measurements]
    t0 = time.time()
    rp = robust_params or RobustCostParameters(
        costType=RobustCostType.GNC_TLS
    )
    rp.costType = RobustCostType.GNC_TLS
    params = SolveRobustPGOParams(
        opt_params=ROptParameters(gradnorm_tol=1e-2, RTR_iterations=50),
        robust_params=rp,
        verbose=verbose,
    )
    T = solve_robust_pgo(ms, params)
    rejected = sum(1 for m in ms if not m.fixedWeight and m.weight < 1e-8)
    loop_closures = sum(1 for m in ms if not m.fixedWeight)
    if verbose:
        print(
            f"solveRobustPGO: rejected {rejected}/{loop_closures} loop "
            f"closures, elapsed={time.time() - t0:.1f}s"
        )
    if log_directory:
        Logger(log_directory).log_trajectory(
            ds.dim, len(T), T, "dcora_gnc.txt"
        )
        Logger(log_directory).log_measurements(ms, "measurements.txt")
    return T, ms


def main():
    from dcora_tpu.config import DcoraConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("g2o")
    ap.add_argument("--log-dir", default="")
    DcoraConfig.add_cli(ap)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    cfg = DcoraConfig.from_cli(args)
    logging.getLogger(__name__).info("config:\n%s", cfg.dump())
    run(args.g2o, log_directory=args.log_dir, robust_params=cfg.robust)


if __name__ == "__main__":
    main()
