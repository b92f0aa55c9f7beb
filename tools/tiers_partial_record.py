"""Record an HONEST in-progress tiers.pyfg parity row from the staircase
checkpoint.

The round-4 artifact was a known-false certification (engine said
certified at rank 4; the LDL^T inertia witness proves lambda_min(S) =
-7.7e-3 there; see VERDICT round 4, Missing #1).  The fixed fail-closed
pipeline escapes that saddle instead of certifying it, but the full
re-certification run exceeds the round's wall clock.  This tool replaces
the false artifact with the truth: the current checkpointed iterate,
independently verified (cost, Riemannian gradnorm, LDL-based certificate
verdict), marked certified=false / in_progress=true, with the resumable
checkpoint committed alongside.

Usage: python tools/tiers_partial_record.py [checkpoint.npz]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

REPO = os.path.join(os.path.dirname(__file__), os.pardir)


def main():
    ckpt = (sys.argv[1] if len(sys.argv) > 1
            else "/tmp/dcora_ckpt_tiers.pyfg.npz")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import dcora_tpu  # noqa: F401
    from dcora_tpu import verification as V
    from dcora_tpu.core import lifted, problem as prob
    from dcora_tpu.core.certify import round_solution
    from dcora_tpu.core.graph import LocalGraph
    from dcora_tpu.core.manifold import tangent_project
    from dcora_tpu.io import read_pyfg_file
    from dcora_tpu.io.remap import get_global_measurements
    from dcora_tpu.types import GraphType
    from dcora_tpu.utils.checkpoint import load_checkpoint

    path = "/root/reference/data/tiers.pyfg"
    ds = read_pyfg_file(path)
    gm = get_global_measurements(ds)
    g = LocalGraph(0, ds.dim, ds.dim, GraphType.RangeAidedSLAMGraph)
    g.set_measurements(gm.relative_measurements)
    X, r, _, _ = load_checkpoint(ckpt)
    P = g.problem_data()
    G = lifted.zeros(X.dims, X.r)
    f = float(prob.cost(P, X, G))
    gn = float(tangent_project(
        X, prob.euclidean_gradient(P, X, G)).norm())
    rounded = round_solution(X)
    f_rounded = float(prob.cost(P, rounded))

    rep = V.verify_solution(gm.relative_measurements, X, ds.dim, eta=1e-4)

    rec = {
        "certified": False,
        "in_progress": True,
        "final_rank": int(X.r),
        "f_final": f,
        "f_rounded": f_rounded,
        "gradnorm_final": gn,
        "note": (
            "staircase in progress at round end under the fail-closed "
            "certifier (TPU trace, 2026-08-21): rank 2 f=2050.101295 "
            "(exactly the round-4 run's f_rounded) gradnorm 4.4e-4, "
            "LDL-proven indefinite theta=-4.7 -> escaped; rank 3 "
            "f=1933.887753 gradnorm 3.0e-4, LDL-proven indefinite "
            "theta=-0.97 -> escaped; rank 4 solve reached the state "
            "recorded here when the round's wall clock expired.  The "
            "round-4 artifact falsely certified a rank-4 point with "
            "f=1919.11; this row replaces it with the truthful "
            "in-progress state.  Resume from "
            "artifacts/tiers_checkpoint_r5.npz via tools/parity.py "
            "--configs tiers"
        ),
    }
    rec.update(rep)
    rec["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
    rec["platform"] = "tpu+cpu_verify"

    shutil.copy(ckpt, os.path.join(REPO, "artifacts",
                                   "tiers_checkpoint_r5.npz"))
    out = os.path.join(REPO, "artifacts", "parity", "tiers.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1, default=float)
    print(json.dumps(rec, indent=1, default=float))


if __name__ == "__main__":
    main()
