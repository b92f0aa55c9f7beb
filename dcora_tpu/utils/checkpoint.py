"""Solver checkpointing.

The reference has no checkpoint/resume (SURVEY.md 5); the closest artifact
is the staircase warm start. Here any solver state -- the lifted iterate,
active rank, robust weights, and auxiliary Nesterov state -- round-trips
through a single NPZ file, so long multi-rank runs can resume after
preemption.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from dcora_tpu.core.lifted import RAState


def save_checkpoint(path: str, X: RAState, rank: int,
                    weights: Optional[Dict[str, np.ndarray]] = None,
                    extra: Optional[Dict[str, Any]] = None):
    payload = {
        "rot": np.asarray(X.rot),
        "sph": np.asarray(X.sph),
        "trn": np.asarray(X.trn),
        "rank": np.asarray(rank),
    }
    if weights:
        for k, v in weights.items():
            payload[f"w_{k}"] = np.asarray(v)
    if extra:
        for k, v in extra.items():
            payload[f"x_{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez(tmp, **payload)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path: str):
    """Returns (X, rank, weights, extra)."""
    import jax.numpy as jnp

    with np.load(path) as z:
        X = RAState(
            rot=jnp.asarray(z["rot"]),
            sph=jnp.asarray(z["sph"]),
            trn=jnp.asarray(z["trn"]),
        )
        rank = int(z["rank"])
        weights = {
            k[2:]: z[k] for k in z.files if k.startswith("w_")
        }
        extra = {k[2:]: z[k] for k in z.files if k.startswith("x_")}
    return X, rank, weights, extra
