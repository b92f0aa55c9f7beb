"""dcora_tpu: TPU-native distributed certifiably-correct range-aided SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of adthoms/dcora
(DCORA: Distributed Certifiably Correct Range-Aided SLAM, arXiv:2503.03192):

  * rank-restricted SDP relaxation over a product manifold
    St(d,r)^n x OB(r)^l x R^{r x (n+b)}  (reference: QuadraticProblem.h:30-40)
  * Riemannian staircase with min-eigenvalue certification and saddle escape
  * distributed Riemannian block-coordinate descent (RBCD / RBCD++) across
    agents with separator (public state) exchange
  * GNC robust weighting (TLS), chordal/odometry initialization

Design deltas from the reference (TPU-first, not a port):
  * state is dense structured arrays, manifold ops are pure batched functions
  * cost is matrix-free: measurement SoA -> gather/einsum/segment-sum; a
    dense-Q MXU path is used for small problems
  * the full staircase runs at a static allocation rank r_max with row
    masking, so one compiled step serves every staircase level
  * sparse Cholesky (CHOLMOD/SPQR/Spectra) is replaced by block-Jacobi
    preconditioned tCG, CG least-squares, and matrix-free Lanczos
"""

import os

# Platform override: the axon TPU plugin registers via sitecustomize and
# ignores JAX_PLATFORMS, so drivers/tools need an in-code switch.  Set
# DCORA_PLATFORM=cpu to force CPU (exact f64, no chip contention).
if os.environ.get("DCORA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DCORA_PLATFORM"])

# Certification and noiseless fixed-point parity require double precision
# (reference test bar: 1e-9, tests/testAgent.cpp:20).
if os.environ.get("DCORA_TPU_X64", "1") == "1":
    import jax

    jax.config.update("jax_enable_x64", True)
    # f64 matmuls on TPU must not be decomposed into low-precision passes.
    jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: first TPU compiles take 20-40 s each
# through the remote compiler; cached reloads are ~instant across runs.
if os.environ.get("DCORA_JAX_CACHE", "1") == "1":
    import jax

    _cache_dir = os.environ.get(
        "DCORA_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "dcora_tpu",
                     "jax_cache"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort (read-only FS etc.)
        pass

from dcora_tpu.types import (  # noqa: E402
    AgentParameters,
    BlockSelectionRule,
    GraphType,
    InitializationMethod,
    ROptParameters,
    RobustCostParameters,
    RobustCostType,
    StateType,
)

__version__ = "0.1.0"

__all__ = [
    "AgentParameters",
    "BlockSelectionRule",
    "GraphType",
    "InitializationMethod",
    "ROptParameters",
    "RobustCostParameters",
    "RobustCostType",
    "StateType",
]
