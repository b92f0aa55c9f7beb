"""Riemannian trust-region solver with truncated CG, in pure JAX.

TPU-native replacement for ROPTLIB's RTRNewton/RSD as configured by the
reference (QuadraticOptimizer.cpp:234-289): GRAD_F stopping on the Riemannian
gradient norm, Steihaug-Toint truncated CG inner loop with preconditioning,
initial radius 100 / max radius 5x, and the special one-accepted-step mode
used as the RBCD per-iteration solver (radius shrinks /4 on rejection, up to
10 tries; QuadraticOptimizer.cpp:253-273).

Everything is expressed over RAState pytrees inside lax.while_loop, so one
compilation serves every staircase level (rank masking) and every RBCD
iteration.

The Riemannian Hessian uses the Weingarten-corrected form for embedded
Stiefel/oblique submanifolds,

    Hess f(X)[eta] = P_T( Q eta - W(eta, egrad) ),
    W_rot_i = eta_i sym(Y_i^T egrad_i),   W_sph_q = eta_q <s_q, egrad_q>,

matching the curvature handling of ROPTLIB's EucHvToHv that the reference
relies on via QuadraticProblem::EucHessianEta.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dcora_tpu.core import problem as prob
from dcora_tpu.core.lifted import RAState
from dcora_tpu.core.manifold import retract, tangent_project
from dcora_tpu.core.problem import Preconditioner, ProblemData


@dataclasses.dataclass(frozen=True)
class RTRConfig:
    gradnorm_tol: float = 1e-2
    max_outer: int = 3
    max_inner: int = 50
    initial_radius: float = 100.0
    max_radius_factor: float = 5.0
    # tCG kappa/theta stopping rule
    kappa: float = 0.1
    theta: float = 1.0
    rho_accept: float = 0.1
    # Manopt-style rho regularization: near convergence the actual decrease
    # f(X) - f(X+) is dominated by eps*|f| cancellation noise, making rho
    # garbage and stalling the solver ~6 digits above the achievable
    # gradnorm.  Adding reg = rho_regularization*eps*max(1,|f|) to both
    # numerator and denominator drives rho -> 1 for noise-level steps.
    rho_regularization: float = 1e3
    # Run the tCG inner loop in float32 while the outer RTR (gradient,
    # cost, rho, retraction) stays in the data dtype.  TPU-native mixed
    # precision: f64 is emulated ~10-30x slower than native f32, and an
    # inexact Newton direction does not limit the achievable gradient norm
    # -- the f64 gradient and rho test do.  Ignored when the data is
    # already float32.
    tcg_f32: bool = False
    # one-accepted-step mode (RBCD): shrink radius /4 on rejection, <=10 tries
    single_accepted_step: bool = False
    max_rejections: int = 10


def riemannian_gradient(P: ProblemData, X: RAState, G: RAState) -> RAState:
    return tangent_project(X, prob.euclidean_gradient(P, X, G))


def _weingarten(X: RAState, eta: RAState, egrad: RAState) -> RAState:
    S = 0.5 * (
        jnp.einsum("nri,nrj->nij", X.rot, egrad.rot)
        + jnp.einsum("nrj,nri->nij", X.rot, egrad.rot)
    )
    w_rot = jnp.einsum("nrd,nde->nre", eta.rot, S)
    w_sph = eta.sph * jnp.sum(X.sph * egrad.sph, axis=-1, keepdims=True)
    return RAState(rot=w_rot, sph=w_sph, trn=jnp.zeros_like(eta.trn))


def riemannian_hessian_vec(P: ProblemData, X: RAState, eta: RAState,
                           egrad: RAState) -> RAState:
    H = prob.hessian_vec(P, eta) - _weingarten(X, eta, egrad)
    return tangent_project(X, H)


def _apply_precond(M: Optional[Preconditioner], X: RAState,
                   V: RAState) -> RAState:
    if M is None:
        return V  # V is already tangent
    return tangent_project(X, prob.apply_preconditioner(M, V))


class TCGResult(NamedTuple):
    eta: RAState
    Heta: RAState
    inner_iters: jax.Array


def truncated_cg(P: ProblemData, X: RAState, grad: RAState, egrad: RAState,
                 M: Optional[Preconditioner], radius, max_inner: int,
                 kappa: float, theta: float) -> TCGResult:
    """Preconditioned Steihaug-Toint tCG for the trust-region subproblem."""
    zero = jax.tree.map(jnp.zeros_like, grad)

    r0 = grad
    z0 = _apply_precond(M, X, r0)
    d0 = z0.scale(-1.0)
    r0_norm = r0.norm()
    stop_tol = r0_norm * jnp.minimum(kappa, r0_norm**theta)

    def hess(eta):
        return riemannian_hessian_vec(P, X, eta, egrad)

    def boundary_tau(eta, d, radius):
        # largest tau >= 0 with ||eta + tau d|| = radius
        dd = d.vdot(d)
        ed = eta.vdot(d)
        ee = eta.vdot(eta)
        disc = jnp.maximum(ed * ed - dd * (ee - radius**2), 0.0)
        return (-ed + jnp.sqrt(disc)) / jnp.where(dd == 0, 1.0, dd)

    State = tuple  # (eta, Heta, r, z, d, rz, it, done)

    def cond(s: State):
        _, _, _, _, _, _, it, done = s
        return jnp.logical_and(it < max_inner, jnp.logical_not(done))

    def body(s: State):
        eta, Heta, r, z, d, rz, it, done = s
        Hd = hess(d)
        dHd = d.vdot(Hd)
        alpha = rz / jnp.where(dHd == 0, 1.0, dHd)
        eta_next = eta + d.scale(alpha)
        hit = jnp.logical_or(dHd <= 0, eta_next.norm() >= radius)

        tau = boundary_tau(eta, d, radius)
        eta_b = eta + d.scale(tau)
        Heta_b = Heta + Hd.scale(tau)

        eta_new = jax.tree.map(
            lambda a, b: jnp.where(hit, a, b), eta_b, eta_next
        )
        Heta_new = jax.tree.map(
            lambda a, b: jnp.where(hit, a, b), Heta_b, Heta + Hd.scale(alpha)
        )
        r_new = r + Hd.scale(alpha)
        z_new = _apply_precond(M, X, r_new)
        rz_new = r_new.vdot(z_new)
        small = r_new.norm() <= stop_tol
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        d_new = z_new.scale(-1.0) + d.scale(beta)
        done_new = jnp.logical_or(hit, small)
        return (eta_new, Heta_new, r_new, z_new, d_new, rz_new, it + 1,
                done_new)

    init = (zero, zero, r0, z0, d0, r0.vdot(z0), jnp.zeros((), jnp.int32),
            r0_norm < 1e-300)
    eta, Heta, _, _, _, _, it, _ = jax.lax.while_loop(cond, body, init)
    return TCGResult(eta=eta, Heta=Heta, inner_iters=it)


def _run_tcg(P: ProblemData, X: RAState, grad: RAState, egrad: RAState,
             M: Optional[Preconditioner], radius, cfg: "RTRConfig"
             ) -> TCGResult:
    """Dispatch tCG at the working dtype or in float32 (cfg.tcg_f32).

    In mixed mode the returned eta is re-projected onto the f64 tangent
    space; Heta is the (f32-accurate) upcast, good enough for the
    rho-regularized acceptance test.
    """
    if cfg.tcg_f32 and grad.rot.dtype == jnp.float64:
        f32 = jnp.float32
        res = truncated_cg(
            _cast(P, f32), _cast(X, f32), _cast(grad, f32),
            _cast(egrad, f32), _cast(M, f32) if M is not None else None,
            jnp.asarray(radius, f32), cfg.max_inner, cfg.kappa, cfg.theta,
        )
        eta = tangent_project(X, _cast(res.eta, jnp.float64))
        return TCGResult(eta=eta, Heta=_cast(res.Heta, jnp.float64),
                         inner_iters=res.inner_iters)
    return truncated_cg(P, X, grad, egrad, M, radius, cfg.max_inner,
                        cfg.kappa, cfg.theta)


class RTRResult(NamedTuple):
    X: RAState
    f_final: jax.Array
    gradnorm_final: jax.Array
    outer_iters: jax.Array
    accepted: jax.Array  # whether any step was accepted


def _rtr_impl(P: ProblemData, G: RAState, M: Optional[Preconditioner],
              X0: RAState, cfg: RTRConfig) -> RTRResult:
    max_radius = cfg.initial_radius * cfg.max_radius_factor

    def f(X):
        return prob.cost(P, X, G)

    def rgrad(X):
        return riemannian_gradient(P, X, G)

    def step(X, radius):
        fX = f(X)
        egrad = prob.euclidean_gradient(P, X, G)
        grad = tangent_project(X, egrad)
        res = _run_tcg(P, X, grad, egrad, M, radius, cfg)
        Xtest = retract(X, res.eta)
        ftest = f(Xtest)
        model_decrease = -(grad.vdot(res.eta) + 0.5 * res.eta.vdot(res.Heta))
        reg = (cfg.rho_regularization * jnp.finfo(fX.dtype).eps
               * jnp.maximum(1.0, jnp.abs(fX)))
        rho = (fX - ftest + reg) / jnp.where(
            jnp.abs(model_decrease + reg) < 1e-300, 1e-300,
            model_decrease + reg,
        )
        accept = jnp.logical_and(rho > cfg.rho_accept,
                                 ftest <= fX + reg)
        hit_boundary = res.eta.norm() >= 0.99 * radius
        radius_new = jnp.where(
            rho < 0.25,
            radius / 4.0,
            jnp.where(
                jnp.logical_and(rho > 0.75, hit_boundary),
                jnp.minimum(2.0 * radius, max_radius),
                radius,
            ),
        )
        X_new = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), Xtest, X
        )
        return X_new, radius_new, accept

    if cfg.single_accepted_step:
        # RBCD mode (QuadraticOptimizer.cpp:253-273): keep shrinking the
        # radius (/4) until one step is accepted, or give up after
        # max_rejections tries.
        def cond(s):
            X, radius, it, accepted = s
            return jnp.logical_and(it <= cfg.max_rejections,
                                   jnp.logical_not(accepted))

        def body(s):
            X, radius, it, _ = s
            fX = f(X)
            egrad = prob.euclidean_gradient(P, X, G)
            grad = tangent_project(X, egrad)
            res = _run_tcg(P, X, grad, egrad, M, radius, cfg)
            Xtest = retract(X, res.eta)
            ftest = f(Xtest)
            model_decrease = -(grad.vdot(res.eta)
                               + 0.5 * res.eta.vdot(res.Heta))
            reg = (cfg.rho_regularization * jnp.finfo(fX.dtype).eps
                   * jnp.maximum(1.0, jnp.abs(fX)))
            rho = (fX - ftest + reg) / jnp.where(
                jnp.abs(model_decrease + reg) < 1e-300, 1e-300,
                model_decrease + reg,
            )
            accept = jnp.logical_and(rho > cfg.rho_accept,
                                     ftest <= fX + reg)
            X_new = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), Xtest, X
            )
            return (X_new, radius / 4.0, it + 1, accept)

        # skip if already below tolerance (QuadraticOptimizer.cpp:54-56)
        g0 = rgrad(X0).norm()
        below = g0 < cfg.gradnorm_tol
        X, _, it, accepted = jax.lax.while_loop(
            cond, body,
            (X0, jnp.asarray(cfg.initial_radius), jnp.zeros((), jnp.int32),
             below),
        )
        return RTRResult(
            X=X, f_final=f(X), gradnorm_final=rgrad(X).norm(),
            outer_iters=it, accepted=jnp.logical_or(accepted, below),
        )

    def cond(s):
        X, radius, it, done, any_acc = s
        return jnp.logical_and(it < cfg.max_outer, jnp.logical_not(done))

    def body(s):
        X, radius, it, done, any_acc = s
        X_new, radius_new, accept = step(X, radius)
        gnorm = rgrad(X_new).norm()
        done_new = gnorm < cfg.gradnorm_tol
        return (X_new, radius_new, it + 1, done_new,
                jnp.logical_or(any_acc, accept))

    g0 = rgrad(X0).norm()
    init_done = g0 < cfg.gradnorm_tol
    X, _, it, _, any_acc = jax.lax.while_loop(
        cond, body,
        (X0, jnp.asarray(cfg.initial_radius), jnp.zeros((), jnp.int32),
         init_done, init_done),
    )
    return RTRResult(
        X=X, f_final=f(X), gradnorm_final=rgrad(X).norm(), outer_iters=it,
        accepted=any_acc,
    )


# jit wrapper: cfg is static; M may be None (static in pytree structure)
rtr = jax.jit(_rtr_impl, static_argnames=("cfg",))


def rtr_chunked(P: ProblemData, G: RAState, M: Optional[Preconditioner],
                X0: RAState, cfg: RTRConfig,
                chunk: int = 20) -> RTRResult:
    """Host-chunked outer loop: repeatedly run at most `chunk` outer
    iterations per device call until the gradient tolerance or the total
    budget is met.

    Rationale: a single XLA program running for minutes trips RPC deadlines
    on tunneled single-chip setups, and chunking gives progress visibility
    at negligible cost (the chunk function is compiled once).
    """
    total = 0
    X = X0
    res = None
    cfg_c = dataclasses.replace(cfg, max_outer=min(chunk, cfg.max_outer))
    while total < cfg.max_outer:
        res = rtr(P, G, M, X, cfg_c)
        X = res.X
        total += int(res.outer_iters)
        if float(res.gradnorm_final) < cfg.gradnorm_tol or \
                int(res.outer_iters) < cfg_c.max_outer:
            break
    if res is None:
        res = rtr(P, G, M, X, dataclasses.replace(cfg, max_outer=1))
    return RTRResult(X=res.X, f_final=res.f_final,
                     gradnorm_final=res.gradnorm_final,
                     outer_iters=jnp.asarray(total),
                     accepted=res.accepted)


def _cast(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def rtr_mixed(P: ProblemData, G: RAState, M: Optional[Preconditioner],
              X0: RAState, cfg: RTRConfig,
              coarse_tol: float = 1e-3) -> RTRResult:
    """Mixed-precision trust region: a float32 coarse solve (native-speed on
    TPU; f64 is emulated) followed by a float64 refinement from the warm
    start. The refined result satisfies the same f64 gradient tolerance as
    a pure-f64 solve; only the path there changes. This is a TPU-specific
    capability with no reference counterpart (the reference is f64-only
    Eigen, QuadraticProblem.cpp).
    """
    grad0 = riemannian_gradient(P, X0, G).norm()
    tol32 = max(coarse_tol, cfg.gradnorm_tol)
    cfg32 = dataclasses.replace(
        cfg, gradnorm_tol=max(tol32, 1e-6 * float(grad0) + 1e-30)
    )
    res32 = rtr(_cast(P, jnp.float32), _cast(G, jnp.float32),
                _cast(M, jnp.float32) if M is not None else None,
                _cast(X0, jnp.float32), cfg32)
    from dcora_tpu.core.manifold import project

    X_warm = project(_cast(res32.X, jnp.float64))
    return rtr(P, G, M, X_warm, cfg)


def rgd_step(P: ProblemData, G: RAState, M: Optional[Preconditioner],
             X: RAState, stepsize: float) -> RAState:
    """Single preconditioned Riemannian gradient step
    (reference: QuadraticOptimizer.cpp:110-180)."""
    grad = riemannian_gradient(P, X, G)
    if M is not None:
        grad = _apply_precond(M, X, grad)
    return retract(X, grad.scale(-stepsize))
