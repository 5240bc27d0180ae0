"""MAP optimization + Laplace approximation on the unconstrained posterior.

Purpose (BASELINE.json north-star): make the ESS/sec measurement *valid* by
starting chains in the typical set with a posterior-scaled metric.  At
n=100k the hyperparameter posterior concentrates at O(1/sqrt(n)) scale in
unconstrained coordinates; cold-started NUTS with a unit metric spends its
whole warmup budget finding the mode (round-2 bench: R-hat 8.4).  A few
hundred Adam steps on the same differentiable log-posterior cost less than
a handful of NUTS iterations and place every chain (plus the mass matrix)
where warmup only needs to fine-tune.

The reference has no optimizer at all (MCMC only — SURVEY.md section 3.2);
this is new TPU-native machinery over the shared ``full_logpost``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

__all__ = ["MAPResult", "map_fit", "laplace_moments", "laplace_variance"]


class MAPResult(NamedTuple):
    u: jax.Array  # (k,) MAP point, unconstrained coordinates
    value: jax.Array  # log-posterior at u
    laplace_var: jax.Array  # (k,) diagonal posterior variance estimate
    laplace_cov: jax.Array  # (k, k) dense posterior covariance estimate —
    # the NUTS dense metric (init_inv_mass); smooth-kernel NNGP posteriors
    # sit on a correlated (sigma2, phi) ridge a diagonal metric cannot follow
    converged: jax.Array  # |grad|_inf below tolerance at the end
    trace: jax.Array  # (n_steps,) log-posterior trace


def map_fit(
    logpost_fn: Callable,
    u0,
    n_steps: int = 300,
    learning_rate: float = 5e-2,
    grad_tol: float = 1e-2,
) -> MAPResult:
    """Adam ascent on ``logpost_fn`` from ``u0``; returns the best iterate
    (not the last — Adam can overshoot on stiff posteriors) plus a Laplace
    diagonal-variance estimate at that point.

    One jitted program; cost = ``n_steps`` value_and_grad evaluations of the
    target (each one fused Vecchia suffstats pass on the Pallas backend).
    """
    u0 = jnp.asarray(u0)
    vg = jax.value_and_grad(logpost_fn)
    opt = optax.adam(learning_rate)

    def body(carry, _):
        u, opt_state, best_u, best_v = carry
        v, g = vg(u)
        # maximize: step along +grad (optax minimizes, so negate)
        updates, opt_state = opt.update(jax.tree.map(jnp.negative, g), opt_state)
        u_new = optax.apply_updates(u, updates)
        better = v > best_v
        best_u = jnp.where(better, u, best_u)
        best_v = jnp.where(better, v, best_v)
        return (u_new, opt_state, best_u, best_v), v

    init = (u0, opt.init(u0), u0, jnp.asarray(-jnp.inf, u0.dtype))
    (u_last, _, best_u, best_v), trace = lax.scan(
        body, init, None, length=n_steps
    )
    # prefer the final iterate when it improves on the running best
    v_last, g_last = vg(u_last)
    better = v_last > best_v
    u_map = jnp.where(better, u_last, best_u)
    v_map = jnp.where(better, v_last, best_v)
    _, g_map = vg(u_map)
    converged = jnp.max(jnp.abs(g_map)) < grad_tol
    var, cov = laplace_moments(logpost_fn, u_map)
    return MAPResult(
        u=u_map, value=v_map, laplace_var=var, laplace_cov=cov,
        converged=converged, trace=trace,
    )


def laplace_moments(
    logpost_fn: Callable, u_map, rel_floor: float = 1e-8, fd_step: float = 1e-3
):
    """(diagonal variance, dense covariance) of the Laplace approximation
    H^{-1} with H = -hessian(logpost) at the MAP.

    The Hessian is a central finite difference of the (exact) gradient —
    2k gradient passes per pass for the tiny unconstrained dimension (3-5
    hyperparameters + p fixed effects).  NOT ``jax.hessian``: the Pallas
    backend's log-posterior is a ``custom_vjp`` function (analytic fused
    VJP, ops/pallas_bf.py) and custom_vjp functions cannot be forward-mode
    differentiated.

    TWO passes with posterior-scale-aware steps: at n=100k the fp32
    gradient carries O(0.1-1) accumulation noise, and a fixed small step
    amplifies it to O(noise/h) Hessian noise — measured to swamp the true
    (sigma2, phi) curvatures (~10-40) and hand NUTS a garbage dense metric.
    Pass 1 (h = fd_step) gets rough scales; pass 2 re-differences with
    h_i = 0.5 sd_i, making the noise relative to H_ii ~ noise * sd_i (<10%)
    at O(h^2/sd^2) = 25% truncation — accurate enough for a mass matrix.
    Non-positive curvature directions (MAP not fully converged, flat nu)
    fall back to a unit scale so the result is always a valid metric."""
    u_map = jnp.asarray(u_map)
    k = u_map.shape[0]
    grad_fn = jax.grad(logpost_fn)
    eye = jnp.eye(k, dtype=u_map.dtype)

    def moments(steps):
        def col(_, row):
            e, h = row[:-1], row[-1]
            gc = (grad_fn(u_map + h * e) - grad_fn(u_map - h * e)) / (2.0 * h)
            return None, gc

        rows = jnp.concatenate([eye, steps[:, None]], axis=1)
        _, h_rows = lax.scan(col, None, rows)  # row i = d grad / d u_i
        h = -0.5 * (h_rows + h_rows.T)  # symmetrized -hessian
        # SoftAbs-style robust inverse (Betancourt 2013): clamp eigenvalue
        # MAGNITUDES away from zero.  A not-fully-converged MAP on a
        # posterior ridge (e.g. the (sigma2, phi, nu) trade-off of a
        # sampled-nu Matern, SPEC config 3) leaves H indefinite; an
        # all-or-nothing identity fallback there hands NUTS a unit metric
        # that cannot traverse the ridge and the chains freeze (measured:
        # R-hat 35 at n=25k).  |eigenvalue| keeps the curvature SCALES and
        # correlation directions of the good subspace, which is exactly
        # what a mass matrix needs; identity remains only for non-finite
        # results.
        evals, evecs = jnp.linalg.eigh(h)
        floor = jnp.maximum(jnp.max(jnp.abs(evals)) * rel_floor, 1e-30)
        safe = jnp.maximum(jnp.abs(evals), floor)
        hinv = (evecs / safe[None, :]) @ evecs.T
        var = jnp.diag(hinv)
        bad = ~jnp.all(jnp.isfinite(var))
        var = jnp.where(bad, jnp.ones((k,), u_map.dtype), var)
        cov = jnp.where(bad, jnp.eye(k, dtype=u_map.dtype), hinv)
        return var, cov

    step0 = jnp.full((k,), jnp.asarray(fd_step, u_map.dtype))
    var1, _ = moments(step0)
    steps = jnp.clip(0.5 * jnp.sqrt(var1), fd_step, 1.0)
    return moments(steps)


def laplace_variance(
    logpost_fn: Callable, u_map, rel_floor: float = 1e-8, fd_step: float = 1e-3
):
    """Diagonal of :func:`laplace_moments` (backward-compatible helper)."""
    return laplace_moments(logpost_fn, u_map, rel_floor, fd_step)[0]
