"""Sequential Monte Carlo with likelihood tempering — the particle-parallel
sampler of the rebuild mandate (BASELINE.json north star: 'SMC resampling
done through psum/all_gather collectives'; SPEC config 4).

Algorithm (adaptive tempered SMC, Del Moral et al. style):
  - particles start from the prior at inverse temperature beta = 0;
  - each stage picks the next beta adaptively (bisection so the effective
    sample size of the incremental weights stays near a target fraction),
    reweights, systematically resamples when ESS drops, and rejuvenates
    with a few random-walk Metropolis steps targeting
    p(u)^: prior(u) * lik(u)^beta, with proposal covariance estimated from
    the current particle cloud (the classic adaptive RW scale 2.38^2/d);
  - at beta = 1 the weighted cloud targets the posterior and the
    accumulated log-normalizers give the model evidence log Z.

Structure: one jitted ``stage_fn`` per tempering stage, driven by a host
loop (naturally bounded device programs — see models/base.py chunking
rationale).  The particle axis is the data-parallel axis: vmapped here,
sharded across devices via the same mechanism as chains (the weight
normalization / ESS terms become psum's under sharding; resampling gathers
the cloud — cheap because particles are k-dim hyperparameter vectors, not
fields).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pynngp_tpu.utils.jit import jit_bound

__all__ = ["SMCState", "smc_sample", "systematic_resample"]


class SMCState(NamedTuple):
    u: jax.Array  # (N, k) particles (unconstrained)
    loglik: jax.Array  # (N,) log-likelihood at u
    logprior: jax.Array  # (N,)
    logw: jax.Array  # (N,) unnormalized log-weights
    beta: jax.Array  # scalar inverse temperature
    log_z: jax.Array  # accumulated log-evidence
    scale: jax.Array  # RW move scale factor


def _ess(logw):
    lw = logw - jax.scipy.special.logsumexp(logw)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw))


def systematic_resample(key, logw, n):
    """Systematic resampling: returns (n,) ancestor indices."""
    lw = logw - jax.scipy.special.logsumexp(logw)
    w = jnp.exp(lw)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), dtype=w.dtype)
    pts = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    return jnp.searchsorted(cum, pts, method="scan_unrolled").astype(jnp.int32)


def _find_next_beta(loglik, logw, beta, target_ess_frac, n_bisect=30):
    """Largest delta with ESS(logw + delta*loglik) >= target (bisection)."""
    n = loglik.shape[0]
    target = target_ess_frac * n

    def ess_at(delta):
        return _ess(logw + delta * loglik)

    hi0 = 1.0 - beta
    ok_full = ess_at(hi0) >= target

    def body(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        good = ess_at(mid) >= target
        return (jnp.where(good, mid, lo), jnp.where(good, hi, mid)), None

    (lo, hi), _ = lax.scan(body, (jnp.zeros_like(hi0), hi0), None, length=n_bisect)
    delta = jnp.where(ok_full, hi0, lo)
    return jnp.maximum(delta, 1e-6 * hi0)  # always make progress


def make_smc_stage(
    logprior_fn: Callable,
    loglik_fn: Callable,
    n_move: int = 5,
    target_ess_frac: float = 0.5,
    resample_ess_frac: float = 0.5,
):
    """Build the jitted per-stage transition.  logprior_fn/loglik_fn map a
    single (k,) particle to a scalar; vmapped internally."""
    vprior = jax.vmap(logprior_fn)
    vlik = jax.vmap(loglik_fn)

    def stage(key, state: SMCState):
        n, k = state.u.shape
        k_beta, k_res, k_move = jax.random.split(key, 3)
        delta = _find_next_beta(
            state.loglik, state.logw, state.beta, target_ess_frac
        )
        beta = state.beta + delta
        logw = state.logw + delta * state.loglik
        # evidence increment: log mean of incremental weights under previous
        # normalized weights
        lw_prev = state.logw - jax.scipy.special.logsumexp(state.logw)
        log_z = state.log_z + jax.scipy.special.logsumexp(
            lw_prev + delta * state.loglik
        )
        # resample when depleted.  With target_ess_frac == resample_ess_frac
        # (Chopin-style adaptive tempering) the chosen delta drives ESS down
        # to the threshold, so this fires on every full-size stage and the
        # weights reset — avoiding the ESS plateau deadlock where delta -> 0
        # with ESS stuck between the two thresholds.
        do_resample = _ess(logw) <= resample_ess_frac * n + 1e-6 * n
        idx = systematic_resample(k_res, logw, n)
        u = jnp.where(do_resample, state.u[idx], state.u)
        loglik = jnp.where(do_resample, state.loglik[idx], state.loglik)
        logprior = jnp.where(do_resample, state.logprior[idx], state.logprior)
        logw = jnp.where(do_resample, jnp.zeros_like(logw), logw)

        # rejuvenation: adaptive RW Metropolis on the tempered target
        lw_now = logw - jax.scipy.special.logsumexp(logw)
        w_now = jnp.exp(lw_now)
        mean = jnp.sum(w_now[:, None] * u, axis=0)
        cent = u - mean
        cov = (cent * w_now[:, None]).T @ cent + 1e-8 * jnp.eye(k, dtype=u.dtype)
        chol = jnp.linalg.cholesky(cov)
        base_scale = 2.38 / jnp.sqrt(jnp.asarray(k, u.dtype))

        def move(carry, i):
            u, loglik, logprior, scale, _ = carry
            km = jax.random.fold_in(k_move, i)
            k1, k2 = jax.random.split(km)
            eps = jax.random.normal(k1, u.shape, u.dtype)
            prop = u + scale * base_scale * (eps @ chol.T)
            lp_prop = vprior(prop)
            ll_prop = vlik(prop)
            log_ratio = (lp_prop + beta * ll_prop) - (logprior + beta * loglik)
            acc = (
                jnp.log(jax.random.uniform(k2, (u.shape[0],), u.dtype))
                < log_ratio
            )
            u = jnp.where(acc[:, None], prop, u)
            loglik = jnp.where(acc, ll_prop, loglik)
            logprior = jnp.where(acc, lp_prop, logprior)
            acc_rate = jnp.mean(acc.astype(u.dtype))
            # gentle scale adaptation toward 0.3 acceptance
            scale = scale * jnp.exp(0.5 * (acc_rate - 0.3))
            return (u, loglik, logprior, scale, acc_rate), None

        (u, loglik, logprior, scale, acc_rate), _ = lax.scan(
            move, (u, loglik, logprior, state.scale, jnp.zeros((), u.dtype)),
            jnp.arange(n_move),
        )
        new_state = SMCState(
            u=u, loglik=loglik, logprior=logprior, logw=logw,
            beta=beta, log_z=log_z, scale=scale,
        )
        info = {
            "beta": beta,
            "ess": _ess(logw),
            "resampled": do_resample,
            "accept": acc_rate,
        }
        return new_state, info

    return stage


def smc_sample(
    logprior_fn: Callable,
    loglik_fn: Callable,
    prior_sample_fn: Callable,
    key,
    n_particles: int = 1024,
    n_move: int = 5,
    target_ess_frac: float = 0.5,
    resample_ess_frac: float = 0.5,
    max_stages: int = 200,
    verbose: bool = False,
    particle_sharding=None,
):
    """Run adaptive tempered SMC to beta = 1 (host loop over jitted stages).

    ``particle_sharding``: optional ``NamedSharding`` placing the particle
    axis across devices (the 'chains' mesh axis) — weight normalization/ESS
    become cross-device reductions and systematic resampling a gather, all
    inserted by the compiler (SURVEY.md section 5.8 SMC collectives).

    Returns (final SMCState, list of per-stage info dicts).  Final particles
    with ``state.logw`` weights target the posterior; ``state.log_z`` is the
    log-evidence estimate."""
    k_init, k_run = jax.random.split(key)
    u0 = prior_sample_fn(k_init, n_particles)
    if particle_sharding is not None:
        u0 = jax.device_put(u0, particle_sharding)
    state = SMCState(
        u=u0,
        loglik=jit_bound(jax.vmap(loglik_fn))(u0),
        logprior=jit_bound(jax.vmap(logprior_fn))(u0),
        logw=jnp.zeros((n_particles,), u0.dtype),
        beta=jnp.zeros((), u0.dtype),
        log_z=jnp.zeros((), u0.dtype),
        scale=jnp.ones((), u0.dtype),
    )
    stage = jit_bound(
        make_smc_stage(
            logprior_fn, loglik_fn, n_move, target_ess_frac, resample_ess_frac
        )
    )
    infos = []
    for s in range(max_stages):
        state, info = stage(jax.random.fold_in(k_run, s), state)
        info = {k: np.asarray(v) for k, v in info.items()}
        infos.append(info)
        if verbose:
            print(
                f"stage {s}: beta={float(info['beta']):.4f} "
                f"ess={float(info['ess']):.0f} acc={float(info['accept']):.2f}"
            )
        if float(info["beta"]) >= 1.0 - 1e-9:
            break
    return state, infos
