"""Hamiltonian Monte Carlo on the unconstrained NNGP hyperparameters.

The reference has no gradient-based sampler; this is part of the rebuild's
mandate (BASELINE.json north star: 'samplers move from sequential
Gibbs/Metropolis to NUTS/HMC ... with step-size/mass-matrix adaptation').
Gradients flow through the batched Cholesky of the Vecchia build
(SURVEY.md section 7 step 5).

Components:
  - leapfrog integrator (fixed step count under ``lax.scan``),
  - HMC step with multivariate-normal momentum and MH correction,
  - Nesterov dual averaging for step size (Stan's scheme),
  - Welford accumulator for diagonal mass-matrix (inverse metric)
    adaptation during burn-in,
all pure pytree-state functions so chains vmap and shard.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "DualAveraging",
    "da_init",
    "da_update",
    "Welford",
    "welford_init",
    "welford_update",
    "welford_variance",
    "leapfrog",
    "hmc_step",
    "find_reasonable_step_size",
]


class DualAveraging(NamedTuple):
    log_step: jax.Array
    log_step_avg: jax.Array
    h_avg: jax.Array
    mu: jax.Array
    count: jax.Array


def da_init(step_size0):
    ls = jnp.log(step_size0)
    return DualAveraging(
        log_step=ls,
        log_step_avg=ls,
        h_avg=jnp.zeros_like(ls),
        mu=jnp.log(10.0) + ls,
        count=jnp.zeros_like(ls),
    )


def da_update(da: DualAveraging, accept_prob, target=0.8, gamma=0.05, t0=10.0, kappa=0.75):
    count = da.count + 1.0
    eta_h = 1.0 / (count + t0)
    h_avg = (1.0 - eta_h) * da.h_avg + eta_h * (target - accept_prob)
    log_step = da.mu - jnp.sqrt(count) / gamma * h_avg
    eta = count**-kappa
    log_step_avg = eta * log_step + (1.0 - eta) * da.log_step_avg
    return DualAveraging(log_step, log_step_avg, h_avg, da.mu, count)


class Welford(NamedTuple):
    mean: jax.Array
    m2: jax.Array
    count: jax.Array


def welford_init(dim, dtype=jnp.float32):
    return Welford(
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
        count=jnp.zeros((), dtype),
    )


def welford_update(w: Welford, x):
    count = w.count + 1.0
    delta = x - w.mean
    mean = w.mean + delta / count
    m2 = w.m2 + delta * (x - mean)
    return Welford(mean, m2, count)


def welford_variance(w: Welford, regularize=True):
    var = w.m2 / jnp.maximum(w.count - 1.0, 1.0)
    if regularize:  # Stan's shrinkage toward unit metric
        c = w.count
        var = (c / (c + 5.0)) * var + 1e-3 * (5.0 / (c + 5.0))
    return var


def mass_velocity(inv_mass, r):
    """M^-1 r.  ``inv_mass`` is either a (dim,) diagonal or a (dim, dim)
    dense inverse metric (e.g. the Laplace posterior covariance — the dense
    form is what lets NUTS move along the correlated (sigma2, phi) ridge of
    smooth-kernel NNGP posteriors, where a diagonal metric mixes at
    ESS ~ 1)."""
    if inv_mass.ndim == 2:
        return inv_mass @ r
    return inv_mass * r


def draw_momentum(key, inv_mass, dtype):
    """r ~ N(0, M) for diagonal or dense inverse metric M^-1 = V: with
    V = L L^T, r = L^-T xi has covariance L^-T L^-1 = V^-1 = M."""
    xi = jax.random.normal(key, (inv_mass.shape[0],), dtype)
    if inv_mass.ndim == 2:
        lv = jnp.linalg.cholesky(inv_mass)
        return jax.scipy.linalg.solve_triangular(lv.T, xi, lower=False)
    return xi / jnp.sqrt(inv_mass)


def leapfrog(value_and_grad_fn: Callable, z, r, grad, eps, inv_mass, n_steps):
    """n_steps of leapfrog; returns (z, r, grad, value) at the end."""

    def one(carry, _):
        z, r, grad = carry
        r_half = r + 0.5 * eps * grad
        z_new = z + eps * mass_velocity(inv_mass, r_half)
        value, grad_new = value_and_grad_fn(z_new)
        r_new = r_half + 0.5 * eps * grad_new
        return (z_new, r_new, grad_new), value

    (z, r, grad), values = lax.scan(one, (z, r, grad), None, length=n_steps)
    return z, r, grad, values[-1]


def _kinetic(r, inv_mass):
    return 0.5 * jnp.dot(r, mass_velocity(inv_mass, r))


class HMCInfo(NamedTuple):
    accept_prob: jax.Array
    accepted: jax.Array
    energy: jax.Array
    diverging: jax.Array


def hmc_step(
    key,
    z,
    value,
    grad,
    value_and_grad_fn,
    step_size,
    inv_mass,
    n_leapfrog,
    jitter_steps: bool = True,
):
    """One HMC transition.  ``value_and_grad_fn`` returns (logpost, grad).

    With ``jitter_steps`` the trajectory length is uniformly jittered in
    [1, n_leapfrog] to avoid resonances (n_leapfrog static upper bound)."""
    k_mom, k_acc, k_len = jax.random.split(key, 3)
    r0 = draw_momentum(k_mom, inv_mass, z.dtype)
    energy0 = -value + _kinetic(r0, inv_mass)

    if jitter_steps:
        n_run = jax.random.randint(k_len, (), 1, n_leapfrog + 1)
    else:
        n_run = n_leapfrog

    def one(carry, i):
        z, r, grad, value = carry
        do = i < n_run
        r_half = r + 0.5 * step_size * grad
        z_new = z + step_size * mass_velocity(inv_mass, r_half)
        value_new, grad_new = value_and_grad_fn(z_new)
        r_new = r_half + 0.5 * step_size * grad_new
        out = (
            jnp.where(do, z_new, z),
            jnp.where(do, r_new, r),
            jnp.where(do, grad_new, grad),
            jnp.where(do, value_new, value),
        )
        return out, None

    (z_new, r_new, grad_new, value_new), _ = lax.scan(
        one, (z, r0, grad, value), jnp.arange(n_leapfrog)
    )
    energy1 = -value_new + _kinetic(r_new, inv_mass)
    delta = energy0 - energy1
    delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
    accept_prob = jnp.minimum(jnp.exp(jnp.minimum(delta, 0.0)), 1.0)
    accept = jnp.log(jax.random.uniform(k_acc, dtype=z.dtype)) < delta
    z = jnp.where(accept, z_new, z)
    value = jnp.where(accept, value_new, value)
    grad = jnp.where(accept, grad_new, grad)
    info = HMCInfo(
        accept_prob=accept_prob,
        accepted=accept,
        energy=energy1,
        diverging=delta < -1000.0,
    )
    return z, value, grad, info


class HMCState(NamedTuple):
    """Self-contained HMC chain state (warmup driven by iteration counter so
    one step_fn serves burn-in and sampling — see nuts.NUTSState)."""

    z: jax.Array
    value: jax.Array
    grad: jax.Array
    da: "DualAveraging"
    wf: "Welford"
    inv_mass: jax.Array
    iteration: jax.Array
    info: "HMCInfo"


def make_hmc_kernel(
    value_and_grad_fn: Callable,
    n_burn: int,
    n_leapfrog: int = 32,
    target_accept: float = 0.8,
    init_inv_mass=None,
):
    """Build (init_fn(key, z0), step_fn(key, state)) for chunked drivers.

    ``init_inv_mass``: optional starting inverse metric — a (dim,) diagonal
    that warmup's Welford windows refine, or a dense (dim, dim) matrix
    (e.g. a Laplace covariance) which is FROZEN through warmup (the Welford
    adaptation is diagonal-only and would discard the off-diagonal
    structure).  See nuts.make_nuts_kernel."""
    from pynngp_tpu.samplers.nuts import _warmup_schedule

    adapt_metric_np, reset_np = _warmup_schedule(max(n_burn, 1))
    adapt_metric = jnp.asarray(adapt_metric_np)
    reset_at = jnp.asarray(reset_np)
    # a DENSE init metric (Laplace covariance) is frozen: Welford adaptation
    # here is diagonal-only and would discard the off-diagonal structure
    dense = init_inv_mass is not None and jnp.ndim(init_inv_mass) == 2

    def init_fn(key, z0):
        dtype = z0.dtype
        dim = z0.shape[0]
        value0, grad0 = value_and_grad_fn(z0)
        if init_inv_mass is None:
            inv_mass0 = jnp.ones((dim,), dtype)
        else:
            inv_mass0 = jnp.asarray(init_inv_mass, dtype)
        eps0 = find_reasonable_step_size(value_and_grad_fn, z0, inv_mass0, key)
        info0 = HMCInfo(
            accept_prob=jnp.zeros((), dtype),
            accepted=jnp.asarray(False),
            energy=jnp.zeros((), dtype),
            diverging=jnp.asarray(False),
        )
        return HMCState(
            z=z0, value=value0, grad=grad0, da=da_init(eps0),
            wf=welford_init(dim, dtype), inv_mass=inv_mass0,
            iteration=jnp.zeros((), jnp.int32), info=info0,
        )

    def step_fn(key, state: HMCState):
        warm = state.iteration < n_burn
        i_clip = jnp.clip(state.iteration, 0, max(n_burn, 1) - 1)
        step_size = jnp.where(
            warm, jnp.exp(state.da.log_step), jnp.exp(state.da.log_step_avg)
        )
        z, value, grad, info = hmc_step(
            key, state.z, state.value, state.grad, value_and_grad_fn,
            step_size, state.inv_mass, n_leapfrog,
        )
        da_new = da_update(state.da, info.accept_prob, target=target_accept)
        da = jax.tree.map(lambda n, o: jnp.where(warm, n, o), da_new, state.da)
        wf = jax.tree.map(
            lambda n, o: jnp.where(warm & adapt_metric[i_clip], n, o),
            welford_update(state.wf, z), state.wf,
        )
        do_reset = warm & reset_at[i_clip]
        if dense:
            inv_mass = state.inv_mass
        else:
            inv_mass = jnp.where(
                do_reset & (wf.count > 2), welford_variance(wf), state.inv_mass
            )
        fresh_da = da_init(jnp.exp(da.log_step_avg))
        da = jax.tree.map(lambda f, o: jnp.where(do_reset, f, o), fresh_da, da)
        wf_fresh = welford_init(z.shape[0], z.dtype)
        wf = jax.tree.map(lambda f, o: jnp.where(do_reset, f, o), wf_fresh, wf)
        return HMCState(
            z=z, value=value, grad=grad, da=da, wf=wf, inv_mass=inv_mass,
            iteration=state.iteration + 1, info=info,
        )

    return init_fn, step_fn


def hmc_sample(
    value_and_grad_fn: Callable,
    z0,
    key,
    n_samples: int,
    n_burn: int = 500,
    n_leapfrog: int = 32,
    target_accept: float = 0.8,
    collect_fn: Callable = None,
    thin: int = 1,
):
    """Single-chain monolithic HMC run (CPU/tests; device runs chunk via the
    model-level drivers)."""
    from pynngp_tpu.models.base import run_mcmc

    init_fn, step_fn = make_hmc_kernel(
        value_and_grad_fn, n_burn, n_leapfrog, target_accept
    )
    k_init, k_run = jax.random.split(key)
    state0 = init_fn(k_init, z0)
    collect = collect_fn or (lambda z, v, info: z)
    state, draws = run_mcmc(
        k_run, state0, step_fn,
        lambda s: collect(s.z, s.value, s.info),
        n_samples, n_burn, thin,
    )
    return draws, {
        "step_size": jnp.exp(state.da.log_step_avg),
        "inv_mass": state.inv_mass,
    }


def find_reasonable_step_size(value_and_grad_fn, z, inv_mass, key, init=1.0, max_iters=30):
    """Stan's heuristic: double/halve until the one-step accept prob crosses
    0.5 (branchless fixed-iteration version)."""
    value0, grad0 = value_and_grad_fn(z)
    r0 = draw_momentum(key, inv_mass, z.dtype)
    energy0 = -value0 + _kinetic(r0, inv_mass)

    def accept_prob(eps):
        r_half = r0 + 0.5 * eps * grad0
        z1 = z + eps * mass_velocity(inv_mass, r_half)
        v1, g1 = value_and_grad_fn(z1)
        r1 = r_half + 0.5 * eps * g1
        delta = energy0 - (-v1 + _kinetic(r1, inv_mass))
        return jnp.exp(jnp.minimum(jnp.where(jnp.isnan(delta), -jnp.inf, delta), 0.0))

    direction = jnp.where(accept_prob(jnp.asarray(init, z.dtype)) > 0.5, 1.0, -1.0)

    def body(carry, _):
        eps, done = carry
        ap = accept_prob(eps)
        crossed = jnp.where(direction > 0, ap <= 0.5, ap >= 0.5)
        done = done | crossed
        eps_next = jnp.where(done, eps, eps * jnp.where(direction > 0, 2.0, 0.5))
        return (eps_next, done), None

    (eps, _), _ = lax.scan(
        body, (jnp.asarray(init, z.dtype), jnp.asarray(False)), None, length=max_iters
    )
    return eps
