"""No-U-Turn Sampler, iterative fixed-depth formulation for TPU.

Recursion-free NUTS (multinomial variant with biased progressive sampling):
the trajectory tree of depth d is built by at most 2^d leapfrog steps inside
a ``lax.while_loop``; within-subtree U-turn checks use a checkpoint stack of
size max_depth+1 indexed by the trailing-zero count of the leaf index — at
leaf i, every power-of-two block [i+1-2^l, i] that just completed is checked
against the momentum stored when its left boundary leaf was entered.  This
is the standard iterative scheme (cf. Phan & Pradhan's iterative NUTS); all
shapes are static and control flow is XLA-compatible (SURVEY.md section 7
step 5: 'NUTS (iterative, fixed max depth for TPU-friendly control flow)').

Frame convention: trajectory endpoints store momenta in the *trajectory
frame* (pointing rightward along the trajectory).  Extending leftward
integrates forward from (z_l, -r_l) and negates the resulting end momentum
back; subtree-internal U-turn checks are sign-invariant so the integrated
frame is used directly there.

Warmup follows Stan's windowed scheme (simplified): step-size dual averaging
throughout burn-in, diagonal mass estimated by Welford accumulation over
doubling windows, metric + step-size reset at window closes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pynngp_tpu.samplers.hmc import (
    da_init,
    da_update,
    draw_momentum,
    find_reasonable_step_size,
    mass_velocity,
    welford_init,
    welford_update,
    welford_variance,
)

__all__ = ["nuts_step", "nuts_sample", "NUTSInfo"]

_MAX_DELTA_ENERGY = 1000.0


class NUTSInfo(NamedTuple):
    accept_prob: jax.Array  # mean leapfrog accept prob (dual-averaging stat)
    diverging: jax.Array
    depth: jax.Array
    n_leapfrog: jax.Array
    energy: jax.Array


def _kinetic(r, inv_mass):
    return 0.5 * jnp.dot(r, mass_velocity(inv_mass, r))


def _is_turning(inv_mass, r_left, r_right, rho):
    v_l = mass_velocity(inv_mass, r_left)
    v_r = mass_velocity(inv_mass, r_right)
    return (jnp.dot(rho, v_l) <= 0.0) | (jnp.dot(rho, v_r) <= 0.0)


def _trailing_zeros(i, max_bits):
    """Number of trailing zero bits of i (i=0 -> max_bits)."""
    t = jnp.zeros((), jnp.int32)
    for b in range(max_bits):
        t = t + ((i % (2 ** (b + 1))) == 0).astype(jnp.int32)
    return t


class _SubtreeOut(NamedTuple):
    z_end: jax.Array
    r_end: jax.Array
    g_end: jax.Array
    v_end: jax.Array
    z_prop: jax.Array
    v_prop: jax.Array
    g_prop: jax.Array
    log_sum_w: jax.Array
    rho: jax.Array
    turning: jax.Array
    diverging: jax.Array
    sum_ap: jax.Array
    n_leapfrog: jax.Array


def _build_subtree(
    key, vg_fn, z0, r0, g0, depth, eps, h0, inv_mass, max_depth
):
    """Build a subtree of 2^depth leaves by forward integration with step
    eps from (z0, r0); early-exits on U-turn/divergence."""
    dim = z0.shape[0]
    dtype = z0.dtype
    n_total = jnp.left_shift(jnp.ones((), jnp.int32), depth)

    def cond(c):
        return (c["i"] < n_total) & ~c["turning"] & ~c["diverging"]

    def body(c):
        i = c["i"]
        slot = _trailing_zeros(i, max_depth)
        ckpt_r = c["ckpt_r"].at[slot].set(c["r"])
        ckpt_rho = c["ckpt_rho"].at[slot].set(c["rho"])
        # one leapfrog step
        r_half = c["r"] + 0.5 * eps * c["g"]
        z = c["z"] + eps * mass_velocity(inv_mass, r_half)
        v, g = vg_fn(z)
        r = r_half + 0.5 * eps * g
        h = -v + _kinetic(r, inv_mass)
        delta = h0 - h  # log weight
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        diverging = (h - h0) > _MAX_DELTA_ENERGY
        diverging = diverging | jnp.isinf(-delta)
        log_sum_w = jnp.logaddexp(c["log_sum_w"], delta)
        key, k_sel = jax.random.split(c["key"])
        take = jnp.log(jax.random.uniform(k_sel, dtype=dtype)) < delta - log_sum_w
        z_prop = jnp.where(take, z, c["z_prop"])
        v_prop = jnp.where(take, v, c["v_prop"])
        g_prop = jnp.where(take, g, c["g_prop"])
        rho = c["rho"] + r
        # U-turn checks for every just-completed power-of-two block
        turning = c["turning"]
        for l in range(1, max_depth + 1):
            blk = 2**l
            active = (((i + 1) % blk) == 0) & ((i + 1) >= blk)
            k_leaf = i + 1 - blk
            slot_k = _trailing_zeros(k_leaf, max_depth)
            r_left = ckpt_r[slot_k]
            rho_span = rho - ckpt_rho[slot_k]
            turning = turning | (
                active & _is_turning(inv_mass, r_left, r, rho_span)
            )
        sum_ap = c["sum_ap"] + jnp.minimum(jnp.exp(jnp.minimum(delta, 0.0)), 1.0)
        return {
            "i": i + 1,
            "z": z,
            "r": r,
            "g": g,
            "v": v,
            "z_prop": z_prop,
            "v_prop": v_prop,
            "g_prop": g_prop,
            "log_sum_w": log_sum_w,
            "rho": rho,
            "ckpt_r": ckpt_r,
            "ckpt_rho": ckpt_rho,
            "turning": turning,
            "diverging": diverging,
            "sum_ap": sum_ap,
            "key": key,
        }

    init = {
        "i": jnp.zeros((), jnp.int32),
        "z": z0,
        "r": r0,
        "g": g0,
        "v": jnp.zeros((), dtype),
        "z_prop": z0,
        "v_prop": jnp.asarray(-jnp.inf, dtype),
        "g_prop": g0,
        "log_sum_w": jnp.asarray(-jnp.inf, dtype),
        "rho": jnp.zeros((dim,), dtype),
        "ckpt_r": jnp.zeros((max_depth + 1, dim), dtype),
        "ckpt_rho": jnp.zeros((max_depth + 1, dim), dtype),
        "turning": jnp.asarray(False),
        "diverging": jnp.asarray(False),
        "sum_ap": jnp.zeros((), dtype),
        "key": key,
    }
    out = lax.while_loop(cond, body, init)
    return _SubtreeOut(
        z_end=out["z"],
        r_end=out["r"],
        g_end=out["g"],
        v_end=out["v"],
        z_prop=out["z_prop"],
        v_prop=out["v_prop"],
        g_prop=out["g_prop"],
        log_sum_w=out["log_sum_w"],
        rho=out["rho"],
        turning=out["turning"],
        diverging=out["diverging"],
        sum_ap=out["sum_ap"],
        n_leapfrog=out["i"],
    )


def nuts_step(key, z, value, grad, value_and_grad_fn, step_size, inv_mass, max_depth=8):
    """One multinomial-NUTS transition; returns (z, value, grad, NUTSInfo)."""
    with jax.named_scope("nuts_step"):
        return _nuts_step_impl(
            key, z, value, grad, value_and_grad_fn, step_size, inv_mass, max_depth
        )


def _nuts_step_impl(key, z, value, grad, value_and_grad_fn, step_size, inv_mass, max_depth):
    dtype = z.dtype
    k_mom, k_loop = jax.random.split(key)
    r0 = draw_momentum(k_mom, inv_mass, dtype)
    h0 = -value + _kinetic(r0, inv_mass)

    def cond(c):
        return (c["depth"] < max_depth) & ~c["turning"] & ~c["diverging"]

    def body(c):
        key, k_dir, k_sub, k_acc = jax.random.split(c["key"], 4)
        go_right = jax.random.bernoulli(k_dir)
        z0 = jnp.where(go_right, c["z_r"], c["z_l"])
        r0_int = jnp.where(go_right, c["r_r"], -c["r_l"])
        g0 = jnp.where(go_right, c["g_r"], c["g_l"])
        eps = jnp.where(go_right, step_size, -step_size)
        sub = _build_subtree(
            k_sub, value_and_grad_fn, z0, r0_int, g0, c["depth"], eps, h0,
            inv_mass, max_depth,
        )
        ok = ~sub.turning & ~sub.diverging
        # endpoints (trajectory frame: left momentum points rightward)
        z_r = jnp.where(ok & go_right, sub.z_end, c["z_r"])
        r_r = jnp.where(ok & go_right, sub.r_end, c["r_r"])
        g_r = jnp.where(ok & go_right, sub.g_end, c["g_r"])
        z_l = jnp.where(ok & ~go_right, sub.z_end, c["z_l"])
        r_l = jnp.where(ok & ~go_right, -sub.r_end, c["r_l"])
        g_l = jnp.where(ok & ~go_right, sub.g_end, c["g_l"])
        dir_sign = jnp.where(go_right, 1.0, -1.0).astype(dtype)
        rho = c["rho"] + jnp.where(ok, dir_sign * sub.rho, 0.0)
        # biased progressive sampling across subtrees
        accept_new = (
            jnp.log(jax.random.uniform(k_acc, dtype=dtype))
            < sub.log_sum_w - c["log_sum_w"]
        )
        take = ok & accept_new
        z_prop = jnp.where(take, sub.z_prop, c["z_prop"])
        v_prop = jnp.where(take, sub.v_prop, c["v_prop"])
        g_prop = jnp.where(take, sub.g_prop, c["g_prop"])
        log_sum_w = jnp.where(
            ok, jnp.logaddexp(c["log_sum_w"], sub.log_sum_w), c["log_sum_w"]
        )
        turning = sub.turning | (ok & _is_turning(inv_mass, r_l, r_r, rho))
        return {
            "key": key,
            "depth": c["depth"] + 1,
            "z_l": z_l, "r_l": r_l, "g_l": g_l,
            "z_r": z_r, "r_r": r_r, "g_r": g_r,
            "rho": rho,
            "z_prop": z_prop, "v_prop": v_prop, "g_prop": g_prop,
            "log_sum_w": log_sum_w,
            "turning": turning,
            "diverging": sub.diverging,
            "sum_ap": c["sum_ap"] + sub.sum_ap,
            "n_leapfrog": c["n_leapfrog"] + sub.n_leapfrog,
        }

    init = {
        "key": k_loop,
        "depth": jnp.zeros((), jnp.int32),
        "z_l": z, "r_l": r0, "g_l": grad,
        "z_r": z, "r_r": r0, "g_r": grad,
        "rho": r0,
        "z_prop": z, "v_prop": value, "g_prop": grad,
        "log_sum_w": jnp.zeros((), dtype),  # root leaf weight: h0 - h0 = 0
        "turning": jnp.asarray(False),
        "diverging": jnp.asarray(False),
        "sum_ap": jnp.zeros((), dtype),
        "n_leapfrog": jnp.zeros((), jnp.int32),
    }
    out = lax.while_loop(cond, body, init)
    n_lf = jnp.maximum(out["n_leapfrog"], 1)
    info = NUTSInfo(
        accept_prob=out["sum_ap"] / n_lf.astype(dtype),
        diverging=out["diverging"],
        depth=out["depth"],
        n_leapfrog=out["n_leapfrog"],
        energy=h0,
    )
    return out["z_prop"], out["v_prop"], out["g_prop"], info


def _warmup_schedule(n_burn):
    """Stan-style windows: 15% step-only, doubling metric windows, 10% tail.
    Returns (adapt_metric (n,), reset_at (n,)) numpy bool arrays."""
    import numpy as np

    init_buf = max(int(0.15 * n_burn), 1)
    term_buf = max(int(0.10 * n_burn), 1)
    adapt_metric = np.zeros(n_burn, bool)
    reset_at = np.zeros(n_burn, bool)
    lo, hi = init_buf, n_burn - term_buf
    if hi > lo:
        adapt_metric[lo:hi] = True
        # doubling windows: 25, 50, 100, ... closing at hi
        w = 25
        pos = lo
        closes = []
        while pos + w < hi:
            pos += w
            closes.append(pos)
            w *= 2
        closes.append(hi)
        for cpos in closes:
            reset_at[min(cpos, n_burn - 1)] = True
    return adapt_metric, reset_at


class NUTSState(NamedTuple):
    """Self-contained NUTS chain state: warmup adaptation is driven by the
    iteration counter, so a single step_fn serves burn-in and sampling and
    plugs into the generic chunked multi-chain driver."""

    z: jax.Array
    value: jax.Array
    grad: jax.Array
    da: object
    wf: object
    inv_mass: jax.Array
    iteration: jax.Array
    info: NUTSInfo


def make_nuts_kernel(
    value_and_grad_fn: Callable,
    n_burn: int,
    max_depth: int = 8,
    target_accept: float = 0.8,
    init_inv_mass=None,
):
    """Build (init_fn(key, z0), step_fn(key, state)) with Stan-style windowed
    warmup handled branchlessly inside step_fn (iteration < n_burn).

    ``init_inv_mass``: optional starting inverse metric.  A (dim,) diagonal
    (e.g. a Laplace posterior-variance estimate — samplers/mapfit.py) is
    refined by warmup's Welford windows; a dense (dim, dim) matrix (e.g. a
    full Laplace covariance) is FROZEN through warmup — the Welford
    adaptation is diagonal-only and would discard the off-diagonal ridge
    structure the dense metric was chosen for.  Starting at the posterior
    scale instead of the unit metric is what makes short warmups converge at
    n=100k (BASELINE north-star config)."""
    adapt_metric_np, reset_np = _warmup_schedule(max(n_burn, 1))
    adapt_metric = jnp.asarray(adapt_metric_np)
    reset_at = jnp.asarray(reset_np)
    # DENSE init metric (a Laplace covariance): frozen through warmup — the
    # Welford adaptation is diagonal-only and would throw away the
    # off-diagonal ridge structure it was chosen for
    dense = init_inv_mass is not None and jnp.ndim(init_inv_mass) == 2
    # With the metric ~ the posterior covariance the step size is
    # dimensionless (whitened-curvature units): any sane value is O(0.01-2).
    # Clamp dual averaging there — at large n the fp32 likelihood noise
    # floors the acceptance statistic at ~e^-noise across DECADES of step
    # size, the accept-vs-step curve goes flat, and unclamped DA random-
    # walks down to 1e-4 where every tree maxes out its depth (measured on
    # v5e at n=100k).
    _clamp = (
        (lambda ls: jnp.clip(ls, jnp.log(0.01), jnp.log(2.0)))
        if dense
        else (lambda ls: ls)
    )

    def init_fn(key, z0):
        dtype = z0.dtype
        dim = z0.shape[0]
        value0, grad0 = value_and_grad_fn(z0)
        if init_inv_mass is None:
            inv_mass0 = jnp.ones((dim,), dtype)
        else:
            inv_mass0 = jnp.asarray(init_inv_mass, dtype)
        eps0 = find_reasonable_step_size(value_and_grad_fn, z0, inv_mass0, key)
        info0 = NUTSInfo(
            accept_prob=jnp.zeros((), dtype),
            diverging=jnp.asarray(False),
            depth=jnp.zeros((), jnp.int32),
            n_leapfrog=jnp.zeros((), jnp.int32),
            energy=jnp.zeros((), dtype),
        )
        return NUTSState(
            z=z0,
            value=value0,
            grad=grad0,
            da=da_init(eps0),
            wf=welford_init(dim, dtype),
            inv_mass=inv_mass0,
            iteration=jnp.zeros((), jnp.int32),
            info=info0,
        )

    def step_fn(key, state: NUTSState):
        warm = state.iteration < n_burn
        i_clip = jnp.clip(state.iteration, 0, max(n_burn, 1) - 1)
        step_size = jnp.where(
            warm,
            jnp.exp(_clamp(state.da.log_step)),
            jnp.exp(_clamp(state.da.log_step_avg)),
        )
        z, value, grad, info = nuts_step(
            key, state.z, state.value, state.grad, value_and_grad_fn,
            step_size, state.inv_mass, max_depth,
        )
        da_new = da_update(state.da, info.accept_prob, target=target_accept)
        da_new = da_new._replace(
            log_step=_clamp(da_new.log_step),
            log_step_avg=_clamp(da_new.log_step_avg),
        )
        da = jax.tree.map(lambda n, o: jnp.where(warm, n, o), da_new, state.da)
        wf = jax.tree.map(
            lambda n, o: jnp.where(warm & adapt_metric[i_clip], n, o),
            welford_update(state.wf, z),
            state.wf,
        )
        # window close: adopt metric, restart welford + dual averaging
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
        return NUTSState(
            z=z, value=value, grad=grad, da=da, wf=wf, inv_mass=inv_mass,
            iteration=state.iteration + 1, info=info,
        )

    return init_fn, step_fn


def nuts_sample(
    value_and_grad_fn: Callable,
    z0,
    key,
    n_samples: int,
    n_burn: int = 500,
    max_depth: int = 8,
    target_accept: float = 0.8,
    collect_fn: Callable = None,
    thin: int = 1,
):
    """Single-chain monolithic NUTS run (one program — fine on CPU/tests;
    device runs should chunk via the model-level drivers).

    collect_fn(z, value, info) -> pytree recorded per draw (default: z)."""
    from pynngp_tpu.models.base import run_mcmc

    init_fn, step_fn = make_nuts_kernel(
        value_and_grad_fn, n_burn, max_depth, target_accept
    )
    k_init, k_run = jax.random.split(key)
    state0 = init_fn(k_init, z0)
    collect = collect_fn or (lambda z, v, info: z)
    state, draws = run_mcmc(
        k_run,
        state0,
        step_fn,
        lambda s: collect(s.z, s.value, s.info),
        n_samples,
        n_burn,
        thin,
    )
    return draws, {
        "step_size": jnp.exp(state.da.log_step_avg),
        "inv_mass": state.inv_mass,
    }
