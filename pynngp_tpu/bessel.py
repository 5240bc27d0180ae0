"""Modified Bessel function of the second kind K_nu on TPU.

XLA has no native ``K_nu`` op, but the Matern-nu kernel (reference
``covModel.h`` Matern class — SURVEY.md section 3.4) needs it for general
(non-half-integer) smoothness.  This module implements K_nu for real nu >= 0,
x > 0 with pure elementwise ``jnp`` ops (VPU-friendly, fixed iteration
counts, no data-dependent control flow):

- ``x <= 2``   : Temme's series for K_mu, K_{mu+1} with mu = frac part of nu,
- ``x > 2``    : Steed's continued-fraction (CF2) evaluation of the scaled
                 e^x * K_mu, K_{mu+1},
- then the forward recurrence K_{nu+1} = K_{nu-1} + (2 nu / x) K_nu, which is
  stable in the increasing-nu direction.

Both branches are always evaluated (lax.select, not cond) — on TPU the two
fixed-length elementwise loops are cheap and branchless code vectorizes.

Derivatives: d/dx K_nu = -(K_{nu-1} + K_{nu+1}) / 2 (exact, via custom_jvp);
d/dnu is supplied by central finite difference (documented approximation —
only gradient-based sampling of nu uses it; Metropolis moves on nu, the
reference's semantics, do not).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["kv", "kve", "log_kve"]

# Lanczos (g=7, n=9) log-gamma for z > 0, built from add/div/log only —
# Mosaic (Pallas TPU) has no lgamma primitive, and this module must lower
# inside the fused kernels (ops/pallas_bf.py general-nu Matern).  Absolute
# error < 1e-13 in fp64; far below fp32 noise in fp32.
_LANCZOS_G = 7.0
_LANCZOS_COEF = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)
_HALF_LOG_2PI = 0.9189385332046727  # 0.5 * log(2 pi)


def lgamma_pos(z):
    """log Gamma(z) for z > 0, elementwise, Pallas-lowerable."""
    z = jnp.asarray(z)
    zm1 = z - 1.0
    acc = jnp.full_like(zm1, _LANCZOS_COEF[0])
    for i in range(1, len(_LANCZOS_COEF)):
        acc = acc + _LANCZOS_COEF[i] / (zm1 + i)
    t = zm1 + _LANCZOS_G + 0.5
    return _HALF_LOG_2PI + (zm1 + 0.5) * jnp.log(t) - t + jnp.log(acc)


def gammaln(z):
    """Pallas-lowerable gammaln restricted to z > 0 (all uses here)."""
    return lgamma_pos(z)

_EULER_GAMMA = 0.5772156649015329
_TEMME_ITERS = 40  # series terms for x <= 2 (fp64-clean to ~1e-15 at x=2)
_CF2_ITERS = 64  # continued-fraction steps for x > 2

# Maximum integer step count for the forward recurrence nu = mu + k.  Bounds
# supported nu at _MAX_RECUR + 0.5; plenty for Matern smoothness in practice.
_MAX_RECUR = 32


def _rgamma(z):
    """1 / Gamma(z) for z > 0."""
    return jnp.exp(-gammaln(z))


# Taylor coefficients of f(x) = 1/Gamma(1+x) = 1 + b1 x + b2 x^2 + ...
# (classic 1/Gamma series).  gam1 = [f(-mu)-f(mu)]/(2mu) = -(b1 + b3 mu^2 +
# b5 mu^4 + ...) and gam2 = [f(-mu)+f(mu)]/2 = 1 + b2 mu^2 + b4 mu^4 + ...
_INVGAMMA_B = (
    0.5772156649015329,    # b1 (= euler_gamma)
    -0.6558780715202538,   # b2
    -0.0420026350340952,   # b3
    0.1665386113822915,    # b4
    -0.0421977345555443,   # b5
)


def _chebyshev_gam(mu):
    """gam1 = [1/G(1-mu) - 1/G(1+mu)] / (2 mu) and gam2 = their mean.

    For |mu| < 0.01 the difference quotient cancels catastrophically in
    fp32 (eps/(2 mu) noise reached 8% relative K error at mu ~ 1e-5), so
    both come from the even/odd Taylor series of 1/Gamma(1+x) — truncation
    error < 1e-14 at mu = 0.01."""
    b1, b2, b3, b4, b5 = _INVGAMMA_B
    gampl = _rgamma(1.0 + mu)  # 1/Gamma(1+mu), |mu| <= 0.5 so arg >= 0.5
    gammi = _rgamma(1.0 - mu)  # 1/Gamma(1-mu)
    mu2 = mu * mu
    small = jnp.abs(mu) < 0.01
    # typed constant, NOT a bare 1.0: under jax_enable_x64 a bare python
    # float rides into the jnp.where as a weak f64 scalar and the implied
    # f64->f32 convert_element_type sends Mosaic's lowering into infinite
    # recursion (RecursionError while compiling the fused Matern kernels)
    safe_mu = jnp.where(small, jnp.asarray(1.0, mu.dtype), mu)
    gam1 = jnp.where(
        small,
        -(b1 + mu2 * (b3 + mu2 * b5)),
        (gammi - gampl) / (2.0 * safe_mu),
    )
    gam2 = jnp.where(
        small, 1.0 + mu2 * (b2 + mu2 * b4), 0.5 * (gammi + gampl)
    )
    return gam1, gam2, gampl, gammi


def _kv_temme_small(x, mu):
    """Scaled e^x * (K_mu(x), K_{mu+1}(x)) by Temme's series; valid x <= 2."""
    dtype = x.dtype
    x = jnp.maximum(x, jnp.finfo(dtype).tiny)
    pimu = jnp.pi * mu
    sin_ratio = jnp.where(
        jnp.abs(pimu) < 1e-6, 1.0 + pimu * pimu / 6.0, pimu / jnp.sin(pimu)
    )
    d = -jnp.log(x / 2.0)
    e = mu * d
    ee = jnp.exp(e)
    # exp-based sinh/cosh: Mosaic lowers exp but not sinh/cosh primitives
    sinh_e = 0.5 * (ee - 1.0 / ee)
    cosh_e = 0.5 * (ee + 1.0 / ee)
    # wide Taylor window: the exp-difference sinh cancels in fp32 (noise
    # ~eps/2e, i.e. 6e-3 relative at e=1e-5); Taylor truncation at e=0.05
    # is ~3e-12 — far below fp32 eps
    e2 = e * e
    sinh_ratio = jnp.where(
        jnp.abs(e) < 0.05, 1.0 + e2 / 6.0 + e2 * e2 / 120.0, sinh_e / e
    )
    gam1, gam2, gampl, gammi = _chebyshev_gam(mu)
    ff = sin_ratio * (gam1 * cosh_e + gam2 * sinh_ratio * d)
    p = 0.5 * ee / gampl  # 0.5 * e^{mu d} * Gamma(1+mu)
    q = 0.5 / (ee * gammi)  # 0.5 * e^{-mu d} * Gamma(1-mu)
    # NOT ones_like: Mosaic infers a *replicated* vector layout for splat
    # constants, but loop-carried values become concrete after an iteration
    # and the replicated<-concrete relayout is rejected ("Invalid relayout
    # ... replicated in destination but not in source").  Deriving every
    # carry init from x pins a concrete layout from the start.
    c = 1.0 + 0.0 * x
    dd = 0.25 * x * x
    ksum = ff
    ksum1 = p

    def body(i, carry):
        ff, p, q, c, ksum, ksum1 = carry
        fi = i.astype(dtype)
        ff = (fi * ff + p + q) / (fi * fi - mu * mu)
        c = c * dd / fi
        p = p / (fi - mu)
        q = q / (fi + mu)
        ksum = ksum + c * ff
        ksum1 = ksum1 + c * (p - fi * ff)
        return ff, p, q, c, ksum, ksum1

    # i32 bounds, not python ints: under jax_enable_x64 python-int bounds
    # make the fori_loop index an i64, and the body's i.astype(f32) becomes
    # an i64->f32 convert_element_type that Mosaic's _convert_helper lowers
    # by recursively re-emitting itself — RecursionError at compile time on
    # the real chip (first hit by the sampled-nu config-3 bench; CPU tests
    # run the kernels interpreted and never lower through Mosaic).
    ff, p, q, c, ksum, ksum1 = lax.fori_loop(
        jnp.int32(1), jnp.int32(_TEMME_ITERS + 1), body,
        (ff, p, q, c, ksum, ksum1),
    )
    scale = jnp.exp(x)  # return scaled values; x <= 2 so no overflow
    return ksum * scale, ksum1 * (2.0 / x) * scale


def _kv_cf2_large(x, mu):
    """Scaled e^x * (K_mu(x), K_{mu+1}(x)) by Steed's CF2; valid x >= 2."""
    dtype = x.dtype
    x = jnp.maximum(x, 2.0)  # branch only used for x > 2; clamp for safety
    b = 2.0 * (1.0 + x)
    d = 1.0 / b
    h = d
    delh = d
    # Derive every carry init from x: (a) shape-stability when mu is a
    # scalar and x an array (scalars would become arrays after the first
    # iteration — a carry-shape error), and (b) a concrete Mosaic vector
    # layout — splat inits (ones_like/zeros_like) infer a *replicated*
    # layout that cannot be relaid out from the concrete loop-carried
    # values (see _kv_temme_small).
    a1 = (0.25 - mu * mu) + 0.0 * x
    q1 = 0.0 * x
    q2 = 1.0 + 0.0 * x
    a = -a1
    q = a1
    c = a1
    s = 1.0 + q * delh
    # Per-lane freeze once the series has converged: the auxiliary q/c
    # sequences keep growing ~2^i after convergence and overflow fp32 well
    # before the fixed 64 iterations complete (inf - inf => NaN at ordinary
    # x in [2, 10]); fp64 merely wastes iterations.  CF2 converges in
    # ~10-25 steps for x >= 2, so every lane freezes long before overflow.
    eps_conv = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    # Carried as float32 {0,1}, not bool: Mosaic fails to legalize scf.for
    # loops with vector<i1> block arguments ("failed to legalize operation
    # 'scf.for'" on v5e) — booleans are recomputed per-iteration instead.
    done = 0.0 * x  # all-not-done, derived from x for a concrete layout

    def body(i, carry):
        b, d, h, delh, q1, q2, a, q, c, s, done = carry
        was_done = done > 0.5
        fi = i.astype(dtype)
        a_n = a - 2.0 * (fi - 1.0)
        c_n = -a_n * c / fi
        qnew = (q1 - b * q2) / a_n
        q1_n, q2_n = q2, qnew
        q_n = q + c_n * qnew
        b_n = b + 2.0
        d_n = 1.0 / (b_n + a_n * d)
        delh_n = (b_n * d_n - 1.0) * delh
        h_n = h + delh_n
        s_n = s + q_n * delh_n
        # converge on s (increments q*delh): s converges last — q grows while
        # delh shrinks — and the result is sqrt(pi/2x)/s (NR besselik test)
        conv = jnp.abs(q_n * delh_n) <= eps_conv * jnp.abs(s_n)
        done_n = jnp.maximum(done, jnp.where(conv, 1.0 + 0.0 * x, 0.0 * x))
        keep = lambda new, old: jnp.where(was_done, old, new)
        return (
            keep(b_n, b), keep(d_n, d), keep(h_n, h), keep(delh_n, delh),
            keep(q1_n, q1), keep(q2_n, q2), keep(a_n, a), keep(q_n, q),
            keep(c_n, c), keep(s_n, s), done_n,
        )

    # i32 bounds: see _kv_temme_small (i64 index breaks Mosaic lowering)
    b, d, h, delh, q1, q2, a, q, c, s, done = lax.fori_loop(
        jnp.int32(2), jnp.int32(_CF2_ITERS + 2), body,
        (b, d, h, delh, q1, q2, a, q, c, s, done),
    )
    h = a1 * h
    # e^x K_mu(x) = sqrt(pi / 2x) / s
    kmu = jnp.sqrt(jnp.pi / (2.0 * x)) / s
    kmu1 = kmu * (mu + x + 0.5 - h) / x
    return kmu, kmu1


def _kve_mu_pair(x, mu):
    """Scaled e^x * (K_mu, K_{mu+1}) for mu in [0, 1), any x > 0."""
    ks, k1s = _kv_temme_small(jnp.minimum(x, 2.0), mu)
    kl, k1l = _kv_cf2_large(jnp.maximum(x, 2.0), mu)
    use_small = x <= 2.0
    return jnp.where(use_small, ks, kl), jnp.where(use_small, k1s, k1l)


def _kve_raw(x, nu):
    """Scaled e^x * K_nu(x) for nu >= 0 via forward recurrence from mu.

    nu splits at the NEAREST integer (mu in [-0.5, 0.5], the Numerical-
    Recipes besselik convention), not floor: the Temme series is even in mu
    only up to the sin(pi mu) prefactor, and as mu -> 1^- that prefactor
    blows up and the fp32 series cancels catastrophically — kve went
    *negative* (then log -> NaN inside the Matern kernel) for nu in
    [0.9999, 0.99999] at moderate x.  All downstream formulas are valid for
    negative mu (K_{-mu} = K_mu; 1/Gamma(1 +- mu) args stay >= 0.5)."""
    nu = jnp.abs(nu)  # K_{-nu} = K_nu
    k_steps = jnp.floor(nu + 0.5).astype(jnp.int32)  # floor, not round: Mosaic
    mu = nu - k_steps.astype(x.dtype)
    kmu, kmu1 = _kve_mu_pair(x, mu)

    # After j advance steps (km, kp) = (K_{mu+j}, K_{mu+j+1}); K_{mu+k} for
    # k >= 1 needs k-1 advances then kp.
    def body(i, carry):
        km, kp = carry
        fi = mu + i.astype(x.dtype)
        knext = km + (2.0 * fi / x) * kp
        take = i < k_steps  # branchless: advance only while i < k_steps
        return jnp.where(take, kp, km), jnp.where(take, knext, kp)

    # i32 bounds: see _kv_temme_small (i64 index breaks Mosaic lowering)
    km, kp = lax.fori_loop(
        jnp.int32(1), jnp.int32(_MAX_RECUR + 1), body, (kmu, kmu1)
    )
    return jnp.where(k_steps == 0, kmu, kp)


@jax.custom_jvp
def kve(x, nu):
    """Exponentially scaled modified Bessel K: e^x * K_nu(x), elementwise."""
    x, nu = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(nu))
    return _kve_raw(x, nu)


def _kve_jvp(primals, tangents):
    x, nu = primals
    dx, dnu = tangents
    x, nu = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(nu))
    out = _kve_raw(x, nu)
    tangent = jnp.zeros_like(out)
    if not isinstance(dx, jax.custom_derivatives.SymbolicZero):
        # d/dx [e^x K_nu] = e^x K_nu - e^x (K_{nu-1} + K_{nu+1}) / 2;
        # with K_{nu-1} = K_{nu+1} - (2 nu / x) K_nu:
        kp1 = _kve_raw(x, nu + 1.0)
        dKdx_scaled = out - (kp1 - (nu / x) * out)
        tangent = tangent + dKdx_scaled * dx
    if not isinstance(dnu, jax.custom_derivatives.SymbolicZero):
        # d/dnu via central finite difference (documented approximation; only
        # gradient-based moves on nu use this path).
        h = jnp.asarray(1e-4, x.dtype)
        dKdnu = (_kve_raw(x, nu + h) - _kve_raw(x, jnp.maximum(nu - h, 0.0))) / (
            2.0 * h
        )
        tangent = tangent + dKdnu * dnu
    return out, tangent


kve.defjvp(_kve_jvp, symbolic_zeros=True)


def kv(x, nu):
    """Modified Bessel function of the second kind K_nu(x), elementwise."""
    return kve(x, nu) * jnp.exp(-x)


def log_kve(x, nu):
    """log(e^x K_nu(x)) — useful for log-space Matern evaluation."""
    return jnp.log(kve(x, nu))
