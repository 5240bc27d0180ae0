"""Benchmark: the BASELINE.json primary metric — NNGP Vecchia log-lik
evals/sec AND NUTS ESS/sec at n=100k, m=15 on one TPU chip.

Default (``--mode both``) prints TWO JSON lines:
  1. {"metric": "vecchia_loglik_evals_per_sec_...", ...}
  2. {"metric": "nuts_min_ess_per_sec_...", ...}   (last line — the driver
     parses the final line, so the north-star ESS/sec number is captured).

Timing methodology: each throughput is reported as best-of-N batches (sheds
clock/tunnel jitter) AND the mean over batches is printed alongside on
stderr; the JSON `value` is the best-of, consistent with the README headline
(methodology noted there).

vs_baseline: the reference publishes no numbers (BASELINE.md: "published":
{}) and its binary is unavailable, so denominators are documented estimates:
  - loglik: reference C++/Eigen/OpenMP updateBF ~40 evals/sec at this config
    (n*m^3/3 flops/eval at ~4 GFLOP/s effective 8-thread small-matrix Eigen);
  - ESS/sec: reference Metropolis-within-Gibbs ~1 ESS/sec (one updateBF per
    theta proposal at ~40/s; RW autocorrelation O(30-100) iters/ESS).
Conservative (generous to the reference); revisit if real numbers appear.
"""

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_EVALS_PER_SEC_ESTIMATE = 40.0
# Reference ESS/sec estimate: the reference's Metropolis-within-Gibbs costs
# one updateBF per theta proposal (~40 evals/sec per the estimate above) and
# RW-Metropolis autocorrelation typically needs O(30-100) iterations per
# effective sample on correlated (sigma2, phi, tau2) => ~0.5-1 ESS/sec.
REFERENCE_ESS_PER_SEC_ESTIMATE = 1.0


def _configure_jax():
    import jax

    # x64 ON so the f64-accumulated reductions in the likelihood are real
    # (model arrays stay fp32; only the final sums run in f64 — without
    # this the fp32 tree-sum noise at n=100k caps NUTS acceptance at
    # ~e^-noise and dual averaging wedges at tiny step sizes)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pynngp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--m", type=int, default=15)
    p.add_argument("--evals-per-call", type=int, default=200)
    p.add_argument("--calls", type=int, default=5)
    p.add_argument("--quick", action="store_true", help="tiny config smoke run")
    p.add_argument(
        "--mode", choices=["both", "loglik", "ess"], default="both",
        help="loglik: fused-kernel evals/sec; ess: NUTS samples/sec + "
        "ESS/sec; both (default): loglik line then ESS line",
    )
    p.add_argument("--chains", type=int, default=4)
    p.add_argument("--samples", type=int, default=400)
    p.add_argument("--burn", type=int, default=300)
    p.add_argument("--map-steps", type=int, default=250)
    p.add_argument("--max-depth", type=int, default=6)
    p.add_argument(
        "--sampler", choices=["best", "nuts", "mwg"], default="best",
        help="ess mode: which sampler to run; 'best' runs both and reports "
        "the higher converged ESS/sec",
    )
    p.add_argument("--mwg-samples", type=int, default=6000)
    p.add_argument("--mwg-burn", type=int, default=1000)
    args = p.parse_args()
    if args.quick:
        args.n, args.calls = 10_000, 2
        args.samples, args.burn = 50, 50
        args.mwg_samples, args.mwg_burn = 300, 100
        args.map_steps = 100
    if args.mode in ("both", "loglik"):
        bench_loglik(args)
    if args.mode in ("both", "ess"):
        bench_ess(args)


def _time_batches(fn, phis, calls):
    """(best, mean) seconds per batch over `calls` timed executions."""
    times = []
    for i in range(calls):
        t0 = time.time()
        fn(phis + 0.001 * (i + 1)).block_until_ready()
        times.append(time.time() - t0)
    return min(times), float(np.mean(times))


def bench_loglik(args):
    jax = _configure_jax()
    import jax.numpy as jnp
    from jax import lax

    import pynngp_tpu as pn

    rng = np.random.default_rng(0)
    coords = rng.uniform(size=(args.n, 2))
    y = rng.standard_normal(args.n)

    t0 = time.time()
    data, tab = pn.make_vecchia_data(coords, args.m)
    y_dev = jnp.asarray(y[tab.order], jnp.float32)
    kern = pn.SqExp()
    # fused Pallas path (the production backend on TPU)
    from pynngp_tpu.ops import pallas_bf as pb

    cache = pb.make_lane_cache(data)
    diff_suff = pb.make_diff_suffstats(kern, cache)
    setup_s = time.time() - t0
    k_evals = args.evals_per_call

    def one_loglik(phi):
        logdet, quad = diff_suff(phi, jnp.float32(0.1), y_dev)
        return -0.5 * (logdet + quad)

    @jax.jit
    def many_evals(phis):
        def body(acc, phi):
            return acc + one_loglik(phi), None

        acc, _ = lax.scan(body, jnp.float32(0.0), phis)
        return acc

    @jax.jit
    def many_grad_evals(phis):
        def body(acc, phi):
            v, g = jax.value_and_grad(one_loglik)(phi)
            return acc + v + g, None

        acc, _ = lax.scan(body, jnp.float32(0.0), phis)
        return acc

    phis = jnp.linspace(0.2, 0.4, k_evals)
    t0 = time.time()
    many_evals(phis).block_until_ready()
    compile_s = time.time() - t0
    # warm-up fully (first post-compile execution can pay one-time program
    # load cost on remote-dispatch platforms), then best/mean over N batches.
    many_evals(phis + 0.0005).block_until_ready()
    best, mean = _time_batches(many_evals, phis, args.calls)
    evals_per_sec = k_evals / best
    evals_per_sec_mean = k_evals / mean

    many_grad_evals(phis).block_until_ready()
    many_grad_evals(phis + 0.0005).block_until_ready()
    bestg, meang = _time_batches(many_grad_evals, phis, args.calls)
    grad_evals_per_sec = k_evals / bestg

    print(
        f"# n={args.n} m={args.m} setup={setup_s:.1f}s compile={compile_s:.1f}s "
        f"loglik={evals_per_sec:.1f}/s (mean {evals_per_sec_mean:.1f}/s) "
        f"value_and_grad={grad_evals_per_sec:.1f}/s (mean {k_evals/meang:.1f}/s) "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"vecchia_loglik_evals_per_sec_n{args.n}_m{args.m}",
                "value": round(evals_per_sec, 2),
                "unit": "evals/sec",
                "vs_baseline": round(
                    evals_per_sec / REFERENCE_EVALS_PER_SEC_ESTIMATE, 2
                ),
            }
        ),
        flush=True,
    )


def _chain_stats(draws, chains):
    """(min-ESS, max split-R-hat) over the (sigma2, phi, tau2) marginals."""
    from pynngp_tpu.diagnostics import ess, split_rhat

    ref = np.asarray(draws["phi"])
    if ref.ndim == 1:
        ref = ref[None]
    min_ess, max_rhat = np.inf, 0.0
    for k in ("phi", "sigma2", "tau2"):
        v = np.asarray(draws[k]).reshape(ref.shape)
        min_ess = min(min_ess, ess(v))
        max_rhat = max(max_rhat, split_rhat(v))
    return float(min_ess), float(max_rhat)


def bench_ess(args):
    """ESS/sec at the BASELINE config (real chip), R-hat-gated.

    Warm start: a MAP fit + Laplace metric places every chain in the
    typical set (round-2's cold-started 300-iteration warmup left
    R-hat(phi)=8.4 — statistically meaningless output).  The reported
    seconds include the MAP fit AND warmup: total wall from 'model ready'
    to 'draws in hand', the honest number a user pays.

    Convergence gate: the JSON carries rhat_max and converged; if any
    split-R-hat exceeds 1.05 the value is reported as 0.0 (a diverged run
    measures nothing) with the raw rate in 'value_unconverged'.
    """
    jax = _configure_jax()

    import pynngp_tpu as pn

    rng = np.random.default_rng(0)
    coords = rng.uniform(size=(args.n, 2))
    # RFF draw from a sqexp GP with lengthscale phi = sqrt(2)/20 ~ 0.07:
    # ~14 correlation lengths across the unit domain, so (sigma2, phi, tau2)
    # are all sharply identified at n=100k.  (The round-2 generator used
    # freq scale 3 => phi ~ 0.47, HALF the domain: under infill asymptotics
    # the range of a smooth kernel is then fundamentally unidentifiable, the
    # posterior stays ridge-shaped at any n, and no sampler can reach
    # R-hat ~ 1 — the measurement, not the sampler, was broken.)
    n_feat = 256
    freqs = rng.normal(scale=20.0, size=(n_feat, 2))
    phases = rng.uniform(0, 2 * np.pi, n_feat)
    w = np.sqrt(2 / n_feat) * np.cos(coords @ freqs.T + phases).sum(axis=1)
    y = w + 0.3 * rng.standard_normal(args.n)

    t0 = time.time()
    model = pn.ResponseNNGP(coords, y, kernel="sqexp", m=args.m)
    setup_s = time.time() - t0

    t0 = time.time()
    mp = model.fit_map(n_steps=args.map_steps)
    map_s = time.time() - t0
    u0 = np.asarray(mp.u)
    # DENSE Laplace metric: the sqexp (sigma2, phi) pair is only weakly
    # identified separately (infill asymptotics) — the posterior is a long
    # correlated ridge that a diagonal metric cannot traverse (measured
    # ESS ~ 3/run); the dense metric makes it locally isotropic.
    ivm = np.asarray(mp.laplace_cov)
    sig0, phi0, tau0 = np.exp(u0[0]), None, np.exp(u0[2])

    candidates = []
    if args.sampler in ("best", "nuts"):
        t0 = time.time()
        draws = model.sample_nuts(
            args.samples, n_burn=args.burn, n_chains=args.chains,
            max_depth=args.max_depth, init_u=u0, init_inv_mass=ivm,
            init_jitter=2.0,
        )
        dt = time.time() - t0
        min_ess, max_rhat = _chain_stats(draws, args.chains)
        total = args.chains * args.samples
        print(
            f"# ess-mode[nuts] n={args.n} m={args.m} chains={args.chains} "
            f"setup={setup_s:.1f}s map={map_s:.1f}s run={dt:.1f}s "
            f"samples/s={total/dt:.2f} min-ESS={min_ess:.1f} "
            f"rhat-max={max_rhat:.3f} device={jax.devices()[0].platform}",
            file=sys.stderr,
        )
        candidates.append(("nuts", min_ess / (dt + map_s), max_rhat))
    if args.sampler in ("best", "mwg"):
        # reference-semantics Metropolis-within-Gibbs: one fused suffstats
        # per component proposal — at m=15 each iteration costs ~3 evals
        # where a depth-6 NUTS iteration costs ~64, and the warm posterior
        # is low-dimensional enough that RW mixing wins on ESS/sec
        init = {
            "sigma2": float(sig0),
            "phi": float(model._t_phi.forward(mp.u[1])),
            "alpha": float(tau0 / sig0),
        }
        t0 = time.time()
        draws = model.sample(
            args.mwg_samples, n_burn=args.mwg_burn, n_chains=args.chains,
            init=init,
            proposal_cov=model.theta_proposal_cov(mp.laplace_cov),
        )
        dt = time.time() - t0
        min_ess, max_rhat = _chain_stats(draws, args.chains)
        total = args.chains * args.mwg_samples
        print(
            f"# ess-mode[mwg] n={args.n} m={args.m} chains={args.chains} "
            f"map={map_s:.1f}s run={dt:.1f}s samples/s={total/dt:.2f} "
            f"min-ESS={min_ess:.1f} rhat-max={max_rhat:.3f}",
            file=sys.stderr,
        )
        candidates.append(("mwg", min_ess / (dt + map_s), max_rhat))

    converged = [c for c in candidates if c[2] <= 1.05]
    pool = converged or candidates
    name, rate, rhat = max(pool, key=lambda c: c[1])
    ok = rhat <= 1.05
    print(
        json.dumps(
            {
                "metric": f"min_ess_per_sec_n{args.n}_m{args.m}",
                "value": round(rate, 3) if ok else 0.0,
                "unit": "ESS/sec",
                "vs_baseline": round(
                    (rate if ok else 0.0) / REFERENCE_ESS_PER_SEC_ESTIMATE, 2
                ),
                "sampler": name,
                "rhat_max": round(rhat, 4),
                "converged": ok,
                **({} if ok else {"value_unconverged": round(rate, 3)}),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
