"""Diagnose config-3 (sampled-nu Matern NUTS, n=25k) non-convergence.

Reproduces the bench's exact data and warm start, runs short NUTS chains,
and prints per-chain trace summaries: where each chain sits, divergence
fraction, logpost spread, MAP fit result, Laplace scales.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import _configure_jax  # noqa: E402

jax = _configure_jax()

import pynngp_tpu as pn  # noqa: E402

rng = np.random.default_rng(0)


def _field(n, scale):
    coords = rng.uniform(size=(n, 2))
    freqs = rng.normal(scale=scale, size=(128, 2))
    ph = rng.uniform(0, 2 * np.pi, 128)
    w = np.sqrt(2 / 128) * np.cos(coords @ freqs.T + ph).sum(axis=1)
    return coords, w + 0.3 * rng.standard_normal(n)


n3 = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
m3 = 10
g3 = np.random.default_rng(33)
coords = g3.uniform(size=(n3, 2))
sig_t, phi_t, nu_t, tau_t = 1.5, 0.15, 1.2, 0.1
from pynngp_tpu.gold.dense_gp import vecchia_bf_dense
from pynngp_tpu.neighbors import build_neighbor_table

tab3 = build_neighbor_table(coords, m=m3)
oc = coords[tab3.order]
t0 = time.time()
b3, f3 = vecchia_bf_dense(oc, tab3.nn_idx, tab3.nn_mask, "matern", phi_t, nu=nu_t)
print(f"gold B/F {time.time()-t0:.1f}s")
z3 = g3.standard_normal(n3)
w_ord = np.zeros(n3)
for i in range(n3):
    sel = tab3.nn_idx[i][tab3.nn_mask[i]]
    w_ord[i] = b3[i, : len(sel)] @ w_ord[sel] + np.sqrt(f3[i]) * z3[i]
w3 = np.sqrt(sig_t) * w_ord[tab3.inverse_order]
y = w3 + np.sqrt(tau_t) * g3.standard_normal(n3)
mod = pn.ResponseNNGP(coords, y, kernel=pn.Matern(), m=m3)

t0 = time.time()
mp = mod.fit_map(n_steps=300)
print(f"MAP fit {time.time()-t0:.1f}s: u={np.asarray(mp.u)}")
nat = mod._unpack_full(mp.u)[0]
print("MAP natural:", {k: float(v) for k, v in nat.items()})
print("laplace_cov diag:", np.diag(np.asarray(mp.laplace_cov)))
print("laplace_cov:\n", np.asarray(mp.laplace_cov))

n_s = int(sys.argv[2]) if len(sys.argv) > 2 else 60
t0 = time.time()
draws = mod.sample_nuts(
    n_s, n_burn=n_s, n_chains=2, max_depth=6,
    init_u=np.asarray(mp.u), init_inv_mass=np.asarray(mp.laplace_cov),
    init_jitter=2.0, seed=0,
)
dt = time.time() - t0
print(f"NUTS {2*n_s} draws in {dt:.1f}s")
for k in ("sigma2", "phi", "tau2", "nu", "logpost"):
    a = np.asarray(draws[k])  # (chains, draws)
    print(
        f"{k:8s} chain-means={a.mean(axis=1)} chain-sd={a.std(axis=1)} "
        f"first={a[:, 0]} last={a[:, -1]}"
    )
div = np.asarray(draws["diverging"])
print("diverging fraction per chain:", div.mean(axis=1))
