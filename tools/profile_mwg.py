"""Profile the MWG step gap (VERDICT r3 weak 2): where do 4790 evals/s
become 75 steps/s/chain?  Measures, at n=100k m=15 on the real chip:
  1. scan of K fused suffstats evals, 1 chain        (kernel ceiling)
  2. same under vmap over 4 chains                   (vmap-of-pallas cost)
  3. scan of K full MWG steps, 4 chains vmapped      (the real sampler)
  4. scan of K theta-block-only steps, 4 chains      (isolates conjugates)
"""
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

import pynngp_tpu as pn

N, M, K = 100_000, 15, 100
rng = np.random.default_rng(0)
coords = rng.uniform(size=(N, 2))
freqs = rng.normal(scale=20.0, size=(256, 2))
ph = rng.uniform(0, 2 * np.pi, 256)
w = np.sqrt(2 / 256) * np.cos(coords @ freqs.T + ph).sum(axis=1)
y = w + 0.3 * rng.standard_normal(N)

t0 = time.time()
model = pn.ResponseNNGP(coords, y, kernel="sqexp", m=M)
print("setup", round(time.time() - t0, 1), "backend", model.backend, flush=True)


def timed(name, fn, *args):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    dt = time.time() - t0
    print(f"{name}: {dt:.3f}s  ({K/dt:.1f} iters/s)", flush=True)
    return dt


y_dev = model.data.y

# 1. pure fused evals, 1 chain
@jax.jit
def evals1(phis):
    def body(acc, phi):
        ld, q = model._diff_suff(phi, jnp.float32(0.1), y_dev)
        return acc + ld + q, None

    acc, _ = lax.scan(body, jnp.float32(0.0), phis)
    return acc

phis = jnp.linspace(0.2, 0.4, K)
timed("1chain evals", evals1, phis)

# 2. vmapped over 4 chains
@jax.jit
def evals4(phis4):
    def one(phis):
        def body(acc, phi):
            ld, q = model._diff_suff(phi, jnp.float32(0.1), y_dev)
            return acc + ld + q, None

        acc, _ = lax.scan(body, jnp.float32(0.0), phis)
        return acc

    return jax.vmap(one)(phis4)

phis4 = jnp.stack([phis, phis + 0.01, phis + 0.02, phis + 0.03])
timed("4chain vmapped evals", evals4, phis4)

# 2b. vmap INSIDE scan (the sampler's structure: scan outer, vmap inner)
@jax.jit
def evals4_sv(phis4):
    def body(acc, phis_row):
        ld, q = jax.vmap(
            lambda p: model._diff_suff(p, jnp.float32(0.1), y_dev)
        )(phis_row)
        return acc + jnp.sum(ld + q), None

    acc, _ = lax.scan(body, jnp.float64(0.0), phis4.T)
    return acc

timed("scan-of-vmap evals", evals4_sv, phis4)

# 3. full MWG step, 4 chains
mp_cov = np.diag([0.001, 0.001])
prop_chol = jnp.asarray(np.linalg.cholesky(mp_cov), jnp.float32)
keys = jax.random.split(jax.random.PRNGKey(0), 4)
states = jax.jit(jax.vmap(lambda k: model.init_state(
    k, {"sigma2": 1.0, "phi": 0.1, "alpha": 0.1})))(keys)

@jax.jit
def steps(states):
    def body(s, i):
        ks = jax.vmap(lambda c: jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(1), i), c))(jnp.arange(4))
        return jax.vmap(
            lambda k, st: model.step(k, st, prop_chol=prop_chol)
        )(ks, s), None

    s, _ = lax.scan(body, states, jnp.arange(K))
    return s

dt3 = timed("4chain full MWG steps", steps, states)

# 4. theta-block only (no conjugate sigma2, no collect)
from pynngp_tpu.samplers.mwg import rw_joint_corr

@jax.jit
def theta_only(states):
    def body(s, i):
        def one(k, st):
            logpost = lambda u: model._theta_logpost(u, st.sigma2, st.beta)
            aux = {"b": st.b, "f": st.f, "logdet": st.logdet, "quad": st.quad}
            th, v, aux2, ap = rw_joint_corr(
                k, st.theta_u, st.value, aux, logpost, st.log_steps[0],
                prop_chol,
            )
            return st._replace(theta_u=th, value=v, logdet=aux2["logdet"],
                               quad=aux2["quad"])

        ks = jax.vmap(lambda c: jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(2), i), c))(jnp.arange(4))
        return jax.vmap(one)(ks, s), None

    s, _ = lax.scan(body, states, jnp.arange(K))
    return s

timed("4chain theta-block only", theta_only, states)
