"""pynngp_tpu — TPU-native Nearest-Neighbor Gaussian Process inference.

A from-scratch, TPU-first re-design of the capabilities of the reference
``bwpriest/pyNNGP`` (C++/Eigen/pybind11 sequential NNGP sampler; see
``SURVEY.md`` for the behavioral contract).  The reference's stateful C++
``SeqNNGP`` object is replaced by:

- a pure-functional, jittable, differentiable Vecchia log-likelihood with
  static ``(n, m)`` shapes (:mod:`pynngp_tpu.vecchia`),
- batched m-by-m covariance builds / Cholesky factorizations over the MXU/VPU,
  with an optional fused Pallas kernel (:mod:`pynngp_tpu.ops`),
- samplers (Metropolis-within-Gibbs with reference semantics, HMC/NUTS,
  SMC, ADVI) as pytree-state step functions under ``lax.scan``
  (:mod:`pynngp_tpu.samplers`),
- chain/particle and location sharding over a ``jax.sharding.Mesh``
  (:mod:`pynngp_tpu.parallel`).

Reference parity map (SURVEY.md section 2 component inventory):

==========================  =============================================
reference component          this package
==========================  =============================================
SeqNNGP core (C++)          models/ (ResponseNNGP, LatentNNGP, SeqNNGP)
neighbor-index builder       neighbors.py (+ cpp/ kd-tree via ctypes)
Vecchia B/F builder (hot)    vecchia.py (XLA) + ops/pallas_bf.py (Pallas)
covModel.h                   kernels.py (SqExp, Exponential, Matern, Spherical)
noiseModel.h                 noise.py
distFunc.h                   distance.py (Euclidean, DotProduct similarity)
RNG                          jax.random (threaded PRNG keys)
pybind11 bindings            n/a (single-language JAX API)
Python package               this package
tests                        tests/
==========================  =============================================
"""

__version__ = "0.1.0"

from pynngp_tpu import diagnostics, distance, kernels, neighbors, noise, vecchia
from pynngp_tpu.config import NNGPConfig
from pynngp_tpu.diagnostics import summarize
from pynngp_tpu.distance import DotProduct, Euclidean
from pynngp_tpu.kernels import Exponential, Matern, Spherical, SqExp
from pynngp_tpu.models import LatentNNGP, ResponseNNGP, SeqNNGP
from pynngp_tpu.neighbors import NeighborTable, build_neighbor_table
from pynngp_tpu.predict import build_prediction_table, predict_draws
from pynngp_tpu.vecchia import (
    VecchiaData,
    make_vecchia_data,
    vecchia_bf,
    vecchia_loglik,
)

__all__ = [
    "diagnostics",
    "distance",
    "kernels",
    "neighbors",
    "noise",
    "vecchia",
    "Euclidean",
    "DotProduct",
    "SqExp",
    "Exponential",
    "Matern",
    "Spherical",
    "NeighborTable",
    "build_neighbor_table",
    "VecchiaData",
    "make_vecchia_data",
    "vecchia_bf",
    "vecchia_loglik",
    "LatentNNGP",
    "ResponseNNGP",
    "SeqNNGP",
    "build_prediction_table",
    "predict_draws",
    "summarize",
    "NNGPConfig",
]
