"""Gold oracle: deliberately slow, dense, fp64 NumPy/SciPy reference
implementations (SURVEY.md section 4 / section 7 step 1).

The reference binary is unavailable (empty mount — see SURVEY.md provenance
notice), so parity is asserted against these independent implementations of
the published NNGP math instead.  Nothing here touches JAX; every formula is
derived separately from the library code so agreement is meaningful.
"""

from pynngp_tpu.gold.dense_gp import (
    dense_correlation,
    dense_cov,
    dense_gp_loglik,
    dense_krig_predict,
    latent_conditional,
    vecchia_bf_dense,
    vecchia_loglik_dense,
)

__all__ = [
    "dense_correlation",
    "dense_cov",
    "dense_gp_loglik",
    "dense_krig_predict",
    "latent_conditional",
    "vecchia_bf_dense",
    "vecchia_loglik_dense",
]
