"""Samplers: Metropolis-within-Gibbs (reference semantics), HMC/NUTS, SMC,
and ADVI — all driving the same Vecchia log-probability (SURVEY.md section 7
steps 3-6)."""

from pynngp_tpu.samplers import mwg
from pynngp_tpu.samplers.mwg import rw_sweep, sample_inverse_gamma

__all__ = ["mwg", "rw_sweep", "sample_inverse_gamma"]
