"""Model family: response NNGP, latent-w NNGP, and the reference-ergonomics
SeqNNGP facade (SURVEY.md section 0 model family; section 2 'SeqNNGP core')."""

from pynngp_tpu.models.latent import LatentNNGP, LatentState
from pynngp_tpu.models.response import ResponseNNGP, ResponseState
from pynngp_tpu.models.seq import SeqNNGP

__all__ = [
    "LatentNNGP",
    "LatentState",
    "ResponseNNGP",
    "ResponseState",
    "SeqNNGP",
]
