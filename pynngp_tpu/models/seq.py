"""SeqNNGP — reference-ergonomics facade.

The reference's user API is ``SeqNNGP(y, coords, m, covModel, noiseModel,
distFunc); model.sample(N); model.predict(coords0)`` (SURVEY.md sections 1-3).
This facade keeps that shape while delegating to the TPU-native
:class:`ResponseNNGP` / :class:`LatentNNGP` models; ``model='latent'``
matches the reference's sequential-Gibbs latent sampler semantics,
``model='response'`` its collapsed response variant.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from pynngp_tpu.diagnostics import summarize
from pynngp_tpu.kernels import get_kernel
from pynngp_tpu.models.latent import LatentNNGP
from pynngp_tpu.models.response import ResponseNNGP
from pynngp_tpu.predict import build_prediction_table, predict_draws

__all__ = ["SeqNNGP"]


class SeqNNGP:
    """Sequential-NNGP workflow object (construct -> sample -> predict)."""

    def __init__(
        self,
        y,
        coords,
        m: int = 15,
        cov_model="exponential",
        model: str = "latent",
        x=None,
        distance: str = "euclidean",
        ordering: str = "coordinate",
        priors: Optional[dict] = None,
        dtype=jnp.float32,
        **kwargs,
    ):
        self.kernel = get_kernel(cov_model)
        self.model_kind = model
        cls = {"latent": LatentNNGP, "response": ResponseNNGP}[model]
        self._model = cls(
            coords,
            y,
            kernel=self.kernel,
            m=m,
            x=x,
            distance=distance,
            ordering=ordering,
            priors=priors,
            dtype=dtype,
            **kwargs,
        )
        self.m = m
        self.distance = distance
        self.dtype = dtype
        self._draws = None

    @property
    def model(self):
        return self._model

    def sample(self, n_samples: int, n_burn: int = 500, thin: int = 1,
               n_chains: int = 1, seed: int = 0, **kwargs):
        """Run MCMC; draws are stored on the object (reference keeps them in
        the C++ object) and returned."""
        self._draws = self._model.sample(
            n_samples, n_burn=n_burn, thin=thin, n_chains=n_chains, seed=seed,
            **kwargs,
        )
        return self._draws

    def summary(self):
        assert self._draws is not None, "call sample() first"
        return summarize(self._draws)

    def predict(self, coords0, x0=None, key=None, noise_on_target: bool = True,
                draws: Optional[dict] = None, thin: int = 1,
                batch_draws: int = 8):
        """Neighbor-conditioned kriging at new sites for every stored
        posterior draw — ``predict(coords0[, X0])`` (SURVEY.md section 3.3).

        ``x0`` (n0, p): covariates at the new sites; requires the model to
        have been fit with covariates (beta draws present).  The predictive
        mean then includes the fixed-effects term x0 @ beta per draw, and
        the response model conditions on the per-draw residuals y - X beta.
        """
        draws = draws if draws is not None else self._draws
        assert draws is not None, "call sample() first"
        flat = {
            k: np.asarray(v).reshape(-1, *np.asarray(v).shape[2:])
            if np.asarray(v).ndim > (1 + (k in ("w", "beta")))
            else np.asarray(v)
            for k, v in draws.items()
        }
        sel = slice(None, None, thin)
        tab = self._model.data.table
        train_pts = np.asarray(self._model.data.vecchia.coords)
        ptable = build_prediction_table(
            train_pts, np.asarray(coords0), self.m,
            metric=self.distance, dtype=self.dtype,
        )
        param_draws = {k: flat[k][sel] for k in ("sigma2", "tau2", "phi") if k in flat}
        if "nu" in flat:
            param_draws["nu"] = flat["nu"][sel]
        beta_draws = None
        if x0 is not None:
            assert "beta" in flat, (
                "x0 given but the model has no fixed-effect draws; "
                "construct with x= and re-sample"
            )
            beta_draws = flat["beta"][sel]
        if self.model_kind == "latent":
            assert "w" in flat, "latent prediction needs collect_w=True draws"
            # w draws are stored in original order; map back to ordered space
            w_ord = flat["w"][sel][..., tab.order]
            return predict_draws(
                self.kernel, ptable, None, param_draws, key=key,
                x0=x0, beta_draws=beta_draws,
                values_draws=w_ord, noise_on_target=noise_on_target,
                batch_draws=batch_draws,
            )
        # response model with covariates conditions on y - X beta per draw
        x_train = self._model.data.x if beta_draws is not None else None
        return predict_draws(
            self.kernel, ptable, self._model.data.y, param_draws, key=key,
            x0=x0, beta_draws=beta_draws, x_train=x_train,
            noise_on_target=noise_on_target, batch_draws=batch_draws,
        )
