"""ESS / split-R-hat estimator validation (VERDICT r3 weak 6 / item 9).

The north-star metric is ESS/sec, so the ESS estimator itself needs an
independent cross-check: an AR(1) chain has the closed-form integrated
autocorrelation time tau = (1 + rho) / (1 - rho), i.e.
ESS = n (1 - rho) / (1 + rho) — an analytic oracle no estimator detail can
leak into.  Also pins the hard cap ESS <= n_chains * n_draws."""

import numpy as np
import pytest

from pynngp_tpu.diagnostics import ess, split_rhat, summarize


def _ar1(rng, n, rho, c=1):
    """(c, n) AR(1) chains with unit marginal variance."""
    x = np.empty((c, n))
    innov = rng.standard_normal((c, n)) * np.sqrt(1 - rho**2)
    x[:, 0] = rng.standard_normal(c)
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + innov[:, t]
    return x if c > 1 else x[0]


@pytest.mark.parametrize("rho", [0.0, 0.5, 0.9])
def test_ess_matches_ar1_closed_form(rho):
    rng = np.random.default_rng(0)
    n = 200_000  # long chain: estimator noise ~ sqrt(tau/n) << 10%
    x = _ar1(rng, n, rho)
    expected = n * (1 - rho) / (1 + rho)
    assert ess(x) == pytest.approx(expected, rel=0.1)


def test_ess_capped_at_draw_count():
    rng = np.random.default_rng(1)
    # strongly antithetic chain: true tau < 1, but the estimator must not
    # report more effective samples than draws (headline-metric credibility)
    x = _ar1(rng, 50_000, -0.9)
    assert ess(x) <= 50_000
    # multi-chain: cap is chains * draws
    y = rng.standard_normal((4, 1000))
    assert ess(y) <= 4000


def test_ess_iid_near_n():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(100_000)
    assert ess(x) == pytest.approx(100_000, rel=0.05)


def test_ess_multichain_detects_mean_disagreement():
    rng = np.random.default_rng(3)
    good = rng.standard_normal((4, 2000))
    bad = good + np.array([[-3.0], [3.0], [-3.0], [3.0]])  # disjoint chains
    assert ess(bad) < 0.2 * ess(good)


def test_split_rhat_converged_vs_stuck():
    rng = np.random.default_rng(4)
    good = rng.standard_normal((4, 2000))
    assert split_rhat(good) < 1.01
    bad = good + np.array([[0.0], [5.0], [0.0], [5.0]])
    assert split_rhat(bad) > 1.5
    # within-chain drift (first half != second half) is also caught
    drift = np.concatenate(
        [rng.standard_normal((2, 1000)), 5 + rng.standard_normal((2, 1000))],
        axis=1,
    )
    assert split_rhat(drift) > 1.5


def test_summarize_quantiles_and_fields():
    rng = np.random.default_rng(5)
    draws = {"phi": rng.standard_normal((2, 4000)) * 2.0 + 1.0}
    s = summarize(draws)["phi"]
    assert s["mean"] == pytest.approx(1.0, abs=0.1)
    assert s["sd"] == pytest.approx(2.0, rel=0.05)
    assert s["q2.5"] < s["q50"] < s["q97.5"]
    assert 0 < s["ess"] <= 8000
    assert s["rhat"] == pytest.approx(1.0, abs=0.01)
