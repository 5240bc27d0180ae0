"""NNGP kriging on a REAL spatial dataset (SURVEY.md section 2 'Examples'
row: the reference ships notebooks on real spatial data alongside the
simulated walkthroughs).

Dataset: the luminance channel of scikit-learn's bundled natural photograph
``china.jpg`` (427 x 640, public sample data shipped with sklearn — no
network access needed).  A natural image is a genuine measured 2-D spatial
field with nonstationary structure, sharp edges, and texture — a much
harsher test than any simulated GP draw.  The workflow is the reference's
construct -> sample -> predict -> summarize loop:

  1. sample n_train pixel locations as 'observations' of the field,
  2. fit a response-NNGP with an exponential kernel by MCMC,
  3. krige n_test held-out pixels from the posterior draws,
  4. report RMSE / 90% interval coverage, and compare against exact dense-GP
     kriging on a small subregion (the gold oracle).

Run: python examples/image_kriging.py [--n-train 20000] [--sampler mwg]
"""

import os
import sys

# runnable as `python examples/<name>.py` from anywhere without an
# installed package: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def load_luminance():
    """China photo -> (h, w) luminance field in [0, 1]."""
    from sklearn.datasets import load_sample_images

    img = load_sample_images().images[0].astype(np.float64)  # (427, 640, 3)
    lum = img @ np.array([0.2126, 0.7152, 0.0722]) / 255.0
    return lum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=20_000)
    ap.add_argument("--n-test", type=int, default=2_000)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--samples", type=int, default=400)
    ap.add_argument("--burn", type=int, default=400)
    ap.add_argument("--sampler", default="mwg", choices=["mwg", "nuts"])
    args = ap.parse_args()

    import pynngp_tpu as pn

    lum = load_luminance()
    h, w = lum.shape
    yy, xx = np.mgrid[0:h, 0:w]
    # coords in a ~unit box (aspect preserved); values standardized
    scale = max(h, w)
    coords_all = np.stack([xx.ravel() / scale, yy.ravel() / scale], axis=1)
    vals_all = lum.ravel()
    mu, sd = vals_all.mean(), vals_all.std()
    z_all = (vals_all - mu) / sd

    rng = np.random.default_rng(0)
    perm = rng.permutation(coords_all.shape[0])
    tr = perm[: args.n_train]
    te = perm[args.n_train : args.n_train + args.n_test]

    print(f"china.jpg luminance field: {h}x{w} px; "
          f"n_train={len(tr)} n_test={len(te)} m={args.m}")

    t0 = time.time()
    model = pn.SeqNNGP(
        z_all[tr], coords_all[tr], m=args.m,
        cov_model="exponential", model="response",
    )
    print(f"model built in {time.time()-t0:.1f}s "
          f"(backend={model.model.backend})")

    t0 = time.time()
    if args.sampler == "nuts":
        mp = model.model.fit_map(n_steps=200)
        draws = model.model.sample_nuts(
            args.samples, n_burn=args.burn, n_chains=2,
            init_u=np.asarray(mp.u),
            init_inv_mass=np.asarray(mp.laplace_cov),
        )
        draws = {k: np.asarray(v).reshape(-1) if np.asarray(v).ndim == 2
                 else np.asarray(v) for k, v in draws.items()}
        model._draws = draws
    else:
        model.sample(args.samples, n_burn=args.burn, seed=1)
    print(f"sampling done in {time.time()-t0:.1f}s")

    print("posterior summary (standardized scale):")
    for k, row in model.summary().items():
        print(f"  {k:7s} mean={row['mean']:8.4f} sd={row['sd']:.4f} "
              f"q2.5={row['q2.5']:8.4f} q97.5={row['q97.5']:8.4f}")

    # --- predict held-out pixels ---------------------------------------
    import jax

    t0 = time.time()
    pred = model.predict(coords_all[te], key=jax.random.PRNGKey(7), thin=4)
    mean = np.asarray(pred["mean"]).mean(axis=0)
    lo = np.quantile(np.asarray(pred["samples"]), 0.05, axis=0)
    hi = np.quantile(np.asarray(pred["samples"]), 0.95, axis=0)
    truth = z_all[te]
    rmse = float(np.sqrt(np.mean((mean - truth) ** 2)))
    cover = float(np.mean((truth >= lo) & (truth <= hi)))
    base = float(np.sqrt(np.mean(truth**2)))  # predict-the-mean baseline
    print(f"kriging {len(te)} held-out pixels in {time.time()-t0:.1f}s:")
    print(f"  RMSE={rmse:.4f} (constant-mean baseline {base:.4f}), "
          f"90% interval coverage={cover:.3f}")

    # --- exact-kriging comparison on a small subregion (gold oracle) ----
    from pynngp_tpu.gold.dense_gp import dense_krig_predict

    sub = (coords_all[tr][:, 0] < 0.25) & (coords_all[tr][:, 1] < 0.25)
    sub_te = (coords_all[te][:, 0] < 0.25) & (coords_all[te][:, 1] < 0.25)
    if sub.sum() > 50 and sub_te.sum() > 10:
        s = model.summary()
        mean_d, _ = dense_krig_predict(
            z_all[tr][sub], coords_all[tr][sub], coords_all[te][sub_te],
            "exponential", s["sigma2"]["mean"], s["phi"]["mean"],
            s["tau2"]["mean"],
        )
        nngp_sub = mean[sub_te]
        agree = float(np.sqrt(np.mean((nngp_sub - mean_d) ** 2)))
        rmse_d = float(np.sqrt(np.mean((mean_d - truth[sub_te]) ** 2)))
        print(f"  subregion ({int(sub.sum())} train / {int(sub_te.sum())} "
              f"test px): exact dense kriging RMSE={rmse_d:.4f}, "
              f"NNGP-vs-dense mean discrepancy={agree:.4f}")


if __name__ == "__main__":
    main()
