"""GP regression example: samplers vs the analytic posterior, and exact
marginal likelihood for hyperparameter work."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesic_tpu.models import gp


def test_ess_matches_analytic_posterior():
    cfg = gp.Config(n=96, num_samples=1200, num_burnin=300, num_chains=8)
    out = gp.run(cfg, sampler="ess")
    # posterior mean of f within MC error of the exact GP posterior
    tol = 4 * out["analytic_std"].max() / np.sqrt(200)
    assert out["max_mean_err"] < max(0.1, tol)
    np.testing.assert_allclose(out["f_std"], out["analytic_std"],
                               rtol=0.25, atol=0.03)


def test_nuts_agrees_with_ess():
    cfg = gp.Config(n=48, num_samples=400, num_burnin=200, num_chains=4)
    a = gp.run(cfg, sampler="ess")
    b = gp.run(cfg, sampler="nuts")
    np.testing.assert_allclose(a["f_mean"], b["f_mean"], atol=0.12)


def test_log_marginal_matches_scipy():
    from scipy.stats import multivariate_normal

    cfg = gp.Config(n=40)
    x, y, _ = gp.make_data(cfg)
    got = float(gp.log_marginal(x, y, cfg.lengthscale, cfg.amplitude,
                                cfg.noise))
    k = np.asarray(gp.rbf(x, x, cfg.lengthscale, cfg.amplitude))
    ref = multivariate_normal(np.zeros(cfg.n),
                              k + cfg.noise**2 * np.eye(cfg.n),
                              allow_singular=True).logpdf(np.asarray(y))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_marginal_likelihood_prefers_true_lengthscale():
    cfg = gp.Config(n=128)
    x, y, _ = gp.make_data(cfg)
    lm_true = float(gp.log_marginal(x, y, cfg.lengthscale, cfg.amplitude,
                                    cfg.noise))
    for bad in (0.05, 3.0):
        lm_bad = float(gp.log_marginal(x, y, bad, cfg.amplitude,
                                       cfg.noise))
        assert lm_true > lm_bad + 2.0
