"""SVGP example (models/svgp.py): the full-batch FullRankGuide optimum must
match the closed-form optimal whitened q(v) (exact oracle — Gaussian noise),
and the subsampled bound must be an unbiased estimate of the full bound."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bayesic_tpu.core.logjoint import build_logjoint
from bayesic_tpu.models import svgp


def _small_cfg(**kw):
    base = dict(n=256, num_inducing=16, batch=256, steps=15000, lr=0.01,
                seed=0)
    base.update(kw)
    return svgp.Config(**base)


def test_fullbatch_svi_recovers_optimal_q():
    cfg = _small_cfg()
    out = svgp.run_svi(cfg, jax.random.PRNGKey(0))
    mu_opt, sigma_opt = svgp.optimal_q(out["x"], out["y"], cfg,
                                       out["project"])
    np.testing.assert_allclose(out["v_mean"], mu_opt, atol=0.05)
    np.testing.assert_allclose(out["v_cov"], sigma_opt, atol=0.03)
    # predictions close to the truth at the noise floor
    assert out["rmse_truth"] < 0.1


def test_subsampled_bound_unbiased():
    """E_batch[log-density] == full-batch log-density at fixed v (the plate
    scaling must cover the factor site too)."""
    cfg = _small_cfg(batch=32)
    x, y, _ = svgp.make_data(cfg)
    model_sub, _, _ = svgp.make_model(x, y, cfg)
    model_full, _, _ = svgp.make_model(
        x, y, dataclasses.replace(cfg, batch=cfg.n))

    _, ld_sub, _, _ = build_logjoint(model_sub)
    _, ld_full, _, _ = build_logjoint(model_full)

    v = {"v": 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                      (cfg.num_inducing,))}
    full = float(ld_full(v))
    ests = [
        float(ld_sub(v, rng_key=jax.random.fold_in(jax.random.PRNGKey(2),
                                                   i)))
        for i in range(400)
    ]
    est, se = np.mean(ests), np.std(ests) / np.sqrt(len(ests))
    assert abs(est - full) < 4 * se, (est, full, se)


def test_collapsed_bound_value():
    """At the optimal q the ELBO equals the collapsed Titsias bound
    log N(y; 0, A A^T + sigma^2 I) - 0.5 sum(r)/sigma^2; the SVI loss must
    approach it from above."""
    cfg = _small_cfg()
    out = svgp.run_svi(cfg, jax.random.PRNGKey(0))
    a = np.asarray(out["project"](out["x"]))
    n = cfg.n
    cov = a @ a.T + cfg.noise**2 * np.eye(n)
    sign, logdet = np.linalg.slogdet(cov)
    yv = np.asarray(out["y"])
    quad = yv @ np.linalg.solve(cov, yv)
    log_nq = -0.5 * (logdet + quad + n * np.log(2 * np.pi))
    r = np.maximum(cfg.amplitude**2 - np.sum(a * a, -1), 0.0)
    bound = log_nq - 0.5 * r.sum() / cfg.noise**2

    final_elbo = -float(np.mean(np.asarray(out["losses"])[-200:]))
    assert final_elbo <= bound + 2.0
    assert abs(final_elbo - bound) < 0.05 * abs(bound) + 5.0
