"""Parallel tempering (infer/mcmc/tempering.py) — SURVEY.md §4.3-style
golden-posterior checks plus the capability test that motivates the method:
mode-hopping on a well-separated bimodal target that plain HMC cannot cross.
"""

import jax
import jax.numpy as jnp
import numpy as np

import bayesic_tpu.dist as dist
from bayesic_tpu.core import factor, sample
from bayesic_tpu.infer.mcmc import MCMC
from bayesic_tpu.infer.mcmc.tempering import (
    ParallelTempering,
    geometric_ladder,
)

KEY = jax.random.PRNGKey(0)


def test_ladder():
    b = geometric_ladder(5, beta_min=0.05)
    assert float(b[0]) == 1.0
    np.testing.assert_allclose(float(b[-1]), 0.05, rtol=1e-5)
    assert np.all(np.diff(np.asarray(b)) < 0)


def test_pt_conjugate_normal():
    """Cold rung reproduces the analytic Normal-Normal posterior."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(2.0, 1.0, 20).astype(np.float32))
    prec = 1.0 / 25.0 + 20.0
    post_mean = 20.0 * float(np.mean(np.asarray(y))) / prec
    post_std = prec ** -0.5

    def model():
        mu = sample("mu", dist.Normal(0.0, 5.0))
        sample("obs", dist.Normal(mu, 1.0).expand((20,)).to_event(1), obs=y)

    pt = ParallelTempering(model, num_replicas=4, num_warmup=300,
                           num_samples=500, num_chains=8, num_leapfrog=8)
    res = pt.run(KEY)
    mu = np.asarray(res.samples["mu"]).ravel()
    se = mu.std() / np.sqrt(len(mu) / 10.0)   # generous autocorr discount
    assert abs(mu.mean() - post_mean) < 4 * se + 0.05
    np.testing.assert_allclose(mu.std(), post_std, rtol=0.2)
    # ladder diagnostics present and sane
    sw = np.asarray(res.extra["swap_accept"])
    assert sw.shape == (3,)
    assert np.all(sw > 0.05)


def _bimodal_model():
    """Target: lik has well-separated modes at q = +-4 (8 sigma apart).
    The prior is broad; tempering flattens the likelihood so hot rungs
    diffuse between basins."""

    def model():
        q = sample("q", dist.Normal(0.0, 10.0))
        lp = jnp.logaddexp(
            dist.Normal(-4.0, 0.5).log_prob(q),
            dist.Normal(4.0, 0.5).log_prob(q),
        )
        factor("modes", lp)

    return model


def test_pt_hops_modes_where_hmc_cannot():
    model = _bimodal_model()
    pt = ParallelTempering(model, num_replicas=8, beta_min=0.01,
                           num_warmup=400, num_samples=600, num_chains=8,
                           num_leapfrog=8, init_step_size=0.3)
    res = pt.run(jax.random.PRNGKey(1))
    q = np.asarray(res.samples["q"])          # (chains, samples)
    frac_pos = (q > 0).mean()
    # both modes visited with roughly equal mass
    assert 0.30 < frac_pos < 0.70, frac_pos
    # every chain individually hops (not just across-chain averaging)
    per_chain = (q > 0).mean(axis=1)
    assert (np.minimum(per_chain, 1 - per_chain) > 0.05).mean() > 0.6

    # plain HMC with the same per-chain budget stays stuck: chains that
    # start in one basin essentially never cross an 8-sigma barrier
    mcmc = MCMC(model=model, kernel="hmc", num_warmup=400, num_samples=600,
                num_chains=8, hmc_num_steps=8, init_step_size=0.3)
    rres = mcmc.run(jax.random.PRNGKey(1))
    qh = np.asarray(rres.samples["q"])
    per_chain_h = (qh > 0).mean(axis=1)
    stuck = (np.minimum(per_chain_h, 1 - per_chain_h) < 0.02).mean()
    assert stuck > 0.8, per_chain_h


def test_pt_swap_invariance_unimodal():
    """With a flat ladder (all betas = 1) swaps are always accepted and
    the cold marginal is still correct — a detailed-balance smoke check."""
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(0.0, 1.0, 10).astype(np.float32))

    def model():
        mu = sample("mu", dist.Normal(0.0, 3.0))
        sample("obs", dist.Normal(mu, 1.0).expand((10,)).to_event(1), obs=y)

    pt = ParallelTempering(model, betas=[1.0, 1.0, 1.0], num_warmup=200,
                           num_samples=400, num_chains=4, num_leapfrog=8)
    res = pt.run(jax.random.PRNGKey(4))
    sw = np.asarray(res.extra["swap_accept"])
    np.testing.assert_allclose(sw, 1.0, atol=1e-6)
    prec = 1.0 / 9.0 + 10.0
    post_mean = 10.0 * float(np.mean(np.asarray(y))) / prec
    mu = np.asarray(res.samples["mu"]).ravel()
    assert abs(mu.mean() - post_mean) < 0.1


def test_pt_evidence_beta_bernoulli():
    """TI and stepping-stone marginal likelihood vs the analytic
    Beta-Bernoulli evidence: 50 trials, 37 heads, uniform prior ->
    log Z = -log(51) (the SURVEY.md C24 SMC oracle, now via PT)."""
    heads, n = 37, 50
    y = jnp.concatenate([jnp.ones(heads), jnp.zeros(n - heads)])

    def model():
        p = sample("p", dist.Beta(1.0, 1.0))
        sample("obs", dist.Bernoulli(p).expand((n,)).to_event(1), obs=y)

    betas = jnp.concatenate([geometric_ladder(11, beta_min=0.01),
                             jnp.zeros((1,))])
    pt = ParallelTempering(model, betas=betas, num_warmup=400,
                           num_samples=1500, num_chains=8)
    res = pt.run(jax.random.PRNGKey(3))
    # Bernoulli-sequence likelihood (no binomial coefficient):
    # Z = B(heads+1, n-heads+1) / B(1, 1)
    from scipy.special import betaln
    ref = float(betaln(heads + 1, n - heads + 1))
    ss = float(res.extra["log_evidence_ss"])
    ti = float(res.extra["log_evidence_ti"])
    assert abs(ss - ref) < 0.1, (ss, ref)
    assert abs(ti - ref) < 0.3, (ti, ref)   # trapezoid bias on 12 rungs
