"""HiddenMarkovModel tests.

Oracles: brute-force enumeration over all K^T state paths for log_prob /
Viterbi / posterior marginals (tiny T, K), plus an end-to-end NUTS
parameter-recovery run with the HMM as an observed site.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from bayesic_tpu import dist
from bayesic_tpu.core import sample
from bayesic_tpu.infer.mcmc import MCMC

K, T = 3, 5
KEY = jax.random.PRNGKey(0)


def _hmm(key=KEY):
    ki, kt, km = jax.random.split(key, 3)
    init = jax.random.normal(ki, (K,))
    trans = jax.random.normal(kt, (K, K))
    locs = jnp.asarray([-2.0, 0.0, 2.0])
    obs = dist.Normal(locs, 0.7)
    return dist.HiddenMarkovModel(init, trans, obs, T), init, trans, locs


def _brute_paths(init, trans, locs, x):
    """log p(x, z) for every path z in K^T."""
    li = jax.nn.log_softmax(init)
    lt = jax.nn.log_softmax(trans, axis=-1)
    out = {}
    for path in itertools.product(range(K), repeat=T):
        lp = li[path[0]]
        for a, b in zip(path[:-1], path[1:]):
            lp += lt[a, b]
        for t, k in enumerate(path):
            lp += dist.Normal(locs[k], 0.7).log_prob(x[t])
        out[path] = float(lp)
    return out


def test_log_prob_matches_enumeration():
    hmm, init, trans, locs = _hmm()
    x = hmm.sample(jax.random.PRNGKey(1))
    assert x.shape == (T,)
    joint = _brute_paths(init, trans, locs, x)
    ref = float(jax.scipy.special.logsumexp(
        jnp.asarray(list(joint.values()))))
    np.testing.assert_allclose(float(hmm.log_prob(x)), ref, rtol=1e-5)


def test_log_prob_batched_inputs():
    hmm, *_ = _hmm()
    xs = hmm.sample(jax.random.PRNGKey(2), (4, 2))
    assert xs.shape == (4, 2, T)
    lp = hmm.log_prob(xs)
    assert lp.shape == (4, 2)
    np.testing.assert_allclose(
        float(lp[1, 0]), float(hmm.log_prob(xs[1, 0])), rtol=1e-6)


def test_viterbi_matches_enumeration():
    hmm, init, trans, locs = _hmm(jax.random.PRNGKey(7))
    x = hmm.sample(jax.random.PRNGKey(3))
    joint = _brute_paths(init, trans, locs, x)
    best = max(joint, key=joint.get)
    got = tuple(int(v) for v in hmm.posterior_mode(x))
    assert got == best


def test_ffbs_matches_posterior_marginals():
    hmm, init, trans, locs = _hmm(jax.random.PRNGKey(8))
    x = hmm.sample(jax.random.PRNGKey(4))
    joint = _brute_paths(init, trans, locs, x)
    lps = np.asarray(list(joint.values()))
    w = np.exp(lps - lps.max())
    w /= w.sum()
    paths = np.asarray(list(joint.keys()))           # (K^T, T)
    marg = np.zeros((T, K))
    for t in range(T):
        for k in range(K):
            marg[t, k] = w[paths[:, t] == k].sum()

    draws = hmm.posterior_sample(jax.random.PRNGKey(5), x, (20000,))
    assert draws.shape == (20000, T)
    emp = np.stack([(np.asarray(draws) == k).mean(0) for k in range(K)], -1)
    np.testing.assert_allclose(emp, marg, atol=0.02)


def test_sample_moments():
    # stationary chain strongly prefers state 2 -> mean pulled to its loc
    init = jnp.log(jnp.asarray([0.01, 0.01, 0.98]))
    trans = jnp.log(jnp.asarray([[0.8, 0.1, 0.1],
                                 [0.1, 0.8, 0.1],
                                 [0.02, 0.02, 0.96]]))
    obs = dist.Normal(jnp.asarray([-2.0, 0.0, 2.0]), 0.1)
    hmm = dist.HiddenMarkovModel(init, trans, obs, 4)
    xs = hmm.sample(jax.random.PRNGKey(6), (4000,))
    assert float(xs.mean()) > 1.0


def test_nuts_recovers_emission_locs():
    # fixed well-separated dynamics; infer the emission means from 40
    # independent chains of length 12
    rng_init = jnp.log(jnp.asarray([0.5, 0.5]))
    rng_trans = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    true_locs = jnp.asarray([-1.5, 1.5])
    gen = dist.HiddenMarkovModel(
        rng_init, rng_trans, dist.Normal(true_locs, 0.5), 12)
    data = gen.sample(jax.random.PRNGKey(9), (40,))

    def model():
        locs = sample("locs", dist.Normal(0.0, 3.0).expand((2,))
                      .to_event(1))
        hmm = dist.HiddenMarkovModel(
            rng_init, rng_trans, dist.Normal(locs, 0.5), 12)
        sample("obs", hmm.expand((40,)).to_event(1), obs=data)

    r = MCMC(model=model, num_warmup=300, num_samples=300,
             num_chains=4).run(jax.random.PRNGKey(10))
    # symmetric dynamics -> label-switching bimodality; sort per draw
    locs = np.sort(np.asarray(r.samples["locs"]).reshape(-1, 2), -1).mean(0)
    np.testing.assert_allclose(locs, [-1.5, 1.5], atol=0.25)
