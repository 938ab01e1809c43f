"""infer_discrete: recover enumerated discrete sites from their exact
conditionals given continuous posterior draws.

Oracles: hand-computed Bayes assignment probabilities for a two-component
mixture (batched plate-local site) and a scalar two-site model checked
against brute-force conditionals.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesic_tpu import dist
from bayesic_tpu.core import sample
from bayesic_tpu.infer.discrete import infer_discrete

KEY = jax.random.PRNGKey(0)


def test_mixture_assignments_match_bayes_rule():
    # fixed continuous latents: two well-separated component means
    mus = np.array([-2.0, 2.0], np.float32)
    rng = np.random.default_rng(0)
    z_true = rng.integers(0, 2, 40)
    x = jnp.asarray((mus[z_true] + 0.5 * rng.normal(size=40))
                    .astype(np.float32))

    def model():
        mu = sample("mu", dist.Normal(0.0, 5.0).expand((2,)).to_event(1))
        z = sample("z", dist.Categorical(logits=jnp.zeros(2)),
                   sample_shape=(40,), infer={"enumerate": True})
        sample("obs", dist.Normal(mu[z], 0.5), obs=x)

    # posterior draws of mu pinned at the truth (S=600 identical draws) so
    # empirical assignment frequencies must equal the analytic Bayes rule
    S = 600
    samples = {"mu": jnp.broadcast_to(jnp.asarray(mus), (S, 2))}
    out = infer_discrete(model, samples, KEY)
    z = np.asarray(out["z"])                      # (S, 40)
    assert z.shape == (S, 40)

    lp0 = -0.5 * ((np.asarray(x) - mus[0]) / 0.5) ** 2
    lp1 = -0.5 * ((np.asarray(x) - mus[1]) / 0.5) ** 2
    p1 = 1.0 / (1.0 + np.exp(lp0 - lp1))
    np.testing.assert_allclose(z.mean(0), p1, atol=0.08)
    # hard assignments recover the truth where the data is decisive
    decisive = (p1 < 0.05) | (p1 > 0.95)
    assert (np.round(z.mean(0)[decisive]) == z_true[decisive]).mean() > 0.95


def test_two_scalar_sites_joint_conditional():
    # two dependent scalar discrete sites; brute-force the joint
    x_obs = 1.3

    def model():
        a = sample("a", dist.Categorical(logits=jnp.asarray([0.0, 0.5])),
                   infer={"enumerate": True})
        b = sample("b", dist.Categorical(
            logits=jnp.asarray([[0.0, 1.0], [1.0, 0.0]])[a]),
            infer={"enumerate": True})
        sample("obs", dist.Normal(a + b * 1.0, 0.8), obs=jnp.asarray(x_obs))

    S = 4000
    samples = {}   # no continuous latents

    def model_with_dummy():
        sample("c", dist.Normal(0.0, 1.0))
        model()

    draws = infer_discrete(model_with_dummy,
                           {"c": jnp.zeros((S,))}, jax.random.PRNGKey(1))
    a, b = np.asarray(draws["a"]), np.asarray(draws["b"])

    # brute force joint over (a, b)
    la = np.asarray(jax.nn.log_softmax(jnp.asarray([0.0, 0.5])))
    lb_tbl = np.asarray(jax.nn.log_softmax(
        jnp.asarray([[0.0, 1.0], [1.0, 0.0]]), axis=-1))
    joint = np.zeros((2, 2))
    for ai in range(2):
        for bi in range(2):
            ll = -0.5 * ((x_obs - (ai + bi)) / 0.8) ** 2
            joint[ai, bi] = la[ai] + lb_tbl[ai, bi] + ll
    pj = np.exp(joint - joint.max())
    pj /= pj.sum()
    emp = np.zeros((2, 2))
    for ai in range(2):
        for bi in range(2):
            emp[ai, bi] = ((a == ai) & (b == bi)).mean()
    np.testing.assert_allclose(emp, pj, atol=0.03)


def test_sample_enum_honors_scale_handler():
    """handlers.scale tempering must temper the discrete conditionals
    exactly as it tempers the density (r2 code-review finding)."""
    from bayesic_tpu.core import handlers
    from bayesic_tpu.core.logjoint import build_logjoint

    x_obs = 0.8
    c = 0.3

    def model():
        z = sample("z", dist.Categorical(logits=jnp.zeros(2)),
                   infer={"enumerate": True})
        sample("obs", dist.Normal(z * 2.0, 1.0), obs=jnp.asarray(x_obs))

    scaled = handlers.scale(model, factor=c)
    _, logdensity, _, _ = build_logjoint(scaled)
    S = 20000
    draws = np.asarray(jax.vmap(
        lambda k: logdensity.sample_enum({}, k)["z"]
    )(jax.random.split(jax.random.PRNGKey(0), S)))

    # tempered conditional: p(z) ∝ exp(c * [log pi_z + log N(x; 2z, 1)])
    lp = np.array([np.log(0.5) - 0.5 * (x_obs - 0.0) ** 2,
                   np.log(0.5) - 0.5 * (x_obs - 2.0) ** 2]) * c
    p1 = 1.0 / (1.0 + np.exp(lp[0] - lp[1]))
    assert abs(draws.mean() - p1) < 0.015
    # and it must DIFFER from the unscaled conditional (sanity)
    lp_u = np.array([np.log(0.5) - 0.5 * (x_obs - 0.0) ** 2,
                     np.log(0.5) - 0.5 * (x_obs - 2.0) ** 2])
    p1_u = 1.0 / (1.0 + np.exp(lp_u[0] - lp_u[1]))
    assert abs(p1 - p1_u) > 0.05
