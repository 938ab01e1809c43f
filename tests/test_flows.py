"""FlowGuide (IAF) tests: exact density bookkeeping + posterior quality.

SURVEY.md C6 ladder: the flow must (a) report log q that exactly matches
the change-of-variables density of its own pushforward (checked against an
autodiff Jacobian determinant), and (b) capture posterior correlation that
mean-field structurally cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayesic_tpu import dist
from bayesic_tpu.core import sample
from bayesic_tpu.infer.svi import SVI, FlowGuide, MeanFieldGuide
from bayesic_tpu.core.logjoint import build_logjoint

KEY = jax.random.PRNGKey(0)


def _toy_info(d):
    def model():
        sample("w", dist.Normal(0.0, 1.0).expand((d,)).to_event(1))

    info, _, _, _ = build_logjoint(model)
    return info


def test_logq_matches_autodiff_jacobian():
    d = 5
    guide = FlowGuide(_toy_info(d), num_flows=3, hidden=(16, 16))
    params = guide.init(KEY)
    # randomize the zero-init output heads so the flow is non-trivial
    for k, layer in enumerate(params["flows"]):
        kk = jax.random.fold_in(KEY, 100 + k)
        layer["w_out"] = 0.5 * jax.random.normal(kk, layer["w_out"].shape)
        layer["b_out"] = 0.1 * jax.random.normal(
            jax.random.fold_in(kk, 1), layer["b_out"].shape)

    eps = jax.random.normal(jax.random.PRNGKey(3), (7, d))

    def push_u(e):
        u, _ = guide._push(params, e)
        return u

    _, logq = guide._push(params, eps)
    base = jnp.sum(-0.5 * eps**2 - 0.5 * np.log(2 * np.pi), -1)
    for i in range(eps.shape[0]):
        J = jax.jacfwd(push_u)(eps[i])
        _, ld = jnp.linalg.slogdet(J)
        np.testing.assert_allclose(float(logq[i]), float(base[i] - ld),
                                   rtol=1e-5, atol=1e-5)


def test_flow_layers_are_autoregressive():
    d = 6
    guide = FlowGuide(_toy_info(d), num_flows=1, hidden=(32,))
    params = guide.init(KEY)
    layer = params["flows"][0]
    layer["w_out"] = jax.random.normal(jax.random.fold_in(KEY, 9),
                                       layer["w_out"].shape)
    u = jax.random.normal(jax.random.PRNGKey(1), (d,))
    m, s = guide._conditioner(layer, u)
    # output j must not depend on inputs >= j
    Jm = jax.jacfwd(lambda uu: guide._conditioner(layer, uu)[0])(u)
    Js = jax.jacfwd(lambda uu: guide._conditioner(layer, uu)[1])(u)
    for J in (Jm, Js):
        assert np.allclose(np.triu(np.asarray(J)), 0.0, atol=1e-7)


def test_flow_beats_meanfield_on_correlated_posterior():
    # y = x @ w + noise with strongly collinear columns -> correlated
    # posterior over w that diag-Gaussian q cannot represent
    rng = np.random.default_rng(0)
    n, d = 64, 2
    base = rng.normal(size=(n, 1))
    x = np.concatenate([base + 0.05 * rng.normal(size=(n, 1)),
                        base + 0.05 * rng.normal(size=(n, 1))], 1)
    w_true = np.array([1.0, -0.5])
    y = x @ w_true + 0.1 * rng.normal(size=n)
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)

    # analytic Gaussian posterior (sigma known)
    prec = np.eye(d) / 4.0 + np.asarray(x.T @ x) / 0.01
    cov = np.linalg.inv(prec)
    mean = cov @ np.asarray(x.T @ y) / 0.01

    def model():
        w = sample("w", dist.Normal(0.0, 2.0).expand((d,)).to_event(1))
        sample("obs", dist.Normal(x @ w, 0.1).to_event(1), obs=y)

    def run(guide_factory, steps=3000):
        svi = SVI(model, guide_factory,
                  optax.adam(optax.cosine_decay_schedule(5e-3, steps)))
        res = svi.run(KEY, steps)
        return svi, res

    svi_f, res_f = run(
        lambda info: FlowGuide(info, num_flows=2, hidden=(32,)))
    svi_m, res_m = run(MeanFieldGuide)

    # flow reaches a strictly better bound on a correlated target
    tail_f = float(jnp.mean(res_f.losses[-200:]))
    tail_m = float(jnp.mean(res_m.losses[-200:]))
    assert tail_f < tail_m - 0.5, (tail_f, tail_m)

    # flow's MC covariance matches the analytic posterior correlation
    eps = jax.random.normal(jax.random.PRNGKey(5), (8192, d))
    u, _ = svi_f.guide._push(res_f.params, eps)
    u = np.asarray(u)
    cc = np.cov(u.T)
    corr = cc[0, 1] / np.sqrt(cc[0, 0] * cc[1, 1])
    ref_corr = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    assert abs(ref_corr) > 0.9            # the test target is meaningful
    assert abs(corr - ref_corr) < 0.1
    assert np.allclose(u.mean(0), mean, atol=0.15)
