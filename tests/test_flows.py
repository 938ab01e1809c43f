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


# ---------------------------------------------------------------------------
# STL path (VERDICT r2 item 7): sequential inverse + variance reduction
# ---------------------------------------------------------------------------

def _nontrivial_params(guide, key, scale=0.5):
    params = guide.init(key)
    for k, layer in enumerate(params["flows"]):
        kk = jax.random.fold_in(key, 100 + k)
        layer["w_out"] = scale * jax.random.normal(kk, layer["w_out"].shape)
        layer["b_out"] = 0.1 * jax.random.normal(
            jax.random.fold_in(kk, 1), layer["b_out"].shape)
    params["loc"] = jax.random.normal(jax.random.fold_in(key, 7),
                                      params["loc"].shape)
    return params


def test_inverse_recovers_eps_and_logq():
    """log_prob_at(params, push(eps)) == logq from the forward push —
    the sequential inverse is exact."""
    d = 6
    guide = FlowGuide(_toy_info(d), num_flows=3, hidden=(16,), stl=True)
    params = _nontrivial_params(guide, KEY)
    eps = jax.random.normal(jax.random.PRNGKey(4), (9, d))
    u, logq_fwd = guide._push(params, eps)
    logq_inv = guide.log_prob_at(params, u)
    np.testing.assert_allclose(np.asarray(logq_inv), np.asarray(logq_fwd),
                               rtol=2e-4, atol=2e-4)


def test_stl_same_value_different_gradient():
    """STL logq has the same VALUE as the standard estimator but its
    gradient wrt guide params keeps only the path term."""
    d = 4
    info = _toy_info(d)
    g_std = FlowGuide(info, num_flows=2, hidden=(16,), stl=False)
    g_stl = FlowGuide(info, num_flows=2, hidden=(16,), stl=True)
    params = _nontrivial_params(g_std, KEY)
    key = jax.random.PRNGKey(5)

    def logq_fn(guide):
        def f(p):
            _, logq = guide.sample_and_log_prob(p, key, (3,),
                                                stop_gradient_q=True)
            return jnp.sum(logq)
        return f

    v_std, g1 = jax.value_and_grad(logq_fn(g_std))(params)
    v_stl, g2 = jax.value_and_grad(logq_fn(g_stl))(params)
    np.testing.assert_allclose(float(v_std), float(v_stl), rtol=2e-4)
    # gradients must differ (the score term is dropped in STL)
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2))]
    assert max(diffs) > 1e-4


def test_stl_reduces_gradient_variance_near_optimum():
    """Fit an IAF to a correlated Gaussian (exactly expressible), then
    compare per-key ELBO-gradient variance: STL << standard near the
    optimum (the STL estimator's variance -> 0 there)."""
    d = 2
    cov = jnp.asarray([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.linalg.inv(cov)

    def model():
        sample("z", dist.MultivariateNormal(jnp.zeros(d), cov).to_event(0))

    info, _, _, _ = build_logjoint(model)

    def make_svi(stl):
        return SVI(model, lambda i: FlowGuide(i, num_flows=2, hidden=(16,),
                                              stl=stl),
                   optax.adam(0.01), stl=stl)

    svi = make_svi(True)
    res = svi.run(jax.random.PRNGKey(0), 3000)
    params = res.params

    def grad_one(svi_obj, k):
        return jax.grad(lambda p: svi_obj.elbo(p, k))(params)

    keys = jax.random.split(jax.random.PRNGKey(9), 256)
    svi_std, svi_stl = make_svi(False), make_svi(True)
    g_std = jax.vmap(lambda k: grad_one(svi_std, k))(keys)
    g_stl = jax.vmap(lambda k: grad_one(svi_stl, k))(keys)

    def total_var(g):
        return sum(float(jnp.var(x, axis=0).sum())
                   for x in jax.tree_util.tree_leaves(g))

    v_std, v_stl = total_var(g_std), total_var(g_stl)
    assert v_stl < 0.5 * v_std, (v_stl, v_std)
