"""Super-unity ESS is correct estimation, not flattery (VERDICT r2 item
9): for an AR(1) chain the integrated autocorrelation time is analytic,
tau = (1+rho)/(1-rho), so a NEGATIVE rho gives tau < 1 and ESS > draws.
The Geyer estimator must recover it from a long run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesic_tpu.utils import diagnostics as diag


def _ar1(key, rho, n_chains, n, dim=1):
    innov = jax.random.normal(key, (n_chains, n, dim))
    scale = np.sqrt(1.0 - rho * rho)

    def step(x, e):
        x = rho * x + scale * e
        return x, x

    x0 = jax.random.normal(jax.random.fold_in(key, 1), (n_chains, dim))
    _, xs = jax.lax.scan(step, x0, jnp.swapaxes(innov, 0, 1))
    return jnp.swapaxes(xs, 0, 1)     # (chains, n, dim)


@pytest.mark.parametrize("rho,rel", [(-0.4, 0.15), (0.5, 0.15)])
def test_ess_matches_ar1_oracle(rho, rel):
    x = _ar1(jax.random.PRNGKey(0), rho, n_chains=8, n=20_000)
    tau_true = (1.0 + rho) / (1.0 - rho)
    ess_true = x.shape[0] * x.shape[1] / tau_true
    got = float(diag.ess(x)[0])
    assert got == pytest.approx(ess_true, rel=rel)


def test_negative_rho_gives_super_unity_ess_per_draw():
    """rho=-0.4 -> tau=0.4286 -> ESS/draw ~ 2.33: the estimator reports
    MORE effective samples than draws, and that is the right answer."""
    x = _ar1(jax.random.PRNGKey(2), -0.4, n_chains=8, n=20_000)
    n_draws = x.shape[0] * x.shape[1]
    got = float(diag.ess(x)[0])
    assert got > 1.8 * n_draws
    assert got < 3.0 * n_draws
