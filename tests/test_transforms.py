"""Transform tests (SURVEY.md §4.1): round-trip, ildj vs autodiff of forward
log-det, support membership."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesic_tpu.dist import constraints
from bayesic_tpu.dist import transforms as tf

KEY = jax.random.PRNGKey(0)


SCALAR_TRANSFORMS = [
    tf.Identity(),
    tf.Exp(),
    tf.Softplus(),
    tf.Sigmoid(),
    tf.Interval(-2.0, 5.0),
    tf.Affine(1.5, -2.0),
]


@pytest.mark.parametrize("t", SCALAR_TRANSFORMS,
                         ids=[repr(t) for t in SCALAR_TRANSFORMS])
def test_scalar_roundtrip_and_ldj(t):
    u = jnp.linspace(-3.0, 3.0, 11)
    x = t.forward(u)
    np.testing.assert_allclose(np.asarray(t.inverse(x)), np.asarray(u),
                               rtol=1e-4, atol=1e-5)
    # autodiff oracle for |dF/du|
    ldj_ad = jax.vmap(lambda ui: jnp.log(jnp.abs(jax.grad(t.forward)(ui))))(u)
    np.testing.assert_allclose(np.asarray(t.log_det_jacobian(u)),
                               np.asarray(ldj_ad), rtol=1e-4, atol=1e-5)


VECTOR_TRANSFORMS = [
    (tf.Ordered(), 5),
    (tf.StickBreaking(), 4),
    (tf.CorrCholesky(), 6),       # m = 4
    (tf.LowerCholeskyTransform(), 6),  # m = 3
]


@pytest.mark.parametrize("t,n", VECTOR_TRANSFORMS,
                         ids=[repr(t[0]) for t in VECTOR_TRANSFORMS])
def test_vector_roundtrip(t, n):
    u = jax.random.normal(KEY, (n,)) * 0.8
    x = t.forward(u)
    u2 = t.inverse(x)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), rtol=1e-4,
                               atol=1e-4)


def test_ordered_ldj_vs_autodiff():
    t = tf.Ordered()
    u = jax.random.normal(jax.random.PRNGKey(1), (5,))
    jac = jax.jacfwd(t.forward)(u)
    _, ld = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(float(t.log_det_jacobian(u)), ld, rtol=1e-4)


def test_lower_cholesky_ldj_vs_autodiff():
    t = tf.LowerCholeskyTransform()
    u = jax.random.normal(jax.random.PRNGKey(4), (6,)) * 0.7
    idx = np.tril_indices(3)

    def free_coords(uu):
        return t.forward(uu)[idx]

    jac = jax.jacfwd(free_coords)(u)
    _, ld = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(float(t.log_det_jacobian(u)), ld, rtol=1e-4)


def test_stickbreaking_properties():
    t = tf.StickBreaking()
    u = jax.random.normal(KEY, (7, 4))
    x = t.forward(u)
    assert x.shape == (7, 5)
    np.testing.assert_allclose(np.asarray(x.sum(-1)), 1.0, rtol=1e-6)
    assert np.all(np.asarray(x) >= 0)
    # u = 0 -> uniform simplex
    x0 = t.forward(jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(x0), 0.2, rtol=1e-5)


def test_stickbreaking_ldj_vs_autodiff():
    """ldj of u -> first K-1 simplex coords (a square map)."""
    t = tf.StickBreaking()
    u = jax.random.normal(jax.random.PRNGKey(2), (4,)) * 0.5

    def head(uu):
        return t.forward(uu)[:-1]

    jac = jax.jacfwd(head)(u)
    _, ld = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(float(t.log_det_jacobian(u)), ld, rtol=1e-4)


def test_corr_cholesky_ldj_vs_autodiff():
    """ldj of u -> strict-lower coords of L (a square map)."""
    t = tf.CorrCholesky()
    u = jax.random.normal(jax.random.PRNGKey(3), (6,)) * 0.6
    m = 4
    idx = np.tril_indices(m, -1)

    def strict_lower(uu):
        return t.forward(uu)[idx]

    jac = jax.jacfwd(strict_lower)(u)
    _, ld = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(float(t.log_det_jacobian(u)), ld, rtol=1e-4)


def test_corr_cholesky_valid():
    t = tf.CorrCholesky()
    u = jax.random.normal(KEY, (10, 10))  # m = 5
    ls = t.forward(u)
    assert ls.shape == (10, 5, 5)
    assert bool(constraints.corr_cholesky(ls).all())


def test_ordered_output_is_ordered():
    t = tf.Ordered()
    u = jax.random.normal(KEY, (20, 6))
    x = t.forward(u)
    assert np.all(np.diff(np.asarray(x), axis=-1) > 0)


def test_biject_to_registry():
    assert isinstance(tf.biject_to(constraints.real), tf.Identity)
    assert isinstance(tf.biject_to(constraints.positive), tf.Exp)
    assert isinstance(tf.biject_to(constraints.unit_interval), tf.Sigmoid)
    assert isinstance(tf.biject_to(constraints.simplex), tf.StickBreaking)
    assert isinstance(tf.biject_to(constraints.ordered), tf.Ordered)
    assert isinstance(tf.biject_to(constraints.corr_cholesky), tf.CorrCholesky)
    it = tf.biject_to(constraints.interval(0.0, 2.0))
    assert isinstance(it, tf.Interval)
    gt = tf.biject_to(constraints.greater_than(3.0))
    x = gt.forward(jnp.array(0.0))
    assert float(x) > 3.0
    with pytest.raises(ValueError):
        tf.biject_to(constraints.boolean)


def test_chain_ldj():
    t = tf.Chain(tf.Affine(0.0, 2.0), tf.Sigmoid())
    u = jnp.linspace(-2, 2, 9)
    ldj_ad = jax.vmap(lambda ui: jnp.log(jnp.abs(jax.grad(t.forward)(ui))))(u)
    np.testing.assert_allclose(np.asarray(t.log_det_jacobian(u)),
                               np.asarray(ldj_ad), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.inverse(t.forward(u))),
                               np.asarray(u), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# pytree / retrace regression (VERDICT r2 item 6): freshly built transforms
# and TransformedDistributions crossing a jit boundary must NOT retrace
# ---------------------------------------------------------------------------

def test_transforms_structural_equality():
    assert tf.Exp() == tf.Exp()
    assert hash(tf.Exp()) == hash(tf.Exp())
    assert tf.Exp() != tf.Softplus()
    assert tf.Interval(0.0, 1.0) == tf.Interval(0.0, 1.0)
    assert tf.Interval(0.0, 1.0) != tf.Interval(0.0, 2.0)
    assert tf.Chain(tf.Exp(), tf.Affine(1.0, 2.0)) == \
        tf.Chain(tf.Exp(), tf.Affine(1.0, 2.0))
    assert tf.Chain(tf.Exp()) != tf.Chain(tf.Softplus())


def test_transform_is_pytree():
    t = tf.Interval(jnp.asarray(0.5), jnp.asarray(2.5))
    leaves, treedef = jax.tree_util.tree_flatten(t)
    assert len(leaves) == 2
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert float(t2.forward(jnp.asarray(0.0))) == float(
        t.forward(jnp.asarray(0.0)))
    # stateless transforms flatten to no leaves, structure-only
    assert jax.tree_util.tree_leaves(tf.Exp()) == []


def test_no_retrace_fresh_transformed_distribution():
    from bayesic_tpu import dist

    calls = {"n": 0}

    @jax.jit
    def logp(d, x):
        calls["n"] += 1
        return d.log_prob(x)

    x = jnp.asarray(1.5)
    vals = []
    for i in range(3):
        d = dist.TransformedDistribution(dist.Normal(0.0, 1.0), tf.Exp())
        vals.append(float(logp(d, x)))
    assert calls["n"] == 1, f"retraced {calls['n']} times"
    assert vals[0] == vals[1] == vals[2]


def test_no_retrace_parametrized_chain():
    from bayesic_tpu import dist

    calls = {"n": 0}

    @jax.jit
    def logp(d, x):
        calls["n"] += 1
        return d.log_prob(x)

    x = jnp.asarray(1.5)
    for lo in (0.0, 1.0, 2.0):   # param VALUES are leaves: no retrace
        d = dist.TransformedDistribution(
            dist.Normal(0.0, 1.0),
            tf.Chain(tf.Exp(), tf.Affine(jnp.asarray(lo), jnp.asarray(1.0))))
        logp(d, x)
    assert calls["n"] == 1, f"retraced {calls['n']} times"


def test_no_retrace_biject_to():
    from bayesic_tpu.dist import constraints

    calls = {"n": 0}

    @jax.jit
    def fwd(t, u):
        calls["n"] += 1
        return t.forward(u)

    u = jnp.asarray(0.3)
    for _ in range(3):
        fwd(tf.biject_to(constraints.positive), u)
    assert calls["n"] == 1


def test_positive_definite_constraint_relative_symmetry_tol():
    """ADVICE r3: the symmetry check must scale with the matrix — large
    well-conditioned SPD matrices (f32-symmetric only to absolute ~1e-2)
    pass, tiny meaningfully-asymmetric ones fail."""
    import jax.numpy as jnp
    import numpy as np

    from bayesic_tpu.dist import constraints

    big = np.asarray([[2e6, 1e6], [1e6, 2e6]], np.float32)
    big[0, 1] += 0.5            # f32 rounding-scale asymmetry at 1e6
    assert bool(constraints.positive_definite(jnp.asarray(big)))

    tiny = np.asarray([[1e-3, 2e-4], [1e-4, 1e-3]], np.float32)
    assert not bool(constraints.positive_definite(jnp.asarray(tiny)))
