"""Mean-function and MVN-divergence tests.

Mirrors reference hyperbo/gp_utils/mean_test.py:36-68 and
utils_test.py:26-53 (KL(p||p)=0 within 1e-5; finite KL for rank-deficient
sample covariance).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hyperbo_tpu.core import defs
from hyperbo_tpu.models import basis as bf
from hyperbo_tpu.models import divergences
from hyperbo_tpu.models import mean

GPParams = defs.GPParams


def test_zero_and_constant_mean():
  x = jax.random.normal(jax.random.PRNGKey(0), (7, 3))
  params = GPParams(model={'constant': 2.5})
  assert mean.zero(params, x).shape == (7, 1)
  np.testing.assert_allclose(mean.zero(params, x), 0.)
  c = mean.constant(params, x)
  assert c.shape == (7, 1)
  np.testing.assert_allclose(c, 2.5)


def test_linear_mean_matches_dot():
  key = jax.random.PRNGKey(1)
  x = jax.random.normal(key, (6, 4))
  w = jax.random.normal(jax.random.PRNGKey(2), (4, 1))
  b = jnp.array([0.7])
  params = GPParams(model={'linear_mean': {'kernel': w, 'bias': b}})
  got = mean.linear(params, x)
  np.testing.assert_allclose(got, x @ w + b, atol=1e-6)
  assert got.shape == (6, 1)


def test_linear_mlp_mean_shape():
  key = jax.random.PRNGKey(3)
  x = jax.random.normal(key, (5, 3))
  params = GPParams(config={'mlp_features': (8,)})
  bf.init_mlp_with_shape(key, params, (0, 3))
  from flax import linen as nn
  params.model['linear_mean'] = nn.Dense(1).init(
      jax.random.PRNGKey(4), jnp.empty((0, 8)))['params']
  got = mean.linear_mlp(params, x)
  assert got.shape == (5, 1)


def _rand_mvn(key, n, rank=None):
  rank = rank or n
  u = jax.random.normal(key, (n, rank))
  cov = u @ u.T
  mu = jax.random.normal(jax.random.PRNGKey(99), (n,))
  return mu, cov


def test_kl_identity_is_zero():
  mu, cov = _rand_mvn(jax.random.PRNGKey(5), 8)
  cov = cov + jnp.eye(8)
  kl = divergences.kl_multivariate_normal(mu, cov, mu, cov, partial=False)
  assert abs(float(kl)) < 1e-4


def test_kl_positive():
  mu0, cov0 = _rand_mvn(jax.random.PRNGKey(6), 8)
  cov0 = cov0 + jnp.eye(8)
  mu1 = mu0 + 1.0
  cov1 = cov0 + 0.5 * jnp.eye(8)
  kl = divergences.kl_multivariate_normal(mu0, cov0, mu1, cov1,
                                          partial=False)
  assert float(kl) > 0


def test_kl_rank_deficient_cov0_finite():
  """Full KL with a rank-5 sample covariance stays finite (SVD path)."""
  mu0, cov0 = _rand_mvn(jax.random.PRNGKey(7), 10, rank=5)
  mu1, cov1 = _rand_mvn(jax.random.PRNGKey(8), 10)
  cov1 = cov1 + jnp.eye(10)
  kl = divergences.kl_multivariate_normal(mu0, cov0, mu1, cov1,
                                          partial=False, eps=0.)
  assert np.isfinite(float(kl))


def test_partial_kl_trace_term():
  """partial_kl_mvn equals the explicit tr + mahalanobis + logdet form."""
  mu0, cov0 = _rand_mvn(jax.random.PRNGKey(9), 6)
  cov0 = cov0 + jnp.eye(6)
  mu1, cov1 = _rand_mvn(jax.random.PRNGKey(10), 6)
  cov1 = cov1 + 2 * jnp.eye(6)
  got = divergences.partial_kl_mvn(mu0, cov0, mu1, cov1)
  inv1 = np.linalg.inv(np.asarray(cov1, np.float64))
  md = np.asarray(mu1 - mu0, np.float64)
  want = (np.trace(inv1 @ np.asarray(cov0, np.float64)) +
          md @ inv1 @ md + np.linalg.slogdet(np.asarray(cov1))[1])
  np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_euclidean_distance():
  mu0 = jnp.zeros(4)
  cov0 = jnp.eye(4)
  mu1 = jnp.ones(4)
  cov1 = jnp.eye(4) * 2
  d = divergences.euclidean_multivariate_normal(mu0, cov0, mu1, cov1)
  np.testing.assert_allclose(float(d), 2.0 + 2.0, rtol=1e-5)
