"""Kernel tests: shapes, PSD-ness, symmetry, agreement with the exact
elementwise computation, diag fast path, MLP/Kumar variants.

Mirrors reference hyperbo/gp_utils/kernel_test.py:77-152 assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import basis as bf
from hyperbo_tpu.models import kernel
from hyperbo_tpu.ops import gram

GPParams = defs.GPParams

ALL_KERNELS = [
    kernel.squared_exponential, kernel.matern32, kernel.matern52,
    kernel.dot_product,
]
MLP_KERNELS = [
    kernel.squared_exponential_mlp, kernel.matern32_mlp,
    kernel.matern52_mlp, kernel.dot_product_mlp,
]
KUMAR_KERNELS = [
    kernel.squared_exponential_kumar, kernel.matern32_kumar,
    kernel.matern52_kumar, kernel.dot_product_kumar,
]


def _params(key, cov_func, input_dim, unit_interval=False):
  params = GPParams(model={
      'constant': 5.,
      'lengthscale': jnp.array([0.3] * input_dim),
      'signal_variance': 1.0,
      'noise_variance': 0.01,
      'dot_prod_sigma': 0.5,
      'dot_prod_bias': 0.2,
  })
  if 'mlp' in cov_func.__name__:
    params.config['mlp_features'] = (8,)
    bf.init_mlp_with_shape(key, params, (0, input_dim))
    params.model['lengthscale'] = jnp.array([0.3] * 8)
  if 'kumar' in cov_func.__name__:
    bf.init_kumar_warp_with_shape(key, params, (0, input_dim))
  return params


@pytest.mark.parametrize(
    'cov_func', ALL_KERNELS + MLP_KERNELS + KUMAR_KERNELS,
    ids=lambda f: f.__name__)
def test_shape_and_psd(cov_func):
  key = jax.random.PRNGKey(0)
  n1, n2, d = 7, 4, 3
  unit = 'kumar' in cov_func.__name__
  vx1 = jax.random.uniform(key, (n1, d)) if unit else jax.random.normal(
      key, (n1, d))
  vx2 = jax.random.uniform(jax.random.PRNGKey(1),
                           (n2, d)) if unit else jax.random.normal(
                               jax.random.PRNGKey(1), (n2, d))
  params = _params(jax.random.PRNGKey(2), cov_func, d)
  wf = DEFAULT_WARP_FUNC

  cross = cov_func(params, vx1, vx2, warp_func=wf)
  assert cross.shape == (n1, n2)

  full = cov_func(params, vx1, warp_func=wf)
  assert full.shape == (n1, n1)
  np.testing.assert_allclose(full, full.T, atol=1e-6)
  eigs = np.linalg.eigvalsh(np.asarray(full, np.float64))
  assert np.all(eigs > -1e-5), f'not PSD: min eig {eigs.min()}'

  diag = cov_func(params, vx1, warp_func=wf, diag=True)
  assert diag.shape == (n1,)
  np.testing.assert_allclose(diag, jnp.diag(full), atol=1e-5)


@pytest.mark.parametrize('cov_func,scalar_fn', [
    (kernel.squared_exponential,
     lambda dx, r2, sv: sv * np.exp(-r2 / 2)),
    (kernel.matern32,
     lambda dx, r2, sv: sv * (1 + np.sqrt(3 * r2)) * np.exp(-np.sqrt(3 * r2))),
    (kernel.matern52,
     lambda dx, r2, sv: sv * (1 + np.sqrt(5 * r2) + 5 * r2 / 3) *
     np.exp(-np.sqrt(5 * r2))),
], ids=lambda f: getattr(f, '__name__', 'fn'))
def test_matches_exact_elementwise(cov_func, scalar_fn):
  """MXU matmul-based Gram equals the exact elementwise evaluation."""
  key = jax.random.PRNGKey(3)
  n1, n2, d = 9, 6, 4
  vx1 = jax.random.normal(key, (n1, d))
  vx2 = jax.random.normal(jax.random.PRNGKey(4), (n2, d))
  params = _params(jax.random.PRNGKey(5), cov_func, d)
  wf = DEFAULT_WARP_FUNC
  got = cov_func(params, vx1, vx2, warp_func=wf)

  ls = np.asarray(jax.nn.softplus(params.model['lengthscale']) + 1e-10)
  sv = float(jax.nn.softplus(params.model['signal_variance']) + 1e-10)
  x1, x2 = np.asarray(vx1) / ls, np.asarray(vx2) / ls
  r2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
  want = scalar_fn(None, r2, sv)
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_gram_centering_robust_to_small_lengthscale():
  """Centered matmul distances stay accurate with large scaled norms."""
  key = jax.random.PRNGKey(6)
  x = jax.random.normal(key, (32, 4)) + 100.0  # big offset
  d2_fast = gram.sqdist(x)
  d2_exact = gram.sqdist_direct(x)
  np.testing.assert_allclose(d2_fast, d2_exact, atol=1e-3)


def test_matern_grad_finite_at_coincident_points():
  """Gradient wrt inputs is finite when x1 == x2 (safe-sqrt clamp)."""
  params = _params(jax.random.PRNGKey(7), kernel.matern32, 2)
  x = jnp.ones((3, 2))

  def f(x):
    return jnp.sum(kernel.matern32(params, x, warp_func=DEFAULT_WARP_FUNC))

  g = jax.grad(f)(x)
  assert np.all(np.isfinite(np.asarray(g)))


def test_dot_product_matches_formula():
  params = _params(jax.random.PRNGKey(8), kernel.dot_product, 3)
  x1 = jax.random.normal(jax.random.PRNGKey(9), (5, 3))
  x2 = jax.random.normal(jax.random.PRNGKey(10), (4, 3))
  wf = DEFAULT_WARP_FUNC
  got = kernel.dot_product(params, x1, x2, warp_func=wf)
  s = float(jax.nn.softplus(params.model['dot_prod_sigma']) + 1e-10)
  b = params.model['dot_prod_bias']
  want = np.asarray(x1) @ np.asarray(x2).T / s**2 + b**2
  np.testing.assert_allclose(got, want, atol=1e-5)
