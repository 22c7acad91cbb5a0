"""Pallas fused Gram kernel tests (interpreter mode on CPU).

Checks the fused tile kernel against the XLA matmul-based Gram path for
all kernel transforms, including the fused diagonal ridge and
non-divisible shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import kernel as kernel_lib
from hyperbo_tpu.ops import pallas_gram

GPParams = defs.GPParams
WF = DEFAULT_WARP_FUNC

KINDS = {
    'se': kernel_lib.squared_exponential,
    'matern32': kernel_lib.matern32,
    'matern52': kernel_lib.matern52,
}


def _params(d):
  return GPParams(model={
      'lengthscale': jnp.linspace(0.4, 0.8, d),
      'signal_variance': 0.7,
      'noise_variance': -2.0,
  })


@pytest.mark.parametrize('kind', list(KINDS))
@pytest.mark.parametrize('n', [32, 70])
def test_gram_with_ridge_matches_reference_path(kind, n):
  d = 4
  params = _params(d)
  x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
  ls = jax.nn.softplus(params.model['lengthscale']) + 1e-10
  sv = jax.nn.softplus(params.model['signal_variance']) + 1e-10
  nv = jax.nn.softplus(params.model['noise_variance']) + 1e-10
  ridge = nv + 1e-6

  got = pallas_gram.gram_with_ridge(
      x, ls, sv, ridge, kind=kind, interpret=True, block=32)
  want = KINDS[kind](params, x, warp_func=WF) + ridge * jnp.eye(n)
  np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize('kind', list(KINDS))
def test_cross_gram_matches(kind):
  d = 3
  params = _params(d)
  x1 = jax.random.normal(jax.random.PRNGKey(1), (41, d))
  x2 = jax.random.normal(jax.random.PRNGKey(2), (17, d))
  ls = jax.nn.softplus(params.model['lengthscale']) + 1e-10
  sv = jax.nn.softplus(params.model['signal_variance']) + 1e-10
  got = pallas_gram.cross_gram(x1, x2, ls, sv, kind=kind, interpret=True,
                               block=32)
  want = KINDS[kind](params, x1, x2, warp_func=WF)
  np.testing.assert_allclose(got, want, atol=2e-5)


def test_gram_psd():
  d = 5
  params = _params(d)
  x = jax.random.normal(jax.random.PRNGKey(3), (60, d))
  ls = jax.nn.softplus(params.model['lengthscale']) + 1e-10
  got = pallas_gram.gram_with_ridge(x, ls, 1.0, 1e-3, kind='se',
                                    interpret=True, block=32)
  eigs = np.linalg.eigvalsh(np.asarray(got, np.float64))
  assert eigs.min() > 0
