"""Packed (masked, static-shape) full-KL EKL parity vs the per-task host
loop — including rank-deficient sample covariances (m < n draws) and
unequal task sizes (real padding).

Reference semantics: hyperbo/gp_utils/utils.py:109-148 (SVD-whitened
full KL) averaged over aligned sub-datasets (objectives.py:29-101).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import divergences
from hyperbo_tpu.models import gp
from hyperbo_tpu.models import kernel
from hyperbo_tpu.models import mean
from hyperbo_tpu.models import objectives as obj
from hyperbo_tpu.models import packed as packed_lib

GPParams = defs.GPParams
SubDataset = defs.SubDataset
WF = DEFAULT_WARP_FUNC


def _aligned_dataset(key, sizes=((9, 4), (6, 3), (12, 5)), d=2):
  """Aligned tasks with unequal (n, m): rank(sample cov) = m - 1 < n."""
  gt = GPParams(model={'constant': 1., 'lengthscale': jnp.array([.4] * d),
                       'signal_variance': 1.0, 'noise_variance': 0.01})
  dataset = {}
  for t, (n, m) in enumerate(sizes):
    key, k1, k2 = jax.random.split(key, 3)
    vx = jax.random.uniform(k1, (n, d))
    vy = gp.sample_from_gp(k2, mean.constant, kernel.squared_exponential,
                           gt, vx, warp_func=WF, num_samples=m)
    dataset[f'a{t}'] = SubDataset(vx, vy, aligned=t)
  return dataset


def _params():
  return GPParams(model={'constant': 0.8,
                         'lengthscale': jnp.array([0.1, -0.2]),
                         'signal_variance': 0.3, 'noise_variance': -3.},
                  config={})


@pytest.mark.parametrize('partial,eps', [
    (False, 1e-6), (False, 0.0), (True, 1e-6), (True, 0.0),
])
def test_packed_kl_matches_host_loop(partial, eps):
  dataset = _aligned_dataset(jax.random.PRNGKey(0))
  params = _params()

  host = obj.multivariate_normal_divergence(
      mean.constant, kernel.squared_exponential, params, dataset,
      warp_func=WF,
      distance=functools.partial(
          divergences.kl_multivariate_normal, eps=eps, partial=partial))

  packed, _ = packed_lib.pack_aligned_dataset(dataset)
  got = packed_lib.multivariate_normal_divergence_packed(
      mean.constant, kernel.squared_exponential, params, packed,
      warp_func=WF, partial=partial, eps=eps)

  # eps=1e-6 makes the sample covariance full rank with eps-level
  # singular values; whitening by 1/sqrt(eps) amplifies float32 rounding
  # to ~1e-3 relative between any two evaluation orders. In float64 the
  # two paths agree to 2e-10 (verified); the loose tolerance here is
  # conditioning, not math.
  tol = 3e-3 if eps else 5e-4
  np.testing.assert_allclose(float(got), float(host), rtol=tol, atol=tol)


def test_packed_fullkl_jittable_and_differentiable():
  dataset = _aligned_dataset(jax.random.PRNGKey(1))
  packed, _ = packed_lib.pack_aligned_dataset(dataset)

  @jax.jit
  def loss(model):
    shim = GPParams(model=model, config={})
    return packed_lib.multivariate_normal_divergence_packed(
        mean.constant, kernel.squared_exponential, shim, packed,
        warp_func=WF, partial=False, eps=1e-6)

  model = dict(_params().model)
  val, grads = jax.value_and_grad(loss)(model)
  assert np.isfinite(float(val))
  for k, g in grads.items():
    assert np.all(np.isfinite(np.asarray(g))), k


def test_gp_stats_uses_packed_ekl():
  """GP.stats ekl/ekl_partial equal the host empirical_divergence."""
  dataset = _aligned_dataset(jax.random.PRNGKey(2))
  # Add one non-aligned task so nll is well-defined.
  key = jax.random.PRNGKey(3)
  vx = jax.random.uniform(key, (7, 2))
  gt = GPParams(model={'constant': 1., 'lengthscale': jnp.array([.4, .4]),
                       'signal_variance': 1.0, 'noise_variance': 0.01})
  dataset['plain'] = SubDataset(
      vx, gp.sample_from_gp(jax.random.PRNGKey(4), mean.constant,
                            kernel.squared_exponential, gt, vx,
                            warp_func=WF))
  params = _params()
  params.config.update({'objective': 'nll'})
  model = gp.GP(dataset, mean.constant, kernel.squared_exponential,
                params, WF)
  nll, ekl, ekl_partial, euc, _ = model.stats(verbose=False)

  want_full = model.empirical_divergence(
      distance=functools.partial(
          divergences.kl_multivariate_normal, eps=1e-6, partial=False))
  want_partial = model.empirical_divergence(
      distance=functools.partial(
          divergences.kl_multivariate_normal, eps=1e-6, partial=True))
  # eps=1e-6 conditioning: see test_packed_kl_matches_host_loop.
  np.testing.assert_allclose(float(ekl), float(want_full), rtol=3e-3,
                             atol=3e-3)
  np.testing.assert_allclose(float(ekl_partial), float(want_partial),
                             rtol=3e-3, atol=3e-3)
  assert np.isfinite(float(nll)) and np.isfinite(float(euc))
