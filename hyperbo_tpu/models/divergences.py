"""Multivariate-normal divergences and dataset subsampling utilities.

Parity with reference hyperbo/gp_utils/utils.py:84-173 (partial KL, full KL
with SVD-sqrt whitening of possibly rank-deficient sample covariances, and
weighted Euclidean MVN distance), with the trace term computed as a single
batched Cholesky solve on the MXU instead of a per-row vmap of solves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import (  # noqa: F401  (re-exported, ref parity)
    DEFAULT_WARP_FUNC, EPS, identity_warp, softplus_warp, squareplus_warp,
    DEFAULT_SOFTPLUS)
from hyperbo_tpu.ops import linalg

SubDataset = defs.SubDataset


def sub_sample_dataset_iterator(key, dataset, batch_size):
  """Yields datasets whose sub-datasets have at most batch_size rows.

  Matches reference hyperbo/basics/data_utils.py:72-100 (including the
  str->int conversion of aligned tags for jit compatibility).
  """
  while True:
    sub_sampled = {}
    for i, (sub_key, sub) in enumerate(dataset.items()):
      if sub.x.shape[0] >= batch_size:
        key, subkey = jax.random.split(key, 2)
        indices = jax.random.permutation(subkey, sub.x.shape[0])
        new_sub = SubDataset(
            x=sub.x[indices[:batch_size], :],
            y=sub.y[indices[:batch_size], :],
            aligned=sub.aligned)
      else:
        new_sub = sub
      if isinstance(new_sub.aligned, str):
        # str is not a JAX-supported type; replace by the enumeration index.
        new_sub = SubDataset(x=new_sub.x, y=new_sub.y, aligned=i)
      sub_sampled[sub_key] = new_sub
    yield sub_sampled


def partial_kl_mvn(mu0, cov0, mu1, cov1):
  """KL(N0 || N1) terms that depend on mu1/cov1 only.

  tr(cov1^{-1} cov0) + (mu1-mu0)^T cov1^{-1} (mu1-mu0) + log det cov1.
  The trace term is one Cholesky solve with an n x n right-hand side —
  a pair of MXU triangular solves — with the analytic custom-VJP gradient
  wrt cov1 (see ops.linalg.inverse_spdmatrix_vector_product).
  """
  mu_diff = mu1 - mu0
  chol1, cov1invmudiff = linalg.solve_linear_system(cov1, mu_diff)
  kinv_cov0 = linalg.inverse_spdmatrix_vector_product(
      cov1, cov0, cached_cholesky=chol1)
  trcov1invcov0 = jnp.trace(kinv_cov0)
  mahalanobis = jnp.dot(mu_diff, cov1invmudiff)
  logdetcov1 = jnp.sum(2 * jnp.log(jnp.diag(chol1)))
  return trcov1invcov0 + mahalanobis + logdetcov1


def kl_multivariate_normal(mu0, cov0, mu1, cov1, weight=1.0, eps=0.0,
                           partial=True):
  """KL divergence between two MVNs.

  partial=True drops terms constant in (mu1, cov1). partial=False whitens by
  the SVD square root of cov0 (handling rank-deficient sample covariances)
  and returns the full KL restricted to the support of cov0.
  """
  if not cov0.shape:
    cov0 = cov0[jnp.newaxis, jnp.newaxis]
  if not cov1.shape:
    cov1 = cov1[jnp.newaxis, jnp.newaxis]

  if eps > 0.:
    cov0 = cov0 + jnp.eye(cov0.shape[0], dtype=cov0.dtype) * eps
    cov1 = cov1 + jnp.eye(cov1.shape[0], dtype=cov1.dtype) * eps

  if partial:
    return weight * partial_kl_mvn(mu0, cov0, mu1, cov1)

  chol0 = linalg.svd_matrix_sqrt(cov0)
  chol0inv = jnp.linalg.pinv(chol0)
  mu1 = jnp.dot(chol0inv, mu1 - mu0)
  cov1 = jnp.dot(jnp.dot(chol0inv, cov1), chol0inv.T)
  mu0 = jnp.zeros_like(mu1)
  cov0 = jnp.eye(cov1.shape[0], dtype=cov1.dtype)
  ekl = 0.5 * (partial_kl_mvn(mu0, cov0, mu1, cov1) - chol0.shape[1])
  return weight * ekl


def euclidean_multivariate_normal(mu0, cov0, mu1, cov1, mean_weight=1.,
                                  cov_weight=1., **unused_kwargs):
  """Weighted Euclidean distance between two MVNs (means and covariances)."""
  mean_diff = linalg.safe_l2norm(mu0 - mu1)
  cov_diff = linalg.safe_l2norm((cov0 - cov1).flatten())
  return mean_weight * mean_diff + cov_weight * cov_diff
