"""Training objectives for GP pre-training: multi-task NLL and EKL.

Parity with reference hyperbo/gp_utils/objectives.py:29-246: same objective
values (mean over sub-datasets, aligned-only for the divergence, non-aligned
for NLL, hyperprior log-probs subtracted), same combinators and aliases.

Note: the reference aliases `nll_regeuc01`/`nll_regeuc10` to the *KL*
regularizer (objectives.py:243,246 — a latent bug). Here they are defined
with the Euclidean regularizer as their names state; the reference behavior
is available via nll_regkl(.1)/nll_regkl(10.).

For TPU-scale multi-task training, see hyperbo_tpu.models.packed — a
padded/bucketed, vmapped, mesh-shardable batch NLL with identical per-task
semantics.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jspla

from hyperbo_tpu.core.warp import retrieve_params
from hyperbo_tpu.models import divergences
from hyperbo_tpu.ops import linalg


def _objective_items(dataset, aligned_only=False, exclude_aligned=False):
  """Non-empty sub-datasets an objective runs over, in dataset order."""
  for key, sub in dataset.items():
    if aligned_only and sub.aligned is None:
      continue
    if exclude_aligned and sub.aligned is not None:
      continue
    if sub.x.shape[0] == 0:
      continue
    yield key, sub


def multivariate_normal_divergence(
    mean_func,
    cov_func,
    params,
    dataset,
    warp_func=None,
    distance=divergences.kl_multivariate_normal,
):
  """Mean divergence between sample MVN stats and the model, over aligned
  sub-datasets.

  Each aligned sub-dataset has y of shape (n, m): m matched-input function
  draws. The sample mean/covariance over the m draws is compared to the
  model's mean/kernel (+ noise on the diagonal) under `distance`.
  """
  noise_variance, = retrieve_params(
      params, ['noise_variance'], warp_func=warp_func)

  def one(key, sub):
    if sub.y.shape[1] == 0 or sub.y.shape[0] != sub.x.shape[0]:
      raise ValueError(
          f'dataset[{key}].x has shape {sub.x.shape} '
          f'but dataset[{key}].y has shape {sub.y.shape}')
    mu_model = mean_func(params, sub.x, warp_func=warp_func).flatten()
    cov_model = (cov_func(params, sub.x, warp_func=warp_func)
                 + jnp.eye(sub.x.shape[0]) * noise_variance)
    return distance(mu0=jnp.mean(sub.y, axis=1),
                    cov0=jnp.cov(sub.y, bias=True),
                    mu1=mu_model, cov1=cov_model)

  vals = [one(k, s) for k, s in _objective_items(dataset,
                                                 aligned_only=True)]
  if not vals:
    return 0.
  return sum(vals) / len(vals)


multivariate_normal_euc_distance = functools.partial(
    multivariate_normal_divergence,
    distance=divergences.euclidean_multivariate_normal)


def neg_log_marginal_likelihood(mean_func,
                                cov_func,
                                params,
                                dataset,
                                warp_func=None,
                                exclude_aligned=True,
                                return_key2nll=False,
                                use_cholesky=True):
  """Mean negative log marginal likelihood over (non-aligned) sub-datasets.

  use_cholesky=False computes each NLL through a full SVD — needed when the
  kernel is PD but the covariance is numerically low rank.
  """

  def compute_nll_sub_dataset_cholesky(vx, vy):
    fused = params.config.get('fused_mll') if params.config else None
    if fused:
      # Opt-in large-n fast path: the single-kernel Pallas fused MLL
      # (ops/pallas_mll.py) — value parity with this dense pipeline,
      # ~1.6x faster and far more accurate at n=8192 on v5e (PERF.md).
      # Differentiable (custom VJP reusing the kernel's L factor), so
      # gradient-based pre-training trains through it too. Serves the
      # SE and Matern kernel families, raw or MLP/Kumar-embedded.
      # 'interpret' runs the kernel interpreted (CPU tests).
      from hyperbo_tpu.ops import pallas_mll
      if pallas_mll.se_nll_fused_applicable(cov_func, vx, params, y=vy):
        return pallas_mll.se_nll_fused(
            mean_func, params, vx, vy, warp_func=warp_func,
            cov_func=cov_func, interpret=(fused == 'interpret'))
    it_cfg = (params.config.get('iterative_mll')
              if params.config else None)
    if it_cfg and vy.shape[-1] == 1:
      # Opt-in matrix-free path for n beyond the O(n^2) Gram wall
      # (ops/iterative): CG quad term + stochastic-Lanczos logdet,
      # O(n) memory, BBMM-style matrix-free gradients. The logdet
      # (and its gradient) is a randomized ESTIMATE — exact paths are
      # preferred whenever the Gram matrix fits. it_cfg may be True or
      # a dict of mll_iterative kwargs (row_chunk, num_probes, ...).
      from hyperbo_tpu.ops import iterative, pallas_mll
      if cov_func in pallas_mll._fused_kernel_table():
        kwargs = dict(it_cfg) if isinstance(it_cfg, dict) else {}
        return iterative.mll_iterative(
            mean_func, params, vx, vy, warp_func=warp_func,
            cov_func=cov_func, **kwargs)
    chol, kinvy, vy = linalg.solve_gp_linear_system(
        mean_func=mean_func,
        cov_func=cov_func,
        params=params,
        x=vx,
        y=vy,
        warp_func=warp_func)
    return jnp.sum(0.5 * jnp.dot(vy.T, kinvy) +
                   jnp.sum(jnp.log(jnp.diag(chol))) +
                   0.5 * vx.shape[0] * jnp.log(2 * jnp.pi))

  def compute_nll_sub_dataset_svd(vx, vy):
    vy, cov = linalg.compute_delta_y_and_cov(
        mean_func=mean_func,
        cov_func=cov_func,
        params=params,
        x=vx,
        y=vy,
        warp_func=warp_func)
    (u, s, v) = jspla.svd(cov)
    if not isinstance(s, jax.core.Tracer) and s[-1] <= 0:
      logging.warning('Covariance matrix is low rank. s = %s', s)
    kinv = jnp.dot(v.T, jnp.dot(jnp.diag(s**-1), u.T))
    kinvy = jnp.dot(kinv, vy)
    return 0.5 * jnp.sum(
        jnp.dot(vy.T, kinvy) + jnp.sum(jnp.log(s)) +
        vx.shape[0] * jnp.log(2 * jnp.pi))

  nll_one = (compute_nll_sub_dataset_cholesky if use_cholesky
             else compute_nll_sub_dataset_svd)
  key2nll = {
      k: nll_one(s.x, s.y)
      for k, s in _objective_items(dataset,
                                   exclude_aligned=exclude_aligned)}
  total_nll = (sum(key2nll.values()) / len(key2nll)) if key2nll else 0.
  total_nll -= _hyperprior_log_prob(params, warp_func)
  if return_key2nll:
    return total_nll, key2nll
  return total_nll


def _hyperprior_log_prob(params, warp_func):
  """Sum of config['priors'] log-densities over the (warped) model."""
  if 'priors' not in params.config:
    return 0.
  total = 0.
  priors = params.config['priors']
  for name in params.model:
    if name not in priors:
      logging.warning('No prior provided for param %s', name)
      continue
    val, = retrieve_params(params, [name], warp_func)
    total += priors[name](val)
  return total


nll = neg_log_marginal_likelihood
kl = multivariate_normal_divergence
ekl = kl
euc = multivariate_normal_euc_distance
regkl = kl
regeuc = euc


def add(*objectives):

  def added_objective(*args, **kwargs):
    return sum([o(*args, **kwargs) for o in objectives])

  return added_objective


def mul(c, o):

  def multiplied_objective(*args, **kwargs):
    return c * o(*args, **kwargs)

  return multiplied_objective


# _packed_spec tags let the trainer route an objective through the fully
# on-device packed path (models/packed.py): ('nll', None), ('kl', None)
# or ('nll_regkl', weight).
neg_log_marginal_likelihood._packed_spec = ('nll', None)
multivariate_normal_divergence._packed_spec = ('kl', None)


def nll_regkl(c):
  f = add(nll, mul(c, regkl))
  f._packed_spec = ('nll_regkl', c)
  return f


nll_regeuc = lambda c: add(nll, mul(c, regeuc))

nll_regkl1 = nll_regkl(1.)
nll_regeuc1 = nll_regeuc(1.)
nll_regkl01 = nll_regkl(.1)
nll_regeuc01 = nll_regeuc(.1)

nll_regkl10 = nll_regkl(10.)
nll_regeuc10 = nll_regeuc(10.)
