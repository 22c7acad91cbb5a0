"""Packed (padded + masked) multi-task GP objectives.

The reference evaluates the multi-task NLL with a Python loop over
sub-datasets of unequal size (hyperbo/gp_utils/objectives.py:181-191),
which compiles one Cholesky per task and cannot batch or shard. Here
sub-datasets are packed into dense (T, n_max, ...) buffers with row masks;
the per-task NLL is evaluated under vmap — one batched Gram + batched
Cholesky on the MXU — and the task axis can be sharded over a device mesh
(see hyperbo_tpu.parallel).

Masking scheme: padded rows of K are replaced by identity rows and padded
entries of y by 0, so

  * the Cholesky factor of the masked K has 1s on the padded diagonal
    (log-det contribution 0),
  * K^{-1} delta_y has zeros in padded rows (quadratic-term contribution 0),
  * the n/2*log(2pi) term uses the true per-task count.

The per-task value equals the reference's per-sub-dataset NLL exactly
(same formula, reference objectives.py:144-156); the packed objective is
their mean, matching objectives.py:195.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import retrieve_params
from hyperbo_tpu.ops import chol as chol_ops

SubDataset = defs.SubDataset


class PackedDataset(NamedTuple):
  """Dense multi-task batch: T tasks padded to n_max points each."""
  x: jnp.ndarray      # (T, n_max, d)
  y: jnp.ndarray      # (T, n_max, 1)
  mask: jnp.ndarray   # (T, n_max) bool: valid rows
  count: jnp.ndarray  # (T,) int32: valid rows per task
  task_mask: jnp.ndarray  # (T,) bool: valid tasks (padding tasks for mesh)


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


def pack_dataset(dataset: Dict[Union[int, str], SubDataset],
                 pad_to_multiple: int = 8,
                 num_tasks_multiple: int = 1,
                 dtype=jnp.float32) -> Tuple[PackedDataset, List[Any]]:
  """Pack the non-aligned, single-output sub-datasets into dense buffers.

  Args:
    dataset: dict of SubDataset; only entries with aligned=None and
      y.shape[1] == 1 participate (the NLL training set).
    pad_to_multiple: n_max is rounded up to this (use 128+ on TPU so tiles
      are MXU-aligned; small values keep unit tests cheap).
    num_tasks_multiple: T is rounded up to this so the task axis divides a
      device mesh evenly; padding tasks are masked out.
    dtype: packing dtype.

  Returns:
    (packed, keys): packed buffers and the sub-dataset keys in task order.
  """
  keys = [k for k, s in dataset.items()
          if s.aligned is None and s.x.shape[0] > 0 and s.y.shape[1] == 1]
  if not keys:
    raise ValueError('No non-aligned sub-datasets with scalar outputs '
                     'to pack.')
  subs = [dataset[k] for k in keys]
  d = subs[0].x.shape[1]
  n_max = _round_up(max(s.x.shape[0] for s in subs), pad_to_multiple)
  t_real = len(subs)
  t_total = _round_up(t_real, num_tasks_multiple)

  x = jnp.zeros((t_total, n_max, d), dtype)
  y = jnp.zeros((t_total, n_max, 1), dtype)
  mask = jnp.zeros((t_total, n_max), bool)
  count = jnp.zeros((t_total,), jnp.int32)
  for i, s in enumerate(subs):
    n = s.x.shape[0]
    x = x.at[i, :n].set(s.x.astype(dtype))
    y = y.at[i, :n].set(s.y.astype(dtype))
    mask = mask.at[i, :n].set(True)
    count = count.at[i].set(n)
  task_mask = jnp.arange(t_total) < t_real
  return PackedDataset(x=x, y=y, mask=mask, count=count,
                       task_mask=task_mask), keys


def _masked_system(mean_func, cov_func, params, x, y, mask,
                   warp_func=None, eps: float = 1e-6):
  """(K_masked, delta) of one padded task.

  Padded rows of K are replaced by identity rows (diag exactly 1 =>
  zero log-det contribution) and padded entries of delta by 0.
  """
  noise_variance, = retrieve_params(params, ['noise_variance'],
                                    warp_func=warp_func)
  mu = mean_func(params, x, warp_func=warp_func)
  delta = (y - jnp.atleast_2d(mu)) * mask[:, None]
  kmat = cov_func(params, x, warp_func=warp_func)
  pair_mask = mask[:, None] & mask[None, :]
  n_max = x.shape[0]
  eye = jnp.eye(n_max, dtype=kmat.dtype)
  diag_fill = jnp.where(mask, noise_variance + eps, 1.0)
  kmat = jnp.where(pair_mask, kmat, 0.0) + eye * diag_fill
  return kmat, delta


def nll_one_task(mean_func, cov_func, params, x, y, mask, count,
                 warp_func=None, eps: float = 1e-6) -> jnp.ndarray:
  """Masked NLL of one padded task; equals the reference per-task NLL."""
  kmat, delta = _masked_system(mean_func, cov_func, params, x, y, mask,
                               warp_func=warp_func, eps=eps)
  chol = chol_ops.cholesky(kmat)
  kinvy = chol_ops.cho_solve(chol, delta)
  quad = 0.5 * jnp.sum(delta * kinvy)
  # Padded diagonal entries are exactly 1 => log contributes 0.
  logdet_half = jnp.sum(jnp.log(jnp.diagonal(chol)))
  return quad + logdet_half + 0.5 * count * jnp.log(2 * jnp.pi)


def _nll_packed_fused(mean_func, cov_func, params, packed, warp_func,
                      eps):
  """Per-task NLL through the fused Pallas kernel (lax.map over tasks).

  One kernel invocation per task inside a single compiled program; worth
  it for LARGE per-task n (>= 4096, where each factorization dominates
  the per-launch overhead) — the vmapped dense pipeline stays the
  default at PD1 subsample scale. Padding via the sentinel-row trick
  (ops/pallas_mll.se_nll_fused_masked); gradients flow through the
  custom VJP.
  """
  from hyperbo_tpu.ops import pallas_mll
  lengthscale, signal_variance, noise_variance = retrieve_params(
      params, ['lengthscale', 'signal_variance', 'noise_variance'],
      warp_func=warp_func)
  interpret = params.config.get('fused_mll') == 'interpret'

  kfam = pallas_mll.kernel_family(cov_func)

  def one(args):
    x, y, mask, count = args
    mu = mean_func(params, x, warp_func=warp_func)
    delta = (y - jnp.atleast_2d(mu)) * mask[:, None]
    emb = pallas_mll._se_embed(params, x, cov_func, warp_func)
    return pallas_mll.se_nll_fused_masked(
        emb / lengthscale, delta, jnp.squeeze(signal_variance),
        jnp.squeeze(noise_variance) + eps, count, kfam=kfam,
        interpret=interpret)

  return jax.lax.map(one, (packed.x, packed.y, packed.mask,
                           packed.count))


def _batched_chol_route(params, packed):
  """(impl, interpret) when the loop-free batched small-n kernel should
  evaluate the packed NLL, else None.

  config['batched_chol']: None/'auto' engages automatically on TPU for
  32 < n_max <= 128 (the PD1 subsample regime — XLA's while-loop
  Cholesky/solve expansions dominate the step there, see
  ops/pallas_batch_chol; below n_max=32 the kernel's fixed 128-wide
  padded sweep wastes more FLOPs than the while loops cost, so auto
  stays on the dense path); True forces it; False disables; 'interpret'
  runs the Pallas kernel in interpret mode (CPU tests);
  'tasks3d'/'grid2d'/'xla' pick the implementation explicitly. Forced
  Mosaic impls (True/'tasks3d'/'grid2d') fall back to interpret mode on
  non-TPU backends — the kernel uses pltpu.VMEM scratch and cannot
  lower elsewhere.
  """
  flag = (params.config or {}).get('batched_chol', 'auto')
  if flag is None:
    flag = 'auto'
  if flag is False:
    return None
  n_max = packed.x.shape[1]
  if n_max > 128:
    return None
  dev = jax.devices()[0]
  on_tpu = (dev.platform == 'tpu'
            or 'TPU' in str(getattr(dev, 'device_kind', '')))
  if flag == 'xla':
    return flag, False
  if flag in ('tasks3d', 'grid2d'):
    return flag, not on_tpu
  if flag == 'interpret':
    return 'tasks3d', True
  if flag is True:
    return 'tasks3d', not on_tpu
  # 'auto'
  if not on_tpu or n_max <= 32:
    return None
  return 'tasks3d', False


def _nll_packed_batched(mean_func, cov_func, params, packed, warp_func,
                        eps, route):
  """Per-task NLL via the batched loop-free kernel (route from
  _batched_chol_route)."""
  from hyperbo_tpu.ops import pallas_batch_chol
  impl, interpret = route
  kb, delta = jax.vmap(
      lambda x, y, m: _masked_system(mean_func, cov_func, params, x, y,
                                     m, warp_func=warp_func, eps=eps))(
                                         packed.x, packed.y, packed.mask)
  quad, ld = pallas_batch_chol.nll_terms_batched(
      kb, delta, impl, interpret)
  return 0.5 * quad + ld + 0.5 * packed.count * jnp.log(2 * jnp.pi)


def per_task_nll_packed(mean_func,
                        cov_func,
                        params,
                        packed: PackedDataset,
                        warp_func=None,
                        eps: float = 1e-6) -> jnp.ndarray:
  """(T,) per-task NLLs of a packed batch (route-selected, unmasked).

  The shared compute core of `neg_log_marginal_likelihood_packed`:
  fused Pallas kernel when configured and applicable, batched small-n
  kernel in its regime, else the vmapped dense pipeline. Exposed so
  explicit task-DP programs (parallel.mesh.make_packed_loss_sharded)
  can evaluate their local task shard per device under shard_map —
  GSPMD cannot partition a pallas_call, so the sharded trainer needs
  this per-shard entry rather than the global mean.
  """
  fused = params.config.get('fused_mll') if params.config else None
  if fused:
    from hyperbo_tpu.ops import pallas_mll
    if pallas_mll.se_nll_fused_applicable(cov_func, packed.x[0], params,
                                          masked=True):
      return _nll_packed_fused(mean_func, cov_func, params, packed,
                               warp_func, eps)
  route = _batched_chol_route(params, packed)
  if route:
    return _nll_packed_batched(mean_func, cov_func, params, packed,
                               warp_func, eps, route)
  return jax.vmap(
      lambda x, y, m, c: nll_one_task(
          mean_func, cov_func, params, x, y, m, c, warp_func, eps))(
              packed.x, packed.y, packed.mask, packed.count)


def prior_nll_terms(params, warp_func=None) -> jnp.ndarray:
  """Negated hyperprior log-probs added to the packed NLL (scalar).

  Depends only on the model parameters (reference hyperprior semantics,
  hyperbo/gp_utils/objectives.py regularizer terms) — replicated under
  task-DP, so sharded losses add it once outside the psum.
  """
  total = jnp.zeros(())
  if params.config and 'priors' in params.config:
    for k in params.model:
      if k in params.config['priors']:
        val, = retrieve_params(params, [k], warp_func)
        total -= params.config['priors'][k](val)
  return total


def neg_log_marginal_likelihood_packed(mean_func,
                                       cov_func,
                                       params,
                                       packed: PackedDataset,
                                       warp_func=None,
                                       eps: float = 1e-6) -> jnp.ndarray:
  """Mean NLL over packed tasks (+ hyperprior terms, as the reference).

  vmapped over the task axis: one batched Gram + batched Cholesky.
  Shardable over a mesh by sharding `packed`'s leading axis. With
  config['fused_mll'] set and the kernel applicable (SE/Matern-family kernel,
  large aligned n_max), per-task NLLs run through the fused Pallas
  kernel instead (custom VJP: trains through it too).
  """
  per_task = per_task_nll_packed(mean_func, cov_func, params, packed,
                                 warp_func=warp_func, eps=eps)
  per_task = jnp.where(packed.task_mask, per_task, 0.0)
  num = jnp.maximum(jnp.sum(packed.task_mask), 1)
  return jnp.sum(per_task) / num + prior_nll_terms(params, warp_func)


class PackedAlignedDataset(NamedTuple):
  """Dense aligned-task batch: T tasks, n_max matched inputs, m_max
  function draws per task."""
  x: jnp.ndarray        # (T, n_max, d)
  y: jnp.ndarray        # (T, n_max, m_max)
  n_mask: jnp.ndarray   # (T, n_max) valid rows
  m_mask: jnp.ndarray   # (T, m_max) valid function draws
  count_n: jnp.ndarray  # (T,)
  count_m: jnp.ndarray  # (T,)
  task_mask: jnp.ndarray  # (T,)


def pack_aligned_dataset(dataset: Dict[Union[int, str], SubDataset],
                         pad_to_multiple: int = 8,
                         num_tasks_multiple: int = 1,
                         dtype=jnp.float32
                         ) -> Tuple[PackedAlignedDataset, List[Any]]:
  """Pack the aligned sub-datasets (n x m matched evaluations)."""
  keys = [k for k, s in dataset.items()
          if s.aligned is not None and s.x.shape[0] > 0]
  if not keys:
    raise ValueError('No aligned sub-datasets to pack.')
  subs = [dataset[k] for k in keys]
  d = subs[0].x.shape[1]
  n_max = _round_up(max(s.x.shape[0] for s in subs), pad_to_multiple)
  m_max = _round_up(max(s.y.shape[1] for s in subs), pad_to_multiple)
  t_total = _round_up(len(subs), num_tasks_multiple)

  x = jnp.zeros((t_total, n_max, d), dtype)
  y = jnp.zeros((t_total, n_max, m_max), dtype)
  n_mask = jnp.zeros((t_total, n_max), bool)
  m_mask = jnp.zeros((t_total, m_max), bool)
  count_n = jnp.zeros((t_total,), jnp.int32)
  count_m = jnp.zeros((t_total,), jnp.int32)
  for i, s in enumerate(subs):
    n, m = s.y.shape
    x = x.at[i, :n].set(s.x.astype(dtype))
    y = y.at[i, :n, :m].set(s.y.astype(dtype))
    n_mask = n_mask.at[i, :n].set(True)
    m_mask = m_mask.at[i, :m].set(True)
    count_n = count_n.at[i].set(n)
    count_m = count_m.at[i].set(m)
  task_mask = jnp.arange(t_total) < len(subs)
  return PackedAlignedDataset(x, y, n_mask, m_mask, count_n, count_m,
                              task_mask), keys


def _aligned_task_stats(mean_func, cov_func, params, x, y, n_mask, m_mask,
                        count_m, warp_func, eps):
  """Masked sample/model MVN statistics shared by the KL variants.

  Returns (mu_data, cov_data, mu_model, kmat, pair) where cov_data is the
  biased sample covariance over the valid draws (+eps on the valid
  diagonal) and kmat is the model covariance + (noise+eps) ridge; padded
  rows/cols of both are zero (the KL variants fill what they need).
  """
  noise_variance, = retrieve_params(params, ['noise_variance'],
                                    warp_func=warp_func)
  m = jnp.maximum(count_m, 1).astype(y.dtype)
  ym = y * m_mask[None, :]
  mu_data = jnp.sum(ym, axis=1) / m                       # (n,)
  centered = (y - mu_data[:, None]) * m_mask[None, :]
  cov_data = centered @ centered.T / m                    # biased, (n, n)
  pair = n_mask[:, None] & n_mask[None, :]
  mu_data = jnp.where(n_mask, mu_data, 0.0)
  eye = jnp.eye(x.shape[0], dtype=cov_data.dtype)
  cov_data = jnp.where(pair, cov_data, 0.0) + eye * jnp.where(
      n_mask, eps, 0.0)

  mu_model = mean_func(params, x, warp_func=warp_func).flatten()
  mu_model = jnp.where(n_mask, mu_model, 0.0)
  kmat = cov_func(params, x, warp_func=warp_func)
  kmat = jnp.where(pair, kmat, 0.0) + eye * jnp.where(
      n_mask, noise_variance + eps, 0.0)
  return mu_data, cov_data, mu_model, kmat, pair


def _full_kl_one_task(mean_func, cov_func, params, x, y, n_mask, m_mask,
                      count_n, count_m, warp_func, eps):
  """Masked FULL KL for one padded aligned task (jit-safe, static shapes).

  Matches divergences.kl_multivariate_normal(partial=False) — the
  reference's SVD-whitened full KL handling rank-deficient sample
  covariances (hyperbo/gp_utils/utils.py:109-148) — without the dynamic
  rank truncation: singular directions beyond the numerical rank (and
  the padded dimensions, whose singular values are exactly 0) are zeroed
  in the whitener and identity-filled in the whitened model covariance,
  so each null dimension contributes 1 to the trace, 0 to the log-det
  and 0 to the Mahalanobis term; subtracting the FULL padded size n_max
  (instead of the rank) then reproduces the reference value:
  0.5 * (tr_s + mahal + logdet_s - rank)
    = 0.5 * ((tr_full - (n_max - rank)) + mahal + logdet_full - rank)
    = 0.5 * (tr_full + mahal + logdet_full - n_max).
  """
  mu_data, cov_data, mu_model, kmat, _ = _aligned_task_stats(
      mean_func, cov_func, params, x, y, n_mask, m_mask, count_m,
      warp_func, eps)
  n_max = x.shape[0]

  u, s, _ = jnp.linalg.svd(cov_data)
  # Reference rank tolerance (ops/linalg.svd_matrix_sqrt) with the TRUE
  # row count, not the padded one.
  tol = s.max() * jnp.finfo(s.dtype).eps / 2. * jnp.sqrt(
      2. * count_n.astype(s.dtype) + 1.)
  support = s > tol
  s_safe = jnp.where(support, s, 1.0)
  # Whitener W = pinv(U sqrt(S)) = diag(support/sqrt(s)) U^T; null rows 0.
  w = (support / jnp.sqrt(s_safe))[:, None] * u.T
  mu1 = w @ (mu_model - mu_data)
  cov1 = w @ kmat @ w.T
  eye = jnp.eye(n_max, dtype=cov1.dtype)
  cov1 = cov1 + eye * (1.0 - support.astype(cov1.dtype))

  chol = chol_ops.cholesky(cov1)
  kinv_mu = chol_ops.cho_solve(chol, mu1)
  vinv = chol_ops.solve_triangular(chol, eye, lower=True)
  tr_full = jnp.sum(vinv * vinv)  # tr(cov1^{-1}) = ||chol^{-1}||_F^2
  mahal = jnp.dot(mu1, kinv_mu)
  logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
  return 0.5 * (tr_full + mahal + logdet - n_max)


def _partial_kl_one_task(mean_func, cov_func, params, x, y, n_mask,
                         m_mask, count_n, count_m, warp_func, eps=0.0):
  """Masked partial KL for one padded aligned task.

  Equals the reference per-task value (objectives.py:65-82 with the
  default partial KL): tr(K^-1 C) + (mu_K - mu_C)^T K^-1 (mu_K - mu_C)
  + logdet K, where C/mu_C are the sample covariance/mean over the m
  matched draws and K includes the noise (+eps) ridge. Padded rows of K
  are identity (zero contributions); padded draws are masked out of the
  sample statistics.
  """
  mu_data, cov_data, mu_model, kmat, _ = _aligned_task_stats(
      mean_func, cov_func, params, x, y, n_mask, m_mask, count_m,
      warp_func, eps)
  eye = jnp.eye(x.shape[0], dtype=kmat.dtype)
  kmat = kmat + eye * jnp.where(n_mask, 0.0, 1.0)

  chol = chol_ops.cholesky(kmat)
  mu_diff = mu_model - mu_data
  kinv_mudiff = chol_ops.cho_solve(chol, mu_diff)
  kinv_cov = chol_ops.cho_solve(chol, cov_data)
  tr = jnp.trace(kinv_cov)
  mahalanobis = jnp.dot(mu_diff, kinv_mudiff)
  logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
  return tr + mahalanobis + logdet


def per_task_divergence_packed(
    mean_func, cov_func, params, packed: PackedAlignedDataset,
    warp_func=None, partial: bool = True,
    eps: float = 0.0) -> jnp.ndarray:
  """(T,) per-task EKL values of a packed aligned batch (unmasked).

  The shared compute core of `multivariate_normal_divergence_packed`,
  exposed (like `per_task_nll_packed`) so explicit task-DP programs
  (parallel.mesh.make_ekl_loss_sharded) can evaluate their local task
  shard per device under shard_map and psum the reduction themselves.
  """
  kl_fn = _partial_kl_one_task if partial else _full_kl_one_task
  return jax.vmap(
      lambda x, y, nm, mm, cn, cm: kl_fn(
          mean_func, cov_func, params, x, y, nm, mm, cn, cm, warp_func,
          eps))(
              packed.x, packed.y, packed.n_mask, packed.m_mask,
              packed.count_n, packed.count_m)


def multivariate_normal_divergence_packed(
    mean_func, cov_func, params, packed: PackedAlignedDataset,
    warp_func=None, partial: bool = True,
    eps: float = 0.0) -> jnp.ndarray:
  """Mean EKL over packed aligned tasks (vmapped, shardable).

  partial=True matches objectives.multivariate_normal_divergence with
  the default partial KL distance; partial=False is the FULL SVD-
  whitened KL (divergences.kl_multivariate_normal(partial=False)) in a
  masked static-shape form — both run as one batched computation over
  the task axis. `eps` is the diagonal ridge the host path adds to both
  covariances (GP.stats uses 1e-6).
  """
  per_task = per_task_divergence_packed(
      mean_func, cov_func, params, packed, warp_func=warp_func,
      partial=partial, eps=eps)
  per_task = jnp.where(packed.task_mask, per_task, 0.0)
  num = jnp.maximum(jnp.sum(packed.task_mask), 1)
  return jnp.sum(per_task) / num


def subsample_aligned_packed(key, packed: PackedAlignedDataset,
                             batch_size: int) -> PackedAlignedDataset:
  """Per-task random row subsample of an aligned pack (matched inputs
  keep all m draws; only the n axis is subsampled, like the reference
  iterator does for aligned sub-datasets)."""
  t, n_max, _ = packed.x.shape
  if batch_size >= n_max:
    return packed
  keys = jax.random.split(key, t)

  def one(k, x, y, n_mask, count_n):
    scores = jnp.where(n_mask, jax.random.uniform(k, (n_max,)), -jnp.inf)
    _, sel = jax.lax.top_k(scores, batch_size)
    onehot = (sel[:, None] == jnp.arange(n_max)[None, :]).astype(x.dtype)
    new_count = jnp.minimum(count_n, batch_size)
    new_mask = jnp.arange(batch_size) < new_count
    return (jnp.dot(onehot, x, precision=jax.lax.Precision.HIGHEST),
            jnp.dot(onehot, y, precision=jax.lax.Precision.HIGHEST),
            new_mask, new_count)

  x, y, n_mask, count_n = jax.vmap(one)(keys, packed.x, packed.y,
                                        packed.n_mask, packed.count_n)
  return PackedAlignedDataset(x=x, y=y, n_mask=n_mask,
                              m_mask=packed.m_mask, count_n=count_n,
                              count_m=packed.count_m,
                              task_mask=packed.task_mask)


def prepermute_packed(key, packed: PackedDataset) -> PackedDataset:
  """One-time random shuffle of each task's valid rows (pads stay last).

  Enables subsample_packed_window: O(1) per-step batching by sliding a
  window over the pre-permuted rows (epoch-style SGD batches) instead of
  drawing an iid subset per step (reference semantics; config flag
  'fast_subsample' selects the window scheme).
  """
  t, n_max, _ = packed.x.shape
  keys = jax.random.split(key, t)

  def one(k, x, y, mask, count):
    scores = jnp.where(mask, jax.random.uniform(k, (n_max,)), jnp.inf)
    order = jnp.argsort(scores)  # valid rows shuffled first, pads last
    return x[order], y[order]

  x, y = jax.vmap(one)(keys, packed.x, packed.y, packed.mask,
                       packed.count)
  return PackedDataset(x=x, y=y, mask=packed.mask, count=packed.count,
                       task_mask=packed.task_mask)


def subsample_packed_window(key, packed: PackedDataset,
                            batch_size: int) -> PackedDataset:
  """O(1) per-step batch: a random contiguous window of pre-permuted
  rows per task. Requires every task to have >= batch_size valid rows
  (fit_adam_packed falls back to the exact sampler otherwise)."""
  t, n_max, d = packed.x.shape
  if batch_size >= n_max:
    return packed
  keys = jax.random.split(key, t)

  def one(k, x, y, count):
    hi = jnp.maximum(count - batch_size + 1, 1)
    o = jax.random.randint(k, (), 0, hi)
    xb = jax.lax.dynamic_slice(x, (o, 0), (batch_size, d))
    yb = jax.lax.dynamic_slice(y, (o, 0), (batch_size, y.shape[-1]))
    new_count = jnp.minimum(count, batch_size)
    return xb, yb, jnp.arange(batch_size) < new_count, new_count

  x, y, mask, count = jax.vmap(one)(keys, packed.x, packed.y,
                                    packed.count)
  return PackedDataset(x=x, y=y, mask=mask, count=count,
                       task_mask=packed.task_mask)


def subsample_packed(key, packed: PackedDataset,
                     batch_size: int) -> PackedDataset:
  """Per-task random subsample to at most batch_size rows, on device.

  Device-side analogue of the host iterator
  (reference hyperbo/basics/data_utils.py:72-100): tasks larger than
  batch_size get a fresh uniform subset each call; smaller tasks pass
  through (padded rows keep their mask).
  """
  t, n_max, _ = packed.x.shape
  if batch_size >= n_max:
    return packed
  keys = jax.random.split(key, t)

  def one(k, x, y, mask, count):
    # Uniform subset of valid rows: top_k over random scores (partial
    # selection — much cheaper than a full argsort on TPU), then a
    # one-hot MXU matmul instead of a row gather (dynamic row gathers
    # dominate the training step otherwise; measured 9.2 -> 0.3 ms/step
    # at PD1 scale).
    scores = jnp.where(mask, jax.random.uniform(k, (n_max,)), -jnp.inf)
    _, sel = jax.lax.top_k(scores, batch_size)
    onehot = (sel[:, None] == jnp.arange(n_max)[None, :]).astype(x.dtype)
    new_count = jnp.minimum(count, batch_size)
    new_mask = jnp.arange(batch_size) < new_count
    return (jnp.dot(onehot, x, precision=jax.lax.Precision.HIGHEST),
            jnp.dot(onehot, y, precision=jax.lax.Precision.HIGHEST),
            new_mask, new_count)

  x, y, mask, count = jax.vmap(one)(keys, packed.x, packed.y, packed.mask,
                                    packed.count)
  return PackedDataset(x=x, y=y, mask=mask, count=count,
                       task_mask=packed.task_mask)
