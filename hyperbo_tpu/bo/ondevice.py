"""Fully on-device Bayesian-optimization loop.

The reference BO iteration (hyperbo/bo_utils/bayesopt.py:137-193) is a
host loop that refactorizes the posterior from scratch after every append
(O(n^3) per iteration, acknowledged TODO at gp.py:284). This module runs
the entire simulated-BO loop as ONE jitted lax.scan with

  * preallocated max-size observation buffers (static shapes),
  * a rank-1-appended factor buffer per iteration (O(n^2), ops.chol) —
    by default the INVERSE factor W = L^{-1} (HYPERBO_BO_SOLVER=winv),
    so posteriors and appends are pure MXU GEMMs with NO triangular
    solves anywhere in the iteration (lax.linalg.triangular_solve is a
    sequential substitution chain on TPU and regressed ~7x in the
    2026-08-18 toolchain; HYPERBO_BO_SOLVER=chol restores the L-buffer
    path for A/B),
  * batched candidate scoring: cross-Gram + posterior GEMMs per
    iteration over the whole candidate set (MXU),
  * acquisition + argmax on device (no host sync until the loop ends).

Semantics match simulated_bayesopt with a GP model and no retraining:
same posterior (incl. noise and the unbiased N/(N-1) rescale), same
acquisition definitions, same greedy argmax (re-selection allowed).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import retrieve_params
from hyperbo_tpu.bo import acfun
from hyperbo_tpu.ops import chol as chol_ops

SubDataset = defs.SubDataset

_ACQ_SUBS = {
    'ei': (acfun.expected_improvement_sub, 'best_y'),
    'pi': (acfun.probability_of_improvement_sub, 'best_y_zeta'),
    'pi2': (acfun.probability_of_improvement_sub, 'best_y_zeta_std'),
    'pi3': (acfun.probability_of_improvement_sub, 'best_y_zeta05'),
    'ucb': (acfun.ucb_sub, 'beta3'),
    'ucb2': (acfun.ucb_sub, 'beta2'),
    'ucb3': (acfun.ucb_sub, 'beta3'),
    'ucb4': (acfun.ucb_sub, 'beta4'),
    'rand': (None, 'rand'),
    # Thompson sampling over the finite candidate set: argmax of one
    # posterior draw. Sampling is per-candidate (decoupled/diagonal —
    # the standard large-set approximation; the exact joint draw would
    # need an O(n_c^3) posterior factorization per iteration).
    'ts': (None, 'ts'),
}


def _acq_param(kind: str, y_buf, mask, count):
  best = jnp.max(jnp.where(mask[:, None], y_buf, -jnp.inf))
  if kind == 'best_y':
    return jnp.where(count > 0, best, 0.0)
  if kind == 'best_y_zeta':
    return jnp.where(count > 0, best + 0.1, 0.0)
  if kind == 'best_y_zeta05':
    return jnp.where(count > 0, best + 0.05, 0.0)
  if kind == 'best_y_zeta_std':
    # pi2: target = best + 0.1 * std(y) (population std, as jnp.std).
    cnt = jnp.maximum(count, 1)
    mean = jnp.sum(jnp.where(mask[:, None], y_buf, 0.0)) / cnt
    var = jnp.sum(
        jnp.where(mask[:, None], (y_buf - mean) ** 2, 0.0)) / cnt
    return jnp.where(count > 0, best + 0.1 * jnp.sqrt(var), 0.0)
  if kind == 'beta2':
    return 2.0
  if kind == 'beta4':
    return 4.0
  return 3.0


def _ts_index(mu, var_noisy, noise_variance, scale, key):
  """Thompson-sampling candidate index from ONE posterior draw.

  The SINGLE ts selection used by every loop variant.
  _masked_posterior returns the noisy predictive variance
  ((var_f + noise) * scale), but TS must draw the LATENT function f:
  with observation noise left in, a well-observed candidate's draw std
  floors at ~sqrt(noise) instead of collapsing, flattening the
  exploration/exploitation structure toward random selection. Invert
  the offset/scale here.
  """
  var_f = jnp.maximum(var_noisy / scale - noise_variance, 1e-12)
  draw = mu + jnp.sqrt(var_f) * jax.random.normal(key, mu.shape)
  return jnp.argmax(draw.flatten())


def _greedy_index(acq_sub, kind, mu, var, y_buf, count):
  """argmax of the closed-form acquisition (shared by every loop)."""
  mask = jnp.arange(y_buf.shape[0]) < count
  target = _acq_param(kind, y_buf, mask, count)
  return jnp.argmax(acq_sub(mu, jnp.sqrt(var), target).flatten())


def _unbiased_scale(num_train_tasks: int) -> float:
  """GP.predict's N/(N-1) rescale with N = train tasks + the test task."""
  n_tasks = num_train_tasks + 1
  return n_tasks / (n_tasks - 1.0) if n_tasks > 1 else 1.0


def _shard_candidates(mesh, mesh_axis, cand_x, cand_y, replicated_args):
  """Shard the candidate axis over the mesh; replicate everything else.

  No-op when mesh is None. GSPMD propagates the shardings through the
  loop body: per-iteration cross-Gram/solve/acquisition split by
  candidate, the argmax becomes a global collective.
  """
  if mesh is None:
    return cand_x, cand_y, replicated_args
  from jax.sharding import NamedSharding, PartitionSpec
  cand_sharding = NamedSharding(mesh, PartitionSpec(mesh_axis))
  replicated = NamedSharding(mesh, PartitionSpec())
  cand_x = jax.device_put(cand_x, cand_sharding)
  cand_y = jax.device_put(cand_y, cand_sharding)
  replicated_args = jax.device_put(replicated_args, replicated)
  return cand_x, cand_y, replicated_args


def _bo_solver() -> str:
  """Factor carried in the BO scan state (read at trace time).

  'winv' (default): W = L^{-1} — posterior and append are pure GEMMs,
  no lax.linalg.triangular_solve in the iteration (that op is a
  sequential substitution chain on TPU; PERF.md round-5b measured it
  regressing 5.4 -> 37.7 ms at 8192 RHS). 'chol': the L buffer
  (legacy; kept for A/B probes).
  """
  return os.environ.get('HYPERBO_BO_SOLVER', 'winv')


def _masked_posterior(mean_func, cov_func, shim, warp_func,
                      noise_variance, scale, x_buf, y_buf, fac_buf,
                      count, cand_x):
  """GP posterior (mu, var) at cand_x from preallocated masked buffers.

  The SINGLE source of the on-device posterior algebra — the GP step,
  the vmapped HGP per-sample posteriors and the continuous loop all
  call this (matching GP.predict semantics: noise added, prior
  fallback with no observations, unbiased rescale). `fac_buf` is the
  factor buffer per _bo_solver(): W = L^{-1} or L itself.
  """
  n_max = x_buf.shape[0]
  mask = jnp.arange(n_max) < count
  mu_prior_obs = mean_func(shim, x_buf, warp_func=warp_func)
  delta = jnp.where(mask[:, None], y_buf - mu_prior_obs, 0.0)
  cross = cov_func(shim, x_buf, cand_x, warp_func=warp_func)
  cross = jnp.where(mask[:, None], cross, 0.0)
  if _bo_solver() == 'winv':
    hi = jax.lax.Precision.HIGH
    kinvy = jnp.matmul(fac_buf.T, jnp.matmul(fac_buf, delta,
                                             precision=hi),
                       precision=hi)
    v = jnp.matmul(fac_buf, cross, precision=hi)
  else:
    kinvy = chol_ops.cho_solve(fac_buf, delta)
    v = chol_ops.solve_triangular(fac_buf, cross, lower=True)
  mu = cross.T @ kinvy + mean_func(shim, cand_x, warp_func=warp_func)
  kdiag = cov_func(shim, cand_x, warp_func=warp_func, diag=True)
  var = jnp.maximum(kdiag - jnp.sum(v * v, axis=0), 1e-12)[:, None]
  # Prior fallback when no observations yet.
  has_obs = count > 0
  mu = jnp.where(has_obs, mu,
                 mean_func(shim, cand_x, warp_func=warp_func))
  var = jnp.where(has_obs, var, kdiag[:, None])
  return mu, (var + noise_variance) * scale


def _make_corpus_loss(mean_func, cov_func, config, warp_func, n_max,
                      pretrain_packed=None, aligned_packed=None,
                      ekl_weight: float = 0.0, ekl_partial: bool = True,
                      eps: float = 1e-6):
  """Build loss(model, x_buf, y_buf, count): the host training
  objective over the full dataset dict in preallocated-buffer form —
  mean per-task NLL over the pre-training corpus plus the masked test
  buffer, plus an optional c*EKL regularizer over aligned tasks, minus
  hyperprior log-probs. Shared by the in-scan retraining (Adam) and
  HGP re-sampling (slice sampler) BO loops."""
  def loss(model, x_buf, y_buf, count):
    return _corpus_loss(mean_func, cov_func, config, warp_func, n_max,
                        model, x_buf, y_buf, count,
                        pretrain_packed=pretrain_packed,
                        aligned_packed=aligned_packed,
                        ekl_weight=ekl_weight, ekl_partial=ekl_partial,
                        eps=eps)

  return loss


def _corpus_loss(mean_func, cov_func, config, warp_func, n_max, model,
                 x_buf, y_buf, count, pretrain_packed=None,
                 aligned_packed=None, ekl_weight: float = 0.0,
                 ekl_partial: bool = True, eps: float = 1e-6):
  """The corpus objective with the packed data as RUNTIME arguments —
  the form cached retrain runners trace once and reuse across calls
  (the packed buffers enter the compiled program as inputs, not baked
  constants)."""
  from hyperbo_tpu.models import packed as packed_lib
  config = dict(config or {})
  config_nopriors = {k: v for k, v in config.items() if k != 'priors'}
  p = defs.GPParams(model=model, config=config_nopriors)
  mask = jnp.arange(n_max) < count
  nll_test = packed_lib.nll_one_task(
      mean_func, cov_func, p, x_buf, y_buf, mask, count,
      warp_func=warp_func, eps=eps)
  w_test = (count > 0).astype(jnp.float32)
  if pretrain_packed is not None:
    t_real = jnp.sum(pretrain_packed.task_mask).astype(jnp.float32)
    # Mean over the packed tasks (reuses fused/batched routing), then
    # recombined with the test task at reference averaging semantics.
    mean_pre = packed_lib.neg_log_marginal_likelihood_packed(
        mean_func, cov_func, p, pretrain_packed, warp_func=warp_func,
        eps=eps)
    total = ((mean_pre * t_real + w_test * nll_test)
             / jnp.maximum(t_real + w_test, 1.0))
  else:
    total = w_test * nll_test
  if aligned_packed is not None and ekl_weight:
    total = total + ekl_weight * packed_lib.multivariate_normal_divergence_packed(
        mean_func, cov_func, p, aligned_packed, warp_func=warp_func,
        partial=ekl_partial)
  if 'priors' in config:
    pw = defs.GPParams(model=model, config=config)
    for k in model:
      if k in config['priors']:
        val, = retrieve_params(pw, [k], warp_func)
        total -= config['priors'][k](val)
  return total


def _masked_refactor(mean_func, cov_func, config, warp_func, model,
                     x_buf, count, eps: float = 1e-6):
  """Masked from-scratch factor of the test-task system (padded rows
  identity, so later rank-1 appends extend it). Returns the factor
  matching _bo_solver(): W = L^{-1} or L."""
  p = defs.GPParams(model=model, config=config)
  nv, = retrieve_params(p, ['noise_variance'], warp_func=warp_func)
  n_max = x_buf.shape[0]
  mask = jnp.arange(n_max) < count
  kmat = cov_func(p, x_buf, warp_func=warp_func)
  pair = mask[:, None] & mask[None, :]
  eye = jnp.eye(n_max, dtype=kmat.dtype)
  kmat = jnp.where(pair, kmat, 0.0) + eye * jnp.where(
      mask, nv + eps, 1.0)
  l = chol_ops.cholesky(kmat)
  if _bo_solver() == 'winv':
    from hyperbo_tpu.ops import linalg as linalg_mod
    return linalg_mod.tri_inv_blocked(l)
  return l


def _append_factor(cov_func, shim, warp_func, noise_variance, eps,
                   x_buf, fac_buf, count, x_new):
  """Rank-1 factor append for one new observation (shared algebra;
  appends W = L^{-1} or L per _bo_solver())."""
  k_vec = cov_func(shim, x_buf, x_new[None, :],
                   warp_func=warp_func)[:, 0]
  kappa = cov_func(shim, x_new[None, :], warp_func=warp_func,
                   diag=True)[0] + noise_variance + eps
  if _bo_solver() == 'winv':
    return chol_ops.winv_append_padded(fac_buf, count, k_vec, kappa)
  return chol_ops.chol_append_padded(fac_buf, count, k_vec, kappa)


def build_bo_step(mean_func, cov_func, config, warp_func,
                  acquisition: str, n_max: int, num_train_tasks: int,
                  eps: float = 1e-6):
  """Build the per-iteration BO step over preallocated buffers.

  State: (x_buf (N,d), y_buf (N,1), fac_buf (N,N), count).
  Step input: the model pytree (a TRACED argument, so one compiled
  runner serves every same-shaped call — see make_bo_runner) and the
  candidate set (n_c, d) with candidate y values (n_c, 1).
  """
  acq_sub, acq_param_kind = _ACQ_SUBS[acquisition]
  scale = _unbiased_scale(num_train_tasks)

  def step(model, state, key, cand_x, cand_y):
    params_shim = defs.GPParams(model=model, config=config)
    noise_variance, = retrieve_params(params_shim, ['noise_variance'],
                                      warp_func=warp_func)

    def posterior(x_buf, y_buf, fac_buf, count, cand_x):
      return _masked_posterior(mean_func, cov_func, params_shim,
                               warp_func, noise_variance, scale, x_buf,
                               y_buf, fac_buf, count, cand_x)

    x_buf, y_buf, fac_buf, count = state
    if acq_param_kind == 'rand':
      select_idx = jax.random.randint(key, (), 0, cand_x.shape[0])
    elif acq_param_kind == 'ts':
      mu, var = posterior(x_buf, y_buf, fac_buf, count, cand_x)
      select_idx = _ts_index(mu, var, noise_variance, scale, key)
    else:
      mu, var = posterior(x_buf, y_buf, fac_buf, count, cand_x)
      select_idx = _greedy_index(acq_sub, acq_param_kind, mu, var,
                                 y_buf, count)
    x_new = cand_x[select_idx]
    y_new = cand_y[select_idx]
    fac_buf = _append_factor(cov_func, params_shim, warp_func,
                             noise_variance, eps, x_buf, fac_buf, count,
                             x_new)
    x_buf = jax.lax.dynamic_update_slice(x_buf, x_new[None, :],
                                         (count, 0))
    y_buf = jax.lax.dynamic_update_slice(y_buf, y_new[None, :],
                                         (count, 0))
    return (x_buf, y_buf, fac_buf, count + 1), select_idx

  return step


def _freeze(obj):
  """Best-effort hashable view of a config value (id fallback)."""
  try:
    hash(obj)
    return obj
  except TypeError:
    if isinstance(obj, dict):
      try:
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
      except TypeError:
        return id(obj)
    if isinstance(obj, (list, tuple)):
      return tuple(_freeze(v) for v in obj)
    return id(obj)


_BO_RUNNER_CACHE = {}


def make_bo_runner(mean_func, cov_func, config, warp_func,
                   acquisition: str, iters: int, n_init: int,
                   n_max: int, num_train_tasks: int):
  """ONE compiled plain-BO runner shared by all same-shaped calls.

  `simulated_bayesopt_ondevice` used to build a fresh `jax.jit` wrapper
  per call with the model baked in as constants, so a production sweep
  (or a benchmark) re-paid the full host retrace+lower of the
  iters-step scan on EVERY call — measured 38-44 ms/iter of pure host
  work at 100 x 10k scale against ~0.6 ms/iter of device time
  (PERF.md r7_bo_dissect; the r5b "152.7 ms/iter" was the same
  artifact). The runner takes the model as a traced argument and is
  memoized on the static configuration, so repeated calls dispatch the
  cached executable.

  Returns run(model, x_buf, y_buf, fac_buf, count, x0, y0, cand_x,
  cand_y, key) -> (x_buf, y_buf, select_idx).
  """
  cache_key = (id(mean_func), id(cov_func), _freeze(config),
               id(warp_func), acquisition, iters, n_init, n_max,
               num_train_tasks, _bo_solver())
  hit = _BO_RUNNER_CACHE.get(cache_key)
  if hit is not None:
    return hit[0]

  step = build_bo_step(mean_func, cov_func, config, warp_func,
                       acquisition, n_max, num_train_tasks)

  @jax.jit
  def run(model, x_buf, y_buf, fac_buf, count, x0, y0, cand_x, cand_y,
          key):
    # Seed initial observations through the same append path.
    def seed_one(i, state):
      # Appending initial points exactly (not via acquisition): argmax
      # (or random choice) over one candidate is that point.
      state, _ = step(model, state, key, x0[i][None, :], y0[i][None, :])
      return state

    state = (x_buf, y_buf, fac_buf, count)
    if n_init > 0:
      state = jax.lax.fori_loop(0, n_init, seed_one, state)

    # Candidates are a closed-over constant of the scan body — the
    # iters x n_c x d broadcast the round-2 loop materialized is gone;
    # the scan carries only per-iteration PRNG keys.
    def body(state, k):
      return step(model, state, k, cand_x, cand_y)

    state, select_idx = jax.lax.scan(body, state,
                                     jax.random.split(key, iters))
    x_buf, y_buf, fac_buf, count = state
    return x_buf, y_buf, select_idx

  # Pin the id()-keyed objects so the key cannot be reused by GC.
  _BO_RUNNER_CACHE[cache_key] = (run, mean_func, cov_func, warp_func,
                                 config)
  return run


def simulated_bayesopt_ondevice(
    mean_func,
    cov_func,
    model_params,
    config,
    warp_func,
    queried_sub_dataset: SubDataset,
    iters: int,
    acquisition: str = 'ei',
    num_train_tasks: int = 0,
    init_obs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    n_max: Optional[int] = None,
    mesh=None,
    mesh_axis: str = 'task',
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """Run `iters` BO iterations entirely on device.

  Args:
    mean_func / cov_func / model_params / config / warp_func: the GP.
    queried_sub_dataset: finite candidate set (x: n_c x d, y: n_c x 1).
    iters: number of sequential selections.
    acquisition: any _ACQ_SUBS key — 'ei', 'pi', 'pi2', 'pi3', 'ucb',
      'ucb2', 'ucb3', 'ucb4', 'ts' (Thompson sampling: argmax of one
      per-candidate posterior draw), or the 'rand' baseline.
    key: PRNG key (drives 'rand'; defaults to PRNGKey(0)).
    num_train_tasks: number of unaligned pre-training tasks (drives the
      unbiased predictive rescale, matching GP.predict).
    init_obs: optional (x0, y0) initial observations on the test task.
    n_max: observation buffer capacity; defaults to init + iters.
    mesh: optional jax.sharding.Mesh — candidates are sharded over
      `mesh_axis` so each iteration's cross-Gram, triangular solve and
      acquisition scoring split across devices (observation state stays
      replicated; the argmax is a global collective inserted by GSPMD).

  Returns:
    (x_observed, y_observed, selected_indices): the init+selected
    observations (dense, in selection order) and per-iter candidate
    indices.
  """
  n_init = 0 if init_obs is None else init_obs[0].shape[0]
  if n_max is None:
    n_max = n_init + iters
  d = queried_sub_dataset.x.shape[1]

  x_buf = jnp.zeros((n_max, d), jnp.float32)
  y_buf = jnp.zeros((n_max, 1), jnp.float32)
  fac_buf = chol_ops.init_chol_buffer(n_max)
  count = jnp.array(0, jnp.int32)

  run = make_bo_runner(mean_func, cov_func, config, warp_func,
                       acquisition, iters, n_init, n_max,
                       num_train_tasks)

  x0 = (init_obs[0] if init_obs is not None
        else jnp.zeros((0, d), jnp.float32))
  y0 = (init_obs[1] if init_obs is not None
        else jnp.zeros((0, 1), jnp.float32))
  cand_x = queried_sub_dataset.x.astype(jnp.float32)
  cand_y = queried_sub_dataset.y.astype(jnp.float32)
  if mesh is not None:
    from jax.sharding import NamedSharding, PartitionSpec
    cand_sharding = NamedSharding(mesh, PartitionSpec(mesh_axis))
    replicated = NamedSharding(mesh, PartitionSpec())
    cand_x = jax.device_put(cand_x, cand_sharding)
    cand_y = jax.device_put(cand_y, cand_sharding)
    x_buf, y_buf, fac_buf, count, x0, y0 = jax.device_put(
        (x_buf, y_buf, fac_buf, count, x0, y0), replicated)
  if key is None:
    key = jax.random.PRNGKey(0)
  x_out, y_out, select_idx = run(
      model_params, x_buf, y_buf, fac_buf, count, x0, y0, cand_x,
      cand_y, key)
  total = n_init + iters
  return x_out[:total], y_out[:total], select_idx


def simulated_bayesopt_ondevice_hgp(
    mean_func,
    cov_func,
    model_params_samples,
    config,
    warp_func,
    queried_sub_dataset: SubDataset,
    iters: int,
    acquisition: str = 'ei',
    num_train_tasks: int = 0,
    init_obs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    n_max: Optional[int] = None,
    mesh=None,
    mesh_axis: str = 'task',
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """On-device BO under an HGP: S posterior samples, one scan.

  The host HGP path (reference acfun.py:72-82) refactorizes S
  posteriors sequentially per iteration; here the S per-sample
  posteriors are one VMAPPED state — batched Gram/solves on the MXU,
  vmapped rank-1 Cholesky appends — and the acquisition is the mean of
  the per-sample sub-acquisitions (same averaging as the reference).

  Args:
    model_params_samples: list of model dicts (params.samples) or an
      already-stacked pytree with leading sample axis S.

  Returns:
    (x_observed, y_observed, selected_indices) as the GP variant.
  """
  if isinstance(model_params_samples, (list, tuple)):
    stacked = jax.tree.map(
        lambda *ls: jnp.stack([jnp.asarray(l, jnp.float32) for l in ls]),
        *model_params_samples)
  else:
    stacked = model_params_samples
  num_samples = jax.tree.leaves(stacked)[0].shape[0]
  n_init = 0 if init_obs is None else init_obs[0].shape[0]
  if n_max is None:
    n_max = n_init + iters
  d = queried_sub_dataset.x.shape[1]

  run = make_bo_hgp_runner(mean_func, cov_func, config, warp_func,
                           acquisition, iters, n_init, n_max,
                           num_samples, num_train_tasks)

  if key is None:
    key = jax.random.PRNGKey(0)
  x0 = (init_obs[0].astype(jnp.float32) if init_obs is not None
        else jnp.zeros((0, d), jnp.float32))
  y0 = (init_obs[1].astype(jnp.float32) if init_obs is not None
        else jnp.zeros((0, 1), jnp.float32))
  cand_x = queried_sub_dataset.x.astype(jnp.float32)
  cand_y = queried_sub_dataset.y.astype(jnp.float32)
  cand_x, cand_y, (x0, y0, stacked) = _shard_candidates(
      mesh, mesh_axis, cand_x, cand_y, (x0, y0, stacked))
  x_out, y_out, select_idx = run(stacked, x0, y0, cand_x, cand_y, key)
  total = n_init + iters
  return x_out[:total], y_out[:total], select_idx


def make_bo_hgp_runner(mean_func, cov_func, config, warp_func,
                       acquisition: str, iters: int, n_init: int,
                       n_max: int, num_samples: int,
                       num_train_tasks: int):
  """ONE compiled HGP-BO runner shared by all same-shaped calls (the
  stacked S-sample model pytree is a traced argument, memoized on the
  static configuration — same rationale as make_bo_runner)."""
  cache_key = ('hgp', id(mean_func), id(cov_func), _freeze(config),
               id(warp_func), acquisition, iters, n_init, n_max,
               num_samples, num_train_tasks, _bo_solver())
  hit = _BO_RUNNER_CACHE.get(cache_key)
  if hit is not None:
    return hit[0]

  acq_sub, acq_param_kind = _ACQ_SUBS[acquisition]
  scale = _unbiased_scale(num_train_tasks)

  def shim(model):
    return defs.GPParams(model=model, config=config)

  def posterior_one(model, fac_buf, x_buf, y_buf, count, cand_x):
    p = shim(model)
    noise_variance, = retrieve_params(p, ['noise_variance'],
                                      warp_func=warp_func)
    return _masked_posterior(mean_func, cov_func, p, warp_func,
                             noise_variance, scale, x_buf, y_buf,
                             fac_buf, count, cand_x)

  def append_one(model, fac_buf, x_buf, count, x_new):
    p = shim(model)
    noise_variance, = retrieve_params(p, ['noise_variance'],
                                      warp_func=warp_func)
    return _append_factor(cov_func, p, warp_func, noise_variance, 1e-6,
                        x_buf, fac_buf, count, x_new)

  def step(stacked, state, args):
    k, cand_x, cand_y = args
    x_buf, y_buf, chols, count = state
    if acq_param_kind == 'rand':
      select_idx = jax.random.randint(k, (), 0, cand_x.shape[0])
    elif acq_param_kind == 'ts':
      # HGP Thompson sampling: draw hyperparameters (one posterior
      # sample uniformly), then one function draw from its posterior.
      s_key, d_key = jax.random.split(k)
      s = jax.random.randint(s_key, (), 0, num_samples)
      model_s = jax.tree.map(lambda leaf: leaf[s], stacked)
      mu, var = posterior_one(model_s, chols[s], x_buf, y_buf, count,
                              cand_x)
      nv_s, = retrieve_params(shim(model_s), ['noise_variance'],
                              warp_func=warp_func)
      select_idx = _ts_index(mu, var, nv_s, scale, d_key)
    else:
      mu_s, var_s = jax.vmap(
          lambda m, c: posterior_one(m, c, x_buf, y_buf, count, cand_x)
      )(stacked, chols)
      mask = jnp.arange(n_max) < count
      target = _acq_param(acq_param_kind, y_buf, mask, count)
      scores = jnp.mean(
          acq_sub(mu_s, jnp.sqrt(var_s), target), axis=0)
      select_idx = jnp.argmax(scores.flatten())
    x_new = cand_x[select_idx]
    y_new = cand_y[select_idx]
    chols = jax.vmap(
        lambda m, c: append_one(m, c, x_buf, count, x_new))(stacked,
                                                            chols)
    x_buf = jax.lax.dynamic_update_slice(x_buf, x_new[None, :],
                                         (count, 0))
    y_buf = jax.lax.dynamic_update_slice(y_buf, y_new[None, :],
                                         (count, 0))
    return (x_buf, y_buf, chols, count + 1), select_idx

  @jax.jit
  def run(stacked, x0, y0, cand_x, cand_y, key):
    x_buf = jnp.zeros((n_max, cand_x.shape[1]), jnp.float32)
    y_buf = jnp.zeros((n_max, 1), jnp.float32)
    chols = jnp.broadcast_to(chol_ops.init_chol_buffer(n_max),
                             (num_samples, n_max, n_max))
    state = (x_buf, y_buf, chols, jnp.array(0, jnp.int32))

    def seed_one(i, st):
      st, _ = step(stacked, st, (key, x0[i][None, :], y0[i][None, :]))
      return st

    if n_init > 0:
      state = jax.lax.fori_loop(0, n_init, seed_one, state)

    def body(st, k):
      return step(stacked, st, (k, cand_x, cand_y))

    state, select_idx = jax.lax.scan(body, state,
                                     jax.random.split(key, iters))
    return state[0], state[1], select_idx

  _BO_RUNNER_CACHE[cache_key] = (run, mean_func, cov_func, warp_func,
                                 config)
  return run


def continuous_bayesopt_ondevice(
    mean_func,
    cov_func,
    model_params,
    config,
    warp_func,
    oracle_fn,
    input_dim: int,
    iters: int,
    acquisition: str = 'ei',
    pool_size: int = 1024,
    refine_steps: int = 20,
    refine_lr: float = 0.02,
    num_train_tasks: int = 0,
    init_obs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Continuous-domain BO entirely on device (jax-expressible oracles).

  The reference's continuous loop (hyperbo/bo_utils/bayesopt.py:75-134)
  crosses to host scipy L-BFGS-B for the acquisition refinement every
  iteration. When the oracle itself is jax-expressible (synthetic
  benchmarks, surrogate objectives), the WHOLE loop runs as one
  lax.scan: per iteration a fresh uniform candidate pool is scored
  (batched posterior on the MXU), the argmax seeds `refine_steps` of
  projected gradient ascent on the acquisition inside [0,1]^d (the
  acquisition is differentiable through the posterior — no host
  round-trip), the oracle is queried, and the observation appends via
  an O(n^2) rank-1 Cholesky update.

  Args:
    oracle_fn: (1, d) -> (1, 1) jax-traceable objective.
    pool_size: candidates sampled per iteration for the argmax seed.
    refine_steps / refine_lr: projected-gradient-ascent schedule; 0
      steps reproduces pure pool-argmax selection.

  Returns:
    (x_observed, y_observed) including init observations, in order.
  """
  if key is None:
    key = jax.random.PRNGKey(0)
  n_init = 0 if init_obs is None else init_obs[0].shape[0]
  n_max = n_init + iters
  run = make_bo_continuous_runner(
      mean_func, cov_func, config, warp_func, oracle_fn, input_dim,
      iters, acquisition, pool_size, refine_steps, refine_lr,
      num_train_tasks, n_init)
  x0 = (init_obs[0].astype(jnp.float32) if init_obs is not None
        else jnp.zeros((0, input_dim), jnp.float32))
  y0 = (init_obs[1].astype(jnp.float32) if init_obs is not None
        else jnp.zeros((0, 1), jnp.float32))
  x_out, y_out = run(model_params, x0, y0, key)
  return x_out, y_out


def make_bo_continuous_runner(mean_func, cov_func, config, warp_func,
                              oracle_fn, input_dim: int, iters: int,
                              acquisition: str, pool_size: int,
                              refine_steps: int, refine_lr: float,
                              num_train_tasks: int, n_init: int):
  """ONE compiled continuous-BO runner shared by all same-shaped calls
  (model as a traced argument, memoized on the static configuration
  INCLUDING the oracle's identity — same rationale as
  make_bo_runner)."""
  cache_key = ('continuous', id(mean_func), id(cov_func),
               _freeze(config), id(warp_func), id(oracle_fn),
               input_dim, iters, acquisition, pool_size, refine_steps,
               refine_lr, num_train_tasks, n_init, _bo_solver())
  hit = _BO_RUNNER_CACHE.get(cache_key)
  if hit is not None:
    return hit[0]

  n_max = n_init + iters
  acq_sub, acq_param_kind = _ACQ_SUBS[acquisition]
  step = build_bo_step(mean_func, cov_func, config,
                       warp_func, acquisition, n_max, num_train_tasks)
  scale = _unbiased_scale(num_train_tasks)

  def posterior_mu_var(params_shim, noise_variance, state, cand_x):
    x_buf, y_buf, fac_buf, count = state
    return _masked_posterior(mean_func, cov_func, params_shim,
                             warp_func, noise_variance, scale, x_buf,
                             y_buf, fac_buf, count, cand_x)

  def acq_values(params_shim, noise_variance, state, cand_x):
    _, y_buf, _, count = state
    mu, var = posterior_mu_var(params_shim, noise_variance, state,
                               cand_x)
    mask = jnp.arange(n_max) < count
    target = _acq_param(acq_param_kind, y_buf, mask, count)
    return acq_sub(mu, jnp.sqrt(var), target)

  def one_iter(model, params_shim, noise_variance, state, k):
    pool = jax.random.uniform(k, (pool_size, input_dim))
    if acq_param_kind == 'rand':
      x_new = pool[jax.random.randint(jax.random.fold_in(k, 1), (), 0,
                                      pool_size)]
      y_new = oracle_fn(x_new[None, :]).reshape(1, 1)
      state, _ = step(model, state, k, x_new[None, :], y_new)
      return state, 0
    if acq_param_kind == 'ts':
      # Thompson sampling selects the pool argmax of one posterior
      # draw; a per-point (decoupled) draw is not a coherent function
      # to gradient-ascend, so no refinement here.
      mu, var = posterior_mu_var(params_shim, noise_variance, state,
                                 pool)
      x_new = pool[_ts_index(mu, var, noise_variance, scale,
                             jax.random.fold_in(k, 2))]
      y_new = oracle_fn(x_new[None, :]).reshape(1, 1)
      state, _ = step(model, state, k, x_new[None, :], y_new)
      return state, 0
    scores = acq_values(params_shim, noise_variance, state, pool)
    x0 = pool[jnp.argmax(scores.flatten())]

    def ascend(_, x):
      g = jax.grad(
          lambda xx: acq_values(params_shim, noise_variance, state,
                                xx[None, :]).flatten()[0])(x)
      norm = jnp.maximum(jnp.linalg.norm(g), 1e-12)
      return jnp.clip(x + refine_lr * g / norm, 0.0, 1.0)

    x_ref = jax.lax.fori_loop(0, refine_steps, ascend, x0)
    # Keep the refined point only if it actually improved the score.
    better = (acq_values(params_shim, noise_variance, state,
                         x_ref[None, :]).flatten()[0] >=
              scores.flatten().max())
    x_new = jnp.where(better, x_ref, x0)
    y_new = oracle_fn(x_new[None, :]).reshape(1, 1)
    state, _ = step(model, state, k, x_new[None, :], y_new)
    return state, 0

  @jax.jit
  def run(model, x0, y0, key):
    params_shim = defs.GPParams(model=model, config=config)
    noise_variance, = retrieve_params(params_shim, ['noise_variance'],
                                      warp_func=warp_func)
    x_buf = jnp.zeros((n_max, input_dim), jnp.float32)
    y_buf = jnp.zeros((n_max, 1), jnp.float32)
    state = (x_buf, y_buf, chol_ops.init_chol_buffer(n_max),
             jnp.array(0, jnp.int32))

    def seed_one(i, st):
      st, _ = step(model, st, key, x0[i][None, :], y0[i][None, :])
      return st

    if n_init > 0:
      state = jax.lax.fori_loop(0, n_init, seed_one, state)
    state, _ = jax.lax.scan(
        lambda st, k: one_iter(model, params_shim, noise_variance, st,
                               k),
        state, jax.random.split(key, iters))
    return state[0], state[1]

  _BO_RUNNER_CACHE[cache_key] = (run, mean_func, cov_func, warp_func,
                                 config, oracle_fn)
  return run


def simulated_bayesopt_ondevice_retrain(
    mean_func,
    cov_func,
    model_params,
    config,
    warp_func,
    queried_sub_dataset: SubDataset,
    iters: int,
    acquisition: str = 'ei',
    num_train_tasks: int = 0,
    init_obs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    n_max: Optional[int] = None,
    pretrain_packed=None,
    aligned_packed=None,
    ekl_weight: float = 0.0,
    ekl_partial: bool = True,
    retrain_every: int = 1,
    retrain_steps: int = 10,
    learning_rate: Optional[float] = None,
    eps: float = 1e-6,
    mesh=None,
    mesh_axis: str = 'task',
    key: Optional[jax.Array] = None,
):
  """On-device BO with PERIODIC IN-SCAN RETRAINING: the full
  retrain->select->append experiment loop as ONE compiled program.

  The host loop's `retrain_model` (reference
  hyperbo/bo_utils/bayesopt.py:46-72, called per iteration from
  simulated_bayesopt) re-trains the GP on all sub-datasets — the
  pre-training corpus plus the growing test task — then refactorizes
  the posterior. Here the model parameters and Adam state ride the
  scan carry: every `retrain_every` iterations the loop takes
  `retrain_steps` full-batch Adam steps on the mean per-task NLL of
  (pretrain_packed (+) masked test buffer) — the same
  averaged-over-sub-datasets objective (priors subtracted once, as
  models/packed.neg_log_marginal_likelihood_packed) — and rebuilds the
  test-task Cholesky from the new kernel; between retrains appends
  stay O(n^2) rank-1 updates.

  Args:
    pretrain_packed: optional models.packed.PackedDataset of the
      pre-training tasks (None = retrain on the test task alone, the
      STBO regime).
    aligned_packed / ekl_weight / ekl_partial: optional
      models.packed.PackedAlignedDataset of matched-input tasks and
      the regularizer coefficient — the objective becomes
      nll + ekl_weight * EKL, the host's `nll_regkl(c)` combinator
      (objectives.nll_regkl; partial or full SVD-whitened KL).
    retrain_every / retrain_steps: cadence and per-retrain Adam steps;
      retrain_steps=0 reproduces simulated_bayesopt_ondevice exactly.
    learning_rate: Adam LR (default config['learning_rate'] or 1e-2).
    mesh: optional jax.sharding.Mesh — candidates AND the pre-training
      corpus shard over `mesh_axis`: acquisition scoring splits by
      candidate, the retrain gradient by task (each device owns its
      tasks' Gram/Cholesky; the mean-NLL gradient psums over ICI via
      GSPMD). Observation state and model params stay replicated.

  Returns:
    (x_observed, y_observed, selected_indices, final_model_params).
  """
  if key is None:
    key = jax.random.PRNGKey(0)
  n_init = 0 if init_obs is None else init_obs[0].shape[0]
  if n_max is None:
    n_max = n_init + iters
  d = queried_sub_dataset.x.shape[1]
  config = dict(config or {})
  lr = learning_rate if learning_rate is not None else config.get(
      'learning_rate', 1e-2)

  # Shard the retrain corpus BEFORE the runner call — the packed
  # buffers are runtime inputs of the cached program, so the jit
  # specializes on (and keeps) their sharding.
  if mesh is not None and pretrain_packed is not None:
    from hyperbo_tpu.parallel import mesh as mesh_lib
    pretrain_packed = mesh_lib.shard_packed(pretrain_packed, mesh,
                                            axis_name=mesh_axis)

  run = make_bo_retrain_runner(
      mean_func, cov_func, config, warp_func, acquisition, iters,
      n_init, n_max, num_train_tasks, retrain_every=retrain_every,
      retrain_steps=retrain_steps, learning_rate=lr,
      ekl_weight=ekl_weight, ekl_partial=ekl_partial, eps=eps)

  x0 = (init_obs[0].astype(jnp.float32) if init_obs is not None
        else jnp.zeros((0, d), jnp.float32))
  y0 = (init_obs[1].astype(jnp.float32) if init_obs is not None
        else jnp.zeros((0, 1), jnp.float32))
  model0 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                        dict(model_params))
  cand_x = queried_sub_dataset.x.astype(jnp.float32)
  cand_y = queried_sub_dataset.y.astype(jnp.float32)
  cand_x, cand_y, (x0, y0, model0) = _shard_candidates(
      mesh, mesh_axis, cand_x, cand_y, (x0, y0, model0))
  x_out, y_out, select_idx, model_out = run(
      model0, x0, y0, cand_x, cand_y, pretrain_packed, aligned_packed,
      key)
  total = n_init + iters
  return x_out[:total], y_out[:total], select_idx, model_out


def make_bo_retrain_runner(mean_func, cov_func, config, warp_func,
                           acquisition: str, iters: int, n_init: int,
                           n_max: int, num_train_tasks: int,
                           retrain_every: int = 1,
                           retrain_steps: int = 10,
                           learning_rate: float = 1e-2,
                           ekl_weight: float = 0.0,
                           ekl_partial: bool = True,
                           eps: float = 1e-6):
  """ONE compiled retrain-BO runner shared by all same-shaped calls.

  The in-scan retraining loop's compiled program is LARGE (corpus loss
  + its gradient inside a cond inside the scan): rebuilding the jit
  wrapper per call made every invocation repay the full host
  trace+lower+compile — measured 1535 ms/iter "cached" at 100 x 10k
  scale against ~8 ms/iter of actual amortized device work
  (PERF.md r7_retrain_dissect: 10 x 3.2 ms grad steps + 3.0 ms
  refactor per retrain-every-5 event; the r5b 1626/1825 ms/iter were
  the same artifact). The runner takes the model AND the packed corpus
  as traced arguments and is memoized on the static configuration.

  Returns run(model, x0, y0, cand_x, cand_y, pretrain_packed,
  aligned_packed, key) -> (x_buf, y_buf, select_idx, final_model).
  pretrain_packed / aligned_packed may be None (both are pytree inputs;
  jit re-specializes if presence or shapes change).
  """
  import optax

  config = dict(config or {})
  cache_key = ('retrain', id(mean_func), id(cov_func), _freeze(config),
               id(warp_func), acquisition, iters, n_init, n_max,
               num_train_tasks, retrain_every, retrain_steps,
               learning_rate, ekl_weight, ekl_partial, eps,
               _bo_solver())
  hit = _BO_RUNNER_CACHE.get(cache_key)
  if hit is not None:
    return hit[0]

  optimizer = optax.adam(learning_rate)
  acq_sub, acq_param_kind = _ACQ_SUBS[acquisition]
  scale = _unbiased_scale(num_train_tasks)
  config_nopriors = {k: v for k, v in config.items() if k != 'priors'}

  def shim(model):
    return defs.GPParams(model=model, config=config_nopriors)

  def noise_of(model):
    nv, = retrieve_params(shim(model), ['noise_variance'],
                          warp_func=warp_func)
    return nv

  def refactor(model, x_buf, count):
    return _masked_refactor(mean_func, cov_func, config_nopriors,
                            warp_func, model, x_buf, count, eps=eps)

  def retrain(model, opt_state, x_buf, y_buf, count, pp, ap):
    def loss(m, xb, yb, c):
      return _corpus_loss(mean_func, cov_func, config, warp_func,
                          n_max, m, xb, yb, c, pretrain_packed=pp,
                          aligned_packed=ap, ekl_weight=ekl_weight,
                          ekl_partial=ekl_partial, eps=eps)

    def one(_, carry):
      m, o = carry
      grads = jax.grad(loss)(m, x_buf, y_buf, count)
      updates, o = optimizer.update(grads, o)
      return optax.apply_updates(m, updates), o
    return jax.lax.fori_loop(0, retrain_steps, one, (model, opt_state))

  def append(model, x_buf, y_buf, fac_buf, count, x_new, y_new):
    fac_buf = _append_factor(cov_func, shim(model), warp_func,
                            noise_of(model), eps, x_buf, fac_buf,
                            count, x_new)
    x_buf = jax.lax.dynamic_update_slice(x_buf, x_new[None, :],
                                         (count, 0))
    y_buf = jax.lax.dynamic_update_slice(y_buf, y_new[None, :],
                                         (count, 0))
    return x_buf, y_buf, fac_buf, count + 1

  def step(state, args, cand_x, cand_y, pp, ap):
    i, k = args
    x_buf, y_buf, fac_buf, count, model, opt_state = state
    if retrain_steps > 0:
      do = jnp.logical_and(i % retrain_every == 0, count > 0)
      model, opt_state = jax.lax.cond(
          do,
          lambda m, o: retrain(m, o, x_buf, y_buf, count, pp, ap),
          lambda m, o: (m, o), model, opt_state)
      fac_buf = jax.lax.cond(
          do,
          lambda m, xb, c, cb: refactor(m, xb, c),
          lambda m, xb, c, cb: cb, model, x_buf, count, fac_buf)
    if acq_param_kind == 'rand':
      select_idx = jax.random.randint(k, (), 0, cand_x.shape[0])
    elif acq_param_kind == 'ts':
      mu, var = _masked_posterior(
          mean_func, cov_func, shim(model), warp_func, noise_of(model),
          scale, x_buf, y_buf, fac_buf, count, cand_x)
      select_idx = _ts_index(mu, var, noise_of(model), scale, k)
    else:
      mu, var = _masked_posterior(
          mean_func, cov_func, shim(model), warp_func, noise_of(model),
          scale, x_buf, y_buf, fac_buf, count, cand_x)
      select_idx = _greedy_index(acq_sub, acq_param_kind, mu, var,
                                 y_buf, count)
    x_buf, y_buf, fac_buf, count = append(
        model, x_buf, y_buf, fac_buf, count, cand_x[select_idx],
        cand_y[select_idx])
    return (x_buf, y_buf, fac_buf, count, model, opt_state), select_idx

  @jax.jit
  def run(model, x0, y0, cand_x, cand_y, pp, ap, key):
    x_buf = jnp.zeros((n_max, cand_x.shape[1]), jnp.float32)
    y_buf = jnp.zeros((n_max, 1), jnp.float32)
    fac_buf = chol_ops.init_chol_buffer(n_max)
    opt_state = optimizer.init(model)
    state = (x_buf, y_buf, fac_buf, jnp.array(0, jnp.int32), model,
             opt_state)

    def seed_one(i, st):
      x_buf, y_buf, fac_buf, count, model, opt_state = st
      x_buf, y_buf, fac_buf, count = append(
          model, x_buf, y_buf, fac_buf, count, x0[i], y0[i])
      return (x_buf, y_buf, fac_buf, count, model, opt_state)

    if n_init > 0:
      state = jax.lax.fori_loop(0, n_init, seed_one, state)
    state, select_idx = jax.lax.scan(
        lambda st, a: step(st, a, cand_x, cand_y, pp, ap), state,
        (jnp.arange(iters), jax.random.split(key, iters)))
    return state[0], state[1], select_idx, state[4]

  _BO_RUNNER_CACHE[cache_key] = (run, mean_func, cov_func, warp_func,
                                 config)
  return run


def simulated_bayesopt_ondevice_qbatch(
    mean_func,
    cov_func,
    model_params,
    config,
    warp_func,
    queried_sub_dataset: SubDataset,
    iters: int,
    q: int = 2,
    acquisition: str = 'ei',
    num_train_tasks: int = 0,
    init_obs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    n_max: Optional[int] = None,
    eps: float = 1e-6,
    mesh=None,
    mesh_axis: str = 'task',
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """Batch BO: q points per iteration by greedy hallucination.

  Parallel-suggestion ("q-batch") selection via the kriging-believer
  strategy: within an iteration the q points are picked sequentially,
  each conditioning on the previous picks with their posterior MEAN
  hallucinated as the observation; after the batch, the true values
  replace the hallucinated ones. The kernel matrix depends only on x,
  so the reveal costs nothing — the rank-1 Cholesky appends made
  during hallucination remain exact. q=1 reproduces
  simulated_bayesopt_ondevice.

  Returns:
    (x_observed, y_observed, selected_indices (iters, q)).
  """
  if key is None:
    key = jax.random.PRNGKey(0)
  n_init = 0 if init_obs is None else init_obs[0].shape[0]
  if n_max is None:
    n_max = n_init + iters * q

  run = make_bo_qbatch_runner(mean_func, cov_func, config, warp_func,
                              acquisition, iters, q, n_init, n_max,
                              num_train_tasks, eps=eps)

  d = queried_sub_dataset.x.shape[1]
  x0 = (init_obs[0].astype(jnp.float32) if init_obs is not None
        else jnp.zeros((0, d), jnp.float32))
  y0 = (init_obs[1].astype(jnp.float32) if init_obs is not None
        else jnp.zeros((0, 1), jnp.float32))
  cand_x = queried_sub_dataset.x.astype(jnp.float32)
  cand_y = queried_sub_dataset.y.astype(jnp.float32)
  cand_x, cand_y, (x0, y0) = _shard_candidates(
      mesh, mesh_axis, cand_x, cand_y, (x0, y0))
  x_out, y_out, select_idx = run(model_params, x0, y0, cand_x, cand_y,
                                 key)
  total = n_init + iters * q
  return x_out[:total], y_out[:total], select_idx


def make_bo_qbatch_runner(mean_func, cov_func, config, warp_func,
                          acquisition: str, iters: int, q: int,
                          n_init: int, n_max: int,
                          num_train_tasks: int, eps: float = 1e-6):
  """ONE compiled q-batch BO runner shared by all same-shaped calls
  (model as a traced argument, memoized on the static configuration —
  same rationale as make_bo_runner)."""
  cache_key = ('qbatch', id(mean_func), id(cov_func), _freeze(config),
               id(warp_func), acquisition, iters, q, n_init, n_max,
               num_train_tasks, eps, _bo_solver())
  hit = _BO_RUNNER_CACHE.get(cache_key)
  if hit is not None:
    return hit[0]

  acq_sub, acq_param_kind = _ACQ_SUBS[acquisition]
  scale = _unbiased_scale(num_train_tasks)

  def step(model, state, k, cand_x, cand_y):
    params_shim = defs.GPParams(model=model, config=config)
    noise_variance, = retrieve_params(params_shim, ['noise_variance'],
                                      warp_func=warp_func)

    def append(x_buf, y_buf, fac_buf, count, x_new, y_new):
      fac_buf = _append_factor(cov_func, params_shim, warp_func,
                              noise_variance, eps, x_buf, fac_buf,
                              count, x_new)
      x_buf = jax.lax.dynamic_update_slice(x_buf, x_new[None, :],
                                           (count, 0))
      y_buf = jax.lax.dynamic_update_slice(y_buf, y_new[None, :],
                                           (count, 0))
      return x_buf, y_buf, fac_buf, count + 1

    def pick_one(j, carry):
      x_buf, y_buf, fac_buf, count, idxs = carry
      # q=1 must reproduce the plain loop exactly, including the PRNG
      # stream consumed by rand/ts.
      kj = k if q == 1 else jax.random.fold_in(k, j)
      mu, var = _masked_posterior(mean_func, cov_func, params_shim,
                                  warp_func, noise_variance, scale,
                                  x_buf, y_buf, fac_buf, count, cand_x)
      if acq_param_kind == 'rand':
        select_idx = jax.random.randint(kj, (), 0, cand_x.shape[0])
      elif acq_param_kind == 'ts':
        select_idx = _ts_index(mu, var, noise_variance, scale, kj)
      else:
        select_idx = _greedy_index(acq_sub, acq_param_kind, mu, var,
                                   y_buf, count)
      # Believe the posterior mean until the batch completes.
      y_hallu = mu[select_idx][None, :] if mu.ndim == 2 else (
          mu[select_idx].reshape(1, 1))
      x_buf, y_buf, fac_buf, count = append(
          x_buf, y_buf, fac_buf, count, cand_x[select_idx],
          y_hallu.reshape(1,))
      idxs = idxs.at[j].set(select_idx)
      return x_buf, y_buf, fac_buf, count, idxs

    x_buf, y_buf, fac_buf, count, idxs = jax.lax.fori_loop(
        0, q, pick_one,
        (*state, jnp.zeros((q,), jnp.int32)))
    # Reveal: overwrite the q hallucinated entries with true values
    # (the factor depends only on x — no refactorization needed).
    def reveal(j, y_buf):
      return jax.lax.dynamic_update_slice(
          y_buf, cand_y[idxs[j]][None, :], (count - q + j, 0))
    y_buf = jax.lax.fori_loop(0, q, reveal, y_buf)
    return (x_buf, y_buf, fac_buf, count), idxs

  @jax.jit
  def run(model, x0, y0, cand_x, cand_y, key):
    params_shim = defs.GPParams(model=model, config=config)
    noise_variance, = retrieve_params(params_shim, ['noise_variance'],
                                      warp_func=warp_func)
    x_buf = jnp.zeros((n_max, cand_x.shape[1]), jnp.float32)
    y_buf = jnp.zeros((n_max, 1), jnp.float32)
    fac_buf = chol_ops.init_chol_buffer(n_max)
    state = (x_buf, y_buf, fac_buf, jnp.array(0, jnp.int32))

    def seed_one(i, st):
      x_buf, y_buf, fac_buf, count = st
      fac_buf = _append_factor(cov_func, params_shim, warp_func,
                              noise_variance, eps, x_buf, fac_buf,
                              count, x0[i])
      x_buf = jax.lax.dynamic_update_slice(x_buf, x0[i][None, :],
                                           (count, 0))
      y_buf = jax.lax.dynamic_update_slice(
          y_buf, y0[i].reshape(1, 1), (count, 0))
      return x_buf, y_buf, fac_buf, count + 1

    if n_init > 0:
      state = jax.lax.fori_loop(0, n_init, seed_one, state)
    state, select_idx = jax.lax.scan(
        lambda st, k: step(model, st, k, cand_x, cand_y), state,
        jax.random.split(key, iters))
    return state[0], state[1], select_idx

  _BO_RUNNER_CACHE[cache_key] = (run, mean_func, cov_func, warp_func,
                                 config)
  return run


def default_retrain_corpus(dataset, sub_dataset_key):
  """(corpus, dropped_keys): the sub-datasets the in-scan retraining
  objective can pack — single-output, unaligned, non-empty — and the
  keys it must exclude. Shared by run_bayesopt_ondevice and the
  experiments driver (which warns about the exclusions)."""
  corpus = {k: v for k, v in dataset.items()
            if k != sub_dataset_key and v.aligned is None
            and v.x.shape[0] > 0 and v.y.shape[1] == 1}
  dropped = [k for k in dataset
             if k != sub_dataset_key and k not in corpus]
  return corpus, dropped


def run_bayesopt_ondevice(
    model,
    sub_dataset_key,
    queried_sub_dataset: SubDataset,
    iters: int,
    acquisition: str = 'ei',
    q: int = 1,
    retrain_every: int = 1,
    pretrain_packed=None,
    aligned_packed=None,
    ekl_weight: float = 0.0,
    mesh=None,
    key: Optional[jax.Array] = None,
):
  """On-device counterpart of bayesopt.run_bayesopt for a built model.

  Takes a (pre-trained) GP or HGP instance and dispatches to the right
  scan loop: HGP -> per-sample vmapped loop; config['retrain'] > 0 ->
  in-scan retraining (GP only; the corpus defaults to the model's
  single-output unaligned sub-datasets); q > 1 -> kriging-believer
  batch selection; else the plain loop. Existing observations on
  `sub_dataset_key` seed the buffers, matching the host loop.

  Returns:
    ((x_observed, y_observed), best_datapoint_of_queried, params) —
    the same triple shape as bayesopt.run_bayesopt's return; with
    retraining the returned params reflect the retrained model.
  """
  from hyperbo_tpu.models import gp as gp_lib
  from hyperbo_tpu.models import packed as packed_lib
  from hyperbo_tpu.bo import bayesopt as bayesopt_lib

  retrain = (model.params.config or {}).get('retrain', 0)
  n_unaligned = len(
      [k for k, v in model.dataset.items() if v.aligned is None])
  in_dataset = sub_dataset_key in model.dataset
  num_train_tasks = n_unaligned - 1 if in_dataset else n_unaligned
  init_obs = None
  if in_dataset and model.dataset[sub_dataset_key].x.shape[0] > 0:
    sub = model.dataset[sub_dataset_key]
    init_obs = (sub.x, sub.y)
  if key is None:
    key = jax.random.PRNGKey(0)
  common = dict(queried_sub_dataset=queried_sub_dataset, iters=iters,
                acquisition=acquisition,
                num_train_tasks=num_train_tasks, init_obs=init_obs,
                key=key)
  if retrain > 0 and pretrain_packed is None:
    corpus, _ = default_retrain_corpus(model.dataset, sub_dataset_key)
    pretrain_packed = (
        packed_lib.pack_dataset(corpus, pad_to_multiple=8)[0]
        if corpus else None)

  if isinstance(model, gp_lib.HGP):
    if q > 1:
      raise ValueError('HGP on-device BO does not support q-batch '
                       'selection; use the host loop.')
    if retrain > 0:
      # In-scan posterior refresh: chains start from the HGP's current
      # samples and advance slice-sampling sweeps between selections.
      xo, yo, _, samples = simulated_bayesopt_ondevice_hgp_resample(
          model.mean_func, model.cov_func, model.params.model,
          model.params.config, model.warp_func,
          pretrain_packed=pretrain_packed,
          aligned_packed=aligned_packed, ekl_weight=ekl_weight,
          resample_every=retrain_every, sweeps=retrain, mesh=mesh,
          init_samples=model.get_model_params_samples(), **common)
      model.params.samples = samples
      model.params.cache = {}
    else:
      xo, yo, _ = simulated_bayesopt_ondevice_hgp(
          model.mean_func, model.cov_func,
          model.get_model_params_samples(), model.params.config,
          model.warp_func, mesh=mesh, **common)
  elif retrain > 0:
    if q > 1:
      raise ValueError('q-batch selection does not compose with '
                       'in-scan retraining yet.')
    xo, yo, _, model_out = simulated_bayesopt_ondevice_retrain(
        model.mean_func, model.cov_func, model.params.model,
        model.params.config, model.warp_func,
        pretrain_packed=pretrain_packed, aligned_packed=aligned_packed,
        ekl_weight=ekl_weight, retrain_every=retrain_every,
        retrain_steps=retrain, mesh=mesh, **common)
    model.params.model = model_out
    model.params.cache = {}
  elif q > 1:
    # Budget parity with run_bayesopt: iters counts total oracle
    # evaluations, so q-batch runs iters/q batches of q.
    if iters % q:
      raise ValueError(f'iters={iters} must divide by q={q} (iters '
                       'counts total evaluations, as run_bayesopt).')
    common['iters'] = iters // q
    xo, yo, _ = simulated_bayesopt_ondevice_qbatch(
        model.mean_func, model.cov_func, model.params.model,
        model.params.config, model.warp_func, q=q, mesh=mesh, **common)
  else:
    xo, yo, _ = simulated_bayesopt_ondevice(
        model.mean_func, model.cov_func, model.params.model,
        model.params.config, model.warp_func, mesh=mesh, **common)
  return ((xo, yo), bayesopt_lib.get_best_datapoint(queried_sub_dataset),
          model.params)


def simulated_bayesopt_ondevice_hgp_resample(
    mean_func,
    cov_func,
    model_params,
    config,
    warp_func,
    queried_sub_dataset: SubDataset,
    iters: int,
    acquisition: str = 'ei',
    num_samples: int = 8,
    num_train_tasks: int = 0,
    init_obs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    n_max: Optional[int] = None,
    pretrain_packed=None,
    aligned_packed=None,
    ekl_weight: float = 0.0,
    resample_every: int = 1,
    sweeps: int = 2,
    width: float = 1.0,
    max_steps_out: int = 10,
    max_shrink: int = 100,
    init_jitter: float = 0.1,
    init_samples=None,
    eps: float = 1e-6,
    mesh=None,
    mesh_axis: str = 'task',
    key: Optional[jax.Array] = None,
):
  """On-device HGP BO with IN-SCAN posterior re-sampling.

  The host HGP path re-runs the slice sampler between BO iterations
  (run_bayesopt forces method='slice_sample', reference
  hyperbo/bo_utils/bayesopt.py:247-255, and retrain_model re-infers).
  Here the S hyperparameter samples ride the scan carry in
  unconstrained (flattened) space: every `resample_every` iterations
  each sample advances `sweeps` Neal-2003 slice-sampling sweeps
  (train/slice_sampler's stepping-out + shrinkage chain) targeting the
  posterior given the pre-training corpus PLUS the current test
  buffer, then all S test-task Cholesky factors are rebuilt from the
  fresh hyperparameters. Selection averages the per-sample
  acquisitions ('ts' draws hyperparameters then the function). The
  whole resample->select->append experiment is ONE compiled program.

  Args:
    model_params: starting model dict (sample 0 starts here; samples
      s>0 add N(0, init_jitter^2) noise in unconstrained space).
    num_samples: S parallel hyperparameter chains/samples.
    init_samples: optional list of S model dicts (e.g. an HGP's
      params.samples) the chains start from, overriding the
      jitter-around-model_params initialization.
    pretrain_packed / aligned_packed / ekl_weight: the sampling
      target's corpus, as simulated_bayesopt_ondevice_retrain.
    resample_every / sweeps: cadence and per-resample sweeps (sweeps=0
      disables re-sampling: fixed-sample HGP like the plain HGP loop).

  Returns:
    (x_observed, y_observed, selected_indices, samples) — samples is
    the final list of S model dicts (the HGP params.samples contract).
  """
  from jax import flatten_util

  if key is None:
    key = jax.random.PRNGKey(0)
  n_init = 0 if init_obs is None else init_obs[0].shape[0]
  if n_max is None:
    n_max = n_init + iters
  d = queried_sub_dataset.x.shape[1]
  config = dict(config or {})

  # The unravel template must match the chains' pytree structure: when
  # chains start from explicit samples, take it from the first sample.
  template = (init_samples[0] if init_samples is not None
              else model_params)
  model0 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                        dict(template))
  x0, _ = flatten_util.ravel_pytree(model0)
  # Shard the sampling-target corpus BEFORE the runner call — the
  # packed buffers are runtime inputs of the cached program, so the
  # jit specializes on (and keeps) their sharding (the chains'
  # per-sweep corpus NLL then splits by task over the mesh).
  if mesh is not None and pretrain_packed is not None:
    from hyperbo_tpu.parallel import mesh as mesh_lib
    pretrain_packed = mesh_lib.shard_packed(pretrain_packed, mesh,
                                            axis_name=mesh_axis)

  if init_samples is not None:
    num_samples = len(init_samples)
    init_arr = jnp.stack([
        flatten_util.ravel_pytree(jax.tree.map(
            lambda v: jnp.asarray(v, jnp.float32), dict(s)))[0]
        for s in init_samples])
    init_mode = 'samples'
  else:
    init_arr = x0
    init_mode = 'jitter'

  run, unravel = make_bo_resample_runner(
      mean_func, cov_func, config, warp_func, model0, acquisition,
      iters, n_init, n_max, num_samples, num_train_tasks,
      resample_every=resample_every, sweeps=sweeps, width=width,
      max_steps_out=max_steps_out, max_shrink=max_shrink,
      init_jitter=init_jitter, init_mode=init_mode,
      ekl_weight=ekl_weight, eps=eps)

  x0_obs = (init_obs[0].astype(jnp.float32) if init_obs is not None
            else jnp.zeros((0, d), jnp.float32))
  y0_obs = (init_obs[1].astype(jnp.float32) if init_obs is not None
            else jnp.zeros((0, 1), jnp.float32))
  cand_x = queried_sub_dataset.x.astype(jnp.float32)
  cand_y = queried_sub_dataset.y.astype(jnp.float32)
  cand_x, cand_y, (x0_obs, y0_obs) = _shard_candidates(
      mesh, mesh_axis, cand_x, cand_y, (x0_obs, y0_obs))
  x_out, y_out, select_idx, xs = run(
      init_arr, x0_obs, y0_obs, cand_x, cand_y, pretrain_packed,
      aligned_packed, key)
  total = n_init + iters
  samples = [unravel(row) for row in xs]
  return x_out[:total], y_out[:total], select_idx, samples


def make_bo_resample_runner(mean_func, cov_func, config, warp_func,
                            template_model, acquisition: str,
                            iters: int, n_init: int, n_max: int,
                            num_samples: int, num_train_tasks: int,
                            resample_every: int = 1, sweeps: int = 2,
                            width: float = 1.0, max_steps_out: int = 10,
                            max_shrink: int = 100,
                            init_jitter: float = 0.1,
                            init_mode: str = 'jitter',
                            ekl_weight: float = 0.0,
                            eps: float = 1e-6):
  """ONE compiled resample-BO runner shared by all same-shaped calls.

  Same retrace economics as make_bo_retrain_runner but worse: the
  compiled program embeds `sweeps` slice-sampling sweeps (a
  while-loop chain per sample) over the corpus posterior inside a cond
  inside the scan, so rebuilding the jit wrapper per call repaid an
  even larger host trace+lower — the r5b "1825 ms/iter" HGP-resample
  number was this artifact. The runner takes the initial chain state
  AND the packed corpus as traced arguments and is memoized on the
  static configuration (including the model-pytree STRUCTURE, which
  fixes the ravel/unravel layout).

  Returns (run, unravel): run(init_arr, x0_obs, y0_obs, cand_x,
  cand_y, pretrain_packed, aligned_packed, key) -> (x_buf, y_buf,
  select_idx, xs_final); init_arr is the flattened start model
  (init_mode='jitter') or the (S, p) stacked chain starts
  (init_mode='samples'). pretrain_packed / aligned_packed may be None
  (pytree inputs; jit re-specializes if presence or shapes change).
  """
  from jax import flatten_util
  from hyperbo_tpu.train import slice_sampler as ss

  config = dict(config or {})
  model0 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                        dict(template_model))
  _, unravel = flatten_util.ravel_pytree(model0)
  tdef = jax.tree.structure(model0)
  shapes = tuple(tuple(l.shape) for l in jax.tree.leaves(model0))
  cache_key = ('resample', id(mean_func), id(cov_func),
               _freeze(config), id(warp_func), str(tdef), shapes,
               acquisition, iters, n_init, n_max, num_samples,
               num_train_tasks, resample_every, sweeps, width,
               max_steps_out, max_shrink, init_jitter, init_mode,
               ekl_weight, eps, _bo_solver())
  hit = _BO_RUNNER_CACHE.get(cache_key)
  if hit is not None:
    return hit[0], unravel

  config_nopriors = {k: v for k, v in config.items() if k != 'priors'}
  acq_sub, acq_param_kind = _ACQ_SUBS[acquisition]
  scale = _unbiased_scale(num_train_tasks)

  def shim(v):
    return defs.GPParams(model=unravel(v), config=config_nopriors)

  def noise_of(v):
    nv, = retrieve_params(shim(v), ['noise_variance'],
                          warp_func=warp_func)
    return nv

  def resample(xs, x_buf, y_buf, count, k, pp, ap):
    def lp(v):
      return -_corpus_loss(mean_func, cov_func, config, warp_func,
                           n_max, unravel(v), x_buf, y_buf, count,
                           pretrain_packed=pp, aligned_packed=ap,
                           ekl_weight=ekl_weight, eps=eps)
    def one(x, kk):
      draws, _ = ss._run_chain(lp, x, kk, sweeps, width, max_steps_out,
                               max_shrink)
      return draws[-1]
    return jax.vmap(one)(xs, jax.random.split(k, num_samples))

  def refactor_all(xs, x_buf, count):
    return jax.vmap(lambda v: _masked_refactor(
        mean_func, cov_func, config_nopriors, warp_func, unravel(v),
        x_buf, count, eps=eps))(xs)

  def posterior_one(v, fac_buf, x_buf, y_buf, count, cand_x):
    return _masked_posterior(mean_func, cov_func, shim(v), warp_func,
                             noise_of(v), scale, x_buf, y_buf,
                             fac_buf, count, cand_x)

  def append_all(xs, chols, x_buf, count, x_new):
    return jax.vmap(lambda v, c: _append_factor(
        cov_func, shim(v), warp_func, noise_of(v), eps, x_buf, c,
        count, x_new))(xs, chols)

  def step(state, args, cand_x, cand_y, pp, ap):
    i, k = args
    x_buf, y_buf, chols, xs, count = state
    rk, sk = jax.random.split(k)
    if sweeps > 0:
      # With no corpus, no priors and an empty test buffer the
      # sampling target is CONSTANT: stepping-out always succeeds on a
      # flat log-prob and every chain would jump uniformly within the
      # slice width bound. Gate re-sampling on a non-flat target
      # existing (pp/ap presence is static per jit specialization).
      has_static_target = (pp is not None
                           or (ap is not None and ekl_weight)
                           or 'priors' in config)
      do = (i % resample_every) == 0
      if not has_static_target:
        do = jnp.logical_and(do, count > 0)
      xs = jax.lax.cond(
          do, lambda xs: resample(xs, x_buf, y_buf, count, rk, pp, ap),
          lambda xs: xs, xs)
      chols = jax.lax.cond(
          do, lambda a, b: refactor_all(a, b, count),
          lambda a, b: chols, xs, x_buf)
    if acq_param_kind == 'rand':
      select_idx = jax.random.randint(sk, (), 0, cand_x.shape[0])
    elif acq_param_kind == 'ts':
      s_key, d_key = jax.random.split(sk)
      s = jax.random.randint(s_key, (), 0, num_samples)
      mu, var = posterior_one(xs[s], chols[s], x_buf, y_buf, count,
                              cand_x)
      select_idx = _ts_index(mu, var, noise_of(xs[s]), scale, d_key)
    else:
      mu_s, var_s = jax.vmap(
          lambda v, c: posterior_one(v, c, x_buf, y_buf, count, cand_x)
      )(xs, chols)
      mask = jnp.arange(n_max) < count
      target = _acq_param(acq_param_kind, y_buf, mask, count)
      scores = jnp.mean(acq_sub(mu_s, jnp.sqrt(var_s), target), axis=0)
      select_idx = jnp.argmax(scores.flatten())
    x_new = cand_x[select_idx]
    y_new = cand_y[select_idx]
    chols = append_all(xs, chols, x_buf, count, x_new)
    x_buf = jax.lax.dynamic_update_slice(x_buf, x_new[None, :],
                                         (count, 0))
    y_buf = jax.lax.dynamic_update_slice(y_buf, y_new[None, :],
                                         (count, 0))
    return (x_buf, y_buf, chols, xs, count + 1), select_idx

  @jax.jit
  def run(init_arr, x0_obs, y0_obs, cand_x, cand_y, pp, ap, key):
    ik, rk = jax.random.split(key)
    if init_mode == 'samples':
      xs = init_arr
    else:
      jit_keys = jax.random.split(ik, num_samples)
      xs = jax.vmap(
          lambda kk, c: init_arr + jnp.where(c > 0, init_jitter, 0.0)
          * jax.random.normal(kk, init_arr.shape))(
              jit_keys, jnp.arange(num_samples))
    x_buf = jnp.zeros((n_max, cand_x.shape[1]), jnp.float32)
    y_buf = jnp.zeros((n_max, 1), jnp.float32)
    chols = jnp.broadcast_to(chol_ops.init_chol_buffer(n_max),
                             (num_samples, n_max, n_max))
    state = (x_buf, y_buf, chols, xs, jnp.array(0, jnp.int32))

    def seed_one(i, st):
      x_buf, y_buf, chols, xs, count = st
      chols = append_all(xs, chols, x_buf, count, x0_obs[i])
      x_buf = jax.lax.dynamic_update_slice(x_buf, x0_obs[i][None, :],
                                           (count, 0))
      y_buf = jax.lax.dynamic_update_slice(y_buf, y0_obs[i][None, :],
                                           (count, 0))
      return (x_buf, y_buf, chols, xs, count + 1)

    if n_init > 0:
      state = jax.lax.fori_loop(0, n_init, seed_one, state)
    state, select_idx = jax.lax.scan(
        lambda st, a: step(st, a, cand_x, cand_y, pp, ap), state,
        (jnp.arange(iters), jax.random.split(rk, iters)))
    return state[0], state[1], select_idx, state[3]

  _BO_RUNNER_CACHE[cache_key] = (run, mean_func, cov_func, warp_func,
                                 config)
  return run, unravel
