"""Adam training loops for GP objectives.

Two paths:

  * `fit_adam`: reference-parity host loop (hyperbo/gp_utils/gp.py:114-157
    semantics — per-step host subsampling, NaN guards that keep the last
    finite parameters, callback hooks) but with the loss, gradient and
    optimizer update fused into ONE jitted step, so each iteration is a
    single device dispatch instead of separate grad/update round trips.

  * `fit_adam_packed`: fully on-device loop — the whole training run is a
    single `lax.scan` over fused steps on packed (padded) task buffers,
    with per-step on-device subsampling. No host sync until the end. This
    is the TPU production path (PD1 pre-training target in BASELINE.md).
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from hyperbo_tpu.models import packed as packed_lib


def _guarded_update(optimizer, loss_fn, model, opt_state, frozen, batch):
  """One Adam update with the on-device NaN-freeze.

  Shared by every scan-based trainer in this module: a non-finite loss
  keeps the previous model/optimizer state and latches `frozen` so all
  remaining steps are no-ops (the on-device equivalent of the reference
  loop's break-on-instability, hyperbo/gp_utils/gp.py:134-141).

  Returns (model, opt_state, frozen, loss).
  """
  loss, grads = jax.value_and_grad(loss_fn)(model, batch)
  updates, new_opt_state = optimizer.update(grads, opt_state)
  new_model = optax.apply_updates(model, updates)
  ok = jnp.isfinite(loss) & ~frozen
  model = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                       new_model, model)
  opt_state = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                           new_opt_state, opt_state)
  return model, opt_state, frozen | ~jnp.isfinite(loss), loss


def fit_adam(loss_fn: Callable[[Dict[str, Any], Any], jnp.ndarray],
             model_params: Dict[str, Any],
             dataset_iter,
             learning_rate: float,
             max_training_step: int,
             callback: Optional[Callable[..., Any]] = None):
  """Host-loop Adam with reference NaN semantics.

  Args:
    loss_fn: (model_params, batch) -> scalar loss.
    model_params: initial trainable pytree.
    dataset_iter: iterator of batches (host-side subsampler).
    learning_rate: Adam learning rate.
    max_training_step: number of steps.
    callback: optional (step, model_params, loss) hook.

  Returns:
    (final_model_params, final_loss): last finite parameters and the loss
    evaluated at them on the final batch.
  """
  optimizer = optax.adam(learning_rate)
  opt_state = optimizer.init(model_params)

  @jax.jit
  def fused_step(model, opt_state, batch):
    loss, grads = jax.value_and_grad(loss_fn)(model, batch)
    updates, new_opt_state = optimizer.update(grads, opt_state)
    new_model = optax.apply_updates(model, updates)
    return loss, new_model, new_opt_state

  kept_params = model_params
  current = model_params
  batch = None
  loss = jnp.nan
  unstable = False
  for i in range(max_training_step):
    batch = next(dataset_iter)
    loss, next_model, next_opt_state = fused_step(current, opt_state, batch)
    loss_val = float(loss)
    if jnp.isnan(loss_val) and i == 0:
      raise ValueError(
          f'Encountered NaN in loss function. current_loss = {loss_val}.')
    if jnp.isfinite(loss_val):
      kept_params = current
    else:
      logging.info('adam stopped at step %d due to instability.', i)
      unstable = True
      break
    current, opt_state = next_model, next_opt_state
    if callback:
      callback(i, kept_params, loss)
  if batch is not None and not unstable:
    # Evaluate the final params through the already-compiled step
    # (update discarded) — a bare loss_fn call here would dispatch the
    # whole multi-task objective op-by-op on the host path. After an
    # instability break the value at `current` is known non-finite, so
    # skip the re-evaluation entirely.
    final_loss, _, _ = fused_step(current, opt_state, batch)
    if jnp.isfinite(float(final_loss)):
      kept_params = current
    return kept_params, final_loss
  return kept_params, loss


def fit_adam_scan(loss_fn: Callable[[Dict[str, Any], Any], jnp.ndarray],
                  model_params: Dict[str, Any],
                  data: Any,
                  subsample_fn: Optional[Callable[[jax.Array, Any],
                                                  Any]],
                  config: Dict[str, Any],
                  key: Optional[jax.Array] = None,
                  callback: Optional[Callable[..., Any]] = None):
  """Whole-training-run-on-device Adam via lax.scan over fused steps.

  Generic core under the packed objectives: `data` is any pytree of
  device buffers; `subsample_fn(key, data)` draws the per-step batch
  (None = full batch). A non-finite loss freezes the parameters for the
  remaining steps (on-device equivalent of the reference's
  break-on-instability).

  With `callback` set (or config['checkpoint_every'] > 0) the run
  executes as K-step compiled chunks — K = checkpoint_every, default
  100 — and `callback(step, model_params, loss)` fires between chunks
  (reference checkpoint semantics, hyperbo/gp_utils/gp.py:145-157,
  at chunk granularity). The scan carry — model, optimizer state, PRNG
  key, freeze flag — threads through the chunks, so a chunked run
  computes EXACTLY the same iterates as one long scan.

  Returns:
    (model_params, losses): trained parameters and the (steps,) trace.
    With return_state=True in `config`, returns
    (model_params, losses, opt_state) so a later call can resume via
    config['opt_state'].
  """
  if key is None:
    key = jax.random.PRNGKey(0)
  optimizer = optax.adam(config['learning_rate'])
  steps = int(config['max_training_step'])

  def step(carry, _):
    model, opt_state, k, frozen = carry
    k, sk = jax.random.split(k)
    batch = subsample_fn(sk, data) if subsample_fn else data
    model, opt_state, frozen, loss = _guarded_update(
        optimizer, loss_fn, model, opt_state, frozen, batch)
    return (model, opt_state, k, frozen), loss

  init_opt_state = config.get('opt_state')
  if init_opt_state is None:
    init_opt_state = optimizer.init(model_params)

  @functools.partial(jax.jit, static_argnums=(1,))
  def run(carry, length):
    return jax.lax.scan(step, carry, None, length=length)

  chunk = int(config.get('checkpoint_every', 0) or 0)
  if chunk <= 0:
    chunk = 100 if callback is not None else steps
  chunk = max(1, min(chunk, steps))

  carry = (model_params, init_opt_state, key, jnp.array(False))
  loss_chunks = []
  done = 0
  while done < steps:
    length = min(chunk, steps - done)
    carry, losses = run(carry, length)
    loss_chunks.append(losses)
    done += length
    if callback is not None and done < steps:
      callback(done, carry[0], losses[-1])
  model, opt_state, _, _ = carry
  losses = jnp.concatenate(loss_chunks) if len(loss_chunks) > 1 else (
      loss_chunks[0])
  if callback is not None:
    callback(steps, model, losses[-1])
  if config.get('return_state'):
    return model, losses, opt_state
  return model, losses


def make_fit_adam_scan(loss_fn: Callable[[Dict[str, Any], Any],
                                         jnp.ndarray],
                       subsample_fn: Optional[Callable[[jax.Array, Any],
                                                       Any]],
                       config: Dict[str, Any]):
  """Reusable compiled analog of `fit_adam_scan`: compile once, train many.

  `fit_adam_scan` wraps its scan in a fresh `jax.jit` per call, so a
  loop that retrains repeatedly on same-shaped data (the BO retrain
  path, reference hyperbo/bo_utils/bayesopt.py:60-75, re-fits the GP
  every iteration) pays the full host retrace each time — measured ~6 s
  per call at PD1 scale against sub-second device time (PERF.md). This
  factory returns ONE jitted `run(model_params, data, key) ->
  (model_params, losses)` shared across all same-shaped calls.

  Semantics match `fit_adam_scan` (per-step subsample, NaN-freeze)
  except: no callbacks/checkpointing, no opt_state resume, and the
  per-step PRNG keys are pre-split from `key` rather than threaded
  through the carry (same distributional semantics, different draws).
  Callers needing those features should use `fit_adam_scan`.
  """
  optimizer = optax.adam(config['learning_rate'])
  steps = int(config['max_training_step'])

  @jax.jit
  def run(model, data, key):
    def step(carry, k):
      model, opt_state, frozen = carry
      batch = subsample_fn(k, data) if subsample_fn else data
      model, opt_state, frozen, loss = _guarded_update(
          optimizer, loss_fn, model, opt_state, frozen, batch)
      return (model, opt_state, frozen), loss

    carry = (model, optimizer.init(model), jnp.array(False))
    (model, _, _), losses = jax.lax.scan(step, carry,
                                         jax.random.split(key, steps))
    return model, losses

  return run


def fit_adam_packed(mean_func,
                    cov_func,
                    model_params: Dict[str, Any],
                    packed: packed_lib.PackedDataset,
                    config: Dict[str, Any],
                    warp_func=None,
                    key: Optional[jax.Array] = None,
                    loss_fn: Optional[Callable] = None,
                    in_shardings=None):
  """On-device Adam over packed multi-task NLL (see fit_adam_scan).

  Args:
    mean_func / cov_func: GP mean/kernel functions.
    model_params: initial trainable pytree.
    packed: PackedDataset of training tasks.
    config: needs learning_rate, max_training_step, batch_size.
    warp_func: parameter warping.
    key: PRNG key for per-step subsampling.
    loss_fn: optional override (model, packed_batch) -> scalar; defaults
      to the packed multi-task NLL with `config` via a GPParams shim.
    in_shardings: optional sharding for `packed` (mesh task-sharding).

  Returns:
    (model_params, losses): trained parameters and the (steps,) trace.
  """
  from hyperbo_tpu.core import defs  # local import to avoid cycle

  batch_size = int(config.get('batch_size', packed.x.shape[1]))
  if in_shardings is not None and 'batched_chol' not in config:
    # GSPMD cannot partition a pallas_call: under task sharding the
    # auto-routed batched-chol kernel would force replication (or fail
    # to partition) where the vmapped XLA pipeline shards cleanly.
    # Explicit user settings are honored; only the auto-route is off.
    config = dict(config, batched_chol=False)
  if loss_fn is None:
    def loss_fn(model, batch):
      shim = defs.GPParams(model=model, config=config)
      return packed_lib.neg_log_marginal_likelihood_packed(
          mean_func, cov_func, shim, batch, warp_func=warp_func)

  if in_shardings is not None:
    packed = jax.device_put(packed, in_shardings)

  # 'fast_subsample': O(1) sliding-window batches over pre-permuted rows
  # (epoch-style SGD) instead of a fresh iid subset per step (reference
  # semantics). Only when every task can fill a batch.
  if (config.get('fast_subsample', False) and
      int(jnp.min(jnp.where(packed.task_mask, packed.count,
                            jnp.iinfo(jnp.int32).max))) >= batch_size):
    if key is None:
      key = jax.random.PRNGKey(0)
    key, pkey = jax.random.split(key)
    packed = packed_lib.prepermute_packed(pkey, packed)

    def subsample(k, data):
      return packed_lib.subsample_packed_window(k, data, batch_size)
  else:
    def subsample(k, data):
      return packed_lib.subsample_packed(k, data, batch_size)

  return fit_adam_scan(loss_fn, model_params, packed, subsample, config,
                       key)


def make_fit_adam_packed(mean_func,
                         cov_func,
                         config: Dict[str, Any],
                         warp_func=None,
                         loss_fn: Optional[Callable] = None):
  """Reusable compiled packed-Adam runner: compile once, train many.

  `fit_adam_packed` builds a fresh `jax.jit` wrapper per call, so every
  invocation re-traces and re-lowers the whole training program —
  measured ~6 s of host work per run at PD1 scale against ~0.34 s of
  actual device time (PERF.md, r3_pd1_step_probe). Production
  pre-training sweeps (restarts, workload sets, hyperparameter grids)
  re-run the same program shape many times; this factory returns ONE
  jitted runner whose compilation is shared across all calls with
  matching shapes.

  The runner signature is `run(model_params, packed, key) ->
  (model_params, losses)` with semantics identical to
  `fit_adam_packed` (per-step on-device subsampling, NaN-freeze); with
  config['fast_subsample'] the one-time row permutation also happens
  inside the compiled program, keyed by `key`. Unlike
  `fit_adam_packed`'s concrete-value gate, fast_subsample is honored
  as given — the window sampler itself handles tasks smaller than the
  batch (offset 0 + row mask), so no data-dependent Python branch is
  needed.

  Args:
    mean_func / cov_func: GP mean/kernel functions.
    config: needs learning_rate, max_training_step; optional
      batch_size (defaults to the packed width at trace time) and
      fast_subsample.
    warp_func: parameter warping.
    loss_fn: optional override (model, packed_batch) -> scalar.

  Returns:
    The jitted runner.
  """
  from hyperbo_tpu.core import defs  # local import to avoid cycle

  optimizer = optax.adam(config['learning_rate'])
  steps = int(config['max_training_step'])
  batch_size_cfg = config.get('batch_size')
  fast = bool(config.get('fast_subsample', False))

  if loss_fn is None:
    def loss_fn(model, batch):
      shim = defs.GPParams(model=model, config=config)
      return packed_lib.neg_log_marginal_likelihood_packed(
          mean_func, cov_func, shim, batch, warp_func=warp_func)

  @jax.jit
  def run(model, packed, key):
    batch_size = int(batch_size_cfg or packed.x.shape[1])
    if fast:
      key, pkey = jax.random.split(key)
      packed_run = packed_lib.prepermute_packed(pkey, packed)
      def subsample(k, data):
        return packed_lib.subsample_packed_window(k, data, batch_size)
    else:
      packed_run = packed
      def subsample(k, data):
        return packed_lib.subsample_packed(k, data, batch_size)

    def step(carry, k):
      model, opt_state, frozen = carry
      batch = subsample(k, packed_run)
      model, opt_state, frozen, loss = _guarded_update(
          optimizer, loss_fn, model, opt_state, frozen, batch)
      return (model, opt_state, frozen), loss

    carry = (model, optimizer.init(model), jnp.array(False))
    (model, _, _), losses = jax.lax.scan(step, carry,
                                         jax.random.split(key, steps))
    return model, losses

  return run


def fit_adam_packed_multistart(mean_func,
                               cov_func,
                               model_params: Dict[str, Any],
                               packed: packed_lib.PackedDataset,
                               config: Dict[str, Any],
                               warp_func=None,
                               key: Optional[jax.Array] = None,
                               num_restarts: int = 4,
                               perturb_scale: float = 1.0,
                               loss_fn: Optional[Callable] = None,
                               callback: Optional[Callable[..., Any]] = None):
  """Multi-start Adam: R random restarts trained in ONE vmapped scan.

  The restart axis rides on top of the task-batched factorizations —
  R x T Gram+Cholesky per step, all on the MXU — so R restarts cost one
  compiled program, not R sequential runs. The restart with the best
  final objective wins (evaluated on the full packed set).

  With `callback` set (or config['checkpoint_every'] > 0) the vmapped
  scan runs as K-step compiled chunks and
  `callback(step, best_model_so_far, best_loss_so_far)` fires between
  chunks with the RUNNING-BEST restart (full-packed-set objective), so
  checkpointing composes with multistart instead of excluding it. The
  stacked carry threads through the chunks — a chunked run computes
  exactly the same per-restart iterates as one long scan.

  Args:
    num_restarts: total starts, including the unperturbed init.
    perturb_scale: stddev of the additive Gaussian perturbation applied
      to each (unconstrained) parameter leaf for restarts 1..R-1.
    callback: optional (step, model_params, loss) chunk hook.

  Returns:
    (best_model, best_loss, all_final_losses).
  """
  from hyperbo_tpu.core import defs  # local import to avoid cycle

  if key is None:
    key = jax.random.PRNGKey(0)
  lr = config['learning_rate']
  steps = int(config['max_training_step'])
  batch_size = int(config.get('batch_size', packed.x.shape[1]))

  if loss_fn is None:
    def loss_fn(model, batch):
      shim = defs.GPParams(model=model, config=config)
      return packed_lib.neg_log_marginal_likelihood_packed(
          mean_func, cov_func, shim, batch, warp_func=warp_func)

  optimizer = optax.adam(lr)

  key, pkey = jax.random.split(key)
  leaves, treedef = jax.tree.flatten(model_params)
  pkeys = jax.random.split(pkey, len(leaves))

  def stack_leaf(leaf, k):
    leaf = jnp.asarray(leaf, jnp.float32)
    noise = perturb_scale * jax.random.normal(
        k, (num_restarts,) + leaf.shape)
    noise = noise.at[0].set(0.0)  # restart 0 keeps the given init
    return leaf[None] + noise

  stacked = jax.tree.unflatten(
      treedef, [stack_leaf(l, k) for l, k in zip(leaves, pkeys)])

  def step(carry, _):
    model, opt_state, k, frozen = carry
    k, sk = jax.random.split(k)
    batch = packed_lib.subsample_packed(sk, packed, batch_size)
    model, opt_state, frozen, loss = _guarded_update(
        optimizer, loss_fn, model, opt_state, frozen, batch)
    return (model, opt_state, k, frozen), loss

  @functools.partial(jax.jit, static_argnums=(1,))
  def run_chunk(carry, length):
    def one(model, opt_state, k, frozen):
      return jax.lax.scan(step, (model, opt_state, k, frozen), None,
                          length=length)[0]
    return jax.vmap(one)(*carry)

  @jax.jit
  def eval_best(models):
    finals = jax.vmap(lambda m: loss_fn(m, packed))(models)
    finals = jnp.where(jnp.isfinite(finals), finals, jnp.inf)
    best = jnp.argmin(finals)
    return jax.tree.map(lambda x: x[best], models), finals[best], finals

  chunk = int(config.get('checkpoint_every', 0) or 0)
  if chunk <= 0:
    chunk = 100 if callback is not None else steps
  chunk = max(1, min(chunk, steps))

  opt_states = jax.vmap(optimizer.init)(stacked)
  keys = jax.random.split(key, num_restarts)
  frozen = jnp.zeros((num_restarts,), bool)
  carry = (stacked, opt_states, keys, frozen)
  done = 0
  while done < steps:
    carry = run_chunk(carry, min(chunk, steps - done))
    done += min(chunk, steps - done)
    if callback is not None and done < steps:
      best_model, best_loss, _ = eval_best(carry[0])
      callback(done, best_model, best_loss)
  best_model, best_loss, finals = eval_best(carry[0])
  if callback is not None:
    callback(steps, best_model, best_loss)
  return best_model, best_loss, finals
