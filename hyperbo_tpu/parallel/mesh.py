"""Device-mesh utilities and sharded GP pre-training / BO scoring.

The reference is single-device (SURVEY.md section 2 rows 22-24: no
parallelism or communication backend exists). This module adds the
TPU-native scale-out path:

  * multi-task NLL pre-training: the task axis of the packed dataset is
    sharded over the mesh ('task' axis). Per-task Gram+Cholesky+solves are
    embarrassingly parallel; XLA inserts one psum for the scalar loss and
    one psum for the parameter gradients (both ride ICI).
  * BO candidate scoring: the candidate axis is sharded; each device
    scores its slice against replicated observation state, followed by a
    global argmax.

All of it is plain jit + NamedSharding: the same code runs on 1 chip, a
v5e-8 slice, or the CPU virtual mesh used in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperbo_tpu.models import packed as packed_lib
from hyperbo_tpu.parallel._smap import shard_map_unchecked


def create_mesh(n_devices: Optional[int] = None,
                axis_name: str = 'task') -> Mesh:
  """1-D mesh over the first n devices (default: all)."""
  devices = jax.devices()
  if n_devices is not None:
    if len(devices) < n_devices:
      raise ValueError(
          f'Requested {n_devices} devices but only {len(devices)} present.')
    devices = devices[:n_devices]
  return Mesh(np.asarray(devices), (axis_name,))


def shard_packed(packed: packed_lib.PackedDataset,
                 mesh: Mesh,
                 axis_name: str = 'task') -> packed_lib.PackedDataset:
  """Place a PackedDataset with its leading (task) axis sharded."""
  sharding = NamedSharding(mesh, P(axis_name))
  return jax.device_put(packed, sharding)


def pad_tasks_for_mesh(dataset, mesh: Mesh, axis_name: str = 'task',
                       pad_to_multiple: int = 8):
  """pack_dataset with T rounded up to the mesh axis size."""
  return packed_lib.pack_dataset(
      dataset, pad_to_multiple=pad_to_multiple,
      num_tasks_multiple=mesh.shape[axis_name])


def make_packed_loss_sharded(mean_func, cov_func, config, mesh: Mesh,
                             warp_func=None, axis_name: str = 'task'):
  """Packed multi-task NLL as an explicit shard_map task-DP program.

  GSPMD cannot partition a pallas_call, so under plain NamedSharding the
  fused Pallas MLL kernel (and the batched small-n kernel) would force
  an all-gather back to one device — the auto-sharded trainer had to
  fall back to the plain-XLA vmapped pipeline. This loss instead shards
  the task axis EXPLICITLY: each device evaluates its local task shard
  through the full route table (fused Pallas kernel included, it is a
  single-device program inside shard_map), and two psums (NLL sum +
  valid-task count) ride ICI. Hyperprior terms are replicated and added
  once outside the psum.

  Value/grad match `neg_log_marginal_likelihood_packed` on the same
  packed batch exactly (same per-task route, same mean normalization).

  Args:
    mean_func / cov_func: GP mean/kernel functions.
    config: objective config (fused_mll / batched_chol routing, priors).
    mesh: 1-D device mesh; the packed task axis must divide its size
      (pad_tasks_for_mesh arranges this).
    warp_func: parameter warping.
    axis_name: mesh axis to shard tasks over.

  Returns:
    loss_fn(model, packed_batch) -> scalar, jit/grad-compatible.
  """
  from hyperbo_tpu.core import defs  # local import to avoid cycle

  def local(model, batch):
    shim = defs.GPParams(model=model, config=config)
    per_task = packed_lib.per_task_nll_packed(
        mean_func, cov_func, shim, batch, warp_func=warp_func)
    per_task = jnp.where(batch.task_mask, per_task, 0.0)
    total = jax.lax.psum(jnp.sum(per_task), axis_name)
    num = jax.lax.psum(jnp.sum(batch.task_mask.astype(jnp.int32)),
                       axis_name)
    return total / jnp.maximum(num, 1)

  smapped = shard_map_unchecked(local, mesh=mesh,
                                in_specs=(P(), P(axis_name)),
                                out_specs=P())

  def loss_fn(model, batch):
    shim = defs.GPParams(model=model, config=config)
    return smapped(model, batch) + packed_lib.prior_nll_terms(
        shim, warp_func)

  return loss_fn


def make_ekl_loss_sharded(mean_func, cov_func, config, mesh: Mesh,
                          warp_func=None, axis_name: str = 'task',
                          partial: bool = True, eps: float = 0.0):
  """Mean EKL over a task-sharded PackedAlignedDataset (shard_map).

  The empirical-KL objective (reference
  hyperbo/gp_utils/objectives.py:29-101: sample-MVN vs model-MVN
  divergence per aligned task) as an explicit task-DP program: each
  device evaluates the masked partial/full KL on its local task shard
  (models/packed._{partial,full}_kl_one_task) and two psums (KL sum +
  valid-task count) ride ICI. Value/grad match
  `multivariate_normal_divergence_packed` on the same aligned batch.

  Returns:
    loss_fn(model, aligned_batch) -> scalar, jit/grad-compatible.
  """
  from hyperbo_tpu.core import defs  # local import to avoid cycle

  def local(model, batch):
    shim = defs.GPParams(model=model, config=config)
    per_task = packed_lib.per_task_divergence_packed(
        mean_func, cov_func, shim, batch, warp_func=warp_func,
        partial=partial, eps=eps)
    per_task = jnp.where(batch.task_mask, per_task, 0.0)
    total = jax.lax.psum(jnp.sum(per_task), axis_name)
    num = jax.lax.psum(jnp.sum(batch.task_mask.astype(jnp.int32)),
                       axis_name)
    return total / jnp.maximum(num, 1)

  return shard_map_unchecked(local, mesh=mesh,
                             in_specs=(P(), P(axis_name)),
                             out_specs=P())


def make_nll_ekl_loss_sharded(mean_func, cov_func, config, mesh: Mesh,
                              ekl_weight: float, warp_func=None,
                              axis_name: str = 'task',
                              partial: bool = True, eps: float = 0.0):
  """Composite NLL + c·EKL objective, both terms task-sharded.

  The HBO_NLLKL method family (reference
  hyperbo/gp_utils/objectives.py:213-246: `add(nll, mul(c, regkl))`)
  on the mesh: the NLL rides `make_packed_loss_sharded` (fused Pallas
  kernels shard-local), the EKL rides `make_ekl_loss_sharded`, and the
  two packed batches shard independently over the same task axis.

  Returns:
    loss_fn(model, packed_batch, aligned_batch) -> scalar. Pass
    aligned_batch=None to drop the EKL term (plain sharded NLL).
  """
  nll_fn = make_packed_loss_sharded(mean_func, cov_func, config, mesh,
                                    warp_func=warp_func,
                                    axis_name=axis_name)
  ekl_fn = make_ekl_loss_sharded(mean_func, cov_func, config, mesh,
                                 warp_func=warp_func,
                                 axis_name=axis_name, partial=partial,
                                 eps=eps)

  def loss_fn(model, packed_batch, aligned_batch=None):
    total = nll_fn(model, packed_batch)
    if aligned_batch is not None and ekl_weight:
      total = total + ekl_weight * ekl_fn(model, aligned_batch)
    return total

  return loss_fn


def fit_adam_packed_sharded(mean_func, cov_func, model_params, packed,
                            config, mesh: Mesh, warp_func=None, key=None,
                            axis_name: str = 'task',
                            use_shard_map: bool = True):
  """Task-sharded on-device Adam pre-training over a mesh.

  The packed buffers are placed task-sharded; parameters/optimizer state
  stay replicated. The lax.scan training loop from train.adam runs
  unchanged. By default the loss is the explicit shard_map program from
  `make_packed_loss_sharded`, so each device runs the fused Pallas MLL
  (or batched-chol) kernel on its own task shard; with
  use_shard_map=False the legacy GSPMD auto-sharding path is used
  (plain-XLA pipeline only — pallas_calls cannot be partitioned).
  """
  from hyperbo_tpu.train import adam as adam_lib
  sharding = NamedSharding(mesh, P(axis_name))
  loss_fn = None
  if use_shard_map:
    loss_fn = make_packed_loss_sharded(
        mean_func, cov_func, config, mesh, warp_func=warp_func,
        axis_name=axis_name)
  return adam_lib.fit_adam_packed(
      mean_func, cov_func, model_params, packed, config,
      warp_func=warp_func, key=key, loss_fn=loss_fn,
      in_shardings=sharding)


def score_candidates_sharded(score_fn, cand_x, mesh: Mesh,
                             axis_name: str = 'task'):
  """Evaluate score_fn over candidates sharded across the mesh.

  Args:
    score_fn: (n, d) -> (n, 1) acquisition scores (pure function of the
      candidate block; observation state must be closed over, replicated).
    cand_x: (n, d) candidates; n should divide the mesh axis size.
    mesh: device mesh.
    axis_name: mesh axis to shard candidates over.

  Returns:
    (best_idx, scores): global argmax index and the full score vector.
  """
  sharding = NamedSharding(mesh, P(axis_name))
  cand_x = jax.device_put(cand_x, sharding)

  @jax.jit
  def run(cand_x):
    scores = score_fn(cand_x)
    return jnp.argmax(scores.flatten()), scores

  return run(cand_x)
