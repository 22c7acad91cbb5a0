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


def fit_adam_packed_sharded(mean_func, cov_func, model_params, packed,
                            config, mesh: Mesh, warp_func=None, key=None,
                            axis_name: str = 'task'):
  """Task-sharded on-device Adam pre-training over a mesh.

  The packed buffers are placed task-sharded; parameters/optimizer state
  stay replicated. The lax.scan training loop from train.adam runs
  unchanged — GSPMD partitions the per-task batched factorization and
  inserts gradient psums.
  """
  from hyperbo_tpu.train import adam as adam_lib
  sharding = NamedSharding(mesh, P(axis_name))
  return adam_lib.fit_adam_packed(
      mean_func, cov_func, model_params, packed, config,
      warp_func=warp_func, key=key, in_shardings=sharding)


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
