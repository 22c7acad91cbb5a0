"""Mesh-distributed large-n GP marginal likelihood.

For n beyond one chip's comfort (BASELINE.md configs[4]: n=16384 Gram +
blocked Cholesky), the pipeline shards over the mesh:

  * the Gram matrix is built in row-block shards — each device computes
    its (n/P x n) block from its slice of x against the all-gathered x
    (shard_map; O(n d) ICI traffic),
  * the factorization runs through the block-cyclic distributed
    Cholesky (parallel.distributed_chol; O(n^2) ICI traffic),
  * logdet + quadratic form close out on the replicated factor.

On a single chip everything degenerates to the dense path (and n=16384
fits one v5e: 104 ms measured, PERF.md). This module exists for the
multi-chip regime and is validated against the dense pipeline on the
virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
  from jax import shard_map  # JAX >= 0.8
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map

from hyperbo_tpu.core.warp import retrieve_params
from hyperbo_tpu.ops import chol as chol_ops
from hyperbo_tpu.parallel import distributed_chol


def gram_rowsharded(cov_func, params, x, mesh: Mesh, warp_func=None,
                    axis_name: str = 'task') -> jnp.ndarray:
  """K(x, x) with row blocks computed shard-locally.

  Each device holds an (n/P, d) slice of x, all-gathers the full x once,
  and emits its (n/P, n) row block of the Gram matrix. Returns the
  row-sharded (n, n) matrix. Requires n % P == 0.
  """
  num = mesh.shape[axis_name]
  n = x.shape[0]
  assert n % num == 0, (n, num)
  x_sharded = jax.device_put(x, NamedSharding(mesh, P(axis_name)))

  def block(x_local):
    x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)
    return cov_func(params, x_local, x_full, warp_func=warp_func)

  return shard_map(block, mesh=mesh, in_specs=P(axis_name),
                   out_specs=P(axis_name))(x_sharded)


def mll_distributed(mean_func, cov_func, params, x, y, mesh: Mesh,
                    warp_func=None, block: int = 256,
                    axis_name: str = 'task', eps: float = 1e-6,
                    panel_solver: str = 'winv'):
  """Negative log marginal likelihood of one large task over a mesh.

  Same value as the dense per-task NLL (reference formula,
  hyperbo/gp_utils/objectives.py:144-156): Gram row-sharded, factorized
  with the distributed block-cyclic Cholesky (solve-free winv panels by
  default; ops.chol routing applies to the per-step diagonal blocks, so
  large-block runs factorize them through the Pallas HBM kernel), then
  logdet + quadratic form on the replicated factor.
  """
  noise_variance, = retrieve_params(params, ['noise_variance'],
                                    warp_func=warp_func)
  n = x.shape[0]
  kmat = gram_rowsharded(cov_func, params, x, mesh, warp_func=warp_func,
                         axis_name=axis_name)
  kmat = kmat + jnp.eye(n, dtype=kmat.dtype) * (noise_variance + eps)
  chol = distributed_chol.distributed_cholesky(
      kmat, mesh, block=block, axis_name=axis_name,
      panel_solver=panel_solver)
  delta = y - jnp.atleast_2d(mean_func(params, x, warp_func=warp_func))
  kinvy = chol_ops.cho_solve(chol, delta)
  # Joint NLL of m independent draws: trace(delta^T K^{-1} delta), with
  # the logdet and 2pi terms counted once per draw. (The host per-task
  # path keeps the reference's sum-over-(m, m) form for parity — for
  # m = 1 the two coincide; this new entry point uses the correct
  # multi-draw form.)
  m = delta.shape[1]
  quad = jnp.sum(delta * kinvy)
  logdet_half = jnp.sum(jnp.log(jnp.diagonal(chol)))
  return 0.5 * quad + m * (logdet_half + 0.5 * n * jnp.log(2 * jnp.pi))
