"""shard_map compat shim for per-shard Pallas kernels.

JAX's replication checker (`check_vma`, formerly `check_rep`) cannot
infer the varying-mesh-axes set through a `pl.pallas_call`, so any
shard_map body that invokes a Pallas kernel (the fused MLL, batched
small-n Cholesky, or the HBM factorization routed via ops.chol) fails
to trace with it enabled. These wrappers disable the check — output
replication is still guaranteed by construction (every replicated
output here is produced by a psum / replicated compute).
"""

from __future__ import annotations

try:
  from jax import shard_map as _shard_map  # JAX >= 0.8
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map as _shard_map


def shard_map_unchecked(f, mesh, in_specs, out_specs):
  """shard_map with the replication checker off (version-portable)."""
  try:
    return _shard_map(f, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
  except TypeError:  # pragma: no cover — older JAX spelling
    return _shard_map(f, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_rep=False)
