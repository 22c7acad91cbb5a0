"""Pallas VMEM-resident Cholesky base-case kernel.

The blocked recursion in ops/chol.py turns almost all Cholesky FLOPs into
large MXU matmuls; what remains on the critical path are the base-case
panel factorizations. XLA's expander lowers those to a while loop whose
per-iteration state round-trips HBM. This kernel keeps the whole panel
(<= 512 x 512 fp32) in VMEM and runs the classic outer-product column
sweep on the VPU:

  for k in 0..n-1:
    L[k:, k] = A[k:, k] / sqrt(A[k, k])
    A        -= L[., k] L[., k]^T   (rank-1 VPU broadcast update)

Symmetry of the carried A lets both the row (1, n) and column (n, 1)
views of the pivot be sliced directly, so no per-iteration transposes or
relayouts are needed.

Interpret mode keeps the kernel CPU-testable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _chol_panel_kernel(a_ref, out_ref):
  n = a_ref.shape[0]
  a0 = a_ref[:]
  # Symmetrize: the sweep relies on row_k == col_k^T at every step.
  a0 = 0.5 * (a0 + a0.T)
  row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
  col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

  def body(k, carry):
    a, l = carry
    row = jax.lax.dynamic_slice(a, (k, 0), (1, n))      # (1, n)
    col = jax.lax.dynamic_slice(a, (0, k), (n, 1))      # (n, 1)
    akk = jax.lax.dynamic_slice(row, (0, k), (1, 1))    # (1, 1)
    inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
    # k-th column of L, in both layouts, masked below the diagonal.
    lrow = jnp.where(col_idx >= k, row * inv_d, 0.0)    # (1, n)
    lcol = jnp.where(row_idx >= k, col * inv_d, 0.0)    # (n, 1)
    # Accumulate U = L^T row-by-row (row writes are sublane-cheap).
    l = jax.lax.dynamic_update_slice(l, lrow, (k, 0))
    # Rank-1 trailing update; rows/cols <= k are never read again, and
    # the masked lrow/lcol leave them untouched anyway.
    a = a - lcol * lrow
    return (a, l)

  _, u = jax.lax.fori_loop(0, n, body, (a0, jnp.zeros_like(a0)))
  out_ref[:] = u.T


@functools.partial(jax.jit, static_argnames=('interpret',))
def cholesky_panel(a: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
  """Lower Cholesky factor of a single SPD panel (n <= 512, n % 128 == 0
  preferred). Runs fully in VMEM."""
  n = a.shape[-1]
  return pl.pallas_call(
      _chol_panel_kernel,
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      interpret=interpret,
  )(a.astype(jnp.float32))


def cholesky_panel_padded(a: jnp.ndarray, interpret: bool = False,
                          pad_to: int = 128) -> jnp.ndarray:
  """Pad to a multiple of `pad_to` with an identity block, factor, slice."""
  n = a.shape[-1]
  pn = ((n + pad_to - 1) // pad_to) * pad_to
  if pn == n:
    return cholesky_panel(a, interpret=interpret)
  ap = jnp.eye(pn, dtype=jnp.float32).at[:n, :n].set(a)
  return cholesky_panel(ap, interpret=interpret)[:n, :n]
