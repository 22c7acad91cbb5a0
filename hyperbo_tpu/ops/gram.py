"""TPU-native Gram (kernel) matrix construction.

The reference builds Gram matrices with a nested `vmap` over a scalar kernel
(hyperbo/gp_utils/kernel.py:53), which materializes O(n^2) scalar lambda
applications and keeps the FLOPs off the MXU. Here the pairwise squared
distances are computed with one rank-d matmul plus row norms::

    ||a - b||^2 = ||a||^2 + ||b||^2 - 2 a.b

which XLA tiles onto the MXU and into whose epilogue it fuses the kernel
transform (exp / polynomial). Inputs are centered first so the cancellation
error of the matmul form stays small even for tiny lengthscales.

All distance matmuls run at HIGHEST precision (fp32-equivalent via bf16x6
passes on the MXU) by default; override with `set_matmul_precision`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Precision for the distance / inner-product matmuls. HIGHEST keeps fp32
# accuracy on the MXU; callers chasing throughput on well-conditioned
# problems can relax it.
_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(precision):
  """Set the lax.Precision used by Gram-matrix matmuls."""
  global _MATMUL_PRECISION
  _MATMUL_PRECISION = precision
  # Trace-time global: invalidate compiled callers (see
  # chol._invalidate_compiled_routes for the rationale).
  from hyperbo_tpu.ops import chol as _chol
  _chol._invalidate_compiled_routes()


def get_matmul_precision():
  return _MATMUL_PRECISION


def sqdist(x1: jnp.ndarray, x2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Pairwise squared Euclidean distances, n1 x n2, via MXU matmul.

  Args:
    x1: n1 x d array.
    x2: n2 x d array, or None for x2 = x1 (in which case the diagonal is
      exactly zero).

  Returns:
    n1 x n2 matrix of squared distances, clamped to >= 0.
  """
  symmetric = x2 is None
  if symmetric:
    center = jnp.mean(x1, axis=0, keepdims=True)
    x1c = x1 - center
    x2c = x1c
  else:
    # Center by the pooled mean: translation leaves distances unchanged but
    # shrinks the norms whose difference the matmul form computes.
    n1, n2 = x1.shape[0], x2.shape[0]
    denom = jnp.maximum(n1 + n2, 1)
    center = (jnp.sum(x1, axis=0, keepdims=True) +
              jnp.sum(x2, axis=0, keepdims=True)) / denom
    x1c = x1 - center
    x2c = x2 - center
  r1 = jnp.sum(x1c * x1c, axis=-1)[:, None]
  r2 = r1.T if symmetric else jnp.sum(x2c * x2c, axis=-1)[None, :]
  inner = jnp.dot(x1c, x2c.T, precision=_MATMUL_PRECISION)
  d2 = jnp.maximum(r1 + r2 - 2.0 * inner, 0.0)
  if symmetric:
    # Exact zeros on the diagonal (self-distance).
    n = x1.shape[0]
    d2 = d2 * (1.0 - jnp.eye(n, dtype=d2.dtype))
  return d2


def sqdist_direct(x1: jnp.ndarray,
                  x2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Exact elementwise pairwise squared distances (O(n^2 d) memory).

  Reference-faithful computation used for small problems and as the
  numerical oracle in tests.
  """
  if x2 is None:
    x2 = x1
  diff = x1[:, None, :] - x2[None, :, :]
  return jnp.sum(diff * diff, axis=-1)


def inner_product(x1: jnp.ndarray,
                  x2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Pairwise inner products x1 @ x2.T on the MXU."""
  if x2 is None:
    x2 = x1
  return jnp.dot(x1, x2.T, precision=_MATMUL_PRECISION)
