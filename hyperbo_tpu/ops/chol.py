"""Cholesky factorization and triangular solves (TPU-first).

The O(n^3) Cholesky + solve pipeline is the bottom of every GP call stack
(reference call stacks: SURVEY.md section 3). `cholesky` defaults to
XLA's built-in blocked factorization — measured fastest in the scanned
pipelines (PERF.md) — with three research paths behind flags:

  * set_use_recursive: explicit 2x2 block recursion whose Schur updates
    run as large MXU matmuls at a configurable dot algorithm
    (set_schur_precision; default BF16_X3, fp32-faithful);
  * set_use_pallas_base: VMEM-resident Pallas panel kernel for the
    recursion's base cases (ops/pallas_chol.py);
  * set_use_hbm_kernel: single-kernel HBM-streaming factorization
    (ops/pallas_chol_hbm.py), 14.6 ms vs XLA 16.2 ms at n=8192 on v5e.

`solve_triangular` / `cho_solve` wrap lax.linalg.triangular_solve (XLA
lowers them to blocked inverted-diagonal matmuls); `chol_append*` are the
O(n^2) rank-1 factor extensions used by the BO loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Below this size, the base-case factorization is used directly.
_BASE_BLOCK = 512
# Matmul precision for Schur updates. BF16_6X is bitwise fp32-faithful;
# BF16_3X keeps ~2^-21 relative error (ample for SPD Schur complements
# against the 1e-6 jitter) at roughly 2x the throughput. Configurable via
# set_schur_precision for accuracy-critical callers.
try:
  _PRECISION = lax.DotAlgorithmPreset.BF16_BF16_F32_X3
except AttributeError:  # older JAX
  _PRECISION = lax.Precision.HIGHEST


def _invalidate_compiled_routes():
  """Routing/precision globals are read at TRACE time: a jitted caller
  compiled before a set_* call would silently keep the old route on a
  cache hit. Setters drop the compilation caches so the next call
  re-traces with the new configuration (setters are bench/experiment
  knobs — recompilation cost is acceptable there)."""
  jax.clear_caches()


def set_schur_precision(precision):
  """Override the dot precision/algorithm used by Schur updates."""
  global _PRECISION
  _PRECISION = precision
  _invalidate_compiled_routes()


# Use the Pallas VMEM-resident panel kernel for base cases on TPU
# (ops/pallas_chol.py). Toggled by set_use_pallas_base; default off until
# profiled faster than the XLA expander on the target chip.
_USE_PALLAS_BASE = False


def set_use_pallas_base(value: bool):
  """Route base-case factorizations through the Pallas panel kernel."""
  global _USE_PALLAS_BASE
  _USE_PALLAS_BASE = bool(value)
  _invalidate_compiled_routes()


def _xla_cholesky(a):
  if _USE_PALLAS_BASE and a.ndim == 2 and a.shape[-1] <= 512:
    from hyperbo_tpu.ops import pallas_chol
    interpret = jax.devices()[0].platform == 'cpu'
    return pallas_chol.cholesky_panel_padded(a, interpret=interpret)
  return lax.linalg.cholesky(a, symmetrize_input=False)


def _blocked_cholesky(a: jnp.ndarray, base_block: int) -> jnp.ndarray:
  """Recursive blocked Cholesky; `a` is (..., n, n) SPD, returns lower L."""
  n = a.shape[-1]
  # Base case must cover any n the split below cannot halve (the split
  # point is always >= 128, so recursion requires n > 256).
  if n <= max(base_block, 256):
    return _xla_cholesky(a)
  # Split point: half, rounded to a multiple of 128 for MXU-aligned tiles.
  k = max(128, (n // 2 // 128) * 128)
  a11 = a[..., :k, :k]
  a21 = a[..., k:, :k]
  a22 = a[..., k:, k:]
  l11 = _blocked_cholesky(a11, base_block)
  # L21 @ L11^T = A21  =>  right-side solve against L11^T.
  l21 = lax.linalg.triangular_solve(
      l11, a21, left_side=False, lower=True, transpose_a=True)
  s22 = a22 - jnp.matmul(l21, jnp.swapaxes(l21, -1, -2),
                         precision=_PRECISION)
  l22 = _blocked_cholesky(s22, base_block)
  top = jnp.concatenate(
      [l11, jnp.zeros(a.shape[:-2] + (k, n - k), a.dtype)], axis=-1)
  bot = jnp.concatenate([l21, l22], axis=-1)
  return jnp.concatenate([top, bot], axis=-2)


@functools.partial(jax.jit, static_argnames=('base_block',))
def _blocked_cholesky_jit(a, base_block):
  return _blocked_cholesky(a, base_block)


# Measured on TPU v5e (n=8192 fp32): XLA's built-in blocked factorization
# runs at 16.2 ms vs 17.6 ms for the explicit recursion (X3 Schur updates)
# — its expander already keeps the sequential panel chain tight, so the
# default routes everything through XLA. The recursion and the Pallas
# panel kernels remain available for research via the flags below.
_USE_RECURSIVE = False
# Route large single (unbatched) factorizations through the single-kernel
# HBM-streaming Pallas implementation (ops/pallas_chol_hbm.py) — measured
# 14.6 ms vs XLA's 16.2 ms at n=8192 fp32 on v5e, at ~1.8e-4 max abs
# deviation (the below-panel solve runs through an explicit triangular
# inverse). Opt-in until the accuracy/perf trade is the caller's call.
_USE_HBM_KERNEL = False


def set_use_recursive(value: bool):
  """Route large factorizations through the explicit blocked recursion."""
  global _USE_RECURSIVE
  _USE_RECURSIVE = bool(value)
  _invalidate_compiled_routes()


def set_use_hbm_kernel(value: bool):
  """Route large factorizations through the Pallas HBM-streaming kernel."""
  global _USE_HBM_KERNEL
  _USE_HBM_KERNEL = bool(value)
  _invalidate_compiled_routes()


def cholesky(a: jnp.ndarray, base_block: int = _BASE_BLOCK) -> jnp.ndarray:
  """Lower Cholesky factor of an SPD matrix (..., n, n)."""
  n = a.shape[-1]
  if _USE_HBM_KERNEL and a.ndim == 2 and n >= 1024 and n % 512 == 0:
    from hyperbo_tpu.ops import pallas_chol_hbm
    interpret = jax.devices()[0].platform == 'cpu'
    return pallas_chol_hbm.cholesky_hbm(a, interpret=interpret)
  if _USE_RECURSIVE and n > base_block:
    return _blocked_cholesky(a, base_block)
  return _xla_cholesky(a)


def solve_triangular(a: jnp.ndarray,
                     b: jnp.ndarray,
                     lower: bool = True,
                     trans: int = 0) -> jnp.ndarray:
  """Solve a x = b (trans=0) or a^T x = b (trans=1) with triangular a."""
  b2 = b[..., None] if b.ndim == a.ndim - 1 else b
  out = lax.linalg.triangular_solve(
      a, b2, left_side=True, lower=lower, transpose_a=bool(trans))
  return out[..., 0] if b.ndim == a.ndim - 1 else out


def cho_solve(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  """Solve K x = b given the lower Cholesky factor of K."""
  z = solve_triangular(chol, b, lower=True, trans=0)
  return solve_triangular(chol, z, lower=True, trans=1)


def logdet_from_chol(chol: jnp.ndarray) -> jnp.ndarray:
  """log det K = 2 * sum(log(diag(L)))."""
  diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
  return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def chol_append(chol: jnp.ndarray, k_vec: jnp.ndarray,
                kappa: jnp.ndarray) -> jnp.ndarray:
  """Grow a Cholesky factor by one row/column in O(n^2).

  Given L with L L^T = K (n x n), the factor of
  [[K, k], [k^T, kappa]] is [[L, 0], [w^T, sqrt(kappa - w^T w)]] with
  w = L^{-1} k. This replaces the reference's full refactorization on every
  BO append (reference TODO at hyperbo/gp_utils/gp.py:284).

  Args:
    chol: n x n lower factor.
    k_vec: n-vector of cross covariances (or n x 1).
    kappa: scalar self covariance (incl. noise/jitter).

  Returns:
    (n+1) x (n+1) lower factor.
  """
  n = chol.shape[-1]
  k_vec = k_vec.reshape(n)
  w = solve_triangular(chol, k_vec, lower=True, trans=0)
  d = jnp.sqrt(jnp.maximum(kappa - jnp.dot(w, w), 1e-12))
  out = jnp.zeros((n + 1, n + 1), chol.dtype)
  out = out.at[:n, :n].set(chol)
  out = out.at[n, :n].set(w)
  out = out.at[n, n].set(d)
  return out


def chol_append_padded(chol_buf: jnp.ndarray, num_obs: jnp.ndarray,
                       k_vec: jnp.ndarray,
                       kappa: jnp.ndarray) -> jnp.ndarray:
  """In-buffer rank-1 append for a preallocated max-size factor.

  `chol_buf` is N x N holding a valid num_obs x num_obs factor in its top
  left corner, with ones on the diagonal of the unused part (so triangular
  solves against the full buffer are well-defined). `k_vec` is an N-vector
  whose first num_obs entries are the cross covariances (rest ignored).
  Writes row num_obs and returns the updated buffer. Static shapes
  throughout: safe inside jit/scan.
  """
  n_max = chol_buf.shape[-1]
  idx = jnp.arange(n_max)
  valid = idx < num_obs
  k_masked = jnp.where(valid, k_vec, 0.0)
  # Solve over the full buffer: rows >= num_obs have identity diagonal and
  # zero RHS, so they contribute zeros.
  w = solve_triangular(chol_buf, k_masked, lower=True, trans=0)
  new_row = jnp.where(valid, w, 0.0)
  d = jnp.sqrt(jnp.maximum(kappa - jnp.dot(new_row, new_row), 1e-12))
  new_row = new_row.at[num_obs].set(d) if isinstance(num_obs, int) else (
      jnp.where(idx == num_obs, d, new_row))
  buf = lax.dynamic_update_slice(chol_buf, new_row[None, :],
                                 (num_obs, 0))
  return buf


def init_chol_buffer(n_max: int, dtype=jnp.float32) -> jnp.ndarray:
  """Identity-initialized preallocated Cholesky buffer."""
  return jnp.eye(n_max, dtype=dtype)


def winv_append_padded(winv_buf: jnp.ndarray, num_obs: jnp.ndarray,
                       k_vec: jnp.ndarray,
                       kappa: jnp.ndarray) -> jnp.ndarray:
  """In-buffer rank-1 append of W = L^{-1} (solve-free BO state).

  Carrying the INVERSE factor instead of L makes every consumer a pure
  GEMM — no lax.linalg.triangular_solve anywhere in the BO iteration
  (that op is a sequential substitution chain on TPU and regressed ~7x
  in the 2026-08-18 toolchain; PERF.md round-5b). The growth identity:

    [[L, 0], [r^T, l]]^{-1} = [[W, 0], [-(r^T W)/l, 1/l]],
    r = W k,  l = sqrt(kappa - r^T r)

  so the append is two masked matvecs. Buffer contract mirrors
  chol_append_padded: N x N with a valid num_obs x num_obs W in the
  top-left corner and identity diagonal on the unused part (W of the
  identity-padded factor IS identity-padded). Same O(n^2) append cost
  class as the factor append (reference refactorizes from scratch
  per BO iteration instead, hyperbo/gp_utils/gp.py:284 TODO).
  """
  n_max = winv_buf.shape[-1]
  idx = jnp.arange(n_max)
  valid = idx < num_obs
  k_masked = jnp.where(valid, k_vec.reshape(n_max), 0.0)
  hi = lax.Precision.HIGH
  # r = W k: unused rows of W are identity with zero RHS -> zeros.
  r = jnp.matmul(winv_buf, k_masked, precision=hi)
  r = jnp.where(valid, r, 0.0)
  l = jnp.sqrt(jnp.maximum(kappa - jnp.dot(r, r, precision=hi), 1e-12))
  new_row = -jnp.matmul(r, winv_buf, precision=hi) / l
  new_row = jnp.where(valid, new_row, 0.0)
  new_row = jnp.where(idx == num_obs, 1.0 / l, new_row)
  return lax.dynamic_update_slice(winv_buf, new_row[None, :],
                                  (num_obs, 0))
