"""Dense linear algebra for GP inference, TPU-first.

Behavioral parity with reference hyperbo/basics/linalg.py:29-197 (same
function names and contracts), with the factorization routed through
`hyperbo_tpu.ops.chol.cholesky` (an MXU-blocked Cholesky) instead of
jax.scipy's default path, and a shape-aware custom VJP for the SPD
inverse-vector product (the reference's jnp.outer form only covers n x 1
right-hand sides; reference hyperbo/basics/linalg.py:139-171).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jspla

from hyperbo_tpu.core.warp import retrieve_params
from hyperbo_tpu.ops import chol as chol_ops

EPS = 1e-10


def solve_linear_system(coeff, b):
  """Solve linear system Ax = b where A=coeff (SPD). Returns (chol, x)."""
  chol = chol_ops.cholesky(coeff)
  kinvy = inverse_spdmatrix_vector_product(coeff, b, cached_cholesky=chol)
  return chol, kinvy


def compute_delta_y_and_cov(mean_func,
                            cov_func,
                            params,
                            x,
                            y,
                            warp_func=None,
                            eps=1e-6):
  """Compute y - mu(x) and cov(x, x) + I*(noise_variance + eps)."""
  y = y - jnp.atleast_2d(mean_func(params, x, warp_func=warp_func))
  noise_variance, = retrieve_params(
      params, ['noise_variance'], warp_func=warp_func)
  cov = cov_func(params, x, warp_func=warp_func) + jnp.eye(
      x.shape[0], dtype=y.dtype) * (noise_variance + eps)
  return y, cov


def solve_gp_linear_system(mean_func,
                           cov_func,
                           params,
                           x,
                           y,
                           warp_func=None,
                           eps=1e-6):
  """Solve the GP linear system (K + sigma^2 I) v = y - mu(x).

  Returns:
    chol: lower Cholesky factor of K + (noise_variance + eps) I.
    kinvy: K^{-1} (y - mu).
    y: y with mean subtracted.
  """
  y, cov = compute_delta_y_and_cov(
      mean_func, cov_func, params, x, y, warp_func, eps)
  chol, kinvy = solve_linear_system(cov, y)
  return chol, kinvy, y


def svd_matrix_sqrt(cov, jit_safe: bool = False):
  """Square root of a PSD matrix via SVD with rank truncation.

  Returns A with A @ A.T = cov. When `jit_safe` is False (default, matches
  the reference), columns beyond the numerical rank are dropped (dynamic
  shape; host-side use only). When True, those columns are zeroed instead so
  the result keeps a static shape; downstream pinv/whitening handles the
  zero columns identically.
  """
  (u, s, _) = jspla.svd(cov)
  factor = u * jnp.sqrt(jnp.maximum(s, 0.0)[..., None, :])
  tol = s.max() * jnp.finfo(s.dtype).eps / 2. * jnp.sqrt(2 * cov.shape[0] + 1.)
  if jit_safe:
    mask = (s > tol).astype(factor.dtype)
    return factor * mask[None, :]
  rank = jnp.count_nonzero(s > tol)
  return factor[:, :rank]


def cholesky_cache(spd_matrix, cached_cholesky):
  """Cholesky factor of `spd_matrix` unless one is already given."""
  if cached_cholesky is not None:
    return cached_cholesky
  return chol_ops.cholesky(spd_matrix)


@jax.custom_vjp
def inverse_spdmatrix_vector_product(spd_matrix, x, cached_cholesky=None):
  """Computes spd_matrix^{-1} @ x where spd_matrix is SPD.

  The custom VJP reuses the Cholesky factor from the forward pass, so the
  backward pass costs two triangular solves instead of differentiating
  through the factorization: d/dK [K^{-1} x] applied to cotangent g gives
  grad_K = -(K^{-1} g)(K^{-1} x)^T and grad_x = K^{-1} g.
  """
  chol_factor = cholesky_cache(spd_matrix, cached_cholesky)
  return chol_ops.cho_solve(chol_factor, x)


def _inverse_spdmatrix_vector_product_fwd(spd_matrix, x, cached_cholesky=None):
  chol_factor = cholesky_cache(spd_matrix, cached_cholesky)
  out = chol_ops.cho_solve(chol_factor, x)
  # Save the RESULT as the residual: the backward needs K^{-1}x, which
  # the forward already computed — saving x instead would re-pay two
  # triangular solves per VJP.
  return out, (chol_factor, out)


def _inverse_spdmatrix_vector_product_bwd(res, g):
  chol_factor, inv_spd_matrix_x = res
  inv_spd_matrix_g = chol_ops.cho_solve(chol_factor, g)
  # d(K^{-1}x) = -K^{-1} dK K^{-1} x, so the cotangent pullback to K is
  # -(K^{-1} g)(K^{-1} x)^T. Shape-aware: covers both n-vector and n x m
  # right-hand sides (the reference's jnp.outer form flattens m > 1,
  # reference linalg.py:164).
  a = jnp.atleast_2d(inv_spd_matrix_x.T).T
  b = jnp.atleast_2d(inv_spd_matrix_g.T).T
  grad_spd_matrix = -jnp.dot(b, a.T)
  grad_x = inv_spd_matrix_g
  return (grad_spd_matrix, grad_x, None)


inverse_spdmatrix_vector_product.defvjp(
    _inverse_spdmatrix_vector_product_fwd,
    _inverse_spdmatrix_vector_product_bwd)


# sqrt with a clamped (1e6) gradient at 0 instead of nan, matching the
# reference's _safe_sqrt (hyperbo/basics/linalg.py:173-191).
_safe_sqrt = jax.custom_vjp(jnp.sqrt)


def _safe_sqrt_fwd(x):
  result, vjpfun = jax.vjp(jnp.sqrt, x)
  return result, (x, vjpfun)


def _safe_sqrt_rev(primals, tangent):
  x, vjpfun = primals
  max_grad = 1e6
  result = jnp.where(x != 0., vjpfun(tangent)[0], jnp.full_like(x, max_grad))
  return (result,)


_safe_sqrt.defvjp(_safe_sqrt_fwd, _safe_sqrt_rev)

safe_sqrt = _safe_sqrt


def safe_l2norm(x):
  """L2 norm of x without a nan gradient at 0."""
  sqdist = jnp.sum(x**2)
  return _safe_sqrt(sqdist)


def tri_inv_blocked(l: jnp.ndarray, block: int = 512) -> jnp.ndarray:
  """L^{-1} for lower-triangular L via blocking on MXU GEMMs.

  [[A, 0], [B, C]]^{-1} = [[A^{-1}, 0], [-C^{-1} B A^{-1}, C^{-1}]]:
  the off-diagonal work — 2/3 of the FLOPs — becomes X3-precision
  matmuls instead of the substitution chain inside
  lax.triangular_solve with an n-wide RHS. Used by the fused-MLL
  backward pass (ops/pallas_mll) where K^{-1} = L^{-T} L^{-1} needs the
  full inverse.

  A bottom-up BATCHED variant (_tri_inv_doubling: one batched
  triangular solve for all diagonal blocks + log2(n/block) levels of
  batched pair-combining GEMMs) was measured on v5e (2026-08-19,
  benchmarks/r6_triinv_probe.py): 19.0 ms isolated at n=8192/b=512 vs
  14.7 ms for this top-down recursion, and 39.4 vs 32.3 ms for the
  full fused value_and_grad — the per-level (n/2s, 2s, 2s) concatenate
  materialization costs more HBM traffic than the recursion's
  sequential small ops (b=1024 with one fewer level was fastest of the
  batched runs, confirming the level-traffic attribution). The batched
  path stays available via HYPERBO_TRIINV_DOUBLING=1 for future
  toolchains; the recursion is the default.

  NOTE: the env var is read at TRACE time. A consumer jitted before the
  flag flips keeps the old branch baked into its cached executable —
  set the flag before the first jit trace of anything that calls this
  (the probes do), or restart the process.
  """
  n = l.shape[-1]
  if n <= block:
    return jax.lax.linalg.triangular_solve(
        l, jnp.eye(n, dtype=l.dtype), left_side=True, lower=True)
  nb = n // block
  if (n % block == 0 and nb & (nb - 1) == 0 and
      os.environ.get('HYPERBO_TRIINV_DOUBLING', '0') == '1'):
    return _tri_inv_doubling(l, block)
  m = (n // 2 + block - 1) // block * block
  if m >= n:
    m = n // 2
  hi = jax.lax.Precision.HIGH
  a_inv = tri_inv_blocked(l[:m, :m], block)
  c_inv = tri_inv_blocked(l[m:, m:], block)
  off = -jnp.matmul(c_inv, jnp.matmul(l[m:, :m], a_inv, precision=hi),
                    precision=hi)
  top = jnp.concatenate(
      [a_inv, jnp.zeros((m, n - m), l.dtype)], axis=1)
  bot = jnp.concatenate([off, c_inv], axis=1)
  return jnp.concatenate([top, bot], axis=0)


def _tri_inv_doubling(l: jnp.ndarray, block: int) -> jnp.ndarray:
  """Bottom-up batched triangular inverse (n/block a power of two)."""
  n = l.shape[-1]
  nb = n // block
  idx = jnp.arange(nb)
  diag = l.reshape(nb, block, nb, block)[idx, :, idx, :]
  eye = jnp.broadcast_to(jnp.eye(block, dtype=l.dtype), diag.shape)
  inv = jax.lax.linalg.triangular_solve(
      diag, eye, left_side=True, lower=True)
  hi = jax.lax.Precision.HIGH
  s = block
  while s < n:
    np2 = n // (2 * s)
    pidx = jnp.arange(np2)
    pairs = l.reshape(np2, 2 * s, np2, 2 * s)[pidx, :, pidx, :]
    b_blk = pairs[:, s:, :s]
    a_inv, c_inv = inv[0::2], inv[1::2]
    off = -jnp.matmul(c_inv, jnp.matmul(b_blk, a_inv, precision=hi),
                      precision=hi)
    top = jnp.concatenate([a_inv, jnp.zeros_like(a_inv)], axis=2)
    bot = jnp.concatenate([off, c_inv], axis=2)
    inv = jnp.concatenate([top, bot], axis=1)
    s *= 2
  return inv[0]
