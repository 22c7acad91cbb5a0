"""Linalg tests: custom-VJP gradients vs finite differences, blocked
Cholesky correctness, rank-1 appends, safe-sqrt gradient clamping.

Mirrors the assertions of reference hyperbo/basics/linalg_test.py:30-110.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.ops import chol as chol_ops
from hyperbo_tpu.ops import linalg


def _rand_spd(key, n, jitter=2.0):
  a = jax.random.normal(key, (n, n))
  return a @ a.T / n + jitter * jnp.eye(n)


def _sym_direction(key, n):
  """Random symmetric unit direction (the primal reads only the lower
  triangle of a symmetric input, so FD must move along symmetric
  perturbations — same methodology as the reference test)."""
  v = jax.random.normal(key, (n, n))
  e = 0.5 * (v + v.T)
  return e / jnp.sqrt(jnp.vdot(e, e))


@pytest.mark.parametrize('cached', [False, True])
def test_inverse_spdmatrix_vector_product_grad(cached):
  """Directional derivatives match central finite differences."""
  key = jax.random.PRNGKey(0)
  n = 6
  spd = _rand_spd(key, n)
  x = jax.random.normal(jax.random.PRNGKey(1), (n,))

  def f(mat, vec):
    # In cached mode the factor is recomputed from the (perturbed) matrix,
    # as the reference FD test does (linalg_test.py:42-48); the custom VJP
    # treats it as non-differentiable either way.
    chol = chol_ops.cholesky(mat) if cached else None
    out = linalg.inverse_spdmatrix_vector_product(
        mat, vec, cached_cholesky=chol)
    return jnp.sum(out ** 2)

  g_mat, g_vec = jax.grad(f, argnums=(0, 1))(spd, x)

  eps = 1e-3
  for seed in range(5):
    e = _sym_direction(jax.random.PRNGKey(100 + seed), n)
    fd = (f(spd + eps * e, x) - f(spd - eps * e, x)) / (2 * eps)
    exact = float(jnp.vdot(g_mat, e))
    np.testing.assert_allclose(exact, float(fd), rtol=2e-2, atol=1e-3)
  fd_vec = np.zeros(n, np.float64)
  for i in range(n):
    e = jnp.zeros(n).at[i].set(eps)
    fd_vec[i] = (f(spd, x + e) - f(spd, x - e)) / (2 * eps)
  np.testing.assert_allclose(np.asarray(g_vec), fd_vec, atol=5e-3)


def test_matrix_rhs_vjp():
  """The shape-aware VJP handles n x m right-hand sides."""
  key = jax.random.PRNGKey(2)
  spd = _rand_spd(key, 5)
  b = jax.random.normal(jax.random.PRNGKey(3), (5, 3))

  def f(mat):
    return jnp.sum(linalg.inverse_spdmatrix_vector_product(mat, b) ** 2)

  g = jax.grad(f)(spd)
  eps = 1e-3
  for seed in range(5):
    e = _sym_direction(jax.random.PRNGKey(200 + seed), 5)
    fd = (f(spd + eps * e) - f(spd - eps * e)) / (2 * eps)
    exact = float(jnp.vdot(g, e))
    np.testing.assert_allclose(exact, float(fd), rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize('n', [64, 300, 700])
def test_blocked_cholesky_matches_xla(n):
  key = jax.random.PRNGKey(4)
  a = _rand_spd(key, n)
  chol_ops.set_use_recursive(True)
  try:
    l_blocked = chol_ops.cholesky(a, base_block=128)
  finally:
    chol_ops.set_use_recursive(False)
  l_ref = jnp.linalg.cholesky(a)
  np.testing.assert_allclose(l_blocked, l_ref, atol=5e-4)


def test_cholesky_batched():
  key = jax.random.PRNGKey(5)
  a = jax.vmap(lambda k: _rand_spd(k, 200))(jax.random.split(key, 3))
  chol_ops.set_use_recursive(True)
  try:
    l = chol_ops.cholesky(a, base_block=64)
  finally:
    chol_ops.set_use_recursive(False)
  np.testing.assert_allclose(
      l @ jnp.swapaxes(l, -1, -2), a, atol=1e-3)


def test_chol_append():
  """Appending a row/col to a factor matches refactorization."""
  key = jax.random.PRNGKey(6)
  big = _rand_spd(key, 9)
  small = big[:8, :8]
  l_small = chol_ops.cholesky(small)
  l_app = chol_ops.chol_append(l_small, big[:8, 8], big[8, 8])
  l_full = chol_ops.cholesky(big)
  np.testing.assert_allclose(l_app, l_full, atol=1e-4)


def test_chol_append_padded():
  """In-buffer append with masking matches the dense factor."""
  key = jax.random.PRNGKey(7)
  big = _rand_spd(key, 5)
  n_max = 10
  buf = chol_ops.init_chol_buffer(n_max)
  for i in range(5):
    k_vec = jnp.zeros(n_max).at[:i].set(big[:i, i])
    buf = chol_ops.chol_append_padded(buf, jnp.array(i), k_vec, big[i, i])
  l_full = chol_ops.cholesky(big)
  np.testing.assert_allclose(buf[:5, :5], l_full, atol=1e-4)


def test_safe_sqrt_grad_clamped_at_zero():
  g0 = jax.grad(linalg.safe_sqrt)(0.0)
  assert np.isfinite(g0) and g0 == 1e6
  g1 = jax.grad(linalg.safe_sqrt)(4.0)
  np.testing.assert_allclose(g1, 0.25, rtol=1e-6)


def test_safe_l2norm_grad_finite_at_zero():
  g = jax.grad(lambda x: linalg.safe_l2norm(x))(jnp.zeros(3))
  assert np.all(np.isfinite(np.asarray(g)))


def test_svd_matrix_sqrt_rank_truncation():
  key = jax.random.PRNGKey(8)
  u = jax.random.normal(key, (10, 4))
  cov = u @ u.T  # rank 4
  factor = linalg.svd_matrix_sqrt(cov)
  assert factor.shape[1] <= 5
  np.testing.assert_allclose(factor @ factor.T, cov, atol=1e-4)
  factor_js = linalg.svd_matrix_sqrt(cov, jit_safe=True)
  np.testing.assert_allclose(factor_js @ factor_js.T, cov, atol=1e-4)


def test_tri_inv_blocked_matches_solve():
  import jax
  from hyperbo_tpu.ops import linalg as linalg_mod
  for n, block in ((96, 32), (256, 64), (300, 128)):
    key = jax.random.PRNGKey(n)
    a = jax.random.normal(key, (n, n)) / jnp.sqrt(jnp.float32(n))
    l = jnp.linalg.cholesky(a @ a.T + 2.0 * jnp.eye(n))
    got = linalg_mod.tri_inv_blocked(l, block=block)
    want = jax.lax.linalg.triangular_solve(
        l, jnp.eye(n), left_side=True, lower=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


def test_tri_inv_doubling_matches_solve():
  """Bottom-up batched path (n/block a power of two), multiple levels."""
  import jax
  from hyperbo_tpu.ops import linalg as linalg_mod
  for n, block in ((512, 64), (384, 96), (256, 256)):
    key = jax.random.PRNGKey(n)
    a = jax.random.normal(key, (n, n)) / jnp.sqrt(jnp.float32(n))
    l = jnp.linalg.cholesky(a @ a.T + 2.0 * jnp.eye(n))
    got = linalg_mod._tri_inv_doubling(l, block)
    want = jax.lax.linalg.triangular_solve(
        l, jnp.eye(n), left_side=True, lower=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)
    # HYPERBO_TRIINV_DOUBLING=1 routes power-of-two nb through the
    # doubling path (off by default: slower on the 2026-08-19 v5e
    # toolchain, see benchmarks/r6_triinv_probe.py).
    prior = os.environ.get('HYPERBO_TRIINV_DOUBLING')
    os.environ['HYPERBO_TRIINV_DOUBLING'] = '1'
    try:
      via_router = linalg_mod.tri_inv_blocked(l, block=block)
    finally:
      if prior is None:
        del os.environ['HYPERBO_TRIINV_DOUBLING']
      else:
        os.environ['HYPERBO_TRIINV_DOUBLING'] = prior
    np.testing.assert_allclose(np.asarray(via_router), np.asarray(got),
                               atol=1e-6)
