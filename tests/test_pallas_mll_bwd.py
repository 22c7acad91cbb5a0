"""Parity tests for the fused NLL backward kernel (ops/pallas_mll_bwd).

The kernel computes the same adjoints as the XLA chain in
ops/pallas_mll._se_core_bwd — G = 0.5(K^{-1} - alpha alpha^T) consumed
block-by-block in VMEM from panel-major T = L^{-1}. Verified against an
f64 numpy ground truth (interpret mode on CPU): in a well-conditioned
system the errors sit at the f32 rounding class (~1e-4), and in the
GP-realistic small-ridge regime at the same ~1e-3 noise class as the
XLA f32 chain itself (d_sv is a cancelling sum of large entries —
measured XLA-chain error 8e-3 abs at n=512, fused 2.5e-2). Reference
gradient semantics anchor: hyperbo/gp_utils/gp.py:124-146.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.ops import pallas_mll_bwd


def _f64_truth(x, delta, sv, da, kfam):
  xn = np.asarray(x, np.float64)
  dn = np.asarray(delta, np.float64)
  sq = (xn ** 2).sum(1, keepdims=True)
  r2 = np.maximum(sq + sq.T - 2 * xn @ xn.T, 0)
  if kfam == 'se':
    kmat = sv * np.exp(-0.5 * r2)
    neg2kp = kmat
  elif kfam == 'matern32':
    r = np.sqrt(3 * r2)
    e = np.exp(-r)
    kmat = sv * (1 + r) * e
    neg2kp = 3 * sv * e
  else:
    r = np.sqrt(5 * r2)
    e = np.exp(-r)
    kmat = sv * (1 + r + r * r / 3) * e
    neg2kp = (5 / 3) * sv * (1 + r) * e
  k64 = kmat + da * np.eye(xn.shape[0])
  kinv = np.linalg.inv(k64)
  alpha = kinv @ dn
  g = 0.5 * (kinv - alpha @ alpha.T)
  w = g * neg2kp
  dx = 2 * (w @ xn - w.sum(1, keepdims=True) * xn)
  return dx, (g * kmat).sum() / sv, np.trace(g), k64


def _run_fused(x, delta, sv, k64, block, chunk, kfam):
  n = x.shape[0]
  l = jnp.linalg.cholesky(jnp.asarray(k64, jnp.float32))
  linv = jax.lax.linalg.triangular_solve(
      l, jnp.eye(n, dtype=jnp.float32), left_side=True, lower=True)
  tpm = jnp.moveaxis(linv.reshape(n, n // block, block), 1, 0)
  alpha = linv.T @ (linv @ delta)
  d_x, dsv_raw, d_da = pallas_mll_bwd.mll_bwd_fused(
      tpm, x, alpha, jnp.float32(sv), block=block, chunk=chunk,
      kfam=kfam, interpret=True)
  return np.asarray(d_x), float(dsv_raw) / sv, float(d_da)


@pytest.mark.parametrize('kfam', ['se', 'matern32', 'matern52'])
def test_bwd_fused_math_well_conditioned(kfam):
  """da = 2.0 keeps cancellation mild: f32-rounding-class agreement."""
  n, d, block, chunk = 256, 3, 128, 128
  key = jax.random.PRNGKey(0)
  x = jax.random.uniform(key, (n, d), jnp.float32)
  delta = jax.random.normal(jax.random.fold_in(key, 1), (n, 1),
                            jnp.float32)
  sv, da = 1.3, 2.0
  dx64, dsv64, dda64, k64 = _f64_truth(x, delta, sv, da, kfam)
  d_x, d_sv, d_da = _run_fused(x, delta, sv, k64, block, chunk, kfam)
  sc = np.abs(dx64).max() + 1e-8
  assert np.abs(d_x - dx64).max() / sc < 1e-3
  np.testing.assert_allclose(d_sv, dsv64, atol=2e-3, rtol=1e-3)
  np.testing.assert_allclose(d_da, dda64, rtol=1e-4)


def test_bwd_fused_gp_regime_and_uneven_chunk():
  """Small ridge (the GP regime) with chunk > block — exercises the
  align-down-to-chunk zero-row path; tolerances at the measured f32
  noise class of this cancelling computation."""
  n, d, block, chunk = 512, 3, 128, 256
  key = jax.random.PRNGKey(3)
  x = jax.random.uniform(key, (n, d), jnp.float32)
  delta = jax.random.normal(jax.random.fold_in(key, 1), (n, 1),
                            jnp.float32)
  sv, da = 1.3, 0.15
  dx64, dsv64, dda64, k64 = _f64_truth(x, delta, sv, da, 'se')
  d_x, d_sv, d_da = _run_fused(x, delta, sv, k64, block, chunk, 'se')
  sc = np.abs(dx64).max() + 1e-8
  assert np.abs(d_x - dx64).max() / sc < 2e-3
  np.testing.assert_allclose(d_sv, dsv64, atol=5e-2)
  np.testing.assert_allclose(d_da, dda64, rtol=1e-4)


def test_bwd_fused_masked_matches_xla_chain():
  """Packed/masked path: kernel factors carry valid_i * valid_j exactly
  like the XLA masked chain (pallas_mll._se_core_bwd with valid)."""
  from hyperbo_tpu.ops import pallas_mll
  n, count, d, block, chunk = 512, 400, 3, 128, 128
  key = jax.random.PRNGKey(7)
  x = jax.random.uniform(key, (n, d), jnp.float32)
  valid = (jnp.arange(n) < count).astype(jnp.float32)
  x = x * valid[:, None]
  delta = jax.random.normal(jax.random.fold_in(key, 1), (n, 1),
                            jnp.float32) * valid[:, None]
  sv, da = jnp.float32(1.3), jnp.float32(0.5)
  sq = jnp.sum(x * x, axis=1, keepdims=True)
  r2 = jnp.maximum(sq + sq.T - 2.0 * x @ x.T, 0.0)
  pair = valid[:, None] * valid[None, :]
  k = sv * jnp.exp(-0.5 * r2) * pair + da * jnp.eye(n)
  l = jnp.linalg.cholesky(k)

  want_dx, want_alpha, want_dsv, want_dda = pallas_mll._se_core_bwd(
      l, x, delta, sv, valid, 'se')

  linv = jax.lax.linalg.triangular_solve(
      l, jnp.eye(n, dtype=l.dtype), left_side=True, lower=True)
  tpm = jnp.moveaxis(linv.reshape(n, n // block, block), 1, 0)
  alpha = linv.T @ (linv @ delta)
  d_x, dsv_raw, d_da = pallas_mll_bwd.mll_bwd_fused(
      tpm, x, alpha, sv, block=block, chunk=chunk, kfam='se',
      valid=valid, interpret=True)
  sc = np.abs(np.asarray(want_dx)).max() + 1e-8
  assert np.abs(np.asarray(d_x) - np.asarray(want_dx)).max() / sc < 2e-3
  np.testing.assert_allclose(float(dsv_raw / sv), float(want_dsv),
                             atol=5e-2, rtol=1e-2)
  np.testing.assert_allclose(float(d_da), float(want_dda), rtol=1e-3)


@pytest.mark.parametrize('rows,group,chunk',
                         [(2, 2, 128), (2, 4, 128), (1, 2, 256),
                          (4, 1, 128), (4, 4, 256)])
def test_bwd_fused_tiled_matches_sequential(rows, group, chunk):
  """The 2-D tiled pass (_kernel_bwd_tiled) computes the same adjoints
  as the sequential kernel — including tiles straddling the diagonal
  (skipped j > i pairs) and the tile-top k-alignment zero rows."""
  n, d, block = 512, 3, 128
  key = jax.random.PRNGKey(11)
  x = jax.random.uniform(key, (n, d), jnp.float32)
  delta = jax.random.normal(jax.random.fold_in(key, 1), (n, 1),
                            jnp.float32)
  sv, da = 1.3, 0.5
  _, _, _, k64 = _f64_truth(x, delta, sv, da, 'se')
  l = jnp.linalg.cholesky(jnp.asarray(k64, jnp.float32))
  linv = jax.lax.linalg.triangular_solve(
      l, jnp.eye(n, dtype=jnp.float32), left_side=True, lower=True)
  tpm = jnp.moveaxis(linv.reshape(n, n // block, block), 1, 0)
  alpha = linv.T @ (linv @ delta)
  seq = pallas_mll_bwd.mll_bwd_fused(
      tpm, x, alpha, jnp.float32(sv), block=block, chunk=block,
      kfam='se', interpret=True)
  til = pallas_mll_bwd.mll_bwd_fused(
      tpm, x, alpha, jnp.float32(sv), block=block, chunk=chunk,
      kfam='se', rows=rows, group=group, interpret=True)
  for a, b in zip(seq, til):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=2e-5)


def test_bwd_fused_tiled_masked():
  """Tiled pass under the packed/masked path matches the sequential
  masked kernel."""
  n, count, d, block = 512, 400, 3, 128
  key = jax.random.PRNGKey(13)
  x = jax.random.uniform(key, (n, d), jnp.float32)
  valid = (jnp.arange(n) < count).astype(jnp.float32)
  x = x * valid[:, None]
  delta = jax.random.normal(jax.random.fold_in(key, 1), (n, 1),
                            jnp.float32) * valid[:, None]
  sv, da = jnp.float32(1.3), jnp.float32(0.5)
  sq = jnp.sum(x * x, axis=1, keepdims=True)
  r2 = jnp.maximum(sq + sq.T - 2.0 * x @ x.T, 0.0)
  pair = valid[:, None] * valid[None, :]
  k = sv * jnp.exp(-0.5 * r2) * pair + da * jnp.eye(n)
  l = jnp.linalg.cholesky(k)
  linv = jax.lax.linalg.triangular_solve(
      l, jnp.eye(n, dtype=l.dtype), left_side=True, lower=True)
  tpm = jnp.moveaxis(linv.reshape(n, n // block, block), 1, 0)
  alpha = linv.T @ (linv @ delta)
  seq = pallas_mll_bwd.mll_bwd_fused(
      tpm, x, alpha, sv, block=block, chunk=128, kfam='se',
      valid=valid, interpret=True)
  til = pallas_mll_bwd.mll_bwd_fused(
      tpm, x, alpha, sv, block=block, chunk=256, kfam='se',
      valid=valid, rows=2, group=2, interpret=True)
  for a, b in zip(seq, til):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=2e-5)


def test_bwd_fused_production_shape():
  """The exact configuration _se_core_bwd dispatches (block=256,
  chunk=512) at the smallest admissible n — closes the gap between the
  CI shapes and the shipped path."""
  n, d = 1024, 3
  x, delta, sv, da, k = (None,) * 5
  key = jax.random.PRNGKey(9)
  x = jax.random.uniform(key, (n, d), jnp.float32)
  delta = jax.random.normal(jax.random.fold_in(key, 1), (n, 1),
                            jnp.float32)
  sv, da = 1.3, 1.0
  dx64, dsv64, dda64, k64 = _f64_truth(x, delta, sv, da, 'se')
  d_x, d_sv, d_da = _run_fused(x, delta, sv, k64,
                               pallas_mll_bwd.BLOCK,
                               pallas_mll_bwd.CHUNK, 'se')
  sc = np.abs(dx64).max() + 1e-8
  assert np.abs(d_x - dx64).max() / sc < 2e-3
  np.testing.assert_allclose(d_sv, dsv64, atol=2e-2, rtol=2e-3)
  np.testing.assert_allclose(d_da, dda64, rtol=1e-3)
