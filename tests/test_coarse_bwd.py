"""Parity tests for the coarse two-level NLL backward (ops/coarse_bwd).

Beyond pallas_mll_bwd.MAX_N the backward splits into c coarse blocks:
the existing per-block kernels on the diagonal, XLA GEMMs for every
cross term (the r14 int32-offset refutation made a monolithic kernel
lift impossible; PERF.md). These tests shrink MAX_N so the coarse
route engages at CPU-testable sizes and check it against an f64 numpy
ground truth and against the shipping fused route.

Reference gradient semantics anchor: hyperbo/gp_utils/gp.py:124-146.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.ops import coarse_bwd
from hyperbo_tpu.ops import pallas_mll
from hyperbo_tpu.ops import pallas_mll_bwd


def _f64_truth(x, delta, sv, da, kfam, valid=None):
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
  if valid is not None:
    pair = np.asarray(valid, np.float64).reshape(-1, 1)
    pair = pair * pair.T
    kmat = kmat * pair
    neg2kp = neg2kp * pair
  k64 = kmat + da * np.eye(xn.shape[0])
  kinv = np.linalg.inv(k64)
  alpha = kinv @ dn
  g = 0.5 * (kinv - alpha @ alpha.T)
  w = g * neg2kp
  dx = 2 * (w @ xn - w.sum(1, keepdims=True) * xn)
  return dx, alpha, (g * kmat).sum(), np.trace(g), k64


def _inputs(n, d, seed=0, valid_count=None):
  key = jax.random.PRNGKey(seed)
  x = jax.random.uniform(key, (n, d), jnp.float32) * 2.0
  delta = jax.random.normal(jax.random.fold_in(key, 1), (n, 1),
                            jnp.float32)
  valid = None
  if valid_count is not None:
    valid = (jnp.arange(n) < valid_count).astype(jnp.float32)
    x = x * valid[:, None]
    delta = delta * valid[:, None]
  return x, delta, valid


@pytest.mark.parametrize('kfam,n,c', [
    ('se', 1024, 2),
    ('matern52', 1024, 2),
    ('se', 1536, 3),
])
def test_coarse_bwd_f64_truth(monkeypatch, kfam, n, c):
  monkeypatch.setattr(pallas_mll_bwd, 'MAX_N', 512)
  assert coarse_bwd.coarse_split(n) == c
  d, sv, da = 3, 1.3, 2.0
  x, delta, _ = _inputs(n, d)
  dx64, al64, dsv64, dda64, k64 = _f64_truth(x, delta, sv, da, kfam)
  l = jnp.linalg.cholesky(jnp.asarray(k64, jnp.float32))
  d_x, alpha, dsv_raw, d_da = coarse_bwd.coarse_bwd(
      l, x, delta, jnp.float32(sv), kfam=kfam, interpret=True)
  sc = np.abs(dx64).max() + 1e-8
  assert np.abs(np.asarray(d_x) - dx64).max() / sc < 1e-3
  np.testing.assert_allclose(np.asarray(alpha), al64, atol=2e-4)
  np.testing.assert_allclose(float(dsv_raw), dsv64, atol=3e-3, rtol=1e-3)
  np.testing.assert_allclose(float(d_da), dda64, rtol=2e-4)


def test_coarse_bwd_masked(monkeypatch):
  monkeypatch.setattr(pallas_mll_bwd, 'MAX_N', 512)
  n, d, sv, da = 1024, 3, 0.8, 1.5
  x, delta, valid = _inputs(n, d, seed=3, valid_count=700)
  dx64, al64, dsv64, dda64, k64 = _f64_truth(x, delta, sv, da, 'se',
                                             valid=valid)
  l = jnp.linalg.cholesky(jnp.asarray(k64, jnp.float32))
  d_x, alpha, dsv_raw, d_da = coarse_bwd.coarse_bwd(
      l, x, delta, jnp.float32(sv), valid=valid, kfam='se',
      interpret=True)
  sc = np.abs(dx64).max() + 1e-8
  assert np.abs(np.asarray(d_x) - dx64).max() / sc < 1e-3
  np.testing.assert_allclose(float(dsv_raw), dsv64, atol=3e-3, rtol=1e-3)
  np.testing.assert_allclose(float(d_da), dda64, rtol=2e-4)
  np.testing.assert_allclose(np.asarray(alpha), al64, atol=2e-4)


def test_coarse_bwd_xla_triinv_flavor(monkeypatch):
  """The toolchain-drift fallback (blocked XLA tri-inv per diagonal
  block) matches the Pallas-tri-inv flavor."""
  monkeypatch.setattr(pallas_mll_bwd, 'MAX_N', 512)
  n, d, sv, da = 1024, 3, 1.3, 2.0
  x, delta, _ = _inputs(n, d, seed=5)
  _, _, _, _, k64 = _f64_truth(x, delta, sv, da, 'se')
  l = jnp.linalg.cholesky(jnp.asarray(k64, jnp.float32))
  want = coarse_bwd.coarse_bwd(l, x, delta, jnp.float32(sv),
                               kfam='se', interpret=True)
  got = coarse_bwd.coarse_bwd(l, x, delta, jnp.float32(sv), kfam='se',
                              triinv='1', interpret=True)
  for a, b in zip(got, want):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize('kfam', ['se', 'matern52'])
def test_coarse_route_end_to_end_grad(monkeypatch, kfam):
  """value_and_grad of the fused NLL core with the coarse route engaged
  (shrunk MAX_N) matches the shipping fused route at the same n."""
  n, d, sv, da = 1024, 3, 1.1, 0.5
  x, delta, _ = _inputs(n, d, seed=7)
  bwd_cfg = (True, 'gemm', 'high', 'pallas')
  core = pallas_mll._se_nll_core_fn(256, 512, 2, True, 2, kfam,
                                    'octv', False, bwd_cfg)

  def loss(xv, dv, svv, dav):
    return core(xv, dv, svv, dav)

  args = (x, delta, jnp.float32(sv), jnp.float32(da))
  want_v, want_g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*args)
  monkeypatch.setattr(pallas_mll_bwd, 'MAX_N', 512)
  got_v, got_g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*args)
  np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
  names = ['d_x', 'd_delta', 'd_sv', 'd_da']
  for name, a, b in zip(names, got_g, want_g):
    a = np.asarray(a)
    b = np.asarray(b)
    sc = np.abs(b).max() + 1e-8
    assert np.abs(a - b).max() / sc < 2e-3, name


def test_coarse_split_constraints():
  assert coarse_bwd.coarse_split(16384) == 0          # under the cap
  assert coarse_bwd.coarse_split(32768) == 2
  assert coarse_bwd.coarse_split(24576) == 2
  assert coarse_bwd.coarse_split(49152) == 3
  assert coarse_bwd.coarse_split(16384 + 256) == 0    # no divisor fits
  assert coarse_bwd.coarse_split(131072) == 8
