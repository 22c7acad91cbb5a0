"""Pallas VMEM-resident Cholesky panel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.ops import chol as chol_ops
from hyperbo_tpu.ops import pallas_chol


@pytest.mark.parametrize('n', [128, 256, 512])
def test_panel_matches_xla(n):
  key = jax.random.PRNGKey(n)
  a = jax.random.normal(key, (n, n))
  a = a @ a.T / n + jnp.eye(n)
  got = pallas_chol.cholesky_panel(a, interpret=True)
  want = jnp.linalg.cholesky(a)
  np.testing.assert_allclose(got, want, atol=2e-5)


def test_panel_padded_non_multiple():
  key = jax.random.PRNGKey(7)
  a = jax.random.normal(key, (200, 200))
  a = a @ a.T / 200 + jnp.eye(200)
  got = pallas_chol.cholesky_panel_padded(a, interpret=True)
  want = jnp.linalg.cholesky(a)
  np.testing.assert_allclose(got, want, atol=2e-5)


def test_blocked_cholesky_with_pallas_base():
  """End-to-end blocked recursion with the Pallas base kernel."""
  chol_ops.set_use_pallas_base(True)
  try:
    key = jax.random.PRNGKey(9)
    a = jax.random.normal(key, (700, 700))
    a = a @ a.T / 700 + jnp.eye(700)
    got = chol_ops.cholesky(a, base_block=256)
    want = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(got, want, atol=5e-4)
  finally:
    chol_ops.set_use_pallas_base(False)


@pytest.mark.parametrize('n,B,C', [(512, 128, 256)])
def test_hbm_cholesky_matches_xla(n, B, C):
  """Single-kernel HBM-streaming factorization (interpret mode).

  One config keeps the suite fast (interpret mode of the unrolled sweep
  costs ~1 min per config); it exercises multiple panels, the
  left-looking corrections and multi-chunk DMA. Broader configs were
  validated on hardware (PERF.md) and in development runs."""
  from hyperbo_tpu.ops import pallas_chol_hbm
  key = jax.random.PRNGKey(n + B)
  a = jax.random.normal(key, (n, n))
  a = a @ a.T / n + jnp.eye(n)
  got = pallas_chol_hbm.cholesky_hbm(a, block=B, chunk=C, interpret=True)
  want = jnp.linalg.cholesky(a)
  np.testing.assert_allclose(got, want, atol=5e-4)
  # Accuracy budget at the objective level: the kernel's explicit
  # triangular-inverse solve (~1.8e-4 max factor deviation on hardware,
  # ops/chol.py:101-105) must move the GP NLL (logdet + quadratic form)
  # by < 1e-4 relative before it could ever become a default.
  y = jax.random.normal(jax.random.PRNGKey(3), (n, 1))

  def nll(fac):
    kinvy = chol_ops.cho_solve(fac, y)
    return float(0.5 * jnp.sum(y * kinvy)
                 + jnp.sum(jnp.log(jnp.diagonal(fac)))
                 + 0.5 * n * jnp.log(2 * jnp.pi))

  nll_got, nll_want = nll(got), nll(want)
  assert abs(nll_got - nll_want) <= 1e-4 * max(1.0, abs(nll_want)), (
      nll_got, nll_want)


def test_tri_inverse():
  from hyperbo_tpu.ops import pallas_chol_hbm
  l = jnp.tril(jax.random.normal(jax.random.PRNGKey(0), (256, 256)))
  l = l + 8 * jnp.eye(256)
  w = pallas_chol_hbm._tri_inverse(l)
  np.testing.assert_allclose(w @ l, jnp.eye(256), atol=1e-4)


def test_hbm_cholesky_halves_matches_xla():
  """v6 half-panel variant (interpret mode)."""
  from hyperbo_tpu.ops import pallas_chol_hbm
  n = 512
  a = jax.random.normal(jax.random.PRNGKey(77), (n, n))
  a = a @ a.T / n + jnp.eye(n)
  got = pallas_chol_hbm.cholesky_hbm_halves(
      a, block=128, chunk=128, half=256, interpret=True)
  np.testing.assert_allclose(got, jnp.linalg.cholesky(a), atol=5e-4)


def test_hbm_cholesky_wide_matches_xla():
  """v7 wide-strip variant (interpret mode): dual-buffered chunk DMAs,
  tw-wide contractions over the upfront-zeroed output."""
  from hyperbo_tpu.ops import pallas_chol_hbm
  n = 512
  a = jax.random.normal(jax.random.PRNGKey(21), (n, n))
  a = a @ a.T / n + jnp.eye(n)
  got = pallas_chol_hbm.cholesky_hbm_wide(
      a, block=128, chunk=128, tw=256, interpret=True)
  np.testing.assert_allclose(got, jnp.linalg.cholesky(a), atol=5e-4)


def test_hbm_cholesky_halfwide_matches_xla():
  """v8 half-panel variant (interpret mode): stacked [D; I] sweep
  produces L_D and L_D^{-T} together; wide dual-buffered strips."""
  from hyperbo_tpu.ops import pallas_chol_hbm
  n = 512
  a = jax.random.normal(jax.random.PRNGKey(22), (n, n))
  a = a @ a.T / n + jnp.eye(n)
  got = pallas_chol_hbm.cholesky_hbm_halfwide(
      a, block=128, chunk=128, tw=256, half=256, interpret=True)
  np.testing.assert_allclose(got, jnp.linalg.cholesky(a), atol=5e-4)


def test_fused_mll_matches_dense_pipeline():
  """Single-kernel fused Gram+Cholesky+solve+logdet (interpret mode).

  quad = y^T K^-1 y must match the dense solve and logdet the dense
  factor; L parity guards the embedded v8 factorization."""
  from hyperbo_tpu.ops import pallas_mll
  n, d = 512, 4
  x = jax.random.uniform(jax.random.PRNGKey(5), (n, d)) * 2.0
  y = jax.random.normal(jax.random.PRNGKey(6), (n, 1))
  sv, da = 1.3, 0.11
  sq = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
  kmat = sv * jnp.exp(-0.5 * sq) + da * jnp.eye(n)
  lref = jnp.linalg.cholesky(kmat)
  l, quad, ld = pallas_mll.mll_fused_hbm(
      x, y, sv, da, block=128, chunk=128, tw=256, half=256,
      interpret=True)
  np.testing.assert_allclose(l, lref, atol=5e-4)
  np.testing.assert_allclose(
      float(quad), float(jnp.sum(y * jnp.linalg.solve(kmat, y))),
      rtol=1e-4)
  np.testing.assert_allclose(
      float(ld), float(jnp.sum(jnp.log(jnp.diagonal(lref)))), rtol=1e-4)


def test_fused_mll_grouped_matches_dense():
  """v11 grouped panel-major fused MLL (interpret): group=2 in-VMEM
  inner corrections + cached seg blocks must match the dense pipeline."""
  from hyperbo_tpu.ops import pallas_mll
  n, d = 512, 4
  x = jax.random.uniform(jax.random.PRNGKey(15), (n, d)) * 2.0
  y = jax.random.normal(jax.random.PRNGKey(16), (n, 1))
  sv, da = 1.3, 0.11
  sq = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
  kmat = sv * jnp.exp(-0.5 * sq) + da * jnp.eye(n)
  lref = jnp.linalg.cholesky(kmat)
  l, quad, ld = pallas_mll.mll_fused_g(
      x, y, sv, da, block=128, half=256, group=2, return_l=True,
      interpret=True)
  np.testing.assert_allclose(l, lref, atol=5e-4)
  np.testing.assert_allclose(
      float(quad), float(jnp.sum(y * jnp.linalg.solve(kmat, y))),
      rtol=1e-3)
  np.testing.assert_allclose(
      float(ld), float(jnp.sum(jnp.log(jnp.diagonal(lref)))), rtol=1e-4)


def test_fused_mll_hier_sweep_matches_dense():
  """v13 hierarchical diagonal factorization (2x2 of half-width
  sub-blocks coupled by MXU dots) matches the dense pipeline exactly
  like the flat sweep (interpret mode)."""
  from hyperbo_tpu.ops import pallas_mll
  n, d = 512, 4
  x = jax.random.uniform(jax.random.PRNGKey(25), (n, d)) * 2.0
  y = jax.random.normal(jax.random.PRNGKey(26), (n, 1))
  sv, da = 1.3, 0.11
  sq = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
  kmat = sv * jnp.exp(-0.5 * sq) + da * jnp.eye(n)
  lref = jnp.linalg.cholesky(kmat)
  l, quad, ld = pallas_mll.mll_fused_g(
      x, y, sv, da, block=128, half=256, group=2, hier_sweep=True,
      return_l=True, interpret=True)
  np.testing.assert_allclose(l, lref, atol=5e-4)
  np.testing.assert_allclose(
      float(quad), float(jnp.sum(y * jnp.linalg.solve(kmat, y))),
      rtol=1e-3)
  np.testing.assert_allclose(
      float(ld), float(jnp.sum(jnp.log(jnp.diagonal(lref)))), rtol=1e-4)


def test_fused_mll_pivot_modes_match_dense():
  """Block-pivot sweep variants (vector / pairv / quadv / octv) are
  numerically identical to the column-at-a-time sweep (interpret)."""
  from hyperbo_tpu.ops import pallas_mll
  n, d = 256, 4
  x = jax.random.uniform(jax.random.PRNGKey(35), (n, d)) * 2.0
  y = jax.random.normal(jax.random.PRNGKey(36), (n, 1))
  sv, da = 1.3, 0.11
  sq = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
  kmat = sv * jnp.exp(-0.5 * sq) + da * jnp.eye(n)
  lref = jnp.linalg.cholesky(kmat)
  # mb=8 / sweep_unroll=8 keeps the interpreted static trace ~4x
  # smaller than the hardware default (mb=32) while exercising every
  # pivot branch; hexv's p=16 exercises the p > mb clamp.
  for pm in ('scalar', 'vector', 'pair', 'pairv', 'quadv', 'octv',
             'hexv'):
    l, quad, ld = pallas_mll.mll_fused_g(
        x, y, sv, da, block=128, half=256, group=1, mb=8,
        sweep_unroll=8, value_sweep=True, pivot_mode=pm, return_l=True,
        interpret=True)
    np.testing.assert_allclose(l, lref, atol=5e-4,
                               err_msg=f'pivot_mode={pm}')


def test_fused_core_non_pd_propagates_nan():
  """An indefinite K through the differentiable fused core must come
  back NaN (value AND gradients), matching the dense
  lax.linalg.cholesky path — NOT large-but-finite garbage from the
  kernel's pivot clamp (the trainers' isfinite-freeze keys on NaN)."""
  from hyperbo_tpu.ops import pallas_mll
  n, d = 256, 4
  x = jax.random.uniform(jax.random.PRNGKey(35), (n, d)) * 2.0
  y = jax.random.normal(jax.random.PRNGKey(36), (n, 1))
  core = pallas_mll._se_nll_core_fn(128, 256, 2, True)

  # Sanity: PD inputs stay finite through value_and_grad.
  val, grads = jax.value_and_grad(core, argnums=(0, 1, 2, 3))(
      x, y, 1.3, 0.11)
  assert np.isfinite(float(val))
  assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)

  # da < 0 makes K = sv*k + da*I indefinite; the dense factorization
  # NaNs, and the fused core must agree.
  da_bad = -0.5
  sq = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
  kmat = 1.3 * jnp.exp(-0.5 * sq) + da_bad * jnp.eye(n)
  assert not np.all(np.isfinite(np.asarray(jnp.linalg.cholesky(kmat))))
  val, grads = jax.value_and_grad(core, argnums=(0, 1, 2, 3))(
      x, y, 1.3, da_bad)
  assert np.isnan(float(val))
  for g in grads:
    assert np.all(np.isnan(np.asarray(g)) | (np.asarray(g) == 0.0)), g
