"""Parity tests for the panel-major Pallas triangular inverse
(ops/pallas_triinv) and its fused-backward integration route.

The kernel replaces ops/linalg.tri_inv_blocked + the dense -> panel
moveaxis inside ops/pallas_mll._se_core_bwd (HYPERBO_BWD_TRIINV=
'pallas'). Reference gradient semantics anchor: the per-step
value_and_grad of the NLL at hyperbo/gp_utils/gp.py:124-146 with the
cached-Cholesky VJP pattern of hyperbo/basics/linalg.py:139-171.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.ops import pallas_mll
from hyperbo_tpu.ops import pallas_triinv


def _spd_chol(n, seed=0, ridge=2.0):
  a = jax.random.normal(jax.random.PRNGKey(seed), (n, n),
                        jnp.float32) / np.sqrt(n)
  return jnp.linalg.cholesky(a @ a.T + ridge * jnp.eye(n))


@pytest.mark.parametrize('n,block,chunk,group,rows', [
    (512, 128, 256, 1, 1),    # small, ungrouped
    (512, 128, 256, 4, 1),    # grouped: nb=4, one full group
    (1536, 256, 512, 1, 1),   # panel tops NOT chunk-aligned (odd j)
    (1536, 256, 512, 2, 1),   # grouped with non-chunk-aligned group tops
    (1536, 256, 512, 4, 1),   # nb=6 % 4 != 0 -> auto-halves to 2
    (1024, 256, 512, 4, 1),   # production block/chunk/group
    (1024, 256, 512, 2, 2),   # 2-D tiled sweep (phase A + VMEM corner)
    (1024, 256, 512, 4, 4),   # full production tile
    (1024, 256, 256, 4, 4),   # tile tops chunk-aligned (chunk == block)
    (1536, 256, 512, 4, 4),   # nb=6: rows AND group auto-halve to 2
    (512, 128, 256, 2, 4),    # ig > jg, nb=4
    (2048, 256, 1024, 4, 4),  # wide DMA chunk (the r10 chunk ladder)
])
def test_tri_inv_panels_matches_solve(n, block, chunk, group, rows):
  l = _spd_chol(n, seed=n)
  tpm = pallas_triinv.tri_inv_panels(l, block=block, chunk=chunk,
                                     group=group, rows=rows,
                                     interpret=True)
  nb = n // block
  want = jax.lax.linalg.triangular_solve(
      l, jnp.eye(n, dtype=l.dtype), left_side=True, lower=True)
  want_pm = jnp.moveaxis(want.reshape(n, nb, block), 1, 0)
  scale = float(jnp.max(jnp.abs(want)))
  np.testing.assert_allclose(np.asarray(tpm), np.asarray(want_pm),
                             atol=5e-4 * scale)


def test_tri_inv_panels_ignores_upper_triangle():
  """Finite garbage above the diagonal must not influence the result
  (the chunk reads overshoot into those columns by design)."""
  n, block, chunk = 1024, 256, 512
  l = _spd_chol(n, seed=4)
  upper = jnp.triu(
      jnp.full((n, n), 7.5, jnp.float32), k=1)
  got = pallas_triinv.tri_inv_panels(l + upper, block=block,
                                     chunk=chunk, interpret=True)
  want = pallas_triinv.tri_inv_panels(l, block=block, chunk=chunk,
                                      interpret=True)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_alpha_from_panels():
  n, block = 512, 128
  l = _spd_chol(n, seed=2)
  tpm = pallas_triinv.tri_inv_panels(l, block=block, chunk=256,
                                     interpret=True)
  delta = jax.random.normal(jax.random.PRNGKey(5), (n, 1), jnp.float32)
  got = pallas_triinv.alpha_from_panels(tpm, delta)
  linv = jax.lax.linalg.triangular_solve(
      l, jnp.eye(n, dtype=l.dtype), left_side=True, lower=True)
  want = linv.T @ (linv @ delta)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=1e-4 * float(jnp.max(jnp.abs(want))))


def _bwd_route(l, x, delta, sv, triinv):
  return pallas_mll._se_core_bwd(
      l, x, delta, sv, None, 'se', interpret=True,
      bwd_cfg=(True, 'gemm', 'high', triinv))


@pytest.mark.parametrize('triinv', ['pallas', 'pallas2'])
def test_se_core_bwd_pallas_route_matches_recursion_route(triinv):
  """End-to-end fused backward with HYPERBO_BWD_TRIINV='pallas' (1-D
  grouped sweep) / 'pallas2' (2-D tiled sweep) vs '1' — same kernel
  consuming T from the different producers."""
  n, d = 1024, 4
  x = jax.random.uniform(jax.random.PRNGKey(11), (n, d), jnp.float32)
  delta = jax.random.normal(jax.random.PRNGKey(12), (n, 1), jnp.float32)
  sv, da = jnp.float32(1.3), jnp.float32(0.7)
  sq = jnp.sum(x * x, axis=1, keepdims=True)
  r2 = jnp.maximum(sq + sq.T - 2.0 * x @ x.T, 0.0)
  k = sv * jnp.exp(-0.5 * r2) + da * jnp.eye(n)
  l = jnp.linalg.cholesky(k)
  dx_p, al_p, dsv_p, dda_p = _bwd_route(l, x, delta, sv, triinv)
  dx_r, al_r, dsv_r, dda_r = _bwd_route(l, x, delta, sv, '1')
  sc = float(jnp.max(jnp.abs(dx_r))) + 1e-8
  assert float(jnp.max(jnp.abs(dx_p - dx_r))) / sc < 1e-3
  np.testing.assert_allclose(np.asarray(al_p), np.asarray(al_r),
                             atol=1e-4)
  np.testing.assert_allclose(float(dsv_p), float(dsv_r), rtol=5e-3,
                             atol=1e-3)
  np.testing.assert_allclose(float(dda_p), float(dda_r), rtol=1e-3)


@pytest.mark.parametrize('layout', ['wide', 'blocks'])
@pytest.mark.parametrize('n,block,chunk,group,rows', [
    (1024, 256, 512, 2, 1),    # 1-D grouped kernel, panel input
    (1024, 256, 512, 2, 4),    # tiled kernel, panel input
    (2048, 256, 1024, 2, 4),   # wide DMA chunk
    (1536, 256, 512, 4, 4),    # rows AND group auto-halve
])
def test_tri_inv_panel_input_matches_dense(n, block, chunk, group, rows,
                                           layout):
  """panel_input=True (L already panel-major, the fused forward's
  layout — contiguous panel-block DMAs) must match the dense-input
  sweep in interpret mode for BOTH VMEM layouts ('wide' is
  bit-identical compute; 'blocks' reorders the chunk accumulation into
  per-kk dots); diag_transposed additionally accepts the forward
  kernel's transposed diagonal-block storage."""
  l = _spd_chol(n, seed=n + 1)
  nb = n // block
  lpm = jnp.moveaxis(l.reshape(n, nb, block), 1, 0)
  want = pallas_triinv.tri_inv_panels(l, block=block, chunk=chunk,
                                      group=group, rows=rows,
                                      interpret=True)
  got = pallas_triinv.tri_inv_panels(lpm, block=block, chunk=chunk,
                                     group=group, rows=rows,
                                     panel_input=True,
                                     panel_layout=layout,
                                     interpret=True)
  scale = float(jnp.max(jnp.abs(want)))
  if layout == 'wide':
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
  else:
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5 * scale)
  idx = jnp.arange(nb)
  blocks = lpm.reshape(nb, nb, block, block)
  lpm_t = blocks.at[idx, idx].set(
      jnp.swapaxes(blocks[idx, idx], -1, -2)).reshape(nb, n, block)
  got_t = pallas_triinv.tri_inv_panels(lpm_t, block=block, chunk=chunk,
                                       group=group, rows=rows,
                                       panel_input=True,
                                       diag_transposed=True,
                                       panel_layout=layout,
                                       interpret=True)
  np.testing.assert_allclose(np.asarray(got_t), np.asarray(want),
                             atol=5e-4 * scale)


def test_se_core_bwd_panel_residual_matches_dense_residual():
  """_se_core_bwd fed the panel-major L residual (the fused fwd's
  return_l='panels' output: raw panels, diag blocks transposed) must
  match the dense-L pallas route exactly (same kernels, contiguous
  reads)."""
  n, d = 1024, 4
  x = jax.random.uniform(jax.random.PRNGKey(31), (n, d), jnp.float32)
  delta = jax.random.normal(jax.random.PRNGKey(32), (n, 1), jnp.float32)
  sv, da = jnp.float32(1.2), jnp.float32(0.8)
  sq = jnp.sum(x * x, axis=1, keepdims=True)
  r2 = jnp.maximum(sq + sq.T - 2.0 * x @ x.T, 0.0)
  k = sv * jnp.exp(-0.5 * r2) + da * jnp.eye(n)
  l = jnp.linalg.cholesky(k)
  block = 256
  nb = n // block
  idx = jnp.arange(nb)
  lpm = jnp.moveaxis(l.reshape(n, nb, block), 1, 0)
  blocks = lpm.reshape(nb, nb, block, block)
  lpm_t = blocks.at[idx, idx].set(
      jnp.swapaxes(blocks[idx, idx], -1, -2)).reshape(nb, n, block)
  dx_p, al_p, dsv_p, dda_p = _bwd_route(lpm_t, x, delta, sv, 'pallas')
  dx_d, al_d, dsv_d, dda_d = _bwd_route(l, x, delta, sv, 'pallas')
  sc = float(jnp.max(jnp.abs(dx_d))) + 1e-8
  assert float(jnp.max(jnp.abs(dx_p - dx_d))) / sc < 1e-4
  np.testing.assert_allclose(np.asarray(al_p), np.asarray(al_d),
                             atol=1e-5)
  np.testing.assert_allclose(float(dsv_p), float(dsv_d), rtol=1e-3)
  np.testing.assert_allclose(float(dda_p), float(dda_d), rtol=1e-3)


def test_fused_vjp_saves_panel_residual_end_to_end():
  """Full custom-VJP pipeline with bwd_cfg = fused + pallas tri-inv:
  the fwd saves L panel-major (return_l='panels') and the gradients
  must match the dense-pipeline gradients (same classes as
  tests/test_objectives.py::test_fused_bwd_knobs_gradient_parity)."""
  from hyperbo_tpu.ops import pallas_mll
  n, d = 512, 3
  x = jax.random.uniform(jax.random.PRNGKey(41), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(42), (n, 1), jnp.float32)

  def nll(params, cfg):
    core = pallas_mll._se_nll_core_fn(256, 512, 2, True, 2, 'se',
                                      'octv', False, cfg)
    return core(x * params['ls'], y - params['c'], params['sv'],
                params['da'])

  p0 = {'ls': jnp.float32(0.9), 'c': jnp.float32(0.1),
        'sv': jnp.float32(1.1), 'da': jnp.float32(0.5)}
  cfg_pallas = (True, 'gemm', 'high', 'pallas')
  cfg_dense = (False, 'gemm', 'high', '0')
  assert pallas_mll._bwd_panel_l_route(n, cfg_pallas)
  v_p, g_p = jax.value_and_grad(lambda p: nll(p, cfg_pallas))(p0)
  v_d, g_d = jax.value_and_grad(lambda p: nll(p, cfg_dense))(p0)
  np.testing.assert_allclose(float(v_p), float(v_d), rtol=1e-5)
  for kk in p0:
    np.testing.assert_allclose(
        float(g_p[kk]), float(g_d[kk]), rtol=2e-2,
        atol=5e-3 * (abs(float(g_d[kk])) + 1e-3))


def test_pallas_route_falls_back_on_indivisible_n():
  """n not a multiple of the kernel's chunk grid must route through the
  recursion, not crash (the fused bwd kernel itself also requires
  n % CHUNK == 0, so such n never reaches either kernel)."""
  n, d = 640, 3   # % 512 != 0 -> _bwd_fused_wanted False -> XLA chain
  x = jax.random.uniform(jax.random.PRNGKey(21), (n, d), jnp.float32)
  delta = jax.random.normal(jax.random.PRNGKey(22), (n, 1), jnp.float32)
  sv, da = jnp.float32(1.1), jnp.float32(0.6)
  sq = jnp.sum(x * x, axis=1, keepdims=True)
  r2 = jnp.maximum(sq + sq.T - 2.0 * x @ x.T, 0.0)
  k = sv * jnp.exp(-0.5 * r2) + da * jnp.eye(n)
  l = jnp.linalg.cholesky(k)
  dx_p = _bwd_route(l, x, delta, sv, 'pallas')[0]
  dx_r = _bwd_route(l, x, delta, sv, '0')[0]
  sc = float(jnp.max(jnp.abs(dx_r))) + 1e-8
  assert float(jnp.max(jnp.abs(dx_p - dx_r))) / sc < 1e-3
