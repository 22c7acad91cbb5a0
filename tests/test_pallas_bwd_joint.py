"""Parity tests for the joint fused backward (ops/pallas_bwd_joint).

One Pallas kernel computes ALL fused-NLL adjoints from L: tri-inv +
u = T delta (riding the sweep's serial corner) + alpha (half-T
stream) + tiled SYRK consumption. Must match the XLA backward chain
(ops/pallas_mll._se_core_bwd) at the f32 class — the same bar the
standalone kernels meet (tests/test_pallas_mll_bwd.py). Reference
gradient semantics anchor: hyperbo/gp_utils/gp.py:124-146.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.ops import pallas_bwd_joint
from hyperbo_tpu.ops import pallas_mll


def _problem(n=512, d=3, key=0, masked=False):
  k0 = jax.random.PRNGKey(key)
  x = jax.random.uniform(k0, (n, d), jnp.float32)
  delta = jax.random.normal(jax.random.fold_in(k0, 1), (n, 1),
                            jnp.float32)
  sv, da = jnp.float32(1.3), jnp.float32(0.5)
  valid = None
  pair = 1.0
  if masked:
    valid = (jnp.arange(n) < int(0.78 * n)).astype(jnp.float32)
    x = x * valid[:, None]
    delta = delta * valid[:, None]
    pair = valid[:, None] * valid[None, :]
  sq = jnp.sum(x * x, axis=1, keepdims=True)
  r2 = jnp.maximum(sq + sq.T - 2.0 * x @ x.T, 0.0)
  k = sv * jnp.exp(-0.5 * r2) * pair + da * jnp.eye(n)
  l = jnp.linalg.cholesky(k)
  return x, delta, sv, valid, l


def _want(l, x, delta, sv, valid):
  return pallas_mll._se_core_bwd(l, x, delta, sv, valid, 'se',
                                 bwd_cfg=(False, 'gemm', 'high', '0'))


def _check(got, want, sv):
  d_x, alpha, dsv_raw, d_da = got
  w_dx, w_alpha, w_dsv, w_dda = want
  sc = np.abs(np.asarray(w_dx)).max() + 1e-8
  assert np.abs(np.asarray(d_x) - np.asarray(w_dx)).max() / sc < 2e-3
  np.testing.assert_allclose(np.asarray(alpha), np.asarray(w_alpha),
                             atol=1e-4, rtol=1e-3)
  np.testing.assert_allclose(float(dsv_raw / sv), float(w_dsv),
                             atol=5e-3, rtol=1e-2)
  np.testing.assert_allclose(float(d_da), float(w_dda), rtol=1e-3)


@pytest.mark.parametrize('ti,sy', [((2, 2, 256), (2, 2, 256)),
                                   ((1, 1, 128), (1, 1, 128)),
                                   ((4, 2, 128), (2, 4, 128))])
def test_joint_matches_xla_chain(ti, sy):
  """Dense-L input across tile shapes — incl. the sequential 1x1 and
  mixed tri-inv/SYRK tiles (straddle + alignment paths)."""
  x, delta, sv, valid, l = _problem()
  got = pallas_bwd_joint.mll_bwd_joint(
      l, x, delta, sv, valid, block=128,
      ti_chunk=ti[2], ti_rows=ti[0], ti_group=ti[1],
      sy_chunk=sy[2], sy_rows=sy[0], sy_group=sy[1],
      panel_input=False, diag_transposed=False, interpret=True)
  _check(got, _want(l, x, delta, sv, valid), sv)


def test_joint_masked():
  """Packed/masked path: valid_i * valid_j kernel factors, with the
  (B, 1) valid columns synthesized in-kernel (col_transpose)."""
  x, delta, sv, valid, l = _problem(masked=True, key=7)
  got = pallas_bwd_joint.mll_bwd_joint(
      l, x, delta, sv, valid, block=128,
      ti_chunk=256, ti_rows=2, ti_group=2,
      sy_chunk=256, sy_rows=2, sy_group=2,
      panel_input=False, diag_transposed=False, interpret=True)
  _check(got, _want(l, x, delta, sv, valid), sv)


def test_joint_panel_input_transposed_diag():
  """Production input convention: L panel-major with D^T diagonal
  blocks (the fused forward's return_l='panels' layout), both panel
  VMEM layouts."""
  n, block = 512, 128
  x, delta, sv, valid, l = _problem(n=n, key=11)
  nb = n // block
  idx = jnp.arange(nb)
  lpm = jnp.moveaxis(l.reshape(n, nb, block), 1, 0)
  blocks = lpm.reshape(nb, nb, block, block)
  lpm_t = blocks.at[idx, idx].set(
      jnp.swapaxes(blocks[idx, idx], -1, -2)).reshape(nb, n, block)
  want = _want(l, x, delta, sv, valid)
  for layout in ('blocks', 'wide'):
    got = pallas_bwd_joint.mll_bwd_joint(
        lpm_t, x, delta, sv, valid, block=block,
        ti_chunk=256, ti_rows=2, ti_group=2, ti_layout=layout,
        sy_chunk=256, sy_rows=2, sy_group=2,
        panel_input=True, diag_transposed=True, interpret=True)
    _check(got, want, sv)


def test_joint_dispatch_env(monkeypatch):
  """HYPERBO_BWD_JOINT=1 routes _se_core_bwd's panel-L pallas branch
  through the joint kernel; adjoints match the two-kernel route."""
  from hyperbo_tpu.ops import pallas_mll_bwd
  n, block = 512, 128
  x, delta, sv, valid, l = _problem(n=n, key=13)
  nb = n // block
  idx = jnp.arange(nb)
  lpm = jnp.moveaxis(l.reshape(n, nb, block), 1, 0)
  blocks = lpm.reshape(nb, nb, block, block)
  lpm_t = blocks.at[idx, idx].set(
      jnp.swapaxes(blocks[idx, idx], -1, -2)).reshape(nb, n, block)
  cfg = (True, 'gemm', 'high', 'pallas2x2x256')
  monkeypatch.setattr(pallas_mll_bwd, 'BLOCK', block)
  monkeypatch.setenv('HYPERBO_BWD_TILE', '2x2x256')
  monkeypatch.setenv('HYPERBO_BWD_JOINT', '0')
  base = pallas_mll._se_core_bwd(lpm_t, x, delta, sv, None, 'se',
                                 interpret=True, bwd_cfg=cfg)
  monkeypatch.setenv('HYPERBO_BWD_JOINT', '1')
  joint = pallas_mll._se_core_bwd(lpm_t, x, delta, sv, None, 'se',
                                  interpret=True, bwd_cfg=cfg)
  sc = np.abs(np.asarray(base[0])).max() + 1e-8
  assert (np.abs(np.asarray(joint[0]) - np.asarray(base[0])).max() / sc
          < 1e-4)
  # alpha: the in-kernel chunk order differs from the XLA einsum's —
  # f32-reorder class.
  np.testing.assert_allclose(np.asarray(joint[1]), np.asarray(base[1]),
                             atol=3e-4, rtol=1e-3)
  np.testing.assert_allclose(float(joint[2]), float(base[2]), rtol=1e-3)
  np.testing.assert_allclose(float(joint[3]), float(base[3]), rtol=1e-3)


def test_joint_never_engages_by_default(monkeypatch):
  """The joint megakernel is REFUTED on hardware (wrong d_x,
  tile-config-dependent; PERF.md r13/r14) — it must stay opt-in.
  Guard: without HYPERBO_BWD_JOINT=1 the backward must not call it,
  whatever the rest of the config says."""
  import jax
  import jax.numpy as jnp
  from hyperbo_tpu.ops import pallas_bwd_joint as pj
  from hyperbo_tpu.ops import pallas_mll

  monkeypatch.delenv('HYPERBO_BWD_JOINT', raising=False)
  called = []
  monkeypatch.setattr(
      pj, 'mll_bwd_joint',
      lambda *a, **k: called.append(True) or (_ for _ in ()).throw(
          AssertionError('joint kernel engaged without opt-in')))
  n, d = 1024, 4
  x = jax.random.uniform(jax.random.PRNGKey(0), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(1), (n, 1), jnp.float32)
  core = pallas_mll._se_nll_core_fn(
      256, 512, 2, True, 2, 'se', 'octv', False,
      (True, 'gemm', 'high', 'pallas'))
  val, grad = jax.value_and_grad(lambda xv: core(xv, y, 1.3, 0.1))(x)
  assert not called
  assert bool(jnp.isfinite(val)) and bool(jnp.all(jnp.isfinite(grad)))
