"""Batched small-matrix Cholesky-inverse kernel (ops/pallas_batch_chol).

Parity gates: B = L^{-T} against the XLA solve pipeline for both kernel
layouts (interpret mode), the padded n < 128 wrapper, NLL value + grad
parity of nll_terms_batched against the dense Cholesky pipeline, the
packed-NLL route (config['batched_chol']), and vmap safety (multistart
vmaps the whole loss over restarts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import kernel, mean
from hyperbo_tpu.models import packed as packed_lib
from hyperbo_tpu.ops import pallas_batch_chol as pbc


def _spd_batch(key, t, n):
  a = jax.random.normal(key, (t, n, n))
  return jnp.matmul(a, jnp.swapaxes(a, -1, -2)) / n + 2.0 * jnp.eye(n)


@pytest.mark.parametrize('impl', ['tasks3d', 'grid2d'])
def test_linv_t_parity(impl):
  kb = _spd_batch(jax.random.PRNGKey(0), 3, 128)
  want = pbc._linv_t_xla(kb)
  got = pbc.batched_linv_t(kb, impl=impl, interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=5e-6)


def test_linv_t_padded():
  kb = _spd_batch(jax.random.PRNGKey(1), 2, 100)
  want = pbc._linv_t_xla(kb)
  got = pbc.batched_linv_t(kb, impl='tasks3d', interpret=True)
  assert got.shape == (2, 100, 100)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=5e-6)


def test_nll_terms_value_and_grad():
  t, n = 3, 64
  kb = _spd_batch(jax.random.PRNGKey(2), t, n)
  delta = jax.random.normal(jax.random.PRNGKey(3), (t, n, 1))

  def f_new(kb, delta):
    q, ld = pbc.nll_terms_batched(kb, delta, 'tasks3d', True)
    return jnp.sum(0.5 * q + ld)

  def f_ref(kb, delta):
    c = jnp.linalg.cholesky(kb)
    kinvy = jax.scipy.linalg.cho_solve((c, True), delta)
    return jnp.sum(
        0.5 * jnp.sum(delta * kinvy, axis=(-2, -1))
        + jnp.sum(jnp.log(jnp.diagonal(c, axis1=-2, axis2=-1)), axis=-1))

  np.testing.assert_allclose(float(f_new(kb, delta)),
                             float(f_ref(kb, delta)), rtol=1e-6)
  g_new = jax.grad(f_new, argnums=(0, 1))(kb, delta)
  g_ref = jax.grad(f_ref, argnums=(0, 1))(kb, delta)
  for a, b in zip(g_new, g_ref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def _packed_setup(key, tasks=3, n=40, d=2):
  dataset = {}
  for i in range(tasks):
    k1, k2 = jax.random.split(jax.random.fold_in(key, i))
    x = jax.random.uniform(k1, (n - i, d))   # ragged task sizes
    y = jnp.sin(x.sum(-1, keepdims=True)) + 0.1 * jax.random.normal(
        k2, (n - i, 1))
    dataset[i] = defs.SubDataset(x, y)
  packed, _ = packed_lib.pack_dataset(dataset, pad_to_multiple=8)
  model = {'constant': 0.2, 'lengthscale': jnp.zeros(d),
           'signal_variance': 0.1, 'noise_variance': -3.0}
  return packed, model


def test_packed_route_value_and_grad_parity():
  packed, model = _packed_setup(jax.random.PRNGKey(4))

  def nll(model, flag):
    shim = defs.GPParams(model=model,
                         config={'batched_chol': flag})
    return packed_lib.neg_log_marginal_likelihood_packed(
        mean.constant, kernel.squared_exponential, shim, packed,
        warp_func=DEFAULT_WARP_FUNC)

  v_ref, g_ref = jax.value_and_grad(nll)(model, False)
  v_new, g_new = jax.value_and_grad(nll)(model, 'interpret')
  np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-5)
  for k in g_ref:
    np.testing.assert_allclose(np.asarray(g_new[k]), np.asarray(g_ref[k]),
                               atol=1e-4, rtol=1e-4)


def test_packed_route_gating():
  packed, model = _packed_setup(jax.random.PRNGKey(5))
  shim = defs.GPParams(model=model, config={'batched_chol': 'interpret'})
  assert packed_lib._batched_chol_route(shim, packed) == ('tasks3d', True)
  shim_off = defs.GPParams(model=model, config={'batched_chol': False})
  assert packed_lib._batched_chol_route(shim_off, packed) is None
  # n_max > 128 never routes.
  big = packed_lib.PackedDataset(
      x=jnp.zeros((2, 256, 2)), y=jnp.zeros((2, 256, 1)),
      mask=jnp.ones((2, 256), bool), count=jnp.full((2,), 256),
      task_mask=jnp.ones((2,), bool))
  assert packed_lib._batched_chol_route(shim, big) is None
  # 'auto' on CPU stays on the XLA pipeline.
  shim_auto = defs.GPParams(model=model, config={})
  assert packed_lib._batched_chol_route(shim_auto, packed) is None


def test_non_pd_propagates_nan():
  """A non-PD K must come out NaN (not finite garbage) so the trainers'
  isfinite-freeze trips exactly as on the dense-Cholesky path."""
  kb = _spd_batch(jax.random.PRNGKey(8), 2, 32)
  kb = kb.at[1].add(-10.0 * jnp.eye(32))  # task 1 indefinite
  delta = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 1))
  quad, ld = pbc.nll_terms_batched(kb, delta, 'tasks3d', True)
  assert bool(jnp.isfinite(quad[0])) and bool(jnp.isfinite(ld[0]))
  assert not bool(jnp.isfinite(quad[1])) or not bool(jnp.isfinite(ld[1]))


class _FakeTpu:
  platform = 'tpu'
  device_kind = 'TPU v5 lite'


def test_route_platform_gating(monkeypatch):
  """Forced Mosaic impls fall back to interpret off-TPU; auto needs
  32 < n_max <= 128 on TPU."""
  packed, model = _packed_setup(jax.random.PRNGKey(10))  # n_max = 40

  def shim(flag):
    return defs.GPParams(model=model, config={'batched_chol': flag})

  # On CPU: True / explicit Mosaic impls degrade to interpret mode.
  assert packed_lib._batched_chol_route(shim(True), packed) == (
      'tasks3d', True)
  assert packed_lib._batched_chol_route(shim('grid2d'), packed) == (
      'grid2d', True)
  assert packed_lib._batched_chol_route(shim('xla'), packed) == (
      'xla', False)

  monkeypatch.setattr(packed_lib.jax, 'devices', lambda: [_FakeTpu()])
  # On TPU: auto engages for n_max = 40 with the real kernel...
  assert packed_lib._batched_chol_route(shim('auto'), packed) == (
      'tasks3d', False)
  # ...but stays dense below the n_max = 32 padding-waste threshold.
  small = packed_lib.PackedDataset(
      x=jnp.zeros((2, 24, 2)), y=jnp.zeros((2, 24, 1)),
      mask=jnp.ones((2, 24), bool), count=jnp.full((2,), 24),
      task_mask=jnp.ones((2,), bool))
  assert packed_lib._batched_chol_route(shim('auto'), small) is None
  assert packed_lib._batched_chol_route(shim(True), packed) == (
      'tasks3d', False)


def test_vmap_over_models():
  """Multistart vmaps the whole loss over restart-stacked params."""
  packed, model = _packed_setup(jax.random.PRNGKey(6))
  stacked = jax.tree.map(
      lambda a: jnp.stack([jnp.asarray(a), jnp.asarray(a) + 0.1]), model)

  def nll(model):
    shim = defs.GPParams(model=model,
                         config={'batched_chol': 'interpret'})
    return packed_lib.neg_log_marginal_likelihood_packed(
        mean.constant, kernel.squared_exponential, shim, packed,
        warp_func=DEFAULT_WARP_FUNC)

  got = jax.vmap(nll)(stacked)
  want = jnp.stack([nll(jax.tree.map(lambda a: a[i], stacked))
                    for i in range(2)])
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_chunked_large_t():
  t = pbc._MAX_T3D + 5
  kb = _spd_batch(jax.random.PRNGKey(7), t, 32)
  want = pbc._linv_t_xla(kb)
  got = pbc.batched_linv_t(kb, impl='tasks3d', interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=5e-6)
