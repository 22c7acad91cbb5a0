"""Gradients of the distributed MLL routes (custom VJP) on the CPU mesh.

Round-4 verdict item 1: multi-chip large-n PRE-TRAINING requires
jax.grad through `parallel.large.mll_distributed{,_fused}`. The custom
VJP reuses the forward's row-sharded factor and the closed-form NLL
adjoint G = 0.5 (k K^{-1} - alpha alpha^T) (the reference's VJP
semantics, hyperbo/basics/linalg.py:139-171, chained through the NLL
path hyperbo/gp_utils/objectives.py:144-156), so these tests assert
value_and_grad parity against the plain dense NLL gradient, leaf by
leaf, for every differentiable input (params.model, x, y).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC, retrieve_params
from hyperbo_tpu.models import kernel, mean
from hyperbo_tpu.parallel import large
from hyperbo_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices')

_WF = DEFAULT_WARP_FUNC
_EPS = 1e-6


def _dense_nll_fn(cov_func, mean_func, config=None):
  """Dense multi-draw NLL with the distributed entry points' semantics
  (logdet/2pi once per draw; trace quadratic form)."""

  def f(model, x, y):
    p = defs.GPParams(model=model, config=config or {})
    n = x.shape[0]
    k = y.shape[1]
    nv, = retrieve_params(p, ['noise_variance'], warp_func=_WF)
    kmat = cov_func(p, x, warp_func=_WF) + (
        jnp.squeeze(nv) + _EPS) * jnp.eye(n)
    delta = y - jnp.atleast_2d(mean_func(p, x, warp_func=_WF))
    l = jnp.linalg.cholesky(kmat)
    kinvy = jax.scipy.linalg.cho_solve((l, True), delta)
    return (0.5 * jnp.sum(delta * kinvy)
            + k * (jnp.sum(jnp.log(jnp.diagonal(l)))
                   + 0.5 * n * jnp.log(2 * jnp.pi)))

  return f


def _assert_tree_close(got, want, rtol, what):
  leaves_g = jax.tree_util.tree_leaves_with_path(got)
  leaves_w = jax.tree_util.tree_leaves_with_path(want)
  assert len(leaves_g) == len(leaves_w)
  for (path, g), (_, w) in zip(leaves_g, leaves_w):
    g, w = np.asarray(g), np.asarray(w)
    scale = np.max(np.abs(w)) + 1e-12
    np.testing.assert_allclose(
        g, w, atol=rtol * scale, rtol=0,
        err_msg=f'{what}: leaf {jax.tree_util.keystr(path)}')


def test_fused_grad_xla_matches_dense_multidraw():
  """value_and_grad of the fused coarse-block route (xla local backend)
  vs the dense gradient: SE kernel, 2 draws, all of (model, x, y)."""
  n, d, k = 256, 3, 2
  x = jax.random.uniform(jax.random.PRNGKey(0), (n, d))
  y = jax.random.normal(jax.random.PRNGKey(1), (n, k))
  model = {'constant': jnp.float32(0.3),
           'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': jnp.float32(0.2),
           'noise_variance': jnp.float32(-2.0)}
  mesh = mesh_lib.create_mesh(8)

  def dist(model, x, y):
    p = defs.GPParams(model=model)
    return large.mll_distributed_fused(
        mean.constant, kernel.squared_exponential, p, x, y, mesh,
        warp_func=_WF, backend='xla')

  dense = _dense_nll_fn(kernel.squared_exponential, mean.constant)
  v_d, g_d = jax.value_and_grad(dense, argnums=(0, 1, 2))(model, x, y)
  v_f, g_f = jax.value_and_grad(dist, argnums=(0, 1, 2))(model, x, y)
  np.testing.assert_allclose(float(v_f), float(v_d), rtol=1e-4)
  _assert_tree_close(g_f[0], g_d[0], 5e-3, 'd_model')
  _assert_tree_close(g_f[1], g_d[1], 1e-3, 'd_x')
  _assert_tree_close(g_f[2], g_d[2], 1e-3, 'd_y')


def test_fused_grad_matern52():
  n, d = 512, 3
  x = jax.random.uniform(jax.random.PRNGKey(9), (n, d))
  y = jax.random.normal(jax.random.PRNGKey(10), (n, 1))
  model = {'constant': jnp.float32(0.0),
           'lengthscale': jnp.ones(d) * 0.6,
           'signal_variance': jnp.float32(0.4),
           'noise_variance': jnp.float32(-2.0)}
  mesh = mesh_lib.create_mesh(8)

  def dist(model):
    p = defs.GPParams(model=model)
    return large.mll_distributed_fused(
        mean.zero, kernel.matern52, p, x, y, mesh, warp_func=_WF,
        backend='xla')

  dense = _dense_nll_fn(kernel.matern52, mean.zero)
  g_d = jax.grad(lambda m: dense(m, x, y))(model)
  g_f = jax.grad(dist)(model)
  _assert_tree_close(g_f, g_d, 5e-3, 'd_model (matern52)')


def test_fused_grad_mlp_embedding():
  """SE-over-MLP: the generic Gram-row vjp chain must deliver exact
  embedding-network gradients (no per-family adjoint code)."""
  from hyperbo_tpu.models import basis as bf
  n, d = 256, 3
  config = {'mlp_features': (8, 4)}
  x = jax.random.uniform(jax.random.PRNGKey(21), (n, d))
  y = jax.random.normal(jax.random.PRNGKey(22), (n, 1))
  mlp_params = bf.MLP(config['mlp_features']).init(
      jax.random.PRNGKey(3), x)['params']
  model = {'constant': jnp.float32(0.1),
           'lengthscale': jnp.ones(4) * 0.5,
           'signal_variance': jnp.float32(0.3),
           'noise_variance': jnp.float32(-2.0),
           'mlp_params': mlp_params}
  mesh = mesh_lib.create_mesh(8)

  def dist(model):
    p = defs.GPParams(model=model, config=config)
    return large.mll_distributed_fused(
        mean.constant, kernel.squared_exponential_mlp, p, x, y, mesh,
        warp_func=_WF, backend='xla')

  dense = _dense_nll_fn(kernel.squared_exponential_mlp, mean.constant,
                        config=config)
  g_d = jax.grad(lambda m: dense(m, x, y))(model)
  g_f = jax.grad(dist)(model)
  _assert_tree_close(g_f, g_d, 5e-3, 'd_model (mlp)')


def test_fused_grad_pallas_interpret():
  """Pallas local backend (interpret mode) on a 2-device mesh: the
  hardware-default backend's gradient — previously raising — must
  match dense. m=512 engages the fused MLL kernel for D_0, the HBM
  Cholesky for D_1 and the panel tri-inv for both W blocks."""
  n, d = 1024, 4
  x = jax.random.uniform(jax.random.PRNGKey(11), (n, d))
  y = jax.random.normal(jax.random.PRNGKey(12), (n, 1))
  model = {'constant': jnp.float32(0.2),
           'lengthscale': jnp.ones(d) * 0.5,
           'signal_variance': jnp.float32(0.3),
           'noise_variance': jnp.float32(-2.0)}
  mesh = mesh_lib.create_mesh(2)

  def dist(model):
    p = defs.GPParams(model=model)
    return large.mll_distributed_fused(
        mean.constant, kernel.squared_exponential, p, x, y, mesh,
        warp_func=_WF, backend='pallas', interpret=True)

  dense = _dense_nll_fn(kernel.squared_exponential, mean.constant)
  v_d, g_d = jax.value_and_grad(
      lambda m: dense(m, x, y))(model)
  v_f, g_f = jax.value_and_grad(dist)(model)
  np.testing.assert_allclose(float(v_f), float(v_d), rtol=5e-4)
  _assert_tree_close(g_f, g_d, 5e-3, 'd_model (pallas interpret)')


def test_fused_grad_mesh1_matches_dense():
  """1-device mesh (the real-hardware validation mesh): the backward's
  num==1 static path (blocked-SYRK LAUUM reusing the forward's full
  T = L^{-1}) must match the dense gradient."""
  n, d, k = 256, 3, 2
  x = jax.random.uniform(jax.random.PRNGKey(41), (n, d))
  y = jax.random.normal(jax.random.PRNGKey(42), (n, k))
  model = {'constant': jnp.float32(0.3),
           'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': jnp.float32(0.2),
           'noise_variance': jnp.float32(-2.0)}
  mesh = mesh_lib.create_mesh(1)

  def dist(model, x, y):
    p = defs.GPParams(model=model)
    return large.mll_distributed_fused(
        mean.constant, kernel.squared_exponential, p, x, y, mesh,
        warp_func=_WF, backend='xla')

  dense = _dense_nll_fn(kernel.squared_exponential, mean.constant)
  g_d = jax.grad(dense, argnums=(0, 1, 2))(model, x, y)
  g_f = jax.grad(dist, argnums=(0, 1, 2))(model, x, y)
  _assert_tree_close(g_f[0], g_d[0], 5e-3, 'd_model (mesh1)')
  _assert_tree_close(g_f[1], g_d[1], 1e-3, 'd_x (mesh1)')
  _assert_tree_close(g_f[2], g_d[2], 1e-3, 'd_y (mesh1)')


def test_block_cyclic_grad_matches_dense():
  """jax.grad of mll_distributed (block-cyclic route): the custom VJP
  replaces mechanical differentiation through the factorization loop."""
  n, d, k = 256, 3, 2
  x = jax.random.uniform(jax.random.PRNGKey(5), (n, d))
  y = jax.random.normal(jax.random.PRNGKey(6), (n, k))
  model = {'constant': jnp.float32(0.3),
           'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': jnp.float32(0.2),
           'noise_variance': jnp.float32(-2.0)}
  mesh = mesh_lib.create_mesh(8)

  def dist(model, x, y):
    p = defs.GPParams(model=model)
    return large.mll_distributed(
        mean.constant, kernel.squared_exponential, p, x, y, mesh,
        warp_func=_WF, block=32)

  dense = _dense_nll_fn(kernel.squared_exponential, mean.constant)
  g_d = jax.grad(dense, argnums=(0, 1, 2))(model, x, y)
  g_f = jax.grad(dist, argnums=(0, 1, 2))(model, x, y)
  _assert_tree_close(g_f[0], g_d[0], 5e-3, 'd_model (block-cyclic)')
  _assert_tree_close(g_f[1], g_d[1], 1e-3, 'd_x (block-cyclic)')
  _assert_tree_close(g_f[2], g_d[2], 1e-3, 'd_y (block-cyclic)')


def test_fused_grad_under_jit_and_adam_step():
  """The custom VJP composes with jit + optax (the pre-training loop
  shape): one Adam step through the distributed NLL reduces it."""
  import optax
  n, d = 256, 4
  x = jax.random.uniform(jax.random.PRNGKey(31), (n, d))
  y = jax.random.normal(jax.random.PRNGKey(32), (n, 1))
  model = {'constant': jnp.float32(0.0),
           'lengthscale': jnp.ones(d) * 0.3,
           'signal_variance': jnp.float32(0.0),
           'noise_variance': jnp.float32(-1.0)}
  mesh = mesh_lib.create_mesh(8)
  opt = optax.adam(1e-2)

  def loss(model):
    p = defs.GPParams(model=model)
    return large.mll_distributed_fused(
        mean.constant, kernel.squared_exponential, p, x, y, mesh,
        warp_func=_WF, backend='xla')

  @jax.jit
  def step(model, opt_state):
    v, g = jax.value_and_grad(loss)(model)
    updates, opt_state = opt.update(g, opt_state)
    return v, optax.apply_updates(model, updates), opt_state

  state = opt.init(model)
  v0, model1, state = step(model, state)
  losses = [float(v0)]
  for _ in range(10):
    v, model1, state = step(model1, state)
    losses.append(float(v))
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0], losses
