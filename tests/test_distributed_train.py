"""Multi-chip large-n pre-training (`parallel.large.fit_adam_large_sharded`).

The distributed-MLL custom VJP (tests/test_distributed_grad.py) makes
the loss differentiable; these tests assert the full TRAINER built on it
— the reference's adam path (hyperbo/gp_utils/gp.py:114-157) for one
task row-sharded over the mesh — computes the same optimization
trajectory as the single-device dense trainer, including the hyperprior
regularization semantics (hyperbo/gp_utils/objectives.py:198-207).
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
from hyperbo_tpu.train import adam as adam_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices')

_WF = DEFAULT_WARP_FUNC
_EPS = 1e-6


def _problem(n=64, d=3, k=2, seed=0):
  x = jax.random.uniform(jax.random.PRNGKey(seed), (n, d))
  y = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, k))
  model = {'constant': jnp.float32(0.3),
           'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': jnp.float32(0.2),
           'noise_variance': jnp.float32(-2.0)}
  return x, y, model


def _dense_loss_fn(config):
  """Single-device full-batch loss with the distributed trainer's
  semantics (multi-draw NLL - hyperprior log-prob)."""
  from hyperbo_tpu.models.objectives import _hyperprior_log_prob

  def f(model, batch):
    x, y = batch
    p = defs.GPParams(model=model, config=config)
    n, k = x.shape[0], y.shape[1]
    nv, = retrieve_params(p, ['noise_variance'], warp_func=_WF)
    kmat = kernel.squared_exponential(p, x, warp_func=_WF) + (
        jnp.squeeze(nv) + _EPS) * jnp.eye(n)
    delta = y - jnp.atleast_2d(mean.constant(p, x, warp_func=_WF))
    l = jnp.linalg.cholesky(kmat)
    kinvy = jax.scipy.linalg.cho_solve((l, True), delta)
    nll = (0.5 * jnp.sum(delta * kinvy)
           + k * (jnp.sum(jnp.log(jnp.diagonal(l)))
                  + 0.5 * n * jnp.log(2 * jnp.pi)))
    return nll - _hyperprior_log_prob(p, _WF)

  return f


def test_fit_adam_large_sharded_matches_dense_trainer():
  """Same initial params + full-batch loss + Adam => the mesh trainer
  must reproduce the dense single-device trajectory step by step."""
  x, y, model = _problem()
  config = {'learning_rate': 1e-2, 'max_training_step': 6}
  mesh = mesh_lib.create_mesh(8)

  got_model, got_losses = large.fit_adam_large_sharded(
      mean.constant, kernel.squared_exponential, model, x, y, config,
      mesh, warp_func=_WF, route='fused', backend='xla',
      key=jax.random.PRNGKey(4))
  want_model, want_losses = adam_lib.fit_adam_scan(
      _dense_loss_fn(config), model, (x, y), None, config,
      key=jax.random.PRNGKey(4))

  np.testing.assert_allclose(np.asarray(got_losses),
                             np.asarray(want_losses), rtol=2e-4)
  for name in sorted(model):
    np.testing.assert_allclose(
        np.asarray(got_model[name]), np.asarray(want_model[name]),
        atol=2e-4 * (np.max(np.abs(np.asarray(want_model[name]))) + 1.0),
        rtol=0, err_msg=f'model leaf {name}')
  assert float(got_losses[-1]) < float(got_losses[0])


def test_fit_adam_large_sharded_block_cyclic_route():
  """route='cyclic' (block-cyclic distributed Cholesky) trains too."""
  x, y, model = _problem(seed=10)
  config = {'learning_rate': 1e-2, 'max_training_step': 4}
  mesh = mesh_lib.create_mesh(8)
  got_model, losses = large.fit_adam_large_sharded(
      mean.constant, kernel.squared_exponential, model, x, y, config,
      mesh, warp_func=_WF, route='cyclic')
  _, want_losses = adam_lib.fit_adam_scan(
      _dense_loss_fn(config), model, (x, y), None, config)
  np.testing.assert_allclose(np.asarray(losses),
                             np.asarray(want_losses), rtol=2e-4)
  assert all(np.isfinite(np.asarray(losses)))
  assert any(float(jnp.max(jnp.abs(got_model[k2] - model[k2]))) > 0
             for k2 in model)


def test_gp_class_routes_distributed_mesh():
  """GP.train() with config['distributed_mesh'] runs the multi-chip
  trainer and produces the dense single-device trajectory's params."""
  from hyperbo_tpu.models import gp as gp_lib
  x, y, model = _problem(k=1, seed=30)
  mesh = mesh_lib.create_mesh(8)
  config = {'method': 'adam', 'learning_rate': 1e-2,
            'max_training_step': 5, 'batch_size': x.shape[0],
            'objective': 'nll', 'distributed_mesh': mesh,
            'distributed_backend': 'xla'}
  m = gp_lib.GP({'big': defs.SubDataset(x, y)}, mean.constant,
                kernel.squared_exponential,
                defs.GPParams(model=dict(model), config=config), _WF)
  m.initialize_params(jax.random.PRNGKey(0))
  m.train()
  want_model, _ = adam_lib.fit_adam_scan(
      _dense_loss_fn(config), model, (x, y), None, config)
  for name in sorted(model):
    np.testing.assert_allclose(
        np.asarray(m.params.model[name]), np.asarray(want_model[name]),
        atol=2e-4 * (np.max(np.abs(np.asarray(want_model[name]))) + 1.0),
        rtol=0, err_msg=f'model leaf {name}')


def test_gp_class_routes_task_mesh():
  """GP.train() with config['task_mesh'] shards the packed tasks over
  the mesh and reproduces the single-device packed trajectory."""
  from hyperbo_tpu.models import gp as gp_lib
  mesh = mesh_lib.create_mesh(8)
  key = jax.random.PRNGKey(3)
  dataset = {}
  for t in range(8):
    k1, k2 = jax.random.split(jax.random.fold_in(key, t))
    xt = jax.random.uniform(k1, (16, 3))
    dataset[t] = defs.SubDataset(xt, jax.random.normal(k2, (16, 1)))
  model = {'constant': jnp.float32(0.1),
           'lengthscale': jnp.ones(3) * 0.5,
           'signal_variance': jnp.float32(0.1),
           'noise_variance': jnp.float32(-2.0)}
  base = {'method': 'adam', 'learning_rate': 1e-2,
          'max_training_step': 6, 'batch_size': 16, 'objective': 'nll'}

  def train(extra):
    m = gp_lib.GP(dict(dataset), mean.constant,
                  kernel.squared_exponential,
                  defs.GPParams(model=dict(model),
                                config=dict(base, **extra)), _WF)
    m.initialize_params(jax.random.PRNGKey(0))
    m.train(key=jax.random.PRNGKey(11))
    return m.params.model

  got = train({'task_mesh': mesh})
  want = train({})
  for name in sorted(model):
    np.testing.assert_allclose(
        np.asarray(got[name]), np.asarray(want[name]),
        atol=2e-4 * (np.max(np.abs(np.asarray(want[name]))) + 1.0),
        rtol=0, err_msg=f'model leaf {name}')


def test_make_fit_adam_large_sharded_runner_reuse():
  """The memoized runner computes the same trajectory as the one-shot
  trainer and is reusable across same-shaped calls (one trace)."""
  x, y, model = _problem(seed=50, k=1)
  config = {'learning_rate': 1e-2, 'max_training_step': 5}
  mesh = mesh_lib.create_mesh(8)
  key = jax.random.PRNGKey(9)
  run = large.make_fit_adam_large_sharded(
      mean.constant, kernel.squared_exponential, config, mesh,
      warp_func=_WF, backend='xla')
  got_model, got_losses = run(model, x, y, key)
  want_model, want_losses = large.fit_adam_large_sharded(
      mean.constant, kernel.squared_exponential, model, x, y, config,
      mesh, warp_func=_WF, backend='xla', key=key)
  # Same loss trajectory class (different per-step PRNG threading is
  # irrelevant here: subsample_fn is None so keys are unused).
  np.testing.assert_allclose(np.asarray(got_losses),
                             np.asarray(want_losses), rtol=2e-4)
  for name in sorted(model):
    np.testing.assert_allclose(
        np.asarray(got_model[name]), np.asarray(want_model[name]),
        atol=2e-4 * (np.max(np.abs(np.asarray(want_model[name]))) + 1.0),
        rtol=0, err_msg=f'model leaf {name}')
  # Second same-shaped call reuses the compiled program (and a fresh
  # start point trains too).
  m2, l2 = run({k2: v2 + 0.05 for k2, v2 in model.items()}, x, y, key)
  assert np.isfinite(np.asarray(l2)).all()
  assert float(l2[-1]) < float(l2[0])


def test_bwd_precision_knob_parsing(monkeypatch):
  """HYPERBO_DIST_BWD_PREC: defaults to HIGH (the r18d-validated
  3-pass class), parses case-insensitively, rejects unknown values."""
  monkeypatch.delenv('HYPERBO_DIST_BWD_PREC', raising=False)
  assert large._bwd_precision() == jax.lax.Precision.HIGH
  monkeypatch.setenv('HYPERBO_DIST_BWD_PREC', 'HIGHEST')
  assert large._bwd_precision() == jax.lax.Precision.HIGHEST
  monkeypatch.setenv('HYPERBO_DIST_BWD_PREC', 'bogus')
  with pytest.raises(ValueError, match='HYPERBO_DIST_BWD_PREC'):
    large._bwd_precision()


def test_gp_class_distributed_mesh_fallbacks():
  """Configurations outside the large-n regime must FALL BACK to the
  single-device adam path (not crash, not silently change objective):
  multi-draw y (the class objective's summed (k,k) NLL differs from
  the distributed trace form), a mesh without the expected axis name,
  and num_restarts > 1."""
  from hyperbo_tpu.models import gp as gp_lib
  x, y, model = _problem(k=2, seed=33)
  mesh = mesh_lib.create_mesh(8)
  base = {'method': 'adam', 'learning_rate': 1e-2,
          'max_training_step': 2, 'batch_size': x.shape[0],
          'objective': 'nll', 'distributed_mesh': mesh,
          'distributed_backend': 'xla'}

  for tag, ds_k, cfg in (
      ('multi-draw', 2, {}),
      ('axis-name', 1, {'distributed_axis': 'nope'}),
      ('restarts', 1, {'num_restarts': 2}),
  ):
    config = dict(base, **cfg)
    yk = y if ds_k == 2 else y[:, :1]
    m = gp_lib.GP({'big': defs.SubDataset(x, yk)}, mean.constant,
                  kernel.squared_exponential,
                  defs.GPParams(model=dict(model), config=config), _WF)
    m.initialize_params(jax.random.PRNGKey(0))
    m.train()  # must complete via the fallback path
    assert any(
        float(jnp.max(jnp.abs(m.params.model[k2] - model[k2]))) > 0
        for k2 in model), f'{tag}: fallback path did not train'


def test_fit_adam_large_sharded_priors():
  """config['priors'] regularizes the mesh loss exactly like the
  reference NLL path (first scan loss == dense NLL - log p(theta))."""
  from hyperbo_tpu.models import priors as priors_lib
  x, y, model = _problem(seed=20, k=1)
  config = {'learning_rate': 1e-2, 'max_training_step': 2,
            'priors': priors_lib.DEFAULT_PRIORS}
  mesh = mesh_lib.create_mesh(8)
  _, losses = large.fit_adam_large_sharded(
      mean.constant, kernel.squared_exponential, model, x, y, config,
      mesh, warp_func=_WF, route='fused', backend='xla')
  want0 = float(_dense_loss_fn(config)(model, (x, y)))
  np.testing.assert_allclose(float(losses[0]), want0, rtol=1e-4)
