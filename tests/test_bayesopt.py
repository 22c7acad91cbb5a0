"""BO loop tests: run_bayesopt over all acquisitions on synthetic data;
on-device scan loop parity with the host loop; oracle path.

Mirrors reference hyperbo/bo_utils/bayesopt_test.py:46-103 and extends it
with the on-device fast path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.models import gp
from hyperbo_tpu.models import kernel
from hyperbo_tpu.models import mean
from hyperbo_tpu.bo import bayesopt
from hyperbo_tpu.bo import const
from hyperbo_tpu.bo import ondevice
from hyperbo_tpu.data import synthetic

GPParams = defs.GPParams
SubDataset = defs.SubDataset


def _setup(key):
  params = GPParams(
      model={'constant': 5., 'lengthscale': jnp.array([.1, .1]),
             'signal_variance': 1.0, 'noise_variance': 0.01},
      config={'method': 'adam', 'learning_rate': 1e-3,
              'max_training_step': 2, 'batch_size': 10,
              'objective': 'nll', 'retrain': 0})
  dataset, sdk, queried = synthetic.random(
      key, mean.constant, kernel.squared_exponential, params, dim=2,
      n_observed=4, n_queries=15, n_func_historical=3,
      m_points_historical=6)
  return params, dataset, sdk, queried


@pytest.mark.parametrize('acname', list(const.ACFUN.keys()))
def test_run_bayesopt(acname):
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(0))
  iters = 3
  n_init = dataset[sdk].x.shape[0]
  obs, best, model_params = bayesopt.run_bayesopt(
      dataset=dict(dataset), sub_dataset_key=sdk,
      queried_sub_dataset=queried,
      mean_func=mean.constant, cov_func=kernel.squared_exponential,
      init_params=GPParams(model=dict(params.model),
                           config=dict(params.config)),
      ac_func=const.ACFUN[acname], iters=iters,
      init_random_key=jax.random.PRNGKey(1), method='hyperbo')
  x_obs, y_obs = obs
  assert x_obs.shape == (n_init + iters, 2)
  assert y_obs.shape == (n_init + iters, 1)
  # best_query matches the max of the queried set.
  np.testing.assert_allclose(best[1], jnp.max(queried.y))


def test_ondevice_matches_host_loop():
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(2))
  iters = 5
  model = gp.GP(dict(dataset), mean.constant, kernel.squared_exponential,
                GPParams(model=dict(params.model),
                         config=dict(params.config)), None)
  host = bayesopt.simulated_bayesopt(
      model, 'test', queried, const.ACFUN['expected_improvement'], iters)
  xo, yo, sel = ondevice.simulated_bayesopt_ondevice(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=iters, acquisition='ei',
      num_train_tasks=len(dataset))
  np.testing.assert_allclose(np.asarray(host.y).flatten(),
                             np.asarray(yo).flatten(), atol=1e-4)
  assert sel.shape == (iters,)


def test_ondevice_with_init_obs():
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(3))
  init_x = queried.x[:2]
  init_y = queried.y[:2]
  xo, yo, sel = ondevice.simulated_bayesopt_ondevice(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=3, acquisition='ucb',
      num_train_tasks=len(dataset), init_obs=(init_x, init_y))
  assert xo.shape == (5, 2)
  np.testing.assert_allclose(xo[:2], init_x, atol=1e-6)


def test_oracle_path():
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(4))
  oracle = lambda x: jnp.sin(5 * x[:, :1])
  n_init = dataset[sdk].x.shape[0]
  obs, best, _ = bayesopt.run_bayesopt(
      dataset=dict(dataset), sub_dataset_key=sdk,
      queried_sub_dataset=oracle,
      mean_func=mean.constant, cov_func=kernel.squared_exponential,
      init_params=GPParams(model=dict(params.model),
                           config=dict(params.config)),
      ac_func=const.ACFUN['expected_improvement'], iters=2,
      init_random_key=jax.random.PRNGKey(5), data_loader_name='uniform')
  assert best is None
  assert obs[0].shape == (n_init + 2, 2)
  # refined points stay in [0, 1]^d
  assert np.all(np.asarray(obs[0][n_init:]) >= 0)
  assert np.all(np.asarray(obs[0][n_init:]) <= 1)


def test_get_best_datapoint():
  x = jnp.arange(6.).reshape(3, 2)
  y = jnp.array([[1.], [3.], [2.]])
  bx, by = bayesopt.get_best_datapoint(SubDataset(x, y))
  np.testing.assert_allclose(by, 3.)
  np.testing.assert_allclose(bx, x[1])
  assert bayesopt.get_best_datapoint(
      SubDataset(jnp.zeros((0, 2)), jnp.zeros((0, 1)))) is None


def test_retrain_model_guard():
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(6))
  from hyperbo_tpu.models import objectives as obj
  model = gp.GP(dict(dataset), mean.constant, kernel.squared_exponential,
                GPParams(model=dict(params.model),
                         config={**params.config, 'retrain': 1,
                                 'objective': obj.regkl}), None)
  with pytest.raises(ValueError):
    bayesopt.retrain_model(model, sub_dataset_key=sdk)


@pytest.mark.parametrize('acname,hostfn', [
    ('ucb', 'ucb'), ('ucb2', 'ucb2'), ('pi', 'probability_of_improvement'),
    ('pi2', 'pi2'), ('pi3', 'pi3'),
])
def test_ondevice_matches_host_loop_other_acquisitions(acname, hostfn):
  from hyperbo_tpu.bo import acfun
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(7))
  iters = 4
  model = gp.GP(dict(dataset), mean.constant, kernel.squared_exponential,
                GPParams(model=dict(params.model),
                         config=dict(params.config)), None)
  host_ac = const.ACFUN.get(hostfn, getattr(acfun, hostfn, None))
  host = bayesopt.simulated_bayesopt(
      model, 'test', queried, host_ac, iters)
  xo, yo, sel = ondevice.simulated_bayesopt_ondevice(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=iters,
      acquisition=acname, num_train_tasks=len(dataset))
  np.testing.assert_allclose(np.asarray(host.y).flatten(),
                             np.asarray(yo).flatten(), atol=1e-4)


def test_ondevice_rand_baseline():
  """'rand' runs in the on-device scan: uniform candidate selection,
  observations match the candidate set at the selected indices."""
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(8))
  iters = 6
  xo, yo, sel = ondevice.simulated_bayesopt_ondevice(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=iters,
      acquisition='rand', num_train_tasks=len(dataset),
      key=jax.random.PRNGKey(11))
  assert sel.shape == (iters,)
  sel = np.asarray(sel)
  assert ((0 <= sel) & (sel < queried.x.shape[0])).all()
  np.testing.assert_allclose(np.asarray(yo).flatten(),
                             np.asarray(queried.y)[sel].flatten(),
                             atol=1e-6)
  # Not all identical picks (uniform over 15 candidates, 6 draws).
  assert len(set(sel.tolist())) > 1


def test_continuous_bayesopt_ondevice():
  """Fully on-device continuous-oracle BO: pool argmax + in-jit
  projected gradient ascent finds the optimum of a smooth oracle."""
  model = {'constant': 0., 'lengthscale': jnp.array([.3, .3]),
           'signal_variance': 1.0, 'noise_variance': 1e-4}
  config = {}

  def oracle(x):
    return -jnp.sum((x - 0.35) ** 2, axis=-1, keepdims=True)

  init_x = jnp.array([[0.9, 0.9], [0.1, 0.8]], jnp.float32)
  init_y = oracle(init_x)
  xo, yo = ondevice.continuous_bayesopt_ondevice(
      mean.zero, kernel.squared_exponential, model, config, None,
      oracle, input_dim=2, iters=10, acquisition='ei', pool_size=256,
      refine_steps=15, init_obs=(init_x, init_y),
      key=jax.random.PRNGKey(3))
  assert xo.shape == (12, 2) and yo.shape == (12, 1)
  np.testing.assert_allclose(np.asarray(xo[:2]), np.asarray(init_x),
                             atol=1e-6)
  best = float(np.max(np.asarray(yo)))
  assert best > float(np.max(np.asarray(init_y)))
  assert best > -0.15, f'continuous BO best {best} too far from optimum'
  # refine_steps=0 reproduces pure pool-argmax selection and still runs.
  xo0, yo0 = ondevice.continuous_bayesopt_ondevice(
      mean.zero, kernel.squared_exponential, model, config, None,
      oracle, input_dim=2, iters=3, acquisition='ucb', pool_size=64,
      refine_steps=0, key=jax.random.PRNGKey(4))
  assert xo0.shape == (3, 2)


def test_ondevice_hgp_matches_host_loop():
  """HGP on-device scan (vmapped per-sample posteriors, mean
  acquisition) selects the same points as the host HGP loop."""
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(9))
  samples = [
      dict(params.model),
      {**params.model, 'lengthscale': jnp.array([.15, .12]),
       'signal_variance': 0.8},
      {**params.model, 'constant': 4.5, 'noise_variance': 0.02},
  ]
  model = gp.HGP(dict(dataset), mean.constant,
                 kernel.squared_exponential,
                 GPParams(model=dict(params.model),
                          config=dict(params.config)), None)
  model.params.samples = samples
  iters = 4
  host = bayesopt.simulated_bayesopt(
      model, 'test', queried, const.ACFUN['expected_improvement'], iters)
  xo, yo, sel = ondevice.simulated_bayesopt_ondevice_hgp(
      mean.constant, kernel.squared_exponential, samples,
      dict(params.config), None, queried, iters=iters,
      acquisition='ei', num_train_tasks=len(dataset))
  np.testing.assert_allclose(np.asarray(host.y).flatten(),
                             np.asarray(yo).flatten(), atol=1e-4)
  assert sel.shape == (iters,)


def test_ts_continuous_skips_refinement():
  """The continuous loop must NOT L-BFGS-B-refine a Thompson draw (a
  decoupled per-point sample is not a coherent function): every
  proposed point is exactly a member of that iteration's pool."""
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(30))
  pools = []

  def sampler(key, input_dim):
    p = jax.random.uniform(key, (32, input_dim))
    pools.append(np.asarray(p))
    return p

  model = gp.GP(dict(dataset), mean.constant,
                kernel.squared_exponential,
                GPParams(model=dict(params.model),
                         config=dict(params.config)), None)
  model.rng = jax.random.PRNGKey(31)
  n_init = dataset[sdk].x.shape[0]
  oracle = lambda x: jnp.sin(5 * x[:, :1])
  obs = bayesopt.bayesopt(jax.random.PRNGKey(32), model, sdk, oracle,
                          const.ACFUN['thompson_sampling'], 2, sampler)
  xs = np.asarray(obs.x)[n_init:]
  assert xs.shape[0] == 2 and len(pools) == 2
  for x_new, pool in zip(xs, pools):
    dist = np.abs(pool - x_new[None, :]).sum(axis=1).min()
    assert dist == 0.0, f'proposed point was refined off-pool ({dist})'
