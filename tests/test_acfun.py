"""Acquisition-function tests: shapes, known closed forms, and
vmap-ability over a batch of models (the reference's on-device batched-BO
precedent, acfun_test.py:100-118).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import gp
from hyperbo_tpu.models import kernel
from hyperbo_tpu.models import mean
from hyperbo_tpu.bo import acfun
from hyperbo_tpu.bo import const

GPParams = defs.GPParams
SubDataset = defs.SubDataset
WF = DEFAULT_WARP_FUNC


def _model(key):
  params = GPParams(
      model={'constant': 1., 'lengthscale': jnp.array([.5, .5]),
             'signal_variance': 1.0, 'noise_variance': 0.01},
      config={'objective': 'nll'})
  x = jax.random.normal(key, (8, 2))
  y = gp.sample_from_gp(jax.random.PRNGKey(1), mean.constant,
                        kernel.squared_exponential, params, x, warp_func=WF)
  model = gp.GP({0: SubDataset(x, y)}, mean.constant,
                kernel.squared_exponential, params, WF)
  model.rng = jax.random.PRNGKey(7)
  return model


@pytest.mark.parametrize('name', list(const.ACFUN.keys()))
def test_acfun_shapes(name):
  model = _model(jax.random.PRNGKey(0))
  nq = 11
  qx = jax.random.normal(jax.random.PRNGKey(2), (nq, 2))
  if name == 'random_search':
    vals = const.ACFUN[name](model=model, x_queries=qx)
  else:
    vals = const.ACFUN[name](model=model, sub_dataset_key=0, x_queries=qx)
  assert vals.shape == (nq, 1)
  assert np.all(np.isfinite(np.asarray(vals)))


def test_ei_closed_form():
  mu = jnp.array([[0.0]])
  std = jnp.array([[1.0]])
  target = 0.0
  # EI at mu=target, std=1: phi(0) = 1/sqrt(2 pi), minus 0*... = 0.3989
  val = acfun.expected_improvement_sub(mu, std, target)
  np.testing.assert_allclose(np.asarray(val)[0, 0],
                             1 / np.sqrt(2 * np.pi), rtol=1e-5)


def test_ucb_formula():
  mu = jnp.array([[1.0], [2.0]])
  std = jnp.array([[0.5], [0.1]])
  np.testing.assert_allclose(acfun.ucb_sub(mu, std, 3.),
                             mu + 3. * std)


def test_acquisitions_vmappable_over_models():
  """Score 100 sampled GP hyperparameter settings in one batched pass."""
  key = jax.random.PRNGKey(3)
  n, nq, d, m = 8, 6, 2, 100
  x_obs = jax.random.normal(key, (n, d))
  y_obs = jax.random.normal(jax.random.PRNGKey(4), (n, 1))
  qx = jax.random.normal(jax.random.PRNGKey(5), (nq, d))

  base = {'constant': 1., 'lengthscale': jnp.ones(d),
          'signal_variance': 1.0, 'noise_variance': 0.01}
  stacked = {
      k: jnp.stack([jnp.asarray(v) + 0.01 * i for i in range(m)])
      for k, v in base.items()
  }

  def score(model_params):
    params = GPParams(model=model_params)
    mu, var = gp.predict(mean.constant, kernel.squared_exponential, params,
                         x_obs, y_obs, qx, warp_func=WF)
    return acfun.expected_improvement_sub(
        mu, jnp.sqrt(var + model_params['noise_variance']),
        jnp.max(y_obs))

  vals = jax.vmap(score)(stacked)
  assert vals.shape == (m, nq, 1)
  assert np.all(np.isfinite(np.asarray(vals)))


def test_hgp_acquisition_batched_single_factorization():
  """HGP acquisition at S=100 runs ONE batched predict, not S loops.

  Regression for the round-1 weakness where acfun's HGP branch looped
  HGP.predict over samples, clearing all caches and re-factorizing S
  times per BO iteration. The batched path executes the kernel function
  a constant number of times (eager executions happen only while the
  single vmapped program is traced).
  """
  calls = {'n': 0}
  base_cov = kernel.squared_exponential

  def counting_cov(params, x1, x2=None, warp_func=None, diag=False):
    calls['n'] += 1
    return base_cov(params, x1, x2, warp_func=warp_func, diag=diag)

  counting_cov.__name__ = 'squared_exponential'

  key = jax.random.PRNGKey(8)
  x = jax.random.normal(key, (8, 2))
  params = GPParams(
      model={'constant': 1., 'lengthscale': jnp.array([.5, .5]),
             'signal_variance': 1.0, 'noise_variance': 0.01},
      config={'objective': 'nll'})
  y = gp.sample_from_gp(jax.random.PRNGKey(9), mean.constant, base_cov,
                        params, x, warp_func=WF)
  model = gp.HGP({0: SubDataset(x, y)}, mean.constant, counting_cov,
                 params, WF)
  s = 100
  model.params.samples = [
      {k: jnp.asarray(v) + 0.001 * i for k, v in params.model.items()}
      for i in range(s)
  ]
  qx = jax.random.normal(jax.random.PRNGKey(10), (7, 2))

  calls['n'] = 0
  vals = acfun.ei(model=model, sub_dataset_key=0, x_queries=qx)
  assert vals.shape == (7, 1)
  assert np.all(np.isfinite(np.asarray(vals)))
  # Trace-time executions only: a handful, NOT O(S).
  assert calls['n'] <= 6, calls['n']

  # Repeated iterations at the same shapes reuse the compiled program.
  calls['n'] = 0
  acfun.ei(model=model, sub_dataset_key=0, x_queries=qx)
  assert calls['n'] == 0, calls['n']


def test_hgp_acquisition_matches_per_sample_loop():
  """Batched HGP acquisition equals the explicit per-sample average."""
  key = jax.random.PRNGKey(11)
  x = jax.random.normal(key, (6, 2))
  params = GPParams(
      model={'constant': 1., 'lengthscale': jnp.array([.5, .5]),
             'signal_variance': 1.0, 'noise_variance': 0.01},
      config={'objective': 'nll'})
  y = gp.sample_from_gp(jax.random.PRNGKey(12), mean.constant,
                        kernel.squared_exponential, params, x, warp_func=WF)
  model = gp.HGP({0: SubDataset(x, y)}, mean.constant,
                 kernel.squared_exponential, params, WF)
  s1 = dict(params.model)
  s2 = dict(params.model)
  s2['constant'] = 1.7
  model.params.samples = [s1, s2]
  qx = jax.random.normal(jax.random.PRNGKey(13), (5, 2))

  got = acfun.ei(model=model, sub_dataset_key=0, x_queries=qx)
  target = acfun.ei_callback_default(model, 0)
  loop = model.predict(qx, 0, full_cov=False, with_noise=True)
  want = jnp.mean(jnp.stack([
      acfun.expected_improvement_sub(mu, jnp.sqrt(var), target)
      for mu, var in loop]), axis=0)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-4, atol=1e-5)


def test_random_search_consumes_rng():
  model = _model(jax.random.PRNGKey(6))
  r0 = model.rng
  vals = acfun.random_search(model, jnp.zeros((5, 2)))
  assert vals.shape == (5, 1)
  assert not jnp.array_equal(r0, model.rng)


def test_thompson_sampling_semantics():
  """ts = mu + sqrt(latent var) * z with the key split from model.rng
  (no observation noise, no unbiased rescale — ondevice._ts_index
  semantics), reproducible under the same rng, and rng-advancing."""
  model = _model(jax.random.PRNGKey(0))
  qx = jax.random.normal(jax.random.PRNGKey(2), (9, 2))
  rng0 = jax.random.PRNGKey(7)
  model.rng = rng0
  vals = acfun.thompson_sampling(model=model, sub_dataset_key=0,
                                 x_queries=qx)
  assert vals.shape == (9, 1)
  assert not np.array_equal(np.asarray(model.rng), np.asarray(rng0))
  _, subkey = jax.random.split(rng0)
  mu, var_f = model.predict(qx, sub_dataset_key=0, full_cov=False,
                            with_noise=False, unbiased=False)
  expected = mu + jnp.sqrt(jnp.maximum(var_f, 1e-12)) * jax.random.normal(
      subkey, mu.shape)
  np.testing.assert_allclose(np.asarray(vals), np.asarray(expected),
                             rtol=1e-6)
  model.rng = rng0
  vals2 = acfun.thompson_sampling(model=model, sub_dataset_key=0,
                                  x_queries=qx)
  np.testing.assert_array_equal(np.asarray(vals), np.asarray(vals2))


def test_thompson_sampling_hgp():
  """HGP ts: one sample's posterior (hyperparameter draw) then a
  latent-f draw; finite, reproducible, rng-advancing."""
  base = _model(jax.random.PRNGKey(5))
  hgp = gp.HGP(dict(base.dataset), mean.constant,
               kernel.squared_exponential,
               GPParams(model=dict(base.params.model),
                        config=dict(base.params.config)), WF)
  hgp.params.samples = [dict(base.params.model),
                        {**base.params.model, 'signal_variance': 1.5}]
  rng0 = jax.random.PRNGKey(9)
  hgp.rng = rng0
  qx = jax.random.normal(jax.random.PRNGKey(6), (7, 2))
  vals = acfun.thompson_sampling(model=hgp, sub_dataset_key=0,
                                 x_queries=qx)
  assert vals.shape == (7, 1)
  assert np.all(np.isfinite(np.asarray(vals)))
  assert not np.array_equal(np.asarray(hgp.rng), np.asarray(rng0))
  hgp.rng = rng0
  vals2 = acfun.thompson_sampling(model=hgp, sub_dataset_key=0,
                                  x_queries=qx)
  np.testing.assert_array_equal(np.asarray(vals), np.asarray(vals2))
