"""HGP + slice-sampling tests.

The slice sampler is absent from the OSS reference (SURVEY.md section 2);
this exercises the reconstructed sampler against the consumer contract in
reference gp_utils/slice_sampling_test.py:56-153: NLL improves and
HGP.predict returns 2 * nsamples (mu, cov) pairs of the right shapes.
"""

import jax
import jax.numpy as jnp
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import gp
from hyperbo_tpu.models import kernel
from hyperbo_tpu.models import mean
from hyperbo_tpu.models import priors

GPParams = defs.GPParams
WF = DEFAULT_WARP_FUNC


@pytest.mark.parametrize('cov_func', [
    kernel.squared_exponential, kernel.matern52,
], ids=lambda f: f.__name__)
def test_slice_sampling_hgp(cov_func):
  key = jax.random.PRNGKey(0)
  n, nq, d = 6, 3, 2
  vx = jax.random.normal(key, (n, d))
  qx = jax.random.normal(jax.random.PRNGKey(1), (nq, d))
  gt = GPParams(model={
      'constant': 5., 'lengthscale': jnp.array([.1, .1]),
      'signal_variance': 1.0, 'noise_variance': 0.01})

  dataset = [
      (vx, gp.sample_from_gp(jax.random.PRNGKey(i), mean.constant,
                             cov_func, gt, vx, warp_func=WF))
      for i in range(6)
  ]

  nsamples = 1
  init_params = GPParams(
      model={'constant': 5.1, 'lengthscale': jnp.array([0., 0.]),
             'signal_variance': 0., 'noise_variance': -4.},
      config={'method': 'slice_sample', 'burnin': nsamples,
              'nsamples': nsamples, 'max_training_step': 0,
              'logging_interval': 1, 'priors': priors.DEFAULT_PRIORS,
              'batch_size': 100})

  model = gp.HGP(dataset, mean.constant, cov_func, init_params, WF)
  model.initialize_params(jax.random.PRNGKey(2))

  init_nll = float(model.stats(verbose=False)[0])
  model.train()
  inferred_nll = float(model.stats(verbose=False)[0])
  assert inferred_nll < init_nll, (init_nll, inferred_nll)

  assert len(model.params.samples) == nsamples * 2
  predictions = model.predict(qx, 0, True, True)
  assert len(predictions) == nsamples * 2
  for mu, cov in predictions:
    assert mu.shape == (nq, 1)
    assert cov.shape == (nq, nq)


def test_hgp_stats_averages_over_samples():
  key = jax.random.PRNGKey(3)
  vx = jax.random.normal(key, (5, 2))
  gt = GPParams(model={
      'constant': 1., 'lengthscale': jnp.array([.5, .5]),
      'signal_variance': 1.0, 'noise_variance': 0.01})
  y = gp.sample_from_gp(jax.random.PRNGKey(4), mean.constant,
                        kernel.squared_exponential, gt, vx, warp_func=WF)
  params = GPParams(
      model=dict(gt.model), config={'objective': 'nll'})
  model = gp.HGP([(vx, y)], mean.constant, kernel.squared_exponential,
                 params, WF)
  # Two hand-planted samples.
  s1 = dict(gt.model)
  s2 = dict(gt.model)
  s2['constant'] = 2.
  model.params.samples = [s1, s2]
  nll, ekl, eklp, euc, key2nll = model.stats(verbose=False)
  assert jnp.isfinite(nll)
  preds = model.predict(vx, 0)
  assert len(preds) == 2


def test_hgp_predict_stacked_matches_loop():
  """Vmapped stacked HGP predict equals the per-sample loop."""
  import numpy as np
  key = jax.random.PRNGKey(5)
  vx = jax.random.normal(key, (6, 2))
  gt = GPParams(model={
      'constant': 1., 'lengthscale': jnp.array([.5, .5]),
      'signal_variance': 1.0, 'noise_variance': 0.01})
  y = gp.sample_from_gp(jax.random.PRNGKey(6), mean.constant,
                        kernel.squared_exponential, gt, vx, warp_func=WF)
  model = gp.HGP([(vx, y)], mean.constant, kernel.squared_exponential,
                 GPParams(model=dict(gt.model),
                          config={'objective': 'nll'}), WF)
  s1 = dict(gt.model)
  s2 = dict(gt.model)
  s2['constant'] = 2.5
  s2['signal_variance'] = 0.7
  model.params.samples = [s1, s2]
  qx = jax.random.normal(jax.random.PRNGKey(7), (4, 2))
  loop = model.predict(qx, 0, full_cov=False, with_noise=True)
  mu_s, var_s = model.predict_stacked(qx, 0, with_noise=True)
  assert mu_s.shape == (2, 4, 1) and var_s.shape == (2, 4, 1)
  for i, (mu, var) in enumerate(loop):
    np.testing.assert_allclose(np.asarray(mu_s[i]), np.asarray(mu),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_s[i]), np.asarray(var),
                               rtol=1e-4, atol=1e-5)
