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


def test_ondevice_matches_host_distribution():
  """On-device sampler reproduces the host sampler's target distribution.

  Toy posterior: independent N(mu, sigma^2) per coordinate (an objective
  whose negation is the log density). Both samplers should recover the
  mean/std within MCMC tolerance.
  """
  from hyperbo_tpu.train import slice_sampler

  mu = jnp.array([1.0, -2.0])
  sigma = jnp.array([0.5, 1.5])

  def objective(params):
    z = (params['theta'] - mu) / sigma
    return 0.5 * jnp.sum(z * z)

  init = {'theta': jnp.zeros(2)}
  host = slice_sampler.slice_sample(
      objective, init, jax.random.PRNGKey(0), burnin=50, nsamples=150)
  dev = slice_sampler.slice_sample_ondevice(
      objective, init, jax.random.PRNGKey(1), burnin=50, nsamples=150)
  assert len(dev) == len(host) == 300

  host_arr = jnp.stack([s['theta'] for s in host])
  dev_arr = jnp.stack([s['theta'] for s in dev])
  for arr in (host_arr, dev_arr):
    assert jnp.all(jnp.abs(jnp.mean(arr, 0) - mu) < 0.35), jnp.mean(arr, 0)
    assert jnp.all(jnp.abs(jnp.std(arr, 0) - sigma) < 0.45), jnp.std(arr, 0)


def test_ondevice_multichain():
  """Chains split the sample budget and sample the same distribution."""
  from hyperbo_tpu.train import slice_sampler

  def objective(params):
    return 0.5 * jnp.sum(params['theta'] ** 2)

  init = {'theta': jnp.zeros(3)}
  samples = slice_sampler.slice_sample_ondevice(
      objective, init, jax.random.PRNGKey(2), burnin=30, nsamples=100,
      num_chains=4, init_jitter=0.5)
  assert len(samples) == 200
  arr = jnp.stack([s['theta'] for s in samples])
  assert jnp.all(jnp.abs(jnp.mean(arr, 0)) < 0.35), jnp.mean(arr, 0)
  assert jnp.all(jnp.abs(jnp.std(arr, 0) - 1.0) < 0.35), jnp.std(arr, 0)

  with pytest.raises(ValueError):
    slice_sampler.slice_sample_ondevice(
        objective, init, jax.random.PRNGKey(3), burnin=1, nsamples=5,
        num_chains=4)


def test_slice_sampling_hgp_ondevice_path():
  """HGP pre-training through the on-device sampler: contract + NLL."""
  key = jax.random.PRNGKey(0)
  n, nq, d = 6, 3, 2
  vx = jax.random.normal(key, (n, d))
  qx = jax.random.normal(jax.random.PRNGKey(1), (nq, d))
  gt = GPParams(model={
      'constant': 5., 'lengthscale': jnp.array([.1, .1]),
      'signal_variance': 1.0, 'noise_variance': 0.01})
  dataset = [
      (vx, gp.sample_from_gp(jax.random.PRNGKey(i), mean.constant,
                             kernel.squared_exponential, gt, vx,
                             warp_func=WF))
      for i in range(6)
  ]
  nsamples = 2
  init_params = GPParams(
      model={'constant': 5.1, 'lengthscale': jnp.array([0., 0.]),
             'signal_variance': 0., 'noise_variance': -4.},
      config={'method': 'slice_sample', 'burnin': 3,
              'nsamples': nsamples, 'max_training_step': 0,
              'num_chains': 2, 'chain_init_jitter': 0.1,
              'priors': priors.DEFAULT_PRIORS, 'batch_size': 100})
  model = gp.HGP(dataset, mean.constant, kernel.squared_exponential,
                 init_params, WF)
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


def test_fused_stepout_bitexact_vs_serial(monkeypatch):
  """The fused 2-edge stepping-out while_loop (the library default) must
  reproduce the two sequential per-side loops DECISION-EXACTLY: stepping
  out is deterministic given log_y, so the chains are bit-identical.
  Guards the HYPERBO_SLICE_STEPOUT A/B hook (PERF.md round-5
  HGP-resample dissection) against semantic drift."""
  import numpy as np
  from hyperbo_tpu.train import slice_sampler

  def log_prob(v):
    # Banana-ish target so stepping out/shrinkage trip counts vary
    # per coordinate and per sweep.
    return (-0.5 * jnp.sum(v * v)
            - 2.0 * (v[1] - v[0] ** 2) ** 2)

  x0 = jnp.array([0.3, -0.7, 1.1], jnp.float32)
  key = jax.random.PRNGKey(11)

  outs = {}
  for mode in ('serial', 'fused'):
    monkeypatch.setenv('HYPERBO_SLICE_STEPOUT', mode)
    # Fresh trace per mode: the env knob is read at trace time.
    xs, lls = jax.jit(
        lambda x, k: slice_sampler._run_chain(
            log_prob, x, k, total=6, width=0.8, max_steps_out=5,
            max_shrink=20))(x0, key)
    outs[mode] = (np.asarray(xs), np.asarray(lls))

  np.testing.assert_array_equal(outs['fused'][0], outs['serial'][0])
  np.testing.assert_array_equal(outs['fused'][1], outs['serial'][1])
