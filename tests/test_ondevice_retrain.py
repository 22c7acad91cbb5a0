"""On-device BO with in-scan retraining (bo/ondevice.py).

The host loop retrains the GP between BO iterations (reference
hyperbo/bo_utils/bayesopt.py:46-72 via simulated_bayesopt); the
on-device variant carries model params + Adam state through the scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.models import kernel, mean
from hyperbo_tpu.models import packed as packed_lib
from hyperbo_tpu.bo import ondevice
from hyperbo_tpu.data import synthetic

GPParams = defs.GPParams


def _setup(key):
  params = GPParams(
      model={'constant': 5., 'lengthscale': jnp.array([.1, .1]),
             'signal_variance': 1.0, 'noise_variance': 0.01},
      config={'method': 'adam', 'learning_rate': 1e-2,
              'max_training_step': 2, 'batch_size': 10,
              'objective': 'nll', 'retrain': 0})
  dataset, sdk, queried = synthetic.random(
      key, mean.constant, kernel.squared_exponential, params, dim=2,
      n_observed=4, n_queries=15, n_func_historical=3,
      m_points_historical=6)
  return params, dataset, sdk, queried


def test_retrain_zero_steps_matches_plain_loop():
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(0))
  iters = 5
  xo, yo, sel = ondevice.simulated_bayesopt_ondevice(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=iters, acquisition='ei',
      num_train_tasks=len(dataset))
  xr, yr, selr, model_out = ondevice.simulated_bayesopt_ondevice_retrain(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=iters, acquisition='ei',
      num_train_tasks=len(dataset), retrain_steps=0)
  np.testing.assert_array_equal(np.asarray(sel), np.asarray(selr))
  np.testing.assert_allclose(np.asarray(xo), np.asarray(xr), atol=1e-6)
  # retrain_steps=0: the model comes back unchanged.
  for k, v in params.model.items():
    np.testing.assert_allclose(np.asarray(model_out[k]),
                               np.asarray(v, np.float32), atol=0)


def test_retrain_trains_and_improves_nll():
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(1))
  iters = 4
  pretrain = {k: v for k, v in dataset.items()
              if k != sdk and v.aligned is None}
  pp, _ = packed_lib.pack_dataset(pretrain, pad_to_multiple=8)
  init_obs = (queried.x[:2], queried.y[:2])
  # Start AWAY from the ground truth that generated the data, so
  # retraining has something to recover.
  init_model = {'constant': 0.0, 'lengthscale': jnp.array([1.0, 1.0]),
                'signal_variance': 0.5, 'noise_variance': 0.05}
  xr, yr, sel, model_out = ondevice.simulated_bayesopt_ondevice_retrain(
      mean.constant, kernel.squared_exponential, dict(init_model),
      dict(params.config), None, queried, iters=iters, acquisition='ei',
      num_train_tasks=len(pretrain), init_obs=init_obs,
      pretrain_packed=pp, retrain_every=1, retrain_steps=25,
      learning_rate=5e-2)
  assert xr.shape == (2 + iters, 2) and yr.shape == (2 + iters, 1)
  assert sel.shape == (iters,)
  # Selected observations really come from the candidate set.
  for i in range(iters):
    np.testing.assert_allclose(np.asarray(xr[2 + i]),
                               np.asarray(queried.x[sel[i]]), atol=1e-6)
  # The model moved...
  moved = any(
      not np.allclose(np.asarray(model_out[k]),
                      np.asarray(v, np.float32), atol=1e-7)
      for k, v in init_model.items())
  assert moved, 'retraining left every parameter unchanged'

  # ...and in the right direction: mean per-task NLL over the
  # pre-training corpus improves vs the initial parameters.
  def corpus_nll(model):
    shim = GPParams(model=model, config={})
    return float(packed_lib.neg_log_marginal_likelihood_packed(
        mean.constant, kernel.squared_exponential, shim, pp))
  assert corpus_nll(model_out) < corpus_nll(
      {k: jnp.asarray(v, jnp.float32) for k, v in init_model.items()})


def test_retrain_stbo_without_pretrain_corpus():
  """STBO regime: no pre-training tasks; retrain on the test buffer."""
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(2))
  init_obs = (queried.x[:3], queried.y[:3])
  xr, yr, sel, model_out = ondevice.simulated_bayesopt_ondevice_retrain(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=3, acquisition='ucb',
      init_obs=init_obs, retrain_every=2, retrain_steps=10)
  assert xr.shape == (6, 2)
  assert np.all(np.isfinite(np.asarray(yr)))
  for v in model_out.values():
    assert np.all(np.isfinite(np.asarray(v)))


def test_thompson_sampling_all_loops():
  """'ts' acquisition: valid selections, key-dependent, all variants."""
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(3))
  common = dict(queried_sub_dataset=queried, iters=4,
                acquisition='ts', num_train_tasks=len(dataset))
  xo, yo, sel_a = ondevice.simulated_bayesopt_ondevice(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, key=jax.random.PRNGKey(0), **common)
  assert xo.shape == (4, 2)
  assert np.all((np.asarray(sel_a) >= 0)
                & (np.asarray(sel_a) < queried.x.shape[0]))
  # Same key reproduces; a different key (very likely) differs.
  _, _, sel_b = ondevice.simulated_bayesopt_ondevice(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, key=jax.random.PRNGKey(0), **common)
  np.testing.assert_array_equal(np.asarray(sel_a), np.asarray(sel_b))

  # Retrain variant accepts ts.
  xr, yr, sel_r, _ = ondevice.simulated_bayesopt_ondevice_retrain(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, retrain_every=2, retrain_steps=3,
      key=jax.random.PRNGKey(1), **common)
  assert np.all(np.isfinite(np.asarray(yr)))

  # HGP variant: hyperparameter draw + function draw.
  samples = [dict(params.model),
             {**params.model, 'signal_variance': 2.0}]
  xh, yh, sel_h = ondevice.simulated_bayesopt_ondevice_hgp(
      mean.constant, kernel.squared_exponential, samples,
      dict(params.config), None, key=jax.random.PRNGKey(2), **common)
  assert np.all(np.isfinite(np.asarray(yh)))

  # Continuous variant: pool draw, no refinement.
  def oracle(x):
    return jnp.sum(jnp.sin(3 * x), axis=1, keepdims=True)
  xc, yc = ondevice.continuous_bayesopt_ondevice(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, oracle, input_dim=2, iters=3,
      acquisition='ts', pool_size=64, key=jax.random.PRNGKey(3))
  assert xc.shape == (3, 2) and np.all(np.isfinite(np.asarray(yc)))


def test_retrain_loop_on_mesh():
  """Candidates + pre-training corpus sharded over an 8-device mesh."""
  from hyperbo_tpu.parallel import mesh as mesh_lib
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(4))
  mesh = mesh_lib.create_mesh(8, axis_name='task')
  pretrain = {k: v for k, v in dataset.items()
              if k != sdk and v.aligned is None}
  pp, _ = packed_lib.pack_dataset(pretrain, pad_to_multiple=8,
                                  num_tasks_multiple=8)
  # 8 candidates shard evenly over 8 devices.
  queried16 = defs.SubDataset(queried.x[:8], queried.y[:8])
  xr, yr, sel, model_out = ondevice.simulated_bayesopt_ondevice_retrain(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried16, iters=3, acquisition='ei',
      num_train_tasks=len(pretrain), pretrain_packed=pp,
      retrain_every=1, retrain_steps=5, mesh=mesh)
  assert np.all(np.isfinite(np.asarray(yr)))
  # Mesh run selects the same points as the single-device run.
  _, _, sel_ref, _ = ondevice.simulated_bayesopt_ondevice_retrain(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried16, iters=3, acquisition='ei',
      num_train_tasks=len(pretrain), pretrain_packed=pp,
      retrain_every=1, retrain_steps=5)
  np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel_ref))


def test_qbatch_q1_matches_plain_loop():
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(5))
  # Include the PRNG-consuming acquisitions: q=1 must reproduce the
  # plain loop's key stream too.
  for acq in ('ei', 'rand', 'ts'):
    _, _, sel = ondevice.simulated_bayesopt_ondevice(
        mean.constant, kernel.squared_exponential, dict(params.model),
        dict(params.config), None, queried, iters=5, acquisition=acq,
        num_train_tasks=len(dataset), key=jax.random.PRNGKey(7))
    xq, yq, selq = ondevice.simulated_bayesopt_ondevice_qbatch(
        mean.constant, kernel.squared_exponential, dict(params.model),
        dict(params.config), None, queried, iters=5, q=1,
        acquisition=acq, num_train_tasks=len(dataset),
        key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(sel),
                                  np.asarray(selq).flatten(),
                                  err_msg=f'acquisition={acq}')


def test_qbatch_selects_batches_and_reveals_true_y():
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(6))
  iters, q = 3, 3
  xq, yq, selq = ondevice.simulated_bayesopt_ondevice_qbatch(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=iters, q=q,
      acquisition='ei', num_train_tasks=len(dataset))
  assert selq.shape == (iters, q)
  assert xq.shape == (iters * q, 2)
  sel_flat = np.asarray(selq).flatten()
  # Every observed y is the TRUE candidate value, not a hallucination.
  np.testing.assert_allclose(
      np.asarray(yq).flatten(),
      np.asarray(queried.y)[sel_flat].flatten(), atol=1e-5)
  # Within a batch the hallucination diversifies: the q picks of the
  # first iteration are not all the same point.
  assert len(set(np.asarray(selq)[0].tolist())) > 1


def test_retrain_with_ekl_regularizer():
  """nll + c*EKL composite objective (the host's nll_regkl combinator)."""
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(8))
  pretrain = {k: v for k, v in dataset.items()
              if k != sdk and v.aligned is None}
  pp, _ = packed_lib.pack_dataset(pretrain, pad_to_multiple=8)
  # Matched-input task: 6 shared inputs evaluated by 5 function draws.
  ka, kb = jax.random.split(jax.random.PRNGKey(88))
  aligned = {'al': defs.SubDataset(
      jax.random.uniform(ka, (6, 2)),
      jax.random.normal(kb, (6, 5)), aligned=1)}
  ap, _ = packed_lib.pack_aligned_dataset(aligned, pad_to_multiple=4)
  xr, yr, sel, model_out = ondevice.simulated_bayesopt_ondevice_retrain(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=3, acquisition='ei',
      num_train_tasks=len(pretrain), pretrain_packed=pp,
      aligned_packed=ap, ekl_weight=0.1, retrain_every=1,
      retrain_steps=5)
  assert np.all(np.isfinite(np.asarray(yr)))
  for v in model_out.values():
    assert np.all(np.isfinite(np.asarray(v)))
  # The regularizer changes the training trajectory.
  _, _, _, model_plain = ondevice.simulated_bayesopt_ondevice_retrain(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=3, acquisition='ei',
      num_train_tasks=len(pretrain), pretrain_packed=pp,
      retrain_every=1, retrain_steps=5)
  diff = any(
      not np.allclose(np.asarray(model_out[k]), np.asarray(model_plain[k]))
      for k in model_out)
  assert diff, 'EKL regularizer had no effect on the trajectory'


def test_run_bayesopt_ondevice_entry():
  """Library entry dispatch: plain / retrain / qbatch from a GP."""
  from hyperbo_tpu.models import gp as gp_lib
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(9))
  model = gp_lib.GP(dict(dataset), mean.constant,
                    kernel.squared_exponential,
                    GPParams(model=dict(params.model),
                             config=dict(params.config)), None)
  obs, best, out_params = ondevice.run_bayesopt_ondevice(
      model, 'test', queried, iters=4)
  assert obs[0].shape[1] == 2 and np.all(np.isfinite(np.asarray(obs[1])))
  np.testing.assert_allclose(best[1], jnp.max(queried.y))
  # retrain dispatch (config-driven, like run_bayesopt).
  model.params.config['retrain'] = 3
  obs_r, _, params_r = ondevice.run_bayesopt_ondevice(
      model, 'test', queried, iters=3)
  assert np.all(np.isfinite(np.asarray(obs_r[1])))
  # qbatch dispatch: iters counts TOTAL evaluations (budget parity
  # with run_bayesopt), so iters=6 & q=3 runs 2 batches.
  model.params.config['retrain'] = 0
  obs_q, _, _ = ondevice.run_bayesopt_ondevice(
      model, 'test', queried, iters=6, q=3)
  assert np.all(np.isfinite(np.asarray(obs_q[1])))
  import pytest as _pytest
  with _pytest.raises(ValueError):
    ondevice.run_bayesopt_ondevice(model, 'test', queried, iters=5, q=3)


def test_hgp_resample_loop():
  """In-scan HGP re-sampling: finite results, samples move, and the
  degenerate configuration (no sweeps, no jitter, deterministic EI)
  reproduces the plain GP loop."""
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(10))
  pretrain = {k: v for k, v in dataset.items()
              if k != sdk and v.aligned is None}
  pp, _ = packed_lib.pack_dataset(pretrain, pad_to_multiple=8)

  # Degenerate parity: S identical frozen samples == one GP.
  _, _, sel_ref = ondevice.simulated_bayesopt_ondevice(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=4, acquisition='ei',
      num_train_tasks=len(pretrain))
  xo, yo, sel, samples = ondevice.simulated_bayesopt_ondevice_hgp_resample(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=4, acquisition='ei',
      num_samples=3, num_train_tasks=len(pretrain), sweeps=0,
      init_jitter=0.0)
  np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel_ref))
  assert len(samples) == 3

  # Live re-sampling: chains move and stay finite.
  xo, yo, sel, samples = ondevice.simulated_bayesopt_ondevice_hgp_resample(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, queried, iters=3, acquisition='ei',
      num_samples=3, num_train_tasks=len(pretrain),
      pretrain_packed=pp, resample_every=1, sweeps=1,
      init_jitter=0.05, key=jax.random.PRNGKey(11))
  assert np.all(np.isfinite(np.asarray(yo)))
  flat = [np.concatenate([np.ravel(v) for v in s.values()])
          for s in samples]
  assert not np.allclose(flat[0], flat[1]), 'chains did not move apart'
  for s in samples:
    for v in s.values():
      assert np.all(np.isfinite(np.asarray(v)))


def test_run_bayesopt_ondevice_hgp_resample_dispatch():
  """HGP + config['retrain']>0 dispatches to in-scan re-sampling."""
  from hyperbo_tpu.models import gp as gp_lib
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(12))
  cfg = dict(params.config)
  cfg.update({'retrain': 1, 'method': 'slice_sample'})
  model = gp_lib.HGP(dict(dataset), mean.constant,
                     kernel.squared_exponential,
                     GPParams(model=dict(params.model), config=cfg),
                     None)
  # Seed the HGP with two explicit samples.
  model.params.samples = [dict(params.model),
                          {**params.model, 'signal_variance': 1.5}]
  obs, best, out_params = ondevice.run_bayesopt_ondevice(
      model, 'test', queried, iters=2)
  assert np.all(np.isfinite(np.asarray(obs[1])))
  assert len(out_params.samples) == 2
  # The chains advanced: at least one sample moved.
  moved = any(
      not np.allclose(
          np.concatenate([np.ravel(v) for v in s.values()]),
          np.concatenate([np.ravel(np.asarray(v, np.float32))
                          for v in ref.values()]))
      for s, ref in zip(out_params.samples,
                        [dict(params.model),
                         {**params.model, 'signal_variance': 1.5}]))
  assert moved


def test_qbatch_and_hgp_loops_on_mesh():
  """_shard_candidates paths: mesh selections match single-device."""
  from hyperbo_tpu.parallel import mesh as mesh_lib
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(13))
  mesh = mesh_lib.create_mesh(8, axis_name='task')
  q8 = defs.SubDataset(queried.x[:8], queried.y[:8])
  common = dict(queried_sub_dataset=q8, iters=2,
                acquisition='ei', num_train_tasks=len(dataset))

  _, _, sel_q = ondevice.simulated_bayesopt_ondevice_qbatch(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, q=2, mesh=mesh, **common)
  _, _, sel_q1 = ondevice.simulated_bayesopt_ondevice_qbatch(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, q=2, **common)
  np.testing.assert_array_equal(np.asarray(sel_q), np.asarray(sel_q1))

  samples = [dict(params.model),
             {**params.model, 'signal_variance': 1.5}]
  _, _, sel_h = ondevice.simulated_bayesopt_ondevice_hgp(
      mean.constant, kernel.squared_exponential, samples,
      dict(params.config), None, mesh=mesh, **common)
  _, _, sel_h1 = ondevice.simulated_bayesopt_ondevice_hgp(
      mean.constant, kernel.squared_exponential, samples,
      dict(params.config), None, **common)
  np.testing.assert_array_equal(np.asarray(sel_h), np.asarray(sel_h1))

  _, _, sel_r, _ = ondevice.simulated_bayesopt_ondevice_hgp_resample(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, num_samples=2, sweeps=0,
      init_jitter=0.0, mesh=mesh, **common)
  _, _, sel_r1, _ = ondevice.simulated_bayesopt_ondevice_hgp_resample(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, num_samples=2, sweeps=0,
      init_jitter=0.0, **common)
  np.testing.assert_array_equal(np.asarray(sel_r), np.asarray(sel_r1))


def test_corpus_loss_matches_host_nll_regkl():
  """_make_corpus_loss == the host nll_regkl(c) objective on an
  equivalent dataset dict (pretrain + test + aligned tasks)."""
  from hyperbo_tpu.models import objectives as obj
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  key = jax.random.PRNGKey(14)
  d = 2
  model = {'constant': 0.3, 'lengthscale': jnp.array([-0.5, -0.2]),
           'signal_variance': 0.1, 'noise_variance': -2.0}
  params = GPParams(model=dict(model), config={})

  def task(k, n, m=1):
    kx, ky = jax.random.split(jax.random.fold_in(key, k))
    return defs.SubDataset(jax.random.uniform(kx, (n, d)),
                           jax.random.normal(ky, (n, m)),
                           aligned=1 if m > 1 else None)

  pre = {0: task(0, 7), 1: task(1, 5)}
  test_task = task(2, 4)
  aligned = {'a': task(3, 6, m=5)}
  dataset = dict(pre)
  dataset['test'] = test_task
  dataset.update(aligned)

  c = 0.3
  host = float(obj.nll_regkl(c)(
      mean.constant, kernel.squared_exponential, params, dataset,
      warp_func=DEFAULT_WARP_FUNC))

  pp, _ = packed_lib.pack_dataset(pre, pad_to_multiple=8)
  ap, _ = packed_lib.pack_aligned_dataset(aligned, pad_to_multiple=4)
  n_max = 8
  x_buf = jnp.zeros((n_max, d), jnp.float32).at[:4].set(test_task.x)
  y_buf = jnp.zeros((n_max, 1), jnp.float32).at[:4].set(test_task.y)
  loss = ondevice._make_corpus_loss(
      mean.constant, kernel.squared_exponential, {}, DEFAULT_WARP_FUNC,
      n_max, pretrain_packed=pp, aligned_packed=ap, ekl_weight=c)
  mine = float(loss({k: jnp.asarray(v, jnp.float32)
                     for k, v in model.items()},
                    x_buf, y_buf, jnp.array(4, jnp.int32)))
  np.testing.assert_allclose(mine, host, rtol=1e-5, atol=1e-4)


def test_retrain_trains_mlp_warped_kernel_in_scan():
  """The flagship config (SE-over-MLP + linear-MLP mean): the Flax
  parameter pytrees ride the scan carry and train in-scan."""
  from flax import linen as nn
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import basis as bf
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(15))
  pretrain = {k: v for k, v in dataset.items()
              if k != sdk and v.aligned is None}
  pp, _ = packed_lib.pack_dataset(pretrain, pad_to_multiple=8)

  gp_params = GPParams(
      model={'constant': 0.0, 'lengthscale': jnp.zeros(4),
             'signal_variance': 0.0, 'noise_variance': -3.0},
      config={'mlp_features': (4, 4), 'learning_rate': 5e-2})
  bf.init_mlp_with_shape(jax.random.PRNGKey(1), gp_params, (0, 2))
  gp_params.model['linear_mean'] = nn.Dense(1).init(
      jax.random.PRNGKey(2), jnp.empty((0, 4)))['params']

  xr, yr, sel, model_out = ondevice.simulated_bayesopt_ondevice_retrain(
      mean.linear_mlp, kernel.squared_exponential_mlp,
      dict(gp_params.model), dict(gp_params.config), DEFAULT_WARP_FUNC,
      queried, iters=3, acquisition='ei',
      num_train_tasks=len(pretrain), init_obs=(queried.x[:2],
                                               queried.y[:2]),
      pretrain_packed=pp, retrain_every=1, retrain_steps=10)
  assert np.all(np.isfinite(np.asarray(yr)))
  # The MLP weights moved.
  w0 = np.asarray(jax.tree.leaves(gp_params.model['mlp_params'])[0])
  w1 = np.asarray(jax.tree.leaves(model_out['mlp_params'])[0])
  assert w0.shape == w1.shape and not np.allclose(w0, w1)
  for leaf in jax.tree.leaves(model_out):
    assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize('solver', ['winv', 'chol'])
def test_refactor_then_append_equals_fresh_factorization(
    solver, monkeypatch):
  """The retrain loop's linchpin: a masked refactor at count=k followed
  by rank-1 appends equals the from-scratch factor of the grown
  system under the same (new) hyperparameters — for both the W = L^{-1}
  (default) and the legacy L factor buffers."""
  monkeypatch.setenv('HYPERBO_BO_SOLVER', solver)
  key = jax.random.PRNGKey(16)
  n_max, k, d = 12, 5, 2
  x_all = jax.random.uniform(key, (k + 2, d))
  x_buf = jnp.zeros((n_max, d), jnp.float32).at[:k].set(x_all[:k])
  new_model = {'constant': 0.1, 'lengthscale': jnp.array([-0.3, 0.2]),
               'signal_variance': 0.4, 'noise_variance': -2.5}
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC, retrieve_params
  eps = 1e-6
  fac_buf = ondevice._masked_refactor(
      mean.constant, kernel.squared_exponential, {}, DEFAULT_WARP_FUNC,
      new_model, x_buf, jnp.array(k, jnp.int32), eps=eps)
  shim = GPParams(model=new_model, config={})
  nv, = retrieve_params(shim, ['noise_variance'],
                        warp_func=DEFAULT_WARP_FUNC)
  count = jnp.array(k, jnp.int32)
  for j in range(2):
    fac_buf = ondevice._append_factor(
        kernel.squared_exponential, shim, DEFAULT_WARP_FUNC, nv, eps,
        x_buf, fac_buf, count, x_all[k + j])
    x_buf = x_buf.at[k + j].set(x_all[k + j])
    count = count + 1
  kmat = kernel.squared_exponential(shim, x_all,
                                    warp_func=DEFAULT_WARP_FUNC)
  fresh = jnp.linalg.cholesky(kmat + (nv + eps) * jnp.eye(k + 2))
  want = (jnp.linalg.inv(fresh) if solver == 'winv' else fresh)
  np.testing.assert_allclose(np.asarray(fac_buf[:k + 2, :k + 2]),
                             np.asarray(want), atol=1e-5)


def test_mesh_runner_receives_sharded_corpus(monkeypatch):
  """Regression: the retrain/resample runners must be CALLED with the
  SHARDED corpus (the packed buffers are runtime inputs of the cached
  program, so the jit specializes on their sharding). Sharding only a
  dead local name would keep selections matching — parity tests can't
  catch it — while every device holds the full corpus Gram workload."""
  from hyperbo_tpu.parallel import mesh as mesh_lib
  params, dataset, sdk, queried = _setup(jax.random.PRNGKey(21))
  pretrain = {k: v for k, v in dataset.items()
              if k != sdk and v.aligned is None}
  pp, _ = packed_lib.pack_dataset(pretrain, pad_to_multiple=8,
                                  num_tasks_multiple=8)
  mesh = mesh_lib.create_mesh(8, axis_name='task')
  q8 = defs.SubDataset(queried.x[:8], queried.y[:8])
  seen = []

  real_retrain = ondevice.make_bo_retrain_runner
  real_resample = ondevice.make_bo_resample_runner

  def spy_retrain(*args, **kwargs):
    run = real_retrain(*args, **kwargs)
    def wrapped(model, x0, y0, cand_x, cand_y, pp_arg, ap_arg, key):
      seen.append(pp_arg)
      return run(model, x0, y0, cand_x, cand_y, pp_arg, ap_arg, key)
    return wrapped

  def spy_resample(*args, **kwargs):
    run, unravel = real_resample(*args, **kwargs)
    def wrapped(init_arr, x0_obs, y0_obs, cand_x, cand_y, pp_arg,
                ap_arg, key):
      seen.append(pp_arg)
      return run(init_arr, x0_obs, y0_obs, cand_x, cand_y, pp_arg,
                 ap_arg, key)
    return wrapped, unravel

  monkeypatch.setattr(ondevice, 'make_bo_retrain_runner', spy_retrain)
  monkeypatch.setattr(ondevice, 'make_bo_resample_runner',
                      spy_resample)
  ondevice.simulated_bayesopt_ondevice_retrain(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, q8, iters=2, acquisition='ei',
      num_train_tasks=len(pretrain), pretrain_packed=pp,
      retrain_every=1, retrain_steps=1, mesh=mesh)
  ondevice.simulated_bayesopt_ondevice_hgp_resample(
      mean.constant, kernel.squared_exponential, dict(params.model),
      dict(params.config), None, q8, iters=2, acquisition='ei',
      num_samples=2, num_train_tasks=len(pretrain), pretrain_packed=pp,
      resample_every=1, sweeps=1, init_jitter=0.0, mesh=mesh)
  assert len(seen) == 2
  for packed in seen:
    for leaf in jax.tree.leaves(packed):
      sh = leaf.sharding
      assert getattr(sh, 'mesh', None) is not None and not sh.is_fully_replicated, (
          'runner called with an unsharded corpus leaf '
          f'(sharding={sh})')
