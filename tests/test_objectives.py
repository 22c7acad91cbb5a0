"""Objective tests: NLL/EKL training improves the objective end-to-end;
Cholesky-NLL vs SVD-NLL agreement; packed NLL parity; combinators.

Mirrors reference hyperbo/gp_utils/objectives_test.py:67-324 strategy:
sample ground truth from a known GP, train, assert improvement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import basis as bf
from hyperbo_tpu.models import gp
from hyperbo_tpu.models import kernel
from hyperbo_tpu.models import mean
from hyperbo_tpu.models import objectives as obj
from hyperbo_tpu.models import packed as packed_lib

GPParams = defs.GPParams
SubDataset = defs.SubDataset
WF = DEFAULT_WARP_FUNC


def _ground_truth_dataset(key, cov_func, n=10, num_fns=8, aligned=False):
  d = 2
  params = GPParams(model={
      'constant': 5., 'lengthscale': jnp.array([.999, .999]),
      'signal_variance': 1.0, 'noise_variance': 0.01})
  vx = jax.random.normal(key, (n, d))
  y_all = gp.sample_from_gp(jax.random.PRNGKey(10), mean.constant, cov_func,
                            params, vx, warp_func=WF, num_samples=num_fns)
  if aligned:
    return {'al': SubDataset(x=vx, y=y_all, aligned=1)}, vx
  return {i: SubDataset(x=vx, y=y_all[:, i:i + 1])
          for i in range(num_fns)}, vx


def _init_params(method, objective, cov_func, input_dim):
  params = GPParams(
      model={'constant': 4.0, 'lengthscale': jnp.array([0.] * input_dim),
             'signal_variance': 0., 'noise_variance': -4.},
      config={'method': method, 'learning_rate': 1e-2,
              'max_training_step': 60, 'batch_size': 100,
              'objective': objective, 'tol': 1e-7})
  return params


@pytest.mark.parametrize('method', ['adam', 'lbfgs'])
@pytest.mark.parametrize('cov_func', [
    kernel.squared_exponential, kernel.matern32, kernel.matern52,
], ids=lambda f: f.__name__)
def test_nll_training_improves(method, cov_func):
  dataset, _ = _ground_truth_dataset(jax.random.PRNGKey(0), cov_func)
  init = _init_params(method, obj.nll, cov_func, 2)

  def loss(params):
    return obj.neg_log_marginal_likelihood(
        mean_func=mean.constant, cov_func=cov_func, params=params,
        dataset=dataset, warp_func=WF)

  init_obj = float(loss(init))
  trained = gp.infer_parameters(
      mean.constant, cov_func, init, dataset, warp_func=WF,
      objective=obj.nll, key=jax.random.PRNGKey(1))
  trained_obj = float(loss(trained))
  assert trained_obj < init_obj, (init_obj, trained_obj)


@pytest.mark.parametrize('method', ['adam', 'lbfgs'])
def test_ekl_training_improves(method):
  cov_func = kernel.squared_exponential
  dataset, _ = _ground_truth_dataset(
      jax.random.PRNGKey(2), cov_func, num_fns=10, aligned=True)
  init = _init_params(method, obj.ekl, cov_func, 2)

  def loss(params):
    return obj.multivariate_normal_divergence(
        mean_func=mean.constant, cov_func=cov_func, params=params,
        dataset=dataset, warp_func=WF)

  init_obj = float(loss(init))
  trained = gp.infer_parameters(
      mean.constant, cov_func, init, dataset, warp_func=WF,
      objective=obj.ekl, key=jax.random.PRNGKey(3))
  trained_obj = float(loss(trained))
  assert trained_obj < init_obj, (init_obj, trained_obj)


def test_cholesky_vs_svd_nll_ratio():
  """NLL through Cholesky and SVD agree to 2 decimal places in ratio."""
  cov_func = kernel.matern52
  dataset, _ = _ground_truth_dataset(jax.random.PRNGKey(4), cov_func)
  params = _init_params('adam', obj.nll, cov_func, 2)
  kwargs = dict(mean_func=mean.constant, cov_func=cov_func, params=params,
                dataset=dataset, warp_func=WF)
  nll_c = float(obj.neg_log_marginal_likelihood(**kwargs))
  nll_s = float(obj.neg_log_marginal_likelihood(**kwargs,
                                                use_cholesky=False))
  np.testing.assert_allclose(nll_c / nll_s, 1.0, atol=1e-2)


def test_packed_nll_matches_loop():
  cov_func = kernel.squared_exponential
  dataset, _ = _ground_truth_dataset(jax.random.PRNGKey(5), cov_func)
  # Make sizes ragged.
  dataset[0] = SubDataset(dataset[0].x[:6], dataset[0].y[:6])
  dataset[1] = SubDataset(dataset[1].x[:3], dataset[1].y[:3])
  params = _init_params('adam', obj.nll, cov_func, 2)
  loop = float(obj.neg_log_marginal_likelihood(
      mean_func=mean.constant, cov_func=cov_func, params=params,
      dataset=dataset, warp_func=WF))
  packed, _ = packed_lib.pack_dataset(dataset, pad_to_multiple=8,
                                      num_tasks_multiple=4)
  got = float(packed_lib.neg_log_marginal_likelihood_packed(
      mean.constant, cov_func, params, packed, warp_func=WF))
  np.testing.assert_allclose(got, loop, rtol=1e-5)


def test_packed_nll_with_priors_matches_loop():
  from hyperbo_tpu.models import priors
  cov_func = kernel.squared_exponential
  dataset, _ = _ground_truth_dataset(jax.random.PRNGKey(6), cov_func)
  params = _init_params('adam', obj.nll, cov_func, 2)
  params.config['priors'] = priors.DEFAULT_PRIORS
  loop = float(obj.neg_log_marginal_likelihood(
      mean_func=mean.constant, cov_func=cov_func, params=params,
      dataset=dataset, warp_func=WF))
  packed, _ = packed_lib.pack_dataset(dataset)
  got = float(packed_lib.neg_log_marginal_likelihood_packed(
      mean.constant, cov_func, params, packed, warp_func=WF))
  np.testing.assert_allclose(got, loop, rtol=1e-5)


def test_combinators():
  cov_func = kernel.squared_exponential
  ds_nll, _ = _ground_truth_dataset(jax.random.PRNGKey(7), cov_func,
                                    num_fns=4)
  ds_al, _ = _ground_truth_dataset(jax.random.PRNGKey(8), cov_func,
                                   num_fns=6, aligned=True)
  dataset = {**ds_nll, **ds_al}
  params = _init_params('adam', obj.nll, cov_func, 2)
  kwargs = dict(mean_func=mean.constant, cov_func=cov_func, params=params,
                dataset=dataset, warp_func=WF)
  nll = float(obj.nll(**kwargs))
  ekl = float(obj.ekl(**kwargs))
  euc = float(obj.euc(**kwargs))
  np.testing.assert_allclose(float(obj.nll_regkl1(**kwargs)), nll + ekl,
                             rtol=1e-5)
  np.testing.assert_allclose(float(obj.nll_regkl10(**kwargs)),
                             nll + 10 * ekl, rtol=1e-5)
  # Documented fix: nll_regeuc* really uses the Euclidean regularizer
  # (the reference aliases these to regkl, objectives.py:243,246).
  np.testing.assert_allclose(float(obj.nll_regeuc01(**kwargs)),
                             nll + 0.1 * euc, rtol=1e-5)


def test_mlp_kernel_nll_training_improves():
  cov_func = kernel.squared_exponential_mlp
  dataset, vx = _ground_truth_dataset(jax.random.PRNGKey(9),
                                      kernel.matern52)
  init = _init_params('adam', obj.nll, cov_func, 2)
  init.config['mlp_features'] = (4,)
  init.model['lengthscale'] = jnp.zeros(4)
  bf.init_mlp_with_shape(jax.random.PRNGKey(11), init, vx.shape)

  def loss(params):
    return obj.neg_log_marginal_likelihood(
        mean_func=mean.constant, cov_func=cov_func, params=params,
        dataset=dataset, warp_func=WF)

  init_obj = float(loss(init))
  trained = gp.infer_parameters(
      mean.constant, cov_func, init, dataset, warp_func=WF,
      objective=obj.nll, key=jax.random.PRNGKey(12))
  assert float(loss(trained)) < init_obj


def test_packed_ekl_matches_loop():
  """Packed partial-KL EKL equals the per-task loop, ragged n and m."""
  import functools
  from hyperbo_tpu.models import divergences
  cov_func = kernel.squared_exponential
  params = _init_params('adam', obj.ekl, cov_func, 2)
  key = jax.random.PRNGKey(13)
  gt = GPParams(model={'constant': 2., 'lengthscale': jnp.array([.7, .7]),
                       'signal_variance': 1.0, 'noise_variance': 0.01})
  dataset = {}
  for i, (n, m) in enumerate([(9, 6), (5, 4), (7, 10)]):
    vx = jax.random.normal(jax.random.fold_in(key, i), (n, 2))
    y = gp.sample_from_gp(jax.random.fold_in(key, 100 + i), mean.constant,
                          cov_func, gt, vx, warp_func=WF, num_samples=m)
    dataset[i] = SubDataset(vx, y, aligned=1)

  loop = float(obj.multivariate_normal_divergence(
      mean_func=mean.constant, cov_func=cov_func, params=params,
      dataset=dataset, warp_func=WF,
      distance=functools.partial(divergences.kl_multivariate_normal,
                                 partial=True)))
  packed, _ = packed_lib.pack_aligned_dataset(dataset, pad_to_multiple=8,
                                              num_tasks_multiple=4)
  got = float(packed_lib.multivariate_normal_divergence_packed(
      mean.constant, cov_func, params, packed, warp_func=WF))
  np.testing.assert_allclose(got, loop, rtol=2e-5)


def test_packed_combined_objective_training():
  """nll + c*EKL trains fully on device via the packed path and improves
  both components."""
  cov_func = kernel.squared_exponential
  ds_nll, _ = _ground_truth_dataset(jax.random.PRNGKey(20), cov_func,
                                    num_fns=5)
  ds_al, _ = _ground_truth_dataset(jax.random.PRNGKey(21), cov_func,
                                   num_fns=8, aligned=True)
  dataset = {**ds_nll, **ds_al}
  objective = obj.nll_regkl(0.5)
  init = _init_params('adam', objective, cov_func, 2)

  def full_loss(params):
    return float(objective(
        mean_func=mean.constant, cov_func=cov_func, params=params,
        dataset=dataset, warp_func=WF))

  # Confirm the packed route is actually taken.
  built = gp._build_packed_training(objective, dataset, init.config,
                                    mean.constant, cov_func, WF)
  assert built is not None and built[3] is False

  before = full_loss(init)
  trained = gp.infer_parameters(
      mean.constant, cov_func, init, dataset, warp_func=WF,
      objective=objective, key=jax.random.PRNGKey(22))
  after = full_loss(trained)
  assert after < before, (before, after)


def test_packed_ekl_only_training():
  """Pure EKL objective routes through the packed aligned path."""
  cov_func = kernel.squared_exponential
  dataset, _ = _ground_truth_dataset(jax.random.PRNGKey(23), cov_func,
                                     num_fns=10, aligned=True)
  init = _init_params('adam', obj.ekl, cov_func, 2)
  built = gp._build_packed_training(obj.ekl, dataset, init.config,
                                    mean.constant, cov_func, WF)
  assert built is not None

  def full_loss(params):
    return float(obj.multivariate_normal_divergence(
        mean_func=mean.constant, cov_func=cov_func, params=params,
        dataset=dataset, warp_func=WF))

  before = full_loss(init)
  trained = gp.infer_parameters(
      mean.constant, cov_func, init, dataset, warp_func=WF,
      objective=obj.ekl, key=jax.random.PRNGKey(24))
  assert full_loss(trained) < before


def test_fast_subsample_training_improves():
  """Window-batch fast path trains and matches full-loss improvement."""
  from hyperbo_tpu.train import adam as adam_lib
  cov_func = kernel.squared_exponential
  dataset, _ = _ground_truth_dataset(jax.random.PRNGKey(30), cov_func,
                                     n=16, num_fns=6)
  init = _init_params('adam', obj.nll, cov_func, 2)
  init.config['batch_size'] = 8
  init.config['fast_subsample'] = True
  packed, _ = packed_lib.pack_dataset(dataset)

  def full_loss(m):
    shim = GPParams(model=m, config=init.config)
    return float(packed_lib.neg_log_marginal_likelihood_packed(
        mean.constant, cov_func, shim, packed, warp_func=WF))

  before = full_loss(init.model)
  model, losses = adam_lib.fit_adam_packed(
      mean.constant, cov_func, dict(init.model), packed, init.config,
      warp_func=WF, key=jax.random.PRNGKey(31))
  assert full_loss(model) < before
  # window batches have full batch_size masks when counts allow
  sub = packed_lib.subsample_packed_window(
      jax.random.PRNGKey(32), packed_lib.prepermute_packed(
          jax.random.PRNGKey(33), packed), 8)
  assert sub.x.shape[1] == 8
  import numpy as np
  np.testing.assert_array_equal(np.asarray(sub.count),
                                np.minimum(np.asarray(packed.count), 8))


def test_fused_mll_objective_parity():
  """config['fused_mll'] routes plain-SE NLL through the fused Pallas
  kernel (interpret on CPU) with value parity vs the dense pipeline."""
  from hyperbo_tpu.models import objectives
  n, d = 512, 3
  key = jax.random.PRNGKey(4)
  vx = jax.random.uniform(key, (n, d))
  vy = jax.random.normal(jax.random.fold_in(key, 1), (n, 1))
  dataset = {'a': defs.SubDataset(vx, vy)}
  params_dense = defs.GPParams(
      model={'constant': 0.3, 'lengthscale': jnp.ones(d) * 0.4,
             'signal_variance': 0.5, 'noise_variance': -2.0},
      config={})
  params_fused = defs.GPParams(model=dict(params_dense.model),
                               config={'fused_mll': 'interpret'})
  want = float(objectives.neg_log_marginal_likelihood(
      mean.constant, kernel.squared_exponential, params_dense, dataset,
      warp_func=DEFAULT_WARP_FUNC))
  got = float(objectives.neg_log_marginal_likelihood(
      mean.constant, kernel.squared_exponential, params_fused, dataset,
      warp_func=DEFAULT_WARP_FUNC))
  np.testing.assert_allclose(got, want, rtol=1e-4)
  # Kernels outside the SE/Matern families fall back to the dense path
  # untouched (dot_product's Gram is one rank-d matmul — nothing for
  # the fused kernel to win).
  for p in (params_dense, params_fused):
    p.model['dot_prod_sigma'] = 0.8
    p.model['dot_prod_bias'] = 0.1
  got_dp = float(objectives.neg_log_marginal_likelihood(
      mean.constant, kernel.dot_product, params_fused, dataset,
      warp_func=DEFAULT_WARP_FUNC))
  want_dp = float(objectives.neg_log_marginal_likelihood(
      mean.constant, kernel.dot_product, params_dense, dataset,
      warp_func=DEFAULT_WARP_FUNC))
  np.testing.assert_allclose(got_dp, want_dp, rtol=1e-6)


@pytest.mark.parametrize('cov_name', ['matern32', 'matern52'])
def test_fused_mll_serves_matern_kernels(cov_name):
  """Matern 3/2 and 5/2 evaluate AND differentiate through the fused
  path (the in-kernel Gram transform generalizes beyond SE; the
  closed-form adjoint is smooth at r=0 — ops/pallas_mll._gram_transform
  / _se_core_bwd). Reference forms: hyperbo/gp_utils/kernel.py:84-123."""
  cov = getattr(kernel, cov_name)
  n, d = 512, 3
  key = jax.random.PRNGKey(46)
  vx = jax.random.uniform(key, (n, d))
  vy = jax.random.normal(jax.random.fold_in(key, 1), (n, 1))
  dataset = {'a': defs.SubDataset(vx, vy)}
  model = {'constant': 0.3, 'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': 0.5, 'noise_variance': -2.0}
  want = float(_nll_loss_fn(cov, {}, dataset)(model))
  got = float(_nll_loss_fn(cov, {'fused_mll': 'interpret'},
                           dataset)(model))
  np.testing.assert_allclose(got, want, rtol=1e-4)
  g_dense = jax.grad(_nll_loss_fn(cov, {}, dataset))(model)
  g_fused = jax.grad(_nll_loss_fn(cov, {'fused_mll': 'interpret'},
                                  dataset))(model)
  for k in model:
    a = np.asarray(g_dense[k])
    b = np.asarray(g_fused[k])
    assert np.max(np.abs(a - b)) <= 3e-3 * np.max(np.abs(a)) + 1e-5, (
        f'grad mismatch for {k}: {a} vs {b}')


@pytest.mark.parametrize('cov_name', ['squared_exponential', 'matern32'])
def test_fused_mll_ragged_n(cov_name):
  """n not divisible by group*block routes through the masked fused
  kernel via internal sentinel padding (ops/pallas_mll.se_nll_fused) —
  value parity with the dense pipeline and gradients in the same f32
  noise class (threshold calibrated against an f64 ground truth: at
  n=700 the dense-f32 gradient itself errs ~2e-3 of scale; the masked
  fused backward ~1e-2)."""
  cov = getattr(kernel, cov_name)
  n, d = 700, 3
  key = jax.random.PRNGKey(8)
  vx = jax.random.uniform(key, (n, d))
  vy = jax.random.normal(jax.random.fold_in(key, 1), (n, 1))
  dataset = {'a': defs.SubDataset(vx, vy)}
  model = {'constant': 0.3, 'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': 0.5, 'noise_variance': -2.0}
  from hyperbo_tpu.ops import pallas_mll
  assert pallas_mll.se_nll_fused_applicable(cov, vx)
  assert not pallas_mll.se_nll_fused_applicable(cov, vx[:100])
  want = float(_nll_loss_fn(cov, {}, dataset)(model))
  got = float(_nll_loss_fn(cov, {'fused_mll': 'interpret'},
                           dataset)(model))
  np.testing.assert_allclose(got, want, rtol=2e-4)
  g_dense = jax.grad(_nll_loss_fn(cov, {}, dataset))(model)
  g_fused = jax.grad(_nll_loss_fn(cov, {'fused_mll': 'interpret'},
                                  dataset))(model)
  for k in model:
    a = np.asarray(g_dense[k])
    b = np.asarray(g_fused[k])
    assert np.max(np.abs(a - b)) <= 1.2e-2 * np.max(np.abs(a)) + 1e-4, (
        f'ragged grad mismatch for {k}: {a} vs {b}')


def test_fused_packed_nll_ragged_nmax():
  """Packed fused NLL when n_max itself is not a group*block multiple:
  the masked kernel pads internally, so pack_dataset's pad_to_multiple
  no longer has to be 512-aligned for the fused path to engage."""
  d = 3
  key = jax.random.PRNGKey(52)
  dataset = {}
  for i, n_i in enumerate((600, 530)):
    kx = jax.random.fold_in(key, 10 + 2 * i)
    ky = jax.random.fold_in(key, 11 + 2 * i)
    dataset[i] = defs.SubDataset(
        jax.random.uniform(kx, (n_i, d)),
        jax.random.normal(ky, (n_i, 1)))
  packed, _ = packed_lib.pack_dataset(dataset, pad_to_multiple=8)
  assert packed.x.shape[1] == 600  # deliberately not % 512
  model = {'constant': 0.3, 'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': 0.5, 'noise_variance': -2.0}

  def loss_fn(config):
    def loss(m):
      p = defs.GPParams(model=m, config=config)
      return packed_lib.neg_log_marginal_likelihood_packed(
          mean.constant, kernel.squared_exponential, p, packed,
          warp_func=DEFAULT_WARP_FUNC)
    return loss

  want = float(loss_fn({})(model))
  got = float(loss_fn({'fused_mll': 'interpret'})(model))
  np.testing.assert_allclose(got, want, rtol=2e-4)
  g_dense = jax.grad(loss_fn({}))(model)
  g_fused = jax.grad(loss_fn({'fused_mll': 'interpret'}))(model)
  for k in model:
    a = np.asarray(g_dense[k])
    b = np.asarray(g_fused[k])
    assert np.max(np.abs(a - b)) <= 1.2e-2 * np.max(np.abs(a)) + 1e-4, (
        f'ragged packed grad mismatch for {k}: {a} vs {b}')


def test_fused_mll_serves_matern_mlp_kernel():
  """matern52_mlp (Matern over MLP embeddings) through the fused path:
  value and gradient parity with the dense pipeline, including the MLP
  parameters (embedding outside the custom VJP)."""
  from hyperbo_tpu.models import basis as bf
  n, d = 512, 3
  key = jax.random.PRNGKey(47)
  vx = jax.random.uniform(key, (n, d))
  vy = jax.random.normal(jax.random.fold_in(key, 1), (n, 1))
  dataset = {'a': defs.SubDataset(vx, vy)}
  mlp_features = (8, 8)
  base_cfg = {'mlp_features': mlp_features}
  p_init = defs.GPParams(
      model={'constant': 0.3, 'lengthscale': jnp.ones(mlp_features[-1]),
             'signal_variance': 0.5, 'noise_variance': -2.0},
      config=dict(base_cfg))
  bf.init_mlp_with_shape(jax.random.fold_in(key, 2), p_init, (0, d))
  model = p_init.model
  want = float(_nll_loss_fn(
      kernel.matern52_mlp, dict(base_cfg), dataset)(model))
  got = float(_nll_loss_fn(
      kernel.matern52_mlp, dict(base_cfg, fused_mll='interpret'),
      dataset)(model))
  np.testing.assert_allclose(got, want, rtol=1e-4)
  g_dense = jax.grad(_nll_loss_fn(
      kernel.matern52_mlp, dict(base_cfg), dataset))(model)
  g_fused = jax.grad(_nll_loss_fn(
      kernel.matern52_mlp, dict(base_cfg, fused_mll='interpret'),
      dataset))(model)
  from jax.flatten_util import ravel_pytree
  a = np.asarray(ravel_pytree(g_dense)[0])
  b = np.asarray(ravel_pytree(g_fused)[0])
  assert np.max(np.abs(a - b)) <= 3e-3 * np.max(np.abs(a)) + 1e-5


def _nll_loss_fn(cov, config, dataset):
  from hyperbo_tpu.models import objectives

  def loss(model):
    p = defs.GPParams(model=model, config=config)
    return objectives.neg_log_marginal_likelihood(
        mean.constant, cov, p, dataset, warp_func=DEFAULT_WARP_FUNC)

  return loss


def test_fused_mll_custom_vjp_gradient_parity():
  """jax.grad through the fused path (custom VJP reusing the kernel's L
  factor) matches the dense pipeline's autodiff gradient for every
  model parameter — the round-3 trainability requirement (reference
  training loop: hyperbo/gp_utils/gp.py:124-146)."""
  n, d = 512, 3
  key = jax.random.PRNGKey(40)
  vx = jax.random.uniform(key, (n, d))
  vy = jax.random.normal(jax.random.fold_in(key, 1), (n, 1))
  dataset = {'a': defs.SubDataset(vx, vy)}
  model = {'constant': 0.3, 'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': 0.5, 'noise_variance': -2.0}
  g_dense = jax.grad(_nll_loss_fn(
      kernel.squared_exponential, {}, dataset))(model)
  g_fused = jax.grad(_nll_loss_fn(
      kernel.squared_exponential, {'fused_mll': 'interpret'},
      dataset))(model)
  for k in model:
    a = np.asarray(g_dense[k])
    b = np.asarray(g_fused[k])
    # Scale-relative: both pipelines are f32; elementwise rtol is too
    # strict for near-zero entries of well-scaled gradients.
    assert np.max(np.abs(a - b)) <= 3e-3 * np.max(np.abs(a)) + 1e-5, (
        f'grad mismatch for {k}: {a} vs {b}')
  # Finite-difference sanity check (sign / factor errors) on the scalar
  # parameters. The kernel value carries ~3e-2 absolute f32 noise at
  # n=512, so central differences are only ~10%-accurate at any eps;
  # the rigorous gradient check is the dense-autodiff parity above.
  loss_fused = _nll_loss_fn(
      kernel.squared_exponential, {'fused_mll': 'interpret'}, dataset)
  for k in ('noise_variance', 'signal_variance', 'constant'):
    eps = 0.03
    up = dict(model)
    up[k] = model[k] + eps
    dn = dict(model)
    dn[k] = model[k] - eps
    fd = (float(loss_fused(up)) - float(loss_fused(dn))) / (2 * eps)
    np.testing.assert_allclose(float(g_fused[k]), fd, rtol=0.15,
                               atol=0.3, err_msg=f'FD mismatch for {k}')


def test_fused_mll_serves_mlp_kernel():
  """squared_exponential_mlp (the flagship demo config) evaluates AND
  differentiates through the fused path: SE over the MLP embedding is
  SE on embedded inputs (reference hyperbo/gp_utils/kernel.py:148-183)."""
  from hyperbo_tpu.models import basis as bf
  n, d = 512, 3
  key = jax.random.PRNGKey(41)
  vx = jax.random.uniform(key, (n, d))
  vy = jax.random.normal(jax.random.fold_in(key, 1), (n, 1))
  dataset = {'a': defs.SubDataset(vx, vy)}
  mlp_features = (8, 8)
  base_cfg = {'mlp_features': mlp_features}
  p_init = defs.GPParams(
      model={'constant': 0.3, 'lengthscale': jnp.ones(mlp_features[-1]),
             'signal_variance': 0.5, 'noise_variance': -2.0},
      config=dict(base_cfg))
  bf.init_mlp_with_shape(jax.random.fold_in(key, 2), p_init, (0, d))
  model = p_init.model
  dense_cfg = dict(base_cfg)
  fused_cfg = dict(base_cfg, fused_mll='interpret')
  want = float(_nll_loss_fn(
      kernel.squared_exponential_mlp, dense_cfg, dataset)(model))
  got = float(_nll_loss_fn(
      kernel.squared_exponential_mlp, fused_cfg, dataset)(model))
  np.testing.assert_allclose(got, want, rtol=1e-4)
  g_dense = jax.grad(_nll_loss_fn(
      kernel.squared_exponential_mlp, dense_cfg, dataset))(model)
  g_fused = jax.grad(_nll_loss_fn(
      kernel.squared_exponential_mlp, fused_cfg, dataset))(model)
  from jax.flatten_util import ravel_pytree
  flat_d, _ = ravel_pytree(g_dense)
  flat_f, _ = ravel_pytree(g_fused)
  a = np.asarray(flat_d)
  b = np.asarray(flat_f)
  assert np.max(np.abs(a - b)) <= 3e-3 * np.max(np.abs(a)) + 1e-5


def test_fused_packed_nll_parity_and_grad():
  """Packed multi-task NLL through the fused kernel (sentinel-row
  padding) matches the vmapped dense pipeline in value AND gradient,
  including a task with padded rows."""
  from hyperbo_tpu.models import packed as packed_lib
  d = 3
  key = jax.random.PRNGKey(50)
  dataset = {}
  for i, n_i in enumerate((512, 450)):
    kx = jax.random.fold_in(key, 2 * i)
    ky = jax.random.fold_in(key, 2 * i + 1)
    dataset[i] = defs.SubDataset(
        jax.random.uniform(kx, (n_i, d)),
        jax.random.normal(ky, (n_i, 1)))
  packed, _ = packed_lib.pack_dataset(dataset, pad_to_multiple=512)
  assert packed.x.shape[1] == 512 and int(packed.count[1]) == 450
  model = {'constant': 0.3, 'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': 0.5, 'noise_variance': -2.0}

  def loss_fn(config):
    def loss(m):
      p = defs.GPParams(model=m, config=config)
      return packed_lib.neg_log_marginal_likelihood_packed(
          mean.constant, kernel.squared_exponential, p, packed,
          warp_func=DEFAULT_WARP_FUNC)
    return loss

  want = float(loss_fn({})(model))
  got = float(loss_fn({'fused_mll': 'interpret'})(model))
  np.testing.assert_allclose(got, want, rtol=2e-4)
  g_dense = jax.grad(loss_fn({}))(model)
  g_fused = jax.grad(loss_fn({'fused_mll': 'interpret'}))(model)
  for k in model:
    a = np.asarray(g_dense[k])
    b = np.asarray(g_fused[k])
    assert np.max(np.abs(a - b)) <= 5e-3 * np.max(np.abs(a)) + 1e-4, (
        f'packed grad mismatch for {k}: {a} vs {b}')


def test_fused_packed_nll_matern_padded_rows():
  """Packed fused NLL with a Matern kernel and a padded task: the
  padded-row penalty must be larger for Matern (poly * exp decay — P=400
  vs SE's 50, ops/pallas_mll._PENALTY) for value/grad parity to hold."""
  d = 3
  key = jax.random.PRNGKey(51)
  dataset = {}
  for i, n_i in enumerate((512, 450)):
    kx = jax.random.fold_in(key, 2 * i)
    ky = jax.random.fold_in(key, 2 * i + 1)
    dataset[i] = defs.SubDataset(
        jax.random.uniform(kx, (n_i, d)),
        jax.random.normal(ky, (n_i, 1)))
  packed, _ = packed_lib.pack_dataset(dataset, pad_to_multiple=512)
  model = {'constant': 0.3, 'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': 0.5, 'noise_variance': -2.0}

  def loss_fn(config):
    def loss(m):
      p = defs.GPParams(model=m, config=config)
      return packed_lib.neg_log_marginal_likelihood_packed(
          mean.constant, kernel.matern32, p, packed,
          warp_func=DEFAULT_WARP_FUNC)
    return loss

  want = float(loss_fn({})(model))
  got = float(loss_fn({'fused_mll': 'interpret'})(model))
  np.testing.assert_allclose(got, want, rtol=2e-4)
  g_dense = jax.grad(loss_fn({}))(model)
  g_fused = jax.grad(loss_fn({'fused_mll': 'interpret'}))(model)
  for k in model:
    a = np.asarray(g_dense[k])
    b = np.asarray(g_fused[k])
    assert np.max(np.abs(a - b)) <= 5e-3 * np.max(np.abs(a)) + 1e-4, (
        f'packed matern grad mismatch for {k}: {a} vs {b}')


def test_make_fit_adam_packed_runner():
  """Reusable compiled runner: trains, reuses across calls, both
  samplers; final params match fit_adam_scan semantics (NaN-freeze,
  per-step window subsampling)."""
  from hyperbo_tpu.train import adam as adam_lib
  cov_func = kernel.squared_exponential
  dataset, _ = _ground_truth_dataset(jax.random.PRNGKey(40), cov_func,
                                     n=16, num_fns=6)
  init = _init_params('adam', obj.nll, cov_func, 2)
  init.config['batch_size'] = 8
  init.config['max_training_step'] = 40
  packed, _ = packed_lib.pack_dataset(dataset)

  def full_loss(m):
    shim = GPParams(model=m, config=init.config)
    return float(packed_lib.neg_log_marginal_likelihood_packed(
        mean.constant, cov_func, shim, packed, warp_func=WF))

  before = full_loss(init.model)
  for fast in (False, True):
    cfg = dict(init.config)
    cfg['fast_subsample'] = fast
    runner = adam_lib.make_fit_adam_packed(
        mean.constant, cov_func, cfg, warp_func=WF)
    model, losses = runner(dict(init.model), packed,
                           jax.random.PRNGKey(41))
    assert losses.shape == (40,)
    assert full_loss(model) < before
    # Second call reuses the same jit object (no error, fresh key).
    model2, losses2 = runner(dict(init.model), packed,
                             jax.random.PRNGKey(42))
    assert full_loss(model2) < before
    assert float(losses2[-1]) != float(losses[-1])  # keys differ


def test_fused_bwd_knobs_gradient_parity():
  """The backward env knobs (HYPERBO_BWD_KINV=syrk block-column K^{-1};
  HYPERBO_BWD_PREC=default single-pass products) keep the fused VJP's
  gradients in their documented accuracy classes vs the default
  backward (ops/pallas_mll._kinv_from_linv / _bwd_precision)."""
  import os
  from hyperbo_tpu.ops import pallas_mll

  n, d = 512, 3
  key = jax.random.PRNGKey(52)
  vx = jax.random.uniform(key, (n, d))
  vy = jax.random.normal(jax.random.fold_in(key, 1), (n, 1))
  dataset = {'a': defs.SubDataset(vx, vy)}
  model = {'constant': 0.3, 'lengthscale': jnp.ones(d) * 0.4,
           'signal_variance': 0.5, 'noise_variance': -2.0}
  loss = _nll_loss_fn(kernel.squared_exponential,
                      {'fused_mll': 'interpret'}, dataset)

  knobs = ('HYPERBO_BWD_KINV', 'HYPERBO_BWD_PREC', 'HYPERBO_BWD_FUSED')

  def grad_with(**env):
    saved = {k: os.environ.pop(k, None) for k in knobs}
    os.environ.update(env)
    pallas_mll._se_nll_core_fn.cache_clear()
    pallas_mll._se_nll_core_masked_fn.cache_clear()
    try:
      return jax.grad(loss)(model)
    finally:
      for k in knobs:
        os.environ.pop(k, None)
        if saved[k] is not None:
          os.environ[k] = saved[k]
      pallas_mll._se_nll_core_fn.cache_clear()
      pallas_mll._se_nll_core_masked_fn.cache_clear()

  g_ref = grad_with()
  # syrk is the same arithmetic reassociated: tight tolerance. On CPU
  # interpret, HIGH precision is exact f32, so expect near-identity.
  g_syrk = grad_with(HYPERBO_BWD_KINV='syrk')
  # single-pass products: the ~1e-3 class documented in _bwd_precision
  # (on CPU DEFAULT == f32, so this mostly checks the code path runs).
  g_fast = grad_with(HYPERBO_BWD_KINV='syrk', HYPERBO_BWD_PREC='default')
  # The fully fused Pallas backward (ops/pallas_mll_bwd): K^{-1}
  # consumed block-wise in VMEM. Noise class of a cancelling f32
  # reduction (tests/test_pallas_mll_bwd.py pins it vs f64 truth).
  g_pallas = grad_with(HYPERBO_BWD_FUSED='1')
  for k in model:
    a = np.asarray(g_ref[k])
    np.testing.assert_allclose(np.asarray(g_syrk[k]), a,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fast[k]), a,
                               rtol=5e-3, atol=1e-5)
    sc = np.max(np.abs(a)) + 1e-8
    np.testing.assert_allclose(np.asarray(g_pallas[k]), a,
                               rtol=2e-2, atol=5e-3 * sc)
