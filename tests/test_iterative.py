"""Matrix-free MLL (ops/iterative): CG + SLQ against the dense pipeline.

The quad term is CG-exact to tolerance; the logdet is a randomized
estimate (error ~ 1/sqrt(num_probes)), so tolerances differ per term.
Reference objective: hyperbo/gp_utils/objectives.py:144-156.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import kernel, mean
from hyperbo_tpu.models import objectives as obj
from hyperbo_tpu.ops import iterative


def _system(n, d, seed=0):
  key = jax.random.PRNGKey(seed)
  x = jax.random.uniform(key, (n, d), jnp.float32)
  y = jax.random.normal(jax.random.fold_in(key, 1), (n, 1), jnp.float32)
  params = defs.GPParams(model={
      'constant': 0.2, 'lengthscale': jnp.ones(d) * 0.4,
      'signal_variance': 0.3, 'noise_variance': 0.5})
  return x, y, params


def test_kernel_matvec_matches_dense():
  n, d = 256, 3
  x, y, params = _system(n, d)
  from hyperbo_tpu.core.warp import retrieve_params
  ls, sv, nv = retrieve_params(
      params, ['lengthscale', 'signal_variance', 'noise_variance'],
      warp_func=DEFAULT_WARP_FUNC)
  xs = x / ls
  kdense = kernel.squared_exponential(params, x,
                                      warp_func=DEFAULT_WARP_FUNC)
  da = jnp.squeeze(nv) + 0.0
  v = jax.random.normal(jax.random.PRNGKey(7), (n, 4), jnp.float32)
  got = iterative.kernel_matvec(xs, v, jnp.squeeze(sv), da,
                                row_chunk=64)
  want = (kdense + da * jnp.eye(n)) @ v
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=2e-4)


def test_cg_solves_spd_system():
  n = 200
  key = jax.random.PRNGKey(3)
  a = jax.random.normal(key, (n, n))
  a = a @ a.T / n + 2.0 * jnp.eye(n)
  b = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
  x, iters, res = iterative.cg_batched(lambda v: a @ v, b, tol=1e-7)
  np.testing.assert_allclose(np.asarray(a @ x), np.asarray(b),
                             atol=1e-4)
  assert int(iters) < 200


def test_slq_logdet_close_to_exact():
  n = 256
  key = jax.random.PRNGKey(5)
  a = jax.random.normal(key, (n, n))
  a = a @ a.T / n + 2.0 * jnp.eye(n)
  want = float(jnp.linalg.slogdet(a)[1])
  got = float(iterative.slq_logdet(lambda v: a @ v, n,
                                   jax.random.PRNGKey(0),
                                   num_probes=24, lanczos_steps=30))
  assert abs(got - want) / abs(want) < 0.05, (got, want)


@pytest.mark.parametrize('cov_name,n', [
    ('squared_exponential', 256), ('matern52', 300)])
def test_mll_iterative_matches_dense(cov_name, n):
  """End-to-end estimate vs the dense NLL; n=300 exercises padding."""
  d = 3
  x, y, params = _system(n, d, seed=cov_name == 'matern52')
  cov = getattr(kernel, cov_name)
  dataset = {'a': defs.SubDataset(x, y)}
  want = float(obj.neg_log_marginal_likelihood(
      mean.constant, cov, params, dataset, warp_func=DEFAULT_WARP_FUNC))
  got = float(iterative.mll_iterative(
      mean.constant, params, x, y, warp_func=DEFAULT_WARP_FUNC,
      cov_func=cov, row_chunk=128, num_probes=32, lanczos_steps=30,
      key=jax.random.PRNGKey(11)))
  # quad is CG-exact; logdet carries the SLQ noise class.
  assert abs(got - want) / abs(want) < 0.05, (got, want)


def test_mll_iterative_gradients_match_dense():
  """jax.grad works (CG/Lanczos run under stop_gradient; surrogate
  terms carry the exact quad gradient and the Hutchinson logdet-trace
  estimate) and matches the dense pipeline's gradients to the
  stochastic-estimator noise class."""
  n, d = 256, 3
  x, y, params = _system(n, d, seed=2)

  def loss_iter(model, seed=3):
    p = defs.GPParams(model=model, config={})
    return iterative.mll_iterative(
        mean.constant, p, x, y, warp_func=DEFAULT_WARP_FUNC,
        cov_func=kernel.matern52, row_chunk=128, cg_tol=1e-6,
        num_probes=64, lanczos_steps=30, key=jax.random.PRNGKey(seed))

  def loss_dense(model):
    p = defs.GPParams(model=model, config={})
    return obj.neg_log_marginal_likelihood(
        mean.constant, kernel.matern52, p, {'a': defs.SubDataset(x, y)},
        warp_func=DEFAULT_WARP_FUNC)

  g_de = jax.grad(loss_dense)(dict(params.model))
  grads = [jax.grad(lambda m, s=s: loss_iter(m, seed=s))(
      dict(params.model)) for s in (3, 5, 7)]
  for g_it in grads:
    for k in g_de:
      a, b = np.asarray(g_de[k]), np.asarray(g_it[k])
      assert np.all(np.isfinite(b)), (k, b)
      # Per-draw: the Hutchinson trace estimator's noise class.
      sc = np.max(np.abs(a)) + 1e-6
      assert np.max(np.abs(a - b)) / sc < 0.6, (k, a, b)
  # The mean-parameter gradient flows only through the CG-exact quad
  # term — it must match tightly, every draw.
  for g_it in grads:
    np.testing.assert_allclose(float(g_it['constant']),
                               float(g_de['constant']), rtol=1e-3)
  # Averaging over seeds shrinks the stochastic part: bias check.
  for k in g_de:
    a = np.asarray(g_de[k])
    b = np.mean([np.asarray(g[k]) for g in grads], axis=0)
    sc = np.max(np.abs(a)) + 1e-6
    assert np.max(np.abs(a - b)) / sc < 0.25, (k, a, b)


def test_mll_iterative_return_info():
  n, d = 256, 2
  x, y, params = _system(n, d, seed=4)
  nll, info = iterative.mll_iterative(
      mean.constant, params, x, y, warp_func=DEFAULT_WARP_FUNC,
      cov_func=kernel.squared_exponential, row_chunk=128,
      return_info=True)
  assert np.isfinite(float(nll))
  assert int(info['cg_iters']) < 1000
  assert float(info['cg_residual']) < 1e-3


def test_objective_routes_iterative_mll():
  """config['iterative_mll'] routes single-task NLL through the
  matrix-free estimator (True or a kwargs dict); non-family kernels
  fall back to the dense pipeline untouched."""
  n, d = 256, 2
  x, y, params = _system(n, d, seed=6)
  dataset = {'a': defs.SubDataset(x, y)}
  want = float(obj.neg_log_marginal_likelihood(
      mean.constant, kernel.squared_exponential, params, dataset,
      warp_func=DEFAULT_WARP_FUNC))
  params_it = defs.GPParams(
      model=dict(params.model),
      config={'iterative_mll': {'row_chunk': 128, 'num_probes': 32,
                                'lanczos_steps': 30,
                                'key': jax.random.PRNGKey(1)}})
  got = float(obj.neg_log_marginal_likelihood(
      mean.constant, kernel.squared_exponential, params_it, dataset,
      warp_func=DEFAULT_WARP_FUNC))
  assert abs(got - want) / abs(want) < 0.05, (got, want)
  # dot_product is outside the stationary table -> dense fallback.
  for p in (params, params_it):
    p.model['dot_prod_sigma'] = 0.8
    p.model['dot_prod_bias'] = 0.1
  want_dp = float(obj.neg_log_marginal_likelihood(
      mean.constant, kernel.dot_product, params, dataset,
      warp_func=DEFAULT_WARP_FUNC))
  got_dp = float(obj.neg_log_marginal_likelihood(
      mean.constant, kernel.dot_product, params_it, dataset,
      warp_func=DEFAULT_WARP_FUNC))
  np.testing.assert_allclose(got_dp, want_dp, rtol=1e-6)


def test_pivoted_cholesky_preconditioner():
  """Rank-k pivoted Cholesky approximates K; PCG cuts iterations in
  the small-ridge regime and reaches the same solution."""
  n, d = 256, 2
  key = jax.random.PRNGKey(8)
  x = jax.random.uniform(key, (n, d), jnp.float32)
  from hyperbo_tpu.core.warp import retrieve_params
  params = defs.GPParams(model={
      'constant': 0.0, 'lengthscale': jnp.ones(d) * 0.6,
      'signal_variance': 0.5, 'noise_variance': -6.0})  # tiny ridge
  ls, sv, nv = retrieve_params(
      params, ['lengthscale', 'signal_variance', 'noise_variance'],
      warp_func=DEFAULT_WARP_FUNC)
  xs = x / ls
  svj, da = jnp.squeeze(sv), jnp.squeeze(nv) + 1e-6

  lmat = iterative.partial_pivoted_cholesky(xs, svj, 'se', 64)
  kdense = kernel.squared_exponential(params, x,
                                      warp_func=DEFAULT_WARP_FUNC)
  # Low-rank residual shrinks with rank (SE spectra decay fast).
  resid = float(jnp.max(jnp.abs(kdense - lmat @ lmat.T)))
  assert resid < 0.05 * float(svj), resid

  b = jax.random.normal(jax.random.fold_in(key, 1), (n, 2), jnp.float32)
  mv = lambda v: iterative.kernel_matvec(xs, v, svj, da, row_chunk=64)
  x_plain, it_plain, _ = iterative.cg_batched(mv, b, tol=1e-6,
                                              maxiter=3000)
  pinv = iterative.woodbury_inverse_apply(lmat, da)
  x_pcg, it_pcg, _ = iterative.cg_batched(mv, b, tol=1e-6, maxiter=3000,
                                          precond=pinv)
  # Same fixed point: compare at the solution's own scale (the system
  # is deliberately ill-conditioned — elementwise near-zero entries of
  # two tol-1e-6 solutions legitimately differ).
  dx = np.abs(np.asarray(x_pcg) - np.asarray(x_plain)).max()
  sc = np.abs(np.asarray(x_plain)).max()
  assert dx / sc < 1e-2, (dx, sc)
  assert int(it_pcg) < int(it_plain) / 3, (int(it_pcg), int(it_plain))


def test_mll_iterative_with_preconditioner():
  n, d = 256, 2
  x, y, params = _system(n, d, seed=9)
  params.model['noise_variance'] = -4.0  # smaller ridge
  dataset = {'a': defs.SubDataset(x, y)}
  want = float(obj.neg_log_marginal_likelihood(
      mean.constant, kernel.squared_exponential, params, dataset,
      warp_func=DEFAULT_WARP_FUNC))
  got, info = iterative.mll_iterative(
      mean.constant, params, x, y, warp_func=DEFAULT_WARP_FUNC,
      cov_func=kernel.squared_exponential, row_chunk=128,
      num_probes=32, lanczos_steps=40, precond_rank=64,
      key=jax.random.PRNGKey(2), return_info=True)
  assert abs(float(got) - want) / abs(want) < 0.05, (float(got), want)
  assert float(info['cg_residual']) < 1e-3


def test_predict_iterative_matches_dense_posterior():
  """Matrix-free posterior == dense gp.predict (latent mu/var)."""
  import numpy as np
  from hyperbo_tpu.models import gp as gp_lib
  key = jax.random.PRNGKey(3)
  n, nq, d = 300, 40, 3
  x = jax.random.uniform(key, (n, d))
  y = jnp.sin(2 * x.sum(axis=1, keepdims=True)) + 0.05 * (
      jax.random.normal(jax.random.fold_in(key, 1), (n, 1)))
  xq = jax.random.uniform(jax.random.fold_in(key, 2), (nq, d))
  params = defs.GPParams(model={
      'constant': 0.2, 'lengthscale': jnp.ones(d) * 0.4,
      'signal_variance': 0.0, 'noise_variance': -3.0})
  mu_d, var_d = gp_lib.predict(
      mean.constant, kernel.squared_exponential, params, x, y, xq,
      warp_func=DEFAULT_WARP_FUNC)
  mu_i, var_i, info = iterative.predict_iterative(
      mean.constant, params, x, y, xq, warp_func=DEFAULT_WARP_FUNC,
      cov_func=kernel.squared_exponential, row_chunk=128,
      query_chunk=16, cg_tol=1e-7, return_info=True)
  np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_d),
                             atol=2e-3, rtol=1e-3)
  np.testing.assert_allclose(np.asarray(var_i).flatten(),
                             np.asarray(var_d).flatten(),
                             atol=2e-3, rtol=2e-2)
  # mu-only path skips the variance solves.
  mu_o, var_o = iterative.predict_iterative(
      mean.constant, params, x, y, xq, warp_func=DEFAULT_WARP_FUNC,
      cov_func=kernel.squared_exponential, row_chunk=128,
      cg_tol=1e-7, compute_var=False)
  assert var_o is None
  np.testing.assert_allclose(np.asarray(mu_o), np.asarray(mu_i),
                             atol=1e-5)


def test_predict_iterative_single_query_chunk_capped():
  """nq=1 must not pay a full default query_chunk of discarded
  variance solves: the chunk caps to the rounded-up query count and
  the padded sentinel queries stay off-distribution (far), while the
  result still matches the dense posterior."""
  import numpy as np
  from hyperbo_tpu.models import gp as gp_lib
  key = jax.random.PRNGKey(9)
  n, d = 200, 3
  x = jax.random.uniform(key, (n, d))
  y = jnp.sin(2 * x.sum(axis=1, keepdims=True))
  xq = jax.random.uniform(jax.random.fold_in(key, 1), (1, d))
  params = defs.GPParams(model={
      'constant': 0.2, 'lengthscale': jnp.ones(d) * 0.4,
      'signal_variance': 0.0, 'noise_variance': -3.0})
  mu_d, var_d = gp_lib.predict(
      mean.constant, kernel.squared_exponential, params, x, y, xq,
      warp_func=DEFAULT_WARP_FUNC)
  mu_i, var_i = iterative.predict_iterative(
      mean.constant, params, x, y, xq, warp_func=DEFAULT_WARP_FUNC,
      cov_func=kernel.squared_exponential, row_chunk=128,
      query_chunk=256, cg_tol=1e-7)
  assert mu_i.shape == (1, 1) and var_i.shape == (1, 1)
  np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_d),
                             atol=2e-3, rtol=1e-3)
  np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_d),
                             atol=2e-3, rtol=2e-2)


def test_clamp_row_chunk_under_2gib_tile():
  """The (chunk, n) Gram tile must stay under 2^31 bytes (the n=131072
  x 4096-chunk 'kernel fault' of PERF.md r4_iterative_probe was a tile
  of exactly 2^31)."""
  from hyperbo_tpu.ops.iterative import _clamp_row_chunk
  assert _clamp_row_chunk(4096, 65536) == 4096      # 2^30: untouched
  assert _clamp_row_chunk(4096, 131072) == 2048     # 2^31: halved once
  assert _clamp_row_chunk(4096, 1 << 20) == 256     # 4M rows
  assert _clamp_row_chunk(1024, 8192) == 1024       # small n untouched
  # Never shrinks below the 128-row floor.
  assert _clamp_row_chunk(128, 1 << 24) == 128
