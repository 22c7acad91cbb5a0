"""Multi-start (vmapped restarts) training tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import gp, kernel, mean
from hyperbo_tpu.models import objectives as obj
from hyperbo_tpu.models import packed as packed_lib
from hyperbo_tpu.train import adam as adam_lib

GPParams = defs.GPParams
SubDataset = defs.SubDataset
WF = DEFAULT_WARP_FUNC


def _setup(key):
  gt = GPParams(model={'constant': 3., 'lengthscale': jnp.array([.6, .6]),
                       'signal_variance': 1.0, 'noise_variance': 0.01})
  vx = jax.random.normal(key, (12, 2))
  dataset = {
      i: SubDataset(vx, gp.sample_from_gp(
          jax.random.PRNGKey(i), mean.constant, kernel.matern32, gt, vx,
          warp_func=WF)) for i in range(5)
  }
  init = GPParams(
      model={'constant': 0., 'lengthscale': jnp.zeros(2),
             'signal_variance': 0., 'noise_variance': -3.},
      config={'method': 'adam', 'learning_rate': 1e-2,
              'max_training_step': 30, 'batch_size': 100,
              'objective': 'nll'})
  return dataset, init


def test_multistart_no_worse_than_single():
  dataset, init = _setup(jax.random.PRNGKey(0))
  packed, _ = packed_lib.pack_dataset(dataset)
  single, losses = adam_lib.fit_adam_packed(
      mean.constant, kernel.matern32, dict(init.model), packed,
      init.config, warp_func=WF, key=jax.random.PRNGKey(1))
  best, best_loss, finals = adam_lib.fit_adam_packed_multistart(
      mean.constant, kernel.matern32, dict(init.model), packed,
      init.config, warp_func=WF, key=jax.random.PRNGKey(1),
      num_restarts=4)
  assert finals.shape == (4,)
  # Restart 0 is the unperturbed init, so the best restart can't lose to
  # the single run by more than subsampling noise.
  def full_loss(m):
    shim = GPParams(model=m, config=init.config)
    return float(packed_lib.neg_log_marginal_likelihood_packed(
        mean.constant, kernel.matern32, shim, packed, warp_func=WF))
  assert float(best_loss) <= full_loss(single) + 1.0
  assert np.isfinite(float(best_loss))


def test_gp_train_with_restarts():
  dataset, init = _setup(jax.random.PRNGKey(2))
  init.config['num_restarts'] = 3
  model = gp.GP(dataset, mean.constant, kernel.matern32, init, WF)
  model.initialize_params(jax.random.PRNGKey(3))
  nll0 = float(model.stats(verbose=False)[0])
  model.train()
  nll1 = float(model.stats(verbose=False)[0])
  assert nll1 < nll0
