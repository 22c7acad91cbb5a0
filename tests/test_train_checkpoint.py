"""Chunked-scan training: periodic callbacks/checkpoints stay on the
packed fast path, chunking is bit-exact vs one long scan, and a
pre-training can resume from a mid-run snapshot.

Reference semantics being preserved: per-step param snapshot + save in
the adam trainer (hyperbo/gp_utils/gp.py:145-157,
basics/params_utils.py:193-207), here at chunk granularity.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from hyperbo_tpu.core import defs
from hyperbo_tpu.core import params_io
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import gp
from hyperbo_tpu.models import kernel
from hyperbo_tpu.models import mean
from hyperbo_tpu.models import packed as packed_lib
from hyperbo_tpu.train import adam as adam_lib

GPParams = defs.GPParams
SubDataset = defs.SubDataset
WF = DEFAULT_WARP_FUNC


def _dataset(key, tasks=4, n=10, d=2):
  gt = GPParams(model={'constant': 1., 'lengthscale': jnp.array([.3] * d),
                       'signal_variance': 1.0, 'noise_variance': 0.01})
  out = {}
  for i in range(tasks):
    key, k1, k2 = jax.random.split(key, 3)
    vx = jax.random.uniform(k1, (n, d))
    vy = gp.sample_from_gp(k2, mean.constant, kernel.squared_exponential,
                           gt, vx, warp_func=WF)
    out[i] = SubDataset(vx, vy)
  return out


def _loss_pack(dataset, config):
  packed, _ = packed_lib.pack_dataset(dataset)

  def loss_fn(model, batch):
    shim = GPParams(model=model, config=config)
    return packed_lib.neg_log_marginal_likelihood_packed(
        mean.constant, kernel.squared_exponential, shim, batch,
        warp_func=WF)

  return packed, loss_fn


def test_chunked_scan_bit_exact_vs_single_scan():
  dataset = _dataset(jax.random.PRNGKey(0))
  model0 = {'constant': 0.5, 'lengthscale': jnp.zeros(2),
            'signal_variance': 0., 'noise_variance': -4.}
  cfg = {'learning_rate': 1e-2, 'max_training_step': 20, 'batch_size': 100}
  packed, loss_fn = _loss_pack(dataset, cfg)

  m_single, l_single = adam_lib.fit_adam_scan(
      loss_fn, dict(model0), packed, None, dict(cfg),
      key=jax.random.PRNGKey(1))

  calls = []
  cfg_chunk = dict(cfg, checkpoint_every=7)
  m_chunk, l_chunk = adam_lib.fit_adam_scan(
      loss_fn, dict(model0), packed, None, cfg_chunk,
      key=jax.random.PRNGKey(1),
      callback=lambda step, model, loss: calls.append(step))

  assert calls == [7, 14, 20], calls
  np.testing.assert_array_equal(np.asarray(l_single), np.asarray(l_chunk))
  for k in model0:
    np.testing.assert_array_equal(np.asarray(m_single[k]),
                                  np.asarray(m_chunk[k]))


def test_callback_keeps_packed_path():
  """callback != None no longer disables packing: with checkpoint_every=7
  and 20 steps the callback fires 3 times (chunk ends), not 20 times
  (the per-step host loop)."""
  dataset = _dataset(jax.random.PRNGKey(2))
  params = GPParams(
      model={'constant': 0.5, 'lengthscale': jnp.zeros(2),
             'signal_variance': 0., 'noise_variance': -4.},
      config={'method': 'adam', 'learning_rate': 1e-2,
              'max_training_step': 20, 'batch_size': 100,
              'checkpoint_every': 7, 'objective': 'nll', 'tol': 1e-5})
  model = gp.GP(dataset, mean.constant, kernel.squared_exponential,
                params, WF)
  model.initialize_params(jax.random.PRNGKey(3))
  steps = []
  model.train(callback=lambda step, m, loss: steps.append(step))
  assert steps == [7, 14, 20], steps


def test_resume_from_mid_run_snapshot(tmp_path):
  """Kill a pre-training mid-run; resume from the saved checkpoint and
  reach (at least) the loss of an uninterrupted run."""
  dataset = _dataset(jax.random.PRNGKey(4))
  save_file = os.path.join(str(tmp_path), 'ckpt.pkl')

  def make_params(steps):
    return GPParams(
        model={'constant': 0.5, 'lengthscale': jnp.zeros(2),
               'signal_variance': 0., 'noise_variance': -4.},
        config={'method': 'adam', 'learning_rate': 1e-2,
                'max_training_step': steps, 'batch_size': 100,
                'checkpoint_every': 25, 'objective': 'nll', 'tol': 1e-5})

  # Uninterrupted 100-step run -> target NLL.
  full = gp.GP(dataset, mean.constant, kernel.squared_exponential,
               make_params(100), WF)
  full.initialize_params(jax.random.PRNGKey(5))
  full.train()
  target_nll = float(full.stats(verbose=False)[0])

  # Interrupted run: stop after 50 steps, checkpointing every 25.
  part = gp.GP(dataset, mean.constant, kernel.squared_exponential,
               make_params(50), WF)
  part.initialize_params(jax.random.PRNGKey(5))
  part.train(get_params_path=lambda x=0: save_file)
  assert os.path.exists(save_file)

  # Resume in a fresh process-equivalent: load the checkpoint into new
  # GPParams and train the remaining 50 steps.
  loaded, (step, loss) = params_io.load_params(save_file,
                                               include_state=True)
  assert step == 50 and np.isfinite(loss)
  resumed_params = GPParams(model=loaded.model,
                            config=make_params(50).config)
  resumed = gp.GP(dataset, mean.constant, kernel.squared_exponential,
                  resumed_params, WF)
  resumed.initialize_params(jax.random.PRNGKey(6))
  resumed.train()
  resumed_nll = float(resumed.stats(verbose=False)[0])
  # The resumed run must land in the same basin as the uninterrupted one.
  assert resumed_nll < target_nll + 1.0, (resumed_nll, target_nll)
