"""HyperBO-TPU end-to-end demo.

Replicates the reference tutorial flow (hyperbo/hyperbo_demo.ipynb,
cells 5-13): sample multi-task training data from a ground-truth GP with
a bent mean function, pre-train an MLP-warped GP with the NLL or EKL
objective, inspect the learned (warped) parameters, and run a BO loop on
a held-out task — all through the public hyperbo_tpu API.

Usage:
  python examples/demo.py [--objective nll|ekl] [--method adam|lbfgs]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyperbo_tpu.basics import definitions as defs
from hyperbo_tpu.basics import params_utils
from hyperbo_tpu.gp_utils import basis_functions as bf
from hyperbo_tpu.gp_utils import gp
from hyperbo_tpu.gp_utils import kernel
from hyperbo_tpu.gp_utils import mean
from hyperbo_tpu.gp_utils import utils
from hyperbo_tpu.bo_utils import acfun
from hyperbo_tpu.bo_utils import bayesopt

GPParams = defs.GPParams
SubDataset = defs.SubDataset


def bent_mean(params, x, warp_func=None):
  """Ground-truth mean with a ReLU bend (demo cell 5 analogue)."""
  del params, warp_func
  raw = 2.0 * jnp.maximum(x[:, :1] - 0.4, 0.) - 0.5
  return raw


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--objective', default='nll', choices=['nll', 'ekl'])
  parser.add_argument('--method', default='adam',
                      choices=['adam', 'lbfgs'])
  parser.add_argument('--steps', type=int, default=500)
  parser.add_argument('--num_tasks', type=int, default=10)
  parser.add_argument('--num_points', type=int, default=20)
  args = parser.parse_args()

  key = jax.random.PRNGKey(0)
  d = 1
  warp_func = utils.DEFAULT_WARP_FUNC

  # Ground truth: Matern-5/2 GP with the bent mean.
  gt = GPParams(model={
      'constant': 0., 'lengthscale': jnp.array([0.1]),
      'signal_variance': 1.0, 'noise_variance': 1e-4})
  gt.model['lengthscale'] = jnp.log(jnp.exp(gt.model['lengthscale']) - 1)

  key, xkey = jax.random.split(key)
  vx = jax.random.uniform(xkey, (args.num_points, d))

  dataset = {}
  for i in range(args.num_tasks):
    y = bent_mean(gt, vx) + gp.sample_from_gp(
        jax.random.PRNGKey(i + 1), mean.zero, kernel.matern52, gt, vx,
        warp_func=warp_func)
    dataset[f'task{i}'] = SubDataset(vx, y)
  # One aligned sub-dataset: matched inputs, 10 function draws.
  y_aligned = bent_mean(gt, vx) + gp.sample_from_gp(
      jax.random.PRNGKey(99), mean.zero, kernel.matern52, gt, vx,
      warp_func=warp_func, num_samples=10)
  dataset['aligned'] = SubDataset(vx, y_aligned, aligned=1)

  # Model: linear-MLP mean + SE-MLP kernel, mlp_features (8, 8).
  params = GPParams(
      model={'constant': 0., 'lengthscale': 0.,
             'signal_variance': 0., 'noise_variance': -4.},
      config={'method': args.method, 'learning_rate': 1e-2,
              'max_training_step': args.steps, 'batch_size': 100,
              'objective': args.objective, 'mlp_features': (8, 8)})
  model = gp.GP(dataset, mean.linear_mlp, kernel.squared_exponential_mlp,
                params, warp_func)
  key, subkey = jax.random.split(key)
  model.initialize_params(subkey)

  print('== before pre-training ==')
  nll0, ekl0, *_ = model.stats()
  t0 = time.time()
  model.train()
  print(f'== after pre-training ({time.time() - t0:.1f}s) ==')
  nll1, ekl1, *_ = model.stats()
  print(f'NLL {nll0:.3f} -> {nll1:.3f}; EKL {ekl0:.3f} -> {ekl1:.3f}')

  retrieved = dict(zip(
      ['constant', 'lengthscale', 'signal_variance', 'noise_variance'],
      params_utils.retrieve_params(
          model.params,
          ['constant', 'lengthscale', 'signal_variance', 'noise_variance'],
          warp_func=warp_func)))
  print('warped params:', jax.tree.map(
      lambda v: jnp.round(jnp.asarray(v), 4), retrieved))

  # BO on a fresh task with the pre-trained prior.
  key, tkey = jax.random.split(key)
  qx = jax.random.uniform(tkey, (50, d))
  qy = bent_mean(gt, qx) + gp.sample_from_gp(
      jax.random.PRNGKey(123), mean.zero, kernel.matern52, gt, qx,
      warp_func=warp_func)
  queried = SubDataset(qx, qy)
  model.params.config['retrain'] = 0
  sub = bayesopt.simulated_bayesopt(
      model, 'new_task', queried, acfun.ei, iters=10)
  best = float(jnp.max(sub.y))
  opt = float(jnp.max(qy))
  print(f'BO: best found {best:.4f} vs optimum {opt:.4f} '
        f'(simple regret {opt - best:.4f}) in 10 iters / 50 candidates')


if __name__ == '__main__':
  main()
