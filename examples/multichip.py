"""Multi-chip HyperBO: mesh pre-training, sharded BO, distributed MLL.

Runs on real TPU slices and, for development, on a virtual CPU mesh:

  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= JAX_NUM_CPU_DEVICES=8 \
      python examples/multichip.py

Demonstrates the three scale-out paths of hyperbo_tpu.parallel
(SURVEY.md section 2 rows 23-24 — absent in the reference):

  1. task-data-parallel GP pre-training: packed task buffers sharded
     over the mesh, parameters replicated, gradient psums over ICI;
  2. BO candidate scoring sharded over the mesh with a global argmax;
  3. large-n marginal likelihood via row-sharded Gram + block-cyclic
     distributed Cholesky (for n beyond one chip's HBM).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.models import basis as bf
from hyperbo_tpu.models import gp, kernel, mean
from hyperbo_tpu.parallel import large, mesh as mesh_lib
from hyperbo_tpu.ops import chol as chol_ops


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--tasks', type=int, default=16)
  parser.add_argument('--points', type=int, default=64)
  parser.add_argument('--dim', type=int, default=3)
  parser.add_argument('--steps', type=int, default=100)
  args = parser.parse_args()

  devices = jax.devices()
  print(f'{len(devices)} devices: {devices[0].platform}')
  m = mesh_lib.create_mesh(axis_name='task')

  # --- synthetic multi-task data from a ground-truth GP ---
  gt = defs.GPParams(model={'constant': 0.5,
                            'lengthscale': jnp.ones(args.dim) * 0.6,
                            'signal_variance': 1.0,
                            'noise_variance': 0.01})
  key = jax.random.PRNGKey(0)
  dataset = {}
  for i in range(args.tasks):
    k = jax.random.fold_in(key, i)
    vx = jax.random.uniform(k, (args.points, args.dim))
    vy = gp.sample_from_gp(jax.random.fold_in(k, 7), mean.constant,
                           kernel.matern52, gt, vx,
                           warp_func=DEFAULT_WARP_FUNC)
    dataset[i] = defs.SubDataset(vx, vy)

  # --- 1. task-sharded pre-training ---
  params = defs.GPParams(
      model={'constant': 0.0,
             'lengthscale': jnp.zeros(8),
             'signal_variance': 0.0, 'noise_variance': -3.0},
      config={'method': 'adam', 'learning_rate': 1e-2,
              'max_training_step': args.steps,
              'batch_size': args.points, 'objective': 'nll',
              'mlp_features': (8, 8)})
  bf.init_mlp_with_shape(jax.random.PRNGKey(1), params, (0, args.dim))
  from flax import linen as nn
  params.model['linear_mean'] = nn.Dense(1).init(
      jax.random.PRNGKey(2), jnp.empty((0, 8)))['params']
  packed, _ = mesh_lib.pad_tasks_for_mesh(dataset, m)
  packed = mesh_lib.shard_packed(packed, m)
  model_params, losses = mesh_lib.fit_adam_packed_sharded(
      mean.linear_mlp, kernel.squared_exponential_mlp,
      dict(params.model), packed, params.config, m,
      warp_func=DEFAULT_WARP_FUNC, key=jax.random.PRNGKey(3))
  print(f'pre-training (task-sharded over {m.shape["task"]} devices): '
        f'NLL {float(losses[0]):.2f} -> {float(losses[-1]):.2f}')
  params.model.update(model_params)

  # --- 2. sharded BO candidate scoring ---
  x_obs, y_obs = dataset[0].x, dataset[0].y
  cand = jax.random.uniform(jax.random.PRNGKey(9),
                            (64 * m.shape['task'], args.dim))

  def score_fn(cand_x):
    mu, var = gp.predict(mean.linear_mlp, kernel.squared_exponential_mlp,
                         params, x_obs, y_obs, cand_x,
                         warp_func=DEFAULT_WARP_FUNC)
    return mu + 2.0 * jnp.sqrt(jnp.maximum(var, 1e-12))

  idx, scores = mesh_lib.score_candidates_sharded(score_fn, cand, m)
  print(f'BO scoring ({cand.shape[0]} candidates sharded): '
        f'best candidate {int(idx)} (UCB {float(scores.flatten()[idx]):.3f})')

  # --- 3. distributed large-n marginal likelihood ---
  nl = 16 * m.shape['task']
  xl = jax.random.uniform(jax.random.PRNGKey(11), (nl, args.dim))
  yl = jax.random.normal(jax.random.PRNGKey(12), (nl, 1))
  lparams = defs.GPParams(model={'constant': 0.3,
                                 'lengthscale': jnp.ones(args.dim) * 0.6,
                                 'signal_variance': 0.5,
                                 'noise_variance': 0.05})
  nll_dist = float(large.mll_distributed(
      mean.constant, kernel.matern52, lparams, xl, yl, m, block=8))
  kmat = kernel.matern52(lparams, xl) + jnp.eye(nl) * (0.05 + 1e-6)
  fac = chol_ops.cholesky(kmat)
  delta = yl - mean.constant(lparams, xl)
  nll_dense = float(
      0.5 * jnp.sum(delta * chol_ops.cho_solve(fac, delta))
      + jnp.sum(jnp.log(jnp.diagonal(fac)))
      + 0.5 * nl * jnp.log(2 * jnp.pi))
  print(f'distributed MLL (n={nl}, row-sharded Gram + block-cyclic '
        f'Cholesky): {nll_dist:.4f} vs dense {nll_dense:.4f}')

  # --- 4. multi-chip large-n PRE-TRAINING (Adam through the
  # distributed NLL's custom VJP; x row-sharded, params replicated) ---
  trained, tr_losses = large.fit_adam_large_sharded(
      mean.constant, kernel.matern52, lparams.model, xl, yl,
      {'learning_rate': 1e-2, 'max_training_step': 25}, m)
  print(f'distributed pre-training (n={nl}, 25 Adam steps): NLL '
        f'{float(tr_losses[0]):.4f} -> {float(tr_losses[-1]):.4f}')

  # --- 5. the same two scale-out regimes through the class API ---
  from hyperbo_tpu.models import gp as gp_lib
  big = gp_lib.GP(
      {'big': defs.SubDataset(xl, yl)}, mean.constant, kernel.matern52,
      defs.GPParams(model=dict(lparams.model),
                    config={'method': 'adam', 'learning_rate': 1e-2,
                            'max_training_step': 10,
                            'batch_size': nl, 'objective': 'nll',
                            'distributed_mesh': m}),
      None)
  big.initialize_params(jax.random.PRNGKey(0))
  big.train()
  print(f"GP.train() with config['distributed_mesh']: one large task "
        f'row-sharded over {m.shape["task"]} devices — trained')
  print('multichip demo OK')


if __name__ == '__main__':
  main()
