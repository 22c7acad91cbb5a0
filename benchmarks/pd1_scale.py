"""North-star benchmark: PD1-scale GP pre-training wall time.

BASELINE.md target: pre-train a HyperBO GP on the full PD1 benchmark to
reference NLL in < 60 s on a v5e-8. PD1's shape (SURVEY.md section 6):
~23 training workloads, sub-datasets up to ~2048 points, 4-d inputs,
MLP-warped kernel, batch_size=100 subsampling, ~1000 Adam steps.

This script builds a synthetic dataset of exactly that shape, runs the
fully on-device packed pre-training (train/adam.fit_adam_packed: the
whole 1000-step run is one lax.scan), and reports wall time excluding
and including compilation. On a single chip the per-step work is 23
batched 100-point factorizations — a v5e-8 shards the task axis
(parallel/mesh.py) but is not needed to beat 60 s.

Usage: python benchmarks/pd1_scale.py [--steps 1000] [--tasks 23]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--steps', type=int, default=1000)
  parser.add_argument('--tasks', type=int, default=23)
  parser.add_argument('--points', type=int, default=2048)
  parser.add_argument('--dim', type=int, default=4)
  parser.add_argument('--batch_size', type=int, default=100)
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp
  from flax import linen as nn
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import basis as bf
  from hyperbo_tpu.models import gp, kernel, mean
  from hyperbo_tpu.models import packed as packed_lib
  from hyperbo_tpu.train import adam as adam_lib

  log(f'device: {jax.devices()[0]}')
  key = jax.random.PRNGKey(0)

  # Synthetic PD1-shaped multi-task data (GP draws are unnecessary for a
  # timing benchmark; smooth random functions suffice and avoid a large
  # ground-truth factorization at setup).
  dataset = {}
  for i in range(args.tasks):
    k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
    x = jax.random.uniform(k1, (args.points, args.dim))
    w = jax.random.normal(k2, (args.dim, 1))
    y = jnp.sin(3 * x @ w) + 0.1 * jax.random.normal(k2, (args.points, 1))
    dataset[f'workload{i}'] = defs.SubDataset(x, y)

  params = defs.GPParams(
      model={'constant': 0., 'lengthscale': jnp.zeros(8),
             'signal_variance': 0., 'noise_variance': -4.},
      config={'method': 'adam', 'learning_rate': 1e-2,
              'max_training_step': args.steps,
              'batch_size': args.batch_size, 'objective': 'nll',
              'mlp_features': (8, 8)})
  bf.init_mlp_with_shape(jax.random.PRNGKey(1), params, (0, args.dim))
  params.model['linear_mean'] = nn.Dense(1).init(
      jax.random.PRNGKey(2), jnp.empty((0, 8)))['params']

  packed, _ = packed_lib.pack_dataset(dataset, pad_to_multiple=128)
  log(f'packed: {packed.x.shape} (tasks x n_max x d), '
      f'batch_size={args.batch_size}')

  # Compile with a 1-step run (same shapes, separate jit cache entry per
  # step count, so time a 2-phase approach: full run twice).
  t0 = time.perf_counter()
  model, losses = adam_lib.fit_adam_packed(
      mean.linear_mlp, kernel.squared_exponential_mlp,
      dict(params.model), packed, params.config,
      warp_func=DEFAULT_WARP_FUNC, key=jax.random.PRNGKey(3))
  first_loss, last_loss = float(losses[0]), float(losses[-1])
  t_total = time.perf_counter() - t0
  log(f'run 1 (compile + {args.steps} steps): {t_total:.1f}s; '
      f'loss {first_loss:.3f} -> {last_loss:.3f}')

  t0 = time.perf_counter()
  model, losses = adam_lib.fit_adam_packed(
      mean.linear_mlp, kernel.squared_exponential_mlp,
      dict(params.model), packed, params.config,
      warp_func=DEFAULT_WARP_FUNC, key=jax.random.PRNGKey(4))
  last2 = float(losses[-1])
  t_steps = time.perf_counter() - t0
  log(f'run 2 (cached, {args.steps} steps): {t_steps:.1f}s '
      f'({t_steps/args.steps*1e3:.1f} ms/step); final loss {last2:.3f}')

  print(json.dumps({
      'metric': 'pd1_scale_pretrain_seconds',
      'value': round(t_steps, 2),
      'unit': f's_per_{args.steps}_steps_excl_compile',
      'vs_baseline': round(60.0 / max(t_steps, 1e-9), 2),
  }))


if __name__ == '__main__':
  main()
