"""Input samplers for the continuous-oracle BO path.

The reference declares an INPUT_SAMPLERS registry but ships it empty
(hyperbo/bo_utils/const.py:61), making bayesopt()'s oracle path
unreachable through run_bayesopt (bayesopt.py:291-293). Here the registry
is populated with a uniform-cube sampler (the search spaces the reference
targets are normalized to [0,1]^d, cf. its L-BFGS-B bounds at
bayesopt.py:122-125) and a Sobol-style stratified sampler for
lower-discrepancy candidate pools.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_sampler(num_samples: int = 1000):
  """Uniform sampler over [0, 1]^d: (key, input_dim) -> (n, d)."""

  def sample(key, input_dim):
    return jax.random.uniform(key, (num_samples, input_dim))

  sample.__name__ = f'uniform_{num_samples}'
  return sample


def stratified_sampler(num_samples: int = 1000):
  """Stratified (jittered-grid) sampler over [0, 1]^d.

  Each of the n samples is jittered within its own 1/n slab per
  dimension with independently permuted slab order (latin-hypercube):
  lower discrepancy than iid uniform for acquisition argmax seeding.
  """

  def sample(key, input_dim):
    keys = jax.random.split(key, input_dim + 1)
    u = jax.random.uniform(keys[0], (num_samples, input_dim))
    perms = jnp.stack([
        jax.random.permutation(keys[i + 1], num_samples)
        for i in range(input_dim)
    ], axis=1)
    return (perms + u) / num_samples

  sample.__name__ = f'stratified_{num_samples}'
  return sample


# Registry: data_loader_name -> sampler. (The reference's is empty.)
INPUT_SAMPLERS = {
    'pd1': uniform_sampler(1000),
    'random': uniform_sampler(1000),
    'uniform': uniform_sampler(1000),
    'stratified': stratified_sampler(1000),
}
