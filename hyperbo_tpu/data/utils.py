"""Dataset logging/statistics utilities.

Parity with reference hyperbo/basics/data_utils.py:29-69 (log_dataset)
— logs shapes and per-column summary stats of a dataset pytree, guarding
empty arrays. The subsample iterator lives in models.divergences (it is
consumed by the trainer).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp

from hyperbo_tpu.models.divergences import (  # noqa: F401
    sub_sample_dataset_iterator)

partial = functools.partial


def log_dataset(dataset):
  """Log basic shape/stat facts about a dataset pytree."""

  def safe(f):

    def safef(x):
      if not isinstance(x, jnp.ndarray):
        return x
      if x.shape[0] == 0:
        return jnp.nan
      return f(x)

    return safef

  logging.info('dataset len = %d.', len(dataset))
  logging.info('dataset shape: %s', jax.tree.map(safe(jnp.shape), dataset))
  for name, fn in [('mean', jnp.mean), ('median', jnp.median),
                   ('min', jnp.min), ('max', jnp.max)]:
    logging.info('dataset %s: %s', name,
                 jax.tree.map(safe(partial(fn, axis=0)), dataset))
