"""Synthetic GP-draw dataset generator.

Same contract as reference hyperbo/bo_utils/data.py:720-775 (`random`):
returns (dataset, sub_dataset_key, queried_sub_dataset) where the dataset
holds n_func_historical tasks drawn from the given GP plus the observed
part of the queried function.
"""

from __future__ import annotations

import jax

from hyperbo_tpu.core import defs
from hyperbo_tpu.models import gp

SubDataset = defs.SubDataset


def random(key,
           mean_func,
           cov_func,
           params,
           dim,
           n_observed,
           n_queries,
           n_func_historical=0,
           m_points_historical=0,
           warp_func=None):
  """Generate historical tasks + an observed/queryable test function.

  Returns:
    dataset: Dict[int, SubDataset] with n_func_historical + 1 entries
      (the last one holding observed points of the test function).
    sub_dataset_key: key of the test function (== n_func_historical).
    queried_sub_dataset: SubDataset of queryable (x, y) pairs.
  """
  x_key, y_key, historical_key = jax.random.split(key, 3)

  hist_keys = jax.random.split(historical_key, max(n_func_historical, 1))
  dataset = {}
  for i in range(n_func_historical):
    x_hist_key, y_hist_key = jax.random.split(hist_keys[i], 2)
    vx = jax.random.uniform(x_hist_key, (m_points_historical, dim))
    vy = gp.sample_from_gp(
        y_hist_key, mean_func, cov_func, params, vx, warp_func=warp_func)
    dataset[i] = SubDataset(x=vx, y=vy)

  vx = jax.random.uniform(x_key, (n_observed + n_queries, dim))
  vy = gp.sample_from_gp(
      y_key, mean_func, cov_func, params, vx, warp_func=warp_func)
  x_queries, x_observed = vx[:n_queries], vx[n_queries:]
  y_queries, y_observed = vy[:n_queries], vy[n_queries:]
  dataset[n_func_historical] = SubDataset(x=x_observed, y=y_observed)
  queried_sub_dataset = SubDataset(x=x_queries, y=y_queries)
  return dataset, n_func_historical, queried_sub_dataset
