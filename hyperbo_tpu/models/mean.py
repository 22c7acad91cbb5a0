"""Mean function library for GPs.

API parity with reference hyperbo/gp_utils/mean.py:30-79: every mean maps
(params, vx, warp_func) -> n x 1 vector. The reference vmaps a scalar
function per row; here the linear algebra is expressed directly as batched
matmuls (the Dense layers are applied as explicit x @ W + b so no per-row
dispatch happens), with identical parameter pytrees ('kernel'/'bias').
"""

from __future__ import annotations

import jax.numpy as jnp

from hyperbo_tpu.core.warp import retrieve_params
from hyperbo_tpu.models import basis as bf


def mean_vector(mean_scalar):
  """Lift a scalar mean m(params, x, warp_func) to the vector API.

  For USER-DEFINED scalar means (the built-ins below are already
  matrix-level). Same contract as the reference decorator
  (hyperbo/gp_utils/mean.py:30-51): returns
  f(params, vx, warp_func=None) -> n x 1.
  """
  import functools as _functools
  import jax as _jax

  @_functools.wraps(mean_scalar)
  def vector_map(params, vx, warp_func=None):
    return _jax.vmap(lambda x: mean_scalar(params, x, warp_func))(vx)

  return vector_map


def zero(params, vx, warp_func=None):
  """Zero mean function: n x 1 zeros."""
  del params, warp_func
  return jnp.zeros((vx.shape[0], 1), vx.dtype)


def constant(params, vx, warp_func=None):
  """Constant mean function: n x 1 filled with (warped) constant."""
  val, = retrieve_params(params, ['constant'], warp_func)
  return jnp.full((vx.shape[0], 1), val, dtype=vx.dtype)


def linear(params, x, warp_func=None):
  """Linear mean: x @ W + b with Flax Dense(1) parameter layout."""
  linear_mean, = retrieve_params(params, ['linear_mean'], warp_func)
  return jnp.dot(x, linear_mean['kernel']) + linear_mean['bias']


def linear_mlp(params, x, warp_func=None):
  """Fully-connected neural net (MLP -> Dense(1)) as a mean function."""
  mlp_params, = retrieve_params(params, ['mlp_params'], warp_func)
  h = bf.MLP(params.config['mlp_features']).apply({'params': mlp_params}, x)
  return linear(params, h, warp_func=warp_func)
