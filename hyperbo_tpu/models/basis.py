"""Neural basis functions (Flax) for warped kernels and means.

Parity with reference hyperbo/gp_utils/basis_functions.py:24-70: same module
structures (tanh-Dense MLP stack, per-dimension Kumaraswamy CDF warp with
squareplus-transformed a/b) and the same parameter pytree layout
('Dense_0' kernels/biases, 'a'/'b'), so checkpoints interoperate.
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn
import jax.numpy as jnp

from hyperbo_tpu.core.warp import squareplus_warp


class MLP(nn.Module):
  """Multi-layer perceptron basis functions.

  Attributes:
    features: Sequence[int] of output feature dimensions per layer.
  """
  features: Sequence[int]

  @nn.compact
  def __call__(self, x):
    for feat in self.features:
      x = nn.tanh(nn.Dense(feat)(x))
    return x


def init_mlp_with_shape(key, params, input_shape):
  """Initialize mlp parameters in params with the desired input shape."""
  input_shape = list(input_shape)
  input_shape[0] = 0
  init_val = jnp.ones(input_shape, jnp.float32)
  params.model['mlp_params'] = MLP(params.config['mlp_features']).init(
      key, init_val)['params']


class KumarWarp(nn.Module):
  """Kumaraswamy CDF warping 1 - (1 - x^a)^b on each input dimension.

  Inputs are assumed to lie in [0, 1]; a and b are stored unconstrained and
  squareplus-warped to positive values.
  """

  @nn.compact
  def __call__(self, inputs):
    a = self.param('a', nn.initializers.zeros, inputs.shape[-1])
    b = self.param('b', nn.initializers.zeros, inputs.shape[-1])
    a = squareplus_warp(a)
    b = squareplus_warp(b)
    return 1 - (1 - inputs**a)**b


def init_kumar_warp_with_shape(key, params, input_shape):
  """Initialize Kumaraswamy warp parameters with the desired input shape."""
  input_shape = list(input_shape)
  input_shape[0] = 0
  init_val = jnp.ones(input_shape, jnp.float32)
  params.model['kumar_params'] = KumarWarp().init(key, init_val)['params']
