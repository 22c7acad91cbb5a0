"""GP kernel library, TPU-native.

API parity with reference hyperbo/gp_utils/kernel.py:29-222: every kernel is
a matrix-valued function

    kernel(params, vx1, vx2=None, warp_func=None, diag=False) -> n1 x n2

with the same parameterizations (GPML Eq. 4.9/4.17 forms) and the same
`diag=True` fast path (only honored when vx2 is None, as in the reference).

Unlike the reference's nested scalar vmap, all kernels are built on the
MXU matmul-based pairwise distance in hyperbo_tpu.ops.gram, with the kernel
transform fused into the matmul epilogue by XLA. Gradients at coincident
points follow the reference's safe-sqrt semantics (clamped, not nan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hyperbo_tpu.core.warp import retrieve_params
from hyperbo_tpu.models import basis as bf
from hyperbo_tpu.ops import gram
from hyperbo_tpu.ops import linalg


def covariance_matrix(kernel_scalar):
  """Lift a scalar kernel k(params, x1, x2, warp_func) to the matrix API.

  For USER-DEFINED scalar kernels (the built-ins below use fused MXU
  paths instead). Same contract as the reference decorator
  (hyperbo/gp_utils/kernel.py:29-60): returns
  f(params, vx1, vx2=None, warp_func=None, diag=False) -> n1 x n2, with
  diag honored only when vx2 is None.
  """
  import functools as _functools

  @_functools.wraps(kernel_scalar)
  def matrix_map(params, vx1, vx2=None, warp_func=None, diag=False):
    cov = _functools.partial(kernel_scalar, params, warp_func=warp_func)
    if vx2 is None:
      if diag:
        return jax.vmap(lambda x: cov(x, x))(vx1)
      vx2 = vx1
    return jax.vmap(lambda a: jax.vmap(lambda b: cov(a, b))(vx2))(vx1)

  return matrix_map


def _scaled_sqdist(vx1, vx2, lengthscale):
  """Squared distances of lengthscale-scaled inputs."""
  x1 = vx1 / lengthscale
  x2 = None if vx2 is None else vx2 / lengthscale
  return gram.sqdist(x1, x2)


# Floor under squared distances before the Matern sqrt. At coincident
# points the exact total derivative of the kernel wrt any parameter is 0
# (r^2 is identically 0 in the parameters there), and flooring r^2
# realizes that limit with no inf/0*inf intermediates — unlike the
# where-of-inf "safe sqrt" clamp (reference basics/linalg.py:173-191),
# whose backward can fuse into NaNs under jit+vmap when the MXU distance
# form clamps near-duplicate pairs to exactly 0.
_R2_FLOOR = 1e-36


def _safe_r(r2, scale):
  return scale * jnp.sqrt(jnp.maximum(r2, _R2_FLOOR))


def squared_exponential(params, vx1, vx2=None, warp_func=None, diag=False):
  """Squared exponential kernel: Eq.(4.9/13) of the GPML book."""
  lengthscale, signal_variance = retrieve_params(
      params, ['lengthscale', 'signal_variance'], warp_func)
  sig = jnp.squeeze(signal_variance)
  if vx2 is None and diag:
    return sig * jnp.ones((vx1.shape[0],), vx1.dtype)
  r2 = _scaled_sqdist(vx1, vx2, lengthscale)
  return sig * jnp.exp(-r2 / 2)


def matern32(params, vx1, vx2=None, warp_func=None, diag=False):
  """Matern 3/2 kernel: Eq.(4.17) of the GPML book."""
  lengthscale, signal_variance = retrieve_params(
      params, ['lengthscale', 'signal_variance'], warp_func)
  sig = jnp.squeeze(signal_variance)
  if vx2 is None and diag:
    return sig * jnp.ones((vx1.shape[0],), vx1.dtype)
  r2 = _scaled_sqdist(vx1, vx2, lengthscale)
  r = _safe_r(r2, jnp.sqrt(3.0))
  return sig * (1 + r) * jnp.exp(-r)


def matern52(params, vx1, vx2=None, warp_func=None, diag=False):
  """Matern 5/2 kernel: Eq.(4.17) of the GPML book."""
  lengthscale, signal_variance = retrieve_params(
      params, ['lengthscale', 'signal_variance'], warp_func)
  if vx2 is None and diag:
    return jnp.squeeze(signal_variance) * jnp.ones((vx1.shape[0],), vx1.dtype)
  r2 = _scaled_sqdist(vx1, vx2, lengthscale)
  r = _safe_r(r2, jnp.sqrt(5.0))
  return signal_variance * (1 + r + r**2 / 3) * jnp.exp(-r)


def dot_product(params, vx1, vx2=None, warp_func=None, diag=False):
  """Dot product kernel k(x, x') = b^2 + x^T x' / s^2."""
  sigma, bias = retrieve_params(
      params, ['dot_prod_sigma', 'dot_prod_bias'], warp_func)
  if vx2 is None and diag:
    return (jnp.sum(vx1 * vx1, axis=-1) / jnp.square(sigma)
            + jnp.square(bias))
  return gram.inner_product(vx1, vx2) / jnp.square(sigma) + jnp.square(bias)


def with_mlp_bases(kernel):
  """Wrapper applying a Flax MLP to inputs before the kernel."""

  def kernel_mlp(params, vx1, vx2=None, warp_func=None, diag=False):
    model = bf.MLP(params.config['mlp_features'])
    mlp_params, = retrieve_params(params, ['mlp_params'], warp_func)
    vx1 = model.apply({'params': mlp_params}, vx1)
    if vx2 is not None:
      vx2 = model.apply({'params': mlp_params}, vx2)
    return kernel(params, vx1, vx2, warp_func=warp_func, diag=diag)

  kernel_mlp.__name__ = kernel.__name__ + '_mlp'
  return kernel_mlp


dot_product_mlp = with_mlp_bases(dot_product)
squared_exponential_mlp = with_mlp_bases(squared_exponential)
matern32_mlp = with_mlp_bases(matern32)
matern52_mlp = with_mlp_bases(matern52)


def with_kumar_bases(kernel):
  """Wrapper applying the Kumaraswamy CDF warp to inputs before the kernel."""

  def kernel_kumar(params, vx1, vx2=None, warp_func=None, diag=False):
    model = bf.KumarWarp()
    kumar_params, = retrieve_params(params, ['kumar_params'], warp_func)
    vx1 = model.apply({'params': kumar_params}, vx1)
    if vx2 is not None:
      vx2 = model.apply({'params': kumar_params}, vx2)
    return kernel(params, vx1, vx2, warp_func=warp_func, diag=diag)

  kernel_kumar.__name__ = kernel.__name__ + '_kumar'
  return kernel_kumar


dot_product_kumar = with_kumar_bases(dot_product)
squared_exponential_kumar = with_kumar_bases(squared_exponential)
matern32_kumar = with_kumar_bases(matern32)
matern52_kumar = with_kumar_bases(matern52)
