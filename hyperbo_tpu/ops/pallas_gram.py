"""Pallas fused Gram-matrix kernels.

One kernel instance produces one (block_m x block_n) tile of the kernel
matrix: it computes the tile's pairwise squared distances via an MXU
dot_general plus row norms, applies the kernel transform (SE / Matern) on
the VPU, and — for diagonal tiles — adds the noise ridge, all before the
tile ever leaves VMEM. This fuses the reference's three passes
(distance matrix, kernel transform, K + sigma^2 I assembly;
hyperbo/gp_utils/kernel.py:53, basics/linalg.py:66-68) into a single
HBM write of the finished tile.

On non-TPU backends the kernels run through the Pallas interpreter, so
the same code path is unit-testable on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent backends fall back to interpret mode.
  from jax.experimental.pallas import tpu as pltpu
  _HAS_PLTPU = True
except ImportError:  # pragma: no cover
  pltpu = None
  _HAS_PLTPU = False

def _transform(kind: str, r2, sv):
  """Kernel transform of squared distances (VPU elementwise).

  Single source: pallas_mll._gram_transform serves every fused kernel
  (this Gram kernel, the fused MLL, and — via pallas_mll_bwd._km_nm —
  the iterative matvecs), so the family forms cannot drift apart.
  """
  from hyperbo_tpu.ops.pallas_mll import _gram_transform
  return _gram_transform(r2, sv, kind)


def _gram_kernel(kind, add_ridge, x1_ref, x2_ref, scalars_ref, out_ref):
  """One (bm, bn) tile: distances -> transform -> optional diag ridge."""
  x1 = x1_ref[:]  # (bm, d), pre-scaled by lengthscale and centered
  x2 = x2_ref[:]  # (bn, d)
  inner = jax.lax.dot_general(
      x1, x2, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  n1 = jnp.sum(x1 * x1, axis=1, keepdims=True)       # (bm, 1)
  n2 = jnp.sum(x2 * x2, axis=1, keepdims=True)       # (bn, 1)
  r2 = jnp.maximum(n1 + n2.T - 2.0 * inner, 0.0)
  sv = scalars_ref[0, 0]
  tile = _transform(kind, r2, sv)
  if add_ridge:
    i = pl.program_id(0)
    j = pl.program_id(1)
    bm, bn = tile.shape
    ridge = scalars_ref[0, 1]
    row = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    on_diag = (row + i * bm) == (col + j * bn)
    tile = jnp.where(on_diag, tile + ridge, tile)
  out_ref[:] = tile


def _round_up(x, m):
  return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=('kind', 'block_m', 'block_n', 'interpret',
                     'add_ridge'))
def gram(x1: jnp.ndarray,
         x2: jnp.ndarray,
         signal_variance: jnp.ndarray,
         ridge: jnp.ndarray,
         kind: str = 'se',
         add_ridge: bool = False,
         block_m: int = 256,
         block_n: int = 256,
         interpret: bool = False) -> jnp.ndarray:
  """Fused Gram tile kernel over pre-scaled inputs.

  Args:
    x1: (n1, d) inputs already divided by lengthscale (and centered).
    x2: (n2, d) likewise.
    signal_variance: scalar (warped).
    ridge: scalar added to the diagonal when add_ridge (noise + jitter).
    kind: 'se' | 'matern32' | 'matern52'.
    add_ridge: fuse the K + ridge*I assembly (requires square semantics:
      the global diagonal positions get the ridge).
    block_m / block_n: tile sizes (MXU-aligned multiples of 128 on TPU).
    interpret: run through the Pallas interpreter (CPU testing).

  Returns:
    (n1, n2) kernel matrix, fp32.
  """
  n1, d = x1.shape
  n2 = x2.shape[0]
  pm, pn = _round_up(n1, block_m), _round_up(n2, block_n)
  # Pad rows with zeros: padded rows yield kernel values that are sliced
  # away below; zero rows are benign (finite distances).
  x1p = jnp.zeros((pm, d), jnp.float32).at[:n1].set(x1.astype(jnp.float32))
  x2p = jnp.zeros((pn, d), jnp.float32).at[:n2].set(x2.astype(jnp.float32))
  scalars = jnp.stack([
      jnp.asarray(signal_variance, jnp.float32).reshape(()),
      jnp.asarray(ridge, jnp.float32).reshape(()),
  ]).reshape(1, 2)

  grid = (pm // block_m, pn // block_n)
  kernel_fn = functools.partial(_gram_kernel, kind, add_ridge)
  in_specs = [
      pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
      pl.BlockSpec((block_n, d), lambda i, j: (j, 0)),
      pl.BlockSpec((1, 2), lambda i, j: (0, 0)),
  ]
  out = pl.pallas_call(
      kernel_fn,
      grid=grid,
      in_specs=in_specs,
      out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
      out_shape=jax.ShapeDtypeStruct((pm, pn), jnp.float32),
      interpret=interpret,
  )(x1p, x2p, scalars)
  return out[:n1, :n2]


def gram_with_ridge(x, lengthscale, signal_variance, ridge, kind='se',
                    interpret: bool = False,
                    block: int = 256) -> jnp.ndarray:
  """K(x, x) + ridge * I in one fused pass (the NLL hot path input).

  Inputs are lengthscale-scaled and centered here; `ridge` is
  noise_variance + jitter.
  """
  xs = x / lengthscale
  xs = xs - jnp.mean(xs, axis=0, keepdims=True)
  return gram(xs, xs, signal_variance, ridge, kind=kind, add_ridge=True,
              block_m=block, block_n=block, interpret=interpret)


def cross_gram(x1, x2, lengthscale, signal_variance, kind='se',
               interpret: bool = False, block: int = 256) -> jnp.ndarray:
  """K(x1, x2) with fused scaling/centering (prediction cross-covariance)."""
  s1 = x1 / lengthscale
  s2 = x2 / lengthscale
  center = (jnp.sum(s1, 0, keepdims=True) + jnp.sum(s2, 0, keepdims=True)
            ) / (x1.shape[0] + x2.shape[0])
  return gram(s1 - center, s2 - center, signal_variance, 0.0, kind=kind,
              add_ridge=False, block_m=block, block_n=block,
              interpret=interpret)
