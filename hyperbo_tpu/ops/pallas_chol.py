"""Pallas VMEM-resident Cholesky base-case kernel.

The blocked recursion in ops/chol.py turns almost all Cholesky FLOPs into
large MXU matmuls; what remains on the critical path are the base-case
panel factorizations. XLA's expander lowers those to a while loop whose
per-iteration state round-trips HBM. This kernel keeps the whole panel
(<= 512 x 512 fp32) in VMEM and runs the classic outer-product column
sweep on the VPU.

Mosaic (TPU Pallas) constraints shape the implementation:
  * no dynamic_slice on VALUES -> the working matrix lives in a VMEM
    scratch ref and pivot rows are read/written with pl.ds on the ref
    (sublane-dim dynamic indexing);
  * the pivot element is extracted with a one-hot lane reduction, and
    the column view of the pivot row comes from a (1, n) -> (n, 1)
    transpose (symmetric carry), avoiding lane-dim dynamic slicing.

Interpret mode keeps the kernel CPU-testable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
  from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
  pltpu = None


def _chol_panel_kernel(a_ref, out_ref, scratch_ref):
  n = a_ref.shape[0]
  a0 = a_ref[:]
  # Symmetrize: the sweep reads only the pivot ROW and relies on
  # row_k == col_k^T at every step.
  scratch_ref[:] = 0.5 * (a0 + a0.T)
  out_ref[:] = jnp.zeros_like(a0)
  lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

  def body(k, _):
    row = scratch_ref[pl.ds(k, 1), :]                    # (1, n)
    # Pivot element via one-hot lane reduction (no lane dyn-slice).
    onehot = (lane == k).astype(row.dtype)
    akk = jnp.sum(row * onehot)
    inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
    lrow = jnp.where(lane >= k, row * inv_d, 0.0)        # (1, n)
    out_ref[pl.ds(k, 1), :] = lrow
    lcol = lrow.T                                        # (n, 1)
    scratch_ref[:] = scratch_ref[:] - lcol * lrow
    return 0

  jax.lax.fori_loop(0, n, body, 0, unroll=False)
  # out currently holds U = L^T as rows; emit the lower factor.
  out_ref[:] = out_ref[:].T


def _chol_panel_blocked_kernel(block_width, a_ref, out_ref):
  """Left-looking blocked sweep, fully static (unrolled).

  Panels of `block_width` columns are corrected by one MXU GEMM against
  the already-finished factor, then factored with a column sweep whose
  per-step update touches only the (n x block_width) panel. No dynamic
  slicing, no transposes of carried state: columns are read natively.
  """
  n = a_ref.shape[0]
  bw = block_width
  a0 = a_ref[:]
  a0 = 0.5 * (a0 + a0.T)
  out_ref[:] = jnp.zeros_like(a0)
  row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

  for jb in range(n // bw):
    col0 = jb * bw
    panel = a0[:, col0:col0 + bw]                      # (n, bw)
    if jb > 0:
      l_prev = out_ref[:, :col0]                       # (n, col0)
      strip = out_ref[col0:col0 + bw, :col0]           # (bw, col0)
      panel = panel - jax.lax.dot_general(
          l_prev, strip, (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
    for k_local in range(bw):
      k = col0 + k_local
      col = panel[:, k_local:k_local + 1]              # (n, 1)
      akk = col[k, 0]
      inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
      lcol = jnp.where(row_idx >= k, col * inv_d, 0.0)
      out_ref[:, k:k + 1] = lcol
      seg = lcol[col0:col0 + bw, 0:1]                  # (bw, 1)
      panel = panel - lcol * seg.T                     # rank-1, panel-wide


@functools.partial(jax.jit, static_argnames=('interpret', 'block_width'))
def cholesky_panel_blocked(a: jnp.ndarray, interpret: bool = False,
                           block_width: int = 128) -> jnp.ndarray:
  """Lower Cholesky of an SPD panel via the static left-looking kernel."""
  n = a.shape[-1]
  if n % block_width:
    # The blocked sweep iterates n // block_width full panels; a ragged
    # tail would be silently left as zeros in the factor.
    raise ValueError(
        f'cholesky_panel_blocked needs n % block_width == 0, got '
        f'n={n}, block_width={block_width}; pad the input (see '
        f'cholesky_panel_padded) or use cholesky_panel.')
  kernel = functools.partial(_chol_panel_blocked_kernel, block_width)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      interpret=interpret,
  )(a.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('interpret',))
def cholesky_panel(a: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
  """Lower Cholesky factor of a single SPD panel (n <= 512, n % 128 == 0
  preferred). Runs fully in VMEM."""
  n = a.shape[-1]
  return pl.pallas_call(
      _chol_panel_kernel,
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
      interpret=interpret,
  )(a.astype(jnp.float32))


def cholesky_panel_padded(a: jnp.ndarray, interpret: bool = False,
                          pad_to: int = 128) -> jnp.ndarray:
  """Pad to a multiple of `pad_to` with an identity block, factor, slice."""
  n = a.shape[-1]
  pn = ((n + pad_to - 1) // pad_to) * pad_to
  if pn == n:
    return cholesky_panel(a, interpret=interpret)
  ap = jnp.eye(pn, dtype=jnp.float32).at[:n, :n].set(a)
  return cholesky_panel(ap, interpret=interpret)[:n, :n]
