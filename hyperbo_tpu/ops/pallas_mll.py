"""Single-kernel fused GP marginal likelihood (Pallas/Mosaic).

The full NLL pipeline — Gram + jitter, Cholesky, forward solve, logdet —
as ONE HBM-resident kernel (SURVEY.md section 7 "fused logdet/solve
epilogue"; reference pipeline: hyperbo/gp_utils/objectives.py:144-156).
Built on the v8 half-panel factorization (ops/pallas_chol_hbm.py) with
three fusions that remove every auxiliary pass over HBM:

  * Gram tiles are computed INSIDE the kernel from the (d, n)
    length-scaled inputs (kept lane-major: 256 KB VMEM at n=8192) —
    K = sv * exp(-0.5 ||xi - xj||^2) + diag_add * I materializes only as
    the (half, B) working tile, never in HBM;
  * the forward solve z = L^{-1} y rides the correction strips: the
    (B, tw) strip loaded for panel corrections is exactly the L[j, t]
    row block the solve needs, so z costs one extra VPU reduction per
    strip; y^T K^{-1} y = ||z||^2 needs NO backward solve;
  * log det accumulates from the diagonal sweeps.

Outputs: (L, quad, logdet_half) with quad = y^T K^{-1} y and
logdet_half = sum(log(diag(L))); the caller assembles
nll = 0.5 * quad + logdet_half + 0.5 * n * log(2 pi).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperbo_tpu.ops.pallas_chol_hbm import _INV_BASE, _stacked_sweep


def _kernel_mll(n, d, block, chunk, tw, half, wstore, xt_ref, y_ref,
                sv_ref, diag_ref, l_hbm, quad_ref, ld_ref, halfbuf,
                lbuf, strip, l_ref, w_ref, z_ref, s_ref,
                sem_l, sem_s, sem_out):
  nb = n // block
  n_halves = n // half
  chunks_per_half = half // chunk
  mb = _INV_BASE
  row_idx_h = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
  row_idx_s = jax.lax.broadcasted_iota(jnp.int32, (2 * block, 1), 0)
  tile_r = jax.lax.broadcasted_iota(jnp.int32, (half, block), 0)
  tile_c = jax.lax.broadcasted_iota(jnp.int32, (half, block), 1)
  ones_d = jnp.ones((d, 1), jnp.float32)
  eye_b = jnp.eye(block, dtype=jnp.float32)

  # Zero the output L (wide strips read at/beyond the pivot) and the
  # solve/accumulator state.
  halfbuf[:] = jnp.zeros((half, block), jnp.float32)

  def zero_step(i, _):
    hh = jax.lax.div(i, nb)
    jj = jax.lax.rem(i, nb)
    co = pltpu.make_async_copy(
        halfbuf, l_hbm.at[pl.ds(hh * half, half),
                          pl.ds(jj * block, block)], sem_out)
    co.start()
    co.wait()
    return 0

  jax.lax.fori_loop(0, n_halves * nb, zero_step, 0)
  z_ref[:] = jnp.zeros((1, n), jnp.float32)

  def gram_tile(row0, col0):
    """sv * exp(-0.5 sqdist) tile for rows [row0,row0+half) x B cols."""
    xr = xt_ref[:, pl.ds(row0, half)]                 # (d, half)
    xc = xt_ref[:, pl.ds(col0, block)]                # (d, B)
    cross = jax.lax.dot_general(xr, xc, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    sq_r = jax.lax.dot_general(xr * xr, ones_d, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    sq_c = jax.lax.dot_general(xc * xc, ones_d, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    sqd = sq_r + sq_c.T - 2.0 * cross
    return sv_ref[0, 0] * jnp.exp(-0.5 * jnp.maximum(sqd, 0.0))

  def corrections(j, row0, with_solve):
    """halfbuf -= L[rows, :col0] L[col0.., :col0]^T; optionally s += ..."""
    col0 = j * block
    n_strips = jax.lax.div(col0 + tw - 1, tw)
    c_start = jax.lax.select(
        with_solve, jax.lax.div(col0 - row0, chunk), 0)

    def correct(s, _):
      scol = s * tw
      cs = pltpu.make_async_copy(
          l_hbm.at[pl.ds(col0, block), pl.ds(scol, tw)], strip, sem_s)
      cs.start()
      cs.wait()
      if with_solve:
        # Forward-solve partial sum: s += L[j, cols] z[cols] — the strip
        # is exactly the row block the solve needs.
        zs = z_ref[0:1, pl.ds(scol, tw)]              # (1, tw)
        s_ref[:] = s_ref[:] + jnp.sum(strip[:] * zs, axis=1,
                                      keepdims=True)

      def dma_for(c, slot):
        return pltpu.make_async_copy(
            l_hbm.at[pl.ds(row0 + c * chunk, chunk), pl.ds(scol, tw)],
            lbuf.at[slot], sem_l.at[slot])

      dma_for(c_start, 0).start()

      def chunk_step(c, _):
        slot = jax.lax.rem(c - c_start, 2)

        @pl.when(c + 1 < chunks_per_half)
        def _():
          dma_for(c + 1, jax.lax.rem(c + 1 - c_start, 2)).start()

        dma_for(c, slot).wait()
        update = jax.lax.dot_general(
            lbuf[slot], strip[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        halfbuf[pl.ds(c * chunk, chunk), :] = (
            halfbuf[pl.ds(c * chunk, chunk), :] - update)
        return 0

      jax.lax.fori_loop(c_start, chunks_per_half, chunk_step, 0)
      return 0

    jax.lax.fori_loop(0, n_strips, correct, 0)

  def panel_step(j, _):
    col0 = j * block
    h0 = jax.lax.div(col0, half)
    row0_d = h0 * half
    loc0 = col0 - row0_d

    # --- diagonal half: Gram tile + jitter, corrections + solve taps ---
    tile = gram_tile(row0_d, col0)
    on_diag = ((tile_r + row0_d) == (tile_c + col0)).astype(jnp.float32)
    halfbuf[:] = tile + diag_ref[0, 0] * on_diag
    s_ref[:] = jnp.zeros((block, 1), jnp.float32)
    corrections(j, row0_d, with_solve=True)

    d0 = halfbuf[pl.ds(loc0, block), :]
    _stacked_sweep(d0, block, mb, row_idx_s, l_ref, w_ref,
                   wstore=wstore)

    # log det += sum log diag L_D
    ld = l_ref[:]
    ld_ref[0, 0] += jnp.sum(jnp.where(eye_b > 0.0, jnp.log(
        jnp.maximum(ld, 1e-30)), 0.0))

    # z_j = L_D^{-1} (y_j - s_j), stored lane-major.
    v = y_ref[0:1, pl.ds(col0, block)] - s_ref[:].T    # (1, B)
    if wstore == 'linvT':
      zj = jax.lax.dot_general(v, w_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    else:
      zj = jax.lax.dot_general(v, w_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    z_ref[0:1, pl.ds(col0, block)] = zj

    wdims = ((((1,), (0,)), ((), ())) if wstore == 'linvT' else
             (((1,), (1,)), ((), ())))
    below = jax.lax.dot_general(halfbuf[:], w_ref[:], wdims,
                                preferred_element_type=jnp.float32)
    keep = ((row_idx_h + row0_d) >= col0 + block).astype(jnp.float32)
    halfbuf[:] = below * keep
    halfbuf[pl.ds(loc0, block), :] = l_ref[:]
    co = pltpu.make_async_copy(
        halfbuf, l_hbm.at[pl.ds(row0_d, half), pl.ds(col0, block)],
        sem_out)
    co.start()
    co.wait()

    # --- strictly-below halves ---
    def half_step(h, _):
      row0 = h * half
      halfbuf[:] = gram_tile(row0, col0)
      corrections(j, row0, with_solve=False)
      halfbuf[:] = jax.lax.dot_general(
          halfbuf[:], w_ref[:], wdims,
          preferred_element_type=jnp.float32)
      co = pltpu.make_async_copy(
          halfbuf, l_hbm.at[pl.ds(row0, half), pl.ds(col0, block)],
          sem_out)
      co.start()
      co.wait()
      return 0

    jax.lax.fori_loop(h0 + 1, n_halves, half_step, 0)
    return 0

  ld_ref[0, 0] = 0.0
  jax.lax.fori_loop(0, nb, panel_step, 0)
  quad_ref[0, 0] = jnp.sum(z_ref[:] * z_ref[:])


@functools.partial(jax.jit, static_argnames=('block', 'chunk', 'tw',
                                             'half', 'wstore',
                                             'interpret'))
def mll_fused_hbm(x_scaled: jnp.ndarray, y: jnp.ndarray,
                  signal_variance, diag_add, block: int = 256,
                  chunk: int = 512, tw: int = 1024, half: int = 2048,
                  wstore: str = 'linvT',
                  interpret: bool = False):
  """Fused SE-kernel GP NLL pieces in one Pallas kernel.

  Args:
    x_scaled: (n, d) inputs already divided by the length scales.
    y: (n, 1) centered targets.
    signal_variance: scalar kernel variance.
    diag_add: scalar added to the Gram diagonal (noise + jitter).
    block/chunk/tw/half/wstore: factorization tiling (see
      cholesky_hbm_halfwide).

  Returns:
    (l, quad, logdet_half): the lower factor, y^T K^{-1} y, and
    sum(log(diag(l))). NLL = 0.5*quad + logdet_half + n/2 log(2 pi).
  """
  n, d = x_scaled.shape
  half = min(half, n)
  chunk = min(chunk, half)
  tw = min(tw, n)
  assert (n % block == 0 and n % half == 0 and half % chunk == 0 and
          tw % block == 0 and n % tw == 0 and half % block == 0), (
              n, block, chunk, tw, half)
  assert wstore in ('linvT', 'linv'), wstore
  xt = x_scaled.astype(jnp.float32).T                     # (d, n)
  yrow = y.astype(jnp.float32).reshape(1, n)
  sv = jnp.asarray(signal_variance, jnp.float32).reshape(1, 1)
  da = jnp.asarray(diag_add, jnp.float32).reshape(1, 1)
  kernel = functools.partial(_kernel_mll, n, d, block, chunk, tw, half,
                             wstore)
  l, quad, ld = pl.pallas_call(
      kernel,
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.VMEM),       # xt
          pl.BlockSpec(memory_space=pltpu.VMEM),       # y row
          pl.BlockSpec(memory_space=pltpu.SMEM),       # sv
          pl.BlockSpec(memory_space=pltpu.SMEM),       # diag_add
      ],
      out_specs=(
          pl.BlockSpec(memory_space=pl.ANY),           # L
          pl.BlockSpec(memory_space=pltpu.SMEM),       # quad
          pl.BlockSpec(memory_space=pltpu.SMEM),       # logdet
      ),
      out_shape=(
          jax.ShapeDtypeStruct((n, n), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ),
      scratch_shapes=[
          pltpu.VMEM((half, block), jnp.float32),       # halfbuf
          pltpu.VMEM((2, chunk, tw), jnp.float32),      # lbuf x2
          pltpu.VMEM((block, tw), jnp.float32),         # strip
          pltpu.VMEM((block, block), jnp.float32),      # l_ref
          pltpu.VMEM((block, block), jnp.float32),      # w_ref
          pltpu.VMEM((1, n), jnp.float32),              # z row
          pltpu.VMEM((block, 1), jnp.float32),          # s partial
          pltpu.SemaphoreType.DMA((2,)),                # sem_l
          pltpu.SemaphoreType.DMA,                      # sem_s
          pltpu.SemaphoreType.DMA,                      # sem_out
      ],
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
      interpret=interpret,
  )(xt, yrow, sv, da)
  return l, quad[0, 0], ld[0, 0]
