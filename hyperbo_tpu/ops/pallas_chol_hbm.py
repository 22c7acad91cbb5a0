"""Single-kernel HBM-resident blocked Cholesky (Pallas/Mosaic).

Motivation (PERF.md): XLA's factorization spends its time in 64
sequential expander panels with HBM round-trips between every stage, and
a per-pallas_call launch costs ~460 us — so the only way to beat it is
ONE kernel that owns the whole factorization: panels stream through VMEM
via explicit DMA, the diagonal blocks factorize with an in-register
column sweep (~0.1-0.3 us/step once inside the kernel), their inverses
accumulate during the same sweep, and all O(n^3) work runs as MXU
dot_generals between DMAs.

Left-looking layout, block width B (panel j = columns [jB, (j+1)B)):

  1. DMA A[:, jB:(j+1)B] -> panel (VMEM, n x B)
  2. for t < j:  DMA L[:, tB:(t+1)B] -> lbuf;
                 panel -= lbuf @ strip_t^T          (strip_t = rows jB..)
  3. diag sweep: factor D = panel[jB:jB+B] -> L_D, accumulating
                 W = L_D^{-1} by forward substitution in the same loop
  4. below: panel @ W^T (one MXU dot), rows masked to > jB; rows jB..
     replaced by L_D; rows < jB zeroed
  5. DMA panel -> L[:, jB:(j+1)B]

Total DMA volume is O(n^2 * n/B); with B=256 at n=8192 that is ~4 GB.
This v1 serializes DMA and compute (double-buffering is the follow-up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n, block, chunk, a_hbm, l_hbm, panel, lbuf, strip, sem_a,
            sem_l, sem_s, sem_out):
  nb = n // block
  n_chunks = n // chunk
  row_idx_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
  row_idx_b = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
  col_idx_b = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)

  def panel_step(j, _):
    col0 = j * block
    # 1. Load the raw panel.
    cp = pltpu.make_async_copy(
        a_hbm.at[:, pl.ds(col0, block)], panel, sem_a)
    cp.start()
    cp.wait()

    # 2. Left-looking correction against all finished panels, in row
    #    chunks; chunks entirely above the pivot row are skipped (their
    #    panel rows are masked out in step 4 anyway).
    def correct(t, _):
      tcol = t * block
      cs = pltpu.make_async_copy(
          l_hbm.at[pl.ds(col0, block), pl.ds(tcol, block)], strip, sem_s)
      cs.start()
      cs.wait()

      def chunk_step(c, _):
        row0 = c * chunk

        @pl.when(row0 + chunk > col0)
        def _():
          cl = pltpu.make_async_copy(
              l_hbm.at[pl.ds(row0, chunk), pl.ds(tcol, block)], lbuf,
              sem_l)
          cl.start()
          cl.wait()
          update = jax.lax.dot_general(
              lbuf[:], strip[:], (((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32)
          panel[pl.ds(row0, chunk), :] = (
              panel[pl.ds(row0, chunk), :] - update)

        return 0

      jax.lax.fori_loop(0, n_chunks, chunk_step, 0)
      return 0

    jax.lax.fori_loop(0, j, correct, 0)

    # 3. Diagonal sweep with simultaneous inverse accumulation.
    #    d: the B x B diagonal block (copied into registers);
    #    w: L_D^{-1}, built row-by-row by forward substitution.
    d0 = panel[pl.ds(col0, block), :]
    d0 = 0.5 * (d0 + d0.T)

    def sweep(k, carry):
      d, l_d, w = carry
      onehot_col = (col_idx_b == k).astype(jnp.float32)       # (1, B)
      onehot_row = (row_idx_b == k).astype(jnp.float32)       # (B, 1)
      col = jax.lax.dot_general(d, onehot_col.T,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
      akk = jnp.sum(col * onehot_row)
      inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
      lcol = jnp.where(row_idx_b >= k, col * inv_d, 0.0)      # (B, 1)
      l_d = l_d + lcol * onehot_col                           # set col k
      d = d - lcol * lcol.T
      # Forward substitution row k of W: (e_k - L[k, :k] W[:k, :]) / l_kk.
      # L[k, :k] is row k of the already-built l_d columns.
      lrow_built = jax.lax.dot_general(onehot_row.T, l_d,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
      lrow_strict = jnp.where(col_idx_b < k, lrow_built, 0.0)  # (1, B)
      acc = jax.lax.dot_general(lrow_strict, w,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
      wrow = (onehot_col - acc) * inv_d                        # (1, B)
      w = w + onehot_row * wrow                                # set row k
      return d, l_d, w

    zeros_b = jnp.zeros((block, block), jnp.float32)
    _, l_d, w = jax.lax.fori_loop(
        0, block, sweep, (d0, zeros_b, zeros_b))

    # 4. Below-diagonal panel: A_below @ W^T; splice in L_D; zero above.
    below = jax.lax.dot_general(panel[:], w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    keep_below = (row_idx_n >= col0 + block).astype(jnp.float32)
    result = below * keep_below
    panel[:] = result
    panel[pl.ds(col0, block), :] = l_d

    # 5. Store the finished panel.
    co = pltpu.make_async_copy(
        panel, l_hbm.at[:, pl.ds(col0, block)], sem_out)
    co.start()
    co.wait()
    return 0

  jax.lax.fori_loop(0, nb, panel_step, 0)


@functools.partial(jax.jit, static_argnames=('block', 'chunk',
                                             'interpret'))
def cholesky_hbm(a: jnp.ndarray, block: int = 256,
                 chunk: int = 2048,
                 interpret: bool = False) -> jnp.ndarray:
  """Lower Cholesky factor of SPD `a` (n x n, n % block == 0,
  n % chunk == 0, chunk % block == 0 recommended)."""
  n = a.shape[-1]
  chunk = min(chunk, n)
  assert n % block == 0 and n % chunk == 0, (n, block, chunk)
  kernel = functools.partial(_kernel, n, block, chunk)
  return pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
      out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((n, block), jnp.float32),      # panel
          pltpu.VMEM((chunk, block), jnp.float32),  # lbuf (row chunk)
          pltpu.VMEM((block, block), jnp.float32),  # strip
          pltpu.SemaphoreType.DMA,
          pltpu.SemaphoreType.DMA,
          pltpu.SemaphoreType.DMA,
          pltpu.SemaphoreType.DMA,
      ],
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
      interpret=interpret,
  )(a.astype(jnp.float32))
