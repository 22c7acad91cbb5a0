"""Single-kernel HBM-resident blocked Cholesky (Pallas/Mosaic).

Motivation (PERF.md): XLA's factorization spends its time in 64
sequential expander panels with HBM round-trips between every stage, and
a per-pallas_call launch costs ~460 us — so the way to beat it is ONE
kernel that owns the whole factorization: panels stream through VMEM via
explicit DMA, diagonal blocks factorize with an in-VMEM column sweep,
and all O(n^3) work runs as MXU dot_generals between large-chunk DMAs
(per-DMA semaphore costs rule out fine-grained pipelines; PERF.md).

Left-looking layout, block width B (panel j = columns [jB, (j+1)B)):

  1. DMA A[:, jB:(j+1)B] -> panel (VMEM, n x B)
  2. for t < j, row chunks c (skipping chunks above the pivot):
       panel[c] -= L[c, tB:(t+1)B] @ strip_t^T     (large-chunk DMA)
  3. diagonal sweep in refs: U = L_D^T built row-by-row (B steps; the
     pivot row is read with a dynamic-sublane ref slice, its masked
     rescale IS row k of U, and one transpose feeds the rank-1 update)
  4. W = L_D^{-1} by 64-wide batched forward substitution (static
     unroll) + two levels of triangular block combines (MXU)
  5. below-diagonal panel = panel @ W^T (one MXU dot), rows masked;
     rows jB.. spliced with L_D
  6. DMA panel -> L[:, jB:(j+1)B]

DMA volume is O(n^2 * nb) with above-pivot chunks skipped (~2 GB at
n=8192, B=256), overlapped with the correction GEMMs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperbo_tpu.ops import pallas_params

_INV_BASE = 64


def _dekker_split(x):
  """x = hi + lo with hi exactly bf16-representable (<= 8 significand
  bits), in pure f32 VPU arithmetic (Dekker splitting, splitter
  2^16 + 1). The remote toolchain crashes on Precision.HIGHEST and on
  bf16 casts inside kernels; the MXU converts f32 operands to bf16 per
  pass, so split operands recover ~2^-16 relative accuracy with three
  single-pass dots (X3 emulation). Measured in-kernel default dots run
  single-pass bf16 (2.3e-3 rel err, round 2)."""
  c = x * 65537.0
  hi = c - (c - x)
  return hi, x - hi


def _pdot(a, b, dims, precise=True):
  """dot_general with optional 3-pass split-operand precision."""
  if not precise:
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)
  a_hi, a_lo = _dekker_split(a)
  b_hi, b_lo = _dekker_split(b)
  o = jax.lax.dot_general(a_hi, b_hi, dims,
                          preferred_element_type=jnp.float32)
  o += jax.lax.dot_general(a_hi, b_lo, dims,
                           preferred_element_type=jnp.float32)
  o += jax.lax.dot_general(a_lo, b_hi, dims,
                           preferred_element_type=jnp.float32)
  return o


def _forward_subst(l_mat):
  """Inverse of a lower-triangular (m, m) block by forward substitution.

  Static unroll; rows accumulate through masked adds (Mosaic has no
  scatter/dynamic_update_slice on values).
  """
  m = l_mat.shape[-1]
  eye = jnp.eye(m, dtype=l_mat.dtype)
  w = jnp.zeros_like(l_mat)
  for k in range(m):
    lrow = l_mat[k:k + 1, :]                           # (1, m) static
    lkk = lrow[:, k:k + 1]                             # (1, 1)
    acc = jax.lax.dot_general(lrow, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    wrow = (eye[k:k + 1, :] - acc) / lkk
    w = w + wrow * eye[:, k:k + 1]                     # masked row write
  return w


def _tri_inverse(l_mat, base=_INV_BASE):
  """Inverse of a lower-triangular (B, B) matrix via block recursion.

  inv([[A,0],[C,D]]) = [[A^-1, 0], [-D^-1 C A^-1, D^-1]]; pure static
  slices + concats + MXU matmuls (Mosaic-safe).
  """
  m = l_mat.shape[-1]
  if m <= base:
    return _forward_subst(l_mat)
  h = m // 2
  a_inv = _tri_inverse(l_mat[:h, :h], base)
  d_inv = _tri_inverse(l_mat[h:, h:], base)
  c = l_mat[h:, :h]
  off = -jax.lax.dot_general(
      jax.lax.dot_general(d_inv, c, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32),
      a_inv, (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  zeros = jnp.zeros((h, m - h), l_mat.dtype)
  top = jnp.concatenate([a_inv, zeros], axis=1)
  bot = jnp.concatenate([off, d_inv], axis=1)
  return jnp.concatenate([top, bot], axis=0)


def _kernel(n, block, chunk, a_hbm, l_hbm, panel, lbuf, strip,
            l_ref, sem_a, sem_l, sem_s, sem_out):
  nb = n // block
  n_chunks = n // chunk
  row_idx_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
  row_idx_b = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)

  def panel_step(j, _):
    col0 = j * block
    cp = pltpu.make_async_copy(
        a_hbm.at[:, pl.ds(col0, block)], panel, sem_a)
    cp.start()
    cp.wait()

    # ---- 2. corrections over (t, chunk); chunks above the pivot are
    # skipped (their panel rows are masked in step 5 anyway). Few LARGE
    # DMAs: per-iteration semaphore costs dominate small-chunk
    # pipelines on this part (measured 5 us/iteration), so the loop is
    # deliberately single-buffered with the biggest chunk that fits
    # VMEM (~10.5 MB usable).
    def correct(t, _):
      tcol = t * block
      cs = pltpu.make_async_copy(
          l_hbm.at[pl.ds(col0, block), pl.ds(tcol, block)], strip, sem_s)
      cs.start()
      cs.wait()
      c_start = jax.lax.div(col0, chunk)

      def chunk_step(c, _):
        cl = pltpu.make_async_copy(
            l_hbm.at[pl.ds(c * chunk, chunk), pl.ds(tcol, block)],
            lbuf, sem_l)
        cl.start()
        cl.wait()
        update = jax.lax.dot_general(
            lbuf[:], strip[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        panel[pl.ds(c * chunk, chunk), :] = (
            panel[pl.ds(c * chunk, chunk), :] - update)
        return 0

      jax.lax.fori_loop(c_start, n_chunks, chunk_step, 0)
      return 0

    jax.lax.fori_loop(0, j, correct, 0)

    # ---- 3. diagonal factorization: micro-blocked left-looking sweep.
    # Fully static (unrolled): each 64-wide column block is corrected by
    # one MXU dot against the finished columns in l_ref, then factored
    # with 64 static steps whose rank-1 updates touch only the (B x 64)
    # active block value — no per-step ref round-trips, no dynamic
    # slicing, one (64,1)->(1,64) transpose per step.
    d0 = panel[pl.ds(col0, block), :]
    d0 = 0.5 * (d0 + d0.T)
    l_ref[:] = jnp.zeros((block, block), jnp.float32)
    mb = _INV_BASE
    for c0 in range(0, block, mb):
      bcols = d0[:, c0:c0 + mb]
      if c0 > 0:
        lsofar = l_ref[:, 0:c0]                       # (B, c0)
        strip2 = l_ref[c0:c0 + mb, 0:c0]              # (mb, c0) static
        bcols = bcols - jax.lax.dot_general(
            lsofar, strip2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
      for kl in range(mb):
        k = c0 + kl
        col = bcols[:, kl:kl + 1]                     # (B, 1) static
        akk = col[k, 0]
        inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
        lcol = jnp.where(row_idx_b >= k, col * inv_d, 0.0)
        l_ref[:, k:k + 1] = lcol                      # static col write
        seg = lcol[c0:c0 + mb, 0:1].T                 # (1, mb)
        bcols = bcols - lcol * seg

    # ---- 4. W = L_D^{-1} ----
    l_d = l_ref[:]
    w = _tri_inverse(l_d)

    # ---- 5. below-diagonal panel + splice ----
    below = jax.lax.dot_general(panel[:], w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    keep_below = (row_idx_n >= col0 + block).astype(jnp.float32)
    panel[:] = below * keep_below
    panel[pl.ds(col0, block), :] = l_d

    co = pltpu.make_async_copy(
        panel, l_hbm.at[:, pl.ds(col0, block)], sem_out)
    co.start()
    co.wait()
    return 0

  jax.lax.fori_loop(0, nb, panel_step, 0)


def _kernel_halves(n, block, chunk, half, a_hbm, l_hbm, halfbuf, lbuf,
                   strip, l_ref, w_ref, sem_a, sem_l, sem_s, sem_out):
  """v6: half-height panels + dual-buffered large-chunk corrections.

  The panel buffer shrinks to (half, B), freeing VMEM for two
  (chunk, B) correction buffers whose DMAs overlap the correction
  GEMMs. Halves are processed in row order; the diagonal half runs the
  sweep and stores W = L_D^{-1} in w_ref for the later halves.
  """
  nb = n // block
  n_halves = n // half
  chunks_per_half = half // chunk
  row_idx_h = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
  row_idx_b = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)

  def panel_step(j, _):
    col0 = j * block

    def half_step(h, _):
      row0 = h * half
      is_dead = row0 + half <= col0          # entirely above the pivot
      has_diag = jnp.logical_and(row0 <= col0, col0 < row0 + half)

      @pl.when(is_dead)
      def _():
        halfbuf[:] = jnp.zeros((half, block), jnp.float32)
        co = pltpu.make_async_copy(
            halfbuf, l_hbm.at[pl.ds(row0, half), pl.ds(col0, block)],
            sem_out)
        co.start()
        co.wait()

      @pl.when(jnp.logical_not(is_dead))
      def _():
        cp = pltpu.make_async_copy(
            a_hbm.at[pl.ds(row0, half), pl.ds(col0, block)], halfbuf,
            sem_a)
        cp.start()
        cp.wait()

        # Corrections: dual-buffered chunks within this half.
        def correct(t, _):
          tcol = t * block
          cs = pltpu.make_async_copy(
              l_hbm.at[pl.ds(col0, block), pl.ds(tcol, block)], strip,
              sem_s)
          cs.start()
          cs.wait()

          def dma_for(c, slot):
            return pltpu.make_async_copy(
                l_hbm.at[pl.ds(row0 + c * chunk, chunk),
                         pl.ds(tcol, block)],
                lbuf.at[slot], sem_l.at[slot])

          dma_for(0, 0).start()

          def chunk_step(c, _):
            slot = c % 2

            @pl.when(c + 1 < chunks_per_half)
            def _():
              dma_for(c + 1, (c + 1) % 2).start()

            dma_for(c, slot).wait()
            update = jax.lax.dot_general(
                lbuf[slot], strip[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            halfbuf[pl.ds(c * chunk, chunk), :] = (
                halfbuf[pl.ds(c * chunk, chunk), :] - update)
            return 0

          jax.lax.fori_loop(0, chunks_per_half, chunk_step, 0)
          return 0

        jax.lax.fori_loop(0, j, correct, 0)

        # Diagonal half: factorize + store W for the later halves.
        @pl.when(has_diag)
        def _():
          loc0 = pl.multiple_of(col0 - row0, block)
          d0 = halfbuf[pl.ds(loc0, block), :]
          d0 = 0.5 * (d0 + d0.T)
          l_ref[:] = jnp.zeros((block, block), jnp.float32)
          mb = _INV_BASE
          for c0 in range(0, block, mb):
            bcols = d0[:, c0:c0 + mb]
            if c0 > 0:
              bcols = bcols - jax.lax.dot_general(
                  l_ref[:, 0:c0], l_ref[c0:c0 + mb, 0:c0],
                  (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32)
            for kl in range(mb):
              k = c0 + kl
              col = bcols[:, kl:kl + 1]
              akk = col[k, 0]
              inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
              lcol = jnp.where(row_idx_b >= k, col * inv_d, 0.0)
              l_ref[:, k:k + 1] = lcol
              seg = lcol[c0:c0 + mb, 0:1].T
              bcols = bcols - lcol * seg
          w_ref[:] = _tri_inverse(l_ref[:])

        # Below-diagonal rows of this half (+ splice on the diag half).
        w = w_ref[:]
        below = jax.lax.dot_general(
            halfbuf[:], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        keep = ((row_idx_h + row0) >= col0 + block).astype(jnp.float32)
        halfbuf[:] = below * keep

        @pl.when(has_diag)
        def _():
          halfbuf[pl.ds(col0 - row0, block), :] = l_ref[:]

        co = pltpu.make_async_copy(
            halfbuf, l_hbm.at[pl.ds(row0, half), pl.ds(col0, block)],
            sem_out)
        co.start()
        co.wait()

      return 0

    jax.lax.fori_loop(0, n_halves, half_step, 0)
    return 0

  jax.lax.fori_loop(0, nb, panel_step, 0)


def _kernel_wide(n, block, chunk, tw, mode, a_hbm, l_hbm, panel, lbuf,
                 strip, l_ref, sem_a, sem_l, sem_s, sem_out):
  """v7: wide-strip corrections + dual-buffered chunk DMAs.

  v5's correction loop is iteration-count bound (~5 us of DMA wait +
  semaphore cost per (t, chunk) pair; PERF.md). Two changes attack it:

    * the contraction runs over tw >= block finished columns at once
      (fewer, larger GEMMs: K = tw instead of K = block). The output is
      zeroed upfront so a strip whose tail crosses the pivot column
      contributes exact zeros instead of garbage;
    * the chunk DMA is double-buffered against the correction GEMM
      (lbuf has 2 slots), hiding the HBM latency behind MXU work.
  """
  nb = n // block
  n_chunks = n // chunk
  row_idx_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
  row_idx_b = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)

  # Zero the output once: wide strips read L columns at and beyond the
  # pivot, which must be 0.0 (uninitialized HBM could hold NaN/Inf).
  panel[:] = jnp.zeros((n, block), jnp.float32)

  def zero_step(j, _):
    co = pltpu.make_async_copy(
        panel, l_hbm.at[:, pl.ds(j * block, block)], sem_out)
    co.start()
    co.wait()
    return 0

  jax.lax.fori_loop(0, nb, zero_step, 0)

  def panel_step(j, _):
    col0 = j * block
    cp = pltpu.make_async_copy(
        a_hbm.at[:, pl.ds(col0, block)], panel, sem_a)
    cp.start()
    cp.wait()

    n_strips = jax.lax.div(col0 + tw - 1, tw)
    c_start = jax.lax.div(col0, chunk)

    def correct(s, _):
      scol = s * tw
      cs = pltpu.make_async_copy(
          l_hbm.at[pl.ds(col0, block), pl.ds(scol, tw)], strip, sem_s)
      cs.start()
      cs.wait()

      def dma_for(c, slot):
        return pltpu.make_async_copy(
            l_hbm.at[pl.ds(c * chunk, chunk), pl.ds(scol, tw)],
            lbuf.at[slot], sem_l.at[slot])

      dma_for(c_start, 0).start()

      def chunk_step(c, _):
        slot = jax.lax.rem(c - c_start, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
          dma_for(c + 1, jax.lax.rem(c + 1 - c_start, 2)).start()

        dma_for(c, slot).wait()
        if mode != 'dmaonly':
          update = jax.lax.dot_general(
              lbuf[slot], strip[:], (((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32)
          panel[pl.ds(c * chunk, chunk), :] = (
              panel[pl.ds(c * chunk, chunk), :] - update)
        return 0

      jax.lax.fori_loop(c_start, n_chunks, chunk_step, 0)
      return 0

    if mode != 'nocorr':
      jax.lax.fori_loop(0, n_strips, correct, 0)

    if mode in ('nosweep', 'dmaonly'):
      # Timing diagnostic: skip the sweep; W = I (output is garbage).
      w = jnp.eye(block, dtype=jnp.float32)
      l_ref[:] = w
      below = jax.lax.dot_general(panel[:], w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
      keep_below = (row_idx_n >= col0 + block).astype(jnp.float32)
      panel[:] = below * keep_below
      panel[pl.ds(col0, block), :] = l_ref[:]
      co = pltpu.make_async_copy(
          panel, l_hbm.at[:, pl.ds(col0, block)], sem_out)
      co.start()
      co.wait()
      return 0

    # Diagonal factorization: identical micro-blocked sweep to v5.
    d0 = panel[pl.ds(col0, block), :]
    d0 = 0.5 * (d0 + d0.T)
    l_ref[:] = jnp.zeros((block, block), jnp.float32)
    mb = _INV_BASE
    for c0 in range(0, block, mb):
      bcols = d0[:, c0:c0 + mb]
      if c0 > 0:
        bcols = bcols - jax.lax.dot_general(
            l_ref[:, 0:c0], l_ref[c0:c0 + mb, 0:c0],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
      for kl in range(mb):
        k = c0 + kl
        col = bcols[:, kl:kl + 1]
        akk = col[k, 0]
        inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
        lcol = jnp.where(row_idx_b >= k, col * inv_d, 0.0)
        l_ref[:, k:k + 1] = lcol
        seg = lcol[c0:c0 + mb, 0:1].T
        bcols = bcols - lcol * seg

    w = _tri_inverse(l_ref[:])
    below = jax.lax.dot_general(panel[:], w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    keep_below = (row_idx_n >= col0 + block).astype(jnp.float32)
    panel[:] = below * keep_below
    panel[pl.ds(col0, block), :] = l_ref[:]

    co = pltpu.make_async_copy(
        panel, l_hbm.at[:, pl.ds(col0, block)], sem_out)
    co.start()
    co.wait()
    return 0

  jax.lax.fori_loop(0, nb, panel_step, 0)


def _stacked_sweep(d0, block, mb, row_idx_s, l_ref, w_ref,
                   wstore='linvT'):
  """Factor [D; I] -> L_D (l_ref) and L_D^{-T} (w_ref) in one sweep.

  The left-looking column sweep implements A -> A L^{-T}; running the
  identical column operations (coefficients read from the TOP half) on
  an identity block stacked below D yields I L^{-T} = L_D^{-T} for free,
  replacing the separate forward-substitution triangular inverse.

  The two halves live in SEPARATE (B, B) scratch refs: the remote
  Mosaic toolchain crashes on dots whose operand is a sublane-offset-256
  slice of a (2B, B) ref (bisected round 2, PERF.md), while per-column
  writes of the (2B, 1) value's static halves compile fine.
  """
  s0 = jnp.concatenate([0.5 * (d0 + d0.T),
                        jnp.eye(block, dtype=jnp.float32)], axis=0)
  l_ref[:] = jnp.zeros((block, block), jnp.float32)
  w_ref[:] = jnp.zeros((block, block), jnp.float32)
  for c0 in range(0, block, mb):
    bcols = s0[:, c0:c0 + mb]
    if c0 > 0:
      if wstore == 'linvT':
        wcols = w_ref[:, 0:c0]
      else:                       # w_ref rows are L^{-1} rows
        wcols = w_ref[0:c0, :].T  # = L^{-T}[:, :c0]
      lsofar = jnp.concatenate([l_ref[:, 0:c0], wcols], axis=0)
      bcols = bcols - jax.lax.dot_general(
          lsofar, l_ref[c0:c0 + mb, 0:c0],
          (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
    for kl in range(mb):
      k = c0 + kl
      col = bcols[:, kl:kl + 1]
      akk = col[k, 0]
      inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
      keep = (row_idx_s >= k) | (row_idx_s >= block)
      lcol = jnp.where(keep, col * inv_d, 0.0)
      l_ref[:, k:k + 1] = lcol[0:block, :]
      if wstore == 'linvT':
        w_ref[:, k:k + 1] = lcol[block:2 * block, :]
      else:
        w_ref[k:k + 1, :] = lcol[block:2 * block, 0:1].T
      seg = lcol[c0:c0 + mb, 0:1].T
      bcols = bcols - lcol * seg


def _kernel_halfwide(n, block, chunk, tw, half, mode, wstore, a_hbm,
                     l_hbm, halfbuf, lbuf, strip, l_ref, w_ref, sem_a,
                     sem_l, sem_s, sem_out):
  """v8: half-height panels + wide dual-buffered strips + stacked sweep.

  The v7 breakdown (PERF.md round 2) shows per-DMA issue/wait overhead
  dominating (~12.6 of 17.5 ms) and the diagonal stage costing ~4 ms.
  v8 attacks both:

    * the working panel shrinks to (half, B), freeing VMEM for
      chunk x tw correction tiles of ~2 MB — an order of magnitude fewer
      correction DMAs, dual-buffered behind the GEMMs;
    * the diagonal stage runs ONE stacked sweep producing L_D and
      L_D^{-T} together (_stacked_sweep) — no forward substitution, no
      block triangular inverse;
    * unlike v6, the sweep is NOT nested under pl.when inside the halves
      loop: each panel processes its diagonal half explicitly first,
      then loops over the strictly-below halves (the above-diagonal
      tiles are zeroed once upfront).
  """
  nb = n // block
  n_halves = n // half
  chunks_per_half = half // chunk
  mb = _INV_BASE
  row_idx_h = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
  row_idx_s = jax.lax.broadcasted_iota(jnp.int32, (2 * block, 1), 0)

  # Zero the output once: wide strips read L columns at/beyond the pivot.
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

  if mode == 'zero_only':
    return

  def corrections(j, row0, skip_dead):
    """halfbuf[rows row0..row0+half) -= L[rows, :col0] L[col0-row, :col0]^T."""
    col0 = j * block
    n_strips = jax.lax.div(col0 + tw - 1, tw)
    # Chunks fully above the pivot column are dead (diagonal half only).
    c_start = jax.lax.select(
        skip_dead, jax.lax.div(col0 - row0, chunk), 0)

    def correct(s, _):
      scol = s * tw
      cs = pltpu.make_async_copy(
          l_hbm.at[pl.ds(col0, block), pl.ds(scol, tw)], strip, sem_s)
      cs.start()
      cs.wait()

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
        if mode != 'dmaonly':
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
    loc0 = pl.multiple_of(col0 - row0_d, block)

    # --- diagonal half ---
    cp = pltpu.make_async_copy(
        a_hbm.at[pl.ds(row0_d, half), pl.ds(col0, block)], halfbuf,
        sem_a)
    cp.start()
    cp.wait()

    if mode in ('belowtest10', 'belowtest11', 'belowtest_mask',
                'belowtest_splice'):
      # Compile probes for the B=256 Mosaic crash (round 2).
      l_ref[:] = jnp.eye(block, dtype=jnp.float32)
      w_ref[:] = jnp.eye(block, dtype=jnp.float32)
      dims = (((1,), (1,)), ((), ())) if mode == 'belowtest11' else (
          ((1,), (0,)), ((), ()))
      below = jax.lax.dot_general(halfbuf[:], w_ref[:], dims,
                                  preferred_element_type=jnp.float32)
      if mode in ('belowtest_mask', 'belowtest_splice'):
        keep = ((row_idx_h + row0_d) >= col0 + block).astype(jnp.float32)
        below = below * keep
      halfbuf[:] = below
      if mode == 'belowtest_splice':
        halfbuf[pl.ds(loc0, block), :] = l_ref[:]
      co = pltpu.make_async_copy(
          halfbuf, l_hbm.at[pl.ds(row0_d, half), pl.ds(col0, block)],
          sem_out)
      co.start()
      co.wait()
      return 0

    corrections(j, row0_d, skip_dead=True)

    if mode in ('skeleton',):
      co = pltpu.make_async_copy(
          halfbuf, l_hbm.at[pl.ds(row0_d, half), pl.ds(col0, block)],
          sem_out)
      co.start()
      co.wait()
      return 0
    wdims = ((((1,), (0,)), ((), ())) if wstore == 'linvT' else
             (((1,), (1,)), ((), ())))
    if mode in ('nosweep', 'dmaonly', 'nobelow'):
      l_ref[:] = jnp.eye(block, dtype=jnp.float32)
      w_ref[:] = jnp.eye(block, dtype=jnp.float32)
    else:
      d0 = halfbuf[pl.ds(loc0, block), :]
      _stacked_sweep(d0, block, mb, row_idx_s, l_ref, w_ref,
                     wstore=wstore)

    if mode != 'nobelow':
      below = jax.lax.dot_general(
          halfbuf[:], w_ref[:], wdims,
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
      cp = pltpu.make_async_copy(
          a_hbm.at[pl.ds(row0, half), pl.ds(col0, block)], halfbuf,
          sem_a)
      cp.start()
      cp.wait()
      corrections(j, row0, skip_dead=False)
      if mode != 'nobelow':
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

  jax.lax.fori_loop(0, nb, panel_step, 0)


@functools.partial(jax.jit, static_argnames=('block', 'chunk', 'tw',
                                             'half', 'mode', 'wstore',
                                             'interpret'))
def cholesky_hbm_halfwide(a: jnp.ndarray, block: int = 256,
                          chunk: int = 512, tw: int = 1024,
                          half: int = 2048, mode: str = 'full',
                          wstore: str = 'linvT',
                          interpret: bool = False) -> jnp.ndarray:
  """v8 factorization: half-height panels, wide strips, stacked sweep.

  VMEM: half*block + 2*chunk*tw + block*tw + 2*block*block floats
  (7.5 MB at the defaults) — must stay under the remote toolchain's
  ~9.3 MB scratch ceiling (measured round 2).
  """
  n = a.shape[-1]
  half = min(half, n)
  chunk = min(chunk, half)
  tw = min(tw, n)
  assert (n % block == 0 and n % half == 0 and half % chunk == 0 and
          tw % block == 0 and n % tw == 0 and half % block == 0), (
              n, block, chunk, tw, half)
  assert mode in ('full', 'nosweep', 'dmaonly', 'nobelow', 'skeleton',
                  'zero_only', 'belowtest10', 'belowtest11',
                  'belowtest_mask', 'belowtest_splice'), mode
  assert wstore in ('linvT', 'linv'), wstore
  kernel = functools.partial(_kernel_halfwide, n, block, chunk, tw, half,
                             mode, wstore)
  return pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((half, block), jnp.float32),       # halfbuf
          pltpu.VMEM((2, chunk, tw), jnp.float32),      # lbuf x2
          pltpu.VMEM((block, tw), jnp.float32),         # strip
          pltpu.VMEM((block, block), jnp.float32),      # l_ref
          pltpu.VMEM((block, block), jnp.float32),      # w_ref
          pltpu.SemaphoreType.DMA,                      # sem_a
          pltpu.SemaphoreType.DMA((2,)),                # sem_l
          pltpu.SemaphoreType.DMA,                      # sem_s
          pltpu.SemaphoreType.DMA,                      # sem_out
      ],
      compiler_params=pallas_params.compiler_params(has_side_effects=True),
      interpret=interpret,
  )(a.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('block', 'chunk', 'tw',
                                             'mode', 'interpret'))
def cholesky_hbm_wide(a: jnp.ndarray, block: int = 256,
                      chunk: int = 512, tw: int = 512,
                      mode: str = 'full',
                      interpret: bool = False) -> jnp.ndarray:
  """v7 factorization: wide-strip corrections, dual-buffered chunk DMAs.

  VMEM budget: n*block (panel) + 2*chunk*tw (lbuf) + block*tw (strip)
  + block*block (l_ref) floats — keep under ~10.5 MB.
  """
  n = a.shape[-1]
  chunk = min(chunk, n)
  assert n % block == 0 and n % chunk == 0 and tw % block == 0 and (
      n % tw == 0), (n, block, chunk, tw)
  assert mode in ('full', 'nosweep', 'nocorr', 'dmaonly'), mode
  kernel = functools.partial(_kernel_wide, n, block, chunk, tw, mode)
  return pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((n, block), jnp.float32),          # panel
          pltpu.VMEM((2, chunk, tw), jnp.float32),      # lbuf x2
          pltpu.VMEM((block, tw), jnp.float32),         # strip
          pltpu.VMEM((block, block), jnp.float32),      # l_ref
          pltpu.SemaphoreType.DMA,                      # sem_a
          pltpu.SemaphoreType.DMA((2,)),                # sem_l
          pltpu.SemaphoreType.DMA,                      # sem_s
          pltpu.SemaphoreType.DMA,                      # sem_out
      ],
      compiler_params=pallas_params.compiler_params(has_side_effects=True),
      interpret=interpret,
  )(a.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('block', 'chunk', 'half',
                                             'interpret'))
def cholesky_hbm_halves(a: jnp.ndarray, block: int = 256,
                        chunk: int = 2048, half: int = 4096,
                        interpret: bool = False) -> jnp.ndarray:
  """v6 factorization: half-height panels, dual-buffered corrections."""
  n = a.shape[-1]
  half = min(half, n)
  chunk = min(chunk, half)
  assert n % block == 0 and n % half == 0 and half % chunk == 0, (
      n, block, chunk, half)
  kernel = functools.partial(_kernel_halves, n, block, chunk, half)
  return pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((half, block), jnp.float32),       # halfbuf
          pltpu.VMEM((2, chunk, block), jnp.float32),   # lbuf x2
          pltpu.VMEM((block, block), jnp.float32),      # strip
          pltpu.VMEM((block, block), jnp.float32),      # l_ref
          pltpu.VMEM((block, block), jnp.float32),      # w_ref
          pltpu.SemaphoreType.DMA,                      # sem_a
          pltpu.SemaphoreType.DMA((2,)),                # sem_l
          pltpu.SemaphoreType.DMA,                      # sem_s
          pltpu.SemaphoreType.DMA,                      # sem_out
      ],
      compiler_params=pallas_params.compiler_params(has_side_effects=True),
      interpret=interpret,
  )(a.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('block', 'chunk',
                                             'interpret'))
def cholesky_hbm(a: jnp.ndarray, block: int = 256,
                 chunk: int = 512,
                 interpret: bool = False) -> jnp.ndarray:
  """Lower Cholesky factor of SPD `a` (n x n; n % block == 0,
  n % chunk == 0, chunk % block == 0 recommended)."""
  n = a.shape[-1]
  chunk = min(chunk, n)
  assert n % block == 0 and n % chunk == 0, (n, block, chunk)
  kernel = functools.partial(_kernel, n, block, chunk)
  return pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((n, block), jnp.float32),         # panel
          pltpu.VMEM((chunk, block), jnp.float32),     # lbuf
          pltpu.VMEM((block, block), jnp.float32),     # strip
          pltpu.VMEM((block, block), jnp.float32),     # l_ref
          pltpu.SemaphoreType.DMA,                     # sem_a
          pltpu.SemaphoreType.DMA,                     # sem_l
          pltpu.SemaphoreType.DMA,                     # sem_s
          pltpu.SemaphoreType.DMA,                     # sem_out
      ],
      compiler_params=pallas_params.compiler_params(has_side_effects=True),
      interpret=interpret,
  )(a.astype(jnp.float32))


def _sweep_fori(read_top, block, mb, lane_idx, lt_ref, wt_ref, wt_off,
                top_ref, bot_ref, precise=False, unroll=2,
                values=False, skip_writes=False, const_pivot=False,
                pivot_mode='scalar'):
  """Transposed fori-loop sweep: lt_ref rows = L columns; W rows are
  written into wt_ref at row offset wt_off.

  Same [D; I] stacked algebra as _split_sweep, but the per-column steps
  run in a lax.fori_loop with DYNAMIC k: rows are written at dynamic
  SUBLANE offsets (well-supported) and the per-step scalar pivot is
  extracted with a one-hot lane reduction.

  `read_top(c0)` returns rows [c0, c0+mb) of the SYMMETRIC diagonal
  block (callers read them straight out of the working buffer): row
  reads replace the (B, B) d0 materialization + transpose, which
  dominated the sweep cost on hardware (~50 us per block for the
  transpose alone vs ~15 us for all 256 elimination steps; round 2).

  Narrowed vector work (round 3, STATIC path only): the top (L) path
  only ever has nonzeros at lanes >= c0 and the bot (W = L^{-1}) path
  at lanes < c0 + mb, so heavy (mb, *) ops run on the active lane
  window rounded to the 128-lane tile, and the skipped lanes hold
  EXACT zeros (both refs are zeroed up front) instead of elimination
  residue. Hardware status (round 3): compiles and gives exact values
  at unroll >= mb (all-static slices); the fori path with dynamic-row
  + lane-offset slices CRASHES the remote Mosaic compile-helper
  (HTTP 500), so narrowing is gated to the static path. Measured
  effect ~neutral at B=256 (the sweep is vreg-issue/latency-bound and
  Mosaic keeps the 256-lane layout), kept for the exact zeros.
  """
  narrow = unroll >= mb
  lt_ref[:] = jnp.zeros((block, block), jnp.float32)
  wt_ref[wt_off:wt_off + block, :] = jnp.zeros((block, block),
                                               jnp.float32)

  def lane_al_down(v):
    return (v // 128) * 128 if narrow else 0

  def lane_al_up(v):
    return min(block, -(-v // 128) * 128) if narrow else block

  for c0 in range(0, block, mb):
    t0 = lane_al_down(c0)            # top active lanes [t0, block)
    b1 = lane_al_up(c0 + mb)         # bot active lanes [0, b1)
    top = read_top(c0)[:, t0:block]
    # Identity rows built in place (no (B, B) eye live across the call).
    bot = (jax.lax.broadcasted_iota(jnp.int32, (mb, b1), 1) ==
           jax.lax.broadcasted_iota(jnp.int32, (mb, b1), 0) + c0
           ).astype(jnp.float32)
    if c0 > 0:
      # Measured note: batching these two seed corrections into one
      # (c0, 2B) dot is slightly SLOWER on v5e (8.92 vs 8.64 ms/iter
      # end-to-end) — the concat relayout costs more than the saved
      # dot issue.
      seed = lt_ref[0:c0, c0:c0 + mb]      # (c0, mb) static slice
      top = top - _pdot(seed, lt_ref[0:c0, t0:block],
                        (((0,), (0,)), ((), ())), precise)
      bot = bot - _pdot(seed,
                        wt_ref[wt_off:wt_off + c0, 0:b1],
                        (((0,), (0,)), ((), ())), precise)
    if not (values and unroll >= mb):
      top_ref[:, t0:block] = top
      bot_ref[:, 0:b1] = bot

    # Inner steps: per-substep VECTOR work is the cost unit (round-3
    # ladder: unroll 2 -> 32 moved 8.69 -> 8.54 ms only), so ops run on
    # the narrowed windows; `unroll` columns per fori iteration, and
    # unroll >= mb drops the fori entirely (all-static slices).
    def substep(k):
      kl = k - c0
      trow = top_ref[pl.ds(kl, 1), t0:block]           # (1, wtop)
      brow = bot_ref[pl.ds(kl, 1), 0:b1]               # (1, wbot)
      akk = jnp.sum(jnp.where(lane_idx[:, t0:block] == k, trow, 0.0))
      inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
      lrow = trow * inv_d
      wrow = brow * inv_d
      lt_ref[pl.ds(k, 1), t0:block] = lrow
      wt_ref[pl.ds(wt_off + k, 1), 0:b1] = wrow
      seg = lrow[0:1, c0 - t0:c0 - t0 + mb].T          # (mb, 1)
      top_ref[:, t0:block] = top_ref[:, t0:block] - seg * lrow
      bot_ref[:, 0:b1] = bot_ref[:, 0:b1] - seg * wrow

    if values and unroll >= mb:
      # VALUE-carried micro-block (round-3 probe 3: the sweep is
      # latency-bound on the serial VMEM read-modify-write chain, not
      # on op width or loop overhead). top/bot live in vregs across
      # all mb substeps — (mb, B) = 8 vregs each at B=256 — and VMEM
      # is touched only for the lt/wt row writes, which do not feed
      # the elimination chain.
      tv = top
      bv = bot
      lane_w = lane_idx[:, t0:block]
      # 'scalar'/'pair' extract to sregs; every other mode keeps pivots
      # in the (1, 1)-vector domain (no scalar-unit round-trips — the
      # reduce -> sreg rsqrt -> broadcast chain measured 183 ns/column,
      # probe sweepnp).
      keep = pivot_mode not in ('scalar', 'pair')

      def extract(row, k):
        m = jnp.where(lane_w == k, row, 0.0)
        return (jnp.sum(m, axis=1, keepdims=True) if keep
                else jnp.sum(m))

      p = {'pair': 2, 'pairv': 2, 'quadv': 4, 'octv': 8,
           'hexv': 16}.get(pivot_mode)
      if p is not None and not const_pivot:
        # p-wide pivot-block elimination: p(p+1)/2 INDEPENDENT
        # extractions from pre-update rows (they pipeline instead of
        # serializing), an unrolled Cholesky-p (p rsqrt chain levels
        # for p columns — the serial pivot chain shrinks by p vs
        # column-at-a-time), one rank-p update pass. Measured (round 3,
        # n=8192): scalar 8.03 -> vector 7.26 -> pairv 6.36 ->
        # quadv 5.58 -> octv 5.25 ms/iter (hexv plateaus at 5.22).
        while p > 1 and mb % p:   # clamp for small/odd micro-blocks
          p //= 2
        for kl in range(0, mb, p):
          k = c0 + kl
          tr = [tv[kl + i:kl + i + 1, :] for i in range(p)]
          br = [bv[kl + i:kl + i + 1, :] for i in range(p)]
          a = {(i, j): extract(tr[i], k + j)
               for i in range(p) for j in range(i + 1)}
          lsc = {}
          inv = []
          for i in range(p):
            dii = a[i, i]
            for m in range(i):
              dii = dii - lsc[i, m] * lsc[i, m]
            inv.append(jax.lax.rsqrt(jnp.maximum(dii, 1e-30)))
            for j in range(i + 1, p):
              off = a[j, i]
              for m in range(i):
                off = off - lsc[j, m] * lsc[i, m]
              lsc[j, i] = off * inv[i]
          lrows = []
          wrows = []
          for i in range(p):
            lr = tr[i]
            wr = br[i]
            for m in range(i):
              lr = lr - lsc[i, m] * lrows[m]
              wr = wr - lsc[i, m] * wrows[m]
            lrows.append(lr * inv[i])
            wrows.append(wr * inv[i])
          if not skip_writes:
            for i in range(p):
              lt_ref[pl.ds(k + i, 1), t0:block] = lrows[i]
              wt_ref[pl.ds(wt_off + k + i, 1), 0:b1] = wrows[i]
          segs = [lr[0:1, c0 - t0:c0 - t0 + mb].T for lr in lrows]
          dt = segs[0] * lrows[0]
          db = segs[0] * wrows[0]
          for i in range(1, p):
            dt = dt + segs[i] * lrows[i]
            db = db + segs[i] * wrows[i]
          tv = tv - dt
          bv = bv - db
      else:
        for kl in range(mb):
          k = c0 + kl
          trow = tv[kl:kl + 1, :]
          if const_pivot:     # probe mode: no pivot reduce / rsqrt
            inv_d = 1.0
          else:
            inv_d = jax.lax.rsqrt(jnp.maximum(extract(trow, k), 1e-30))
          lrow = trow * inv_d
          wrow = bv[kl:kl + 1, :] * inv_d
          if not skip_writes:  # probe mode: no lt/wt row stores
            lt_ref[pl.ds(k, 1), t0:block] = lrow
            wt_ref[pl.ds(wt_off + k, 1), 0:b1] = wrow
          seg = lrow[0:1, c0 - t0:c0 - t0 + mb].T
          tv = tv - seg * lrow
          bv = bv - seg * wrow
      if skip_writes:
        # Probe mode: one anchor store per micro-block so the value
        # chain cannot be dead-code-eliminated (the round-2 isolated-
        # probe trap) while per-substep stores stay off the timeline.
        lt_ref[c0:c0 + mb, t0:block] = tv
        wt_ref[wt_off + c0:wt_off + c0 + mb, 0:b1] = bv
    elif unroll >= mb:
      for kl in range(mb):
        substep(c0 + kl)
    else:
      assert mb % unroll == 0, (mb, unroll)

      def step(i, _):
        k = c0 + unroll * i
        for u in range(unroll):
          substep(k + u)
        return 0

      jax.lax.fori_loop(0, mb // unroll, step, 0)
