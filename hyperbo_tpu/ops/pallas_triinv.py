"""Panel-major blocked triangular inverse (Pallas/Mosaic).

T = L^{-1} for lower-triangular L, written directly in the panel-major
(nb, n, B) layout that the fused NLL backward (ops/pallas_mll_bwd)
consumes — replacing BOTH the XLA-level blocked recursion
(ops/linalg.tri_inv_blocked) and the (n, n) -> (nb, n, B) moveaxis
transpose pass. At n=16384 the recursion costs ~107 ms inside the
fused value_and_grad (O(n^3) scaling of its 14.7 ms at n=8192,
PERF.md r6_vg16k_probe) — the dominant share of the 181 ms step.

Algorithm (block forward substitution, panel j = block column j):

  T_jj = D_j := L_jj^{-1}          (precomputed OUTSIDE, batched)
  T_ij = -D_i (sum_{k=j}^{i-1} L_ik T_kj)      for i > j

Per (i, j) step the accumulation streams fixed-size chunks of the L
row strip L[iB:(i+1)B, jB:iB) and the already-computed panel rows
T[jB:iB, j] through double-buffered VMEM, contracted on the MXU. Three
structural tricks make every DMA a full static-shape chunk with NO
masking anywhere:

  * the output buffer is zero-filled first, so chunk reads that
    overshoot past row iB (the not-yet-computed region) or undershoot
    above the panel top jB (rows of panel j above jB stay zero
    forever) contribute exact zeros — L's values in the matching
    columns multiply those zero rows and drop out;
  * chunks therefore sit on a fixed chunk-aligned grid (aligned DMA
    offsets; no masking, no partial chunks);
  * the diagonal-block inverses D arrive precomputed (one batched XLA
    triangular solve over the (nb, B, B) diagonal — O(n B^2)).

Work is n^3/6 MACs (the triangular minimum). Panels are INDEPENDENT
chains, which the kernel exploits by sweeping G panels per pass
(GROUP, default 4): per row-block i ONE L row-strip stream is shared
by the G panel dots, cutting HBM traffic from (MACs/B)*8 bytes to
(MACs/B)*8*(1+G)/(2G) and amortizing the per-step latency (diag-block
load, output-write drain) over G blocks. At B=256/G=1 the kernel sat
exactly at the compute/DMA balance point (1 MB streamed per 67 useful
MFLOP — measured ~40% of the chol kernel's rate, PERF.md r7); G=4
moves it compute-bound. The extra all-zero strip rows a grouped pass
reads for panels above their top cost 1.5(G-1)/nb of the MACs (7% at
n=16384) — accepted for DMA-grid simplicity.

`panel_input=True` takes L in the SAME panel-major (nb, n, B) layout
the output uses (the fused forward kernel materializes L that way
anyway): every L read then becomes a contiguous (B, B) panel-block
copy instead of a B-row strided window into dense L (256 separate
4 KB bursts per strip chunk). The strided window was the r9-measured
per-chunk-step overhead: the kernels sharing this file's traffic
profile but reading only contiguous panels (the chol forward, the
SYRK backward) run at ~70-73%% of peak while the dense-L sweep sat at
34-37%%. The T-strip reads are panel-major (contiguous) in EVERY
mode, so only the L copies change. Two layouts (`panel_layout`):

  * 'wide' — the cpb panel blocks DMA side-by-side into static
    lane-offset windows of the SAME (B, chunk) row buffer the dense
    path uses; the MXU compute is bit-identical to the dense path
    (wide (B, chunk) x (chunk, B) dots).
  * 'blocks' — panel blocks land in fully-indexed (cpb, B, B)
    scratch and contract per-kk with (B, B) dots. Mosaic REJECTS a
    single multi-contraction dot_general over (kk, k) ("lhs
    contracting dims must be of size 1", r11 probe), so the chunk
    accumulation runs as cpb separate MXU issues. Hedge for the
    'wide' layout's lane-window DMA destinations, which are the
    other toolchain-risk construct.

Used by ops/pallas_mll._se_core_bwd (custom-VJP of the fused MLL;
gradient semantics anchor: the reference differentiates this
objective per pre-training step, /root/reference/hyperbo/gp_utils/
gp.py:124-146, with the cached-Cholesky VJP pattern of
/root/reference/hyperbo/basics/linalg.py:139-171).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperbo_tpu.ops import pallas_params
from hyperbo_tpu.ops.pallas_chol_hbm import _pdot

BLOCK = 256
CHUNK = 512
GROUP = 4

_MDIMS = (((1,), (0,)), ((), ()))       # a @ b

# Kernel layout modes (`lpm` kernel arg): 0 = dense (n, n) L input;
# 1 = panel-major L, 'blocks' layout; 2 = panel-major L, 'wide' layout
# (see module docstring — Mosaic rejects multi-contraction dot_general,
# so mode 1 contracts per-kk and mode 2 keeps the dense wide dots).
_LPM_DENSE, _LPM_BLOCKS, _LPM_WIDE = 0, 1, 2


def _kernel_triinv(n, block, chunk, group, precise, lpm,
                   l_hbm, dinv_hbm,
                   tpm_hbm,
                   lrow, tstrip, dbuf, zbuf, obuf,
                   sem_l, sem_t, sem_d, sem_w, sem_z):
  nb = n // block
  ncz = n // chunk
  G = group
  cpb = chunk // block

  # ---- phase 0: zero-fill the whole output (see module docstring) ----
  zbuf[:] = jnp.zeros((chunk, block), jnp.float32)

  def zero_step(c, _):
    p = jax.lax.div(c, ncz)
    r = jax.lax.rem(c, ncz) * chunk
    slot = jax.lax.rem(c, 2)
    cp = pltpu.make_async_copy(
        zbuf, tpm_hbm.at[p, pl.ds(r, chunk), :], sem_z.at[slot])

    @pl.when(c >= 2)
    def _():
      cp.wait()           # free this slot's previous in-flight write
    cp.start()
    return 0

  jax.lax.fori_loop(0, nb * ncz, zero_step, 0)
  # drain the last two in-flight zero writes
  pltpu.make_async_copy(zbuf, tpm_hbm.at[nb - 1, pl.ds(n - chunk, chunk), :],
                        sem_z.at[jax.lax.rem(nb * ncz, 2)]).wait()
  pltpu.make_async_copy(zbuf, tpm_hbm.at[nb - 1, pl.ds(n - chunk, chunk), :],
                        sem_z.at[jax.lax.rem(nb * ncz + 1, 2)]).wait()

  # ---- phase 1: diagonal blocks T_pp = D_p (via VMEM bounce) ----
  def diag_step(p, _):
    cin = pltpu.make_async_copy(dinv_hbm.at[p], dbuf, sem_d)
    cin.start()
    cin.wait()
    co = pltpu.make_async_copy(
        dbuf, tpm_hbm.at[p, pl.ds(p * block, block), :], sem_w.at[0])
    co.start()
    co.wait()
    return 0

  jax.lax.fori_loop(0, nb, diag_step, 0)

  # ---- phase 2: the grouped panel sweep ----
  def chunk_copies(i, c0, j0, c, slot):
    ib = pl.multiple_of(i * block, block)
    r0 = (c0 + c) * chunk
    if lpm:
      # Panel-major L: the strip's chunk columns are cpb contiguous
      # (B, B) panel blocks; rows at/right of the diagonal read zeros
      # (fwd zero-pass) or the transposed diag block — both finite and
      # multiplied by zero T rows (see module docstring). 'wide' lands
      # them side-by-side in the dense path's (B, chunk) buffer;
      # 'blocks' in fully-indexed (cpb, B, B) scratch.
      q0 = (c0 + c) * cpb
      if lpm == _LPM_WIDE:
        cl = [pltpu.make_async_copy(
            l_hbm.at[q0 + kk, pl.ds(ib, block), :],
            lrow.at[slot, :, pl.ds(kk * block, block)],
            sem_l.at[slot * cpb + kk]) for kk in range(cpb)]
      else:
        cl = [pltpu.make_async_copy(
            l_hbm.at[q0 + kk, pl.ds(ib, block), :], lrow.at[slot, kk],
            sem_l.at[slot * cpb + kk]) for kk in range(cpb)]
    else:
      cl = [pltpu.make_async_copy(
          l_hbm.at[pl.ds(ib, block), pl.ds(r0, chunk)], lrow.at[slot],
          sem_l.at[slot])]
    # T panels are panel-major in every mode: the strip read is already
    # one contiguous (chunk, B) block.
    cts = [pltpu.make_async_copy(
        tpm_hbm.at[j0 + g, pl.ds(r0, chunk), :], tstrip.at[slot, g],
        sem_t.at[slot * G + g]) for g in range(G)]
    return cl, cts

  def jg_loop(jg, _):
    j0 = jg * G
    # chunk-grid index of the GROUP top (floored — undershoot rows are
    # zero in every group panel and never written; panels g > 0 read
    # g*block extra zero rows, see module docstring)
    c0 = jax.lax.div(j0 * block, chunk)

    def i_loop(i, _):
      ib = pl.multiple_of(i * block, block)
      cd = pltpu.make_async_copy(dinv_hbm.at[i], dbuf, sem_d)
      cd.start()
      # chunks cover rows [c0*chunk, cend*chunk) >= [j0*B, iB); the
      # overshoot rows [iB, cend*chunk) are still zero at read time
      nch = jax.lax.div(i * block - 1, chunk) + 1 - c0
      cl0, cts0 = chunk_copies(i, c0, j0, 0, 0)
      for cp in cl0 + cts0:
        cp.start()

      def k_step(c, accs):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
          nslot = jax.lax.rem(c + 1, 2)
          cl, cts = chunk_copies(i, c0, j0, c + 1, nslot)
          for cp in cl + cts:
            cp.start()

        cl, cts = chunk_copies(i, c0, j0, c, slot)
        for cp in cl + cts:
          cp.wait()
        if lpm == _LPM_BLOCKS:
          # Per-kk (B, B) dots — Mosaic has no multi-contraction
          # dot_general, so the chunk accumulates over cpb MXU issues.
          out = []
          for g in range(G):
            t = tstrip[slot, g]
            acc = accs[g]
            for kk in range(cpb):
              acc = acc + _pdot(lrow[slot, kk],
                                t[kk * block:(kk + 1) * block, :],
                                _MDIMS, precise)
            out.append(acc)
          return tuple(out)
        return tuple(
            accs[g] + _pdot(lrow[slot], tstrip[slot, g], _MDIMS,
                            precise)
            for g in range(G))

      accs = jax.lax.fori_loop(
          0, nch, k_step,
          tuple(jnp.zeros((block, block), jnp.float32)
                for _ in range(G)))
      cd.wait()
      # Guard i > j0 + g: block rows on/above panel g's diagonal block
      # belong to phase 1 (the diagonal) or stay zero (above it) — the
      # guarded-out accs are all-zero-row products anyway.
      for g in range(G):
        @pl.when(i > j0 + g)
        def _(g=g):
          obuf[g] = -_pdot(dbuf[:], accs[g], _MDIMS, precise)
          pltpu.make_async_copy(
              obuf.at[g], tpm_hbm.at[j0 + g, pl.ds(ib, block), :],
              sem_w.at[g]).start()
      # Drain before the next i: its tstrip chunks may cover these rows.
      for g in range(G):
        @pl.when(i > j0 + g)
        def _(g=g):
          pltpu.make_async_copy(
              obuf.at[g], tpm_hbm.at[j0 + g, pl.ds(ib, block), :],
              sem_w.at[g]).wait()
      return 0

    jax.lax.fori_loop(j0 + 1, nb, i_loop, 0)
    return 0

  jax.lax.fori_loop(0, nb // G, jg_loop, 0)


def _kernel_triinv_tiled(n, block, chunk, ig, jg, precise, lpm,
                         l_hbm, dinv_hbm,
                         tpm_hbm,
                         lrow, tstrip, accbuf, ttile, lc, dbuf, zbuf,
                         sem_l, sem_t, sem_d, sem_lc, sem_w, sem_z,
                         jg_hook=None, block_hook=None):
  """Two-dimensional tiled panel sweep: IG row-blocks x JG panels.

  The 1-D grouped sweep (_kernel_triinv) re-streams panel strip rows
  for EVERY row-block i; tiling IG row-blocks per pass shares each
  T-strip chunk across IG L-row chunks, cutting strip traffic IG-fold
  (and L traffic JG-fold as before: (IG+JG)/(2*IG*JG) of the
  ungrouped bytes per MAC) while issuing IG*JG MXU dots per chunk
  step — the per-issue scalar-core overhead the r8 ladder exposed
  amortizes with the tile area. The intra-tile dependency (row i needs
  rows [i0, i) of its panels) resolves in a sequential VMEM corner:
  phase A streams all strip contributions below the tile top, phase B
  finishes each row from the in-VMEM tile (corner L blocks and the
  already-finished tile rows), placing diagonal-block inverses
  in-tile — no separate diagonal pass.

  `jg_hook(j0)` / `block_hook(i0, j0, ii, g)` let a caller embedding
  this body in a larger kernel (ops/pallas_bwd_joint) piggyback work on
  the sweep: jg_hook runs at the top of each panel-group pass,
  block_hook right after `ttile[ii, g]` holds the FINAL value of T
  block (row-block i0+ii, panel j0+g) — including diagonal (D_i) and
  above-diagonal (zero) blocks.
  """
  nb = n // block
  ncz = n // chunk
  cpb = chunk // block

  # ---- phase 0: zero-fill the whole output (see module docstring) ----
  zbuf[:] = jnp.zeros((chunk, block), jnp.float32)

  def zero_step(c, _):
    p = jax.lax.div(c, ncz)
    r = jax.lax.rem(c, ncz) * chunk
    slot = jax.lax.rem(c, 2)
    cp = pltpu.make_async_copy(
        zbuf, tpm_hbm.at[p, pl.ds(r, chunk), :], sem_z.at[slot])

    @pl.when(c >= 2)
    def _():
      cp.wait()           # free this slot's previous in-flight write
    cp.start()
    return 0

  jax.lax.fori_loop(0, nb * ncz, zero_step, 0)
  pltpu.make_async_copy(zbuf, tpm_hbm.at[nb - 1, pl.ds(n - chunk, chunk), :],
                        sem_z.at[jax.lax.rem(nb * ncz, 2)]).wait()
  pltpu.make_async_copy(zbuf, tpm_hbm.at[nb - 1, pl.ds(n - chunk, chunk), :],
                        sem_z.at[jax.lax.rem(nb * ncz + 1, 2)]).wait()

  # ---- the tile sweep ----
  def chunk_copies(i0, c0, j0, c, slot):
    r0 = (c0 + c) * chunk
    if lpm:
      # Panel-major L: contiguous (B, B) panel-block sources. 'wide'
      # reassembles the dense path's (B, chunk) row buffers via static
      # lane-offset windows; 'blocks' uses fully-indexed scratch.
      q0 = (c0 + c) * cpb
      if lpm == _LPM_WIDE:
        cls = [pltpu.make_async_copy(
            l_hbm.at[q0 + kk, pl.ds((i0 + ii) * block, block), :],
            lrow.at[slot, ii, :, pl.ds(kk * block, block)],
            sem_l.at[(slot * ig + ii) * cpb + kk])
            for ii in range(ig) for kk in range(cpb)]
      else:
        cls = [pltpu.make_async_copy(
            l_hbm.at[q0 + kk, pl.ds((i0 + ii) * block, block), :],
            lrow.at[slot, ii, kk],
            sem_l.at[(slot * ig + ii) * cpb + kk])
            for ii in range(ig) for kk in range(cpb)]
    else:
      cls = [pltpu.make_async_copy(
          l_hbm.at[pl.ds((i0 + ii) * block, block), pl.ds(r0, chunk)],
          lrow.at[slot, ii], sem_l.at[slot * ig + ii])
          for ii in range(ig)]
    cts = [pltpu.make_async_copy(
        tpm_hbm.at[j0 + g, pl.ds(r0, chunk), :], tstrip.at[slot, g],
        sem_t.at[slot * jg + g]) for g in range(jg)]
    return cls, cts

  def jg_loop(jgi, _):
    j0 = jgi * jg
    c0 = jax.lax.div(j0 * block, chunk)
    ti0 = jax.lax.div(j0, ig)   # first tile touching the group
    if jg_hook is not None:
      jg_hook(j0)

    def tile_loop(ti, _):
      i0 = ti * ig

      def corner_copy(ii, kk):
        # Panel-major L reads the corner block from panel i0+kk — one
        # contiguous (B, B) block either way.
        src = (l_hbm.at[i0 + kk, pl.ds((i0 + ii) * block, block), :]
               if lpm else
               l_hbm.at[pl.ds((i0 + ii) * block, block),
                        pl.ds((i0 + kk) * block, block)])
        return pltpu.make_async_copy(src, lc.at[ii, kk],
                                     sem_lc.at[ii * ig + kk])

      # Prefetch the tile's diagonal inverses and corner L blocks —
      # they overlap the whole of phase A.
      for ii in range(ig):
        pltpu.make_async_copy(dinv_hbm.at[i0 + ii], dbuf.at[ii],
                              sem_d.at[ii]).start()
      for ii in range(ig):
        for kk in range(ii):
          corner_copy(ii, kk).start()

      # ---- phase A: stream strip rows [c0*chunk, i0*block) ----
      accbuf[...] = jnp.zeros((ig, jg, block, block), jnp.float32)
      nch = jnp.where(i0 * block > c0 * chunk,
                      jax.lax.div(i0 * block - 1, chunk) + 1 - c0, 0)

      @pl.when(nch > 0)
      def _():
        cls0, cts0 = chunk_copies(i0, c0, j0, 0, 0)
        for cp in cls0 + cts0:
          cp.start()

      def k_step(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
          nslot = jax.lax.rem(c + 1, 2)
          cls, cts = chunk_copies(i0, c0, j0, c + 1, nslot)
          for cp in cls + cts:
            cp.start()

        cls, cts = chunk_copies(i0, c0, j0, c, slot)
        for cp in cls + cts:
          cp.wait()
        if lpm == _LPM_BLOCKS:
          for ii in range(ig):
            for g in range(jg):
              t = tstrip[slot, g]
              acc = accbuf[ii, g]
              for kk in range(cpb):
                acc = acc + _pdot(lrow[slot, ii, kk],
                                  t[kk * block:(kk + 1) * block, :],
                                  _MDIMS, precise)
              accbuf[ii, g] = acc
        else:
          for ii in range(ig):
            for g in range(jg):
              accbuf[ii, g] = accbuf[ii, g] + _pdot(
                  lrow[slot, ii], tstrip[slot, g], _MDIMS, precise)
        return 0

      jax.lax.fori_loop(0, nch, k_step, 0)

      # ---- phase B: sequential in-VMEM corner ----
      for ii in range(ig):
        pltpu.make_async_copy(dinv_hbm.at[i0 + ii], dbuf.at[ii],
                              sem_d.at[ii]).wait()
        for kk in range(ii):
          corner_copy(ii, kk).wait()
        i = i0 + ii
        for g in range(jg):
          jv = j0 + g
          corner = accbuf[ii, g]
          for kk in range(ii):
            corner = corner + _pdot(lc[ii, kk], ttile[kk, g], _MDIMS,
                                    precise)
          val = -_pdot(dbuf[ii], corner, _MDIMS, precise)
          # Below the diagonal: the computed block. On it: D_i (the
          # precomputed inverse). Above: zero (phase 0's fill is the
          # persistent truth in HBM; the in-VMEM tile needs the zeros
          # for later rows' corner products).
          ttile[ii, g] = jnp.where(
              i > jv, val,
              jnp.where(i == jv, dbuf[ii],
                        jnp.zeros((block, block), jnp.float32)))
          if block_hook is not None:
            block_hook(i0, j0, ii, g)

          @pl.when(i >= jv)
          def _(ii=ii, g=g):
            pltpu.make_async_copy(
                ttile.at[ii, g],
                tpm_hbm.at[j0 + g, pl.ds((i0 + ii) * block, block), :],
                sem_w.at[ii * jg + g]).start()

      # Drain the tile's writes: the NEXT tile's phase A strips (and
      # every later tile) read these rows.
      for ii in range(ig):
        for g in range(jg):
          @pl.when(i0 + ii >= j0 + g)
          def _(ii=ii, g=g):
            pltpu.make_async_copy(
                ttile.at[ii, g],
                tpm_hbm.at[j0 + g, pl.ds((i0 + ii) * block, block), :],
                sem_w.at[ii * jg + g]).wait()
      return 0

    jax.lax.fori_loop(ti0, nb // ig, tile_loop, 0)
    return 0

  jax.lax.fori_loop(0, nb // jg, jg_loop, 0)


@functools.partial(jax.jit,
                   static_argnames=('block', 'chunk', 'group', 'rows',
                                    'precise', 'panel_input',
                                    'diag_transposed', 'panel_layout',
                                    'interpret'))
def tri_inv_panels(l: jnp.ndarray,
                   block: int = BLOCK, chunk: int = CHUNK,
                   group: int = GROUP, rows: int = 1,
                   precise: bool = True,
                   panel_input: bool = False,
                   diag_transposed: bool = False,
                   panel_layout: str = 'wide',
                   interpret: bool = False) -> jnp.ndarray:
  """T = L^{-1} in panel-major (nb, n, block) layout.

  Args:
    l: (n, n) lower-triangular factor — or, with `panel_input`, the
      SAME factor already panel-major (nb, n, block), the layout the
      fused forward kernel writes (every in-kernel L read is then a
      contiguous panel-block DMA; see module docstring). Values on/
      above the diagonal are never allowed to influence the result,
      but they flow through multiply-by-zero — they must be FINITE
      (NaN poison in L propagates everywhere, which is the wanted
      behavior for the non-PD poison path of the fused MLL).
    block: panel width B (output lane width); n % block == 0.
    chunk: DMA chunk rows; chunk % block == 0 and n % chunk == 0.
    group: panels swept jointly per pass (shares the L row stream —
      see module docstring); auto-halved until it divides nb.
    rows: row-blocks swept jointly per pass; rows > 1 selects the
      two-dimensional tiled kernel (shares each T-strip chunk across
      the tile's rows, sequential in-VMEM corner); auto-halved until
      it divides nb.
    precise: X3 (3-pass split-operand) MXU products, matching the
      forward kernel's accuracy class; False = single-pass bf16.
    panel_input: `l` is panel-major (nb, n, block); requires
      l.shape[2] == block.
    diag_transposed: the diagonal (B, B) blocks of `l` hold D^T
      instead of D — the storage convention of the fused forward
      kernel's panel output (ops/pallas_mll.mll_fused_g return_l
      note). Only the batched diagonal-inverse solve looks at them
      (the sweep never reads on/above-diagonal blocks of L), so the
      fix is free.
    panel_layout: 'wide' or 'blocks' — how panel-input L blocks land
      in VMEM (module docstring). Ignored without panel_input.

  Returns:
    tpm: (nb, n, block) with tpm[p][r, c] = L^{-1}[r, p*block + c].
  """
  if panel_input:
    nb, n, bw = l.shape
    assert bw == block and n == nb * block, (l.shape, block)
  else:
    n = l.shape[-1]
    nb = n // block
  assert n % block == 0 and chunk % block == 0 and n % chunk == 0, (
      n, block, chunk)
  assert nb >= 2, 'use a direct solve below 2 blocks'
  group = max(1, group)
  while group > 1 and nb % group:
    group //= 2
  rows = max(1, rows)
  while rows > 1 and nb % rows:
    rows //= 2
  lf = l.astype(jnp.float32)
  cpb = chunk // block

  # Batched diagonal-block inverses (XLA): one batched solve over the
  # (nb, B, B) diagonal blocks — O(n B^2), negligible next to the sweep.
  dinv = diag_inverses(lf, block, panel_input, diag_transposed)

  lpm = _LPM_DENSE
  if panel_input:
    assert panel_layout in ('wide', 'blocks'), panel_layout
    lpm = _LPM_WIDE if panel_layout == 'wide' else _LPM_BLOCKS

  if rows > 1:
    ig, jg = rows, group
    kernel = functools.partial(_kernel_triinv_tiled, n, block, chunk,
                               ig, jg, precise, lpm)
    lrow_shape = ((2, ig, cpb, block, block) if lpm == _LPM_BLOCKS
                  else (2, ig, block, chunk))
    tpm = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # L dense|panels
            pl.BlockSpec(memory_space=pl.ANY),          # diag inverses
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),    # T panels
        out_shape=jax.ShapeDtypeStruct((nb, n, block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(lrow_shape, jnp.float32),              # L rows
            pltpu.VMEM((2, jg, chunk, block), jnp.float32),   # T strips
            pltpu.VMEM((ig, jg, block, block), jnp.float32),  # phase-A acc
            pltpu.VMEM((ig, jg, block, block), jnp.float32),  # out tile
            pltpu.VMEM((ig, ig, block, block), jnp.float32),  # corner L
            pltpu.VMEM((ig, block, block), jnp.float32),      # D_i
            pltpu.VMEM((chunk, block), jnp.float32),          # zero tile
            pltpu.SemaphoreType.DMA(
                (2 * cpb * ig if panel_input else 2 * ig,)),  # L sems
            pltpu.SemaphoreType.DMA((2 * jg,)),               # T sems
            pltpu.SemaphoreType.DMA((ig,)),                   # D sems
            pltpu.SemaphoreType.DMA((ig * ig,)),              # corner sems
            pltpu.SemaphoreType.DMA((ig * jg,)),              # write sems
            pltpu.SemaphoreType.DMA((2,)),                    # zero sems
        ],
        compiler_params=pallas_params.compiler_params(
            has_side_effects=True),
        interpret=interpret,
    )(lf, dinv)
    return tpm

  kernel = functools.partial(_kernel_triinv, n, block, chunk, group,
                             precise, lpm)
  lrow_shape = ((2, cpb, block, block) if lpm == _LPM_BLOCKS
                else (2, block, chunk))
  tpm = pl.pallas_call(
      kernel,
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),            # L dense|panels
          pl.BlockSpec(memory_space=pl.ANY),            # diag inverses
      ],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),      # T panels
      out_shape=jax.ShapeDtypeStruct((nb, n, block), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM(lrow_shape, jnp.float32),          # L row chunks
          pltpu.VMEM((2, group, chunk, block),
                     jnp.float32),                      # T panel chunks
          pltpu.VMEM((block, block), jnp.float32),      # D_i
          pltpu.VMEM((chunk, block), jnp.float32),      # zero tile
          pltpu.VMEM((group, block, block), jnp.float32),  # out blocks
          pltpu.SemaphoreType.DMA(
              (2 * cpb if panel_input else 2,)),        # L chunk sems
          pltpu.SemaphoreType.DMA((2 * group,)),        # T chunk sems
          pltpu.SemaphoreType.DMA,                      # D sem
          pltpu.SemaphoreType.DMA((group,)),            # write sems
          pltpu.SemaphoreType.DMA((2,)),                # zero-fill sems
      ],
      compiler_params=pallas_params.compiler_params(has_side_effects=True),
      interpret=interpret,
  )(lf, dinv)
  return tpm


def diag_inverses(lf: jnp.ndarray, block: int, panel_input: bool,
                  diag_transposed: bool) -> jnp.ndarray:
  """(nb, B, B) inverses of L's diagonal blocks — one batched XLA
  triangular solve, O(n B^2). Shared by tri_inv_panels and the joint
  backward kernel (ops/pallas_bwd_joint)."""
  nb = lf.shape[0] if panel_input else lf.shape[-1] // block
  idx = jnp.arange(nb)
  if panel_input:
    diag = lf.reshape(nb, nb, block, block)[idx, idx]
  else:
    diag = lf.reshape(nb, block, nb, block)[idx, :, idx, :]
  eye = jnp.broadcast_to(jnp.eye(block, dtype=jnp.float32), diag.shape)
  if diag_transposed:
    # Stored D^T (upper-triangular content): (D^T)^{-1} = (D^{-1})^T.
    return jnp.swapaxes(
        jax.lax.linalg.triangular_solve(diag, eye, left_side=True,
                                        lower=False), -1, -2)
  return jax.lax.linalg.triangular_solve(
      diag, eye, left_side=True, lower=True)


def alpha_from_panels(tpm: jnp.ndarray, delta: jnp.ndarray,
                      precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
  """alpha = K^{-1} delta = T^T (T delta) from panel-major T.

  Two O(n^2) batched products — no dense (n, n) reassembly.
  """
  nb, n, b = tpm.shape
  m = delta.shape[-1]
  dp = delta.astype(jnp.float32).reshape(nb, b, m)
  t = jnp.einsum('pnb,pbm->nm', tpm, dp, precision=precision)
  return jnp.einsum('pnb,nm->pbm', tpm, t,
                    precision=precision).reshape(n, m)
