"""Fused backward pass for the single-kernel GP NLL (Pallas/Mosaic).

The fused-MLL custom VJP (ops/pallas_mll._se_core_bwd) needs, from the
factor L the forward kernel already wrote:

  G  = dnll/dK = 0.5 (K^{-1} - alpha alpha^T),   alpha = K^{-1} delta
  d_sv ~ sum(G o K),   d_da = tr(G),
  d_x  = 2 [(W x) - (W 1) o x],   W = G o N(r2)   (N per kernel family)

The XLA chain materializes K^{-1} = T^T T (T = L^{-1}) as a full 2n^3
GEMM plus ~10 HBM passes of n^2 elementwise temporaries. This kernel
exploits two structural facts instead:

  * T is lower triangular, so block (i, j) of K^{-1} (i >= j) only sums
    panel rows k >= i*B: the triangular block-SYRK is n^3/3 MACs, and
    by symmetry only the lower block triangle is ever computed;
  * every consumer of K^{-1} is an elementwise-weighted reduction, so
    each (B, B) block is consumed IN VMEM the moment its accumulation
    finishes — K^{-1}, G and W never exist in HBM at all. The r2 tile
    regenerates from the same [-2x, sqn, 1] x [x, 1, sqn] embedding
    trick as the forward kernel, and one (B, B) @ (B, 128) product per
    side yields BOTH W @ x (lanes 0..d-1) and the row sums W @ 1
    (lane d) because the b-embedding carries a ones lane.

Inputs are panel-major T (nb, n, B) — the natural layout of
triangular_solve output after one transpose — and tile-major embedding
tiles; output is the (n, 128) P-accumulator (P = W x | W 1 lanes) plus
the d_sv / d_da scalars. The host wrapper assembles the final adjoints.

Reference semantics anchor: the gradient of the training objective at
hyperbo/gp_utils/gp.py:124-146 (value_and_grad of the NLL per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperbo_tpu.ops import pallas_params

from hyperbo_tpu.ops.pallas_chol_hbm import _pdot

_SQRT3 = 3.0 ** 0.5
_SQRT5 = 5.0 ** 0.5

# Production configuration (the shape _se_core_bwd dispatches) and the
# largest n this kernel serves: the (n, 128) f32 P-accumulator is
# n * 512 bytes (8 MB at n=16384, plus ~2.4 MB of strips/tiles —
# PERF.md round 4), and at n = 32768 the panel-major T tensor reaches
# 2^32 bytes, where Mosaic's int32 byte-offset arithmetic silently
# wraps (hardware-refuted, PERF.md r14). Beyond MAX_N the coarse
# two-level backward (ops/coarse_bwd) runs this kernel per <= MAX_N
# diagonal block — n=32768 value_and_grad at 1.01 s/step vs the dense
# chain's 9.04 s (PERF.md r17).
BLOCK = 256
CHUNK = 512
MAX_N = 16384


def _km_nm(sqd, sv, kfam):
  """(kmat, neg2kp) = (sv * k(r2), -2 sv dk/dr2) per kernel family.

  Same forms as the dense kernels (models/kernel.py), including the
  r^2 floor under the Matern sqrt: without it, reverse-mode autodiff
  through sqrt at r2 = 0 (duplicate input rows, or f32-cancellation
  zeros of the matmul distance form) yields 0 * inf = NaN cotangents
  that a downstream matmul spreads to every gradient. The floor's
  max() also zeroes the (undefined) derivative there — matching the
  true coincident-point limit of the Matern adjoint, which is 0.
  """
  r2 = jnp.maximum(sqd, 0.0)
  if kfam == 'se':
    km = sv * jnp.exp(-0.5 * r2)
    return km, km
  if kfam == 'matern32':
    r = _SQRT3 * jnp.sqrt(jnp.maximum(r2, 1e-36))
    e = jnp.exp(-r)
    return sv * (1.0 + r) * e, 3.0 * sv * e
  if kfam == 'matern52':
    r = _SQRT5 * jnp.sqrt(jnp.maximum(r2, 1e-36))
    e = jnp.exp(-r)
    return (sv * (1.0 + r + (r * r) * (1.0 / 3.0)) * e,
            (5.0 / 3.0) * sv * (1.0 + r) * e)
  raise ValueError(f'unknown fused kernel family: {kfam!r}')


def _kernel_bwd(n, block, chunk, precise, kfam, masked,
                tpm_hbm, xa_hbm, xb_hbm, arow_ref, acol_ref,
                vrow_ref, vcol_ref, sv_ref,
                pacc_hbm, dsv_ref, dda_ref,
                ci, cj, xai, xbi, xbj, pacc, sem_c, sem_x, sem_out):
  """One sequential pass over the lower block triangle of K^{-1}."""
  nb = n // block
  wdims = (((1,), (1,)), ((), ()))       # a @ b^T (contract lanes)
  rdims = (((0,), (0,)), ((), ()))       # a^T @ b (contract sublanes)
  mdims = (((1,), (0,)), ((), ()))       # a @ b
  eye_b = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
           ).astype(jnp.float32)

  pacc[:] = jnp.zeros((n, 128), jnp.float32)
  dsv_ref[0, 0] = 0.0
  dda_ref[0, 0] = 0.0

  def x_copy(src_hbm, p, buf, s):
    return pltpu.make_async_copy(src_hbm.at[p], buf, sem_x.at[s])

  def strip_copy(panel, row0, buf, slot, sem_sel):
    return pltpu.make_async_copy(
        tpm_hbm.at[panel, pl.ds(row0, chunk), :], buf.at[slot],
        sem_c.at[sem_sel])

  def i_loop(i, _):
    ib = pl.multiple_of(i * block, block)
    cxa = x_copy(xa_hbm, i, xai, 0)
    cxb = x_copy(xb_hbm, i, xbi, 1)
    cxa.start()
    cxb.start()
    # k-range: panel rows [align_down(i*B, chunk), n). Rows of panel i
    # above i*B are exactly zero (T is lower triangular), so aligning
    # DOWN to the chunk grid only adds zero terms to the accumulator
    # and keeps every DMA a full (chunk, B) tile.
    k0 = jax.lax.div(ib, chunk) * chunk
    nchunks = jax.lax.div(n - k0, chunk)
    cxa.wait()
    cxb.wait()

    def j_loop(j, _):
      jb = pl.multiple_of(j * block, block)
      cx = x_copy(xb_hbm, j, xbj, 2)
      cx.start()
      # double-buffered strip DMAs over the k-chunks of panels i and j
      strip_copy(i, k0, ci, 0, 0).start()
      strip_copy(j, k0, cj, 0, 1).start()
      cx.wait()

      def k_step(c, kacc):
        slot = jax.lax.rem(c, 2)
        row = k0 + c * chunk

        @pl.when(c + 1 < nchunks)
        def _():
          nxt = jax.lax.rem(c + 1, 2)
          strip_copy(i, row + chunk, ci, nxt, 2 * nxt).start()
          strip_copy(j, row + chunk, cj, nxt, 2 * nxt + 1).start()

        strip_copy(i, row, ci, slot, 2 * slot).wait()
        strip_copy(j, row, cj, slot, 2 * slot + 1).wait()
        return kacc + _pdot(ci[slot], cj[slot], rdims, precise)

      kacc = jax.lax.fori_loop(
          0, nchunks, k_step, jnp.zeros((block, block), jnp.float32))

      # --- consume the K^{-1} block entirely in VMEM ---
      sqd = _pdot(xai[:], xbj[:], wdims, precise)
      km, nm = _km_nm(sqd, sv_ref[0, 0], kfam)
      if masked:
        # Packed-batch masking: kernel factors carry valid_i * valid_j
        # (matches the penalty-masked forward and the XLA chain in
        # pallas_mll._se_core_bwd — d_da stays the full trace).
        pair = (vcol_ref[pl.ds(ib, block), :]
                * vrow_ref[pl.ds(j, 1), :])
        km = km * pair
        nm = nm * pair
      outer = acol_ref[pl.ds(ib, block), :] * arow_ref[pl.ds(j, 1), :]
      g = 0.5 * kacc - 0.5 * outer
      on_diag = (i == j).astype(jnp.float32)
      w2 = 2.0 - on_diag
      dsv_ref[0, 0] += w2 * jnp.sum(g * km)

      @pl.when(i == j)
      def _():
        # Only 32 of 528 block pairs are diagonal at n=8192 — skip the
        # (B, B) masked reduce everywhere else.
        dda_ref[0, 0] += jnp.sum(g * eye_b)
      w = g * nm
      pacc[pl.ds(ib, block), :] += _pdot(w, xbj[:], mdims, precise)

      @pl.when(j < i)
      def _():
        pacc[pl.ds(jb, block), :] += _pdot(w, xbi[:], rdims, precise)
      return 0

    jax.lax.fori_loop(0, i + 1, j_loop, 0)
    return 0

  jax.lax.fori_loop(0, nb, i_loop, 0)
  co = pltpu.make_async_copy(pacc, pacc_hbm, sem_out)
  co.start()
  co.wait()


def _kernel_bwd_tiled(n, block, chunk, ri, gj, precise, kfam, masked,
                      tpm_hbm, xa_hbm, xb_hbm, arow_ref, acol_ref,
                      vrow_ref, vcol_ref, sv_ref,
                      pacc_hbm, dsv_ref, dda_ref,
                      ci, cj, xai, xbi, xbj, pacc,
                      sem_c, sem_x, sem_out,
                      col_transpose=False, init_pacc=True):
  """Two-dimensional tiled pass over the block triangle of K^{-1}.

  The sequential kernel (_kernel_bwd) re-streams BOTH panel strips for
  every (i, j) block pair: (2/B) * 4 bytes per MAC. Tiling RI row
  panels x GJ column panels per pass shares each strip chunk across
  the tile — (RI + GJ)/(RI * GJ * B) * 4 bytes per MAC (2.7x less at
  2x4) — and amortizes the per-chunk-step DMA-issue/wait overhead over
  RI*GJ MXU dots, the same two levers that took the panel tri-inv
  from 40%% to its current rate (ops/pallas_triinv, PERF.md r8/r9).
  Pairs of a tile that land above the diagonal (j > i) are skipped at
  consumption; their wasted strip MACs only arise in the ~nb/GJ
  diagonal-straddling tiles. The k-range aligns to the tile TOP
  (i0*B): rows above each panel's own diagonal are zero and drop out,
  exactly like the sequential kernel's chunk-grid align-down.

  `col_transpose` / `init_pacc` support the embedding caller
  (ops/pallas_bwd_joint) where alpha lives in a (nb, B) VMEM scratch
  computed in-kernel: with col_transpose the (B, 1) column forms of
  alpha (and valid) are synthesized per row-block from the row buffers
  by a depth-1 MXU dot against ones (acol_ref / vcol_ref are then
  unused), and init_pacc=False preserves a pre-loaded P accumulator
  (the joint kernel parks u = T delta in its top lane).
  """
  nb = n // block
  wdims = (((1,), (1,)), ((), ()))       # a @ b^T (contract lanes)
  rdims = (((0,), (0,)), ((), ()))       # a^T @ b (contract sublanes)
  mdims = (((1,), (0,)), ((), ()))       # a @ b
  eye_b = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
           ).astype(jnp.float32)
  ones11 = jnp.ones((1, 1), jnp.float32)

  if init_pacc:
    pacc[:] = jnp.zeros((n, 128), jnp.float32)
  dsv_ref[0, 0] = 0.0
  dda_ref[0, 0] = 0.0

  def strip_copies(i0, j0, k0, c, slot):
    r0 = k0 + c * chunk
    cis = [pltpu.make_async_copy(
        tpm_hbm.at[i0 + ii, pl.ds(r0, chunk), :], ci.at[slot, ii],
        sem_c.at[slot * (ri + gj) + ii]) for ii in range(ri)]
    cjs = [pltpu.make_async_copy(
        tpm_hbm.at[j0 + g, pl.ds(r0, chunk), :], cj.at[slot, g],
        sem_c.at[slot * (ri + gj) + ri + g]) for g in range(gj)]
    return cis + cjs

  def it_loop(it, _):
    i0 = it * ri
    cxs = ([pltpu.make_async_copy(xa_hbm.at[i0 + ii], xai.at[ii],
                                  sem_x.at[ii]) for ii in range(ri)]
           + [pltpu.make_async_copy(xb_hbm.at[i0 + ii], xbi.at[ii],
                                    sem_x.at[ri + ii])
              for ii in range(ri)])
    for cp in cxs:
      cp.start()
    # k-range: rows [align_down(i0*B, chunk), n) — rows of panel i0+ii
    # above its own diagonal are exactly zero (T lower triangular), so
    # the tile-top alignment only adds zero terms.
    k0 = jax.lax.div(i0 * block, chunk) * chunk
    nchunks = jax.lax.div(n - k0, chunk)
    for cp in cxs:
      cp.wait()
    njt = jax.lax.div(i0 + ri - 1, gj) + 1
    if col_transpose:
      # (B, 1) column forms of alpha/valid for the tile's row-blocks,
      # from the (nb, B) row buffers: one depth-1 X3 dot against ones
      # per row (exact — the Dekker split reproduces f32 bit-for-bit).
      acol_t = [_pdot(arow_ref[pl.ds(i0 + ii, 1), :], ones11, rdims,
                      precise) for ii in range(ri)]
      vcol_t = ([_pdot(vrow_ref[pl.ds(i0 + ii, 1), :], ones11, rdims,
                       precise) for ii in range(ri)]
                if masked else None)

    def jt_loop(jt, _):
      j0 = jt * gj
      cxj = [pltpu.make_async_copy(xb_hbm.at[j0 + g], xbj.at[g],
                                   sem_x.at[2 * ri + g])
             for g in range(gj)]
      for cp in cxj:
        cp.start()
      for cp in strip_copies(i0, j0, k0, 0, 0):
        cp.start()
      for cp in cxj:
        cp.wait()

      def k_step(c, kaccs):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
          nslot = jax.lax.rem(c + 1, 2)
          for cp in strip_copies(i0, j0, k0, c + 1, nslot):
            cp.start()

        for cp in strip_copies(i0, j0, k0, c, slot):
          cp.wait()
        return tuple(
            kaccs[ii * gj + g] + _pdot(ci[slot, ii], cj[slot, g],
                                       rdims, precise)
            for ii in range(ri) for g in range(gj))

      kaccs = jax.lax.fori_loop(
          0, nchunks, k_step,
          tuple(jnp.zeros((block, block), jnp.float32)
                for _ in range(ri * gj)))

      # --- consume each below-diagonal K^{-1} block in VMEM ---
      for ii in range(ri):
        for g in range(gj):
          iv = i0 + ii
          jv = j0 + g

          @pl.when(jv <= iv)
          def _(ii=ii, g=g, iv=iv, jv=jv):
            ib = pl.multiple_of(iv * block, block)
            jb = pl.multiple_of(jv * block, block)
            sqd = _pdot(xai[ii], xbj[g], wdims, precise)
            km, nm = _km_nm(sqd, sv_ref[0, 0], kfam)
            if masked:
              pair = ((vcol_t[ii] if col_transpose
                       else vcol_ref[pl.ds(ib, block), :])
                      * vrow_ref[pl.ds(jv, 1), :])
              km = km * pair
              nm = nm * pair
            outer = ((acol_t[ii] if col_transpose
                      else acol_ref[pl.ds(ib, block), :])
                     * arow_ref[pl.ds(jv, 1), :])
            gmat = 0.5 * kaccs[ii * gj + g] - 0.5 * outer
            on_diag = (iv == jv).astype(jnp.float32)
            dsv_ref[0, 0] += (2.0 - on_diag) * jnp.sum(gmat * km)

            @pl.when(iv == jv)
            def _():
              dda_ref[0, 0] += jnp.sum(gmat * eye_b)
            w = gmat * nm
            pacc[pl.ds(ib, block), :] += _pdot(w, xbj[g], mdims,
                                               precise)

            @pl.when(jv < iv)
            def _():
              pacc[pl.ds(jb, block), :] += _pdot(w, xbi[ii], rdims,
                                                 precise)
      return 0

    jax.lax.fori_loop(0, njt, jt_loop, 0)
    return 0

  jax.lax.fori_loop(0, nb // ri, it_loop, 0)
  co = pltpu.make_async_copy(pacc, pacc_hbm, sem_out)
  co.start()
  co.wait()


@functools.partial(jax.jit, static_argnames=('block', 'chunk', 'precise',
                                             'kfam', 'rows', 'group',
                                             'interpret'))
def mll_bwd_fused(tpm: jnp.ndarray, x_scaled: jnp.ndarray,
                  alpha: jnp.ndarray, signal_variance,
                  block: int = BLOCK, chunk: int = CHUNK,
                  precise: bool = True, kfam: str = 'se',
                  valid=None, rows: int = 1, group: int = 1,
                  interpret: bool = False):
  """Fused NLL adjoints from panel-major T = L^{-1}.

  Args:
    tpm: (nb, n, block) panel-major lower-triangular inverse — panel p
      holds all n rows of column block p (rows < p*block are zero).
    x_scaled: (n, d) length-scaled inputs (same scaling as the forward).
    alpha: (n, 1) = K^{-1} (y - mu).
    signal_variance: scalar sv.
    rows, group: RI x GJ pair tile of the 2-D tiled pass
      (_kernel_bwd_tiled; shares strip DMAs across the tile). 1 x 1
      selects the sequential kernel. Auto-halved until they divide nb.

  Returns:
    (d_x, d_sv_raw, d_da): d_x is the (n, d) input adjoint;
    d_sv_raw = sum(G o K) over the full matrix (caller divides by sv);
    d_da = tr(G).
  """
  n, d = x_scaled.shape
  nb = n // block
  assert tpm.shape == (nb, n, block), (tpm.shape, nb, n, block)
  assert n % chunk == 0 and chunk % block == 0, (n, chunk, block)
  rows = max(1, rows)
  while rows > 1 and nb % rows:
    rows //= 2
  group = max(1, group)
  while group > 1 and nb % group:
    group //= 2
  feat = 128
  assert d + 2 <= feat, d
  xs32 = x_scaled.astype(jnp.float32)
  sqn = jnp.sum(xs32 * xs32, axis=1, keepdims=True)
  onev = jnp.ones((n, 1), jnp.float32)
  pad = jnp.zeros((n, feat - d - 2), jnp.float32)
  xa = jnp.concatenate([-2.0 * xs32, sqn, onev, pad],
                       axis=1).reshape(nb, block, feat)
  xb = jnp.concatenate([xs32, onev, sqn, pad],
                       axis=1).reshape(nb, block, feat)
  arow = alpha.astype(jnp.float32).reshape(nb, block)
  acol = alpha.astype(jnp.float32).reshape(n, 1)
  masked = valid is not None
  v = (valid.astype(jnp.float32).reshape(n) if masked
       else jnp.ones((n,), jnp.float32))
  vrow = v.reshape(nb, block)
  vcol = v.reshape(n, 1)
  sv = jnp.asarray(signal_variance, jnp.float32).reshape(1, 1)

  if rows * group > 1:
    ri, gj = rows, group
    kernel = functools.partial(_kernel_bwd_tiled, n, block, chunk,
                               ri, gj, precise, kfam, masked)
    pacc, dsv, dda = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # tpm panels
            pl.BlockSpec(memory_space=pl.ANY),            # xa tiles
            pl.BlockSpec(memory_space=pl.ANY),            # xb tiles
            pl.BlockSpec(memory_space=pltpu.VMEM),        # alpha rows
            pl.BlockSpec(memory_space=pltpu.VMEM),        # alpha col
            pl.BlockSpec(memory_space=pltpu.VMEM),        # valid rows
            pl.BlockSpec(memory_space=pltpu.VMEM),        # valid col
            pl.BlockSpec(memory_space=pltpu.SMEM),        # sv
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),            # P accumulator
            pl.BlockSpec(memory_space=pltpu.SMEM),        # d_sv raw
            pl.BlockSpec(memory_space=pltpu.SMEM),        # d_da
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, feat), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ri, chunk, block), jnp.float32),  # ci strips
            pltpu.VMEM((2, gj, chunk, block), jnp.float32),  # cj strips
            pltpu.VMEM((ri, block, feat), jnp.float32),      # xa i-tiles
            pltpu.VMEM((ri, block, feat), jnp.float32),      # xb i-tiles
            pltpu.VMEM((gj, block, feat), jnp.float32),      # xb j-tiles
            pltpu.VMEM((n, feat), jnp.float32),              # P acc
            pltpu.SemaphoreType.DMA((2 * (ri + gj),)),       # strip sems
            pltpu.SemaphoreType.DMA((2 * ri + gj,)),         # x-tile sems
            pltpu.SemaphoreType.DMA,                         # out sem
        ],
        compiler_params=pallas_params.compiler_params(
            has_side_effects=True),
        interpret=interpret,
    )(tpm, xa, xb, arow, acol, vrow, vcol, sv)
    d_x = 2.0 * (pacc[:, :d] - pacc[:, d:d + 1] * xs32)
    return d_x, dsv[0, 0], dda[0, 0]

  kernel = functools.partial(_kernel_bwd, n, block, chunk, precise,
                             kfam, masked)
  pacc, dsv, dda = pl.pallas_call(
      kernel,
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),            # tpm panels
          pl.BlockSpec(memory_space=pl.ANY),            # xa tiles
          pl.BlockSpec(memory_space=pl.ANY),            # xb tiles
          pl.BlockSpec(memory_space=pltpu.VMEM),        # alpha rows
          pl.BlockSpec(memory_space=pltpu.VMEM),        # alpha col
          pl.BlockSpec(memory_space=pltpu.VMEM),        # valid rows
          pl.BlockSpec(memory_space=pltpu.VMEM),        # valid col
          pl.BlockSpec(memory_space=pltpu.SMEM),        # sv
      ],
      out_specs=(
          pl.BlockSpec(memory_space=pl.ANY),            # P accumulator
          pl.BlockSpec(memory_space=pltpu.SMEM),        # d_sv raw
          pl.BlockSpec(memory_space=pltpu.SMEM),        # d_da
      ),
      out_shape=(
          jax.ShapeDtypeStruct((n, feat), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ),
      scratch_shapes=[
          pltpu.VMEM((2, chunk, block), jnp.float32),   # ci strips
          pltpu.VMEM((2, chunk, block), jnp.float32),   # cj strips
          pltpu.VMEM((block, feat), jnp.float32),       # xa tile of i
          pltpu.VMEM((block, feat), jnp.float32),       # xb tile of i
          pltpu.VMEM((block, feat), jnp.float32),       # xb tile of j
          pltpu.VMEM((n, feat), jnp.float32),           # P accumulator
          pltpu.SemaphoreType.DMA((4,)),                # strip sems
          pltpu.SemaphoreType.DMA((3,)),                # x-tile sems
          pltpu.SemaphoreType.DMA,                      # out sem
      ],
      compiler_params=pallas_params.compiler_params(has_side_effects=True),
      interpret=interpret,
  )(tpm, xa, xb, arow, acol, vrow, vcol, sv)
  d_x = 2.0 * (pacc[:, :d] - pacc[:, d:d + 1] * xs32)
  return d_x, dsv[0, 0], dda[0, 0]
