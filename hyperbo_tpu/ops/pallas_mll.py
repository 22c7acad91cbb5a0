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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperbo_tpu.ops import pallas_params
from hyperbo_tpu.ops import pallas_triinv

from hyperbo_tpu.ops.pallas_chol_hbm import (_INV_BASE, _dekker_split,
                                             _pdot, _stacked_sweep,
                                             _sweep_fori)

# Stationary kernel families the fused kernel serves. All three share
# k(0) = sv, so the diagonal/sweep/logdet logic is family-independent;
# only the Gram-tile epilogue (_gram_transform) and the closed-form
# adjoint (_se_core_bwd) differ. Reference forms: GPML Eq. 4.9 / 4.17
# (hyperbo/gp_utils/kernel.py:63-123).
_KFAMS = ('se', 'matern32', 'matern52')

# Padded-row penalty added to every squared distance touching a padded
# row (per row, so doubly-padded pairs get 2x). Chosen so the masked
# Gram entry k(sqrt(P)) is negligible at f32: SE decays as exp(-P/2)
# (P=50 -> 1.4e-11) but Matern only as poly(sqrt(P)) * exp(-c sqrt(P)),
# which needs P=400 (matern32: 35 * exp(-34.6) ~ 3e-14).
_PENALTY = {'se': 50.0, 'matern32': 400.0, 'matern52': 400.0}

_SQRT3 = 3.0 ** 0.5
_SQRT5 = 5.0 ** 0.5


def _gram_transform(sqd, sv, kfam):
  """Kernel transform k(r2) for a raw squared-distance tile.

  Applied in-kernel on the VPU (sv is the SMEM signal-variance scalar).
  Matern costs ~5 extra VPU ops per Gram element (sqrt + polynomial)
  over SE — sub-ms at n=8192 against the O(n^3) MXU work. The r2 floor
  at 0 matches models/kernel._safe_r semantics (exact-0 distances stay
  exactly k(0) = sv).
  """
  r2 = jnp.maximum(sqd, 0.0)
  if kfam == 'se':
    return sv * jnp.exp(-0.5 * r2)
  if kfam == 'matern32':
    r = _SQRT3 * jnp.sqrt(r2)
    return sv * ((1.0 + r) * jnp.exp(-r))
  if kfam == 'matern52':
    r = _SQRT5 * jnp.sqrt(r2)
    return sv * ((1.0 + r + (r * r) * (1.0 / 3.0)) * jnp.exp(-r))
  raise ValueError(f'unknown fused kernel family: {kfam!r}')


def mll_fused_hbm(x_scaled, y, signal_variance, diag_add,
                  block: int = 256, chunk: int = 512, tw: int = 1024,
                  half: int = 2048, wstore: str = 'linv',
                  interpret: bool = False):
  """Compatibility alias for the panel-major kernel (v9).

  The original row-major fused kernel (v8-fused) depended on
  lane-dynamic VMEM slices that the remote Mosaic toolchain miscompiles
  (NaNs on hardware, round 2) and a column-panel layout whose strided
  DMAs dominated runtime; mll_fused_pm supersedes it. chunk/tw are
  accepted and ignored.
  """
  del chunk, tw
  return mll_fused_pm(x_scaled, y, signal_variance, diag_add,
                      block=block, half=min(half, 1024), wstore=wstore,
                      return_l=True, interpret=interpret)


def _split_sweep(d0, block, mb, row_idx_b, l_ref, w_ref, wstore,
                 precise=False):
  """Factor D -> L_D (l_ref) and its inverse transpose/inverse (w_ref).

  Same stacked-[D; I] algebra as _stacked_sweep, but the top (D) and
  bottom (I) halves are carried as SEPARATE (B, mb) values — no tall
  (2B, *) values or offset-B slices, which the remote Mosaic toolchain
  miscompiles or rejects at B=256 (bisected round 2, PERF.md).
  wstore='linvT': w_ref holds L_D^{-T} (column writes);
  wstore='linv':  w_ref holds L_D^{-1} (row writes) so downstream dots
  use the ((1,),(1,)) contraction the toolchain accepts at B=256.
  """
  eye = jnp.eye(block, dtype=jnp.float32)
  l_ref[:] = jnp.zeros((block, block), jnp.float32)
  w_ref[:] = jnp.zeros((block, block), jnp.float32)
  for c0 in range(0, block, mb):
    top = d0[:, c0:c0 + mb]
    bot = eye[:, c0:c0 + mb]
    if c0 > 0:
      strip2 = l_ref[c0:c0 + mb, 0:c0]                 # (mb, c0)
      top = top - _pdot(l_ref[:, 0:c0], strip2,
                        (((1,), (1,)), ((), ())), precise)
      if wstore == 'linvT':
        wcols = w_ref[:, 0:c0]                         # L^{-T} columns
      else:
        wcols = w_ref[0:c0, :].T                       # rows -> columns
      bot = bot - _pdot(wcols, strip2, (((1,), (1,)), ((), ())),
                        precise)
    for kl in range(mb):
      k = c0 + kl
      tcol = top[:, kl:kl + 1]
      bcol = bot[:, kl:kl + 1]
      akk = tcol[k, 0]
      inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
      lcol = jnp.where(row_idx_b >= k, tcol * inv_d, 0.0)
      wcol = bcol * inv_d
      l_ref[:, k:k + 1] = lcol
      if wstore == 'linvT':
        w_ref[:, k:k + 1] = wcol
      else:
        w_ref[k:k + 1, :] = wcol.T
      seg = lcol[c0:c0 + mb, 0:1].T                    # (1, mb)
      top = top - lcol * seg
      bot = bot - wcol * seg


def _kernel_mll_pm(n, d, block, half, wstore, sweep, precise, mode,
                   mb, slots, xa_hbm,
                   xb_hbm, y_ref, sv_ref, diag_ref, l_hbm, quad_ref,
                   ld_ref, halfbuf, lbuf, strip, l_ref, w_ref, z_ref,
                   s_ref, xbuf, xcbuf, top_ref, bot_ref,
                   sem_l, sem_s, sem_x, sem_out):
  """Panel-major fused MLL (v9).

  L lives as (nb, n, B) — panel j is l_hbm[j] — so EVERY transfer is a
  contiguous HBM region: the (half, B) correction loads, the (B, B)
  strips and the output stores. The row-major column-panel layout made
  each DMA pay ~17 ns per 512-1024 byte row (measured: an 11.6 ms DMA
  skeleton for ~1.3 GB); contiguous panels remove that entirely.
  Corrections stream whole halves (no chunk subdivision): one
  (half, B) x (B, B)^T MXU GEMM per (panel t, half), dual-buffered on
  both the strip and the half tiles.

  No lane-dynamic VECTOR ops anywhere: y and z are panel-major
  (nb, B) refs (sublane-dynamic row access only) and x tiles arrive by
  DMA from HBM — round-2 hardware runs showed lane-dynamic VMEM slices
  produce NaNs despite exact interpret-mode results.
  """
  nb = n // block
  n_halves = n // half
  row_idx_h = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
  row_idx_b = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
  tile_r = jax.lax.broadcasted_iota(jnp.int32, (half, block), 0)
  tile_c = jax.lax.broadcasted_iota(jnp.int32, (half, block), 1)
  eye_b = jnp.eye(block, dtype=jnp.float32)
  tril_b = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0) >=
            jax.lax.broadcasted_iota(jnp.int32, (block, block), 1))
  triu_b = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0) <=
            jax.lax.broadcasted_iota(jnp.int32, (block, block), 1))

  halfbuf[:] = jnp.zeros((half, block), jnp.float32)

  # Zero pass, two DMAs in flight (all reads from the same zeroed
  # halfbuf; ping-pong on the two lbuf semaphores).
  def zero_dma(i, slot):
    jj = jax.lax.div(i, n_halves)
    hh = jax.lax.rem(i, n_halves)
    return pltpu.make_async_copy(
        halfbuf, l_hbm.at[jj, pl.ds(hh * half, half), :],
        sem_l.at[slot])

  zero_dma(0, 0).start()

  def zero_step(i, _):
    slot = jax.lax.rem(i, 2)

    @pl.when(i + 1 < nb * n_halves)
    def _():
      zero_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    zero_dma(i, slot).wait()
    return 0

  jax.lax.fori_loop(0, nb * n_halves, zero_step, 0)
  z_ref[:] = jnp.zeros((nb, block), jnp.float32)

  def gram_tile(h, j):
    # sqd comes from ONE natural-layout MXU dot on the host-prepared
    # distance embedding: xa = [-2x, |x|^2, 1], xb = [x, 1, |x|^2]
    # (both lane-padded to 128), so xa xb^T = |xi-xj|^2 directly.
    # In-kernel sublane-contracted (d, *) norm dots returned ~2e-2
    # absolute tile errors on hardware (round 2, exp 18) — this
    # embedding avoids them and the cancellation-prone assembly.
    # Both arrays are stored tile-major — (n_halves, half, 128) and
    # (nb, B, 128) — so the DMAs are contiguous; row-major slices paid
    # ~17 ns/row in strided overhead (~2.4 ms/iteration total).
    cx = pltpu.make_async_copy(xa_hbm.at[h], xbuf, sem_x)
    cx.start()
    cx.wait()
    cc = pltpu.make_async_copy(xb_hbm.at[j], xcbuf, sem_x)
    cc.start()
    cc.wait()
    sqd = _pdot(xbuf[:], xcbuf[:], (((1,), (1,)), ((), ())), precise)
    return sv_ref[0, 0] * jnp.exp(-0.5 * jnp.maximum(sqd, 0.0))

  if sweep == 'fori':
    wstore = 'linv'      # w_ref rows are L^{-1} rows in this layout
  wdims = ((((1,), (0,)), ((), ())) if wstore == 'linvT' else
           (((1,), (1,)), ((), ())))

  def corrections(j, row0, col0, with_solve):
    """halfbuf -= sum_t L[t][rows] L[t][col-rows]^T, dual-buffered."""
    if mode == 'nocorr':
      return

    def dma_pair(t, slot):
      return (pltpu.make_async_copy(
          l_hbm.at[t, pl.ds(col0, block), :], strip.at[slot],
          sem_s.at[slot]),
              pltpu.make_async_copy(
          l_hbm.at[t, pl.ds(row0, half), :], lbuf.at[slot],
          sem_l.at[slot]))

    # Warm-up: fill all DMA slots.
    for w in range(slots - 1):
      @pl.when(w < j)
      def _(w=w):
        cs0, cl0 = dma_pair(w, w)
        cs0.start()
        cl0.start()

    def t_step(t, _):
      slot = jax.lax.rem(t, slots)

      @pl.when(t + slots - 1 < j)
      def _():
        nxt = t + slots - 1
        cs1, cl1 = dma_pair(nxt, jax.lax.rem(nxt, slots))
        cs1.start()
        cl1.start()

      cs, cl = dma_pair(t, slot)
      cs.wait()
      cl.wait()
      if with_solve:
        zs = z_ref[pl.ds(t, 1), :]                      # (1, B)
        s_ref[:] = s_ref[:] + jnp.sum(strip[slot] * zs, axis=1,
                                      keepdims=True)
      if mode != 'dmaonly':
        update = _pdot(lbuf[slot], strip[slot],
                       (((1,), (1,)), ((), ())), precise)
        halfbuf[:] = halfbuf[:] - update
      return 0

    jax.lax.fori_loop(0, j, t_step, 0)

  def panel_step(j, _):
    col0 = j * block
    h0 = jax.lax.div(col0, half)
    row0_d = h0 * half
    # multiple_of: Mosaic's alignment prover cannot see through the
    # subtraction; without the hint every B=256 half-panel kernel dies
    # with "cannot statically prove that index ... is a multiple of 8".
    loc0 = pl.multiple_of(col0 - row0_d, block)

    # --- diagonal half ---
    tile = gram_tile(h0, j)
    on_diag = ((tile_r + row0_d) == (tile_c + col0)).astype(jnp.float32)
    halfbuf[:] = tile + diag_ref[0, 0] * on_diag
    s_ref[:] = jnp.zeros((block, 1), jnp.float32)
    corrections(j, row0_d, col0, with_solve=True)

    if mode == 'nosweep':
      l_ref[:] = jnp.eye(block, dtype=jnp.float32)
      w_ref[:] = jnp.eye(block, dtype=jnp.float32)
      l_d = l_ref[:]
    elif sweep == 'fori':
      # l_ref holds L^T (rows = columns), w_ref holds L^{-1} rows.
      def read_top(c0):
        return halfbuf[pl.ds(pl.multiple_of(loc0 + c0, mb), mb), :]
      lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
      _sweep_fori(read_top, block, mb, lane_idx, l_ref, w_ref, 0,
                  top_ref, bot_ref, precise=precise)
      # Spliced TRANSPOSED (see _kernel_mll_g): later strips never read
      # earlier diagonal blocks; return_l fixes the export.
      l_d = jnp.where(triu_b, l_ref[:], 0.0)
    else:
      d0 = halfbuf[pl.ds(loc0, block), :]
      d0 = 0.5 * (d0 + d0.T)
      _split_sweep(d0, block, mb, row_idx_b, l_ref, w_ref, wstore,
                   precise=precise)
      l_d = l_ref[:]

    ld_diag = l_ref[:]   # diag identical under transpose
    ld_ref[0, 0] += jnp.sum(jnp.where(eye_b > 0.0, jnp.log(
        jnp.maximum(ld_diag, 1e-30)), 0.0))

    # z_j = L_D^{-1} (y_j - s_j): (1, B) row stored panel-major.
    v = y_ref[pl.ds(j, 1), :] - s_ref[:].T
    zj = _pdot(v, w_ref[:], wdims, precise)
    z_ref[pl.ds(j, 1), :] = zj

    below = _pdot(halfbuf[:], w_ref[:], wdims, precise)
    keep = (row_idx_h + row0_d) >= col0 + block
    halfbuf[:] = jnp.where(keep, below, 0.0)
    halfbuf[pl.ds(loc0, block), :] = l_d
    co = pltpu.make_async_copy(
        halfbuf, l_hbm.at[j, pl.ds(row0_d, half), :], sem_out)
    co.start()
    co.wait()

    # --- strictly-below halves (all rows > col0 + B: no masking) ---
    def half_step(h, _):
      row0 = h * half
      halfbuf[:] = gram_tile(h, j)
      corrections(j, row0, col0, with_solve=False)
      halfbuf[:] = _pdot(halfbuf[:], w_ref[:], wdims, precise)
      co = pltpu.make_async_copy(
          halfbuf, l_hbm.at[j, pl.ds(row0, half), :], sem_out)
      co.start()
      co.wait()
      return 0

    jax.lax.fori_loop(h0 + 1, n_halves, half_step, 0)
    return 0

  ld_ref[0, 0] = 0.0
  jax.lax.fori_loop(0, nb, panel_step, 0)
  quad_ref[0, 0] = jnp.sum(z_ref[:] * z_ref[:])


@functools.partial(jax.jit, static_argnames=('block', 'half', 'wstore',
                                             'sweep', 'precise', 'mode',
                                             'mb', 'slots',
                                             'return_l', 'interpret'))
def mll_fused_pm(x_scaled: jnp.ndarray, y: jnp.ndarray,
                 signal_variance, diag_add, block: int = 256,
                 half: int = 2048, wstore: str = 'linv',
                 sweep: str = 'fori', precise: bool = True,
                 mode: str = 'full', mb: int = 32, slots: int = 2,
                 return_l: bool = False,
                 interpret: bool = False):
  """Panel-major fused SE-kernel GP NLL (v9; see _kernel_mll_pm).

  Returns (quad, logdet_half) — or (l, quad, logdet_half) with
  return_l=True, where l is reassembled to the usual (n, n) lower form.
  """
  n, d = x_scaled.shape
  half = min(half, n)
  assert (n % block == 0 and n % half == 0 and half % block == 0), (
      n, block, half)
  assert wstore in ('linvT', 'linv'), wstore
  assert sweep in ('fori', 'unroll'), sweep
  nb = n // block
  xs32 = x_scaled.astype(jnp.float32)
  sqn = jnp.sum(xs32 * xs32, axis=1, keepdims=True)
  onev = jnp.ones((n, 1), jnp.float32)
  feat = 128
  assert d + 2 <= feat, d
  pad = jnp.zeros((n, feat - d - 2), jnp.float32)
  xa = jnp.concatenate([-2.0 * xs32, sqn, onev, pad],
                       axis=1).reshape(n // half, half, feat)
  xb = jnp.concatenate([xs32, onev, sqn, pad],
                       axis=1).reshape(nb, block, feat)
  y_pm = y.astype(jnp.float32).reshape(nb, block)
  sv = jnp.asarray(signal_variance, jnp.float32).reshape(1, 1)
  da = jnp.asarray(diag_add, jnp.float32).reshape(1, 1)
  assert mode in ('full', 'nosweep', 'nocorr', 'dmaonly'), mode
  assert block % mb == 0 and mb % 2 == 0, (block, mb)
  kernel = functools.partial(_kernel_mll_pm, n, d, block, half, wstore,
                             sweep, precise, mode, mb, slots)
  l_pm, quad, ld = pl.pallas_call(
      kernel,
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),           # xa in HBM
          pl.BlockSpec(memory_space=pl.ANY),           # xb in HBM
          pl.BlockSpec(memory_space=pltpu.VMEM),       # y panel-major
          pl.BlockSpec(memory_space=pltpu.SMEM),       # sv
          pl.BlockSpec(memory_space=pltpu.SMEM),       # diag_add
      ],
      out_specs=(
          pl.BlockSpec(memory_space=pl.ANY),           # L panels
          pl.BlockSpec(memory_space=pltpu.SMEM),       # quad
          pl.BlockSpec(memory_space=pltpu.SMEM),       # logdet
      ),
      out_shape=(
          jax.ShapeDtypeStruct((nb, n, block), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ),
      scratch_shapes=[
          pltpu.VMEM((half, block), jnp.float32),       # halfbuf
          pltpu.VMEM((slots, half, block), jnp.float32),   # lbuf
          pltpu.VMEM((slots, block, block), jnp.float32),  # strip
          pltpu.VMEM((block, block), jnp.float32),      # l_ref
          pltpu.VMEM((block, block), jnp.float32),      # w_ref
          pltpu.VMEM((nb, block), jnp.float32),         # z panel-major
          pltpu.VMEM((block, 1), jnp.float32),          # s partial
          pltpu.VMEM((half, 128), jnp.float32),         # xa row tile
          pltpu.VMEM((block, 128), jnp.float32),        # xb col tile
          pltpu.VMEM((mb, block), jnp.float32),         # sweep top
          pltpu.VMEM((mb, block), jnp.float32),         # sweep bot
          pltpu.SemaphoreType.DMA((slots,)),            # sem_l
          pltpu.SemaphoreType.DMA((slots,)),            # sem_s
          pltpu.SemaphoreType.DMA,                      # sem_x
          pltpu.SemaphoreType.DMA,                      # sem_out
      ],
      compiler_params=pallas_params.compiler_params(has_side_effects=True),
      interpret=interpret,
  )(xa, xb, y_pm, sv, da)
  if return_l:
    l = jnp.moveaxis(l_pm, 0, 1).reshape(n, n)
    if sweep == 'fori':
      # Diagonal (B, B) blocks are stored transposed by the kernel.
      idx = jnp.arange(nb)
      blocks = l.reshape(nb, block, nb, block).transpose(0, 2, 1, 3)
      diagb = blocks[idx, idx]
      blocks = blocks.at[idx, idx].set(jnp.swapaxes(diagb, -1, -2))
      l = blocks.transpose(0, 2, 1, 3).reshape(n, n)
    return l, quad[0, 0], ld[0, 0]
  return quad[0, 0], ld[0, 0]


def _seg_ofs(i, t, group):
  """Index of the (i, t) strictly-below-diagonal seg block (i > t)."""
  return sum(range(1, i)) + t


def _kernel_mll_g(n, d, block, half, precise, mode, mb, slots, group,
                  scoped_sweep, sweep_unroll, zero_init, hier_sweep,
                  value_sweep, pivot_mode, kfam,
                  xa_hbm, xb_hbm, y_ref, sv_ref, diag_ref, l_hbm,
                  quad_ref, ld_ref, halfbuf, lbuf, strip, lt_s,
                  w_all, seg_ref, z_ref, s_ref, xbuf, xcbuf, top_ref,
                  bot_ref, lt_a, w_a, lt_b, w_b, d22_s, top_s, bot_s,
                  sem_l, sem_s, sem_x, sem_out):
  """Grouped panel-major fused MLL (v11).

  Corrections process `group` panel columns per pass: the (half, B)
  row tiles of earlier panels are loaded from HBM ONCE per group
  instead of once per panel — the correction re-read volume, the
  measured floor of v9 (~2.1 ms at n=8192), scales as 1/group. The
  coupling between the group's columns runs as in-VMEM GEMMs:

    for inner column i: subtract contributions of already-finished
    inner columns t < i (seg blocks read back from the just-spliced
    halfbuf / the cached diagonal seg block), sweep the diagonal,
    scale the below rows, splice.

  W_i factors stack in w_all for the below halves; z taps follow the
  same structure (HBM strips for cross-group, seg blocks in-group).
  Layout rules as v9: tile-major inputs, panel-major L, no
  lane-dynamic vector ops, pl.multiple_of on subtracted offsets,
  Dekker-split dots (the piecewise 2x2 GEMM keeps split temps inside
  the VMEM ceiling).
  """
  nb = n // block
  gb = group * block
  ng = nb // group
  n_halves = n // half
  # NOTE: no hoisted iota/eye constants — (half, gb) iotas and (B, B)
  # masks kept live across the whole kernel are hundreds of vregs and
  # plausibly the cause of the 12x in-situ sweep slowdown (PERF.md
  # "sweep anomaly"); everything is rematerialized at its use site.

  halfbuf[:] = jnp.zeros((half, gb), jnp.float32)

  # The zero pass exists only for the strictly-above-diagonal rows of
  # each panel (rows < the panel's diagonal half), which NOTHING inside
  # the factorization ever reads — correction tiles/strips start at or
  # below earlier panels' diagonal blocks, and the in-half above-
  # diagonal region is masked and stored by the diagonal-half store.
  # Only an exported L (return_l / the custom-VJP forward) needs them
  # zeroed, so zero_init follows return_l (~0.3 ms of pure HBM writes
  # at n=8192 otherwise).
  if zero_init:
    def zero_dma(i, slot):
      jj = jax.lax.div(i, n_halves)
      hh = jax.lax.rem(i, n_halves)
      return pltpu.make_async_copy(
          halfbuf.at[:, 0:block],
          l_hbm.at[jj, pl.ds(hh * half, half), :], sem_l.at[slot])

    zero_dma(0, 0).start()

    def zero_step(i, _):
      slot = jax.lax.rem(i, 2)

      @pl.when(i + 1 < nb * n_halves)
      def _():
        zero_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

      zero_dma(i, slot).wait()
      return 0

    jax.lax.fori_loop(0, nb * n_halves, zero_step, 0)
  z_ref[:] = jnp.zeros((nb, block), jnp.float32)

  def xa_copy(h, slot):
    """xa tile DMA descriptor for half h into prefetch slot h % 2."""
    return pltpu.make_async_copy(xa_hbm.at[h], xbuf.at[slot],
                                 sem_x.at[slot])

  def gram_tile(h):
    """Gram tile from the PREFETCHED xa slot for half h.

    The group's xb tile (xcbuf) is loaded once per panel group — it is
    identical for every half — and the xa tile for half h+1 is put in
    flight by the caller before the long correction phase, so by the
    time this runs the data is resident: ~500 serialized DMA waits per
    n=8192 iteration become background transfers.
    """
    slot = jax.lax.rem(h, 2)
    xa_copy(h, slot).wait()
    sqd = _pdot(xbuf[slot], xcbuf[:], (((1,), (1,)), ((), ())), precise)
    return _gram_transform(sqd, sv_ref[0, 0], kfam)

  wdims = (((1,), (1,)), ((), ()))

  def correction_gemm(slot):
    """halfbuf -= lbuf[slot] @ strip[slot]^T, piecewise so the
    Dekker-split temporaries stay well under the VMEM ceiling."""
    rps = max(2, half // 512)
    hp = half // rps
    for rp in range(rps):
      for cp in range(group):
        update = _pdot(lbuf[slot][rp * hp:(rp + 1) * hp, :],
                      strip[slot][cp * block:(cp + 1) * block, :],
                      wdims, precise)
        halfbuf[rp * hp:(rp + 1) * hp,
                cp * block:(cp + 1) * block] = (
            halfbuf[rp * hp:(rp + 1) * hp,
                    cp * block:(cp + 1) * block] - update)

  def corr_dma_pair(t, slot, row0, gcol0):
    return (pltpu.make_async_copy(
        l_hbm.at[t, pl.ds(gcol0, gb), :], strip.at[slot],
        sem_s.at[slot]),
            pltpu.make_async_copy(
        l_hbm.at[t, pl.ds(row0, half), :], lbuf.at[slot],
        sem_l.at[slot]))

  def corr_prestart(t_count, row0, gcol0):
    """Put the correction warm-up DMAs in flight — called by the phase
    BEFORE its gram-tile work so the first t_step never waits cold."""
    for w in range(slots - 1):
      @pl.when(w < t_count)
      def _(w=w):
        cs0, cl0 = corr_dma_pair(w, w, row0, gcol0)
        cs0.start()
        cl0.start()

  def corrections(jg, row0, gcol0, with_solve):
    t_count = jg * group

    def dma_pair(t, slot):
      return corr_dma_pair(t, slot, row0, gcol0)

    def t_step(t, _):
      slot = jax.lax.rem(t, slots)

      @pl.when(t + slots - 1 < t_count)
      def _():
        nxt = t + slots - 1
        cs1, cl1 = dma_pair(nxt, jax.lax.rem(nxt, slots))
        cs1.start()
        cl1.start()

      cs, cl = dma_pair(t, slot)
      cs.wait()
      cl.wait()
      if with_solve:
        zs = z_ref[pl.ds(t, 1), :]                      # (1, B)
        s_ref[:] = s_ref[:] + jnp.sum(strip[slot] * zs, axis=1,
                                      keepdims=True)
      if mode != 'dmaonly':
        correction_gemm(slot)
      return 0

    jax.lax.fori_loop(0, t_count, t_step, 0)

  def sweep_inner_hier(loc_i, i):
    """Hierarchical diagonal factorization (v13): the (B, B) block as
    2x2 of S=B/2 sub-blocks. The scalar-sequential sweeps run on
    PHYSICALLY S-wide scratch refs — the sweep is vreg-issue-bound and
    slicing a wide ref does not shrink Mosaic's layout (round-3 probe),
    so half-width refs halve the issue cost — and the couplings are
    five (S, S) X3 MXU dots with contraction specs chosen so no
    transposes are needed:

      L11, W11 = sweep(A11)            L21^T = W11 A12
      D22' = A22 - L21 L21^T           L22, W22 = sweep(D22')
      W21 = -(W22 L21) W11
    """
    ib = i * block
    s = block // 2
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

    # All halfbuf reads use lane windows at the PROVEN offsets (ib is a
    # multiple of block); the S-wide sub-views are VALUE slices — the
    # dynamic-row + 128-offset-lane REF slice pattern is what crashes
    # the remote compile-helper (round-3 probe).
    def read_top_a(c0):
      rows = halfbuf[pl.ds(pl.multiple_of(loc_i + c0, mb), mb),
                     ib:ib + block]
      return rows[:, 0:s]

    _sweep_fori(read_top_a, s, mb, lane_s, lt_a, w_a, 0, top_s, bot_s,
                precise=precise, unroll=sweep_unroll,
                values=value_sweep, pivot_mode=pivot_mode)
    rows_top = halfbuf[pl.ds(pl.multiple_of(loc_i, s), s),
                       ib:ib + block]
    l21t = _pdot(w_a[:], rows_top[:, s:block], (((1,), (0,)), ((), ())),
                 precise)
    rows_bot = halfbuf[pl.ds(pl.multiple_of(loc_i + s, s), s),
                       ib:ib + block]
    d22_s[:] = rows_bot[:, s:block] - _pdot(
        l21t, l21t, (((0,), (0,)), ((), ())), precise)

    def read_top_b(c0):
      return d22_s[c0:c0 + mb, :]

    _sweep_fori(read_top_b, s, mb, lane_s, lt_b, w_b, 0, top_s, bot_s,
                precise=precise, unroll=sweep_unroll,
                values=value_sweep, pivot_mode=pivot_mode)
    w21 = -_pdot(_pdot(w_b[:], l21t, (((1,), (1,)), ((), ())), precise),
                 w_a[:], (((1,), (0,)), ((), ())), precise)
    zs = jnp.zeros((s, s), jnp.float32)
    lt_s[0:s, 0:s] = lt_a[:]
    lt_s[0:s, s:block] = l21t
    lt_s[s:block, 0:s] = zs
    lt_s[s:block, s:block] = lt_b[:]
    w_all[ib:ib + s, 0:s] = w_a[:]
    w_all[ib:ib + s, s:block] = zs
    w_all[ib + s:ib + block, 0:s] = w21
    w_all[ib + s:ib + block, s:block] = w_b[:]

  def sweep_inner(loc_i, i):
    """Sweep the diagonal block of inner column i: L^T rows into lt_s,
    W = L^{-1} rows straight into w_all[iB:(i+1)B]."""
    ib = i * block
    if mode == 'nosweep':
      lt_s[:] = jnp.eye(block, dtype=jnp.float32)
      w_all[ib:ib + block, :] = jnp.eye(block, dtype=jnp.float32)
    elif hier_sweep:
      sweep_inner_hier(loc_i, i)
    else:
      def read_top(c0):
        # Rows of the symmetric diagonal block, read in place — no
        # (B, B) materialization/transpose.
        return halfbuf[pl.ds(pl.multiple_of(loc_i + c0, mb), mb),
                       ib:ib + block]
      lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
      reps = 2 if mode == 'sweepx2' else 1  # probe modes sweepnw/sweepnp thread below
      if scoped_sweep:
        def run_sweep(top2, bot2):
          for _ in range(reps):
            _sweep_fori(read_top, block, mb, lane_idx, lt_s, w_all, ib,
                        top2, bot2, precise=precise,
                        unroll=sweep_unroll, values=value_sweep,
                        pivot_mode=pivot_mode)
        pl.run_scoped(run_sweep,
                      pltpu.VMEM((mb, block), jnp.float32),
                      pltpu.VMEM((mb, block), jnp.float32))
      else:
        for _ in range(reps):
          _sweep_fori(read_top, block, mb, lane_idx, lt_s, w_all, ib,
                      top_ref, bot_ref, precise=precise,
                      unroll=sweep_unroll, values=value_sweep,
                      skip_writes=(mode == 'sweepnw'),
                      const_pivot=(mode == 'sweepnp'),
                      pivot_mode=pivot_mode)

  def panel_group(jg, _):
    gcol0 = jg * gb
    h0 = jax.lax.div(gcol0, half)
    row0_d = h0 * half
    loc0 = pl.multiple_of(gcol0 - row0_d, gb)

    # The group's xb tile once (identical for every half), then the
    # diagonal half's xa tile; later xa tiles prefetch ahead of the
    # correction phases.
    cc = pltpu.make_async_copy(xb_hbm.at[jg], xcbuf, sem_out)
    cc.start()
    xa_copy(h0, jax.lax.rem(h0, 2)).start()
    corr_prestart(jg * group, row0_d, gcol0)
    cc.wait()

    # --- diagonal half ---
    tile = gram_tile(h0)

    @pl.when(h0 + 1 < n_halves)
    def _():
      xa_copy(h0 + 1, jax.lax.rem(h0 + 1, 2)).start()
    tile_r = jax.lax.broadcasted_iota(jnp.int32, (half, gb), 0)
    tile_c = jax.lax.broadcasted_iota(jnp.int32, (half, gb), 1)
    on_diag = ((tile_r + row0_d) == (tile_c + gcol0)).astype(jnp.float32)
    del tile_r, tile_c
    halfbuf[:] = tile + diag_ref[0, 0] * on_diag
    s_ref[:] = jnp.zeros((gb, 1), jnp.float32)
    corrections(jg, row0_d, gcol0, with_solve=True)

    for i in range(group):
      ib = i * block
      loc_i = pl.multiple_of(loc0 + ib, block)
      col_abs = gcol0 + ib
      # in-group corrections from finished inner columns t < i: the
      # seg block L[col_i rows, col_t] reads back from the spliced
      # halfbuf.
      s_i = s_ref[ib:ib + block, :]
      for t in range(i):
        tb = t * block
        seg = halfbuf[pl.ds(loc_i, block), tb:tb + block]
        cols_t = halfbuf[:, tb:tb + block]
        upd = _pdot(cols_t, seg, wdims, precise)
        halfbuf[:, ib:ib + block] = halfbuf[:, ib:ib + block] - upd
        zt = z_ref[pl.ds(jg * group + t, 1), :]
        s_i = s_i + jnp.sum(seg * zt, axis=1, keepdims=True)
      sweep_inner(loc_i, i)
      wt_i = w_all[ib:ib + block, :]
      ld = lt_s[:]
      eye_b = jnp.eye(block, dtype=jnp.float32)
      ld_ref[0, 0] += jnp.sum(jnp.where(eye_b > 0.0, jnp.log(
          jnp.maximum(ld, 1e-30)), 0.0))
      v = y_ref[pl.ds(jg * group + i, 1), :] - s_i.T
      zj = _pdot(v, wt_i, wdims, precise)
      z_ref[pl.ds(jg * group + i, 1), :] = zj
      below = _pdot(halfbuf[:, ib:ib + block], wt_i, wdims, precise)
      row_idx_h = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
      keep = (row_idx_h + row0_d) >= col_abs + block
      below = jnp.where(keep, below, 0.0)
      halfbuf[:, ib:ib + block] = below
      # Diagonal block spliced TRANSPOSED (lt = L_D^T, upper-tri of L
      # masked): correction strips/lbuf tiles of later groups never
      # read earlier diagonal blocks (their rows lie strictly above
      # every later row range), so only the exported L sees it — the
      # wrapper re-transposes diag blocks when return_l=True. This
      # avoids a ~50 us (B, B) in-kernel transpose per inner column.
      triu_b = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
                <= jax.lax.broadcasted_iota(jnp.int32, (block, block), 1))
      l_dt = jnp.where(triu_b, lt_s[:], 0.0)
      halfbuf[pl.ds(loc_i, block), ib:ib + block] = l_dt

    if group > 1:
      # Cache the strictly-below-diagonal in-group seg blocks for the
      # below halves (read from the spliced rows). Compressed layout:
      # one (B, B) block per (i, t) pair with i > t.
      for i in range(1, group):
        for t in range(i):
          ofs = _seg_ofs(i, t, group) * block
          seg_ref[ofs:ofs + block, :] = halfbuf[
              pl.ds(pl.multiple_of(loc0 + i * block, block), block),
              t * block:(t + 1) * block]

    def store_half(row0):
      # All group column stores in flight together (per-slot correction
      # semaphores are idle here), then one wait pass.
      copies = []
      for i in range(group):
        co = pltpu.make_async_copy(
            halfbuf.at[:, i * block:(i + 1) * block],
            l_hbm.at[jg * group + i, pl.ds(row0, half), :],
            sem_s.at[i % slots] if i < slots else sem_out)
        co.start()
        copies.append(co)
      for co in copies:
        co.wait()

    store_half(row0_d)

    # --- strictly-below halves ---
    def half_step(h, _):
      row0 = h * half
      corr_prestart(jg * group, row0, gcol0)
      tile_h = gram_tile(h)

      @pl.when(h + 1 < n_halves)
      def _():
        xa_copy(h + 1, jax.lax.rem(h + 1, 2)).start()

      halfbuf[:] = tile_h
      corrections(jg, row0, gcol0, with_solve=False)
      for i in range(group):
        ib = i * block
        for t in range(i):
          tb = t * block
          ofs = _seg_ofs(i, t, group) * block
          seg = seg_ref[ofs:ofs + block, :]
          upd = _pdot(halfbuf[:, tb:tb + block], seg, wdims, precise)
          halfbuf[:, ib:ib + block] = halfbuf[:, ib:ib + block] - upd
        halfbuf[:, ib:ib + block] = _pdot(
            halfbuf[:, ib:ib + block], w_all[ib:ib + block, :], wdims,
            precise)
      store_half(row0)
      return 0

    jax.lax.fori_loop(h0 + 1, n_halves, half_step, 0)
    return 0

  ld_ref[0, 0] = 0.0
  jax.lax.fori_loop(0, ng, panel_group, 0)
  quad_ref[0, 0] = jnp.sum(z_ref[:] * z_ref[:])


@functools.partial(jax.jit, static_argnames=('block', 'half', 'precise',
                                             'mode', 'mb', 'slots',
                                             'group', 'scoped_sweep',
                                             'sweep_unroll',
                                             'hier_sweep', 'value_sweep',
                                             'pivot_mode', 'kfam',
                                             'return_l', 'force_zero_init',
                                             'interpret'))
def mll_fused_g(x_scaled: jnp.ndarray, y: jnp.ndarray,
                signal_variance, diag_add, block: int = 256,
                half: int = 1024, precise: bool = True,
                mode: str = 'full', mb: int = 32, slots: int = 2,
                group: int = 2, scoped_sweep: bool = False,
                sweep_unroll: int = 32,
                hier_sweep: bool = False,
                value_sweep: bool = True,
                pivot_mode: str = 'octv',
                return_l: bool = False,
                force_zero_init: bool = False,
                valid=None,
                kfam: str = 'se',
                interpret: bool = False):
  """Grouped panel-major fused GP NLL (v11; _kernel_mll_g).

  `kfam` selects the stationary kernel family applied to the raw
  squared-distance tiles (_gram_transform): 'se' (default), 'matern32'
  or 'matern52' — everything else in the kernel (panel factorization,
  solve taps, logdet) is family-independent because k(0) = sv for all
  three.

  `valid` ((n,) 0/1 floats, optional) masks padded rows EXACTLY through
  the distance embedding: two extra feature lanes add a penalty
  P_i + P_j (P = _PENALTY[kfam] on padded rows) to every squared
  distance touching a padded row, driving those Gram entries to
  k(sqrt(P)) ~ 0 — including the padded diagonal, which becomes exactly
  diag_add (the caller corrects the logdet analytically). Small exact
  adds — no large-sentinel f32 cancellation — and the kernel body is
  unchanged.
  """
  n, d = x_scaled.shape
  half = min(half, n)
  gb = group * block
  assert (n % block == 0 and n % half == 0 and half % gb == 0 and
          n % gb == 0), (n, block, half, group)
  assert mode in ('full', 'nosweep', 'dmaonly', 'sweepx2',
                  'sweepnw', 'sweepnp'), mode
  assert block % mb == 0 and mb % 2 == 0, (block, mb)
  nb = n // block
  xs32 = x_scaled.astype(jnp.float32)
  sqn = jnp.sum(xs32 * xs32, axis=1, keepdims=True)
  onev = jnp.ones((n, 1), jnp.float32)
  feat = 128
  if valid is None:
    assert d + 2 <= feat, d
    pad = jnp.zeros((n, feat - d - 2), jnp.float32)
    acols = [-2.0 * xs32, sqn, onev, pad]
    bcols = [xs32, onev, sqn, pad]
  else:
    assert d + 4 <= feat, d
    pen = _PENALTY[kfam] * (1.0 - valid.astype(jnp.float32).reshape(n, 1))
    pad = jnp.zeros((n, feat - d - 4), jnp.float32)
    acols = [-2.0 * xs32, sqn, onev, pen, onev, pad]
    bcols = [xs32, onev, sqn, onev, pen, pad]
  xa = jnp.concatenate(acols, axis=1).reshape(n // half, half, feat)
  xb = jnp.concatenate(bcols, axis=1).reshape(n // gb, gb, feat)
  y_pm = y.astype(jnp.float32).reshape(nb, block)
  sv = jnp.asarray(signal_variance, jnp.float32).reshape(1, 1)
  da = jnp.asarray(diag_add, jnp.float32).reshape(1, 1)
  assert not (hier_sweep and block % 2), block
  assert kfam in _KFAMS, kfam
  assert pivot_mode in ('scalar', 'vector', 'pair', 'pairv', 'quadv',
                        'octv', 'hexv'), pivot_mode
  if not (value_sweep and sweep_unroll >= mb):
    # Block pivots exist only in the value-carried all-static sweep;
    # normalize explicitly (numerics identical, and the jit cache then
    # keys on what actually runs) instead of silently ignoring the
    # requested mode inside the kernel.
    pivot_mode = 'scalar'
  # Scratch buffers that the selected sweep variant never touches are
  # allocated as minimal (8, 128) dummies: the remote toolchain's
  # scoped-VMEM accounting (16 MB limit as of 2026-08-17, measured
  # 16.12M for the default config with full allocations) counts them
  # whether used or not, and the default value-carried static sweep
  # uses neither the fori top/bot buffers nor the five hier-sweep
  # blocks (_sweep_fori writes top/bot only when
  # `not (values and unroll >= mb)`; sweep_inner_hier only runs under
  # hier_sweep).
  dummy = (8, 128)
  topbot_shape = ((mb, block)
                  if not (value_sweep and sweep_unroll >= mb) else dummy)
  hier_shape = (block // 2, block // 2) if hier_sweep else dummy
  subsweep_shape = (mb, block // 2) if hier_sweep else dummy
  # zero_init normally follows return_l (the zero pass only matters for
  # an exported L); force_zero_init decouples them as a toolchain-
  # bisect/fallback axis (round 4: the zero-skip variant crashes the
  # updated remote compile-helper).
  kernel = functools.partial(_kernel_mll_g, n, d, block, half, precise,
                             mode, mb, slots, group, scoped_sweep,
                             sweep_unroll, return_l or force_zero_init,
                             hier_sweep, value_sweep, pivot_mode, kfam)
  l_pm, quad, ld = pl.pallas_call(
      kernel,
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),            # xa tiles
          pl.BlockSpec(memory_space=pl.ANY),            # xb tiles
          pl.BlockSpec(memory_space=pltpu.VMEM),        # y panel-major
          pl.BlockSpec(memory_space=pltpu.SMEM),        # sv
          pl.BlockSpec(memory_space=pltpu.SMEM),        # diag_add
      ],
      out_specs=(
          pl.BlockSpec(memory_space=pl.ANY),            # L panels
          pl.BlockSpec(memory_space=pltpu.SMEM),        # quad
          pl.BlockSpec(memory_space=pltpu.SMEM),        # logdet
      ),
      out_shape=(
          jax.ShapeDtypeStruct((nb, n, block), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ),
      scratch_shapes=[
          pltpu.VMEM((half, gb), jnp.float32),          # halfbuf
          pltpu.VMEM((slots, half, block), jnp.float32),   # lbuf
          pltpu.VMEM((slots, gb, block), jnp.float32),     # strip
          pltpu.VMEM((block, block), jnp.float32),      # lt_s
          pltpu.VMEM((gb, block), jnp.float32),         # w_all
          pltpu.VMEM((max(1, group * (group - 1) // 2) * block, block),
                     jnp.float32),                    # seg cache
          pltpu.VMEM((nb, block), jnp.float32),         # z
          pltpu.VMEM((gb, 1), jnp.float32),             # s partial
          pltpu.VMEM((2, half, 128), jnp.float32),      # xa tiles (x2)
          pltpu.VMEM((gb, 128), jnp.float32),           # xb tile
          pltpu.VMEM(topbot_shape, jnp.float32),        # sweep top
          pltpu.VMEM(topbot_shape, jnp.float32),        # sweep bot
          pltpu.VMEM(hier_shape, jnp.float32),          # lt_a
          pltpu.VMEM(hier_shape, jnp.float32),          # w_a
          pltpu.VMEM(hier_shape, jnp.float32),          # lt_b
          pltpu.VMEM(hier_shape, jnp.float32),          # w_b
          pltpu.VMEM(hier_shape, jnp.float32),          # d22
          pltpu.VMEM(subsweep_shape, jnp.float32),      # sub-sweep top
          pltpu.VMEM(subsweep_shape, jnp.float32),      # sub-sweep bot
          pltpu.SemaphoreType.DMA((slots,)),            # sem_l
          pltpu.SemaphoreType.DMA((slots,)),            # sem_s
          pltpu.SemaphoreType.DMA((2,)),                # sem_x
          pltpu.SemaphoreType.DMA,                      # sem_out
      ],
      compiler_params=pallas_params.compiler_params(has_side_effects=True),
      interpret=interpret,
  )(xa, xb, y_pm, sv, da)
  if return_l == 'panels':
    # Raw panel-major factor: no diag fix, no dense transpose — the
    # consumer (ops/pallas_triinv with panel_input=True,
    # diag_transposed=True) reads panel blocks directly and corrects
    # the transposed diagonal storage inside its batched diag-inverse
    # solve. Above-diagonal rows of every panel are exact zeros (the
    # zero pass runs whenever L is exported).
    return l_pm, quad[0, 0], ld[0, 0]
  if return_l:
    # The kernel stores diagonal (B, B) blocks transposed; fix them IN
    # the panel-major layout — a (nb, B, B) gather/scatter — before the
    # single dense-layout transpose. The previous dense-side fix cost
    # two extra full n^2 transpose materializations (~1.3 ms of HBM
    # traffic at n=8192 inside the VJP forward).
    return panels_to_dense_tri(l_pm, block), quad[0, 0], ld[0, 0]
  return quad[0, 0], ld[0, 0]


def panels_to_dense_tri(l_pm: jnp.ndarray, block: int) -> jnp.ndarray:
  """Panel-major (nb, n, B) factor with transposed diagonal blocks (the
  fused forward kernel's return_l='panels' storage convention: l_pm[p]
  holds all n rows of column-panel p, diagonal block = row-block p of
  panel p, stored transposed) -> dense lower-triangular (n, n). Shared
  by the return_l=True branch above and the distributed coarse-block
  route (parallel/large.py)."""
  nb, n, _ = l_pm.shape
  idx = jnp.arange(nb)
  blocks = l_pm.reshape(nb, nb, block, block)         # [panel, rowblk]
  diagb = blocks[idx, idx]                            # (nb, B, B)
  blocks = blocks.at[idx, idx].set(jnp.swapaxes(diagb, -1, -2))
  return jnp.moveaxis(blocks.reshape(nb, n, block), 0, 1).reshape(n, n)


def _poison_non_pd(l, nll):
  """NaN-propagate a failed factorization (wrapper-side, kernel-free).

  The in-kernel sweeps clamp non-positive pivots
  (rsqrt(max(akk, 1e-30))) and floor the logdet terms, so an
  indefinite K — hyperparameter drift to tiny noise/lengthscale at
  f32 — would otherwise come back as large-but-finite garbage NLL and
  gradients that Adam happily applies. A clamped pivot leaves
  diag(L) = akk * rsqrt(1e-30) <= 0 in the exported factor, so
  min(diag) <= 0 detects the event with plain XLA ops (no Mosaic
  change). Poison L too: every backward product then propagates NaN,
  matching the dense lax.linalg.cholesky path whose NaN triggers the
  trainers' isfinite-freeze (same contract as pallas_batch_chol).
  Value-only evaluation (the no-grad primal) skips return_l and keeps
  the clamp semantics — only training paths pay the n^2 select.

  Accepts L dense (n, n) or panel-major (nb, n, B) with transposed
  diagonal-block storage — a block's diagonal entries are transpose-
  invariant, so the detection is layout-independent.
  """
  if l.ndim == 3:
    nb, _, b = l.shape
    idx = jnp.arange(nb)
    diagd = jnp.diagonal(l.reshape(nb, nb, b, b)[idx, idx],
                         axis1=-2, axis2=-1)
    bad = jnp.min(diagd) <= 0.0
  else:
    bad = jnp.min(jnp.diagonal(l)) <= 0.0
  nanf = jnp.float32(jnp.nan)
  return jnp.where(bad, nanf, l), jnp.where(bad, nanf, nll)


@functools.lru_cache(maxsize=None)
def _se_nll_core_fn(block: int, half: int, group: int, interpret: bool,
                    sweep_unroll: int = 32, kfam: str = 'se',
                    pivot_mode: str = 'octv',
                    force_zero: bool = False,
                    bwd_cfg=None):
  """Differentiable fused NLL core: nll_core(x_scaled, delta, sv, da).

  Returns 0.5 y^T K^{-1} y + sum(log diag L) for
  K = sv * k_fam(||xi - xj||^2) + da * I (kfam one of _KFAMS; for SE
  k = exp(-0.5 r2) — the 0.5 n log 2pi constant
  stays with the caller). The primal runs the fused Pallas kernel; the
  custom VJP (round-3 verdict item 1 — the reference's pre-training
  loop differentiates this objective per step,
  /root/reference/hyperbo/gp_utils/gp.py:124-146) reuses the kernel's L
  factor, which the kernel materializes in HBM anyway:

    G := dnll/dK = 0.5 (K^{-1} - alpha alpha^T),  alpha = K^{-1} delta
    d/d delta = alpha
    d/d sv    = sum(G o E) / sv        (E = the exp factor = (K - da I)/sv)
    d/d da    = tr(G)
    d/d x_i   = 2 [(W x)_i - (W 1)_i x_i],  W = G o (sv E)

  K^{-1} comes from ONE n-RHS triangular solve (L^{-1}) plus ONE MXU
  GEMM (L^{-T} L^{-1}) — cheaper on TPU than two chained solves. All
  n x n products run at HIGH (X3 / 3-pass bf16) precision to match the
  forward kernel's accuracy class.
  """

  @jax.custom_vjp
  def core(x_scaled, delta, sv, da):
    quad, ld = mll_fused_g(x_scaled, delta, sv, da, block=block,
                           half=half, group=group,
                           sweep_unroll=sweep_unroll, kfam=kfam,
                           pivot_mode=pivot_mode,
                           force_zero_init=force_zero,
                           interpret=interpret)
    return 0.5 * quad + ld

  def fwd(x_scaled, delta, sv, da):
    # Save L panel-major when the backward will consume it through the
    # panel-input Pallas tri-inv (skips the n^2 dense transpose here
    # AND makes every tri-inv L read contiguous); dense otherwise.
    from hyperbo_tpu.ops import pallas_mll_bwd
    ret_l = ('panels'
             if (block == pallas_mll_bwd.BLOCK
                 and _bwd_panel_l_route(x_scaled.shape[0], bwd_cfg))
             else True)
    l, quad, ld = mll_fused_g(x_scaled, delta, sv, da, block=block,
                              half=half, group=group,
                              sweep_unroll=sweep_unroll,
                              return_l=ret_l,
                              kfam=kfam, pivot_mode=pivot_mode,
                              interpret=interpret)
    l, nll = _poison_non_pd(l, 0.5 * quad + ld)
    return nll, (l, x_scaled, delta, sv, da)

  def bwd(res, g):
    l, x_scaled, delta, sv, da = res
    d_x, d_delta, d_sv, d_da = _se_core_bwd(l, x_scaled, delta, sv,
                                            None, kfam,
                                            interpret=interpret,
                                            bwd_cfg=bwd_cfg)
    return (g * d_x, g * d_delta, g * d_sv, g * d_da)

  core.defvjp(fwd, bwd)
  return core


def _tri_inv(l, blocked=False):
  """L^{-1} for the VJP backward: XLA solve or blocked GEMMs.

  Measured round 3 (n=8192): isolated, tri_inv_blocked beats the XLA
  n-RHS solve (4.5 vs 5.4 ms) — but INSIDE the full value_and_grad
  graph the recursive concatenate tree interacted badly with XLA's
  scheduling/rematerialization and the whole step ballooned
  67 -> 111 ms, so the solve was the default. The 2026-08-18 toolchain
  reversed this: the XLA n-RHS solve regressed 5.4 -> 37.7 ms while
  the blocked inverse runs 14.7 ms isolated and 32.35 ms for the full
  value_and_grad (benchmarks/r5_retune_probe.py), so blocked is now
  the TPU default (HYPERBO_BWD_TRIINV=0 opts back into the solve).
  """
  if blocked:
    from hyperbo_tpu.ops import linalg as linalg_mod
    return linalg_mod.tri_inv_blocked(l)
  return jax.lax.linalg.triangular_solve(
      l, jnp.eye(l.shape[-1], dtype=l.dtype), left_side=True,
      lower=True)


def _bwd_env_config():
  """Resolve the backward's env knobs to a hashable config tuple.

  (fused, kinv_mode, prec_mode, triinv):
    HYPERBO_BWD_FUSED=1  — route through the fused Pallas backward
      kernel (ops/pallas_mll_bwd; K^{-1}/G/W never reach HBM);
    HYPERBO_BWD_KINV=syrk — triangular-aware block-column K^{-1}
      (n^3 FLOPs instead of 2n^3; the classic LAUUM trick);
    HYPERBO_BWD_PREC=default — single-pass bf16 backward products
      (2x MXU rate; ~1e-3 gradient class instead of ~1e-4);
    HYPERBO_BWD_TRIINV — how L^{-1} is produced for the backward:
      '0' = XLA n-RHS triangular solve, '1' = blocked-GEMM recursion
      (ops/linalg.tri_inv_blocked), 'pallas' = the panel-major Pallas
      kernel (ops/pallas_triinv; only reachable on the fused-bwd route,
      where it also skips the dense->panel transpose pass; falls back
      to the recursion when the shape doesn't divide its chunk grid),
      'pallas<R>' (e.g. 'pallas4') = the same kernel's 2-D tiled sweep
      with R row-blocks per pass (shares T-strip chunks across the
      tile's rows — see _kernel_triinv_tiled).

  Resolved at the se_nll_fused entry points and threaded INTO the
  custom-VJP core factories' lru_cache keys, so flipping a knob after
  a first gradient call takes effect (a trace-time env read inside the
  cached core would silently keep the old backward).

  Defaults are platform-aware. On TPU the fused backward kernel plus
  the PANEL-MAJOR PALLAS triangular inverse are ON: measured on the
  2026-08-19 toolchain (benchmarks/r7_triinv_probe.py, full
  value_and_grad) pallas beats the blocked recursion 26.9 vs 32.5 ms
  at n=8192 and 142.7 vs 181.5 ms at n=16384, values matching to
  ~1e-6 relative; the recursion remains the in-code fallback for
  shapes off the kernel's chunk grid. Bare 'pallas' resolves to the
  size-aware measured winners of the r9/r10 tile/chunk ladders
  (rows=4, group=2, chunk 512/1024 below/at n=16384 — full VG 24.3 /
  129.2 ms). (History: fused+recursion was retuned on 2026-08-18 —
  32.35 ms vs 52.7 ms old default vs 141 ms dense at n=8192.) On CPU
  everything stays OFF: the interpret-mode kernel is test-only and
  the XLA solve is the fast path there.
  """
  import os
  import jax
  on_tpu = jax.default_backend() not in ('cpu',)
  return (os.environ.get('HYPERBO_BWD_FUSED',
                         '1' if on_tpu else '0') == '1',
          os.environ.get('HYPERBO_BWD_KINV', 'gemm'),
          os.environ.get('HYPERBO_BWD_PREC', 'high'),
          os.environ.get('HYPERBO_BWD_TRIINV',
                         'pallas' if on_tpu else '0'))


def _kinv_from_linv(linv, precision, mode='gemm'):
  """K^{-1} = L^{-T} L^{-1}; mode='syrk' exploits the triangularity:
  column block j of K^{-1} is linv[j:, :]^T @ linv[j:, j:j+b] (rows
  above j of the j-th column block of linv are zero), n^3 FLOPs
  instead of the plain GEMM's 2n^3."""
  if mode == 'syrk':
    n = linv.shape[0]
    for b in (512, 256, 128):
      if n % b == 0 and b < n:
        cols = []
        for j in range(0, n, b):
          tail = linv[j:, :]
          cols.append(jnp.matmul(tail.T, tail[:, j:j + b],
                                 precision=precision))
        return jnp.concatenate(cols, axis=1)
  return jnp.matmul(linv.T, linv, precision=precision)


def _bwd_fused_wanted(n, fused_flag):
  if not fused_flag:
    return False
  from hyperbo_tpu.ops import pallas_mll_bwd as pb
  # n cap: the kernel's (n, 128) VMEM P-accumulator is n * 512 bytes —
  # beyond MAX_N it would cross the 16 MB scoped-vmem limit.
  return n % pb.CHUNK == 0 and n <= pb.MAX_N


def _norm_triinv(triinv):
  # Back-compat: older probes/tests thread booleans through bwd_cfg.
  if triinv is True:
    return '1'
  if triinv is False:
    return '0'
  return triinv


def _bwd_panel_l_route(n, bwd_cfg):
  """True when _se_core_bwd resolves (n, bwd_cfg) to the panel-major
  Pallas triangular inverse. The custom-VJP fwd then saves the L
  residual panel-major straight off the forward kernel
  (mll_fused_g return_l='panels'): no n^2 dense transpose in the fwd,
  and every L read inside the tri-inv sweep is a contiguous panel
  block instead of a B-row strided window (the r9-measured overhead).
  MUST mirror the dispatch condition in _se_core_bwd exactly.

  HYPERBO_BWD_PANEL_L=0 (trace-time, like HYPERBO_TRIINV_PANEL_LAYOUT)
  disables panel saving: the fwd exports dense L and the Pallas
  tri-inv runs with its dense strided-window reads — the r10-measured
  configuration, kept as an A/B hook and a toolchain-drift fallback."""
  if bwd_cfg is None:
    return False
  if os.environ.get('HYPERBO_BWD_PANEL_L', '1') == '0':
    return False
  fused_flag, _, _, triinv = bwd_cfg
  triinv = _norm_triinv(triinv)
  if not (isinstance(triinv, str) and triinv.startswith('pallas')):
    return False
  if not _bwd_fused_wanted(n, fused_flag):
    return False
  from hyperbo_tpu.ops import pallas_mll_bwd
  return n % pallas_triinv.CHUNK == 0 and n >= 2 * pallas_mll_bwd.BLOCK


def _bwd_tile_config(n):
  """SYRK pair-tile knob of the fused backward (trace-time env, like
  HYPERBO_TRIINV_PANEL_LAYOUT): HYPERBO_BWD_TILE='RxG' or 'RxGxC'
  selects the 2-D tiled pass with an RI x GJ pair tile (and an
  optional DMA-chunk override) — shares strip DMAs across the tile,
  (RI+GJ)/(2*RI*GJ) of the sequential kernel's traffic. Defaults are
  the size-aware r12 ladder winners (PERF.md: full VG 21.4 -> 20.5 ms
  at n=8192 with 4x4x256, 119.5 -> 109.2 ms at n=16384 with 2x4x512);
  '1x1' restores the sequential kernel."""
  from hyperbo_tpu.ops import pallas_mll_bwd
  tile = os.environ.get(
      'HYPERBO_BWD_TILE',
      '2x4x512' if n >= 16384 else '4x4x256')
  tparts = tile.split('x')
  brows = int(tparts[0])
  bgroup = int(tparts[1]) if len(tparts) > 1 else 1
  bchunk = (int(tparts[2]) if len(tparts) > 2
            else pallas_mll_bwd.CHUNK)
  if n % bchunk:
    bchunk = pallas_mll_bwd.CHUNK
  return brows, bgroup, bchunk


def _se_core_bwd(l, x_scaled, delta, sv, valid, kfam='se',
                 interpret=False, bwd_cfg=None):
  """Shared closed-form adjoints for the fused NLL cores.

  G = dnll/dK = 0.5 (K^{-1} - alpha alpha^T) from the saved factor;
  chain rule onto (x_scaled, delta, sv, da). Per family, with
  r2_ij = ||xi - xj||^2 (of scaled inputs):

    d/d sv = sum(G o K_offdiagless) / sv   (K here excludes diag_add)
    d/d x  needs W = G o (-2 dk/dr2):
      se:       -2 dk/dr2 = sv exp(-r2/2)            (= k itself)
      matern32: -2 dk/dr2 = 3 sv exp(-r),     r = sqrt(3 r2)
      matern52: -2 dk/dr2 = (5/3) sv (1+r) exp(-r), r = sqrt(5 r2)
    then d/d x_i = 2 [(W x)_i - (W 1)_i x_i] — the Matern adjoints are
    smooth at r = 0 (no safe-sqrt clamp needed; the coincident-point
    limit of the true derivative is 0 and this form realizes it).

  With `valid` set, the kernel factors are masked by valid_i * valid_j
  to match the penalty-masked forward kernel (padded Gram entries ~ 0,
  padded diagonal = da — so d/d da stays the full trace).
  """
  if bwd_cfg is None:
    bwd_cfg = _bwd_env_config()
  fused_flag, kinv_mode, prec_mode, triinv = bwd_cfg
  triinv = _norm_triinv(triinv)
  hi = (jax.lax.Precision.DEFAULT if prec_mode == 'default'
        else jax.lax.Precision.HIGH)
  # l.ndim == 3: the fwd saved the residual panel-major (nb, n, B)
  # because _bwd_panel_l_route held — it must resolve to the Pallas
  # tri-inv branch below (no other consumer understands panels).
  panel_l = l.ndim == 3
  n = l.shape[1] if panel_l else l.shape[-1]
  if panel_l:
    assert _bwd_panel_l_route(n, (fused_flag, kinv_mode, prec_mode,
                                  triinv)), (l.shape, bwd_cfg)
  if _bwd_fused_wanted(n, fused_flag):
    from hyperbo_tpu.ops import pallas_mll_bwd
    block = pallas_mll_bwd.BLOCK
    if (triinv.startswith('pallas') and n % pallas_triinv.CHUNK == 0
        and n >= 2 * block):
      # Panel-major Pallas inverse: writes T directly in the layout the
      # fused backward kernel consumes — no dense L^{-1}, no transpose.
      # 'pallas<R>' (e.g. 'pallas4') selects the 2-D tiled sweep with
      # R row-blocks per pass; 'pallas<R>x<G>' additionally overrides
      # the panel group and 'pallas<R>x<G>x<C>' the DMA chunk rows;
      # bare 'pallas' is the 1-D grouped sweep.
      rows, group, chunk = 1, pallas_triinv.GROUP, pallas_triinv.CHUNK
      if len(triinv) > 6:
        parts = triinv[6:].split('x')
        rows = int(parts[0])
        if len(parts) > 1:
          group = int(parts[1])
        if len(parts) > 2:
          chunk = int(parts[2])
      else:
        # Bare 'pallas': size-aware measured winners (r9/r10 ladders,
        # PERF.md): the 2-D tile shares T-strip chunks across rows and
        # the wider DMA chunk pays off once the panel chains are long.
        rows, group = 4, 2
        chunk = 1024 if n >= 16384 else 512
      if n % chunk:
        chunk = pallas_triinv.CHUNK
      # Trace-time env knob (like _bwd_env_config): how panel-input L
      # blocks land in VMEM — 'wide' (dense-identical compute) or
      # 'blocks' (per-kk dots). No effect on dense-L input. 'blocks'
      # measured fastest on hardware at both sizes (r11 ladder,
      # PERF.md: 28.59 vs 28.92 ms n=8192, 57.55 vs 58.71 n=16384;
      # full VG 21.43/119.00 vs 21.55/119.01).
      layout = os.environ.get('HYPERBO_TRIINV_PANEL_LAYOUT', 'blocks')
      brows, bgroup, bchunk = _bwd_tile_config(n)
      # HYPERBO_BWD_JOINT=1 (trace-time) fuses tri-inv + alpha + SYRK
      # into ONE kernel (ops/pallas_bwd_joint): u = T delta rides the
      # tri-inv's serial corner, alpha streams only the nonzero half
      # of T, and the padded (n, 1) alpha/valid VMEM inputs disappear.
      from hyperbo_tpu.ops import pallas_bwd_joint
      if (os.environ.get('HYPERBO_BWD_JOINT', '0') == '1'
          and x_scaled.shape[1] + 2 <= pallas_bwd_joint.ULANE):
        d_x, alpha, dsv_raw, d_da = pallas_bwd_joint.mll_bwd_joint(
            l, x_scaled, delta, sv, valid, block=block,
            ti_chunk=chunk, ti_rows=rows, ti_group=group,
            ti_layout=layout, sy_chunk=bchunk, sy_rows=brows,
            sy_group=bgroup, precise=(prec_mode != 'default'),
            kfam=kfam, panel_input=panel_l, diag_transposed=panel_l,
            interpret=interpret)
        return d_x, alpha, dsv_raw / sv, d_da
      tpm = pallas_triinv.tri_inv_panels(
          l, block=block, chunk=chunk, group=group,
          rows=rows, precise=(prec_mode != 'default'),
          panel_input=panel_l, diag_transposed=panel_l,
          panel_layout=layout, interpret=interpret)
      alpha = pallas_triinv.alpha_from_panels(tpm, delta, precision=hi)
    else:
      linv = _tri_inv(l, blocked=(triinv != '0'))
      tpm = jnp.moveaxis(linv.reshape(n, n // block, block), 1, 0)
      alpha = jnp.matmul(linv.T, jnp.matmul(linv, delta, precision=hi),
                         precision=hi)
      brows, bgroup, bchunk = _bwd_tile_config(n)
    # HYPERBO_BWD_PREC=default also drops the kernel's in-VMEM dots to
    # single-pass bf16 (the SYRK is a pure reduction — unlike the
    # factorization/tri-inv recursions the error does not compound),
    # matching what the knob already does to the XLA-side products.
    d_x, dsv_raw, d_da = pallas_mll_bwd.mll_bwd_fused(
        tpm, x_scaled, alpha, sv, block=block,
        chunk=bchunk, kfam=kfam, valid=valid,
        rows=brows, group=bgroup, precise=(prec_mode != 'default'),
        interpret=interpret)
    return d_x, alpha, dsv_raw / sv, d_da
  if (fused_flag and not panel_l
      and os.environ.get('HYPERBO_BWD_COARSE', '1') == '1'):
    # Beyond MAX_N: coarse two-level backward — the existing kernels
    # per <= MAX_N diagonal block, XLA GEMMs (64-bit-safe offsets) for
    # every cross term. Replaces the dense O(n^3)-rate fallback
    # (9.04 s/step at n=32768, PERF.md r15) without new Mosaic surface
    # (the r14 int32-offset refutation class). HYPERBO_BWD_COARSE=0
    # (trace-time) restores the dense chain.
    from hyperbo_tpu.ops import coarse_bwd as cb
    if cb.coarse_split(n):
      d_x, alpha, dsv_raw, d_da = cb.coarse_bwd(
          l, x_scaled, delta, sv, valid=valid, kfam=kfam,
          precise=(prec_mode != 'default'), triinv=triinv,
          interpret=interpret)
      return d_x, alpha, dsv_raw / sv, d_da
  linv = _tri_inv(l, blocked=(triinv != '0'))
  kinv = _kinv_from_linv(linv, hi, mode=kinv_mode)
  # alpha via the explicit inverse (2n^2 matvec) instead of two chained
  # 1-RHS triangular solves: at n=8192 each solve is a ~n/block-step
  # sequential while loop (latency-bound, several ms) while kinv is
  # already materialized for G. Same accuracy class as kinv itself.
  alpha = jnp.matmul(kinv, delta, precision=hi)
  gmat = 0.5 * (kinv - jnp.matmul(alpha, alpha.T, precision=hi))
  sqn = jnp.sum(x_scaled * x_scaled, axis=1, keepdims=True)
  r2 = jnp.maximum(sqn + sqn.T - 2.0 * jnp.matmul(x_scaled, x_scaled.T,
                                                  precision=hi), 0.0)
  from hyperbo_tpu.ops.pallas_mll_bwd import _km_nm
  kmat, neg2kp = _km_nm(r2, sv, kfam)  # shared per-family forms
  if valid is not None:
    vv = valid.astype(jnp.float32).reshape(-1, 1)
    pair = vv * vv.T
    kmat = kmat * pair
    neg2kp = neg2kp * pair
  w = gmat * neg2kp
  d_sv = jnp.sum(gmat * kmat) / sv
  d_da = jnp.trace(gmat)
  wsum = jnp.sum(w, axis=1, keepdims=True)
  d_x = 2.0 * (jnp.matmul(w, x_scaled, precision=hi) - wsum * x_scaled)
  return d_x, alpha, d_sv, d_da


def _fused_env_config(sweep_unroll):
  """Resolve fused-kernel config env overrides.

  HYPERBO_FUSED_UNROLL / HYPERBO_FUSED_PIVOT / HYPERBO_FUSED_ZERO let a
  deployment pick a compiling configuration when the remote toolchain
  drifts (round 4: a 16 MB scoped-vmem limit rejects some configs that
  previously compiled) without touching code.
  """
  import os
  unroll = int(os.environ.get('HYPERBO_FUSED_UNROLL', sweep_unroll))
  pivot = os.environ.get('HYPERBO_FUSED_PIVOT', 'octv')
  force_zero = os.environ.get('HYPERBO_FUSED_ZERO', '0') == '1'
  return unroll, pivot, force_zero


def _fused_kernel_table():
  """cov_func identity -> (kernel family, embedding kind) for every
  kernel the fused path serves: the SE and Matern families, raw or
  over MLP/Kumar embeddings (reference hyperbo/gp_utils/kernel.py:
  63-123 base forms, 148-222 embedded variants). dot_product is
  excluded by design: its Gram is ONE rank-d matmul (no transcendental
  epilogue), which the XLA dense pipeline already fuses optimally."""
  from hyperbo_tpu.models import kernel as kl
  return {
      kl.squared_exponential: ('se', None),
      kl.squared_exponential_mlp: ('se', 'mlp'),
      kl.squared_exponential_kumar: ('se', 'kumar'),
      kl.matern32: ('matern32', None),
      kl.matern32_mlp: ('matern32', 'mlp'),
      kl.matern32_kumar: ('matern32', 'kumar'),
      kl.matern52: ('matern52', None),
      kl.matern52_mlp: ('matern52', 'mlp'),
      kl.matern52_kumar: ('matern52', 'kumar'),
  }


def kernel_family(cov_func) -> str:
  """Fused-path family name ('se'/'matern32'/'matern52') for a library
  kernel; 'se' for None (direct low-level calls default to SE)."""
  if cov_func is None:
    return 'se'
  entry = _fused_kernel_table().get(cov_func)
  if entry is None:
    raise ValueError(
        f'{getattr(cov_func, "__name__", cov_func)!r} is not served by '
        'the fused MLL path (gate with se_nll_fused_applicable)')
  return entry[0]


def _se_embed(params, x, cov_func, warp_func):
  """Inputs the base kernel actually sees: raw, MLP- or Kumar-embedded.

  Kernel-over-MLP is the kernel on embedded inputs (reference
  hyperbo/gp_utils/kernel.py:148-222) — pre-applying the basis function
  here lets the same fused kernel serve every SE/Matern-family
  variant, gradients included (the embedding stays outside the custom
  VJP, so jax.grad flows into mlp/kumar parameters automatically).
  """
  from hyperbo_tpu.core.warp import retrieve_params
  from hyperbo_tpu.models import basis as bf
  name = getattr(cov_func, '__name__', '') if cov_func is not None else ''
  if name.endswith('_mlp'):
    mlp_params, = retrieve_params(params, ['mlp_params'],
                                  warp_func=warp_func)
    return bf.MLP(params.config['mlp_features']).apply(
        {'params': mlp_params}, x)
  if name.endswith('_kumar'):
    kumar_params, = retrieve_params(params, ['kumar_params'],
                                    warp_func=warp_func)
    return bf.KumarWarp().apply({'params': kumar_params}, x)
  return x


def se_nll_fused(mean_func, params, x, y, warp_func=None, eps=1e-6,
                 block: int = 256, half: int = 512, group: int = 2,
                 sweep_unroll: int = 32, cov_func=None,
                 interpret: bool = False):
  """GP NLL for SE/Matern-family kernels via the fused kernel.

  Drop-in value parity with the dense pipeline
  (objectives.neg_log_marginal_likelihood with cov_func any of the
  nine kernels in _fused_kernel_table — squared_exponential /
  matern32 / matern52, raw or *_mlp / *_kumar; diag add = warped
  noise_variance + eps, matching ops/linalg.solve_gp_linear_system).
  Single (n, m=1) task. n not divisible by group*block is handled by
  sentinel-padding up to the next multiple through the masked kernel
  (exact — the penalty lanes remove padded rows from the Gram matrix
  and the logdet surplus is corrected analytically), so any n >=
  group*block qualifies. ~1.6x faster than the XLA dense pipeline at
  n=8192 on v5e AND ~400x closer to the f64 truth (PERF.md round 2).
  Fully differentiable (custom VJP, see _se_nll_core_fn) —
  gradient-based pre-training trains straight through this path.
  """
  from hyperbo_tpu.core.warp import retrieve_params
  lengthscale, signal_variance, noise_variance = retrieve_params(
      params, ['lengthscale', 'signal_variance', 'noise_variance'],
      warp_func=warp_func)
  n = x.shape[0]
  mu = mean_func(params, x, warp_func=warp_func)
  delta = y - jnp.atleast_2d(mu)
  emb = _se_embed(params, x, cov_func, warp_func)
  x_scaled = emb / lengthscale
  if interpret:
    # Interpret mode executes the kernel op-by-op on host: the 8-wide
    # static block-pivot trace is needlessly huge there. The small fori
    # sweep is numerically equivalent (pivot-mode parity is covered by
    # tests/test_pallas_chol.py) and keeps CPU test runs fast.
    sweep_unroll = min(sweep_unroll, 2)
  kfam = kernel_family(cov_func)
  sv = jnp.squeeze(signal_variance)
  da = jnp.squeeze(noise_variance) + eps
  if n % (group * block) != 0:
    # Ragged n: the masked kernel pads to the next group*block multiple
    # internally (value- and gradient-exact vs the dense pipeline).
    return se_nll_fused_masked(
        x_scaled, delta, sv, da, n, block=block, half=half, group=group,
        sweep_unroll=sweep_unroll, kfam=kfam, interpret=interpret)
  unroll, pivot, force_zero = _fused_env_config(sweep_unroll)
  core = _se_nll_core_fn(block, half, group, interpret, unroll,
                         kfam, pivot, force_zero, _bwd_env_config())
  nll_core = core(x_scaled, delta, sv, da)
  return nll_core + 0.5 * n * jnp.log(2 * jnp.pi)


@functools.lru_cache(maxsize=None)
def _se_nll_core_masked_fn(block: int, half: int, group: int,
                           interpret: bool, sweep_unroll: int = 32,
                           kfam: str = 'se', pivot_mode: str = 'octv',
                           force_zero: bool = False,
                           bwd_cfg=None):
  """Masked differentiable fused NLL core (packed-batch support).

  core(x_scaled, delta, sv, da, valid) with valid an (n,) 0/1 mask:
  padded rows are removed from the Gram matrix EXACTLY through the
  embedding penalty lanes (see mll_fused_g `valid`), leaving their
  diagonal at `da` (caller corrects the logdet). The backward pass is
  the same closed form as _se_nll_core_fn with the kernel factors
  masked by valid_i * valid_j — the padded diagonal's dK/d(sv) is
  k(sqrt(2 _PENALTY[kfam])) / sv ~ 0 and its dK/d(da) is 1, matching
  the forward kernel.
  """

  @jax.custom_vjp
  def core(x_scaled, delta, sv, da, valid):
    quad, ld = mll_fused_g(x_scaled, delta, sv, da, block=block,
                           half=half, group=group,
                           sweep_unroll=sweep_unroll, valid=valid,
                           kfam=kfam, pivot_mode=pivot_mode,
                           force_zero_init=force_zero,
                           interpret=interpret)
    return 0.5 * quad + ld

  def fwd(x_scaled, delta, sv, da, valid):
    # Panel-major residual when the backward takes the panel-input
    # Pallas tri-inv (see _se_nll_core_fn.fwd).
    from hyperbo_tpu.ops import pallas_mll_bwd
    ret_l = ('panels'
             if (block == pallas_mll_bwd.BLOCK
                 and _bwd_panel_l_route(x_scaled.shape[0], bwd_cfg))
             else True)
    l, quad, ld = mll_fused_g(x_scaled, delta, sv, da, block=block,
                              half=half, group=group,
                              sweep_unroll=sweep_unroll, valid=valid,
                              return_l=ret_l, kfam=kfam,
                              pivot_mode=pivot_mode,
                              interpret=interpret)
    # Padded rows keep diag(L) = sqrt(da) > 0, so the non-PD check
    # only ever fires on real rows.
    l, nll = _poison_non_pd(l, 0.5 * quad + ld)
    return nll, (l, x_scaled, delta, sv, da, valid)

  def bwd(res, g):
    l, x_scaled, delta, sv, da, valid = res
    d_x, d_delta, d_sv, d_da = _se_core_bwd(l, x_scaled, delta, sv,
                                            valid, kfam,
                                            interpret=interpret,
                                            bwd_cfg=bwd_cfg)
    return (g * d_x, g * d_delta, g * d_sv, g * d_da,
            jnp.zeros_like(valid))

  core.defvjp(fwd, bwd)
  return core


def se_nll_fused_masked(x_scaled, delta_masked, sv, da, count,
                        block: int = 256, half: int = 512,
                        group: int = 2, sweep_unroll: int = 32,
                        kfam: str = 'se',
                        interpret: bool = False):
  """Fused NLL for one PADDED task (packed-batch support).

  Padded rows (index >= count) are masked out of the Gram matrix via
  the embedding penalty (exact in f32), their delta is zeroed, and the
  logdet surplus — each padded diagonal is exactly `da`, where
  models/packed.nll_one_task uses diag_fill = 1 (contribution 0) — is
  subtracted analytically: both value AND gradients match the dense
  masked pipeline. The surplus is ordinary jnp arithmetic outside the
  custom-VJP core, so d/d(da) of the correction is handled by autodiff.

  x_scaled with n not a multiple of group*block is zero-padded up to
  the next multiple here (padded rows are masked out like any other
  sentinel row, so the result is unchanged); callers may hand in any
  n >= group*block.
  """
  gb = group * block
  n_in = x_scaled.shape[0]
  n = -(-n_in // gb) * gb
  if n != n_in:
    x_scaled = jnp.pad(x_scaled, ((0, n - n_in), (0, 0)))
    delta_masked = jnp.pad(delta_masked, ((0, n - n_in), (0, 0)))
  idx = jnp.arange(n)
  valid = (idx < count).astype(jnp.float32)
  xs = jnp.where(valid[:, None] > 0, x_scaled, 0.0)
  delta = jnp.where(valid[:, None] > 0, delta_masked, 0.0)
  if interpret:
    sweep_unroll = min(sweep_unroll, 2)  # see se_nll_fused
  unroll, pivot, force_zero = _fused_env_config(sweep_unroll)
  core = _se_nll_core_masked_fn(block, half, group, interpret,
                                unroll, kfam, pivot, force_zero,
                                _bwd_env_config())
  nll_core = core(xs, delta, sv, da, valid)
  surplus = 0.5 * jnp.log(da) * (n - count)
  return nll_core - surplus + 0.5 * count * jnp.log(2 * jnp.pi)


def se_nll_fused_applicable(cov_func, x, params=None, block: int = 256,
                            group: int = 2, masked: bool = False,
                            y=None) -> bool:
  """True when the fused path can replace the dense NLL pipeline.

  Serves the SE and Matern kernel families, raw or MLP/Kumar-embedded
  (_fused_kernel_table). masked=True reserves the two extra embedding
  lanes the padded-row penalty needs (packed batches). Pass `y` so
  multi-output tasks (y with m > 1 columns, which the kernel's
  panel-major y layout cannot represent) fall back to the dense
  pipeline.
  """
  if y is not None and y.ndim == 2 and y.shape[1] != 1:
    return False
  if not (x.ndim == 2 and x.shape[0] >= group * block):
    return False
  if x.shape[0] % (group * block) != 0:
    # Ragged n rides the masked kernel (sentinel padding) — needs the
    # penalty lanes even in the unmasked caller.
    masked = True
  entry = _fused_kernel_table().get(cov_func)
  if entry is None:
    return False
  _, embed = entry
  if embed is None:
    emb_dim = x.shape[1]
  elif embed == 'kumar':
    emb_dim = x.shape[1]
    if params is None or 'kumar_params' not in params.model:
      return False
  else:  # 'mlp'
    if params is None or 'mlp_params' not in params.model:
      return False
    features = (params.config or {}).get('mlp_features')
    if not features:
      return False
    emb_dim = features[-1]
  return emb_dim + (4 if masked else 2) <= 128
