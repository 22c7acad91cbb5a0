"""Joint fused backward: tri-inv + alpha + SYRK in ONE Pallas kernel.

REFUTED ON HARDWARE (2026-08-19, r13/r14 probes; PERF.md): on the v5e
toolchain the joint kernel returns WRONG d_x (standalone rel 0.13-0.41
vs the verified two-kernel route; the value shifts with the SYRK tile
config, so this is a Mosaic scheduling/semantics divergence — every
interpret-mode test in tests/test_pallas_bwd_joint.py passes), and the
full value_and_grad A/B is timing-NEUTRAL (n=8192: 24.0 vs 24.5 ms;
n=16384: 109.6 vs 109.5 — the XLA scheduler already hides the alpha
glue the fusion targets). Kept for future toolchains / root-causing;
stays OPT-IN via HYPERBO_BWD_JOINT=1 and must NOT be defaulted until a
hardware parity run passes.

The production backward of the fused MLL (ops/pallas_mll._se_core_bwd)
runs three device programs off the forward kernel's panel-major L:

  1. T = L^{-1}           (ops/pallas_triinv, tiled panel sweep)
  2. alpha = T^T (T delta) (two XLA einsums — 2 full-T HBM passes)
  3. SYRK consumption      (ops/pallas_mll_bwd, tiled block-SYRK)

Within one jit program the kernel dispatches are ~us and T transits
HBM either way (the SYRK re-streams it O(nb/tile) times), so a naive
concatenation buys nothing. This kernel instead restructures what sits
BETWEEN the two n^3/6 sweeps:

  * u = T delta accumulates DURING the tri-inv's sequential phase-B
    corner: every finished (B, B) block of T multiplies a delta tile
    once, on MXU issues that slot into the corner's dependency-chain
    bubbles — the first alpha einsum (a full-T HBM pass) disappears.
    delta rides lane 127 of the (B, 128) delta tiles, so the product
    lands in the SAME (n, 128) VMEM P-accumulator the SYRK consumption
    later fills (its x/ones/sqn lanes stay zero until then, and the
    SYRK's own products add exact zeros to lane 127 — xb's pad lanes).
  * alpha^T = u^T T streams the nonzero HALF of T once (panel p rows
    [pB, n)), replacing the second full-T einsum pass; the (1, B) row
    per panel drops out of lane 127 of one X3 dot per chunk.
  * the SYRK consumption reads alpha (and the packed-mask column
    forms) from the in-kernel (nb, B) row buffer, synthesizing (B, 1)
    columns by a depth-1 MXU transpose-by-ones — the padded (n, 1)
    VMEM alpha/valid inputs of the standalone kernel (physically
    n x 128 lanes = 8 MB at n=16384) are gone, which is also what
    lifts the fused backward's n cap to 32768.

Phases P0 (zero-fill T) / P1 (tri-inv + u) / P2 (alpha) / P3 (SYRK)
reuse the standalone kernel bodies (_kernel_triinv_tiled via its
jg/block hooks, _kernel_bwd_tiled via col_transpose/init_pacc) — one
implementation each, embedded here.

Gradient semantics anchor: the reference differentiates this objective
per pre-training step (hyperbo/gp_utils/gp.py:124-146) with the
cached-Cholesky VJP pattern of hyperbo/basics/linalg.py:139-171.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperbo_tpu.ops import pallas_mll_bwd
from hyperbo_tpu.ops import pallas_params
from hyperbo_tpu.ops import pallas_triinv
from hyperbo_tpu.ops.pallas_chol_hbm import _pdot

FEAT = 128
ULANE = FEAT - 1      # lane of the delta tiles / P-accumulator carrying
                      # delta and u = T delta (xa/xb pad lanes keep it 0)
# Largest n the joint kernel admits: the (n, 128) P-accumulator is
# n * 512 bytes (16 MB at 32768) and the padded (n, 1) alpha/valid
# inputs of the standalone kernel are gone — the 64 MiB scoped-VMEM
# budget (ops/pallas_params) fits the production tile configs.
MAX_N = 32768

_RDIMS = (((0,), (0,)), ((), ()))       # a^T @ b (contract sublanes)
_MDIMS = (((1,), (0,)), ((), ()))       # a @ b


def _kernel_joint(n, block, ti_chunk, ti_ig, ti_jg, sy_chunk, sy_ri,
                  sy_gj, precise, kfam, masked, lpm,
                  # inputs
                  l_hbm, dinv_hbm, xa_hbm, xb_hbm, dt_hbm, vrow_ref,
                  sv_ref,
                  # outputs
                  tpm_hbm, pacc_hbm, alpha_hbm, dsv_ref, dda_ref,
                  # scratch: tri-inv phase
                  lrow, tstrip, accbuf, ttile, lc, dbuf, zbuf,
                  sem_l, sem_t, sem_d, sem_lc, sem_w, sem_z,
                  # scratch: SYRK phase
                  ci, cj, xai, xbi, xbj, pacc, sem_c, sem_x, sem_out,
                  # scratch: joint glue
                  dtbuf, sem_dt, arowbuf, sem_a):
  nb = n // block

  # The P-accumulator is zeroed ONCE for the whole kernel: P1 parks
  # u = T delta in lane ULANE, P3 accumulates the W products in the
  # x/ones/sqn lanes (their xb pad lanes add exact zeros to ULANE).
  pacc[:] = jnp.zeros((n, FEAT), jnp.float32)

  # ---- P0 + P1: tri-inv sweep with the u = T delta piggyback ----
  def jg_hook(j0):
    cps = [pltpu.make_async_copy(dt_hbm.at[j0 + g], dtbuf.at[g],
                                 sem_dt.at[g]) for g in range(ti_jg)]
    for cp in cps:
      cp.start()
    for cp in cps:
      cp.wait()

  def block_hook(i0, j0, ii, g):
    # ttile[ii, g] holds the FINAL T block (row i0+ii, panel j0+g) —
    # diagonal blocks carry D_i, above-diagonal blocks exact zeros, so
    # the accumulation needs no guard. Each (row, panel) pair of the
    # lower triangle is visited exactly once across the sweep.
    ib = pl.multiple_of((i0 + ii) * block, block)
    pacc[pl.ds(ib, block), :] += _pdot(ttile[ii, g], dtbuf[g], _MDIMS,
                                       precise)

  pallas_triinv._kernel_triinv_tiled(
      n, block, ti_chunk, ti_ig, ti_jg, precise, lpm,
      l_hbm, dinv_hbm, tpm_hbm,
      lrow, tstrip, accbuf, ttile, lc, dbuf, zbuf,
      sem_l, sem_t, sem_d, sem_lc, sem_w, sem_z,
      jg_hook=jg_hook, block_hook=block_hook)

  # ---- P2: alpha^T = u^T T, streaming the nonzero half of T ----
  # Panel p contributes rows [align_down(pB, chunk), n); rows above pB
  # are exact zeros (P0's fill). Reuses the SYRK's ci strip buffers.
  ncz = n // sy_chunk

  def p_loop(p, _):
    c0 = jax.lax.div(p * block, sy_chunk)
    nch = ncz - c0

    def strip(c, slot):
      return pltpu.make_async_copy(
          tpm_hbm.at[p, pl.ds((c0 + c) * sy_chunk, sy_chunk), :],
          ci.at[slot, 0], sem_c.at[slot * (sy_ri + sy_gj)])

    strip(0, 0).start()

    def c_step(c, racc):
      slot = jax.lax.rem(c, 2)

      @pl.when(c + 1 < nch)
      def _():
        strip(c + 1, jax.lax.rem(c + 1, 2)).start()

      strip(c, slot).wait()
      rows = pacc[pl.ds((c0 + c) * sy_chunk, sy_chunk), :]
      return racc + _pdot(rows, ci[slot, 0], _RDIMS, precise)

    racc = jax.lax.fori_loop(
        0, nch, c_step, jnp.zeros((FEAT, block), jnp.float32))
    # Row ULANE of the (128, B) accumulator is u^T T[p] = alpha_p^T
    # (the other rows mix zero lanes — discarded).
    arowbuf[pl.ds(p, 1), :] = racc[ULANE:ULANE + 1, :]
    return 0

  jax.lax.fori_loop(0, nb, p_loop, 0)
  ca = pltpu.make_async_copy(arowbuf, alpha_hbm, sem_a)
  ca.start()
  ca.wait()

  # ---- P3: tiled SYRK consumption, alpha from the in-kernel buffer --
  pallas_mll_bwd._kernel_bwd_tiled(
      n, block, sy_chunk, sy_ri, sy_gj, precise, kfam, masked,
      tpm_hbm, xa_hbm, xb_hbm, arowbuf, None, vrow_ref, None, sv_ref,
      pacc_hbm, dsv_ref, dda_ref,
      ci, cj, xai, xbi, xbj, pacc, sem_c, sem_x, sem_out,
      col_transpose=True, init_pacc=False)


@functools.partial(jax.jit, static_argnames=(
    'block', 'ti_chunk', 'ti_rows', 'ti_group', 'ti_layout', 'sy_chunk',
    'sy_rows', 'sy_group', 'precise', 'kfam', 'panel_input',
    'diag_transposed', 'interpret'))
def mll_bwd_joint(l, x_scaled, delta, signal_variance, valid=None,
                  block: int = 256,
                  ti_chunk: int = 512, ti_rows: int = 4,
                  ti_group: int = 2, ti_layout: str = 'blocks',
                  sy_chunk: int = 512, sy_rows: int = 2,
                  sy_group: int = 4,
                  precise: bool = True, kfam: str = 'se',
                  panel_input: bool = True,
                  diag_transposed: bool = True,
                  interpret: bool = False):
  """All fused-NLL adjoints from L in one kernel (module docstring).

  Args:
    l: the Cholesky factor — panel-major (nb, n, block) as the fused
      forward kernel writes it (panel_input=True, the production
      route), or dense (n, n).
    x_scaled: (n, d) length-scaled inputs, d <= 125 (lane ULANE is
      reserved for delta/u; the forward kernel's cap is d <= 126).
    delta: (n, 1) residual y - mu.
    valid: optional (n,) mask for the packed multi-task path.
    ti_*: tri-inv phase tile (rows x group x chunk, panel layout) —
      same knobs as ops/pallas_triinv.tri_inv_panels.
    sy_*: SYRK phase tile (rows x group x chunk) — same knobs as
      ops/pallas_mll_bwd.mll_bwd_fused.

  Returns:
    (d_x, alpha, d_sv_raw, d_da): the (n, d) input adjoint, the (n, 1)
    solve K^{-1} delta (the delta adjoint; callers divide d_sv_raw by
    sv as usual), and the two scalar adjoints.
  """
  n, d = x_scaled.shape
  nb = n // block
  if panel_input:
    assert l.shape == (nb, n, block), (l.shape, block)
  else:
    assert l.shape == (n, n), (l.shape,)
  assert n % block == 0 and n % ti_chunk == 0 and n % sy_chunk == 0, (
      n, block, ti_chunk, sy_chunk)
  assert ti_chunk % block == 0 and sy_chunk % block == 0
  assert nb >= 2, 'use the dense backward below 2 blocks'
  assert d + 2 <= ULANE, (d, ULANE)
  ti_rows = max(1, ti_rows)
  while ti_rows > 1 and nb % ti_rows:
    ti_rows //= 2
  ti_group = max(1, ti_group)
  while ti_group > 1 and nb % ti_group:
    ti_group //= 2
  sy_rows = max(1, sy_rows)
  while sy_rows > 1 and nb % sy_rows:
    sy_rows //= 2
  sy_group = max(1, sy_group)
  while sy_group > 1 and nb % sy_group:
    sy_group //= 2

  lf = l.astype(jnp.float32)
  dinv = pallas_triinv.diag_inverses(lf, block, panel_input,
                                     diag_transposed)
  if panel_input:
    assert ti_layout in ('wide', 'blocks'), ti_layout
    lpm = (pallas_triinv._LPM_WIDE if ti_layout == 'wide'
           else pallas_triinv._LPM_BLOCKS)
  else:
    lpm = pallas_triinv._LPM_DENSE

  xs32 = x_scaled.astype(jnp.float32)
  sqn = jnp.sum(xs32 * xs32, axis=1, keepdims=True)
  onev = jnp.ones((n, 1), jnp.float32)
  pad = jnp.zeros((n, FEAT - d - 2), jnp.float32)
  xa = jnp.concatenate([-2.0 * xs32, sqn, onev, pad],
                       axis=1).reshape(nb, block, FEAT)
  xb = jnp.concatenate([xs32, onev, sqn, pad],
                       axis=1).reshape(nb, block, FEAT)
  # delta tiles: lane ULANE carries delta (see module docstring).
  dt = jnp.concatenate(
      [jnp.zeros((n, ULANE), jnp.float32),
       delta.astype(jnp.float32).reshape(n, 1),
       jnp.zeros((n, FEAT - ULANE - 1), jnp.float32)],
      axis=1).reshape(nb, block, FEAT)
  masked = valid is not None
  v = (valid.astype(jnp.float32).reshape(n) if masked
       else jnp.ones((n,), jnp.float32))
  vrow = v.reshape(nb, block)
  sv = jnp.asarray(signal_variance, jnp.float32).reshape(1, 1)

  ig, jg = ti_rows, ti_group
  cpb = ti_chunk // block
  ri, gj = sy_rows, sy_group
  lrow_shape = ((2, ig, cpb, block, block)
                if lpm == pallas_triinv._LPM_BLOCKS
                else (2, ig, block, ti_chunk))
  kernel = functools.partial(_kernel_joint, n, block, ti_chunk, ig, jg,
                             sy_chunk, ri, gj, precise, kfam, masked,
                             lpm)
  tpm, pacc, arow, dsv, dda = pl.pallas_call(
      kernel,
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),            # L dense|panels
          pl.BlockSpec(memory_space=pl.ANY),            # diag inverses
          pl.BlockSpec(memory_space=pl.ANY),            # xa tiles
          pl.BlockSpec(memory_space=pl.ANY),            # xb tiles
          pl.BlockSpec(memory_space=pl.ANY),            # delta tiles
          pl.BlockSpec(memory_space=pltpu.VMEM),        # valid rows
          pl.BlockSpec(memory_space=pltpu.SMEM),        # sv
      ],
      out_specs=(
          pl.BlockSpec(memory_space=pl.ANY),            # T panels
          pl.BlockSpec(memory_space=pl.ANY),            # P accumulator
          pl.BlockSpec(memory_space=pl.ANY),            # alpha rows
          pl.BlockSpec(memory_space=pltpu.SMEM),        # d_sv raw
          pl.BlockSpec(memory_space=pltpu.SMEM),        # d_da
      ),
      out_shape=(
          jax.ShapeDtypeStruct((nb, n, block), jnp.float32),
          jax.ShapeDtypeStruct((n, FEAT), jnp.float32),
          jax.ShapeDtypeStruct((nb, block), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ),
      scratch_shapes=[
          # tri-inv phase (mirrors tri_inv_panels' tiled call)
          pltpu.VMEM(lrow_shape, jnp.float32),              # L rows
          pltpu.VMEM((2, jg, ti_chunk, block), jnp.float32),  # T strips
          pltpu.VMEM((ig, jg, block, block), jnp.float32),  # phase-A acc
          pltpu.VMEM((ig, jg, block, block), jnp.float32),  # out tile
          pltpu.VMEM((ig, ig, block, block), jnp.float32),  # corner L
          pltpu.VMEM((ig, block, block), jnp.float32),      # D_i
          pltpu.VMEM((ti_chunk, block), jnp.float32),       # zero tile
          pltpu.SemaphoreType.DMA(
              (2 * cpb * ig if panel_input else 2 * ig,)),  # L sems
          pltpu.SemaphoreType.DMA((2 * jg,)),               # T sems
          pltpu.SemaphoreType.DMA((ig,)),                   # D sems
          pltpu.SemaphoreType.DMA((ig * ig,)),              # corner sems
          pltpu.SemaphoreType.DMA((ig * jg,)),              # write sems
          pltpu.SemaphoreType.DMA((2,)),                    # zero sems
          # SYRK phase (mirrors mll_bwd_fused's tiled call)
          pltpu.VMEM((2, ri, sy_chunk, block), jnp.float32),  # ci strips
          pltpu.VMEM((2, gj, sy_chunk, block), jnp.float32),  # cj strips
          pltpu.VMEM((ri, block, FEAT), jnp.float32),       # xa i-tiles
          pltpu.VMEM((ri, block, FEAT), jnp.float32),       # xb i-tiles
          pltpu.VMEM((gj, block, FEAT), jnp.float32),       # xb j-tiles
          pltpu.VMEM((n, FEAT), jnp.float32),               # P acc (+u)
          pltpu.SemaphoreType.DMA((2 * (ri + gj),)),        # strip sems
          pltpu.SemaphoreType.DMA((2 * ri + gj,)),          # x-tile sems
          pltpu.SemaphoreType.DMA,                          # out sem
          # joint glue
          pltpu.VMEM((jg, block, FEAT), jnp.float32),       # delta tiles
          pltpu.SemaphoreType.DMA((jg,)),                   # delta sems
          pltpu.VMEM((nb, block), jnp.float32),             # alpha rows
          pltpu.SemaphoreType.DMA,                          # alpha sem
      ],
      compiler_params=pallas_params.compiler_params(
          has_side_effects=True),
      interpret=interpret,
  )(lf, dinv, xa, xb, dt, vrow, sv)
  del tpm  # HBM scratch: T never leaves the device program's consumers
  d_x = 2.0 * (pacc[:, :d] - pacc[:, d:d + 1] * xs32)
  alpha = arow.reshape(n, 1)
  return d_x, alpha, dsv[0, 0], dda[0, 0]
