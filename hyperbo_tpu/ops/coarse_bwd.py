"""Coarse two-level backward for the fused GP NLL beyond MAX_N.

The fused Pallas backward (ops/pallas_mll_bwd) is capped at
MAX_N = 16384: at n = 32768 its panel-major T tensor reaches 2^32
bytes and Mosaic's int32 byte-offset arithmetic silently wraps —
hardware-refuted in PERF.md r14 (garbage d_x, interpret-mode clean).
Until round 4 everything past the cap fell back to the dense XLA
K^{-1} chain at the full-matrix O(n^3) rate (9.04 s/step at n=32768,
PERF.md r15).

This module restores the fused rate WITHOUT new Mosaic surface: split
the factor into c coarse diagonal blocks of m = n/c <= MAX_N and

  * run the EXISTING, hardware-validated kernels per diagonal block —
    the panel triangular inverse (ops/pallas_triinv) and the fused
    SYRK-consume backward (ops/pallas_mll_bwd) at their shipping
    m-sized tile configs, every Pallas tensor <= (m/B, m, B) — 1 GiB
    at m = 16384, far below the 2^31-byte overflow class;
  * compute every cross term with XLA GEMMs (64-bit-safe offsets by
    construction): the off-diagonal blocks of T = L^{-1}
    (T_IJ = -T_II sum_K L_IK T_KJ), the off-diagonal blocks of
    K^{-1} = T^T T, and their elementwise-weighted consumption.

The block algebra, with G = dnll/dK = 0.5 (K^{-1} - alpha alpha^T)
and W = G o N(r2) as in ops/pallas_mll_bwd:

  K^{-1}_PQ = sum_{K >= P} T_KP^T T_KQ          (P >= Q)

  each kernel call over diagonal block (P, P) consumes exactly
  0.5 T_PP^T T_PP - 0.5 alpha_P alpha_P^T, so the XLA side owes
  the residue 0.5 sum_{K > P} T_KP^T T_KP on the diagonal plus the
  full off-diagonal blocks. All consumption pieces are linear in G,
  so contributions to (d_x, d_sv_raw, d_da) simply accumulate.

Reference semantics anchor: the single-device custom VJP of the
training objective, /root/reference/hyperbo/basics/linalg.py:139-171
and gp_utils/objectives.py:144-156 — this path makes the same
gradient available at n beyond the one-kernel cap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coarse_split(n: int, block: int = 256) -> int:
  """Smallest coarse-block count c serving n, or 0 if inapplicable.

  Constraints: n % c == 0; m = n/c <= pallas_mll_bwd.MAX_N; m a
  multiple of 512 (the DMA-chunk grid of both per-block kernels) and
  >= 2*block (tri_inv_panels needs >= 2 panels).
  """
  from hyperbo_tpu.ops import pallas_mll_bwd as pb
  if n <= pb.MAX_N:
    return 0
  for c in range(2, 17):
    if n % c:
      continue
    m = n // c
    if m > pb.MAX_N or m % 512 or m < 2 * block:
      continue
    return c
  return 0


def _consume_block(g, xp, xq, sv, kfam, vp, vq, off_diag, hi):
  """(dsv_raw, dda, dx_p, dx_q) contributions of one coarse G block.

  Mirrors the in-VMEM consumption of ops/pallas_mll_bwd._kernel_bwd:
  dsv_raw = w2 * sum(G o K), dda = tr(G) (diagonal blocks only),
  d_x via W = G o N with the symmetric pair (Q, P) folded in through
  the two-sided update when off_diag.
  """
  from hyperbo_tpu.ops.pallas_mll_bwd import _km_nm
  sqp = jnp.sum(xp * xp, axis=1, keepdims=True)
  sqq = jnp.sum(xq * xq, axis=1, keepdims=True)
  r2 = jnp.maximum(
      sqp + sqq.T - 2.0 * jnp.matmul(xp, xq.T, precision=hi), 0.0)
  km, nm = _km_nm(r2, sv, kfam)
  if vp is not None:
    pair = vp.reshape(-1, 1) * vq.reshape(1, -1)
    km = km * pair
    nm = nm * pair
  w2 = 2.0 if off_diag else 1.0
  dsv_raw = w2 * jnp.sum(g * km)
  dda = jnp.float32(0.0) if off_diag else jnp.trace(g)
  w = g * nm
  dx_p = 2.0 * (jnp.matmul(w, xq, precision=hi)
                - jnp.sum(w, axis=1, keepdims=True) * xp)
  dx_q = None
  if off_diag:
    dx_q = 2.0 * (jnp.matmul(w.T, xp, precision=hi)
                  - jnp.sum(w, axis=0)[:, None] * xq)
  return dsv_raw, dda, dx_p, dx_q


def coarse_bwd(l, x_scaled, delta, sv, valid=None, kfam='se',
               block: int = 256, precise: bool = True,
               triinv: str = 'pallas', interpret: bool = False):
  """Fused-family NLL adjoints from a dense factor L beyond MAX_N.

  Args:
    l: (n, n) dense lower-triangular Cholesky factor (the custom-VJP
      forward's residual — panel saving is off past MAX_N).
    x_scaled: (n, d) length-scaled (possibly embedded) inputs.
    delta: (n, 1) centered targets.
    sv: scalar signal variance.
    valid: optional (n,) 0/1 mask (packed-batch padding), as in
      ops/pallas_mll._se_core_bwd.
    precise: X3 (3-pass) precision for every product, matching the
      forward kernel's accuracy class; False = single-pass bf16.
    triinv: 'pallas*' runs the panel tri-inv kernel per diagonal
      block (the shipping default); anything else builds T_II with
      the blocked XLA inverse (toolchain-drift fallback, same ladder
      role as in _se_core_bwd).

  Returns:
    (d_x, alpha, d_sv_raw, d_da) with d_sv_raw = sum(G o K) over the
    full matrix (caller divides by sv), exactly the fused kernel's
    contract.
  """
  from hyperbo_tpu.ops import pallas_mll
  from hyperbo_tpu.ops import pallas_mll_bwd
  from hyperbo_tpu.ops import pallas_triinv

  n, d = x_scaled.shape
  c = coarse_split(n, block=block)
  assert c >= 2, (n, 'coarse_bwd called on an inapplicable n')
  m = n // c
  hi = jax.lax.Precision.HIGH if precise else jax.lax.Precision.DEFAULT
  lf = l.astype(jnp.float32)
  xs = [x_scaled[i * m:(i + 1) * m] for i in range(c)]
  dl = [delta[i * m:(i + 1) * m] for i in range(c)]
  vs = ([valid[i * m:(i + 1) * m] for i in range(c)]
        if valid is not None else [None] * c)

  def lblk(i, j):
    return lf[i * m:(i + 1) * m, j * m:(j + 1) * m]

  # --- T = L^{-1}, block lower triangular -------------------------------
  # Diagonal inverses through the per-block kernel (panel-major output
  # feeds the fused backward kernel directly); dense copies for the
  # XLA cross-term GEMMs via one moveaxis (tri_inv_panels orientation:
  # tpm[p][r, c] = T[r, p*block + c]).
  use_pallas_ti = isinstance(triinv, str) and triinv.startswith('pallas')
  tpm_diag = []
  td = [[None] * c for _ in range(c)]
  for i in range(c):
    if use_pallas_ti:
      rows, group = 4, 2
      chunk = 1024 if m >= 16384 else 512
      if m % chunk:
        chunk = pallas_triinv.CHUNK
      tpm = pallas_triinv.tri_inv_panels(
          lblk(i, i), block=block, chunk=chunk, group=group, rows=rows,
          precise=precise, interpret=interpret)
    else:
      from hyperbo_tpu.ops import linalg as linalg_mod
      tinv = linalg_mod.tri_inv_blocked(lblk(i, i))
      tpm = jnp.moveaxis(tinv.reshape(m, m // block, block), 1, 0)
    tpm_diag.append(tpm)
    td[i][i] = jnp.moveaxis(tpm, 0, 1).reshape(m, m)
  for i in range(1, c):
    for j in range(i - 1, -1, -1):
      acc = jnp.matmul(lblk(i, j), td[j][j], precision=hi)
      for k in range(j + 1, i):
        acc = acc + jnp.matmul(lblk(i, k), td[k][j], precision=hi)
      td[i][j] = -jnp.matmul(td[i][i], acc, precision=hi)

  # --- alpha = T^T (T delta), blockwise ---------------------------------
  us = [sum(jnp.matmul(td[i][j], dl[j], precision=hi)
            for j in range(i + 1))
        for i in range(c)]
  al = [sum(jnp.matmul(td[k][j].T, us[k], precision=hi)
            for k in range(j, c))
        for j in range(c)]
  alpha = jnp.concatenate(al, axis=0)

  # --- consumption ------------------------------------------------------
  dx = [jnp.zeros_like(x) for x in xs]
  dsv_raw = jnp.float32(0.0)
  dda = jnp.float32(0.0)

  # Diagonal blocks: the fused kernel consumes 0.5 T_II^T T_II -
  # 0.5 alpha_I alpha_I^T in VMEM at the shipping m-sized tile config.
  brows, bgroup, bchunk = pallas_mll._bwd_tile_config(m)
  for i in range(c):
    dx_i, dsv_i, dda_i = pallas_mll_bwd.mll_bwd_fused(
        tpm_diag[i], xs[i], al[i], sv, block=block, chunk=bchunk,
        kfam=kfam, valid=vs[i], rows=brows, group=bgroup,
        precise=precise, interpret=interpret)
    dx[i] = dx[i] + dx_i
    dsv_raw = dsv_raw + dsv_i
    dda = dda + dda_i

  # XLA residue: diagonal extras sum_{K>P} T_KP^T T_KP and all
  # off-diagonal K^{-1} blocks, consumed blockwise (64-bit-safe).
  for p in range(c):
    for q in range(p + 1):
      if p == q:
        if p == c - 1:
          continue
        s = sum(jnp.matmul(td[k][p].T, td[k][p], precision=hi)
                for k in range(p + 1, c))
        g = 0.5 * s
      else:
        kinv = sum(jnp.matmul(td[k][p].T, td[k][q], precision=hi)
                   for k in range(p, c))
        g = (0.5 * kinv
             - 0.5 * jnp.matmul(al[p], al[q].T, precision=hi))
      dsv_b, dda_b, dx_p, dx_q = _consume_block(
          g, xs[p], xs[q], sv, kfam, vs[p], vs[q], p != q, hi)
      dsv_raw = dsv_raw + dsv_b
      dda = dda + dda_b
      dx[p] = dx[p] + dx_p
      if dx_q is not None:
        dx[q] = dx[q] + dx_q

  return jnp.concatenate(dx, axis=0), alpha, dsv_raw, dda
