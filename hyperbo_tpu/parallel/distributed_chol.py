"""Distributed blocked Cholesky over a device mesh (shard_map).

For kernel matrices too large for one chip's HBM (BASELINE.md large-n
target: n=16384 Gram + blocked Cholesky), the matrix is distributed
block-row-cyclically: global block-row k lives on device k % P. The
right-looking factorization proceeds over block columns; per step

  1. the owner's diagonal block is factorized locally and broadcast
     (all_gather of one B x B tile over ICI),
  2. every device triangular-solves its local blocks of the panel
     (the owner's diagonal block yields L_kk itself through the same
     solve),
  3. the full panel column is all_gathered (n x B over ICI) and every
     device applies one local MXU matmul to its trailing rows.

Total communication is O(n^2) — the size of the matrix — against
O(n^3/P) local compute. The same code runs on the CPU virtual mesh for
testing and on a TPU slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperbo_tpu.ops import chol as chol_ops
from hyperbo_tpu.parallel._smap import shard_map_unchecked


def _to_blocks(a: jnp.ndarray, block: int, num_devices: int) -> jnp.ndarray:
  """(n, n) -> (nb, B, n) block rows, zero-padded so nb % P == 0."""
  n = a.shape[-1]
  nb = -(-n // block)
  nb_pad = -(-nb // num_devices) * num_devices
  pn = nb_pad * block
  ap = jnp.zeros((pn, pn), a.dtype)
  ap = ap.at[:n, :n].set(a)
  # Padding rows/cols get an identity so their pivots stay positive.
  idx = jnp.arange(n, pn)
  ap = ap.at[idx, idx].set(1.0)
  return ap.reshape(nb_pad, block, pn)


def _cyclic_permute(nb: int, num_devices: int) -> np.ndarray:
  """Global block order so device p holds blocks p, p+P, p+2P, ..."""
  return np.argsort(np.arange(nb) % num_devices, kind='stable')


def distributed_cholesky(a: jnp.ndarray, mesh: Mesh, block: int = 256,
                         axis_name: str = 'task',
                         panel_solver: str = 'winv') -> jnp.ndarray:
  """Lower Cholesky factor of SPD `a`, factorized across `mesh`.

  The input may live on any device(s); it is re-laid-out block-cyclically,
  factorized cooperatively, and returned as a replicated (n, n) lower
  factor.

  The per-step diagonal factorization routes through ops.chol.cholesky,
  so the library's Pallas HBM kernel serves large blocks (>= 1024 with
  set_use_hbm_kernel) — the same 60%-of-peak kernel as the single-chip
  path, run replicated (it costs no communication and its B^3/3 FLOPs
  vanish against the trailing GEMMs).

  panel_solver:
    'winv' (default): the owner-side diagonal inverse W = L_kk^{-1} is
      formed once per step (one B-RHS solve of a B x B system) and every
      device applies its panel as ONE MXU GEMM, A_ik @ W^T — the
      MAGMA-style solve-free panel. lax.linalg.triangular_solve with a
      broadcast (nb_local, B, B) batch is a sequential substitution
      chain per block on TPU and regressed ~7x in the 2026-08-18
      toolchain (PERF.md), which this removes entirely.
    'chol': the legacy batched triangular-solve panel (A/B lever).
  """
  n = a.shape[-1]
  num_devices = mesh.shape[axis_name]
  blocks = _to_blocks(a, block, num_devices)
  nb = blocks.shape[0]
  pn = blocks.shape[-1]
  perm = _cyclic_permute(nb, num_devices)
  inv_perm = np.argsort(perm)
  # Row-block-cyclic layout: shard the permuted block axis.
  blocks_cyc = blocks[perm]
  sharding = NamedSharding(mesh, P(axis_name))
  blocks_cyc = jax.device_put(blocks_cyc, sharding)
  nb_local = nb // num_devices
  # Global block index of each local slot, per device: gidx[p, l] = l*P + p
  # under the stable-argsort cyclic permutation.
  gidx_all = jnp.asarray(perm.reshape(num_devices, nb_local), jnp.int32)
  gidx_all = jax.device_put(gidx_all, sharding)

  def factorize(local_blocks, gidx):
    # local_blocks: (nb_local, B, pn); gidx: (1, nb_local) global indices.
    gidx = gidx[0]
    my_id = lax.axis_index(axis_name)

    def step(k, carry):
      a_loc, l_loc = carry
      col = k * block
      # --- 1. diagonal block broadcast ---
      # Each device extracts its candidate diagonal block (owner's slot).
      local_slot = jnp.argmax(gidx == k)  # 0 if absent; masked by owner
      diag_cand = lax.dynamic_slice(
          a_loc, (local_slot, 0, col), (1, block, block))[0]
      owner = k % num_devices
      all_cands = lax.all_gather(diag_cand, axis_name)  # (P, B, B)
      a_kk = all_cands[owner]
      l_kk = chol_ops.cholesky(a_kk)
      # --- 2. local panel: L_ik = A_ik L_kk^{-T} ---
      panel_cols = lax.dynamic_slice(
          a_loc, (0, 0, col), (nb_local, block, block))
      if panel_solver == 'winv':
        w_kk = lax.linalg.triangular_solve(
            l_kk, jnp.eye(block, dtype=l_kk.dtype), left_side=True,
            lower=True)
        l_panel = jnp.einsum('lbk,mk->lbm', panel_cols, w_kk,
                             precision=lax.Precision.HIGHEST)
      else:
        l_panel = lax.linalg.triangular_solve(
            jnp.broadcast_to(l_kk, (nb_local, block, block)), panel_cols,
            left_side=False, lower=True, transpose_a=True)
      # Blocks strictly above the pivot contribute nothing.
      mask = (gidx >= k).astype(a_loc.dtype)[:, None, None]
      l_panel = l_panel * mask
      # The owner's own diagonal slot must hold the triangular L_kk.
      is_diag = (gidx == k).astype(a_loc.dtype)[:, None, None]
      l_panel = l_panel * (1 - is_diag) + is_diag * l_kk[None]
      # Record the finished panel column.
      l_loc = lax.dynamic_update_slice(l_loc, l_panel, (0, 0, col))
      # --- 3. trailing update with the gathered panel ---
      gathered = lax.all_gather(l_panel, axis_name)  # (P, nb_local, B, B)
      panel_full = gathered.transpose(1, 0, 2, 3).reshape(pn, block)
      # A_loc -= L_panel_local @ panel_full^T, masked to trailing blocks.
      update = jnp.einsum('lbk,nk->lbn', l_panel, panel_full,
                          precision=lax.Precision.HIGHEST)
      trailing = (gidx > k).astype(a_loc.dtype)[:, None, None]
      a_loc = a_loc - update * trailing
      return a_loc, l_loc

    a_loc, l_loc = lax.fori_loop(
        0, nb, step, (local_blocks, jnp.zeros_like(local_blocks)))
    return l_loc

  l_cyc = shard_map_unchecked(
      factorize, mesh=mesh,
      in_specs=(P(axis_name), P(axis_name)),
      out_specs=P(axis_name))(blocks_cyc, gidx_all)
  # Undo the cyclic permutation and re-assemble (n, n).
  l_blocks = l_cyc[inv_perm]
  l_full = l_blocks.reshape(pn, pn)
  return l_full[:n, :n]
