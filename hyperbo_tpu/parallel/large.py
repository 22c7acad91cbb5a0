"""Mesh-distributed large-n GP marginal likelihood.

For n beyond one chip's comfort (BASELINE.md configs[4]: n=16384 Gram +
blocked Cholesky), the pipeline shards over the mesh:

  * the Gram matrix is built in row-block shards — each device computes
    its (n/P x n) block from its slice of x against the all-gathered x
    (shard_map; O(n d) ICI traffic),
  * the factorization runs through the block-cyclic distributed
    Cholesky (parallel.distributed_chol; O(n^2) ICI traffic),
  * logdet + quadratic form close out on the replicated factor.

On a single chip everything degenerates to the dense path (and n=16384
fits one v5e: 104 ms measured, PERF.md). This module exists for the
multi-chip regime and is validated against the dense pipeline on the
virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
  from jax import shard_map  # JAX >= 0.8
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map

from hyperbo_tpu.core.warp import retrieve_params
from hyperbo_tpu.ops import chol as chol_ops
from hyperbo_tpu.parallel import distributed_chol
from hyperbo_tpu.parallel._smap import shard_map_unchecked


def gram_rowsharded(cov_func, params, x, mesh: Mesh, warp_func=None,
                    axis_name: str = 'task') -> jnp.ndarray:
  """K(x, x) with row blocks computed shard-locally.

  Each device holds an (n/P, d) slice of x, all-gathers the full x once,
  and emits its (n/P, n) row block of the Gram matrix. Returns the
  row-sharded (n, n) matrix. Requires n % P == 0.
  """
  num = mesh.shape[axis_name]
  n = x.shape[0]
  assert n % num == 0, (n, num)
  x_sharded = jax.device_put(x, NamedSharding(mesh, P(axis_name)))

  def block(x_local):
    x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)
    return cov_func(params, x_local, x_full, warp_func=warp_func)

  return shard_map(block, mesh=mesh, in_specs=P(axis_name),
                   out_specs=P(axis_name))(x_sharded)


def mll_distributed(mean_func, cov_func, params, x, y, mesh: Mesh,
                    warp_func=None, block: int = 256,
                    axis_name: str = 'task', eps: float = 1e-6,
                    panel_solver: str = 'winv'):
  """Negative log marginal likelihood of one large task over a mesh.

  Same value as the dense per-task NLL (reference formula,
  hyperbo/gp_utils/objectives.py:144-156): Gram row-sharded, factorized
  with the distributed block-cyclic Cholesky (solve-free winv panels by
  default; ops.chol routing applies to the per-step diagonal blocks, so
  large-block runs factorize them through the Pallas HBM kernel), then
  logdet + quadratic form on the replicated factor.
  """
  noise_variance, = retrieve_params(params, ['noise_variance'],
                                    warp_func=warp_func)
  n = x.shape[0]
  kmat = gram_rowsharded(cov_func, params, x, mesh, warp_func=warp_func,
                         axis_name=axis_name)
  kmat = kmat + jnp.eye(n, dtype=kmat.dtype) * (noise_variance + eps)
  chol = distributed_chol.distributed_cholesky(
      kmat, mesh, block=block, axis_name=axis_name,
      panel_solver=panel_solver)
  delta = y - jnp.atleast_2d(mean_func(params, x, warp_func=warp_func))
  kinvy = chol_ops.cho_solve(chol, delta)
  # Joint NLL of m independent draws: trace(delta^T K^{-1} delta), with
  # the logdet and 2pi terms counted once per draw. (The host per-task
  # path keeps the reference's sum-over-(m, m) form for parity — for
  # m = 1 the two coincide; this new entry point uses the correct
  # multi-draw form.)
  m = delta.shape[1]
  quad = jnp.sum(delta * kinvy)
  logdet_half = jnp.sum(jnp.log(jnp.diagonal(chol)))
  return 0.5 * quad + m * (logdet_half + 0.5 * n * jnp.log(2 * jnp.pi))


def _panels_to_dense_tri(lp: jnp.ndarray, block: int) -> jnp.ndarray:
  """Panel-major (nb, n, B) factor with transposed diagonal blocks
  (the fused forward kernel's return_l='panels' storage convention,
  ops/pallas_mll.mll_fused_g) -> dense lower-triangular (n, n)."""
  nb, n, _ = lp.shape
  idx = jnp.arange(nb)
  blocks = lp.reshape(nb, nb, block, block)
  diagb = blocks[idx, idx]
  blocks = blocks.at[idx, idx].set(jnp.swapaxes(diagb, -1, -2))
  return jnp.moveaxis(blocks.reshape(nb, n, block), 0, 1).reshape(n, n)


def mll_distributed_fused(mean_func, cov_func, params, x, y, mesh: Mesh,
                          warp_func=None, axis_name: str = 'task',
                          eps: float = 1e-6, backend: str = 'auto',
                          interpret=None):
  """Distributed NLL whose shard-local compute runs the Pallas kernels.

  The plain `mll_distributed` abandons the single-chip fused kernels
  for XLA ops at its fine (256-wide) block-cyclic granularity. This
  entry point keeps them: the matrix is split into P = mesh-size
  COARSE row blocks of m = n/P, and a right-looking factorization
  proceeds over the P coarse columns (a static Python loop — P is the
  mesh shape); per step j

    1. the Schur-updated diagonal block D_j is factorized REPLICATED —
       through the fused Pallas MLL kernel (L panels + half-logdet in
       one launch, Gram built in-kernel from x) for j = 0, and through
       the Pallas HBM-streaming Cholesky for the updated D_j, j > 0 —
       replication costs no communication and the m^3/3 FLOPs vanish
       against the trailing GEMMs' n^3/3 / P,
    2. W_j = L_jj^{-1} comes from the Pallas panel triangular inverse,
       so every device applies its panel as ONE MXU GEMM A_pj W_j^T
       (the solve-free MAGMA-style panel, see distributed_cholesky),
    3. the gathered panel column (one (n, m) all_gather over ICI)
       updates each device's trailing columns with one local GEMM,
       and the quadratic form rides the loop: z_j = W_j (delta_j -
       acc_j), acc += panel @ z_j — no second solve pass, mirroring
       the fused kernel's own forward-solve-on-the-corrections trick.

  Total communication is O(n^2) like distributed_cholesky; local
  compute runs at the Pallas kernels' measured 60-96%-of-peak rates
  instead of the plain-XLA pipeline's. Value parity with the dense
  per-task NLL (reference hyperbo/gp_utils/objectives.py:144-156) is
  f32-reorder class; parity is tested on the 8-device CPU mesh in
  tests/test_parallel.py and exercised by the dryrun.

  Args:
    backend: 'pallas' (shard-local Pallas kernels), 'xla' (plain XLA
      local ops — same coarse algorithm, any platform), or 'auto'
      (pallas on TPU, xla elsewhere). The pallas backend requires
      m % 512 == 0 (kernel block/chunk geometry); smaller shards fall
      back to XLA local ops automatically.
    interpret: force Pallas interpret mode (defaults to True off-TPU).
  """
  from hyperbo_tpu.ops import pallas_chol_hbm
  from hyperbo_tpu.ops import pallas_mll
  from hyperbo_tpu.ops import pallas_triinv

  platform = jax.devices()[0].platform
  if backend == 'auto':
    backend = 'pallas' if platform == 'tpu' else 'xla'
  if interpret is None:
    interpret = platform != 'tpu'
  assert backend in ('pallas', 'xla'), backend
  num = mesh.shape[axis_name]
  n = x.shape[0]
  assert n % num == 0, (n, num)
  m = n // num
  hi = jax.lax.Precision.HIGHEST
  noise_variance, = retrieve_params(params, ['noise_variance'],
                                    warp_func=warp_func)
  ridge = jnp.squeeze(noise_variance) + eps
  delta = y - jnp.atleast_2d(mean_func(params, x, warp_func=warp_func))
  k_draws = delta.shape[1]

  use_pallas_local = backend == 'pallas' and m >= 512 and m % 512 == 0
  # First-block fast path: the fused MLL kernel serves D_0 = K(x_0,
  # x_0) + ridge I directly from x (in-kernel Gram; L panels feed the
  # panel-input tri-inv with no dense transpose). Later diagonal
  # blocks are Schur-updated dense matrices, which the HBM-streaming
  # Cholesky kernel factorizes.
  fused0 = False
  kfam = None
  if use_pallas_local and cov_func is not None:
    try:
      kfam = pallas_mll.kernel_family(cov_func)
      fused0 = True
    except ValueError:
      fused0 = False
  if fused0:
    lengthscale, signal_variance = retrieve_params(
        params, ['lengthscale', 'signal_variance'], warp_func=warp_func)
    emb0 = pallas_mll._se_embed(params, x[:m], cov_func, warp_func)
    xs0 = (emb0 / lengthscale).astype(jnp.float32)
    sv0 = jnp.squeeze(signal_variance)
  else:
    xs0 = jnp.zeros((1, 1), jnp.float32)  # placeholder operand
    sv0 = jnp.float32(0.0)
  sweep_unroll = 2 if interpret else 32

  def _chol_local(d_blk):
    if use_pallas_local:
      return pallas_chol_hbm.cholesky_hbm(
          d_blk, chunk=min(512, m), interpret=interpret)
    return jax.lax.linalg.cholesky(d_blk)

  def _winv_local(l_blk=None, lp=None):
    """Dense W = L^{-1} from a dense factor or panel-major panels."""
    if use_pallas_local:
      tpm = pallas_triinv.tri_inv_panels(
          lp if lp is not None else l_blk, block=256, chunk=512,
          group=2, rows=4, panel_input=lp is not None,
          diag_transposed=lp is not None, panel_layout='blocks',
          interpret=interpret)
      return jnp.moveaxis(tpm, 0, 1).reshape(m, m)
    return jax.lax.linalg.triangular_solve(
        l_blk, jnp.eye(m, dtype=l_blk.dtype), left_side=True, lower=True)

  def body(x_loc, delta_full):
    my = lax.axis_index(axis_name)
    x_full = lax.all_gather(x_loc, axis_name, tiled=True)
    a_loc = cov_func(params, x_loc, x_full, warp_func=warp_func)
    gcols = jnp.arange(n)
    grows = my * m + jnp.arange(m)
    a_loc = a_loc + (gcols[None, :] == grows[:, None]) * ridge
    acc = jnp.zeros_like(delta_full)
    quad = jnp.float32(0.0)
    ldet = jnp.float32(0.0)
    for j in range(num):
      c0 = j * m
      cand = lax.slice(a_loc, (0, c0), (m, c0 + m))
      if j == 0 and fused0:
        lp, _, ld0 = pallas_mll.mll_fused_g(
            xs0, lax.slice(delta_full, (0, 0), (m, 1)), sv0, ridge,
            block=256, half=min(512, m), group=2,
            sweep_unroll=sweep_unroll, return_l='panels', kfam=kfam,
            interpret=interpret)
        l_exact = _panels_to_dense_tri(lp, 256)
        w = _winv_local(lp=lp)
        ldj = ld0
      else:
        gathered_d = lax.all_gather(cand, axis_name)  # (P, m, m)
        d_blk = gathered_d[j]
        l_exact = _chol_local(d_blk)
        w = _winv_local(l_blk=l_exact)
        ldj = jnp.sum(jnp.log(jnp.diagonal(l_exact)))
      l_pj = jax.lax.dot_general(cand, w, (((1,), (1,)), ((), ())),
                                 precision=hi)
      l_pj = jnp.where(my > j, l_pj, jnp.where(my == j, l_exact, 0.0))
      panel = lax.all_gather(l_pj, axis_name, tiled=True)  # (n, m)
      d_j = lax.slice(delta_full, (c0, 0), (c0 + m, k_draws))
      acc_j = lax.slice(acc, (c0, 0), (c0 + m, k_draws))
      z_j = jax.lax.dot_general(w, d_j - acc_j, (((1,), (0,)), ((), ())),
                                precision=hi)
      quad = quad + jnp.sum(z_j * z_j)
      ldet = ldet + ldj
      acc = acc + jax.lax.dot_general(panel, z_j,
                                      (((1,), (0,)), ((), ())),
                                      precision=hi)
      if j + 1 < num:
        tail = lax.slice(panel, ((j + 1) * m, 0), (n, m))
        upd = jax.lax.dot_general(l_pj, tail, (((1,), (1,)), ((), ())),
                                  precision=hi)
        a_loc = a_loc.at[:, (j + 1) * m:].add(-upd)
    return quad, ldet

  quad, ldet = shard_map_unchecked(
      body, mesh=mesh, in_specs=(P(axis_name), P()),
      out_specs=(P(), P()))(x, delta.astype(jnp.float32))
  return 0.5 * quad + k_draws * (ldet + 0.5 * n * jnp.log(2 * jnp.pi))
