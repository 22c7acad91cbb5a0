"""Mesh-distributed large-n GP marginal likelihood — value AND gradient.

For n beyond one chip's comfort (BASELINE.md configs[4]: n=16384 Gram +
blocked Cholesky), the pipeline shards over the mesh:

  * the Gram matrix is built in row-block shards — each device computes
    its (n/P x n) block from its slice of x against the all-gathered x
    (shard_map; O(n d) ICI traffic),
  * the factorization runs through the block-cyclic distributed
    Cholesky (parallel.distributed_chol; O(n^2) ICI traffic) or the
    coarse-block fused-kernel route (mll_distributed_fused),
  * logdet + quadratic form close out on the replicated factor.

Both NLL entry points carry a CUSTOM VJP so multi-chip large-n
PRE-TRAINING works (round-4 verdict item 1): the backward never
differentiates through the factorization loop. Instead it reuses the
forward's row-sharded factor L and the closed-form NLL adjoint

    G = dNLL/dK = 0.5 (k K^{-1} - alpha alpha^T),  alpha = K^{-1} delta
    dNLL/d delta = alpha

(the same VJP semantics as the reference's inverse_spdmatrix_vector_
product, hyperbo/basics/linalg.py:139-171, and the single-chip fused
backward, ops/pallas_mll._se_core_bwd), computing K^{-1} row-sharded
via a distributed triangular inverse + masked-psum LAUUM, then chains
onto (params.model, x, y) with ONE jax.vjp of the shard-local Gram
row-block — so any cov_func (SE/Matern, raw or MLP/Kumar-embedded)
gets exact hyperparameter, embedding-network and input gradients
without per-family adjoint code.

On a single chip everything degenerates to the dense path (and n=16384
fits one v5e: 104 ms measured, PERF.md). This module exists for the
multi-chip regime and is validated (values and gradients) against the
dense pipeline on the virtual CPU mesh.
"""

from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
  from jax import shard_map  # JAX >= 0.8
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import retrieve_params
from hyperbo_tpu.ops import chol as chol_ops
from hyperbo_tpu.parallel import distributed_chol
from hyperbo_tpu.parallel._smap import shard_map_unchecked

_HI = jax.lax.Precision.HIGHEST


def _bwd_precision():
  """Matmul precision for the distributed-NLL backward's XLA GEMMs.

  HYPERBO_DIST_BWD_PREC (trace-time): 'high' (default — 3-pass bf16,
  the same accuracy class as the single-chip Pallas kernels'
  Dekker-split X3 dots; 1.18x/1.41x faster distributed VG at
  n=8192/16384), 'highest' (6-pass, full f32-faithful), or 'default'.
  Ground-truth comparison (PERF.md r18d): against the dense
  XLA-HIGHEST gradient, 'high' deviates no more than 'highest' does on
  every leaf at both sizes — the high-vs-highest difference sits an
  order of magnitude below each route's intrinsic distance from dense
  on well-conditioned leaves, and inside gradient-cancellation noise
  (which afflicts every backend equally) on the rest. The forward
  stays HIGHEST/X3 regardless (value parity). Read at trace time like
  the single-chip HYPERBO_BWD_PREC knob."""
  name = os.environ.get('HYPERBO_DIST_BWD_PREC', 'high').lower()
  table = {'highest': jax.lax.Precision.HIGHEST,
           'high': jax.lax.Precision.HIGH,
           'default': jax.lax.Precision.DEFAULT}
  if name not in table:
    raise ValueError(
        f'HYPERBO_DIST_BWD_PREC={name!r}: expected one of {sorted(table)}')
  return table[name]


def _params_like(params, model):
  """GPParams sharing `params`'s static config but a (traced) model."""
  return defs.GPParams(config=params.config, model=model)


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


# ---------------------------------------------------------------------------
# Distributed NLL backward machinery (shared by both entry points).
#
# Everything below runs INSIDE a shard_map body: `my` is the device's
# coarse block-row index, row-sharded matrices are the device's (m, n)
# row block, and the P-step loops are Python-static (P = mesh size).
# ---------------------------------------------------------------------------


def _alpha_backsub(l_rows, w_stack, z, my, num, m, k, axis_name):
  """alpha = L^{-T} z by block back-substitution over the mesh.

  l_rows: this device's (m, n) row block of L; w_stack: (P, m, m)
  replicated diagonal-block inverses W_j = L_jj^{-1}; z = L^{-1} delta
  (n, k) replicated. P psums of (m, k) — O(n k) ICI traffic.
  """
  a_full = jnp.zeros((num * m, k), jnp.float32)
  for j in reversed(range(num)):
    l_j = lax.slice(l_rows, (0, j * m), (m, (j + 1) * m))
    a_my = lax.dynamic_slice(a_full, (my * m, 0), (m, k))
    contrib = jnp.where(my > j,
                        lax.dot_general(l_j, a_my, (((0,), (0,)), ((), ())),
                                        precision=_bwd_precision()),
                        0.0)
    s_j = lax.psum(contrib, axis_name)
    z_j = lax.slice(z, (j * m, 0), ((j + 1) * m, k))
    a_j = lax.dot_general(w_stack[j], z_j - s_j, (((0,), (0,)), ((), ())),
                          precision=_bwd_precision())
    a_full = lax.dynamic_update_slice(a_full, a_j, (j * m, 0))
  return a_full


def _tri_inv_rows_doubling(t_loc, l_rows, my, num, m, axis_name):
  """Row-sharded T = L^{-1} by recursive block doubling (P power of 2).

  On entry t_loc holds the block-diagonal inverse (this device's W at
  its own diagonal block). Each level merges sibling groups via
    [[A, 0], [B, C]]^{-1} = [[Ta, 0], [-Tc B Ta, Tc]]
  with the two (s, s) GEMMs row-sharded over the group and two
  (m, s) -> (n, s) all_gathers per level (O(n^2 log P) ICI total).
  Devices in the lo half of a pair compute a discarded Y (SPMD waste);
  the useful FLOPs are n^3/3 like the serial inverse but the critical
  path is log P GEMM rounds instead of P.
  """
  lvl = 1
  while lvl < num:
    s = lvl * m
    a0 = (my // (2 * lvl)) * (2 * lvl) * m   # pair base offset (traced)
    lo_cols = lax.dynamic_slice(t_loc, (0, a0), (m, s))
    gat = lax.all_gather(lo_cols, axis_name, tiled=True)      # (n, s)
    ta = lax.dynamic_slice(gat, (a0, 0), (s, s))              # T[lo, lo]
    b_loc = lax.dynamic_slice(l_rows, (0, a0), (m, s))        # L[my, lo]
    x_loc = lax.dot_general(b_loc, ta, (((1,), (0,)), ((), ())),
                            precision=_bwd_precision())
    gx = lax.all_gather(x_loc, axis_name, tiled=True)         # (n, s)
    xs = lax.dynamic_slice(gx, (a0 + s, 0), (s, s))           # B @ Ta
    tc_cols = lax.dynamic_slice(t_loc, (0, a0 + s), (m, s))
    y_loc = -lax.dot_general(tc_cols, xs, (((1,), (0,)), ((), ())),
                             precision=_bwd_precision())
    in_hi = (my % (2 * lvl)) >= lvl
    t_loc = lax.dynamic_update_slice(
        t_loc, jnp.where(in_hi, y_loc, lo_cols), (0, a0))
    lvl *= 2
  return t_loc


def _tri_inv_rows_serial(t_loc, l_rows, my, num, m, axis_name):
  """Row-sharded T = L^{-1}, serial block-row loop (any P; fallback for
  non-power-of-2 meshes). Step i computes T[i, :i] = -W_i L[i, :i]
  T[:i, :i] — the GEMM runs on every device (SPMD) but only device i
  keeps the result, so wall-clock is the full n^3/3 path."""
  for i in range(1, num):
    iw = i * m
    gat = lax.all_gather(lax.slice(t_loc, (0, 0), (m, iw)), axis_name,
                         tiled=True)
    tprev = lax.slice(gat, (0, 0), (iw, iw))
    prod = lax.dot_general(lax.slice(l_rows, (0, 0), (m, iw)), tprev,
                           (((1,), (0,)), ((), ())), precision=_bwd_precision())
    w_my = lax.dynamic_slice(t_loc, (0, my * m), (m, m))
    new = -lax.dot_general(w_my, prod, (((1,), (0,)), ((), ())),
                           precision=_bwd_precision())
    upd = jnp.where(my == i, new, lax.slice(t_loc, (0, 0), (m, iw)))
    t_loc = t_loc.at[:, :iw].set(upd)
  return t_loc


def _kinv_rows(t_loc, my, num, m, axis_name):
  """Row-sharded K^{-1} = T^T T (LAUUM), triangularity-aware.

  num == 1 (static): t_loc IS the full lower-triangular T, so reuse the
  single-chip blocked SYRK (`ops.pallas_mll._kinv_from_linv`,
  mode='syrk'): column block j only contracts T's rows >= j — n^3 MACs
  instead of the full GEMM's 2n^3.

  num > 1: for each STATIC block row i only the LOWER part
  K^{-1}[i, :i+1] = psum_k T[k, i]^T T[k, :i+1] is computed (the right
  operand width (i+1)m is static, so the GEMM genuinely shrinks); the
  strictly-upper blocks of each device's row come from symmetry —
  every device already holds the psum'd lower rows, so block
  (my, i > my) is the transpose of row i's block at column my. Halves
  both local MACs (sum_i 2 m^2 (i+1) m ~= m n^2 vs 2 m n^2) and ICI
  traffic (psums of (m, (i+1)m) vs (m, n)) at large P."""
  n = t_loc.shape[1]
  if num == 1:
    from hyperbo_tpu.ops.pallas_mll import _kinv_from_linv
    return _kinv_from_linv(t_loc, _bwd_precision(), mode='syrk')
  kinv = jnp.zeros((m, n), jnp.float32)
  for i in range(num):
    iw = (i + 1) * m
    tb = lax.slice(t_loc, (0, i * m), (m, iw))
    tb = jnp.where(my >= i, tb, 0.0)
    t_lo = lax.slice(t_loc, (0, 0), (m, iw))
    part = lax.dot_general(tb, t_lo, (((0,), (0,)), ((), ())),
                           precision=_bwd_precision())
    row_lo = lax.psum(part, axis_name)            # (m, iw), replicated
    kinv = kinv + jnp.where(
        my == i, jnp.pad(row_lo, ((0, 0), (0, n - iw))), 0.0)
    # Mirror: devices my < i read their column block of row i and
    # transpose it into static columns [i*m, (i+1)*m). The
    # dynamic_slice start clamps in-bounds when my >= i (masked out).
    blk = lax.dynamic_slice(row_lo, (0, jnp.minimum(my, i) * m), (m, m))
    kinv = kinv.at[:, i * m:iw].add(
        jnp.where(my < i, jnp.swapaxes(blk, 0, 1), 0.0))
  return kinv


def _dist_nll_grads(mean_func, cov_func, params, warp_func, mesh,
                    axis_name, eps, x, y, l_rows, w_stack=None, z=None,
                    alpha=None):
  """(d_model, d_x, d_y) of the distributed NLL from its saved factor.

  l_rows: row-sharded (n, n) lower-triangular factor of K (global
  shape; shard_map re-slices it). Either `alpha` (= K^{-1} delta,
  replicated) or the pair (w_stack, z) from the fused forward must be
  given — the latter reconstructs alpha by distributed
  back-substitution. Returns cotangents WITHOUT the outer scalar
  (caller multiplies the upstream cotangent in).
  """
  num = mesh.shape[axis_name]
  n = x.shape[0]
  m = n // num
  model = params.model

  def delta_fn(mo, x_, y_):
    p = _params_like(params, mo)
    return (y_ - jnp.atleast_2d(mean_func(p, x_, warp_func=warp_func))
            ).astype(jnp.float32)

  delta, delta_vjp = jax.vjp(delta_fn, model, x, y)
  k_draws = delta.shape[1]

  def body(mo, x_loc, l_loc, *opt):
    my = lax.axis_index(axis_name)
    if alpha is None:
      w_st, z_rep = opt
      a_full = _alpha_backsub(l_loc, w_st, z_rep, my, num, m, k_draws,
                              axis_name)
      w_my = lax.dynamic_index_in_dim(w_st, my, 0, keepdims=False)
    else:
      a_full, = opt
      a_full = a_full.astype(jnp.float32)
      # Diagonal-block inverse for the triangular-inverse seed.
      d_blk = lax.dynamic_slice(l_loc, (0, my * m), (m, m))
      w_my = jax.lax.linalg.triangular_solve(
          d_blk, jnp.eye(m, dtype=l_loc.dtype), left_side=True,
          lower=True)
    t_loc = lax.dynamic_update_slice(
        jnp.zeros((m, n), jnp.float32), w_my.astype(jnp.float32),
        (0, my * m))
    l32 = l_loc.astype(jnp.float32)
    if num & (num - 1) == 0:
      t_loc = _tri_inv_rows_doubling(t_loc, l32, my, num, m, axis_name)
    else:
      t_loc = _tri_inv_rows_serial(t_loc, l32, my, num, m, axis_name)
    kinv_loc = _kinv_rows(t_loc, my, num, m, axis_name)
    a_my = lax.dynamic_slice(a_full, (my * m, 0), (m, k_draws))
    g_rows = 0.5 * (k_draws * kinv_loc
                    - lax.dot_general(a_my, a_full,
                                      (((1,), (1,)), ((), ())),
                                      precision=_bwd_precision()))
    # Chain onto (model, x) through the shard-local Gram row block —
    # the diagonal ridge rides inside so noise_variance (and its warp)
    # gets its trace(G) adjoint for free.
    x_full = lax.all_gather(x_loc, axis_name, tiled=True)
    grows = my * m + jnp.arange(m)
    diag_mask = (jnp.arange(n)[None, :] == grows[:, None]).astype(
        jnp.float32)

    def krow_fn(mo_, xl, xf):
      p = _params_like(params, mo_)
      nv, = retrieve_params(p, ['noise_variance'], warp_func=warp_func)
      ridge = jnp.squeeze(nv) + eps
      return (cov_func(p, xl, xf, warp_func=warp_func)
              + diag_mask * ridge)

    krow, krow_vjp = jax.vjp(krow_fn, mo, x_loc, x_full)
    d_model, d_xl, d_xf = krow_vjp(g_rows.astype(krow.dtype))
    d_model = jax.tree_util.tree_map(
        lambda t: lax.psum(t, axis_name), d_model)
    d_xf = lax.psum(d_xf, axis_name)
    d_x_loc = d_xl + lax.dynamic_slice(
        d_xf, (my * m,) + (0,) * (d_xf.ndim - 1), (m,) + d_xf.shape[1:])
    return d_model, d_x_loc, a_full

  opt_args = (alpha,) if alpha is not None else (w_stack, z)
  opt_specs = (P(),) if alpha is not None else (P(), P())
  d_model_cov, d_x_cov, a_rep = shard_map_unchecked(
      body, mesh=mesh,
      in_specs=(P(), P(axis_name), P(axis_name)) + opt_specs,
      out_specs=(P(), P(axis_name), P()))(
          model, x, l_rows, *opt_args)
  # delta chain: dNLL/d delta = alpha.
  d_model_mean, d_x_mean, d_y = delta_vjp(a_rep)
  d_model = jax.tree_util.tree_map(jnp.add, d_model_cov, d_model_mean)
  return d_model, d_x_cov + d_x_mean, d_y


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

  Differentiable w.r.t. (params.model, x, y) via a custom VJP: the
  backward reuses the replicated factor (sliced row-sharded) and the
  already-computed alpha = K^{-1} delta, so jax.grad never unrolls the
  block-cyclic factorization loop (matching the reference's custom-VJP
  discipline at hyperbo/basics/linalg.py:139-171).
  """

  def _forward(model, x_, y_):
    p = _params_like(params, model)
    noise_variance, = retrieve_params(p, ['noise_variance'],
                                      warp_func=warp_func)
    n = x_.shape[0]
    kmat = gram_rowsharded(cov_func, p, x_, mesh, warp_func=warp_func,
                           axis_name=axis_name)
    kmat = kmat + jnp.eye(n, dtype=kmat.dtype) * (noise_variance + eps)
    chol = distributed_chol.distributed_cholesky(
        kmat, mesh, block=block, axis_name=axis_name,
        panel_solver=panel_solver)
    delta = y_ - jnp.atleast_2d(mean_func(p, x_, warp_func=warp_func))
    kinvy = chol_ops.cho_solve(chol, delta)
    # Joint NLL of m independent draws: trace(delta^T K^{-1} delta),
    # with the logdet and 2pi terms counted once per draw. (The host
    # per-task path keeps the reference's sum-over-(m, m) form for
    # parity — for m = 1 the two coincide; this new entry point uses
    # the correct multi-draw form.)
    m = delta.shape[1]
    quad = jnp.sum(delta * kinvy)
    logdet_half = jnp.sum(jnp.log(jnp.diagonal(chol)))
    nll = 0.5 * quad + m * (logdet_half + 0.5 * n * jnp.log(2 * jnp.pi))
    return nll, (chol, kinvy)

  @jax.custom_vjp
  def core(model, x_, y_):
    return _forward(model, x_, y_)[0]

  def fwd(model, x_, y_):
    nll, (chol, kinvy) = _forward(model, x_, y_)
    return nll, (model, x_, y_, chol, kinvy)

  def bwd(res, g):
    model, x_, y_, chol, kinvy = res
    d_model, d_x, d_y = _dist_nll_grads(
        mean_func, cov_func, _params_like(params, model), warp_func,
        mesh, axis_name, eps, x_, y_, chol, alpha=kinvy)
    scale = lambda t: jax.tree_util.tree_map(lambda a: g * a, t)
    return scale(d_model), scale(d_x), scale(d_y)

  core.defvjp(fwd, bwd)
  return core(params.model, x, y)


def _panels_to_dense_tri(lp: jnp.ndarray, block: int) -> jnp.ndarray:
  """Panel-major factor -> dense lower-triangular (shared helper in
  ops/pallas_mll; thin alias kept for in-module callers)."""
  from hyperbo_tpu.ops import pallas_mll
  return pallas_mll.panels_to_dense_tri(lp, block)


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
  tests/test_distributed_chol.py and exercised by the dryrun.

  Differentiable w.r.t. (params.model, x, y) on BOTH backends via a
  custom VJP (round-4 verdict item 1): the forward additionally
  exports its row-sharded factor, the replicated W_j = L_jj^{-1}
  blocks and z = L^{-1} delta; the backward reconstructs alpha by
  distributed back-substitution, builds K^{-1} row-sharded
  (block-doubling triangular inverse + masked-psum LAUUM, all MXU
  GEMMs inside shard_map), forms G = 0.5 (k K^{-1} - alpha alpha^T)
  per row block and chains onto the inputs with one jax.vjp of the
  shard-local Gram row block. Gradient parity vs the dense NLL
  gradient is tested on the CPU mesh (tests/test_distributed_grad.py).

  Args:
    backend: 'pallas' (shard-local Pallas kernels), 'xla' (plain XLA
      local ops — same coarse algorithm, any platform), or 'auto'
      (pallas on TPU, xla elsewhere). The pallas backend requires
      m % 512 == 0 (kernel block/chunk geometry); smaller shards fall
      back to XLA local ops (with a warning when 'pallas' was
      explicitly requested).
    interpret: force Pallas interpret mode (defaults to True off-TPU).
  """
  from hyperbo_tpu.ops import pallas_chol_hbm
  from hyperbo_tpu.ops import pallas_mll
  from hyperbo_tpu.ops import pallas_triinv

  platform = jax.devices()[0].platform
  explicit_pallas = backend == 'pallas'
  if backend == 'auto':
    backend = 'pallas' if platform == 'tpu' else 'xla'
  if interpret is None:
    interpret = platform != 'tpu'
  assert backend in ('pallas', 'xla'), backend
  num = mesh.shape[axis_name]
  n = x.shape[0]
  assert n % num == 0, (n, num)
  m = n // num
  hi = _HI

  use_pallas_local = backend == 'pallas' and m >= 512 and m % 512 == 0
  if explicit_pallas and not use_pallas_local:
    warnings.warn(
        f'mll_distributed_fused: backend="pallas" requested but the '
        f'shard width m={m} is not a multiple of 512 — running plain '
        f'XLA local ops instead.', stacklevel=2)
  fused0 = False
  kfam = None
  if use_pallas_local and cov_func is not None:
    try:
      kfam = pallas_mll.kernel_family(cov_func)
      fused0 = True
    except ValueError:
      fused0 = False
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

  def _forward(model, x_, y_, want_residuals):
    p = _params_like(params, model)
    noise_variance, = retrieve_params(p, ['noise_variance'],
                                      warp_func=warp_func)
    ridge = jnp.squeeze(noise_variance) + eps
    delta = y_ - jnp.atleast_2d(mean_func(p, x_, warp_func=warp_func))
    k_draws = delta.shape[1]
    if fused0:
      lengthscale, signal_variance = retrieve_params(
          p, ['lengthscale', 'signal_variance'], warp_func=warp_func)
      emb0 = pallas_mll._se_embed(p, x_[:m], cov_func, warp_func)
      xs0 = (emb0 / lengthscale).astype(jnp.float32)
      sv0 = jnp.squeeze(signal_variance)
    else:
      xs0 = jnp.zeros((1, 1), jnp.float32)  # placeholder operand
      sv0 = jnp.float32(0.0)

    def body(x_loc, delta_full):
      my = lax.axis_index(axis_name)
      x_full = lax.all_gather(x_loc, axis_name, tiled=True)
      a_loc = cov_func(p, x_loc, x_full, warp_func=warp_func)
      gcols = jnp.arange(n)
      grows = my * m + jnp.arange(m)
      a_loc = a_loc + (gcols[None, :] == grows[:, None]) * ridge
      acc = jnp.zeros_like(delta_full)
      quad = jnp.float32(0.0)
      ldet = jnp.float32(0.0)
      l_rows = jnp.zeros((m, n), jnp.float32) if want_residuals else None
      w_list = []
      z_list = []
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
          # Broadcast only device j's Schur-updated diagonal block
          # (everyone else's candidate is masked out of the psum) —
          # O(m^2) ICI per step instead of gathering all P candidates.
          d_blk = lax.psum(jnp.where(my == j, cand, 0.0), axis_name)
          l_exact = _chol_local(d_blk)
          w = _winv_local(l_blk=l_exact)
          ldj = jnp.sum(jnp.log(jnp.diagonal(l_exact)))
        l_pj = jax.lax.dot_general(cand, w, (((1,), (1,)), ((), ())),
                                   precision=hi)
        l_pj = jnp.where(my > j, l_pj, jnp.where(my == j, l_exact, 0.0))
        panel = lax.all_gather(l_pj, axis_name, tiled=True)  # (n, m)
        d_j = lax.slice(delta_full, (c0, 0), (c0 + m, k_draws))
        acc_j = lax.slice(acc, (c0, 0), (c0 + m, k_draws))
        z_j = jax.lax.dot_general(w, d_j - acc_j,
                                  (((1,), (0,)), ((), ())),
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
        if want_residuals:
          l_rows = l_rows.at[:, c0:c0 + m].set(l_pj.astype(jnp.float32))
          w_list.append(w.astype(jnp.float32))
          z_list.append(z_j.astype(jnp.float32))
      if want_residuals:
        return (quad, ldet, l_rows, jnp.stack(w_list),
                jnp.concatenate(z_list, axis=0))
      return quad, ldet

    out_specs = ((P(), P(), P(axis_name), P(), P()) if want_residuals
                 else (P(), P()))
    out = shard_map_unchecked(
        body, mesh=mesh, in_specs=(P(axis_name), P()),
        out_specs=out_specs)(x_, delta.astype(jnp.float32))
    quad, ldet = out[0], out[1]
    nll = 0.5 * quad + k_draws * (ldet + 0.5 * n * jnp.log(2 * jnp.pi))
    return (nll,) + tuple(out[2:])

  @jax.custom_vjp
  def core(model, x_, y_):
    return _forward(model, x_, y_, want_residuals=False)[0]

  def fwd(model, x_, y_):
    nll, l_rows, w_stack, z = _forward(model, x_, y_,
                                       want_residuals=True)
    return nll, (model, x_, y_, l_rows, w_stack, z)

  def bwd(res, g):
    model, x_, y_, l_rows, w_stack, z = res
    d_model, d_x, d_y = _dist_nll_grads(
        mean_func, cov_func, _params_like(params, model), warp_func,
        mesh, axis_name, eps, x_, y_, l_rows, w_stack=w_stack, z=z)
    scale = lambda t: jax.tree_util.tree_map(lambda a: g * a, t)
    return scale(d_model), scale(d_x), scale(d_y)

  core.defvjp(fwd, bwd)
  return core(params.model, x, y)


def make_large_loss_sharded(mean_func, cov_func, config, mesh: Mesh,
                            warp_func=None, axis_name: str = 'task',
                            route: str = 'fused', backend: str = 'auto',
                            eps: float = 1e-6, block: int = 256):
  """Build `loss_fn(model, (x, y)) -> scalar` over the distributed NLL.

  The large-n analog of `parallel.mesh.make_packed_loss_sharded`: one
  task whose Gram matrix is row-sharded over the mesh instead of many
  tasks sharded across it. The loss is `mll_distributed_fused`
  (route='fused', shard-local Pallas kernels on TPU) or
  `mll_distributed` (route='cyclic', block-cyclic factorization), each
  carrying the custom VJP, MINUS the `config['priors']` hyperprior
  log-densities — the reference NLL's regularization semantics
  (hyperbo/gp_utils/objectives.py:198-207); the prior terms are O(p)
  and ride replicated outside the shard_map.
  """
  from hyperbo_tpu.models.objectives import _hyperprior_log_prob
  assert route in ('fused', 'cyclic'), route

  def loss_fn(model, batch):
    x_, y_ = batch
    p = defs.GPParams(model=model, config=config)
    if route == 'fused':
      nll = mll_distributed_fused(
          mean_func, cov_func, p, x_, y_, mesh, warp_func=warp_func,
          axis_name=axis_name, eps=eps, backend=backend)
    else:
      nll = mll_distributed(
          mean_func, cov_func, p, x_, y_, mesh, warp_func=warp_func,
          axis_name=axis_name, eps=eps, block=block)
    return nll - _hyperprior_log_prob(p, warp_func)

  return loss_fn


def fit_adam_large_sharded(mean_func, cov_func, model_params, x, y,
                           config, mesh: Mesh, warp_func=None, key=None,
                           axis_name: str = 'task', route: str = 'fused',
                           backend: str = 'auto', eps: float = 1e-6,
                           callback=None):
  """Multi-chip large-n GP pre-training: Adam through the distributed NLL.

  The missing top of the multi-chip training stack: `mll_distributed*`
  made the loss differentiable; this runs the actual optimization the
  reference does on one device (hyperbo/gp_utils/gp.py:114-157, adam
  path) for a task whose n exceeds a single chip. x is placed
  row-sharded over the mesh and stays there for the whole run (a
  scan-invariant operand — no per-step transfer); y and the parameter /
  optimizer-state pytrees ride replicated; every step is full-batch
  (the reference subsamples tasks, not rows — one large task has no
  task axis to subsample) value_and_grad through the distributed
  factorization, gradients psum over ICI inside the custom VJP.

  Delegates to `train.adam.fit_adam_scan`, so the NaN-freeze,
  checkpoint-chunking/callback and `config['return_state']` resume
  semantics are exactly the single-chip trainer's.

  Args:
    model_params: initial trainable model dict (GPParams.model).
    x: (n, d) inputs, n % mesh size == 0. y: (n, k) draws.
    config: needs 'learning_rate' and 'max_training_step'; honors
      'priors', 'checkpoint_every', 'opt_state', 'return_state'.
    route/backend: see `make_large_loss_sharded`.

  Returns:
    (model_params, losses) — or (model_params, losses, opt_state) with
    config['return_state'].
  """
  from hyperbo_tpu.train import adam as adam_lib
  loss_fn = make_large_loss_sharded(
      mean_func, cov_func, config, mesh, warp_func=warp_func,
      axis_name=axis_name, route=route, backend=backend, eps=eps)
  x = jax.device_put(x, NamedSharding(mesh, P(axis_name)))
  y = jax.device_put(y, NamedSharding(mesh, P()))
  return adam_lib.fit_adam_scan(loss_fn, model_params, (x, y), None,
                                config, key=key, callback=callback)


def make_fit_adam_large_sharded(mean_func, cov_func, config, mesh: Mesh,
                                warp_func=None, axis_name: str = 'task',
                                route: str = 'fused',
                                backend: str = 'auto', eps: float = 1e-6):
  """Reusable compiled analog of `fit_adam_large_sharded`.

  `fit_adam_large_sharded` (via `fit_adam_scan`) wraps its scan in a
  fresh `jax.jit` per call, so repeated same-shaped training runs pay
  the full retrace each time — ~56 s measured at n=8192 through the
  remote toolchain against ~0.2 s of device time (PERF.md r18). Same
  memoized-runner discipline as `train.adam.make_fit_adam_scan` (the
  r7 BO-retrain lesson): this factory returns ONE jitted
  `run(model_params, x, y) -> (model_params, losses)` shared across
  all same-shaped calls. Place x row-sharded / y replicated before
  calling (one `jax.device_put` per buffer, as
  `fit_adam_large_sharded` does) to avoid re-transfer per run.

  Semantics match `fit_adam_large_sharded` (full-batch steps,
  NaN-freeze, config['priors']) except: no callbacks/checkpoint
  chunks and no opt_state resume — callers needing those should use
  `fit_adam_large_sharded`.
  """
  from hyperbo_tpu.train import adam as adam_lib
  loss_fn = make_large_loss_sharded(
      mean_func, cov_func, config, mesh, warp_func=warp_func,
      axis_name=axis_name, route=route, backend=backend, eps=eps)
  inner = adam_lib.make_fit_adam_scan(loss_fn, None, config)

  def run(model_params, x, y, key=None):
    if key is None:
      key = jax.random.PRNGKey(0)
    return inner(model_params, (x, y), key)

  return run
