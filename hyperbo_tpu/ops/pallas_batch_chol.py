"""Batched small-matrix Cholesky inverse-transpose: K -> B = L^{-T}.

Why this kernel exists. The multi-task NLL at PD1 subsample scale
factorizes a batch of tiny (~100x100) kernel matrices per training step
(models/packed.nll_one_task, vmapped). XLA lowers batched Cholesky and
triangular solves to row-at-a-time while loops (CholeskyExpander /
TriangularSolveExpander), so each step pays hundreds of sequential
device iterations for ~20 MFLOP of math — the headline PD1 pre-training
step (reference loop: hyperbo/gp_utils/gp.py:124-146) is overhead-bound,
not compute-bound.

The TPU-native fix: ONE Pallas kernel factors every task's K
simultaneously and returns B = L^{-T}. The classic outer-product
Cholesky sweep is run on the stacked working set W = [K; I]: applying
each step's column normalization and rank-1 update to the identity block
as well yields B in the bottom half,

    b_k = (e_k - sum_{i<k} b_i L[k,i]) / L[k,k]   =>   B L^T = I,

(the [D;I] trick from ops/pallas_chol_hbm.py's v8 sweep). With B in
hand, EVERYTHING downstream is a batched MXU matmul — no triangular
solves anywhere:

    L^{-1}      = B^T
    z           = B^T delta          (forward solve)
    quad        = |z|^2              (Mahalanobis term)
    logdet(L)   = -sum log diag B    (diag B = 1/L_jj)
    K^{-1}      = B B^T              (backward pass)

so the NLL's custom VJP (nll_terms_batched) is loop-free end to end.

The sweep is fully static (128 unrolled steps, static slices only —
Mosaic's alignment prover needs no dynamic sublane/lane offsets), and
the per-step update touches exactly the live rows: at step j the top
half's active rows are j..127 and the identity block's are 128..128+j —
a single CONTIGUOUS row window [j, j+129) of the stacked W.

Two TPU implementations (probed on hardware, see PERF.md):
  * 'tasks3d' — one kernel invocation, tasks vectorized on the sublane
    dimension of a (256, T, 128) working set; each sweep step is one
    (129, T, 128) fused multiply-subtract.
  * 'grid2d'  — grid over tasks, each cell sweeps its own (256, 128)
    working set with 2-D ops only (conservative Mosaic surface).

Reference semantics anchored: per-task NLL formula
hyperbo/gp_utils/objectives.py:144-156; this module only changes how
the factorization executes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
  from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
  pltpu = None

_N = 128        # fixed base size; smaller n are padded by the wrapper
_MAX_T3D = 24   # tasks per 'tasks3d' invocation (VMEM: (512+T*?)...);
                # W+in+out = (256+128+128)*T*128*4B -> T=24 is ~6.3 MB


def _sweep_kernel_3d(k_ref, b_ref, w_ref):
  """Stacked [K; I] sweep, tasks on the sublane axis.

  k_ref: (N, T, N) input, layout (row, task, col).
  b_ref: (N, T, N) output B = L^{-T}.
  w_ref: (2N, T, N) scratch.
  """
  n = k_ref.shape[0]
  t = k_ref.shape[1]
  w_ref[0:n] = k_ref[:]
  row3 = jax.lax.broadcasted_iota(jnp.int32, (n, t, n), 0)
  col3 = jax.lax.broadcasted_iota(jnp.int32, (n, t, n), 2)
  w_ref[n:2 * n] = jnp.where(row3 == col3, 1.0, 0.0)
  lane = jax.lax.broadcasted_iota(jnp.int32, (1, t, n), 2)

  for j in range(n):
    prow = w_ref[j:j + 1, :, :]                        # (1, T, N)
    piv = prow[:, :, j:j + 1]                          # (1, T, 1)
    # No pivot clamp: a non-PD K must yield NaN (rsqrt of a negative)
    # so the trainers' isfinite-freeze trips exactly as it does on the
    # dense lax.linalg.cholesky path. A clamp here would turn an
    # indefinite batch into large-but-finite garbage and silently
    # corrupt training.
    rp = jax.lax.rsqrt(piv)
    wseg = w_ref[j:j + n + 1]                          # (N+1, T, N)
    colseg = wseg[:, :, j:j + 1] * rp                  # (N+1, T, 1)
    rowm = jnp.where(lane > j, prow * rp, 0.0)         # (1, T, N)
    upd = wseg - colseg * rowm
    w_ref[j:j + n + 1] = jnp.where(lane == j, colseg, upd)

  b_ref[:] = w_ref[n:2 * n]


def _sweep_kernel_2d(k_ref, b_ref, w_ref):
  """Per-task stacked sweep; grid over tasks, 2-D values only.

  k_ref/b_ref: (1, N, N) blocks of the (T, N, N) input/output.
  w_ref: (2N, N) scratch.
  """
  n = k_ref.shape[1]
  w_ref[0:n] = k_ref[0]
  row2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
  col2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
  w_ref[n:2 * n] = jnp.where(row2 == col2, 1.0, 0.0)
  lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

  for j in range(n):
    prow = w_ref[j:j + 1, :]                           # (1, N)
    piv = prow[:, j:j + 1]                             # (1, 1)
    rp = jax.lax.rsqrt(piv)  # no clamp: non-PD -> NaN (see tasks3d)
    wseg = w_ref[j:j + n + 1, :]                       # (N+1, N)
    colseg = wseg[:, j:j + 1] * rp                     # (N+1, 1)
    rowm = jnp.where(lane > j, prow * rp, 0.0)         # (1, N)
    upd = wseg - colseg * rowm
    w_ref[j:j + n + 1, :] = jnp.where(lane == j, colseg, upd)

  b_ref[0] = w_ref[n:2 * n]


def _linv_t_tasks3d(kb, interpret):
  t, n, _ = kb.shape
  k3 = jnp.moveaxis(kb, 0, 1)                          # (N, T, N)
  b3 = pl.pallas_call(
      _sweep_kernel_3d,
      out_shape=jax.ShapeDtypeStruct((n, t, n), jnp.float32),
      scratch_shapes=[pltpu.VMEM((2 * n, t, n), jnp.float32)],
      interpret=interpret,
  )(k3.astype(jnp.float32))
  return jnp.moveaxis(b3, 0, 1)                        # (T, N, N)


def _linv_t_grid2d(kb, interpret):
  t, n, _ = kb.shape
  return pl.pallas_call(
      _sweep_kernel_2d,
      grid=(t,),
      in_specs=[pl.BlockSpec((1, n, n), lambda i: (i, 0, 0))],
      out_specs=pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((t, n, n), jnp.float32),
      scratch_shapes=[pltpu.VMEM((2 * n, n), jnp.float32)],
      interpret=interpret,
  )(kb.astype(jnp.float32))


def _linv_t_xla(kb):
  """Reference/fallback path (XLA while-loop solves)."""
  chol = lax.linalg.cholesky(kb, symmetrize_input=False)
  eye = jnp.broadcast_to(jnp.eye(kb.shape[-1], dtype=kb.dtype), kb.shape)
  linv = lax.linalg.triangular_solve(chol, eye, left_side=True,
                                     lower=True)
  return jnp.swapaxes(linv, -1, -2)


def batched_linv_t(kb: jnp.ndarray, impl: str = 'tasks3d',
                   interpret: bool = False) -> jnp.ndarray:
  """B = L^{-T} for a batch of SPD matrices kb: (T, n, n), n <= 128.

  n < 128 is padded with an identity block (the padded sub-problem is
  independent, so the top-left n x n of the padded B is exact). Batches
  larger than _MAX_T3D are processed in chunks ('tasks3d' VMEM bound).
  """
  t, n, _ = kb.shape
  assert n <= _N, (n, 'use the blocked recursion / fused kernel above 128')
  kb = 0.5 * (kb + jnp.swapaxes(kb, -1, -2))           # exact-symmetry
  if impl == 'xla':
    return _linv_t_xla(kb)
  if n < _N:
    eye = jnp.eye(_N, dtype=kb.dtype)
    kpad = jnp.broadcast_to(eye, (t, _N, _N))
    kb = kpad.at[:, :n, :n].set(kb)
  if impl == 'grid2d':
    b = _linv_t_grid2d(kb, interpret)
  else:
    if t <= _MAX_T3D:
      b = _linv_t_tasks3d(kb, interpret)
    else:
      pad_t = (-t) % _MAX_T3D
      kb_c = jnp.concatenate(
          [kb, jnp.broadcast_to(jnp.eye(_N, dtype=kb.dtype),
                                (pad_t, _N, _N))], axis=0)
      chunks = kb_c.reshape(-1, _MAX_T3D, _N, _N)
      b = lax.map(lambda c: _linv_t_tasks3d(c, interpret),
                  chunks).reshape(-1, _N, _N)[:t]
  if n < _N:
    b = b[:, :n, :n]
  return b


# ---------------------------------------------------------------------
# NLL terms with a loop-free custom VJP.

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def nll_terms_batched(kb, delta, impl='tasks3d', interpret=False):
  """Per-task (quad, logdet_half) of a batch of GP systems.

  quad_t = delta_t^T K_t^{-1} delta_t,  ld_t = sum_j log L_jj.
  kb: (T, n, n) SPD (masked, diag-filled); delta: (T, n, 1).
  Differentiable w.r.t. kb and delta; the backward pass is batched
  matmuls against the forward's B = L^{-T} (module docstring).
  """
  quad, ld, _, _ = _nll_terms_fwd_impl(kb, delta, impl, interpret)
  return quad, ld


def _nll_terms_fwd_impl(kb, delta, impl, interpret):
  b = batched_linv_t(kb, impl=impl, interpret=interpret)
  z = jnp.matmul(jnp.swapaxes(b, -1, -2), delta)       # L^{-1} delta
  quad = jnp.sum(z * z, axis=(-2, -1))
  diag = jnp.diagonal(b, axis1=-2, axis2=-1)
  # diag B = 1/L_jj > 0 for an SPD input; log of a NaN/nonpositive diag
  # (non-PD input) must propagate, matching the dense pipeline.
  ld = -jnp.sum(jnp.log(diag), axis=-1)
  return quad, ld, b, z


def _nll_terms_fwd(kb, delta, impl, interpret):
  quad, ld, b, z = _nll_terms_fwd_impl(kb, delta, impl, interpret)
  return (quad, ld), (b, z)


def _nll_terms_bwd(impl, interpret, res, bars):
  b, z = res
  qbar, lbar = bars
  qbar = qbar[:, None, None]
  lbar = lbar[:, None, None]
  alpha = jnp.matmul(b, z)                             # K^{-1} delta
  kinv = jnp.matmul(b, jnp.swapaxes(b, -1, -2))
  kbar = (0.5 * lbar * kinv
          - qbar * jnp.matmul(alpha, jnp.swapaxes(alpha, -1, -2)))
  dbar = 2.0 * qbar * alpha
  return kbar, dbar


nll_terms_batched.defvjp(_nll_terms_fwd, _nll_terms_bwd)
