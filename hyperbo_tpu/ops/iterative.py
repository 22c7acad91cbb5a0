"""Matrix-free GP marginal likelihood for n beyond the O(n^2) wall.

The direct pipeline (fused Pallas kernel / XLA Cholesky) materializes
the n x n Gram matrix — 4 GB of HBM at n = 32768 and impossible at
n = 131072 on one chip. This module estimates the same NLL with O(n)
memory in the style of GPyTorch's BBMM / "Exact Gaussian Processes on
a Million Data Points" (PAPERS.md: arxiv 1809.11165, 1903.08114),
built TPU-first:

  * `kernel_matvec` — (K + da I) @ V without materializing K: a
    `lax.scan` over row chunks, each chunk one rank-d MXU matmul +
    kernel epilogue against ALL columns of V (so CG probes and SLQ
    probes ride one pass); O(chunk * n) peak memory.
  * `cg_batched` — batched conjugate gradients as one `lax.while_loop`
    (all right-hand sides iterate together; convergence on the max
    residual), no host round-trips.
  * `slq_logdet` — stochastic Lanczos quadrature: m Rademacher probes,
    k Lanczos steps each (one `lax.scan`), logdet ~= sum over probes of
    ||z||^2 * e1^T f(T) e1 with f = log on the tridiagonal eigenvalues.
  * `mll_iterative` — 0.5 y^T K^{-1} y (CG, exact to tolerance)
    + 0.5 logdet (SLQ, unbiased estimator) + const.

Accuracy model: the quad term converges to the direct value (CG on a
well-conditioned K + da I); the logdet is a randomized estimate whose
relative error shrinks as 1/sqrt(m) — pre-training gradients tolerate
this class of noise, and for the exact value at n <= HBM capacity the
fused kernel remains the default. Reference anchor: the objective this
estimates is hyperbo/gp_utils/objectives.py:144-156.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hyperbo_tpu.ops.pallas_mll_bwd import _km_nm


def _clamp_row_chunk(row_chunk: int, n: int) -> int:
  """Halve row_chunk until the (chunk, n) f32 Gram tile stays under
  2^31 bytes.

  The 2026-08-18 hardware session (PERF.md r4_iterative_probe, commit
  dbb5d0d) saw n=131072 with row_chunk=4096 CRASH the TPU worker
  ("kernel fault") while n=65536 at the same chunk ran clean. The tile
  sizes are exactly 2^31 vs 2^30 bytes — the fault class is int32
  byte-offset overflow on a single >=2 GiB buffer, so the clamp keeps
  every materialized (chunk, n) tile strictly below it. Shrinking the
  chunk only adds scan steps; the math is unchanged.
  """
  while row_chunk > 128 and row_chunk * n * 4 >= 2**31:
    row_chunk //= 2
  return row_chunk


def kernel_matvec(x_scaled: jnp.ndarray, v: jnp.ndarray, sv, da,
                  kfam: str = 'se', row_chunk: int = 1024,
                  precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
  """(K + da I) @ V with K = sv * k_fam(||xi - xj||^2), O(chunk*n) mem.

  x_scaled: (n, d) length-scaled inputs; v: (n, m) right-hand sides.
  n must divide by row_chunk (callers pad; mll_iterative handles it).
  """
  n, d = x_scaled.shape
  assert n % row_chunk == 0, (n, row_chunk)
  xs = x_scaled.astype(jnp.float32)
  sqn = jnp.sum(xs * xs, axis=1, keepdims=True)         # (n, 1)
  vv = v.astype(jnp.float32)
  blocks = xs.reshape(n // row_chunk, row_chunk, d)
  sqb = sqn.reshape(n // row_chunk, row_chunk, 1)
  col_idx = jnp.arange(n).reshape(1, n)

  def one_chunk(c, args):
    xb, sb = args
    r2 = sb + sqn.T - 2.0 * jnp.matmul(xb, xs.T, precision=precision)
    # The self-distance computes as (big - big) and its f32
    # cancellation error can push k(0) anywhere between 0 and sv for
    # large-norm rows (e.g. padding sentinels); zero the in-chunk
    # diagonal and add the exact k(0) = sv with the ridge below. The
    # r2 pin to 1.0 happens BEFORE the family transform so the Matern
    # sqrt's infinite slope at r2=0 never meets the masked entries'
    # zero cotangent (0 * inf = NaN would otherwise poison every
    # gradient through the matvec).
    row_idx = c * row_chunk + jnp.arange(row_chunk).reshape(-1, 1)
    diag = row_idx == col_idx
    km, _ = _km_nm(jnp.where(diag, 1.0, r2), sv, kfam)  # (chunk, n)
    km = jnp.where(diag, 0.0, km)
    return c + 1, jnp.matmul(km, vv, precision=precision)

  _, out = jax.lax.scan(one_chunk, 0, (blocks, sqb))
  return out.reshape(n, -1) + (sv + da) * vv


def partial_pivoted_cholesky(x_scaled: jnp.ndarray, sv, kfam: str,
                             rank: int,
                             precision=jax.lax.Precision.HIGH):
  """Rank-k pivoted partial Cholesky of K (matrix-free, O(nk) memory).

  Greedy max-residual-diagonal pivoting; each step evaluates ONE kernel
  row (O(nd) MXU work). Returns L with K ~ L L^T + (residual). The
  classic CG preconditioner for small-ridge GP systems (GPyTorch
  Sec. 3.2 / PAPERS.md arxiv 1809.11165).
  """
  n, d = x_scaled.shape
  xs = x_scaled.astype(jnp.float32)
  sqn = jnp.sum(xs * xs, axis=1, keepdims=True)

  def krow(i):
    xi = jax.lax.dynamic_slice_in_dim(xs, i, 1, axis=0)     # (1, d)
    si = jnp.sum(xi * xi)
    r2 = si + sqn[:, 0] - 2.0 * jnp.matmul(
        xs, xi.T, precision=precision)[:, 0]
    km, _ = _km_nm(r2, sv, kfam)                            # (n,)
    # Exact k(0) on the pivot's own entry (cancellation-proof).
    return km.at[i].set(sv)

  def step(j, carry):
    lmat, dvec = carry
    i = jnp.argmax(dvec)
    row = krow(i)
    li = jax.lax.dynamic_slice_in_dim(lmat, i, 1, axis=0)   # (1, k)
    col = row - jnp.matmul(lmat, li.T, precision=precision)[:, 0]
    piv = jnp.sqrt(jnp.maximum(dvec[i], 1e-12))
    col = col / piv
    # Mask columns t >= j out of the update (lmat buffer is zero there
    # anyway) and freeze finished pivots' diagonal at 0.
    lmat = jax.lax.dynamic_update_slice_in_dim(
        lmat, col.reshape(n, 1), j, axis=1)
    dvec = jnp.maximum(dvec - col * col, 0.0)
    return lmat, dvec

  l0 = jnp.zeros((n, rank), jnp.float32)
  d0 = jnp.full((n,), jnp.asarray(sv, jnp.float32))
  lmat, _ = jax.lax.fori_loop(0, rank, step, (l0, d0))
  return lmat


def woodbury_inverse_apply(lmat: jnp.ndarray, da):
  """v -> (L L^T + da I)^{-1} v via the Woodbury identity.

  Factors the k x k core once; each application is two (n, k) GEMMs.
  """
  k = lmat.shape[1]
  core = da * jnp.eye(k, dtype=jnp.float32) + jnp.matmul(
      lmat.T, lmat, precision=jax.lax.Precision.HIGH)
  chol = jnp.linalg.cholesky(core)

  def apply(v):
    ltv = jnp.matmul(lmat.T, v, precision=jax.lax.Precision.HIGH)
    sol = jax.scipy.linalg.cho_solve((chol, True), ltv)
    return (v - jnp.matmul(lmat, sol,
                           precision=jax.lax.Precision.HIGH)) / da
  return apply


def cg_batched(matvec: Callable[[jnp.ndarray], jnp.ndarray],
               b: jnp.ndarray, tol: float = 1e-6,
               maxiter: int = 1000,
               precond: Optional[Callable[[jnp.ndarray],
                                          jnp.ndarray]] = None):
  """Batched CG: solve A X = B for SPD A, all columns together.

  Returns (X, iterations, max final residual norm). One
  `lax.while_loop`; convergence when every column's residual norm
  falls under tol * ||b_col||. With `precond` (v -> M^{-1} v for an
  SPD approximation M ~ A) runs preconditioned CG — same fixed point,
  far fewer iterations when A is ill-conditioned (small GP ridge).
  """
  pinv = precond if precond is not None else (lambda v: v)
  bnorm = jnp.sqrt(jnp.sum(b * b, axis=0, keepdims=True))
  thresh = tol * jnp.maximum(bnorm, 1e-30)

  def cond(state):
    _, r, _, _, i = state
    rn = jnp.sqrt(jnp.sum(r * r, axis=0, keepdims=True))
    return jnp.logical_and(i < maxiter, jnp.any(rn > thresh))

  def body(state):
    x, r, p, rz, i = state
    ap = matvec(p)
    alpha = rz / jnp.maximum(jnp.sum(p * ap, axis=0, keepdims=True),
                             1e-30)
    x = x + alpha * p
    r = r - alpha * ap
    z = pinv(r)
    rz_new = jnp.sum(r * z, axis=0, keepdims=True)
    p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
    return x, r, p, rz_new, i + 1

  x0 = jnp.zeros_like(b)
  z0 = pinv(b)
  rz0 = jnp.sum(b * z0, axis=0, keepdims=True)
  x, r, _, _, iters = jax.lax.while_loop(
      cond, body, (x0, b, z0, rz0, jnp.int32(0)))
  return x, iters, jnp.max(jnp.sqrt(jnp.sum(r * r, axis=0)))


def slq_logdet(matvec: Callable[[jnp.ndarray], jnp.ndarray], n: int,
               key: jax.Array, num_probes: int = 16,
               lanczos_steps: int = 32):
  """log det A for SPD A by stochastic Lanczos quadrature.

  E_z [ z^T log(A) z ] = tr(log A) = logdet A with Rademacher probes z;
  each quadratic form is evaluated from k Lanczos steps' tridiagonal
  eigendecomposition (Golub-Welsch). All probes run batched through
  ONE matvec per Lanczos step.
  """
  z = jnp.where(
      jax.random.bernoulli(key, 0.5, (n, num_probes)), 1.0, -1.0
  ).astype(jnp.float32)
  znorm = jnp.sqrt(jnp.sum(z * z, axis=0))              # = sqrt(n)
  q0 = z / znorm

  def lanczos_step(carry, _):
    q_prev, q, beta_prev = carry
    w = matvec(q) - beta_prev * q_prev
    alpha = jnp.sum(q * w, axis=0)
    w = w - alpha * q
    # One pass of reorthogonalization against the two live vectors
    # keeps the tridiagonal coefficients usable at k ~ 32 without
    # storing the full Krylov basis.
    w = w - jnp.sum(w * q, axis=0) * q
    w = w - jnp.sum(w * q_prev, axis=0) * q_prev
    beta = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=0), 1e-30))
    q_next = w / beta
    return (q, q_next, beta), (alpha, beta)

  init = (jnp.zeros_like(q0), q0, jnp.zeros((num_probes,), jnp.float32))
  _, (alphas, betas) = jax.lax.scan(lanczos_step, init, None,
                                    length=lanczos_steps)
  # Tridiagonal T per probe: diag = alphas[:, p], offdiag = betas[:-1, p].
  diag = alphas.T                                       # (m, k)
  off = betas.T[:, :-1]                                 # (m, k-1)
  tmat = (jax.vmap(jnp.diag)(diag)
          + jax.vmap(functools.partial(jnp.diag, k=1))(off)
          + jax.vmap(functools.partial(jnp.diag, k=-1))(off))
  evals, evecs = jnp.linalg.eigh(tmat)                  # (m, k), (m,k,k)
  w0 = evecs[:, 0, :] ** 2                              # e1 weights
  quad = jnp.sum(w0 * jnp.log(jnp.maximum(evals, 1e-30)), axis=1)
  return jnp.mean(quad * (znorm ** 2))


def mll_iterative(mean_func, params, x, y, warp_func=None, eps: float = 1e-6,
                  cov_func=None, row_chunk: int = 1024,
                  cg_tol: float = 1e-5, cg_maxiter: int = 1000,
                  num_probes: int = 16, lanczos_steps: int = 32,
                  key: Optional[jax.Array] = None,
                  precond_rank: int = 128,
                  return_info: bool = False):
  """O(n)-memory NLL estimate: CG quad term + SLQ logdet.

  Same parameterization as ops/pallas_mll.se_nll_fused (warped params,
  SE/Matern families incl. MLP/Kumar embeddings, diag add = warped
  noise_variance + eps).

  Differentiable via the standard matrix-free gradient construction
  (GPyTorch/BBMM): the CG and Lanczos ITERATIONS run under
  stop_gradient (reverse-mode through lax.while_loop is undefined
  anyway), and surrogate terms whose single differentiable
  kernel-matvec applications autodiff to the exact identities

    d(delta^T K^{-1} delta) = 2 alpha^T d(delta) - alpha^T dK alpha
    d(logdet K) = tr(K^{-1} dK) ~= mean_z (K^{-1} z)^T dK z

  carry the gradients (alpha = K^{-1} delta from CG; z Rademacher
  probes solved in the same batched CG call). The returned VALUE equals
  delta^T alpha + SLQ-logdet exactly.

  With return_info=True also returns {'cg_iters', 'cg_residual'} — CG
  hitting cg_maxiter without reaching cg_tol means the quad term (and
  its gradient) did not converge; check it on new problem classes.

  precond_rank defaults to 128 (rank-k pivoted-Cholesky / Woodbury
  preconditioner): hardware-measured on v5e (benchmarks/
  r7_precond_probe.py, 2026-08-19) it cuts n=65536 MLL from 15.7 s /
  288 CG iters to 4.6 s / 60 iters (rank 512: 2.55 s / 15 iters) and
  n=8192 from 0.12 s / 143 iters to 0.064 s / 20 iters, with value
  shift ~5e-6 relative (the preconditioner changes the iteration path,
  not the fixed point). Set 0 to disable (e.g. kernels whose spectrum
  a rank-128 sketch cannot capture).
  """
  from hyperbo_tpu.core.warp import retrieve_params
  from hyperbo_tpu.ops import pallas_mll as pm

  lengthscale, signal_variance, noise_variance = retrieve_params(
      params, ['lengthscale', 'signal_variance', 'noise_variance'],
      warp_func=warp_func)
  n = x.shape[0]
  mu = mean_func(params, x, warp_func=warp_func)
  y2 = jnp.asarray(y, jnp.float32).reshape(n, -1)
  assert y2.shape[1] == 1, ('mll_iterative expects a single task; got '
                            f'y of shape {jnp.shape(y)}')
  delta = (y2 - jnp.atleast_2d(mu)).astype(jnp.float32)
  emb = pm._se_embed(params, x, cov_func, warp_func)
  xs = (emb / lengthscale).astype(jnp.float32)
  # Center like ops/gram.sqdist: translation leaves distances unchanged
  # (so gradients are unaffected and the shift can be a constant) but
  # shrinks the norms whose difference the matmul form computes.
  xs = xs - jax.lax.stop_gradient(jnp.mean(xs, axis=0, keepdims=True))
  kfam = pm.kernel_family(cov_func) if cov_func is not None else 'se'
  sv = jnp.squeeze(signal_variance)
  da = jnp.squeeze(noise_variance) + eps

  row_chunk = _clamp_row_chunk(row_chunk, n)
  pad = (-n) % row_chunk
  if pad:
    # Padded rows sit at sentinels placed BEYOND the data's maximum
    # coordinate magnitude, 30 apart from the data and from each other
    # in every (centered) dimension: every off-diagonal kernel entry
    # they touch is k(r2 >= 900) ~ 0 at f32 even for the slow Matern
    # decay. Their diagonal is exactly sv + da (kernel_matvec adds k(0)
    # explicitly), their delta is 0 (quad unchanged), and the logdet
    # surplus pad * log(sv + da) is subtracted analytically.
    base = jax.lax.stop_gradient(jnp.max(jnp.abs(xs)))
    far = (base + 30.0 * (1.0 + jnp.arange(pad, dtype=jnp.float32))
           ).reshape(-1, 1)
    far = jnp.broadcast_to(far, (pad, xs.shape[1]))
    xs = jnp.concatenate([xs, far], axis=0)
    delta = jnp.concatenate([delta, jnp.zeros((pad, delta.shape[1]),
                                              jnp.float32)], axis=0)
  ntot = xs.shape[0]
  if key is None:
    # Derive the default probe key from the data: a FIXED key would
    # make the SLQ/Hutchinson estimator's randomized error a constant
    # bias across training steps (it must average out instead); tying
    # it to delta's bits redraws probes whenever the batch changes.
    seed = jax.lax.bitcast_convert_type(
        jnp.sum(delta, dtype=jnp.float32), jnp.int32)
    key = jax.random.fold_in(jax.random.PRNGKey(20260817), seed)
  k_slq, k_probe = jax.random.split(key)

  sg = jax.lax.stop_gradient
  xs_sg, sv_sg, da_sg = sg(xs), sg(sv), sg(da)

  def mv_sg(v):
    return kernel_matvec(xs_sg, v, sv_sg, da_sg, kfam=kfam,
                         row_chunk=row_chunk)

  def mv(v):
    return kernel_matvec(xs, v, sv, da, kfam=kfam, row_chunk=row_chunk)

  z = jnp.where(
      jax.random.bernoulli(k_probe, 0.5, (ntot, num_probes)), 1.0, -1.0
  ).astype(jnp.float32)
  precond = None
  if precond_rank > 0:
    # Rank-k pivoted-Cholesky preconditioner (Woodbury apply): cuts CG
    # iterations dramatically in the small-ridge regime. Built and
    # applied under stop_gradient — preconditioning changes the
    # iteration path, never the fixed point, so gradients are
    # unaffected.
    lmat = partial_pivoted_cholesky(xs_sg, sv_sg, kfam, precond_rank)
    precond = woodbury_inverse_apply(lmat, da_sg)
  rhs = jnp.concatenate([sg(delta), z], axis=1)
  solves, cg_iters, cg_res = cg_batched(mv_sg, rhs, tol=cg_tol,
                                        maxiter=cg_maxiter,
                                        precond=precond)
  alpha = sg(solves[:, :1])                             # K^{-1} delta
  w = sg(solves[:, 1:])                                 # K^{-1} z

  # ONE differentiable kernel application serves both surrogates (the
  # Gram-tile sweep is the cost; its columns are free):
  #   quad surrogate: value = delta^T alpha at CG convergence;
  #     gradient = 2 alpha^T d(delta) - alpha^T dK alpha (exact).
  #   logdet: SLQ value (constant w.r.t. params) + a zero-valued term
  #     whose gradient is the Hutchinson estimate of tr(K^{-1} dK).
  k_app = mv(jnp.concatenate([alpha, z], axis=1))
  quad = (2.0 * jnp.sum(delta * alpha)
          - jnp.sum(alpha * k_app[:, :1]))
  ld_val = sg(slq_logdet(mv_sg, ntot, k_slq, num_probes=num_probes,
                         lanczos_steps=lanczos_steps))
  trace_sur = jnp.mean(jnp.sum(w * k_app[:, 1:], axis=0))
  ld = ld_val + trace_sur - sg(trace_sur)
  if pad:
    ld = ld - pad * jnp.log(sv + da)
  nll = 0.5 * quad + 0.5 * ld + 0.5 * n * jnp.log(2 * jnp.pi)
  if return_info:
    return nll, {'cg_iters': cg_iters, 'cg_residual': cg_res}
  return nll


def _cross_kernel(xq: jnp.ndarray, xo: jnp.ndarray, sv, kfam: str,
                  precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
  """K(xq, xo) materialized as one (nq, n) block (callers chunk nq)."""
  sq = jnp.sum(xq * xq, axis=1, keepdims=True)
  so = jnp.sum(xo * xo, axis=1, keepdims=True)
  r2 = jnp.maximum(
      sq + so.T - 2.0 * jnp.matmul(xq, xo.T, precision=precision), 0.0)
  km, _ = _km_nm(r2, sv, kfam)
  return km


def predict_iterative(mean_func, params, x_obs, y_obs, x_query,
                      warp_func=None, cov_func=None, eps: float = 1e-6,
                      row_chunk: int = 1024, query_chunk: int = 256,
                      cg_tol: float = 1e-5, cg_maxiter: int = 1000,
                      precond_rank: int = 128,
                      compute_var: bool = True,
                      return_info: bool = False):
  """Matrix-free GP posterior for n beyond the O(n^2) memory wall.

  The direct posterior (models/gp.predict) factorizes the n x n system;
  at n ≳ 40k the Gram matrix no longer fits one chip's HBM. This
  computes the same posterior mean and (diagonal) variance with O(n)
  state:

    mu  = K_qo (K + da I)^{-1} delta + m(x_q)       one batched CG
    var = k(0) - diag(K_qo (K + da I)^{-1} K_oq)    one batched CG per
                                                    query chunk

  Same parameterization as mll_iterative (warped params, stationary
  SE/Matern families incl. MLP/Kumar embeddings; latent variance — add
  warped noise and any task rescale at the caller, as gp.predict's
  class wrapper does). mu is differentiable w.r.t. x_query (alpha is
  constant under stop_gradient); var is not differentiable (its CG
  solves depend on the query).

  Args:
    query_chunk: queries per variance CG batch; each chunk costs one
      (n, query_chunk) batched CG solve. compute_var=False skips the
      variance entirely (mu-only is ONE solve total).

  Returns:
    (mu (nq, 1), var (nq, 1)) [var = None when compute_var=False];
    with return_info=True also {'cg_iters', 'cg_residual'} of the mean
    solve.
  """
  from hyperbo_tpu.core.warp import retrieve_params
  from hyperbo_tpu.ops import pallas_mll as pm

  lengthscale, signal_variance, noise_variance = retrieve_params(
      params, ['lengthscale', 'signal_variance', 'noise_variance'],
      warp_func=warp_func)
  n = x_obs.shape[0]
  nq = x_query.shape[0]
  mu_obs = mean_func(params, x_obs, warp_func=warp_func)
  mu_query = mean_func(params, x_query, warp_func=warp_func)
  delta = (jnp.asarray(y_obs, jnp.float32).reshape(n, -1)
           - jnp.atleast_2d(mu_obs)).astype(jnp.float32)
  assert delta.shape[1] == 1, 'predict_iterative expects a single task'
  emb_o = pm._se_embed(params, x_obs, cov_func, warp_func)
  emb_q = pm._se_embed(params, x_query, cov_func, warp_func)
  xo = (emb_o / lengthscale).astype(jnp.float32)
  xq = (emb_q / lengthscale).astype(jnp.float32)
  # One shared shift (translation-invariant distances, smaller norms).
  shift = jax.lax.stop_gradient(jnp.mean(xo, axis=0, keepdims=True))
  xo = xo - shift
  xq = xq - shift
  kfam = pm.kernel_family(cov_func) if cov_func is not None else 'se'
  sv = jnp.squeeze(signal_variance)
  da = jnp.squeeze(noise_variance) + eps

  row_chunk = _clamp_row_chunk(row_chunk, n)
  pad = (-n) % row_chunk
  if pad:
    base = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(xo)), jnp.max(jnp.abs(xq))))
    far = (base + 30.0 * (1.0 + jnp.arange(pad, dtype=jnp.float32))
           ).reshape(-1, 1)
    far = jnp.broadcast_to(far, (pad, xo.shape[1]))
    xo = jnp.concatenate([xo, far], axis=0)
    delta = jnp.concatenate(
        [delta, jnp.zeros((pad, 1), jnp.float32)], axis=0)
  ntot = xo.shape[0]

  sg = jax.lax.stop_gradient
  xo_sg, sv_sg, da_sg = sg(xo), sg(sv), sg(da)

  def mv(v):
    return kernel_matvec(xo_sg, v, sv_sg, da_sg, kfam=kfam,
                         row_chunk=row_chunk)

  precond = None
  if precond_rank > 0:
    lmat = partial_pivoted_cholesky(xo_sg, sv_sg, kfam, precond_rank)
    precond = woodbury_inverse_apply(lmat, da_sg)

  alpha, cg_iters, cg_res = cg_batched(mv, sg(delta), tol=cg_tol,
                                       maxiter=cg_maxiter,
                                       precond=precond)
  alpha = sg(alpha)

  # Mean: chunked cross-kernel against alpha (differentiable in xq).
  # Cap the chunk at nq rounded up to a lane-friendly 8: a single-query
  # call must not pay a (ntot, 256) variance CG for 255 discarded
  # columns. Pad with FAR sentinels (as the observation rows above),
  # not zeros — a zero row is the centered mean, an in-distribution
  # point whose padded CG column would have to genuinely converge.
  query_chunk = min(query_chunk, max(8, -(-nq // 8) * 8))
  padq = (-nq) % query_chunk
  if padq:
    baseq = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(xo)), jnp.max(jnp.abs(xq))))
    farq = (baseq + 90.0 * (1.0 + jnp.arange(padq, dtype=jnp.float32))
            ).reshape(-1, 1)
    xq_p = jnp.concatenate(
        [xq, jnp.broadcast_to(farq, (padq, xq.shape[1]))], axis=0)
  else:
    xq_p = xq
  nq_tot = xq_p.shape[0]
  qblocks = xq_p.reshape(nq_tot // query_chunk, query_chunk, -1)

  # ONE cross-kernel build per chunk serves both the mean term and
  # (under stop_gradient) the variance solves.
  def chunk(_, qb):
    kq = _cross_kernel(qb, xo, sv, kfam)               # (qc, ntot)
    mu_part = jnp.matmul(kq, alpha, precision=jax.lax.Precision.HIGH)
    if not compute_var:
      return _, (mu_part, jnp.zeros((qb.shape[0],), jnp.float32))
    kxq = sg(kq).T                                     # (ntot, qc)
    sol, _, _ = cg_batched(mv, kxq, tol=cg_tol, maxiter=cg_maxiter,
                           precond=precond)
    var_part = jnp.maximum(sv_sg - jnp.sum(kxq * sol, axis=0), 1e-12)
    return _, (mu_part, var_part)

  _, (mu_parts, var_parts) = jax.lax.scan(chunk, 0, qblocks)
  mu = (mu_parts.reshape(nq_tot, 1)[:nq]
        + jnp.atleast_2d(mu_query).reshape(nq, -1))
  var = var_parts.reshape(nq_tot, 1)[:nq] if compute_var else None

  if return_info:
    return mu, var, {'cg_iters': cg_iters, 'cg_residual': cg_res}
  return mu, var
