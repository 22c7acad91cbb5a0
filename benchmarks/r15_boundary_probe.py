"""Round-15: large-n offset-overflow boundary + default-route checks.

r14 showed the two-kernel fused backward returns garbage d_x at
n=32768 (panel tensors exactly 2^32 bytes) while compiling and running
fine. Open questions this probe answers:

  A. Is the Pallas panel tri-inv ITSELF corrupt at >=2^31-byte panel
     tensors?  Column-chunked T parity vs XLA triangular solves at
     n=24576 (2.4 GiB, crosses 2^31) and n=32768 (4 GiB = 2^32).
     r14's "truth" used the SAME Pallas tri-inv output common-mode, so
     it only isolated the SYRK stage.
  B. Is the two-kernel backward correct at n=24576?  d_x parity vs the
     row-chunked XLA K^{-1} formula built from the XLA-SOLVE T (fully
     independent truth). If A and B pass at 24576, MAX_N can lift to
     24576; if A fails there too, the boundary is 2^31 and 16384
     stands.
  C. What does the LIBRARY DEFAULT do at n=32768 (no cap lift)?  One
     jax.grad of the fused core — the backward must route to the
     non-fused XLA kinv formula (correct by construction, but it
     materializes ~6 n^2 f32 temporaries = 24 GiB at this size, so
     the expected outcome is RESOURCE_EXHAUSTED; record either way).
  D. mll_distributed_fused pallas backend on a REAL 1-device mesh:
     compiles + matches the dense NLL (first hardware exercise of
     Pallas kernels under shard_map on the axon toolchain).

Writes /tmp/r15_verdict.json.

Run: nohup python benchmarks/r15_boundary_probe.py > /tmp/r15probe.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()


def log(*a):
  print(f'[{time.time() - T0:7.1f}s]', *a, file=sys.stderr, flush=True)

from benchmarks._transport import make_abort

_abort_if_terminal_down = make_abort(log)

VERDICT_PATH = os.environ.get('R15_VERDICT', '/tmp/r15_verdict.json')
CN = 4096


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import pallas_mll as pm
  from hyperbo_tpu.ops import pallas_mll_bwd as pb
  from hyperbo_tpu.ops import pallas_triinv

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  results = {}
  d = 8
  hi = jax.lax.Precision.HIGH

  def wrap(tag, thunk):
    try:
      out = thunk()
      log(f'{tag}: {out}')
      results[tag] = out
      return out
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)
      results[tag] = {'error': f'{type(e).__name__}: {str(e)[:200]}'}
      return None

  def inputs(n):
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    xs = (x / 0.9).astype(jnp.float32)
    fwd = jax.jit(lambda xs, y: pm.mll_fused_g(
        xs, y, 1.3, 0.1, block=256, half=1024, group=4,
        return_l='panels'))
    lp, _, _ = fwd(xs, y)
    return xs, y, lp.block_until_ready()

  def panels_to_dense(lp):
    nb, n, b = lp.shape
    idx = jnp.arange(nb)
    blocks = lp.reshape(nb, nb, b, b)
    diagb = blocks[idx, idx]
    blocks = blocks.at[idx, idx].set(jnp.swapaxes(diagb, -1, -2))
    ldense = jnp.moveaxis(blocks.reshape(nb, n, b), 0, 1).reshape(n, n)
    return jnp.tril(ldense)

  def t_xla_chunks(ldense, n):
    """T = L^{-1} as (n/CN, n, CN) column chunks (XLA solves only)."""

    def chunk(i0):
      rhs = (jnp.arange(n)[:, None]
             == (i0 + jnp.arange(CN))[None, :]).astype(jnp.float32)
      return lax.linalg.triangular_solve(ldense, rhs, left_side=True,
                                         lower=True)

    return lax.map(chunk, jnp.arange(0, n, CN))

  def tpm_chunk(tpm, j, n):
    """Columns [j*CN, (j+1)*CN) of T from the panel-major layout."""
    ppc = CN // 256
    return jnp.moveaxis(tpm[j * ppc:(j + 1) * ppc], 0, 1).reshape(n, CN)

  def dx_truth(tch, xs, y, n):
    """Row-chunked d_x from (nc, n, CN) XLA T column chunks."""
    tm = jnp.moveaxis(tch, 0, 1).reshape(n, n)  # dense T, one temp
    alpha = lax.dot_general(tm, tm @ y, (((0,), (0,)), ((), ())),
                            precision=hi)
    sq = jnp.sum(xs * xs, 1, keepdims=True)

    def chunk_dx(i0):
      tcols = lax.dynamic_slice(tm, (0, i0), (n, CN))
      kinv_rows = lax.dot_general(tcols, tm, (((0,), (0,)), ((), ())),
                                  precision=hi)
      a_rows = lax.dynamic_slice(alpha, (i0, 0), (CN, 1))
      g_rows = 0.5 * (kinv_rows - a_rows * alpha.T)
      xs_rows = lax.dynamic_slice(xs, (i0, 0), (CN, d))
      sq_rows = lax.dynamic_slice(sq, (i0, 0), (CN, 1))
      sqd = sq_rows + sq.T - 2.0 * lax.dot_general(
          xs_rows, xs, (((1,), (1,)), ((), ())), precision=hi)
      w_rows = g_rows * (1.3 * jnp.exp(-0.5 * sqd))
      return 2.0 * (w_rows @ xs
                    - jnp.sum(w_rows, 1, keepdims=True) * xs_rows)

    return lax.map(chunk_dx, jnp.arange(0, n, CN)).reshape(n, d)

  def relerr(a, b):
    num = float(jnp.max(jnp.abs(a - b)))
    den = float(jnp.max(jnp.abs(b)))
    return num / max(den, 1e-30)

  def run_size(n):
    xs, y, lp = inputs(n)

    # ---------- A. tri-inv parity (column-chunked) ----------
    def leg_a(lp=lp, n=n):
      @jax.jit
      def maxerr(lp):
        ldense = panels_to_dense(lp)
        tpm = pallas_triinv.tri_inv_panels(
            lp, chunk=1024, group=2, rows=4, panel_input=True,
            diag_transposed=True, panel_layout='blocks')

        def chunk_err(j):
          i0 = j * CN
          rhs = (jnp.arange(n)[:, None]
                 == (i0 + jnp.arange(CN))[None, :]).astype(jnp.float32)
          tx = lax.linalg.triangular_solve(ldense, rhs, left_side=True,
                                           lower=True)
          ppc = CN // 256
          tp = jnp.moveaxis(
              lax.dynamic_slice(
                  tpm, (j * ppc, 0, 0), (ppc, n, 256)),
              0, 1).reshape(n, CN)
          return jnp.max(jnp.abs(tp - tx)), jnp.max(jnp.abs(tx))

        errs, scales = lax.map(chunk_err, jnp.arange(n // CN))
        return jnp.max(errs), jnp.max(scales)

      e, s = maxerr(lp)
      return {'rel': float(e) / max(float(s), 1e-30)}

    wrap(f'triinv-parity n={n}', leg_a)

    # ---------- B. two-kernel backward parity at 24576 ----------
    if n == 24576:
      def leg_b(lp=lp, xs=xs, y=y, n=n):
        tch = jax.jit(
            lambda lp: t_xla_chunks(panels_to_dense(lp), n))(lp)
        truth = jax.jit(
            lambda tch, xs, y: dx_truth(tch, xs, y, n))(tch, xs, y)
        del tch
        pb.MAX_N = 24576
        try:
          def two(lp, xs, y):
            tpm = pallas_triinv.tri_inv_panels(
                lp, chunk=1024, group=2, rows=4, panel_input=True,
                diag_transposed=True, panel_layout='blocks')
            alpha = pallas_triinv.alpha_from_panels(tpm, y)
            return pb.mll_bwd_fused(tpm, xs, alpha, jnp.float32(1.3),
                                    block=256, chunk=512, kfam='se',
                                    rows=2, group=4)[0]

          t0 = time.perf_counter()
          da = jax.jit(two)(lp, xs, y)
          float(jnp.sum(da))
          dt = time.perf_counter() - t0
          return {'twokernel_rel': relerr(da, truth),
                  'first_call_s': dt}
        finally:
          pb.MAX_N = 16384

      wrap(f'bwd-parity n={n}', leg_b)

  run_size(24576)

  # ---------- C. library-default grad at 32768 (expected OOM) ----------
  def leg_c():
    n = 32768
    xs, y, lp = inputs(n)
    del lp
    core = pm._se_nll_core_fn(256, 1024, 4, False, 32, 'se', 'octv',
                              False, (True, 'gemm', 'high', 'pallas'))
    g_fn = jax.jit(jax.grad(lambda xv: core(xv, y, 1.3, 0.1)))
    t0 = time.perf_counter()
    dg = g_fn(xs)
    float(jnp.sum(dg))
    first = time.perf_counter() - t0
    t1 = time.perf_counter()
    float(jnp.sum(g_fn(xs)))
    return {'grad_s': time.perf_counter() - t1, 'first_call_s': first}

  # ---------- D. distributed fused MLL, 1-device real mesh ----------
  def leg_d():
    from hyperbo_tpu.core import defs
    from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
    from hyperbo_tpu.models import kernel, mean
    from hyperbo_tpu.models import objectives as obj
    from hyperbo_tpu.parallel import large
    from hyperbo_tpu.parallel import mesh as mesh_lib
    n, dd = 2048, 4
    x = jax.random.uniform(jax.random.PRNGKey(21), (n, dd))
    y = jax.random.normal(jax.random.PRNGKey(22), (n, 1))
    params = defs.GPParams(model={
        'constant': 0.2, 'lengthscale': jnp.ones(dd) * 0.5,
        'signal_variance': 0.3, 'noise_variance': -2.0})
    wf = DEFAULT_WARP_FUNC
    mesh = mesh_lib.create_mesh(1)
    got = float(large.mll_distributed_fused(
        mean.constant, kernel.squared_exponential, params, x, y, mesh,
        warp_func=wf, backend='pallas', interpret=False))
    want = float(obj.neg_log_marginal_likelihood(
        mean_func=mean.constant, cov_func=kernel.squared_exponential,
        params=params, dataset={0: defs.SubDataset(x, y)},
        warp_func=wf))
    return {'got': got, 'want': want,
            'rel': abs(got - want) / max(abs(want), 1e-30)}

  # Order: the cheap/high-value legs run before anything that can OOM
  # or stress the worker (leg A at 32768 peaks ~13.5 GiB; leg C is
  # expected to RESOURCE_EXHAUST).
  wrap('dist-fused-mesh1 n=2048', leg_d)
  run_size(32768)
  wrap('default-grad n=32768', leg_c)

  with open(VERDICT_PATH, 'w') as f:
    json.dump({'results': results}, f, indent=1)
  log(f'VERDICT at {VERDICT_PATH}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
