"""Round-4 probe: dissect the fused-MLL backward at n=8192.

The train leg (bench.py) measures value_and_grad at 67 ms/step fused vs
131 dense (2x). The backward (~55 ms) should decompose as
  trisolve (~5 ms isolated) + kinv GEMM (X3, ~20 ms est) + elementwise
leaving ~20+ ms unexplained. This probe times each stage in isolation
and A/Bs three candidate optimizations:

  1. HYPERBO_BWD_KINV=syrk  — triangular-aware block-column K^{-1}
     (n^3 FLOPs instead of 2n^3);
  2. HYPERBO_BWD_PREC=default — single-pass bf16 backward products
     (2x MXU rate, ~1e-3 gradient class);
  3. both.

Run (background, never timeout-killed):
  nohup python benchmarks/r4_bwd_probe.py [budget_s] > /tmp/r4bwd.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BUDGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 100000.0
T0 = time.time()


def log(*a):
  print(f'[{time.time() - T0:7.1f}s]', *a, file=sys.stderr, flush=True)

from benchmarks._transport import make_abort

_abort_if_terminal_down = make_abort(log)


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel as kern, mean
  from hyperbo_tpu.models import objectives as obj
  from hyperbo_tpu.ops import pallas_mll as pm

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  n, d, k_iters = 8192, 8, 8
  x = jax.random.uniform(jax.random.PRNGKey(5), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(6), (n, 1), jnp.float32)
  dataset = {'t': defs.SubDataset(x, y)}
  model0 = {'lengthscale': jnp.ones(d) * 0.5, 'signal_variance': 0.0,
            'noise_variance': -2.0}

  def timed(tag, fn, *a, k=k_iters):
    if time.time() - T0 > BUDGET_S:
      log('budget exhausted before', tag)
      return None
    log(f'--- compiling {tag} ...')
    try:
      val = float(fn(*a))
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED: {type(e).__name__}: {str(e)[:400]}')
      _abort_if_terminal_down(e, tag)
      return None
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      float(fn(*a))
      times.append(time.perf_counter() - t0)
    ms = min(times) / k * 1e3
    log(f'{tag}: {ms:.2f} ms/iter (value {val:.4f})')
    return ms

  def make_loss():
    def loss(m):
      p = defs.GPParams(model=m, config={'fused_mll': True})
      return obj.neg_log_marginal_likelihood(
          mean.zero, kern.squared_exponential, p, dataset,
          warp_func=DEFAULT_WARP_FUNC)
    return loss

  def make_vg():
    loss = make_loss()

    @jax.jit
    def vg_k(m):
      def one(c, bump):
        mm = dict(m)
        mm['noise_variance'] = mm['noise_variance'] + bump
        l, g = jax.value_and_grad(loss)(mm)
        return c + l + g['signal_variance'] + jnp.sum(g['lengthscale']), ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-4, k_iters))
      return tot
    return vg_k

  def fresh(**env):
    """Set env knobs and clear the fused-core trace caches."""
    for k in ('HYPERBO_BWD_KINV', 'HYPERBO_BWD_PREC',
              'HYPERBO_BWD_TRIINV', 'HYPERBO_BWD_FUSED'):
      os.environ.pop(k, None)
    os.environ.update(env)
    pm._se_nll_core_fn.cache_clear()
    pm._se_nll_core_masked_fn.cache_clear()

  # Reference gradient for accuracy deltas (single step, default knobs).
  fresh()
  loss = make_loss()
  gref = jax.jit(jax.grad(loss))(model0)
  gref = {k: jnp.asarray(v) for k, v in gref.items()}
  log('ref grad ls[0]', float(gref['lengthscale'][0]),
      'sv', float(gref['signal_variance']))

  def grad_delta(tag):
    g = jax.jit(jax.grad(make_loss()))(model0)
    rel = max(
        float(jnp.max(jnp.abs(g['lengthscale'] - gref['lengthscale']))
              / (jnp.max(jnp.abs(gref['lengthscale'])) + 1e-30)),
        abs(float(g['signal_variance'] - gref['signal_variance']))
        / (abs(float(gref['signal_variance'])) + 1e-30))
    log(f'{tag}: max rel grad delta vs baseline = {rel:.2e}')

  # --- stage dissection (shared residuals computed once), using the
  # real warped params the loss sees ---
  from hyperbo_tpu.core.warp import retrieve_params
  p0 = defs.GPParams(model=model0, config={})
  ls_w, sv_w, nv_w = retrieve_params(
      p0, ['lengthscale', 'signal_variance', 'noise_variance'],
      warp_func=DEFAULT_WARP_FUNC)
  xs = (x / ls_w).astype(jnp.float32)
  da = jnp.asarray(nv_w + 1e-6, jnp.float32)
  svj = jnp.squeeze(jnp.asarray(sv_w, jnp.float32))

  @jax.jit
  def fwd_k(xs, y):
    def one(c, bump):
      quad, ld = pm.mll_fused_g(xs, y, svj, da + bump)
      return c + 0.5 * quad + ld, ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-6, k_iters))
    return tot

  @jax.jit
  def fwd_l_k(xs, y):
    def one(c, bump):
      l, quad, ld = pm.mll_fused_g(xs, y, svj, da + bump, return_l=True)
      return c + 0.5 * quad + ld + l[0, 0] + l[n - 1, n - 1], ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-6, k_iters))
    return tot

  timed('fwd (no L export)', fwd_k, xs, y)
  timed('fwd + return_l (incl. layout fix)', fwd_l_k, xs, y)

  # Residual-producing helper compiles can fail on toolchain drift; a
  # crashed process mid-compile wedges the tunnel, so build L with a
  # fallback chain instead of an uncaught jit (2026-08-17: the
  # standalone return_l kernel hits the new 16 MB scoped-vmem limit
  # while the dense XLA pipeline always compiles).
  try:
    l, _, _ = jax.jit(lambda xs, y: pm.mll_fused_g(
        xs, y, svj, da, return_l=True))(xs, y)
  except Exception as e:  # noqa: BLE001
    log(f'fused L export failed ({type(e).__name__}); building L with '
        f'the XLA dense pipeline')
    @jax.jit
    def dense_l(xs, y):
      sqn = jnp.sum(xs * xs, axis=1, keepdims=True)
      r2 = jnp.maximum(sqn + sqn.T
                       - 2.0 * jnp.matmul(xs, xs.T,
                                          precision=jax.lax.Precision.HIGH),
                       0.0)
      kmat = svj * jnp.exp(-0.5 * r2) + da * jnp.eye(n)
      return jnp.linalg.cholesky(kmat)
    l = dense_l(xs, y)
  l = l.block_until_ready()
  delta = y  # zero mean

  def chain(body):
    @jax.jit
    def k_fn(l, xs, delta):
      def one(c, bump):
        return c + body(l + bump, xs, delta), ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-9, k_iters))
      return tot
    return k_fn

  timed('bwd: full _se_core_bwd', chain(
      lambda l, xs, delta: sum(jnp.sum(t) for t in pm._se_core_bwd(
          l, xs, delta, svj, None, 'se'))), l, xs, delta)

  hi = jax.lax.Precision.HIGH
  timed('bwd: trisolve only', chain(
      lambda l, xs, delta: jnp.sum(jax.lax.linalg.triangular_solve(
          l, jnp.eye(n, dtype=l.dtype), left_side=True, lower=True))),
      l, xs, delta)

  linv = jax.jit(lambda l: jax.lax.linalg.triangular_solve(
      l, jnp.eye(n, dtype=l.dtype), left_side=True,
      lower=True))(l).block_until_ready()

  timed('bwd: kinv GEMM X3', chain(
      lambda t, xs, delta: jnp.sum(jnp.matmul(t.T, t, precision=hi))),
      linv, xs, delta)
  timed('bwd: kinv GEMM default-prec', chain(
      lambda t, xs, delta: jnp.sum(jnp.matmul(t.T, t))), linv, xs, delta)

  def syrk(t, prec):
    b = 512
    cols = []
    for j in range(0, n, b):
      tail = t[j:, :]
      cols.append(jnp.matmul(tail.T, tail[:, j:j + b], precision=prec))
    return jnp.concatenate(cols, axis=1)

  timed('bwd: kinv SYRK X3', chain(
      lambda t, xs, delta: jnp.sum(syrk(t, hi))), linv, xs, delta)
  timed('bwd: kinv SYRK default-prec', chain(
      lambda t, xs, delta: jnp.sum(
          syrk(t, jax.lax.Precision.DEFAULT))), linv, xs, delta)

  kinv = jax.jit(lambda t: jnp.matmul(t.T, t, precision=hi))(
      linv).block_until_ready()

  def elem(kv, xs, delta):
    alpha = jnp.matmul(kv, delta, precision=hi)
    gmat = 0.5 * (kv - jnp.matmul(alpha, alpha.T, precision=hi))
    sqn = jnp.sum(xs * xs, axis=1, keepdims=True)
    r2 = jnp.maximum(sqn + sqn.T - 2.0 * jnp.matmul(
        xs, xs.T, precision=hi), 0.0)
    kmat = svj * jnp.exp(-0.5 * r2)
    w = gmat * kmat
    d_sv = jnp.sum(gmat * kmat) / svj
    d_da = jnp.trace(gmat)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    d_x = 2.0 * (jnp.matmul(w, xs, precision=hi) - wsum * xs)
    return jnp.sum(d_x) + jnp.sum(alpha) + d_sv + d_da

  timed('bwd: elementwise chain (given kinv)', chain(elem), kinv, xs,
        delta)

  # --- full value_and_grad A/B over the knobs ---
  fresh()
  timed('VG baseline (gemm, X3)', make_vg(), model0)
  fresh(HYPERBO_BWD_KINV='syrk')
  timed('VG syrk X3', make_vg(), model0)
  grad_delta('VG syrk X3')
  fresh(HYPERBO_BWD_PREC='default')
  timed('VG gemm default-prec', make_vg(), model0)
  grad_delta('VG gemm default-prec')
  fresh(HYPERBO_BWD_KINV='syrk', HYPERBO_BWD_PREC='default')
  timed('VG syrk default-prec', make_vg(), model0)
  grad_delta('VG syrk default-prec')

  # --- the fused Pallas backward (ops/pallas_mll_bwd) ---
  from hyperbo_tpu.ops import pallas_mll_bwd
  nb = n // 256
  linv_pm = jnp.moveaxis(linv.reshape(n, nb, 256), 1, 0)
  linv_pm = linv_pm.block_until_ready()
  alpha0 = (linv.T @ (linv @ delta)).block_until_ready()

  @jax.jit
  def bwdk(tpm, xs, alpha):
    def one(c, bump):
      d_x, dsv_raw, d_da = pallas_mll_bwd.mll_bwd_fused(
          tpm, xs, alpha + bump, svj)
      return c + jnp.sum(d_x) + dsv_raw + d_da, ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-9, k_iters))
    return tot

  timed('bwd: fused pallas kernel (isolated)', bwdk, linv_pm, xs, alpha0)
  fresh(HYPERBO_BWD_FUSED='1')
  timed('VG fused-pallas-bwd', make_vg(), model0)
  grad_delta('VG fused-pallas-bwd')
  fresh(HYPERBO_BWD_FUSED='1', HYPERBO_BWD_PREC='default')
  timed('VG fused-pallas-bwd + default-prec solve', make_vg(), model0)
  fresh()

  # Dense comparison point (the bench's denominator).
  def dense_loss(m):
    p = defs.GPParams(model=m, config={})
    return obj.neg_log_marginal_likelihood(
        mean.zero, kern.squared_exponential, p, dataset,
        warp_func=DEFAULT_WARP_FUNC)

  @jax.jit
  def vg_dense(m):
    def one(c, bump):
      mm = dict(m)
      mm['noise_variance'] = mm['noise_variance'] + bump
      ll, g = jax.value_and_grad(dense_loss)(mm)
      return c + ll + g['signal_variance'], ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-4, 2))
    return tot

  timed('VG dense (k=2)', vg_dense, model0, k=2)
  log('DONE')


if __name__ == '__main__':
  main()
