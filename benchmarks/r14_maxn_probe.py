"""Round-14: lift the fused-backward n cap to 32768 via the TWO-KERNEL
route (tri-inv + SYRK), after the r13 joint megakernel was refuted on
hardware (value-parity failure rel 0.13-0.41, config-dependent values,
neutral-to-slower timing — /tmp/r13_verdict.json, PERF.md).

The MAX_N=16384 cap guards the backward kernel's (n, 128) VMEM
P-accumulator (n * 512 B = 16 MB at 32768) against the round-4 16 MB
scoped-vmem limit; the 2026-08-19 toolchain honors the library's
64 MiB CompilerParams grant (r13's joint kernel compiled AND ran at
32768), so the correct route deserves the same chance.

Legs (each exception-wrapped — an uncaught mid-compile exception
wedges the tunnel, CLAUDE.md):
  A. standalone two-kernel backward at n=32768 (MAX_N lifted
     in-process): compile + time + d_x value vs the non-fused
     syrk/XLA backward route (K^{-1} materialized once in HBM — 4 GiB,
     fits; the only independent truth at this size).
  B. full value_and_grad n=32768 via the two-kernel route (control
     for r13's 707 ms joint number, which carried wrong gradients).
  C. grad-parity spot check at n=8192: full-VG d_x sum, joint vs
     control (r13's VG readback hid the standalone 0.4-rel failure in
     6 printed digits — this leg prints full-precision sums).

Writes /tmp/r14_verdict.json.

Run: nohup python benchmarks/r14_maxn_probe.py > /tmp/r14probe.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R14_VERDICT', '/tmp/r14_verdict.json')


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

  def timeit(tag, fn, *args, k=1, reps=3):
    try:
      out = fn(*args)
      s = float(jnp.sum(out) if hasattr(out, 'shape') else out)
      best = None
      for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)) if hasattr(out, 'shape') else fn(*args))
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
      log(f'{tag}: {best*1e3:.3f} ms/iter (readback {s:.9g})')
      results[tag] = {'ms': best * 1e3, 'readback': s}
      return best
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)
      results[tag] = None
      return None

  d = 8

  def inputs(n):
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    xs = (x / 0.9).astype(jnp.float32)
    b, h, g = (256, 1024, 4)
    fwd = jax.jit(lambda xs, y: pm.mll_fused_g(
        xs, y, 1.3, 0.1, block=b, half=h, group=g, return_l='panels'))
    lp, quad, ld = fwd(xs, y)
    lp = lp.block_until_ready()
    return xs, y, lp

  def twokernel_fn(n):
    r, gg, c = (4, 2, 1024)
    sr, sg, sc = (2, 4, 512)

    def run(lp, xs, y):
      tpm = pallas_triinv.tri_inv_panels(
          lp, chunk=c, group=gg, rows=r, panel_input=True,
          diag_transposed=True, panel_layout='blocks')
      alpha = pallas_triinv.alpha_from_panels(tpm, y)
      return pb.mll_bwd_fused(tpm, xs, alpha, jnp.float32(1.3),
                              block=256, chunk=sc, kfam='se',
                              rows=sr, group=sg)[0]
    return jax.jit(run)

  def make_vg(n, k):
    b, h, g = (256, 512, 2) if n < 16384 else (256, 1024, 4)
    core = pm._se_nll_core_fn(b, h, g, False, 32, 'se', 'octv',
                              False, (True, 'gemm', 'high', 'pallas'))
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    xs = (x / 0.9).astype(jnp.float32)

    @jax.jit
    def vg_k(xs, y):
      def one(c, bump):
        val, grads = jax.value_and_grad(
            lambda xv: core(xv, y, 1.3, 0.1 + bump))(xs)
        return c + val + jnp.sum(grads), ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-6, k))
      return tot
    return vg_k, xs, y

  def with_env(env, thunk):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
      return thunk()
    finally:
      for k, v in saved.items():
        if v is None:
          os.environ.pop(k, None)
        else:
          os.environ[k] = v

  # ---------- C first (cheap, n=8192 compiles are warm-ish) ----------
  for joint, tag in (('0', 'control'), ('1', 'joint')):
    env = {'HYPERBO_BWD_JOINT': joint}
    fn, xs, y = with_env(env, lambda: make_vg(8192, 4))
    with_env(env, lambda fn=fn, xs=xs, y=y, tag=tag:
             timeit(f'VG-gradsum n=8192 [{tag}]', fn, xs, y, k=4))

  # ---------- A. standalone two-kernel backward at 32768 ----------
  n = 32768
  pb.MAX_N = 32768
  try:
    xs, y, lp = inputs(n)
    two = twokernel_fn(n)
    timeit(f'bwd-two-kernel n={n}', two, lp, xs, y)

    # Independent truth: the XLA K^{-1} formula, row-chunked so peak
    # HBM stays ~2 GiB of temporaries on top of T (4 GiB) + lp (4 GiB).
    def xla_bwd(lp, xs, y):
      hi = jax.lax.Precision.HIGH
      tpm = pallas_triinv.tri_inv_panels(
          lp, chunk=1024, group=2, rows=4, panel_input=True,
          diag_transposed=True, panel_layout='blocks')
      tm = jnp.moveaxis(tpm, 0, 1).reshape(n, n)  # dense T = L^{-1}
      alpha = jax.lax.dot_general(  # K^{-1} y = T^T (T y)
          tm, tm @ y, (((0,), (0,)), ((), ())), precision=hi)
      sq = jnp.sum(xs * xs, 1, keepdims=True)
      cn = 4096

      def chunk_dx(i0):
        tcols = lax.dynamic_slice(tm, (0, i0), (n, cn))
        kinv_rows = jax.lax.dot_general(  # (cn, n) rows of K^{-1}
            tcols, tm, (((0,), (0,)), ((), ())), precision=hi)
        a_rows = lax.dynamic_slice(alpha, (i0, 0), (cn, 1))
        g_rows = 0.5 * (kinv_rows - a_rows * alpha.T)
        xs_rows = lax.dynamic_slice(xs, (i0, 0), (cn, d))
        sq_rows = lax.dynamic_slice(sq, (i0, 0), (cn, 1))
        sqd = sq_rows + sq.T - 2.0 * jax.lax.dot_general(
            xs_rows, xs, (((1,), (1,)), ((), ())), precision=hi)
        w_rows = g_rows * (1.3 * jnp.exp(-0.5 * sqd))
        return 2.0 * (w_rows @ xs
                      - jnp.sum(w_rows, 1, keepdims=True) * xs_rows)

      d_x = lax.map(chunk_dx, jnp.arange(0, n, cn))
      return d_x.reshape(n, d)
    try:
      da = two(lp, xs, y)
      db = jax.jit(xla_bwd)(lp, xs, y)
      num = float(jnp.max(jnp.abs(da - db)))
      den = float(jnp.max(jnp.abs(db)))
      log(f'd_x parity n={n}: max-abs {num:.6g} / scale {den:.6g} '
          f'rel {num / max(den, 1e-30):.3e}')
      results[f'dx_parity_rel_n{n}'] = num / max(den, 1e-30)
    except Exception as e:  # noqa: BLE001
      log(f'parity n={n}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, 'parity')

    # ---------- B. full VG n=32768, two-kernel route ----------
    env = {'HYPERBO_BWD_JOINT': '0'}
    fn, xs2, y2 = with_env(env, lambda: make_vg(n, 2))
    with_env(env, lambda: timeit(f'VG n={n} [two-kernel]', fn, xs2, y2,
                                 k=2))
  finally:
    pb.MAX_N = 16384

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
