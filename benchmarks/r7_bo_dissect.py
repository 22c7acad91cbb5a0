"""Round-7: on-device BO per-phase dissection + winv/chol A/B.

Round-3 verdict weak #2: PERF.md carries 0.35 ms/iter (round 3) AND
152.7 ms/iter (round 5b) for the same plain 100 x 10k scan loop, with
no reconciliation. Hypothesis: the 2026-08-18 toolchain regression of
lax.linalg.triangular_solve (5.4 -> 37.7 ms at 8192 RHS) poisoned the
per-iteration posterior's 10k-RHS solve. The W = L^{-1} buffer
(HYPERBO_BO_SOLVER=winv, now the default) removes every triangular
solve from the loop.

Legs:
  1. full plain loop, winv (new default) — the headline;
  2. full plain loop, chol (legacy) — reproduces/falsifies the 152.7;
  3. posterior-only scan (fixed count=100), winv vs chol — isolates
     the per-iteration solve cost from append/argmax;
  4. append-only scan, winv vs chol.

Run: nohup python benchmarks/r7_bo_dissect.py > /tmp/r7bo.log 2>&1 &
"""

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


def main():
  import jax
  import jax.numpy as jnp
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC, retrieve_params
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.bo import ondevice
  from hyperbo_tpu.ops import chol as chol_ops

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  d, n_cand, iters = 4, 10000, 100
  key = jax.random.PRNGKey(0)
  qx = jax.random.uniform(key, (n_cand, d), jnp.float32)
  qy = jnp.sin(3 * qx @ jax.random.normal(
      jax.random.fold_in(key, 1), (d, 1)))
  queried = defs.SubDataset(qx, qy)
  model = {'constant': 0.0, 'lengthscale': jnp.zeros(d),
           'signal_variance': 0.0, 'noise_variance': -3.0}
  config = {'learning_rate': 1e-2}

  def timed(tag, fn, k=iters, reps=2):
    try:
      t0 = time.perf_counter()
      s = fn()
      t_first = time.perf_counter() - t0
      best = None
      for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
      log(f'{tag}: {best*1e3:.3f} ms/iter cached '
          f'({t_first:.1f}s first incl. compile); readback {s:.4g}')
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)

  # ---- legs 1+2: the full loop under both solvers ----
  for solver in ('winv', 'chol'):
    os.environ['HYPERBO_BO_SOLVER'] = solver
    timed(f'plain scan BO 100x10k [{solver}]', lambda: float(jnp.sum(
        ondevice.simulated_bayesopt_ondevice(
            mean.constant, kernel.squared_exponential, model, config,
            DEFAULT_WARP_FUNC, queried, iters=iters, acquisition='ei',
            num_train_tasks=23)[1])))

  # ---- legs 3+4: phase isolation at a fixed count ----
  n_max = 100
  shim = defs.GPParams(model=model, config=config)
  nv, = retrieve_params(shim, ['noise_variance'],
                        warp_func=DEFAULT_WARP_FUNC)
  x_buf = jax.random.uniform(jax.random.PRNGKey(3), (n_max, d))
  y_buf = jax.random.normal(jax.random.PRNGKey(4), (n_max, 1))
  kmat = kernel.squared_exponential(shim, x_buf,
                                    warp_func=DEFAULT_WARP_FUNC)
  lfac = jnp.linalg.cholesky(kmat + (nv + 1e-6) * jnp.eye(n_max))
  count = jnp.array(n_max, jnp.int32)

  for solver in ('winv', 'chol'):
    os.environ['HYPERBO_BO_SOLVER'] = solver
    fac = (jnp.linalg.inv(lfac) if solver == 'winv' else lfac)

    @jax.jit
    def post_scan(fac, x_buf, y_buf):
      def one(c, _):
        mu, var = ondevice._masked_posterior(
            mean.constant, kernel.squared_exponential, shim,
            DEFAULT_WARP_FUNC, nv, 24 / 23, x_buf, y_buf, fac, count,
            qx)
        return c + jnp.sum(mu) + jnp.sum(var), ()
      tot, _ = jax.lax.scan(one, 0.0, None, length=iters)
      return tot

    timed(f'posterior-only x100 [{solver}]',
          lambda f=post_scan, fa=fac: float(f(fa, x_buf, y_buf)))

    @jax.jit
    def app_scan(fac, x_buf):
      def one(c, i):
        f2 = ondevice._append_factor(
            kernel.squared_exponential, shim, DEFAULT_WARP_FUNC, nv,
            1e-6, x_buf, c, jnp.array(50, jnp.int32), qx[i])
        return f2, ()
      out, _ = jax.lax.scan(one, fac, jnp.arange(iters))
      return jnp.sum(out)

    timed(f'append-only x100 [{solver}]',
          lambda f=app_scan, fa=fac: float(f(fa, x_buf)))

  os.environ.pop('HYPERBO_BO_SOLVER', None)
  log('DONE')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
