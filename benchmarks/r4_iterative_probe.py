"""Hardware probe: matrix-free MLL (ops/iterative) at beyond-HBM n.

Demonstrates the O(n)-memory path on one chip: n=65536 would need a
16 GB Gram matrix (over v5e HBM); the iterative estimate runs in
O(n * row_chunk). Also cross-checks value vs the fused kernel at
n=8192.

Run: nohup python benchmarks/r4_iterative_probe.py > /tmp/r4iter.log 2>&1 &
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
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.ops import iterative

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  def run(n, d=8, row_chunk=2048, probes=16, steps=32, tag=''):
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    params = defs.GPParams(model={
        'constant': 0.0, 'lengthscale': jnp.ones(d) * 0.5,
        'signal_variance': 0.0, 'noise_variance': -2.0})

    @jax.jit
    def f(x, y):
      nll, info = iterative.mll_iterative(
          mean.zero, params, x, y, warp_func=DEFAULT_WARP_FUNC,
          cov_func=kernel.squared_exponential, row_chunk=row_chunk,
          num_probes=probes, lanczos_steps=steps,
          key=jax.random.PRNGKey(0), return_info=True)
      return nll, info['cg_iters'], info['cg_residual']

    try:
      t0 = time.perf_counter()
      nll, it, res = f(x, y)
      nll = float(nll)
      t_first = time.perf_counter() - t0
      t0 = time.perf_counter()
      nll2 = float(f(x, y)[0])
      t = time.perf_counter() - t0
      log(f'{tag} n={n}: nll={nll:.2f} in {t:.2f}s cached '
          f'({t_first:.1f}s first), cg_iters={int(it)}, '
          f'residual={float(res):.2e}')
      return nll
    except Exception as e:  # noqa: BLE001
      log(f'{tag} n={n}: FAILED: {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)
      return None

  # Cross-check vs the fused kernel value at a dense-feasible size.
  nll_it = run(8192, tag='[crosscheck]')
  if nll_it is not None:
    try:
      from hyperbo_tpu.ops import pallas_mll
      x = jax.random.uniform(jax.random.PRNGKey(1), (8192, 8),
                             jnp.float32)
      y = jax.random.normal(jax.random.PRNGKey(2), (8192, 1),
                            jnp.float32)
      params = defs.GPParams(model={
          'constant': 0.0, 'lengthscale': jnp.ones(8) * 0.5,
          'signal_variance': 0.0, 'noise_variance': -2.0})
      nll_f = float(jax.jit(lambda x, y: pallas_mll.se_nll_fused(
          mean.zero, params, x, y,
          warp_func=DEFAULT_WARP_FUNC))(x, y))
      log(f'[crosscheck] fused nll={nll_f:.2f} '
          f'(iterative delta {nll_it - nll_f:+.2f})')
    except Exception as e:  # noqa: BLE001
      log(f'[crosscheck] fused failed: {type(e).__name__}: '
          f'{str(e)[:200]}')

  # Beyond the Gram wall. 2026-08-18 hardware session: n=65536 works
  # (nll in 14.9 s cached, cg_iters=280) but n=131072 CRASHES the TPU
  # worker process ("kernel fault") and takes the tunnel down with it —
  # gated behind an env opt-in until the fault (int32 index overflow at
  # n^2 > 2^31? HBM exhaustion in the chunked matvec?) is isolated.
  run(65536, row_chunk=4096, probes=8, steps=24, tag='[beyond-HBM]')
  if os.environ.get('R4_ITER_131072', '0') == '1':
    run(131072, row_chunk=4096, probes=8, steps=24, tag='[beyond-HBM]')

  # Matrix-free posterior at beyond-HBM n: mean for 4096 candidates
  # (one batched CG) + variance for one 256-query chunk.
  def run_predict(n, nq=4096, d=8):
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    xq = jax.random.uniform(jax.random.PRNGKey(3), (nq, d), jnp.float32)
    params = defs.GPParams(model={
        'constant': 0.0, 'lengthscale': jnp.ones(d) * 0.5,
        'signal_variance': 0.0, 'noise_variance': -2.0})

    @jax.jit
    def f_mu(x, y, xq):
      mu, _ = iterative.predict_iterative(
          mean.zero, params, x, y, xq, warp_func=DEFAULT_WARP_FUNC,
          cov_func=kernel.squared_exponential, row_chunk=4096,
          compute_var=False)
      return mu

    @jax.jit
    def f_var(x, y, xq):
      _, var = iterative.predict_iterative(
          mean.zero, params, x, y, xq[:256],
          warp_func=DEFAULT_WARP_FUNC,
          cov_func=kernel.squared_exponential, row_chunk=4096,
          query_chunk=256)
      return var

    try:
      t0 = time.perf_counter()
      mu = f_mu(x, y, xq)
      s = float(jnp.sum(mu))
      t_first = time.perf_counter() - t0
      t0 = time.perf_counter()
      float(jnp.sum(f_mu(x, y, xq)))
      log(f'[predict] n={n} mu({nq} queries): {time.perf_counter()-t0:.2f}s '
          f'cached ({t_first:.1f}s first), sum={s:.3f}')
      t0 = time.perf_counter()
      v = float(jnp.sum(f_var(x, y, xq)))
      log(f'[predict] n={n} var(256 queries): '
          f'{time.perf_counter()-t0:.2f}s first, sum={v:.3f}')
    except Exception as e:  # noqa: BLE001
      log(f'[predict] n={n}: FAILED: {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, f'predict n={n}')

  run_predict(65536)
  log('DONE')


if __name__ == '__main__':
  main()
