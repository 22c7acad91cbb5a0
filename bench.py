"""Benchmark: GP Cholesky + marginal-likelihood rate vs MXU peak.

Measures the BASELINE.md target metric — the fused MLL pipeline
(Gram -> blocked Cholesky -> triangular solves -> logdet -> NLL) in fp32
— and reports its FLOP rate as a fraction of the device's measured fp32
matmul rate (the achievable MXU peak for this numerics class).
vs_baseline = fraction / 0.50, so >= 1.0 meets the ">= 50% of MXU peak"
target at n=8192.

Prints ONE JSON line on stdout; diagnostics on stderr.

Robustness: remote-tunnel TPU backends can stall indefinitely on a
killed/oversized op, so this script (a) scales n up incrementally,
projecting the next size's cost before attempting it, and (b) runs under
a hard watchdog that emits a fallback JSON line and exits rather than
hanging the driver. Completion of timed regions is forced by scalar host
readbacks (block_until_ready can return early through the tunnel).
"""

import json
import os
import sys
import threading
import time

WATCHDOG_S = float(os.environ.get('BENCH_WATCHDOG_S', 420))
_RESULT = {'metric': 'n8192_cholesky_mll_mxu_fraction', 'value': 0.0,
           'unit': 'fraction_of_measured_fp32_matmul_peak',
           'vs_baseline': 0.0}
_PRINTED = threading.Event()


def emit(result):
  if not _PRINTED.is_set():
    _PRINTED.set()
    print(json.dumps(result), flush=True)


def watchdog():
  time.sleep(WATCHDOG_S)
  log(f'WATCHDOG fired after {WATCHDOG_S}s — emitting best-known result')
  emit(_RESULT)
  os._exit(0)


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax

  platform = jax.devices()[0].platform
  kind = getattr(jax.devices()[0], 'device_kind', platform)
  on_tpu = platform not in ('cpu',)
  d = 8
  log(f'device: {kind} ({platform})')

  def timed_scalar(fn, *args, iters=2):
    times = []
    v = None
    for _ in range(iters):
      t0 = time.perf_counter()
      v = float(fn(*args))
      times.append(time.perf_counter() - t0)
    times.sort()
    return times[0], v

  def matmul_rate(n, k_iters):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.float32)
    a = a / jnp.sqrt(jnp.float32(n))

    @jax.jit
    def chain(a):
      def body(x, _):
        return jnp.dot(x, a, precision=lax.Precision.DEFAULT), ()
      x, _ = lax.scan(body, a, None, length=k_iters)
      return jnp.sum(x[0])

    t0 = time.perf_counter()
    float(chain(a))  # compile+first run
    t_first = time.perf_counter() - t0
    t, _ = timed_scalar(chain, a)
    return 2.0 * n**3 * k_iters / t / 1e12, t, t_first

  def make_mll(n, k_iters):
    from hyperbo_tpu.core import defs
    from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
    from hyperbo_tpu.models import kernel
    from hyperbo_tpu.ops import chol as chol_ops

    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    params = defs.GPParams(model={
        'lengthscale': jnp.ones(d) * 0.5, 'signal_variance': 0.0,
        'noise_variance': -2.0})

    @jax.jit
    def mll_k(x, y):
      def one(carry, bump):
        kmat = kernel.squared_exponential(
            params, x, warp_func=DEFAULT_WARP_FUNC)
        kmat = kmat + jnp.eye(n) * (0.1 + bump)
        chol = chol_ops.cholesky(kmat)
        kinvy = chol_ops.cho_solve(chol, y)
        nll = (0.5 * jnp.sum(y * kinvy)
               + jnp.sum(jnp.log(jnp.diagonal(chol)))
               + 0.5 * n * jnp.log(2 * jnp.pi))
        return carry + nll, ()
      total, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k_iters))
      return total

    flops = (2.0 * n * n * d + n**3 / 3.0 + 2.0 * n * n) * k_iters
    return mll_k, (x, y), flops

  # Tiny warmup proves the device round-trip works at all.
  t0 = time.perf_counter()
  v = float(jnp.sum(jnp.ones((256, 256)) @ jnp.ones((256, 256))))
  log(f'warmup 256 matmul: {time.perf_counter()-t0:.2f}s (v={v:.0f})')

  # Matmul peak at the largest size we can afford.
  best = dict(_RESULT)
  n_final = 8192 if on_tpu else 1024
  mm_tflops = None
  for n in ([2048, 8192] if on_tpu else [1024]):
    k = 4 if n >= 8192 else 2
    tflops, t, t_first = matmul_rate(n, k)
    log(f'fp32 matmul n={n} x{k}: {t*1e3:.1f} ms -> {tflops:.1f} TFLOP/s '
        f'(first/compile {t_first:.1f}s)')
    mm_tflops = tflops

  for n in ([2048, 4096, 8192] if on_tpu else [1024]):
    k = 4 if on_tpu else 2
    mll_k, args, flops = make_mll(n, k)
    t0 = time.perf_counter()
    float(mll_k(*args))
    t_first = time.perf_counter() - t0
    t, _ = timed_scalar(mll_k, *args)
    mll_tflops = flops / t / 1e12
    frac = mll_tflops / mm_tflops
    log(f'chol+MLL n={n} x{k}: {t*1e3:.1f} ms -> {mll_tflops:.1f} TFLOP/s '
        f'= {100*frac:.1f}% of matmul peak (compile {t_first:.1f}s)')
    best = {
        'metric': f'n{n}_cholesky_mll_mxu_fraction',
        'value': round(frac, 4),
        'unit': 'fraction_of_measured_fp32_matmul_peak',
        'vs_baseline': round(frac / 0.5, 4),
    }
    _RESULT.update(best)
    if n < n_final and t_first + 3 * t * (n_final / n)**3 > (
        WATCHDOG_S - (time.perf_counter() - START)) * 0.5:
      log('projected cost of next size too close to watchdog; stopping')
      break

  emit(best)


START = time.perf_counter()

if __name__ == '__main__':
  threading.Thread(target=watchdog, daemon=True).start()
  try:
    main()
  except Exception as e:  # noqa: BLE001
    log(f'bench failed: {type(e).__name__}: {e}')
    emit(_RESULT)
