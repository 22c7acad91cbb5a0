"""Benchmark: n=8192 GP Cholesky + marginal-likelihood vs MXU peak.

Measures the BASELINE.md target metric — the fused MLL pipeline
(Gram matrix -> blocked Cholesky -> triangular solves -> logdet -> NLL)
at n=8192 in fp32 — and reports its FLOP rate as a fraction of the
device's measured matmul rate at the same precision (the achievable MXU
peak for this numerics class). vs_baseline = fraction / 0.50, so >= 1.0
meets the ">= 50% of MXU peak" target.

Prints ONE JSON line on stdout; diagnostics go to stderr.

Timing notes: through the axon tunnel, block_until_ready can return
before remote completion, so every timed region ends in a scalar host
readback, and per-iteration cost is amortized with an on-device
lax.scan of K chained iterations.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def timed_scalar(fn, *args, iters=3):
  """Median wall time of fn(*args) -> scalar, forced by host readback."""
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    v = float(fn(*args))
    times.append(time.perf_counter() - t0)
  times.sort()
  return times[len(times) // 2], v


def bench_matmul_peak(n, k_iters, dtype=jnp.float32):
  """Measured matmul TFLOP/s: K chained n x n fp32 matmuls."""
  key = jax.random.PRNGKey(0)
  a = jax.random.normal(key, (n, n), dtype) / jnp.sqrt(n).astype(dtype)

  @jax.jit
  def chain(a):
    def body(x, _):
      x = jnp.dot(x, a, precision=lax.Precision.DEFAULT)
      return x, ()
    x, _ = lax.scan(body, a, None, length=k_iters)
    return jnp.sum(x[0])

  chain(a)  # compile
  t, _ = timed_scalar(chain, a)
  flops = 2.0 * n**3 * k_iters
  return flops / t / 1e12, t


def make_mll(n, d, k_iters):
  """Fused Gram+Cholesky+solve+logdet NLL, iterated K times on device."""
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.ops import chol as chol_ops

  key = jax.random.PRNGKey(1)
  x = jax.random.uniform(key, (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
  params = defs.GPParams(model={
      'constant': 0.0,
      'lengthscale': jnp.ones(d) * 0.5,
      'signal_variance': 0.0,
      'noise_variance': -2.0,
  })
  wf = DEFAULT_WARP_FUNC

  @jax.jit
  def mll_k(x, y):
    def one(carry, noise_bump):
      kmat = kernel.squared_exponential(params, x, warp_func=wf)
      kmat = kmat + jnp.eye(n) * (0.1 + noise_bump)
      chol = chol_ops.cholesky(kmat)
      kinvy = chol_ops.cho_solve(chol, y)
      nll = (0.5 * jnp.sum(y * kinvy)
             + jnp.sum(jnp.log(jnp.diagonal(chol)))
             + 0.5 * n * jnp.log(2 * jnp.pi))
      return carry + nll, ()
    total, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k_iters))
    return total

  # FLOPs per iteration: Gram matmul 2n^2 d + cholesky n^3/3 +
  # two triangular solves 2n^2 + logdet/quad O(n).
  flops_per_iter = 2.0 * n * n * d + n**3 / 3.0 + 2.0 * n * n
  return mll_k, (x, y), flops_per_iter * k_iters


def main():
  platform = jax.devices()[0].platform
  kind = getattr(jax.devices()[0], 'device_kind', platform)
  on_tpu = platform not in ('cpu',)
  n = 8192 if on_tpu else 1024
  d = 8
  k_iters = 8 if on_tpu else 2

  log(f'device: {kind} ({platform}); n={n}, k_iters={k_iters}')

  mm_tflops, mm_t = bench_matmul_peak(n, k_iters)
  log(f'measured fp32 matmul rate: {mm_tflops:.1f} TFLOP/s '
      f'({mm_t*1e3:.1f} ms for {k_iters} chained {n}^3 matmuls)')

  mll_k, args, flops = make_mll(n, d, k_iters)
  mll_k(*args)  # compile
  t, val = timed_scalar(mll_k, *args)
  mll_tflops = flops / t / 1e12
  frac = mll_tflops / mm_tflops if mm_tflops > 0 else 0.0
  log(f'chol+MLL: {t*1e3:.1f} ms for {k_iters} iters -> '
      f'{mll_tflops:.1f} TFLOP/s = {100*frac:.1f}% of measured matmul peak '
      f'(nll sum {val:.3e})')

  print(json.dumps({
      'metric': f'n{n}_cholesky_mll_mxu_fraction',
      'value': round(frac, 4),
      'unit': 'fraction_of_measured_fp32_matmul_peak',
      'vs_baseline': round(frac / 0.5, 4),
  }))


if __name__ == '__main__':
  main()
