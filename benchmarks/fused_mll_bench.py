"""Fused-MLL kernel shoot-out: v11 grouped vs XLA dense pipeline.

Reproduces the round-2 PERF.md measurements on the current device:
scan-amortized ms/iteration for the n=8192 SE-kernel GP NLL pipeline
(Gram + Cholesky + solve + logdet) and accuracy against an f64 host
reference.

Usage:
  python benchmarks/fused_mll_bench.py [--n 8192] [--k 64]
  # CPU (interpret mode, small n):
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      python benchmarks/fused_mll_bench.py --n 512 --k 2
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--n', type=int, default=None)
  parser.add_argument('--k', type=int, default=None)
  parser.add_argument('--block', type=int, default=None)
  parser.add_argument('--half', type=int, default=None)
  parser.add_argument('--group', type=int, default=2)
  parser.add_argument('--unroll', type=int, default=2,
                      help='sweep columns per fori iteration '
                           '(>= mb drops the fori: fully static sweep)')
  parser.add_argument('--skip_xla', action='store_true')
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  from jax import lax
  from hyperbo_tpu.ops import pallas_mll

  on_tpu = jax.devices()[0].platform not in ('cpu',)
  n = args.n or (8192 if on_tpu else 512)
  k_iters = args.k or (64 if on_tpu else 2)
  block = args.block or (256 if on_tpu else 128)
  half = args.half or (512 if on_tpu else 256)
  d = 8
  log(f'device: {jax.devices()[0]}; n={n} k={k_iters} '
      f'B={block} half={half} group={args.group} unroll={args.unroll}')

  x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
  xs = (x / 0.9).block_until_ready()

  # f64 truth on host.
  xh = np.asarray(jax.device_get(xs)).astype(np.float64)
  yh = np.asarray(jax.device_get(y)).astype(np.float64)
  sq = ((xh**2).sum(1)[:, None] + (xh**2).sum(1)[None, :]
        - 2 * xh @ xh.T)
  kmat = 1.3 * np.exp(-0.5 * np.maximum(sq, 0)) + 0.1 * np.eye(n)
  lh = np.linalg.cholesky(kmat)
  zh = np.linalg.solve(lh, yh)
  quad_t = float((zh * zh).sum())
  ld_t = float(np.log(np.diag(lh)).sum())

  @jax.jit
  def mll_xla(x, y):
    def one(carry, bump):
      sqd = (jnp.sum(x**2, 1, keepdims=True) +
             jnp.sum(x**2, 1, keepdims=True).T - 2 * x @ x.T)
      km = (1.3 * jnp.exp(-0.5 * jnp.maximum(sqd, 0.))
            + jnp.eye(n) * (0.1 + bump))
      chol = lax.linalg.cholesky(km, symmetrize_input=False)
      z = lax.linalg.triangular_solve(chol, y, left_side=True,
                                      lower=True)
      return carry + 0.5 * jnp.sum(z * z) + jnp.sum(
          jnp.log(jnp.diagonal(chol))), ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k_iters))
    return tot

  @jax.jit
  def mll_fused(xs, y):
    def one(carry, bump):
      quad, ld = pallas_mll.mll_fused_g(
          xs, y, 1.3, 0.1 + bump, block=block, half=half,
          group=args.group, sweep_unroll=args.unroll,
          interpret=not on_tpu)
      return carry + 0.5 * quad + ld, ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k_iters))
    return tot

  def timed(fn, *a):
    float(fn(*a))
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      float(fn(*a))
      times.append(time.perf_counter() - t0)
    return min(times) / k_iters

  t_xla = None if args.skip_xla else timed(mll_xla, xs, y)
  t_fused = timed(mll_fused, xs, y)
  quad, ld = pallas_mll.mll_fused_g(
      xs, y, 1.3, 0.1, block=block, half=half, group=args.group,
      sweep_unroll=args.unroll, interpret=not on_tpu)
  flops = 2.0 * n * n * d + n**3 / 3.0 + 2.0 * n * n
  if t_xla is None:
    t_xla = float('inf')
  else:
    print(f'XLA dense pipeline : {t_xla*1e3:8.2f} ms/iter '
          f'({flops/t_xla/1e12:5.1f} TF/s)')
  print(f'fused v11 kernel   : {t_fused*1e3:8.2f} ms/iter '
        f'({flops/t_fused/1e12:5.1f} TF/s, {t_xla/t_fused:.2f}x)')
  print(f'fused accuracy vs f64 truth: quad rel '
        f'{abs(float(quad)-quad_t)/abs(quad_t):.2e}, logdet rel '
        f'{abs(float(ld)-ld_t)/abs(ld_t):.2e}')


if __name__ == '__main__':
  main()
