"""Microbenchmarks: device dot-algorithm rates and Cholesky shoot-out.

Reproduces the PERF.md measurement campaign on the current device:

  * matmul rates at n=8192 fp32 under DEFAULT / BF16_X3 / HIGHEST
  * Cholesky implementations at n=8192: XLA built-in, the explicit
    blocked recursion (ops/chol.py, set_use_recursive), and the
    single-kernel HBM-streaming Pallas factorization
    (ops/pallas_chol_hbm.py)

All timings amortize over on-device lax.scan chains and force
completion with scalar host readbacks (remote tunnels make
block_until_ready unreliable); every section runs under its own
deadline so a stalled tunnel skips sections instead of hanging.

Usage: python benchmarks/microbench.py [--n 8192] [--k 16]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def deadline(fn, secs):
  out = {}

  def w():
    try:
      out['v'] = fn()
    except Exception as e:  # noqa: BLE001
      out['e'] = repr(e)

  t = threading.Thread(target=w, daemon=True)
  t.start()
  t.join(secs)
  return out if not t.is_alive() else None


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--n', type=int, default=None)
  parser.add_argument('--k', type=int, default=None)
  parser.add_argument('--budget', type=float, default=900.)
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp
  from jax import lax

  on_tpu = jax.devices()[0].platform not in ('cpu',)
  n = args.n or (8192 if on_tpu else 1024)
  k = args.k or (16 if on_tpu else 2)
  key = jax.random.PRNGKey(0)
  log(f'device: {jax.devices()[0]}; n={n} k={k}')

  def timed2(f, *a):
    t0 = time.perf_counter()
    float(f(*a))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(*a))
    t2 = time.perf_counter() - t0
    return t1, t2

  # --- matmul precision ladder ---
  precisions = [('DEFAULT', lax.Precision.DEFAULT),
                ('HIGHEST', lax.Precision.HIGHEST)]
  if hasattr(lax, 'DotAlgorithmPreset'):
    precisions.insert(1, ('BF16_X3',
                          lax.DotAlgorithmPreset.BF16_BF16_F32_X3))
  for name, prec in precisions:
    def run(prec=prec):
      x = jax.random.normal(key, (n, n), jnp.float32) / jnp.sqrt(
          jnp.float32(n))

      @jax.jit
      def f(a):
        def body(z, _):
          return jnp.dot(z, a, precision=prec), ()
        z, _ = lax.scan(body, a, None, length=k)
        return jnp.sum(z[0])

      return timed2(f, x)

    r = deadline(run, args.budget)
    if r is None:
      log(f'matmul {name}: TIMEOUT')
      continue
    if 'e' in r:
      log(f'matmul {name}: ERROR {r["e"][:200]}')
      continue
    t1, t2 = r['v']
    log(f'matmul {name}: compile+first {t1:.1f}s, run {t2*1e3:.1f}ms '
        f'-> {2*n**3*k/t2/1e12:.1f} TF/s')

  # --- Cholesky shoot-out ---
  from hyperbo_tpu.ops import chol as chol_ops
  from hyperbo_tpu.ops import pallas_chol_hbm

  def chol_chain(chol_fn):
    a = jax.random.normal(key, (n, n), jnp.float32)
    a = jnp.dot(a, a.T) / n + jnp.eye(n)
    kc = max(k // 2, 1)

    @jax.jit
    def f(a):
      def body(x, bump):
        l = chol_fn(x + jnp.eye(n) * bump)
        return x, jnp.sum(jnp.log(jnp.diagonal(l)))
      _, outs = lax.scan(body, a, jnp.linspace(0.1, 0.11, kc))
      return jnp.sum(outs)

    t1, t2 = timed2(f, a)
    return t1, t2 / kc

  variants = [('XLA builtin', jnp.linalg.cholesky)]

  def recursive(x):
    chol_ops.set_use_recursive(True)
    try:
      return chol_ops.cholesky(x, base_block=512)
    finally:
      chol_ops.set_use_recursive(False)

  variants.append(('blocked recursion', recursive))
  if on_tpu and n % 256 == 0:
    variants.append(('pallas HBM kernel',
                     lambda x: pallas_chol_hbm.cholesky_hbm(
                         x, block=256, chunk=min(1024, n))))

  for name, fn in variants:
    r = deadline(lambda fn=fn: chol_chain(fn), args.budget)
    if r is None:
      log(f'chol {name}: TIMEOUT')
      continue
    if 'e' in r:
      log(f'chol {name}: ERROR {r["e"][:200]}')
      continue
    t1, per = r['v']
    log(f'chol {name}: compile+first {t1:.1f}s -> {per*1e3:.1f}ms/chol '
        f'= {n**3/3/per/1e12:.1f} TF/s')


if __name__ == '__main__':
  main()
