"""Round-4 toolchain-drift probe: the fused kernel no longer compiles.

2026-08-17: the remote compile-helper rejects the DEFAULT fused-MLL
config (n=8192, B=256/half=512/group=2, octv, unroll=32) with
"Scoped allocation with size 16.12M and limit 16.00M exceeded ... by
128.0K" — Mosaic's STACK frame (live temporaries of the static sweep),
not the declared scratch (shaving 416K of scratch_shapes left 16.12M
unchanged). Curiously the same kernel compiles inside the full
value_and_grad program. This probe finds the cheapest working config:

  a) forward --xla_tpu_scoped_vmem_limit_kib via jit compiler options;
  b) sweep_unroll=16 (halves static sweep temporaries; ladder cost
     ~0.12 ms);
  c) pivot_mode=quadv (smaller pivot-block state; ladder cost 0.33 ms);
  d) single-call (no scan) to isolate program-structure effects.

Run: nohup python benchmarks/r4_vmemfix_probe.py > /tmp/r4vmem.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()


def log(*a):
  print(f'[{time.time() - T0:7.1f}s]', *a, file=sys.stderr, flush=True)


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import pallas_mll as pm

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  n, d, k_iters = 8192, 8, 16
  x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
  xs = (x / 0.9).block_until_ready()

  def make(scan=True, **kw):
    def body(xs, y, bump):
      quad, ld = pm.mll_fused_g(xs, y, 1.3, 0.1 + bump, **kw)
      return 0.5 * quad + ld

    if not scan:
      def single(xs, y):
        return body(xs, y, 0.0)
      return jax.jit(single)

    @jax.jit
    def mll_k(xs, y):
      def one(c, bump):
        return c + body(xs, y, bump), ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k_iters))
      return tot
    return mll_k

  def attempt(tag, fn, k=k_iters, copts=None):
    log(f'--- {tag} ...')
    try:
      if copts is not None:
        compiled = fn.lower(xs, y).compile(compiler_options=copts)
        val = float(compiled(xs, y))
        runner = compiled
      else:
        val = float(fn(xs, y))
        runner = fn
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED: {type(e).__name__}: {str(e)[:2500]}')
      return None
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      float(runner(xs, y))
      times.append(time.perf_counter() - t0)
    ms = min(times) / k * 1e3
    log(f'{tag}: OK {ms:.2f} ms/iter (value {val:.4f})')
    return ms

  # a) compiler-options limit raise on the default config
  attempt('default + scoped_vmem_limit 17408 KiB', make(),
          copts={'xla_tpu_scoped_vmem_limit_kib': '17408'})
  # d) single call, default config (isolate the scan)
  attempt('default, single call (no scan)', make(scan=False), k=1)
  # b) unroll=16
  attempt('sweep_unroll=16 (octv)', make(sweep_unroll=16))
  # c) quadv at unroll=32
  attempt('pivot_mode=quadv, unroll=32', make(pivot_mode='quadv'))
  # b2) unroll=16 + quadv (belt and braces)
  attempt('unroll=16 + quadv', make(sweep_unroll=16, pivot_mode='quadv'))
  # reconfirm the plain default failure with full error text
  attempt('default (expected FAIL, full error)', make())
  log('DONE')


if __name__ == '__main__':
  main()
