"""Round-3 hardware probe: sweep_unroll ladder for the fused MLL kernel.

Hypothesis (PERF.md "sweep anomaly"): the in-situ diagonal sweep is
paced by per-fori-iteration overhead (~450 ns/iter in the large program
vs ~38 ns isolated), so amortizing more substeps per iteration — or
dropping the fori entirely (unroll >= mb: fully static sweep) — should
cut the 3.7 ms sweep cost proportionally.

Runs each config IN-PROCESS with an elapsed-time budget check BEFORE
each new compile (never kills an in-flight TPU op — tunnel-wedge rule,
CLAUDE.md). Results print incrementally to stderr.

Usage: python benchmarks/r3_sweep_unroll_probe.py [budget_seconds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BUDGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 3000.0
T0 = time.time()


def log(*a):
  print(f'[{time.time() - T0:7.1f}s]', *a, file=sys.stderr, flush=True)


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import pallas_mll

  log('devices:', jax.devices())
  v = float(jnp.sum(jnp.ones((64, 64))))
  log(f'warmup ok ({v})')

  n, d, k_iters = 8192, 8, 64
  block, half, group = 256, 512, 2
  x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
  xs = (x / 0.9).block_until_ready()

  def make(unroll, mode='full'):
    @jax.jit
    def mll_k(xs, y):
      def one(carry, bump):
        quad, ld = pallas_mll.mll_fused_g(
            xs, y, 1.3, 0.1 + bump, block=block, half=half,
            group=group, sweep_unroll=unroll, mode=mode)
        return carry + 0.5 * quad + ld, ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k_iters))
      return tot
    return mll_k

  results = {}
  # (unroll, mode) in run order; baseline first, static-sweep last (its
  # program is the largest and most likely to upset the compile helper).
  configs = [(2, 'full'), (8, 'full'), (4, 'full'), (16, 'full'),
             (8, 'nosweep'), (32, 'full')]
  ref_val = None
  for unroll, mode in configs:
    if time.time() - T0 > BUDGET_S:
      log(f'budget exhausted; skipping remaining configs')
      break
    tag = f'unroll={unroll} mode={mode}'
    log(f'--- compiling {tag} ...')
    fn = make(unroll, mode)
    try:
      val = float(fn(xs, y))
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: COMPILE/RUN FAILED: {type(e).__name__}: '
          f'{str(e)[:500]}')
      continue
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      float(fn(xs, y))
      times.append(time.perf_counter() - t0)
    ms = min(times) / k_iters * 1e3
    results[tag] = ms
    if mode == 'full':
      if ref_val is None:
        ref_val = val
      drift = abs(val - ref_val) / max(1.0, abs(ref_val))
      log(f'{tag}: {ms:.2f} ms/iter  (value {val:.4f}, '
          f'drift vs first {drift:.2e})')
    else:
      log(f'{tag}: {ms:.2f} ms/iter')
  log('RESULTS:', results)


if __name__ == '__main__':
  main()
