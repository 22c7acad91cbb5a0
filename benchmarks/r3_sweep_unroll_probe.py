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
  from jax import lax  # noqa: F401 (used by follow-up legs)
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
  best = (None, 1e9)
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
      if ms < best[1]:
        best = (unroll, ms)
      drift = abs(val - ref_val) / max(1.0, abs(ref_val))
      log(f'{tag}: {ms:.2f} ms/iter  (value {val:.4f}, '
          f'drift vs first {drift:.2e})')
    else:
      log(f'{tag}: {ms:.2f} ms/iter')
  log('LADDER RESULTS:', results)

  # Follow-ups with whatever budget remains: X3 peak for the fraction,
  # the n=16384 point at the best unroll, and the train-step leg.
  flops = 2.0 * n * n * d + n**3 / 3.0 + 2.0 * n * n
  if best[0] is not None:
    try:
      prec = lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    except AttributeError:
      prec = lax.Precision.HIGHEST
    a = jax.random.normal(jax.random.PRNGKey(3), (4096, 4096),
                          jnp.float32) / 64.0

    @jax.jit
    def chain(a):
      def body(z, _):
        return jnp.dot(z, a, precision=prec), ()
      z, _ = lax.scan(body, a, None, length=256)
      return jnp.sum(z[0])

    float(chain(a))
    t0 = time.perf_counter()
    float(chain(a))
    mm_tf = 2.0 * 4096**3 * 256 / (time.perf_counter() - t0) / 1e12
    frac = flops / (best[1] / 1e3) / 1e12 / mm_tf
    log(f'X3 peak {mm_tf:.1f} TF/s; best full config unroll={best[0]} '
        f'at {best[1]:.2f} ms/iter = {100 * frac:.1f}% of peak')

  if time.time() - T0 < BUDGET_S - 300 and best[0] is not None:
    log(f'--- n=16384 at unroll={best[0]} ...')
    n2, k2 = 16384, 16
    x2 = jax.random.uniform(jax.random.PRNGKey(4), (n2, d), jnp.float32)
    y2 = jax.random.normal(jax.random.PRNGKey(5), (n2, 1), jnp.float32)
    xs2 = (x2 / 0.9).block_until_ready()

    @jax.jit
    def mll_big(xs2, y2):
      def one(carry, bump):
        quad, ld = pallas_mll.mll_fused_g(
            xs2, y2, 1.3, 0.1 + bump, block=block, half=half,
            group=group, sweep_unroll=best[0])
        return carry + 0.5 * quad + ld, ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k2))
      return tot

    try:
      float(mll_big(xs2, y2))
      t0 = time.perf_counter()
      float(mll_big(xs2, y2))
      ms = (time.perf_counter() - t0) / k2 * 1e3
      f2 = 2.0 * n2 * n2 * d + n2**3 / 3.0 + 2.0 * n2 * n2
      log(f'n=16384 unroll={best[0]}: {ms:.2f} ms/iter '
          f'({f2 / (ms / 1e3) / 1e12:.1f} TF/s)')
    except Exception as e:  # noqa: BLE001
      log(f'n=16384 FAILED: {type(e).__name__}: {str(e)[:300]}')

  if time.time() - T0 < BUDGET_S - 600:
    log('--- train-step leg (BENCH_MODE=train equivalent) ...')
    try:
      os.environ['BENCH_TRAIN_K'] = '8'
      sys.path.insert(0, os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))))
      import bench
      res = bench.bench_train()
      log('train leg:', res)
    except Exception as e:  # noqa: BLE001
      log(f'train leg FAILED: {type(e).__name__}: {str(e)[:500]}')
  log('DONE')


if __name__ == '__main__':
  main()
