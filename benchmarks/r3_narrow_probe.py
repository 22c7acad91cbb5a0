"""Round-3 probe 2: narrowed-sweep + zero-skip measurements (n=8192).

Measures the v11 kernel after (a) lane-window-narrowed sweep ops and
(b) the zero-pass skip for non-exported L, plus the mode breakdown and
the n=16384 point. Same no-external-kill discipline as
r3_sweep_unroll_probe.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BUDGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 2400.0
T0 = time.time()


def log(*a):
  print(f'[{time.time() - T0:7.1f}s]', *a, file=sys.stderr, flush=True)


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import pallas_mll

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  n, d, k_iters = 8192, 8, 64
  block, half, group = 256, 512, 2
  x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
  xs = (x / 0.9).block_until_ready()

  def make(unroll, mode='full', return_l=False, hier=False, nn=None,
           kk=None):
    nn = nn or n
    kk = kk or k_iters

    @jax.jit
    def mll_k(xs, y):
      def one(carry, bump):
        out = pallas_mll.mll_fused_g(
            xs, y, 1.3, 0.1 + bump, block=block, half=half,
            group=group, sweep_unroll=unroll, mode=mode,
            hier_sweep=hier, return_l=return_l)
        if return_l:
          _, quad, ld = out
        else:
          quad, ld = out
        return carry + 0.5 * quad + ld, ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, kk))
      return tot
    return mll_k

  def measure(tag, fn, kk=None):
    kk = kk or k_iters
    if time.time() - T0 > BUDGET_S:
      log('budget exhausted before', tag)
      return None
    log(f'--- compiling {tag} ...')
    try:
      val = float(fn(xs, y))
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED: {type(e).__name__}: {str(e)[:400]}')
      return None
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      float(fn(xs, y))
      times.append(time.perf_counter() - t0)
    ms = min(times) / kk * 1e3
    log(f'{tag}: {ms:.2f} ms/iter (value {val:.4f})')
    return ms

  flops = 2.0 * n * n * d + n**3 / 3.0 + 2.0 * n * n
  ms_flat = measure('flat unroll=32 full', make(32))
  ms_hier = measure('HIER unroll=32 full', make(32, hier=True))
  measure('unroll=32 nosweep', make(32, 'nosweep'))
  measure('unroll=32 dmaonly', make(32, 'dmaonly'))
  measure('HIER unroll=32 return_l (zero-pass on)',
          make(32, return_l=True, hier=True))
  ms_full = min(x for x in (ms_flat, ms_hier) if x is not None) if (
      ms_flat or ms_hier) else None

  if ms_full is not None:
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
    frac = flops / (ms_full / 1e3) / 1e12 / mm_tf
    log(f'X3 peak {mm_tf:.1f} TF/s; best full at {ms_full:.2f} '
        f'ms/iter = {100 * frac:.1f}% of peak')

  # n=16384 at the best sweep config.
  if time.time() - T0 < BUDGET_S - 300:
    n2, k2 = 16384, 16
    best_hier = ms_hier is not None and (ms_flat is None or
                                         ms_hier <= ms_flat)
    x2 = jax.random.uniform(jax.random.PRNGKey(4), (n2, d), jnp.float32)
    y2 = jax.random.normal(jax.random.PRNGKey(5), (n2, 1), jnp.float32)
    xs2 = (x2 / 0.9).block_until_ready()

    @jax.jit
    def mll_big(xs2, y2):
      def one(carry, bump):
        quad, ld = pallas_mll.mll_fused_g(
            xs2, y2, 1.3, 0.1 + bump, block=block, half=half,
            group=group, sweep_unroll=32, hier_sweep=best_hier)
        return carry + 0.5 * quad + ld, ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k2))
      return tot

    try:
      float(mll_big(xs2, y2))
      t0 = time.perf_counter()
      float(mll_big(xs2, y2))
      ms = (time.perf_counter() - t0) / k2 * 1e3
      f2 = 2.0 * n2 * n2 * d + n2**3 / 3.0 + 2.0 * n2 * n2
      log(f'n=16384 narrowed: {ms:.2f} ms/iter '
          f'({f2 / (ms / 1e3) / 1e12:.1f} TF/s)')
    except Exception as e:  # noqa: BLE001
      log(f'n=16384 FAILED: {type(e).__name__}: {str(e)[:300]}')
  log('DONE')


if __name__ == '__main__':
  main()
