"""Round-3 probe 4: value-carried sweep on hardware.

The sweep is latency-bound on its serial VMEM read-modify-write chain
(probe 3); value_sweep keeps the micro-block elimination state in
vregs. This measures whether Mosaic (a) compiles it and (b) keeps the
state resident (a spill would reproduce ref-path timing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BUDGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 100000.0
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

  def make(values, hier=False, mode='full', nn=None, kk=None):
    kk = kk or k_iters

    @jax.jit
    def mll_k(xs, y):
      def one(carry, bump):
        quad, ld = pallas_mll.mll_fused_g(
            xs, y, 1.3, 0.1 + bump, block=block, half=half,
            group=group, sweep_unroll=32, mode=mode,
            value_sweep=values, hier_sweep=hier)
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

  ms_ref = measure('ref-sweep (values=False)', make(False))
  ms_val = measure('VALUE sweep', make(True))
  measure('VALUE + hier', make(True, hier=True))
  if ms_val is not None and ms_ref is not None:
    log(f'value sweep delta: {ms_ref - ms_val:+.2f} ms')

  if ms_val is not None and time.time() - T0 < BUDGET_S - 300:
    n2, k2 = 16384, 16
    x2 = jax.random.uniform(jax.random.PRNGKey(4), (n2, d), jnp.float32)
    y2 = jax.random.normal(jax.random.PRNGKey(5), (n2, 1), jnp.float32)
    xs2 = (x2 / 0.9).block_until_ready()

    @jax.jit
    def mll_big(xs2, y2):
      def one(carry, bump):
        quad, ld = pallas_mll.mll_fused_g(
            xs2, y2, 1.3, 0.1 + bump, block=block, half=half,
            group=group, sweep_unroll=32, value_sweep=True)
        return carry + 0.5 * quad + ld, ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k2))
      return tot

    try:
      float(mll_big(xs2, y2))
      t0 = time.perf_counter()
      float(mll_big(xs2, y2))
      ms = (time.perf_counter() - t0) / k2 * 1e3
      f2 = 2.0 * n2 * n2 * d + n2**3 / 3.0 + 2.0 * n2 * n2
      log(f'n=16384 VALUE: {ms:.2f} ms/iter '
          f'({f2 / (ms / 1e3) / 1e12:.1f} TF/s)')
    except Exception as e:  # noqa: BLE001
      log(f'n=16384 FAILED: {type(e).__name__}: {str(e)[:300]}')

  # --- train-leg bisection: fwd-only vs full VJP, tri-inv on/off ---
  log('--- train bisection ...')
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel as kern, mean
  from hyperbo_tpu.models import objectives as obj

  dataset = {'t': defs.SubDataset(x, y)}
  model0 = {'lengthscale': jnp.ones(d) * 0.5, 'signal_variance': 0.0,
            'noise_variance': -2.0}

  def loss(m):
    p = defs.GPParams(model=m, config={'fused_mll': True})
    return obj.neg_log_marginal_likelihood(
        mean.zero, kern.squared_exponential, p, dataset,
        warp_func=DEFAULT_WARP_FUNC)

  def timed8(fn, *a):
    try:
      float(fn(*a))
    except Exception as e:  # noqa: BLE001
      log(f'   FAILED: {type(e).__name__}: {str(e)[:300]}')
      return None
    t0 = time.perf_counter()
    float(fn(*a))
    return (time.perf_counter() - t0) / 8 * 1e3

  @jax.jit
  def fwd8(m):
    def one(c, bump):
      mm = dict(m)
      mm['noise_variance'] = mm['noise_variance'] + bump
      return c + loss(mm), ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-4, 8))
    return tot

  @jax.jit
  def vg8(m):
    def one(c, bump):
      mm = dict(m)
      mm['noise_variance'] = mm['noise_variance'] + bump
      l, g = jax.value_and_grad(loss)(mm)
      return c + l + g['signal_variance'], ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-4, 8))
    return tot

  ms = timed8(fwd8, model0)
  log(f'fused fwd only       : {ms and round(ms, 1)} ms/step')
  os.environ['HYPERBO_BWD_TRIINV'] = '1'
  ms = timed8(vg8, model0)
  log(f'fused VJP (tri-inv)  : {ms and round(ms, 1)} ms/step')

  # tri-inv off: new jit closure so the env re-reads inside trace
  os.environ['HYPERBO_BWD_TRIINV'] = '0'
  from hyperbo_tpu.ops import pallas_mll as pm2
  pm2._se_nll_core_fn.cache_clear()
  pm2._se_nll_core_masked_fn.cache_clear()

  @jax.jit
  def vg8b(m):
    def one(c, bump):
      mm = dict(m)
      mm['noise_variance'] = mm['noise_variance'] + bump
      l, g = jax.value_and_grad(loss)(mm)
      return c + l + g['signal_variance'], ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-4, 8))
    return tot

  ms = timed8(vg8b, model0)
  log(f'fused VJP (xla solve): {ms and round(ms, 1)} ms/step')
  log('DONE')


if __name__ == '__main__':
  main()
