"""Round-6: fused value_and_grad at n=16384 (backward-cap boundary).

The fused backward kernel is capped at n <= pallas_mll_bwd.MAX_N
(16384); this measures the full fused training gradient at that
boundary — the forward alone runs 34 ms (72.8% of peak, bench
large_n leg); dense-pipeline VG at this size would be ~1 s-class.

Run: nohup python benchmarks/r6_vg16k_probe.py > /tmp/r6vg16k.log 2>&1 &
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
  from jax import lax
  from hyperbo_tpu.ops import pallas_mll as pm

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  n, d, k = 16384, 8, 4
  x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
  xs = (x / 0.9).block_until_ready()

  core = pm._se_nll_core_fn(256, 512, 2, False, 32, 'se', 'octv',
                            False, pm._bwd_env_config())

  @jax.jit
  def vg_k(xs, y):
    def one(c, bump):
      val, g = jax.value_and_grad(
          lambda xv: core(xv, y, 1.3, 0.1 + bump))(xs)
      return c + val + jnp.sum(g[0, :]), ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-6, k))
    return tot

  log('--- VG n=16384 (fused fwd + fused bwd + blocked tri-inv) ...')
  try:
    val = float(vg_k(xs, y))
  except Exception as e:  # noqa: BLE001
    log(f'FAILED: {type(e).__name__}: {str(e)[:300]}')
    _abort_if_terminal_down(e, 'vg16k')
    return
  times = []
  for _ in range(3):
    t0 = time.perf_counter()
    float(vg_k(xs, y))
    times.append(time.perf_counter() - t0)
  log(f'VG n=16384: OK {min(times)/k*1e3:.2f} ms/step (value {val:.4f})')


if __name__ == '__main__':
  try:
    main()
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid tunnel wedge): {type(e).__name__}: '
        f'{str(e)[:400]}')
  log('probe done')
