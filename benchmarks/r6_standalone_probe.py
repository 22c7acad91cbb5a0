"""Round-6: pick the fastest COMPILING standalone fused-MLL config.

Context (PERF.md "Scoped-VMEM drift #3"): the 2026-08-18 compile
helper clamps scoped VMEM at a hard 17.00M while the default octv
sweep's Mosaic stack is 17.72M — the standalone forward OOMs in every
grant config even though the same kernel compiles inside the full
value_and_grad program. bench.py walks a fallback ladder and stops at
the FIRST rung that compiles; this probe times EVERY rung that
compiles (plus a few off-ladder combinations) so the library default
(`ops/pallas_mll._fused_env_config`) and the bench ladder order can be
pinned to the fastest config the current toolchain accepts.

Run: nohup python benchmarks/r6_standalone_probe.py > /tmp/r6probe.log 2>&1 &
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

  n, d, k_iters = 8192, 8, 16
  x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
  xs = (x / 0.9).block_until_ready()

  # Same call shape as bench.py's chol leg: value-only, block=256,
  # half=512, group=2, scanned over k_iters jitter bumps.
  def make(**kw):
    @jax.jit
    def mll_k(xs, y):
      def one(c, bump):
        quad, ld = pm.mll_fused_g(xs, y, 1.3, 0.1 + bump, block=256,
                                  half=512, group=2, **kw)
        return c + 0.5 * quad + ld, ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k_iters))
      return tot
    return mll_k

  results = {}

  def attempt(tag, fn, copts=None):
    log(f'--- {tag} ...')
    try:
      if copts is not None:
        runner = fn.lower(xs, y).compile(compiler_options=copts)
      else:
        runner = fn
      val = float(runner(xs, y))
    except Exception as e:  # noqa: BLE001
      msg = str(e)
      key = ('OOM: ' + msg[msg.find('Scoped allocation'):][:120]
             if 'Scoped allocation' in msg else msg[:240])
      log(f'{tag}: FAILED: {type(e).__name__}: {key}')
      _abort_if_terminal_down(e, tag)
      return
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      float(runner(xs, y))
      times.append(time.perf_counter() - t0)
    ms = min(times) / k_iters * 1e3
    results[tag] = ms
    log(f'{tag}: OK {ms:.2f} ms/iter (value {val:.4f})')

  vmem_copts = {'xla_tpu_scoped_vmem_limit_kib': '17408'}
  attempt('octv u32 (default)', make())
  attempt('octv u32 +vmem17M', make(), copts=vmem_copts)
  attempt('octv u32 zero', make(force_zero_init=True))
  attempt('octv u16', make(sweep_unroll=16))
  attempt('octv u32 mb16', make(mb=16))
  attempt('octv u16 mb16', make(sweep_unroll=16, mb=16))
  attempt('hexv u32', make(pivot_mode='hexv'))
  attempt('hexv u16', make(pivot_mode='hexv', sweep_unroll=16))
  attempt('quadv u32', make(pivot_mode='quadv'))
  attempt('quadv u16', make(pivot_mode='quadv', sweep_unroll=16))
  attempt('quadv u16 zero', make(pivot_mode='quadv', sweep_unroll=16,
                                 force_zero_init=True))
  attempt('quadv u16 mb16', make(pivot_mode='quadv', sweep_unroll=16,
                                 mb=16))
  attempt('pairv u16', make(pivot_mode='pairv', sweep_unroll=16))
  attempt('vector u8', make(pivot_mode='vector', sweep_unroll=8))

  log('=== summary (ms/iter, compiling configs only) ===')
  for tag, ms in sorted(results.items(), key=lambda kv: kv[1]):
    log(f'  {ms:7.2f}  {tag}')
  if results:
    best = min(results.items(), key=lambda kv: kv[1])
    log(f'BEST: {best[0]} at {best[1]:.2f} ms/iter')


if __name__ == '__main__':
  try:
    main()
  except Exception as e:  # noqa: BLE001
    # An uncaught exception mid-compile wedges the tunnel like a kill
    # (CLAUDE.md round-4 note) — swallow, log, exit cleanly.
    log(f'FATAL (caught to avoid tunnel wedge): {type(e).__name__}: '
        f'{str(e)[:400]}')
  log('probe done')
