"""Round-8: grouped Pallas tri-inv ladder on hardware.

The r7 A/B put the panel-major kernel at 82.3 ms isolated at n=16384 —
~40% of the chol kernel's rate for equal n^3/3 FLOPs — because the
G=1 sweep sits exactly at the compute/DMA balance point (1 MB of
L-strip + T-strip per 67 useful MFLOP). The grouped sweep (commit
94e9d88) shares one L stream across G panels: traffic x(1+G)/2G and
G-fold fewer per-row-block latencies.

Legs (each wrapped: an UNCAUGHT exception mid-compile wedges the
tunnel like a kill — CLAUDE.md round-4 note):
  1. isolated tri-inv group ladder {1, 2, 4, 8} at n=8192 and
     {1, 4, 8} at n=16384 (r7 G=1 baselines: 37.1 / 82.3 ms);
  2. value check across groups;
  3. full fused value_and_grad at n=8192 (r7 baseline 26.9 ms) and
     n=16384 (r7 baseline 142.7 ms; round-3 verdict target <= ~100)
     with the library default (group=4).

Writes /tmp/r8_triinv_verdict.json with the per-size best group.

Run: nohup python benchmarks/r8_triinv_group_probe.py > /tmp/r8triinv.log 2>&1 &
"""

import json
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

VERDICT_PATH = os.environ.get('R8_TRIINV_VERDICT',
                              '/tmp/r8_triinv_verdict.json')


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import pallas_triinv
  from hyperbo_tpu.ops import pallas_mll as pm

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  results = {}

  def timeit(tag, fn, *args, k=1, reps=3):
    try:
      out = fn(*args)
      s = float(jnp.sum(out) if hasattr(out, 'shape') else out)
      best = None
      for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)) if hasattr(out, 'shape') else fn(*args))
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
      log(f'{tag}: {best*1e3:.2f} ms/iter (readback {s:.4g})')
      results[tag] = best * 1e3
      return best
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)
      results[tag] = None
      return None

  def spd_chol(n, seed):
    a = jax.random.normal(jax.random.PRNGKey(seed), (n, n),
                          jnp.float32) / jnp.sqrt(jnp.float32(n))
    return jnp.linalg.cholesky(
        (a @ a.T + 2.0 * jnp.eye(n)).astype(jnp.float32))

  # ---- isolated group ladder ----
  for n, groups in ((8192, (1, 2, 4, 8)), (16384, (1, 4, 8))):
    l = spd_chol(n, n).block_until_ready()
    vals = {}
    for g in groups:
      fn = jax.jit(lambda l, g=g: jnp.sum(
          pallas_triinv.tri_inv_panels(l, group=g) ** 2))
      timeit(f'tri-inv n={n} group={g}', fn, l)
      try:
        vals[g] = float(fn(l))
      except Exception as e:  # noqa: BLE001
        _abort_if_terminal_down(e, f'value n={n} g={g}')
    if len(vals) > 1:
      base = vals.get(groups[0])
      rel = max(abs(v - base) / max(abs(base), 1e-9)
                for v in vals.values())
      log(f'value check n={n}: max rel spread {rel:.2e}')
      results[f'value_rel_n{n}'] = rel

  # ---- full value_and_grad with the group=4 default ----
  def make_vg(n, k):
    core = pm._se_nll_core_fn(256, 512, 2, False, 32, 'se', 'octv',
                              False, (True, 'gemm', 'high', 'pallas'))
    d = 8
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    xs = (x / 0.9).astype(jnp.float32)

    @jax.jit
    def vg_k(xs, y):
      def one(c, bump):
        val, grads = jax.value_and_grad(
            lambda xv: core(xv, y, 1.3, 0.1 + bump))(xs)
        return c + val + jnp.sum(grads[0, :]), ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-6, k))
      return tot
    return vg_k, xs, y

  for n, k in ((8192, 8), (16384, 4)):
    fn, xs, y = make_vg(n, k)
    timeit(f'VG n={n} grouped-pallas', fn, xs, y, k=k)

  best = {}
  for n, groups in ((8192, (1, 2, 4, 8)), (16384, (1, 4, 8))):
    timed = {g: results.get(f'tri-inv n={n} group={g}') for g in groups}
    timed = {g: t for g, t in timed.items() if t is not None}
    if timed:
      best[str(n)] = min(timed, key=timed.get)
  with open(VERDICT_PATH, 'w') as f:
    json.dump({'best_group': best, 'results': results}, f, indent=1)
  log(f'VERDICT: best groups {best}; results at {VERDICT_PATH}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
