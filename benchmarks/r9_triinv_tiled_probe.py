"""Round-9: 2-D tiled Pallas tri-inv ladder on hardware.

The r8 group ladder (PERF.md round-8) showed the 1-D grouped sweep
plateaus at g=4 (n=16384: 77.8 -> 68.6 ms, g=8 no better) — the sweep
is bounded by the T-strip stream, which grouping does NOT share. The
2-D tiled sweep (commit 2a5ac74, _kernel_triinv_tiled) shares each
T-strip chunk across IG row-blocks: strip traffic /IG, L traffic /JG,
with the intra-tile dependency resolved in a sequential VMEM corner.

Legs (each wrapped: an UNCAUGHT exception mid-compile wedges the
tunnel like a kill — CLAUDE.md round-4 note):
  1. isolated (rows, group) ladder at n=8192 and n=16384 against the
     r8 1-D baseline (31.0 / 68.6 ms at g=4);
  2. value check across configs;
  3. full fused value_and_grad at n=8192 (r8 baseline 25.0 ms) and
     n=16384 (r8 baseline 132.1 ms; round-3 verdict target <= ~100)
     with the per-size ladder winner.

Writes /tmp/r9_triinv_verdict.json with the per-size best config as a
'pallas<R>x<G>' HYPERBO_BWD_TRIINV spec (bare 'pallas' if the 1-D
sweep wins).

Run: nohup python benchmarks/r9_triinv_tiled_probe.py > /tmp/r9triinv.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R9_TRIINV_VERDICT',
                              '/tmp/r9_triinv_verdict.json')

# (rows, group) ladder; rows=1 is the r8 1-D baseline. (8, 8) exceeds
# the 64 MiB VMEM request (~66.5 MiB of scratch) and is excluded.
CONFIGS_8K = ((1, 4), (2, 4), (4, 2), (4, 4), (4, 8), (8, 4))
CONFIGS_16K = ((1, 4), (2, 4), (4, 4), (4, 8), (8, 4))


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

  # ---- isolated (rows, group) ladder ----
  for n, configs in ((8192, CONFIGS_8K), (16384, CONFIGS_16K)):
    l = spd_chol(n, n).block_until_ready()
    vals = {}
    for r, g in configs:
      fn = jax.jit(lambda l, r=r, g=g: jnp.sum(
          pallas_triinv.tri_inv_panels(l, group=g, rows=r) ** 2))
      timeit(f'tri-inv n={n} rows={r} group={g}', fn, l)
      try:
        vals[(r, g)] = float(fn(l))
      except Exception as e:  # noqa: BLE001
        _abort_if_terminal_down(e, f'value n={n} r={r} g={g}')
    if len(vals) > 1:
      base = vals.get(configs[0])
      rel = max(abs(v - base) / max(abs(base), 1e-9)
                for v in vals.values())
      log(f'value check n={n}: max rel spread {rel:.2e}')
      results[f'value_rel_n{n}'] = rel

  # ---- per-size winners ----
  best = {}
  for n, configs in ((8192, CONFIGS_8K), (16384, CONFIGS_16K)):
    timed = {c: results.get(f'tri-inv n={n} rows={c[0]} group={c[1]}')
             for c in configs}
    timed = {c: t for c, t in timed.items() if t is not None}
    if timed:
      r, g = min(timed, key=timed.get)
      best[str(n)] = 'pallas' if r == 1 else f'pallas{r}x{g}'
  log(f'ladder winners: {best}')

  # ---- full value_and_grad with the per-size winner ----
  def make_vg(n, k, triinv_spec):
    core = pm._se_nll_core_fn(256, 512, 2, False, 32, 'se', 'octv',
                              False, (True, 'gemm', 'high', triinv_spec))
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
    spec = best.get(str(n), 'pallas4x4')
    if spec == 'pallas':
      log(f'VG n={n}: 1-D sweep won the ladder; r8 baseline stands')
      continue
    fn, xs, y = make_vg(n, k, spec)
    timeit(f'VG n={n} tiled[{spec}]', fn, xs, y, k=k)

  with open(VERDICT_PATH, 'w') as f:
    json.dump({'best': best,
               'results': {str(k): v for k, v in results.items()}},
              f, indent=1)
  log(f'VERDICT: {best}; results at {VERDICT_PATH}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
