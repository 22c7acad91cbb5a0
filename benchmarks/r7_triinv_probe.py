"""Round-7: panel-major Pallas triangular inverse on hardware.

The round-3 verdict's top item: the n=16384 fused value_and_grad runs
181 ms/step, ~107 ms of it the blocked tri-inv recursion
(r6_vg16k_probe). ops/pallas_triinv streams the inverse as one Pallas
kernel writing the panel-major layout the fused backward consumes.

Legs (each wrapped: an UNCAUGHT exception mid-compile wedges the
tunnel like a kill — CLAUDE.md round-4 note):
  1. isolated tri-inv at n=8192: pallas kernel vs blocked recursion
     (r5 baseline 14.7 ms) vs value check;
  2. isolated at n=16384 (recursion expectation ~118 ms);
  3. full fused value_and_grad at n=8192: pallas vs recursion route
     (baseline 32.35 ms/step);
  4. full fused value_and_grad at n=16384 (baseline 181.1 ms/step,
     target <= ~100).

Writes the winner to /tmp/r7_triinv_verdict.json so the session's
bench phase can set HYPERBO_BWD_TRIINV accordingly.

Run: nohup python benchmarks/r7_triinv_probe.py > /tmp/r7triinv.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R7_TRIINV_VERDICT',
                              '/tmp/r7_triinv_verdict.json')


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import linalg as linalg_mod
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

  # ---- isolated legs ----
  for n in (8192, 16384):
    l = spd_chol(n, n).block_until_ready()

    @jax.jit
    def inv_pallas(l):
      return jnp.sum(pallas_triinv.tri_inv_panels(l) ** 2)

    @jax.jit
    def inv_rec(l):
      return jnp.sum(linalg_mod.tri_inv_blocked(l) ** 2)

    tp = timeit(f'tri-inv pallas n={n}', inv_pallas, l)
    tr = timeit(f'tri-inv recursion n={n}', inv_rec, l)
    # value check (sum-of-squares of the two inverses must agree)
    try:
      vp = float(inv_pallas(l))
      vr = float(inv_rec(l))
      rel = abs(vp - vr) / max(abs(vr), 1e-9)
      log(f'value check n={n}: pallas {vp:.6g} vs recursion {vr:.6g} '
          f'(rel {rel:.2e})')
      results[f'value_rel_n{n}'] = rel
    except Exception as e:  # noqa: BLE001
      log(f'value check n={n} FAILED: {type(e).__name__}: {str(e)[:200]}')
      _abort_if_terminal_down(e, f'value check n={n}')

  # ---- full value_and_grad legs ----
  def make_vg(n, triinv, k):
    core = pm._se_nll_core_fn(256, 512, 2, False, 32, 'se', 'octv',
                              False, (True, 'gemm', 'high', triinv))
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
    for triinv in ('pallas', '1'):
      fn, xs, y = make_vg(n, triinv, k)
      timeit(f'VG n={n} triinv={triinv}', fn, xs, y, k=k)

  # verdict: pick by the n=16384 VG leg (fall back to n=8192)
  vp = results.get('VG n=16384 triinv=pallas')
  vr = results.get('VG n=16384 triinv=1')
  if vp is None or vr is None:
    vp = results.get('VG n=8192 triinv=pallas')
    vr = results.get('VG n=8192 triinv=1')
  winner = 'pallas' if (vp is not None and (vr is None or vp < vr)) else '1'
  with open(VERDICT_PATH, 'w') as f:
    json.dump({'winner': winner, 'results': results}, f, indent=1)
  log(f'VERDICT: triinv={winner}; results at {VERDICT_PATH}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
