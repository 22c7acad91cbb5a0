"""Round-10: forward group/half ladder + tri-inv chunk ladder.

Two levers left open by earlier rounds:

1. FORWARD group=4/8. Round 3 ruled group=4 out by VMEM arithmetic
   against the then-9.3 MB remote-toolchain scoped-VMEM ceiling
   (PERF.md "group=4 ruled out"). Round 5 landed the 64 MiB
   vmem_limit_bytes request library-wide and the 2026-08-19 helper
   accepts every config — (256, 1024, 4) needs ~12.3 MiB, (256, 2048,
   8) ~36.5 MiB. Correction re-read volume scales 1/(group*block):
   gb 512 -> 1024 halves the ~1.7 ms DMA share of the n=8192
   non-sweep floor. Target: n=8192 standalone MFU 60% -> ~70%
   (round-3 verdict item 5).

2. TRI-INV chunk 512 -> 1024/2048. The tiled ladder (r9) moved
   n=16384 only 70.3 -> 66.2 ms (37% of peak vs the chol kernel's
   73% at equal FLOPs): the kernel is per-chunk-step-overhead-bound,
   not traffic-bound. Doubling chunk halves the step count at the
   same bytes.

Legs (each wrapped: an UNCAUGHT exception mid-compile wedges the
tunnel like a kill):
  A. standalone fused MLL forward ladder at n=8192 / n=16384;
  B. tri-inv (rows, group, chunk) ladder at n=8192 / n=16384;
  C. full value_and_grad at both sizes with the combined winners
     (r9 baselines: 24.3 / 129.2 ms).

Writes /tmp/r10_verdict.json: forward (block, half, group) winner +
'pallas<R>x<G>x<C>' triinv spec per size.

Run: nohup python benchmarks/r10_fwd_chunk_probe.py > /tmp/r10probe.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R10_VERDICT', '/tmp/r10_verdict.json')

# Forward (block, half, group); (256, 512, 2) is the shipping default.
FWD_8K = ((256, 512, 2), (256, 1024, 2), (256, 1024, 4),
          (256, 2048, 4), (256, 2048, 8))
FWD_16K = ((256, 512, 2), (256, 1024, 4), (256, 2048, 4),
           (256, 2048, 8))

# Tri-inv (rows, group, chunk); r9 winners at chunk=512 were
# (4, 2) @8k and (2, 4) @16k.
TRI_8K = ((4, 2, 512), (4, 2, 1024), (2, 4, 1024), (1, 4, 1024),
          (4, 2, 2048))
TRI_16K = ((2, 4, 512), (2, 4, 1024), (4, 2, 1024), (4, 4, 1024),
           (2, 4, 2048), (4, 4, 2048), (1, 4, 1024))


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
      log(f'{tag}: {best*1e3:.3f} ms/iter (readback {s:.6g})')
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

  # ================= A. forward ladder =================
  # K-iteration scan amortizes the tunnel dispatch, like bench's chol
  # leg; values checked across configs.
  def make_fwd(n, cfg, k):
    b, h, g = cfg
    d = 8
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)

    @jax.jit
    def f(x, y):
      def one(c, bump):
        q, ld = pm.mll_fused_g(x, y, 1.3, 0.1 + bump, block=b, half=h,
                               group=g)
        return c + q + ld, ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-6, k))
      return tot
    return f, x, y

  fwd_best = {}
  for n, cfgs, k in ((8192, FWD_8K, 24), (16384, FWD_16K, 8)):
    vals = {}
    for cfg in cfgs:
      fn, x, y = make_fwd(n, cfg, k)
      timeit(f'fwd n={n} b{cfg[0]} h{cfg[1]} g{cfg[2]}', fn, x, y, k=k)
      try:
        vals[cfg] = float(fn(x, y))
      except Exception as e:  # noqa: BLE001
        _abort_if_terminal_down(e, f'fwd value n={n} {cfg}')
    if len(vals) > 1:
      base = vals.get(cfgs[0])
      rel = max(abs(v - base) / max(abs(base), 1e-9)
                for v in vals.values())
      log(f'fwd value check n={n}: max rel spread {rel:.2e}')
      results[f'fwd_value_rel_n{n}'] = rel
    timed = {c: results.get(f'fwd n={n} b{c[0]} h{c[1]} g{c[2]}')
             for c in cfgs}
    timed = {c: t for c, t in timed.items() if t is not None}
    if timed:
      fwd_best[str(n)] = min(timed, key=timed.get)
  log(f'forward winners: {fwd_best}')

  # ================= B. tri-inv chunk ladder =================
  tri_best = {}
  for n, cfgs in ((8192, TRI_8K), (16384, TRI_16K)):
    l = spd_chol(n, n).block_until_ready()
    vals = {}
    for r, g, c in cfgs:
      fn = jax.jit(lambda l, r=r, g=g, c=c: jnp.sum(
          pallas_triinv.tri_inv_panels(l, chunk=c, group=g,
                                       rows=r) ** 2))
      timeit(f'tri-inv n={n} r{r} g{g} c{c}', fn, l)
      try:
        vals[(r, g, c)] = float(fn(l))
      except Exception as e:  # noqa: BLE001
        _abort_if_terminal_down(e, f'tri value n={n} {(r, g, c)}')
    if len(vals) > 1:
      base = next(iter(vals.values()))
      rel = max(abs(v - base) / max(abs(base), 1e-9)
                for v in vals.values())
      log(f'tri-inv value check n={n}: max rel spread {rel:.2e}')
      results[f'tri_value_rel_n{n}'] = rel
    timed = {c: results.get(f'tri-inv n={n} r{c[0]} g{c[1]} c{c[2]}')
             for c in cfgs}
    timed = {c: t for c, t in timed.items() if t is not None}
    if timed:
      r, g, c = min(timed, key=timed.get)
      tri_best[str(n)] = f'pallas{r}x{g}x{c}'
  log(f'tri-inv winners: {tri_best}')

  # ================= C. combined value_and_grad =================
  def make_vg(n, k, fwd_cfg, triinv_spec):
    b, h, g = fwd_cfg
    core = pm._se_nll_core_fn(b, h, g, False, 32, 'se', 'octv',
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
    fwd_cfg = fwd_best.get(str(n), (256, 512, 2))
    spec = tri_best.get(str(n), 'pallas')
    fn, xs, y = make_vg(n, k, fwd_cfg, spec)
    timeit(f'VG n={n} fwd{fwd_cfg} tri[{spec}]', fn, xs, y, k=k)

  with open(VERDICT_PATH, 'w') as f:
    json.dump({'fwd_best': {k: list(v) for k, v in fwd_best.items()},
               'tri_best': tri_best,
               'results': results}, f, indent=1)
  log(f'VERDICT at {VERDICT_PATH}: fwd {fwd_best}, tri {tri_best}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
