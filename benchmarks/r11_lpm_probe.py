"""Round-11: panel-major-L triangular inverse (contiguous DMA) A/B.

The r9 ladder concluded the tiled tri-inv sweep is per-chunk-step
overhead-bound (34-37% of peak vs the chol kernel's ~73% at equal
FLOPs). Round 11 attacks the suspected root cause instead: the sweep's
L row-strip reads come from DENSE L — 256 separate 4 KB strided bursts
per (B, chunk) window — while every kernel in this codebase that reads
only contiguous panel-major data (chol forward, SYRK backward) runs at
~70%+. ops/pallas_triinv now accepts L panel-major (panel_input=True):
all L reads become contiguous (B, B) panel blocks, and the fused VJP
saves its L residual panel-major straight off the forward kernel
(return_l='panels', no n^2 dense transpose in the fwd either).

Legs (each wrapped: an UNCAUGHT exception mid-compile wedges the
tunnel like a kill):
  A. tri-inv standalone: dense-input anchor rungs (r10 winners) vs a
     panel-input (rows, group, chunk) ladder at n=8192 / n=16384.
     Ideal MXU floor (n^3/6 MACs, X3): ~2.8 ms @8k, ~22.3 ms @16k.
  B. full value_and_grad through the library default route (bare
     'pallas' bwd_cfg -> panel residual automatically) + explicit
     winner specs. r10 baselines: 24.3 ms @8k / 129.2 ms @16k.

Writes /tmp/r11_verdict.json.

Run: nohup python benchmarks/r11_lpm_probe.py > /tmp/r11probe.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R11_VERDICT', '/tmp/r11_verdict.json')

# Dense anchors = the r10 winners (33.97 ms @8k, 65.7 ms @16k).
DENSE_8K = ((4, 2, 512),)
DENSE_16K = ((4, 2, 1024),)

# Panel-input ladder: (rows, group, chunk, layout). With contiguous
# DMA the balance point should move toward square-ish tiles (L
# bytes/MAC ~ 1/jg, T bytes/MAC ~ 1/ig); VMEM at (4, 4, 1024) ~ 30 MB,
# (8, 4, 1024) ~ 61 MB (borderline vs the 64 MiB request — expect
# possible rejects). Layouts: 'wide' = dense-identical compute via
# lane-window DMA destinations; 'blocks' = fully-indexed scratch +
# per-kk dots (hedge — Mosaic rejected the r11 multi-contraction
# dot_general, and the lane-window destinations are the remaining
# toolchain-risk construct).
LPM_8K = ((4, 2, 512, 'wide'), (4, 2, 512, 'blocks'),
          (4, 4, 1024, 'wide'), (4, 4, 1024, 'blocks'),
          (8, 4, 1024, 'wide'), (4, 4, 2048, 'wide'))
LPM_16K = ((4, 2, 1024, 'wide'), (4, 2, 1024, 'blocks'),
           (4, 4, 1024, 'wide'), (4, 4, 1024, 'blocks'),
           (8, 4, 1024, 'wide'), (8, 2, 2048, 'wide'))


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

  # ================= A. tri-inv dense vs panel input =================
  tri_best = {}
  for n, dense_cfgs, lpm_cfgs in ((8192, DENSE_8K, LPM_8K),
                                  (16384, DENSE_16K, LPM_16K)):
    block = 256
    nb = n // block
    l = spd_chol(n, n).block_until_ready()
    lpm = jax.jit(lambda l: jnp.moveaxis(
        l.reshape(n, nb, block), 1, 0))(l).block_until_ready()
    vals = {}
    for r, g, c in dense_cfgs:
      fn = jax.jit(lambda l, r=r, g=g, c=c: jnp.sum(
          pallas_triinv.tri_inv_panels(l, chunk=c, group=g,
                                       rows=r) ** 2))
      timeit(f'tri-dense n={n} r{r} g{g} c{c}', fn, l)
      try:
        vals[('d', r, g, c)] = float(fn(l))
      except Exception as e:  # noqa: BLE001
        _abort_if_terminal_down(e, f'tri-dense value n={n} {(r, g, c)}')
    for r, g, c, lay in lpm_cfgs:
      fn = jax.jit(lambda lpm, r=r, g=g, c=c, lay=lay: jnp.sum(
          pallas_triinv.tri_inv_panels(lpm, chunk=c, group=g, rows=r,
                                       panel_input=True,
                                       panel_layout=lay) ** 2))
      timeit(f'tri-lpm n={n} r{r} g{g} c{c} {lay}', fn, lpm)
      try:
        vals[('p', r, g, c, lay)] = float(fn(lpm))
      except Exception as e:  # noqa: BLE001
        _abort_if_terminal_down(e, f'tri-lpm value n={n} {(r, g, c)}')
    if len(vals) > 1:
      base = next(iter(vals.values()))
      rel = max(abs(v - base) / max(abs(base), 1e-9)
                for v in vals.values())
      log(f'tri-inv value check n={n}: max rel spread {rel:.2e}')
      results[f'tri_value_rel_n{n}'] = rel
    timed = {cfg: results.get(
        f'tri-lpm n={n} r{cfg[0]} g{cfg[1]} c{cfg[2]} {cfg[3]}')
        for cfg in lpm_cfgs}
    timed = {cfg: t for cfg, t in timed.items() if t is not None}
    if timed:
      r, g, c, lay = min(timed, key=timed.get)
      tri_best[str(n)] = (f'pallas{r}x{g}x{c}', lay)
  log(f'panel tri-inv winners: {tri_best}')

  # ================= B. full value_and_grad =================
  def make_vg(n, k, triinv_spec):
    fwd_cfg = (256, 512, 2) if n < 16384 else (256, 1024, 4)
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

  def with_env(env, thunk):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
      return thunk()
    finally:
      for k, v in saved.items():
        if v is None:
          os.environ.pop(k, None)
        else:
          os.environ[k] = v

  for n, k in ((8192, 8), (16384, 4)):
    # (spec, env, tag): default route (panel residual, wide layout);
    # blocks layout; dense-L control (the r10-measured baseline); the
    # part-A winner if different.
    legs = [('pallas', {}, 'panel-wide'),
            ('pallas', {'HYPERBO_TRIINV_PANEL_LAYOUT': 'blocks'},
             'panel-blocks'),
            ('pallas', {'HYPERBO_BWD_PANEL_L': '0'}, 'denseL')]
    w = tri_best.get(str(n))
    if w and w[0] != 'pallas':
      legs.append((w[0],
                   {'HYPERBO_TRIINV_PANEL_LAYOUT': w[1]},
                   f'winner-{w[1]}'))
    for spec, env, tag in legs:
      fn, xs, y = with_env(env, lambda n=n, k=k, spec=spec: make_vg(
          n, k, spec))
      with_env(env, lambda fn=fn, xs=xs, y=y, n=n, k=k, spec=spec,
               tag=tag: timeit(f'VG n={n} tri[{spec}|{tag}]', fn, xs, y,
                               k=k))

  with open(VERDICT_PATH, 'w') as f:
    json.dump({'tri_best': tri_best, 'results': results}, f, indent=1)
  log(f'VERDICT at {VERDICT_PATH}: tri {tri_best}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
