"""Round-12: 2-D tiled SYRK backward-kernel ladder + VG dissection.

After r11 the n=16384 value_and_grad stands at ~119 ms: fwd ~33 ms,
panel tri-inv ~24 ms, fused backward kernel (mll_bwd_fused) ~60 ms —
the kernel is now the dominant share. Its n^3/6-MAC X3 floor is
~25.9 ms at n=16384 (~3.2 ms at n=8192), so it runs at ~43% of peak,
and its sequential pass re-streams BOTH T-panel strips per (i, j)
block pair (~24 GB at n=16384). The new _kernel_bwd_tiled shares strip
chunks across an RI x GJ pair tile — (RI+GJ)/(2*RI*GJ) of the traffic
— exactly the lever that moved the tri-inv.

Legs (each wrapped: an UNCAUGHT exception mid-compile wedges the
tunnel like a kill):
  A. VG component dissection at both sizes: fwd(return_l='panels'),
     panel tri-inv (library winner cfg), alpha_from_panels, and the
     sequential mll_bwd_fused baseline.
  B. mll_bwd_fused tile ladder (rows, group, chunk) vs the 1x1
     sequential kernel; value-parity check across configs.
  C. full value_and_grad through the library route with
     HYPERBO_BWD_TILE set to the part-B winner vs the 1x1 control.
     r11 baselines: 21.4 ms @8k / 119.0 ms @16k.

Writes /tmp/r12_verdict.json.

Run: nohup python benchmarks/r12_bwd_tile_probe.py > /tmp/r12probe.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R12_VERDICT', '/tmp/r12_verdict.json')

# (rows, group, chunk) tile ladder. VMEM at n=16384: pacc 8 MB fixed;
# strips 2*(ri+gj)*chunk*256*4 B; kacc carry ri*gj*256 KB. (2,4,512)
# sits at ~15 MB scratch + 2 MB carry — expect possible rejects; the
# 256-chunk rungs are the fallback.
TILES_8K = ((2, 2, 512), (4, 2, 512), (2, 4, 512), (4, 4, 512),
            (4, 4, 256), (8, 4, 256))
TILES_16K = ((2, 2, 512), (4, 2, 512), (2, 4, 512), (2, 2, 1024),
             (2, 4, 256), (4, 4, 256))


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import pallas_mll as pm
  from hyperbo_tpu.ops import pallas_mll_bwd as pb
  from hyperbo_tpu.ops import pallas_triinv

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

  d = 8

  def inputs(n):
    """x, delta, L panels (via the fused fwd), tpm, alpha."""
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    xs = (x / 0.9).astype(jnp.float32)
    b, h, g = (256, 512, 2) if n < 16384 else (256, 1024, 4)
    fwd = jax.jit(lambda xs, y: pm.mll_fused_g(
        xs, y, 1.3, 0.1, block=b, half=h, group=g,
        return_l='panels'))
    lp, quad, ld = fwd(xs, y)
    lp = lp.block_until_ready()
    r, gg, c = (4, 2, 512) if n < 16384 else (4, 2, 1024)
    tri = jax.jit(lambda lp: pallas_triinv.tri_inv_panels(
        lp, chunk=c, group=gg, rows=r, panel_input=True,
        diag_transposed=True, panel_layout='blocks'))
    tpm = tri(lp).block_until_ready()
    alpha = jax.jit(pallas_triinv.alpha_from_panels)(
        tpm, y).block_until_ready()
    return xs, y, lp, tpm, alpha, fwd, tri

  tile_best = {}
  for n, tiles in ((8192, TILES_8K), (16384, TILES_16K)):
    xs, y, lp, tpm, alpha, fwd, tri = inputs(n)

    # ---------- A. component dissection ----------
    timeit(f'fwd-panels n={n}',
           lambda xs, y: fwd(xs, y)[1] + 0.0, xs, y)
    timeit(f'tri-inv n={n} (lib cfg)', tri, lp)
    timeit(f'alpha n={n}',
           jax.jit(pallas_triinv.alpha_from_panels), tpm, y)

    def bwd_fn(rows, group, chunk):
      return jax.jit(lambda tpm, xs, alpha, rows=rows, group=group,
                     chunk=chunk: pb.mll_bwd_fused(
                         tpm, xs, alpha, jnp.float32(1.3), block=256,
                         chunk=chunk, kfam='se', rows=rows,
                         group=group)[0])

    vals = {}
    seq = bwd_fn(1, 1, 512)
    timeit(f'bwd-seq n={n} c512', seq, tpm, xs, alpha)
    try:
      vals['1x1x512'] = float(jnp.sum(seq(tpm, xs, alpha)))
    except Exception as e:  # noqa: BLE001
      _abort_if_terminal_down(e, f'bwd-seq value n={n}')

    # ---------- B. tile ladder ----------
    for r, g, c in tiles:
      fn = bwd_fn(r, g, c)
      timeit(f'bwd-tile n={n} {r}x{g}x{c}', fn, tpm, xs, alpha)
      try:
        vals[f'{r}x{g}x{c}'] = float(jnp.sum(fn(tpm, xs, alpha)))
      except Exception as e:  # noqa: BLE001
        _abort_if_terminal_down(e, f'bwd-tile value n={n} {r}x{g}x{c}')
    good = {k: v for k, v in vals.items() if v is not None}
    if len(good) > 1:
      base = good.get('1x1x512', next(iter(good.values())))
      rel = max(abs(v - base) / max(abs(base), 1e-9)
                for v in good.values())
      log(f'bwd value check n={n}: max rel spread {rel:.2e}')
      results[f'bwd_value_rel_n{n}'] = rel
    timed = {cfg: results.get(f'bwd-tile n={n} {cfg[0]}x{cfg[1]}x{cfg[2]}')
             for cfg in tiles}
    timed = {cfg: t for cfg, t in timed.items() if t is not None}
    seq_t = results.get(f'bwd-seq n={n} c512')
    if timed:
      r, g, c = min(timed, key=timed.get)
      if seq_t is None or timed[(r, g, c)] < seq_t:
        tile_best[str(n)] = f'{r}x{g}x{c}'
      else:
        tile_best[str(n)] = '1x1'
  log(f'bwd tile winners: {tile_best}')

  # ---------- C. full value_and_grad through the library route ----------
  def make_vg(n, k):
    fwd_cfg = (256, 512, 2) if n < 16384 else (256, 1024, 4)
    b, h, g = fwd_cfg
    core = pm._se_nll_core_fn(b, h, g, False, 32, 'se', 'octv',
                              False, (True, 'gemm', 'high', 'pallas'))
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
    legs = [('1x1', 'seq-control')]
    w = tile_best.get(str(n))
    if w and w != '1x1':
      legs.insert(0, (w, 'tile-winner'))
    for tile, tag in legs:
      env = {'HYPERBO_BWD_TILE': tile}
      fn, xs, y = with_env(env, lambda n=n, k=k: make_vg(n, k))
      with_env(env, lambda fn=fn, xs=xs, y=y, n=n, k=k, tile=tile,
               tag=tag: timeit(f'VG n={n} bwdtile[{tile}|{tag}]',
                               fn, xs, y, k=k))

  with open(VERDICT_PATH, 'w') as f:
    json.dump({'tile_best': tile_best, 'results': results}, f, indent=1)
  log(f'VERDICT at {VERDICT_PATH}: tiles {tile_best}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
