"""Round-12b: single-pass-bf16 ladder for the fused backward kernel.

mll_bwd_fused ran its in-VMEM dots 3-pass X3 (Dekker split) since
round 4 — HYPERBO_BWD_PREC never reached it. The SYRK accumulation is
a pure reduction (no recursion for error to compound through), the
X3 peak is ~1/3 of the single-pass bf16 MXU rate, and the VG pipeline
already sits at the 6e-3-rel f32-reorder gradient class vs dense — so
precise=False is a ~3x-MXU-rate candidate whose error class has to be
measured, not guessed.

Legs (reads the tile winner from /tmp/r12_verdict.json if present):
  A. bwd kernel standalone: {1x1, tile winner} x {X3, bf16} at both
     sizes + d_x max-rel accuracy delta between the prec modes.
  B. full value_and_grad: HYPERBO_BWD_TILE=winner x HYPERBO_BWD_PREC
     {high, default} + gradient max-rel delta.

Writes /tmp/r12b_verdict.json.

Run: nohup python benchmarks/r12b_prec_probe.py > /tmp/r12bprobe.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R12B_VERDICT', '/tmp/r12b_verdict.json')
R12_VERDICT = os.environ.get('R12_VERDICT', '/tmp/r12_verdict.json')


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import pallas_mll as pm
  from hyperbo_tpu.ops import pallas_mll_bwd as pb
  from hyperbo_tpu.ops import pallas_triinv

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  tile_best = {}
  try:
    with open(R12_VERDICT) as f:
      tile_best = json.load(f).get('tile_best', {})
  except (OSError, ValueError):
    pass
  log('tile winners from r12:', tile_best or '(none — using 1x1)')

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

  def parse_tile(n):
    spec = tile_best.get(str(n), '1x1')
    parts = (spec.split('x') + ['512'])[:3]
    return int(parts[0]), int(parts[1]), int(parts[2])

  # ---------- A. kernel standalone prec ladder ----------
  for n in (8192, 16384):
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    xs = (x / 0.9).astype(jnp.float32)
    b, h, g = (256, 512, 2) if n < 16384 else (256, 1024, 4)
    lp, _, _ = jax.jit(lambda xs, y: pm.mll_fused_g(
        xs, y, 1.3, 0.1, block=b, half=h, group=g,
        return_l='panels'))(xs, y)
    r, gg, c = (4, 2, 512) if n < 16384 else (4, 2, 1024)
    tpm = jax.jit(lambda lp: pallas_triinv.tri_inv_panels(
        lp, chunk=c, group=gg, rows=r, panel_input=True,
        diag_transposed=True, panel_layout='blocks'))(
            lp).block_until_ready()
    alpha = jax.jit(pallas_triinv.alpha_from_panels)(
        tpm, y).block_until_ready()

    tr, tg, tc = parse_tile(n)
    cfgs = [('1x1x512', 1, 1, 512)]
    if (tr, tg, tc) != (1, 1, 512):
      cfgs.append((f'{tr}x{tg}x{tc}', tr, tg, tc))
    dx_ref = None
    for tag, rr, ggr, cc in cfgs:
      for prec, ptag in ((True, 'X3'), (False, 'bf16')):
        fn = jax.jit(lambda tpm, xs, alpha, rr=rr, ggr=ggr, cc=cc,
                     prec=prec: pb.mll_bwd_fused(
                         tpm, xs, alpha, jnp.float32(1.3), block=256,
                         chunk=cc, kfam='se', rows=rr, group=ggr,
                         precise=prec)[0])
        timeit(f'bwd n={n} {tag} {ptag}', fn, tpm, xs, alpha)
        try:
          dx = fn(tpm, xs, alpha)
          if prec and dx_ref is None:
            dx_ref = dx
          elif not prec and dx_ref is not None:
            rel = float(jnp.max(jnp.abs(dx - dx_ref))
                        / (jnp.max(jnp.abs(dx_ref)) + 1e-30))
            log(f'bwd n={n} {tag} bf16-vs-X3 d_x max rel: {rel:.2e}')
            results[f'bwd_dx_rel_n{n}_{tag}'] = rel
        except Exception as e:  # noqa: BLE001
          _abort_if_terminal_down(e, f'bwd value n={n} {tag} {ptag}')

  # ---------- B. full VG prec x tile ----------
  def make_vg(n, k):
    b, h, g = (256, 512, 2) if n < 16384 else (256, 1024, 4)
    cfg = pm._bwd_env_config()
    core = pm._se_nll_core_fn(b, h, g, False, 32, 'se', 'octv',
                              False, cfg)
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

    @jax.jit
    def g_once(xs, y):
      return jax.grad(lambda xv: core(xv, y, 1.3, 0.1))(xs)
    return vg_k, g_once, xs, y

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
    spec = tile_best.get(str(n), '1x1')
    g_ref = None
    for prec, ptag in (('high', 'X3'), ('default', 'bf16')):
      env = {'HYPERBO_BWD_TILE': spec, 'HYPERBO_BWD_PREC': prec,
             'HYPERBO_BWD_FUSED': '1', 'HYPERBO_BWD_TRIINV': 'pallas'}
      fn, g_once, xs, y = with_env(env, lambda n=n, k=k: make_vg(n, k))
      with_env(env, lambda fn=fn, xs=xs, y=y, n=n, k=k, spec=spec,
               ptag=ptag: timeit(f'VG n={n} tile[{spec}] {ptag}',
                                 fn, xs, y, k=k))
      try:
        gv = with_env(env, lambda g_once=g_once, xs=xs, y=y:
                      g_once(xs, y).block_until_ready())
        if prec == 'high':
          g_ref = gv
        elif g_ref is not None:
          rel = float(jnp.max(jnp.abs(gv - g_ref))
                      / (jnp.max(jnp.abs(g_ref)) + 1e-30))
          log(f'VG n={n} bf16-vs-X3 grad max rel: {rel:.2e}')
          results[f'vg_grad_rel_n{n}'] = rel
      except Exception as e:  # noqa: BLE001
        _abort_if_terminal_down(e, f'VG grad value n={n} {ptag}')

  with open(VERDICT_PATH, 'w') as f:
    json.dump({'results': results}, f, indent=1)
  log(f'VERDICT at {VERDICT_PATH}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
