"""Round-12c: wider-tile mini-ladders + joint-winner VG.

After r12 the n=16384 VG stands at 109.2 ms (fwd 33 / tri-inv ~32 /
tiled SYRK ~36 / glue ~6) with every kernel at 68-75% of the X3 peak.
This probe walks the remaining cheap rungs:
  A. SYRK backward: wider/deeper tiles than the r12 ladder covered
     (VMEM envelope now known to admit 4x4x512 at n=8192).
  B. panel tri-inv: r11's rows=8 rejects were all 'wide'-layout; retry
     wide tiles in the 'blocks' layout at smaller chunks.
  C. full VG with the joint winners via env knobs.

Writes /tmp/r12c_verdict.json.

Run: nohup python benchmarks/r12c_joint_probe.py > /tmp/r12cprobe.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R12C_VERDICT', '/tmp/r12c_verdict.json')

SYRK_8K = ((8, 4, 512), (4, 8, 256), (8, 8, 256), (4, 4, 512))
SYRK_16K = ((4, 4, 512), (8, 2, 512), (2, 8, 512), (4, 2, 1024),
            (2, 4, 1024), (4, 4, 1024))
TRI_16K = ((8, 2, 1024, 'blocks'), (8, 4, 512, 'blocks'),
           (4, 8, 512, 'blocks'), (8, 8, 512, 'blocks'))
TRI_8K = ((8, 2, 512, 'blocks'), (8, 4, 256, 'blocks'))


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
  syrk_best = {}
  tri_best = {}
  for n, syrk_cfgs, tri_cfgs, base_syrk, base_tri in (
      (8192, SYRK_8K, TRI_8K, (4, 4, 256), (4, 2, 512)),
      (16384, SYRK_16K, TRI_16K, (2, 4, 512), (4, 2, 1024))):
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    xs = (x / 0.9).astype(jnp.float32)
    b, h, g = (256, 512, 2) if n < 16384 else (256, 1024, 4)
    lp, _, _ = jax.jit(lambda xs, y: pm.mll_fused_g(
        xs, y, 1.3, 0.1, block=b, half=h, group=g,
        return_l='panels'))(xs, y)
    lp = lp.block_until_ready()

    # ---------- B. tri-inv wider 'blocks' tiles ----------
    def tri_fn(r, gg, c):
      return jax.jit(lambda lp, r=r, gg=gg, c=c:
                     pallas_triinv.tri_inv_panels(
                         lp, chunk=c, group=gg, rows=r,
                         panel_input=True, diag_transposed=True,
                         panel_layout='blocks'))

    br, bg, bc = base_tri
    tri_base = tri_fn(br, bg, bc)
    t_base = timeit(f'tri n={n} {br}x{bg}x{bc} [default]', tri_base, lp)
    tri_timed = {}
    for r, gg, c, lay in tri_cfgs:
      t = timeit(f'tri n={n} {r}x{gg}x{c} {lay}', tri_fn(r, gg, c), lp)
      if t is not None:
        tri_timed[(r, gg, c)] = t
    if tri_timed and t_base is not None:
      best_cfg = min(tri_timed, key=tri_timed.get)
      tri_best[str(n)] = (best_cfg if tri_timed[best_cfg] < t_base
                          else base_tri)
    else:
      tri_best[str(n)] = base_tri

    tpm = tri_base(lp).block_until_ready()
    alpha = jax.jit(pallas_triinv.alpha_from_panels)(
        tpm, y).block_until_ready()

    # ---------- A. SYRK wider tiles ----------
    def bwd_fn(rr, ggr, cc):
      return jax.jit(lambda tpm, xs, alpha, rr=rr, ggr=ggr, cc=cc:
                     pb.mll_bwd_fused(
                         tpm, xs, alpha, jnp.float32(1.3), block=256,
                         chunk=cc, kfam='se', rows=rr, group=ggr)[0])

    sr, sg, sc = base_syrk
    s_base = timeit(f'bwd n={n} {sr}x{sg}x{sc} [default]',
                    bwd_fn(sr, sg, sc), tpm, xs, alpha)
    syrk_timed = {}
    for rr, ggr, cc in syrk_cfgs:
      t = timeit(f'bwd n={n} {rr}x{ggr}x{cc}', bwd_fn(rr, ggr, cc),
                 tpm, xs, alpha)
      if t is not None:
        syrk_timed[(rr, ggr, cc)] = t
    if syrk_timed and s_base is not None:
      best_cfg = min(syrk_timed, key=syrk_timed.get)
      syrk_best[str(n)] = (best_cfg if syrk_timed[best_cfg] < s_base
                           else base_syrk)
    else:
      syrk_best[str(n)] = base_syrk
  log(f'winners: tri {tri_best} syrk {syrk_best}')

  # ---------- C. full VG with the joint winners ----------
  def make_vg(n, k):
    b, h, g = (256, 512, 2) if n < 16384 else (256, 1024, 4)
    core = pm._se_nll_core_fn(b, h, g, False, 32, 'se', 'octv',
                              False, pm._bwd_env_config())
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
    tr, tg, tc = tri_best[str(n)]
    sr, sg, sc = syrk_best[str(n)]
    env = {'HYPERBO_BWD_TRIINV': f'pallas{tr}x{tg}x{tc}',
           'HYPERBO_BWD_TILE': f'{sr}x{sg}x{sc}',
           'HYPERBO_BWD_FUSED': '1'}
    fn, xs, y = with_env(env, lambda n=n, k=k: make_vg(n, k))
    with_env(env, lambda fn=fn, xs=xs, y=y, n=n, k=k:
             timeit(f'VG n={n} joint[tri{tri_best[str(n)]}'
                    f'|syrk{syrk_best[str(n)]}]', fn, xs, y, k=k))
    fn2, xs2, y2 = make_vg(n, k)
    timeit(f'VG n={n} library-default', fn2, xs2, y2, k=k)

  with open(VERDICT_PATH, 'w') as f:
    json.dump({'tri_best': {k: list(v) for k, v in tri_best.items()},
               'syrk_best': {k: list(v) for k, v in syrk_best.items()},
               'results': results}, f, indent=1)
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
