"""Round-13: joint backward megakernel (tri-inv + alpha + SYRK) A/B.

ops/pallas_bwd_joint fuses the backward's three device programs into
one kernel: u = T delta rides the tri-inv's serial phase-B corner,
alpha streams the nonzero HALF of T (the XLA einsums read 2x full T),
and the padded (n, 1) alpha/valid VMEM inputs are replaced by in-
kernel transpose-by-ones — which also lifts the backward's n cap to
32768. Expected effect is the alpha glue (~3-6 ms at n=16384) plus
whatever the cross-phase scheduling buys; the r12c record names this
fusion as the next structural lever after the tile plateau.

Legs (each wrapped — an uncaught exception mid-compile wedges the
tunnel like a kill, CLAUDE.md):
  A. standalone joint kernel at n=8192/16384 (library tile defaults)
     vs the summed two-kernel pipeline legs (tri-inv + alpha + SYRK),
     + value parity vs the two-kernel route on-device.
  B. full value_and_grad through the library route:
     HYPERBO_BWD_JOINT=1 vs =0 control (r12 baselines: 20.5 / 109.2).
  C. joint tile mini-ladder (ti x sy interactions may shift optima).
  D. n=32768: joint full VG (caps lifted in-process) — NEW capability
     point; dense pipeline is ~1 s class at 16384 and cannot hold
     K + K^{-1} at 32768.

Writes /tmp/r13_verdict.json.

Run: nohup python benchmarks/r13_joint_probe.py > /tmp/r13probe.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R13_VERDICT', '/tmp/r13_verdict.json')

# (ti_rows, ti_group, ti_chunk, sy_rows, sy_group, sy_chunk) rungs
# around the standalone winners (r9-r12 ladders).
JOINT_TILES_8K = ((4, 2, 512, 4, 4, 256), (4, 2, 512, 2, 4, 512),
                  (2, 2, 512, 4, 4, 256), (4, 4, 512, 4, 4, 256))
JOINT_TILES_16K = ((4, 2, 1024, 2, 4, 512), (4, 2, 512, 2, 4, 512),
                   (4, 2, 1024, 4, 4, 256), (2, 4, 1024, 2, 4, 512))


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import pallas_bwd_joint as pj
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
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    xs = (x / 0.9).astype(jnp.float32)
    b, h, g = (256, 512, 2) if n < 16384 else (256, 1024, 4)
    fwd = jax.jit(lambda xs, y: pm.mll_fused_g(
        xs, y, 1.3, 0.1, block=b, half=h, group=g, return_l='panels'))
    lp, quad, ld = fwd(xs, y)
    lp = lp.block_until_ready()
    return xs, y, lp

  def joint_fn(cfg):
    tir, tig, tic, syr, syg, syc = cfg
    return jax.jit(lambda lp, xs, y: pj.mll_bwd_joint(
        lp, xs, y, jnp.float32(1.3), None, block=256,
        ti_chunk=tic, ti_rows=tir, ti_group=tig, ti_layout='blocks',
        sy_chunk=syc, sy_rows=syr, sy_group=syg,
        panel_input=True, diag_transposed=True)[0])

  def twokernel_fn(n):
    r, gg, c = (4, 2, 512) if n < 16384 else (4, 2, 1024)
    sr, sg, sc = (4, 4, 256) if n < 16384 else (2, 4, 512)

    def run(lp, xs, y):
      tpm = pallas_triinv.tri_inv_panels(
          lp, chunk=c, group=gg, rows=r, panel_input=True,
          diag_transposed=True, panel_layout='blocks')
      alpha = pallas_triinv.alpha_from_panels(tpm, y)
      return pb.mll_bwd_fused(tpm, xs, alpha, jnp.float32(1.3),
                              block=256, chunk=sc, kfam='se',
                              rows=sr, group=sg)[0]
    return jax.jit(run)

  # ---------- A. standalone joint vs two-kernel pipeline ----------
  for n in (8192, 16384):
    xs, y, lp = inputs(n)
    default_cfg = ((4, 2, 512, 4, 4, 256) if n < 16384
                   else (4, 2, 1024, 2, 4, 512))
    two = twokernel_fn(n)
    timeit(f'bwd-two-kernel n={n}', two, lp, xs, y)
    jf = joint_fn(default_cfg)
    timeit(f'bwd-joint n={n} default', jf, lp, xs, y)
    try:
      va = float(jnp.sum(two(lp, xs, y)))
      vb = float(jnp.sum(jf(lp, xs, y)))
      rel = abs(va - vb) / max(abs(va), 1e-9)
      log(f'value parity n={n}: two {va:.6g} joint {vb:.6g} rel {rel:.2e}')
      results[f'joint_value_rel_n{n}'] = rel
    except Exception as e:  # noqa: BLE001
      _abort_if_terminal_down(e, f'value parity n={n}')

    # ---------- C. joint tile mini-ladder ----------
    for cfg in (JOINT_TILES_8K if n < 16384 else JOINT_TILES_16K):
      if cfg == default_cfg:
        continue
      tag = 'x'.join(map(str, cfg))
      timeit(f'bwd-joint n={n} {tag}', joint_fn(cfg), lp, xs, y)

  # ---------- B. full value_and_grad via the library route ----------
  def make_vg(n, k):
    b, h, g = (256, 512, 2) if n < 16384 else (256, 1024, 4)
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
    for joint, tag in (('1', 'joint'), ('0', 'control')):
      env = {'HYPERBO_BWD_JOINT': joint}
      fn, xs, y = with_env(env, lambda n=n, k=k: make_vg(n, k))
      with_env(env, lambda fn=fn, xs=xs, y=y, n=n, k=k, tag=tag:
               timeit(f'VG n={n} [{tag}]', fn, xs, y, k=k))

  # ---------- D. n=32768 joint VG (caps lifted in-process) ----------
  pb.MAX_N = 32768
  try:
    n, k = 32768, 2
    env = {'HYPERBO_BWD_JOINT': '1'}
    fn, xs, y = with_env(env, lambda: make_vg(n, k))
    with_env(env, lambda: timeit(f'VG n={n} [joint]', fn, xs, y, k=k))
    # standalone joint backward at 32768 for the component record
    xs2, y2, lp2 = inputs(n)
    timeit(f'bwd-joint n={n} default',
           joint_fn((4, 2, 1024, 2, 4, 512)), lp2, xs2, y2)
  finally:
    pb.MAX_N = 16384

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
