"""Round-5 retune: recover the fused-MLL regression on the 2026-08-18
toolchain.

Facts from the r5 session (first healthy tunnel since round 3):
  * ALL fused configs compile now (library-side vmem_limit_bytes=64MiB),
    but everything is ~1.5x slower than round 3: octv default
    7.91 ms (was 5.25), nosweep floor 7.11, fwd zero-skip 8.45.
  * The backward's XLA n-RHS triangular solve regressed 5.4 -> 37.7 ms
    and dominates the fused VG (52.7 ms, of which fwd 8.5 + fused-bwd
    kernel 10.1 — ~34 ms is the trisolve glue).
  * Dense VG 141 ms, X3-GEMM VG 63 ms — XLA GEMM paths barely moved,
    so the regression is Mosaic codegen + lax trisolve, not the MXU.

Hypotheses probed here:
  A. the 64 MiB scoped-vmem grant itself changes Mosaic scheduling
     (slower double-buffering decisions) — A/B the grant at
     17408 KiB (just over the 16.12M stack) vs 64 MiB vs toolchain
     default (0).
  B. tri_inv_blocked (recursive GEMM inverse, HYPERBO_BWD_TRIINV=1)
     beats the regressed lax trisolve INSIDE the full VG now (round 3
     it ballooned the graph 67 -> 111 ms; toolchain changed).

Run (background, never timeout-killed):
  nohup python benchmarks/r5_retune_probe.py > /tmp/r5retune.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

T0 = time.time()
BUDGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 100000.0


def log(*a):
  print(f'[{time.time() - T0:7.1f}s]', *a, file=sys.stderr, flush=True)

from benchmarks._transport import make_abort

_abort_if_terminal_down = make_abort(log)


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel as kern, mean
  from hyperbo_tpu.models import objectives as obj
  from hyperbo_tpu.ops import pallas_mll as pm

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  n, d, k_iters = 8192, 8, 8
  x = jax.random.uniform(jax.random.PRNGKey(5), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(6), (n, 1), jnp.float32)
  dataset = {'t': defs.SubDataset(x, y)}
  model0 = {'lengthscale': jnp.ones(d) * 0.5, 'signal_variance': 0.0,
            'noise_variance': -2.0}

  def timed(tag, fn, *a, k=k_iters):
    if time.time() - T0 > BUDGET_S:
      log('budget exhausted before', tag)
      return None
    log(f'--- compiling {tag} ...')
    try:
      val = float(fn(*a))
    except Exception as e:  # noqa: BLE001
      msg = str(e)
      key = ('OOM: ' + msg[msg.find('Scoped allocation'):][:120]
             if 'Scoped allocation' in msg else msg[:300])
      log(f'{tag}: FAILED: {type(e).__name__}: {key}')
      _abort_if_terminal_down(e, tag)
      return None
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      float(fn(*a))
      times.append(time.perf_counter() - t0)
    ms = min(times) / k * 1e3
    log(f'{tag}: {ms:.2f} ms/iter (value {val:.4f})')
    return ms

  def fresh(**env):
    for kk in ('HYPERBO_BWD_KINV', 'HYPERBO_BWD_PREC',
               'HYPERBO_BWD_TRIINV', 'HYPERBO_BWD_FUSED',
               'HYPERBO_VMEM_LIMIT_KIB'):
      os.environ.pop(kk, None)
    os.environ.update(env)
    pm._se_nll_core_fn.cache_clear()
    pm._se_nll_core_masked_fn.cache_clear()

  # --- 0. measured X3 matmul peak (fraction denominator) ---
  hi = jax.lax.Precision.HIGH
  a8 = (jax.random.normal(jax.random.PRNGKey(7), (n, n), jnp.float32)
        / jnp.sqrt(jnp.float32(n)))

  @jax.jit
  def x3_chain(a):
    def body(z, _):
      return jnp.matmul(z, a, precision=hi), ()
    z, _ = lax.scan(body, a, None, length=k_iters)
    return jnp.sum(z[0])

  ms = timed('X3 matmul chain', x3_chain, a8)
  if ms:
    log(f'    => measured X3 peak {2.0 * n**3 / (ms / 1e3) / 1e12:.1f} '
        f'TFLOP/s')

  # --- harness: full-objective VG (same as r4_bwd_probe) ---
  def make_loss():
    def loss(m):
      p = defs.GPParams(model=m, config={'fused_mll': True})
      return obj.neg_log_marginal_likelihood(
          mean.zero, kern.squared_exponential, p, dataset,
          warp_func=DEFAULT_WARP_FUNC)
    return loss

  def make_vg():
    loss = make_loss()

    @jax.jit
    def vg_k(m):
      def one(c, bump):
        mm = dict(m)
        mm['noise_variance'] = mm['noise_variance'] + bump
        l, g = jax.value_and_grad(loss)(mm)
        return c + l + g['signal_variance'] + jnp.sum(g['lengthscale']), ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-4, k_iters))
      return tot
    return vg_k

  fresh()
  gref = jax.jit(jax.grad(make_loss()))(model0)
  gref = {k: jnp.asarray(v) for k, v in gref.items()}
  log('ref grad ls[0]', float(gref['lengthscale'][0]),
      'sv', float(gref['signal_variance']))

  def grad_delta(tag):
    try:
      g = jax.jit(jax.grad(make_loss()))(model0)
    except Exception as e:  # noqa: BLE001
      log(f'{tag} grad: FAILED {type(e).__name__}: {str(e)[:200]}')
      _abort_if_terminal_down(e, tag)
      return
    rel = max(
        float(jnp.max(jnp.abs(g['lengthscale'] - gref['lengthscale']))
              / (jnp.max(jnp.abs(gref['lengthscale'])) + 1e-30)),
        abs(float(g['signal_variance'] - gref['signal_variance']))
        / (abs(float(gref['signal_variance'])) + 1e-30))
    log(f'{tag}: max rel grad delta vs baseline = {rel:.2e}')

  # --- B. blocked triangular inverse inside the full VG ---
  fresh(HYPERBO_BWD_FUSED='1', HYPERBO_BWD_TRIINV='1')
  if timed('VG fused-bwd + blocked tri-inv', make_vg(), model0):
    grad_delta('VG fused-bwd + blocked tri-inv')

  fresh(HYPERBO_BWD_FUSED='1', HYPERBO_BWD_TRIINV='1',
        HYPERBO_BWD_PREC='default')
  timed('VG fused-bwd + blocked tri-inv + default-prec', make_vg(),
        model0)

  fresh(HYPERBO_BWD_KINV='syrk', HYPERBO_BWD_TRIINV='1')
  if timed('VG syrk + blocked tri-inv (no fused kernel)', make_vg(),
           model0):
    grad_delta('VG syrk + blocked tri-inv')

  # --- isolated blocked tri-inv rate (both block sizes) ---
  from hyperbo_tpu.ops import linalg as linalg_mod
  from hyperbo_tpu.core.warp import retrieve_params
  p0 = defs.GPParams(model=model0, config={})
  ls_w, sv_w, nv_w = retrieve_params(
      p0, ['lengthscale', 'signal_variance', 'noise_variance'],
      warp_func=DEFAULT_WARP_FUNC)
  xs = (x / ls_w).astype(jnp.float32)
  da = jnp.asarray(nv_w + 1e-6, jnp.float32)
  svj = jnp.squeeze(jnp.asarray(sv_w, jnp.float32))

  @jax.jit
  def dense_l(xs):
    sqn = jnp.sum(xs * xs, axis=1, keepdims=True)
    r2 = jnp.maximum(sqn + sqn.T - 2.0 * jnp.matmul(
        xs, xs.T, precision=hi), 0.0)
    kmat = svj * jnp.exp(-0.5 * r2) + da * jnp.eye(n)
    return jnp.linalg.cholesky(kmat)

  l = dense_l(xs).block_until_ready()

  def chain(body):
    @jax.jit
    def k_fn(l):
      def one(c, bump):
        return c + body(l + bump), ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-9, k_iters))
      return tot
    return k_fn

  timed('tri_inv_blocked b=512 isolated', chain(
      lambda l: jnp.sum(linalg_mod.tri_inv_blocked(l, block=512))), l)
  timed('tri_inv_blocked b=256 isolated', chain(
      lambda l: jnp.sum(linalg_mod.tri_inv_blocked(l, block=256))), l)

  # --- A. scoped-vmem grant size vs Mosaic scheduling (forward) ---
  def make_fwd(return_l):
    @jax.jit
    def fwd_k(xs, y):
      def one(c, bump):
        if return_l:
          lk, quad, ld = pm.mll_fused_g(xs, y, svj, da + bump,
                                        return_l=True)
          return c + 0.5 * quad + ld + lk[0, 0], ()
        quad, ld = pm.mll_fused_g(xs, y, svj, da + bump)
        return c + 0.5 * quad + ld, ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-6, k_iters))
      return tot
    return fwd_k

  for kib, tag in (('17408', '17M grant'), ('', '64M grant (default)'),
                   ('0', 'toolchain default grant')):
    fresh(**({'HYPERBO_VMEM_LIMIT_KIB': kib} if kib else {}))
    timed(f'fwd zero-skip [{tag}]', make_fwd(False), xs, y)
  fresh(HYPERBO_VMEM_LIMIT_KIB='17408')
  timed('fwd return_l [17M grant]', make_fwd(True), xs, y)
  fresh()
  log('DONE')


if __name__ == '__main__':
  main()
