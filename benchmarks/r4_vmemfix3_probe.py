"""Round-4 toolchain-drift bisect #2: shrink the Mosaic stack frame.

Facts from r4_vmemfix_probe / r4_bwd_probe (2026-08-17 toolchain):
  * return_l=True standalone: scoped-vmem OOM "16.12M vs 16.00M limit,
    over by 128K" — and the number is IDENTICAL before/after shaving
    416K of scratch_shapes, so the "stack" is Mosaic's own temporaries,
    not declared scratch.
  * return_l=False (zero-pass skipped): opaque compile-helper crash
    (subprocess exit code 1) for every config tried.
  * The SAME kernel inside the full value_and_grad program compiles and
    runs correctly.

This probe stays in the readable OOM class (return_l=True, consuming
l[0,0]) and bisects what actually lowers the stack; then compile-tests
the new fused backward kernel (ops/pallas_mll_bwd).

Run: nohup python benchmarks/r4_vmemfix3_probe.py > /tmp/r4vmem3.log 2>&1 &
"""

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


def main():
  import jax
  import jax.numpy as jnp
  from jax import lax
  from hyperbo_tpu.ops import pallas_mll as pm

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  n, d, k_iters = 8192, 8, 16
  x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
  xs = (x / 0.9).block_until_ready()

  def make(**kw):
    @jax.jit
    def mll_k(xs, y):
      def one(c, bump):
        l, quad, ld = pm.mll_fused_g(xs, y, 1.3, 0.1 + bump,
                                     return_l=True, **kw)
        return c + 0.5 * quad + ld + l[0, 0], ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, k_iters))
      return tot
    return mll_k

  def attempt(tag, fn, k=k_iters, copts=None):
    log(f'--- {tag} ...')
    try:
      if copts is not None:
        compiled = fn.lower(xs, y).compile(compiler_options=copts)
        val = float(compiled(xs, y))
        runner = compiled
      else:
        val = float(fn(xs, y))
        runner = fn
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
      float(runner(xs, y))
      times.append(time.perf_counter() - t0)
    ms = min(times) / k * 1e3
    log(f'{tag}: OK {ms:.2f} ms/iter (value {val:.4f})')
    return ms

  attempt('L: unroll=16', make(sweep_unroll=16))
  attempt('L: quadv', make(pivot_mode='quadv'))
  attempt('L: pairv', make(pivot_mode='pairv'))
  attempt('L: mb=16 octv', make(mb=16))
  attempt('L: nosweep (stack floor probe)', make(mode='nosweep'))
  attempt('L: half=1024 group=1', make(half=1024, group=1))

  # --- the new fused backward kernel: compile + rate check ---
  from hyperbo_tpu.ops import pallas_mll_bwd
  block = 256
  nb = n // block
  lt = jnp.tril(jax.random.normal(jax.random.PRNGKey(3), (n, n),
                                  jnp.float32) * 0.01
                ) + 3.0 * jnp.eye(n)
  tpm = jnp.moveaxis(lt.reshape(n, nb, block), 1, 0).block_until_ready()
  alpha = jax.random.normal(jax.random.PRNGKey(4), (n, 1), jnp.float32)

  def make_bwd(chunk):
    @jax.jit
    def bwd_k(tpm, xs, alpha):
      def one(c, bump):
        d_x, dsv, dda = pallas_mll_bwd.mll_bwd_fused(
            tpm, xs, alpha + bump, 1.3, block=block, chunk=chunk)
        return c + jnp.sum(d_x) + dsv + dda, ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-9, 8))
      return tot
    return bwd_k

  for chunk in (512, 1024):
    tag = f'BWD kernel chunk={chunk}'
    log(f'--- {tag} ...')
    try:
      fn = make_bwd(chunk)
      val = float(fn(tpm, xs, alpha))
      times = []
      for _ in range(3):
        t0 = time.perf_counter()
        float(fn(tpm, xs, alpha))
        times.append(time.perf_counter() - t0)
      log(f'{tag}: OK {min(times)/8*1e3:.2f} ms/iter (value {val:.4f})')
    except Exception as e:  # noqa: BLE001
      msg = str(e)
      key = ('OOM: ' + msg[msg.find('Scoped allocation'):][:120]
             if 'Scoped allocation' in msg else msg[:300])
      log(f'{tag}: FAILED: {type(e).__name__}: {key}')
  log('DONE')


if __name__ == '__main__':
  main()
