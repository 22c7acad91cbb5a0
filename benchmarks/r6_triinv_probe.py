"""Round-6: batched recursive-doubling triangular inverse on hardware.

ops/linalg.tri_inv_blocked was rewritten bottom-up: ONE batched
triangular solve for all n/block diagonal blocks + log2(n/block)
levels of batched GEMMs, replacing the top-down recursion whose
sequential base-case solves and small GEMMs measured 14.7 ms isolated
at n=8192 (r5_retune_probe) against a ~3 ms GEMM roofline. This probe
measures (a) the isolated inverse and (b) the full fused value_and_grad
step that consumes it (r5b default: fused bwd kernel + blocked
tri-inv, 32.35 ms/step baseline).

Run: nohup python benchmarks/r6_triinv_probe.py > /tmp/r6triinv.log 2>&1 &
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
  from hyperbo_tpu.ops import linalg as linalg_mod

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  n, k_iters = 8192, 8
  key = jax.random.PRNGKey(0)
  a = jax.random.normal(key, (n, n), jnp.float32)
  lmat = (jnp.tril(a * 0.01) + 3.0 * jnp.eye(n)).block_until_ready()

  def timeit(tag, fn, *args, k=k_iters):
    log(f'--- {tag} ...')
    try:
      val = float(fn(*args))
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED: {type(e).__name__}: {str(e)[:240]}')
      _abort_if_terminal_down(e, tag)
      return None
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      float(fn(*args))
      times.append(time.perf_counter() - t0)
    ms = min(times) / k * 1e3
    log(f'{tag}: OK {ms:.2f} ms/iter (value {val:.4f})')
    return ms

  def make_inv(impl):
    @jax.jit
    def inv_k(lmat):
      def one(c, bump):
        li = impl(lmat + bump * jnp.eye(n))
        return c + li[0, 0] + li[-1, 0], ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-6, k_iters))
      return tot
    return inv_k

  timeit('tri-inv doubling (new, b=512)',
         make_inv(lambda l: linalg_mod._tri_inv_doubling(l, 512)), lmat)
  timeit('tri-inv doubling (new, b=256)',
         make_inv(lambda l: linalg_mod._tri_inv_doubling(l, 256)), lmat)
  timeit('tri-inv doubling (new, b=1024)',
         make_inv(lambda l: linalg_mod._tri_inv_doubling(l, 1024)), lmat)
  timeit('tri-inv XLA n-RHS solve (ref)',
         make_inv(lambda l: jax.lax.linalg.triangular_solve(
             l, jnp.eye(n, dtype=l.dtype), left_side=True, lower=True)),
         lmat)

  # Full value_and_grad step through the fused path (TPU defaults:
  # fused bwd kernel + blocked tri-inv, which now routes to doubling).
  from hyperbo_tpu.ops import pallas_mll as pm
  d = 8
  x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
  xs = (x / 0.9).block_until_ready()

  core = pm._se_nll_core_fn(256, 512, 2, False, 32, 'se', 'octv',
                            False, pm._bwd_env_config())

  @jax.jit
  def vg_k(xs, y):
    def one(c, bump):
      val, grads = jax.value_and_grad(
          lambda xv: core(xv, y, 1.3, 0.1 + bump))(xs)
      return c + val + jnp.sum(grads[0, :]), ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-6, 4))
    return tot

  timeit('full VG step (fused bwd + doubling tri-inv)', vg_k, xs, y, k=4)


if __name__ == '__main__':
  try:
    main()
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid tunnel wedge): {type(e).__name__}: '
        f'{str(e)[:400]}')
  log('probe done')
