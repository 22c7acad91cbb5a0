"""Round-6: batched recursive-doubling triangular inverse on hardware.

HISTORICAL RESULT — the doubling hypothesis was REFUTED on v5e
(2026-08-19, PERF.md): the batched bottom-up inverse (ONE batched
triangular solve for all n/block diagonal blocks + log2(n/block)
levels of batched GEMMs) measured 19.0 ms isolated vs 14.7 ms for the
top-down recursion, and 39.4 vs 32.3 ms for the full value_and_grad —
so the library default REVERTED to the recursion (commit 43fb554) and
the doubling path is opt-in via HYPERBO_TRIINV_DOUBLING=1. This probe
sets that env var itself (before any jit trace) so its legs still
exercise the doubling path on a re-run: (a) the isolated inverse and
(b) the full fused value_and_grad step that consumes it (baseline
32.35 ms/step = fused bwd kernel + recursion tri-inv).

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

  # Full value_and_grad step through the fused path. The library
  # default reverted to the recursion (commit 43fb554), so force the
  # doubling route here to keep the leg label true; tri_inv_blocked
  # reads the env var at trace time and this is the first trace of the
  # core in this process.
  os.environ['HYPERBO_TRIINV_DOUBLING'] = '1'
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

  timeit('full VG step (fused bwd + doubling tri-inv, env-forced)',
         vg_k, xs, y, k=4)


if __name__ == '__main__':
  try:
    main()
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid tunnel wedge): {type(e).__name__}: '
        f'{str(e)[:400]}')
  log('probe done')
