"""Round-7: preconditioned CG for the beyond-HBM iterative MLL.

Round-3 verdict weak #4: ops/iterative implements a rank-k pivoted
partial-Cholesky preconditioner (Woodbury apply) but every hardware
number was taken at precond_rank=0 — n=65536 MLL cost 14.9 s at 280 CG
iterations (r4_iterative_probe). GPyTorch-standard practice cuts
iterations ~10x. Target: < 5 s.

Legs (all n=65536 unless noted; each wrapped so a failure can't wedge
the tunnel):
  1. value sanity at n=8192: rank 0 vs rank 128 vs fused-kernel exact;
  2. n=65536 rank 0   — reconfirms the 14.9 s / 280-iter baseline;
  3. n=65536 rank 128 — the GPyTorch-default-class setting;
  4. n=65536 rank 512 — diminishing-returns check.

The n=131072 leg REMAINS GATED: it crashed the TPU worker in round 4
(commit dbb5d0d) and a worker crash wedges the tunnel for hours;
graceful failure is handled library-side instead (dense_size_limit).

Run: nohup python benchmarks/r7_precond_probe.py > /tmp/r7precond.log 2>&1 &
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

VERDICT_PATH = os.environ.get('R7_PRECOND_VERDICT',
                              '/tmp/r7_precond_verdict.json')


def main():
  import jax
  import jax.numpy as jnp
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.ops import iterative

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  results = {}

  def run(n, rank, d=8, row_chunk=2048, probes=16, steps=32):
    tag = f'n={n} rank={rank}'
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    params = defs.GPParams(model={
        'constant': 0.0, 'lengthscale': jnp.ones(d) * 0.5,
        'signal_variance': 0.0, 'noise_variance': -2.0})

    @jax.jit
    def f(x, y):
      nll, info = iterative.mll_iterative(
          mean.zero, params, x, y, warp_func=DEFAULT_WARP_FUNC,
          cov_func=kernel.squared_exponential, row_chunk=row_chunk,
          num_probes=probes, lanczos_steps=steps,
          precond_rank=rank, key=jax.random.PRNGKey(0),
          return_info=True)
      return nll, info['cg_iters'], info['cg_residual']

    try:
      t0 = time.perf_counter()
      nll, it, res = f(x, y)
      nll = float(nll)
      t_first = time.perf_counter() - t0
      t0 = time.perf_counter()
      float(f(x, y)[0])
      t = time.perf_counter() - t0
      log(f'{tag}: nll={nll:.2f} in {t:.2f}s cached '
          f'({t_first:.1f}s first), cg_iters={int(it)}, '
          f'residual={float(res):.2e}')
      results[tag] = {'nll': nll, 's': t, 'cg_iters': int(it)}
      return nll
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)
      results[tag] = None
      return None

  # ---- leg 1: value sanity at n=8192 (precond must not move the
  # fixed point beyond stochastic-logdet noise) ----
  v0 = run(8192, 0)
  v1 = run(8192, 128)
  if v0 is not None and v1 is not None:
    rel = abs(v0 - v1) / max(abs(v0), 1e-9)
    log(f'value shift rank0->rank128 at n=8192: {rel:.2e} rel')
    results['value_rel_8192'] = rel

  # ---- legs 2-4: n=65536 rank ladder ----
  for rank in (0, 128, 512):
    run(65536, rank)

  with open(VERDICT_PATH, 'w') as f:
    json.dump(results, f, indent=1, default=str)
  log(f'DONE; results at {VERDICT_PATH}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
