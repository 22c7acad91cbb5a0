"""Round-9: n=131072 beyond-HBM MLL with the 2 GiB-tile clamp.

The 2026-08-18 session crashed the TPU worker at n=131072 with
row_chunk=4096 — a (4096, 131072) f32 Gram tile of exactly 2^31 bytes
(n=65536 at the same chunk = 2^30 ran clean). ops/iterative now clamps
the chunk so every tile stays under 2^31 (_clamp_row_chunk). This
probe validates the diagnosis on hardware:

  1. n=65536 control (expect ~2.6-4.6 s with the rank-128/512
     preconditioner, r7 ladder);
  2. n=131072 with the clamp active (row_chunk auto 4096 -> 2048);
     SUCCESS = the int32-offset diagnosis holds and the beyond-HBM
     story extends 2x; a repeat crash = the fault is elsewhere (HBM
     pressure next suspect: try row_chunk=512 before giving up).

Keep LAST in a session — a worker crash takes the tunnel down.

Run: nohup python benchmarks/r9_iterative_probe.py > /tmp/r9iter.log 2>&1 &
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
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import mean
  from hyperbo_tpu.ops import iterative

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  d = 8
  params = defs.GPParams(model={
      'constant': 0.0, 'lengthscale': jnp.zeros(d),
      'signal_variance': 0.0, 'noise_variance': -2.0})

  def run(n, row_chunk, probes, steps, rank, tag=''):
    kx, ky = jax.random.split(jax.random.PRNGKey(n))
    x = jax.random.uniform(kx, (n, d), jnp.float32)
    y = jnp.sin(3 * x @ jax.random.normal(ky, (d, 1)))
    try:
      t0 = time.perf_counter()
      nll, info = iterative.mll_iterative(
          mean.constant, params, x, y, warp_func=DEFAULT_WARP_FUNC,
          row_chunk=row_chunk, num_probes=probes, lanczos_steps=steps,
          precond_rank=rank, return_info=True)
      val = float(nll)
      t_first = time.perf_counter() - t0
      t0 = time.perf_counter()
      val = float(iterative.mll_iterative(
          mean.constant, params, x, y, warp_func=DEFAULT_WARP_FUNC,
          row_chunk=row_chunk, num_probes=probes, lanczos_steps=steps,
          precond_rank=rank))
      t_cached = time.perf_counter() - t0
      log(f'{tag} n={n} chunk={row_chunk} rank={rank}: nll={val:.2f} '
          f'in {t_cached:.2f}s cached ({t_first:.1f}s first), '
          f'cg_iters={int(info["cg_iters"])}')
    except Exception as e:  # noqa: BLE001
      log(f'{tag} n={n}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)

  run(65536, 4096, 8, 24, 512, tag='[control]')
  run(131072, 4096, 8, 24, 512, tag='[clamped->2048]')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
