"""Forward-export validation at n = 32768 + bench-parity red-flip.

Leg 1 (red-flip, n=8192): round-4 verdict item 6 acceptance — "a
deliberately broken kernel env flag flips it red". HYPERBO_BWD_JOINT=1
enables the joint backward megakernel, hardware-refuted in r13 (wrong
d_x despite clean interpret parity) and guard-tested opt-in — exactly
the bug class bench.py's gradient-parity leg exists to catch. With it
on, fused-vs-XLA d_x parity must blow past the 5e-3 bench threshold.

Leg 2 (forward export, n=32768): every n=32768 gradient comparison so
far (r14, r15, r17) consumed the SAME fused-forward L export — a 4 GiB
tensor written through exactly the >= 2^31-byte offset class that broke
the backward SYRK kernel (PERF.md r14). If the export wrapped, both
sides of those comparisons would be wrong in common mode. A pure-XLA
dense Cholesky reference at this n crashes the compile helper
("response body closed", first r17b attempt), so the export is checked
against its DEFINING equation instead — no factorization needed:
sampled 512-row corner blocks (chosen to hit the highest byte offsets
of the write) must satisfy (L L^T)[blk] == K[blk] with K built directly
from x. GEMM-only, compiles small, and garbage rows from an int32 wrap
cannot satisfy it.

Run: nohup python benchmarks/r17b_fwd32k_probe.py > /tmp/r17b.log 2>&1 &
Verdict JSON: /tmp/r17b_verdict.json
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

HI = None  # set in main (needs jax imported)


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np
  from hyperbo_tpu.ops import pallas_mll

  hi = jax.lax.Precision.HIGHEST
  out = {}

  def save():
    with open('/tmp/r17b_verdict.json', 'w') as f:
      json.dump(out, f, indent=1, default=str)

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  # --- leg 1: red-flip validation of the bench gradient-parity leg ---
  try:
    n8, d8 = 8192, 4
    k8 = jax.random.PRNGKey(4)
    x8 = jax.random.uniform(k8, (n8, d8), jnp.float32) * 2.0
    dl8 = jnp.sin(3.0 * x8 @ jax.random.normal(
        jax.random.fold_in(k8, 1), (d8, 1)))
    core = pallas_mll._se_nll_core_fn(
        256, 512, 2, False, 32, 'se', 'octv', False,
        pallas_mll._bwd_env_config())

    def gx(xv):
      return core(xv, dl8, jnp.float32(1.2), jnp.float32(0.3))

    g_ok = np.asarray(jax.jit(jax.grad(gx))(x8))
    os.environ['HYPERBO_BWD_JOINT'] = '1'
    g_broken = np.asarray(jax.jit(jax.grad(gx))(x8))
    os.environ['HYPERBO_BWD_JOINT'] = '0'
    rel = float(np.max(np.abs(g_broken - g_ok))
                / (np.max(np.abs(g_ok)) + 1e-12))
    out['redflip_joint_rel'] = rel
    out['redflip_detected'] = bool(rel > 5e-3)
    log(f'red-flip (HYPERBO_BWD_JOINT=1) d_x rel {rel:.3e} -> '
        f'{"DETECTED (leg works)" if rel > 5e-3 else "NOT DETECTED"}')
  except Exception as e:  # noqa: BLE001
    log(f'red-flip leg FAILED: {type(e).__name__}: {str(e)[:300]}')
    out['redflip_error'] = f'{type(e).__name__}: {str(e)[:300]}'
    _abort_if_terminal_down(e, 'redflip')
  save()

  # --- leg 2: n=32768 L export vs its defining equation --------------
  n, d = 32768, 4
  key = jax.random.PRNGKey(0)
  x = jax.random.uniform(key, (n, d), jnp.float32) * 2.0
  delta = jnp.sin(3.0 * x @ jax.random.normal(
      jax.random.fold_in(key, 1), (d, 1)))
  sv, da = jnp.float32(1.2), jnp.float32(0.3)
  # Corners of the panel-major write where an int32 byte-offset wrap
  # would land (last panel, last row block) + start + middle controls.
  blocks = [(0, 0), (n - 512, 0), (n - 512, n - 1024),
            (n - 512, n - 512), (n // 2, n // 2 - 512)]

  try:
    @jax.jit
    def fused_check(xv, dv):
      l, quad, ld = pallas_mll.mll_fused_g(
          xv, dv, sv, da, block=256, half=512, group=2,
          sweep_unroll=32, return_l=True, kfam='se',
          pivot_mode='octv', interpret=False)
      nll = 0.5 * quad + ld
      rels = []
      for r, c in blocks:
        lr = jax.lax.dynamic_slice(l, (r, 0), (512, n))
        lc = jax.lax.dynamic_slice(l, (c, 0), (512, n))
        prod = jnp.matmul(lr, lc.T, precision=hi)
        xr = jax.lax.dynamic_slice(xv, (r, 0), (512, d))
        xc = jax.lax.dynamic_slice(xv, (c, 0), (512, d))
        sqr = jnp.sum(xr * xr, axis=1, keepdims=True)
        sqc = jnp.sum(xc * xc, axis=1, keepdims=True)
        r2 = jnp.maximum(
            sqr + sqc.T - 2.0 * jnp.matmul(xr, xc.T, precision=hi), 0.0)
        kblk = sv * jnp.exp(-0.5 * r2)
        if r == c:
          kblk = kblk + da * jnp.eye(512, dtype=jnp.float32)
        # The product only covers the lower-triangular overlap; for
        # r >= c every sampled pair is fully in range, so compare the
        # region where the true K block is realized by L L^T: rows of
        # block r vs cols of block c with col-index <= row-index
        # globally. For r > c + 511 the whole block qualifies; for
        # r == c it is the lower triangle (mask the rest).
        if r == c:
          mask = jnp.tril(jnp.ones((512, 512), jnp.float32))
          prod = prod * mask + kblk * (1.0 - mask)
        diff = jnp.max(jnp.abs(prod - kblk))
        scale = jnp.max(jnp.abs(kblk))
        rels.append(diff / (scale + 1e-12))
      return nll, jnp.stack(rels)

    t0 = time.time()
    nll_f, rels = fused_check(x, delta)
    nll_f = float(nll_f)
    rels = [float(v) for v in np.asarray(rels)]
    log(f'fused forward (return_l): nll_core {nll_f:.4f} '
        f'({time.time() - t0:.1f}s incl compile)')
    out['nll_fused'] = nll_f
    for (r, c), rel in zip(blocks, rels):
      log(f'L-export defining-eq block ({r},{c}): max rel {rel:.3e}')
    out['l_block_rels'] = rels
    out['l_export_ok'] = bool(max(rels) < 5e-3)
    log(f'VERDICT: L export defining-equation max rel '
        f'{max(rels):.3e} (ok={out["l_export_ok"]})')
  except Exception as e:  # noqa: BLE001
    log(f'fused forward FAILED: {type(e).__name__}: {str(e)[:300]}')
    out['fused_error'] = f'{type(e).__name__}: {str(e)[:300]}'
    _abort_if_terminal_down(e, 'fused_fwd')
  save()
  log('DONE')


if __name__ == '__main__':
  main()
