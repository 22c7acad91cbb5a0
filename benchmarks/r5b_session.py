"""Round-5 follow-up session: the phases the first session didn't reach.

The first r5 session (2026-08-18) ran health/vmemfix/bwd clean, then the
iterative probe's n=131072 leg crashed the TPU worker and the session
aborted before bo_variants and bench. This wrapper runs:

  1. health     — registration + tiny compile
  2. retune     — r5_retune_probe: blocked tri-inv in the VG (the
                  regressed 37.7 ms XLA trisolve is 70% of the fused
                  VG), vmem-grant-size A/B on the forward
  3. bo_variants — r5_bo_probe (production-scale on-device BO legs)
  4. iterative  — r4_iterative_probe re-run (131072 now env-gated OFF;
                  picks up the matrix-free posterior leg that never ran)

bench.py runs standalone AFTER this session so its defaults can absorb
the retune findings first.

Run (background, NEVER timeout-killed):
  nohup python benchmarks/r5b_session.py > /tmp/r5bsession.log 2>&1 &
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

os.environ.setdefault('R5_STATUS', '/tmp/r5b_session_status.json')
os.environ.setdefault('R5_LOCK', '/tmp/r5_session.lock')

from benchmarks import r5_session as base


def main():
  if not base._acquire_lock(os.environ['R5_LOCK']):
    return
  try:
    for name, fn in (
        ('health', base.health),
        ('retune', lambda: base.run_probe('r5_retune_probe.py')),
        ('bo_variants', lambda: base.run_probe('r5_bo_probe.py')),
        ('iterative', lambda: base.run_probe('r4_iterative_probe.py')),
    ):
      if not base.phase(name, fn):
        break
    base.log('SESSION COMPLETE; status at', base.STATUS_PATH)
    base.save_status()
  finally:
    try:
      os.unlink(os.environ['R5_LOCK'])
    except FileNotFoundError:
      pass


if __name__ == '__main__':
  main()
