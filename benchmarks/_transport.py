"""Shared transport-death detection for the hardware probes.

A compile or execute against a dead axon terminal surfaces as one of
the TRANSPORT_DEAD strings, and EVERY further attempt after the first
burns ~50 minutes before the same error resurfaces (PERF.md round-4
canary lesson). Probes therefore exit(2) — treated as session-fatal by
benchmarks/r5_session.phase — on the first such failure instead of
queueing more compile attempts.
"""

import sys

TRANSPORT_DEAD = ('Connection refused', 'Connection Failed',
                  'UNAVAILABLE')


def is_transport_dead(exc) -> bool:
  msg = str(exc)
  return any(t in msg for t in TRANSPORT_DEAD)


def make_abort(log):
  """An ``abort_if_terminal_down(exc, tag)`` bound to a probe's logger."""

  def abort_if_terminal_down(exc, tag):
    if is_transport_dead(exc):
      log(f'TERMINAL DOWN (transport failure at {tag}) — aborting')
      sys.exit(2)

  return abort_if_terminal_down
