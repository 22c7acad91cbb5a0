"""Tracing, timing, and roofline accounting utilities.

The reference has no profiling subsystem (SURVEY.md section 5: wall-clock
prints only). This module provides the TPU-native equivalents:

  * `trace(logdir)`: context manager around jax.profiler.trace — captures
    a Perfetto/XPlane trace viewable in TensorBoard or ui.perfetto.dev.
  * `annotate`: named TraceAnnotation scope for custom region labels.
  * `timed`: wall-clock timing that forces completion with a scalar host
    readback (block_until_ready can return early through remote TPU
    tunnels).
  * FLOP estimators for the GP hot paths so measured rates convert to
    roofline fractions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
  """Capture a profiler trace of the enclosed block into logdir."""
  jax.profiler.start_trace(logdir,
                           create_perfetto_link=create_perfetto_link)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def annotate(name: str):
  """Named trace region (shows up in the profiler timeline)."""
  return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable[..., Any], *args,
          iters: int = 3) -> Tuple[float, Any]:
  """Median wall time of fn(*args), completion forced by host readback.

  fn's output is reduced to a scalar and pulled to the host, which is
  the only reliable completion barrier through remote-tunnel backends.
  """
  def force(out):
    # Accumulate one element per leaf ON DEVICE (async dispatches),
    # then pull ONE scalar: through the axon tunnel every host
    # readback costs a full RTT (~26 ms measured), so per-leaf float()
    # readbacks inflated multi-leaf outputs (a value_and_grad's 6
    # leaves carried ~150 ms of pure RTT — the r18b/r18c finding).
    acc = None
    for leaf in jax.tree.leaves(out):
      if hasattr(leaf, 'ravel'):
        v = jnp.asarray(leaf).ravel()[0]
        acc = v if acc is None else acc + v
    return float(acc) if acc is not None else 0.0

  val = force(fn(*args))  # warmup/compile
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    val = force(fn(*args))
    times.append(time.perf_counter() - t0)
  times.sort()
  return times[len(times) // 2], val


def flops_gram(n1: int, n2: int, d: int) -> float:
  """Matmul FLOPs of an n1 x n2 Gram block over d features."""
  return 2.0 * n1 * n2 * d


def flops_cholesky(n: int) -> float:
  """FLOPs of an n x n Cholesky factorization."""
  return n**3 / 3.0


def flops_triangular_solve(n: int, m: int) -> float:
  """FLOPs of a triangular solve with an n x n factor and m RHS."""
  return float(n) * n * m


def flops_gp_mll(n: int, d: int, m: int = 1) -> float:
  """FLOPs of one marginal-likelihood evaluation (Gram+chol+solves)."""
  return (flops_gram(n, n, d) + flops_cholesky(n) +
          2 * flops_triangular_solve(n, m))


def flops_gp_posterior(n: int, nq: int, d: int) -> float:
  """FLOPs of posterior mean/var at nq query points (cached factor)."""
  return (flops_gram(n, nq, d) + flops_triangular_solve(n, nq) +
          2.0 * n * nq)
