"""Profiling utility tests: timing forces completion, FLOP estimators."""

import jax.numpy as jnp
import numpy as np

from hyperbo_tpu.utils import profiling


def test_timed_returns_positive_time():
  f = lambda x: jnp.sum(x @ x)
  t, val = profiling.timed(f, jnp.ones((64, 64)), iters=2)
  assert t > 0
  np.testing.assert_allclose(val, 64.0**3, rtol=1e-6)


def test_flop_estimators():
  assert profiling.flops_cholesky(8192) == 8192**3 / 3
  assert profiling.flops_gram(100, 50, 8) == 2 * 100 * 50 * 8
  n, d = 1024, 8
  total = profiling.flops_gp_mll(n, d)
  assert total == (2 * n * n * d + n**3 / 3 + 2 * n * n)
  assert profiling.flops_gp_posterior(100, 10, 4) > 0


def test_trace_smoke(tmp_path):
  with profiling.trace(str(tmp_path)):
    with profiling.annotate('block'):
      jnp.sum(jnp.ones((8, 8))).block_until_ready()
  import os
  assert os.listdir(str(tmp_path))  # trace files written
