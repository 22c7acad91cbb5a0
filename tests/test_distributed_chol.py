"""Distributed (shard_map) blocked Cholesky tests on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.parallel import distributed_chol
from hyperbo_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices')


@pytest.mark.parametrize('n,block', [(512, 64), (300, 64), (256, 32)])
def test_distributed_cholesky_matches_dense(n, block):
  key = jax.random.PRNGKey(n)
  a = jax.random.normal(key, (n, n))
  a = a @ a.T / n + jnp.eye(n)
  mesh = mesh_lib.create_mesh(8)
  got = distributed_chol.distributed_cholesky(a, mesh, block=block)
  want = jnp.linalg.cholesky(a)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_distributed_cholesky_4dev():
  key = jax.random.PRNGKey(1)
  n = 384
  a = jax.random.normal(key, (n, n))
  a = a @ a.T / n + jnp.eye(n)
  mesh = mesh_lib.create_mesh(4)
  got = distributed_chol.distributed_cholesky(a, mesh, block=64)
  want = jnp.linalg.cholesky(a)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
