"""Quasi-Newton optimizer contract tests (train/optimizers.py).

Pins the line-search return contracts (non-descent directions, the
max-steps fallback's value/alpha pairing) and that L-BFGS never keeps a
curvature-violating (s, y) pair in its warm-start state.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hyperbo_tpu.train import optimizers


def _quad_vg(fn):
  return jax.value_and_grad(fn)


def test_backtracking_non_descent_returns_start():
  """Non-descent direction: (starting value, alpha=0), never the params
  pytree or a full-length ascent step."""
  fn = lambda p: jnp.sum(p['x'] ** 2)
  params = {'x': jnp.array([1.0, -2.0])}
  val, grads = _quad_vg(fn)(params)
  ascent = jax.tree.map(lambda g: g, grads)  # +gradient: ascent
  new_val, alpha = optimizers.backtracking_linesearch(
      _quad_vg(fn), val, params, grads, ascent, alpha=1.0)
  assert alpha == 0.
  np.testing.assert_allclose(float(new_val), float(val))


def test_backtracking_max_steps_value_matches_alpha():
  """Max-steps fallback: the returned value must be f at
  params + alpha * direction for the RETURNED alpha (not an alpha that
  was expanded/shrunk after the last evaluation)."""
  fn = lambda p: jnp.sum(p['x'] ** 2)
  params = {'x': jnp.array([-1.0])}
  val, grads = _quad_vg(fn)(params)
  descent = jax.tree.map(lambda g: -g, grads)
  # c2 ~ 1 makes the curvature test nearly unsatisfiable: Armijo holds
  # and alpha keeps expanding until max_steps runs out.
  new_val, alpha = optimizers.backtracking_linesearch(
      _quad_vg(fn), val, params, grads, descent, alpha=1e-3,
      c2=1.0 - 1e-12, max_steps=4)
  stepped = jax.tree.map(lambda a, b: a + alpha * b, params, descent)
  np.testing.assert_allclose(float(new_val), float(fn(stepped)),
                             rtol=1e-6)


def test_line_search_max_steps_value_matches_alpha():
  """Same pairing contract for the flat-vector _line_search."""
  fn = lambda v: jnp.sum(v ** 2)
  vg = jax.value_and_grad(fn)
  x = jnp.array([-1.0])
  f0, g = vg(x)
  d = -g
  f_new, g_new, alpha = optimizers._line_search(
      vg, f0, x, g, d, 1e-3, c2=1.0 - 1e-12, max_steps=4)
  assert f_new is not None
  np.testing.assert_allclose(float(f_new), float(fn(x + alpha * d)),
                             rtol=1e-6)
  np.testing.assert_allclose(np.asarray(g_new),
                             np.asarray(jax.grad(fn)(x + alpha * d)),
                             rtol=1e-6)


def test_lbfgs_curvature_violation_not_in_state():
  """A run that terminates on the curvature condition must not return
  the violating (s, y) pair in its warm-start state: resuming would
  feed rho = 1/(y.s) (huge or negative) into the two-loop recursion."""
  # Concave objective: every (s, y) pair has y.s < 0.
  fn = lambda p: -jnp.sum(p['x'] ** 2)
  val, out, state = optimizers.lbfgs(fn, {'x': jnp.array([1.0])},
                                     steps=5)
  if state is not None:
    s_hist, y_hist, _, _ = state
    for s, y in zip(s_hist, y_hist):
      assert float(jnp.vdot(y, s)) >= 1e-6, 'violating pair kept'
    # Resume from the returned state: must not crash or emit NaN.
    val2, out2, _ = optimizers.lbfgs(fn, out, steps=2, state=state)
    for leaf in jax.tree.leaves(out2):
      assert np.all(np.isfinite(np.asarray(leaf)))


def test_lbfgs_minimizes_quadratic():
  """Sanity: convex quadratic converges to the optimum with a clean
  warm-start state (all kept pairs satisfy curvature)."""
  target = jnp.array([1.5, -0.5, 2.0])
  fn = lambda p: jnp.sum((p['x'] - target) ** 2)
  val, out, state = optimizers.lbfgs(fn, {'x': jnp.zeros(3)},
                                     steps=50)
  np.testing.assert_allclose(np.asarray(out['x']), np.asarray(target),
                             atol=1e-3)
  if state is not None:
    s_hist, y_hist, _, _ = state
    for s, y in zip(s_hist, y_hist):
      assert float(jnp.vdot(y, s)) > 0
