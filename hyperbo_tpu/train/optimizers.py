"""Quasi-Newton optimizers for GP hyperparameter fitting.

Functional replacements for the reference's hand-rolled dict-based L-BFGS
(hyperbo/basics/lbfgs.py:51-349) and its jax.scipy BFGS wrapper
(hyperbo/basics/bfgs.py:24-53). Differences by design:

  * L-BFGS works on a single flat vector (ravel_pytree) so the two-loop
    recursion and line-search axpys are fused vector ops instead of
    tree_maps over many small leaves.
  * The BFGS wrapper passes `maxiter` (the reference passes an option name
    jax.scipy ignores — latent bug noted in SURVEY.md section 2 row 5).

Same optimizer contract: lbfgs returns (value, params, state) where state
warm-starts the Hessian estimate on resume.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional, Tuple

import jax
from jax import flatten_util
import jax.numpy as jnp
import jax.scipy.optimize as jspopt
import numpy as np


def _line_search(val_and_grad, f0, x, g, direction, alpha,
                 c1=1e-4, c2=0.9, tau=0.5, max_steps=50):
  """Two-sided backtracking line search (Armijo + Wolfe curvature).

  Expands the step (x2.1) while Armijo holds but curvature fails, shrinks
  (x tau) otherwise. Returns (f_new, g_new, alpha) for the accepted step or
  (None, None, 0.) if no finite progress was found.
  """
  gd = float(jnp.vdot(g, direction))
  if gd > 0.:
    logging.info('Not a descent direction (g.d = %f); skipping line search.',
                 gd)
    return None, None, 0.
  t = c1 * gd
  f_new, g_new = None, None
  last_alpha = 0.
  for i in range(max_steps):
    f_new, g_new = val_and_grad(x + alpha * direction)
    last_alpha = alpha
    f_val = float(f_new)
    if np.isfinite(f_val) and f_val <= float(f0) + alpha * t:
      if float(jnp.vdot(g_new, direction)) >= c2 * gd:
        return f_new, g_new, alpha
      alpha *= 2.1
    else:
      alpha *= tau
  if f_new is not None and np.isfinite(float(f_new)):
    # Max-steps fallback: return the alpha the last (f_new, g_new) was
    # EVALUATED at — alpha itself was already expanded/shrunk for a
    # next iteration that never ran, i.e. a never-evaluated point.
    return f_new, g_new, last_alpha
  return None, None, 0.


def _two_loop(g, s_list, y_list):
  """Nocedal two-loop recursion for the L-BFGS descent direction."""
  q = -g
  alphas = []
  rhos = [1.0 / float(jnp.vdot(y, s)) for s, y in zip(s_list, y_list)]
  for s, y, rho in reversed(list(zip(s_list, y_list, rhos))):
    a = rho * float(jnp.vdot(s, q))
    alphas.append(a)
    q = q - a * y
  alphas.reverse()
  gamma = float(jnp.vdot(s_list[-1], y_list[-1]) /
                jnp.vdot(y_list[-1], y_list[-1]))
  r = gamma * q
  for s, y, rho, a in zip(s_list, y_list, rhos, alphas):
    b = rho * float(jnp.vdot(y, r))
    r = r + (a - b) * s
  return r


def lbfgs(fn: Callable[[Dict[str, Any]], jnp.ndarray],
          params: Dict[str, Any],
          memory: int = 10,
          ls_steps: int = 50,
          steps: int = 100,
          alpha: float = 1.,
          tol: float = 1e-6,
          ls_tau: float = 0.5,
          callback: Optional[Callable[..., Any]] = None,
          state: Optional[Tuple] = None):
  """Minimize fn over a pytree of parameters with L-BFGS.

  Returns:
    (value, params, state): final objective value, optimized pytree, and
    optimizer state (s/y history + last x/g, flat) for warm resume.
  """
  x0, unravel = flatten_util.ravel_pytree(params)
  vg = jax.jit(jax.value_and_grad(lambda v: fn(unravel(v))))

  if state is None:
    s_hist, y_hist = [], []
    f, g = vg(x0)
    if callback is not None:
      callback(step=0, model_params=unravel(x0), loss=f)
    gnorm = float(jnp.vdot(g, g))
    if gnorm <= tol:
      logging.info('L-BFGS converged at start.')
      return f, unravel(x0), None
    # First step: steepest descent with |g|-normalized initial step.
    direction = -g
    f_new, g_new, step_size = _line_search(
        vg, f, x0, g, direction, 1.0 / np.sqrt(gnorm),
        tau=ls_tau, max_steps=ls_steps)
    if f_new is None or float(f_new) >= float(f):
      logging.info('L-BFGS: initial line search made no progress.')
      return f, unravel(x0), (s_hist, y_hist, g, x0)
    x_prev, g_prev = x0, g
    x = x0 + step_size * direction
  else:
    s_hist, y_hist, g_prev, x_prev = state
    x = x0
    f_new = None

  val = f_new
  for i in range(1, steps + 1):
    f, g = vg(x)
    val = f
    gnorm = float(jnp.vdot(g, g))
    if gnorm <= tol:
      logging.info('L-BFGS converged in %d steps.', i)
      break
    s_new = x - x_prev
    y_new = g - g_prev
    curvature = float(jnp.vdot(y_new, s_new))
    logging.info('L-BFGS step %d val: %f', i, float(f))
    if callback is not None:
      callback(step=i, model_params=unravel(x), loss=f)
    if not np.isfinite(curvature) or curvature < tol:
      # Do NOT keep the curvature-violating pair: it would ride the
      # returned warm-start state into _two_loop, where
      # rho = 1/(y.s) is huge/negative and poisons the first resumed
      # direction.
      logging.info('L-BFGS terminating: curvature condition failed.')
      break
    s_hist.append(s_new)
    y_hist.append(y_new)
    if len(s_hist) > memory:
      s_hist = s_hist[-memory:]
      y_hist = y_hist[-memory:]
    x_prev, g_prev = x, g
    direction = _two_loop(g, s_hist, y_hist)
    f_new, g_new, step_size = _line_search(
        vg, f, x, g, direction, alpha, tau=ls_tau, max_steps=ls_steps)
    if f_new is None or float(f_new) >= float(f):
      logging.info('L-BFGS: line search made no progress at step %d.', i)
      break
    x = x + step_size * direction
    val = f_new

  return val, unravel(x), (s_hist, y_hist, g_prev, x_prev)


def bfgs(fun: Callable[[Dict[str, Any]], jnp.ndarray],
         x0: Dict[str, Any],
         tol: float,
         max_training_step: int) -> Tuple[Dict[str, Any], jnp.ndarray]:
  """Full BFGS via jax.scipy.optimize.minimize on the raveled pytree."""
  flat_x0, unravel = flatten_util.ravel_pytree(x0)

  def flat_fun(flat_x):
    return fun(unravel(flat_x))

  results = jspopt.minimize(
      flat_fun, flat_x0, method='bfgs', tol=tol,
      options={'maxiter': max_training_step})
  logging.info('BFGS results: success=%s value=%s',
               results.success, results.fun)
  return unravel(results.x), results.fun


def lbfgs_descent_dir_nocedal(grads, s, y):
  """Two-loop recursion over PYTREES (reference-compatible helper,
  hyperbo/basics/lbfgs.py:142-183). The main lbfgs() above uses the
  flat-vector variant; this form serves callers holding dict histories."""
  g_flat, unravel = flatten_util.ravel_pytree(grads)
  s_flat = [flatten_util.ravel_pytree(si)[0] for si in s]
  y_flat = [flatten_util.ravel_pytree(yi)[0] for yi in y]
  return unravel(_two_loop(g_flat, s_flat, y_flat))


def backtracking_linesearch(val_and_grad_fn, cur_val, params, grads,
                            direction, alpha=1., c1=1e-4, c2=0.9,
                            tau=0.5, max_steps=50, has_aux=False,
                            args=tuple()):
  """Two-sided Armijo+Wolfe backtracking over PYTREES
  (reference-compatible helper, hyperbo/basics/lbfgs.py:51-139).

  Returns (new_val, alpha): the accepted objective value and step size
  (alpha=0 with the starting value when no finite progress was found).
  """
  g_flat, _ = flatten_util.ravel_pytree(grads)
  d_flat, _ = flatten_util.ravel_pytree(direction)
  gd = float(jnp.vdot(g_flat, d_flat))
  if gd > 0.:
    # Contract: (starting value, alpha=0) — a non-descent direction
    # must not hand the caller a full-length ascent step.
    logging.info('Not a descent direction; exiting linesearch.')
    return cur_val, 0.
  t = c1 * gd
  new_val = None
  last_alpha = 0.
  for _ in range(max_steps):
    new_params = jax.tree.map(lambda a, b: a + b * alpha, params,
                              direction)
    new_val, new_grads = val_and_grad_fn(new_params, *args)
    if has_aux:
      new_val = new_val[0]
    last_alpha = alpha
    f_val = float(new_val)
    if np.isfinite(f_val) and f_val <= float(cur_val) + alpha * t:
      ng_flat, _ = flatten_util.ravel_pytree(new_grads)
      if float(jnp.vdot(ng_flat, d_flat)) >= c2 * gd:
        return new_val, alpha
      alpha *= 2.1
    else:
      alpha *= tau
  if new_val is not None and np.isfinite(float(new_val)):
    # Pair the value with the alpha it was evaluated at (see
    # _line_search's max-steps fallback).
    return new_val, last_alpha
  return cur_val, 0.
