"""Parameter warping functions and warped retrieval.

Mirrors the reference semantics (hyperbo/gp_utils/utils.py:28-81 and
hyperbo/basics/params_utils.py:90-111): raw, unconstrained model parameters
are mapped through per-key warp functions (softplus + eps for positives)
at every use site, so optimizers work in an unconstrained space.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

EPS = 1e-10

identity_warp = lambda x: x
softplus_warp = jax.nn.softplus


def squareplus_warp(x):
  """Smooth positive warp: 0.5 * (x + sqrt(x^2 + 4)).

  Cheaper than softplus on the VPU (no transcendental) with similar shape.
  """
  return 0.5 * (x + jnp.sqrt(x**2 + 4))


DEFAULT_SOFTPLUS = lambda x: softplus_warp(x) + EPS

# Same warped keys as the reference DEFAULT_WARP_FUNC.
DEFAULT_WARP_FUNC: Dict[str, Callable[[Any], Any]] = {
    'constant': identity_warp,
    'lengthscale': DEFAULT_SOFTPLUS,
    'signal_variance': DEFAULT_SOFTPLUS,
    'noise_variance': DEFAULT_SOFTPLUS,
    'dot_prod_sigma': DEFAULT_SOFTPLUS,
}


def _verify_params(model_params: Dict[str, Any], expected_keys: List[str]):
  """Verify that dictionary params has the expected keys."""
  if not set(expected_keys).issubset(set(model_params.keys())):
    raise ValueError(f'Expected parameters are {sorted(expected_keys)}, '
                     f'but received {sorted(model_params.keys())}.')


def retrieve_params(
    params,
    keys: List[str],
    warp_func: Optional[Dict[str, Callable[[Any], Any]]] = None) -> List[Any]:
  """Returns a list of parameter values (warped if specified) in keys' order.

  `params` may be a GPParams (uses .model) or a raw model dict.
  """
  model_params = params if isinstance(params, dict) else params.model
  _verify_params(model_params, keys)
  if warp_func:
    return [
        warp_func[key](model_params[key]) if key in warp_func
        else model_params[key] for key in keys
    ]
  return [model_params[key] for key in keys]
