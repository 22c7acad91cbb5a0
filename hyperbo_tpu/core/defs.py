"""Core GP data structures, registered as JAX pytrees.

API-compatible with the reference structures (GPParams / SubDataset / GPCache,
cf. reference hyperbo/basics/definitions.py:23-54), but redesigned for a
TPU-native stack:

  * `SubDataset` is a NamedTuple of device arrays (pytree out of the box).
  * `GPParams` is a mutable dataclass whose `model` dict is the trainable
    pytree; `config` holds static (non-traced) configuration.
  * `GPCache` carries the Cholesky factor and K^{-1}(y - mu) so repeated
    posterior predictions avoid refactorizing; `num_obs` supports
    preallocated-buffer BO loops where the factor is rank-1 updated in place.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple, Union

import jax.numpy as jnp


class SubDataset(NamedTuple):
  """Sub dataset with x: n x d and y: n x m; d, m >= 1.

  `aligned` tags sub-datasets whose y columns are matched-input function
  evaluations (used by the EKL objective); `None` means not aligned.
  """
  x: jnp.ndarray
  y: jnp.ndarray
  aligned: Optional[Union[int, str, bool, Tuple[str, ...]]] = None


@dataclasses.dataclass
class GPCache:
  """Cached intermediate results for GP posterior inference."""
  chol: jnp.ndarray
  kinvy: jnp.ndarray
  needs_update: bool
  # Number of valid observations when chol/kinvy live in preallocated
  # max-size buffers (on-device BO fast path). None => dense, fully valid.
  num_obs: Optional[int] = None


@dataclasses.dataclass
class GPParams:
  """Parameters of a (pre-trained) GP.

  Attributes:
    config: static configuration (method, learning_rate, max_training_step,
      batch_size, objective, mlp_features, retrain, priors, tol, ...).
    model: trainable model parameters (lengthscale, signal_variance,
      noise_variance, constant, mlp_params, linear_mean, ...). This dict is
      the pytree that optimizers differentiate through.
    cache: mapping sub-dataset key -> GPCache.
    samples: list of posterior samples of `model` (filled by slice sampling;
      consumed by HGP).
  """
  config: Dict[str, Any] = dataclasses.field(default_factory=dict)
  model: Dict[str, Any] = dataclasses.field(default_factory=dict)
  cache: Dict[Union[int, str], GPCache] = dataclasses.field(
      default_factory=dict)
  samples: List[Dict[str, Any]] = dataclasses.field(default_factory=list)


# NOTE: GPParams is deliberately NOT registered as a pytree. `config` holds
# strings/callables (not valid traced leaves) and must stay static; jitted
# code closes over config and takes `model` (a plain dict pytree) as the
# traced argument, exactly like the training paths do.

AllowedDatasetTypes = Union[
    List[Union[Tuple[jnp.ndarray, ...], SubDataset]],
    Dict[Union[str, int], Union[Tuple[jnp.ndarray, ...], SubDataset]],
]

WarpFuncType = Optional[Dict[str, Callable[[Any], Any]]]
