"""Device-mesh construction for the sharded bootstrap pipeline.

The reference has zero parallelism (SURVEY.md section 2.4); this is the
first-class replacement: a ('dp', 'tp') mesh where

  * dp  -- data parallel over the ciphertext/gate batch (independent gate
           bootstraps; the 1:N template database also shards here),
  * tp  -- tensor parallel over the keyswitch-table / external-product
           output columns (the wide int8 matmuls), reduced with collectives.

On a pod slice, dp maps across hosts (DCN) and tp within a slice (ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp is None:
        n_dp = n // n_tp
    assert n_dp * n_tp <= n, f"need {n_dp}x{n_tp} devices, have {n}"
    arr = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_spec() -> P:
    """Sharding for a batched LWE pytree: batch over dp, replicated otherwise."""
    return P("dp")


def replicated() -> P:
    return P()
