"""TRLWE (ring-LWE over the torus) and TRGSW ciphertexts, batched.

The reference never touches these directly -- they live inside libtfhe
(SURVEY.md E4: TFheGateBootstrapping{SecretKeySet,CloudKeySet} hold the TRGSW
bootstrapping key and keyswitch key).  Here they are first-class batched
tensors:

  TRLWE sample: (..., k+1, N) int32 -- k mask polynomials + body polynomial.
  TRGSW sample: (..., (k+1)*l, k+1, N) int32 -- a gadget-matrix of TRLWE rows.

phase(c) = body - sum_u s_u * a_u  (negacyclic polynomial products).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import torus
from .ops import poly
from .params import TfheParams


def trivial(mu_poly: jax.Array, params: TfheParams) -> jax.Array:
    """Noiseless trivial TRLWE of a message polynomial (..., N) -> (..., k+1, N)."""
    mu_poly = jnp.asarray(mu_poly, jnp.int32)
    zeros = jnp.zeros(mu_poly.shape[:-1] + (params.k, params.N), jnp.int32)
    return jnp.concatenate([zeros, mu_poly[..., None, :]], axis=-2)


def encrypt_zero(key: jax.Array, tlwe_key: jax.Array, params: TfheParams, shape=()) -> jax.Array:
    """TRLWE encryptions of 0: shape -> (*shape, k+1, N)."""
    ka, ke = jax.random.split(key)
    a = torus.uniform_torus32(ka, shape + (params.k, params.N))
    e = torus.gaussian_torus32(ke, params.tlwe_stdev, shape + (params.N,))
    body = poly.key_negacyclic_mul(tlwe_key, a) + e
    return jnp.concatenate([a, body[..., None, :]], axis=-2)


def encrypt(key: jax.Array, tlwe_key: jax.Array, mu_poly: jax.Array, params: TfheParams) -> jax.Array:
    """TRLWE encryption of message polynomial(s) (..., N)."""
    mu_poly = jnp.asarray(mu_poly, jnp.int32)
    z = encrypt_zero(key, tlwe_key, params, shape=mu_poly.shape[:-1])
    return z.at[..., -1, :].add(mu_poly)


def phase(ct: jax.Array, tlwe_key: jax.Array) -> jax.Array:
    """(..., k+1, N) -> (..., N): body - sum_u s_u * a_u."""
    a, body = ct[..., :-1, :], ct[..., -1, :]
    return body - poly.key_negacyclic_mul(tlwe_key, a)


def sample_extract(ct: jax.Array) -> "tuple[jax.Array, jax.Array]":
    """Extract the constant coefficient as an LWE sample under the extracted key.

    ct: (..., k+1, N) -> (a: (..., k*N) int32, b: (...,) int32)

    The extracted LWE key is the concatenation of the TRLWE key coefficients
    (see keys.extracted_key).  a'[u*N + 0] = a_u[0]; a'[u*N + j] = -a_u[N-j].
    """
    a, body = ct[..., :-1, :], ct[..., -1, :]
    # a_u(X) coefficient pattern for constant-term extraction:
    # [a[0], -a[N-1], -a[N-2], ..., -a[1]]
    flipped = jnp.concatenate([a[..., :1], -a[..., :0:-1]], axis=-1)
    batch = a.shape[:-2]
    return flipped.reshape(batch + (-1,)), body[..., 0]


# ----------------------------------------------------------------------------
# TRGSW
# ----------------------------------------------------------------------------

def trgsw_encrypt(key: jax.Array, tlwe_key: jax.Array, msg: jax.Array, params: TfheParams) -> jax.Array:
    """TRGSW encryption of small integer message(s) (typically a key bit).

    msg: (...,) int -> (..., (k+1)*l, k+1, N) int32.
    Row (u*l + p) is a TRLWE zero-encryption plus msg * 2^(32-(p+1)*bgbit)
    added to component u's constant coefficient (the gadget matrix H).
    """
    msg = jnp.asarray(msg, jnp.int32)
    rows = (params.k + 1) * params.l
    z = encrypt_zero(key, tlwe_key, params, shape=msg.shape + (rows,))
    for u in range(params.k + 1):
        for p in range(params.l):
            h = (msg << (32 - (p + 1) * params.bgbit)).astype(jnp.int32)
            z = z.at[..., u * params.l + p, u, 0].add(h)
    return z


def external_product_reference(digits_fn, trlwe: jax.Array, trgsw: jax.Array, params: TfheParams) -> jax.Array:
    """Oracle external product: decomp(trlwe) . trgsw, unbatched logic.

    trlwe: (..., k+1, N); trgsw: ((k+1)*l, k+1, N).
    digits_fn: decompose function (from ops.decompose, partial over params).
    """
    d = digits_fn(trlwe)  # (..., k+1, N, l) int8
    d = jnp.moveaxis(d, -1, -2)  # (..., k+1, l, N)
    batch = d.shape[:-3]
    d = d.reshape(batch + ((params.k + 1) * params.l, params.N))
    flat = poly.negacyclic_extproduct_reference(
        d.reshape((-1,) + d.shape[-2:]),
        trgsw.reshape((params.k + 1) * params.l, params.k + 1, params.N),
    )
    return flat.reshape(batch + (params.k + 1, params.N))
