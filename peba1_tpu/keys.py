"""Key generation: secret keyset, cloud keyset, and TPU-precomputed key forms.

Replaces the reference's opaque ``new_random_gate_bootstrapping_secret_keyset``
(/root/reference/src/main.cpp:22) with deterministic, PRNG-keyed generation
(SURVEY.md section 4: keyed CSPRNG replaces time(NULL) seeding).  The cloud
keyset carries, in addition to the raw bootstrapping/keyswitch keys, their
TPU-ready precomputed forms:

  * bk_conv: the TRGSW bootstrapping key limb-split to int8 and flipped, ready
    to be the RHS of the int8 MXU convolution in each blind-rotation step.
  * ks_table_limbs: the keyswitch key flattened to a (kN*t, (n+1)*4) int8
    matrix so key switching is a single digit-valued int8 matmul.

The secret-key / cloud-key split is a hard API boundary: server-side ops take
only CloudKey (fixing the reference's smell of the secret key riding through
server-side objects, /root/reference/include/Client.h:13).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import tlwe, torus
from .ops import poly
from .params import TfheParams


@struct.dataclass
class SecretKey:
    lwe_key: jax.Array    # (n,) int32 bits -- the "small" key
    tlwe_key: jax.Array   # (k, N) int32 bits -- the ring key
    params: TfheParams = struct.field(pytree_node=False)

    @property
    def extracted_key(self) -> jax.Array:
        """(k*N,) int32 -- LWE key of sample-extracted ciphertexts."""
        return self.tlwe_key.reshape(-1)


@struct.dataclass
class CloudKey:
    bk: jax.Array              # (n, (k+1)l, k+1, N) int32 -- TRGSW(s_i)
    bk_conv: jax.Array         # (n, C, (k+1)l, N) int8 conv RHS; C=sum(plan)
    bk_tp: jax.Array           # (n, (k+1)l, C, 2N) int8 Toeplitz generator
    # (n, C, (k+1)l, K, span) int8 fine-shift stage (ops/poly.prepare_amat),
    # or None unless ext_backend == "amat" / use_fused_cmux (it is large:
    # ~4.3 GB at peba1_128_fast, ~7.4 GB at peba1_128)
    bk_amat: jax.Array | None
    # (n, G*N, C*N) int8 fully materialized per-step Toeplitz weights
    # (ops/poly.prepare_w_full), or None unless use_pallas_extprod (it is
    # very large: ~10.9 GB on the t2 set -- only viable where k*N and the
    # limb plan keep G*N x C*N x n within HBM).
    bk_w: jax.Array | None
    ks_table_limbs: jax.Array  # (kN*t, (n+1)*4) int8 digit-matmul table
    params: TfheParams = struct.field(pytree_node=False)


def need_amat(p: TfheParams) -> bool:
    """Whether the cloud key must carry the A-matrix form bk_amat."""
    return p.ext_backend == "amat" or p.use_fused_cmux


def need_w(p: TfheParams) -> bool:
    """Whether the cloud key must carry the fully materialized bk_w.

    Single source of truth for keygen AND deserialization (io/serial): the
    streaming/gen kernels assemble W in-graph or in-VMEM, so building the
    multi-GB bk_w for them (10.9 GB at t2, 18.5 GB at fast, ~137 GB at
    RING_2048) would be a dead allocation blind_rotate never reads.
    """
    return ((p.use_pallas_extprod or p.use_fused_step)
            and not p.w_streaming and not p.use_gen_step and not p.use_gen_full)


def active_bk_field(p: TfheParams) -> str:
    """Which CloudKey bootstrapping-key form ops.bootstrap.blind_rotate will
    actually read under `p` (mirrors its branch order exactly)."""
    if p.use_fused_cmux:
        return "bk_amat"
    if p.use_gen_full or p.use_gen_step:
        return "bk_tp"
    if p.use_fused_step:
        return "bk_tp" if p.w_streaming else "bk_w"
    if p.use_pallas_extprod:
        return "bk_w"
    return {"toeplitz": "bk_tp", "conv": "bk_conv", "amat": "bk_amat"}[p.ext_backend]


_BK_FIELDS = ("bk", "bk_conv", "bk_tp", "bk_amat", "bk_w")


def slim_for_bootstrap(ck: CloudKey) -> CloudKey:
    """Drop every key form the bootstrap path will not read.

    Used to thread the cloud key EXPLICITLY through shard_map bodies (one
    pytree operand with replicated specs) instead of closure-capturing it:
    multi-host placement of the multi-GB key tensors must ride on deliberate
    in_specs, not on XLA constant handling -- and the unused precomputed
    forms (bk/bk_conv are keygen intermediates once a Toeplitz backend is
    selected) should not ship to devices at all.
    """
    active = active_bk_field(ck.params)
    return ck.replace(**{f: None for f in _BK_FIELDS if f != active})


def secret_keygen(key: jax.Array, params: TfheParams) -> SecretKey:
    """The secret-key half of `keygen`, bit-identical to it (same PRNG
    splits).  Lets offline verifiers (e.g. sweep --finalize) reconstruct the
    client's key to decrypt checkpointed decisions WITHOUT paying for the
    cloud-key precomputations (multi-GB at the production presets)."""
    k_lwe, k_tlwe, _, _ = jax.random.split(key, 4)
    lwe_key = jax.random.bernoulli(k_lwe, 0.5, (params.n,)).astype(jnp.int32)
    tlwe_key = jax.random.bernoulli(k_tlwe, 0.5, (params.k, params.N)).astype(jnp.int32)
    return SecretKey(lwe_key=lwe_key, tlwe_key=tlwe_key, params=params)


def keygen(key: jax.Array, params: TfheParams) -> "tuple[SecretKey, CloudKey]":
    """Generate a full secret/cloud keyset deterministically from a PRNG key."""
    _, _, k_bk, k_ks = jax.random.split(key, 4)
    sk = secret_keygen(key, params)
    ck = make_cloud_key(k_bk, k_ks, sk)
    return sk, ck


def make_cloud_key(k_bk: jax.Array, k_ks: jax.Array, sk: SecretKey) -> CloudKey:
    p = sk.params
    # --- Bootstrapping key: TRGSW encryptions of each small-key bit.
    bk = tlwe.trgsw_encrypt(k_bk, sk.tlwe_key, sk.lwe_key, p)  # (n, (k+1)l, k+1, N)
    # Conv RHS form: per step, contraction rows G=(k+1)l, outputs O=(k+1).
    bk_conv = jax.vmap(lambda g: poly.prepare_conv_rhs(g, p.limb_plan))(bk)
    # Toeplitz-generator form (doubled, limb-split) for the matmul backend.
    bk_tp = jax.vmap(lambda g: poly.prepare_toeplitz_rhs(g, p.limb_plan))(bk)
    bk_amat = poly.prepare_amat(bk_tp, block=p.amat_block) if need_amat(p) else None
    bk_w = poly.prepare_w_full(bk_tp) if need_w(p) else None

    # --- Keyswitch key: ks[i][j] = LWE_s(K_i / base^(j+1)); the switched
    # sample accumulates digit-value * row (ops/bootstrap.keyswitch_digits).
    kn = p.k * p.N
    K = sk.extracted_key  # (kN,)
    shifts = jnp.array([32 - (j + 1) * p.ks_basebit for j in range(p.ks_t)], jnp.int32)
    # mu[i, j] = K_i << shift_j  (int32 wrap)
    mu = K[:, None] << shifts[None, :]
    ka, ke = jax.random.split(k_ks)
    a = torus.uniform_torus32(ka, (kn, p.ks_t, p.n))
    e = torus.gaussian_torus32(ke, p.lwe_stdev, (kn, p.ks_t))
    b = poly.dot_key_i32(a, sk.lwe_key) + mu + e
    table = jnp.concatenate([a, b[..., None]], axis=-1)  # (kN, t, n+1)
    tl = poly.split_limbs_i8(table, 4)  # (kN, t, n+1, 4)
    ks_table_limbs = tl.reshape(kn * p.ks_t, (p.n + 1) * 4)
    return CloudKey(bk=bk, bk_conv=bk_conv, bk_tp=bk_tp, bk_amat=bk_amat,
                    bk_w=bk_w, ks_table_limbs=ks_table_limbs, params=p)
