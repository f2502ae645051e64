"""Sharded bootstrap / protocol execution over a ('dp', 'tp') mesh.

Design (SURVEY.md section 2.4 mapping table):
  * ciphertext batch shards over dp (jax.shard_map); every device holds a
    replica of the bootstrapping key and runs the full blind rotation on its
    shard -- gate bootstraps are embarrassingly parallel across the batch;
  * the keyswitch one-hot matmul tensor-parallelizes over tp: the KS table's
    output columns (the n+1 LWE coefficients x limbs) split across tp ranks,
    each computing a partial-width slice, joined with all_gather over ICI;
  * 1:N identification shards the template database over dp and reduces
    encrypted verdict words with collectives at the protocol layer.

Single-device equivalence is exact (integer arithmetic, no reduction-order
effects), which the virtual-mesh tests assert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import lwe
from ..keys import CloudKey
from ..ops import bootstrap as bs
from ..ops import poly, rotate


def shard_keyswitch_table(ck: CloudKey, n_tp: int) -> jax.Array:
    """Reshape the KS table for tp column sharding: (M, C) -> (tp, M, C/tp)."""
    m, c = ck.ks_table_limbs.shape
    pad = (-c) % n_tp
    t = jnp.pad(ck.ks_table_limbs, ((0, 0), (0, pad)))
    return t.reshape(m, n_tp, (c + pad) // n_tp).transpose(1, 0, 2)


def sharded_bootstrap(mesh: Mesh, ck: CloudKey, ct: lwe.Lwe, mu) -> lwe.Lwe:
    """Batched gate bootstrap with batch sharded over dp, KS matmul over tp.

    ct: (B,) flat batch; B must divide evenly by mesh dp size.
    """
    p = ck.params
    n_tp = mesh.shape["tp"]
    ks_sharded = shard_keyswitch_table(ck, n_tp)
    c_total = ks_sharded.shape[0] * ks_sharded.shape[2]

    def local_fn(ct_a, ct_b, bk_conv, ks_cols):
        # ks_cols: (1, M, C/tp) local slice of the keyswitch table
        local = lwe.Lwe(ct_a, ct_b)
        bara = rotate.modswitch_2n(local.a, p.N)
        barb = rotate.modswitch_2n(local.b, p.N)
        ck_local = ck.replace(bk_conv=bk_conv)
        acc = bs.blind_rotate(ck_local, bara, barb, mu)
        from .. import tlwe
        a_ext, b_ext = tlwe.sample_extract(acc)
        # tp-parallel keyswitch: one-hot matmul against the local column slice
        digits = bs.keyswitch_digits(p, a_ext)
        part = jnp.dot(digits, ks_cols[0], preferred_element_type=jnp.int32)
        cols = jax.lax.all_gather(part, "tp", axis=1, tiled=True)  # (B/dp, C)
        cols = cols[:, : (p.n + 1) * 4]
        acc32 = poly.recombine_limbs_i32(cols.reshape(-1, p.n + 1, 4), 4)
        out = lwe.Lwe(-acc32[:, : p.n], b_ext - acc32[:, p.n])
        return out.a, out.b

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P(), P("tp")),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    a, b = fn(ct.a, ct.b, ck.bk_conv, ks_sharded)
    return lwe.Lwe(a, b)
