"""Sharded-vs-single-device equality on the 8-device virtual CPU mesh
(SURVEY.md section 4's multi-host-without-a-pod strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peba1_tpu import gates, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.parallel import mesh as pmesh
from peba1_tpu.parallel import shard as pshard


def test_sharded_bootstrap_equals_single(toy_keys):
    sk, ck = toy_keys
    assert len(jax.devices()) == 8
    m = pmesh.make_mesh(n_dp=4, n_tp=2)
    B = 16
    bits = jnp.arange(B) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(3), sk, bits)
    pre = lwe.Lwe(ct.a * 1, ct.b * 1)  # treat as bootstrap input directly

    want = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
    got = pshard.sharded_bootstrap(m, ck, pre, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))


def test_sharded_bootstrap_dp_only(toy_keys):
    sk, ck = toy_keys
    m = pmesh.make_mesh(n_dp=8, n_tp=1)
    B = 8
    bits = jnp.ones(B, jnp.int32)
    ct = gates.encrypt_bits(jax.random.PRNGKey(4), sk, bits)
    want = bs.bootstrap(ck, ct, jnp.int32(gates.MU_1_8))
    got = pshard.sharded_bootstrap(m, ck, ct, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
