"""The fully-fused Pallas blind rotation must be bit-identical to the
reference scan-of-steps path (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.params import TOY, TOY_FAST


@pytest.mark.parametrize("base", [TOY, TOY_FAST], ids=["toy", "toy_fast"])
def test_fused_cmux_matches_scan(base):
    # keygen under the fused params so the A-matrix key form is built; the
    # scan reference path ignores it.
    fused = dataclasses.replace(base, use_fused_cmux=True)
    sk, ck = keys.keygen(jax.random.PRNGKey(0), fused)
    bits = jnp.arange(64) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)
    pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-gates.MU_1_8))
    ref = bs.bootstrap(ck.replace(params=base), pre, jnp.int32(gates.MU_1_8))
    out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(ref.a), np.asarray(out.a))
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(out.b))
    got = np.asarray(lwe.decrypt_bit(out, sk.lwe_key))
    np.testing.assert_array_equal(got, np.asarray(bits))
