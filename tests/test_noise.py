"""Noise-growth assertions (SURVEY.md section 7 step 3 test strategy).

With real (nonzero) noise parameters, phases must stay within budget through
encryption, bootstrap, and gate composition.  Statistical, fixed PRNG keys.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.params import TOY_NOISY


@pytest.fixture(scope="module")
def noisy_keys(rng):
    return keys.keygen(rng, TOY_NOISY)


def _phase_err(ct, sk, bits):
    ph = np.asarray(lwe.phase(ct, sk.lwe_key)).astype(np.int64)
    want = np.where(np.asarray(bits) != 0, 2**29, -(2**29))
    d = (ph - want) % (1 << 32)
    return np.minimum(d, (1 << 32) - d)


def test_fresh_encryption_noise(noisy_keys):
    sk, _ = noisy_keys
    bits = jnp.arange(256) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)
    err = _phase_err(ct, sk, bits)
    sigma = TOY_NOISY.lwe_stdev * 2**32
    assert err.max() < 6 * sigma
    assert err.std() > 0.3 * sigma  # actually noisy


def test_bootstrap_output_noise_within_budget(noisy_keys):
    sk, ck = noisy_keys
    bits = jnp.arange(128) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(2), sk, bits)
    out = bs.bootstrap(ck, ct, jnp.int32(gates.MU_1_8))
    err = _phase_err(out, sk, bits)
    # decodable margin: well below 1/16 of the torus
    assert err.max() < 2**28
    np.testing.assert_array_equal(
        np.asarray(gates.decrypt_bits(out, sk)), np.asarray(bits))


def test_deep_gate_chain_stays_correct(noisy_keys):
    """Noise must not accumulate across bootstraps (each gate refreshes)."""
    sk, ck = noisy_keys
    bits = jnp.arange(32) % 2
    x = gates.encrypt_bits(jax.random.PRNGKey(3), sk, bits)
    y = gates.encrypt_bits(jax.random.PRNGKey(4), sk, 1 - bits)
    for i in range(6):
        x, y = gates.XOR(ck, x, y), gates.AND(ck, x, y)  # depth-6 chain
    got_x = np.asarray(gates.decrypt_bits(x, sk))
    # reference truth on plaintext bits
    bx, by = np.asarray(bits), 1 - np.asarray(bits)
    for i in range(6):
        bx, by = bx ^ by, bx & by
    np.testing.assert_array_equal(got_x, bx)
