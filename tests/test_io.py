"""Serialization round-trips (SURVEY.md E9)."""

import jax
import numpy as np

from peba1_tpu import gates, lwe
from peba1_tpu.io import serial


def test_secret_key_roundtrip(tmp_path, toy_keys):
    sk, _ = toy_keys
    p = str(tmp_path / "sk.npz")
    serial.save_secret_key(p, sk)
    sk2 = serial.load_secret_key(p)
    np.testing.assert_array_equal(np.asarray(sk.lwe_key), np.asarray(sk2.lwe_key))
    np.testing.assert_array_equal(np.asarray(sk.tlwe_key), np.asarray(sk2.tlwe_key))
    assert sk.params == sk2.params


def test_cloud_key_roundtrip(tmp_path, toy_keys):
    _, ck = toy_keys
    p = str(tmp_path / "ck.npz")
    serial.save_cloud_key(p, ck)
    ck2 = serial.load_cloud_key(p)
    np.testing.assert_array_equal(np.asarray(ck.bk_conv), np.asarray(ck2.bk_conv))
    np.testing.assert_array_equal(np.asarray(ck.ks_table_limbs), np.asarray(ck2.ks_table_limbs))
    assert ck.params == ck2.params


def test_ciphertext_roundtrip_decrypts(tmp_path, toy_keys):
    sk, ck = toy_keys
    bits = np.asarray([[1, 0], [0, 1], [1, 1]])
    ct = gates.encrypt_bits(jax.random.PRNGKey(0), sk, bits)
    p = str(tmp_path / "ct.npz")
    serial.save_ciphertext(p, ct, meta={"kind": "bits", "shape": list(bits.shape)})
    ct2, meta = serial.load_ciphertext(p)
    assert meta["kind"] == "bits"
    np.testing.assert_array_equal(np.asarray(gates.decrypt_bits(ct2, sk)), bits)
