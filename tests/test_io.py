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


def test_cloud_key_roundtrip_gen_preset_builds_no_dead_forms(tmp_path):
    """Loading a gen-step cloud key must NOT rebuild bk_w/bk_amat (at the
    production presets those are multi-GB tensors blind_rotate never reads:
    serial.load_cloud_key mirrors keys.make_cloud_key's form predicates), and
    a bootstrap under the loaded key must be bit-equal to the original."""
    import dataclasses

    import jax.numpy as jnp

    from peba1_tpu import keys
    from peba1_tpu.ops import bootstrap
    from peba1_tpu.params import TOY_T2

    p_gen = dataclasses.replace(TOY_T2, use_gen_step=True)
    sk, ck = keys.keygen(jax.random.PRNGKey(3), p_gen)
    assert ck.bk_w is None and ck.bk_amat is None  # keygen side
    path = str(tmp_path / "ck_gen.npz")
    serial.save_cloud_key(path, ck)
    ck2 = serial.load_cloud_key(path)
    assert ck2.bk_w is None and ck2.bk_amat is None  # load side (the r4 bug)
    assert ck2.params == p_gen

    bits = np.asarray([1, 0, 1, 1, 0])
    ct = gates.encrypt_bits(jax.random.PRNGKey(4), sk, bits)
    out1 = bootstrap.bootstrap(ck, ct, jnp.int32(gates.MU_1_8))
    out2 = bootstrap.bootstrap(ck2, ct, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(out1.a), np.asarray(out2.a))
    np.testing.assert_array_equal(np.asarray(out1.b), np.asarray(out2.b))


def test_cloud_key_roundtrip_fused_step_rebuilds_w(tmp_path):
    """The fused-step (non-streaming) preset DOES need bk_w: load must
    rebuild it bit-identically from the stored generator."""
    from peba1_tpu import keys
    from peba1_tpu.params import TOY_T2

    _, ck = keys.keygen(jax.random.PRNGKey(5), TOY_T2)
    assert ck.bk_w is not None
    path = str(tmp_path / "ck_w.npz")
    serial.save_cloud_key(path, ck)
    ck2 = serial.load_cloud_key(path)
    np.testing.assert_array_equal(np.asarray(ck.bk_w), np.asarray(ck2.bk_w))


def test_ciphertext_roundtrip_decrypts(tmp_path, toy_keys):
    sk, ck = toy_keys
    bits = np.asarray([[1, 0], [0, 1], [1, 1]])
    ct = gates.encrypt_bits(jax.random.PRNGKey(0), sk, bits)
    p = str(tmp_path / "ct.npz")
    serial.save_ciphertext(p, ct, meta={"kind": "bits", "shape": list(bits.shape)})
    ct2, meta = serial.load_ciphertext(p)
    assert meta["kind"] == "bits"
    np.testing.assert_array_equal(np.asarray(gates.decrypt_bits(ct2, sk)), bits)
