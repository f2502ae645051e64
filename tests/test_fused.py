"""Pallas blind-rotation kernels must be bit-identical to the plain
XLA scan-of-steps path (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.ops import poly
from peba1_tpu.ops import pallas_kernels as pk
from peba1_tpu.params import TOY, TOY_FAST, TOY_T2


def _plain(base):
    """The fully-XLA reference configuration (no Pallas anywhere)."""
    return dataclasses.replace(
        base, use_fused_cmux=False, use_pallas_rotate=False,
        use_pallas_extprod=False, use_fused_step=False, use_gen_step=False,
        use_gen_full=False)


@pytest.mark.parametrize("base", [TOY, TOY_FAST, TOY_T2],
                         ids=["toy", "toy_fast", "toy_t2"])
def test_fused_cmux_matches_scan(base):
    # keygen under the fused params so the A-matrix key form is built; the
    # plain reference path ignores it.
    fused = dataclasses.replace(base, use_fused_cmux=True)
    sk, ck = keys.keygen(jax.random.PRNGKey(0), fused)
    bits = jnp.arange(64) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)
    pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-gates.MU_1_8))
    ref = bs.bootstrap(ck.replace(params=_plain(base)), pre,
                       jnp.int32(gates.MU_1_8))
    out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(ref.a), np.asarray(out.a))
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(out.b))
    got = np.asarray(lwe.decrypt_bit(out, sk.lwe_key))
    np.testing.assert_array_equal(got, np.asarray(bits))


@pytest.mark.parametrize("base", [TOY, TOY_FAST, TOY_T2],
                         ids=["toy", "toy_fast", "toy_t2"])
def test_extprod_recombine_matches_toeplitz(base):
    """Unit: the GEMM+recombine kernel == extprod_toeplitz_i8 bit-for-bit."""
    p = dataclasses.replace(base, use_pallas_extprod=True)
    sk, ck = keys.keygen(jax.random.PRNGKey(0), p)
    G = (p.k + 1) * p.l
    rng = np.random.default_rng(7)
    d = jnp.asarray(
        rng.integers(-p.half_bg, p.half_bg, (16, G, p.N)), jnp.int8)
    for s in (0, p.n // 2, p.n - 1):
        ref = poly.extprod_toeplitz_i8(d, ck.bk_tp[s], p.limb_plan)
        out = pk.extprod_recombine(
            d.reshape(16, -1), ck.bk_w[s], p, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(ref), np.asarray(out).reshape(16, p.k + 1, p.N))


@pytest.mark.parametrize("base", [TOY, TOY_FAST, TOY_T2],
                         ids=["toy", "toy_fast", "toy_t2"])
def test_fused_step_bootstrap_matches_scan(base):
    """End-to-end: the single-kernel CMUX step == plain XLA path."""
    p = dataclasses.replace(base, use_fused_cmux=False,
                            use_pallas_rotate=False,
                            use_pallas_extprod=False, use_fused_step=True)
    sk, ck = keys.keygen(jax.random.PRNGKey(0), p)
    bits = jnp.arange(64) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)
    pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-gates.MU_1_8))
    ref = bs.bootstrap(ck.replace(params=_plain(base)), pre,
                       jnp.int32(gates.MU_1_8))
    out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(ref.a), np.asarray(out.a))
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(out.b))
    got = np.asarray(lwe.decrypt_bit(out, sk.lwe_key))
    np.testing.assert_array_equal(got, np.asarray(bits))


@pytest.mark.parametrize("base", [TOY, TOY_FAST, TOY_T2],
                         ids=["toy", "toy_fast", "toy_t2"])
def test_streamed_fused_step_matches_scan(base):
    """use_fused_step + w_streaming (per-step W assembled in-graph, no bk_w)
    == plain XLA path.  This is the RING_2048 / large-N configuration where
    the precomputed bk_w cannot exist."""
    p = dataclasses.replace(base, use_fused_cmux=False,
                            use_pallas_rotate=False, use_pallas_extprod=False,
                            use_fused_step=True, w_streaming=True)
    sk, ck = keys.keygen(jax.random.PRNGKey(0), p)
    assert ck.bk_w is None  # streaming: the O(n*N^2) key is never built
    bits = jnp.arange(64) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)
    pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-gates.MU_1_8))
    ref = bs.bootstrap(ck.replace(params=_plain(base)), pre,
                       jnp.int32(gates.MU_1_8))
    out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(ref.a), np.asarray(out.a))
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(out.b))
    got = np.asarray(lwe.decrypt_bit(out, sk.lwe_key))
    np.testing.assert_array_equal(got, np.asarray(bits))


@pytest.mark.parametrize(
    "base",
    [TOY, TOY_FAST, TOY_T2,
     # N=256 variant so the in-kernel assembly's multi-coarse-shift path
     # (U = N/K > 1, the RING_2048 shape) is exercised on CPU.
     dataclasses.replace(TOY, N=256),
     dataclasses.replace(TOY_T2, N=256, use_pallas_rotate=False,
                         use_fused_step=False)],
    ids=["toy", "toy_fast", "toy_t2", "toy_n256", "toy_t2_n256"])
def test_gen_step_bootstrap_matches_scan(base):
    """use_gen_step (in-kernel Toeplitz assembly from the generator, the
    RING_2048 / BASELINE config-4 path) == plain XLA path, bit-for-bit."""
    p = dataclasses.replace(base, use_fused_cmux=False,
                            use_pallas_rotate=False, use_pallas_extprod=False,
                            use_fused_step=False, use_gen_step=True)
    sk, ck = keys.keygen(jax.random.PRNGKey(0), p)
    assert ck.bk_w is None  # no O(n*N^2) key for the generator path
    bits = jnp.arange(64) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)
    pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-gates.MU_1_8))
    ref = bs.bootstrap(ck.replace(params=_plain(base)), pre,
                       jnp.int32(gates.MU_1_8))
    out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(ref.a), np.asarray(out.a))
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(out.b))
    got = np.asarray(lwe.decrypt_bit(out, sk.lwe_key))
    np.testing.assert_array_equal(got, np.asarray(bits))


@pytest.mark.parametrize(
    "base",
    [TOY, TOY_T2, dataclasses.replace(TOY, N=256)],
    ids=["toy", "toy_t2", "toy_n256"])
def test_gen_full_bootstrap_matches_scan(base):
    """use_gen_full (whole rotation, resident generator key + accumulator)
    == plain XLA path, bit-for-bit."""
    p = dataclasses.replace(base, use_fused_cmux=False,
                            use_pallas_rotate=False, use_pallas_extprod=False,
                            use_fused_step=False, use_gen_full=True)
    sk, ck = keys.keygen(jax.random.PRNGKey(0), p)
    assert ck.bk_w is None
    bits = jnp.arange(64) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)
    pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-gates.MU_1_8))
    ref = bs.bootstrap(ck.replace(params=_plain(base)), pre,
                       jnp.int32(gates.MU_1_8))
    out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(ref.a), np.asarray(out.a))
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(out.b))
    got = np.asarray(lwe.decrypt_bit(out, sk.lwe_key))
    np.testing.assert_array_equal(got, np.asarray(bits))


@pytest.mark.parametrize("base", [TOY, TOY_FAST, TOY_T2],
                         ids=["toy", "toy_fast", "toy_t2"])
def test_pallas_extprod_bootstrap_matches_scan(base):
    """End-to-end: bootstrap with use_pallas_extprod == plain XLA path."""
    p = dataclasses.replace(base, use_fused_cmux=False,
                            use_pallas_rotate=True, use_pallas_extprod=True)
    sk, ck = keys.keygen(jax.random.PRNGKey(0), p)
    bits = jnp.arange(64) % 2
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)
    pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-gates.MU_1_8))
    ref = bs.bootstrap(ck.replace(params=_plain(base)), pre,
                       jnp.int32(gates.MU_1_8))
    out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
    np.testing.assert_array_equal(np.asarray(ref.a), np.asarray(out.a))
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(out.b))
    got = np.asarray(lwe.decrypt_bit(out, sk.lwe_key))
    np.testing.assert_array_equal(got, np.asarray(bits))
