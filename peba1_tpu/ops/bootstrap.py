"""Batched gate bootstrapping: blind rotation + sample extract + key switch.

This is the TPU-native replacement for TFHE's ``tfhe_bootstrap_FFT``
(SURVEY.md section 3.5) -- the code path behind every single ``boots*`` call
in the reference.  Design inversion vs the reference (SURVEY.md section 7):
instead of one synchronous scalar bootstrap per gate call, a whole BATCH of
gate bootstraps executes as one jitted program:

  1. modswitch all phases to Z_2N                       (VPU, elementwise)
  2. init accumulators = X^{-b_bar} * testvector        (barrel-shift rolls)
  3. n CMUX steps, each: barrel-rotate, gadget-decompose,
     and ONE int8 convolution on the MXU contracting all
     (k+1)*l digit polys x batch against that step's
     TRGSW row (ops/poly.negacyclic_conv_i8)            (MXU)
  4. sample extract                                     (slicing)
  5. key switch as ONE one-hot int8 matmul              (MXU)

Exact integer arithmetic throughout -- no floating-point FFT, hence no
platform-dependent rounding (SURVEY.md "hard parts" #1).
"""

from __future__ import annotations

import os
import warnings
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from .. import lwe
from . import decompose as dec
from . import poly, rotate

if TYPE_CHECKING:  # avoid circular import; CloudKey is only a type here
    from ..keys import CloudKey


def _upgrade_rotate_on_tpu(p, platform: str) -> bool:
    """Whether blind_rotate must swap the plain-XLA barrel-rotate/select
    chain for the Pallas rotate_decompose kernel: that chain is known to
    miscompile at N>=2048 on TPU (~50% wrong decodes -- LEVER_r04.json,
    scripts/repro_n2048_rotate.py) while being bit-exact on CPU.
    Only applies when the plain in-scan rotate would actually run (every
    fused/gen kernel family has its own rotation and returns earlier).
    PEBA1_ALLOW_XLA_ROTATE_N2048=1 opts out (for the repro script)."""
    plain_rotate_active = not (p.use_pallas_rotate or p.use_fused_cmux
                               or p.use_gen_full or p.use_gen_step
                               or p.use_fused_step)
    return (plain_rotate_active and p.N >= 2048 and platform == "tpu"
            and not os.environ.get("PEBA1_ALLOW_XLA_ROTATE_N2048"))


def blind_rotate(ck: CloudKey, bara: jax.Array, barb: jax.Array, mu) -> jax.Array:
    """Batched blind rotation of the all-mu testvector.

    Args:
      ck: cloud key.
      bara: (B, n) int32 in [0, 2N) -- modswitched mask.
      barb: (B,) int32 in [0, 2N) -- modswitched body.
      mu: scalar torus32 testvector amplitude.

    Returns:
      (B, k+1, N) int32 accumulator  ~ TRLWE(X^{-phase2N} * tv).
    """
    p = ck.params
    B = bara.shape[0]

    if p.use_fused_cmux:
        # Whole blind rotation (incl. acc init) as one Pallas kernel against
        # the precomputed A-matrix key form.
        from . import pallas_kernels as pk
        interp = jax.devices()[0].platform != "tpu"
        amt = jnp.concatenate(
            [((2 * p.N - barb) % (2 * p.N))[:, None], bara], axis=1)
        out = pk.fused_blind_rotate(amt, ck.bk_amat, jnp.int32(mu), p,
                                    interpret=interp)
        return out.reshape(B, p.k + 1, p.N)

    if p.use_gen_full:
        # Whole rotation in one kernel: VMEM-resident generator key +
        # resident accumulator + in-VMEM weight assembly (small-N sets only).
        from . import pallas_kernels as pk
        interp = jax.devices()[0].platform != "tpu"
        amt = jnp.concatenate(
            [((2 * p.N - barb) % (2 * p.N))[:, None], bara], axis=1)
        out = pk.blind_rotate_gen_full(amt, ck.bk_tp, jnp.int32(mu), p,
                                       interpret=interp)
        return out.reshape(B, p.k + 1, p.N)

    tv = jnp.full((B, p.N), jnp.int32(mu))
    acc = jnp.concatenate(
        [jnp.zeros((B, p.k, p.N), jnp.int32),
         rotate.negacyclic_rotate(tv, (2 * p.N - barb) % (2 * p.N))[:, None, :]],
        axis=1,
    )
    backend = "pallas_extprod" if p.use_pallas_extprod else p.ext_backend
    bk_steps = {"toeplitz": ck.bk_tp, "conv": ck.bk_conv, "amat": ck.bk_amat,
                "pallas_extprod": ck.bk_w}[backend]

    # TPU-only XLA miscompile quarantine: rather than leave silently-wrong
    # cryptography one --params flag away (PRESETS["ring_2048"]), auto-
    # upgrade to the Pallas rotate+decompose kernel -- proven bit-identical
    # to the XLA formulation in tests/test_fused.py -- whenever the faulty
    # chain would run on a TPU (see _upgrade_rotate_on_tpu).
    use_pallas_rotate = p.use_pallas_rotate
    if _upgrade_rotate_on_tpu(p, jax.devices()[0].platform):
        warnings.warn(
            f"N={p.N} plain-XLA rotate path is known to miscompile on TPU "
            "(~50% wrong decodes, see LEVER_r04.json); auto-upgrading to the "
            "bit-identical Pallas rotate_decompose kernel.  Set "
            "PEBA1_ALLOW_XLA_ROTATE_N2048=1 to run the faulty path anyway.")
        use_pallas_rotate = True

    if (use_pallas_rotate or p.use_fused_step or p.use_gen_step
            or backend == "pallas_extprod"):
        from . import pallas_kernels as pk
        interp = jax.devices()[0].platform != "tpu"

    if p.use_gen_step:
        # Whole CMUX step in one kernel, weights assembled in VMEM from the
        # per-step generator: no W in HBM, no bk_w key (the RING_2048 path).
        def gstep(acc_flat, xs):
            amt, vv_i = xs                           # vv_i: (G, C, 2N) int8
            return pk.cmux_step_gen(acc_flat, amt, vv_i, p, interpret=interp), ()
        acc_flat, _ = jax.lax.scan(gstep, acc.reshape(B, -1), (bara.T, ck.bk_tp))
        return acc_flat.reshape(B, p.k + 1, p.N)

    if p.use_fused_step:
        G = (p.k + 1) * p.l
        C = sum(p.limb_plan)
        if p.w_streaming:
            # Assemble this step's full Toeplitz weights in-graph from the
            # small generator (exactly prepare_w_full's per-step layout)
            # instead of streaming the precomputed bk_w: ~2 extra HBM passes
            # over W per step, no O(n*N^2) key.
            def fstep(acc_flat, xs):
                amt, vv_i = xs                       # vv_i: (G, C, 2N) int8
                w = poly.negacyclic_toeplitz(vv_i)   # (G, C, N_t, N_j)
                w = jnp.moveaxis(w, 2, 1).reshape(G * p.N, C * p.N)
                return pk.cmux_step(acc_flat, amt, w, p, interpret=interp), ()
            xs = (bara.T, ck.bk_tp)
        else:
            def fstep(acc_flat, xs):
                amt, w_i = xs
                return pk.cmux_step(acc_flat, amt, w_i, p, interpret=interp), ()
            xs = (bara.T, ck.bk_w)
        acc_flat, _ = jax.lax.scan(fstep, acc.reshape(B, -1), xs)
        return acc_flat.reshape(B, p.k + 1, p.N)

    def step(acc, xs):
        amt, bk_i = xs
        if use_pallas_rotate:
            d = pk.rotate_decompose(acc.reshape(B, -1), amt, p, interpret=interp)
            d = d.reshape(B, (p.k + 1) * p.l, p.N)
        else:
            rot = rotate.negacyclic_rotate(acc, amt[:, None])  # over k+1 polys
            diff = rot - acc
            d = dec.decompose(diff, p)                # (B, k+1, N, l) int8
            d = jnp.moveaxis(d, -1, -2)               # (B, k+1, l, N)
            d = d.reshape(B, (p.k + 1) * p.l, p.N)
        if backend == "pallas_extprod":
            delta = pk.extprod_recombine(
                d.reshape(B, -1), bk_i, p, interpret=interp)
            delta = delta.reshape(B, p.k + 1, p.N)
        elif backend == "toeplitz":
            delta = poly.extprod_toeplitz_i8(d, bk_i, p.limb_plan)
        elif backend == "amat":
            delta = poly.extprod_amat_i8(d, bk_i, p.limb_plan, p.N)
        else:
            delta = poly.negacyclic_conv_i8(d, bk_i, p.limb_plan)
        return acc + delta, ()

    acc, _ = jax.lax.scan(step, acc, (bara.T, bk_steps))
    return acc


def keyswitch_digits(p, a_ext: jax.Array) -> jax.Array:
    """Decompose extracted masks into base-2^basebit digit VALUES.

    a_ext: (B, kN) int32 -> (B, kN*t) int8 digits in [0, base).

    Value encoding instead of TFHE's per-digit table lookup: the ks table row
    for (i, j) is LWE(K_i * 2^shift_j), and the switched sample accumulates
    digit * row -- one (B, kN*t) x (kN*t, cols) int8 matmul, base-times less
    LHS HBM traffic than a one-hot expansion (measured ~0.5 s/batch at
    B=8192).  Noise: sum of d*e with E[d^2] = (base-1)(2base-1)/6 vs the
    lookup's E = (base-1)/base * sigma^2 -- x4.7 variance at base 4, well
    inside the decoding budget (see TfheParams.max_stdev analysis).
    """
    B, kn = a_ext.shape
    prec_offset = jnp.uint32(1 << (32 - (1 + p.ks_basebit * p.ks_t)))
    u = a_ext.astype(jnp.uint32) + prec_offset
    shifts = jnp.array([32 - (j + 1) * p.ks_basebit for j in range(p.ks_t)], jnp.uint32)
    digits = (u[..., None] >> shifts) & (p.ks_base - 1)  # (B, kN, t) uint32
    return digits.reshape(B, kn * p.ks_t).astype(jnp.int8)


def keyswitch(ck: CloudKey, a_ext: jax.Array, b_ext: jax.Array) -> lwe.Lwe:
    """Batched key switch kN -> n as a digit-valued int8 matmul.

    a_ext: (B, kN) int32, b_ext: (B,) int32 (extracted LWE under the big key).
    Returns Lwe under the small key, (B,).
    """
    p = ck.params
    B = a_ext.shape[0]
    digits = keyswitch_digits(p, a_ext)
    acc = jnp.dot(digits, ck.ks_table_limbs, preferred_element_type=jnp.int32)
    acc = poly.recombine_limbs_i32(acc.reshape(B, p.n + 1, 4), 4)  # (B, n+1)
    return lwe.Lwe(-acc[:, : p.n], b_ext - acc[:, p.n])


def bootstrap_wo_ks(ck: CloudKey, ct: lwe.Lwe, mu) -> "tuple[jax.Array, jax.Array]":
    """Bootstrap without the final key switch: returns extracted (a, b) pair.

    ct: Lwe (B,) under the small key; mu: torus32 amplitude.
    Output phase is +mu where phase(ct) in (0, 1/2), -mu where in (-1/2, 0).
    """
    p = ck.params
    bara = rotate.modswitch_2n(ct.a, p.N)
    barb = rotate.modswitch_2n(ct.b, p.N)
    acc = blind_rotate(ck, bara, barb, mu)
    from .. import tlwe  # local import to avoid cycle
    return tlwe.sample_extract(acc)


def bootstrap(ck: CloudKey, ct: lwe.Lwe, mu) -> lwe.Lwe:
    """Full gate bootstrap: LWE (B,) -> LWE (B,) with message +-mu by phase sign."""
    a_ext, b_ext = bootstrap_wo_ks(ck, ct, mu)
    return keyswitch(ck, a_ext, b_ext)
