"""TFHE parameter sets, TPU-native.

Reimplements the role of the reference's external parameter factory
``new_default_gate_bootstrapping_parameters(lambda)`` (called at
/root/reference/src/main.cpp:21) as frozen dataclasses.  The lambda=128 preset
mirrors the well-known TFHE v1.x defaults the reference binary runs with
(SURVEY.md section 2.2 E1): LWE n=630 / ks_stdev 2^-15, TRLWE N=1024 k=1 /
bk_stdev 2^-25, gadget l=3 Bg=2^7, keyswitch t=8 base 2^2.

All torus elements are represented as int32 ("torus32"): the real torus
R/Z scaled by 2^32, with native wrap-around arithmetic (SURVEY.md E2).
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class TfheParams:
    """Complete parameter set for the gate-bootstrapping TFHE scheme.

    Attributes:
      n: LWE (small) mask dimension.
      lwe_stdev: stdev (fraction of torus) of fresh LWE encryption noise under
        the small key (TFHE's ``ks_stdev``).
      N: TRLWE ring dimension; polynomials live in Z[X]/(X^N+1).
      k: TRLWE mask size (number of mask polynomials); TFHE default 1.
      tlwe_stdev: stdev of TRLWE/TRGSW encryption noise (TFHE's ``bk_stdev``).
      l: gadget decomposition length (digits per torus element).
      bgbit: log2 of the gadget base Bg.
      ks_t: keyswitch decomposition length.
      ks_basebit: log2 of the keyswitch decomposition base.
      max_stdev: maximum tolerable noise stdev for correct 1/4-msg-space
        decryption (used only by validation checks / noise tests).
      bk_limbs: number of balanced 8-bit limbs used for the bootstrapping key
        in the int8 MXU external product (4 = exact torus32; 3 trades the
        lowest limb for ~25% fewer MACs and adds noise with stdev ~2^-10
        of a torus *per CMUX term*, which quadrature-sums to well below
        max_stdev over n CMUX steps -- see ops/poly.py).
      ext_backend: external-product kernel: "toeplitz" (explicit negacyclic
        int8 matmul, fast on TPU) or "conv" (lax.conv formulation; reference
        implementation, ~50x slower inside the blind-rotation loop on TPU).
    """

    n: int
    lwe_stdev: float
    N: int
    k: int
    tlwe_stdev: float
    l: int
    bgbit: int
    ks_t: int
    ks_basebit: int
    max_stdev: float = 0.012467
    bk_limbs: int = 4
    ext_backend: str = "toeplitz"
    # Fuse rotation+difference+decomposition into one Pallas VMEM pass
    # (vs log2(2N)+4 HBM round-trips); interpret-mode on non-TPU backends.
    use_pallas_rotate: bool = False


    @property
    def bg(self) -> int:
        return 1 << self.bgbit

    @property
    def half_bg(self) -> int:
        return 1 << (self.bgbit - 1)

    @property
    def ks_base(self) -> int:
        return 1 << self.ks_basebit

    @property
    def big_n(self) -> int:
        """Dimension of the extracted LWE ciphertext (= k*N)."""
        return self.k * self.N

    @property
    def log2_2N(self) -> int:
        return int(math.log2(2 * self.N))

    def __post_init__(self):
        assert self.N & (self.N - 1) == 0, "N must be a power of two"
        assert 1 <= self.bk_limbs <= 4
        assert self.bgbit * self.l <= 32
        assert self.ks_basebit * self.ks_t <= 32
        # int8 exactness bound for the MXU external product:
        # contraction of (k+1)*l*N terms of digit(<=2^(bgbit-1)) * limb(<=2^7)
        bound = (self.k + 1) * self.l * self.N * (1 << (self.bgbit - 1)) * 128
        assert bound < 2**31, "external-product int32 accumulation would overflow"


# TFHE v1.x gate-bootstrapping defaults for minimum_lambda <= 128, the set the
# reference binary uses (src/main.cpp:20-21 passes lambda=128).
PEBA1_128 = TfheParams(
    n=630,
    lwe_stdev=2.0**-15,
    N=1024,
    k=1,
    tlwe_stdev=2.0**-25,
    l=3,
    bgbit=7,
    ks_t=8,
    ks_basebit=2,
)

# Larger-ring set for BASELINE.json config 4 (N=2048, higher security margin).
# Digits are +-128 with bgbit=8, still int8-representable; the int32
# accumulation bound (k+1)*l*N*128*128 = 2^30.6 still holds.
RING_2048 = TfheParams(
    n=1024,
    lwe_stdev=2.0**-17,
    N=2048,
    k=1,
    tlwe_stdev=2.0**-28,
    l=2,
    bgbit=8,
    ks_t=8,
    ks_basebit=2,
)

# Tiny parameters for fast CPU tests.  Noise-free (stdev 0) so that every
# pipeline stage is exactly deterministic; modswitch rounding is the only
# "noise", and with n=32, N=128 its typical magnitude (~sqrt(n)/(4N*sqrt(3)))
# is far below the 1/16 decoding margin.
TOY = TfheParams(
    n=32,
    lwe_stdev=0.0,
    N=128,
    k=1,
    tlwe_stdev=0.0,
    l=3,
    bgbit=7,
    ks_t=8,
    ks_basebit=2,
)

# Toy set with realistic-shaped (but scaled) noise for noise-growth tests.
TOY_NOISY = TfheParams(
    n=32,
    lwe_stdev=2.0**-15,
    N=128,
    k=1,
    tlwe_stdev=2.0**-25,
    l=3,
    bgbit=7,
    ks_t=8,
    ks_basebit=2,
)

# Throughput-tuned variant of the lambda=128 set: 3 bootstrapping-key limbs
# (the dropped low byte adds noise stdev ~2^22 in torus32 units per bootstrap,
# negligible against the 2^28 decoding margin -- see ops/poly.split_limbs_i8)
# and the fused Pallas rotation kernel.  Gate outputs remain exact with
# overwhelming probability; the batch-correctness gate in bench.py verifies.
PEBA1_128_FAST = dataclasses.replace(
    PEBA1_128, bk_limbs=3, use_pallas_rotate=True)

PRESETS = {
    "peba1_128": PEBA1_128,
    "peba1_128_fast": PEBA1_128_FAST,
    "ring_2048": RING_2048,
    "toy": TOY,
    "toy_noisy": TOY_NOISY,
}


@dataclasses.dataclass(frozen=True)
class ProtocolParams:
    """PEBA1 protocol-level constants (reference driver src/main.cpp:30-32,520).

    Attributes:
      nslots: embedding vector length (128 face-embedding slots).
      bitsize: significant bits per slot value.
      max_bitsize: accumulator width of the squared-Euclidean distance
        (hard-coded 24 in the reference, src/Math.cpp:342).
      mul_width: multiplier accumulator width (hard-coded 23 in the reference,
        src/Math.cpp:216).
      bound_match: squared-distance acceptance threshold
        (nslots*2 in the reference driver, src/main.cpp:520).
    """

    nslots: int = 128
    bitsize: int = 8
    max_bitsize: int = 24
    mul_width: int = 23
    bound_match: int = 256


PEBA1_PROTOCOL = ProtocolParams()
