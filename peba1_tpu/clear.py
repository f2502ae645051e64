"""Plaintext mirror of every homomorphic circuit (reference L3', SURVEY.md C15).

Reimplements the reference's uint64 bitwise-algorithm twins
(/root/reference/src/Math.cpp:427-587, declared include/Math.h:39-51) --
the same XOR/AND carry-chain algorithms, not native '+' -- as vectorized
numpy/jnp over uint64.  These are the test oracle for the ciphertext circuits
(reference test strategy, SURVEY.md section 4) and part of the public API
surface (including the dead-but-exported 64-bit distance variants).

All functions accept scalars or arrays (broadcasting elementwise).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64


def _u(x):
    return np.asarray(x, U64)


def add_nbit(a, b, bitsize: int):
    """Bitwise ripple addition, mirrors ADDNbit (src/Math.cpp:427-435).

    Note the reference iterates bitsize+1 times over full-width uint64
    carry propagation; for bitsize >= 64 this is plain wrapping addition.
    """
    a, b = _u(a).copy(), _u(b).copy()
    for _ in range(bitsize + 1):
        carry = a & b
        a = a ^ b
        b = carry << U64(1)
    return a


def twos_complement(a, bitsize: int):
    """Mirror of TwoSComplement (src/Math.cpp:439-446): flip low `bitsize` bits, +1."""
    a = _u(a)
    mask = U64((1 << bitsize) - 1) if bitsize < 64 else U64(0xFFFFFFFFFFFFFFFF)
    return add_nbit(a ^ mask, U64(1), bitsize)


def abs_(a, bitsize: int):
    """Mirror of ABS (src/Math.cpp:449-458): sign-mask add-then-XOR trick."""
    a = _u(a)
    sign = a >> U64(bitsize - 1)
    mask = np.zeros_like(a)
    for i in range(bitsize):
        mask = mask ^ (sign << U64(i))
    tmp = add_nbit(a, mask, bitsize)
    return tmp ^ mask


def sub_nbit(a, b, bitsize: int):
    """Mirror of SUBNbit (src/Math.cpp:461-466): ABS(a + 2c(b)) = |a - b|-ish.

    Note: like the reference, this is ABS of the wrapped difference
    interpreted at `bitsize` bits, not a mathematical |a-b| for all inputs.
    """
    b_comp = twos_complement(b, bitsize)
    tmp = add_nbit(_u(a), b_comp, bitsize)
    return abs_(tmp, bitsize)


def multiply(a, b, bitsize: int):
    """Mirror of Multiply (src/Math.cpp:469-488): schoolbook over 64-bit adds."""
    a, b = _u(a), _u(b)
    final = np.zeros_like(a)
    for i in range(bitsize):
        bit = (b >> U64(i)) & U64(1)
        row = np.zeros_like(a)
        for j in range(bitsize):
            row = row ^ (bit << U64(j))
        part = (a & row) << U64(i)
        final = add_nbit(part, final, 64)
    return final


def manhattan_distance(a, b):
    """Mirror of ManhattanDistance (src/Math.cpp:493-501): native ops on uint8 vecs."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    return U64(np.abs(a - b).sum(axis=-1))


def manhattan_distance64(a, b):
    """Mirror of ManhattanDistance64 (src/Math.cpp:506-514) [dead code in ref]."""
    a = np.asarray(a, U64).astype(np.int64)
    b = np.asarray(b, U64).astype(np.int64)
    return U64(np.abs(a - b).sum(axis=-1))


def euclidean_distance(a, b):
    """Mirror of EuclideanDistance (src/Math.cpp:520-529): sum of squared diffs."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    return U64(((a - b) ** 2).sum(axis=-1))


def euclidean_distance64(a, b):
    """Mirror of EuclideanDistance64 (src/Math.cpp:535-544) [dead code in ref]."""
    return euclidean_distance(np.asarray(a, U64).astype(np.int64), np.asarray(b, U64).astype(np.int64))


def manhattan_distance_bitwise(a, b, bitsize: int):
    """Mirror of ManhattanDistanceBitwise (src/Math.cpp:546-556)."""
    a, b = _u(a), _u(b)
    result = U64(0)
    for i in range(a.shape[-1]):
        diff = sub_nbit(b[..., i], a[..., i], bitsize)
        diff = abs_(diff, bitsize)
        result = add_nbit(diff, result, bitsize)
    return result


def euclidean_distance_bitwise(a, b, bitsize: int):
    """Mirror of EuclideanDistanceBitwise (src/Math.cpp:558-568).

    Note the reference squares with hard-coded Multiply(..., 8) regardless of
    `bitsize` (src/Math.cpp:563).
    """
    a, b = _u(a), _u(b)
    result = U64(0)
    for i in range(a.shape[-1]):
        diff = sub_nbit(b[..., i], a[..., i], bitsize)
        sq = multiply(diff, diff, 8)
        result = add_nbit(sq, result, bitsize)
    return result


def function_f_clear(a, b, bound_match, bitsize: int):
    """Mirror of Function_f_clear (src/Math.cpp:571-580): 1 iff ed <= bound.

    NB: this polarity is INVERTED vs the homomorphic Function_f, whose output
    bit is 1 iff ed > bound (SURVEY.md section 3.2 discrepancy #1); the
    reference code, not its comments, is the conformance target.
    """
    ed = euclidean_distance_bitwise(a, b, bitsize)
    return U64(1) if ed <= U64(bound_match) else U64(0)


def function_g_clear(result_b, r0, r1, bitsize: int):
    """Mirror of Function_g_clear (src/Math.cpp:583-587): (1-b)*r0 + b*r1."""
    b = _u(result_b)
    return (U64(1) - b) * _u(r0) + b * _u(r1)


def approx_equals(a, b) -> bool:
    """Mirror of approxEquals (src/Math.cpp:253) on torus32 values."""
    return bool(abs(int(np.int32(a)) - int(np.int32(b))) < 10)
