"""Gate-execution backends for the circuit layer.

Circuits (circuits.py) are written against a tiny backend interface so the
same levelized schedule runs either:

  * CipherBackend -- real bootstrapped gates (gates.py); same-level
    heterogeneous gates are fused into ONE batched bootstrap launch via
    `lincomb_bootstrap` (the scheduler abstraction of SURVEY.md section 7,
    hard part #3);
  * ClearBackend -- plaintext 0/1 bit arrays; used property-test style to
    validate circuit structure/widths against the uint64 mirror (clear.py)
    quickly and exhaustively, mirroring the reference's oracle strategy
    (SURVEY.md section 4).

Values are backend-opaque "bit tensors": Lwe pytrees for cipher, int32
arrays for clear; both support numpy-style indexing on the trailing axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import gates, lwe
from .keys import CloudKey

# gate name -> (wa, wb, offset) for the lincomb bootstrap (cipher),
# and the boolean function (clear).
_GATE_LIN = {
    "AND": (1, 1, -gates.MU_1_8),
    "OR": (1, 1, gates.MU_1_8),
    "NAND": (-1, -1, gates.MU_1_8),
    "NOR": (-1, -1, -gates.MU_1_8),
    "XOR": (2, 2, gates.MU_1_4),
    "XNOR": (-2, -2, -gates.MU_1_4),
    "ANDNY": (-1, 1, -gates.MU_1_8),
    "ANDYN": (1, -1, -gates.MU_1_8),
    "ORNY": (-1, 1, gates.MU_1_8),
    "ORYN": (1, -1, gates.MU_1_8),
}

_GATE_FN = {
    "AND": lambda a, b: a & b,
    "OR": lambda a, b: a | b,
    "NAND": lambda a, b: 1 - (a & b),
    "NOR": lambda a, b: 1 - (a | b),
    "XOR": lambda a, b: a ^ b,
    "XNOR": lambda a, b: 1 - (a ^ b),
    "ANDNY": lambda a, b: (1 - a) & b,
    "ANDYN": lambda a, b: a & (1 - b),
    "ORNY": lambda a, b: (1 - a) | b,
    "ORYN": lambda a, b: a | (1 - b),
}


class CipherBackend:
    """Executes gates homomorphically under a cloud key."""

    is_cipher = True

    def __init__(self, ck: CloudKey):
        self.ck = ck
        self.launches = 0  # bootstrap launch counter (for tests/profiling)

    # -- single (batched) gates ------------------------------------------
    def gate(self, name: str, a, b):
        wa, wb, off = _GATE_LIN[name]
        self.launches += 1
        return gates.lincomb_bootstrap(self.ck, a, b, wa, wb, off)

    def __getattr__(self, name):
        if name in _GATE_LIN:
            return lambda a, b: self.gate(name, a, b)
        raise AttributeError(name)

    def NOT(self, a):
        return -a

    def MUX(self, a, b, c):
        self.launches += 1
        return gates.MUX(self.ck, a, b, c)

    def CONSTANT(self, value, shape=()):
        return gates.CONSTANT(self.ck, value, shape)

    # -- fused heterogeneous same-level gate batch -----------------------
    def level(self, ops):
        """ops: list of (name, a, b) at the same circuit depth -> list of results.

        All gates execute as ONE bootstrap launch: inputs are stacked along a
        new leading axis, per-gate (wa, wb, offset) broadcast elementwise.
        """
        shape = jnp.broadcast_shapes(*[x.shape for _, a, b in ops for x in (a, b)])
        dim = ops[0][1].dim
        As, Bs, was, wbs, offs = [], [], [], [], []
        for name, a, b in ops:
            wa, wb, off = _GATE_LIN[name]
            As.append(lwe.Lwe(jnp.broadcast_to(a.a, shape + (dim,)), jnp.broadcast_to(a.b, shape)))
            Bs.append(lwe.Lwe(jnp.broadcast_to(b.a, shape + (dim,)), jnp.broadcast_to(b.b, shape)))
            was.append(jnp.full(shape, wa, jnp.int32))
            wbs.append(jnp.full(shape, wb, jnp.int32))
            offs.append(jnp.full(shape, off, jnp.int32))
        A = lwe.stack(As)
        B = lwe.stack(Bs)
        self.launches += 1
        out = gates.lincomb_bootstrap(
            self.ck, A, B, jnp.stack(was), jnp.stack(wbs), jnp.stack(offs)
        )
        return [out[i] for i in range(len(ops))]

    # -- structural helpers ----------------------------------------------
    def stack(self, xs, axis=0):
        return lwe.stack(xs, axis=axis)

    def concat(self, xs, axis=0):
        return lwe.concatenate(xs, axis=axis)


class ClearBackend:
    """Executes the same circuits on plaintext bit arrays (int32 0/1)."""

    is_cipher = False

    def __init__(self):
        self.launches = 0

    def gate(self, name: str, a, b):
        return jnp.asarray(_GATE_FN[name](jnp.asarray(a), jnp.asarray(b)), jnp.int32)

    def __getattr__(self, name):
        if name in _GATE_FN:
            return lambda a, b: self.gate(name, a, b)
        raise AttributeError(name)

    def NOT(self, a):
        return 1 - jnp.asarray(a)

    def MUX(self, a, b, c):
        return jnp.where(jnp.asarray(a) != 0, jnp.asarray(b), jnp.asarray(c))

    def CONSTANT(self, value, shape=()):
        return jnp.broadcast_to(jnp.asarray(value, jnp.int32), shape)

    def level(self, ops):
        return [self.gate(name, a, b) for name, a, b in ops]

    def stack(self, xs, axis=0):
        return jnp.stack([jnp.asarray(x) for x in xs], axis=axis)

    def concat(self, xs, axis=0):
        return jnp.concatenate([jnp.asarray(x) for x in xs], axis=axis)
