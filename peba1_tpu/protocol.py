"""PEBA1 protocol layer: privacy-preserving biometric authentication.

Rebuilds the reference's L2 identity model (+L4 protocol driver glue):
``Client`` / ``Client_C`` (/root/reference/include/Client.h:9-99) and the
encrypted protocol flow of main.cpp (src/main.cpp:513-586) -- but with the
client/server boundary made REAL (SURVEY.md section 3.4): ``ClientDevice``
holds the secret key and does enroll/encrypt/decrypt/prove; ``Server`` holds
only the cloud key and computes Function_f / Function_g; nothing server-side
can decrypt.  (The reference's server-side Client object carries the secret
key through its base class -- the author's own "less information" comment
notwithstanding, include/Client.h:8,13 -- which we deliberately fix.)

Batched by construction: a Server matches B probe/template pairs at once
(BASELINE.json config 2), and `identify` sweeps a 1:N template database
(config 3).

Decision semantics (faithful to reference gate outputs, SURVEY.md 3.2):
  b = Function_f = [ED(probe, template) > bound]   (1 = NO match)
  y = Function_g = r1 if b == 1 else (-r0 mod 2^bitsize)
The reference driver prints "successfully authenticated" iff y == r1, i.e.
exactly when the match FAILS; `authenticate()` exposes both the faithful
driver verdict (`reference_verdict`) and the semantically-correct one
(`is_match`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import circuits as cc
from . import gates, lwe
from .backends import CipherBackend
from .keys import CloudKey, SecretKey, keygen
from .params import PEBA1_PROTOCOL, ProtocolParams, TfheParams
from .utils.bits import bits_to_int, int_to_bits


@dataclasses.dataclass
class ClientRecord:
    """Server-side view of an enrolled client: ID + encrypted template ONLY.

    Equivalent of the reference's ``Client`` (include/Client.h:9-47) minus the
    secret-key leak.
    """

    client_id: int
    template_ct: lwe.Lwe          # (..., nslots, bitsize) encrypted bits
    nslots: int

    def get_id(self) -> int:
        return self.client_id

    def get_ctxt(self) -> lwe.Lwe:
        return self.template_ct

    def get_nb_slots(self) -> int:
        return self.nslots


class ClientDevice:
    """Client-side identity: secret key + plaintext biometrics.

    Equivalent of the reference's ``Client_C`` (include/Client.h:50-99), but
    the only object in the system that can encrypt/decrypt.
    """

    def __init__(self, client_id: int, sk: SecretKey, ck: CloudKey,
                 proto: ProtocolParams = PEBA1_PROTOCOL, minimum_lambda: int = 128):
        self.client_id = client_id
        self.sk = sk
        self.ck = ck  # public cloud key (shared with the server)
        self.proto = proto
        self.minimum_lambda = minimum_lambda

    # -- encryption (bit-sliced, src/main.cpp:58-70) ----------------------
    def encrypt_vector(self, key: jax.Array, values) -> lwe.Lwe:
        """values (..., nslots) ints -> encrypted bits (..., nslots, bitsize)."""
        bits = int_to_bits(values, self.proto.bitsize)
        return gates.encrypt_bits(key, self.sk, bits)

    def encrypt_word(self, key: jax.Array, value, nbits: int) -> lwe.Lwe:
        bits = int_to_bits(value, nbits)
        return gates.encrypt_bits(key, self.sk, bits)

    def decrypt_word(self, ct: lwe.Lwe) -> np.ndarray:
        """(..., nbits) ciphertext -> (...,) ints (src/main.cpp:76-85)."""
        return bits_to_int(np.asarray(gates.decrypt_bits(ct, self.sk)))

    def enroll(self, key: jax.Array, template_values) -> ClientRecord:
        return ClientRecord(
            client_id=self.client_id,
            template_ct=self.encrypt_vector(key, template_values),
            nslots=self.proto.nslots,
        )

    # -- liveness proof (src/main.cpp:569-581) ----------------------------
    def prove(self, enc_y: lwe.Lwe) -> np.ndarray:
        """Decrypt the blinded nonce y to return to the server."""
        return self.decrypt_word(enc_y)


@dataclasses.dataclass
class AuthResult:
    enc_b: lwe.Lwe   # encrypted decision word (3*bitsize bits)
    enc_y: lwe.Lwe   # encrypted blinded nonce (bitsize bits)
    r0: np.ndarray
    r1: np.ndarray


class Server:
    """Holds only the cloud key; computes the protocol homomorphically."""

    def __init__(self, ck: CloudKey, proto: ProtocolParams = PEBA1_PROTOCOL):
        self.ck = ck
        self.proto = proto
        self.be = CipherBackend(ck)
        self.db: dict[int, ClientRecord] = {}

    def register(self, record: ClientRecord) -> None:
        self.db[record.client_id] = record

    # -- Function f (src/Math.cpp:379-387) --------------------------------
    def function_f(self, probe_ct: lwe.Lwe, template_ct: lwe.Lwe,
                   enc_bound: lwe.Lwe) -> lwe.Lwe:
        return cc.function_f(self.be, probe_ct, template_ct, enc_bound,
                             self.proto.bitsize)

    # -- Function g (src/Math.cpp:390-417) --------------------------------
    def function_g(self, enc_b: lwe.Lwe, enc_r0: lwe.Lwe, enc_r1: lwe.Lwe) -> lwe.Lwe:
        return cc.function_g(self.be, enc_b, enc_r0, enc_r1, self.proto.bitsize)

    # -- full 1:1 protocol run (src/main.cpp:513-586) ---------------------
    def authenticate(self, key: jax.Array, probe_ct: lwe.Lwe,
                     template_ct: lwe.Lwe, enc_bound: lwe.Lwe) -> AuthResult:
        """Run f then g with fresh nonces.  Batched over leading dims.

        The nonces are drawn server-side; the reference encrypts them under
        the SECRET key (src/main.cpp:551-558, a protocol-model shortcut);
        here they are trivial (noiseless public) ciphertexts, which the
        cloud-key-only server can construct itself -- same gate semantics,
        actually-runnable deployment.
        """
        kr0, kr1 = jax.random.split(key)
        shape = probe_ct.shape[:-2]
        # Nonces live in [0, 2^bitsize) -- the reference's rand()%256 with
        # bitsize=8 (src/main.cpp:546-548), generalized.
        hi = 1 << self.proto.bitsize
        r0 = np.asarray(jax.random.randint(kr0, shape, 0, hi))
        r1 = np.asarray(jax.random.randint(kr1, shape, 0, hi))
        be = self.be
        enc_b = self.function_f(probe_ct, template_ct, enc_bound)
        enc_r0 = cc.const_word(be, r0, self.proto.bitsize, shape)
        enc_r1 = cc.const_word(be, r1, self.proto.bitsize, shape)
        enc_y = self.function_g(enc_b, enc_r0, enc_r1)
        return AuthResult(enc_b=enc_b, enc_y=enc_y, r0=r0, r1=r1)

    def verify_proof(self, result: AuthResult, y: np.ndarray) -> dict:
        """Server-side verdicts given the client's decrypted y.

        reference_verdict: the reference driver's printed check, y == r1
          (src/main.cpp:578-581) -- true exactly when ed > bound.
        is_match: the semantically-correct acceptance, ed <= bound.
        """
        y = np.asarray(y)
        ref = y == result.r1
        return {"reference_verdict": ref, "is_match": ~ref}

    # -- 1:N identification (BASELINE.json config 3) ----------------------
    def identify(self, probe_ct: lwe.Lwe, templates_ct: lwe.Lwe,
                 enc_bound: lwe.Lwe) -> lwe.Lwe:
        """Match one probe against N templates: returns (N, 3*bitsize) words
        of encrypted non-match bits (b_i = 1 iff ED(probe, t_i) > bound).

        templates_ct: (N, nslots, bitsize); probe broadcasts against it.
        The N-way sweep is ONE batched circuit evaluation -- every gate of
        every comparison bootstraps in the same launches.
        """
        n_templates = templates_ct.shape[0]
        probe_b = lwe.Lwe(
            jnp.broadcast_to(probe_ct.a, (n_templates,) + probe_ct.a.shape[-3:]),
            jnp.broadcast_to(probe_ct.b, (n_templates,) + probe_ct.b.shape[-2:]),
        )
        bound_b = lwe.Lwe(
            jnp.broadcast_to(enc_bound.a, (n_templates,) + enc_bound.a.shape[-2:]),
            jnp.broadcast_to(enc_bound.b, (n_templates,) + enc_bound.b.shape[-1:]),
        )
        return self.function_f(probe_b, templates_ct, bound_b)

    def identify_argmin(self, probe_ct: lwe.Lwe,
                        templates_ct: lwe.Lwe) -> "tuple[lwe.Lwe, lwe.Lwe]":
        """1:N identification via encrypted tournament argmin (config 3).

        Computes ED(probe, t_i) for all N templates as ONE batched circuit,
        then reduces with a log2(N)-round bootstrapped tournament
        (circuits.argmin_tree) carrying trivially-encrypted index words.

        Returns (enc_min_dist (max_bitsize,), enc_idx (ibits,)): the
        encrypted smallest distance and the encrypted database index that
        achieved it (ties -> lowest index).  The server learns neither.
        """
        n_templates = templates_ct.shape[0]
        probe_b = lwe.Lwe(
            jnp.broadcast_to(probe_ct.a, (n_templates,) + probe_ct.a.shape[-3:]),
            jnp.broadcast_to(probe_ct.b, (n_templates,) + probe_ct.b.shape[-2:]),
        )
        be = self.be
        dists = cc.euclidean(be, probe_b, templates_ct, self.proto.bitsize,
                             self.proto.max_bitsize)
        ibits = max(1, (n_templates - 1).bit_length())
        idx_words = cc.const_word(be, np.arange(n_templates), ibits,
                                  (n_templates,))
        return cc.argmin_tree(be, dists, idx_words)


def make_system(key: jax.Array, params: TfheParams, client_id: int = 7,
                proto: ProtocolParams = PEBA1_PROTOCOL):
    """Convenience: keygen + client device + server (the main.cpp setup,
    src/main.cpp:15-23; note ID=007 is octal => 7)."""
    sk, ck = keygen(key, params)
    client = ClientDevice(client_id, sk, ck, proto)
    server = Server(ck, proto)
    return client, server
