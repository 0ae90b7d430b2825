"""Lattice tests: the reference-table derivation pinned against hardcoded
values (lattice.rs:17-201), NTT/iNTT roundtrips, schoolbook-vs-coset-NTT
negacyclic multiplication (lattice.rs:876-896), module algebra, message
embedding, SHAKE/SHA3 KATs, and the KEM (roundtrip + corruption rejection,
lattice.rs:899-974)."""

import hashlib

import numpy as np
import pytest

from twenty_first_tpu.math import lattice
from twenty_first_tpu.math.b_field_element import P, bfe
from twenty_first_tpu.math.lattice import (
    CyclotomicRingElement,
    Ciphertext,
    ModuleElement,
    coset_intt_noswap_64,
    coset_ntt_noswap_64,
    dec,
    embed_msg,
    enc,
    extract_msg,
    keygen,
    sample_short_bfield_element,
)

RNG = np.random.default_rng(2024)


def rand_ring():
    return CyclotomicRingElement(RNG.integers(0, P, 64, dtype=np.uint64))


def test_psi_tables_match_reference_constants():
    fwd = lattice.POWERS_OF_PSI_BITREVERSED
    # spot-pin against lattice.rs hardcoded tables
    assert fwd[0] == 1
    assert fwd[1] == 281474976710656
    assert fwd[8] == 64
    assert fwd[16] == 8
    assert fwd[32] == 2198989700608
    assert fwd[63] == 18446743794540871745
    inv = lattice.POWERS_OF_PSI_INV_BITREVERSED
    assert inv[1] == 18446462594437873665
    assert inv[8] == 18158513693329981441
    assert inv[63] == 18446741870424883713
    assert lattice.N_INV == 18158513693329981441


def test_ntt_intt_roundtrip():
    x = RNG.integers(0, P, size=(5, 64), dtype=np.uint64)
    np.testing.assert_array_equal(
        coset_intt_noswap_64(coset_ntt_noswap_64(x)), x
    )
    np.testing.assert_array_equal(
        coset_ntt_noswap_64(coset_intt_noswap_64(x)), x
    )


def schoolbook_negacyclic_mul(a, b):
    out = [0] * 64
    for i in range(64):
        for j in range(64):
            k = i + j
            prod = int(a[i]) * int(b[j]) % P
            if k >= 64:
                out[k - 64] = (out[k - 64] - prod) % P
            else:
                out[k] = (out[k] + prod) % P
    return np.array(out, dtype=np.uint64)


def test_ntt_mul_matches_schoolbook():
    a, b = rand_ring(), rand_ring()
    fast = a * b
    want = schoolbook_negacyclic_mul(a.coefficients, b.coefficients)
    np.testing.assert_array_equal(fast.coefficients, want)


def test_embed_extract_roundtrip():
    msg = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    assert extract_msg(embed_msg(msg)) == msg
    # robust to small additive noise (the KEM's correctness property)
    noisy = embed_msg(msg)
    noise = CyclotomicRingElement(
        RNG.integers(0, 1 << 10, 64, dtype=np.uint64)
    )
    assert extract_msg(noisy + noise) == msg


def test_sample_short():
    e = sample_short_bfield_element(bytes([0xFF, 0, 0, 0, 0, 0, 0, 0]))
    assert e == bfe(8 << 48)
    e2 = sample_short_bfield_element(bytes([0, 0, 0, 0, 0xFF, 0, 0, 0]))
    assert e2 == bfe(-(8 << 48))
    assert sample_short_bfield_element(bytes(8)) == bfe(0)


def test_module_multiply_consistency():
    lhs = ModuleElement(RNG.integers(0, P, (4, 64), dtype=np.uint64))
    rhs = ModuleElement(RNG.integers(0, P, (4, 64), dtype=np.uint64))
    # (1x4) @ (4x1)
    slow = ModuleElement.multiply(lhs, rhs, 1, 4, 1)
    fast = ModuleElement.fast_multiply(lhs, rhs, 1, 4, 1)
    assert slow == fast
    # (2x2) @ (2x2)
    slow2 = ModuleElement.multiply(lhs, rhs, 2, 2, 2)
    fast2 = ModuleElement.fast_multiply(lhs, rhs, 2, 2, 2)
    assert slow2 == fast2


def test_shake_and_sha3_kats():
    # FIPS 202 known-answer values (same role as the reference's XKCP KATs)
    assert hashlib.shake_256(b"").hexdigest(32) == (
        "46b9dd2b0ba88d13233b3feb743eeb243fcd52ea62b81b82b50c27646ed5762f"
    )
    assert hashlib.sha3_256(b"").hexdigest() == (
        "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a"
    )


def test_kem_roundtrip():
    randomness = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    sk, pk = keygen(randomness)
    enc_randomness = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    shared_enc, ctxt = enc(pk, enc_randomness)
    shared_dec = dec(sk, ctxt)
    assert shared_dec == shared_enc
    # determinism
    shared_enc2, ctxt2 = enc(pk, enc_randomness)
    assert shared_enc2 == shared_enc and ctxt2 == ctxt


def test_kem_rejects_corruption():
    sk, pk = keygen(bytes(32))
    shared, ctxt = enc(pk, bytes(range(32)))
    bad_elements = ctxt.bg.elements.copy()
    bad_elements[0, 0] ^= np.uint64(1)
    bad = Ciphertext(bg=ModuleElement(bad_elements), bga_m=ctxt.bga_m)
    assert dec(sk, bad) is None
    # wrong secret key
    sk2, _ = keygen(bytes([1] * 32))
    assert dec(sk2, ctxt) is None


def test_ciphertext_bfe_roundtrip():
    _, pk = keygen(bytes([7] * 32))
    _, ctxt = enc(pk, bytes([9] * 32))
    elements = ctxt.to_bfes()
    assert len(elements) == lattice.CIPHERTEXT_SIZE_IN_BFES == 320
    assert Ciphertext.from_bfes(elements) == ctxt


class TestKemSerde:
    """Key/ciphertext serialization roundtrips (lattice.rs:999-1026)."""

    def _fresh(self):
        import numpy as np
        from twenty_first_tpu.math import lattice

        rng = np.random.default_rng(99)
        key_rand = bytes(rng.integers(0, 256, size=32, dtype=np.uint8))
        ct_rand = bytes(rng.integers(0, 256, size=32, dtype=np.uint8))
        sk, pk = lattice.keygen(key_rand)
        shared, ct = lattice.enc(pk, ct_rand)
        return sk, pk, shared, ct

    def test_bytes_roundtrips(self):
        from twenty_first_tpu.math import lattice

        sk, pk, shared, ct = self._fresh()
        assert lattice.SecretKey.from_bytes(sk.to_bytes()) == sk
        assert lattice.PublicKey.from_bytes(pk.to_bytes()) == pk
        assert lattice.Ciphertext.from_bytes(ct.to_bytes()) == ct

    def test_json_roundtrips(self):
        from twenty_first_tpu.math import lattice

        sk, pk, shared, ct = self._fresh()
        assert lattice.SecretKey.from_json(sk.to_json()) == sk
        assert lattice.PublicKey.from_json(pk.to_json()) == pk
        ct2 = lattice.Ciphertext.from_json(ct.to_json())
        assert ct2 == ct
        # deserialized ciphertext still decapsulates
        assert lattice.dec(sk, ct2) == shared

    def test_zeroize(self):
        sk, _, _, _ = self._fresh()
        sk.zeroize()
        assert sk.key == bytes(32) and sk.seed == bytes(32)

    def test_bad_lengths_raise(self):
        import pytest
        from twenty_first_tpu.math import lattice
        from twenty_first_tpu.errors import LatticeError

        with pytest.raises(LatticeError):
            lattice.SecretKey.from_bytes(b"short")
        with pytest.raises(LatticeError):
            lattice.PublicKey.from_bytes(b"short")
        with pytest.raises(LatticeError):
            lattice.Ciphertext.from_bytes(b"short")
        with pytest.raises(LatticeError):
            lattice.keygen(b"short")
