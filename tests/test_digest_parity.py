"""Digest behavior parity with the reference inline tests
(twenty-first/src/tip5/digest.rs, cited per test)."""

import random

import pytest

from twenty_first_tpu.errors import (
    TryFromDigestError, TryFromHexDigestError)
from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.tip5.digest import Digest


def test_display_is_as_expected():
    # digest.rs:338-345
    d = Digest([1, 2, 3, 4, 5])
    assert str(d) == "1,2,3,4,5"
    assert d.to_hex() == (
        "0100000000000000020000000000000003000000000000000"
        "4000000000000000500000000000000")


def test_digest_ordering_table():
    # digest.rs:461-480 `digest_ordering` (reversed-limb lexicographic)
    val0 = Digest([0] * 5)
    val1 = Digest([14, 0, 0, 0, 0])
    val2 = Digest([14] * 5)
    val3 = Digest([15, 14, 14, 14, 14])
    val4 = Digest([14, 15, 14, 14, 14])
    assert val1 > val0
    assert val2 > val1 and val2 > val0
    assert val3 > val2 and val3 > val1 and val3 > val0
    assert val4 > val3 and val4 > val2


def test_digest_biguint_overflow():
    # digest.rs:483-489: 2^384 does not fit in five base-p limbs
    with pytest.raises(TryFromDigestError):
        Digest.from_biguint((1 << 96) ** 4)
    with pytest.raises(TryFromDigestError):
        Digest.from_biguint(P ** 5)
    # largest representable value is p^5 - 1
    top = Digest.from_biguint(P ** 5 - 1)
    assert top.to_biguint() == P ** 5 - 1


def test_digest_biguint_conversion_simple():
    # digest.rs `digest_biguint_conversion_simple_test`
    assert Digest.from_biguint(0) == Digest.all_zero()
    assert Digest.from_biguint(42).values()[0].value() == 42
    assert Digest.from_biguint(P).values()[1].value() == 1
    assert Digest.from_biguint(P).values()[0].value() == 0


def test_digest_biguint_conversion_pbt():
    # digest.rs `digest_biguint_conversion_pbt`
    rng = random.Random(0xD16)
    for _ in range(50):
        v = rng.randrange(P ** 5)
        assert Digest.from_biguint(v).to_biguint() == v
    for _ in range(50):
        d = Digest([rng.randrange(P) for _ in range(5)])
        assert Digest.from_biguint(d.to_biguint()) == d


def test_bfe_vector_of_incorrect_length_cannot_become_a_digest():
    # digest.rs `bfe_vector_of_incorrect_length_cannot_become_a_digest`
    for n in (0, 1, 4, 6, 10):
        with pytest.raises(TryFromDigestError):
            Digest(range(n))


def test_forty_bytes_can_be_converted_to_digest():
    # digest.rs `forty_bytes_can_be_converted_to_digest` + bytes involution
    rng = random.Random(1)
    for _ in range(20):
        d = Digest([rng.randrange(P) for _ in range(5)])
        raw = d.to_bytes()
        assert len(raw) == 40
        assert Digest.from_bytes(raw) == d
    with pytest.raises(TryFromDigestError):
        Digest.from_bytes(bytes(39))
    with pytest.raises(TryFromDigestError):
        Digest.from_bytes(bytes(41))


def test_try_from_bytes_not_canonical():
    # digest.rs `try_from_bytes_not_canonical`
    bad = P.to_bytes(8, "little") + bytes(32)
    with pytest.raises(TryFromDigestError):
        Digest.from_bytes(bad)
    bad = (2 ** 64 - 1).to_bytes(8, "little") + bytes(32)
    with pytest.raises(TryFromDigestError):
        Digest.from_bytes(bad)


def test_from_str_not_canonical():
    # digest.rs `from_str_not_canonical`
    with pytest.raises(TryFromDigestError):
        Digest.from_str(f"{P},1,2,3,4")
    with pytest.raises(TryFromDigestError):
        Digest.from_str(f"{-P},1,2,3,4")
    with pytest.raises(TryFromDigestError):
        Digest.from_str("nonsense,1,2,3,4")


def test_hex_reciprocal_and_errors():
    # digest.rs `to_hex_and_from_hex_are_reciprocal*`,
    # `digest_from_invalid_hex_errors`
    rng = random.Random(2)
    for _ in range(20):
        d = Digest([rng.randrange(P) for _ in range(5)])
        assert Digest.try_from_hex(d.to_hex()) == d
    with pytest.raises(TryFromHexDigestError):
        Digest.try_from_hex("zz" * 40)
    with pytest.raises(TryFromHexDigestError):
        Digest.try_from_hex("abc")  # odd length
    with pytest.raises(TryFromDigestError):
        Digest.try_from_hex("00" * 39)  # wrong byte count


def test_any_digest_can_be_hashed():
    # digest.rs `any_digest_can_be_hashed`: d.hash() == hash_pair(d, 0^5)
    from twenty_first_tpu.tip5.tip5 import Tip5

    rng = random.Random(3)
    for _ in range(5):
        d = Digest([rng.randrange(P) for _ in range(5)])
        assert d.hash() == Tip5.hash_pair(d, Digest.all_zero())


def test_digest_corruptor_rejects_uncorrupting_corruption():
    # digest.rs:300-324 `digest_corruptor_rejects_uncorrupting_corruption`
    from twenty_first_tpu.tip5.digest import DigestCorruptor

    d = Digest([1, 2, 3, 4, 5])
    with pytest.raises(ValueError):
        DigestCorruptor([1], [d.values()[1]]).corrupt_digest(d)
