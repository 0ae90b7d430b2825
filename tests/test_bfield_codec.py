"""Codec tests: roundtrips for every wire type, exact-consumption rules,
reverse-field-order struct encoding (matching bfieldcodec_derive), and the
reference's corner cases (trailing-zero polynomial rejection, Option tags,
range checks)."""

import numpy as np
import pytest

from twenty_first_tpu.errors import BFieldCodecError
from twenty_first_tpu.math.b_field_element import bfe, P
from twenty_first_tpu.math.bfield_codec import (
    BFE, BOOL, DIGEST, I32, I64, U8, U32, U64, U128, XFE,
    Arr, ObjCodec, Opt, PolyCodec, Tup, Vec_,
    bfield_codec, encode,
)
from twenty_first_tpu.math.polynomial import Polynomial
from twenty_first_tpu.math.x_field_element import xfe
from twenty_first_tpu.tip5 import Digest, Tip5

RNG = np.random.default_rng(5)


def roundtrip(desc, value):
    enc = desc.encode(value)
    dec = desc.decode(enc)
    assert dec == value, (value, enc, dec)
    return enc


def test_primitives():
    assert roundtrip(BFE, bfe(42)) == [bfe(42)]
    assert roundtrip(BOOL, True) == [bfe(1)]
    assert roundtrip(U8, 200) == [bfe(200)]
    assert roundtrip(U32, 1 << 31) == [bfe(1 << 31)]
    # u64: two 32-bit little-endian chunks
    enc = roundtrip(U64, (5 << 32) | 7)
    assert enc == [bfe(7), bfe(5)]
    assert len(roundtrip(U128, (1 << 100) + 99)) == 4
    roundtrip(I64, -123456789)
    roundtrip(I32, -1)
    assert I64.encode(-1) == U64.encode((1 << 64) - 1)


def test_range_checks():
    with pytest.raises(BFieldCodecError):
        U8.decode([bfe(256)])
    with pytest.raises(BFieldCodecError):
        BOOL.decode([bfe(2)])
    with pytest.raises(BFieldCodecError):
        U64.decode([bfe(1 << 33), bfe(0)])  # chunk exceeds u32


def test_exact_consumption():
    with pytest.raises(BFieldCodecError):
        BFE.decode([bfe(1), bfe(2)])
    with pytest.raises(BFieldCodecError):
        BFE.decode([])
    with pytest.raises(BFieldCodecError):
        Vec_(BFE).decode([bfe(2), bfe(1)])  # one element missing


def test_xfe_digest():
    roundtrip(XFE, xfe((1, 2, 3)))
    roundtrip(DIGEST, Digest([9, 8, 7, 6, 5]))


def test_vec_and_array():
    v = [bfe(int(x)) for x in RNG.integers(0, P, 7, dtype=np.uint64)]
    enc = roundtrip(Vec_(BFE), v)
    assert enc[0] == bfe(7) and len(enc) == 8
    roundtrip(Arr(BFE, 7), v)
    # nested: Vec<Vec<bfe>> — inner vecs are dynamic, so length-prefixed
    vv = [[bfe(1)], [bfe(2), bfe(3)], []]
    enc2 = roundtrip(Vec_(Vec_(BFE)), vv)
    assert enc2[0] == bfe(3)
    roundtrip(Vec_(U64), [1, 2, (1 << 63)])
    roundtrip(Vec_(BFE), [])


def test_option():
    assert roundtrip(Opt(U64), None) == [bfe(0)]
    enc = roundtrip(Opt(U64), 77)
    assert enc[0] == bfe(1)
    with pytest.raises(BFieldCodecError):
        Opt(U64).decode([bfe(0), bfe(1)])  # None + trailing junk


def test_tuple_reverse_order():
    # (u64, vec<bfe>) encodes the vec FIRST (reverse declaration order),
    # with a length prefix because Vec is dynamic.
    desc = Tup(U64, Vec_(BFE))
    value = (5, [bfe(1), bfe(2)])
    enc = roundtrip(desc, value)
    # vec encoding: [count=2, 1, 2] -> prefixed by its length 3
    assert enc[:4] == [bfe(3), bfe(2), bfe(1), bfe(2)]
    assert enc[4:] == [bfe(5), bfe(0)]
    assert desc.static_length() is None
    assert Tup(U64, BFE).static_length() == 3


def test_polynomial_codec():
    p = Polynomial([bfe(3), bfe(0), bfe(5)])
    desc = PolyCodec(BFE)
    enc = roundtrip(desc, p)
    # trailing zeros rejected
    bad = enc[:-1] + [bfe(0)]
    bad[0] = bfe(enc[0].value())  # length indicator unchanged
    with pytest.raises(BFieldCodecError):
        desc.decode(bad)
    roundtrip(desc, Polynomial.zero())
    roundtrip(PolyCodec(XFE), Polynomial([xfe((1, 2, 3)), xfe(9)]))


def test_struct_derive_equivalent():
    @bfield_codec(fields=[("count", U64), ("items", Vec_(DIGEST)),
                          ("flag", BOOL)])
    class Thing:
        def __init__(self, count, items, flag):
            self.count = count
            self.items = items
            self.flag = flag

        def __eq__(self, other):
            return (self.count, self.items, self.flag) == \
                (other.count, other.items, other.flag)

    t = Thing(3, [Digest([1, 2, 3, 4, 5])], True)
    enc = t.encode()
    # reverse field order: flag first (static, no prefix), then items
    # (dynamic, prefixed), then count (static)
    assert enc[0] == bfe(1)  # flag
    assert enc[1] == bfe(6)  # items field length (count word + 5)
    assert enc[2] == bfe(1)  # items count
    assert Thing.decode(enc) == t
    assert Thing.static_length() is None
    with pytest.raises(BFieldCodecError):
        Thing.decode(enc + [bfe(0)])

    @bfield_codec(fields=[("a", BFE), ("b", U32)])
    class Static:
        def __init__(self, a, b):
            self.a, self.b = a, b

    assert Static.static_length() == 2


def test_enum_derive_equivalent():
    @bfield_codec(variants=[("A", []), ("B", [("x", U64)]),
                            ("C", [("v", Vec_(BFE))])])
    class E:
        def __init__(self, variant, **kw):
            self.variant = variant
            for k, v in kw.items():
                setattr(self, k, v)

        def __eq__(self, other):
            return self.variant == other.variant and \
                getattr(self, "x", None) == getattr(other, "x", None) and \
                getattr(self, "v", None) == getattr(other, "v", None)

    for e in [E("A"), E("B", x=(1 << 40)), E("C", v=[bfe(5), bfe(6)])]:
        enc = e.encode()
        assert E.decode(enc) == e
    assert E("B", x=1).encode()[0] == bfe(1)
    with pytest.raises(BFieldCodecError):
        E.decode([bfe(3)])


def test_hash_of_encodable():
    # Tip5.hash(value) == hash_varlen(encode(value)) (tip5/mod.rs:593-595)
    v = [bfe(4), bfe(5)]
    assert Tip5.hash(v) == Tip5.hash_varlen(encode(v))


def test_generic_encode():
    assert encode(bfe(3)) == [bfe(3)]
    assert encode([bfe(1), bfe(2)])[0] == bfe(2)
    assert encode(7) == [bfe(7), bfe(0)]  # ints as u64


def test_decorator_rejects_bad_specs():
    """Decoration-time validation — the analogue of the derive macro's
    trybuild compile-fail cases (twenty-first/trybuild/*.rs)."""
    import pytest

    from twenty_first_tpu.math.bfield_codec import (
        BFE, U64, BFieldCodecError, bfield_codec)

    # incorrect_field_attribute.rs: not a codec type
    with pytest.raises(BFieldCodecError):
        @bfield_codec(fields=[("a", int)])
        class Bad1:
            pass

    # multiple_field_attributes.rs: duplicated ignore
    with pytest.raises(BFieldCodecError):
        @bfield_codec(fields=[("a", BFE)], ignore=["b", "b"])
        class Bad2:
            b = 0

    with pytest.raises(BFieldCodecError):
        @bfield_codec(fields=[("a", BFE), ("a", U64)])
        class Bad3:
            pass

    with pytest.raises(BFieldCodecError):
        @bfield_codec(fields=[("a", BFE)], ignore=["a"])
        class Bad4:
            pass

    with pytest.raises(BFieldCodecError):
        @bfield_codec(variants=[("A", []), ("A", [])])
        class Bad5:
            pass

    # missing_field_attribute.rs analogue: plain well-formed spec passes
    @bfield_codec(fields=[("a", BFE)])
    class Good:
        def __init__(self, a):
            self.a = a
