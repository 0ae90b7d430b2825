"""Remaining small parity fill-ins: NTT edge shapes (ntt.rs), ZerofierTree
edges (zerofier_tree.rs), lattice module algebra (lattice.rs), codec enum
discriminants (bfield_codec.rs / bfieldcodec_derive)."""

import random

import numpy as np

from twenty_first_tpu.math import ntt as ntt_mod
from twenty_first_tpu.math.b_field_element import P, bfe
from twenty_first_tpu.math.polynomial import Polynomial
from twenty_first_tpu.math.zerofier_tree import ZerofierTree


def test_ntt_on_empty_input():
    # ntt.rs `ntt_on_empty_input`
    out = ntt_mod.ntt_values(np.zeros(0, dtype=np.uint64))
    assert out.shape == (0,)


def test_ntt_on_input_of_length_one():
    # ntt.rs `ntt_on_input_of_length_one`
    out = ntt_mod.ntt_values(np.array([7], dtype=np.uint64))
    assert out.tolist() == [7]
    back = ntt_mod.ntt_values(out, inverse=True)
    assert back.tolist() == [7]


def test_ntt_on_input_of_length_0_then_1_then_0():
    # ntt.rs `ntt_on_input_of_length_0_then_1_then_0` (cache-order guard)
    assert ntt_mod.ntt_values(np.zeros(0, dtype=np.uint64)).shape == (0,)
    assert ntt_mod.ntt_values(np.array([3], dtype=np.uint64)).tolist() == [3]
    assert ntt_mod.ntt_values(np.zeros(0, dtype=np.uint64)).shape == (0,)


def test_bfield_max_value_ntt_roundtrips():
    # ntt.rs `bfield_max_value_test_of_chu_ntt`
    arr = np.full(8, P - 1, dtype=np.uint64)
    out = ntt_mod.ntt_values(arr)
    back = ntt_mod.ntt_values(out, inverse=True)
    assert back.tolist() == arr.tolist()


def test_zerofier_tree_can_be_empty():
    # zerofier_tree.rs `zerofier_tree_can_be_empty`
    tree = ZerofierTree.new_from_domain([])
    assert tree.zerofier() == Polynomial.one()


def test_zerofier_tree_root_is_multiple_of_children_and_right_degree():
    # zerofier_tree.rs `zerofier_tree_root_is_multiple_of_children`,
    # `zerofier_tree_root_has_right_degree`, `zerofier_tree_root_zerofies`
    rng = random.Random(1)
    domain = [bfe(rng.randrange(P)) for _ in range(40)]
    domain = list({d.value(): d for d in domain}.values())
    tree = ZerofierTree.new_from_domain(domain)
    z = tree.zerofier()
    assert z.degree() == len(domain)
    for d in domain:
        assert z.evaluate(d) == bfe(0)
    root = tree.root
    if not root.is_leaf:
        for child in (root.left, root.right):
            _, r = z.divide(_child_poly(child))
            assert r.is_zero()


def _child_poly(child):
    z = child.zerofier
    if isinstance(z, Polynomial):
        return z
    return Polynomial.from_array(np.asarray(z).copy(), False)


def test_module_element_distributivity_and_zero():
    # lattice.rs `test_module_distributivity` / `zero_test`
    from twenty_first_tpu.math.lattice import ModuleElement

    rng = random.Random(2)

    def rand_me(n):
        randomness = bytes(rng.randrange(256) for _ in range(8 * 64 * n))
        return ModuleElement.sample_short(randomness, n)

    a, b = rand_me(4), rand_me(4)
    z = ModuleElement.zero(4)
    assert (a + z) == a
    assert (a - a) == z
    c = (a + b) - b
    assert c == a


def test_enum_discriminant_can_be_accessed():
    # bfieldcodec_derive `enums_bfield_codec_discriminant_can_be_accessed`
    from twenty_first_tpu.math.bfield_codec import U64, bfield_codec

    @bfield_codec(variants=[("Red", []), ("Green", [("x", U64)]),
                            ("Blue", [])])
    class Color:
        def __init__(self, variant, x=0):
            self.variant = variant
            self.x = x

    assert Color("Red").bfield_codec_discriminant == 0
    assert Color("Green", 5).bfield_codec_discriminant == 1
    assert Color("Blue").bfield_codec_discriminant == 2
