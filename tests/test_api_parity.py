"""API parity additions: digest<->xfe conversions, flat views, cyclic group
elements, power accumulator, digest corruptor, mmra_with_mps fixture, and
the prelude surface."""

import numpy as np
import pytest

from twenty_first_tpu.errors import TryFromXFieldElementError
from twenty_first_tpu.prelude import (
    ArchivalMmr,
    BFieldElement,
    Digest,
    LeafMutation,
    MerkleTree,
    Mmr,
    MmrAccumulator,
    MmrMembershipProof,
    MmrSuccessorProof,
    Polynomial,
    Sponge,
    Tip5,
    XFieldElement,
    bfe,
    bfe_vec,
    xfe,
    xfe_vec,
)
from twenty_first_tpu.math.x_field_element import as_flat_list
from twenty_first_tpu.tip5.digest import DigestCorruptor
from twenty_first_tpu.util_types.mmr.mmr_accumulator import mmra_with_mps

RNG = np.random.default_rng(6)


def test_xfe_digest_roundtrip():
    x = xfe((1, 2, 3))
    d = x.to_digest()
    assert d == Digest([1, 2, 3, 0, 0])
    assert XFieldElement.try_from_digest(d) == x
    with pytest.raises(TryFromXFieldElementError):
        XFieldElement.try_from_digest(Digest([1, 2, 3, 4, 0]))


def test_as_flat_list():
    xs = xfe_vec([(1, 2, 3), (4, 5, 6)])
    assert as_flat_list(xs) == bfe_vec([1, 2, 3, 4, 5, 6])


def test_cyclic_group_elements():
    omega = BFieldElement.primitive_root_of_unity(8)
    group = omega.get_cyclic_group_elements()
    assert len(group) == 8
    assert group[0].is_one()
    assert group[1] == omega
    assert (omega * group[-1]).is_one()
    capped = omega.get_cyclic_group_elements(3)
    assert capped == group[:3]
    lifted = omega.lift().get_cyclic_group_elements()
    assert len(lifted) == 8


def test_power_accumulator():
    base = bfe_vec([3, 5])
    tail = bfe_vec([7, 11])
    got = BFieldElement.power_accumulator(base, tail, 2)
    assert got == [bfe(3).mod_pow(4) * bfe(7), bfe(5).mod_pow(4) * bfe(11)]


def test_digest_corruptor():
    d = Digest([1, 2, 3, 4, 5])
    corrupted = DigestCorruptor([0, 4], [1, -1]).corrupt(d)
    assert corrupted == Digest([2, 2, 3, 4, 4])
    with pytest.raises(ValueError):
        DigestCorruptor([0], [0])


@pytest.mark.parametrize("leaf_count,indices", [
    (1, [0]),
    (8, [0, 5]),
    (11, [0, 7, 8, 10]),
    (1 << 40, [0, 12345, (1 << 40) - 1]),
    (6, []),
])
def test_mmra_with_mps(leaf_count, indices):
    specified = [
        (i, Digest([int(v) for v in RNG.integers(0, 2**60, 5)]))
        for i in indices
    ]
    acc, proofs = mmra_with_mps(leaf_count, specified, rng=RNG)
    assert acc.num_leafs() == leaf_count
    assert acc.is_consistent()
    for (leaf_index, digest), proof in zip(specified, proofs):
        assert proof.verify(leaf_index, digest, acc.peaks(), leaf_count), \
            leaf_index


def test_prelude_surface():
    # everything the reference prelude re-exports resolves here
    for symbol in [BFieldElement, XFieldElement, Polynomial, Digest, Tip5,
                   MerkleTree, MmrMembershipProof, Mmr, MmrAccumulator,
                   ArchivalMmr, MmrSuccessorProof, LeafMutation, Sponge]:
        assert symbol is not None


def test_round2_parity_shims():
    """Small reference-surface functions added for line-by-line parity."""
    from twenty_first_tpu.math.b_field_element import bfe
    from twenty_first_tpu.math.x_field_element import as_flat_slice, xfe
    from twenty_first_tpu.tip5.digest import Digest, DigestCorruptor
    from twenty_first_tpu.util_types.merkle_tree import (
        MerkleTree, MerkleTreeError, MerkleTreeInclusionProof)

    v = bfe(5)
    assert v.raw_u128() == v.raw_u64()
    assert v.increment() == bfe(6)
    assert v.decrement() == bfe(4)
    assert as_flat_slice([xfe((1, 2, 3))]) == [bfe(1), bfe(2), bfe(3)]

    d = Digest([bfe(i) for i in range(5)])
    c = DigestCorruptor([0], [bfe(99)])
    assert c.corrupt_digest(d).values()[0] == bfe(99)
    import pytest
    with pytest.raises(ValueError):
        DigestCorruptor([0], [bfe(0)])

    leafs = [Digest([bfe(i)] * 5) for i in range(4)]
    tree = MerkleTree.new(leafs)
    proof = tree.inclusion_proof_for_leaf_indices([1])
    proof.try_verify(tree.root())  # no raise
    bad = Digest([bfe(7)] * 5)
    with pytest.raises(MerkleTreeError):
        proof.try_verify(bad)


def test_digest_reversed_involution():
    d = Digest([1, 2, 3, 4, 5])
    assert d.reversed() == Digest([5, 4, 3, 2, 1])
    assert d.reversed().reversed() == d


def test_polynomial_scalar_mul_mut_and_into_owned():
    f = Polynomial([bfe(1), bfe(2), bfe(3)])
    f.scalar_mul_mut(bfe(2))
    assert f == Polynomial([bfe(2), bfe(4), bfe(6)])
    assert f.into_owned() is f


def test_ntt_table_helpers():
    from twenty_first_tpu.math import ntt as ntt_mod

    swaps = ntt_mod.swap_indices(8)
    # k=1 <-> 4, k=3 <-> 6; self-paired and already-swapped entries None
    assert swaps == [None, 4, None, 6, None, None, None, None]
    omega = BFieldElement.primitive_root_of_unity(8)
    tables = ntt_mod.twiddle_factors(8, omega)
    assert [len(t) for t in tables] == [1, 2, 4]
    assert int(tables[0][0]) == 1
    assert int(tables[2][1]) == omega.value()
