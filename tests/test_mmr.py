"""MMR tests: ArchivalMmr as ground-truth oracle for MmrAccumulator (the
reference's own strategy, archival_mmr.rs:1-12), index math spot checks,
membership-proof maintenance under appends/mutations, bagging, batch
updates, and successor proofs."""

import numpy as np
import pytest

from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.tip5 import Digest
from twenty_first_tpu.util_types.mmr import (
    ArchivalMmr,
    LeafMutation,
    MmrAccumulator,
    MmrMembershipProof,
    MmrSuccessorProof,
    shared_advanced,
    shared_basic,
)

RNG = np.random.default_rng(777)


def rand_digest():
    return Digest([int(v) for v in RNG.integers(0, P, 5, dtype=np.uint64)])


def rand_digests(n):
    return [rand_digest() for _ in range(n)]


# --- index math -----------------------------------------------------------


def test_leaf_index_to_node_index():
    # First few values of the classic MMR node numbering
    expected = [1, 2, 4, 5, 8, 9, 11, 12, 16]
    got = [shared_advanced.leaf_index_to_node_index(i) for i in range(9)]
    assert got == expected


def test_num_leafs_to_num_nodes():
    for n, want in [(0, 0), (1, 1), (2, 3), (3, 4), (4, 7), (5, 8), (11, 19)]:
        assert shared_advanced.num_leafs_to_num_nodes(n) == want


def test_node_index_leaf_index_roundtrip():
    for leaf_index in range(200):
        node = shared_advanced.leaf_index_to_node_index(leaf_index)
        assert shared_advanced.node_index_to_leaf_index(node) == leaf_index
    # internal nodes map to None
    assert shared_advanced.node_index_to_leaf_index(3) is None
    assert shared_advanced.node_index_to_leaf_index(7) is None


def test_peak_heights():
    assert shared_advanced.get_peak_heights(0b1010) == [3, 1]
    assert shared_advanced.get_peak_heights(0b1011) == [3, 1, 0]
    heights, indices = \
        shared_advanced.get_peak_heights_and_peak_node_indices(3)
    assert heights == [1, 0] and indices == [3, 4]
    heights, indices = \
        shared_advanced.get_peak_heights_and_peak_node_indices(11)
    assert heights == [3, 1, 0] and indices == [15, 18, 19]


def test_mt_index_and_peak_index():
    # num_leafs = 11 = 0b1011: peaks of heights 3, 1, 0
    assert shared_basic.leaf_index_to_mt_index_and_peak_index(0, 11) == (8, 0)
    assert shared_basic.leaf_index_to_mt_index_and_peak_index(7, 11) == (15, 0)
    assert shared_basic.leaf_index_to_mt_index_and_peak_index(8, 11) == (2, 1)
    assert shared_basic.leaf_index_to_mt_index_and_peak_index(10, 11) == (1, 2)
    with pytest.raises(AssertionError):
        shared_basic.leaf_index_to_mt_index_and_peak_index(11, 11)


def test_right_lineage_length():
    for node_index in range(1, 300):
        slow = shared_advanced.right_lineage_length_and_own_height(node_index)[0]
        fast = shared_advanced.right_lineage_length_from_node_index(node_index)
        assert slow == fast, node_index


# --- accumulator vs archival oracle ---------------------------------------


@pytest.mark.parametrize("n", [0, 1, 2, 3, 7, 8, 11, 32, 57])
def test_accumulator_matches_archival(n):
    leafs = rand_digests(n)
    acc = MmrAccumulator.new_from_leafs(leafs)
    arch = ArchivalMmr(leafs)
    assert acc.peaks() == arch.peaks()
    assert acc.num_leafs() == arch.num_leafs() == n
    assert acc.bag_peaks() == arch.bag_peaks()
    assert arch.to_accumulator() == acc


def test_peaks_from_leafs_device_path_matches_sequential():
    from twenty_first_tpu import config

    n = 1200  # above the device cutoff; 1200 = 0b10010110000
    leafs = rand_digests(n)
    peaks_device = MmrAccumulator.peaks_from_leafs(leafs)
    config.set_merkle_tree_parallelization_cutoff(10**9)
    try:
        peaks_seq = MmrAccumulator.peaks_from_leafs(leafs)
    finally:
        config.set_merkle_tree_parallelization_cutoff(512)
    assert peaks_device == peaks_seq


def test_append_returns_valid_membership_proof():
    acc = MmrAccumulator.new_from_leafs([])
    arch = ArchivalMmr()
    leafs = rand_digests(20)
    for i, leaf in enumerate(leafs):
        mp_acc = acc.append(leaf)
        mp_arch = arch.append(leaf)
        assert acc.peaks() == arch.peaks()
        assert mp_acc == mp_arch
        assert mp_acc.verify(i, leaf, acc.peaks(), acc.num_leafs())


def test_membership_proofs_from_archival_verify():
    n = 23
    leafs = rand_digests(n)
    arch = ArchivalMmr(leafs)
    peaks = arch.peaks()
    for i in range(n):
        mp = arch.prove_membership(i)
        assert mp.verify(i, leafs[i], peaks, n), i
        # wrong leaf fails
        assert not mp.verify(i, rand_digest(), peaks, n)
        # wrong index fails
        assert not mp.verify((i + 1) % n, leafs[i], peaks, n) or n == 1


def test_mutate_leaf():
    n = 13
    leafs = rand_digests(n)
    acc = MmrAccumulator.new_from_leafs(leafs)
    arch = ArchivalMmr(leafs)
    for target in [0, 5, 12]:
        new_leaf = rand_digest()
        mp = arch.prove_membership(target)
        acc.mutate_leaf(LeafMutation(target, new_leaf, mp))
        arch.mutate_leaf_unchecked(target, new_leaf)
        leafs[target] = new_leaf
        assert acc.peaks() == arch.peaks()
        assert MmrAccumulator.new_from_leafs(leafs).peaks() == acc.peaks()


def test_update_membership_proof_from_append():
    n = 11
    leafs = rand_digests(n)
    arch = ArchivalMmr(leafs)
    tracked = [(i, arch.prove_membership(i)) for i in range(n)]
    new_leaf = rand_digest()
    old_peaks = arch.peaks()
    arch.append(new_leaf)
    for i, mp in tracked:
        mp.update_from_append(i, n, new_leaf, old_peaks)
        assert mp.verify(i, leafs[i], arch.peaks(), n + 1), i


def test_batch_update_from_append():
    n = 15
    leafs = rand_digests(n)
    arch = ArchivalMmr(leafs)
    proofs = [arch.prove_membership(i) for i in range(n)]
    indices = list(range(n))
    new_leaf = rand_digest()
    old_peaks = arch.peaks()
    arch.append(new_leaf)
    MmrMembershipProof.batch_update_from_append(
        proofs, indices, n, new_leaf, old_peaks
    )
    for i in range(n):
        assert proofs[i].verify(i, leafs[i], arch.peaks(), n + 1), i


def test_update_membership_proof_from_leaf_mutation():
    n = 14
    leafs = rand_digests(n)
    arch = ArchivalMmr(leafs)
    target = 3
    new_leaf = rand_digest()
    mutation_mp = arch.prove_membership(target)
    mutation = LeafMutation(target, new_leaf, mutation_mp)
    proofs = [arch.prove_membership(i) for i in range(n)]
    arch.mutate_leaf_unchecked(target, new_leaf)
    leafs[target] = new_leaf
    for i in range(n):
        if i != target:
            proofs[i].update_from_leaf_mutation(i, mutation)
        assert proofs[i].verify(i, leafs[i], arch.peaks(), n), i


def test_batch_mutate_leaf_and_update_mps():
    n = 19
    leafs = rand_digests(n)
    acc = MmrAccumulator.new_from_leafs(leafs)
    arch = ArchivalMmr(leafs)
    targets = [2, 7, 16]
    mutations = [
        LeafMutation(t, rand_digest(), arch.prove_membership(t))
        for t in targets
    ]
    tracked_indices = [0, 5, 7, 18]
    tracked = [arch.prove_membership(i) for i in tracked_indices]
    acc.batch_mutate_leaf_and_update_mps(tracked, tracked_indices,
                                         list(mutations))
    for m in mutations:
        leafs[m.leaf_index] = m.new_leaf
    want = MmrAccumulator.new_from_leafs(leafs)
    assert acc.peaks() == want.peaks()
    for mp, i in zip(tracked, tracked_indices):
        assert mp.verify(i, leafs[i], acc.peaks(), n), i


def test_verify_batch_update():
    n = 10
    leafs = rand_digests(n)
    acc = MmrAccumulator.new_from_leafs(leafs)
    arch = ArchivalMmr(leafs)
    # appends only
    appended = rand_digests(3)
    new_acc = MmrAccumulator.new_from_leafs(leafs + appended)
    assert acc.verify_batch_update(new_acc.peaks(), appended, [])
    # mutation + append
    mutation = LeafMutation(4, rand_digest(), arch.prove_membership(4))
    leafs2 = list(leafs)
    leafs2[4] = mutation.new_leaf
    new_acc2 = MmrAccumulator.new_from_leafs(leafs2 + appended)
    assert acc.verify_batch_update(new_acc2.peaks(), appended, [mutation])
    # wrong peaks rejected
    assert not acc.verify_batch_update(acc.peaks(), appended, [])
    # duplicate mutation indices rejected
    m2 = LeafMutation(4, rand_digest(), arch.prove_membership(4))
    assert not acc.verify_batch_update(new_acc2.peaks(), [], [mutation, m2])


@pytest.mark.parametrize("old_n,appended_n", [
    (1, 1), (4, 4), (5, 3), (6, 2), (10, 22), (11, 1), (3, 1),
])
def test_successor_proof(old_n, appended_n):
    old_leafs = rand_digests(old_n)
    new_leafs = rand_digests(appended_n)
    old = MmrAccumulator.new_from_leafs(old_leafs)
    new = MmrAccumulator.new_from_leafs(old_leafs + new_leafs)
    proof = MmrSuccessorProof.new_from_batch_append(old, new_leafs)
    assert proof.verify(old, new)
    # non-successor rejected
    other = MmrAccumulator.new_from_leafs(rand_digests(old_n + appended_n))
    assert not proof.verify(old, other)
    # same MMR is a successor of itself with empty proof
    assert MmrSuccessorProof([]).verify(old, old)


def test_bag_peaks_depends_on_count_and_peaks():
    leafs = rand_digests(6)
    a = MmrAccumulator.new_from_leafs(leafs)
    b = MmrAccumulator.init(a.peaks(), 6)
    assert a.bag_peaks() == b.bag_peaks()
    c = MmrAccumulator.init(a.peaks(), 7)
    assert a.bag_peaks() != c.bag_peaks()
