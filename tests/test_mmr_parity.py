"""MMR parity fill-ins vs the reference inline tests
(twenty-first/src/util_types/mmr/*.rs, cited per test): the fixed
index-math vector tables, the bag_peaks empty-MMR snapshot, membership
verification edge cases, and the successor-proof negative family."""

import pytest

from twenty_first_tpu.math.b_field_element import bfe
from twenty_first_tpu.tip5.digest import Digest
from twenty_first_tpu.tip5.tip5 import Tip5
from twenty_first_tpu.util_types.mmr import shared_advanced, shared_basic
from twenty_first_tpu.util_types.mmr.mmr_accumulator import MmrAccumulator
from twenty_first_tpu.util_types.mmr.mmr_successor_proof import (
    MmrSuccessorProof)


def leafs(n, start=0):
    return [Tip5.hash_varlen([bfe(i + start)]) for i in range(n)]


def test_leaf_index_to_mt_index_fixed_table():
    # shared_basic.rs:168-213 `leaf_index_to_mt_index_test`
    f = shared_basic.leaf_index_to_mt_index_and_peak_index
    assert f(0, 1) == (1, 0)
    assert f(0, 2) == (2, 0) and f(1, 2) == (3, 0)
    assert f(0, 3) == (2, 0) and f(1, 3) == (3, 0) and f(2, 3) == (1, 1)
    assert [f(i, 4) for i in range(4)] == [(4, 0), (5, 0), (6, 0), (7, 0)]
    assert [f(i, 14) for i in range(8)] == \
        [(8 + i, 0) for i in range(8)]
    assert [f(8 + i, 14) for i in range(4)] == \
        [(4 + i, 1) for i in range(4)]
    assert f(0, 23) == (16, 0) and f(15, 23) == (31, 0)
    assert f(16, 23) == (4, 1) and f(19, 23) == (7, 1)
    assert f(20, 23) == (2, 2)


def test_node_indices_added_by_append_fixed_table():
    # shared_advanced.rs:319-345 `node_indices_added_by_append_test`
    expected = {0: [1], 1: [2, 3], 2: [4], 3: [5, 6, 7], 4: [8],
                5: [9, 10], 6: [11], 7: [12, 13, 14, 15], 8: [16],
                9: [17, 18], 10: [19], 11: [20, 21, 22], 12: [23],
                13: [24, 25], 14: [26], 15: [27, 28, 29, 30, 31],
                16: [32], 17: [33, 34], 18: [35], 19: [36, 37, 38],
                31: [58, 59, 60, 61, 62, 63], 32: [64]}
    for old_count, want in expected.items():
        assert shared_advanced.node_indices_added_by_append(old_count) \
            == want


def test_leftmost_ancestor_fixed_table():
    # shared_advanced.rs:429-446 `leftmost_ancestor_test`
    expected = [(1, (1, 0)), (2, (3, 1)), (3, (3, 1)), (4, (7, 2)),
                (7, (7, 2)), (8, (15, 3)), (15, (15, 3)), (16, (31, 4))]
    for node, want in expected:
        assert shared_advanced.leftmost_ancestor(node) == want


def test_left_sibling_fixed_table():
    # shared_advanced.rs:449-456 `left_sibling_test`
    ls = shared_advanced.left_sibling
    assert ls(6, 1) == 3
    assert ls(2, 0) == 1
    assert ls(5, 0) == 4
    assert ls(30, 3) == 15
    assert ls(29, 2) == 22
    assert ls(14, 2) == 7


def test_node_index_to_leaf_index_fixed_table():
    # shared_advanced.rs:459-482 `node_index_to_leaf_index_test`
    expected = {1: 0, 2: 1, 3: None, 4: 2, 5: 3, 6: None, 7: None,
                8: 4, 9: 5, 10: None, 11: 6, 12: 7, 13: None, 14: None,
                15: None, 16: 8, 17: 9, 18: None, 19: 10, 20: 11,
                21: None, 22: None}
    for node, want in expected.items():
        assert shared_advanced.node_index_to_leaf_index(node) == want


def test_leaf_count_to_node_count_fixed_table():
    # shared_advanced.rs:485-493 `leaf_count_to_node_count_test`
    node_counts = [0, 1, 3, 4, 7, 8, 10, 11, 15, 16, 18, 19, 22, 23, 25,
                   26, 31, 32, 34, 35, 38, 39, 41, 42, 46, 47, 49, 50,
                   53, 54, 56, 57, 63, 64]
    for i, want in enumerate(node_counts):
        assert shared_advanced.num_leafs_to_num_nodes(i) == want


def test_peak_heights_and_indices_fixed_table():
    # shared_advanced.rs:496-527 `get_peak_heights_and_peak_node_indices`
    expected = [
        (0, ([], [])), (1, ([0], [1])), (2, ([1], [3])),
        (3, ([1, 0], [3, 4])), (4, ([2], [7])), (5, ([2, 0], [7, 8])),
        (6, ([2, 1], [7, 10])), (7, ([2, 1, 0], [7, 10, 11])),
        (8, ([3], [15])), (9, ([3, 0], [15, 16])),
        (10, ([3, 1], [15, 18])), (11, ([3, 1, 0], [15, 18, 19])),
        (12, ([3, 2], [15, 22])), (13, ([3, 2, 0], [15, 22, 23])),
        (14, ([3, 2, 1], [15, 22, 25])),
        (15, ([3, 2, 1, 0], [15, 22, 25, 26])),
        (16, ([4], [31])), (17, ([4, 0], [31, 32])),
        (18, ([4, 1], [31, 34])), (19, ([4, 1, 0], [31, 34, 35])),
    ]
    for leaf_count, (heights, indices) in expected:
        got = shared_advanced.get_peak_heights_and_peak_node_indices(
            leaf_count)
        assert got == (heights, indices)
        assert shared_advanced.get_peak_heights(leaf_count) == heights


def test_auth_path_node_indices_fixed_table():
    # shared_advanced.rs:571-601 `auth_path_indices_unit_test`
    f = shared_advanced.auth_path_node_indices
    expected_16 = [
        [2, 6, 14, 30], [1, 6, 14, 30], [5, 3, 14, 30], [4, 3, 14, 30],
        [9, 13, 7, 30], [8, 13, 7, 30], [12, 10, 7, 30], [11, 10, 7, 30],
        [17, 21, 29, 15], [16, 21, 29, 15], [20, 18, 29, 15],
        [19, 18, 29, 15], [24, 28, 22, 15], [23, 28, 22, 15],
        [27, 25, 22, 15], [26, 25, 22, 15]]
    for leaf_index, want in enumerate(expected_16):
        assert f(16, leaf_index) == want
    assert f(1, 0) == []
    assert f(2, 0) == [2]
    assert f(2, 1) == [1]
    expected = []
    for i in range(1, 20):
        expected.append((1 << (i + 1)) - 2)
        assert f(1 << i, 0) == expected


def test_bag_peaks_empty_mmr_snapshot():
    # mmr_accumulator.rs:1038-1046 `bag_peaks_snapshot` (empty case —
    # the random-digest cases need the Rust StdRng stream)
    empty = MmrAccumulator.new_from_leafs([])
    assert empty.bag_peaks().to_hex() == (
        "cd65052100640f0d27e5654f97c47e49899add2f265967ccbefee7264e9"
        "bc08f588542d9dc3d5ac5")


def test_computing_mmr_root_for_no_leafs_produces_some_digest():
    # mmr_accumulator.rs:1033-1035
    MmrAccumulator.new_from_leafs([]).bag_peaks()  # must not raise


def test_membership_verification_out_of_bounds_leaf_index():
    # mmr_membership_proof.rs `mmr_verification_if_leaf_index_is_out_of_
    # bounds`
    ls = leafs(5)
    acc = MmrAccumulator.new_from_leafs(ls)
    proofs = [acc_proof for acc_proof in _proofs_for(ls)]
    assert not proofs[0].verify(5, ls[0], acc.peaks(), 5)
    assert not proofs[0].verify(1 << 40, ls[0], acc.peaks(), 5)


def test_membership_verification_with_wrong_peak_list_length():
    # mmr_membership_proof.rs `mmr_verification_with_wrong_length_of_peak
    # _list` / `..._too_short_peaks_list_unit`
    ls = leafs(5)
    acc = MmrAccumulator.new_from_leafs(ls)
    proof = _proofs_for(ls)[0]
    peaks = acc.peaks()
    assert proof.verify(0, ls[0], peaks, 5)
    assert not proof.verify(0, ls[0], peaks[:-1], 5)
    assert not proof.verify(0, ls[0], peaks + [peaks[0]], 5)
    assert not proof.verify(0, ls[0], [], 5)


def test_membership_proof_equality_ignores_nothing_but_path():
    # mmr_membership_proof.rs `equality_and_hash_test`
    from twenty_first_tpu.util_types.mmr.mmr_membership_proof import (
        MmrMembershipProof)

    a = MmrMembershipProof([Digest([1, 2, 3, 4, 5])])
    b = MmrMembershipProof([Digest([1, 2, 3, 4, 5])])
    c = MmrMembershipProof([Digest([5, 4, 3, 2, 1])])
    assert a == b
    assert a != c


def _proofs_for(ls):
    from twenty_first_tpu.util_types.mmr.archival_mmr import ArchivalMmr

    arch = ArchivalMmr.new_from_leafs(ls)
    return [arch.prove_membership(i) for i in range(len(ls))]


# --- successor proof family (mmr_successor_proof.rs) -----------------------

def test_append_nothing_to_empty_mmra():
    # `append_nothing_to_empty_mmra`
    old = MmrAccumulator.new_from_leafs([])
    proof = MmrSuccessorProof.new_from_batch_append(old, [])
    assert proof.verify(old, old)


def test_append_one_thing_to_empty_mmra():
    # `append_one_thing_to_empty_mmra`
    old = MmrAccumulator.new_from_leafs([])
    new_leafs = leafs(1)
    proof = MmrSuccessorProof.new_from_batch_append(old, new_leafs)
    new = MmrAccumulator.new_from_leafs(new_leafs)
    assert proof.verify(old, new)


def test_append_8_leafs_to_mmra_with_42_leafs():
    # `append_8_leafs_to_mmra_with_42_leafs`
    old_leafs = leafs(42)
    appended = leafs(8, start=1000)
    old = MmrAccumulator.new_from_leafs(old_leafs)
    proof = MmrSuccessorProof.new_from_batch_append(old, appended)
    new = MmrAccumulator.new_from_leafs(old_leafs + appended)
    assert proof.verify(old, new)


def test_successor_verification_fails_if_old_has_more_leafs():
    # `verification_fails_if_old_mmra_has_more_leafs_than_new_mmra`
    old_leafs = leafs(10)
    appended = leafs(3, start=500)
    old = MmrAccumulator.new_from_leafs(old_leafs)
    new = MmrAccumulator.new_from_leafs(old_leafs + appended)
    proof = MmrSuccessorProof.new_from_batch_append(old, appended)
    assert not proof.verify(new, old)  # swapped


def test_successor_verification_fails_with_swapped_old_peaks():
    # `verification_fails_if_old_mmra_has_swapped_peaks`
    old_leafs = leafs(10)  # peaks: heights 3,1 -> two peaks
    appended = leafs(3, start=500)
    old = MmrAccumulator.new_from_leafs(old_leafs)
    new = MmrAccumulator.new_from_leafs(old_leafs + appended)
    proof = MmrSuccessorProof.new_from_batch_append(old, appended)
    peaks = old.peaks()
    assert len(peaks) >= 2
    tampered = MmrAccumulator.init(
        [peaks[1], peaks[0]] + peaks[2:], old.num_leafs())
    assert not proof.verify(tampered, new)


def test_successor_verification_fails_with_first_new_peak_swapped_out():
    # `verification_fails_if_new_mmra_has_first_peak_swapped_out`
    old_leafs = leafs(10)
    appended = leafs(3, start=500)
    old = MmrAccumulator.new_from_leafs(old_leafs)
    new = MmrAccumulator.new_from_leafs(old_leafs + appended)
    proof = MmrSuccessorProof.new_from_batch_append(old, appended)
    bad_peaks = list(new.peaks())
    bad_peaks[0] = Digest([9, 9, 9, 9, 9])
    bad_new = MmrAccumulator.init(bad_peaks, new.num_leafs())
    assert not proof.verify(old, bad_new)


def test_successor_verification_fails_with_corrupt_auth_path():
    # `verification_fails_if_authentication_path_is_corrupt` and the
    # too-few/too-many-elements variants
    old_leafs = leafs(10)
    appended = leafs(3, start=500)
    old = MmrAccumulator.new_from_leafs(old_leafs)
    new = MmrAccumulator.new_from_leafs(old_leafs + appended)
    proof = MmrSuccessorProof.new_from_batch_append(old, appended)
    assert proof.verify(old, new)
    if proof.paths:
        corrupt = MmrSuccessorProof(
            [Digest([8, 8, 8, 8, 8])] + proof.paths[1:])
        assert not corrupt.verify(old, new)
        short = MmrSuccessorProof(proof.paths[:-1])
        assert not short.verify(old, new)
    long = MmrSuccessorProof(proof.paths + [Digest([7, 7, 7, 7, 7])])
    assert not long.verify(old, new)
