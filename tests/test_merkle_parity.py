"""MerkleTree / PartialMerkleTree parity fill-ins vs the reference
inline tests (twenty-first/src/util_types/merkle_tree.rs, cited per test)."""

import pytest

from twenty_first_tpu.math.b_field_element import bfe
from twenty_first_tpu.tip5.digest import Digest
from twenty_first_tpu.tip5.tip5 import Tip5
from twenty_first_tpu.util_types.merkle_tree import (
    MerkleTree, MerkleTreeError, MerkleTreeInclusionProof, PartialMerkleTree)


def tree_of_height(h):
    leafs = [Tip5.hash_varlen([bfe(i)]) for i in range(1 << h)]
    return MerkleTree.new(leafs), leafs


def test_building_merkle_tree_from_empty_list_fails():
    # merkle_tree.rs `building_merkle_tree_from_empty_list_of_digests_
    # fails_with_expected_error`
    with pytest.raises(MerkleTreeError):
        MerkleTree.new([])


def test_one_leaf_tree_height_and_root():
    # `merkle_tree_with_one_leaf_has_expected_height_and_number_of_leafs`,
    # `building_merkle_tree_from_one_digest_makes_that_digest_the_root`
    leaf = Tip5.hash_varlen([bfe(7)])
    tree = MerkleTree.new([leaf])
    assert tree.height() == 0
    assert tree.num_leafs() == 1
    assert tree.root() == leaf


def test_auth_paths_of_extremely_small_tree_use_expected_nodes():
    # merkle_tree.rs:1309-1326: height-2 tree, auth path node indices
    tree, _ = tree_of_height(2)
    expect = {0: [5, 3], 1: [4, 3], 2: [7, 2], 3: [6, 2]}
    for leaf_index, node_indices in expect.items():
        path = tree.authentication_structure([leaf_index])
        assert path == [tree.node(i) for i in node_indices]


def test_auth_paths_of_very_small_tree_use_expected_nodes():
    # merkle_tree.rs:1329+: height-3 tree
    tree, _ = tree_of_height(3)
    expect = {0: [9, 5, 3], 3: [10, 4, 3], 7: [14, 6, 2]}
    for leaf_index, node_indices in expect.items():
        path = tree.authentication_structure([leaf_index])
        assert path == [tree.node(i) for i in node_indices]


def test_honest_proof_with_duplicate_leafs_can_be_verified():
    # `honestly_generated_proof_with_duplicate_leafs_can_be_verified`
    tree, _ = tree_of_height(3)
    proof = tree.inclusion_proof_for_leaf_indices([2, 2, 5])
    assert proof.verify(tree.root())


def test_incorrect_tree_height_leads_to_verification_failure():
    # `incorrect_tree_height_leads_to_verification_failure`
    tree, _ = tree_of_height(3)
    proof = tree.inclusion_proof_for_leaf_indices([2])
    bad = MerkleTreeInclusionProof(
        tree_height=4,
        indexed_leafs=proof.indexed_leafs,
        authentication_structure=proof.authentication_structure)
    assert not bad.verify(tree.root())
    bad.tree_height = 2
    assert not bad.verify(tree.root())


def test_proof_with_all_leafs_revealed_can_be_verified():
    # `honestly_generated_proof_with_all_leafs_revealed_can_be_verified`
    tree, _ = tree_of_height(3)
    proof = tree.inclusion_proof_for_leaf_indices(list(range(8)))
    assert proof.authentication_structure == []
    assert proof.verify(tree.root())


def test_removing_leafs_from_proof_leads_to_verification_failure():
    # `removing_leafs_from_proof_leads_to_verification_failure`
    tree, _ = tree_of_height(3)
    proof = tree.inclusion_proof_for_leaf_indices([1, 4])
    pruned = MerkleTreeInclusionProof(
        tree_height=proof.tree_height,
        indexed_leafs=proof.indexed_leafs[:1],
        authentication_structure=proof.authentication_structure)
    assert not pruned.verify(tree.root())


def test_set_inclusion_of_items_not_in_set_fails():
    # `checking_set_inclusion_of_items_not_in_set_leads_to_verification_
    # failure`
    tree, _ = tree_of_height(3)
    proof = tree.inclusion_proof_for_leaf_indices([1, 4])
    wrong_leaf = Tip5.hash_varlen([bfe(999)])
    forged = MerkleTreeInclusionProof(
        tree_height=proof.tree_height,
        indexed_leafs=[(proof.indexed_leafs[0][0], wrong_leaf),
                       proof.indexed_leafs[1]],
        authentication_structure=proof.authentication_structure)
    assert not forged.verify(tree.root())


def test_partial_tree_contains_expected_nodes():
    # merkle_tree.rs:1424-1445
    tree, _ = tree_of_height(3)
    proof = tree.inclusion_proof_for_leaf_indices([0, 2])
    partial = PartialMerkleTree.from_proof(proof)
    assert sorted(partial.nodes) == [1, 2, 3, 4, 5, 8, 9, 10, 11]


def test_partial_tree_with_necessary_node_missing_errors():
    # merkle_tree.rs:1470-1491 — node 3 missing
    dummy = {i: Digest([i, 0, 0, 0, 0]) for i in (8, 9, 10, 11)}
    partial = PartialMerkleTree(3, [0, 2], dummy)
    with pytest.raises(MerkleTreeError, match="missing node index 3"):
        partial.fill()


def test_partial_tree_with_redundant_node_errors():
    # merkle_tree.rs:1494-1515 — node 2 would be recomputed
    dummy = {i: Digest([i, 0, 0, 0, 0]) for i in (2, 3, 8, 9, 10, 11)}
    partial = PartialMerkleTree(3, [0, 2], dummy)
    with pytest.raises(MerkleTreeError, match="spurious node index 2"):
        partial.fill()


def test_manually_constructed_partial_tree_can_be_filled():
    # merkle_tree.rs:1448-1467
    tree, _ = tree_of_height(3)
    nodes = {i: tree.node(i) for i in (3, 8, 9, 10, 11)}
    partial = PartialMerkleTree(3, [0, 2], nodes)
    partial.fill()
    assert partial.root() == tree.root()
    assert sorted(partial.nodes) == [1, 2, 3, 4, 5, 8, 9, 10, 11]


def test_into_authentication_paths_expected():
    # merkle_tree.rs:1518+ `converting_authentication_structure_to_
    # authentication_paths_results_in_expected_paths`
    tree, _ = tree_of_height(3)
    proof = tree.inclusion_proof_for_leaf_indices([0, 2])
    paths = proof.into_authentication_paths()
    assert paths[0] == [tree.node(9), tree.node(5), tree.node(3)]
    assert paths[1] == [tree.node(11), tree.node(4), tree.node(3)]


def test_each_leaf_can_be_verified_individually():
    # `each_leaf_can_be_verified_individually`
    tree, leafs = tree_of_height(3)
    for i, leaf in enumerate(leafs):
        proof = tree.inclusion_proof_for_leaf_indices([i])
        assert proof.verify(tree.root())
        assert proof.indexed_leafs == [(i, leaf)]


def test_construction_independent_of_parallelization_cutoff():
    # `merkle_tree_construction_strategies_are_independent_of_
    # parallelization_cutoff` — the config knob must not change results
    from twenty_first_tpu import config

    leafs = [Tip5.hash_varlen([bfe(i)]) for i in range(16)]
    baseline = MerkleTree.new(leafs).root()
    old = config.merkle_tree_parallelization_cutoff()
    try:
        for cutoff in (2, 4, 512):
            config.set_merkle_tree_parallelization_cutoff(cutoff)
            assert MerkleTree.new(leafs).root() == baseline
    finally:
        config.set_merkle_tree_parallelization_cutoff(old)
