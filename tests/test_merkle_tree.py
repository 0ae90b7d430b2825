"""Merkle tree tests: structure invariants, auth-structure dedup (the
reference's doc example merkle_tree.rs:600-612), proof verify/corruption, and
frugal-root equivalence."""

import numpy as np
import pytest

from twenty_first_tpu.errors import MerkleTreeError
from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.tip5 import Digest, Tip5
from twenty_first_tpu.util_types.merkle_tree import (
    MerkleTree,
    MerkleTreeInclusionProof,
)

RNG = np.random.default_rng(99)


def random_leafs(n):
    return RNG.integers(0, P, size=(n, 5), dtype=np.uint64)


def test_small_tree_against_scalar_hash_pair():
    leafs = random_leafs(4)
    tree = MerkleTree.new(leafs)
    d = [Digest.from_array(row) for row in leafs]
    n01 = Tip5.hash_pair(d[0], d[1])
    n23 = Tip5.hash_pair(d[2], d[3])
    root = Tip5.hash_pair(n01, n23)
    assert tree.root() == root
    assert tree.node(2) == n01 and tree.node(3) == n23
    assert tree.node(0) is None
    assert tree.leaf(0) == d[0] and tree.leaf(3) == d[3]
    assert tree.height() == 2 and tree.num_leafs() == 4


def test_single_leaf_tree():
    leafs = random_leafs(1)
    tree = MerkleTree.new(leafs)
    assert tree.root() == Digest.from_array(leafs[0])
    assert tree.height() == 0


def test_non_power_of_two_rejected():
    with pytest.raises(MerkleTreeError):
        MerkleTree.new(random_leafs(3))
    with pytest.raises(MerkleTreeError):
        MerkleTree.new(random_leafs(0))


def test_auth_structure_doc_example():
    # Reference doc: 8 leafs, open leafs 0 and 2 -> auth structure nodes
    # [11, 9, 3] (merkle_tree.rs:600-612).
    indices = MerkleTree.authentication_structure_node_indices(8, [0, 2])
    assert indices == [11, 9, 3]


def test_inclusion_proof_verifies_and_rejects_corruption():
    leafs = random_leafs(64)
    tree = MerkleTree.new(leafs)
    for opened in [[0], [5, 7, 50], [63], list(range(16))]:
        proof = tree.inclusion_proof_for_leaf_indices(opened)
        assert proof.verify(tree.root())
        # corrupt root
        bad = Digest([v.value() + 1 for v in tree.root().values()])
        assert not proof.verify(bad)
        # corrupt a leaf
        if proof.indexed_leafs:
            broken = MerkleTreeInclusionProof(
                tree_height=proof.tree_height,
                indexed_leafs=[
                    (i, Digest([x.value() ^ 1 for x in d.values()]))
                    for (i, d) in proof.indexed_leafs
                ],
                authentication_structure=proof.authentication_structure,
            )
            assert not broken.verify(tree.root())
        # wrong-length auth structure
        short = MerkleTreeInclusionProof(
            tree_height=proof.tree_height,
            indexed_leafs=proof.indexed_leafs,
            authentication_structure=proof.authentication_structure[:-1],
        )
        assert not short.verify(tree.root())


def test_trivial_proof_verifies():
    proof = MerkleTreeInclusionProof(tree_height=5)
    assert proof.verify(Digest.all_zero())


def test_into_authentication_paths_matches_direct_walk():
    leafs = random_leafs(32)
    tree = MerkleTree.new(leafs)
    opened = [3, 17, 30]
    proof = tree.inclusion_proof_for_leaf_indices(opened)
    paths = proof.into_authentication_paths()
    nodes = tree.node_array()
    for leaf_index, path in zip(opened, paths):
        node_index = leaf_index + 32
        want = []
        while node_index > 1:
            want.append(Digest.from_array(nodes[node_index ^ 1]))
            node_index //= 2
        assert path == want


def test_frugal_root_matches_full_tree():
    for n in [1, 2, 16, 256]:
        leafs = random_leafs(n)
        assert MerkleTree.frugal_root(leafs) == MerkleTree.new(leafs).root()


def test_auth_structure_from_leafs_matches_full_tree():
    leafs = random_leafs(64)
    tree = MerkleTree.new(leafs)
    for opened in [[0], [1, 62], [10, 11, 12]]:
        assert (
            MerkleTree.authentication_structure_from_leafs(leafs, opened)
            == tree.authentication_structure(opened)
        )


def test_medium_tree_device_path():
    # Above the parallelization cutoff -> exercises the batched device layers.
    leafs = random_leafs(2048)
    tree = MerkleTree.new(leafs)
    proof = tree.inclusion_proof_for_leaf_indices([0, 1023, 2047])
    assert proof.verify(tree.root())
    assert MerkleTree.frugal_root(leafs) == tree.root()


def test_leaf_index_out_of_bounds():
    tree = MerkleTree.new(random_leafs(8))
    with pytest.raises(MerkleTreeError):
        tree.inclusion_proof_for_leaf_indices([8])
