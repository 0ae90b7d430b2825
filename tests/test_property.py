"""Property-based tests (hypothesis) — the analogue of the reference's
proptest strategy (SURVEY §4.1): field axioms, codec roundtrips, transform
inverses, polynomial laws, proof invariants."""

from hypothesis import given, settings, strategies as st
import numpy as np

from twenty_first_tpu.math.b_field_element import BFieldElement, bfe, P
from twenty_first_tpu.math.bfield_codec import (
    BFE, DIGEST, U64, Opt, PolyCodec, Tup, Vec_,
)
from twenty_first_tpu.math.polynomial import Polynomial
from twenty_first_tpu.math.x_field_element import XFieldElement, xfe
from twenty_first_tpu.math import ntt
from twenty_first_tpu.tip5 import Digest, Tip5
from twenty_first_tpu.util_types.mmr import ArchivalMmr

felt = st.integers(min_value=0, max_value=P - 1)
xfelt = st.tuples(felt, felt, felt)
digest = st.builds(lambda v: Digest(v), st.tuples(felt, felt, felt, felt, felt))


@settings(max_examples=50, deadline=None)
@given(felt, felt, felt)
def test_field_axioms(a, b, c):
    a, b, c = bfe(a), bfe(b), bfe(c)
    assert a + b == b + a
    assert a * b == b * a
    assert (a + b) + c == a + (b + c)
    assert (a * b) * c == a * (b * c)
    assert a * (b + c) == a * b + a * c
    assert (a - b) + b == a
    if not a.is_zero():
        assert (a * a.inverse()).is_one()


@settings(max_examples=25, deadline=None)
@given(xfelt, xfelt, xfelt)
def test_xfield_axioms(a, b, c):
    a, b, c = xfe(a), xfe(b), xfe(c)
    assert a * b == b * a
    assert a * (b + c) == a * b + a * c
    assert (a * b) * c == a * (b * c)
    if not a.is_zero():
        assert (a * a.inverse()).is_one()


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 8), st.data())
def test_ntt_intt_identity(log_n, data):
    n = 1 << log_n
    values = np.array(
        data.draw(st.lists(felt, min_size=n, max_size=n)), dtype=np.uint64
    )
    out = ntt.intt_values(ntt.ntt_values(values))
    np.testing.assert_array_equal(out, values)


@settings(max_examples=25, deadline=None)
@given(st.lists(felt, max_size=20))
def test_codec_vec_roundtrip(values):
    v = [bfe(x) for x in values]
    assert Vec_(BFE).decode(Vec_(BFE).encode(v)) == v


@settings(max_examples=25, deadline=None)
@given(st.one_of(st.none(), st.integers(0, (1 << 64) - 1)),
       st.lists(felt, max_size=6))
def test_codec_composite_roundtrip(opt, coeffs):
    desc = Tup(Opt(U64), PolyCodec(BFE), DIGEST)
    poly = Polynomial([bfe(c) for c in coeffs])
    d = Digest([1, 2, 3, 4, 5])
    value = (opt, poly, d)
    assert desc.decode(desc.encode(value)) == value


@settings(max_examples=10, deadline=None)
@given(st.lists(felt, min_size=1, max_size=40), st.lists(felt, min_size=1,
                                                         max_size=10))
def test_poly_divmod_invariant(nc, dc):
    n = Polynomial([bfe(c) for c in nc])
    d = Polynomial([bfe(c) for c in dc])
    if d.is_zero():
        return
    q, r = n.divide(d)
    assert q * d + r == n
    assert r.degree() < d.degree()


@settings(max_examples=10, deadline=None)
@given(st.lists(digest, min_size=1, max_size=20))
def test_mmr_membership_invariant(leafs):
    arch = ArchivalMmr(leafs)
    peaks = arch.peaks()
    for i, leaf in enumerate(leafs):
        assert arch.prove_membership(i).verify(i, leaf, peaks, len(leafs))


@settings(max_examples=20, deadline=None)
@given(st.lists(felt, max_size=30))
def test_hash_varlen_deterministic_and_padded(values):
    v = [bfe(x) for x in values]
    d1 = Tip5.hash_varlen(v)
    d2 = Tip5.hash_varlen(v)
    assert d1 == d2
    # appending the pad marker manually must NOT collide (domain separation
    # comes from the padding rule itself)
    d3 = Tip5.hash_varlen(v + [bfe(1)])
    assert d1 != d3


@settings(max_examples=12, deadline=None)
@given(st.data())
def test_mmr_stateful_fuzz_vs_archival_oracle(data):
    """Random append/mutate program replayed against both MmrAccumulator
    (succinct, with tracked membership proofs maintained by the batch
    update algorithms) and ArchivalMmr (stores all nodes): peaks, proofs
    and leaf counts must agree at every step — the reference's
    update_membership_proof_from_{append,leaf_mutation}_big pbt family
    (mmr_membership_proof.rs) as one stateful program."""
    from twenty_first_tpu.util_types.mmr.mmr_accumulator import (
        MmrAccumulator)
    from twenty_first_tpu.util_types.mmr.mmr_trait import LeafMutation

    def rd(i):
        return Tip5.hash_varlen([bfe(i)])

    n0 = data.draw(st.integers(1, 12), label="initial_leafs")
    leafs = [rd(i) for i in range(n0)]
    arch = ArchivalMmr.new_from_leafs(list(leafs))
    acc = MmrAccumulator.new_from_leafs(list(leafs))
    # track a proof for every leaf, maintained incrementally
    proofs = [arch.prove_membership(i) for i in range(n0)]
    next_val = 1000
    for step in range(data.draw(st.integers(1, 8), label="steps")):
        op = data.draw(st.sampled_from(["append", "mutate"]),
                       label=f"op{step}")
        if op == "append":
            new_leaf = rd(next_val)
            next_val += 1
            # maintain all tracked proofs through the append
            from twenty_first_tpu.util_types.mmr.mmr_membership_proof \
                import MmrMembershipProof
            MmrMembershipProof.batch_update_from_append(
                proofs, list(range(len(leafs))), len(leafs), new_leaf,
                acc.peaks())
            arch_proof = arch.append(new_leaf)
            acc.append(new_leaf)
            leafs.append(new_leaf)
            proofs.append(arch_proof)
        else:
            idx = data.draw(
                st.integers(0, len(leafs) - 1), label=f"idx{step}")
            new_leaf = rd(next_val)
            next_val += 1
            mutation = LeafMutation(idx, new_leaf, proofs[idx])
            from twenty_first_tpu.util_types.mmr.mmr_membership_proof \
                import MmrMembershipProof
            MmrMembershipProof.batch_update_from_leaf_mutation(
                proofs, list(range(len(leafs))), mutation)
            arch.mutate_leaf_unchecked(idx, new_leaf)
            acc.mutate_leaf(mutation)
            leafs[idx] = new_leaf
        assert acc.peaks() == arch.peaks()
        assert acc.num_leafs() == arch.num_leafs() == len(leafs)
        for i, (leaf, proof) in enumerate(zip(leafs, proofs)):
            assert proof.verify(i, leaf, acc.peaks(), len(leafs)), \
                (step, op, i)
