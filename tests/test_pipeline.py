"""STARK trace-LDE-commit pipeline vs scalar components."""

import numpy as np
import jax

from twenty_first_tpu.math import gf
from twenty_first_tpu.math.b_field_element import BFieldElement, bfe, P
from twenty_first_tpu.math.polynomial import Polynomial
from twenty_first_tpu.parallel.pipeline import trace_lde_commit
from twenty_first_tpu.tip5 import Digest, Tip5
from twenty_first_tpu.util_types.merkle_tree import MerkleTree

RNG = np.random.default_rng(17)


def test_trace_lde_commit_matches_scalar_pipeline():
    w, n, expansion = 3, 16, 4
    trace = RNG.integers(0, P, size=(w, n), dtype=np.uint64)
    root = gf.from_limbs(
        jax.jit(lambda a, b: trace_lde_commit((a, b), expansion))(
            *gf.to_limbs(trace)
        )
    )[0]

    # scalar reference: interpolate each column over <omega_n>, evaluate on
    # the coset g * <omega_{4n}>, hash rows fixed-length, Merkle-commit.
    offset = BFieldElement.generator()
    omega_n = BFieldElement.primitive_root_of_unity(n)
    domain = [omega_n.mod_pow(i) for i in range(n)]
    columns = []
    for c in range(w):
        poly = Polynomial.interpolate(domain, [bfe(int(v)) for v in trace[c]])
        columns.append(poly.fast_coset_evaluate(offset, n * expansion))
    leafs = []
    for r in range(n * expansion):
        row = [columns[c][r] for c in range(w)] + [bfe(0)] * (10 - w)
        leafs.append(Digest(Tip5.hash_10(row)).to_array())
    want = MerkleTree.new(np.array(leafs, dtype=np.uint64)).root()
    assert Digest.from_array(root) == want


def test_trace_lde_commit_diags_bit_exact():
    """The four-step-diagonal fast path (ntt_diags threaded as arguments,
    round 3) produces the identical root to the diag-less fallback."""
    import jax

    from twenty_first_tpu.math import gf
    from twenty_first_tpu.parallel.pipeline import (
        lde_commit_diags, trace_lde_commit)

    rng = np.random.default_rng(3)
    P = (1 << 64) - (1 << 32) + 1
    w, n = 2, 1 << 17  # >= four-step threshold for both transforms
    tr = rng.integers(0, P, size=(w, n), dtype=np.uint64)
    planes = gf.to_limbs(tr)
    diags = lde_commit_diags(n, 4)
    assert diags[0] is not None and diags[1] is not None
    slow = jax.jit(lambda s: trace_lde_commit(s, expansion=4))(planes)
    fast = jax.jit(
        lambda s, il, ih, fl, fh: trace_lde_commit(
            s, expansion=4, ntt_diags=((il, ih), (fl, fh))))(
        planes, diags[0][0], diags[0][1], diags[1][0], diags[1][1])
    np.testing.assert_array_equal(np.asarray(slow[0]), np.asarray(fast[0]))
    np.testing.assert_array_equal(np.asarray(slow[1]), np.asarray(fast[1]))
