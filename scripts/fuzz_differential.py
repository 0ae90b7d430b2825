"""Randomized differential fuzzer for the object API.

The per-module parity suites pin the reference's fixed vectors and a
handful of seeded cases; this harness sweeps RANDOM shapes/sizes across
the dispatch boundaries where a retuned cutoff could silently change
values. Algebraic identities and independent slow oracles adjudicate; any
mismatch prints a seeded repro line and exits nonzero.

Dispatch boundaries covered (kept current with each round's retunes):
  * Lagrange vs tree interpolation (round-4 crossover retune: 2^12);
  * schoolbook vs NTT row products (round-4 retune: min(la,lb) <= 12 or
    m*la*lb <= 2^12);
  * Horner vs remainder-tree evaluation; host vs device NTT (incl. the
    monkeypatch-tested slab branches' value behavior);
  * varlen sponge chunking; MMR batch ops vs the archival oracle;
  * the lattice NTT-domain wire boundary (ciphertexts carry NTT-domain
    coefficients; round-4 group-vectorized NTT-64) — round-5 family;
  * the distributed MMR carry-merge (peaks_from_leafs + batch_append
    across mesh shard boundaries, incl. the n % d indivisible fallback)
    — round-5 family;
  * wire-format adversaries: Merkle proof tamper, codec decode-robust,
    KEM ciphertext corruption.

Cadence: CI runs a 120 s smoke on every push (main.yml `fuzz-smoke`); the
nightly-equivalent is the same harness at 1800 s — run it after any
dispatch-constant retune and before each round-end snapshot:
    python scripts/fuzz_differential.py 1800

Usage: python scripts/fuzz_differential.py [seconds] [seed]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    # the distributed-MMR carry-merge family needs a multi-device mesh
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from twenty_first_tpu.math import gf, ntt
from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.math.polynomial import Polynomial
from twenty_first_tpu.prelude import bfe, bfe_vec
from twenty_first_tpu.tip5.tip5 import Tip5


def _rand_poly(rng, max_len=600):
    n = int(rng.integers(0, max_len))
    if n == 0:
        return Polynomial([])
    arr = rng.integers(0, P, n, dtype=np.uint64)
    if rng.random() < 0.3:
        arr[-max(1, int(rng.integers(1, 4))):] = 0  # trailing zeros
    return Polynomial.from_array(arr)


def check_poly_mul(rng):
    a, b = _rand_poly(rng), _rand_poly(rng)
    fast = a.multiply(b)
    slow = a.naive_multiply(b)
    assert fast == slow, (a.degree(), b.degree())


def check_divmod_identity(rng):
    a, b = _rand_poly(rng), _rand_poly(rng, 80)
    if b.is_zero():
        return
    q, r = a.divide(b)
    assert q.multiply(b) + r == a, (a.degree(), b.degree())
    assert r.degree() < b.degree()


def check_interpolate_roundtrip(rng):
    n = int(rng.integers(1, 260))
    dom_vals = rng.permutation((1 << 32) + np.arange(4 * n, dtype=np.uint64))[:n]
    vals = rng.integers(0, P, n, dtype=np.uint64)
    domain = bfe_vec(dom_vals.tolist())
    values = bfe_vec(vals.tolist())
    p = Polynomial.fast_interpolate(domain, values)
    assert p.degree() < n
    got = p.batch_evaluate(domain)
    assert got == values, n
    if n <= 40:
        assert p == Polynomial.lagrange_interpolate(domain, values), n


def check_zerofier(rng):
    n = int(rng.integers(1, 200))
    dom_vals = rng.permutation(np.arange(1, 5 * n, dtype=np.uint64))[:n]
    domain = bfe_vec(dom_vals.tolist())
    z = Polynomial.zerofier(domain)
    assert z.degree() == n
    assert all(v.is_zero() for v in z.batch_evaluate(domain)), n
    probe = bfe(int(rng.integers(0, P, dtype=np.uint64)))
    while probe in domain:
        probe = bfe(int(rng.integers(0, P, dtype=np.uint64)))
    assert not z.evaluate(probe).is_zero(), n


def check_ntt_roundtrip(rng):
    log_n = int(rng.integers(0, 13))
    rows = int(rng.integers(1, 5))
    x = rng.integers(0, P, size=(rows, 1 << log_n), dtype=np.uint64)
    fwd = ntt.ntt_values(x)
    back = ntt.intt_values(fwd)
    assert np.array_equal(back, x), (rows, log_n)
    # host path agrees with the dispatch result
    hostf = np.stack([ntt.ntt_host(r) for r in x])
    assert np.array_equal(fwd, hostf), (rows, log_n)


def check_tip5_varlen(rng):
    n = int(rng.integers(0, 400))
    vals = rng.integers(0, P, n, dtype=np.uint64)
    got = Tip5.hash_varlen(bfe_vec(vals.tolist()))
    # independent overwrite-mode sponge oracle on python ints
    from twenty_first_tpu.tip5.tip5 import _round_values

    def _python_permute(row):
        cur = [int(v) for v in row]
        for r in range(5):
            cur = _round_values(cur, r)
        return cur

    state = [0] * 16
    padded = [int(v) for v in vals] + [1]
    padded += [0] * ((-len(padded)) % 10)
    for c in range(0, len(padded), 10):
        state[:10] = padded[c: c + 10]
        state = _python_permute(state)
    assert [v.value() for v in got.values()] == state[:5], n


def check_mmr_vs_archival(rng):
    from twenty_first_tpu.util_types.mmr.archival_mmr import ArchivalMmr
    from twenty_first_tpu.util_types.mmr.mmr_accumulator import MmrAccumulator
    from twenty_first_tpu.tip5.digest import Digest

    n = int(rng.integers(1, 120))
    leafs = [Digest(rng.integers(0, P, 5, dtype=np.uint64).tolist())
             for _ in range(n)]
    arch = ArchivalMmr.new_from_leafs(leafs)
    acc = MmrAccumulator.new_from_leafs(leafs)
    assert acc.peaks() == arch.peaks(), n
    assert acc.num_leafs() == arch.num_leafs() == n
    extra = Digest(rng.integers(0, P, 5, dtype=np.uint64).tolist())
    acc.append(extra)
    arch.append(extra)
    assert acc.peaks() == arch.peaks(), n


def check_codec_roundtrip(rng):
    from twenty_first_tpu.math.bfield_codec import (
        BFE, DIGEST, U64, Opt, PolyCodec, Tup, Vec_)
    from twenty_first_tpu.tip5.digest import Digest

    n = int(rng.integers(0, 30))
    # randomly nested wire shape: Vec<(u64, Option<Vec<bfe>>, Digest)>
    spec = Vec_(Tup(U64, Opt(Vec_(BFE)), DIGEST))
    value = []
    for _ in range(n):
        k = int(rng.integers(0, 8))
        inner = ([bfe(int(v)) for v in rng.integers(0, P, k, dtype=np.uint64)]
                 if rng.random() < 0.7 else None)
        value.append((int(rng.integers(0, 1 << 64, dtype=np.uint64)), inner,
                      Digest(rng.integers(0, P, 5, dtype=np.uint64).tolist())))
    enc = spec.encode(value)
    assert spec.decode(enc) == value, n
    # polynomials reject trailing-zero wire forms; roundtrip a random one
    p = _rand_poly(rng, 40)
    pc = PolyCodec(BFE)
    assert pc.decode(pc.encode(p)) == p


def check_merkle_tamper(rng):
    """Random single-digest corruption anywhere in a proof must make
    verify return False — never raise an unrelated exception."""
    from twenty_first_tpu.tip5.digest import Digest
    from twenty_first_tpu.util_types.merkle_tree import MerkleTree

    h = int(rng.integers(1, 7))
    n = 1 << h
    leafs = [Digest(rng.integers(0, P, 5, dtype=np.uint64).tolist())
             for _ in range(n)]
    tree = MerkleTree.new(leafs)
    k = int(rng.integers(1, min(n, 6) + 1))
    idxs = sorted(set(int(i) for i in rng.integers(0, n, k)))
    proof = tree.inclusion_proof_for_leaf_indices(idxs)
    assert proof.verify(tree.root()), (h, idxs)
    limb = int(rng.integers(0, 5))
    delta = int(rng.integers(1, P, dtype=np.uint64))
    if proof.authentication_structure and rng.random() < 0.5:
        j = int(rng.integers(0, len(proof.authentication_structure)))
        vals = list(proof.authentication_structure[j].values())
        vals[limb] = bfe((vals[limb].value() + delta) % P)
        proof.authentication_structure[j] = Digest(vals)
    else:
        j = int(rng.integers(0, len(proof.indexed_leafs)))
        idx, leaf = proof.indexed_leafs[j]
        vals = list(leaf.values())
        vals[limb] = bfe((vals[limb].value() + delta) % P)
        proof.indexed_leafs[j] = (idx, Digest(vals))
    assert not proof.verify(tree.root()), (h, idxs)


def check_codec_decode_robust(rng):
    """Random element sequences fed to decode either roundtrip exactly
    or raise BFieldCodecError — no IndexError/ValueError/crash."""
    from twenty_first_tpu.errors import BFieldCodecError
    from twenty_first_tpu.math.bfield_codec import (
        BFE, U64, Opt, Tup, Vec_)

    spec = Vec_(Tup(U64, Opt(Vec_(BFE))))
    n = int(rng.integers(0, 25))
    seq = [bfe(int(v)) for v in rng.integers(0, P, n, dtype=np.uint64)]
    try:
        value = spec.decode(seq)
    except BFieldCodecError:
        return
    assert spec.encode(value) == seq, n


def check_kem_corruption_rejected(rng):
    from twenty_first_tpu.math import lattice

    r1 = rng.bytes(32)
    sk, pk = lattice.keygen(r1)
    key, ct = lattice.enc(pk, rng.bytes(32))
    assert lattice.dec(sk, ct) == key
    # flip one random wire element of the 320-bfe ciphertext
    wire = ct.to_bfes()
    j = int(rng.integers(0, len(wire)))
    wire[j] = bfe((wire[j].value() + 1) % P)
    bad = lattice.Ciphertext.from_bfes(wire)
    assert lattice.dec(sk, bad) != key


def check_lattice_ntt_domain_boundary(rng):
    """The lattice stack's NTT-domain seam: transform involution, NTT-
    domain Hadamard vs coefficient-domain negacyclic products (module
    fast_multiply vs multiply), and the NTT-domain ciphertext wire
    (to_bfes/from_bfes of a real encapsulation, which stores NTT-domain
    coefficients) surviving a roundtrip bit-exactly."""
    from twenty_first_tpu.math import lattice

    a = lattice.CyclotomicRingElement.sample_uniform(rng.bytes(9 * 64))
    b = lattice.CyclotomicRingElement.sample_uniform(rng.bytes(9 * 64))
    assert a.ntt().intt() == a
    assert lattice.CyclotomicRingElement.hadamard(
        a.ntt(), b.ntt()).intt() == a * b
    n = int(rng.integers(1, 4))
    ma = lattice.ModuleElement.sample_uniform(rng.bytes(9 * 64 * n * n), n * n)
    mb = lattice.ModuleElement.sample_uniform(rng.bytes(9 * 64 * n), n)
    fast = lattice.ModuleElement.fast_multiply(ma, mb, n, n, 1)
    slow = lattice.ModuleElement.multiply(ma, mb, n, n, 1)
    assert fast == slow, n
    sk, pk = lattice.keygen(rng.bytes(32))
    key, ct = lattice.enc(pk, rng.bytes(32))
    wire = lattice.Ciphertext.from_bfes(ct.to_bfes())
    assert lattice.dec(sk, wire) == key
    wire2 = lattice.Ciphertext.from_bytes(ct.to_bytes())
    assert lattice.dec(sk, wire2) == key


def check_dist_mmr_carry_merge(rng):
    """Distributed MMR peaks/append vs the host accumulator oracle at
    random (leaf count, batch size, mesh size) — the shard-boundary
    carry merge, including indivisible n % d fallbacks (the round-4
    advisor fix) and >= 3-peak shapes."""
    import jax as _jax

    from twenty_first_tpu.parallel.dist_mmr import (
        distributed_batch_append, distributed_peaks_from_leafs)
    from twenty_first_tpu.parallel.mesh import make_mesh
    from twenty_first_tpu.util_types.mmr.mmr_accumulator import MmrAccumulator

    avail = len(_jax.devices())
    choices = [d for d in (2, 4, 8) if d <= avail] or [1]
    d = int(rng.choice(choices))
    mesh = make_mesh(d)
    n = int(rng.integers(1, 700))
    leafs = rng.integers(0, P, size=(n, 5), dtype=np.uint64)
    got = distributed_peaks_from_leafs(leafs, mesh)
    want = MmrAccumulator.peaks_from_leafs(leafs)
    assert got == want, (d, n)
    m = int(rng.integers(1, 300))
    batch = rng.integers(0, P, size=(m, 5), dtype=np.uint64)
    new_peaks, new_count = distributed_batch_append(got, n, batch, mesh)
    assert new_count == n + m
    assert new_peaks == MmrAccumulator.peaks_from_leafs(
        np.concatenate([leafs, batch])), (d, n, m)


CHECKS = [check_poly_mul, check_divmod_identity, check_interpolate_roundtrip,
          check_zerofier, check_ntt_roundtrip, check_tip5_varlen,
          check_mmr_vs_archival, check_codec_roundtrip,
          check_merkle_tamper, check_codec_decode_robust,
          check_kem_corruption_rejected, check_lattice_ntt_domain_boundary,
          check_dist_mmr_carry_merge]


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else int.from_bytes(
        os.urandom(4), "little")
    print(f"fuzz: budget={budget}s seed={seed}")
    rng = np.random.default_rng(seed)
    t0 = time.time()
    counts = {c.__name__: 0 for c in CHECKS}
    it = 0
    while time.time() - t0 < budget:
        check = CHECKS[it % len(CHECKS)]
        sub = int(rng.integers(0, 1 << 32))
        try:
            check(np.random.default_rng(sub))
        except AssertionError as e:
            print(f"MISMATCH in {check.__name__}: sub-seed {sub}: {e}")
            print(f"repro: rng=np.random.default_rng({sub}); "
                  f"{check.__name__}(rng)")
            sys.exit(1)
        counts[check.__name__] += 1
        it += 1
    total = sum(counts.values())
    print(f"clean: {total} checks in {time.time()-t0:.0f}s")
    for k, v in counts.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
