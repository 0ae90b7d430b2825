"""ArchivalMmr parity fill-ins vs the reference inline tests
(twenty-first/src/util_types/mmr/archival_mmr.rs, cited per test)."""

import pytest

from twenty_first_tpu.math.b_field_element import bfe
from twenty_first_tpu.tip5.tip5 import Tip5
from twenty_first_tpu.util_types.mmr.archival_mmr import ArchivalMmr
from twenty_first_tpu.util_types.mmr.mmr_accumulator import (
    MmrAccumulator, mmra_with_mps)


def h(i):
    return Tip5.hash_varlen([bfe(i)])


def test_empty_mmr_behavior():
    # archival_mmr.rs:330-360 `empty_mmr_behavior_test`
    arch = ArchivalMmr()
    acc = MmrAccumulator.new_from_leafs([])
    assert arch.num_leafs() == 0
    assert acc.num_leafs() == 0
    assert arch.peaks() == acc.peaks() == []
    assert arch.bag_peaks() == acc.bag_peaks()
    assert arch.num_nodes() == 0
    assert arch.is_empty() and acc.is_empty()
    # appending to the empty MMR: the returned proof verifies
    leaf = h(1)
    proof = arch.append(leaf)
    assert not arch.is_empty()
    assert arch.num_leafs() == 1
    assert proof.verify(0, leaf, arch.peaks(), 1)


def test_one_input_mmr():
    # archival_mmr.rs:645-700 `one_input_mmr_test`
    first, second = h(14), h(201)
    mmr = ArchivalMmr.new_from_leafs([first])
    assert mmr.num_leafs() == 1
    assert mmr.num_nodes() == 1
    pwh = mmr.get_peaks_with_heights()
    assert len(pwh) == 1 and pwh[0][1] == 0
    assert mmr.prove_membership(0).verify(0, first, mmr.peaks(), 1)
    mmr.append(second)
    assert mmr.num_leafs() == 2
    assert mmr.num_nodes() == 3
    pwh = mmr.get_peaks_with_heights()
    assert len(pwh) == 1 and pwh[0][1] == 1
    for i, leaf in enumerate((first, second)):
        assert mmr.prove_membership(i).verify(i, leaf, mmr.peaks(), 2)
    # same as building from both leafs at once
    direct = ArchivalMmr.new_from_leafs([first, second])
    assert direct.peaks() == mmr.peaks()


def test_two_input_mmr():
    # archival_mmr.rs `two_input_mmr_test`
    leafs = [h(i) for i in range(2)]
    mmr = ArchivalMmr.new_from_leafs(list(leafs))
    assert mmr.num_leafs() == 2 and mmr.num_nodes() == 3
    third = h(99)
    mmr.append(third)
    assert mmr.num_leafs() == 3 and mmr.num_nodes() == 4
    for i, leaf in enumerate(leafs + [third]):
        assert mmr.prove_membership(i).verify(i, leaf, mmr.peaks(), 3)


@pytest.mark.parametrize("leaf_count", list(range(1, 18)))
def test_variable_size_mmr(leaf_count):
    # archival_mmr.rs `variable_size_tip5_mmr_test` / `variable_size_mmr_
    # test`: every proof verifies, peaks match the accumulator, node count
    # matches the closed form
    from twenty_first_tpu.util_types.mmr import shared_advanced

    leafs = [h(i) for i in range(leaf_count)]
    arch = ArchivalMmr.new_from_leafs(list(leafs))
    acc = MmrAccumulator.new_from_leafs(list(leafs))
    assert arch.peaks() == acc.peaks()
    assert arch.num_nodes() == \
        shared_advanced.num_leafs_to_num_nodes(leaf_count)
    for i, leaf in enumerate(leafs):
        assert arch.prove_membership(i).verify(
            i, leaf, arch.peaks(), leaf_count)
    assert arch.bag_peaks() == acc.bag_peaks()
    pwh = arch.get_peaks_with_heights()
    assert [p for p, _ in pwh] == arch.peaks()
    assert sum(1 << height for _, height in pwh) == leaf_count


def test_disallow_repeated_leaf_indices_in_construction():
    # archival_mmr.rs:902-904 `disallow_repeated_leaf_indices_in_
    # construction` (reference: should_panic)
    with pytest.raises(Exception):
        mmra_with_mps(14, [(0, h(1)), (0, h(2))])


def test_mmra_and_mps_construct_cornercases():
    # archival_mmr.rs:907-918 `mmra_and_mps_construct_test_cornercases`
    for leaf_count in range(5):
        mmra_with_mps(leaf_count, [])
    some = h(7)
    for leaf_count in range(1, 10):
        for leaf_index in range(leaf_count):
            mmra, mps = mmra_with_mps(leaf_count, [(leaf_index, some)])
            assert mps[0].verify(leaf_index, some, mmra.peaks(), leaf_count)


def test_mmra_and_mps_construct_two_leafs():
    # archival_mmr.rs:920+ `mmra_and_mps_construct_test_small`
    some, other = h(7), h(8)
    for leaf_count in range(2, 10):
        for i in range(leaf_count):
            for j in range(leaf_count):
                if i == j:
                    continue
                mmra, mps = mmra_with_mps(
                    leaf_count, [(i, some), (j, other)])
                assert mps[0].verify(i, some, mmra.peaks(), leaf_count)
                assert mps[1].verify(j, other, mmra.peaks(), leaf_count)
