"""minirsync — rolling-checksum algebra, strong-confirm rescue,
reconstruction fuzz."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minirsync as rs

B = 16


def test_roll_equals_scratch():
    data = bytes(range(200)) * 2
    a, b = rs.weak_checksum(data[0:B])
    for pos in range(1, len(data) - B):
        a, b = rs.weak_roll(a, b, data[pos - 1], data[pos + B - 1], B)
        assert (a, b) == rs.weak_checksum(data[pos : pos + B]), pos


def test_identical_is_all_copies():
    old = bytes(range(64))  # 4 DISTINCT blocks
    ops = rs.delta(old, rs.signatures(old, B), B)
    assert ops == [("copy", i) for i in range(4)]
    assert rs.apply_delta(old, ops, B) == old


def test_insertion_resyncs():
    old = bytes(range(96))
    new = old[:32] + b"[[X]]" + old[32:]
    ops = rs.delta(new, rs.signatures(old, B), B)
    assert rs.apply_delta(old, ops, B) == new
    copies = [v for k, v in ops if k == "copy"]
    assert copies == [0, 1, 2, 3, 4, 5]  # every old block reused
    lits = b"".join(v for k, v in ops if k == "lit")
    assert lits == b"[[X]]"


def test_weak_collision_does_not_corrupt():
    # two different blocks engineered to share a weak checksum:
    # swapping two adjacent equal-sum bytes preserves a; crafting b
    # too is fiddly, so instead poison the sig table directly — a
    # decoder that trusts the weak sum alone would emit a bogus copy
    old = b"A" * B + b"B" * B
    sigs = rs.signatures(old, B)
    ((wa, wb),) = [rs.weak_checksum(b"C" * B)] or [(0, 0)]
    # claim block 0 ALSO lives at the weak sum of C*16
    sigs.setdefault((wa, wb), []).append(
        (0, rs.signatures(old, B)[rs.weak_checksum(b"A" * B)][0][1])
    )
    new = b"C" * B + old
    ops = rs.delta(new, sigs, B)
    assert rs.apply_delta(old, ops, B) == new  # strong md5 rescued it


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400),
       st.binary(min_size=0, max_size=400))
def test_reconstruction_fuzz(old, new):
    ops = rs.delta(new, rs.signatures(old, B), B)
    assert rs.apply_delta(old, ops, B) == new


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=48, max_size=300),
       st.integers(min_value=0, max_value=47),
       st.binary(min_size=1, max_size=30))
def test_edit_reconstruction_fuzz(old, at, ins):
    new = old[:at] + ins + old[at:]
    ops = rs.delta(new, rs.signatures(old, B), B)
    assert rs.apply_delta(old, ops, B) == new
