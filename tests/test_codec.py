import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from apache___solr_spark.index.codec import (
    decode_vbyte,
    delta_decode,
    delta_encode,
    encode_vbyte,
)
from apache___solr_spark.index.smallfloat import (
    NORM_TABLE,
    byte4_to_int,
    decode_norms,
    int_to_byte4,
    int_to_byte4_np,
)


@given(st.lists(st.integers(min_value=0, max_value=2**56 - 1), max_size=2000))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(xs):
    v = np.array(xs, dtype=np.uint64)
    assert (decode_vbyte(encode_vbyte(v), len(v)) == v).all()


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_vbyte_slices_match_per_group_encode(xs, data):
    from apache___solr_spark.index.codec import encode_vbyte_slices

    v = np.array(xs, dtype=np.uint64)
    n_groups = data.draw(st.integers(min_value=1, max_value=min(10, len(xs))))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(xs) - 1),
                max_size=n_groups - 1,
                unique=True,
            )
        )
    ) if len(xs) > 1 else []
    starts = np.array([0] + cuts, dtype=np.int64)
    ends = np.append(starts[1:], len(xs))
    got = encode_vbyte_slices(v, starts)
    want = [encode_vbyte(v[s:e]) for s, e in zip(starts, ends)]
    assert got == want


def test_vbyte_empty():
    assert decode_vbyte(b"").size == 0
    assert encode_vbyte(np.array([], dtype=np.uint64)) == b""


def test_vbyte_sizes():
    # 7-bit values take 1 byte, 14-bit take 2, ...
    assert len(encode_vbyte(np.array([127], dtype=np.uint64))) == 1
    assert len(encode_vbyte(np.array([128], dtype=np.uint64))) == 2
    assert len(encode_vbyte(np.array([2**21 - 1], dtype=np.uint64))) == 3


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(xs, base_gap):
    ids = np.unique(np.array(xs, dtype=np.int64))
    base = max(int(ids[0]) - base_gap, 0)
    assert (delta_decode(delta_encode(ids, base), base) == ids).all()


def test_smallfloat_matches_scalar():
    vals = np.array(list(range(4000)) + [10**5, 10**7, 2**30], dtype=np.int64)
    enc = int_to_byte4_np(vals)
    assert (enc == np.array([int_to_byte4(int(x)) for x in vals])).all()
    # decode <= original, order preserving, exact below 16 (4 significant bits)
    dec = decode_norms(enc)
    assert (dec <= vals).all()
    assert (np.diff(NORM_TABLE) > 0).all()
    for i in range(16):
        assert byte4_to_int(int_to_byte4(i)) == i


def test_smallfloat_rejects_negative():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
