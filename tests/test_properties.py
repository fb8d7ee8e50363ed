"""Property-based round-trip tests (hypothesis) — SURVEY.md §5.2.1 notes
property tests as an optional strengthening of the deterministic fixtures.
Each property is the reference's core contract: dec(enc(x)) == x."""

import numpy as np
from hypothesis import given, settings, strategies as st

from plc import kernels as K
from plc import fsst

settings.register_profile("ci", max_examples=60, deadline=None)
settings.load_profile("ci")

ints32 = st.lists(st.integers(-(2**31), 2**31 - 1), max_size=300)


@given(ints32)
def test_for_roundtrip_any_int32(xs):
    arr = np.array(xs, dtype=np.int32)
    ref, w, buf = K.for_encode(arr)
    np.testing.assert_array_equal(K.for_decode(ref, w, buf, arr.size, np.int32), arr)


@given(st.lists(st.integers(0, 2**20), max_size=400), st.integers(21, 33))
def test_rle_hybrid_roundtrip(xs, w):
    arr = np.array(xs, dtype=np.uint64)
    out = K.rle_hybrid_decode(K.rle_hybrid_encode(arr, w), w, arr.size)
    np.testing.assert_array_equal(out, arr)


@given(st.lists(st.integers(0, 255), min_size=1, max_size=50),
       st.integers(1, 40))
def test_rle_with_injected_runs(xs, rep):
    arr = np.repeat(np.array(xs, dtype=np.uint64), rep)
    out = K.rle_hybrid_decode(K.rle_hybrid_encode(arr, 8), 8, arr.size)
    np.testing.assert_array_equal(out, arr)


@given(st.lists(st.binary(max_size=40), max_size=60))
def test_fsst_roundtrip_arbitrary_binary(strings):
    data = np.frombuffer(b"".join(strings), np.uint8)
    lengths = np.array([len(s) for s in strings], np.int64)
    blob, codes, code_lens = fsst.fsst_encode(data, lengths)
    out = fsst.fsst_decode(blob, codes, code_lens)
    assert out.tobytes() == data.tobytes()


@given(st.integers(1, 64), st.lists(st.integers(0, 2**63 - 1), max_size=200))
def test_bitpack_roundtrip_masked(w, xs):
    hi = (1 << w) - 1
    arr = np.array(xs, dtype=np.uint64) & np.uint64(hi)
    out = K.bitunpack(K.bitpack(arr, w), w, arr.size)
    np.testing.assert_array_equal(out, arr)


@given(st.lists(st.integers(-(2**31), 2**31 - 1), max_size=300))
def test_forbp_roundtrip_any_int32(xs):
    from plc import chunk as C

    arr = np.array(xs, dtype=np.int32)
    if arr.size == 0:
        return
    frame = C._forbp_frame(arr)
    out, _ = C.decode_frame(memoryview(frame), 0)
    np.testing.assert_array_equal(out, arr)
    assert out.dtype == arr.dtype


@given(st.lists(st.integers(-(2**62), 2**62 - 1), min_size=1, max_size=200))
def test_forbp_roundtrip_int64(xs):
    from plc import chunk as C

    arr = np.array(xs, dtype=np.int64)
    frame = C._forbp_frame(arr)
    out, _ = C.decode_frame(memoryview(frame), 0)
    np.testing.assert_array_equal(out, arr)


@given(st.lists(st.floats(allow_nan=False, width=32), min_size=1,
                max_size=300))
def test_byteplane_roundtrip_float32(xs):
    from plc import chunk as C

    arr = np.array(xs, dtype=np.float32)
    frame = C._byteplane_frame(arr)
    out, _ = C.decode_frame(memoryview(frame), 0)
    np.testing.assert_array_equal(out, arr)
