"""Differential test: the vectorized RLE/bit-pack hybrid encoder must be
byte-identical to a straightforward segment-at-a-time reference encoder
(same wire format, parquet-format Encodings.md RLE=3). Guards the scatter
assembly and the steal/fold placement logic in plc.kernels.rle_hybrid_encode
against regressions that a roundtrip test alone cannot see (a wire-legal but
different segmentation would still roundtrip)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from plc.kernels import (_RLE_MIN_RUN, bitpack, rle_hybrid_decode,
                         rle_hybrid_encode, varint_encode)


def ref_encode(arr: np.ndarray, w: int) -> bytes:
    """Straightforward segment-at-a-time hybrid encoder (round-1 logic)."""
    n = arr.size
    if n == 0:
        return b""
    a = arr.astype(np.uint64, copy=False)
    change = np.flatnonzero(np.diff(a)) + 1
    starts = np.concatenate(([0], change))
    lens = np.diff(np.concatenate((starts, [n])))
    long_mask = lens >= _RLE_MIN_RUN
    out = bytearray()
    pending = 0
    pend_start = 0

    def flush(final):
        nonlocal pending, pend_start
        if pending == 0:
            return
        ngroups = (pending + 7) // 8 if final else pending // 8
        nvals = ngroups * 8
        seg = a[pend_start : pend_start + min(nvals, pending)]
        if nvals > pending:
            seg = np.concatenate((seg, np.zeros(nvals - pending, np.uint64)))
        out.extend(varint_encode([(ngroups << 1) | 1]))
        out.extend(bitpack(seg, w))
        leftover = pending - min(nvals, pending)
        pend_start += nvals
        pending = leftover

    for i in range(starts.size):
        s, ln = int(starts[i]), int(lens[i])
        if not long_mask[i]:
            if pending == 0:
                pend_start = s
            pending += ln
            continue
        steal = (-pending) % 8 if pending else 0
        if ln - steal >= _RLE_MIN_RUN:
            pending += steal
            flush(False)
            out.extend(varint_encode([(ln - steal) << 1]))
            nb = (w + 7) // 8
            out.extend(int(a[s]).to_bytes(max(nb, 1), "little") if w > 0
                       else b"")
            pending = 0
        else:
            if pending == 0:
                pend_start = s
            pending += ln
    flush(True)
    return bytes(out)


CASES = [
    np.empty(0, np.uint64),
    np.zeros(1, np.uint64),
    np.zeros(7, np.uint64),
    np.zeros(8, np.uint64),
    np.arange(17, dtype=np.uint64) % 3,
    np.full(100, 5, np.uint64),
    # fold-prone: short-run prefix misaligns an 8..14 run
    np.concatenate((np.zeros(3, np.uint64), np.full(12, 7, np.uint64),
                    np.arange(5, dtype=np.uint64))),
    np.concatenate((np.zeros(5, np.uint64), np.full(9, 1, np.uint64),
                    np.full(8, 2, np.uint64), np.arange(20, dtype=np.uint64))),
]


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_known_vectors_byte_identical(idx):
    v = CASES[idx]
    w = max(int(v.max()).bit_length(), 1) if v.size else 1
    for ww in sorted({w, w + 3, 20}):
        assert rle_hybrid_encode(v, ww) == ref_encode(v, ww), (idx, ww)
        assert np.array_equal(rle_hybrid_decode(
            rle_hybrid_encode(v, ww), ww, v.size), v)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50),        # run value
                          st.integers(1, 40)),       # run length
                max_size=30),
       st.integers(6, 33))
def test_property_byte_identical(runs, w):
    v = (np.concatenate([np.full(ln, val, np.uint64) for val, ln in runs])
         if runs else np.empty(0, np.uint64))
    assert rle_hybrid_encode(v, w) == ref_encode(v, w)
    assert np.array_equal(rle_hybrid_decode(rle_hybrid_encode(v, w), w,
                                            v.size), v)
