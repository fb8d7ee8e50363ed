"""K6: FSST string-symbol-table compression (SURVEY.md §2 K6).

Implements the algorithm of Boncz, Neumann, Leis, "FSST: Fast Random Access
String Compression", PVLDB 13(11), 2020 — named as a required capability in
BASELINE.json north_rule. A ≤255-entry table of 1-8-byte symbols is learned
bottom-up from a sample (≤5 generations, gain = frequency × length); encoding
is greedy longest-match emitting 1-byte codes, with code 255 as the escape
marker followed by one literal byte. Symbols never cross string boundaries,
preserving per-string random access.

Vectorization strategy (no per-row Python, BASELINE.json input_hint):
- the greedy walk advances all strings in lockstep — one vectorized gather
  per step, loop length = max symbols per string, not total symbols;
- matching runs on-the-fly at each step's positions: 8-byte-window →
  uint64 keys (gathered), then per symbol length a ``np.searchsorted``
  over that length's sorted key array — positions inside matched symbols
  are never visited, so match work is O(emitted symbols), not O(bytes);
- decode parses escape units the same lockstep way.

Training runs on a ≤16 KiB sample in plain Python (paper §4 samples the
input precisely so training cost is O(sample), not O(data)).
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYM_LEN = 8
MAX_SYMBOLS = 255  # codes 0..254; 255 reserved for escape
GENERATIONS = 5
SAMPLE_TARGET = 16 << 10


class SymbolTable:
    """Learned table: ``syms[i]`` is the byte string for code ``i``."""

    def __init__(self, syms: list[bytes]):
        assert len(syms) <= MAX_SYMBOLS
        self.syms = syms
        self.sym_len = np.array([len(s) for s in syms] + [1], dtype=np.int64)
        # (n+1, 8) byte matrix; last row is a placeholder for the escape code
        mat = np.zeros((len(syms) + 1, MAX_SYM_LEN), dtype=np.uint8)
        for i, s in enumerate(syms):
            mat[i, : len(s)] = np.frombuffer(s, np.uint8)
        self.sym_mat = mat
        # per-length sorted key arrays for vectorized lookup
        self.by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for length in range(1, MAX_SYM_LEN + 1):
            items = [(self._key(s), i) for i, s in enumerate(syms) if len(s) == length]
            if items:
                items.sort()
                keys = np.array([k for k, _ in items], dtype=np.uint64)
                codes = np.array([c for _, c in items], dtype=np.uint8)
                self.by_len[length] = (keys, codes)

    @staticmethod
    def _key(s: bytes) -> int:
        k = 0
        for j, b in enumerate(s):
            k |= b << (8 * j)
        return k

    def serialize(self) -> bytes:
        out = bytearray([len(self.syms)])
        out.extend(len(s) for s in self.syms)
        for s in self.syms:
            out.extend(s)
        return bytes(out)

    @classmethod
    def deserialize(cls, blob: bytes) -> "SymbolTable":
        n = blob[0]
        lens = blob[1 : 1 + n]
        syms, pos = [], 1 + n
        for ln in lens:
            syms.append(bytes(blob[pos : pos + ln]))
            pos += ln
        return cls(syms)


# --------------------------------------------------------------------------
# training (paper §3-4: bottom-up generations on a sample)
# --------------------------------------------------------------------------


# little-endian window key masked to symbol length; index = length 1..8
_KEY_MASKS = np.array([0] + [(1 << (8 * l)) - 1 for l in range(1, 8)]
                      + [(1 << 64) - 1], dtype=np.uint64)
# the lockstep walk's step count is the LONGEST sample string's symbol
# count; chopping sample strings bounds it so one long document in the
# sample can't turn training into thousands of tiny vector steps
# (symbols simply never cross the artificial cut points — same class of
# boundary as the string boundaries they already respect). 64 measured
# 3x faster than 512 on long-text samples at +0.1% encoded size: the
# walk is per-step-overhead-bound, and step count scales with piece size
_SAMPLE_PIECE = 64


def _count_groups(keys: np.ndarray, lens: np.ndarray):
    """Occurrence counts per unique (key, len) pair."""
    o = np.lexsort((keys, lens))
    k, ln = keys[o], lens[o]
    new = np.empty(k.size, dtype=bool)
    new[0] = True
    new[1:] = (k[1:] != k[:-1]) | (ln[1:] != ln[:-1])
    gi = np.flatnonzero(new)
    cnt = np.diff(np.append(gi, k.size))
    return k[gi], ln[gi], cnt


def train(data: np.ndarray, lengths: np.ndarray) -> SymbolTable:
    """Learn a symbol table from a sample of the concatenated string plane.

    Each generation greedily parses the sample with the current table via
    the SAME vectorized lockstep walk the encoder uses (paper §3: compress
    the sample, count symbol and adjacent-pair frequencies, keep the
    highest-gain candidates) — emitted units become (uint64 key, len)
    pairs, pair candidates are key arithmetic, and counting is one
    lexsort per multiset, so a generation is O(sample) vector work
    instead of per-byte Python dict probes (was ~0.14 s per chunk, ~1/3
    of encode wall)."""
    sample_strs = _take_sample(data, lengths)
    pieces: list[bytes] = []
    for s in sample_strs:
        for i in range(0, len(s), _SAMPLE_PIECE):
            pieces.append(s[i: i + _SAMPLE_PIECE])
    if not pieces:
        return SymbolTable([])
    sdata = np.frombuffer(b"".join(pieces), dtype=np.uint8)
    slens = np.array([len(p) for p in pieces], dtype=np.int64)
    offsets = np.zeros(slens.size + 1, dtype=np.int64)
    np.cumsum(slens, out=offsets[1:])
    padded = np.zeros(sdata.size + MAX_SYM_LEN, dtype=np.uint8)
    padded[: sdata.size] = sdata

    syms: list[bytes] = []
    for _ in range(GENERATIONS):
        table = SymbolTable(syms)
        lens_desc = sorted(table.by_len, reverse=True)
        # lockstep greedy parse collecting (row, step, key, len) per unit
        pos = offsets[:-1].copy()
        ends_a = offsets[1:].copy()
        rows_a = np.arange(slens.size, dtype=np.int64)
        alive = pos < ends_a
        pos, ends_a, rows_a = pos[alive], ends_a[alive], rows_a[alive]
        er, es, ek, el = [], [], [], []
        step = 0
        while pos.size:
            _code, mlen = _match_at(table, padded, pos, ends_a - pos,
                                    lens_desc)
            wk = np.zeros(pos.size, dtype=np.uint64)
            for j in range(MAX_SYM_LEN):
                wk |= padded[pos + j].astype(np.uint64) << np.uint64(8 * j)
            er.append(rows_a.copy())
            es.append(np.full(pos.size, step, dtype=np.int64))
            ek.append(wk & _KEY_MASKS[mlen])
            el.append(mlen)
            pos = pos + mlen
            alive = pos < ends_a
            if not alive.all():
                pos, ends_a, rows_a = pos[alive], ends_a[alive], rows_a[alive]
            step += 1
        rows_e = np.concatenate(er)
        order = np.lexsort((np.concatenate(es), rows_e))
        rows_e = rows_e[order]
        keys_e = np.concatenate(ek)[order]
        lens_e = np.concatenate(el)[order]

        # candidate gains: every emitted unit (matched symbol or escaped
        # byte as a pseudo-symbol), and every within-row adjacent pair
        # whose concatenation still fits MAX_SYM_LEN
        k1, l1, c1 = _count_groups(keys_e, lens_e)
        allk, alll, allg = [k1], [l1], [c1 * l1]
        same = rows_e[1:] == rows_e[:-1]
        la, lb = lens_e[:-1][same], lens_e[1:][same]
        fit = la + lb <= MAX_SYM_LEN
        if fit.any():
            laf = la[fit]
            mk = keys_e[:-1][same][fit] | (
                keys_e[1:][same][fit] << (np.uint64(8)
                                          * laf.astype(np.uint64)))
            k2, l2, c2 = _count_groups(mk, (la + lb)[fit])
            allk.append(k2)
            alll.append(l2)
            allg.append(c2 * l2)
        k = np.concatenate(allk)
        ln = np.concatenate(alll)
        g = np.concatenate(allg)
        # a candidate seen both standalone and as a concatenation keeps
        # its best gain (matches the prior trainer's max-merge)
        o = np.lexsort((g, k, ln))
        k, ln, g = k[o], ln[o], g[o]
        last = np.empty(k.size, dtype=bool)
        last[-1] = True
        last[:-1] = (k[1:] != k[:-1]) | (ln[1:] != ln[:-1])
        k, ln, g = k[last], ln[last], g[last]
        sel = np.lexsort((k, ln, -g))[:MAX_SYMBOLS]
        syms = [int(k[i]).to_bytes(8, "little")[: int(ln[i])] for i in sel]
    return SymbolTable(syms)


def _take_sample(data: np.ndarray, lengths: np.ndarray) -> list[bytes]:
    if data.size == 0:
        return []
    from plc.kernels import offsets_from_lengths

    offsets = offsets_from_lengths(lengths)
    raw = data.tobytes()
    total, out = 0, []
    stride = max(1, int(lengths.size * np.mean(lengths) // SAMPLE_TARGET)) \
        if np.mean(lengths) > 0 else 1
    for i in range(0, lengths.size, stride):
        s = raw[offsets[i] : offsets[i + 1]]
        out.append(s)
        total += len(s)
        if total >= SAMPLE_TARGET:
            break
    return out


# --------------------------------------------------------------------------
# vectorized encode
# --------------------------------------------------------------------------


def _match_at(table: SymbolTable, padded: np.ndarray, pos: np.ndarray,
              remaining: np.ndarray, lens_desc: list[int]):
    """Greedy longest-match at the given positions only (vectorized).

    Returns (code uint8[m], match_len int64[m]); unmatched positions get
    the escape marker with match_len 1. ``padded`` is the data plane with
    MAX_SYM_LEN zero bytes appended so 8-byte windows never run off the
    end. Matching only at the walk's current positions — instead of
    precomputing every byte offset — cuts the searchsorted work by the
    average match length (~4-8x on id-like columns): a position inside a
    matched symbol is never visited, so its match was wasted work.
    """
    m = pos.size
    code = np.full(m, ESCAPE, dtype=np.uint8)
    mlen = np.ones(m, dtype=np.int64)
    if m == 0 or not lens_desc:
        return code, mlen
    keys = np.zeros(m, dtype=np.uint64)
    for j in range(lens_desc[0]):
        keys |= padded[pos + j].astype(np.uint64) << np.uint64(8 * j)
    matched = np.zeros(m, dtype=bool)
    for length in lens_desc:
        skeys, scodes = table.by_len[length]
        lkeys = keys & np.uint64((1 << (8 * length)) - 1) \
            if length < 8 else keys
        idx = np.searchsorted(skeys, lkeys)
        idx[idx >= skeys.size] = 0
        hit = (skeys[idx] == lkeys) & (remaining >= length) & ~matched
        code[hit] = scodes[idx[hit]]
        mlen[hit] = length
        matched |= hit
        if matched.all():
            break
    return code, mlen


def fsst_encode(data: np.ndarray, lengths: np.ndarray,
                table: SymbolTable | None = None):
    """Encode the concatenated byte plane of a string column.

    Returns (table_blob, codes uint8[], code_lens int64[n_strings]) where
    ``code_lens[i]`` is the encoded byte count of string i.
    """
    data = np.asarray(data, dtype=np.uint8)
    lengths = np.asarray(lengths, dtype=np.int64)
    if table is None:
        table = train(data, lengths)
    from plc.kernels import offsets_from_lengths

    nrows = lengths.size
    offsets = offsets_from_lengths(lengths)
    padded = np.zeros(data.size + MAX_SYM_LEN, dtype=np.uint8)
    padded[: data.size] = data
    lens_desc = sorted(table.by_len, reverse=True)

    # Lockstep greedy walk with active-set compaction: each step gathers
    # only rows that still have bytes left, so total work/memory is
    # O(total emitted symbols) even when one string is far longer than the
    # rest (a single skewed row no longer drags every row through its
    # steps — that shape was an OOM-class blowup). Matching happens
    # on-the-fly per step (_match_at), touching only visited positions.
    pos = offsets[:-1].copy()
    ends = offsets[1:]
    rows = np.arange(nrows, dtype=np.int64)
    alive = pos < ends
    pos, ends_a, rows_a = pos[alive], ends[alive], rows[alive]
    em_rows: list[np.ndarray] = []   # row id per emission
    em_steps: list[np.ndarray] = []  # step index per emission (for ordering)
    em_codes: list[np.ndarray] = []
    em_pos: list[np.ndarray] = []
    step = 0
    while pos.size:
        code, mlen = _match_at(table, padded, pos, ends_a - pos, lens_desc)
        em_rows.append(rows_a.copy())
        em_steps.append(np.full(pos.size, step, dtype=np.int64))
        em_codes.append(code)
        em_pos.append(pos.copy())
        pos = pos + mlen
        alive = pos < ends_a
        if not alive.all():
            pos, ends_a, rows_a = pos[alive], ends_a[alive], rows_a[alive]
        step += 1
    if not em_rows:
        return table.serialize(), np.empty(0, np.uint8), np.zeros(nrows, np.int64)

    r = np.concatenate(em_rows)
    s = np.concatenate(em_steps)
    flat_codes = np.concatenate(em_codes)
    flat_pos = np.concatenate(em_pos)
    # row-major, step-minor emission order
    order = np.lexsort((s, r))
    flat_codes, flat_pos, r = flat_codes[order], flat_pos[order], r[order]
    is_escape = flat_codes == ESCAPE
    out_len = np.where(is_escape, 2, 1)
    out_off = np.zeros(flat_codes.size + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_off[1:])
    out = np.empty(out_off[-1], dtype=np.uint8)
    out[out_off[:-1]] = flat_codes
    if is_escape.any():
        # escape unit = [255, literal]: literal is the original byte
        out[out_off[:-1][is_escape] + 1] = data[flat_pos[is_escape]]
    code_lens = np.zeros(nrows, dtype=np.int64)
    np.add.at(code_lens, r, out_len)
    return table.serialize(), out, code_lens


# --------------------------------------------------------------------------
# vectorized decode
# --------------------------------------------------------------------------


def fsst_decode(table_blob: bytes, codes: np.ndarray,
                code_lens: np.ndarray) -> np.ndarray:
    """Inverse of :func:`fsst_encode`: returns the concatenated byte plane.
    Original string lengths are recovered by the caller from the STRING
    frame; this returns the flat uint8 data."""
    table = SymbolTable.deserialize(bytes(table_blob))
    codes = np.asarray(codes, dtype=np.uint8)
    code_lens = np.asarray(code_lens, dtype=np.int64)
    from plc.kernels import offsets_from_lengths

    nrows = code_lens.size
    offsets = offsets_from_lengths(code_lens)
    # lockstep unit parse with active-set compaction (see fsst_encode):
    # unit = [ESC, lit] (2 bytes) or [code] (1 byte)
    pos = offsets[:-1].copy()
    ends = offsets[1:]
    rows = np.arange(nrows, dtype=np.int64)
    alive = pos < ends
    pos, ends_a, rows_a = pos[alive], ends[alive], rows[alive]
    u_rows: list[np.ndarray] = []
    u_steps: list[np.ndarray] = []
    u_codes: list[np.ndarray] = []
    u_lits: list[np.ndarray] = []
    step = 0
    while pos.size:
        c = codes[pos]
        esc = c == ESCAPE
        lit_idx = np.where(esc, np.minimum(pos + 1, codes.size - 1), 0)
        u_rows.append(rows_a.copy())
        u_steps.append(np.full(pos.size, step, dtype=np.int64))
        u_codes.append(c)
        u_lits.append(np.where(esc, codes[lit_idx], 0).astype(np.uint8))
        pos = pos + np.where(esc, 2, 1)
        alive = pos < ends_a
        if not alive.all():
            pos, ends_a, rows_a = pos[alive], ends_a[alive], rows_a[alive]
        step += 1
    if not u_codes:
        return np.empty(0, np.uint8)
    r = np.concatenate(u_rows)
    s = np.concatenate(u_steps)
    flat_c = np.concatenate(u_codes)
    flat_l = np.concatenate(u_lits)
    order = np.lexsort((s, r))
    flat_c, flat_l = flat_c[order], flat_l[order]
    esc = flat_c == ESCAPE
    out_len = np.where(esc, 1, table.sym_len[np.minimum(flat_c, len(table.syms))])
    # gather: non-escape units copy sym_len bytes from sym_mat rows
    out_off = np.zeros(flat_c.size + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_off[1:])
    out = np.empty(out_off[-1], dtype=np.uint8)
    # escape literals
    if esc.any():
        out[out_off[:-1][esc]] = flat_l[esc]
    nz = ~esc
    if nz.any():
        rows = table.sym_mat[flat_c[nz]]                  # (m, 8)
        lens = out_len[nz]
        sel = np.arange(MAX_SYM_LEN)[None, :] < lens[:, None]
        out_positions = out_off[:-1][nz]
        # positions for each emitted byte
        byte_pos = (out_positions[:, None] + np.arange(MAX_SYM_LEN)[None, :])[sel]
        out[byte_pos] = rows[sel]
    return out
