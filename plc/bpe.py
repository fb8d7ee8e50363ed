"""Pluggable real tokenizer: a minimal, dependency-free BPE.

The engine's default tokenizer (:func:`plc.textstats.tokenize`) is a
deterministic word-hash stand-in chosen because it is a pure JVM
expression the DuckDB oracles can regenerate. Real curation runs want a
real vocabulary; this module supplies the contract — a
:class:`BPETokenizer` loaded from standard ``vocab.json`` +
``merges.txt`` files (the GPT-2-style public file format: vocab maps
token string → id, merges lists one space-separated symbol pair per
line in priority order) — and the Spark-side plumbing to run it as an
Arrow-batched ``mapInArrow`` kernel (no per-row Python at the DataFrame
level; the per-word loop is the tokenizer itself, memoized so repeated
words cost a dict hit).

No tokenizer library exists in this environment, so the implementation
is self-contained greedy pair-merge BPE over whitespace-split words; the
test fixture ships a tiny trained merges file. Swapping in a production
vocabulary is a file path, not a code change.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F


class BPETokenizer:
    """Greedy byte-pair-encoding tokenizer over whitespace-split words.

    ``vocab``: dict symbol→id. ``merges``: ordered list of (a, b) symbol
    pairs; earlier = higher priority (standard merges.txt semantics).
    Unknown residual symbols map to ``unk_id`` (the ``<unk>`` vocab entry
    when present, else 0) — never a crash on unseen bytes."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]]):
        self.vocab = dict(vocab)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.unk_id = self.vocab.get("<unk>", 0)
        self._cache: dict[str, list[int]] = {}
        self._CACHE_MAX = 2_000_000  # ≈ a few hundred MB worst case

    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str) -> "BPETokenizer":
        with open(vocab_path) as f:
            vocab = json.load(f)
        merges: list[tuple[str, str]] = []
        with open(merges_path) as f:
            for lineno, line in enumerate(f, 1):
                if not line.strip():
                    continue
                if lineno == 1 and line.startswith("#"):
                    continue  # '#version: 0.2' header (first line only —
                    # '# #' elsewhere is a REAL hash-pair merge)
                parts = line.split()  # tolerate trailing/extra whitespace
                if len(parts) != 2:
                    raise ValueError(
                        f"{merges_path}:{lineno}: expected 'a b', got "
                        f"{line.rstrip()!r}")
                merges.append((parts[0], parts[1]))
        return cls(vocab, merges)

    def encode_word(self, word: str) -> list[int]:
        """BPE-merge one word to ids (memoized — corpora repeat words)."""
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            # merge EVERY occurrence of the winning pair left-to-right
            a, b = syms[best_i], syms[best_i + 1]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        ids = [self.vocab.get(s, self.unk_id) for s in syms]
        if len(self._cache) >= self._CACHE_MAX:
            # long-lived Spark workers over high-cardinality text (URLs,
            # ids) would otherwise grow the memo without bound
            self._cache.clear()
        self._cache[word] = ids
        return ids

    def encode_text(self, text: str) -> list[int]:
        # str.split() (no arg) splits on ALL whitespace — newlines/tabs
        # are word boundaries, not glue (ADVICE r4)
        out: list[int] = []
        for w in text.split():
            out.extend(self.encode_word(w))
        return out

    def encode_batch(self, texts: list) -> list[list[int]]:
        """Batch contract shared with the native adapters below; the
        Spark kernel calls only this."""
        return [self.encode_text(t or "") for t in texts]


class _HFAdapter:
    """huggingface ``tokenizers.Tokenizer`` → engine batch contract.
    Uses the Rust ``encode_batch`` (parallel, GIL-released). Pickles via
    the tokenizer's own JSON serialization so it travels to Spark
    workers like any codec table."""

    def __init__(self, tok):
        self._tok = tok

    def __getstate__(self):
        return {"json": self._tok.to_str()}

    def __setstate__(self, state):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_str(state["json"])

    def encode_batch(self, texts: list) -> list[list[int]]:
        encs = self._tok.encode_batch([t or "" for t in texts])
        return [e.ids for e in encs]


class _SPAdapter:
    """``sentencepiece.SentencePieceProcessor`` → engine batch contract.
    Pickles the serialized model proto (the processor itself is not
    picklable) and reloads lazily on the worker."""

    def __init__(self, sp):
        self._proto = sp.serialized_model_proto()
        self._sp = sp

    def __getstate__(self):
        return {"proto": self._proto}

    def __setstate__(self, state):
        import sentencepiece as spm

        self._proto = state["proto"]
        self._sp = spm.SentencePieceProcessor()
        self._sp.LoadFromSerializedProto(self._proto)

    def encode_batch(self, texts: list) -> list[list[int]]:
        return self._sp.encode([t or "" for t in texts])


def native_tokenizer(obj):
    """Adapt a production tokenizer for ``tokens_table(tokenizer=...)``
    (VERDICT r4 #3 — the PIL-pattern gated hook: neither library ships
    in this sandbox, so the adapters import their modules only when such
    an object is actually passed).

    Accepted: a huggingface ``tokenizers.Tokenizer`` (Rust BPE/WordPiece/
    Unigram — its parallel ``encode_batch`` is the 100 TB-grade path), a
    ``sentencepiece.SentencePieceProcessor``, or any object already
    exposing ``encode_batch(list[str]) -> list[list[int]]`` or
    ``encode_text(str) -> list[int]`` (e.g. :class:`BPETokenizer`, the
    dependency-free fallback)."""
    mod = type(obj).__module__ or ""
    if mod.split(".")[0] == "tokenizers":
        return _HFAdapter(obj)
    if mod.split(".")[0] == "sentencepiece":
        return _SPAdapter(obj)
    if hasattr(obj, "encode_batch") or hasattr(obj, "encode_text"):
        return obj
    raise TypeError(
        f"unsupported tokenizer {type(obj).__name__}: expected a "
        f"tokenizers.Tokenizer, sentencepiece.SentencePieceProcessor, or "
        f"an object with encode_batch/encode_text")


def tokens_table_bpe(df: DataFrame, tokenizer,
                     text_col: str = "text", id_col: str = "doc_id"
                     ) -> DataFrame:
    """documents-shaped table → the engine's input shape using a REAL
    tokenizer: (doc_id string, tokens array<int>, n_tok int, source
    passthrough). One Arrow-batched kernel; the tokenizer (with its word
    cache) broadcasts in the closure like any codec table. Accepts a
    :class:`BPETokenizer` or anything :func:`native_tokenizer` accepts
    (HF tokenizers / sentencepiece, auto-wrapped)."""
    from plc.util import ensure_shipped

    ensure_shipped(df.sparkSession)
    tokenizer = native_tokenizer(tokenizer)
    keep = [c for c in ("source",) if c in df.columns]
    src = df.select(F.col(id_col).cast("string").alias("doc_id"),
                    F.col(text_col).alias("_text"), *keep)
    schema = "doc_id string, tokens array<int>, n_tok int" + \
        "".join(f", {c} string" for c in keep)

    def run(batches):
        for batch in batches:
            texts = batch.column("_text").to_pylist()
            id_lists = (tokenizer.encode_batch(texts)
                        if hasattr(tokenizer, "encode_batch") else
                        [tokenizer.encode_text(t or "") for t in texts])
            flat: list[int] = []
            offs = np.zeros(len(texts) + 1, dtype=np.int32)
            for i, ids in enumerate(id_lists):
                flat.extend(ids)
                offs[i + 1] = len(flat)
            toks = pa.ListArray.from_arrays(
                pa.array(offs), pa.array(np.array(flat, dtype=np.int32)))
            cols = [batch.column("doc_id"), toks,
                    pa.array(np.diff(offs).astype(np.int32))]
            names = ["doc_id", "tokens", "n_tok"]
            for c in keep:
                cols.append(batch.column(c))
                names.append(c)
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return src.mapInArrow(run, schema)
