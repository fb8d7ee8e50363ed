"""`spark.read.format("plc")` — a Spark Python DataSource over the engine's
chunk store (pyspark.sql.datasource, Spark 4+).

The DataFrame/SQL-native read path: after ``plc.register(spark)`` any query
can scan an encoded store like a table —

    spark.read.format("plc").load(dst).where("n_tok > 100").select("doc_id")

and Catalyst drives the storage layer exactly like a built-in format:

- **column pruning**: the reader receives Spark's pruned schema; chunk
  frames for unrequested columns are skipped by length, never decoded;
- **filter pushdown**: :meth:`PLCReader.pushFilters` translates range/
  equality predicates into per-chunk stat pruning (same semantics as
  :func:`plc.pipeline.select_chunks` — doc_id bounds, typed weight-column
  stats, stats-JSON min/max incl. temporal columns with the ±26 h tz
  slack). Every filter is also returned as unsupported, so Spark
  re-applies the exact predicate on the decoded rows — pruning is a
  conservative superset and can never change results;
- **committed-parts isolation**: uncommitted part directories (a crashed
  encode) are invisible, like :func:`plc.pipeline.decode`;
- **partitioning**: one Spark input partition per encoded parquet file
  (chunk-pruned row selections travel in the partition descriptor), so a
  1000-executor cluster fans out across part files with zero driver state
  beyond the descriptor list.

Planning happens driver-side with pyarrow only (no Spark jobs): the store's
own metadata columns are the "footer". Reads yield Arrow RecordBatches —
the whole path is vectorized end to end.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq

from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceArrowWriter,
                                    DataSourceReader, DataSourceStreamReader,
                                    EqualTo, GreaterThan, GreaterThanOrEqual,
                                    InputPartition, LessThan,
                                    LessThanOrEqual, WriterCommitMessage)
from pyspark.sql.types import StructType

_META_COLS = ["chunk_idx", "min_doc_id", "max_doc_id", "min_w", "max_w",
              "stats"]


def _load_plan(path: str) -> dict:
    with open(os.path.join(path, "_manifest", "plan.json")) as f:
        return json.load(f)


def _committed_batch_ids(path: str) -> list[int]:
    """Batch ids under a stream root whose ATOMIC commit marker exists —
    a partial per-part manifest (crash mid-commit, resumed later) must
    never be consumed, or the resumed remainder would be skipped forever."""
    out = []
    for b in glob.glob(os.path.join(path, "batch=*")):
        if os.path.exists(os.path.join(b, "_manifest",
                                       "_STREAM_COMMITTED")):
            out.append(int(os.path.basename(b).split("=")[1]))
    return sorted(out)


def _committed_parts(path: str) -> set[int]:
    files = glob.glob(os.path.join(path, "_manifest", "parts", "*.parquet"))
    out: set[int] = set()
    for f in files:
        out.update(pq.read_table(f, columns=["part_id"])
                   .column("part_id").to_pylist())
    return out


class PLCDataSource(DataSource):
    """Readable data source over a plc encode destination directory."""

    @classmethod
    def name(cls) -> str:
        return "plc"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("plc data source requires a path: "
                             "spark.read.format('plc').load(dst)")
        if path.startswith("file:"):
            path = path[len("file:"):]
        if "://" in path:
            raise NotImplementedError(
                f"the plc format does I/O with local pyarrow (driver plans "
                f"from the store's own metadata; executors open files "
                f"directly) and needs a filesystem visible at the same "
                f"path everywhere (POSIX/NFS/fuse mounts); for {path!r} "
                f"use plc.encode/plc.decode, which run through Spark's "
                f"Hadoop filesystem layer")
        return path

    def schema(self) -> StructType:
        path = self._path()
        if os.path.exists(os.path.join(path, "_manifest", "plan.json")):
            return StructType.fromJson(_load_plan(path)["schema"])
        # streaming root (plc.streaming.encode_stream output): batch=<id>
        # sub-stores, each a complete encode — schema from the first one
        for b in sorted(glob.glob(os.path.join(path, "batch=*"))):
            if os.path.exists(os.path.join(b, "_manifest", "plan.json")):
                return StructType.fromJson(_load_plan(b)["schema"])
        raise FileNotFoundError(
            f"{path} is neither a plc store (_manifest/plan.json) nor a "
            f"stream root with committed batch=<id> stores")

    def reader(self, schema: StructType) -> "PLCReader":
        return PLCReader(self._path(), schema)

    def writer(self, schema: StructType, overwrite: bool) -> "PLCWriter":
        return PLCWriter(self._path(), schema, overwrite,
                         self.options.get("max_chunk_values"))

    def streamReader(self, schema: StructType) -> "PLCStreamReader":
        return PLCStreamReader(self._path(), schema)


class PLCChunkPartition(InputPartition):
    def __init__(self, file: str, rows: list[int] | None):
        self.file = file
        self.rows = rows  # chunk row indices surviving pruning; None = all


class PLCReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self.schema = schema  # Spark's PRUNED projection
        if os.path.exists(os.path.join(path, "_manifest", "plan.json")):
            self.roots = [path]
        else:
            # streaming root: batch read = union of COMMITTED batch stores
            self.roots = [os.path.join(path, f"batch={bid}")
                          for bid in _committed_batch_ids(path)]
            if not self.roots:
                raise FileNotFoundError(
                    f"{path} is neither a plc store (_manifest/plan.json) "
                    f"nor a stream root with committed batch=<id> stores")
        self.plan = _load_plan(self.roots[0])
        full = StructType.fromJson(self.plan["schema"])
        self.col_types = {f.name: f.dataType.simpleString() for f in full}
        self.wcol = self.plan.get("weight_col", "n_tok")
        self.bounds: dict[str, list] = {}  # col -> [lo, hi] (inclusive)

    # -- filter pushdown ---------------------------------------------------

    def _tighten(self, col: str, lo=None, hi=None) -> None:
        b = self.bounds.setdefault(col, [None, None])
        if lo is not None and (b[0] is None or lo > b[0]):
            b[0] = lo
        if hi is not None and (b[1] is None or hi < b[1]):
            b[1] = hi

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, (GreaterThan, GreaterThanOrEqual, LessThan,
                              LessThanOrEqual, EqualTo)) \
                    and len(f.attribute) == 1 \
                    and f.attribute[0] in self.col_types:
                col, v = f.attribute[0], f.value
                # strict bounds relax to inclusive — pruning stays a
                # superset; Spark re-applies the exact predicate anyway
                if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    self._tighten(col, lo=v)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    self._tighten(col, hi=v)
                else:
                    self._tighten(col, lo=v, hi=v)
            yield f  # everything is "unsupported": Spark re-filters exactly

    # -- planning ----------------------------------------------------------

    def _chunk_survives(self, meta: dict) -> bool:
        for col, (lo, hi) in self.bounds.items():
            if col == "doc_id":
                if lo is not None and meta["max_doc_id"] is not None \
                        and meta["max_doc_id"] < lo:
                    return False
                if hi is not None and meta["min_doc_id"] is not None \
                        and meta["min_doc_id"] > hi:
                    return False
                if lo is not None and lo == hi:
                    # exact probe: the per-chunk doc_id bloom can rule the
                    # chunk out even when its min/max range overlaps
                    from plc.chunk import bloom_might_contain

                    st = json.loads(meta["stats"]).get("doc_id", {})
                    if not bloom_might_contain(st, lo):
                        return False
                continue
            if col == self.wcol and self.wcol != "_w":
                if lo is not None and meta["max_w"] is not None \
                        and meta["max_w"] < lo:
                    return False
                if hi is not None and meta["min_w"] is not None \
                        and meta["min_w"] > hi:
                    return False
                continue
            st = json.loads(meta["stats"]).get(col, {})
            smin, smax = st.get("min"), st.get("max")
            if smin is None and smax is None:
                continue  # no stat recorded → keep
            dt = self.col_types.get(col, "")
            if dt in ("timestamp", "timestamp_ntz", "date"):
                # constants shared with pipeline.select_chunks — one
                # source of truth for the pruning semantics
                from plc.pipeline import (TEMPORAL_TZ_SLACK_US,
                                          TEMPORAL_UNIT_TO_US, _temporal_us)

                fac = TEMPORAL_UNIT_TO_US.get(st.get("unit"), 1.0)
                if lo is not None and smax is not None \
                        and smax * fac < _temporal_us(lo) - TEMPORAL_TZ_SLACK_US:
                    return False
                if hi is not None and smin is not None \
                        and smin * fac > _temporal_us(hi) + TEMPORAL_TZ_SLACK_US:
                    return False
                continue
            if lo is not None and smax is not None and smax < lo:
                return False
            if hi is not None and smin is not None and smin > hi:
                return False
        return True

    def partitions(self):
        parts = []
        for root in self.roots:
            parts.extend(self._partitions_for(root))
        return parts

    def _partitions_for(self, root: str):
        committed = _committed_parts(root)
        data = os.path.join(root, "data")
        parts = []
        for pdir in sorted(glob.glob(os.path.join(data, "part_id=*"))):
            pid = int(os.path.basename(pdir).split("=")[1])
            if pid not in committed:
                continue  # crashed/uncommitted part: invisible
            for f in sorted(glob.glob(os.path.join(pdir, "*.parquet"))):
                meta = pq.read_table(f, columns=_META_COLS)
                keep = [i for i in range(meta.num_rows)
                        if self._chunk_survives(
                            {c: meta.column(c)[i].as_py()
                             for c in _META_COLS})]
                if not keep:
                    continue
                rows = None if len(keep) == meta.num_rows else keep
                parts.append(PLCChunkPartition(f, rows))
        return parts

    # -- execution (one task per encoded file) ------------------------------

    def read(self, partition: PLCChunkPartition):
        yield from _read_chunk_partition(partition, self.schema)


def _read_chunk_partition(partition: PLCChunkPartition | None,
                          schema: StructType):
    """Executor-side decode of one chunk-file partition (shared by the
    batch and stream readers)."""
    import pyarrow as pa

    from plc.chunk import unpack_chunk

    if partition is None:  # Spark probes an empty partition list once
        return
    names = [f.name for f in schema.fields]
    if not names:
        # zero-column projection (SELECT count(*)): row counts come
        # from the chunk metadata, no frame is ever decoded
        tbl = pq.read_table(partition.file, columns=["n_rows"])
        rows = tbl.column("n_rows").to_pylist()
        idxs = (range(len(rows)) if partition.rows is None
                else partition.rows)
        for i in idxs:
            yield pa.RecordBatch.from_struct_array(
                pa.array([{}] * rows[i], pa.struct([])))
        return
    tbl = pq.read_table(partition.file, columns=["payload"])
    payloads = tbl.column("payload")
    idxs = (range(len(payloads)) if partition.rows is None
            else partition.rows)
    for i in idxs:
        rb = unpack_chunk(payloads[i].as_buffer(), columns=names)
        yield rb.select(names)


class PLCStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("plc")`` over a
    :func:`plc.streaming.encode_stream` output root: every newly COMMITTED
    ``batch=<id>`` sub-store (manifest present — in-flight/crashed batches
    stay invisible) becomes input of the next micro-batch, decoded
    executor-side through the same chunk partitions as the batch reader.
    Offsets are the max committed batch id, so restart/replay is exact."""

    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.schema = schema

    def _committed_ids(self) -> list[int]:
        return _committed_batch_ids(self.path)

    def initialOffset(self) -> dict:
        return {"last": -1}

    def latestOffset(self) -> dict:
        ids = self._committed_ids()
        return {"last": ids[-1] if ids else -1}

    def partitions(self, start: dict, end: dict):
        parts: list[PLCChunkPartition] = []
        for bid in self._committed_ids():
            if start["last"] < bid <= end["last"]:
                bpath = os.path.join(self.path, f"batch={bid}")
                parts.extend(PLCReader(bpath, self.schema).partitions())
        return parts

    def read(self, partition: PLCChunkPartition):
        yield from _read_chunk_partition(partition, self.schema)

    def commit(self, end: dict) -> None:
        pass  # batch dirs are the durable record; nothing to release

    def stop(self) -> None:
        pass


@dataclass
class PLCCommit(WriterCommitMessage):
    part_id: int
    file: str | None
    n_chunks: int
    n_rows: int
    n_tokens: int
    raw_bytes: int
    enc_bytes: int
    min_doc_id: str | None
    max_doc_id: str | None


class PLCWriter(DataSourceArrowWriter):
    """``df.write.format("plc").mode("overwrite").save(dst)`` — the fully
    declarative encode: each Spark task packs its partition into codec
    chunks (one logical part per task partition) and the driver commits
    plan + lineage manifest from the task messages, so the layout users
    choose upstream IS the storage layout::

        (df.repartitionByRange(64, "doc_id").sortWithinPartitions("doc_id")
           .write.format("plc").mode("overwrite").save(dst))

    Differences from :func:`plc.pipeline.encode`: no stats pre-pass, no
    skew salting, no resume (task retries are handled by the commit
    protocol instead: only files named in SUCCESSFUL task messages survive
    commit, so speculative/retried attempts can never duplicate data).
    The written store is identical on disk — decode(), verify(), metrics()
    and the format reader all work on it."""

    def __init__(self, path: str, schema: StructType, overwrite: bool,
                 max_chunk_values):
        import shutil

        if "doc_id" not in schema.fieldNames():
            raise ValueError("plc stores require a doc_id column "
                             "(chunk pruning + lineage identity)")
        self.path = path
        self.schema = schema
        self.max_vals = int(max_chunk_values or (1 << 22))
        self.wcol = "n_tok" if "n_tok" in schema.fieldNames() else "_w"
        has_state = (os.path.exists(os.path.join(path, "_manifest"))
                     or os.path.exists(os.path.join(path, "data")))
        if has_state:
            if not overwrite:
                raise FileExistsError(
                    f"{path} already has encode state; plc format writes "
                    f"support mode('overwrite') — for append/resume use "
                    f"plc.encode(..., resume=True)")
            shutil.rmtree(self.path, ignore_errors=True)

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.compute as pc

        from pyspark import TaskContext

        from plc.chunk import EncodeConfig, column_stats, pack_chunk
        from plc.pipeline import _ENC_ARROW_SCHEMA

        pid = TaskContext.get().partitionId()
        cfg = EncodeConfig()
        enc_rows: list[pa.RecordBatch] = []
        buf: list[pa.RecordBatch] = []
        wsum = 0
        chunk_idx = 0
        totals = {"rows": 0, "tokens": 0, "raw": 0, "enc": 0}
        mins, maxs = [], []

        def flush():
            nonlocal buf, wsum, chunk_idx
            if not buf:
                return
            big = (buf[0] if len(buf) == 1 else
                   pa.Table.from_batches(buf).combine_chunks()
                   .to_batches(max_chunksize=1 << 31)[0])
            blob, codecs = pack_chunk(big, cfg)
            stats = column_stats(big)
            mm = pc.min_max(big.column("doc_id")).as_py()
            wstat = stats.get("n_tok", {})
            toks = int(wsum) if self.wcol == "n_tok" else big.num_rows
            raw_b = toks * 4 if self.wcol == "n_tok" else int(big.nbytes)
            enc_rows.append(pa.RecordBatch.from_arrays([
                pa.array([pid], pa.int32()),
                pa.array([chunk_idx], pa.int32()),
                pa.array([big.num_rows], pa.int64()),
                pa.array([toks], pa.int64()),
                pa.array([raw_b], pa.int64()),
                pa.array([len(blob)], pa.int64()),
                pa.array([mm["min"]], pa.string()),
                pa.array([mm["max"]], pa.string()),
                pa.array([wstat.get("min")], pa.int64()),
                pa.array([wstat.get("max")], pa.int64()),
                pa.array([json.dumps(stats)], pa.string()),
                pa.array([json.dumps(codecs)], pa.string()),
                pa.array([blob], pa.binary()),
            ], schema=_ENC_ARROW_SCHEMA))
            totals["rows"] += big.num_rows
            totals["tokens"] += toks
            totals["raw"] += raw_b
            totals["enc"] += len(blob)
            mins.append(mm["min"])
            maxs.append(mm["max"])
            chunk_idx += 1
            buf, wsum = [], 0

        for batch in iterator:
            if batch.num_rows == 0:
                continue
            w = (int(pc.sum(batch.column("n_tok")).as_py() or 0)
                 if self.wcol == "n_tok" else batch.num_rows)
            buf.append(batch)
            wsum += w
            if wsum >= self.max_vals:
                flush()
        flush()
        if not enc_rows:
            return PLCCommit(pid, None, 0, 0, 0, 0, 0, None, None)
        # tasks write to a STAGING dir; only commit() moves files named in
        # successful task messages into the data layout. A zombie or
        # speculative attempt finishing after commit's cleanup therefore
        # lands in staging (which readers never look at), not in a
        # committed part dir — the property a delete-the-orphans scan at
        # commit time cannot give (the zombie can finish after the scan).
        sdir = os.path.join(self.path, "_staging")
        os.makedirs(sdir, exist_ok=True)
        fname = f"part-{pid:05d}-{uuid.uuid4().hex}.parquet"
        tbl = pa.Table.from_batches(enc_rows).drop_columns(["part_id"])
        pq.write_table(tbl, os.path.join(sdir, fname),
                       compression="none")
        return PLCCommit(pid, fname, chunk_idx, totals["rows"],
                         totals["tokens"], totals["raw"], totals["enc"],
                         min(mins), max(maxs))

    def commit(self, messages) -> None:
        import shutil

        import pyarrow as pa

        msgs = [m for m in messages if m is not None]
        # promote exactly the files named by SUCCESSFUL attempts from
        # staging into the data layout (one winning attempt per partition
        # by Spark's commit protocol), then drop staging with whatever
        # orphans lost attempts left there
        sdir = os.path.join(self.path, "_staging")
        for m in msgs:
            if not m.file:
                continue
            pdir = os.path.join(self.path, "data", f"part_id={m.part_id}")
            os.makedirs(pdir, exist_ok=True)
            os.replace(os.path.join(sdir, m.file),
                       os.path.join(pdir, m.file))
        shutil.rmtree(sdir, ignore_errors=True)
        os.makedirs(os.path.join(self.path, "_manifest", "parts"),
                    exist_ok=True)
        plan = {
            "n_parts": (max((m.part_id for m in msgs), default=0) + 1),
            "bounds": [], "tau": 2**31 - 1, "weight_col": self.wcol,
            "straggler_parts": 0,
            "total_rows": sum(m.n_rows for m in msgs),
            "schema": self.schema.jsonValue(),
        }
        with open(os.path.join(self.path, "_manifest", "plan.json"),
                  "w") as f:
            json.dump(plan, f)
        man = pa.table({
            "part_id": pa.array([m.part_id for m in msgs], pa.int32()),
            "n_chunks": pa.array([m.n_chunks for m in msgs], pa.int64()),
            "n_rows": pa.array([m.n_rows for m in msgs], pa.int64()),
            "n_tokens": pa.array([m.n_tokens for m in msgs], pa.int64()),
            "raw_bytes": pa.array([m.raw_bytes for m in msgs], pa.int64()),
            "enc_bytes": pa.array([m.enc_bytes for m in msgs], pa.int64()),
            "min_doc_id": pa.array([m.min_doc_id for m in msgs],
                                   pa.string()),
            "max_doc_id": pa.array([m.max_doc_id for m in msgs],
                                   pa.string()),
        })
        pq.write_table(man, os.path.join(self.path, "_manifest", "parts",
                                         "manifest-0.parquet"))

    def abort(self, messages) -> None:
        import shutil

        # no manifest was committed, so nothing is readable; drop staged
        # files (and any data dir from a partial commit) for a clean retry
        shutil.rmtree(os.path.join(self.path, "_staging"),
                      ignore_errors=True)
        shutil.rmtree(os.path.join(self.path, "data"), ignore_errors=True)


def register(spark) -> None:
    """Register the ``plc`` format on this session (idempotent). Also
    enables Python data source filter pushdown — a reader that implements
    ``pushFilters`` hard-fails under Spark's default-off setting."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PLCDataSource)
