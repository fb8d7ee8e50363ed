"""Filesystem-agnostic bookkeeping IO via Spark's Hadoop FileSystem.

The data and manifests are written by Spark itself (any supported FS), but
the plan JSON and existence checks were previously driver-local
``os.path`` calls — which silently diverge from the data location when
``dst`` is ``hdfs://`` / ``s3a://``. These helpers route the same paths
through ``Path.getFileSystem(hadoopConf)``, so a plain local path, a
``file:`` URI, or a cluster URI all resolve exactly where Spark writes.
"""

from __future__ import annotations


def _fs_path(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def nonempty_dir(spark, path: str, suffix: str | None = None) -> bool:
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return False
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if suffix is None or name.endswith(suffix):
            return True
    return False


def listdir(spark, path: str) -> list[str]:
    """Child entry NAMES of a directory ([] when it doesn't exist)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def mkdirs(spark, path: str) -> None:
    fs, p = _fs_path(spark, path)
    fs.mkdirs(p)


def delete(spark, path: str) -> None:
    fs, p = _fs_path(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def write_text(spark, path: str, text: str) -> None:
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark, path: str) -> str:
    fs, p = _fs_path(spark, path)
    stream = fs.open(p)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()
