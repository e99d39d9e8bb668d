"""Atomic-manifest snapshot commit protocol shared by the streaming
maintenance layers (rank.py, components.py).

A snapshot directory ``<root>/snap=<epoch>`` becomes visible only when
``<root>/manifest-<epoch>.json`` exists; the manifest lands via Hadoop-FS
rename (atomic on HDFS; the sandbox's local FS too) onto a name that
embeds the epoch, so promotion never overwrites in place and readers
simply take the max epoch. Old snapshots are reaped after promote
(current + previous kept). All operations go through the Hadoop
FileSystem API — never os.path — so the same code is correct on HDFS/
object stores on a real cluster.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def write_manifest(spark: SparkSession, root_dir: str, epoch_id: int, body: dict):
    """Commit a snapshot: write manifest-<epoch>.tmp, fs.rename to its
    final name (atomic visibility), reap manifests/snapshots older than
    the previous epoch."""
    fs, root, jvm = _fs(spark, root_dir)
    tmp = jvm.org.apache.hadoop.fs.Path(root, f"manifest-{epoch_id}.tmp")
    final = jvm.org.apache.hadoop.fs.Path(root, f"manifest-{epoch_id}.json")
    out = fs.create(tmp, True)
    out.write(bytearray(json.dumps(body).encode()))
    out.close()
    fs.delete(final, False)  # replayed epoch: re-promote idempotently
    if not fs.rename(tmp, final):
        raise IOError(f"manifest promote failed: {tmp} -> {final}")
    epochs = sorted(list_epochs(spark, root_dir))
    for e in epochs[:-2]:  # keep current + previous
        fs.delete(jvm.org.apache.hadoop.fs.Path(root, f"manifest-{e}.json"), False)
        fs.delete(jvm.org.apache.hadoop.fs.Path(root, f"snap={e}"), True)


def list_epochs(spark: SparkSession, root_dir: str) -> list[int]:
    fs, root, _ = _fs(spark, root_dir)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("manifest-") and name.endswith(".json"):
            out.append(int(name[len("manifest-"):-len(".json")]))
    return out


def read_manifest(
    spark: SparkSession, root_dir: str, before: int | None = None
) -> dict | None:
    """Latest committed manifest; with ``before``, the latest with epoch
    strictly below it — what a REPLAYED microbatch must read so its own
    (possibly already-promoted) commit never feeds back into its input."""
    epochs = list_epochs(spark, root_dir)
    if before is not None:
        epochs = [e for e in epochs if e < before]
    if not epochs:
        return None
    fs, _, jvm = _fs(spark, root_dir)
    p = jvm.org.apache.hadoop.fs.Path(root_dir, f"manifest-{max(epochs)}.json")
    stream = fs.open(p)
    try:
        # commons-io ships with Spark; py4j can't fill a Python bytearray
        # through InputStream.read(byte[]) (arrays pass by value), so the
        # whole read happens JVM-side
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)
