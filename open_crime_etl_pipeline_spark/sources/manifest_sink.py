"""Content-addressed shard sink with an atomic manifest — a Spark 4
Python DataSource WRITER (the write-side twin of the Socrata reader /
stream reader in ``sources/socrata.py``; SURVEY §2.1 S3/S4/S8).

The reference lands gzip-JSON pages and uploads them with
hive-partition keys (`helper.py:67-86`, `load.py:10-23`); its
exactly-once story is "delete after load + insert-on-conflict". This
sink is the lakehouse-shaped version of that landing contract:

- **Content-addressed shards**: each write task serializes its
  partition to canonical JSON lines (sorted keys, deterministic row
  order is the caller's partitioning) and names the shard by the md5
  of the UNCOMPRESSED bytes — ``shards/shard-<digest>.jsonl.gz``.
  A retried/replayed task rewrites the SAME bytes to the SAME name:
  file-level idempotence without a coordinator.
- **Atomic manifest commit**: the driver's ``commit()`` writes
  ``manifest.json`` (tmp + rename) listing exactly the committed
  shards with row counts and digests. Readers resolve the manifest
  FIRST and read only listed shards — a crashed or aborted write
  leaves either the previous manifest or none, never a torn table
  (snapshot isolation at manifest granularity). On object stores
  without atomic rename the guarantee degrades to read-committed via
  manifest content; on real filesystems rename is atomic.
- **Abort**: best-effort shard cleanup; the manifest is untouched, so
  the table stays at its previous committed version.
- **Overwrite vs append**: overwrite replaces the manifest outright;
  append unions the previous manifest's shards with the new ones.
  Unreferenced shards from overwritten versions remain on disk until
  :func:`vacuum_unreferenced` (the reference's `clear_dir` analog,
  D7 — but safe, because only the manifest defines the table).
- **Dedup-by-content is the semantics**: a shard IS its content hash,
  so appending byte-identical partition content is a no-op and two
  identical partitions in one write land once. That is deliberate —
  it is the reference's "replaying a load must not duplicate rows"
  contract (ST7, `crime_etl.py:250`) enforced by construction at the
  landing layer; callers whose batches legitimately repeat content
  must carry a batch id column (which changes the bytes).

Storage goes through ``pyarrow.fs`` (same as the ST5 landing), so
``path`` may be a local directory or any ``scheme://`` URI pyarrow
can mount (s3/gs/hdfs/file).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import posixpath
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "shard_manifest"
MANIFEST = "manifest.json"


def _fs_for(path: str):
    """(filesystem, root_path) for a local path or a scheme:// URI."""
    from pyarrow import fs as pafs

    if "://" in path:
        f, root = pafs.FileSystem.from_uri(path)
        return f, root
    return pafs.LocalFileSystem(), path


def _write_atomic(fs, final_path: str, data: bytes) -> None:
    # unique temp per ATTEMPT: two tasks producing the same
    # content-addressed shard (identical partitions, or a speculative
    # retry racing the original) must not interleave on a shared tmp —
    # one truncating while the other renames would publish a torn file
    # under a digest name that promises exact content (round-8 ADVICE).
    # The content-addressed final name already dedups the winners.
    import uuid

    tmp = f"{final_path}.{uuid.uuid4().hex}.tmp"
    with fs.open_output_stream(tmp) as out:
        out.write(data)
    fs.move(tmp, final_path)


@dataclass
class ShardCommit(WriterCommitMessage):
    shard: str      # file name under shards/
    n_rows: int
    digest: str     # md5 of the uncompressed content


class ManifestShardWriter(DataSourceWriter):
    #: rows whose compressed shard stays under this many bytes never
    #: touch disk; larger partitions spill their COMPRESSED stream to a
    #: local scratch file (``tempfile.SpooledTemporaryFile`` rollover)
    #: instead of holding the whole payload in task memory — at 100-TB
    #: shard sizes an O(partition-bytes) buffer is an OOM, and local
    #: scratch is exactly where Spark already spills shuffles.
    DEFAULT_SPILL_THRESHOLD = 64 << 20

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("shard_manifest sink requires option 'path'")
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        self.spill_threshold = int(
            options.get("spill_threshold_bytes", self.DEFAULT_SPILL_THRESHOLD)
        )

    # -- executor side ---------------------------------------------------
    def write(self, iterator) -> ShardCommit:
        """Single streaming pass: each serialized line feeds the md5
        (content address = hash of the UNCOMPRESSED bytes, unchanged)
        and a gzip stream over a spooled temp file, so peak task memory
        is O(spill_threshold), never O(partition bytes). Only once the
        digest — and therefore the final name — is known are the
        compressed bytes uploaded to a unique temp and atomically
        moved. zlib's output is independent of write-chunking at a
        fixed level, and ``mtime=0`` pins the container header, so a
        replayed task still rewrites byte-identical files (same
        idempotence contract as the buffered round-8 version; shard
        names are identical too)."""
        import tempfile

        fields = self.schema.fieldNames()
        h = hashlib.md5()
        n_rows = 0
        with tempfile.SpooledTemporaryFile(max_size=self.spill_threshold) as spool:
            with gzip.GzipFile(fileobj=spool, mode="wb", mtime=0) as gz:
                for row in iterator:
                    d = dict(zip(fields, row))
                    line = (
                        json.dumps(
                            d, sort_keys=True, default=str, ensure_ascii=False
                        )
                        + "\n"
                    ).encode("utf-8")
                    h.update(line)
                    gz.write(line)
                    n_rows += 1
            digest = h.hexdigest()
            shard = f"shard-{digest}.jsonl.gz"
            if n_rows:  # empty partitions contribute no shard
                import uuid

                fs, root = _fs_for(self.path)
                fs.create_dir(posixpath.join(root, "shards"), recursive=True)
                final = posixpath.join(root, "shards", shard)
                tmp = f"{final}.{uuid.uuid4().hex}.tmp"
                spool.seek(0)
                with fs.open_output_stream(tmp) as out:
                    while True:
                        chunk = spool.read(1 << 20)
                        if not chunk:
                            break
                        out.write(chunk)
                fs.move(tmp, final)
        return ShardCommit(shard=shard, n_rows=n_rows, digest=digest)

    # -- driver side -----------------------------------------------------
    def commit(self, messages) -> None:
        fs, root = _fs_for(self.path)
        by_file: dict[str, dict] = {}
        for m in messages:
            if m.n_rows > 0:  # identical partitions collapse (module doc)
                by_file[m.shard] = {
                    "file": m.shard, "n_rows": m.n_rows, "digest": m.digest
                }
        shards = list(by_file.values())
        epochs: dict = {}
        if not self.overwrite:
            prev = read_manifest_dict(self.path)
            if prev is not None:
                seen = {s["file"] for s in shards}
                shards = [
                    s for s in prev["shards"] if s["file"] not in seen
                ] + shards
                # keep streaming epoch attribution intact so a later
                # replayed batchId can still REPLACE its epoch
                epochs = prev.get("epochs", {})
        manifest = {
            "version": 1,
            "shards": sorted(shards, key=lambda s: s["file"]),
            "n_rows": sum(s["n_rows"] for s in shards),
        }
        if epochs:
            manifest["epochs"] = epochs
        fs.create_dir(root, recursive=True)
        _write_atomic(
            fs,
            posixpath.join(root, MANIFEST),
            json.dumps(manifest, sort_keys=True).encode("utf-8"),
        )

    def abort(self, messages) -> None:
        fs, root = _fs_for(self.path)
        committed: set[str] = set()
        prev = read_manifest_dict(self.path)
        if prev is not None:
            committed = {s["file"] for s in prev["shards"]}
        for m in messages:
            if m is None or m.n_rows == 0 or m.shard in committed:
                continue  # never delete a shard the live manifest references
            try:
                fs.delete_file(posixpath.join(root, "shards", m.shard))
            except Exception:
                pass  # best effort; unreferenced shards are vacuumable


class ManifestShardStreamWriter(DataSourceStreamWriter):
    """Streaming sink twin: one committed EPOCH per micro-batch.

    ``commit(messages, batchId)`` records the batch's shards under
    ``epochs[batchId]`` in the manifest and rebuilds the live shard
    list as the union over epochs. A REPLAYED batch (same batchId after
    a failure, the Structured Streaming at-least-once delivery)
    REPLACES its epoch rather than appending — combined with
    content-addressed shard names this makes the sink effectively
    exactly-once for deterministic batches: the replay rewrites the
    same bytes and the manifest converges to the same state.
    Single-writer-per-path assumption, same as the batch writer."""

    def __init__(self, options: dict, schema: StructType):
        self._inner = ManifestShardWriter(options, schema, overwrite=False)
        self.path = self._inner.path

    def write(self, iterator) -> ShardCommit:
        return self._inner.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        fs, root = _fs_for(self.path)
        prev = read_manifest_dict(self.path) or {
            "version": 1, "shards": [], "n_rows": 0, "epochs": {}
        }
        epochs = dict(prev.get("epochs", {}))
        by_file: dict[str, dict] = {}
        for m in messages:
            if m is not None and m.n_rows > 0:
                by_file[m.shard] = {
                    "file": m.shard, "n_rows": m.n_rows, "digest": m.digest
                }
        old_epoch_files = {
            s["file"]
            for eshards in prev.get("epochs", {}).values()
            for s in eshards
        }
        epochs[str(batchId)] = sorted(by_file.values(), key=lambda s: s["file"])
        # batch-written (non-epoch) shards survive streaming commits
        merged: dict[str, dict] = {
            s["file"]: s
            for s in prev["shards"]
            if s["file"] not in old_epoch_files
        }
        for eshards in epochs.values():
            for s in eshards:
                merged[s["file"]] = s
        manifest = {
            "version": 1,
            "shards": sorted(merged.values(), key=lambda s: s["file"]),
            "n_rows": sum(s["n_rows"] for s in merged.values()),
            "epochs": epochs,
        }
        fs.create_dir(root, recursive=True)
        _write_atomic(
            fs,
            posixpath.join(root, MANIFEST),
            json.dumps(manifest, sort_keys=True).encode("utf-8"),
        )

    def abort(self, messages, batchId: int) -> None:
        self._inner.abort([m for m in messages if m is not None])


class ManifestShardDataSource(DataSource):
    """``df.write.format("shard_manifest").option("path", p).save()``
    and ``df.writeStream.format("shard_manifest")`` (epoch manifests)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return ManifestShardWriter(self.options, schema, overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> DataSourceStreamWriter:
        return ManifestShardStreamWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(ManifestShardDataSource)


# -- read side (manifest-resolved snapshot) -------------------------------

def read_manifest_dict(path: str) -> dict | None:
    from pyarrow.fs import FileType

    fs, root = _fs_for(path)
    mpath = posixpath.join(root, MANIFEST)
    if fs.get_file_info(mpath).type == FileType.NotFound:
        return None
    with fs.open_input_stream(mpath) as f:
        return json.loads(f.read().decode("utf-8"))


def read_manifest(spark, path: str, schema=None):
    """Snapshot read: ONLY the shards the committed manifest lists —
    stale shards from overwritten versions are invisible even though
    their files still exist."""
    man = read_manifest_dict(path)
    if man is None or not man["shards"]:
        raise FileNotFoundError(f"no committed manifest at {path}")
    _fs, root = _fs_for(path)
    files = [
        posixpath.join(path, "shards", s["file"]) for s in man["shards"]
    ]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(files)


def vacuum_unreferenced(path: str) -> list[str]:
    """Delete shard files the committed manifest does not reference
    (garbage from overwritten versions). Returns the deleted names."""
    from pyarrow.fs import FileSelector, FileType

    man = read_manifest_dict(path)
    live = {s["file"] for s in man["shards"]} if man else set()
    fs, root = _fs_for(path)
    sdir = posixpath.join(root, "shards")
    if fs.get_file_info(sdir).type == FileType.NotFound:
        return []
    deleted = []
    for info in fs.get_file_info(FileSelector(sdir)):
        name = posixpath.basename(info.path)
        if info.type == FileType.File and name not in live:
            fs.delete_file(info.path)
            deleted.append(name)
    return sorted(deleted)
