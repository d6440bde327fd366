"""Atomic bucket commits — a manifest-pointer protocol (WAL analogue).

Reference: ``executor/wal.go`` (write-ahead log, commit records, crash
replay) and ``executor/writer.go`` protect marketstore's in-place file
mutation.  Parquet data files are immutable, so the equivalent
guarantee here reduces to atomic VISIBILITY: a reader must see a bucket
either entirely before or entirely after a commit, never mid-write.

Protocol (the Iceberg/Delta metadata-pointer pattern, without the
dependencies):

- Data files live under ``<bucket>/data/`` with commit-unique names;
  a data file is INVISIBLE until some manifest references it, so Spark
  jobs can write them without coordination.
- Each commit produces ``<bucket>/_manifests/<n>.json`` holding the
  exact relative file list (and schema) of version ``n``.  The JSON is
  staged to a temp name, fsync'd, then published with ``os.link`` —
  atomic, and it FAILS with EEXIST if another writer claimed version
  ``n`` first.  That failure is the optimistic-concurrency retry point
  (Iceberg's compare-and-swap on the table pointer): re-read the
  current version, rebuild the file set, try ``n+1``.
- The current version is simply the highest manifest present.  A crash
  at ANY earlier point leaves orphan data files / temp manifests —
  swept by :func:`vacuum` — and never a partially-visible bucket.

Append commits cost O(new files): the new manifest is old-list ∪ new
files.  Replace commits (delete_range / compact) publish only the
rewritten set; superseded data files linger until ``vacuum``, so a
concurrent reader that already planned version ``n`` keeps a complete
snapshot (snapshot isolation, and time travel for free via
``version=``).

At 100 TB this is exactly the production shape: executors write data
files in parallel with no renames of data (object-store friendly), and
the only serialized step is a single small metadata publish.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"
_STAGE_PREFIX = ".stage-"


def _manifest_dir(bucket: str) -> str:
    return os.path.join(bucket, MANIFEST_DIR)


def is_versioned(bucket: str) -> bool:
    return os.path.isdir(_manifest_dir(bucket))


def current_version(bucket: str) -> int | None:
    """Highest published manifest id, or None for a legacy/flat bucket."""
    mdir = _manifest_dir(bucket)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(f[:-5])
        for f in os.listdir(mdir)
        if f.endswith(".json") and f[:-5].isdigit()
    ]
    return max(versions) if versions else None


def read_manifest(bucket: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(bucket), f"{version:012d}.json")) as fh:
        return json.load(fh)


def data_files(bucket: str, version: int | None = None) -> list[str]:
    """Absolute paths of the files that make up ``version`` (default:
    current).  Legacy flat buckets return their part-files directly."""
    if version is None:
        version = current_version(bucket)
    if version is None:  # legacy layout: every parquet file is live
        return sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(bucket)
            for f in fs
            if f.endswith(".parquet") and MANIFEST_DIR not in r
        )
    m = read_manifest(bucket, version)
    return [os.path.join(bucket, rel) for rel in m["files"]]


def _legacy_relative_files(bucket: str) -> list[str]:
    out = []
    for r, _, fs in os.walk(bucket):
        rel_root = os.path.relpath(r, bucket)
        if rel_root.startswith((MANIFEST_DIR, DATA_DIR, _STAGE_PREFIX)):
            continue
        for f in fs:
            if f.endswith(".parquet"):
                out.append(f if rel_root == "." else os.path.join(rel_root, f))
    return sorted(out)


def stage_files(df: DataFrame, bucket: str) -> tuple[list[str], str]:
    """Run the distributed write into a staging dir, then move the
    produced part-files under ``data/`` with a commit-unique prefix.
    The moves need no atomicity: nothing references these names until
    the manifest publishes.  Returns (relative file names, schema json).
    """
    token = uuid.uuid4().hex[:12]
    stage = os.path.join(bucket, _STAGE_PREFIX + token)
    df.write.mode("overwrite").parquet(stage)
    for entry in os.listdir(stage):
        if os.path.isdir(os.path.join(stage, entry)) and not entry.startswith(
            (".", "_")
        ):
            # Hive partition dirs carry column VALUES in their names;
            # a manifest's explicit file list would silently drop them.
            raise NotImplementedError(
                "partitioned staging is not supported by the manifest "
                "protocol; use sources.parquet.write_bucket_store for the "
                "partitioned layout"
            )
    ddir = os.path.join(bucket, DATA_DIR)
    os.makedirs(ddir, exist_ok=True)
    rels = []
    for i, f in enumerate(sorted(os.listdir(stage))):
        if not f.endswith(".parquet"):
            continue
        rel = os.path.join(DATA_DIR, f"{token}-{i:05d}.parquet")
        os.rename(os.path.join(stage, f), os.path.join(bucket, rel))
        rels.append(rel)
    schema_json = df.schema.json()
    shutil.rmtree(stage, ignore_errors=True)
    return rels, schema_json


def _check_schema_compatible(base_json: str, new_json: str, bucket: str) -> None:
    """Appends must match the bucket schema exactly (name → type).  An
    explicit-file-list scan takes the FIRST file's schema — a silently
    divergent append would drop or garble columns at read time, so
    reject it at commit time instead (the reference's writer enforces
    the bucket's column layout the same way: executor/writer.go)."""
    if not base_json or not new_json:
        return
    base = {f["name"]: f["type"] for f in json.loads(base_json)["fields"]}
    new = {f["name"]: f["type"] for f in json.loads(new_json)["fields"]}
    if base != new:
        diff = sorted(set(base.items()) ^ set(new.items()))
        raise ValueError(
            f"append schema does not match bucket {bucket!r}: {diff}"
        )


def publish(
    bucket: str,
    new_files: list[str],
    schema_json: str,
    mode: str = "append",
    crash_hook=None,
) -> int:
    """Atomically publish a new version.  ``mode='append'`` unions the
    current file list with ``new_files``; ``mode='replace'`` makes
    ``new_files`` the entire bucket.  Returns the published version.

    ``crash_hook(point)`` is a fault-injection seam for the crash tests
    (points: 'pre_publish') — production callers leave it None.
    """
    mdir = _manifest_dir(bucket)
    os.makedirs(mdir, exist_ok=True)
    while True:
        cur = current_version(bucket)
        if mode == "append":
            if cur is not None:
                base = read_manifest(bucket, cur)
                _check_schema_compatible(base["schema"], schema_json, bucket)
                files = base["files"] + list(new_files)
                schema_json = schema_json or base["schema"]
            else:  # first commit over a legacy flat bucket adopts its files
                files = _legacy_relative_files(bucket) + list(new_files)
        else:
            files = list(new_files)
        nxt = 0 if cur is None else cur + 1
        payload = json.dumps(
            {"version": nxt, "files": files, "schema": schema_json}
        )
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex[:12]}")
        with open(tmp, "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        if crash_hook is not None:
            crash_hook("pre_publish")
        final = os.path.join(mdir, f"{nxt:012d}.json")
        try:
            os.link(tmp, final)  # atomic + exclusive: the CAS
            os.unlink(tmp)
            return nxt
        except FileExistsError:  # lost the race: retry on fresh state
            os.unlink(tmp)


def commit_write(
    df: DataFrame, bucket: str, mode: str = "append", crash_hook=None
) -> int:
    """Stage ``df`` and publish it in one call (the Catalog write path)."""
    os.makedirs(bucket, exist_ok=True)
    rels, schema_json = stage_files(df, bucket)
    return publish(bucket, rels, schema_json, mode=mode, crash_hook=crash_hook)


def read_bucket(
    spark: SparkSession, bucket: str, version: int | None = None
) -> DataFrame:
    """Plan a scan of the bucket's committed snapshot.  An explicit
    file list goes to the reader (not the directory), so half-staged
    data files are structurally invisible."""
    if not is_versioned(bucket):
        return spark.read.parquet(bucket)  # legacy flat layout
    if version is None:
        version = current_version(bucket)
    m = read_manifest(bucket, version)
    files = [os.path.join(bucket, rel) for rel in m["files"]]
    if not files:
        schema = StructType.fromJson(json.loads(m["schema"]))
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files)


def vacuum(bucket: str, keep_versions: int = 1) -> dict:
    """Remove data files no manifest in the kept window references,
    stale staging dirs, and temp manifests.  Safe after crashes: orphans
    are exactly the files no published manifest names."""
    removed_files = 0
    for entry in os.listdir(bucket):
        if entry.startswith(_STAGE_PREFIX):
            shutil.rmtree(os.path.join(bucket, entry), ignore_errors=True)
    cur = current_version(bucket)
    if cur is None:
        return {"removed_files": 0, "removed_manifests": 0}
    mdir = _manifest_dir(bucket)
    keep = set(range(max(0, cur - keep_versions + 1), cur + 1))
    live: set[str] = set()
    removed_manifests = 0
    for f in sorted(os.listdir(mdir)):
        if f.startswith(".tmp-"):
            os.unlink(os.path.join(mdir, f))
            continue
        if not (f.endswith(".json") and f[:-5].isdigit()):
            continue
        v = int(f[:-5])
        if v in keep:
            live.update(read_manifest(bucket, v)["files"])
        else:
            os.unlink(os.path.join(mdir, f))
            removed_manifests += 1
    # Sweep every unreferenced parquet file — data/ orphans AND flat
    # legacy files superseded after the bucket was adopted.
    for r, _, fs in os.walk(bucket):
        if os.path.relpath(r, bucket).startswith(MANIFEST_DIR):
            continue
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(r, f), bucket)
            if rel not in live:
                os.unlink(os.path.join(r, f))
                removed_files += 1
    return {"removed_files": removed_files, "removed_manifests": removed_manifests}
