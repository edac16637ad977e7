"""Iceberg table seam (BASELINE north star: the 10^12-doc corpus is an
Iceberg table).

This sandbox has no Iceberg catalog (no spark-iceberg runtime jar), so
the engine's committed path simulates the two Iceberg primitives it needs
with hash-bucketed parquet + dynamic partition overwrite
(:mod:`ocr_platform_spark.lineage`, :mod:`ocr_platform_spark.operators.upsert`).
This module is the explicit upgrade seam: when a catalog IS configured
(``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``),
pass an :class:`IcebergSink` and the same jobs run as native Iceberg
operations instead:

* per-chunk commit → ``df.writeTo(table).overwritePartitions()`` — an
  atomic REPLACE of exactly the partitions present in the chunk (the
  dynamic-overwrite analog, but with snapshot isolation, so the staging
  copy and crash-recovery dance in ``upsert.py`` disappear);
* result edits → one ``MERGE INTO ... WHEN MATCHED THEN UPDATE`` (the
  edits side is tiny — human edits — so the merge broadcasts it).

Unit-tested at the SQL/plan-construction level (the catalog itself can't
run here); the parquet fallback is the default and fully tested.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(part: str) -> str:
    if not _IDENT.match(part):
        raise ValueError(f"invalid identifier part: {part!r}")
    return part


@dataclass(frozen=True)
class IcebergSink:
    """Target Iceberg table, ``catalog.namespace.table``."""

    catalog: str
    namespace: str
    table: str

    @property
    def qualified(self) -> str:
        return ".".join(
            _check_ident(p) for p in (self.catalog, self.namespace, self.table)
        )

    # --- chunk commit (run_extract_job's per-chunk write) --------------------

    def write_chunk(self, out_pid: DataFrame) -> None:
        """Atomic partition replacement for one chunk's buckets."""
        out_pid.writeTo(self.qualified).overwritePartitions()

    def delete_partitions_sql(self, buckets: list[int]) -> str:
        """DELETE for buckets that landed zero rows this run:
        ``overwritePartitions`` only replaces partitions present in the
        written chunk, so on a reused table an empty bucket would
        otherwise keep a prior run's rows (the Iceberg analog of the
        parquet fallback's stale-dir rmtree in ``lineage.run_extract_job``).
        Partition-predicate DELETEs are metadata-only in Iceberg.

        Visibility window: this DELETE is a SECOND Iceberg commit after
        the chunk's ``overwritePartitions`` snapshot, so a reader whose
        scan lands between the two snapshots sees run-B data in the
        written buckets alongside prior-run rows still present in the
        empty buckets. The chunk's lineage row commits only after both
        (``run_extract_job``), so resume/verification never trusts the
        intermediate state; readers needing a single atomic cut should
        read by lineage-committed snapshot id, or time-travel to the
        post-DELETE snapshot."""
        if not buckets:
            raise ValueError("delete_partitions_sql requires >= 1 bucket "
                             "(IN () is not valid SQL)")
        ids = ", ".join(str(int(b)) for b in buckets)
        return f"DELETE FROM {self.qualified} WHERE partition_id IN ({ids})"

    def delete_partitions(self, spark, buckets: list[int]) -> None:
        if buckets:
            spark.sql(self.delete_partitions_sql(buckets))

    # --- result-edit merge (upsert_results' publish) --------------------------

    def merge_sql(self, updates_view: str) -> str:
        """The MERGE INTO statement for edited documents: ``updates_view``
        must expose (doc_id, spans) — the post-edit rows. With Iceberg the
        whole upsert is this one atomic statement."""
        _check_ident(updates_view)
        return (
            f"MERGE INTO {self.qualified} t\n"
            f"USING {updates_view} u\n"
            f"ON t.doc_id = u.doc_id\n"
            f"WHEN MATCHED THEN UPDATE SET t.spans = u.spans"
        )

    def merge(self, updates: DataFrame, view_name: str = "_upsert_updates") -> None:
        updates.createOrReplaceTempView(view_name)
        updates.sparkSession.sql(self.merge_sql(view_name))
