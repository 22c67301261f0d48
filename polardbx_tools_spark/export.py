"""Export sinks + DDL snapshot utilities.

Reference parity (SURVEY.md §2.2/§2.7):
* file export with rotation at N rows / fixed file count, optional
  header, gzip — ``worker/export/DirectExportWorker.java:173-332`` (K7)
  → ``maxRecordsPerFile`` / ``repartition(file_num)`` + codec option;
* ordered export (DB-pushed ORDER BY + local k-way merge,
  ``exec/export/OrderByExportExecutor.java:90-230``, O1-O3) →
  ``df.orderBy`` — Catalyst's range-partitioned sort replaces the
  hand-rolled PriorityQueue merge;
* masking applied at the export projection
  (``worker/export/BaseExportWorker.java:203-207``);
* DDL export/import — ``worker/ddl/DdlExportWorker.java:91-148`` /
  ``DdlImportWorker.java:88-215`` (K9/K10) → schema JSON snapshot +
  create-from-snapshot (additive evolution handled by the lake layer).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from polardbx_tools_spark.lake.table import LakeTable


def export_csv(
    df: DataFrame,
    path: str,
    order_by: list[str] | None = None,
    descending: bool = False,
    max_rows_per_file: int | None = None,
    file_num: int | None = None,
    header: bool = True,
    gzip: bool = False,
    sep: str = ",",
    null_str: str = r"\N",
    masks: dict[str, Column] | None = None,
) -> None:
    """Ordered / rotated / masked CSV export.

    ``max_rows_per_file`` ≙ reference ``-L`` rotation; ``file_num`` ≙
    fixed-file-count mode (``OrderByExportExecutor.java:121-128``).
    ``masks`` maps column name → replacement expression (P6/P7).
    """
    out = df
    if masks:
        out = out.select(
            *[masks.get(c, F.col(c)).alias(c) for c in out.columns]
        )
    if order_by:
        cols = [F.col(c).desc() if descending else F.col(c) for c in order_by]
        out = out.orderBy(*cols)
    writer = out
    if file_num:
        # fixed file count: one shuffle; within-file order preserved by
        # sortWithinPartitions when ordering was requested — with the
        # SAME direction as the requested order (a bare column list here
        # silently re-sorted descending exports ascending)
        writer = out.repartition(file_num)
        if order_by:
            writer = writer.sortWithinPartitions(
                *[F.col(c).desc() if descending else F.col(c) for c in order_by]
            )
    w = writer.write.option("header", header).option("sep", sep).option(
        "nullValue", null_str
    ).option("emptyValue", "")
    if max_rows_per_file:
        w = w.option("maxRecordsPerFile", max_rows_per_file)
    if gzip:
        w = w.option("compression", "gzip")
    w.mode("overwrite").csv(path)


def export_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_rows_per_file: int | None = None,
) -> None:
    w = df.write
    if max_rows_per_file:
        w = w.option("maxRecordsPerFile", max_rows_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").parquet(path)


def export_xlsx(
    df: DataFrame, path: str, sheet: str = "data", max_rows: int = 1_048_575
) -> int:
    """Excel export (ref ``worker/common/writer/XlsxFileWriter.java``)
    via the stdlib OpenXML writer. Driver-side and row-capped at the
    format's own sheet limit — Excel is a convenience sink, not a scale
    path (the reference single-threads it too); use export_csv/parquet
    for volume. Returns the number of data rows written.

    ``max_rows`` counts DATA rows; the prepended header occupies one of
    the format's 1,048,576 sheet rows, so the cap is limit-1 (a
    1,048,576-data-row sheet would be one past the hard limit and Excel
    would reject/repair the file)."""
    from polardbx_tools_spark.xlsx import write_xlsx

    rows = df.limit(min(max_rows, 1_048_575)).collect()
    write_xlsx(path, {sheet: [list(df.columns)] + [list(r) for r in rows]})
    return len(rows)


# ------------------------------------------------------------------- DDL

def ddl_export(table: LakeTable, path: str) -> None:
    """Schema snapshot → .ddl.json file (ref: SHOW CREATE TABLE → .ddl,
    with drop-if-exists prologue; here: full StructType JSON + layout)."""
    snap = table.snapshot()
    doc = {
        "table": os.path.basename(table.path),
        "schema": json.loads(snap.schema_json),
        "bucket_key": snap.bucket_key,
        "bucket_count": snap.bucket_count,
        "version": snap.version,
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=2)


def ddl_import(path: str, target_dir: str, if_not_exists: bool = True) -> LakeTable:
    """Create a lake table from a .ddl.json snapshot (ref K10: retry x3,
    'already exists' tolerated — here: idempotent create)."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    t = LakeTable(target_dir)
    if t.exists():
        if if_not_exists:
            return t
        raise FileExistsError(target_dir)
    return LakeTable.create(
        target_dir,
        StructType.fromJson(doc["schema"]),
        bucket_key=doc["bucket_key"],
        bucket_count=doc["bucket_count"],
    )
