"""Auxiliary sources — completing the SURVEY.md §2.1 inventory.

* S2/S1 CSV/text: `changelog.parser.parse_csv_changelog` (built-in scan).
* S3 XLSX: :func:`read_xlsx` below (driver-side pandas → DataFrame; the
  reference treats Excel as a convenience path, not a scale path —
  ``worker/common/reader/XlsxReader.java:40-63``).
* S6 DB shard scan: :func:`jdbc_shard_scan` — partitioned
  ``spark.read.jdbc``, the Spark analog of per-physical-shard SELECTs
  with streaming fetch (``worker/util/ExportUtil.java:38-64``,
  ``util/DataSourceUtil.java:38-42``). The JDBC builders are
  config-only in this sandbox (no DB — ``.load()`` would attempt a
  live connection for schema resolution); :func:`local_shards_scan`
  EXECUTES the identical topology walk + per-shard predicate/
  projection pushdown over a filesystem shard layout, so S6's
  semantics are end-to-end tested.
* S7/S9 tails: `streaming.stream.start_cdc_stream`.
* K8 S3/OSS: any writer/reader takes ``s3a://`` paths directly — no
  custom uploader needed (the reference stages to temp files + putObject,
  ``store/S3AwsFileStorage.java:32-73``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_xlsx(
    spark: SparkSession, path: str, sheet: int = 0, header: bool = True
) -> DataFrame:
    """Excel → DataFrame (ref XlsxReader.java:40-63) via the stdlib
    OpenXML reader in ``polardbx_tools_spark.xlsx`` — no openpyxl
    dependency. Driver-side by design: Excel files are small by nature
    (the reference also reads them single-threaded)."""
    from polardbx_tools_spark.xlsx import read_xlsx_rows

    rows = read_xlsx_rows(path, sheet=sheet)
    if not rows:
        raise ValueError(f"empty worksheet {sheet} in {path}")
    if header:
        cols = [str(c) for c in rows[0]]
        data = rows[1:]
    else:
        cols = [f"c{i}" for i in range(len(rows[0]))]
        data = rows
    width = len(cols)
    data = [tuple((r + [None] * width)[:width]) for r in data]
    # explicit schema from the first non-None value per column (string
    # where a column is all-None or there are no data rows): Spark's
    # inference raises on those perfectly ordinary sparse spreadsheets
    from pyspark.sql.types import (
        BooleanType, DoubleType, StringType, StructField, StructType,
    )

    def col_type(i: int):
        for r in data:
            v = r[i]
            if v is None:
                continue
            if isinstance(v, bool):
                return BooleanType()
            if isinstance(v, float):
                return DoubleType()
            return StringType()
        return StringType()

    schema = StructType(
        [StructField(c, col_type(i), True) for i, c in enumerate(cols)]
    )
    return spark.createDataFrame(data, schema)


def jdbc_shard_scan(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    fetch_size: int = 10_000,
    predicate: str | None = None,
    columns: list[str] | None = None,
    properties: dict[str, str] | None = None,
):
    """Partitioned JDBC scan builder — per-shard parallel SELECT with
    streaming fetch, projection (ref P1 ``-col``) and predicate pushdown
    (ref P2 ``-w``). Returns the configured ``DataFrameReader`` (NOT a
    DataFrame): call ``.load()`` where a database is reachable —
    ``.load()`` resolves the schema over a live JDBC connection, which
    this sandbox cannot make."""
    dbtable = table
    if columns or predicate:
        cols = ", ".join(columns) if columns else "*"
        where = f" WHERE {predicate}" if predicate else ""
        dbtable = f"(SELECT {cols} FROM {table}{where}) AS shard_scan"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def shard_topology(
    logical_table: str,
    db_count: int,
    tables_per_db: int,
    db_template: str = "{db}_{i:04d}",
    table_template: str = "{table}_{j:02d}",
    logical_db: str = "db",
) -> list[tuple[str, str]]:
    """Enumerate the physical (database, table) pairs behind a logical
    sharded table — the client-side topology walk the reference performs
    before fanning out per-shard SELECTs (``BaseShardedConsumer``'s
    physical-table loop; naming templates are deployment config). Pure
    function: drives the per-shard readers and is testable without a
    database."""
    return [
        (
            db_template.format(db=logical_db, i=i),
            table_template.format(table=logical_table, j=i * tables_per_db + j),
        )
        for i in range(db_count)
        for j in range(tables_per_db)
    ]


def shard_predicates(column: str, n_shards: int) -> list[str]:
    """One mutually-exclusive, collectively-exhaustive predicate per
    shard over a hash-routed column — the ``predicates=`` form of
    ``spark.read.jdbc`` (one executor partition per physical shard, no
    lower/upper bound needed; NULLs ride shard 0). These are MECE
    partition predicates for PARALLEL READS ONLY — the CRC32-mod bucket
    a row lands in is NOT the shard number the engine's own hash
    routing (ref DbUtil.java:386-396, Java hashCode/numeric mod) would
    assign it; every row is still scanned exactly once, which is all a
    partitioned scan needs."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    out = [f"MOD(ABS(CRC32({column})), {n_shards}) = {k}" for k in range(n_shards)]
    out[0] = f"({out[0]} OR {column} IS NULL)"
    return out


def jdbc_sharded_readers(
    spark: SparkSession,
    url_template: str,
    logical_table: str,
    db_count: int,
    tables_per_db: int,
    fetch_size: int = 10_000,
    predicate: str | None = None,
    columns: list[str] | None = None,
    properties: dict[str, str] | None = None,
    **topology_kwargs,
):
    """One configured JDBC reader per PHYSICAL shard (url_template takes
    ``{db}``): ``union_all(r.load() for r in readers)`` where a database
    is reachable — each physical table scans in parallel with projection
    + predicate pushed into its SELECT. Config-only in this sandbox
    (same contract as :func:`jdbc_shard_scan`)."""
    readers = []
    for db, tbl in shard_topology(
        logical_table, db_count, tables_per_db, **topology_kwargs
    ):
        dbtable = tbl
        if columns or predicate:
            cols = ", ".join(columns) if columns else "*"
            where = f" WHERE {predicate}" if predicate else ""
            dbtable = f"(SELECT {cols} FROM {tbl}{where}) AS shard_scan"
        r = (
            spark.read.format("jdbc")
            .option("url", url_template.format(db=db))
            .option("dbtable", dbtable)
            .option("fetchsize", str(fetch_size))
        )
        for k, v in (properties or {}).items():
            r = r.option(k, v)
        readers.append(r)
    return readers


def local_shards_scan(
    spark: SparkSession,
    root: str,
    logical_table: str,
    db_count: int,
    tables_per_db: int,
    predicate: str | None = None,
    columns: list[str] | None = None,
    fmt: str = "parquet",
    shard_col: str | None = None,
    **topology_kwargs,
) -> DataFrame:
    """RUNNABLE twin of :func:`jdbc_sharded_readers` over a physical
    shard layout on any Hadoop-visible filesystem: one directory per
    physical table at ``<root>/<db>/<table>``, unioned with the SAME
    per-shard projection + predicate the JDBC path pushes into each
    shard's SELECT (here they push into each parquet scan —
    ``PushedFilters`` / ``ReadSchema``, plan-asserted in
    tests/test_sources_sharding.py). This executes S6's semantics
    end-to-end where no database is reachable — the reference walks
    physical tables the same way before fanning out per-shard reads
    (ref ``worker/export/BaseExportWorker.java:126-180``); in
    deployment the JDBC builders scan the real shards with identical
    topology and pushdown.

    ``shard_col`` adds a provenance column naming the physical
    ``db.table`` each row came from (the reference's per-shard file
    naming carries the same information). A missing shard directory
    raises: a vanished physical table is topology corruption, not an
    empty shard."""
    from functools import reduce

    from pyspark.sql import functions as F

    dfs = []
    for db, tbl in shard_topology(
        logical_table, db_count, tables_per_db, **topology_kwargs
    ):
        df = spark.read.format(fmt).load(f"{root}/{db}/{tbl}")
        if shard_col:
            df = df.withColumn(shard_col, F.lit(f"{db}.{tbl}"))
        if predicate:
            df = df.filter(predicate)
        if columns:
            df = df.select(*(columns + ([shard_col] if shard_col else [])))
        dfs.append(df)
    return reduce(lambda a, b: a.unionByName(b), dfs)
