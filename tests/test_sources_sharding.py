"""S6 shard-scan: topology/predicate pure functions, plus the RUNNABLE
filesystem twin (local_shards_scan) that executes the identical
topology walk + per-shard pushdown end-to-end — only the live JDBC
``.load()`` stays config-only in this sandbox (no database)."""

import sys

sys.path.insert(0, "/root/repo")

from polardbx_tools_spark.sources import (
    local_shards_scan,
    shard_predicates,
    shard_topology,
)


def test_shard_topology_enumerates_all_physical_tables():
    topo = shard_topology("orders", db_count=4, tables_per_db=2)
    assert len(topo) == 8
    assert topo[0] == ("db_0000", "orders_00")
    assert topo[-1] == ("db_0003", "orders_07")
    # physical table suffixes are globally unique and dense
    suffixes = [int(t.rsplit("_", 1)[1]) for _, t in topo]
    assert suffixes == list(range(8))


def test_shard_topology_custom_templates():
    topo = shard_topology(
        "t", 2, 1, db_template="{db}{i}", table_template="{table}_{j:05d}",
        logical_db="x",
    )
    assert topo == [("x0", "t_00000"), ("x1", "t_00001")]


def test_shard_predicates_partition_the_domain():
    preds = shard_predicates("user_id", 4)
    assert len(preds) == 4
    # exhaustive: every shard id appears exactly once; NULLs covered
    assert "IS NULL" in preds[0]
    for k, p in enumerate(preds):
        assert f"= {k}" in p
        assert "user_id" in p


def test_shard_predicates_rejects_bad_count():
    import pytest

    with pytest.raises(ValueError):
        shard_predicates("c", 0)


def _build_shard_layout(spark, tmp_path, db_count=4, tables_per_db=2):
    """Physical shard layout: orders hash-routed over 8 (db, table)
    dirs — the on-disk shape BaseExportWorker's topology walk expects."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    topo = shard_topology("orders", db_count, tables_per_db)
    n = len(topo)
    routed = orders.withColumn(
        "_s", F.pmod(F.xxhash64("o_custkey"), F.lit(n))
    )
    root = str(tmp_path / "shards")
    for s, (db, tbl) in enumerate(topo):
        routed.filter(F.col("_s") == s).drop("_s").coalesce(1).write.parquet(
            f"{root}/{db}/{tbl}"
        )
    return orders, root


def test_local_shards_scan_executes_topology_with_pushdown(spark, tmp_path):
    """Scanning 8 physical shards with predicate + projection must (a)
    return exactly the logical table's filtered/projected rows, (b) push
    the filter and the 2-column read schema into EVERY shard's parquet
    scan, and (c) attribute provenance via shard_col."""
    orders, root = _build_shard_layout(spark, tmp_path)
    got = local_shards_scan(
        spark, root, "orders", 4, 2,
        predicate="o_totalprice > 100000",
        columns=["o_orderkey", "o_totalprice"],
    )
    want = orders.filter("o_totalprice > 100000").select(
        "o_orderkey", "o_totalprice"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("GreaterThan(o_totalprice,100000") == 8, plan
    # column pruning: every shard scan reads ONLY the projected columns
    for seg in plan.split("ReadSchema: ")[1:]:
        schema_line = seg.splitlines()[0]
        assert "o_orderkey" in schema_line and "o_totalprice" in schema_line
        assert "o_comment" not in schema_line and "o_custkey" not in schema_line

    # provenance column names the physical shard
    tagged = local_shards_scan(
        spark, root, "orders", 4, 2, shard_col="shard",
        columns=["o_orderkey"],
    )
    shards = {r["shard"] for r in tagged.select("shard").distinct().collect()}
    assert shards == {f"db_{i:04d}.orders_{i * 2 + j:02d}"
                      for i in range(4) for j in range(2)}
    assert tagged.count() == orders.count()


def test_local_shards_scan_missing_shard_raises(spark, tmp_path):
    """A vanished physical table is topology corruption, not an empty
    shard — the scan must fail loudly."""
    import shutil

    import pytest
    from pyspark.errors import AnalysisException

    _, root = _build_shard_layout(spark, tmp_path)
    shutil.rmtree(f"{root}/db_0002/orders_05")
    with pytest.raises(AnalysisException):
        local_shards_scan(spark, root, "orders", 4, 2)
