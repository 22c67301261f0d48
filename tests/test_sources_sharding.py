"""S6 shard-scan topology/predicate logic — the parts of the JDBC shard
source that are pure functions and therefore testable without a
database (the readers themselves stay config-only in this sandbox)."""

import sys

sys.path.insert(0, "/root/repo")

from polardbx_tools_spark.sources import shard_predicates, shard_topology


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
