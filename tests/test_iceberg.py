"""Jar-gated Iceberg backend smoke test (round-2 VERDICT #8).

The sandbox has no Iceberg Spark runtime jar and no network to fetch one,
so this module auto-skips here; on any environment where the jar is on the
classpath (e.g. `spark-submit --packages org.apache.iceberg:...`) it
exercises IcebergStore write/read/latest against a Hadoop catalog in a
temp warehouse — the checkpoint interface's production backend
(linkgraph/checkpoint.py).
"""

import pytest

from linkgraph.checkpoint import IcebergStore, iceberg_available


def test_iceberg_store_smoke(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on classpath")
    # catalogs resolve lazily, so runtime conf is enough — no session restart
    spark.conf.set("spark.sql.catalog.lg", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.lg.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lg.warehouse", str(tmp_path / "warehouse"))

    store = IcebergStore(spark)
    r1 = spark.createDataFrame([(1, 0.25), (2, 0.75)], "node long, rank double")
    store.write_iteration("smoke", 1, r1, {"norm": 0.1})
    assert store.latest_iteration("smoke") == 1
    got = {r["node"]: r["rank"] for r in store.read_ranks(spark, "smoke", 1).collect()}
    assert got == {1: 0.25, 2: 0.75}

    r2 = spark.createDataFrame([(1, 0.5), (2, 0.5)], "node long, rank double")
    store.write_iteration("smoke", 2, r2, {"norm": 0.05})
    assert store.latest_iteration("smoke") == 2
    # iteration-partitioned reads stay isolated after the append
    got1 = {r["node"]: r["rank"] for r in store.read_ranks(spark, "smoke", 1).collect()}
    assert got1 == {1: 0.25, 2: 0.75}


def test_iceberg_store_refuses_without_jar(spark):
    if iceberg_available(spark):
        pytest.skip("jar present — covered by the smoke test")
    with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        IcebergStore(spark)
