"""Co-located bucketed join: the 100 TB fact-to-fact join strategy.

Broadcast covers small dims; when BOTH join sides are huge (e.g. the
CDC change log joined to the current table state, or two fact tables
keyed on doc_id), the scale play is bucketing: write both sides
``bucketBy(N, key)`` so the shuffle happens once at WRITE time and every
subsequent join on the key is exchange-free — each task reads matching
bucket files from both sides. This test pins that contract: the joined
physical plan contains a SortMergeJoin and ZERO shuffle exchanges.

(The CDC sink reaches the same co-location by construction — its
pmod(hash(key)) bucket layout aligns a fresh key shuffle with the file
layout; see cdc/storage.py. This test demonstrates the catalog-table
form a user would reach for.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_events")
    orders = spark.range(0, 2_000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 97).alias("o_val"),
    )
    events = spark.range(0, 6_000).select(
        (F.col("id") % 2_000).alias("user_id"),
        (F.col("id") % 13).alias("e_val"),
    )
    (orders.write.bucketBy(8, "user_id").sortBy("user_id")
     .mode("overwrite").saveAsTable("bkt_orders"))
    (events.write.bucketBy(8, "user_id").sortBy("user_id")
     .mode("overwrite").saveAsTable("bkt_events"))
    yield "bkt_orders", "bkt_events"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_events")


def test_bucketed_join_is_exchange_free(spark, bucketed_pair):
    a, b = bucketed_pair
    # test tables are tiny, so the planner would broadcast (and skip the
    # bucket layout); disable auto-broadcast to plan the big-big case
    # this strategy exists for at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located: the bucket layout IS the shuffle
        assert "Exchange" not in plan
        # and it computes the right thing
        assert joined.count() == 6_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_reuses_layout(spark, bucketed_pair):
    _, b = bucketed_pair
    agg = spark.table(b).groupBy("user_id").agg(F.sum("e_val").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # group-by key == bucket key: no shuffle
    assert agg.count() == 2_000
