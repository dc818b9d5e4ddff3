"""P0 full-assembly pipeline invariants (the entry() flagship).

The DuckDB oracle in the catalog checks value equality; these tests pin
the structural contract of the composed chain (Processor.java run()
analog): dense reading-order ranks, render/classification agreement, and
idempotence of the in-partition LWW dedup stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opendataloader_pdf_spark.queries import QUERIES


def _p0(spark, sf_dir):
    return QUERIES["p0_full_assembly"].fn(spark, sf_dir)


def test_ranks_dense_per_user(spark, sf_dir):
    df = _p0(spark, sf_dir)
    bad = (
        df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("rk").alias("lo"), F.max("rk").alias("hi"))
        .filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
        .count()
    )
    assert bad == 0


def test_render_matches_classification(spark, sf_dir):
    df = _p0(spark, sf_dir)
    mismatched = df.filter(
        (F.col("is_heading") & ~F.col("md").startswith("# "))
        | (~F.col("is_heading") & ~F.col("md").startswith("- "))
    ).count()
    assert mismatched == 0
    # both classes occur on the test stream (the classifier is not degenerate)
    kinds = {r.is_heading for r in df.select("is_heading").distinct().collect()}
    assert kinds == {True, False}


def test_dedup_stage_idempotent_under_duplicate_feed(spark, sf_dir):
    """Feeding the pipeline a doubled event stream (every event twice)
    must yield the identical document: the F2 LWW stage collapses the
    duplicates before segmentation."""
    from opendataloader_pdf_spark.sources.tables import load_table

    base = _p0(spark, sf_dir).toPandas()

    ev = load_table(spark, sf_dir, "events")
    doubled = ev.unionByName(ev)
    import opendataloader_pdf_spark.queries as Q

    orig = Q.load_table

    def patched(s, d, name):
        return doubled if name == "events" else orig(s, d, name)

    Q.load_table = patched
    try:
        dup = _p0(spark, sf_dir).toPandas()
    finally:
        Q.load_table = orig

    key = ["user_id", "rk"]
    a = base.sort_values(key).reset_index(drop=True)
    b = dup.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
