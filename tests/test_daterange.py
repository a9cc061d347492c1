"""date_range containment predicates (B11 second half) + extended
date_optional_time cascade forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from mario_spark import record

Q_LO, Q_HI = "1995-06-01 00:00:00", "1995-06-30 23:59:59"


def _matches(spark, rows, relation):
    """rows: (id, gt, gte, lt, lte) strings (None = absent)."""
    df = spark.createDataFrame(
        rows, "id long, gt string, gte string, lt string, lte string"
    )
    pred = record.range_query_expr(
        F.col("gt"), F.col("gte"), F.col("lt"), F.col("lte"),
        Q_LO, Q_HI, relation,
    )
    return sorted(r["id"] for r in df.filter(pred).select("id").collect())


def test_range_intersects(spark):
    rows = [
        (0, None, "1995-06-10", None, "1995-06-20"),   # inside -> hit
        (1, None, "1995-01-01", None, "1995-12-31"),   # covers  -> hit
        (2, None, "1995-07-01", None, "1995-08-01"),   # after   -> miss
        (3, None, "1995-05-01", None, "1995-05-31"),   # before  -> miss
        (4, None, "1995-06-30", None, None),           # unbounded hi -> hit
        (5, None, None, None, "1995-06-01"),           # unbounded lo -> hit
        (6, "1995-06-30", None, None, None),           # gt 06-30 < qh -> hit
        (7, "1995-07-01", None, None, None),           # gt edge: 07-01
    ]
    got = _matches(spark, rows, "intersects")
    # row 7: exclusive gt at 1995-07-01 00:00:00 < q_hi 06-30T23:59:59
    # is FALSE -> miss
    assert got == [0, 1, 4, 5, 6]


def test_range_contains(spark):
    rows = [
        (0, None, "1995-01-01", None, "1995-12-31"),  # superset -> hit
        (1, None, "1995-06-01", None, "1995-07-01"),  # covers exactly -> hit
        (2, None, "1995-06-10", None, "1995-12-31"),  # starts late -> miss
        (3, None, None, None, None),                  # fully unbounded -> hit
    ]
    assert _matches(spark, rows, "contains") == [0, 1, 3]


def test_range_within(spark):
    rows = [
        (0, None, "1995-06-10", None, "1995-06-20"),  # inside -> hit
        (1, None, "1995-05-01", None, "1995-06-20"),  # starts early -> miss
        (2, None, "1995-06-10", None, None),          # unbounded hi -> miss
        (3, None, "1995-06-01", None, "1995-06-30"),  # fits -> hit
    ]
    assert _matches(spark, rows, "within") == [0, 3]


def test_cascade_millis_and_offsets(spark):
    cases = [
        ("2001-02-03T04:05:06.789+02:00", "2001-02-03 02:05:06.789"),
        ("2001-02-03T04:05:06+02:00", "2001-02-03 02:05:06"),
        ("2001-02-03T04:05:06.250", "2001-02-03 04:05:06.25"),
        ("2001-02-03T04:05", "2001-02-03 04:05:00"),
        ("2001-02", "2001-02-01 00:00:00"),
        ("2001", "2001-01-01 00:00:00"),
        ("20010203", "2001-02-03 00:00:00"),
        ("not a date", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [
        r["p"]
        for r in df.select(
            record.parse_date_expr("s").cast("string").alias("p")
        ).collect()
    ]
    assert got == [want for _, want in cases]
