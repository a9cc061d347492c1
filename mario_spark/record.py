"""Mario Record data model as an explicit Spark schema + JSON source (A3).

Schema parity with the reference's universal row type
(/root/reference/pkg/record/record.go:5-36; nested objects :39-134) and
its ES mapping (/root/reference/config/es_record_mappings.json:33-401).
Declaring the schema explicitly — instead of schema inference —
reproduces Go's decoder semantics: unknown JSON keys are silently
dropped (record.go uses encoding/json struct tags; fixture record 4's
typo'd `publicacation_information` key decodes to nothing), and
`mode=FAILFAST` reproduces the generator's log.Fatal on malformed input
(/root/reference/pkg/generator/jsonrecord.go:31-33).

Also provides:
- multi-format date parsing (B11): the mapping's
  `strict_year||strict_year_month||date_optional_time||date||basic_date`
  cascade (es_record_mappings.json:121-127) as a try_to_timestamp
  coalesce ladder.
- `searchable_text`: concatenation of every analyzed (`"type":"text"`)
  field, respecting `"index": false` fields (B15 — physical_description
  :299-302, source_link :360-363, timdex_record_id :386-389 are stored
  but never searchable) and nested `include_in_parent` flattening (B14).
- `records_as_pages`: adapter onto the engine's universal pages shape
  (url <- timdex_record_id, the ES `_id` at
  /root/reference/pkg/client/elastic.go:103-107).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_s = T.StringType()
_as = T.ArrayType(_s)


def _struct(**fields: T.DataType) -> T.StructType:
    return T.StructType([T.StructField(k, v, True) for k, v in fields.items()])


RANGE = _struct(gt=_s, gte=_s, lt=_s, lte=_s)  # record.go:108-113

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("alternate_titles", T.ArrayType(_struct(kind=_s, value=_s)), True),
        T.StructField("call_numbers", _as, True),
        T.StructField("citation", _s, True),
        T.StructField("content_type", _as, True),
        T.StructField("contents", _as, True),
        T.StructField(
            "contributors",
            T.ArrayType(
                _struct(
                    affiliation=_as,
                    kind=_s,
                    identifier=_as,
                    mit_affiliated=T.BooleanType(),
                    value=_s,
                )
            ),
            True,
        ),
        T.StructField(
            "dates", T.ArrayType(_struct(kind=_s, note=_s, range=RANGE, value=_s)), True
        ),
        T.StructField("edition", _s, True),
        T.StructField("file_formats", _as, True),
        T.StructField("format", _s, True),
        T.StructField(
            "funding_information",
            T.ArrayType(
                _struct(
                    award_number=_s,
                    award_uri=_s,
                    funder_identifier=_s,
                    funder_identifier_type=_s,
                    funder_name=_s,
                )
            ),
            True,
        ),
        T.StructField(
            "holdings",
            T.ArrayType(
                _struct(
                    call_number=_s, collection=_s, format=_s,
                    location=_s, notes=_s, summary=_s,
                )
            ),
            True,
        ),
        T.StructField("identifiers", T.ArrayType(_struct(kind=_s, value=_s)), True),
        T.StructField("languages", _as, True),
        T.StructField(
            "links",
            T.ArrayType(_struct(kind=_s, restrictions=_s, text=_s, url=_s)),
            True,
        ),
        T.StructField("literary_form", _s, True),
        T.StructField(
            "locations",
            T.ArrayType(
                _struct(geopoint=T.ArrayType(T.FloatType()), kind=_s, value=_s)
            ),
            True,
        ),
        T.StructField("notes", T.ArrayType(_struct(kind=_s, value=_as)), True),
        T.StructField("numbering", _s, True),
        T.StructField("physical_description", _s, True),
        T.StructField("publication_frequency", _as, True),
        T.StructField("publication_information", _as, True),
        T.StructField(
            "related_items",
            T.ArrayType(
                _struct(description=_s, item_type=_s, relationship=_s, uri=_s)
            ),
            True,
        ),
        T.StructField(
            "rights", T.ArrayType(_struct(desription=_s, kind=_s, uri=_s)), True
        ),
        T.StructField("source", _s, True),
        T.StructField("source_link", _s, True),
        T.StructField("subjects", T.ArrayType(_struct(kind=_s, value=_as)), True),
        T.StructField("summary", _as, True),
        T.StructField("timdex_record_id", _s, True),
        T.StructField("title", _s, True),
    ]
)


def read_records(spark: SparkSession, path: str) -> DataFrame:
    """JSON-array file -> Records. FAILFAST == jsonrecord.go:31-33."""
    return (
        spark.read.schema(RECORD_SCHEMA)
        .option("multiLine", "true")
        .option("mode", "FAILFAST")
        .json(path)
    )


def parse_date_expr(col) -> "F.Column":
    """B11 date cascade (es_record_mappings.json:121-127):
    strict_year || strict_year_month || date_optional_time || date ||
    basic_date. date_optional_time is ISO-8601 with optional time,
    fractional seconds and zone offset — the full ladder below, most
    specific first (zone offsets resolve against the engine's pinned
    UTC session timezone, so instants are normalized like ES does)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("yyyyMMdd")),
        F.try_to_timestamp(c, F.lit("yyyy-MM")),
        F.try_to_timestamp(c, F.lit("yyyy")),
    )


# ------------------------------------------------------- date_range (B11)
# ES `date_range` fields (Range struct gt/gte/lt/lte, record.go:108-113,
# mapping es_record_mappings.json:115-118) answer range queries with a
# `relation` of intersects (default) / contains / within. Bounds are
# strings parsed through the same cascade; gt/lt are exclusive, gte/lte
# inclusive; a missing side is unbounded.


def _range_bounds(gt, gte, lt, lte):
    """-> (lo, lo_incl, hi, hi_incl) Columns; lo/hi NULL = unbounded."""
    lo = F.coalesce(parse_date_expr(gte), parse_date_expr(gt))
    lo_incl = parse_date_expr(gte).isNotNull()
    hi = F.coalesce(parse_date_expr(lte), parse_date_expr(lt))
    hi_incl = parse_date_expr(lte).isNotNull()
    return lo, lo_incl, hi, hi_incl


def range_query_expr(gt, gte, lt, lte, q_lo, q_hi, relation: str = "intersects"):
    """Predicate: does the row's [gt/gte, lt/lte) range relate to the
    CLOSED query interval [q_lo, q_hi] under `relation`? All six ES
    bound/relation combinations; pure Catalyst comparisons (codegen,
    pushdown-friendly once bounds are materialized columns)."""
    lo, lo_incl, hi, hi_incl = _range_bounds(gt, gte, lt, lte)
    ql = F.lit(q_lo).cast("timestamp")
    qh = F.lit(q_hi).cast("timestamp")
    # per-side tests, treating NULL bound as unbounded
    lower_intersects = F.coalesce(
        F.when(lo_incl, lo <= qh).otherwise(lo < qh), F.lit(True)
    )
    upper_intersects = F.coalesce(
        F.when(hi_incl, hi >= ql).otherwise(hi > ql), F.lit(True)
    )
    if relation == "intersects":
        return lower_intersects & upper_intersects
    if relation == "contains":  # row range ⊇ [q_lo, q_hi]
        lo_ok = F.coalesce(
            F.when(lo_incl, lo <= ql).otherwise(lo < ql), F.lit(True)
        )
        hi_ok = F.coalesce(
            F.when(hi_incl, hi >= qh).otherwise(hi > qh), F.lit(True)
        )
        return lo_ok & hi_ok
    if relation == "within":  # row range ⊆ [q_lo, q_hi]; unbounded side fails
        # an exclusive bound at exactly ql/qh is still within; lo >= ql
        # covers both inclusivities (conservative for exclusive bounds)
        lo_ok = F.coalesce(lo >= ql, F.lit(False))
        hi_ok = F.coalesce(hi <= qh, F.lit(False))
        return lo_ok & hi_ok
    raise ValueError(f"unknown relation: {relation}")


# Analyzed (`"type":"text"`) record fields, from es_record_mappings.json.
# Excluded because `"index": false`: physical_description, source_link,
# timdex_record_id (B15). Nested text reaches the parent via
# include_in_parent (B14), flattened below.
_TEXT_SIMPLE = ["citation", "title", "numbering"]
_TEXT_ARRAYS = ["call_numbers", "contents", "publication_information", "summary"]


def searchable_text_expr() -> "F.Column":
    """One text blob per record = everything the mapping marks analyzed."""
    parts = [F.coalesce(F.col(c), F.lit("")) for c in _TEXT_SIMPLE]
    for c in _TEXT_ARRAYS:
        parts.append(F.coalesce(F.array_join(F.col(c), " "), F.lit("")))
    # nested with include_in_parent: contributors.value, subjects.value,
    # notes.value, alternate_titles.value (es_record_mappings.json:35-52,
    # 76-103, 276-292)
    parts.append(
        F.coalesce(
            F.array_join(F.transform("contributors", lambda x: x["value"]), " "),
            F.lit(""),
        )
    )
    parts.append(
        F.coalesce(
            F.array_join(
                F.flatten(F.transform("subjects", lambda x: x["value"])), " "
            ),
            F.lit(""),
        )
    )
    parts.append(
        F.coalesce(
            F.array_join(F.flatten(F.transform("notes", lambda x: x["value"])), " "),
            F.lit(""),
        )
    )
    parts.append(
        F.coalesce(
            F.array_join(F.transform("alternate_titles", lambda x: x["value"]), " "),
            F.lit(""),
        )
    )
    return F.trim(F.regexp_replace(F.concat_ws(" ", *parts), r"\s+", " "))


def records_as_pages(records: DataFrame, source: str = "") -> DataFrame:
    """Record rows -> the engine's pages shape. url <- timdex_record_id
    (the ES _id, elastic.go:103-107); lang <- first language."""
    return records.select(
        F.col("timdex_record_id").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        searchable_text_expr().alias("text"),
        F.coalesce(F.element_at("languages", 1), F.lit("")).alias("lang"),
    )
