"""Geo-point support (B12) and completion suggester (B13).

Reference contracts:
- geo_point: `Location.Geopoint []float32` (lon, lat) at
  /root/reference/pkg/record/record.go:96, ES mapping
  config/es_record_mappings.json:260-262. ES supports distance and
  bounding-box queries over it; we provide both as pure Catalyst
  expressions (SURVEY marks this off the correctness-critical path).
- completion suggester: `call_numbers.completion` mapping
  :60-63 (`preserve_separators: false`). ES builds an FST of input
  prefixes; the Spark-first analogue is a prefix dimension table —
  explode each value into its prefixes once at index time, then
  suggestion lookup is an equality join/filter on the prefix column
  (broadcast-able, prunable), never a scan with startswith over the
  corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lon_a, lat_a, lon_b, lat_b):
    """Great-circle distance in km as a Column (all-JVM, codegen)."""
    la, lb = F.radians(lat_a), F.radians(lat_b)
    dlat = F.radians(lat_b) - F.radians(lat_a)
    dlon = F.radians(lon_b) - F.radians(lon_a)
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(la) * F.cos(lb) * F.pow(
        F.sin(dlon / 2), 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def geo_distance_filter(
    df: DataFrame,
    geopoint_col: str,
    lon: float,
    lat: float,
    radius_km: float,
) -> DataFrame:
    """Rows whose (lon, lat) geopoint lies within radius_km of a center,
    with the distance attached (rounded 3dp). ES geo_distance analogue."""
    g = F.col(geopoint_col)
    d = haversine_km(
        g.getItem(0).cast("double"),
        g.getItem(1).cast("double"),
        F.lit(float(lon)),
        F.lit(float(lat)),
    )
    return df.withColumn("distance_km", F.round(d, 3)).filter(
        F.col("distance_km") <= radius_km
    )


def geo_bbox_filter(
    df: DataFrame, geopoint_col: str,
    min_lon: float, min_lat: float, max_lon: float, max_lat: float,
) -> DataFrame:
    """Bounding-box containment — pure comparisons, pushdown-friendly."""
    g = F.col(geopoint_col)
    return df.filter(
        (g.getItem(0) >= min_lon) & (g.getItem(0) <= max_lon)
        & (g.getItem(1) >= min_lat) & (g.getItem(1) <= max_lat)
    )


def build_completion_table(
    df: DataFrame,
    value_col: str,
    key_col: str,
    max_prefix: int = 12,
    context_col: str | None = None,
) -> DataFrame:
    """-> (prefix, value, key[, context]): the suggester's prefix
    dimension table.

    `preserve_separators: false` semantics: prefixes are computed over
    the value with separators ([ ./;=,-]) removed, lowercased. At scale
    this table is bucketable by prefix and tiny relative to the corpus
    (<= max_prefix rows per value). `context_col` carries an ES
    completion CATEGORY context alongside each row (suggest_contexts
    filters/boosts on it).
    """
    norm = F.lower(F.regexp_replace(F.col(value_col), r"[ ./;=,\-]", ""))
    extra = [F.col(context_col).alias("context")] if context_col else []
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.col(value_col).alias("value"),
            norm.alias("norm"),
            *extra,
        )
        .filter(F.length("norm") > 0)
        .select(
            "key",
            "value",
            F.explode(
                F.sequence(F.lit(1), F.least(F.length("norm"), F.lit(max_prefix)))
            ).alias("plen"),
            "norm",
            *(["context"] if context_col else []),
        )
        .select(
            F.expr("substr(norm, 1, plen)").alias("prefix"),
            "value",
            "key",
            *(["context"] if context_col else []),
        )
        .distinct()
    )


def suggest_contexts(
    completion_table: DataFrame,
    text: str,
    contexts: dict[str, float],
    k: int = 5,
) -> DataFrame:
    """ES completion context suggester (category contexts): candidates
    restricted to the given context values, each suggestion scored by
    its best context's boost (suggestion weight defaults to 1, so
    score = boost), ranked score DESC then value/key — ES's
    boosted-weight order with deterministic ties.

    The (context, boost) dim is a handful of literals broadcast onto
    the tiny prefix-bucketable completion table: one pushable prefix
    equality, no doc-sized shuffle."""
    spark = completion_table.sparkSession
    q = "".join(c for c in text.lower() if c not in " ./;=,-")
    ctx = spark.createDataFrame(
        [(c, float(b)) for c, b in contexts.items()],
        "context string, boost double",
    )
    return (
        completion_table.filter(F.col("prefix") == q)
        .join(F.broadcast(ctx), "context")
        .groupBy("value", "key")
        .agg(F.round(F.max("boost"), 4).alias("score"))
        .orderBy(F.desc("score"), "value", "key")
        .limit(k)
        .select("score", "value", "key")
    )


def suggest(completion_table: DataFrame, text: str, k: int = 5) -> DataFrame:
    """Top-k completions for a typed prefix (deterministic order)."""
    q = "".join(c for c in text.lower() if c not in " ./;=,-")
    return (
        completion_table.filter(F.col("prefix") == q)
        .select("value", "key")
        .distinct()
        .orderBy("value", "key")
        .limit(k)
    )


def suggest_fuzzy(
    completion_table: DataFrame, text: str, k: int = 5, max_edits: int = 1
) -> DataFrame:
    """ES completion suggester with `fuzzy` (FuzzyCompletionQuery,
    fuzziness=1): completions whose stored prefix is within `max_edits`
    Levenshtein edits of the typed text. A string within edit distance
    1 differs in length by at most 1, so the candidate slice is the
    prefix rows of length len(q)±1 — a pushable length predicate on the
    (tiny, bucketable) prefix dim table; the JVM levenshtein runs only
    on that slice. Exact matches rank first (dist asc), then value/key.
    """
    q = "".join(c for c in text.lower() if c not in " ./;=,-")
    n = len(q)
    return (
        completion_table.filter(
            F.length("prefix").between(n - max_edits, n + max_edits)
        )
        .withColumn("dist", F.levenshtein(F.col("prefix"), F.lit(q)))
        .filter(F.col("dist") <= max_edits)
        .groupBy("value", "key")
        .agg(F.min("dist").cast("long").alias("dist"))
        .orderBy("dist", "value", "key")
        .limit(k)
        .select("dist", "value", "key")
    )


def geotile_key(lon, lat, zoom: int):
    """ES geotile_grid bucket key "z/x/y" (slippy-map tile) as a pure
    Column expression: x = floor((lon+180)/360 * 2^z), y via the Web-
    Mercator projection, latitude clamped to the Mercator domain
    (±85.05112878 — the ES contract). All-JVM math (ln/tan/cos),
    identical IEEE arithmetic to the DuckDB oracle."""
    n = float(2**zoom)
    latc = F.greatest(
        F.least(lat, F.lit(85.05112878)), F.lit(-85.05112878)
    )
    lat_rad = F.radians(latc)
    x = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    y = F.floor(
        (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / 3.141592653589793)
        / 2.0
        * n
    ).cast("long")
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"), y.cast("string"))


def geotile_grid_agg(
    df: DataFrame, lon_col, lat_col, zoom: int = 4, size: int = 20
) -> DataFrame:
    """ES geotile_grid aggregation: top-`size` tile buckets by
    doc_count desc (key asc tiebreak) — one hash agg over the tile
    key projection, then TakeOrderedAndProject."""
    key = geotile_key(
        F.col(lon_col) if isinstance(lon_col, str) else lon_col,
        F.col(lat_col) if isinstance(lat_col, str) else lat_col,
        zoom,
    )
    g = df.groupBy(key.alias("key")).agg(
        F.count("*").cast("long").alias("doc_count")
    )
    return g.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)


def geo_distance_agg(
    df: DataFrame,
    geopoint_col: str,
    lon: float,
    lat: float,
    rings: list[tuple[str, float, float | None]],
) -> DataFrame:
    """ES geo_distance aggregation: ring buckets [from, to) km around
    an origin. Like range_agg, EMPTY rings must still be emitted (the
    ES contract), so the rings are a tiny broadcast dim table LEFT-
    joined onto per-doc haversine distances — a groupBy of a ring
    expression could not produce empty groups. The distance is pure
    JVM codegen (haversine_km); the join adds no shuffle on the doc
    side (broadcast nested loop over <=N rings).
    `rings` = [(label, lo_km, hi_km|None)] with None = unbounded."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [
            (lbl, float(lo), float(hi) if hi is not None else float("inf"))
            for lbl, lo, hi in rings
        ],
        "key string, lo double, hi double",
    )
    g = F.col(geopoint_col)
    d = F.round(
        haversine_km(
            g.getItem(0).cast("double"),
            g.getItem(1).cast("double"),
            F.lit(float(lon)),
            F.lit(float(lat)),
        ),
        3,
    )
    pts = df.select(d.alias("distance_km"))
    j = F.broadcast(dim).join(
        pts,
        (F.col("distance_km") >= F.col("lo"))
        & (F.col("distance_km") < F.col("hi")),
        "left",
    )
    return j.groupBy("key").agg(
        F.count("distance_km").cast("long").alias("doc_count")
    )


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql(lon_expr: str, lat_expr: str, precision: int) -> str:
    """Generated SQL for a standard geohash (base32, bits alternate
    lon-first) of `precision` chars. Pure arithmetic — floor/mod/least
    only, no bit operators — so the SAME string runs in Spark
    (whole-stage codegen) and DuckDB (the oracle), bit-identical. The
    classic bisection loop closes to cell indexes: lon_idx =
    floor((lon+180)/360 * 2^lon_bits) (clamped at the +180 edge), and
    global bit g (MSB-first) alternates lon/lat bits of those indexes.
    Catalyst/DuckDB CSE collapses the repeated index subexpressions."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lon_idx = (
        f"cast(least(floor((({lon_expr}) + 180.0) / 360.0 * {1 << lon_bits}),"
        f" {(1 << lon_bits) - 1}) as bigint)"
    )
    lat_idx = (
        f"cast(least(floor((({lat_expr}) + 90.0) / 180.0 * {1 << lat_bits}),"
        f" {(1 << lat_bits) - 1}) as bigint)"
    )

    def bit(g: int) -> str:
        if g % 2 == 0:
            j = g // 2
            return f"mod(floor({lon_idx} / {1 << (lon_bits - 1 - j)}), 2)"
        j = (g - 1) // 2
        return f"mod(floor({lat_idx} / {1 << (lat_bits - 1 - j)}), 2)"

    chars = []
    for c in range(precision):
        val = " + ".join(
            f"{1 << (4 - k)} * {bit(5 * c + k)}" for k in range(5)
        )
        chars.append(
            f"substr('{GEOHASH_ALPHABET}', cast({val} as int) + 1, 1)"
        )
    return "concat(" + ", ".join(chars) + ")"


def geohash_grid_agg(
    df: DataFrame,
    geopoint_col: str,
    precision: int = 4,
    size: int = 10,
) -> DataFrame:
    """ES geohash_grid aggregation: top-`size` geohash cells by
    doc_count (key asc tiebreak). The cell key is pure JVM arithmetic
    (geohash_sql — no UDF), so this is one projection + hash agg +
    TakeOrderedAndProject, the same shape as geotile_grid_agg."""
    g = F.col(geopoint_col)
    d = df.select(
        g.getItem(0).cast("double").alias("_lon"),
        g.getItem(1).cast("double").alias("_lat"),
    )
    key = F.expr(geohash_sql("_lon", "_lat", precision))
    out = d.groupBy(key.alias("key")).agg(
        F.count("*").cast("long").alias("doc_count")
    )
    return out.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)


def geo_centroid_agg(df: DataFrame, key_col: str, lon, lat) -> DataFrame:
    """ES geo_centroid aggregation: per bucket, the arithmetic mean of
    the member points' (lon, lat) — ES computes exactly this (simple
    per-dimension average, no spherical correction). One distributed
    hash agg; rounded 4dp for cross-engine identity."""
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("doc_count"),
        F.round(F.avg(lon), 4).alias("centroid_lon"),
        F.round(F.avg(lat), 4).alias("centroid_lat"),
    )


def geo_bounds_agg(df: DataFrame, key_col: str, lon, lat) -> DataFrame:
    """ES geo_bounds aggregation: per bucket, the smallest box covering
    the member points — top_left = (min lon, max lat), bottom_right =
    (max lon, min lat); wrap_longitude=false (no antimeridian
    splitting, matching ES's default output shape for non-wrapped
    data). Four algebraic min/max in one hash agg."""
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.round(F.min(lon), 4).alias("left_lon"),
        F.round(F.max(lat), 4).alias("top_lat"),
        F.round(F.max(lon), 4).alias("right_lon"),
        F.round(F.min(lat), 4).alias("bottom_lat"),
    )


# A fixed test polygon (pentagon) with every edge non-horizontal, so the
# ray-casting division below can never hit y2 == y1.
POLYGON_PENTAGON: list[tuple[float, float]] = [
    (-30.1, -20.3),
    (40.2, -45.7),
    (70.3, 10.9),
    (10.4, 60.2),
    (-55.5, 25.6),
]


def point_in_polygon_sql(
    lon_expr: str, lat_expr: str, vertices: list[tuple[float, float]]
) -> str:
    """ES geo_polygon containment as ONE generated SQL boolean — the
    classic even-odd ray cast, unrolled per edge (the polygon is a
    query-time constant, so the unrolled form is a pure codegen
    predicate that fuses into the scan; no UDF, no join). The SAME
    string is evaluated by Spark (F.expr) and by the DuckDB oracle, so
    float behavior is pinned by construction. Vertices must have no
    horizontal edge (asserted) or the slope division could divide by
    zero."""
    n = len(vertices)
    terms = []
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        assert y1 != y2, "horizontal edge would divide by zero"
        terms.append(
            f"(CASE WHEN (({y1} > {lat_expr}) <> ({y2} > {lat_expr})) "
            f"AND ({lon_expr} < ({x2} - {x1}) * ({lat_expr} - {y1}) "
            f"/ ({y2} - {y1}) + {x1}) THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


def geo_line_agg(
    df: DataFrame,
    key_col: str,
    sort_col: str,
    tiebreak_col: str,
    lon,
    lat,
    size: int = 20,
) -> DataFrame:
    """ES geo_line agg: per key, the track of points ordered by the
    sort field, truncated to the first `size` points (ES caps the line
    the same way). One hash agg per key — collect_list gathers the
    (sort, tiebreak, point) structs map-side, sort_array orders them
    inside the reduced row (no window, no global sort), slice caps the
    memory at O(size) per key after the agg. Point text is the plain
    double-to-string cast — callers must pass coordinates with exact
    short decimal representations (the synthesized grids are *.5) so
    the line string is engine-portable."""
    pt = F.concat_ws(
        " ",
        lon.cast("double").cast("string"),
        lat.cast("double").cast("string"),
    )
    rec = F.struct(
        F.col(sort_col).alias("s"),
        F.col(tiebreak_col).alias("t"),
        pt.alias("pt"),
    )
    g = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n_points"),
        F.sort_array(F.collect_list(rec)).alias("recs"),
    )
    return g.select(
        "key",
        "n_points",
        F.array_join(
            F.transform(
                F.slice("recs", 1, size), lambda r: r.getField("pt")
            ),
            ",",
        ).alias("line"),
    )


def geo_polygon_filter(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    vertices: list[tuple[float, float]],
) -> DataFrame:
    """Rows whose point lies inside the polygon (ES geo_polygon query)."""
    return df.filter(F.expr(point_in_polygon_sql(lon_col, lat_col, vertices)))
