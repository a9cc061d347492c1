"""ES/Lucene `query_string` mini-language, compiled onto the engine's
BM25 machinery.

Mario's delegated engine exposes query_string on every search box
(TIMDEX's simple search IS a query_string query); this module gives the
Spark engine the same surface. Grammar — the subset users actually
type:

    query   := clause+
    clause  := '+' atom | '-' atom | atom
    atom    := '"' word+ '"' | word

Bare atoms are SHOULD clauses, '+' marks MUST, '-' marks MUST_NOT;
quoted atoms are phrases. Lucene BooleanQuery semantics: a doc matches
iff every must clause matches, no must_not clause matches, and — when
there are should clauses but no must clauses — at least one should
clause matches (with musts present, shoulds are pure score boosts).
Score = sum of matching must+should clause scores.

Unified clause model: every scoring clause is a CHAIN of analyzer
terms (length 1 = plain term, length > 1 = match_phrase). A clause
scores as Lucene PhraseWeight: idf = sum of member idfs, tf = chain
frequency (plain tf for a single term), saturated by BM25 — so a
single-term clause scores EXACTLY like a normal term query.

Distributed shape: all TERM clauses share one tokenize + (doc, term)
aggregation (a broadcast join against the tiny clause dim prunes it to
query terms); each PHRASE clause is one extra projection over the
token-array scan (adjacency counted in codegen, no UDF). The per-doc
combine is a single hash aggregation; matching rules reduce to
conditional counts joined against a broadcast per-query constants dim.
Production serving would route term clauses through the compressed
postings (wand.QuerySession) and phrases through positional postings
(phrase.search_phrase); this module is the semantics/composition layer
the suite verifies end-to-end against DuckDB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from mario_spark.analyze import py_tokenize, tokenize_udf
from mario_spark.query import B, K1, SCORE_DECIMALS, topk

_ATOM_RE = re.compile(r'([+-]?)(?:"([^"]*)"|(\S+))')


def parse_query_string(s: str) -> list[tuple[str, list[str]]]:
    """Parse into [(kind, chain_terms)]; kind in must|should|not.
    Atom text runs through the standard analyzer (py_tokenize), so
    'Hash-Join' and '"Sort Merge"' normalize exactly like indexed text.
    Atoms that analyze to zero terms are dropped (Lucene does the same
    for stopword-only clauses)."""
    out: list[tuple[str, list[str]]] = []
    for sign, quoted, bare in _ATOM_RE.findall(s):
        terms = py_tokenize(quoted if quoted else bare)
        if not terms:
            continue
        kind = {"+": "must", "-": "not"}.get(sign, "should")
        out.append((kind, terms))
    return out


def _chain_ctf_expr(arr, terms: list[str]):
    """Chain frequency of `terms` in token array `arr` as a pure
    codegen expression: number of start positions p with
    arr[p+j] == terms[j] for all j. Guarded so texts shorter than the
    chain emit 0 (F.sequence(1, 0) would yield a DESCENDING [1, 0])."""
    if len(terms) == 1:
        return F.size(F.filter(arr, lambda x: x == F.lit(terms[0])))
    m = len(terms) - 1
    starts = F.sequence(F.lit(1), F.size(arr) - m)
    conds = lambda p: F.aggregate(  # noqa: E731
        F.sequence(F.lit(0), F.lit(m)),
        F.lit(True),
        lambda acc, j: acc
        & (
            F.element_at(arr, (p + j).cast("int"))
            == F.element_at(F.array(*[F.lit(t) for t in terms]), (j + 1).cast("int"))
        ),
    )
    return F.when(
        F.size(arr) > m,
        F.size(F.filter(starts, conds)),
    ).otherwise(F.lit(0))


def search_query_string(
    documents: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """Run query_string queries over documents(doc_id, text);
    returns (query_id, rank, doc_id, score) — the engine's standard
    top-k contract."""
    spark = documents.sparkSession
    parsed = [(qid, parse_query_string(s)) for qid, s in queries]

    # persisted: the tokenize pandas UDF is the expensive pass, and
    # docs_t feeds tf, dl, AND the fused chain scan — cache once, read
    # three times (partitions cache as the first stage computes them,
    # so this helps even within the single final action)
    docs_t = documents.select(
        "doc_id", tokenize_udf(F.col("text")).alias("arr")
    ).filter(F.size("arr") > 0).persist()
    dl = docs_t.select("doc_id", F.size("arr").cast("double").alias("len"))
    st = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("len").alias("avgdl"),
    )
    tf = (
        docs_t.select("doc_id", F.explode("arr").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    # clause dims (driver-side, tiny): every clause-term pair for idf;
    # single-term scoring clauses route through the shared tf table
    cl_rows, term_cl_rows, qc = [], [], {}
    for qid, clauses in parsed:
        n_must = sum(1 for kind, _ in clauses if kind == "must")
        n_should = sum(1 for kind, _ in clauses if kind == "should")
        qc[qid] = (n_must, n_should)
        for cid, (kind, terms) in enumerate(clauses):
            for t in terms:
                cl_rows.append((qid, cid, kind, t))
            if len(terms) == 1:
                term_cl_rows.append((qid, cid, kind, terms[0]))
    cl = spark.createDataFrame(
        cl_rows, "query_id long, clause_id int, kind string, term string"
    )
    # per-clause idf sum (terms absent from the corpus contribute 0 and
    # can never match — Lucene's behavior for OOV terms)
    sidf = (
        cl.join(dfreq, "term", "left")
        .crossJoin(F.broadcast(st))
        .groupBy("query_id", "clause_id")
        .agg(
            F.sum(
                F.when(
                    F.col("df").isNotNull(),
                    F.log(
                        F.lit(1.0)
                        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    ),
                ).otherwise(F.lit(0.0))
            ).alias("sidf")
        )
    )

    parts = []
    if term_cl_rows:
        tcl = spark.createDataFrame(
            term_cl_rows, "query_id long, clause_id int, kind string, term string"
        )
        parts.append(
            tf.join(F.broadcast(tcl), "term").select(
                "query_id", "clause_id", "kind", "doc_id", F.col("tf").alias("ctf")
            )
        )
    # every multi-term chain evaluates in ONE shared pass over the
    # tokenized corpus (an array-of-structs explode), instead of one
    # full scan + re-tokenize per chain — the count of corpus scans is
    # O(1) in the number of queries/phrases
    chain_structs = [
        F.struct(
            F.lit(qid).cast("long").alias("query_id"),
            F.lit(cid).cast("int").alias("clause_id"),
            F.lit(kind).alias("kind"),
            _chain_ctf_expr(F.col("arr"), terms).cast("double").alias("ctf"),
        )
        for qid, clauses in parsed
        for cid, (kind, terms) in enumerate(clauses)
        if len(terms) > 1
    ]
    if chain_structs:
        parts.append(
            docs_t.select(
                "doc_id", F.explode(F.array(*chain_structs)).alias("c")
            )
            .filter(F.col("c.ctf") > 0)
            .select(
                "c.query_id", "c.clause_id", "c.kind", "doc_id",
                F.col("c.ctf").alias("ctf"),
            )
        )
    if not parts:
        # every query analyzed to zero scoring clauses (empty string,
        # operators only, pure negation): Lucene matches nothing
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.unionByName(p)

    scored = (
        hits.join(F.broadcast(sidf), ["query_id", "clause_id"])
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .withColumn(
            "contrib",
            F.when(F.col("kind") == "not", F.lit(0.0)).otherwise(
                F.col("sidf")
                * (F.col("ctf") * (K1 + 1.0))
                / (
                    F.col("ctf")
                    + K1 * (1.0 - B + B * F.col("len") / F.col("avgdl"))
                )
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").alias("score"),
            F.countDistinct(
                F.when(F.col("kind") == "must", F.col("clause_id"))
            ).alias("n_must_hit"),
            F.max(F.when(F.col("kind") == "should", 1).otherwise(0)).alias(
                "any_should"
            ),
            F.max(F.when(F.col("kind") == "not", 1).otherwise(0)).alias(
                "any_not"
            ),
        )
    )
    qcdim = spark.createDataFrame(
        [(qid, nm, ns) for qid, (nm, ns) in qc.items()],
        "query_id long, req_must int, n_should int",
    )
    ok = (
        scored.join(F.broadcast(qcdim), "query_id")
        .filter(
            (F.col("any_not") == 0)
            & (F.col("n_must_hit") == F.col("req_must"))
            & (
                (F.col("n_should") == 0)
                | (F.col("req_must") > 0)
                | (F.col("any_should") == 1)
            )
        )
        .select("query_id", "doc_id", "score")
    )
    return topk(ok, k)


def query_string_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB oracle for search_query_string: identical clause model,
    arithmetic, and matching rules, generated from the same parse."""
    parsed = [(qid, parse_query_string(s)) for qid, s in queries]
    cl_vals, tcl_vals, qc_vals, ph_selects = [], [], [], []
    for qid, clauses in parsed:
        n_must = sum(1 for kind, _ in clauses if kind == "must")
        n_should = sum(1 for kind, _ in clauses if kind == "should")
        qc_vals.append(f"({qid}, {n_must}, {n_should})")
        for cid, (kind, terms) in enumerate(clauses):
            for t in terms:
                cl_vals.append(f"({qid}, {cid}, '{kind}', '{t}')")
            if len(terms) == 1:
                tcl_vals.append(f"({qid}, {cid}, '{kind}', '{terms[0]}')")
            else:
                m = len(terms) - 1
                conds = " AND ".join(
                    f"arr[p + {j}] = '{t}'" for j, t in enumerate(terms)
                )
                ptf = (
                    f"CASE WHEN len(arr) > {m} THEN "
                    f"len(list_filter(generate_series(1, len(arr) - {m}), "
                    f"p -> {conds})) ELSE 0 END::DOUBLE"
                )
                ph_selects.append(
                    f"SELECT {qid} AS query_id, {cid} AS clause_id, "
                    f"'{kind}' AS kind, doc_id, {ptf} AS ctf FROM docs_t"
                )
    if not tcl_vals:  # keep the VALUES clause well-formed
        tcl_vals.append("(NULL, NULL, NULL, NULL)")
        term_part = ""
    else:
        term_part = (
            "SELECT tcl.query_id, tcl.clause_id, tcl.kind, tf.doc_id, tf.tf AS ctf "
            "FROM tf JOIN tcl USING (term)"
        )
    ph_part = " UNION ALL ".join(
        f"SELECT query_id, clause_id, kind, doc_id, ctf FROM ({s}) WHERE ctf > 0"
        for s in ph_selects
    )
    hits = " UNION ALL ".join(x for x in [term_part, ph_part] if x)
    tok = r"[\p{L}\p{N}]+"
    return f"""
WITH docs_t AS (
  SELECT doc_id,
         regexp_extract_all(lower(nfc_normalize(text)), '{tok}') AS arr
  FROM documents
),
toks AS (SELECT doc_id, unnest(arr) AS term FROM docs_t),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, len(arr)::DOUBLE AS len FROM docs_t WHERE len(arr) > 0),
st AS (SELECT count(*)::DOUBLE AS n_docs, avg(len) AS avgdl FROM dl),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
cl(query_id, clause_id, kind, term) AS (VALUES {", ".join(cl_vals)}),
tcl(query_id, clause_id, kind, term) AS (VALUES {", ".join(tcl_vals)}),
qc(query_id, req_must, n_should) AS (VALUES {", ".join(qc_vals)}),
sidf AS (
  SELECT cl.query_id, cl.clause_id,
         sum(CASE WHEN dfr.df IS NOT NULL
             THEN ln(1.0 + ((SELECT n_docs FROM st) - dfr.df + 0.5) / (dfr.df + 0.5))
             ELSE 0.0 END) AS sidf
  FROM cl LEFT JOIN dfr USING (term)
  GROUP BY 1, 2
),
hits AS ({hits}),
contrib AS (
  SELECT h.query_id, h.doc_id, h.clause_id, h.kind,
         CASE WHEN h.kind = 'not' THEN 0.0
              ELSE s.sidf * (h.ctf * ({k1} + 1.0))
                   / (h.ctf + {k1} * (1.0 - {b} + {b} * dl.len / st.avgdl))
         END AS contrib
  FROM hits h
  JOIN sidf s USING (query_id, clause_id)
  JOIN dl USING (doc_id)
  CROSS JOIN st
),
agg AS (
  SELECT query_id, doc_id,
         sum(contrib) AS score,
         count(DISTINCT CASE WHEN kind = 'must' THEN clause_id END) AS n_must_hit,
         max(CASE WHEN kind = 'should' THEN 1 ELSE 0 END) AS any_should,
         max(CASE WHEN kind = 'not' THEN 1 ELSE 0 END) AS any_not
  FROM contrib GROUP BY 1, 2
),
ok AS (
  SELECT a.query_id::BIGINT AS query_id, a.doc_id, a.score
  FROM agg a JOIN qc USING (query_id)
  WHERE a.any_not = 0
    AND a.n_must_hit = qc.req_must
    AND (qc.n_should = 0 OR qc.req_must > 0 OR a.any_should = 1)
),
rk AS (
  SELECT query_id, doc_id, round(score, {SCORE_DECIMALS}) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, {SCORE_DECIMALS}) DESC,
                                     doc_id ASC) AS rank
  FROM ok
)
SELECT query_id, rank, doc_id, score FROM rk WHERE rank <= {k}
"""


# ------------------------------------------- field-scoped query_string
# ES query_string's `field:term` / `field:"a phrase"` syntax
# (reference users hit this on day one: TIMDEX exposes `title:` etc.
# over every analyzed field of es_record_mappings.json:33-401). Each
# field-scoped clause scores against THAT field's own statistics
# (df over the field, the field's docCount and avgFieldLength) —
# Lucene's per-field index semantics, same stats model as
# fields.search_field. Unmapped field prefixes keep Lucene behavior:
# the clause can never match (a must on an unmapped field empties the
# query; a should contributes nothing) — this falls out naturally
# because an unmapped field has no corpus tokens, no df rows, no hits.

_FIELD_ATOM_RE = re.compile(
    r'([+-]?)(?:([A-Za-z_][A-Za-z0-9_]*):)?(?:"([^"]*)"|(\S+))'
)


def parse_query_string_fields(
    s: str, default_field: str
) -> list[tuple[str, str, list[str]]]:
    """Parse into [(kind, field, chain_terms)]; kind in
    must|should|not. `field:` prefixes scope the atom; atoms without a
    prefix target `default_field`. Atom text runs through the standard
    analyzer exactly like parse_query_string."""
    out: list[tuple[str, str, list[str]]] = []
    for sign, fld, quoted, bare in _FIELD_ATOM_RE.findall(s):
        terms = py_tokenize(quoted if quoted else bare)
        if not terms:
            continue
        kind = {"+": "must", "-": "not"}.get(sign, "should")
        out.append((kind, fld or default_field, terms))
    return out


def search_query_string_fields(
    documents: DataFrame,
    queries: list[tuple[int, str]],
    field_exprs: dict,
    default_field: str,
    k: int = 10,
) -> DataFrame:
    """query_string with field scoping over documents(doc_id, text).
    `field_exprs` maps field name -> Column deriving that field's text
    (the same derivation fields.build_field_doc_table takes). Same
    BooleanQuery matching rules and chain-clause scoring as
    search_query_string, but every frame is keyed by (field, ...) so a
    clause reads its own field's tf/df/len/avgdl.

    Distributed shape: ONE corpus scan tokenizes every declared field
    (an array-of-structs explode over the same row — the pandas UDF
    runs once per field inside one projection), then the shared
    (field, doc, term) aggregation serves all term clauses and the
    per-field stats; phrase chains ride the same scan. Everything
    after the explode is keyed by tiny (field, term) pairs — no text
    crosses a shuffle."""
    spark = documents.sparkSession
    parsed = [
        (qid, parse_query_string_fields(s, default_field))
        for qid, s in queries
    ]

    docs_t = (
        documents.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f).alias("field"),
                            tokenize_udf(expr).alias("arr"),
                        )
                        for f, expr in field_exprs.items()
                    ]
                )
            ).alias("fa"),
        )
        .select("doc_id", F.col("fa.field").alias("field"), F.col("fa.arr").alias("arr"))
        .filter(F.size("arr") > 0)
        .persist()
    )
    dl = docs_t.select(
        "doc_id", "field", F.size("arr").cast("double").alias("len")
    )
    st = dl.groupBy("field").agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("len").alias("avgdl"),
    )
    tf = (
        docs_t.select("doc_id", "field", F.explode("arr").alias("term"))
        .groupBy("field", "doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("field", "term").agg(
        F.count("*").cast("double").alias("df")
    )

    cl_rows, term_cl_rows, qc = [], [], {}
    for qid, clauses in parsed:
        n_must = sum(1 for kind, _, _ in clauses if kind == "must")
        n_should = sum(1 for kind, _, _ in clauses if kind == "should")
        qc[qid] = (n_must, n_should)
        for cid, (kind, fld, terms) in enumerate(clauses):
            for t in terms:
                cl_rows.append((qid, cid, kind, fld, t))
            if len(terms) == 1:
                term_cl_rows.append((qid, cid, kind, fld, terms[0]))
    if not cl_rows:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    cl = spark.createDataFrame(
        cl_rows,
        "query_id long, clause_id int, kind string, field string, term string",
    )
    # per-clause idf sum from the clause FIELD's stats; unmapped fields
    # have no df/st rows and contribute 0 (and can never match)
    sidf = (
        cl.join(dfreq, ["field", "term"], "left")
        .join(F.broadcast(st), "field", "left")
        .groupBy("query_id", "clause_id")
        .agg(
            F.sum(
                F.when(
                    F.col("df").isNotNull(),
                    F.log(
                        F.lit(1.0)
                        + (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                    ),
                ).otherwise(F.lit(0.0))
            ).alias("sidf")
        )
    )

    parts = []
    if term_cl_rows:
        tcl = spark.createDataFrame(
            term_cl_rows,
            "query_id long, clause_id int, kind string, field string, term string",
        )
        parts.append(
            tf.join(F.broadcast(tcl), ["field", "term"]).select(
                "query_id",
                "clause_id",
                "kind",
                "field",
                "doc_id",
                F.col("tf").alias("ctf"),
            )
        )
    # multi-term chains share the one tokenized scan; each chain only
    # fires on its own field's rows
    chain_structs = [
        F.struct(
            F.lit(qid).cast("long").alias("query_id"),
            F.lit(cid).cast("int").alias("clause_id"),
            F.lit(kind).alias("kind"),
            F.when(
                F.col("field") == F.lit(fld),
                _chain_ctf_expr(F.col("arr"), terms),
            )
            .otherwise(F.lit(0))
            .cast("double")
            .alias("ctf"),
        )
        for qid, clauses in parsed
        for cid, (kind, fld, terms) in enumerate(clauses)
        if len(terms) > 1
    ]
    if chain_structs:
        parts.append(
            docs_t.select(
                "doc_id",
                "field",
                F.explode(F.array(*chain_structs)).alias("c"),
            )
            .filter(F.col("c.ctf") > 0)
            .select(
                "c.query_id",
                "c.clause_id",
                "c.kind",
                "field",
                "doc_id",
                F.col("c.ctf").alias("ctf"),
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.unionByName(p)

    scored = (
        hits.join(F.broadcast(sidf), ["query_id", "clause_id"])
        .join(dl, ["doc_id", "field"])
        .join(F.broadcast(st), "field")
        .withColumn(
            "contrib",
            F.when(F.col("kind") == "not", F.lit(0.0)).otherwise(
                F.col("sidf")
                * (F.col("ctf") * (K1 + 1.0))
                / (
                    F.col("ctf")
                    + K1 * (1.0 - B + B * F.col("len") / F.col("avgdl"))
                )
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").alias("score"),
            F.countDistinct(
                F.when(F.col("kind") == "must", F.col("clause_id"))
            ).alias("n_must_hit"),
            F.max(F.when(F.col("kind") == "should", 1).otherwise(0)).alias(
                "any_should"
            ),
            F.max(F.when(F.col("kind") == "not", 1).otherwise(0)).alias(
                "any_not"
            ),
        )
    )
    qcdim = spark.createDataFrame(
        [(qid, nm, ns) for qid, (nm, ns) in qc.items()],
        "query_id long, req_must int, n_should int",
    )
    ok = (
        scored.join(F.broadcast(qcdim), "query_id")
        .filter(
            (F.col("any_not") == 0)
            & (F.col("n_must_hit") == F.col("req_must"))
            & (
                (F.col("n_should") == 0)
                | (F.col("req_must") > 0)
                | (F.col("any_should") == 1)
            )
        )
        .select("query_id", "doc_id", "score")
    )
    return topk(ok, k)


def query_string_fields_sql(
    queries: list[tuple[int, str]],
    field_exprs_sql: dict,
    default_field: str,
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB oracle for search_query_string_fields, generated from the
    SAME parse; `field_exprs_sql` maps field name -> SQL expression
    over `documents` deriving that field's text."""
    parsed = [
        (qid, parse_query_string_fields(s, default_field))
        for qid, s in queries
    ]
    cl_vals, tcl_vals, qc_vals, ph_selects = [], [], [], []
    for qid, clauses in parsed:
        n_must = sum(1 for kind, _, _ in clauses if kind == "must")
        n_should = sum(1 for kind, _, _ in clauses if kind == "should")
        qc_vals.append(f"({qid}, {n_must}, {n_should})")
        for cid, (kind, fld, terms) in enumerate(clauses):
            for t in terms:
                cl_vals.append(f"({qid}, {cid}, '{kind}', '{fld}', '{t}')")
            if len(terms) == 1:
                tcl_vals.append(
                    f"({qid}, {cid}, '{kind}', '{fld}', '{terms[0]}')"
                )
            else:
                m = len(terms) - 1
                conds = " AND ".join(
                    f"arr[p + {j}] = '{t}'" for j, t in enumerate(terms)
                )
                ptf = (
                    f"CASE WHEN len(arr) > {m} THEN "
                    f"len(list_filter(generate_series(1, len(arr) - {m}), "
                    f"p -> {conds})) ELSE 0 END::DOUBLE"
                )
                ph_selects.append(
                    f"SELECT {qid} AS query_id, {cid} AS clause_id, "
                    f"'{kind}' AS kind, '{fld}' AS field, doc_id, "
                    f"{ptf} AS ctf FROM docs_t WHERE field = '{fld}'"
                )
    if not tcl_vals:
        tcl_vals.append("(NULL, NULL, NULL, NULL, NULL)")
        term_part = ""
    else:
        term_part = (
            "SELECT tcl.query_id, tcl.clause_id, tcl.kind, tf.field, "
            "tf.doc_id, tf.tf AS ctf FROM tf JOIN tcl USING (field, term)"
        )
    ph_part = " UNION ALL ".join(
        f"SELECT query_id, clause_id, kind, field, doc_id, ctf "
        f"FROM ({s}) WHERE ctf > 0"
        for s in ph_selects
    )
    hits = " UNION ALL ".join(x for x in [term_part, ph_part] if x)
    tok = r"[\p{L}\p{N}]+"
    field_rows = " UNION ALL ".join(
        f"SELECT doc_id, '{f}' AS field, "
        f"regexp_extract_all(lower(nfc_normalize({e})), '{tok}') AS arr "
        f"FROM documents"
        for f, e in field_exprs_sql.items()
    )
    return f"""
WITH docs_all AS ({field_rows}),
docs_t AS (SELECT * FROM docs_all WHERE len(arr) > 0),
toks AS (SELECT doc_id, field, unnest(arr) AS term FROM docs_t),
tf AS (SELECT field, doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2, 3),
dl AS (SELECT doc_id, field, len(arr)::DOUBLE AS len FROM docs_t),
st AS (SELECT field, count(*)::DOUBLE AS n_docs, avg(len) AS avgdl FROM dl GROUP BY 1),
dfr AS (SELECT field, term, count(*)::DOUBLE AS df FROM tf GROUP BY 1, 2),
cl(query_id, clause_id, kind, field, term) AS (VALUES {", ".join(cl_vals)}),
tcl(query_id, clause_id, kind, field, term) AS (VALUES {", ".join(tcl_vals)}),
qc(query_id, req_must, n_should) AS (VALUES {", ".join(qc_vals)}),
sidf AS (
  SELECT cl.query_id, cl.clause_id,
         sum(CASE WHEN dfr.df IS NOT NULL
             THEN ln(1.0 + (st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
             ELSE 0.0 END) AS sidf
  FROM cl
  LEFT JOIN dfr USING (field, term)
  LEFT JOIN st USING (field)
  GROUP BY 1, 2
),
hits AS ({hits}),
contrib AS (
  SELECT h.query_id, h.doc_id, h.clause_id, h.kind,
         CASE WHEN h.kind = 'not' THEN 0.0
              ELSE s.sidf * (h.ctf * ({k1} + 1.0))
                   / (h.ctf + {k1} * (1.0 - {b} + {b} * dl.len / st.avgdl))
         END AS contrib
  FROM hits h
  JOIN sidf s USING (query_id, clause_id)
  JOIN dl ON h.doc_id = dl.doc_id AND h.field = dl.field
  JOIN st ON h.field = st.field
),
agg AS (
  SELECT query_id, doc_id,
         sum(contrib) AS score,
         count(DISTINCT CASE WHEN kind = 'must' THEN clause_id END) AS n_must_hit,
         max(CASE WHEN kind = 'should' THEN 1 ELSE 0 END) AS any_should,
         max(CASE WHEN kind = 'not' THEN 1 ELSE 0 END) AS any_not
  FROM contrib GROUP BY 1, 2
),
ok AS (
  SELECT a.query_id::BIGINT AS query_id, a.doc_id, a.score
  FROM agg a JOIN qc USING (query_id)
  WHERE a.any_not = 0
    AND a.n_must_hit = qc.req_must
    AND (qc.n_should = 0 OR qc.req_must > 0 OR a.any_should = 1)
),
rk AS (
  SELECT query_id, doc_id, round(score, {SCORE_DECIMALS}) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, {SCORE_DECIMALS}) DESC,
                                     doc_id ASC) AS rank
  FROM ok
)
SELECT query_id, rank, doc_id, score FROM rk WHERE rank <= {k}
"""


# ------------------------------------------------- indexed serving path
def _qs_kernel(
    pdf,
    queries: list[tuple[int, list[tuple[str, tuple, float, float]], int, int]],
    k: int,
    k1: float,
    b: float,
    deleted=None,
):
    """Evaluate parsed query_string queries against ONE dbucket of a
    positional index. Exact per bucket: all of a doc's postings live in
    its dbucket, so must-counts, exclusions, and phrase positions are
    bucket-local facts. `queries` rows are
    (query_id, [(kind, terms, sidf, avgdl)], req_must, n_should) — avgdl
    is per-CLAUSE so field-scoped clauses normalize by their own field's
    average length (unscoped queries pass the corpus avgdl on every
    clause)."""
    import numpy as np
    import pandas as pd

    from mario_spark.phrase import _chain_match_count, _PosTermData

    tds = {
        t: _PosTermData(g.sort_values("block_id"))
        for t, g in pdf.groupby("term", sort=False)
    }

    def clause_hits(terms: tuple):
        """-> (ids, ctf, lens) of docs where the chain occurs."""
        if any(t not in tds for t in terms):
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0), np.empty(0)
        if len(terms) == 1:
            td = tds[terms[0]]
            tf = np.diff(td.pos_starts).astype(np.float64)
            return td.ids, tf, td.lens
        term_tds = [tds[t] for t in terms]
        order = np.argsort([td.ids.size for td in term_tds])
        cand = term_tds[order[0]].ids
        for oi in order[1:]:
            cand = cand[np.isin(cand, term_tds[oi].ids, assume_unique=True)]
            if cand.size == 0:
                break
        if cand.size == 0:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0), np.empty(0)
        rows = [np.searchsorted(td.ids, cand) for td in term_tds]
        ids_o, ctf_o, len_o = [], [], []
        for ci in range(cand.size):
            pos = [
                td.positions_of(int(rows[j][ci]))
                for j, td in enumerate(term_tds)
            ]
            ptf = _chain_match_count(pos, len(term_tds), 0)
            if ptf:
                ids_o.append(int(cand[ci]))
                ctf_o.append(float(ptf))
                len_o.append(float(term_tds[0].lens[int(rows[0][ci])]))
        return (
            np.asarray(ids_o, dtype=np.int64),
            np.asarray(ctf_o),
            np.asarray(len_o),
        )

    out_q, out_d, out_s = [], [], []
    for qid, clauses, req_must, n_should in queries:
        hits = [
            (kind, sidf, ad, *clause_hits(terms))
            for kind, terms, sidf, ad in clauses
        ]
        parts = [h[3] for h in hits if h[3].size]
        if not parts:
            continue
        all_ids = np.unique(np.concatenate(parts))
        score = np.zeros(all_ids.size)
        must_cnt = np.zeros(all_ids.size, dtype=np.int64)
        should_hit = np.zeros(all_ids.size, dtype=bool)
        not_hit = np.zeros(all_ids.size, dtype=bool)
        for kind, sidf, ad, ids, ctf, lens in hits:
            if ids.size == 0:
                continue
            pos = np.searchsorted(all_ids, ids)
            if kind == "not":
                not_hit[pos] = True
                continue
            score[pos] += (
                sidf * ctf * (k1 + 1.0)
                / (ctf + k1 * (1.0 - b + b * lens / ad))
            )
            if kind == "must":
                must_cnt[pos] += 1
            else:
                should_hit[pos] = True
        keep = (
            ~not_hit
            & (must_cnt == req_must)
            & ((n_should == 0) | (req_must > 0) | should_hit)
        )
        if deleted is not None:
            keep &= ~np.isin(all_ids, deleted, assume_unique=True)
        ids, sc = all_ids[keep], score[keep]
        if ids.size == 0:
            continue
        top = np.lexsort((ids, -sc))[:k]
        out_q.append(np.full(top.size, qid, dtype=np.int64))
        out_d.append(ids[top])
        out_s.append(sc[top])
    if not out_q:
        return pd.DataFrame(
            {"query_id": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "doc_id": "int64", "score": "float64"})
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "doc_id": np.concatenate(out_d),
            "score": np.concatenate(out_s),
        }
    )


def search_query_string_indexed(
    postings: DataFrame,
    dictionary: DataFrame,
    queries: list[tuple[int, str]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    deleted_docs: DataFrame | None = None,
) -> DataFrame:
    """Serve query_string from a PERSISTED positional index: term
    clauses read tf (= positions count) from the postings, phrase
    clauses run the positional chain matcher, and Lucene BooleanQuery
    matching applies bucket-locally — the production analogue of
    qs.search_query_string (tests assert rank identity between the
    two). Plan = search_wand's: term-pruned scan -> per-dbucket batch
    kernel -> tiny per-query rank window."""
    from mario_spark.phrase import _collect_deleted
    from mario_spark.postings import idf as _idf

    parsed = [(qid, parse_query_string(s)) for qid, s in queries]
    all_terms = sorted(
        {t for _, cls in parsed for _, terms in cls for t in terms}
    )
    df_rows = dictionary.filter(F.col("term").isin(all_terms)).collect()
    idf_map = {
        r["term"]: _idf(float(n_docs), float(r["df"])) for r in df_rows
    }
    ad = float(avgdl)
    queries_c = []
    for qid, clauses in parsed:
        req_must = sum(1 for kind, _ in clauses if kind == "must")
        n_should = sum(1 for kind, _ in clauses if kind == "should")
        cl = [
            (kind, tuple(terms), sum(idf_map.get(t, 0.0) for t in terms), ad)
            for kind, terms in clauses
        ]
        queries_c.append((int(qid), cl, req_must, n_should))
    deleted = _collect_deleted(deleted_docs)
    cand = postings.filter(F.col("term").isin(all_terms))

    def kernel(pdf):
        return _qs_kernel(pdf, queries_c, k, k1, b, deleted)

    local = cand.groupBy("dbucket").applyInPandas(
        kernel, "query_id long, doc_id long, score double"
    )
    return _rank_local(local, k)


def _rank_local(local: DataFrame, k: int) -> DataFrame:
    """Round + per-query rank window over a kernel's local top-k rows
    (tiny: <= k rows per query per dbucket cross the exchange)."""
    from pyspark.sql import Window

    s = local.withColumn("score", F.round("score", SCORE_DECIMALS))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def search_query_string_fields_indexed(
    postings: DataFrame,
    dictionary: DataFrame,
    queries: list[tuple[int, str]],
    field_stats: dict[str, dict],
    default_field: str,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    deleted_docs: DataFrame | None = None,
) -> DataFrame:
    """Serve field-scoped query_string from a PERSISTED fields=... +
    positions=True index (field-prefixed posting keys, fields.py).
    Each clause's terms become `<field>:<term>` — pruning the postings
    scan to exactly the queried fields' terms — and the clause scores
    with ITS field's stats: idf from the prefixed dictionary df and the
    FIELD's docCount, length norm from the field's avgdl (the lens
    stored on a prefixed posting are that field's lengths by
    construction, fields.field_tf). Unmapped fields keep Lucene
    behavior for free: no dictionary rows (sidf 0), no postings (a must
    can never match). Rank-identical to qs.search_query_string_fields
    over the raw pages (asserted in tests)."""
    from mario_spark.phrase import _collect_deleted
    from mario_spark.postings import idf as _idf

    parsed = [
        (qid, parse_query_string_fields(s, default_field))
        for qid, s in queries
    ]
    all_terms = sorted(
        {
            f"{fld}:{t}"
            for _, cls in parsed
            for _, fld, terms in cls
            for t in terms
        }
    )
    spark = postings.sparkSession
    if not all_terms:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    df_rows = dictionary.filter(F.col("term").isin(all_terms)).collect()
    idf_map = {}
    for r in df_rows:
        fld = r["term"].split(":", 1)[0]
        n_f = float(field_stats.get(fld, {}).get("n_docs", 0))
        idf_map[r["term"]] = _idf(n_f, float(r["df"]))
    queries_c = []
    for qid, clauses in parsed:
        req_must = sum(1 for kind, _, _ in clauses if kind == "must")
        n_should = sum(1 for kind, _, _ in clauses if kind == "should")
        cl = []
        for kind, fld, terms in clauses:
            pterms = tuple(f"{fld}:{t}" for t in terms)
            sidf = sum(idf_map.get(t, 0.0) for t in pterms)
            # avgdl placeholder 1.0 for unmapped fields is never read:
            # such a clause has no postings, so it produces no hits
            ad = float(field_stats.get(fld, {}).get("avgdl", 0.0)) or 1.0
            cl.append((kind, pterms, sidf, ad))
        queries_c.append((int(qid), cl, req_must, n_should))
    deleted = _collect_deleted(deleted_docs)
    cand = postings.filter(F.col("term").isin(all_terms))

    def kernel(pdf):
        return _qs_kernel(pdf, queries_c, k, k1, b, deleted)

    local = cand.groupBy("dbucket").applyInPandas(
        kernel, "query_id long, doc_id long, score double"
    )
    return _rank_local(local, k)


def parse_simple_query_string(
    s: str,
) -> list[list[tuple[str, bool, list[str]]]]:
    """ES simple_query_string grammar (the subset with distinct
    semantics from query_string), default_operator=AND:

        query    := disjunct ('|' disjunct)*
        disjunct := clause+                  (whitespace = AND)
        clause   := '-'? atom
        atom     := '"' word+ '"' | word '*' | word

    -> [[(type, negated, terms)]] — one list per disjunct; type is
    'chain' (term/phrase) or 'prefix'. Like Lucene's SimpleQueryParser
    the grammar NEVER raises: malformed input degrades to terms.
    Pure-negative disjuncts are dropped (no positive clause to anchor
    the iterator), '+' signs are absorbed (AND is already the default),
    and '*' on a token that analyzes to multiple terms degrades to a
    phrase."""
    out = []
    for part in s.split("|"):
        clauses: list[tuple[str, bool, list[str]]] = []
        for sign, quoted, bare in _ATOM_RE.findall(part):
            neg = sign == "-"
            if quoted:
                terms = py_tokenize(quoted)
                if terms:
                    clauses.append(("chain", neg, terms))
                continue
            if bare.endswith("*"):
                toks = py_tokenize(bare[:-1])
                if len(toks) == 1:
                    clauses.append(("prefix", neg, toks))
                    continue
                terms = toks
            else:
                terms = py_tokenize(bare)
            if terms:
                clauses.append(("chain", neg, terms))
        if any(not neg for _, neg, _ in clauses):
            out.append(clauses)
    return out


def search_simple_query_string(
    documents: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """ES simple_query_string over documents(doc_id, text), Lucene
    BooleanQuery semantics for the ((a AND b) OR c) shape the grammar
    parses to: a doc matches iff at least one disjunct matches (all its
    positive clauses match, no negated clause does); score = sum over
    MATCHING disjuncts of their positive clause scores. Chain clauses
    score as PhraseWeight (single term = plain BM25); prefix clauses
    are CONSTANT_SCORE +1.0 (Lucene's multi-term rewrite in this
    parser). Returns (query_id, rank, doc_id, score).

    Distributed shape follows search_query_string: one shared tf agg
    serves every single-term clause via a broadcast clause dim; each
    phrase is one codegen projection; prefixes are one startswith
    theta-join of a broadcast dim; then TWO hash aggs (disjunct-level
    match, query-level sum) — no per-clause scans of the corpus.
    """
    spark = documents.sparkSession
    parsed = [(qid, parse_simple_query_string(s)) for qid, s in queries]

    # persisted: the tokenize pandas UDF is the expensive pass, and
    # docs_t feeds tf, dl, AND the fused chain scan — cache once, read
    # three times (partitions cache as the first stage computes them,
    # so this helps even within the single final action)
    docs_t = documents.select(
        "doc_id", tokenize_udf(F.col("text")).alias("arr")
    ).filter(F.size("arr") > 0).persist()
    dl = docs_t.select("doc_id", F.size("arr").cast("double").alias("len"))
    st = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("len").alias("avgdl"),
    )
    tf = (
        docs_t.select("doc_id", F.explode("arr").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    cl_rows, term_rows, pref_rows, disj_rows = [], [], [], []
    chains = []  # (qid, did, cid, neg, terms) with len > 1
    for qid, disjuncts in parsed:
        for did, clauses in enumerate(disjuncts):
            n_pos = sum(1 for _, neg, _ in clauses if not neg)
            disj_rows.append((qid, did, n_pos))
            for cid, (typ, neg, terms) in enumerate(clauses):
                if typ == "prefix":
                    pref_rows.append((qid, did, cid, neg, terms[0]))
                    continue
                for t in terms:
                    cl_rows.append((qid, did, cid, t))
                if len(terms) == 1:
                    term_rows.append((qid, did, cid, neg, terms[0]))
                else:
                    chains.append((qid, did, cid, neg, terms))

    cl = spark.createDataFrame(
        cl_rows, "query_id long, did int, cid int, term string"
    )
    sidf = (
        cl.join(dfreq, "term", "left")
        .crossJoin(F.broadcast(st))
        .groupBy("query_id", "did", "cid")
        .agg(
            F.sum(
                F.when(
                    F.col("df").isNotNull(),
                    F.log(
                        F.lit(1.0)
                        + (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                    ),
                ).otherwise(F.lit(0.0))
            ).alias("sidf")
        )
    )

    parts = []
    if term_rows:
        tdim = spark.createDataFrame(
            term_rows,
            "query_id long, did int, cid int, neg boolean, term string",
        )
        parts.append(
            tf.join(F.broadcast(tdim), "term").select(
                "query_id", "did", "cid", "neg", "doc_id",
                F.col("tf").alias("ctf"),
                F.lit(False).alias("is_prefix"),
            )
        )
    if pref_rows:
        pdim = spark.createDataFrame(
            pref_rows,
            "query_id long, did int, cid int, neg boolean, prefix string",
        )
        parts.append(
            tf.join(
                F.broadcast(pdim),
                F.col("term").startswith(F.col("prefix")),
            )
            .select("query_id", "did", "cid", "neg", "doc_id")
            .distinct()
            .select(
                "query_id", "did", "cid", "neg", "doc_id",
                F.lit(1.0).alias("ctf"),
                F.lit(True).alias("is_prefix"),
            )
        )
    # all phrase chains in ONE shared corpus pass (see
    # search_query_string — same fused array-of-structs explode)
    if chains:
        chain_structs = [
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                F.lit(did).cast("int").alias("did"),
                F.lit(cid).cast("int").alias("cid"),
                F.lit(bool(neg)).alias("neg"),
                _chain_ctf_expr(F.col("arr"), terms)
                .cast("double")
                .alias("ctf"),
            )
            for qid, did, cid, neg, terms in chains
        ]
        parts.append(
            docs_t.select(
                "doc_id", F.explode(F.array(*chain_structs)).alias("c")
            )
            .filter(F.col("c.ctf") > 0)
            .select(
                "c.query_id", "c.did", "c.cid", "c.neg", "doc_id",
                F.col("c.ctf").alias("ctf"),
                F.lit(False).alias("is_prefix"),
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.unionByName(p)

    per_disj = (
        hits.join(F.broadcast(sidf), ["query_id", "did", "cid"], "left")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .withColumn(
            "contrib",
            F.when(F.col("neg"), F.lit(0.0))
            .when(F.col("is_prefix"), F.lit(1.0))
            .otherwise(
                F.coalesce("sidf", F.lit(0.0))
                * (F.col("ctf") * (K1 + 1.0))
                / (
                    F.col("ctf")
                    + K1 * (1.0 - B + B * F.col("len") / F.col("avgdl"))
                )
            ),
        )
        .groupBy("query_id", "did", "doc_id")
        .agg(
            F.sum("contrib").alias("dscore"),
            F.countDistinct(
                F.when(~F.col("neg"), F.col("cid"))
            ).alias("n_pos_hit"),
            F.max(F.when(F.col("neg"), 1).otherwise(0)).alias("any_neg"),
        )
    )
    ddim = spark.createDataFrame(
        disj_rows, "query_id long, did int, n_pos int"
    )
    matched = (
        per_disj.join(F.broadcast(ddim), ["query_id", "did"])
        .filter(
            (F.col("any_neg") == 0)
            & (F.col("n_pos_hit") == F.col("n_pos"))
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("dscore").alias("score"))
    )
    return topk(matched, k)
