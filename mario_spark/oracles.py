"""DuckDB oracle SQL for the driver-contract suite.

Every statement here must be semantically identical (and, after the
documented rounding, value-identical) to the matching Spark callable in
mario_spark.suite. Tables region nation customer supplier part orders
lineitem events documents embeddings are pre-registered DuckDB views.
"""

from __future__ import annotations

from mario_spark.analyze import py_tokenize
from mario_spark.fixtures import DOCUMENTS_QUERY_SET

# Same token class as analyze.TOKEN_RE, in RE2 syntax.
_TOK = r"[\p{L}\p{N}]+"

_TOKS_CTE = f"""
toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(nfc_normalize(text)), '{_TOK}')) AS term
  FROM documents
)"""


def _query_values() -> str:
    rows = []
    for qid, qtext in DOCUMENTS_QUERY_SET:
        for t in dict.fromkeys(py_tokenize(qtext)):
            rows.append(f"({qid}, '{t}')")
    return ", ".join(rows)


DOC_LENGTHS = f"""
SELECT doc_id,
       coalesce(len(regexp_extract_all(lower(nfc_normalize(text)), '{_TOK}')), 0)::BIGINT AS len
FROM documents
"""

TERM_DF = f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, term FROM toks GROUP BY 1, 2)
SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
"""

CORPUS_STATS = f"""
WITH dl AS (
  SELECT doc_id,
         coalesce(len(regexp_extract_all(lower(nfc_normalize(text)), '{_TOK}')), 0)::DOUBLE AS len
  FROM documents
)
SELECT count(*)::BIGINT AS n_docs, round(avg(len), 6) AS avgdl FROM dl
"""


def bm25_topk_sql(k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH q(query_id, term) AS (VALUES {_query_values()}),
{_TOKS_CTE},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks GROUP BY 1),
st AS (SELECT count(*)::DOUBLE AS n_docs, avg(len) AS avgdl FROM dl),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
sc AS (
  SELECT q.query_id::BIGINT AS query_id, tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
              * (tf.tf * ({k1} + 1.0))
              / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.len / st.avgdl)) ) AS raw
  FROM q
  JOIN tf  USING (term)
  JOIN dfr USING (term)
  JOIN dl  ON tf.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY 1, 2
),
rk AS (
  SELECT query_id, doc_id, round(raw, 4) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(raw, 4) DESC, doc_id ASC) AS rank
  FROM sc
)
SELECT query_id, rank, doc_id, score FROM rk WHERE rank <= {k}
"""


KEYWORD_NORMALIZE = r"""
SELECT doc_id,
       trim(lower(regexp_replace(substr(text, 1, 20) || '.', '[./;=,?]$', ''))) AS kw
FROM documents
"""

FILTER_LANG_EN = """
SELECT doc_id, source, n_chars FROM documents WHERE lower(lang) = 'en'
"""

TOKEN_COUNT_BPE = r"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS n_bpe_tokens
FROM documents
"""

MULTIMODAL_BYTES = """
SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes FROM documents
"""

EXACT_DEDUP_STATS = """
WITH g AS (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY 1)
SELECT sum(c)::BIGINT AS n_total,
       count(*)::BIGINT AS n_distinct,
       sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)::BIGINT AS n_dup
FROM g
"""

EXACT_DEDUP_GROUPS = """
SELECT md5(text) AS text_md5,
       count(*)::BIGINT AS group_size,
       min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""

Q1_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""

Q3_TOP_ORDERS = """
WITH j AS (
  SELECT o.o_orderkey,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderstatus <> 'F'
  GROUP BY 1
),
rk AS (
  SELECT o_orderkey, revenue,
         row_number() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS rank
  FROM j
)
SELECT rank, o_orderkey, revenue FROM rk WHERE rank <= 10
"""

DATE_PARSE_CASCADE = """
WITH s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y')
              WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m')
              ELSE strftime(o_orderdate, '%Y-%m-%d') END AS ds
  FROM orders
)
SELECT o_orderkey,
       strftime(coalesce(try_strptime(ds, '%Y-%m-%d'),
                         try_strptime(ds, '%Y-%m'),
                         try_strptime(ds, '%Y')),
                '%Y-%m-%d %H:%M:%S') AS parsed_ts
FROM s
"""

ORACLES: dict[str, str] = {
    "doc_lengths": DOC_LENGTHS,
    "term_df": TERM_DF,
    "corpus_stats": CORPUS_STATS,
    "bm25_topk": bm25_topk_sql(),
    "keyword_normalize": KEYWORD_NORMALIZE,
    "filter_lang_en": FILTER_LANG_EN,
    "token_count_bpe": TOKEN_COUNT_BPE,
    "multimodal_bytes": MULTIMODAL_BYTES,
    "exact_dedup_stats": EXACT_DEDUP_STATS,
    "exact_dedup_groups": EXACT_DEDUP_GROUPS,
    "q1_pricing_summary": Q1_PRICING_SUMMARY,
    "q3_top_orders": Q3_TOP_ORDERS,
    "date_parse_cascade": DATE_PARSE_CASCADE,
}
