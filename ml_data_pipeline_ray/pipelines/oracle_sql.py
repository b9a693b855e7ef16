"""DuckDB oracle SQL for every SQL-expressible query in the registry.

Conventions (so the driver's row-count + schema + value-hash compare passes):
- column names/aliases match the Ray side exactly;
- float aggregates are ``round(x, n)`` with the same n on both sides;
- ratio metrics are computed as integer sums + ONE final division (bit-exact
  across engines);
- counts cast to BIGINT (DuckDB's SUM of integers is HUGEINT otherwise).

The driver pre-registers views for the testdata tables (region nation
customer supplier part orders lineitem events documents embeddings); CDC /
near-dup oracles read our deterministic fixture parquet from /tmp via
``read_parquet`` (both sides materialize it idempotently — same seed, same
bytes).
"""

from __future__ import annotations

from ..stages.text import (CJK_RE, LANG_PROFILES, STOPWORDS_EN, TOKEN_RE,
                           stopword_regex)
from .fixture_paths import changelog_glob, transcripts_glob
from .text_queries import (COSINE_THRESHOLD, JACCARD_THRESHOLD,
                           SAMPLE_MAX_MINHASH, SAMPLE_MAX_NGRAM)
from .tpch import LINEITEM_PRED, PART_PRED

#: scale the driver's correctness harness runs at (sf0.01)
DRIVER_SCALE = "small"


# -- CDC --------------------------------------------------------------------

def sql_cdc_replay(scale: str = DRIVER_SCALE) -> str:
    return f"""
WITH ev AS (
  SELECT *, CASE op WHEN 'insert' THEN 0 WHEN 'update' THEN 1 ELSE 2 END AS op_rank
  FROM read_parquet('{changelog_glob(scale)}')
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC, op_rank DESC) AS rn
  FROM ev
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def sql_cdc_replay_evolved(scale: str = DRIVER_SCALE) -> str:
    return f"""
WITH ev AS (
  SELECT *, CASE op WHEN 'insert' THEN 0 WHEN 'update' THEN 1 ELSE 2 END AS op_rank
  FROM read_parquet('{changelog_glob(scale, evolve=True)}', union_by_name=true)
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC, op_rank DESC) AS rn
  FROM ev
)
SELECT conv_id, turn_idx, role, text, tool, ts, model
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


# -- TPC-H-ish --------------------------------------------------------------

# sums are stabilized onto the data's decimal grid (round(sum*1eD)/1eD) on
# BOTH sides so partial-sum-order ulp noise cannot straddle a display-rounding
# boundary; averages divide the stabilized sum by the count (see tpch._stab)
SQL_Q1 = """
WITH a AS (
  SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity) * 1e2) / 1e2         AS s_qty,
         round(sum(l_extendedprice) * 1e2) / 1e2    AS s_base,
         round(sum(l_extendedprice * (1 - l_discount)) * 1e4) / 1e4 AS s_disc_price,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1e6) / 1e6 AS s_charge,
         round(sum(l_discount) * 1e2) / 1e2         AS s_disc,
         CAST(count(*) AS BIGINT)                   AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2000-01-01'
  GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus,
       round(s_qty, 2) AS sum_qty, round(s_base, 2) AS sum_base_price,
       round(s_disc_price, 2) AS sum_disc_price, round(s_charge, 2) AS sum_charge,
       round(s_qty / count_order, 4) AS avg_qty,
       round(s_base / count_order, 4) AS avg_price,
       round(s_disc / count_order, 4) AS avg_disc,
       count_order
FROM a
"""

SQL_Q6 = """
SELECT round(round(sum(l_extendedprice * l_discount) * 1e4) / 1e4, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

SQL_Q3 = """
WITH a AS (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         round(sum(l.l_extendedprice * (1 - l.l_discount)) * 1e4) / 1e4 AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1999-01-01'
    AND l.l_shipdate  > TIMESTAMP '1999-01-01'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority)
SELECT l_orderkey, o_orderdate, o_orderpriority, round(rev, 2) AS revenue
FROM a
ORDER BY rev DESC, l_orderkey
LIMIT 10
"""

SQL_NATION_REVENUE = """
SELECT n.n_name,
       round(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 1e4) / 1e4, 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""

SQL_TOP_ORDERS = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""

SQL_ORDERS_PER_PRIORITY = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
       round((round(sum(o_totalprice) * 1e2) / 1e2) / count(*), 4) AS avg_price
FROM orders GROUP BY o_orderpriority
"""

SQL_CUSTOMER_SEGMENTS = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
       round((round(sum(c_acctbal) * 1e2) / 1e2) / count(*), 4) AS avg_bal,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM customer GROUP BY c_mktsegment
"""

SQL_PARTS_BY_BRAND = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       round((round(sum(p_retailprice) * 1e2) / 1e2) / count(*), 4) AS avg_price
FROM part GROUP BY p_brand
"""

SQL_SUPPLIER_BALANCE_BY_NATION = """
SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
       round(round(sum(s.s_acctbal) * 1e2) / 1e2, 2) AS total_bal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def sql_part_filter_string_predicates() -> str:
    # WHERE clause rendered from the SAME predicate AST the Ray query applies
    return f"""
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       round(round(sum(p_retailprice) * 1e2) / 1e2, 2) AS sum_price
FROM part
WHERE {PART_PRED.to_sql()}
GROUP BY p_brand
"""


def sql_lineitem_filter_predicates() -> str:
    # WHERE clause rendered from the SAME predicate AST the Ray query pushes
    # into read_parquet (stages/predicates.py)
    return f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
       round(round(sum(l_quantity) * 1e2) / 1e2, 2) AS sum_qty
FROM lineitem
WHERE {LINEITEM_PRED.to_sql()}
GROUP BY l_returnflag
"""


# -- events -----------------------------------------------------------------

SQL_EVENTS_HOURLY = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       round(round(sum(value) * 1e2) / 1e2, 2) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""

SQL_EVENTS_SESSIONS = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(1 + sum(CASE WHEN prev_ts IS NOT NULL
                          AND ts - prev_ts > INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events)
GROUP BY user_id
"""

SQL_EVENTS_USER_STATS = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
       round(round(sum(value) * 1e2) / 1e2, 2) AS total_value
FROM events WHERE event_type = 'purchase'
GROUP BY user_id
"""

SQL_DISTINCT_EVENT_TYPES = "SELECT DISTINCT event_type FROM events"

SQL_EVENTS_ASOF_CLICK = """
SELECT p.user_id, p.event_id, c.event_id AS click_event_id
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN
     (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
ON p.user_id = c.user_id AND p.ts >= c.ts
"""

SQL_EVENTS_RANGE_CLICK_COUNT = """
SELECT p.user_id, p.event_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN
     (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
ON p.user_id = c.user_id
   AND c.ts > p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
GROUP BY p.user_id, p.event_id
"""

SQL_EVENTS_ROLLING_3H = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         round(sum(value) * 1e2) / 1e2 AS sv
  FROM events GROUP BY event_type, date_trunc('hour', ts))
SELECT event_type, hour,
       round(sum(sv) OVER (
         PARTITION BY event_type ORDER BY hour
         RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW), 2)
         AS roll_3h
FROM agg
"""

SQL_EVENTS_PROPS_K = r"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""

SQL_CSV_ROUNDTRIP_SUPPLIER = """
SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS s_acctbal
FROM supplier
"""

SQL_EVENTS_ONEHOT = """
SELECT CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
"""

SQL_EVENTS_SYSTEMATIC_SAMPLE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(round(sum(value) * 1e2) / 1e2, 2) AS sum_value
FROM events WHERE event_id % 20 = 0
GROUP BY event_type
"""

SQL_UNION_EVENT_SLICES = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(round(sum(value) * 1e2) / 1e2, 2) AS sum_value
FROM (
  SELECT user_id, event_type, value FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, event_type, value FROM events WHERE event_type = 'error')
GROUP BY event_type
"""

SQL_DEDUP_EXACT_EVENTS = """
SELECT event_id, event_type, props FROM (
  SELECT event_id, event_type, props,
         row_number() OVER (PARTITION BY event_type, props
                            ORDER BY event_id) AS rn
  FROM events) WHERE rn = 1
"""

SQL_DEDUP_EXACT_DOCS = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
"""


# -- LLM corpus ops: packing / mixture / vocabulary -------------------------

#: chunk_id = floor((running token total BEFORE this doc) / budget) within
#: each source ordered by doc_id — the greedy overflow-packing rule;
#: integer division throughout (DuckDB window SUM is HUGEINT, cast back)
SQL_DOCS_PACK_CHUNKS = r"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tokens
  FROM documents
), c AS (
  SELECT source, tokens,
         CAST((SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)
              // 512 AS BIGINT) AS chunk_id
  FROM t
)
SELECT source, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY source, chunk_id ORDER BY source, chunk_id
"""

#: keep iff Knuth-hash bucket (10 bits) < per-source rate; the rate is
#: 64 + 48*i for src{i}, clipped to 1024 — same arithmetic as
#: stages/sampling.py (int64-safe: doc_id * 2654435761 < 2^63 for any
#: doc_id < 2^31)
SQL_DOCS_MIXTURE_SAMPLE = """
SELECT doc_id, source, lang, n_chars FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) // 4194304
      < LEAST(1024, 64 + 48 * CAST(substr(source, 4) AS BIGINT))
ORDER BY doc_id
"""

SQL_DOCS_VOCAB_TOPK = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM toks GROUP BY token ORDER BY n DESC, token LIMIT 50
"""


# -- documents text analysis ------------------------------------------------

SQL_DOCS_TOKEN_STATS = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_text
FROM documents
"""


def sql_docs_quality_by_source() -> str:
    stop_re = stopword_regex(STOPWORDS_EN)
    return f"""
WITH m AS (
  SELECT source,
         len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS nt,
         length(text) AS nc,
         len(regexp_extract_all(text, '{stop_re}')) AS ns,
         len(regexp_extract_all(text, '[0-9]')) AS nd
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       round(sum(ns)::DOUBLE / greatest(sum(nt), 1), 6) AS stop_ratio,
       round(sum(nd)::DOUBLE / greatest(sum(nc), 1), 6) AS digit_ratio
FROM m GROUP BY source
"""


def sql_docs_langid() -> str:
    c = {lang: f"len(regexp_extract_all(text, '{stopword_regex(words)}'))"
         for lang, words in LANG_PROFILES.items()}
    c["zh"] = f"len(regexp_extract_all(text, '{CJK_RE}'))"
    return f"""
WITH counts AS (
  SELECT {c['en']} AS c_en, {c['es']} AS c_es, {c['de']} AS c_de,
         {c['fr']} AS c_fr, {c['zh']} AS c_zh
  FROM documents),
pred AS (
  SELECT CASE
    WHEN greatest(c_en, c_es, c_de, c_fr, c_zh) = 0 THEN 'und'
    WHEN c_en >= greatest(c_es, c_de, c_fr, c_zh) THEN 'en'
    WHEN c_es >= greatest(c_de, c_fr, c_zh) THEN 'es'
    WHEN c_de >= greatest(c_fr, c_zh) THEN 'de'
    WHEN c_fr >= c_zh THEN 'fr'
    ELSE 'zh' END AS lang_pred
  FROM counts)
SELECT lang_pred, CAST(count(*) AS BIGINT) AS n FROM pred GROUP BY lang_pred
"""


# -- near-dup / similarity --------------------------------------------------

def _sql_shingle_pairs(scale: str, bound: str, threshold: float) -> str:
    """Exact word-3-gram Jaccard >= threshold over a transcript sample —
    mirrors stages/dedup.py tokenization (lower, [a-z0-9]+ runs) and the
    short-row rule (<=3 tokens -> one shingle)."""
    return f"""
WITH d AS (
  SELECT conv_id || ':' || turn_idx AS rid,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM read_parquet('{transcripts_glob(scale)}')
  WHERE conv_id <= '{bound}'
), s AS (
  SELECT rid,
         list_distinct(CASE WHEN len(toks) <= 3
           THEN [array_to_string(toks, ' ')]
           ELSE list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           END) AS sh
  FROM d)
SELECT a.rid AS id_a, b.rid AS id_b
FROM s a JOIN s b ON a.rid < b.rid
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(a.sh || b.sh)) >= {threshold}
"""


def sql_neardup_minhash(scale: str = DRIVER_SCALE) -> str:
    return _sql_shingle_pairs(scale, SAMPLE_MAX_MINHASH, JACCARD_THRESHOLD)


def sql_neardup_ngram(scale: str = DRIVER_SCALE) -> str:
    return _sql_shingle_pairs(scale, SAMPLE_MAX_NGRAM, JACCARD_THRESHOLD)


SQL_NEARDUP_EMBEDDING = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {COSINE_THRESHOLD}
"""

SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10)
SELECT qid AS query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT q.qid, e.vec_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id) AS rn
  FROM embeddings e, q
  WHERE e.vec_id <> q.qid)
WHERE rn <= 10
"""


SQL_ANN_TOPK_FILTERED = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10)
SELECT qid AS query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT q.qid, e.vec_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id) AS rn
  FROM embeddings e, q
  WHERE e.vec_id <> q.qid AND e.label = 1)
WHERE rn <= 10
"""


def sql_cdc_time_travel(scale: str = DRIVER_SCALE) -> str:
    # the same LWW window query, restricted to the first transaction's LSN
    # range: lsn <= (min+max)//2 computed from the same files
    return f"""
WITH bounds AS (
  SELECT (min(lsn) + max(lsn)) // 2 AS mid
  FROM read_parquet('{changelog_glob(scale)}')
), ev AS (
  SELECT *, CASE op WHEN 'insert' THEN 0 WHEN 'update' THEN 1 ELSE 2 END AS op_rank
  FROM read_parquet('{changelog_glob(scale)}')
  WHERE lsn <= (SELECT mid FROM bounds)
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC, op_rank DESC) AS rn
  FROM ev
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


SQL_NEARDUP_MINHASH_DOCS = """
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
), s AS (
  SELECT doc_id, list_distinct(CASE WHEN len(toks) <= 3
    THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
    END) AS sh
  FROM d)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(a.sh || b.sh)) >= 0.5
"""


# 3-token shingles on both engines: engine side tokenizes with
# regexp [a-z0-9]+ lowercased and hashes each trigram (distinct per doc);
# here the same trigrams stay strings. Counts compare exactly (a 64-bit
# hash collision between distinct trigrams is the only divergence mode).
SQL_DOCS_DECONTAMINATE = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(
    [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS s
  FROM tok
), bench AS (
  SELECT list_distinct(flatten(list(s))) AS bs FROM sh WHERE doc_id % 97 = 0
)
SELECT sh.doc_id,
       len(list_intersect(sh.s, bench.bs))::BIGINT AS n_contaminated
FROM sh, bench
WHERE sh.doc_id % 97 <> 0 AND len(list_intersect(sh.s, bench.bs)) > 0
ORDER BY sh.doc_id
"""


SQL_EVENTS_ROLLUP = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY ROLLUP (event_type, date_trunc('hour', ts))
"""


SQL_EVENTS_CUBE = """
SELECT event_type, CAST(dow AS DOUBLE) AS dow,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM (SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events)
GROUP BY CUBE (event_type, dow)
"""


SQL_EVENTS_VALUE_HISTOGRAM = """
SELECT event_type,
       CAST((CAST(round(value * 100) AS BIGINT) + 1000000) // 500 AS BIGINT)
           AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


SQL_EVENTS_DISTINCT_USERS = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(DISTINCT user_id) AS BIGINT) AS sum_user_ids
FROM events GROUP BY event_type
"""


SQL_DOCS_TERM_SCRUB = r"""
SELECT doc_id,
       regexp_replace(text, '\b(customer|spark)\b', '[X]', 'g') AS text,
       len(regexp_extract_all(text, '\b(customer|spark)\b'))::BIGINT
           AS n_redacted
FROM documents
"""


SQL_ORDERS_TOP3_PER_PRIORITY = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


SQL_EVENTS_LAG_DELTA = """
SELECT user_id, event_id,
       row_number() OVER w AS rn,
       CAST(date_diff('microsecond', lag(ts) OVER w, ts) AS BIGINT) AS delta_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


SQL_CUSTOMERS_WITHOUT_URGENT_ORDERS = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_mktsegment = 'AUTOMOBILE'
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
"""


SQL_ORDERS_CUSTOMER_OUTER = """
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       c.c_acctbal AS c_acctbal,
       o.o_orderkey AS o_orderkey,
       o.o_totalprice AS o_totalprice
FROM (SELECT c_custkey, c_acctbal FROM customer
      WHERE c_mktsegment = 'BUILDING') c
FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
                 WHERE o_orderpriority = '1-URGENT') o
  ON c.c_custkey = o.o_custkey
"""


# explicit discrete-quantile rule (0-based index ceil(q*n)-1, i.e. rn =
# ceil(q*n)) on both engines — no library interpolation-rule ambiguity;
# ties in value are harmless (all tied candidates are the same value)
SQL_EVENTS_VALUE_QUANTILES = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT))
                THEN value END) AS p50,
       max(CASE WHEN rn = GREATEST(1, CAST(ceil(0.95 * n) AS BIGINT))
                THEN value END) AS p95
FROM r GROUP BY event_type
"""


# -- reshape operators (pivot / unpivot / explode) ---------------------------

_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]

SQL_EVENTS_PIVOT_TYPES = "SELECT user_id, " + ", ".join(
    [f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
     for t in _PIVOT_TYPES] +
    [f"round(round(coalesce(sum(value) FILTER (event_type = '{t}'), 0)"
     f" * 1e2) / 1e2, 2) AS sum_{t}" for t in _PIVOT_TYPES]
) + " FROM events GROUP BY user_id"

SQL_LINEITEM_UNPIVOT_STATS = """
SELECT l_returnflag, metric, CAST(count(*) AS BIGINT) AS n,
       round(round(sum(value) * 1e2) / 1e2, 2) AS sum_value
FROM (
  SELECT l_returnflag, metric, value FROM lineitem
  UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
)
GROUP BY l_returnflag, metric
"""

SQL_DOCS_WORDS_EXPLODE = """
SELECT doc_id, CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
       unnest(toks) AS word
FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
      FROM documents WHERE doc_id < 20)
"""


# -- k-means (2 Lloyd iterations unrolled; see stages/clustering.py) ---------

def sql_embeddings_kmeans(k: int = 4, d: int = 64) -> str:
    dist = ("list_sum(list_transform(range(1, {n}), "
            "i -> (q.e[i] - c.e[i]) ^ 2))".format(n=d + 1))
    assign = """
a{j} AS (
  SELECT vec_id, e, cl FROM (
    SELECT q.vec_id, q.e, c.cl,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {dist}, c.cl) AS rn
    FROM q, {cents} c) WHERE rn = 1
)"""
    update = """
u{j} AS (
  SELECT cl, list(m ORDER BY i) AS e FROM (
    SELECT a.cl, i, floor(sum(a.e[i]) / count(*) * 8 + 0.5) / 8 AS m
    FROM a{j} a, range(1, {n}) t(i) GROUP BY a.cl, i) GROUP BY cl
),
m{j} AS (  -- empty clusters keep their previous centroid
  SELECT p.cl, coalesce(u.e, p.e) AS e
  FROM {prev} p LEFT JOIN u{j} u USING (cl)
)"""
    return f"""
WITH q AS (
  SELECT vec_id, list_transform(embedding,
           x -> floor(CAST(x AS DOUBLE) * 1024 + 0.5)) AS e
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl, e
  FROM q ORDER BY vec_id LIMIT {k}
),{assign.format(j=1, dist=dist, cents="c0")},{update.format(j=1, n=d + 1, prev="c0")},{assign.format(j=2, dist=dist, cents="m1")},{update.format(j=2, n=d + 1, prev="m1")}
SELECT m2.cl AS cluster,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n,
       CAST(coalesce(s.id_sum, 0) AS BIGINT) AS id_sum,
       CAST(m2.e[1] * 8 AS BIGINT) AS c0_x8
FROM m2 LEFT JOIN (
  SELECT cl, count(*) AS n, sum(vec_id) AS id_sum FROM a2 GROUP BY cl
) s USING (cl)
"""


def sql_neardup_components(scale: str = DRIVER_SCALE) -> str:
    """Component labels over the exact-Jaccard pair set: recursive
    reachability (id reaches r through any edge path), component = min
    reachable id. Mirrors the distributed min-label propagation exactly —
    both compute min-id-in-component over the identical edge list."""
    pair_sql = _sql_shingle_pairs(scale, SAMPLE_MAX_MINHASH,
                                  JACCARD_THRESHOLD)
    return f"""
WITH RECURSIVE pairs AS ({pair_sql}),
e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT reach.id, e.b FROM reach JOIN e ON e.a = reach.r
)
SELECT id AS rid, min(r) AS comp FROM reach GROUP BY id
"""


SQL_DOCS_TFIDF_TOP_TERMS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, word),
df AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM toks GROUP BY word),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
SELECT doc_id, word AS top_term, tf, df
FROM (
  SELECT tf.doc_id, tf.word, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln((SELECT n_docs FROM n) / df.df) DESC,
                    tf.word) AS rn
  FROM tf JOIN df USING (word)
) WHERE rn = 1
"""


def sql_cdc_table_changes(scale: str = DRIVER_SCALE) -> str:
    """Row diff between the mid-LSN snapshot and the final snapshot, from
    the changelog: two LWW window states FULL JOINed on the key; change
    type from side presence, updates = winning-LSN difference."""
    return f"""
WITH bounds AS (
  SELECT (min(lsn) + max(lsn)) // 2 AS mid
  FROM read_parquet('{changelog_glob(scale)}')
), ev AS (
  SELECT *, CASE op WHEN 'insert' THEN 0 WHEN 'update' THEN 1 ELSE 2 END AS op_rank
  FROM read_parquet('{changelog_glob(scale)}')
), r1 AS (
  SELECT conv_id, turn_idx, lsn FROM (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY lsn DESC, op_rank DESC) AS rn
    FROM ev WHERE lsn <= (SELECT mid FROM bounds))
  WHERE rn = 1 AND op <> 'delete'
), r2 AS (
  SELECT conv_id, turn_idx, lsn, role, text, tool, ts FROM (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY lsn DESC, op_rank DESC) AS rn
    FROM ev)
  WHERE rn = 1 AND op <> 'delete'
)
SELECT conv_id, turn_idx,
       CASE WHEN a.lsn IS NULL THEN 'insert'
            WHEN b.lsn IS NULL THEN 'delete'
            ELSE 'update' END AS change,
       b.role AS role, b.text AS text, b.tool AS tool, b.ts AS ts
FROM r1 a FULL JOIN r2 b USING (conv_id, turn_idx)
WHERE a.lsn IS NULL OR b.lsn IS NULL OR a.lsn <> b.lsn
"""


SQL_LINEITEM_ABOVE_P95 = """
WITH t AS (SELECT l_extendedprice AS v FROM lineitem WHERE l_extendedprice IS NOT NULL),
p AS (
  SELECT v AS p95 FROM t ORDER BY v
  LIMIT 1 OFFSET (SELECT GREATEST(1, CAST(ceil(0.95 * count(*)) AS BIGINT)) - 1 FROM t)
)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_above,
       round(round(sum(l_extendedprice) * 1e2) / 1e2, 2) AS sum_price
FROM lineitem WHERE l_extendedprice > (SELECT p95 FROM p)
GROUP BY l_returnflag
"""


def sql_cdc_incremental_agg(scale: str = DRIVER_SCALE) -> str:
    """Full v2 per-conversation live-turn count from the changelog — what
    the incrementally-maintained view must equal."""
    return f"""
WITH ev AS (
  SELECT *, CASE op WHEN 'insert' THEN 0 WHEN 'update' THEN 1 ELSE 2 END AS op_rank
  FROM read_parquet('{changelog_glob(scale)}')
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC, op_rank DESC) AS rn
  FROM ev
)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns
FROM ranked WHERE rn = 1 AND op <> 'delete'
GROUP BY conv_id
"""


SQL_EVENTS_HIVE_ROUNDTRIP = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(round(sum(value) * 1e2) / 1e2, 2) AS sum_value,
       CAST(max(event_id) AS BIGINT) AS max_event_id
FROM events GROUP BY event_type
"""


SQL_LINEITEM_BLOOM_JOIN = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(round(sum(l_extendedprice) * 1e2) / 1e2, 2) AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


def sql_docs_corpus_curation() -> str:
    """The five curation stages as one CTE chain (same regexes, same
    integer-arithmetic thresholds, same Knuth-hash mixture filter)."""
    lang_counts = {lang: f"len(regexp_extract_all(text, '{stopword_regex(words)}'))"
                   for lang, words in LANG_PROFILES.items()}
    lang_counts["zh"] = f"len(regexp_extract_all(text, '{CJK_RE}'))"
    return f"""
WITH m AS (
  SELECT doc_id, source, text,
         len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
         len(regexp_extract_all(text, '{stopword_regex(STOPWORDS_EN)}')) AS n_stop,
         {lang_counts['en']} AS c_en, {lang_counts['es']} AS c_es,
         {lang_counts['de']} AS c_de, {lang_counts['fr']} AS c_fr,
         {lang_counts['zh']} AS c_zh
  FROM documents
), q AS (
  SELECT * FROM m WHERE n_tokens >= 10 AND 100 * n_stop >= 5 * n_tokens
), l AS (
  SELECT * FROM q
  WHERE greatest(c_en, c_es, c_de, c_fr, c_zh) > 0
    AND c_en >= greatest(c_es, c_de, c_fr, c_zh)
), d AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM l) WHERE rn = 1
), s AS (
  SELECT * FROM d
  WHERE ((doc_id * 2654435761) % 4294967296) // 4194304
        < LEAST(1024, 64 + 48 * CAST(substr(source, 4) AS BIGINT))
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM s GROUP BY source
"""


SQL_EVENTS_USER_CUMSUM = """
SELECT user_id, event_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM events
"""

SQL_EVENTS_SESSION_STATS = """
WITH w AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM w
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS dur_us
FROM s GROUP BY user_id, sid
"""


SQL_DOCS_SLIDING_CHUNKS = """
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
  FROM documents
), c AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 32)) AS s FROM d
)
SELECT doc_id, CAST(s // 32 AS BIGINT) AS chunk_idx,
       CAST(LEAST(64, len(toks) - s) AS BIGINT) AS n_tokens_chunk,
       array_to_string(toks[s + 1 : s + 64], ' ') AS chunk_text
FROM c
"""


SQL_DOCS_SAMPLE_K = """
SELECT doc_id, source, n_chars FROM documents
ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
LIMIT 100
"""


SQL_DOCS_REPETITION_SCORES = """
WITH toks AS (
  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z]+') AS w
  FROM documents
), idx AS (
  SELECT doc_id, source, w, unnest(generate_series(1, len(w) - 1)) AS i
  FROM toks WHERE len(w) >= 2
), cnt AS (
  SELECT doc_id, source, w[i] || ' ' || w[i+1] AS g, count(*) AS c
  FROM idx GROUP BY ALL
), per AS (
  SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS nb,
         CAST(max(c) AS BIGINT) AS mx
  FROM cnt GROUP BY doc_id, source
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(mx) AS BIGINT) AS sum_max_bigram,
       CAST(sum(CASE WHEN 5 * mx > nb THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged
FROM per GROUP BY source
"""


SQL_DOCS_STRATIFIED_SAMPLE = """
SELECT doc_id, source, n_chars FROM (
    SELECT doc_id, source, n_chars,
           row_number() OVER (
               PARTITION BY source
               ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
    FROM documents)
WHERE rn <= 20
"""


# int8 quantization: the same integer-grid / non-negative-division
# arithmetic as stages/quantize.py — every code is reproduced bit-for-bit
SQL_EMBEDDINGS_QUANTIZE_INT8 = """
WITH comp AS (
    SELECT vec_id, label,
           CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * 1024) AS BIGINT)
               AS g
    FROM embeddings
), withs AS (
    SELECT *, max(abs(g)) OVER (PARTITION BY vec_id) AS s FROM comp
), codes AS (
    SELECT vec_id, label, s, g,
           CASE WHEN s = 0 THEN 0
                WHEN g < 0 THEN -((abs(g) * 127) // s)
                ELSE (abs(g) * 127) // s END AS q
    FROM withs
), vec AS (
    SELECT vec_id, label, any_value(s) AS s,
           sum(q) AS vq, sum(abs(q)) AS vaq,
           sum(abs(127 * g - q * s)) AS verr
    FROM codes GROUP BY vec_id, label
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vq) AS BIGINT) AS sum_q,
       CAST(sum(vaq) AS BIGINT) AS sum_abs_q,
       CAST(sum(s) AS BIGINT) AS sum_scale,
       CAST(sum(verr) AS BIGINT) AS sum_err
FROM vec GROUP BY label
"""


SQL_ORDERS_CUSTOMER_SALTED = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
       round(round(sum(o_totalprice) * 1e2) / 1e2, 2) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


SQL_EMBEDDINGS_LABEL_CENTROIDS = """
WITH q AS (
  SELECT label, list_transform(embedding,
           x -> floor(CAST(x AS DOUBLE) * 1024 + 0.5)) AS e
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
       CAST(floor(sum(e[1]) / count(*) * 8 + 0.5) AS BIGINT) AS c0_x8,
       CAST(floor(sum(e[64]) / count(*) * 8 + 0.5) AS BIGINT) AS c63_x8
FROM q GROUP BY label
"""
