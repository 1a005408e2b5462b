"""Shared registry plumbing: the base candle/series CTE pair (Spark + DuckDB), rounding/canonicalization helpers, and every helper used by two or more query domains.

Split mechanically from the monolithic plans/registry.py (r12);
statement order and text preserved verbatim.
"""
from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.calendar import ANCHOR_EPOCH, add_calendar, add_time_idx, weekday_mon0
from ..functions.distance import (
    dist_l2sq,
    weighted_dist,
)
from ..functions.text import (
    EN_STOPWORDS,
    fingerprint,
    hash60,
    pos_shingles,
    predicted_lang,
    shingles,
    sql_fingerprint,
    sql_hash60,
    sql_lang_case,
    sql_pos_shingles,
    sql_shingles,
    sql_tokens,
    tokens,
)
from ..operators.cleaning import dedup_keep_last, time_range_filter
from ..operators.dedup import (
    MH_BANDS,
    MH_PRIME,
    MH_ROWS,
    SIMHASH_BITS,
    SIMHASH_CHUNKS,
    SIMHASH_MAX_DIST,
    minhash_candidate_pairs,
    minhash_coeffs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..operators.gapfill import fill_missing_time_idx
from ..operators.resample import resample_ohlcv
from ..operators.rolling import (
    add_indicators,
    atr,
    holt_linear,
    macd,
    rolling_corr,
    rsi,
)
from ..operators.similarity import (
    ANN_PLANES,
    ann_lsh_topk,
    embedding_near_dup_pairs,
    sign_planes,
)
from ..operators.windows import sliding_windows
from ..session import require_utc
from ..sources.tables import events_series, load_table
from .flagship import FlagshipParams, flagship_per_query_mae

QueryFn = Callable[[SparkSession, str], DataFrame]

# --------------------------------------------------------------------------
# shared building blocks
# --------------------------------------------------------------------------

STEP_6H = 6 * 3600

# DuckDB CTE: events -> deduped (symbol, ts, close) series
SQL_SERIES = """
series AS (
  SELECT user_id AS symbol, ts, value AS close
  FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS __rn
    FROM events)
  WHERE __rn = 1
)"""

# DuckDB CTE chain: series -> right-closed 6h resample -> time_idx
SQL_RES6H = f"""
res AS (
  SELECT symbol,
         time_bucket(INTERVAL '6 hours', ts - INTERVAL '1 microsecond')
           + INTERVAL '6 hours' AS datetime,
         arg_min(close, ts) AS open,
         max(close) AS high,
         min(close) AS low,
         arg_max(close, ts) AS close,
         count(*) AS n_rows
  FROM series GROUP BY 1, 2
),
idx AS (
  SELECT symbol, datetime,
         CAST(floor((epoch(datetime) - {ANCHOR_EPOCH}) / {STEP_6H}) AS BIGINT) AS time_idx,
         open, high, low, close, n_rows
  FROM res
)"""

# DuckDB CTE: idx -> dense per-symbol grid with ffilled close
SQL_FILLED = """
grid AS (
  SELECT symbol, unnest(generate_series(mn, mx)) AS time_idx
  FROM (SELECT symbol, min(time_idx) AS mn, max(time_idx) AS mx FROM idx GROUP BY 1)
),
filled AS (
  SELECT g.symbol, g.time_idx,
         (i.close IS NULL)::INT AS is_gap,
         last_value(i.close IGNORE NULLS) OVER (
           PARTITION BY g.symbol ORDER BY g.time_idx
           ROWS UNBOUNDED PRECEDING) AS close
  FROM grid g LEFT JOIN idx i ON g.symbol = i.symbol AND g.time_idx = i.time_idx
)"""


# DuckDB CTE: idx -> dense grid with ALL OHLC columns ffilled (the
# volume proxy is the per-bucket row count)
SQL_FILLED_OHLC = """
grid AS (
  SELECT symbol, unnest(generate_series(mn, mx)) AS time_idx
  FROM (SELECT symbol, min(time_idx) AS mn, max(time_idx) AS mx FROM idx GROUP BY 1)
),
filled AS (
  SELECT g.symbol, g.time_idx,
         last_value(i.open IGNORE NULLS) OVER wf AS open,
         last_value(i.high IGNORE NULLS) OVER wf AS high,
         last_value(i.low IGNORE NULLS) OVER wf AS low,
         last_value(i.close IGNORE NULLS) OVER wf AS close,
         last_value(i.n_rows IGNORE NULLS) OVER wf::DOUBLE AS volume
  FROM grid g LEFT JOIN idx i ON g.symbol = i.symbol AND g.time_idx = i.time_idx
  WINDOW wf AS (PARTITION BY g.symbol ORDER BY g.time_idx ROWS UNBOUNDED PRECEDING)
)"""


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped (symbol, datetime, close) from events.

    ONE wide exchange up front (hash by symbol): every downstream
    per-symbol operator — dedup window, (symbol, bucket) resample
    aggregate, gap-fill window, indicator windows — satisfies its
    required distribution from this partitioning (hash(symbol) clusters
    any (symbol, …) key), so the whole ts_* family runs exchange-free
    after this point instead of reshuffling at each operator boundary.
    """
    return dedup_keep_last(
        events_series(spark, sf_dir).repartition("symbol"),
        ["symbol", "datetime"],
        "event_id",
    ).select("symbol", "datetime", "close")


def _resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = resample_ohlcv(_series(spark, sf_dir), "6 hours")
    return add_time_idx(r, "datetime", STEP_6H)


def _filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fill_missing_time_idx(
        _resampled(spark, sf_dir).select("symbol", "time_idx", "close"),
        ts_col="__none__",
        fill_cols=["close"],
    ).select("symbol", "time_idx", "is_gap", "close")


def _filled_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        fill_missing_time_idx(
            _resampled(spark, sf_dir).select(
                "symbol", "time_idx", "open", "high", "low", "close", "n_rows"
            ),
            ts_col="__none__",
            fill_cols=["open", "high", "low", "close", "n_rows"],
        )
        .withColumn("volume", F.col("n_rows").cast("double"))
        .select("symbol", "time_idx", "open", "high", "low", "close", "volume")
    )


# DuckDB sequential-fold L2 distance between two list expressions
def _sql_l2(a: str, b: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(list_zip({a}, {b}),"
        f" p -> (p[1]-p[2])*(p[1]-p[2])), (x,y) -> x+y))"
    )


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}),"
        f" p -> p[1]*p[2]), (x,y) -> x+y)"
    )


def _sql_norm(a: str) -> str:
    return f"sqrt(list_reduce(list_transform({a}, x -> x*x), (x,y) -> x+y))"


# Engine-independent 6-decimal rounding: floor(x*1e6 + 0.5)/1e6 is pure
# IEEE-754 ops so Spark and DuckDB produce bitwise-identical doubles.
# Built-in round() differs between engines on half-boundary values
# (Spark rounds the shortest decimal repr via Java BigDecimal.valueOf,
# DuckDB rounds the true binary value). Trailing +0.0 folds -0.0.
def _rne(expr, name: str, n: int = 6):
    """Engine-safe half-up rounding of any Column at ``n`` decimals.
    Above |x| >= 1e12 the value passes through unrounded: Spark's
    ``floor`` returns LONG and overflows past |x|*10^n > 9.2e18
    (DuckDB's stays DOUBLE) — the guard is applied symmetrically in
    :func:`_sql_rne` so both engines agree. Below the guard the
    rounding is required: aggregation-order ULP drift is real at e9
    magnitudes and the rounding collapses it."""
    s = float(10**n)
    rounded = F.floor(expr * F.lit(s) + F.lit(0.5)) / F.lit(s) + F.lit(0.0)
    return (
        F.when(F.abs(expr) < F.lit(1e12), rounded).otherwise(
            expr + F.lit(0.0)
        )
    ).alias(name)


def _r6(c):
    return _rne(F.col(c), c, 6)


def _r6e(expr, name: str):
    """Expression form of :func:`_r6` (engine-safe rounding of any Column)."""
    return _rne(expr, name, 6)


def _sql_rne_expr(expr: str, n: int = 6) -> str:
    """Unaliased SQL form of the guard+round — for embedding inside a
    larger expression (e.g. a CASE arm) where ``AS name`` can't go."""
    s = "1" + "0" * n + ".0"
    return (
        f"CASE WHEN abs({expr}) < 1000000000000.0 "
        f"THEN floor(({expr}) * {s} + 0.5) / {s} + 0.0 "
        f"ELSE ({expr}) + 0.0 END"
    )


def _sql_rne(expr: str, name: str, n: int = 6) -> str:
    return f"{_sql_rne_expr(expr, n)} AS {name}"


def _sql_r6(c: str) -> str:
    return _sql_rne(c, c, 6)


def _sql_r6e(expr: str, name: str) -> str:
    return _sql_rne(expr, name, 6)


def _sql_r6_wrap(body: str, keys: list[str], cols: list[str]) -> str:
    """Wrap an unrounded oracle body with the same explicit rounding."""
    sel = ", ".join(keys) + ", " + ", ".join(_sql_r6(c) for c in cols)
    return f"SELECT {sel} FROM ({body})"


_SQL_TS_INDICATORS_BODY = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED_OHLC},
pfx AS (
  SELECT symbol, time_idx, high, low, close, volume,
         lag(close) OVER w AS prev,
         lag(close, 12) OVER w AS prev12,
         row_number() OVER w AS rn,
         list(close * volume) OVER f20 AS pvl,
         list(volume) OVER f20 AS vvl
  FROM filled
  WINDOW w AS (PARTITION BY symbol ORDER BY time_idx),
         f20 AS (PARTITION BY symbol ORDER BY time_idx ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
),
lagged AS (
  -- sequential left-to-right fold == Spark's sliding-frame recompute
  SELECT * EXCLUDE (pvl, vvl),
         list_reduce(pvl, (a, b) -> a + b) AS pv_f,
         list_reduce(vvl, (a, b) -> a + b) AS vv_f
  FROM pfx
)
SELECT symbol, time_idx,
  close / nullif(prev, 0.0) - 1 AS ret,
  CASE WHEN close > 0 AND prev > 0 THEN ln(close / prev) END AS logret,
  CASE WHEN rn >= 20 THEN avg(close) OVER f20 END AS sma20,
  CASE WHEN rn >= 20
        THEN avg(close) OVER f20 + 2 * stddev_pop(close) OVER f20 END AS bb_upper,
  CASE WHEN rn >= 20
        THEN avg(close) OVER f20 - 2 * stddev_pop(close) OVER f20 END AS bb_lower,
  100 * (close / nullif(prev12, 0.0) - 1) AS roc12,
  sum(sign(close - prev) * volume) OVER cum AS obv,
  pv_f / vv_f AS vwap20,
  CASE WHEN rn >= 14
        THEN -100 * (max(high) OVER f14 - close)
             / nullif(max(high) OVER f14 - min(low) OVER f14, 0.0) END AS willr14,
  CASE WHEN rn >= 20 THEN max(high) OVER f20 END AS don_upper,
  CASE WHEN rn >= 20 THEN min(low) OVER f20 END AS don_lower,
  CASE WHEN rn >= 20
        THEN (max(high) OVER f20 + min(low) OVER f20) / 2 END AS don_mid
FROM lagged
WINDOW f20 AS (PARTITION BY symbol ORDER BY time_idx ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
       f14 AS (PARTITION BY symbol ORDER BY time_idx ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
       cum AS (PARTITION BY symbol ORDER BY time_idx ROWS UNBOUNDED PRECEDING)"""

SQL_TS_INDICATORS = _sql_r6_wrap(
    _SQL_TS_INDICATORS_BODY,
    ["symbol", "time_idx"],
    ["ret", "logret", "sma20", "bb_upper", "bb_lower", "roc12", "obv",
     "vwap20", "willr14", "don_upper", "don_lower", "don_mid"],
)


def _sql_ewm(prefix_list: str, alpha_expr: str) -> str:
    """Sequential ewm recursion y=(1-a)*y+a*x over a prefix list —
    bitwise-identical to the Arrow UDF's loop."""
    return (
        f"list_reduce({prefix_list}, (acc, x) ->"
        f" (1.0 - {alpha_expr}) * acc + {alpha_expr} * x)"
    )


# --------------------------------------------------------------------------
# k-NN / embedding queries (embeddings table)
# --------------------------------------------------------------------------

KNN_QUERY_MOD = 199
KNN_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


def dist_l2_fixed64(a, b):
    """Flat-codegen 64-dim L2 (bitwise-equal to the dist_l2 fold) for
    the embeddings table's pair joins."""
    from ..functions.distance import dist_l2_fixed

    return dist_l2_fixed(a, b, 64)


def _sql_l1(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}),"
        f" p -> abs(p[1]-p[2])), (x,y) -> x+y)"
    )


def _sql_knn(metric: str) -> str:
    order = "dist ASC, vec_id ASC"
    if metric == "cosine":
        d = f"{_sql_dot('e.v', 'q.qv')} / ({_sql_norm('e.v')} * {_sql_norm('q.qv')})"
        order = "dist DESC, vec_id ASC"
    elif metric == "l1":
        d = _sql_l1("e.v", "q.qv")
    elif metric == "weighted_l2":
        d = (
            f"{_sql_l2('e.v[1:32]', 'q.qv[1:32]')}"
            f" + {_sql_l2('e.v[33:64]', 'q.qv[33:64]')} / 2.0"
        )
    elif metric == "weighted_cosine":
        cos_h = (
            f"{_sql_dot('e.v[1:32]', 'q.qv[1:32]')}"
            f" / ({_sql_norm('e.v[1:32]')} * {_sql_norm('q.qv[1:32]')})"
        )
        cos_t = (
            f"{_sql_dot('e.v[33:64]', 'q.qv[33:64]')}"
            f" / ({_sql_norm('e.v[33:64]')} * {_sql_norm('q.qv[33:64]')})"
        )
        d = f"{cos_h} + {cos_t} / 2.0"
        order = "dist DESC, vec_id ASC"
    else:
        d = _sql_l2("e.v", "q.qv")
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % {KNN_QUERY_MOD} = 0),
cand AS (
  SELECT q.q_id, e.vec_id, {d} AS dist
  FROM emb e CROSS JOIN q
  WHERE e.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, vec_id, dist,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY {order}) AS INT) AS rank
  FROM cand
)
SELECT q_id, vec_id, rank, {_sql_r6('dist')} FROM ranked WHERE rank <= {KNN_K}"""


SCD2_TIER_DIV = 100.0


# --------------------------------------------------------------------------
# text analysis: quality, language-ID, fingerprint (documents table)
# --------------------------------------------------------------------------

SQL_TOKS = f"""toks AS (
  SELECT doc_id, lang, text, {sql_tokens('text')} AS tok FROM documents
)"""


# --------------------------------------------------------------------------
# near-duplicate detection: MinHash-LSH, SimHash, n-gram Jaccard
# --------------------------------------------------------------------------

NEAR_DUP_TAU = 0.2


def _sql_minhash_sig() -> str:
    a, b = minhash_coeffs()
    mins = ", ".join(
        f"list_min(list_transform(h, x -> ({ai} * x + {bi}) % {MH_PRIME}))"
        for ai, bi in zip(a, b)
    )
    return f"[{mins}]"


def _sql_band_arms(table: str, bands: int = MH_BANDS, rows: int = MH_ROWS) -> str:
    arms = []
    for bi in range(bands):
        key = " || '_' || ".join(
            f"sig[{bi * rows + j + 1}]::VARCHAR" for j in range(rows)
        )
        arms.append(
            f"SELECT doc_id, {bi} AS band, {key} AS key FROM {table}"
        )
    return " UNION ALL ".join(arms)


def _sql_jaccard(a: str, b: str) -> str:
    union = f"len(list_distinct(list_concat({a}, {b})))"
    return (
        f"(len({a}) + len({b}) - {union})::DOUBLE"
        f" / nullif({union}, 0)::DOUBLE"
    )


# shared CTE prefix: tokenize -> shingle -> hash -> signatures ->
# banded bucket rows -> candidate pairs. ONE definition feeds the
# pairs oracle AND the estimate-error oracle so a sketch-contract edit
# can't silently desync them (the same rule as _sql_ivf_base).
_SQL_MINHASH_CAND_CTES = f"""{SQL_TOKS},
s AS (SELECT doc_id, {sql_shingles('tok', 3)} AS sh FROM toks),
sf AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
hs AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {sql_hash60('s')} % {MH_PRIME}) AS h
  FROM sf
),
sigs AS (SELECT doc_id, sh, {_sql_minhash_sig()} AS sig FROM hs),
banded AS ({_sql_band_arms('sigs')}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_i, b.doc_id AS id_j
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""

_SQL_DOC_MINHASH_BODY = f"""WITH {_SQL_MINHASH_CAND_CTES},
ver AS (
  SELECT c.id_i, c.id_j, {_sql_jaccard('x.sh', 'y.sh')} AS jac
  FROM cand c
  JOIN sf x ON x.doc_id = c.id_i
  JOIN sf y ON y.doc_id = c.id_j
)
SELECT id_i, id_j, jac FROM ver WHERE jac >= {NEAR_DUP_TAU}"""

SQL_DOC_MINHASH = _sql_r6_wrap(
    _SQL_DOC_MINHASH_BODY, ["id_i", "id_j"], ["jac"]
)


EDIT_SIM_TAU = 0.4


def _sql_edit_sim_pairs() -> str:
    # the Spark side's length-gap prefilter is a lossless cost cut
    # (implied by the final sim filter), so the oracle omits it
    body = f"""WITH {_SQL_MINHASH_CAND_CTES},
ver AS (
  SELECT c.id_i, c.id_j,
         CAST(levenshtein(x.text, y.text) AS INT) AS ed,
         CAST(length(x.text) AS INT) AS len_i,
         CAST(length(y.text) AS INT) AS len_j
  FROM cand c
  JOIN documents x ON x.doc_id = c.id_i
  JOIN documents y ON y.doc_id = c.id_j
),
scored AS (
  SELECT id_i, id_j, ed, len_i, len_j,
         1.0 - CAST(ed AS DOUBLE) / greatest(len_i, len_j) AS sim
  FROM ver
)
SELECT id_i, id_j, ed, len_i, len_j, sim
FROM scored WHERE sim >= {EDIT_SIM_TAU}"""
    return _sql_r6_wrap(
        body, ["id_i", "id_j", "ed", "len_i", "len_j"], ["sim"]
    )


# the "new batch" is the top tenth of the id space — RELATIVE to the
# corpus, so the daily-ingest shape (small batch vs big seen corpus)
# holds at every scale factor; an absolute cutoff inverted the cost
# model at sf0.1 (92% of docs counted as "new"). Integer arithmetic
# ((max+1)*9)//10 is bitwise-identical in Python and DuckDB.
INCR_NEW_NUM, INCR_NEW_DEN = 9, 10
SQL_INCR_SPLIT = (
    f"(SELECT ((max(doc_id)+1)*{INCR_NEW_NUM})//{INCR_NEW_DEN}"
    " FROM documents)"
)


def _incr_split_id(spark: SparkSession, sf_dir: str) -> int:
    mx = (
        load_table(spark, sf_dir, "documents")
        .agg(F.max("doc_id"))
        .first()[0]
    )
    return (int(mx) + 1) * INCR_NEW_NUM // INCR_NEW_DEN


def _minhash_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Resolve (building on first use) the persisted sketch index of
    the SEEN corpus — the one-time cost of incremental dedup, amortized
    across every later batch exactly like the reference's don't-refetch
    CSV cache (core/data/cdd.py:88-100). Keyed by the documents table's
    identity (path + size + mtime) and the sketch parameters, so a
    changed input or contract can never serve a stale index."""
    import hashlib
    import os

    from ..operators.dedup import MH_BANDS, MH_PERMS, MH_ROWS

    split = _incr_split_id(spark, sf_dir)
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}|"
        f"{split}|{MH_PERMS}|{MH_BANDS}|{MH_ROWS}|v3".encode()
    ).hexdigest()[:16]
    root = os.environ.get(
        "BDSPF_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".cache"),
    )
    try:
        os.makedirs(root, exist_ok=True)
        writable = os.access(root, os.W_OK)
    except OSError:
        writable = False
    if not writable:
        import tempfile

        root = os.path.join(tempfile.gettempdir(), "bdspf-cache")
        os.makedirs(root, exist_ok=True)
    idx = os.path.join(root, "minhash_index", key)
    if not (
        os.path.exists(os.path.join(idx, "bands", "batch=seed", "_SUCCESS"))
        and os.path.exists(
            os.path.join(idx, "shingles", "batch=seed", "_SUCCESS")
        )
    ):
        from ..operators.dedup import write_minhash_index

        docs = load_table(spark, sf_dir, "documents")
        write_minhash_index(docs.filter(F.col("doc_id") < split), idx)
    return idx


_SQL_DOC_NGRAM_BODY = f"""WITH {SQL_TOKS},
s AS (SELECT doc_id, {sql_shingles('tok', 3)} AS sh FROM toks),
sf AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
e AS (
  SELECT doc_id, len(sh) AS cnt,
         unnest(list_transform(sh, s -> {sql_hash60('s')})) AS h
  FROM sf
),
p AS (
  SELECT a.doc_id AS id_i, a.cnt AS cnt_i, b.doc_id AS id_j,
         b.cnt AS cnt_j, count(*) AS inter
  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_i, id_j,
       inter::DOUBLE / (cnt_i + cnt_j - inter)::DOUBLE AS jac
FROM p WHERE inter::DOUBLE / (cnt_i + cnt_j - inter)::DOUBLE >= {NEAR_DUP_TAU}"""

SQL_DOC_NGRAM = _sql_r6_wrap(_SQL_DOC_NGRAM_BODY, ["id_i", "id_j"], ["jac"])


def _sql_simhash_cte() -> str:
    """The simhash pipeline as a reusable CTE chain (ends at
    ``spairs`` = verified near-dup pairs) — shared by the pairs query
    and the cluster-resolution query."""
    pows = ", ".join(f"{1 << j}::BIGINT" for j in range(SIMHASH_BITS))
    width = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << width) - 1
    arms = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS c,"
        f" (simhash >> {c * width}) & {mask} AS v FROM sim"
        for c in range(SIMHASH_CHUNKS)
    )
    return f"""{SQL_TOKS},
hs AS (
  SELECT doc_id, list_transform(tok, t -> {sql_hash60('t')}) AS h
  FROM toks WHERE len(tok) > 0
),
bl AS (
  SELECT doc_id,
    list_transform(h, x -> list_transform(range(0, {SIMHASH_BITS}),
      j -> CASE WHEN (x & (1::BIGINT << CAST(j AS INT))) <> 0
           THEN 1 ELSE -1 END)) AS bitlists
  FROM hs
),
v AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(list_transform(range(0, {SIMHASH_BITS}), j -> 0), bitlists),
      (acc, x) -> list_transform(list_zip(acc, x), z -> z[1] + z[2])
    ) AS votes
  FROM bl
),
sim AS (
  SELECT doc_id,
    list_reduce(list_transform(list_zip(votes, [{pows}]),
      z -> CASE WHEN z[1] >= 0 THEN z[2] ELSE 0::BIGINT END),
      (a, b) -> a + b) AS simhash
  FROM v
),
chunked AS ({arms}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_i, b.doc_id AS id_j,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM chunked a JOIN chunked b
    ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id
),
spairs AS (
  SELECT id_i, id_j, hamming FROM cand WHERE hamming <= {SIMHASH_MAX_DIST}
)"""


def _sql_simhash_pairs() -> str:
    return f"WITH {_sql_simhash_cte()}\nSELECT id_i, id_j, hamming FROM spairs"


def _sql_dup_clusters() -> str:
    return f"""WITH RECURSIVE {_sql_simhash_cte()},
edges AS (
  SELECT id_i AS src, id_j AS dst FROM spairs
  UNION
  SELECT id_j AS src, id_i AS dst FROM spairs
),
r AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.dst AS node, r.lbl AS lbl FROM r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM r GROUP BY node)
SELECT node AS doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       (node = cluster_id)::INT AS is_canonical
FROM comp"""


def _sql_sign_bucket(band: int = 0) -> str:
    """The sign-LSH bucket id as a DuckDB expression over column ``v`` —
    exact ±1.0 plane sums, bitwise-identical to the Arrow pass."""
    planes = sign_planes(ANN_PLANES, 64, band)
    parts = []
    for k, row in enumerate(planes):
        lits = ", ".join(f"{s!r}" for s in row)
        dot = (
            f"list_reduce(list_prepend(0.0, "
            f"list_transform(list_zip(v, [{lits}]), z -> z[1] * z[2])),"
            f" (a, b) -> a + b)"
        )
        parts.append(f"CASE WHEN {dot} >= 0 THEN {1 << k} ELSE 0 END")
    return " + ".join(parts)


def _sql_ann_lsh() -> str:
    bucket = _sql_sign_bucket()
    cos = f"{_sql_dot('e.v', 'q.qv')} / ({_sql_norm('e.v')} * {_sql_norm('q.qv')})"
    body = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM emb),
q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id % 100 = 0),
cand AS (
  SELECT q.q_id, e.vec_id AS id, {cos} AS cos
  FROM b e JOIN q ON e.bucket = q.bucket
  WHERE e.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, id, cos,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, id ASC) AS INT) AS rank
  FROM cand
)
SELECT q_id, id, rank, cos FROM ranked WHERE rank <= {KNN_K}"""
    return _sql_r6_wrap(body, ["q_id", "id", "rank"], ["cos"])


RANGE_JOIN_HORIZON_US = 3_600_000_000  # 1 hour

# hypertable rollup grains; each coarser grain is an integer multiple
# of the previous so levels re-aggregate from one another
ROLLUP_GRAINS_US = (
    ("1h", 3_600_000_000),
    ("6h", 21_600_000_000),
    ("1d", 86_400_000_000),
)


def _sql_hypertable_rollup() -> str:
    g1, g6, gd = (g for _, g in ROLLUP_GRAINS_US)
    return f"""WITH {SQL_SERIES},
l1 AS (
  SELECT symbol, (epoch_us(ts) // {g1}) * {g1} AS bucket_us,
         arg_min(close, ts) AS open, max(close) AS high,
         min(close) AS low, arg_max(close, ts) AS close,
         count(*) AS n
  FROM series GROUP BY 1, 2
),
l6 AS (
  SELECT symbol, (bucket_us // {g6}) * {g6} AS bucket_us,
         arg_min(open, bucket_us) AS open, max(high) AS high,
         min(low) AS low, arg_max(close, bucket_us) AS close,
         CAST(sum(n) AS BIGINT) AS n
  FROM l1 GROUP BY 1, 2
),
ld AS (
  SELECT symbol, (bucket_us // {gd}) * {gd} AS bucket_us,
         arg_min(open, bucket_us) AS open, max(high) AS high,
         min(low) AS low, arg_max(close, bucket_us) AS close,
         CAST(sum(n) AS BIGINT) AS n
  FROM l6 GROUP BY 1, 2
)
SELECT '1h' AS grain, * FROM l1
UNION ALL SELECT '6h' AS grain, * FROM l6
UNION ALL SELECT '1d' AS grain, * FROM ld"""


# per-stratum sampling denominators: keep 1/denom of each event type.
# The denominators differ on purpose — rebalancing a skewed class mix
# (keep most of the rare strata, downsample the common ones) is the
# canonical training-data sampling stage.
STRATA_DENOMS: dict[str, int] = {
    "click": 20,
    "view": 20,
    "error": 10,
    "signup": 4,
    "purchase": 2,
}


ZORDER_BITS = 10



HQ_QUANTILES = [0.5, 0.9, 0.99]


def _docs_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the scan fanned out across the cluster: the
    corpus lands as few (locally: one) small parquet files, so a
    single task would otherwise evaluate every expression-heavy
    per-document projection (tokenize, shingle, chunk) serially. One
    tiny up-front shuffle buys full parallelism for everything
    downstream — the same contract as dedup's _parallelize_texts."""
    return load_table(spark, sf_dir, "documents").repartition(
        F.col("doc_id")
    )


CHUNK_W, CHUNK_S = 64, 48


DECONTAM_N = 5
DECONTAM_BENCH_MAX = 10


def _sql_bloom_decontam() -> str:
    from ..operators.dedup import MH_PRIME, minhash_coeffs
    from ..operators.sketch import BLOOM_K, BLOOM_M_BITS

    a, b = minhash_coeffs(BLOOM_K)
    coeff_rows = ", ".join(
        f"({d}, {a[d]}, {b[d]})" for d in range(BLOOM_K)
    )
    return f"""
WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS tok FROM documents
),
s AS (
  SELECT doc_id,
         unnest(list_transform({sql_shingles('tok', DECONTAM_N)},
                x -> {sql_hash60('x')})) AS h
  FROM t
),
sd AS (SELECT DISTINCT doc_id, h FROM s),
coeff(d, a, b) AS (VALUES {coeff_rows}),
bench_h AS (
  SELECT DISTINCT h FROM sd WHERE doc_id < {DECONTAM_BENCH_MAX}
),
bench_bits AS (
  SELECT DISTINCT (((h % {MH_PRIME}) * c.a + c.b) % {MH_PRIME})
           % {BLOOM_M_BITS} AS pos
  FROM bench_h CROSS JOIN coeff c
),
train AS (SELECT doc_id, h FROM sd WHERE doc_id >= {DECONTAM_BENCH_MAX}),
probe AS (
  SELECT train.doc_id, train.h, c.d,
         (((train.h % {MH_PRIME}) * c.a + c.b) % {MH_PRIME})
           % {BLOOM_M_BITS} AS pos
  FROM train CROSS JOIN coeff c
),
full_hits AS (
  SELECT doc_id, count(*) AS n_bloom_hits FROM (
    SELECT doc_id, h, count(DISTINCT d) AS kk
    FROM probe JOIN bench_bits USING (pos)
    GROUP BY 1, 2) WHERE kk = {BLOOM_K}
  GROUP BY 1
),
exact_hits AS (
  SELECT doc_id, count(*) AS n_exact_hits
  FROM train WHERE h IN (SELECT h FROM bench_h) GROUP BY 1
),
totals AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1)
SELECT totals.doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(n_bloom_hits, 0) AS BIGINT) AS n_bloom_hits,
       CAST(COALESCE(n_exact_hits, 0) AS BIGINT) AS n_exact_hits
FROM totals LEFT JOIN full_hits USING (doc_id)
LEFT JOIN exact_hits USING (doc_id)"""


CMS_HH_DEN = 200  # heavy hitter = est count >= total_tokens / 200


def _sql_cms_heavy_hitters() -> str:
    from ..operators.dedup import MH_PRIME, minhash_coeffs
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH

    a, b = minhash_coeffs(CMS_DEPTH)
    coeff_rows = ", ".join(
        f"({d}, {a[d]}, {b[d]})" for d in range(CMS_DEPTH)
    )
    return f"""
WITH t AS (
  SELECT unnest({sql_tokens('text')}) AS term FROM documents
),
h AS (SELECT term, {sql_hash60('term')} % {MH_PRIME} AS h FROM t),
coeff(d, a, b) AS (VALUES {coeff_rows}),
cells AS (
  SELECT c.d, ((h.h * c.a + c.b) % {MH_PRIME}) % {CMS_WIDTH} AS cell,
         count(*) AS cnt
  FROM h CROSS JOIN coeff c GROUP BY 1, 2
),
cand AS (
  SELECT term, count(*) AS true_cnt, any_value(h) AS h
  FROM h GROUP BY term
),
est AS (
  SELECT p.term, min(cells.cnt) AS est_cnt
  FROM (
    SELECT cand.term, c.d,
           ((cand.h * c.a + c.b) % {MH_PRIME}) % {CMS_WIDTH} AS cell
    FROM cand CROSS JOIN coeff c) p
  JOIN cells USING (d, cell) GROUP BY 1
)
SELECT cand.term, CAST(true_cnt AS BIGINT) AS true_cnt,
       CAST(est_cnt AS BIGINT) AS est_cnt
FROM cand JOIN est USING (term)
WHERE est_cnt >= (SELECT count(*) FROM t) / {CMS_HH_DEN}.0"""


BM25_TERMS = ("dup", "spark", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def _snap6_dec(expr):
    """Snap a double expression to the 1e-6 grid and cast to exact
    DECIMAL(18,6) — the shared determinism device (doc_unigram_ppl):
    per-row float terms snap BEFORE the group sum, which then runs in
    exact decimal arithmetic, so aggregation order cannot perturb the
    result in either engine."""
    return (F.floor(expr * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast(
        "decimal(18,6)"
    )


def _sql_snap6_dec(expr: str) -> str:
    return f"CAST(floor(({expr}) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6))"


PMI_MIN_SUPPORT = 5
PMI_TOPK = 30


# exact global search is inherently quadratic (every query scores the
# whole cross-symbol store), so BOTH sides are bounded explicitly: the
# query panel is every 10th symbol and the candidate store is strided
# per symbol (pair count = Q*C stays ~2M at sf0.1 instead of 170M+).
# Sub-quadratic global paths are the ANN queries (sign-LSH, IVF).
GLOBAL_PARAMS = FlagshipParams(
    within_symbol=False,
    stride=8,
    query_symbol_mod=10,
    cand_stride=8,
)


SQL_TS_INDICATORS2 = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED_OHLC},
base AS (
  SELECT symbol, time_idx, close, high, low, volume,
         (high + low + close) / 3.0 AS tp,
         row_number() OVER w AS rn
  FROM filled
  WINDOW w AS (PARTITION BY symbol ORDER BY time_idx)
),
fr AS (
  SELECT symbol, time_idx, rn, tp,
         CASE WHEN rn >= 14 THEN
           100.0 * (close - min(low) OVER w14) /
           nullif(max(high) OVER w14 - min(low) OVER w14, 0.0)
         END AS k,
         avg(tp) OVER w20 AS tp_sma,
         list(tp) OVER w20 AS tps,
         CASE WHEN tp > lag(tp) OVER wo THEN tp * volume ELSE 0.0 END AS pf,
         CASE WHEN tp < lag(tp) OVER wo THEN tp * volume ELSE 0.0 END AS nf,
         max(high) OVER w9 AS hh9, min(low) OVER w9 AS ll9,
         max(high) OVER w26 AS hh26, min(low) OVER w26 AS ll26
  FROM base
  WINDOW wo AS (PARTITION BY symbol ORDER BY time_idx),
         w14 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         w20 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         w9 AS (PARTITION BY symbol ORDER BY time_idx
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
         w26 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 25 PRECEDING AND CURRENT ROW)
),
agg2 AS (
  SELECT symbol, time_idx, rn, k, tp, tp_sma, hh9, ll9, hh26, ll26,
         list_reduce(list_prepend(0.0, tps), (acc, x) -> acc + abs(x - tp_sma))
           / len(tps) AS mad,
         CASE WHEN rn >= 16 THEN avg(k) OVER (
           PARTITION BY symbol ORDER BY time_idx
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) END AS d,
         sum(pf) OVER w14 AS pf14, sum(nf) OVER w14 AS nf14
  FROM fr
  WINDOW w14 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT symbol, time_idx, k AS stoch_k, d AS stoch_d,
       CASE WHEN rn >= 20 THEN
         (tp - tp_sma) / nullif(0.015 * mad, 0.0) END AS cci20,
       CASE WHEN rn >= 15 THEN
         CASE WHEN nf14 = 0.0 THEN 100.0
              ELSE 100.0 - 100.0 / (1.0 + pf14 / nf14) END END AS mfi14,
       CASE WHEN rn >= 9 THEN (hh9 + ll9) / 2.0 END AS ichi_conv,
       CASE WHEN rn >= 26 THEN (hh26 + ll26) / 2.0 END AS ichi_base
FROM agg2"""

SQL_TS_INDICATORS2 = _sql_r6_wrap(
    SQL_TS_INDICATORS2,
    ["symbol", "time_idx"],
    ["stoch_k", "stoch_d", "cci20", "mfi14", "ichi_conv", "ichi_base"],
)


def _sql_trend_arrow() -> str:
    ppo_f = _sql_ewm("pfx", "2.0/13.0")
    ppo_s = _sql_ewm("pfx", "2.0/27.0")
    kelt = _sql_ewm("pfx", "2.0/21.0")
    atr = _sql_ewm("trpfx", "1.0/10.0")
    body = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED_OHLC},
wtr AS (
  SELECT symbol, time_idx, close,
         greatest(high - low,
                  abs(high - lag(close) OVER wo),
                  abs(low - lag(close) OVER wo)) AS tr
  FROM filled
  WINDOW wo AS (PARTITION BY symbol ORDER BY time_idx)
),
pre AS (
  SELECT symbol, time_idx,
         list(close) OVER wc AS pfx,
         list(tr) OVER wc AS trpfx
  FROM wtr
  WINDOW wc AS (PARTITION BY symbol ORDER BY time_idx
                ROWS UNBOUNDED PRECEDING)
),
e AS (
  SELECT symbol, time_idx,
         {ppo_f} AS yf, {ppo_s} AS ys, {kelt} AS ek, {atr} AS eatr
  FROM pre
)
SELECT symbol, time_idx,
       CASE WHEN ys <> 0.0 THEN 100.0 * (yf - ys) / ys END AS ppo,
       ek AS kelt_mid,
       ek + 2.0 * eatr AS kelt_upper,
       ek - 2.0 * eatr AS kelt_lower
FROM e"""
    return _sql_r6_wrap(
        body,
        ["symbol", "time_idx"],
        ["ppo", "kelt_mid", "kelt_upper", "kelt_lower"],
    )


# --------------------------------------------------------------------------
# cleaning-pipeline queries (reference P4-P7, O3, S7)
# --------------------------------------------------------------------------

_FEATURE_SMAS = (10, 30, 50)


def _feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's feature frame right before pruning: series +
    moving averages whose first w-1 rows are null (preprocess.py:46-51
    into preprocess.py:71-73)."""
    from ..operators.rolling import sma

    df = _filled(spark, sf_dir).select("symbol", "time_idx", "close")
    for n in _FEATURE_SMAS:
        df = sma(df, "close", n)
    return df


_SQL_FEATURE_FRAME = f"""fr AS (
  SELECT symbol, time_idx, close,
    CASE WHEN row_number() OVER w >= 10 THEN avg(close) OVER (
      PARTITION BY symbol ORDER BY time_idx
      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) END AS sma10,
    CASE WHEN row_number() OVER w >= 30 THEN avg(close) OVER (
      PARTITION BY symbol ORDER BY time_idx
      ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) END AS sma30,
    CASE WHEN row_number() OVER w >= 50 THEN avg(close) OVER (
      PARTITION BY symbol ORDER BY time_idx
      ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) END AS sma50
  FROM filled
  WINDOW w AS (PARTITION BY symbol ORDER BY time_idx)
)"""


def _sql_savgol() -> str:
    from ..operators.smoothing import savgol_kernel

    taps = ", ".join(repr(float(c)) for c in savgol_kernel())
    dot = (
        f"list_reduce(list_transform(list_zip(vs, [{taps}]),"
        " p -> p[1]*p[2]), (a,b) -> a+b)"
    )
    body = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED},
fr AS (
  SELECT symbol, time_idx,
         list(close) OVER (PARTITION BY symbol ORDER BY time_idx
           ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING) AS vs
  FROM filled
)
SELECT symbol, time_idx, {dot} AS close_sg
FROM fr WHERE len(vs) = 21"""
    return _sql_r6_wrap(body, ["symbol", "time_idx"], ["close_sg"])


# --------------------------------------------------------------------------
# window -> latent embedding (reference M7) and IVF ANN (scale path for
# J2's brute-force k-NN; README.md:155 "optimized K-NN" future work)
# --------------------------------------------------------------------------

_DCT_L, _DCT_K = 8, 4


def _sql_zz_windows(L: int) -> str:
    """Shared oracle CTE prefix: L-row sliding windows over the filled
    series, per-window z-scored (population std, +1e-8 eps) into ``xs``
    — the SQL twin of operators/windows.py sliding_windows + the W2
    normalization contract. Used by BOTH the DCT and PCA embed oracles
    so the window/z-score contract can never silently desync."""
    return f"""win AS (
  SELECT symbol, time_idx AS window_id,
         list(close) OVER (PARTITION BY symbol ORDER BY time_idx
           ROWS BETWEEN CURRENT ROW AND {L - 1} FOLLOWING) AS raw
  FROM filled
),
stats AS (
  SELECT symbol, window_id, raw,
         list_reduce(raw, (a,b) -> a+b) / {float(L)} AS center
  FROM win WHERE len(raw) = {L}
),
zs AS (
  SELECT symbol, window_id, center,
         sqrt(list_reduce(list_transform(raw, x -> (x-center)*(x-center)),
              (a,b) -> a+b) / {float(L)}) AS scale,
         raw
  FROM stats
),
zz AS (
  SELECT symbol, window_id,
         list_transform(raw, x -> (x - center) / (scale + 1e-8)) AS xs
  FROM zs
)"""


def _sql_dct_embed() -> str:
    from ..operators.embed import dct_basis

    basis = dct_basis(_DCT_L, _DCT_K)
    coefs = []
    for d in range(_DCT_K):
        taps = ", ".join(repr(float(c)) for c in basis[d])
        coefs.append(
            f"list_reduce(list_transform(list_zip(xs, [{taps}]),"
            f" p -> p[1]*p[2]), (a,b) -> a+b) AS e{d}"
        )
    sel = ",\n       ".join(coefs)
    body = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED},
{_sql_zz_windows(_DCT_L)}
SELECT symbol, window_id,
       {sel}
FROM zz"""
    return _sql_r6_wrap(
        body, ["symbol", "window_id"], [f"e{d}" for d in range(_DCT_K)]
    )


IVF_NPROBE = 2


def _sql_ivf_recall() -> str:
    l2 = _sql_l2("e.v", "q.qv")
    return f"""
WITH ivf AS (SELECT q_id, vec_id
             FROM ({_sql_ivf_ann(_sql_anchor_clause(IVF_Q_BUDGET))})),
emb2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q2 AS (SELECT vec_id AS q_id, v AS qv FROM emb2
       {_sql_anchor_clause(IVF_Q_BUDGET)}),
bf AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {l2} ASC, e.vec_id ASC) AS rn
    FROM emb2 e JOIN q2 q ON e.vec_id <> q.q_id)
  WHERE rn <= {KNN_K}
),
hits AS (
  SELECT q_id, count(*) AS n_hit
  FROM bf JOIN ivf USING (q_id, vec_id) GROUP BY 1
)
SELECT q2.q_id, COALESCE(n_hit, 0) AS n_hit,
       COALESCE(n_hit, 0)::DOUBLE / {float(KNN_K)} AS recall
FROM q2 LEFT JOIN hits ON q2.q_id = hits.q_id"""


def _sql_semantic_dedup() -> str:
    l2_ac = _sql_l2("a.v", "c.cvec")
    return f"""
WITH {_sql_ivf_base()},
d AS (
  SELECT a.list_id, a.vec_id, {l2_ac} AS d
  FROM assigned a JOIN cent c ON a.list_id = c.label
),
g AS (
  SELECT list_id, vec_id, d,
         row_number() OVER (PARTITION BY list_id
           ORDER BY d ASC, vec_id ASC) AS rn
  FROM d
),
s AS (
  SELECT list_id, count(*) AS n_members, avg(d) AS mean_dist
  FROM d GROUP BY 1
)
SELECT g.list_id, g.vec_id AS rep_vec_id, {_sql_rne('g.d', 'rep_dist')},
       s.n_members, {_sql_rne('s.mean_dist', 'mean_dist', 4)}
FROM g JOIN s ON g.list_id = s.list_id WHERE rn = 1"""


def _sql_ivf_base(cent_src: str = "emb", pre: str = "") -> str:
    """Shared oracle CTE prefix — centroid build + nearest-centroid
    assignment. ONE definition feeds every IVF-family oracle
    (ann/recall/semantic-dedup/streaming-ingest) so a quantizer-
    contract edit can't silently desync them. ``cent_src``/``pre``
    let the streaming-ingest oracle build the quantizer from the SEED
    split only (matching write_ivf_stream_layout) while ``assigned``
    still covers every vector; defaults reproduce the original text
    byte-for-byte."""
    l2_ec = _sql_l2("e.v", "c.cvec")
    return f"""emb AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
{pre}cent_dims AS (
  SELECT label, i AS pos,
         floor(avg(v[i]) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS c
  FROM {cent_src}, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY label, pos
),
cent AS (SELECT label, list(c ORDER BY pos) AS cvec FROM cent_dims GROUP BY label),
assigned AS (
  SELECT vec_id, v, list_id FROM (
    SELECT e.vec_id, e.v, c.label AS list_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_ec} ASC, c.label ASC) AS rk
    FROM emb e CROSS JOIN cent c)
  WHERE rk = 1
)"""


def _sql_ivf_ann(q_pick: str | None = None) -> str:
    """``q_pick``: the query-panel CTE body after ``FROM emb`` —
    default reproduces the production mod-strided panel byte-for-byte;
    the recall eval passes the fixed anchor-budget clause."""
    q_pick = (
        q_pick
        if q_pick is not None
        else f"WHERE vec_id % {KNN_QUERY_MOD} = 0"
    )
    l2_qc = _sql_l2("q.qv", "c.cvec")
    l2_aq = _sql_l2("a.v", "p.qv")
    return f"""
WITH {_sql_ivf_base()},
q AS (SELECT vec_id AS q_id, v AS qv FROM emb {q_pick}),
probes AS (
  SELECT q_id, qv, list_id FROM (
    SELECT q.q_id, q.qv, c.label AS list_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {l2_qc} ASC, c.label ASC) AS rk
    FROM q CROSS JOIN cent c)
  WHERE rk <= {IVF_NPROBE}
),
cand AS (
  SELECT p.q_id, a.vec_id, a.list_id, {l2_aq} AS dist
  FROM assigned a JOIN probes p USING (list_id)
  WHERE a.vec_id <> p.q_id
),
ranked AS (
  SELECT q_id, vec_id, list_id, dist,
         CAST(row_number() OVER (PARTITION BY q_id
           ORDER BY dist ASC, vec_id ASC) AS INT) AS rank
  FROM cand
)
SELECT q_id, vec_id, rank,
       floor(dist * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS dist, list_id
FROM ranked WHERE rank <= {KNN_K}"""


# --------------------------------------------------------------------------
# multimodal binary-column queries (training-data pipeline extension):
# payload bytes + typed metadata, JVM-native projections/slicing; the
# Arrow decode slot is rows-only (no SQL-expressible oracle)
# --------------------------------------------------------------------------


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import to_media_table

    return to_media_table(load_table(spark, sf_dir, "documents"))


_IND1_COLS = [
    "ret", "logret", "sma20", "bb_upper", "bb_lower", "roc12", "obv",
    "vwap20", "willr14", "don_upper", "don_lower", "don_mid",
]
_IND2_COLS = ["stoch_k", "stoch_d", "cci20", "mfi14", "ichi_conv", "ichi_base"]


def _sql_indicators_all() -> str:
    cols = ", ".join(
        [f"a.{c}" for c in _IND1_COLS] + [f"b.{c}" for c in _IND2_COLS]
    )
    return (
        f"SELECT a.symbol, a.time_idx, {cols} "
        f"FROM ({SQL_TS_INDICATORS}) a "
        f"JOIN ({SQL_TS_INDICATORS2}) b USING (symbol, time_idx)"
    )


def _sql_psar_cte() -> str:
    """Parabolic SAR as a RECURSIVE CTE stepping every symbol forward
    one bar per iteration: sar advances toward the extreme point by the
    accelerating factor, clamps to the two prior lows/highs, and flips
    the trend when price crosses it. A struct-fold formulation (like
    KAMA/NVI) would be natural, but DuckDB v1.0.0 miscomputes large
    struct lambdas in list_reduce (verified: fold of a 40-list
    disagrees with single-stepping its own step function), so plain
    scalar join expressions it is. Operand order matches the Arrow
    pass's Python loop exactly. References a ``pre`` CTE providing
    (symbol, time_idx, rn, high, low, pl1, pl2, ph1, ph2); shared by
    the recursive-battery and indicators5 oracles."""
    s1u = (
        "least(p.sar + p.af * (p.ep - p.sar),"
        " r.pl1, coalesce(r.pl2, r.pl1))"
    )
    s1d = (
        "greatest(p.sar + p.af * (p.ep - p.sar),"
        " r.ph1, coalesce(r.ph2, r.ph1))"
    )
    return f"""psrc AS (
  SELECT symbol, time_idx, rn, high, low, pl1, pl2, ph1, ph2 FROM pre
),
psr AS (
  SELECT symbol, time_idx, rn, low AS sar, high AS ep,
         0.02::DOUBLE AS af, true AS up
  FROM psrc WHERE rn = 1
  UNION ALL
  SELECT r.symbol, r.time_idx, r.rn,
         CASE WHEN p.up
              THEN CASE WHEN r.low < {s1u} THEN p.ep ELSE {s1u} END
              ELSE CASE WHEN r.high > {s1d} THEN p.ep ELSE {s1d} END
              END AS sar,
         CASE WHEN p.up
              THEN CASE WHEN r.low < {s1u} THEN r.low
                   ELSE greatest(p.ep, r.high) END
              ELSE CASE WHEN r.high > {s1d} THEN r.high
                   ELSE least(p.ep, r.low) END
              END AS ep,
         CASE WHEN p.up
              THEN CASE WHEN r.low < {s1u} THEN 0.02::DOUBLE
                   WHEN r.high > p.ep
                     THEN least(p.af + 0.02::DOUBLE, 0.2::DOUBLE)
                   ELSE p.af END
              ELSE CASE WHEN r.high > {s1d} THEN 0.02::DOUBLE
                   WHEN r.low < p.ep
                     THEN least(p.af + 0.02::DOUBLE, 0.2::DOUBLE)
                   ELSE p.af END
              END AS af,
         CASE WHEN p.up THEN NOT (r.low < {s1u})
              ELSE r.high > {s1d} END AS up
  FROM psr p JOIN psrc r ON r.symbol = p.symbol AND r.rn = p.rn + 1
)"""


def _sql_recursive_battery() -> str:
    e = _sql_ewm
    psar_cte = _sql_psar_cte()
    body = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED_OHLC},
pre AS (
  SELECT symbol, time_idx,
         close, volume, high, low,
         lag(low) OVER wo AS pl1, lag(low, 2) OVER wo AS pl2,
         lag(high) OVER wo AS ph1, lag(high, 2) OVER wo AS ph2,
         row_number() OVER wo AS rn,
         greatest(high - low, abs(high - lag(close) OVER wo),
                  abs(low - lag(close) OVER wo)) AS tr,
         greatest(close - lag(close) OVER wo, 0.0) AS gain,
         greatest(-(close - lag(close) OVER wo), 0.0) AS loss,
         CASE WHEN (high - lag(high) OVER wo) > (lag(low) OVER wo - low)
               AND (high - lag(high) OVER wo) > 0
              THEN high - lag(high) OVER wo ELSE 0.0 END AS pdm,
         CASE WHEN (lag(low) OVER wo - low) > (high - lag(high) OVER wo)
               AND (lag(low) OVER wo - low) > 0
              THEN lag(low) OVER wo - low ELSE 0.0 END AS ndm,
         coalesce((close - lag(close) OVER wo) * volume, 0.0) AS fi,
         coalesce(close - lag(close) OVER wo, 0.0) AS mom,
         abs(coalesce(close - lag(close) OVER wo, 0.0)) AS amom,
         high - low AS hl,
         coalesce(volume < lag(volume) OVER wo, false) AS nvif,
         coalesce((close - lag(close) OVER wo)
                  / nullif(lag(close) OVER wo, 0.0), 0.0) AS nvir,
         abs(close - lag(close, 10) OVER wo) AS k10n
  FROM filled
  WINDOW wo AS (PARTITION BY symbol ORDER BY time_idx)
),
pre2 AS (
  SELECT *, {_sql_fold_sum('list(amom) OVER f10')} AS kden
  FROM pre
  WINDOW f10 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
),
pre3 AS (
  SELECT *, CASE WHEN rn > 10 AND kden <> 0.0
                 THEN k10n / kden ELSE 0.0 END AS er
  FROM pre2
),
l1 AS (
  SELECT symbol, time_idx, rn,
         list(close) OVER wc AS cpfx, list(tr) OVER wc AS trpfx,
         list(gain) OVER wc AS gpfx, list(loss) OVER wc AS lpfx,
         list(pdm) OVER wc AS ppfx, list(ndm) OVER wc AS npfx,
         list(fi) OVER wc AS fpfx,
         list(mom) OVER wc AS mopfx, list(amom) OVER wc AS aopfx,
         list(volume) OVER wc AS vpfx, list(hl) OVER wc AS hlpfx,
         list(struct_pack(x := close,
              s := (er * (2.0/3.0 - 2.0/31.0) + 2.0/31.0)
                   * (er * (2.0/3.0 - 2.0/31.0) + 2.0/31.0)))
           OVER wc AS kpfx,
         list(struct_pack(
              x := (CASE WHEN rn = 1 THEN 1000.0 ELSE 0.0 END)::DOUBLE,
              f := nvif, r := nvir)) OVER wc AS nvpfx
  FROM pre3
  WINDOW wc AS (PARTITION BY symbol ORDER BY time_idx
                ROWS UNBOUNDED PRECEDING)
),
e1s AS (
  SELECT symbol, time_idx, rn,
         {e('cpfx', '2.0/13.0')} AS ema12, {e('cpfx', '2.0/27.0')} AS ema26,
         {e('cpfx', '2.0/16.0')} AS te1, {e('cpfx', '2.0/21.0')} AS ekel,
         {e('trpfx', '1.0/14.0')} AS atr14, {e('trpfx', '1.0/10.0')} AS ekatr,
         {e('gpfx', '1.0/14.0')} AS ag, {e('lpfx', '1.0/14.0')} AS al,
         {e('ppfx', '1.0/14.0')} AS spdm, {e('npfx', '1.0/14.0')} AS sndm,
         {e('fpfx', '2.0/14.0')} AS force13,
         {e('mopfx', '2.0/26.0')} AS tse1, {e('aopfx', '2.0/26.0')} AS tae1,
         {e('vpfx', '2.0/13.0')} AS ev12, {e('vpfx', '2.0/27.0')} AS ev26,
         {e('hlpfx', '2.0/10.0')} AS meh,
         list_reduce(kpfx, (acc, el) -> struct_pack(
             x := acc.x + el.s * (el.x - acc.x), s := el.s)).x AS kama,
         list_reduce(nvpfx, (acc, el) -> struct_pack(
             x := acc.x * (CASE WHEN el.f THEN 1.0 + el.r
                           ELSE 1.0::DOUBLE END),
             f := el.f, r := el.r)).x AS nvi
  FROM l1
),
e2s AS (
  SELECT *, ema12 - ema26 AS macd,
         CASE WHEN atr14 <> 0.0 THEN 100.0 * spdm / atr14 ELSE 0.0 END
           AS di_pos14,
         CASE WHEN atr14 <> 0.0 THEN 100.0 * sndm / atr14 ELSE 0.0 END
           AS di_neg14,
         CASE WHEN al = 0.0 THEN 100.0
              ELSE 100.0 - 100.0 / (1.0 + ag / al) END AS rsinow
  FROM e1s
),
e3s AS (
  SELECT *, CASE WHEN di_pos14 + di_neg14 <> 0.0
                 THEN 100.0 * abs(di_pos14 - di_neg14)
                      / (di_pos14 + di_neg14)
                 ELSE 0.0 END AS dx,
         min(rsinow) OVER f14s AS mn14, max(rsinow) OVER f14s AS mx14,
         min(macd) OVER f10m AS mnm, max(macd) OVER f10m AS mxm
  FROM e2s
  WINDOW f14s AS (PARTITION BY symbol ORDER BY time_idx
                  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         f10m AS (PARTITION BY symbol ORDER BY time_idx
                  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
),
l2 AS (
  SELECT *, list(macd) OVER wc AS mpfx, list(te1) OVER wc AS e1pfx,
            list(dx) OVER wc AS dxpfx, list(tse1) OVER wc AS ts1pfx,
            list(tae1) OVER wc AS ta1pfx, list(meh) OVER wc AS mehpfx,
            CASE WHEN mxm <> mnm
                 THEN 100.0 * (macd - mnm) / (mxm - mnm)
                 ELSE 50.0 END AS k1
  FROM e3s
  WINDOW wc AS (PARTITION BY symbol ORDER BY time_idx
                ROWS UNBOUNDED PRECEDING)
),
f2 AS (
  SELECT * EXCLUDE (mpfx, e1pfx, dxpfx, ts1pfx, ta1pfx, mehpfx),
         {e('mpfx', '2.0/10.0')} AS macd_signal,
         {e('e1pfx', '2.0/16.0')} AS te2,
         {e('dxpfx', '1.0/14.0')} AS adx14,
         {e('ts1pfx', '2.0/14.0')} AS tse2,
         {e('ta1pfx', '2.0/14.0')} AS tae2,
         {e('mehpfx', '2.0/10.0')} AS mehh,
         list(k1) OVER wc AS k1pfx
  FROM l2
  WINDOW wc AS (PARTITION BY symbol ORDER BY time_idx
                ROWS UNBOUNDED PRECEDING)
),
l3 AS (
  SELECT *, list(te2) OVER wc AS e2pfx,
         CASE WHEN mehh <> 0.0 THEN meh / mehh ELSE 0.0 END AS mratio,
         {e('k1pfx', '0.5')} AS d1
  FROM f2
  WINDOW wc AS (PARTITION BY symbol ORDER BY time_idx
                ROWS UNBOUNDED PRECEDING)
),
f3 AS (
  SELECT * EXCLUDE (e2pfx), {e('e2pfx', '2.0/16.0')} AS te3,
         {_sql_fold_sum('list(mratio) OVER f25')} AS mass_idx,
         min(d1) OVER f10d AS mnd, max(d1) OVER f10d AS mxd
  FROM l3
  WINDOW f25 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW),
         f10d AS (PARTITION BY symbol ORDER BY time_idx
                  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
),
fin AS (
  SELECT *, lag(te3) OVER (PARTITION BY symbol ORDER BY time_idx) AS pe3,
         CASE WHEN mxd <> mnd
              THEN 100.0 * (d1 - mnd) / (mxd - mnd)
              ELSE 50.0 END AS k2
  FROM f3
),
fin2 AS (
  SELECT *, list(k2) OVER wc AS k2pfx
  FROM fin
  WINDOW wc AS (PARTITION BY symbol ORDER BY time_idx
                ROWS UNBOUNDED PRECEDING)
)
SELECT symbol, time_idx, ema12, ema26, macd, macd_signal,
       macd - macd_signal AS macd_hist,
       rsinow AS rsi14,
       atr14,
       CASE WHEN pe3 IS NOT NULL AND pe3 <> 0.0
            THEN 100.0 * (te3 - pe3) / pe3 END AS trix15,
       CASE WHEN ema26 <> 0.0
            THEN 100.0 * (ema12 - ema26) / ema26 END AS ppo,
       ekel AS kelt_mid, ekel + 2.0 * ekatr AS kelt_upper,
       ekel - 2.0 * ekatr AS kelt_lower,
       adx14, di_pos14, di_neg14, force13,
       CASE WHEN tae2 <> 0.0 THEN 100.0 * tse2 / tae2 END AS tsi,
       CASE WHEN ev26 <> 0.0
            THEN 100.0 * (ev12 - ev26) / ev26 END AS pvo,
       mass_idx, kama, nvi,
       CASE WHEN rn >= 14 AND mx14 <> mn14
            THEN (rsinow - mn14) / (mx14 - mn14) END AS stoch_rsi,
       psr.sar AS psar,
       CASE WHEN psr.up THEN 1.0 ELSE -1.0 END AS psar_dir,
       {e('k2pfx', '0.5')} AS stc
FROM fin2 JOIN (
  -- WITH RECURSIVE scoped to a derived table: in DuckDB v1.0 a
  -- top-level WITH RECURSIVE makes every CTE's named-WINDOW clause
  -- share one namespace, colliding the per-stage `wc` definitions
  WITH RECURSIVE {psar_cte}
  SELECT symbol, time_idx, sar, up FROM psr
) psr USING (symbol, time_idx)"""
    return _sql_r6_wrap(
        body,
        ["symbol", "time_idx"],
        ["ema12", "ema26", "macd", "macd_signal", "macd_hist", "rsi14",
         "atr14", "trix15", "ppo", "kelt_mid", "kelt_upper", "kelt_lower",
         "adx14", "di_pos14", "di_neg14", "force13",
         "tsi", "pvo", "mass_idx", "kama", "nvi", "stoch_rsi",
         "psar", "psar_dir", "stc"],
    )


def _sql_fold_sum(lst: str) -> str:
    """Sequential left fold over a window-frame list — matches Spark's
    no-retraction sliding-frame recompute bitwise."""
    return f"list_reduce(list_prepend(0.0, {lst}), (a, x) -> a + x)"


def _sql_indicators3() -> str:
    fs = _sql_fold_sum
    body = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED_OHLC},
pre AS (
  SELECT symbol, time_idx, close, high, low, volume,
         row_number() OVER wo AS rn,
         greatest(high - low, abs(high - lag(close) OVER wo),
                  abs(low - lag(close) OVER wo)) AS tr3,
         coalesce(abs(high - lag(low) OVER wo), 0.0) AS vp,
         coalesce(abs(low - lag(high) OVER wo), 0.0) AS vn,
         CASE WHEN high <> low
              THEN ((close - low) - (high - close)) / (high - low) * volume
              ELSE 0.0 END AS mfv,
         coalesce(((high + low) / 2.0
                   - (lag(high) OVER wo + lag(low) OVER wo) / 2.0)
                  * (high - low) / nullif(volume, 0.0), 0.0) AS emv,
         close - least(low, lag(close) OVER wo) AS bp,
         greatest(high, lag(close) OVER wo)
           - least(low, lag(close) OVER wo) AS truo,
         coalesce(100.0 * (close / nullif(lag(close, 10) OVER wo, 0.0) - 1.0),
                  0.0) AS r10,
         coalesce(100.0 * (close / nullif(lag(close, 15) OVER wo, 0.0) - 1.0),
                  0.0) AS r15,
         coalesce(100.0 * (close / nullif(lag(close, 20) OVER wo, 0.0) - 1.0),
                  0.0) AS r20,
         coalesce(100.0 * (close / nullif(lag(close, 30) OVER wo, 0.0) - 1.0),
                  0.0) AS r30,
         lag(close, 11) OVER wo AS c11,
         lead(close, 26) OVER wo AS ichi_lagging,
         (high + low) / 2.0 AS midp,
         coalesce((close - lag(close) OVER wo)
                  / nullif(lag(close) OVER wo, 0.0) * volume, 0.0) AS vr,
         (9.0 * close
          + 8.0 * lag(close, 1) OVER wo
          + 7.0 * lag(close, 2) OVER wo
          + 6.0 * lag(close, 3) OVER wo
          + 5.0 * lag(close, 4) OVER wo
          + 4.0 * lag(close, 5) OVER wo
          + 3.0 * lag(close, 6) OVER wo
          + 2.0 * lag(close, 7) OVER wo
          + 1.0 * lag(close, 8) OVER wo) / 45.0 AS wma9raw
  FROM filled
  WINDOW wo AS (PARTITION BY symbol ORDER BY time_idx)
),
fr AS (
  SELECT symbol, time_idx, rn, volume, ichi_lagging, c11, close, wma9raw,
         list(high) OVER a25 AS hl25, list(low) OVER a25 AS ll25,
         {fs('list(vp) OVER f14')} AS vp14,
         {fs('list(vn) OVER f14')} AS vn14,
         {fs('list(tr3) OVER f14')} AS tr14,
         {fs('list(mfv) OVER f20')} AS mfv20,
         {fs('list(volume) OVER f20')} AS vol20,
         {fs('list(mfv) OVER cum')} AS adi,
         {fs('list(emv) OVER f14')} AS emv14,
         {fs('list(bp) OVER f7')} AS bp7, {fs('list(truo) OVER f7')} AS tr7,
         {fs('list(bp) OVER f14')} AS bp14,
         {fs('list(truo) OVER f14')} AS truo14,
         {fs('list(bp) OVER f28')} AS bp28,
         {fs('list(truo) OVER f28')} AS truo28,
         {fs('list(close) OVER f20')} AS csum20,
         {fs('list(r10) OVER f10')} AS r10s,
         {fs('list(r15) OVER f10')} AS r15s,
         {fs('list(r20) OVER f10')} AS r20s,
         {fs('list(r30) OVER f15')} AS r30s,
         (max(high) OVER f9 + min(low) OVER f9) / 2.0 / 2.0
           + (max(high) OVER f26 + min(low) OVER f26) / 2.0 / 2.0 AS span_a_raw,
         (max(high) OVER f52 + min(low) OVER f52) / 2.0 AS span_b_raw,
         {fs('list(midp) OVER f5')} AS ao5,
         {fs('list(midp) OVER f34')} AS ao34,
         {fs('list(vr) OVER cum')} AS vpt,
         100.0 * (close / nullif(first_value(close) OVER cum, 0.0) - 1.0)
           AS cret,
         max(close) OVER f14 AS mx14
  FROM pre
  WINDOW a25 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW),
         f5 AS (PARTITION BY symbol ORDER BY time_idx
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         f34 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 33 PRECEDING AND CURRENT ROW),
         f7 AS (PARTITION BY symbol ORDER BY time_idx
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
         f9 AS (PARTITION BY symbol ORDER BY time_idx
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
         f10 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
         f14 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         f15 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 14 PRECEDING AND CURRENT ROW),
         f20 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         f26 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
         f28 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 27 PRECEDING AND CURRENT ROW),
         f52 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 51 PRECEDING AND CURRENT ROW),
         cum AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS UNBOUNDED PRECEDING)
),
fr2 AS (
  SELECT *, coalesce(
           (100.0 * (close - mx14) / nullif(mx14, 0.0))
           * (100.0 * (close - mx14) / nullif(mx14, 0.0)), 0.0) AS uir2
  FROM fr
),
kk AS (
  SELECT symbol, time_idx, rn, ichi_lagging, adi, vpt, cret,
         CASE WHEN rn >= 34 THEN ao5 / 5.0 - ao34 / 34.0 END AS ao,
         CASE WHEN rn >= 9 THEN wma9raw END AS wma9,
         CASE WHEN rn >= 14
              THEN sqrt({fs('list(uir2) OVER f14k')} / 14.0) END AS ui14,
         CASE WHEN rn >= 25 THEN 100.0
           * (list_position(hl25, list_aggregate(hl25, 'max')) - 1) / 24.0
         END AS aroon_up,
         CASE WHEN rn >= 25 THEN 100.0
           * (list_position(ll25, list_aggregate(ll25, 'min')) - 1) / 24.0
         END AS aroon_down,
         CASE WHEN rn >= 15 THEN vp14 / nullif(tr14, 0.0) END AS vortex_pos,
         CASE WHEN rn >= 15 THEN vn14 / nullif(tr14, 0.0) END AS vortex_neg,
         CASE WHEN rn >= 20 THEN mfv20 / nullif(vol20, 0.0) END AS cmf20,
         CASE WHEN rn >= 15 THEN emv14 / 14.0 END AS eom14,
         CASE WHEN rn >= 28 THEN 100.0 * (4.0 * bp7 / nullif(tr7, 0.0)
              + 2.0 * bp14 / nullif(truo14, 0.0)
              + bp28 / nullif(truo28, 0.0)) / 7.0 END AS uo,
         CASE WHEN rn >= 20 THEN c11 - csum20 / 20.0 END AS dpo20,
         CASE WHEN rn >= 45 THEN 1.0 * r10s / 10.0 + 2.0 * r15s / 10.0
              + 3.0 * r20s / 10.0 + 4.0 * r30s / 15.0 END AS kst,
         CASE WHEN rn >= 52 THEN lag(span_a_raw, 26) OVER wo END AS span_a,
         CASE WHEN rn >= 78 THEN lag(span_b_raw, 26) OVER wo END AS span_b
  FROM fr2
  WINDOW wo AS (PARTITION BY symbol ORDER BY time_idx),
         f14k AS (PARTITION BY symbol ORDER BY time_idx
                  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
),
k2 AS (
  SELECT *, CASE WHEN rn >= 53 THEN
              {fs('list(kst) OVER k9')} / 9.0 END AS kst_sig
  FROM kk
  WINDOW k9 AS (PARTITION BY symbol ORDER BY time_idx
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
)
SELECT symbol, time_idx, aroon_up, aroon_down, vortex_pos, vortex_neg,
       cmf20, adi, eom14, uo, dpo20, kst, kst_sig,
       span_a AS ichi_span_a, span_b AS ichi_span_b, ichi_lagging,
       ao, wma9, vpt, cret, ui14
FROM k2"""
    return _sql_r6_wrap(
        body,
        ["symbol", "time_idx"],
        ["aroon_up", "aroon_down", "vortex_pos", "vortex_neg", "cmf20",
         "adi", "eom14", "uo", "dpo20", "kst", "kst_sig",
         "ichi_span_a", "ichi_span_b", "ichi_lagging",
         "ao", "wma9", "vpt", "cret", "ui14"],
    )


def _sql_indicators4() -> str:
    fs = _sql_fold_sum
    body = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED_OHLC},
pre AS (
  SELECT symbol, time_idx, close, high, low, volume,
         row_number() OVER wo AS rn,
         lag(close) OVER wo AS prev,
         greatest(high - low, abs(high - lag(close) OVER wo),
                  abs(low - lag(close) OVER wo)) AS tr3,
         coalesce(abs(high - lag(low) OVER wo), 0.0) AS vp,
         coalesce(abs(low - lag(high) OVER wo), 0.0) AS vn,
         ((high + low) / 2.0
          - (lag(high) OVER wo + lag(low) OVER wo) / 2.0)
           * (high - low) / nullif(volume, 0.0) AS emraw
  FROM filled
  WINDOW wo AS (PARTITION BY symbol ORDER BY time_idx)
),
fr AS (
  SELECT symbol, time_idx, rn, close, prev, emraw,
         avg(close) OVER f20 AS mid,
         stddev_pop(close) OVER f20 AS sd,
         max(high) OVER f20 AS du, min(low) OVER f20 AS dl,
         list(high) OVER a25 AS hl25, list(low) OVER a25 AS ll25,
         {fs('list(vp) OVER f14')} AS vp14,
         {fs('list(vn) OVER f14')} AS vn14,
         {fs('list(tr3) OVER f14')} AS tr14
  FROM pre
  WINDOW f20 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         a25 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW),
         f14 AS (PARTITION BY symbol ORDER BY time_idx
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT symbol, time_idx,
  100.0 * (close / nullif(prev, 0.0) - 1.0) AS dr,
  CASE WHEN close > 0 AND prev > 0
       THEN 100.0 * ln(close / prev) END AS dlr,
  CASE WHEN rn >= 2 THEN emraw END AS em,
  CASE WHEN rn >= 20 THEN ((mid + 2 * sd) - (mid - 2 * sd))
       / nullif(mid, 0.0) * 100.0 END AS bb_width,
  CASE WHEN rn >= 20 THEN (close - (mid - 2 * sd))
       / nullif((mid + 2 * sd) - (mid - 2 * sd), 0.0) END AS bb_pband,
  CASE WHEN rn >= 20 THEN
       CASE WHEN close > mid + 2 * sd THEN 1.0 ELSE 0.0 END END AS bb_hi,
  CASE WHEN rn >= 20 THEN
       CASE WHEN close < mid - 2 * sd THEN 1.0 ELSE 0.0 END END AS bb_li,
  CASE WHEN rn >= 20 THEN (du - dl)
       / nullif((du + dl) / 2.0, 0.0) * 100.0 END AS don_width,
  CASE WHEN rn >= 20 THEN (close - dl)
       / nullif(du - dl, 0.0) END AS don_pband,
  CASE WHEN rn >= 25 THEN
       100.0 * (list_position(hl25, list_aggregate(hl25, 'max')) - 1) / 24.0
     - 100.0 * (list_position(ll25, list_aggregate(ll25, 'min')) - 1) / 24.0
  END AS aroon_ind,
  CASE WHEN rn >= 15 THEN vp14 / nullif(tr14, 0.0)
       - vn14 / nullif(tr14, 0.0) END AS vortex_diff
FROM fr"""
    return _sql_r6_wrap(
        body,
        ["symbol", "time_idx"],
        ["dr", "dlr", "em", "bb_width", "bb_pband", "bb_hi", "bb_li",
         "don_width", "don_pband", "aroon_ind", "vortex_diff"],
    )


def _sql_indicators5() -> str:
    e = _sql_ewm
    fs = _sql_fold_sum
    # Trimmed replica of the recursive-battery staged-fold chain — only
    # the stages the derived tail needs (ema12/26 -> ppo -> EMA9 fold,
    # ev12/26 -> pvo -> EMA9 fold, Keltner EMAs, RSI -> stoch_rsi ->
    # two 3-SMA count-guarded fold stages, shared PSAR recursive CTE).
    body = f"""WITH {SQL_SERIES}, {SQL_RES6H}, {SQL_FILLED_OHLC},
pre AS (
  SELECT symbol, time_idx, close, volume, high, low,
         row_number() OVER wo AS rn,
         lag(low) OVER wo AS pl1, lag(low, 2) OVER wo AS pl2,
         lag(high) OVER wo AS ph1, lag(high, 2) OVER wo AS ph2,
         greatest(high - low, abs(high - lag(close) OVER wo),
                  abs(low - lag(close) OVER wo)) AS tr,
         greatest(close - lag(close) OVER wo, 0.0) AS gain,
         greatest(-(close - lag(close) OVER wo), 0.0) AS loss
  FROM filled
  WINDOW wo AS (PARTITION BY symbol ORDER BY time_idx)
),
l1 AS (
  SELECT symbol, time_idx, rn, close,
         list(close) OVER wc AS cpfx, list(tr) OVER wc AS trpfx,
         list(gain) OVER wc AS gpfx, list(loss) OVER wc AS lpfx,
         list(volume) OVER wc AS vpfx
  FROM pre
  WINDOW wc AS (PARTITION BY symbol ORDER BY time_idx
                ROWS UNBOUNDED PRECEDING)
),
e1s AS (
  SELECT symbol, time_idx, rn, close,
         {e('cpfx', '2.0/13.0')} AS ema12, {e('cpfx', '2.0/27.0')} AS ema26,
         {e('cpfx', '2.0/21.0')} AS ekel, {e('trpfx', '1.0/10.0')} AS ekatr,
         {e('gpfx', '1.0/14.0')} AS ag, {e('lpfx', '1.0/14.0')} AS al,
         {e('vpfx', '2.0/13.0')} AS ev12, {e('vpfx', '2.0/27.0')} AS ev26
  FROM l1
),
e2s AS (
  SELECT *,
         CASE WHEN al = 0.0 THEN 100.0
              ELSE 100.0 - 100.0 / (1.0 + ag / al) END AS rsinow,
         CASE WHEN ema26 <> 0.0
              THEN 100.0 * (ema12 - ema26) / ema26 ELSE 0.0 END AS ppov,
         CASE WHEN ev26 <> 0.0
              THEN 100.0 * (ev12 - ev26) / ev26 ELSE 0.0 END AS pvov
  FROM e1s
),
e3s AS (
  SELECT *, min(rsinow) OVER f14s AS mn14, max(rsinow) OVER f14s AS mx14,
         list(ppov) OVER wc AS popfx, list(pvov) OVER wc AS pvpfx
  FROM e2s
  WINDOW f14s AS (PARTITION BY symbol ORDER BY time_idx
                  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         wc AS (PARTITION BY symbol ORDER BY time_idx
                ROWS UNBOUNDED PRECEDING)
),
e4s AS (
  SELECT * EXCLUDE (popfx, pvpfx),
         {e('popfx', '2.0/10.0')} AS ppo_signal,
         {e('pvpfx', '2.0/10.0')} AS pvo_signal,
         CASE WHEN rn >= 14 AND mx14 <> mn14
              THEN (rsinow - mn14) / (mx14 - mn14) END AS stoch_rsi
  FROM e3s
),
e5s AS (
  SELECT *, CASE WHEN count(stoch_rsi) OVER f3 = 3
                 THEN {fs('list(stoch_rsi) OVER f3')} / 3.0
            END AS stochrsi_k
  FROM e4s
  WINDOW f3 AS (PARTITION BY symbol ORDER BY time_idx
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
),
e6s AS (
  SELECT *, CASE WHEN count(stochrsi_k) OVER f3 = 3
                 THEN {fs('list(stochrsi_k) OVER f3')} / 3.0
            END AS stochrsi_d
  FROM e5s
  WINDOW f3 AS (PARTITION BY symbol ORDER BY time_idx
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
),
psj AS (
  SELECT e6s.*, psr.sar, psr.up,
         lag(psr.up) OVER (PARTITION BY symbol ORDER BY time_idx) AS pup
  FROM e6s JOIN (
    WITH RECURSIVE {_sql_psar_cte()}
    SELECT symbol, time_idx, sar, up FROM psr
  ) psr USING (symbol, time_idx)
)
SELECT symbol, time_idx,
  ppo_signal,
  CASE WHEN ema26 <> 0.0 THEN ppov - ppo_signal END AS ppo_hist,
  pvo_signal,
  CASE WHEN ev26 <> 0.0 THEN pvov - pvo_signal END AS pvo_hist,
  ((ekel + 2.0 * ekatr) - (ekel - 2.0 * ekatr))
    / nullif(ekel, 0.0) * 100.0 AS kc_width,
  (close - (ekel - 2.0 * ekatr))
    / nullif((ekel + 2.0 * ekatr) - (ekel - 2.0 * ekatr), 0.0) AS kc_pband,
  stochrsi_k, stochrsi_d,
  CASE WHEN up THEN sar END AS psar_up,
  CASE WHEN NOT up THEN sar END AS psar_down,
  CASE WHEN up AND NOT pup THEN 1.0 ELSE 0.0 END AS psar_up_ind,
  CASE WHEN (NOT up) AND pup THEN 1.0 ELSE 0.0 END AS psar_down_ind
FROM psj"""
    return _sql_r6_wrap(
        body,
        ["symbol", "time_idx"],
        ["ppo_signal", "ppo_hist", "pvo_signal", "pvo_hist",
         "kc_width", "kc_pband", "stochrsi_k", "stochrsi_d",
         "psar_up", "psar_down", "psar_up_ind", "psar_down_ind"],
    )


def _sql_numeric_profile_branch(c: str, first: bool = False) -> str:
    names = (
        ' AS "column", count({c}) AS n_nonnull, {m}, '
        "min({c}::DOUBLE) AS min_val, max({c}::DOUBLE) AS max_val"
        if first
        else ", count({c}), {m}, min({c}::DOUBLE), max({c}::DOUBLE)"
    )
    m = _sql_r6e(f"sum({c}::DECIMAL(28,10))::DOUBLE / count({c})", "mean")
    return f"SELECT '{c}'" + names.format(c=c, m=m) + " FROM events"


# --------------------------------------------------------------------------
# training-data pipeline: PII scrub, sharding, mixture sampling, packing
# --------------------------------------------------------------------------

N_DOC_SHARDS = 16
PACK_BUDGET = 256
PACK_SHARDS = 8
MIX_PPM = 1_000_000


# a small nation GROUP rather than the classic two: the synthetic data
# at sf0.001 has too few suppliers for any single ordered pair to
# produce rows, and a query whose toy-scale answer is empty can't be
# hash-verified meaningfully. Same Q7 shape (two independent nation
# dims, directed pairs) at every SF.
Q7_NATIONS = [f"NATION_{i}" for i in range(5)]


def _sql_q7_nations() -> str:
    return ", ".join(f"'{n}'" for n in Q7_NATIONS)


Q8_NATION, Q8_REGION, Q8_TYPE = "NATION_3", "EUROPE", "PROMO"


Q15_START, Q15_END = "1997-01-01 00:00:00", "1997-04-01 00:00:00"


Q17_BRAND = "Brand#1"


def _sql_minhash_est_error() -> str:
    from ..operators.dedup import MH_PERMS

    eq = (
        f"len(list_filter(range(1, {MH_PERMS} + 1),"
        f" i -> x.sig[i] = y.sig[i]))"
    )
    return f"""WITH {_SQL_MINHASH_CAND_CTES}
SELECT c.id_i, c.id_j,
       CAST({eq} AS INT) AS n_eq,
       CAST({eq} AS DOUBLE) / {float(MH_PERMS)} AS jac_est,
       {_sql_rne(_sql_jaccard('x.sh', 'y.sh'), 'jac_exact', 6)},
       {_sql_rne(f'abs(CAST({eq} AS DOUBLE) / {float(MH_PERMS)}'
                 f' - ({_sql_jaccard("x.sh", "y.sh")}))', 'abs_err', 6)}
FROM cand c
JOIN sigs x ON x.doc_id = c.id_i
JOIN sigs y ON y.doc_id = c.id_j"""


PQ_M, PQ_DSUB = 4, 16  # 4 subspaces x 16 dims over the 64-dim vectors


def _pq_codebook(emb: DataFrame) -> DataFrame:
    """Label-grouped sub-vector mean codebook (code, s, cvec) on the
    shared 1e-6 grid — the deterministic quantizer both PQ queries and
    both engines rebuild identically."""
    ex = emb.select("label", F.posexplode("v").alias("pos", "x"))
    per_dim = ex.groupBy(
        "label",
        (F.col("pos") / PQ_DSUB).cast("int").alias("s"),
        "pos",
    ).agg((F.floor(F.avg("x") * 1e6 + F.lit(0.5)) / 1e6 + F.lit(0.0)).alias("c"))
    return per_dim.groupBy(F.col("label").alias("code"), "s").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda z: z["c"],
        ).alias("cvec")
    )


def _pq_assignments(emb: DataFrame, cb: DataFrame) -> DataFrame:
    """Per (vector, subspace) best code: broadcast codebook cross join
    collapsed map-side by min(struct) — returns (vec_id, s, m) with
    m = (err2, code)."""
    cand = emb.crossJoin(F.broadcast(cb)).withColumn(
        "err2",
        dist_l2sq(
            F.slice("v", F.col("s") * PQ_DSUB + 1, PQ_DSUB), F.col("cvec")
        ),
    )
    return cand.groupBy("vec_id", "s").agg(
        F.min(F.struct("err2", "code")).alias("m")
    )


Q12_LATE_DAYS = 60


Q19_ARMS = [
    ("Brand#1", 1, 15, 1, 11),
    ("Brand#2", 10, 30, 10, 20),
    ("Brand#3", 20, 50, 20, 30),
]


RANGE_WIN_S = 6 * 3600


DQ_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


SEARCH_TERMS = ("spark", "customer")


Q21_LATE_DAYS = 60


CUSUM_K_SIGMA = 0.5
CUSUM_H_SIGMA = 4.0


PATH_TOP_N = 15


def _sql_minhash_pr() -> str:
    return f"""
WITH lsh AS ({SQL_DOC_MINHASH}),
exact AS ({SQL_DOC_NGRAM}),
j AS (
  SELECT coalesce(l.id_i, e.id_i) AS id_i,
         coalesce(l.id_j, e.id_j) AS id_j,
         l.id_i IS NOT NULL AS in_lsh,
         e.id_i IS NOT NULL AS in_exact
  FROM lsh l FULL JOIN exact e
    ON l.id_i = e.id_i AND l.id_j = e.id_j)
SELECT CAST(count(*) FILTER (in_lsh AND in_exact) AS BIGINT) AS tp,
       CAST(count(*) FILTER (in_lsh AND NOT in_exact) AS BIGINT) AS fp,
       CAST(count(*) FILTER (NOT in_lsh AND in_exact) AS BIGINT) AS fn,
       CASE WHEN count(*) FILTER (in_lsh) > 0 THEN
         count(*) FILTER (in_lsh AND in_exact)
           / CAST(count(*) FILTER (in_lsh) AS DOUBLE) END AS precision,
       CASE WHEN count(*) FILTER (in_exact) > 0 THEN
         count(*) FILTER (in_lsh AND in_exact)
           / CAST(count(*) FILTER (in_exact) AS DOUBLE) END AS recall
FROM j"""


MMR_LAMBDA = 0.7
MMR_K = 5
MMR_CAND_N = 30  # ANN-fed candidate pool per query
MMR_NPROBE = 2  # IVF lists probed per query for the candidate pool


RFM_BUCKETS = 5


KALMAN_Q_FRAC = 0.05
KALMAN_R_FRAC = 0.5


TEXTRANK_TOP_N = 20


VAR_P = 0.05


ACF_MAX_LAG = 8


PAIRS_Z_ENTRY = 2.0


DROPOUT_KEEP_MOD = 10  # keep 9/10 tokens
SPAN_LEN = 8
SPAN_MASK_MOD = 5  # mask 1/5 spans


CMS_STREAM_TOP = 10


ZIPF_TOP_N = 100


SEAS_M = 4  # 6h buckets -> daily season


def _sql_join_size_est() -> str:
    from ..operators.dedup import MH_PRIME as P
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH

    a, b = minhash_coeffs(CMS_DEPTH)
    coeff_rows = ", ".join(
        f"({d}, {a[d]}, {b[d]})" for d in range(CMS_DEPTH)
    )
    return f"""
WITH h AS (
  SELECT {sql_hash60('CAST(user_id AS VARCHAR)')} % {P} AS h FROM events),
coeff(d, a, b) AS (VALUES {coeff_rows}),
cells AS (
  SELECT c.d, ((h.h * c.a + c.b) % {P}) % {CMS_WIDTH} AS cell,
         count(*) AS cnt
  FROM h CROSS JOIN coeff c GROUP BY 1, 2),
est AS (
  SELECT min(ip) AS est_size FROM (
    SELECT d, sum(cnt * cnt) AS ip FROM cells GROUP BY 1)),
exact AS (
  SELECT sum(c * c) AS exact_size FROM (
    SELECT count(*) AS c FROM events GROUP BY user_id))
SELECT CAST(exact_size AS BIGINT) AS exact_size,
       CAST(est_size AS BIGINT) AS est_size,
       CAST(est_size AS DOUBLE) / CAST(exact_size AS DOUBLE)
         AS overestimate
FROM exact CROSS JOIN est"""


PSI_SPLIT_TS = "2024-01-16 00:00:00"


def _sql_psi_drift() -> str:
    snap = lambda e: f"floor(({e}) * 1000000.0 + 0.5) / 1000000.0"  # noqa: E731
    term = snap(
        "((n2 + 1) / (t2 + n_bins) - (n1 + 1) / (t1 + n_bins))"
        " * ln(((n2 + 1) / (t2 + n_bins)) / ((n1 + 1) / (t1 + n_bins)))"
    )
    return f"""
WITH binned AS (
  SELECT event_type, CAST(floor(value / 10) AS INT) AS vbucket,
         CASE WHEN ts < TIMESTAMP '{PSI_SPLIT_TS}' THEN 1 ELSE 2 END AS half
  FROM events),
per_bin AS (
  SELECT event_type, vbucket,
         CAST(count(*) FILTER (half = 1) AS BIGINT) AS n1,
         CAST(count(*) FILTER (half = 2) AS BIGINT) AS n2
  FROM binned GROUP BY 1, 2),
tot AS (
  SELECT event_type, sum(n1) AS t1, sum(n2) AS t2,
         count(*) AS n_bins
  FROM per_bin GROUP BY 1)
SELECT p.event_type,
       CAST(max(t1) AS BIGINT) AS n_first_half,
       CAST(max(t2) AS BIGINT) AS n_second_half,
       {_sql_rne(
           'CAST(sum(CAST(' + term + ' AS DECIMAL(18,6))) AS DOUBLE)',
           'psi')}
FROM per_bin p JOIN tot USING (event_type)
GROUP BY 1"""


PQ_ADC_K = 5


def _sql_pq_adc() -> str:
    sl = f"list_slice(e.v, cb.s * {PQ_DSUB} + 1, cb.s * {PQ_DSUB} + {PQ_DSUB})"
    err2 = (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"list_zip({sl}, cb.cvec), p -> (p[1]-p[2])*(p[1]-p[2]))),"
        f" (x, y) -> x + y)"
    )
    qsl = f"list_slice(q.qv, cb.s * {PQ_DSUB} + 1, cb.s * {PQ_DSUB} + {PQ_DSUB})"
    qd2 = (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"list_zip({qsl}, cb.cvec), p -> (p[1]-p[2])*(p[1]-p[2]))),"
        f" (x, y) -> x + y)"
    )
    exact = (
        "list_reduce(list_prepend(0.0, list_transform("
        "list_zip(qq.qv, dv.v), p -> (p[1]-p[2])*(p[1]-p[2]))),"
        " (x, y) -> x + y)"
    )
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
cb_dims AS (
  SELECT label, CAST((i - 1) // {PQ_DSUB} AS INT) AS s, i AS pos,
         floor(avg(v[i]) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS c
  FROM emb, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY 1, 2, 3),
cb AS (SELECT label AS code, s, list(c ORDER BY pos) AS cvec
       FROM cb_dims GROUP BY 1, 2),
cand AS (
  SELECT e.vec_id, cb.s, cb.code, {err2} AS err2
  FROM emb e CROSS JOIN cb),
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s
      ORDER BY err2 ASC, code ASC) AS rn
    FROM cand)
  WHERE rn = 1),
q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 100 = 0),
lut AS (
  SELECT q.q_id, cb.s, cb.code, {qd2} AS d2
  FROM q CROSS JOIN cb),
scored AS (
  SELECT l.q_id, c.vec_id,
         list_reduce(list_prepend(0.0, list(l.d2 ORDER BY c.s)),
                     (x, y) -> x + y) AS adc2
  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
  WHERE l.q_id <> c.vec_id
  GROUP BY 1, 2),
top AS (
  SELECT q_id, vec_id, adc2,
         row_number() OVER (PARTITION BY q_id
           ORDER BY adc2 ASC, vec_id ASC) AS rank
  FROM scored QUALIFY rank <= {PQ_ADC_K})
SELECT t.q_id, t.rank, t.vec_id,
       {_sql_rne('sqrt(t.adc2)', 'adc_dist')},
       {_sql_rne('sqrt(' + exact + ')', 'l2_dist')}
FROM top t
JOIN (SELECT vec_id AS q_id, v AS qv FROM emb) qq ON t.q_id = qq.q_id
JOIN (SELECT vec_id, v FROM emb) dv ON t.vec_id = dv.vec_id"""


PARTITION_MIN_ROWS = 100


PHRASE = ("table", "hash")


CONTAIN_TAU = 0.5


def q_src_formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-format breadth with a LOSSLESS-content proof: the events
    table written to CSV and JSONL and read back through the engine's
    text readers (explicit schema — no inference scan), each replica
    checksummed with the same canonical XOR signature as
    ``events_table_checksum``. A format that corrupts ONE value (CSV
    quoting of the JSON props column, timestamp precision, integer
    width) breaks its row, and XOR is order/partitioning-independent,
    so the three signatures must be byte-equal. The oracle computes
    the signature once from the parquet truth and expects it under
    every format label — text readers that silently drop or mangle
    rows cannot pass. Timestamps ride as integer micros (the text
    formats carry no TIMESTAMP(NANOS) type)."""
    import os
    import shutil
    import tempfile

    require_utc(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        "props",
    )
    work = tempfile.mkdtemp(prefix="bdspf-fmt-")
    try:
        csvp = os.path.join(work, "csv")
        jsonp = os.path.join(work, "jsonl")
        (
            ev.write.option("header", True)
            .option("escape", '"')
            .csv(csvp)
        )
        ev.write.json(jsonp)
        schema = ev.schema
        frames = {
            "parquet": ev,
            "csv": (
                spark.read.schema(schema)
                .option("header", True)
                .option("escape", '"')
                .csv(csvp)
            ),
            "jsonl": spark.read.schema(schema).json(jsonp),
        }
        canon = F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.col("ts_us").cast("string"),
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
            F.col("props"),
        )
        parts = [
            df.select(hash60(canon).alias("h"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.expr("bit_xor(h)").alias("xor_sig"),
            )
            .select(F.lit(fmt).alias("format"), "n_rows", "xor_sig")
            for fmt, df in frames.items()
        ]
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _sql_src_formats_roundtrip() -> str:
    h = sql_hash60(
        "concat_ws('|', CAST(event_id AS VARCHAR), "
        "CAST(epoch_us(ts::TIMESTAMP) AS VARCHAR), "
        "CAST(user_id AS VARCHAR), event_type, "
        "CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR), "
        "props)"
    )
    return f"""
WITH sig AS (
  SELECT count(*) AS n_rows, bit_xor({h}) AS xor_sig FROM events)
SELECT f.format, s.n_rows, s.xor_sig
FROM sig s CROSS JOIN (
  VALUES ('parquet'), ('csv'), ('jsonl')) f(format)"""


SKEW_TOP_K = 10


WINSOR_LO = 0.01
WINSOR_HI = 0.99


HOLT_ALPHA = 0.3
HOLT_BETA = 0.1


BFS_MAX_HOPS = 6


DECILE_PS = [i / 10 for i in range(1, 10)]


ASSOC_MIN_USERS = 5


FC_SEASON = 4  # 6h buckets -> daily seasonality
FC_TRAIN_FRAC = 0.8


TRIANGLE_TOP_EDGES = 300

# df-cap on the bipartite projection: parts with more than this many
# distinct suppliers are dropped before the supplier-pair self-join —
# the same stopword discipline the n-gram inverted index applies
# (operators/dedup.py). A hub part with degree d yields d²/2 pairs
# from ONE join key; the cap bounds that to CAP²/2 per key at any
# scale. At the test SFs the max degree is 52 (sf0.1), so a 256 cap
# excludes nothing and the oracle hashes are insensitive to it.
HUB_PART_MAX_DEGREE = 256


def _cap_part_degree(ps: DataFrame, cap: int = HUB_PART_MAX_DEGREE) -> DataFrame:
    """Drop hub parts (degree > cap) from the (l_partkey, l_suppkey)
    projection. One window count over l_partkey — the same shuffle key
    the downstream pair self-join uses, so the exchange is reused and
    the cap costs no extra shuffle."""
    w = Window.partitionBy("l_partkey")
    return (
        ps.withColumn("part_deg", F.count(F.lit(1)).over(w))
        .filter(F.col("part_deg") <= cap)
        .drop("part_deg")
    )


# oracle twin of _cap_part_degree — splice after a `ps` CTE
SQL_PS_CAPPED = f"""
  SELECT l_partkey, l_suppkey FROM (
    SELECT *, count(*) OVER (PARTITION BY l_partkey) AS part_deg FROM ps)
  WHERE part_deg <= {HUB_PART_MAX_DEGREE}"""


CORR_MATRIX_TOP_K = 8


ATTRIB_TOUCHES = ("view", "click")


K_ANON_THRESHOLD = 10


WSAMPLE_K = 50


RV_BUCKETS_PER_DAY = 4  # 6h grid -> 4 buckets/day


CYCLE_PERIODS = (4, 28, 120)  # 6h bars: daily, weekly, ~monthly


def _cycle_angle_rows() -> list[tuple[int, int, float, float]]:
    """(period, phase, cos, sin) literal table for the cycle-power
    scan — trig evaluated ONCE in python and pasted into BOTH engines
    (JVM Math.cos and DuckDB's libm are not bitwise-contracted to
    agree, so neither engine's trig is load-bearing)."""
    rows = []
    for p in CYCLE_PERIODS:
        for r in range(p):
            th = 2.0 * math.pi * r / p
            rows.append((p, r, math.cos(th), math.sin(th)))
    return rows


def _fracdiff_weights(d: float = 0.4, k: int = 20) -> list[float]:
    """Truncated fractional-differencing weights w_0=1,
    w_j = -w_{j-1}(d-j+1)/j (Hosking; López de Prado ch.5). Computed
    once in python and pasted as the SAME double literals into the
    Spark expression and the SQL oracle — no cross-engine recurrence
    is load-bearing."""
    w = [1.0]
    for j in range(1, k):
        w.append(-w[-1] * (d - j + 1) / j)
    return w


MRL_DIM = 16


DSIR_TARGET_SOURCE = "src0"



EWMA_VOL_LAMBDA = 0.94  # RiskMetrics decay


OOD_QUANTILE = 0.95



# Gopher/C4-shaped rule thresholds (tuned so the synthetic corpus is
# non-degenerate: some docs fail, most pass)
QF_MIN_TOKENS, QF_MAX_TOKENS = 20, 100_000
QF_MIN_MTL, QF_MAX_MTL = 3.0, 10.0
QF_MAX_PUNCT = 0.10
QF_MIN_STOP = 0.01
QF_MAX_TOP_SHARE = 0.20



PR_DAMPING = 0.85
PR_ITERS = 3



IVFPQ_NPROBE = 2



HURST_SIZES = [8, 16, 32, 64]


PINBALL_QS = [0.1, 0.5, 0.9]



BT_FOLDS = 3
BT_BASE_FRAC = 0.6
BT_STEP_FRAC = 0.1


BOT_MIN_GAPS = 20
BOT_REGULARITY_TAU = 0.05


# Poisson(1) CDF literals for the deterministic bootstrap weights —
# the SAME literals are pasted into the Spark CASE chain and the SQL
# oracle, so no cross-engine exp/factorial computation is load-bearing
_BOOT_POIS_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712,
)
BOOT_B = 32



# --------------------------------------------------------------------------
# round-8 additions: binary-quantization ANN + winnowing fingerprints
# --------------------------------------------------------------------------

BQ_RERANK = 32
BQ_RADIUS = 31  # dim/2 - 1: drops the unrelated half of a random corpus


def _sql_bq_code(v: str) -> str:
    """The packed sign code as a DuckDB expression over a DOUBLE[]
    column — bit 63 is the BIGINT sign bit, which DuckDB's checked
    ``<<`` refuses to produce, so that one term is the literal."""
    terms = []
    for d in range(64):
        lit = (
            "(-9223372036854775808)::BIGINT"
            if d == 63
            else f"(1::BIGINT << {d})"
        )
        terms.append(f"(CASE WHEN {v}[{d + 1}] > 0 THEN {lit} ELSE 0::BIGINT END)")
    return "(" + " | ".join(terms) + ")"


def _sql_bq_hamming() -> str:
    cos = (
        f"{_sql_dot('e.v', 'q.qv')} / "
        f"({_sql_norm('e.v')} * {_sql_norm('q.qv')})"
    )
    body = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id, v, {_sql_bq_code('v')} AS code FROM emb),
q AS (SELECT vec_id AS q_id, v AS qv, code AS qcode FROM c
      WHERE vec_id % 100 = 0),
h AS (
  SELECT q.q_id, e.vec_id AS id,
         CAST(bit_count(xor(e.code, q.qcode)) AS BIGINT) AS hamming
  FROM c e CROSS JOIN q
  WHERE e.vec_id <> q.q_id
),
topr AS (
  SELECT q_id, id, hamming,
         row_number() OVER (
           PARTITION BY q_id ORDER BY hamming ASC, id ASC) AS rr
  FROM h WHERE hamming <= {BQ_RADIUS}
),
rer AS (
  SELECT t.q_id, t.id, t.hamming, {cos} AS cos
  FROM topr t
  JOIN c e ON e.vec_id = t.id
  JOIN q ON q.q_id = t.q_id
  WHERE t.rr <= {BQ_RERANK}
),
ranked AS (
  SELECT q_id, id, hamming, cos,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY cos DESC, id ASC) AS INT) AS rank
  FROM rer
)
SELECT q_id, id, rank, hamming, cos FROM ranked WHERE rank <= {KNN_K}"""
    return _sql_r6_wrap(body, ["q_id", "id", "rank", "hamming"], ["cos"])

WINNOW_TAU = 0.15


def _sql_winnow_pairs() -> str:
    from ..operators.dedup import WINNOW_DF_CAP, WINNOW_K, WINNOW_W

    k, w, cap = WINNOW_K, WINNOW_W, WINNOW_DF_CAP
    gram_hash = (
        f"CAST('0x' || substr(md5(substr(nrm, i, {k})), 1, 15) AS BIGINT)"
    )
    return f"""
WITH nd AS (
  SELECT doc_id AS id,
         regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nrm
  FROM documents),
g AS (
  SELECT id,
         list_transform(range(1, greatest(len(nrm) - {k - 1}, 0) + 1),
                        i -> {gram_hash}) AS grams
  FROM nd),
f AS (
  SELECT id, CASE WHEN len(grams) >= 1 THEN
    list_distinct(list_transform(
      range(1, greatest(len(grams) - {w - 1}, 1) + 1),
      j -> list_min(grams[j : j + least({w}, len(grams)) - 1])))
    ELSE []::BIGINT[] END AS fps
  FROM g),
e AS (SELECT id, len(fps) AS cnt, unnest(fps) AS h FROM f),
b AS (SELECT h FROM e GROUP BY h HAVING count(*) BETWEEN 2 AND {cap}),
pe AS (SELECT e.id, e.cnt, e.h FROM e JOIN b USING (h)),
pairs AS (
  SELECT a.id AS id_i, a.cnt AS cnt_i, b2.id AS id_j, b2.cnt AS cnt_j,
         count(*) AS shared
  FROM pe a JOIN pe b2 ON a.h = b2.h AND a.id < b2.id
  GROUP BY 1, 2, 3, 4)
SELECT id_i, id_j, shared,
       shared::DOUBLE / (cnt_i + cnt_j - shared) AS winnow_jac
FROM pairs
WHERE shared::DOUBLE / (cnt_i + cnt_j - shared) >= {WINNOW_TAU}"""


# --------------------------------------------------------------------------
# round-10 additions
# --------------------------------------------------------------------------

GARCH_OMEGA = 1e-6
GARCH_ALPHA = 0.05
GARCH_BETA = 0.90


CONFORMAL_ALPHA = 0.1  # 90% nominal coverage
CONFORMAL_CAL_FRAC = 0.7


AA_DF_MAX = 16  # co-attendance item df cap (hub cut), shared graph family


def _coattendance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared df-capped user–item co-attendance frame for the graph
    family (adamic_adar / lpa_communities / jaccard_links): item =
    (event_type, day, ⌊value⌋) — fine enough that item degree stays
    bounded as the corpus grows, the property any blocking key needs
    at scale. Hub items (df > AA_DF_MAX) are cut BEFORE any pair
    expansion (work ∝ Σ df² stays bounded) and singleton items
    (df < 2) produce no pairs. Returns (user_id, item, df). The
    oracle twin is ``SQL_COATTEND`` — one definition per engine, so
    a blocking-key change (cap, NULL-concat convention) edits exactly
    two sites (r10 advice)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            # F.concat (not concat_ws): null event_type/ts/value must
            # yield a NULL item exactly like SQL ||, so both engines
            # drop the same rows at the item-equality join
            F.concat(
                F.col("event_type"),
                F.lit(":"),
                F.to_date("ts").cast("string"),
                F.lit(":"),
                F.floor("value").cast("string"),
            ).alias("item"),
        )
        .distinct()
    )
    return ev.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("item"))
    ).filter((F.col("df") >= 2) & (F.col("df") <= AA_DF_MAX))


SQL_COATTEND = f"""ev AS (
  SELECT DISTINCT user_id,
         event_type || ':' || CAST(ts::DATE AS VARCHAR) || ':'
           || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS item
  FROM events),
dca AS (
  SELECT user_id, item, df FROM (
    SELECT user_id, item, count(*) OVER (PARTITION BY item) AS df
    FROM ev)
  WHERE df BETWEEN 2 AND {AA_DF_MAX})"""


BIGRAM_LM_K = 0.5  # add-k smoothing


THETA_ALPHA = 0.2  # fixed SES smoothing for the theta level


AHASH_MAX_DIST = 7  # pigeonhole-exhaustive for 8 bands


LPA_ROUNDS = 3


RAKE_MAX_PHRASE = 3
RAKE_TOPK = 25


CTFIDF_TOPK = 5


RQ_ORTH_DIMS = 4  # level-2 codebook: one centroid per sign-orthant


VAR_BT_P = 0.05  # VaR tail probability


# ---------------------------------------------------------------- round 11

EMA_SCAN_ALPHA = 0.5  # dyadic: c = 1−α is a power of two → bitwise scan
# 32 (not the operator's 256 default): the 6h fixture grid is ~116
# rows/symbol at EVERY sf, so a 256-row segment would leave the
# recursive segment-composition path — the point of the operator —
# driver-unexercised (the ahash vacuous-fixture lesson); 32 gives a
# 4-segment chain incl. a partial tail at all scale factors
EMA_SCAN_SEG = 32


JACCARD_TOPK = 25


VR_Q = 4  # variance-ratio horizon


# --------------------------------------------------------------------------
# round-11 additions, second batch
# --------------------------------------------------------------------------

TRI_TOPK = 25  # triangle-census top-k


PE_MIN_N = 10  # permutation-entropy minimum triple count


# dyadic GARCH-scan parameters: β and α are powers of two (exact
# exponent shifts), ω = 2^-10 — so every scan term is a single
# identical IEEE expression in both engines and the segment-composed
# scan is cross-engine BITWISE (the ts_ema_scan discipline)
GARCH_SCAN_OMEGA = 0.0009765625  # 2^-10
GARCH_SCAN_ALPHA = 0.25
GARCH_SCAN_BETA = 0.5
GARCH_SCAN_SEG = 32


COINT_TOP_PAIRS = 5  # Engle-Granger: pairs ranked by |level corr|


IVF_CURVE_NPROBES = (1, 2, 4)  # recall-vs-cost sweep


VOCAB_COVERAGE_KS = (100, 1000, 10000)


HAAR_LEVELS = (1, 2, 3)  # block sizes 2, 4, 8 grid steps


JB_RET_CAP = 100.0  # |return| above 10000% per bucket = data error, cut
JB_MIN_N = 8


def _rel_returns(
    spark: SparkSession, sf_dir: str, scale: float, with_idx: bool = False
):
    """Shared snapped-relative-return frame for the moment-card family
    (jarque_bera / risk_ratios): r_t = (qc_t − qc_{t−1}) / qc_{t−1} on
    the 1e-6-snapped ffilled close — the division is ONE deterministic
    IEEE double op on exact integers, then the return snaps to the
    1/``scale`` grid so every downstream moment rides exact DECIMAL.
    Buckets with a non-positive previous close drop (the raw feed DOES
    contain zero closes at sf0.1 — the Amihud lesson), and |r| ≥
    JB_RET_CAP rows are cut identically in both engines so 4th-power
    DECIMAL sums stay far inside 38 digits."""
    df = _filled(spark, sf_dir).select("symbol", "time_idx", "close")
    w = Window.partitionBy("symbol").orderBy("time_idx")
    d = df.withColumn(
        "qc",
        F.floor(F.col("close") * 1e6 + F.lit(0.5)).cast("decimal(38,0)"),
    )
    d = d.withColumn("l1", F.lag("qc", 1).over(w)).filter(
        F.col("l1").isNotNull() & (F.col("l1") > 0)
    )
    r = (F.col("qc") - F.col("l1")).cast("double") / F.col("l1").cast(
        "double"
    )
    out = d.withColumn(
        "rq",
        F.floor(r * F.lit(scale) + F.lit(0.5)).cast("decimal(38,0)"),
    ).filter(F.abs(r) < F.lit(JB_RET_CAP))
    cols = ["symbol", "time_idx", "rq"] if with_idx else ["symbol", "rq"]
    return out.select(*cols)


def _sql_rel_returns(scale: str) -> str:
    """Oracle CTE twin of :func:`_rel_returns` — emits ``ret(symbol,
    rq)``; compose after SQL_FILLED."""
    return f"""d AS (
  SELECT symbol, time_idx, qc,
         lag(qc, 1) OVER (PARTITION BY symbol ORDER BY time_idx) AS l1
  FROM (SELECT symbol, time_idx,
               floor(close * 1000000.0 + 0.5)::DECIMAL(38,0) AS qc
        FROM filled)),
ret AS (
  SELECT symbol, time_idx,
         floor(((qc - l1)::DOUBLE / l1::DOUBLE) * {scale} + 0.5)
           ::DECIMAL(38,0) AS rq
  FROM d
  WHERE l1 IS NOT NULL AND l1 > 0
    AND abs((qc - l1)::DOUBLE / l1::DOUBLE) < {JB_RET_CAP})"""


RISK_MIN_N = 8
BARS_PER_YEAR = 1460.0  # 6h grid: 4 bars/day * 365


HILL_K = 20


MW_MIN_GROUP = 1


KCORE_K = 3
KCORE_ROUNDS = 3


BURST_TOP_K = 25


PACF_MIN_N = 12


XSEC_TRAIL_W = 28  # 7 days of 6h buckets
XSEC_FWD_W = 4  # 1 day forward
XSEC_N_Q = 5


SLIDE_TOPN = 3


# Fixed deterministic anchor budgets for the embedding eval cards
# (r12 verdict): a corpus-FRACTION sampler (vec_id % MOD) makes an
# exact-GT panel quadratic in corpus size — the MOD dial must be
# retuned as n grows. A fixed top-K-by-portable-hash budget makes
# every panel O(n·K) (or O(K²) when both sides are budgeted) with K
# constant at ANY corpus size, no semantic retuning ever. The pick is
# a distributed TakeOrdered (per-partition top-K, K-row merge — no
# full sort, no single-partition shuffle) on (hash60(vec_id), vec_id),
# bitwise-identical in Spark and DuckDB (the events_hash_sample md5
# device), so both engines select the SAME anchors.
ANCHOR_BUDGET = 256  # triplet-margin anchors / reciprocity sample
IVF_Q_BUDGET = 32  # IVF recall + probe-curve query panel
JL_Q_BUDGET = 64  # JL-distortion query side
JL_C_BUDGET = 512  # JL-distortion candidate side (panel ≤ Q·C fixed)


def anchor_sample(
    df: DataFrame, budget: int, cols=("vec_id", "v", "label"),
    keep_hash: bool = False,
) -> DataFrame:
    """The ``budget`` rows with the smallest (hash60(vec_id), vec_id)
    — the engine-wide FIXED-BUDGET anchor sampler (see the constants
    block above). Corpora smaller than the budget are kept whole,
    identically in both engines."""
    h = hash60(F.col("vec_id").cast("string"))
    out = (
        df.select(*cols, h.alias("__h"))
        .orderBy(F.col("__h").asc(), F.col("vec_id").asc())
        .limit(budget)
    )
    return out if keep_hash else out.drop("__h")


def _sql_anchor_clause(budget: int) -> str:
    """ORDER BY/LIMIT suffix of the oracle's anchor pick — appended to
    a ``SELECT ... FROM <src>`` over any CTE that carries vec_id."""
    h = sql_hash60("CAST(vec_id AS VARCHAR)")
    return f"ORDER BY {h}, vec_id LIMIT {budget}"


DOW_ANCHOR = 5  # 2000-01-01 (the time_idx anchor) is a Saturday, Mon=0


VOLVOL_MIN_DAYS = 5


LIFESPAN_BOUNDS = (0, 1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


GRANGER_MIN_N = 16


CHAR_DOMAIN = "abcdefghijklmnopqrstuvwxyz0123456789 "


TREND_MIN_N = 8


TAIL_Q = 0.1


PREFIX_LEN = 64
PREFIX_TOP_K = 20


RET_DECAY_MAX_K = 14


STRESS_Q = 0.9
