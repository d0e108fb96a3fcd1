"""Round-7 batch-4 extensions, graph-mining / tokenizer tier: exact
triangle counting (degree-ordered orientation), degree assortativity,
a TRUE distributed BPE trainer (fixed merge rounds, each recomputing
corpus pair statistics), bigram-LM surprise scoring, the Zipf
rank-frequency fit, rolling 7-day distinct active users, and seasonal
day-of-week residual anomalies.

Every query is a Catalyst-only DataFrame program with a DuckDB oracle
twin under the registry determinism contract
(sheetsetl_spark/queries/__init__.py): floats round to 6 dp binary-wise
(round6_bin) before any order-dependent accumulation, sums of floats go
through exact DECIMAL, regression/correlation moments come from exact
integer sums where possible, and every ranking carries a unique
tie-break. The BPE oracle unrolls the merge rounds as a CTE chain (the
c56 pagerank precedent), so DuckDB independently re-learns every merge
choice AND re-tokenizes every document.

The co-purchase graph (parts sharing an order, the c60 edge set) serves
as the test graph for the triangle/assortativity queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators.text import round6_bin_sql
from sheetsetl_spark.queries import query

# ---------------------------------------------------------------- graph

_EDGES_SQL = """
    items AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
    ),
    e AS (
      SELECT DISTINCT a.item AS u, b.item AS v
      FROM items a JOIN items b ON a.g = b.g AND a.item < b.item
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ),
    ed AS (
      SELECT e.u, e.v, du.deg AS du, dv.deg AS dv
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    )
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("item")
    ).distinct()
    a = items.select("g", F.col("item").alias("src"))
    b = items.select("g", F.col("item").alias("dst"))
    return (
        a.join(b, "g")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


@query(
    "c67_triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL},
    o AS (
      SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
             CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b,
             CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS db
      FROM ed
    ),
    wedge AS (
      SELECT o1.b AS b1, o1.db AS db1, o2.b AS b2
      FROM o o1 JOIN o o2 ON o1.a = o2.a
      WHERE o1.db < o2.db OR (o1.db = o2.db AND o1.b < o2.b)
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM wedge w
      WHERE EXISTS (SELECT 1 FROM o WHERE o.a = w.b1 AND o.b = w.b2)
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
      FROM deg
    ),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           {round6_bin_sql("3.0 * n_triangles / n_wedges")} AS global_clustering
    FROM st, ne, tri
    """,
)
def c67_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (graph-mining tier): exact triangle count + global
    clustering coefficient over the co-purchase graph, via
    degree-ordered edge orientation (operators/graph.py::triangle_stats
    — Suri & Vassilvitskii's MR algorithm). Orientation bounds every
    out-degree by O(sqrt(m)), so the wedge join does O(m^1.5) work even
    on power-law graphs — the canonical 100 TB triangle plan, vs the
    naive 3-way self-join's hub blowup."""
    from sheetsetl_spark.operators import graph

    return graph.triangle_stats(_copurchase_edges(spark, sf_dir))


@query(
    "c68_degree_assortativity",
    oracle=f"""
    WITH {_EDGES_SQL},
    ends AS (
      SELECT du AS x, dv AS y FROM ed
      UNION ALL
      SELECT dv AS x, du AS y FROM ed
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_ends,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM ends
    )
    SELECT n_ends AS n_edge_ends,
           {round6_bin_sql(
               "(n * sxy - sx * sy)"
               " / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))"
           )} AS assortativity
    FROM m
    """,
)
def c68_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (graph-mining tier): Newman degree assortativity of the
    co-purchase graph (operators/graph.py::degree_assortativity) — the
    one-scalar check that a sampled/pruned graph kept the original's
    hub-mixing structure. All five correlation moments are exact
    integer sums (degrees are ints), so there is no float
    order-dependence anywhere to break the hash check."""
    from sheetsetl_spark.operators import graph

    return graph.degree_assortativity(_copurchase_edges(spark, sf_dir))


# ------------------------------------------------------------ tokenizer

_BPE_ROUNDS = 5
_BPE_MAX_CHARS = 120


def _bpe_oracle(rounds: int, max_chars: int) -> str:
    """Unrolled per-round CTE chain: DuckDB re-learns each merge (argmax
    adjacent pair over the CURRENT tokenization, ties (count DESC, x, y))
    and re-applies it with the SAME greedy-pairing semantics as the
    Spark operator (exact left-to-right non-overlapping token merging —
    a trailing-space-consuming string replace would skip every second
    site in an adjacent-site chain; the Spark side implements this as a
    lookahead regexp_replace since r10, this oracle keeps the windowed
    islands formulation; see operators/text.py::_bpe_apply_merge).
    Positions are 1-based here vs 0-based in Spark: islands shift by a
    constant and the (pos - run_start) parity is offset-invariant, so
    the selections coincide."""
    clean = (
        "replace(substr(trim(regexp_replace(regexp_replace(lower(text),"
        f" '[^a-z ]', '', 'g'), ' +', ' ', 'g')), 1, {max_chars}), ' ', '_')"
    )
    parts = [
        f"""t0 AS (
          SELECT doc_id AS id, ' ' || regexp_replace(c, '(.)', '\\1 ', 'g') AS toks
          FROM (SELECT doc_id, {clean} AS c FROM documents)
          WHERE LEN(c) >= 2
        )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"t{r - 1}"
        parts.append(f"""p{r} AS (
          SELECT UNNEST(list_transform(generate_series(1, LEN(a) - 1),
                                       i -> a[i] || chr(9) || a[i + 1])) AS xy
          FROM (SELECT STRING_SPLIT(TRIM(toks), ' ') AS a FROM {prev})
        )""")
        parts.append(f"""m{r} AS (
          SELECT SPLIT_PART(xy, chr(9), 1) AS x, SPLIT_PART(xy, chr(9), 2) AS y
          FROM p{r} GROUP BY xy ORDER BY COUNT(*) DESC, xy LIMIT 1
        )""")
        parts.append(f"""tk{r} AS (
          SELECT id, UNNEST(generate_series(1, LEN(a))) AS pos, UNNEST(a) AS t
          FROM (SELECT id, STRING_SPLIT(TRIM(toks), ' ') AS a FROM {prev})
        )""")
        parts.append(f"""s{r} AS (
          SELECT id, pos, t,
                 CASE WHEN t = m.x
                       AND LEAD(t) OVER (PARTITION BY id ORDER BY pos) = m.y
                      THEN 1 ELSE 0 END AS site
          FROM tk{r}, m{r} m
        )""")
        parts.append(f"""g{r} AS (
          SELECT id, pos, t,
                 site = 1 AND (pos - COALESCE(
                   MAX(CASE WHEN site = 0 THEN pos END) OVER (
                     PARTITION BY id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0
                 )) % 2 = 1 AS sel
          FROM s{r}
        )""")
        parts.append(f"""o{r} AS (
          SELECT z.id, z.pos,
                 CASE WHEN z.sel THEN m.x || m.y
                      WHEN COALESCE(LAG(z.sel)
                             OVER (PARTITION BY z.id ORDER BY z.pos), FALSE)
                        THEN NULL
                      ELSE z.t END AS out_t
          FROM g{r} z, m{r} m
        )""")
        parts.append(f"""t{r} AS (
          SELECT id, ' ' || STRING_AGG(out_t, ' ' ORDER BY pos) || ' ' AS toks
          FROM o{r} WHERE out_t IS NOT NULL GROUP BY id
        )""")
    return f"""
    WITH {", ".join(parts)}
    SELECT id AS doc_id, TRIM(toks) AS toks,
           CAST(LEN(STRING_SPLIT(TRIM(toks), ' ')) AS INT) AS n_tokens
    FROM t{rounds}
    """


@query("c69_bpe_train_apply", oracle=_bpe_oracle(_BPE_ROUNDS, _BPE_MAX_CHARS))
def c69_bpe_train_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (tokenizer tier): TRUE byte-pair-encoding — 5 greedy
    merge rounds learned from the corpus itself, then applied
    (operators/text.py::bpe_train_apply). Each round is one
    map-side-combining pair aggregation tree-reduced to a single argmax
    row (bounded driver state, the kmeans-centroid precedent) plus a
    corpus-parallel literal replace; the DuckDB twin independently
    re-learns every merge via an unrolled CTE chain, so a hash match
    certifies the whole induction loop, not just the final strings."""
    from sheetsetl_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    out = text_ops.bpe_train_apply(
        docs, rounds=_BPE_ROUNDS, max_chars=_BPE_MAX_CHARS
    )
    return out.select(F.col("id").alias("doc_id"), "toks", "n_tokens")


# -------------------------------------------------------------- text LM

@query(
    "c70_bigram_surprise",
    oracle=f"""
    WITH pair_rows AS (
      SELECT doc_id,
             UNNEST(list_transform(generate_series(1, LEN(w) - 1),
                                   i -> w[i] || chr(9) || w[i + 1])) AS xy
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
    ),
    doc_pairs AS (
      SELECT doc_id, xy, COUNT(*) AS cnt FROM pair_rows GROUP BY doc_id, xy
    ),
    bigr AS (SELECT xy, SUM(cnt) AS big_cnt FROM doc_pairs GROUP BY xy),
    uni AS (
      SELECT term, COUNT(*) AS uni_cnt
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
      GROUP BY term
    ),
    v AS (SELECT COUNT(*) AS vocab FROM uni)
    SELECT doc_id, CAST(SUM(cnt) AS INT) AS n_bigrams,
           {round6_bin_sql(
               "CAST(SUM(CAST(cnt * ("
               + round6_bin_sql(
                   "-LN(CAST(big_cnt + 1 AS DOUBLE) / (uni_cnt + vocab))"
               )
               + ") AS DECIMAL(28,6))) AS DOUBLE) / SUM(cnt)"
           )} AS avg_bigram_surprise
    FROM doc_pairs
    JOIN bigr USING (xy)
    JOIN uni ON uni.term = SPLIT_PART(xy, chr(9), 1), v
    GROUP BY doc_id
    """,
)
def c70_bigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (quality tier): bigram-LM surprise with add-1 smoothing,
    trained on the corpus (operators/text.py::bigram_logprob) — the rung
    above c30's unigram score where word ORDER matters, so shuffled /
    templated spam separates from fluent text at identical unigram mix.
    The bigram model is corpus-derived, joined back on the pair key (AQE
    decides broadcast); vocabulary size is a broadcast one-row agg."""
    from sheetsetl_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    out = text_ops.bigram_logprob(docs)
    return out.select(
        F.col("id").alias("doc_id"), "n_bigrams", "avg_bigram_surprise"
    )


@query(
    "c71_zipf_slope",
    oracle=f"""
    WITH counts AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
      GROUP BY term ORDER BY cnt DESC, term LIMIT 100
    ),
    ranked AS (
      SELECT {round6_bin_sql(
          "LN(CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS DOUBLE))"
      )} AS lx,
             {round6_bin_sql("LN(CAST(cnt AS DOUBLE))")} AS ly
      FROM counts
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(lx AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ly AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST({round6_bin_sql("lx * ly")} AS DECIMAL(28,6)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST({round6_bin_sql("lx * lx")} AS DECIMAL(28,6)))
                  AS DOUBLE) AS sxx
      FROM ranked
    )
    SELECT CAST(n AS INT) AS n_terms,
           {round6_bin_sql(
               "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
           )} AS zipf_slope,
           {round6_bin_sql(
               "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n"
           )} AS zipf_intercept
    FROM m
    """,
)
def c71_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (corpus-health tier): Zipf rank-frequency fit — OLS
    slope of ln(count) on ln(rank) over the top-100 terms
    (operators/text.py::zipf_slope). Natural corpora sit near -1;
    strong deviation flags templated / machine-generated text. Term
    counts are one map-side-combining agg; the regression runs over a
    TakeOrderedAndProject top-N, constant-size tail work."""
    from sheetsetl_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    return text_ops.zipf_slope(docs, top=100)


# ----------------------------------------------------------- events ops

@query(
    "x78_rolling_wau",
    oracle="""
    WITH a AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM a),
    spine AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS wday
      FROM b
    )
    SELECT CAST(wday AS VARCHAR) AS day,
           (SELECT COUNT(DISTINCT user_id) FROM a
            WHERE a.day BETWEEN wday - 6 AND wday) AS wau_7d
    FROM spine
    """,
)
def x78_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the metric SQL
    cannot window (no COUNT(DISTINCT) over a frame) and the naive
    per-day self-join recomputes 7x. Scale shape: dedupe (user, day)
    once, explode each active day to the <= 7 window-end days it
    covers, dedupe (window_day, user), count — two bounded shuffles,
    fanout exactly 7, no distinct-over-window state. The DuckDB twin is
    the direct correlated COUNT(DISTINCT), so the hash match proves the
    explode trick equals the textbook semantics."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    active = ev.distinct()
    bounds = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("wday"))
    cover = (
        active.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("wday"),
            "user_id",
        )
        .distinct()
    )
    wau = cover.groupBy("wday").agg(F.count("*").alias("wau_7d"))
    # spine is the preserved side of the left join, so the broadcastable
    # side is the (days-sized) wau aggregate, not the spine
    return (
        spine.join(F.broadcast(wau), "wday", "left")
        .select(
            F.col("wday").cast("string").alias("day"),
            F.coalesce("wau_7d", F.lit(0)).alias("wau_7d"),
        )
    )


@query(
    "x79_seasonal_dow_residuals",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             isodow(CAST(ts AS DATE)) - 1 AS dow,
             CAST(SUM(CAST({round6_bin_sql("value")} AS DECIMAL(28,6)))
                  AS DECIMAL(28,6)) AS total_dec
      FROM events GROUP BY 1, 2, 3
    ),
    base AS (
      SELECT event_type, dow,
             {round6_bin_sql(
                 "CAST(SUM(total_dec) AS DOUBLE) / COUNT(*)"
             )} AS dow_mean
      FROM daily GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.event_type, d.day, d.dow,
             CAST(d.total_dec AS DOUBLE) AS day_total, b.dow_mean,
             {round6_bin_sql(
                 "CAST(d.total_dec AS DOUBLE) - b.dow_mean"
             )} AS residual
      FROM daily d JOIN base b ON d.event_type = b.event_type AND d.dow = b.dow
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, CAST(dow AS INT) AS dow,
           day_total, dow_mean, residual
    FROM scored
    ORDER BY ABS(residual) DESC, event_type, day LIMIT 20
    """,
)
def x79_seasonal_dow_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly scan: per (event_type, day-of-week) baseline
    means over daily value totals, then the 20 days whose totals deviate
    most from their weekday baseline — the deseasonalized-residual step
    every metrics-anomaly monitor runs before alerting (a Monday spike
    is only a spike relative to Mondays). Two aggregations + one
    baseline join (AQE broadcasts the weekday-sized side); top-N is
    TakeOrderedAndProject with a unique (event_type, day) tie-break."""
    from sheetsetl_spark.operators.text import round6_bin

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr("weekday(ts)").alias("dow"),
            round6_bin(F.col("value")).cast("decimal(28,6)").alias("v"),
        )
        .groupBy("event_type", "day", "dow")
        .agg(F.sum("v").cast("decimal(28,6)").alias("total_dec"))
    )
    base = daily.groupBy("event_type", "dow").agg(
        round6_bin(
            F.sum("total_dec").cast("double") / F.count("*")
        ).alias("dow_mean")
    )
    scored = daily.join(base, ["event_type", "dow"]).select(
        "event_type",
        "day",
        "dow",
        F.col("total_dec").cast("double").alias("day_total"),
        "dow_mean",
        round6_bin(
            F.col("total_dec").cast("double") - F.col("dow_mean")
        ).alias("residual"),
    )
    return (
        scored.orderBy(
            F.abs(F.col("residual")).desc(), "event_type", "day"
        )
        .limit(20)
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.col("dow").cast("int").alias("dow"),
            "day_total",
            "dow_mean",
            "residual",
        )
    )


_KCORE_K = 70
_KCORE_ROUNDS = 4


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled per-round peel chain (the c56/c69 precedent): each round
    recomputes degrees and keeps only >= k endpoints on both sides."""
    parts = ["e0 AS MATERIALIZED (SELECT u, v FROM e)"]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(f"""d{r} AS MATERIALIZED (
          SELECT node, COUNT(*) AS deg FROM (
            SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}
          ) GROUP BY node
        )""")
        parts.append(f"k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k})")
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT x.u, x.v FROM {prev} x"
            f" JOIN k{r} a ON a.node = x.u JOIN k{r} b ON b.node = x.v)"
        )
        prev = f"e{r}"
    return f"""
    WITH {_EDGES_SQL}, {", ".join(parts)}
    SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}
    ) GROUP BY node HAVING COUNT(*) >= {k}
    """


@query("c74_kcore", oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def c74_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (graph-mining tier): k-core peeling of the co-purchase
    graph, 4 fixed rounds (operators/graph.py::kcore) — the
    dense-subgraph extraction primitive (drop degree-<k nodes, repeat).
    Each round is one degree aggregation + two node-keyed semi-joins;
    per-round lazy checkpoints stop the survivor set's double
    consumption (degree branch + join branch) from doubling the
    expression tree per round. The DuckDB twin unrolls the same rounds
    as a CTE chain."""
    from sheetsetl_spark.operators import graph

    return graph.kcore(
        _copurchase_edges(spark, sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS
    )


@query(
    "c73_knn_label_entropy",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
                 label FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id, c.label,
             LIST_DOT_PRODUCT(qv, cv)
               / (SQRT(LIST_DOT_PRODUCT(qv, qv))
                  * SQRT(LIST_DOT_PRODUCT(cv, cv))) AS sim
      FROM c, q WHERE q.query_id <> c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, label,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS nn_rank
      FROM scored
    ),
    nn AS (SELECT query_id, label FROM ranked WHERE nn_rank <= 10),
    counts AS (
      SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM nn GROUP BY query_id, label
    ),
    ent AS (
      SELECT query_id,
             CAST(COUNT(*) AS INT) AS n_labels,
             MAX(cnt * 1000000 + (999999 - label)) AS enc,
             {round6_bin_sql(
                 "-CAST(SUM(CAST(("
                 + round6_bin_sql(
                     "(cnt / 10.0) * LN(cnt / 10.0)"
                 )
                 + ") AS DECIMAL(28,6))) AS DOUBLE)"
             )} AS entropy
      FROM counts GROUP BY query_id
    )
    SELECT query_id, n_labels,
           CAST(999999 - (enc % 1000000) AS INT) AS top_label,
           {round6_bin_sql("(enc // 1000000) / 10.0")} AS top_share,
           entropy
    FROM ent
    """,
)
def c73_knn_label_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (similarity tier): label purity of retrieved
    neighborhoods — exact cosine top-10 per query (the c3 kernel), then
    the Shannon entropy and modal share of neighbor labels. The metric
    that says whether an embedding space's neighborhoods respect labels
    (retrieval-augmented dedup / contamination triage reads this before
    trusting kNN votes). Entropy terms round 6 dp and accumulate in
    exact DECIMAL over <= 10 label rows per query."""
    from sheetsetl_spark.operators import similarity
    from sheetsetl_spark.operators.text import round6_bin

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    nn = similarity.cosine_topk(emb, queries_df, k=10)
    joined = nn.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label"),
        "neighbor_id",
    )
    counts = joined.groupBy("query_id", "label").agg(
        F.count("*").alias("cnt")
    )
    p = F.col("cnt") / F.lit(10.0)
    # single aggregation: entropy AND the modal label together, so the
    # expensive kNN kernel is evaluated once (an entropy-branch + top-
    # branch join would re-execute the whole cosine scan twice). The
    # modal label with (cnt DESC, label ASC) tie-break rides along as an
    # integer-encoded argmax: cnt*1e6 + (999999 - label) — exact for
    # label < 1e6, engine-portable, no window, no join.
    enc = F.col("cnt") * F.lit(1000000) + (F.lit(999999) - F.col("label"))
    ent = counts.groupBy("query_id").agg(
        F.count("*").cast("int").alias("n_labels"),
        F.max(enc).alias("enc"),
        round6_bin(
            -F.sum(round6_bin(p * F.log(p)).cast("decimal(28,6)")).cast(
                "double"
            )
        ).alias("entropy"),
    )
    return ent.select(
        "query_id",
        "n_labels",
        (F.lit(999999) - F.col("enc") % F.lit(1000000)).cast("int").alias("top_label"),
        round6_bin(
            F.expr("enc div 1000000") / F.lit(10.0)
        ).alias("top_share"),
        "entropy",
    )
