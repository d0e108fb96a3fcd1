"""Round-11 batch — estimator audits, uncertainty quantification, and
pipeline-hygiene rows:

- c106 semantic (embedding-space) decontamination: the vector sibling
  of the n-gram decon family (c18/c84/c87) — eval-set vectors broadcast
  against the train corpus, exact cosine, flagged rows out.
- c107 MinHash estimator audit: signature-agreement Jaccard ESTIMATE
  next to exact Jaccard per verified pair — the measured justification
  for why minhash_lsh_pairs verifies with exact Jaccard instead of
  thresholding the estimate.
- c108 normalized exact dedup (Dolma/CCNet-style canonicalize→hash).
- c109 the LSH S-curve tuning table (collision probability vs
  similarity for every (bands, rows) split of a 128-hash budget).
- c110 embedding QA report (NaN / zero-norm / norm-spread per label).
- c111 per-document word-entropy (gibberish/boilerplate signal).
- x103 Poisson(1) bootstrap replicate means — THE cluster-scale
  bootstrap (no resampling shuffle; weights are a deterministic
  per-(row, replicate) hash draw).
- x104 delete-one-bucket jackknife SE of a mean.
- x105 decile lift / cumulative-gains table.
- b65 MySQL forgiving-cast semantics via try_* (the reference's MySQL
  backend returns NULL on x/0 and never errors on bad casts;
  try_divide/try_cast reproduce that contract exactly — the error-safe
  twin of B11's strict CAST row).

Scale contracts (per docstring): c106 broadcasts the (small by
contract) eval set — the corpus is scanned once, never shuffled; c107
runs on the candidate-proportional verified subset; x103's explode is
absorbed by map-side partial aggregation (30 replicate rows per
partition reach the shuffle); everything else is single-scan group-bys
or literal-grid math.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators.similarity import _dot
from sheetsetl_spark.operators.skew import widen_to_cores
from sheetsetl_spark.operators.text import round6_bin, round6_bin_sql
from sheetsetl_spark.queries import query


def _r6(x: str) -> str:
    return round6_bin_sql(x)


# ---------------------------------------------------------------------------
# c106 — semantic decontamination
# ---------------------------------------------------------------------------

_DECON_THRESHOLD = 0.9

@query(
    "c106_semantic_decontamination",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ev AS (SELECT vec_id AS eval_id, v AS evv FROM e WHERE vec_id < 16),
    tr AS (
      SELECT vec_id, v FROM e WHERE vec_id >= 16
      UNION ALL
      SELECT eval_id + 1000000, LIST_TRANSFORM(evv, x -> x + 0.03) FROM ev
    ),
    scored AS (
      SELECT tr.vec_id AS train_id, ev.eval_id,
             LIST_DOT_PRODUCT(v, evv)
               / (SQRT(LIST_DOT_PRODUCT(v, v))
                  * SQRT(LIST_DOT_PRODUCT(evv, evv))) AS sim
      FROM tr, ev
    ),
    best AS (
      SELECT train_id, eval_id, sim,
             ROW_NUMBER() OVER (PARTITION BY train_id
                                ORDER BY sim DESC, eval_id) AS rn
      FROM scored
    )
    SELECT train_id, eval_id, {_r6("sim")} AS sim
    FROM best WHERE rn = 1 AND sim >= {_DECON_THRESHOLD}
    """,
)
def c106_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (decontamination tier): EMBEDDING-space decontamination
    — the semantic sibling of the n-gram family (c18 benchmark decon,
    c84 substring, c87 anchored). Eval-set vectors (vec_id < 16, small
    by contract — benchmarks are thousands of rows, not billions)
    broadcast against the train corpus; exact cosine; train rows whose
    best eval match reaches 0.9 are flagged with that best match
    (deterministic argmax: sim desc, eval_id). The fixture corpus is
    near-orthogonal (max natural sim ~0.5), so the query plants
    shifted copies of the eval vectors (+0.03 per coordinate, ids
    +1e6, cos ~0.97) — exactly the paraphrased-benchmark shape n-gram
    decon misses and embedding decon exists to catch.

    100 TB: one corpus scan x broadcast |eval| dots, argmax by
    MAP-SIDE-COMBINED ``max`` over (sim, -eval_id) structs — the
    shuffle moves ONE 3-column row per train row, not the |eval| x N
    crossJoin output, and there is no sort. Struct ordering is
    lexicographic, so max(sim, -eval_id) == the oracle ROW_NUMBER's
    (sim DESC, eval_id ASC) winner. The train scan is widened to cores
    first (compactly-written 100x fixtures expose 16 splits on 32
    cores; the work is compute-dense at |eval| x dim mults per row).

    Measured r11 A/B at 100x (500k vectors, local[32]) — this form
    won by 5x over the first cut and by 6-15x over two "zero-shuffle"
    rewrites: window-over-crossJoin 13.4s (the 16N exchange + sort);
    nested aggregate-fold over a literal eval array 40.0s (nested
    higher-order lambdas interpret per element and the conditional
    replace evaluates each dot twice); unrolled per-eval literal
    zip_with folds 15.6s (literal-array rebuild per row per eval);
    broadcast crossJoin + partial-agg max: **2.7s**. The lesson
    recorded here: against interpreted higher-order projections, a
    broadcast row blow-up that feeds a codegen'd partial aggregate is
    the FASTER shape — the combiner collapses it before the wire.
    Compare c2e where BOTH sides are corpus-sized and banding is
    mandatory. Reference parity: reference has no decon at all (SELECT
    delegation, src/loader.py:231); C-series mandate."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ev = base.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("eval_id"), F.col("v").alias("evv")
    )
    planted = ev.select(
        (F.col("eval_id") + 1000000).alias("vec_id"),
        F.transform("evv", lambda x: x + F.lit(0.03)).alias("v"),
    )
    train = widen_to_cores(base.filter(F.col("vec_id") >= 16).unionAll(planted))
    t = train.withColumn("tn", F.sqrt(_dot("v", "v")))
    e = ev.withColumn("en", F.sqrt(_dot("evv", "evv")))
    sim = _dot("v", "evv") / (F.col("tn") * F.col("en"))
    pair = F.struct(
        F.col("__sim").alias("sim"), (-F.col("eval_id")).alias("neg_eid")
    )
    return (
        t.crossJoin(F.broadcast(e))
        .select(F.col("vec_id").alias("train_id"), "eval_id", sim.alias("__sim"))
        .groupBy("train_id")
        .agg(F.max(pair).alias("__b"))
        .filter(F.col("__b.sim") >= _DECON_THRESHOLD)
        .select(
            "train_id",
            (-F.col("__b.neg_eid")).alias("eval_id"),
            round6_bin(F.col("__b.sim")).alias("sim"),
        )
    )


# ---------------------------------------------------------------------------
# c107 — MinHash estimator audit
# ---------------------------------------------------------------------------

def _minhash_estimate_oracle(
    threshold: float, num_hashes: int = 16, bands: int = 4, n: int = 3,
    df_cap: int = 1000,
) -> str:
    """c2d's portable-minhash oracle, extended with the per-pair
    signature-agreement estimate (fam rows joined pairwise on i)."""
    rpb = num_hashes // bands
    return f"""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+{n - 1}], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - {n - 1})) AS i) u
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM sh0) t
      WHERE df <= {df_cap}
    ),
    h AS (
      SELECT doc_id, ('0x' || SUBSTRING(MD5(shingle), 1, 15))::BIGINT AS h FROM sh
    ),
    fam AS (
      SELECT doc_id, i,
             MIN(('0x' || SUBSTRING(MD5(CONCAT(CAST(i AS VARCHAR), ':', CAST(h AS VARCHAR))),
                              1, 15))::BIGINT) AS mh
      FROM h, (SELECT UNNEST(GENERATE_SERIES(0, {num_hashes - 1})) AS i) fs
      GROUP BY 1, 2
    ),
    bandv AS (
      SELECT doc_id, i // {rpb} AS band_idx,
             STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY i) AS band_val
      FROM fam GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandv a
      JOIN bandv b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id
    ),
    agree AS (
      SELECT c.doc_a, c.doc_b,
             SUM(CASE WHEN fa.mh = fb.mh THEN 1 ELSE 0 END) AS n_agree
      FROM cand c
      JOIN fam fa ON fa.doc_id = c.doc_a
      JOIN fam fb ON fb.doc_id = c.doc_b AND fb.i = fa.i
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN sh a ON c.doc_a = a.doc_id
      JOIN sh b ON c.doc_b = b.doc_id AND a.shingle = b.shingle
      GROUP BY 1, 2
    ),
    final AS (
      SELECT i.doc_a, i.doc_b,
             i.inter / (sa.n_sh + sb.n_sh - i.inter) AS j_raw,
             g.n_agree / {num_hashes}.0 AS est_raw
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      JOIN agree g ON g.doc_a = i.doc_a AND g.doc_b = i.doc_b
    )
    SELECT doc_a, doc_b, {_r6("j_raw")} AS jaccard,
           {_r6("est_raw")} AS est_jaccard,
           {_r6("ABS(est_raw - j_raw)")} AS abs_err
    FROM final WHERE {_r6("j_raw")} >= {threshold}
    """


@query(
    "c107_minhash_jaccard_estimate",
    oracle=_minhash_estimate_oracle(threshold=0.5),
)
def c107_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 audit path: the signature-agreement Jaccard ESTIMATE next to
    the exact value, per verified near-dup pair
    (operators/dedup.py::minhash_estimate_audit). The honest-estimator
    row for the MinHash family — the k=16 estimate has sd
    sqrt(j(1-j)/k) ~ 0.12, which is WHY the production path
    (c2b/c2d) thresholds on candidate-proportional exact Jaccard, never
    on the estimate; this query is the measured evidence, the same
    pattern as the ANN tier's recall rows (c35/c91). md5-portable
    family so the DuckDB twin rebuilds the signatures bit-for-bit."""
    from sheetsetl_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_estimate_audit(
        docs, threshold=0.5, num_hashes=16, bands=4, n=3, max_shingle_df=1000
    )


# ---------------------------------------------------------------------------
# c108 — normalized exact dedup
# ---------------------------------------------------------------------------

@query(
    "c108_normalized_exact_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, CONCAT(UPPER(text), ' !!')
      FROM documents WHERE doc_id < 30
    ),
    canon AS (
      SELECT doc_id,
             MD5(TRIM(REGEXP_REPLACE(
               REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'),
               '  +', ' ', 'g'))) AS canon_hash
      FROM corpus
    )
    SELECT canon_hash, CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(doc_id) AS survivor_doc_id
    FROM canon GROUP BY canon_hash HAVING COUNT(*) > 1
    """,
)
def c108_normalized_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 extension: NORMALIZED exact dedup (Dolma/CCNet 'url+text
    canonicalization' stage) — lowercase, strip non-alphanumerics,
    collapse whitespace, then hash-group; the smallest doc_id survives.
    Catches trivially-reformatted copies (case, punctuation, spacing)
    that byte-exact dedup misses and near-dup LSH wastes candidates
    on. The fixture corpus has no such copies, so the query plants
    uppercased+punctuated twins of doc_id < 30 (ids +1e6) — every
    planted row must collapse onto its source.

    100 TB: identical shape to c1 exact dedup — canonicalization is
    per-row codegen'd string work on the scan, the only shuffle is the
    16-byte-hash groupBy (map-side combined). Output is dup GROUPS
    (n>1) — the survivor list, not the corpus."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (
        docs.filter(F.col("doc_id") < 30)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.upper("text"), F.lit(" !!")).alias("text"),
        )
    )
    canon = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
                "  +", " ",
            )
        )
    )
    return (
        docs.unionAll(planted)
        .select("doc_id", canon.alias("canon_hash"))
        .groupBy("canon_hash")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.min("doc_id").alias("survivor_doc_id"),
        )
        .filter(F.col("n_members") > 1)
    )


# ---------------------------------------------------------------------------
# c109 — LSH S-curve tuning table
# ---------------------------------------------------------------------------

@query(
    "c109_lsh_s_curve",
    oracle=f"""
    WITH cfg AS (
      SELECT b AS bands, 128 // b AS rows_per_band
      FROM (SELECT UNNEST([4, 8, 16, 32, 64]) AS b)
    ),
    s AS (SELECT (50 + 5 * i) / 100.0 AS sim
          FROM (SELECT UNNEST(GENERATE_SERIES(0, 9)) AS i))
    SELECT bands, CAST(rows_per_band AS BIGINT) AS rows_per_band,
           {_r6("sim")} AS sim,
           {_r6("1.0 - POWER(1.0 - POWER(sim, rows_per_band), bands)")}
             AS p_collide
    FROM cfg, s
    """,
)
def c109_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 design-surface row: the LSH S-curve — candidate-collision
    probability 1-(1-s^r)^b for every (bands, rows) factorization of a
    128-hash budget across the similarity range. This is the table an
    operator reads to pick banding for a target threshold (threshold
    ~ (1/b)^(1/r) at the curve's inflection): what choose_banding does
    for the VALUE SPACE (bucket occupancy), this does for RECALL —
    the two axes of every banded-dedup configuration in this repo.
    Pure literal-grid math (50 rows), identical in any engine; kept as
    a registered query so the tuning rule itself is hash-certified."""
    cfg = spark.range(1).select(
        F.explode(F.array(*[F.lit(b) for b in (4, 8, 16, 32, 64)])).alias("bands")
    ).withColumn("rows_per_band", (F.lit(128) / F.col("bands")).cast("long"))
    s = spark.range(10).select(
        ((F.lit(50) + 5 * F.col("id")) / F.lit(100.0)).alias("sim")
    )
    p = 1.0 - F.pow(
        1.0 - F.pow(F.col("sim"), F.col("rows_per_band")), F.col("bands")
    )
    return cfg.crossJoin(s).select(
        F.col("bands").cast("int").alias("bands"),
        "rows_per_band",
        round6_bin(F.col("sim")).alias("sim"),
        round6_bin(p).alias("p_collide"),
    )


# ---------------------------------------------------------------------------
# c110 — embedding QA report
# ---------------------------------------------------------------------------

@query(
    "c110_embedding_quality_report",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
      UNION ALL
      SELECT 9000001, (SELECT LIST(0.0) FROM GENERATE_SERIES(1, 64)), -1
      UNION ALL
      SELECT 9000002, (SELECT LIST(CAST('NaN' AS DOUBLE))
                       FROM GENERATE_SERIES(1, 64)), -2
    ),
    flagged AS (
      SELECT label,
             CASE WHEN LEN(LIST_FILTER(v, x -> ISNAN(x))) > 0
                  THEN 1 ELSE 0 END AS is_nan,
             SQRT(LIST_DOT_PRODUCT(v, v)) AS nrm
      FROM corpus
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(is_nan) AS BIGINT) AS n_nan,
           CAST(SUM(CASE WHEN is_nan = 0 AND nrm < 1e-9 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_norm,
           CASE WHEN COUNT(CASE WHEN is_nan = 0 THEN 1 END) > 0 THEN
             {_r6("CAST(SUM(CASE WHEN is_nan = 0 THEN "
                  "CAST(FLOOR(nrm * 1000000.0 + 0.5) / 1000000.0 "
                  "AS DECIMAL(18,6)) END) AS DOUBLE) "
                  "/ COUNT(CASE WHEN is_nan = 0 THEN 1 END)")}
           END AS mean_norm,
           {_r6("MIN(CASE WHEN is_nan = 0 THEN nrm END)")} AS min_norm,
           {_r6("MAX(CASE WHEN is_nan = 0 THEN nrm END)")} AS max_norm
    FROM flagged GROUP BY label
    """,
)
def c110_embedding_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (embedding-hygiene tier): per-label vector QA — NaN
    rows, zero-norm rows, and the norm spread. The gate every
    embedding pipeline needs BEFORE the similarity/dedup tiers: one
    NaN cosine sorts above every threshold in a desc ranking and one
    zero-norm vector is 0/0 (the exact hazard _checked_norm guards);
    this is the corpus-wide audit of the same contract. The fixture is
    clean by construction, so the query plants one zero vector and one
    NaN vector (labels -1/-2) that MUST surface in their buckets.

    100 TB: single scan, one 64-element fold per row, map-side
    combined groupBy on a bounded label domain. Mean norm follows the
    repo's exact-decimal recipe (round6 each norm, DECIMAL sum) so
    partial-aggregation order can't move the hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    zeros = [0.0] * 64
    nans = [float("nan")] * 64
    planted = spark.createDataFrame(
        [(9000001, zeros, -1), (9000002, nans, -2)],
        "vec_id long, v array<double>, label int",
    )
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    ).unionAll(planted)
    flagged = corpus.select(
        "label",
        F.when(F.exists("v", lambda x: F.isnan(x)), 1).otherwise(0).alias("is_nan"),
        F.sqrt(_dot("v", "v")).alias("nrm"),
    )
    clean_nrm = F.when(F.col("is_nan") == 0, F.col("nrm"))
    return flagged.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.sum("is_nan").cast("long").alias("n_nan"),
        F.sum(
            F.when((F.col("is_nan") == 0) & (F.col("nrm") < 1e-9), 1).otherwise(0)
        ).cast("long").alias("n_zero_norm"),
        # guarded: an all-NaN label (planted -2) must yield NULL, not an
        # ANSI divide-by-zero error under the driver's default session
        F.when(
            F.count(clean_nrm) > 0,
            round6_bin(
                F.sum(round6_bin(clean_nrm).cast("decimal(18,6)")).cast("double")
                / F.count(clean_nrm)
            ),
        ).alias("mean_norm"),
        round6_bin(F.min(clean_nrm)).alias("min_norm"),
        round6_bin(F.max(clean_nrm)).alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# c111 — per-document word entropy
# ---------------------------------------------------------------------------

@query(
    "c111_word_entropy",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    n AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct
          FROM tf GROUP BY 1)
    SELECT tf.doc_id, CAST(ANY_VALUE(n.n_tokens) AS BIGINT) AS n_tokens,
           CAST(ANY_VALUE(n.n_distinct) AS BIGINT) AS n_distinct,
           {_r6("CAST(SUM(CAST(tf.c * "
                "(FLOOR(-LN(1.0 * tf.c / n.n_tokens) * 1000000.0 + 0.5)"
                " / 1000000.0) AS DECIMAL(28,6))) AS DOUBLE)"
                " / ANY_VALUE(n.n_tokens)")} AS entropy_nats
    FROM tf JOIN n ON tf.doc_id = n.doc_id
    GROUP BY tf.doc_id
    """,
)
def c111_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 extension: per-document word-distribution entropy (nats) —
    the classic gibberish/boilerplate quality signal: templated or
    keyboard-mash documents sit far below the corpus entropy band,
    wordlist spam far above (CCNet/Gopher both gate on it). H =
    -sum (c/n) ln(c/n) over the doc's word frequencies.

    100 TB: ONE corpus scan — explode -> map-side-combined (doc, tok)
    groupBy; the doc totals come from a WINDOW over doc_id (not a
    self-join, which would re-derive the tf frame on both sides —
    plan-audited: 1 scan, 2 exchanges, 0 joins), and the final per-doc
    aggregate reuses the window's doc_id partitioning. Tokens never
    leave their executor. Determinism: c30's recipe — round each -ln
    term to 6dp, weight by the integer count, accumulate in exact
    DECIMAL, one final division."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    wdoc = Window.partitionBy("doc_id")
    withn = tf.select(
        "doc_id",
        "c",
        F.sum("c").over(wdoc).alias("n_tokens"),
        F.count("*").over(wdoc).alias("n_distinct"),
    )
    neg_lp = round6_bin(-F.log(F.col("c") / F.col("n_tokens")))
    return withn.groupBy("doc_id").agg(
        F.first("n_tokens").cast("long").alias("n_tokens"),
        F.first("n_distinct").cast("long").alias("n_distinct"),
        round6_bin(
            F.sum((F.col("c") * neg_lp).cast("decimal(28,6)")).cast("double")
            / F.first("n_tokens")
        ).alias("entropy_nats"),
    )


# ---------------------------------------------------------------------------
# x103 — Poisson bootstrap
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds, computed once so the Spark literals and the
# oracle SQL embed the IDENTICAL doubles (repr round-trips).
_E1 = math.exp(-1.0)
_POIS_CDF: list[float] = []
_term, _cum = _E1, 0.0
for _k in range(7):
    _cum = _cum + _term
    _POIS_CDF.append(_cum)
    _term = _term / (_k + 1)

_N_REPS = 30


def _pois_w_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 7 END"


def _pois_w_col(u):
    w = F.lit(7)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    return w


@query(
    "x103_poisson_bootstrap",
    oracle=f"""
    WITH r AS (SELECT UNNEST(GENERATE_SERIES(0, {_N_REPS - 1})) AS rep),
    u AS (
      SELECT r.rep, l.l_extendedprice,
             ('0x' || SUBSTRING(MD5(CONCAT('boot:', CAST(r.rep AS VARCHAR),
                ':', CAST(l.l_orderkey AS VARCHAR), ':',
                CAST(l.l_linenumber AS VARCHAR))), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM lineitem l, r
    ),
    w AS (SELECT rep, l_extendedprice, {_pois_w_sql("u")} AS w FROM u)
    SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff,
           {_r6("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * w) AS DOUBLE)"
                " / CAST(SUM(w) AS BIGINT)")} AS boot_mean
    FROM w GROUP BY rep
    """,
)
def x103_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty tier: the POISSON BOOTSTRAP — per-replicate weighted
    means of l_extendedprice under independent Poisson(1) row weights
    (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams", Google 2012 — the public method). THE bootstrap that
    survives a cluster: classic resampling needs n draws WITH
    replacement from a distributed corpus (a shuffle per replicate);
    Poissonization makes each row's replicate weight an independent
    draw computable row-locally, so all 30 replicates ride ONE corpus
    scan and the map-side partial aggregation hands the shuffle 30
    rows per partition. Weights come from the repo's md5-prefix
    uniform (seeded 'boot:rep:orderkey:linenumber'), so any engine,
    partitioning, or replay regenerates the identical resample —
    which is exactly what lets DuckDB hash-certify a *randomized*
    algorithm end-to-end.

    The scan is widened to cores BEFORE the 30x explode (shuffle N
    rows, not 30N): the replicate expansion is 30 md5+conv evaluations
    per source row, and the r11 measurement caught the compact sf0.1
    lineitem file capping exactly that work at 2-split parallelism
    (22.4s, flat to 10x — the same under-split scan tax as SCALE.md's
    widen tier)."""
    li = load_table(spark, sf_dir, "lineitem")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"), F.col("rep").cast("string"),
                        F.lit(":"), F.col("l_orderkey").cast("string"),
                        F.lit(":"), F.col("l_linenumber").cast("string"),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        widen_to_cores(
            li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        )
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(_N_REPS - 1))))
        .withColumn("u", u)
        .withColumn("w", _pois_w_col(F.col("u")))
        .groupBy("rep")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            round6_bin(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)") * F.col("w")
                ).cast("double")
                / F.sum("w").cast("long")
            ).alias("boot_mean"),
        )
    )


# ---------------------------------------------------------------------------
# x104 — delete-one-bucket jackknife
# ---------------------------------------------------------------------------

_JK_B = 20

@query(
    "x104_jackknife_mean",
    oracle=f"""
    WITH b AS (
      SELECT o_custkey % {_JK_B} AS bucket,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT SUM(s) AS st, CAST(SUM(n) AS BIGINT) AS nt FROM b),
    loo AS (
      SELECT bucket,
             CAST(FLOOR(CAST(tot.st - b.s AS DOUBLE)
                        / CAST(tot.nt - b.n AS BIGINT)
                        * 1000000.0 + 0.5) AS BIGINT) AS theta_micro
      FROM b, tot
    ),
    dev AS (
      SELECT CAST({_JK_B} * theta_micro
               - (SELECT CAST(SUM(theta_micro) AS BIGINT) FROM loo)
             AS BIGINT) AS dm
      FROM loo
    )
    SELECT CAST({_JK_B} AS BIGINT) AS n_buckets,
           (SELECT {_r6("CAST(st AS DOUBLE) / nt")} FROM tot) AS theta_hat,
           {_r6(f"SQRT(CAST(SUM(CAST(dm AS DECIMAL(19,0)) * dm) AS DOUBLE)"
                f" * {_JK_B - 1}.0"
                f" / ({_JK_B}.0 * {_JK_B}.0 * {_JK_B}.0) / 1e12)")} AS jk_se
    FROM dev
    """,
)
def x104_jackknife_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty tier: DELETE-ONE-BUCKET jackknife SE of the mean
    order price — the deterministic sibling of x103's bootstrap (the
    'delete-a-group jackknife' used when replicate weights must be
    exactly reproducible, e.g. for audited metrics). Rows hash into
    20 buckets (custkey mod); each leave-one-bucket-out mean is exact
    integer micro-units (FLOOR(x*1e6+0.5) -> BIGINT), so the
    squared-deviation sum runs in exact DECIMAL and the only floating
    ops are per-bucket divisions and the final sqrt — bit-stable under
    any partitioning or engine.

    100 TB: one corpus scan into 20 (sum, count) cells via map-side
    combine; everything after is a 20-row frame. Compare the classic
    jackknife's n leave-one-OUT passes — delete-a-GROUP is the form
    that scales."""
    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy((F.col("o_custkey") % _JK_B).alias("bucket")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("s"),
        F.count("*").alias("n"),
    )
    tot = b.agg(
        F.sum("s").alias("st"), F.sum("n").alias("nt")
    )
    loo = b.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.floor(
            (F.col("st") - F.col("s")).cast("double")
            / (F.col("nt") - F.col("n"))
            * 1000000.0
            + 0.5
        ).cast("bigint").alias("theta_micro"),
        "st", "nt",
    )
    ssum = loo.agg(F.sum("theta_micro").alias("sum_tm"))
    dev = loo.crossJoin(F.broadcast(ssum)).select(
        "st", "nt",
        # exact BIGINT deviation in micro-units; the square runs in
        # DECIMAL(19,0)*BIGINT (fits both engines' 38-digit cap)
        (F.lit(_JK_B) * F.col("theta_micro") - F.col("sum_tm")).alias("dm"),
    )
    return dev.groupBy().agg(
        F.lit(_JK_B).cast("long").alias("n_buckets"),
        round6_bin(
            F.first("st").cast("double") / F.first("nt")
        ).alias("theta_hat"),
        round6_bin(
            F.sqrt(
                F.sum(F.col("dm").cast("decimal(19,0)") * F.col("dm"))
                .cast("double")
                * float(_JK_B - 1)
                / (float(_JK_B) * float(_JK_B) * float(_JK_B))
                / 1e12
            )
        ).alias("jk_se"),
    )


# ---------------------------------------------------------------------------
# x105 — decile lift / cumulative gains
# ---------------------------------------------------------------------------

@query(
    "x105_decile_lift",
    oracle=f"""
    WITH scored AS (
      SELECT NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    d AS (
      SELECT decile, COUNT(*) AS n, SUM(pos) AS n_pos
      FROM scored GROUP BY decile
    ),
    c AS (
      SELECT decile, n, n_pos,
             SUM(n) OVER (ORDER BY decile) AS cum_n,
             SUM(n_pos) OVER (ORDER BY decile) AS cum_pos,
             SUM(n) OVER () AS tot_n,
             SUM(n_pos) OVER () AS tot_pos
      FROM d
    )
    SELECT decile, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           {_r6("n_pos / CAST(n AS DOUBLE)")} AS resp_rate,
           {_r6("cum_pos / CAST(tot_pos AS DOUBLE)")} AS cum_capture,
           {_r6("(n_pos / CAST(n AS DOUBLE)) / (tot_pos / CAST(tot_n AS DOUBLE))")}
             AS lift
    FROM c
    """,
)
def x105_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-eval tier: the decile LIFT / cumulative-gains table —
    score = order price, outcome = urgent priority; rows rank into
    NTILE(10) deciles (deterministic tie-break on the key), and each
    decile reports response rate, cumulative capture, and lift over
    base rate. Completes the eval family next to x86 (AUC) and x91
    (calibration): AUC summarizes ranking, calibration checks the
    probabilities, lift is the business-facing 'how much better than
    random is the top decile'. All ratios are int/int -> identical
    doubles in both engines.

    100 TB note: NTILE over a global ORDER BY is a full sort — the
    honest cost of exact deciles; the approximate path is x84's
    histogram quantiles. The per-decile aggregate after it is 10
    rows."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        F.ntile(10)
        .over(Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
        .alias("decile"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("pos"),
    )
    d = scored.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("pos").alias("n_pos")
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = d.select(
        "decile", "n", "n_pos",
        F.sum("n").over(wcum).alias("cum_n"),
        F.sum("n_pos").over(wcum).alias("cum_pos"),
        F.sum("n").over(wall).alias("tot_n"),
        F.sum("n_pos").over(wall).alias("tot_pos"),
    )
    return c.select(
        "decile",
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        round6_bin(F.col("n_pos") / F.col("n").cast("double")).alias("resp_rate"),
        round6_bin(
            F.col("cum_pos") / F.col("tot_pos").cast("double")
        ).alias("cum_capture"),
        round6_bin(
            (F.col("n_pos") / F.col("n").cast("double"))
            / (F.col("tot_pos") / F.col("tot_n").cast("double"))
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# b65 — MySQL forgiving-cast semantics via try_*
# ---------------------------------------------------------------------------

@query(
    "b65_forgiving_casts",
    oracle=f"""
    SELECT p_partkey,
           COALESCE(TRY_CAST(p_name AS BIGINT), 0) AS int_from_name,
           COALESCE(TRY_CAST(CAST(p_size AS VARCHAR) AS BIGINT), 0) AS int_from_size,
           CASE WHEN p_size = 7 THEN NULL
                ELSE {_r6("p_retailprice / (p_size - 7)")} END AS safe_ratio,
           CAST(TRY_CAST(CONCAT('2024-',
                           LPAD(CAST(p_size % 13 AS VARCHAR), 2, '0'),
                           '-15') AS DATE) AS VARCHAR) AS maybe_date
    FROM part WHERE p_partkey < 500
    """,
)
def b65_forgiving_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-series dialect row: MySQL's FORGIVING cast/division semantics
    via Spark's try_* family — the error-safe twin of B11's strict
    CAST row. The reference's MySQL backend (reference
    src/loader.py:231 delegates all SQL to it) never raises on bad
    input: CAST('abc' AS SIGNED) -> 0, x/0 -> NULL, invalid dates ->
    NULL. Under Spark's default ANSI mode those THROW — so the
    faithful translation is try_cast/try_divide (+ COALESCE for
    MySQL's 0-on-garbage), which this query certifies column by
    column: non-numeric cast -> 0, numeric round-trip -> value,
    division by zero -> NULL (try_divide), invalid month-00 date ->
    NULL, valid dates -> parsed. Row-local codegen'd expressions —
    nothing here shuffles at any scale."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.coalesce(F.expr("try_cast(p_name AS BIGINT)"), F.lit(0)).alias(
            "int_from_name"
        ),
        F.coalesce(
            F.expr("try_cast(CAST(p_size AS STRING) AS BIGINT)"), F.lit(0)
        ).alias("int_from_size"),
        round6_bin(
            F.try_divide(F.col("p_retailprice"), F.col("p_size") - 7)
        ).alias("safe_ratio"),
        # emitted as a STRING (repo timestamp contract): a DATE column
        # reaches pandas as datetime64 from DuckDB but date objects from
        # Spark, and their str() forms differ
        F.expr(
            "CAST(try_cast(concat('2024-', lpad(CAST(p_size % 13 AS STRING),"
            " 2, '0'), '-15') AS DATE) AS STRING)"
        ).alias("maybe_date"),
    )
