"""Round-7 batch-3 extensions, curation/annotation tier: majority-vote
label aggregation and chance-corrected inter-annotator agreement (the
RLHF-labeling rungs), per-source distribution-shift divergence (KL/JS
vs the corpus mix), deterministic weighted curriculum interleaving (the
ORDER a mixing spec compiles to), and MAD-based robust outlier stats.

Every query is a Catalyst-only DataFrame program with a DuckDB oracle
twin following the registry determinism contract
(sheetsetl_spark/queries/__init__.py): float terms round to 6 dp FIRST
where summed and accumulate in exact DECIMAL, rankings carry unique
tiebreaks, and integer-derived ratios divide exact integers so both
engines see identical doubles.

The annotation queries derive a synthetic judgment table from events —
example = event_id % 200, annotator = user_id, label = event_type —
because the fixture has no annotation table; the derivation is stated
in both the Spark program and the oracle so the driver checks the same
semantics end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query

_ANNOT_BUCKETS = 200

_ANNOT_PAIRS_SQL = f"""
  SELECT DISTINCT event_id % {_ANNOT_BUCKETS} AS example,
                  user_id AS annotator, event_type AS label
  FROM events
"""


def _annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        (F.col("event_id") % _ANNOT_BUCKETS).alias("example"),
        F.col("user_id").alias("annotator"),
        F.col("event_type").alias("label"),
    )


@query(
    "c63_majority_vote",
    oracle=f"""
    WITH pairs AS ({_ANNOT_PAIRS_SQL}),
    votes AS (
      SELECT example, label, COUNT(*) AS votes
      FROM pairs GROUP BY example, label
    ),
    ranked AS (
      SELECT example, label, CAST(votes AS BIGINT) AS votes,
             CAST(SUM(votes) OVER (PARTITION BY example) AS BIGINT)
               AS n_annotations,
             ROW_NUMBER() OVER (
               PARTITION BY example ORDER BY votes DESC, label ASC) AS rn
      FROM votes
    )
    SELECT example, label, votes, n_annotations,
           ROUND(CAST(votes AS DOUBLE) / n_annotations, 6) AS agreement
    FROM ranked WHERE rn = 1 ORDER BY example
    """,
)
def c63_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (annotation tier): consensus label per example —
    modal label with deterministic lexicographic tie-break
    (operators/annotation.py::majority_vote). The collapse step every
    human-labeled / RLHF dataset needs before training; agreement per
    example is what routes low-consensus items to re-review."""
    from sheetsetl_spark.operators import annotation

    return annotation.majority_vote(
        _annotations(spark, sf_dir), "example", "annotator", "label"
    ).orderBy("example")


@query(
    "c66_annotator_agreement",
    oracle=f"""
    WITH pairs AS ({_ANNOT_PAIRS_SQL}),
    counts AS (
      SELECT example, label, COUNT(*) AS nij
      FROM pairs GROUP BY example, label
    ),
    per_ex AS (
      SELECT example, SUM(nij) AS ni, SUM(nij * (nij - 1)) AS same_pairs
      FROM counts GROUP BY example
    ),
    po AS (
      SELECT CAST(SUM(CAST(ROUND(CAST(same_pairs AS DOUBLE)
                                   / (ni * (ni - 1)), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS po_raw,
             CAST(COUNT(*) AS BIGINT) AS n_examples
      FROM per_ex WHERE ni > 1
    ),
    shares AS (SELECT label, SUM(nij) AS nj FROM counts GROUP BY label),
    pe AS (
      SELECT CAST(SUM(nj) AS BIGINT) AS n_ratings,
             CAST(SUM(nj * nj) AS DOUBLE)
               / (CAST(SUM(nj) AS BIGINT) * CAST(SUM(nj) AS BIGINT)) AS pe_raw
      FROM shares
    )
    SELECT ROUND(po_raw, 6) AS po, ROUND(pe_raw, 6) AS pe,
           ROUND((po_raw - pe_raw) / (1.0 - pe_raw), 6) AS kappa,
           n_examples, n_ratings
    FROM po, pe
    """,
)
def c66_annotator_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (annotation tier): corpus-level chance-corrected
    inter-annotator agreement — the generalized Fleiss/Scott kappa
    (operators/annotation.py::agreement_statistic). One scalar row; the
    health metric a labeling pipeline alarms on when raters drift."""
    from sheetsetl_spark.operators import annotation

    return annotation.agreement_statistic(
        _annotations(spark, sf_dir), "example", "annotator", "label"
    )


@query(
    "c64_domain_divergence",
    oracle="""
    WITH cell AS (
      SELECT source AS grp, lang AS cls, COUNT(*) AS n
      FROM documents GROUP BY source, lang
    ),
    per_class AS (SELECT cls, SUM(n) AS n_cls FROM cell GROUP BY cls),
    tot AS (SELECT SUM(n_cls) AS n_total FROM per_class),
    qd AS (
      SELECT cls, n_cls, CAST(n_cls AS DOUBLE) / n_total AS q
      FROM per_class, tot
    ),
    grp_tot AS (SELECT grp, SUM(n) AS n_rows FROM cell GROUP BY grp),
    scored AS (
      SELECT c.grp,
             ROUND(p * LN(p / q), 6) AS kl_term,
             ROUND(0.5 * p * LN(p / ((p + q) / 2))
                   + 0.5 * q * LN(q / ((p + q) / 2)), 6) AS js_term
      FROM (SELECT cell.grp, cell.cls,
                   CAST(cell.n AS DOUBLE) / g.n_rows AS p
            FROM cell JOIN grp_tot g ON cell.grp = g.grp) c
      JOIN qd ON c.cls = qd.cls
    ),
    present AS (
      SELECT c.grp,
             CAST(t.n_total - SUM(qd.n_cls) AS DOUBLE) / t.n_total AS absent_q
      FROM cell c JOIN qd ON c.cls = qd.cls, tot t
      GROUP BY c.grp, t.n_total
    ),
    agg AS (
      SELECT grp,
             CAST(SUM(CAST(kl_term AS DECIMAL(18,6))) AS DOUBLE) AS kl_raw,
             CAST(SUM(CAST(js_term AS DECIMAL(18,6))) AS DOUBLE) AS js_present
      FROM scored GROUP BY grp
    )
    SELECT a.grp AS "group", CAST(g.n_rows AS BIGINT) AS n_rows,
           ROUND(kl_raw, 6) AS kl,
           ROUND(js_present + ROUND(0.5 * p.absent_q * LN(2.0), 6), 6) AS js
    FROM agg a JOIN grp_tot g ON a.grp = g.grp JOIN present p ON a.grp = p.grp
    ORDER BY a.grp
    """,
)
def c64_domain_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (mix tier): per-source KL and Jensen-Shannon divergence
    of the language distribution vs the corpus-wide one
    (operators/profiling.py::distribution_divergence) — the drift
    statistic a data-mixing pipeline watches per ingest source, and the
    density-ratio quantity DSIR-style reweighting consumes (c41)."""
    from sheetsetl_spark.operators import profiling

    docs = load_table(spark, sf_dir, "documents")
    return profiling.distribution_divergence(docs, "source", "lang")


_INTERLEAVE_WEIGHTS = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 0.5}
_INTERLEAVE_LIMIT = 100


@query(
    "c65_curriculum_interleave",
    oracle=f"""
    WITH w(source, wt) AS (
      VALUES ('src0', 4.0), ('src1', 2.0), ('src2', 1.0), ('src3', 0.5)
    ),
    ranked AS (
      SELECT d.source, d.doc_id AS id,
             (ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.doc_id)
              - 0.5) / w.wt AS pos
      FROM documents d JOIN w ON d.source = w.source
    ),
    ordered AS (
      SELECT ROW_NUMBER() OVER (ORDER BY pos, source, id) AS ordinal,
             source, id, ROUND(pos, 6) AS position
      FROM ranked
    )
    SELECT CAST(ordinal AS INTEGER) AS ordinal, source, id, position
    FROM ordered WHERE ordinal <= {_INTERLEAVE_LIMIT} ORDER BY ordinal
    """,
)
def c65_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (mix tier): deterministic weighted interleave — the
    stride-scheduled global read order where source s holds a
    weight-proportional share of EVERY stream prefix
    (operators/layout.py::curriculum_interleave). Orders the mix c19
    decides the contents of; byte-identical on any cluster."""
    from sheetsetl_spark.operators import layout

    docs = load_table(spark, sf_dir, "documents")
    return layout.curriculum_interleave(
        docs, "source", "doc_id", _INTERLEAVE_WEIGHTS, limit=_INTERLEAVE_LIMIT
    )


@query(
    "x77_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, QUANTILE_CONT(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, ROUND(MAX(d.med), 6) AS med,
           ROUND(MAX(ma.mad), 6) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN d.adev > 3 * ma.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad ma USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def x77_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier stats: exact median, median absolute
    deviation, and the count of |x - med| > 3 * MAD — the
    quality-filter statistic that, unlike stddev (B24), is not itself
    dragged by the outliers it hunts. Two exact-percentile aggregates
    plus one conditional count; the group key is low-cardinality so the
    two small aggregate frames broadcast back onto the event scan."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )
