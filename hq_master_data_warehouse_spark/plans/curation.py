"""End-to-end corpus-curation pipeline (north-star flagship for the
LLM-data-pipeline surface): exact dedup → quality filter → stable
train/holdout split → per-(split, lang) corpus stats, composed from
the individual operators as ONE declarative plan.

Every stage is deterministic (md5 fingerprints, expression-based
quality score, md5 split), so the whole pipeline is oracle-checked in
a single SQL twin -- the differential test covers the composition, not
just the pieces.

Scale shape: one scan of the corpus; dedup is a partitioned window on
the fingerprint (shuffle 1); the final stats aggregate is shuffle 2.
Quality scoring and splitting are pure projections fused into
whichever stage reads them -- nothing materializes between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import CANONICAL_SQL, canonical_text
from ..operators.text import _QUALITY_SCORE_SQL, quality_raw_score
from ..operators.sampling import SPLIT_CUT, hash_split
from ..registry import query
from ..sources.loaders import load_table

QUALITY_CUT = 0.5


@query(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH deduped AS (
        SELECT doc_id, text, lang
        FROM (
            SELECT doc_id, text, lang,
                   row_number() OVER (
                       PARTITION BY md5({CANONICAL_SQL})
                       ORDER BY doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn = 1
    ),
    scored AS (
        SELECT doc_id, lang,
               length(text) AS n_chars_kept
        FROM deduped
        WHERE {_QUALITY_SCORE_SQL} >= {QUALITY_CUT}
    )
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                     < '{SPLIT_CUT}'
                THEN 'train' ELSE 'holdout' END AS split,
           lang,
           COUNT(*) AS n_docs,
           SUM(n_chars_kept) AS total_chars
    FROM scored
    GROUP BY 1, 2
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(canonical_text(F.col("text")))
    w = Window.partitionBy(fp).orderBy("doc_id")
    deduped = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    scored = deduped.filter(
        quality_raw_score(F.col("text")) >= QUALITY_CUT
    )
    return (
        hash_split(scored, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )
