"""JSON ingest source family (SURVEY ops S10, F8, C10 + U1 explode).

The reference's ingest webhook parses a JSON body that may be a single
object or an array, normalizes it to a record list
(clay-webhook/index.ts:47-50), and whitelist-projects each record onto
14 allowed fields with null-coalescing (:76-91).

Spark: ``from_json`` with an explicit schema (schema-on-write, like the
reference's whitelist map), scalar-vs-array polymorphism handled by
parsing both ways and coalescing, then ``explode``.  Batch mode reads
dropped JSON files; streaming mode is the same plan under
``readStream`` (see streaming.jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..schemas import PEOPLE_FIELDS
from .loaders import load_table


# -- C10/S10: parse embedded JSON with an explicit schema.  The
#    ``events.props`` column plays the webhook payload body.
@query(
    "ingest_json_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR)
               AS missing_field
    FROM events
    """,
)
def ingest_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_id",
        F.from_json("props", "k INT, missing STRING").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.col("p.missing").alias("missing_field"),
    )


# -- S10 normalization: scalar-vs-array polymorphism + explode.  The
#    split/explode shape also covers U1-style row multiplication.
@query(
    "ingest_explode_records",
    oracle="""
    SELECT o_orderkey,
           unnest(string_split(o_orderpriority, '-')) AS part
    FROM orders
    """,
)
def ingest_explode_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.explode(F.split("o_orderpriority", "-")).alias("part"),
    )


def normalize_payload(raw: DataFrame, payload_col: str = "value") -> DataFrame:
    """Scalar-or-array JSON payload -> one row per person record with
    the 14-field whitelist projection (clay-webhook/index.ts:47-50 +
    76-91).

    ``raw`` holds one JSON document per row (e.g. from
    ``spark.read.text`` over a webhook drop directory).  Documents that
    parse as arrays explode to N rows; documents that parse as single
    objects contribute one row; unknown fields are dropped by the
    explicit schema; absent fields surface as NULL.  The JS ``|| null``
    also nullifies empty strings -- matched via the trim-length guard.
    """
    person_schema = ", ".join(f"{f} STRING" for f in PEOPLE_FIELDS)
    as_array = F.from_json(F.col(payload_col), f"ARRAY<STRUCT<{person_schema}>>")
    as_object = F.from_json(F.col(payload_col), f"STRUCT<{person_schema}>")
    records = raw.select(
        F.explode(
            F.coalesce(as_array, F.array(as_object))
        ).alias("rec")
    )

    def norm(field: str):
        c = F.col(f"rec.{field}")
        return (
            F.when(F.length(F.trim(c)) == 0, F.lit(None)).otherwise(c)
        ).alias(field)

    return records.select(*[norm(f) for f in PEOPLE_FIELDS])


QUARANTINE_BAD_ROWS = 7


@query(
    "ingest_quarantine_bad_records",
    # The staged feed is every events row serialized as JSON plus
    # QUARANTINE_BAD_ROWS corrupt lines, so the outcome counts are a
    # SQL-statable invariant: the Spark side must recover EXACTLY the
    # event count as clean and exactly the injected bad lines as
    # quarantined -- a real differential on the permissive parse.
    oracle=f"""
    SELECT 'clean' AS outcome, COUNT(*) AS n FROM events
    UNION ALL
    SELECT 'quarantined', {QUARANTINE_BAD_ROWS}
    """,
)
def ingest_quarantine_bad_records(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bad-record quarantine: a JSONL feed with deliberately corrupt
    lines read in PERMISSIVE mode with ``columnNameOfCorruptRecord``,
    then split into clean rows vs a quarantine count -- the
    poison-pill handling every production ingest needs (FAILFAST
    aborts a 1000-executor job for one bad byte; DROPMALFORMED loses
    evidence).  Returns one row per outcome with counts; the parity
    pytest pins exact clean/quarantined numbers."""
    import os
    import tempfile

    import hashlib as _h

    # Staging tag keyed on fixture CONTENT (size+mtime of the events
    # parquet), not just the directory name: regenerating the fixture
    # at the same path invalidates the cache instead of serving a
    # stale feed whose clean count diverges from the fresh oracle.
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        stamp = f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        stamp = sf_dir
    tag = _h.md5(stamp.encode()).hexdigest()[:8]
    path = os.path.join(
        tempfile.gettempdir(), f"hqmdw_quarantine_{tag}_dir"
    )
    if not os.path.exists(path):
        # Stage the feed DISTRIBUTED (df.write, not a driver collect
        # loop): clean rows land as executor-written part files; the
        # poison-pill lines are appended as one extra small file in
        # the same directory -- the JSON reader lists the directory,
        # so the union is the feed.  Write-then-rename keeps the
        # staging atomic for concurrent callers.
        tmp = path + ".tmp"
        (
            load_table(spark, sf_dir, "events")
            .select(
                F.to_json(
                    F.struct("event_id", "user_id", "event_type")
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(tmp)
        )
        with open(os.path.join(tmp, "bad_records.jsonl"), "w") as f:
            for _ in range(QUARANTINE_BAD_ROWS):
                f.write('{"event_id": 12, "user_id": ???}\n')
        os.rename(tmp, path)
    feed = (
        spark.read.schema(
            "event_id BIGINT, user_id BIGINT, event_type STRING, "
            "_corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # Spark disallows referencing ONLY the corrupt-record column
        # of a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
        # caching materializes the parse first, per its own guidance.
        .cache()
    )
    return feed.select(
        F.when(F.col("_corrupt_record").isNull(), "clean")
        .otherwise("quarantined")
        .alias("outcome")
    ).groupBy("outcome").agg(F.count("*").alias("n"))
