"""Fixture role-play for the ``company_sends`` ledger.

FIXTURES.md section C maps the ledger onto ``orders``.  Taken literally
("sent = customer has any order") every customer at sf>=0.001 has been
sent, which collapses anti-join / remaining-count semantics to empty
results.  The engine therefore narrows the role-play: a customer is
"sent" iff it has at least one URGENT order -- a deterministic subset
(~89% of customers) that exercises both sides of the anti-join, like a
partially-filled company_sends table would (supabase-schema.sql:15-22).

Every query AND its DuckDB oracle must use the same definition; both
live here so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .loaders import load_table

SENT_PREDICATE_SQL = "o_orderpriority = '1-URGENT'"


def sent_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "already sent" ledger: one row per (order) send event, with
    ``company_id`` = the customer key, mirroring
    company_sends.company_id (supabase-schema.sql:17)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.expr(SENT_PREDICATE_SQL))
        .select(F.col("o_custkey").alias("company_id"))
    )


SENT_LEDGER_SQL = (
    f"SELECT o_custkey AS company_id FROM orders WHERE {SENT_PREDICATE_SQL}"
)
