"""Single source of schema truth (SURVEY.md par.1.4: "one schemas.py
module with StructType constants").

Two schema families:

* Reference entities -- the warehouse tables the reference app models
  (``src/types/index.ts:1-49``, ``supabase-schema.sql``,
  ``supabase/functions/clay-webhook/index.ts:76-96``).  Used by the
  ingest-normalization and ledger operators.
* Driver test tables -- the TPC-H-ish fixtures the correctness oracle
  runs on (FIXTURES.md section B).  Parquet carries its own schema; these
  constants exist for validation and for building empty/inline frames.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference entities
# --------------------------------------------------------------------------

def _s(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.StringType(), nullable)


#: companies_basic_crunchbase_data -- src/types/index.ts:1-15
COMPANY = T.StructType(
    [
        _s("id", nullable=False),
        _s("company_name", nullable=False),
        _s("company_domain"),
        _s("company_linkedin_url"),
        _s("full_description"),
        _s("short_description"),
        _s("employee_range"),
        _s("city"),
        _s("state"),
        _s("country"),
        _s("notes"),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

#: clay_webhooks -- supabase-schema.sql:4-12 + src/types/index.ts:17-26
WEBHOOK = T.StructType(
    [
        _s("id", nullable=False),
        _s("name", nullable=False),
        _s("webhook_url", nullable=False),
        _s("description"),
        _s("employee_range"),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

#: company_sends ledger -- supabase-schema.sql:15-22 (+ batch_id drift,
#: src/app/api/send/route.ts:141-147)
COMPANY_SEND = T.StructType(
    [
        _s("id", nullable=False),
        _s("company_id", nullable=False),
        _s("webhook_id"),
        _s("employee_range"),
        _s("batch_id"),
        T.StructField("sent_at", T.TimestampType()),
        _s("status"),
    ]
)

#: clay_find_people whitelist -- clay-webhook/index.ts:76-91.  Order
#: matters: it is the ingest projection order.
PEOPLE_FIELDS = [
    "first_name",
    "last_name",
    "full_name",
    "company_name",
    "company_domain",
    "job_title",
    "location",
    "domain",
    "person_linkedin_url",
    "last_experience_title",
    "last_experience_company",
    "last_experience_start_date",
    "notes",
    "company_linkedin_url",
]

PERSON = T.StructType([_s(f) for f in PEOPLE_FIELDS])

#: clay_enrichment_logs -- clay-webhook/index.ts:60-67,118-125
ENRICHMENT_LOG = T.StructType(
    [
        _s("batch_id"),
        T.StructField("records_received", T.IntegerType()),
        T.StructField("records_inserted", T.IntegerType()),
        _s("status", nullable=False),
        _s("error_message"),
        _s("source_ip"),
    ]
)

#: _batch_metadata transient struct -- src/app/api/send/route.ts:104-110
BATCH_METADATA = T.StructType(
    [
        _s("batch_id"),
        _s("batch_timestamp"),
        _s("employee_range"),
        _s("webhook_name"),
        _s("source"),
    ]
)

# --------------------------------------------------------------------------
# Domain constants -- src/types/index.ts:52-85
# --------------------------------------------------------------------------

EMPLOYEE_RANGES = [
    "1-10",
    "11-50",
    "51-100",
    "101-250",
    "251-500",
    "501-1000",
    "1001-5000",
    "5001-10000",
    "10001+",
    "not sure",
]

EMPLOYEE_RANGE_MAX = {
    "1-10": 10,
    "11-50": 50,
    "51-100": 100,
    "101-250": 250,
    "251-500": 500,
    "501-1000": 1000,
    "1001-5000": 5000,
    "5001-10000": 10000,
    "10001+": 15000,  # estimate, src/types/index.ts:78
    "not sure": 50000,  # worst case, src/types/index.ts:79
}

#: 50k external limit minus buffer -- src/types/index.ts:66-67
SAFE_PEOPLE_LIMIT = 40000

#: unknown ranges fall back to max 10 -- src/types/index.ts:83
DEFAULT_RANGE_MAX = 10

# --------------------------------------------------------------------------
# Driver test tables (FIXTURES.md section B) -- names only; Parquet owns
# the physical schema.
# --------------------------------------------------------------------------

TEST_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
