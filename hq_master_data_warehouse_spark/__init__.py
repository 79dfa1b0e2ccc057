"""PySpark-native analytics engine with the query and data-processing
capabilities of bencrane/hq-master-data-warehouse.

The reference is a TypeScript master-data-warehouse web app (Next.js +
Supabase/Postgres).  This package re-expresses every data operation it
performs -- scans, predicate filters, anti/semi/equi joins, bucketed
grouped counts, capacity-constrained distribution, whitelist ingest
normalization, append ledgers, streaming-shaped webhook flows -- as
idiomatic Spark DataFrame / SQL plans, plus the LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns)
required by the north star.  See SURVEY.md for the full operator
inventory and file:line citations into the reference.

Design stance (SURVEY.md par.7): DataFrame-API core with SQL parity, a
single schema module as source of truth, every operator a pure function
``(spark, sf_dir) -> DataFrame`` registered in the query catalog, zero
custom Catalyst rules, zero row-at-a-time Python UDFs on the hot path.
"""

__version__ = "0.1.0"
