"""Pluggable source/sink edges (SURVEY.md §7 step 3).

Thin, format-parameterized wrappers over ``spark.read``/``spark.write`` so
the parquet-tested pipeline code is byte-identical to what runs against
Kafka/JDBC in production — only the edge function changes. The sandbox has
no broker/database/network, so the Kafka/JDBC/HTTP edges fail fast with
actionable errors instead of half-working (SURVEY.md §7 hard part 4).
"""
