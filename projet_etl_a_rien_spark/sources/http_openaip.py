"""OpenAIP HTTP ingest — reference S4/N1 semantics, Spark-shaped.

The reference polls ``GET https://api.core.openaip.net/api/airports``
with an ``x-openaip-api-key`` header every 60 s from NiFi
(``/root/reference/nifi_data/tp.xml:1652,1656,1639,1801``). Spark has no
built-in HTTP source, so the fetch is a driver-side function whose JSON
lands in ``spark.createDataFrame`` and flows through the declarative
``ingest_openaip_response`` lineage (split/extract/serialize — NiFi
N2-N4). At scale the fetch belongs outside the cluster (the API is one
page per poll — the 100 TB path is many such feeds landing in object
storage, then a file-stream source); this function is the single-poll
primitive.

No network in this sandbox: ``fetch_openaip`` raises a clear error if the
HTTP call cannot be made; the transform is fully testable with canned
documents (tests/test_airports.py).
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from ..observability import observed_edge
from ..operators.airports import ingest_openaip_response

OPENAIP_URL = "https://api.core.openaip.net/api/airports"
HTTP_TIMEOUTS = (5, 15)  # connect, read — ref tp.xml:1666-1675


def fetch_openaip(
    spark: SparkSession, api_key: str, url: str = OPENAIP_URL
) -> DataFrame:
    """One poll → (key, value) Kafka-shaped records (NiFi N1→N4 in one call)."""
    req = urllib.request.Request(url, headers={"x-openaip-api-key": api_key})
    try:
        with urllib.request.urlopen(req, timeout=HTTP_TIMEOUTS[1]) as resp:
            body = resp.read().decode("utf-8")
    except Exception as e:
        raise RuntimeError(
            f"OpenAIP fetch failed (no network in this sandbox?): {e}"
        ) from e
    json.loads(body)  # fail fast on non-JSON before shipping to executors
    responses = spark.createDataFrame([(body,)], "json string")
    # N6 LogAttribute equivalent: passive row/null metrics on the edge
    out, _ = observed_edge(ingest_openaip_response(responses), "openaip_ingest")
    return out
