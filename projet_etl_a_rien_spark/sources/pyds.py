"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): the
engine-native form of the reference's HTTP ingest edge.

The reference pulls paged airport JSON over HTTP with NiFi InvokeHTTP
(``nifi_data/tp.xml:1652``) and hands Spark the landed messages; Spark 4
lets the ENGINE own that edge instead — a Python DataSource whose
``partitions()`` are the API pages, so page fetches run as parallel
Spark tasks with the scan in the plan (a `BatchScan` of this source),
not a driver-side download loop.

Offline determinism: the sandbox has no network, so ``read`` SYNTHESIZES
each page's records with integer-only arithmetic (the same dirty-data
rule shapes as ``fixtures.airports_messages``: empty / non-numeric /
missing coordinates, duplicated ids). A real deployment would replace
the body of ``read`` with the HTTP GET for that page — the partitioning,
schema, and option plumbing are exactly what the live source needs; this
is the same stub discipline as ``sources/http_openaip.py``.

Registered under the short name ``airports_api``:

    spark.dataSource.register(AirportsApiDataSource)
    spark.read.format("airports_api").option("pages", 4).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DEFAULT_PAGES = 4
DEFAULT_PAGE_SIZE = 250


def synth_record(k: int) -> tuple[str, str, str, str | None, str | None]:
    """Deterministic dirty airport record for global key ``k`` (1-based).

    Integer-only derivations so any engine reproduces the values exactly
    (no float formatting): lat/lon are integer-degree strings.

    - ``k % 13 == 0`` → lat is the empty string
    - ``k % 29 == 0`` → lat is a non-numeric token
    - ``k % 17 == 0`` → lon is NULL (field missing on the wire)
    - id = k div 10 → forced duplicate ids
    """
    dup_id = str(k // 10)
    name = f"airport-{k}"
    icao = f"IC{k % 97:02d}"
    if k % 13 == 0:
        lat: str | None = ""
    elif k % 29 == 0:
        lat = "not-a-number"
    else:
        lat = str((k * 7) % 180 - 90)
    lon = None if k % 17 == 0 else str((k * 11) % 360 - 180)
    return (dup_id, name, icao, lat, lon)


class AirportsApiReader(DataSourceReader):
    def __init__(self, options):
        self.pages = int(options.get("pages", DEFAULT_PAGES))
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))

    def partitions(self):
        # one InputPartition per API page: page fetches parallelize as
        # ordinary Spark tasks and scale with the executor count
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition):
        page = partition.value
        for idx in range(self.page_size):
            k = page * self.page_size + idx + 1
            yield (page, idx, *synth_record(k))


class AirportsApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "airports_api"

    def schema(self) -> str:
        return (
            "page int, idx int, id string, name string,"
            " icao string, lat string, lon string"
        )

    def reader(self, schema):
        return AirportsApiReader(self.options)

    def simpleStreamReader(self, schema):
        return AirportsApiStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(AirportsApiDataSource)


class AirportsApiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch polling of the paged API: each poll lands ONE page and
    advances the offset {"page": n} — the engine-native form of the
    reference's 60 s NiFi InvokeHTTP timer + Kafka hop (its streaming
    job consumed the topic that timer fed). Offsets are the page
    counter, so checkpoint recovery replays from the committed page and
    ``readBetweenOffsets`` regenerates any range deterministically.
    The source is BOUNDED at ``pages`` polls: once exhausted, ``read``
    stops advancing, which lets availableNow replays terminate — a live
    deployment would let the counter grow with the feed instead."""

    def __init__(self, options):
        self.pages = int(options.get("pages", DEFAULT_PAGES))
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _page_rows(self, page: int) -> list:
        return [
            (page, idx, *synth_record(page * self.page_size + idx + 1))
            for idx in range(self.page_size)
        ]

    def read(self, start: dict):
        page = start["page"]
        if page >= self.pages:
            return iter(()), start
        # list_iterator, not a generator and not a bare list: the
        # prefetch wrapper pickles the cached iterator when planning
        # partitions (generators don't pickle) and calls next()/copy on
        # it (bare lists aren't iterators)
        return iter(self._page_rows(page)), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # consumed as an iterator in-process on the reading task (unlike
        # read()'s prefetched batch, which is pickled and must be a list)
        rows: list = []
        for page in range(start["page"], end["page"]):
            rows.extend(self._page_rows(page))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # pages are synthesized; nothing to acknowledge upstream
