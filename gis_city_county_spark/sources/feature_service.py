"""Python DataSource V2 for paged feature-service snapshots (S1).

The reference pulls an ArcGIS feature layer in one driver-side call —
``FeatureLayer(url).query()`` (``src/bunnyhop/bunny.py:211-219``,
``src/bunnyhop/coastline.py:36-42``) — which downloads every page of
the REST ``/query`` endpoint (``resultOffset`` paging) into local
memory. At 100 TB that driver hop is the bottleneck, so this source
makes the paged layout a first-class *distributed* scan:

* a snapshot directory holds one JSON file per ``/query`` response
  page (``{"features": [{"attributes": {...}}, ...]}`` — the ArcGIS
  wire shape);
* each page is one :class:`InputPartition`, so pages parse in
  parallel across executors and the scan scales with page count;
* equality/IsNotNull filters are pushed into the page parse
  (``pushFilters``), so a selective query never materializes
  non-matching rows — the Python-source analogue of parquet
  predicate pushdown.

A production deployment pairs this with a fetcher that pages the live
endpoint into the snapshot dir on a schedule; the engine only ever
reads snapshots (same stance as ``read_feature_snapshot``, which
handles single-file GeoJSON).

Usage (pushdown needs ``spark.sql.python.filterPushdown.enabled``)::

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FeatureServicePages)
    df = (spark.read.format("feature_service_pages")
          .schema("CITY string, COPRI string, POP bigint")
          .option("path", snapshot_dir).load())
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _PagesReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("feature_service_pages requires option 'path'")
        self.eq: list[tuple[str, object]] = []
        self.notnull: list[str] = []

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self.eq.append((f.attribute[0], f.value))
            elif isinstance(f, IsNotNull) and len(f.attribute) == 1:
                self.notnull.append(f.attribute[0])
            else:
                yield f  # unsupported → Spark keeps evaluating it

    def partitions(self) -> list[InputPartition]:
        pages = sorted(
            f for f in os.listdir(self.dir) if f.endswith(".json")
        )
        return [_PagePartition(os.path.join(self.dir, f)) for f in pages]

    def read(self, partition: _PagePartition):
        with open(partition.path) as fh:
            page = json.load(fh)
        names = [f.name for f in self.schema.fields]
        for feat in page.get("features", []):
            attrs = feat.get("attributes", {})
            if any(attrs.get(c) != v for c, v in self.eq):
                continue
            if any(attrs.get(c) is None for c in self.notnull):
                continue
            yield tuple(attrs.get(n) for n in names)


class FeatureServicePages(DataSource):
    """``spark.read.format("feature_service_pages")`` — see module
    docstring."""

    @classmethod
    def name(cls) -> str:
        return "feature_service_pages"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _PagesReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return _PagesWriter(self.options, overwrite)


def fetch_feature_pages(
    url: str,
    dest_dir: str,
    page_size: int = 1000,
    where: str = "1=1",
    out_fields: str = "*",
    fetch=None,
) -> int:
    """Driver-side fetcher that pages a LIVE feature-service ``/query``
    endpoint into a snapshot directory readable by
    :class:`FeatureServicePages` (mirrors the reference's
    ``FeatureLayer(url).query()`` pull, ``bunny.py:211-219`` /
    ``coastline.py:36-42``, but keeps the paged layout so the
    subsequent scan is distributed).

    Paging protocol: ``resultOffset``/``resultRecordCount`` with the
    standard ArcGIS REST parameters; stops when a page comes back empty
    or the server stops setting ``exceededTransferLimit``. Each page is
    written to a temp name and atomically renamed, so a concurrent
    reader of ``dest_dir`` never sees a half-written page; stale pages
    from a previous snapshot are cleared first.

    ``fetch`` (params -> parsed JSON dict) is injectable for tests; the
    default GETs ``url`` with ``requests``. Control-plane only — no
    Spark involvement; the distributed half is the DSv2 scan."""
    if fetch is None:
        import requests

        def fetch(params):  # pragma: no cover - exercised via injection
            resp = requests.get(url, params=params, timeout=60)
            resp.raise_for_status()
            return resp.json()

    import re as _re

    os.makedirs(dest_dir, exist_ok=True)
    # Clear only OUR page files — the snapshot layout stores other
    # .json artifacts (e.g. the .metadata.json sidecar) in the same
    # directory; a blanket *.json sweep would delete them.
    page_pat = _re.compile(r"^(\.tmp-)?page_\d+\.json$")
    for f in os.listdir(dest_dir):
        if page_pat.match(f):
            os.remove(os.path.join(dest_dir, f))
    offset = page_no = 0
    while True:
        page = fetch(
            {
                "where": where,
                "outFields": out_fields,
                "f": "json",
                "resultOffset": offset,
                "resultRecordCount": page_size,
            }
        )
        feats = page.get("features", [])
        if not feats:
            break
        tmp = os.path.join(dest_dir, f".tmp-page_{page_no:05d}.json")
        with open(tmp, "w") as fh:
            json.dump({"features": feats}, fh)
        os.replace(tmp, os.path.join(dest_dir, f"page_{page_no:05d}.json"))
        page_no += 1
        offset += len(feats)
        # Stop ONLY on an explicit exceededTransferLimit=false. When
        # the server omits the flag, keep paging until an empty page:
        # a server capped below the requested resultRecordCount (ArcGIS
        # maxRecordCount) returns short-but-full pages, and a
        # len == page_size heuristic would silently truncate the pull.
        if not page.get("exceededTransferLimit", True):
            break
    return page_no


def write_pages(rows: list[dict], dest_dir: str, page_size: int = 1000) -> int:
    """Helper for the snapshot-fetcher side: split attribute rows into
    ArcGIS-shaped page files. Returns the page count."""
    os.makedirs(dest_dir, exist_ok=True)
    n_pages = 0
    for i in range(0, max(len(rows), 1), page_size):
        page = {"features": [{"attributes": r} for r in rows[i : i + page_size]]}
        with open(os.path.join(dest_dir, f"page_{i // page_size:05d}.json"), "w") as fh:
            json.dump(page, fh)
        n_pages += 1
    return n_pages


class _PageCommit(WriterCommitMessage):
    def __init__(self, staged: str, final: str):
        self.staged = staged
        self.final = final


class _PagesWriter(DataSourceWriter):
    """Per-partition page writer with a two-phase commit: tasks write
    ``.staged-*`` files (safe under speculative/retried tasks — each
    attempt re-stages its partition), the driver's ``commit`` renames
    the winning set into place atomically-per-file, and ``abort``
    removes every staged file. Mirrors the FileOutputCommitter
    contract the parquet sink uses."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("feature_service_pages requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator) -> _PageCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # Stage per-ATTEMPT, not per-partition: a speculative or retried
        # attempt of the same task must not write the same staged file
        # concurrently (interleaved json.dump would corrupt it — the
        # FileOutputCommitter contract this mirrors uses per-attempt
        # paths). The driver renames only the winning attempt's file.
        attempt = ctx.taskAttemptId()
        os.makedirs(self.dir, exist_ok=True)
        final = f"page_{pid:05d}.json"
        staged = os.path.join(self.dir, f".staged-{final}.attempt-{attempt}")
        feats = [{"attributes": row.asDict()} for row in iterator]
        with open(staged, "w") as fh:
            json.dump({"features": feats}, fh)
        return _PageCommit(staged, os.path.join(self.dir, final))

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.dir):
                if f.endswith(".json") and not f.startswith("."):
                    os.remove(os.path.join(self.dir, f))
        for m in messages:
            os.replace(m.staged, m.final)
        # Losing speculative attempts' staged files were never in
        # `messages`; sweep them so the dir holds only committed pages.
        for f in os.listdir(self.dir):
            if f.startswith(".staged-"):
                os.remove(os.path.join(self.dir, f))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        if os.path.isdir(self.dir):
            for f in os.listdir(self.dir):
                if f.startswith(".staged-"):
                    os.remove(os.path.join(self.dir, f))
