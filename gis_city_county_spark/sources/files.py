"""File/service sources and staging sinks (SURVEY.md §2.1, §2.9).

Re-expresses the reference's retrieval surface Spark-first:

- S1 feature-service scan   -> GeoJSON snapshot reader (`bunny.py:211-219`,
  `coastline.py:36-42`; production would page the REST ``/query`` endpoint
  into snapshots on a schedule, the engine always reads snapshots)
- S2 streamed HTTP download -> :func:`download_file` (`retrieve.py:50-58`)
- S3 zip-member delimited   -> :func:`read_delimited` (`retrieve.py:33-37`)
- S4 Excel w/ declared dtypes -> :func:`read_xlsx` (`retrieve.py:97-106`);
  self-contained OOXML parse (zip + XML, a public format) since no xlsx
  library ships in this environment
- S6 probing discovery      -> :func:`probe_first_available`
  (`retrieve.py:70-95`)
- S7 CSV staging sink       -> :func:`write_staging_csv` (`retrieve.py:44,132`)
- K1/K3 publish + blue/green swap -> :func:`publish_snapshot` /
  :func:`read_published` (`scripts/_services.py:1-38` semantics: write the
  new version fully, then atomically repoint)

Scale notes: S2/S4/S6 are driver-side control plane (small config-ish
inputs — the reference's right-hand join sides are ≤ ~2k rows); the
data plane (S1/S3 bulk reads) goes through ``spark.read`` so scans
distribute, push filters down, and prune columns.
"""

from __future__ import annotations

import os
import re
import tempfile
import zipfile
from collections.abc import Callable, Iterable, Mapping, Sequence
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ------------------------------------------------------------------ S3

def read_delimited(
    spark: SparkSession,
    path: str,
    sep: str = "|",
    member: str | None = None,
    header: bool = True,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Delimited text reader; with ``member`` set, extracts that file
    from a zip archive first (driver-side — archive members aren't
    splittable anyway; a 100 TB corpus of zips would instead map
    ``binaryFile`` partitions through a decompress generator)."""
    src = path
    if member is not None:
        tmp = tempfile.mkdtemp(prefix="sgraft_zip_")
        with zipfile.ZipFile(path) as zf:
            src = zf.extract(member, tmp)
    reader = spark.read.option("sep", sep).option("header", str(header).lower())
    if schema is not None:
        return reader.schema(schema).csv(src)
    return reader.csv(src)


# ------------------------------------------------------------------ S4

_A1_RE = re.compile(r"([A-Z]+)(\d+)")
_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(a1: str) -> int:
    """``'A1'`` -> 0, ``'AB7'`` -> 27."""
    m = _A1_RE.match(a1)
    if not m:
        return 0
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _xlsx_rows(path: str, sheet_index: int = 0) -> list[list[str | None]]:
    """Minimal OOXML worksheet parse: shared strings + inline values.
    Covers the subset the reference's inputs use (strings, numbers);
    formulas/dates come back as their stored raw values."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_MAIN_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_MAIN_NS}t")))
        sheets = sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        root = ElementTree.fromstring(zf.read(sheets[sheet_index]))
        rows: list[list[str | None]] = []
        for row in root.iter(f"{_MAIN_NS}row"):
            cells: dict[int, str | None] = {}
            for c in row.findall(f"{_MAIN_NS}c"):
                idx = _col_index(c.get("r", ""))
                ctype = c.get("t", "n")
                v = c.find(f"{_MAIN_NS}v")
                if ctype == "s" and v is not None and v.text is not None:
                    cells[idx] = shared[int(v.text)]
                elif ctype == "inlineStr":
                    is_el = c.find(f"{_MAIN_NS}is")
                    cells[idx] = (
                        "".join(t.text or "" for t in is_el.iter(f"{_MAIN_NS}t"))
                        if is_el is not None
                        else None
                    )
                else:
                    cells[idx] = v.text if v is not None else None
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i) for i in range(width)])
        return rows


def read_xlsx(
    spark: SparkSession,
    path: str,
    skiprows: int = 0,
    dtypes: Mapping[str, str] | None = None,
    sheet_index: int = 0,
) -> DataFrame:
    """Excel read with declared dtypes (reference S4,
    ``retrieve.py:97-106``): first post-skip row is the header; every
    column declared in ``dtypes`` keeps its raw string form unless the
    dtype says numeric — exactly the reference's trick for preserving
    leading-zero FIPS codes. Driver-side parse (config-scale inputs),
    distributed DataFrame out."""
    rows = _xlsx_rows(path, sheet_index)[skiprows:]
    header = [str(h) if h is not None else f"_c{i}" for i, h in enumerate(rows[0])]
    body = rows[1:]
    width = len(header)
    dtypes = dict(dtypes or {})

    fields = []
    for name in header:
        kind = dtypes.get(name, "str")
        if kind in ("int", "long"):
            fields.append(T.StructField(name, T.LongType()))
        elif kind in ("float", "double"):
            fields.append(T.StructField(name, T.DoubleType()))
        else:
            fields.append(T.StructField(name, T.StringType()))
    schema = T.StructType(fields)

    def conv(val: str | None, kind: str):
        if val is None:
            return None
        if kind in ("int", "long"):
            return int(float(val))
        if kind in ("float", "double"):
            return float(val)
        return str(val)

    data = [
        tuple(
            conv(r[i] if i < len(r) else None, dtypes.get(header[i], "str"))
            for i in range(width)
        )
        for r in body
    ]
    return spark.createDataFrame(data, schema)


# ------------------------------------------------------------------ S2/S6

def download_file(url: str, dest_dir: str, extension: str, chunk_size: int = 4096) -> str:
    """Streamed HTTP download to a named temp file (reference S2,
    ``retrieve.py:50-58``). Driver-side control plane."""
    import requests

    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, f"download{extension}")
    with requests.get(url, stream=True, timeout=60) as resp:
        resp.raise_for_status()
        with open(dest, "wb") as fh:
            for chunk in resp.iter_content(chunk_size=chunk_size):
                fh.write(chunk)
    return dest


def probe_first_available(
    candidates: Iterable[str],
    exists: Callable[[str], bool] | None = None,
) -> str | None:
    """Probing source discovery (reference S6, ``retrieve.py:70-95``:
    try year=now..earliest and take the first URL that answers). The
    probe predicate defaults to local-path existence; pass an HTTP
    HEAD lambda for remote probing."""
    check = exists or os.path.exists
    for cand in candidates:
        if check(cand):
            return cand
    return None


def year_candidates(template: str, newest: int, oldest: int) -> list[str]:
    """Expand a ``{year}`` template newest-first, the reference's
    probing order (``retrieve.py:70-82``)."""
    return [template.format(year=y) for y in range(newest, oldest - 1, -1)]


# ------------------------------------------------------------------ S1

# GeoJSON geometry struct: type + nested coordinate arrays. Polygon
# coordinates are ring-lists; MultiPolygon adds one nesting level.
# Read as strings and re-parsed by the geometry kernel (geomlite).
_GEOJSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField("id", T.LongType()),
                        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
                        T.StructField("geometry", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("type", T.StringType()),
    ]
)


def read_feature_snapshot(
    spark: SparkSession,
    path: str,
    property_cols: Sequence[str],
) -> DataFrame:
    """Feature-service snapshot reader (reference S1): a GeoJSON
    FeatureCollection saved from the service's ``/query`` endpoint.
    Features explode into rows; requested properties become columns;
    the geometry stays as its GeoJSON string for the geometry kernel
    to parse (WKB conversion is a projection, not a shuffle).

    The JSON scan is distributed (one task per file / multiline
    document); a production connector would page ``resultOffset``
    windows into many snapshot files so this scan parallelizes."""
    raw = (
        spark.read.option("multiLine", "true")
        .schema(_GEOJSON_SCHEMA)
        .json(path)
    )
    feats = raw.select(F.explode("features").alias("f"))
    cols = [F.col("f.id").alias("feature_id")]
    cols += [F.col("f.properties").getItem(p).alias(p) for p in property_cols]
    cols.append(F.col("f.geometry").alias("geometry_json"))
    return feats.select(*cols)


# ------------------------------------------------------------------ sinks

def write_staging_csv(df: DataFrame, path: str) -> None:
    """S7 staging sink (header CSV, reference ``retrieve.py:44``)."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def publish_snapshot(
    df: DataFrame,
    base_dir: str,
    name: str,
    metadata: Mapping[str, object] | None = None,
) -> str:
    """K1+K3 blue/green publish: write the full new version to a fresh
    ``v{N}`` directory, then atomically repoint ``CURRENT``. Readers
    resolving through :func:`read_published` never observe a partial
    write — the reference's staging→swap flow (`scripts/_services.py`,
    `scripts/swap_services.py:4-12`) with a pointer file standing in
    for the AGOL view relationship.

    ``metadata`` (optional) is the K2 service-definition sync
    (`scripts/update_service_definitions.py:44-120`): caller-supplied
    description fields are written as ``.metadata.json`` INSIDE the
    version directory (plus the version id and column schema), before
    the pointer flips — so metadata and data always swap together,
    unlike the reference's separate post-publish REST call."""
    import json

    root = os.path.join(base_dir, name)
    os.makedirs(root, exist_ok=True)
    existing = [
        int(d[1:]) for d in os.listdir(root)
        if d.startswith("v") and d[1:].isdigit()
    ]
    version = max(existing, default=0) + 1
    target = os.path.join(root, f"v{version}")
    df.write.mode("errorifexists").parquet(target)
    if metadata is not None:
        doc = dict(metadata)
        doc.setdefault("version", f"v{version}")
        doc.setdefault("columns", [f.name for f in df.schema.fields])
        with open(os.path.join(target, ".metadata.json"), "w") as fh:
            json.dump(doc, fh, indent=2, sort_keys=True)
    pointer = os.path.join(root, "CURRENT")
    tmp = pointer + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"v{version}\n")
    os.replace(tmp, pointer)  # atomic on POSIX
    return target


def update_service_definition(
    service_url: str,
    service_description: str,
    metadata: str,
    post: Callable[[str, Mapping[str, str]], object] | None = None,
):
    """K2 remote half: POST an ArcGIS-REST-shaped ``updateDefinition``
    to a service's admin endpoint (reference
    ``scripts/update_service_definitions.py:44-52``):

    * the admin URL is the service URL with ``rest/services`` →
      ``rest/admin/services`` plus ``/updateDefinition``;
    * the form field ``updateDefinition`` carries a JSON string of
      ``{serviceDescription, description, editingInfo.lastEditDate:
      null}`` — the lastEditDate null-out is load-bearing (the server
      rejects updates carrying a stale edit stamp).

    ``post`` (url, form_dict) is injectable; the default form-POSTs
    with ``requests``.  Control-plane only — this is the out-of-engine
    publisher step (SURVEY §2.9), exercised against a local HTTP stub
    in tests. Returns ``(admin_url, form)`` for callers that log the
    sync."""
    import json

    update = {
        "serviceDescription": service_description,
        "description": metadata,
        "editingInfo": {"lastEditDate": None},
    }
    # Rewrite only the FIRST occurrence: a host path or service name
    # that itself contains 'rest/services' must not be rewritten too.
    admin_url = (
        service_url.replace("rest/services", "rest/admin/services", 1)
        + "/updateDefinition"
    )
    form = {"updateDefinition": json.dumps(update)}
    if post is None:  # pragma: no cover - exercised via the stub test
        import requests

        def post(url, data):
            resp = requests.post(url, data=data, timeout=60)
            resp.raise_for_status()
            return resp

    post(admin_url, form)
    return admin_url, form


def read_published_metadata(base_dir: str, name: str) -> dict:
    """Resolve CURRENT and read its ``.metadata.json`` sidecar."""
    import json

    root = os.path.join(base_dir, name)
    with open(os.path.join(root, "CURRENT")) as fh:
        version = fh.read().strip()
    with open(os.path.join(root, version, ".metadata.json")) as fh:
        return json.load(fh)


def read_published(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    """Resolve the CURRENT pointer and read that snapshot version."""
    root = os.path.join(base_dir, name)
    with open(os.path.join(root, "CURRENT")) as fh:
        version = fh.read().strip()
    return spark.read.parquet(os.path.join(root, version))


def rollback_pointer(base_dir: str, name: str, to_version: str) -> None:
    """Blue/green rollback = repoint CURRENT at a previous version
    (the old data is still there — swaps never delete)."""
    root = os.path.join(base_dir, name)
    if not os.path.isdir(os.path.join(root, to_version)):
        raise FileNotFoundError(f"no snapshot {to_version} under {root}")
    tmp = os.path.join(root, "CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"{to_version}\n")
    os.replace(tmp, os.path.join(root, "CURRENT"))


# ------------------------------------------------------- JSONL / evolution

def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines reader with a declared schema and PERMISSIVE corrupt-
    record capture: malformed lines land whole in ``corrupt_col``
    instead of killing the job — the ingest contract for web-scale
    document feeds, where some fraction of every batch is broken and
    a fail-fast reader would never finish.

    The declared schema (never inference — a schema-inference pass
    over 100 TB is a full extra scan) also gives column pruning: a
    downstream ``select`` reads only the parsed fields it needs.
    Callers split the result with :func:`split_corrupt`.
    """
    full = schema.add(T.StructField(corrupt_col, T.StringType()))
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_rows).

    Quarantined rows keep the full schema (parsed columns NULL, the
    raw line in ``corrupt_col``) rather than projecting the corrupt
    column alone — Spark disallows scans that reference only the
    internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and an
    ingest pipeline wants the whole row in the quarantine sink anyway.
    """
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull())
    return clean, bad


def read_evolved(
    spark: SparkSession, *paths: str
) -> DataFrame:
    """Read parquet snapshots whose schemas evolved across writes
    (columns added over time) as ONE table: ``mergeSchema`` unions the
    footers' schemas and older files surface the newer columns as
    NULL — the reference's AddField-style schema evolution
    (`bunny.py:41-43`) replayed over immutable snapshot generations
    instead of in-place mutation. Merging reads every footer, so
    production tables pin the merged schema in a catalog and pass it
    explicitly; semantics are identical."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: Sequence[tuple[str, int, int, str]],
    skip_header_lines: int = 0,
) -> DataFrame:
    """Fixed-width text reader (mainframe/legacy-export layouts):
    ``fields`` is ``(name, start, width, type)`` with 1-based column
    starts. The file is read as plain lines by ``spark.read.text`` —
    a fully distributed, splittable scan — and each field becomes one
    ``substring`` + ``trim`` + ``cast`` projection, so the whole parse
    is a single codegen'd stage with no Python in the loop; malformed
    numerics become NULL via try-semantics rather than failing the
    scan."""
    if skip_header_lines:
        # Header skipping needs the file's BYTE order, which a split
        # multi-partition text scan does not guarantee (partition index
        # dominates monotonically_increasing_id, and split order need
        # not follow byte order). Read wholetext — one task per file,
        # order exact — then explode lines and drop the first N per
        # file. Correct by construction; prefer headerless exports at
        # scale, where skip=0 keeps the read a narrow splittable scan.
        whole = spark.read.text(path, wholetext=True)
        # Split keeps a trailing "" element for newline-terminated
        # files (which the line-mode reader would not emit); slice it
        # off along with the first `skip` lines, keeping any genuine
        # mid-file blank lines — exactly what line-mode yields.
        # greatest(0, …): a header-only or truncated file would
        # otherwise produce a negative slice length and fail the scan.
        lines = whole.select(
            F.explode(
                F.expr(
                    "slice(split(value, '\\r?\\n'),"
                    f" {skip_header_lines + 1},"
                    " greatest(0, size(split(value, '\\r?\\n'))"
                    f" - {skip_header_lines}"
                    " - if(element_at(split(value, '\\r?\\n'), -1) = '', 1, 0)))"
                )
            ).alias("value")
        )
    else:
        lines = spark.read.text(path)
    cols = []
    for name, start, width, dtype in fields:
        c = F.trim(F.substring(F.col("value"), start, width))
        c = F.when(c == "", None).otherwise(c)
        if dtype != "string":
            c = F.expr(
                f"try_cast(nullif(trim(substring(value, {start}, {width})), '')"
                f" AS {dtype})"
            )
        cols.append(c.alias(name))
    return lines.select(*cols)


# --------------------------------------------------- ORC / fixed-width

def read_orc(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> DataFrame:
    """ORC reader (Spark-native vectorized scan, same pushdown/pruning
    machinery as parquet — a warehouse migrating from Hive hands us
    ORC files and nothing should change downstream). ``columns`` is an
    optional early projection so pruning reaches the scan even when
    the caller composes lazily."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc_snapshot(df: DataFrame, path: str) -> None:
    """ORC staging sink (snappy, the Spark default)."""
    df.write.mode("overwrite").orc(path)


# ----------------------------------------------- binary asset ingest

def read_binary_assets(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Multimodal asset ingest: scan a directory tree of opaque files
    (images/audio/video) with Spark's built-in ``binaryFile`` source —
    ``(path, modificationTime, length, content)``, one row per file,
    distributed and splittable at file granularity.

    This is the on-ramp into the multimodal operator family: the
    ``content`` column is exactly the opaque ``binary`` payload
    ``operators.multimodal`` decodes/features via Arrow-batched
    ``mapInPandas``. ``glob`` filters by filename pattern at PLANNING
    time (``pathGlobFilter`` — non-matching files are never opened);
    ``max_bytes`` guards the scan against the classic failure mode of
    binary ingestion, one 50 GB stray video materializing in a task
    heap (the LENGTH predicate prunes on file status, before content
    is read)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def read_zipped_delimited_distributed(
    spark: SparkSession,
    path: str,
    member_pattern: str,
    columns: Sequence[str],
    sep: str = "|",
    header: bool = True,
    max_archive_bytes: int | None = None,
    on_oversize: str = "error",
) -> DataFrame:
    """S3 at corpus scale: parse delimited members out of MANY zip
    archives fully distributed — the path :func:`read_delimited`'s
    driver-side unzip can't take when the input is a directory of
    thousands of archives rather than one config-scale file.

    Shape (r4): distribute archive PATHS, not archive bytes — a
    driver-side metadata listing (Hadoop FileSystem, no data read)
    yields one row per archive, round-robin repartitioned from a
    single partition so EXACTLY one archive lands per task (a
    ``binaryFile`` scan packs small archives many-per-task via
    maxPartitionBytes/openCost and caps any archive at a 2 GB row);
    each task then opens its archive itself (pyarrow FS — file/hdfs/
    s3), selects members matching ``member_pattern`` (full match), and
    parses them with pandas into the declared ``columns`` — all values
    land as strings (the S4 declared-dtype convention: cast
    downstream, never infer, so leading-zero codes survive).  A
    ``source_member`` column records provenance.  Archives aren't
    splittable, so per-archive tasks are the parallelism ceiling; at
    corpus scale there are thousands of archives and the stage is
    embarrassingly parallel.

    ``max_archive_bytes`` guards the per-task memory bound (each task
    buffers one whole archive): oversize archives are detected at
    PLANNING time from the same metadata listing — no data read — and
    either fail loudly with the offending paths (``on_oversize=
    'error'``, the default: silent data loss is worse than a retry
    with a raised bound) or are skipped (``'skip'``, for
    quarantine-and-continue ingest)."""
    import re as _re

    if on_oversize not in ("error", "skip"):
        raise ValueError(
            f"on_oversize must be 'error' or 'skip', got {on_oversize!r}"
            " (a typo here would silently drop oversize archives)"
        )
    out_fields = [T.StructField(c, T.StringType()) for c in columns] + [
        T.StructField("source_member", T.StringType())
    ]
    out_schema = T.StructType(out_fields)
    col_list = list(columns)
    pat = member_pattern

    def parse(batches):
        import io
        import zipfile as _zf

        import pandas as pd

        rx = _re.compile(pat)
        for pdf in batches:
            for src in pdf["path"]:
                with _zf.ZipFile(io.BytesIO(_read_all_bytes(src))) as zf:
                    for name in zf.namelist():
                        if not rx.fullmatch(name):
                            continue
                        parsed = pd.read_csv(
                            io.BytesIO(zf.read(name)),
                            sep=sep,
                            header=0 if header else None,
                            names=None if header else col_list,
                            dtype=str,
                            keep_default_na=False,
                        )
                        if header:
                            parsed = parsed[col_list]
                        out = parsed.copy()
                        out["source_member"] = f"{src}!{name}"
                        yield out

    sized = _list_data_file_statuses(spark, path)
    if max_archive_bytes is not None:
        over = [(p, n) for p, n in sized if n > max_archive_bytes]
        if over and on_oversize == "error":
            listing = ", ".join(f"{p} ({n} B)" for p, n in over[:10])
            raise ValueError(
                f"{len(over)} archive(s) exceed max_archive_bytes="
                f"{max_archive_bytes} (each task buffers one whole "
                f"archive): {listing}"
            )
        sized = [(p, n) for p, n in sized if n <= max_archive_bytes]
    paths = [p for p, _ in sized]
    if not paths:
        return spark.createDataFrame([], out_schema)
    # sc.parallelize with numSlices == len(paths) places exactly one
    # archive per partition — the one guaranteed-exact placement
    # (coalesce(1).repartition(N) does NOT work: Catalyst's
    # CollapseRepartition removes the coalesce and per-partition
    # round-robin starts collide).  mapInPandas is narrow, so the
    # 1:1 task:archive layout survives into the parse stage.
    rdd = spark.sparkContext.parallelize([(p,) for p in paths], len(paths))
    archives = spark.createDataFrame(rdd, "path string")
    return archives.mapInPandas(parse, out_schema)


def _list_data_file_statuses(
    spark: SparkSession, path: str
) -> list[tuple[str, int]]:
    """Non-recursive metadata listing of the plain DATA files under
    ``path`` (or ``path`` itself when it is a file; glob patterns
    expand via ``globStatus``) through the Hadoop FileSystem API —
    scheme-agnostic, no data read.  Returns ``(uri, size_bytes)``
    pairs.  Hidden/metadata files (basenames starting with ``_`` or
    ``.`` — ``_SUCCESS``, ``.crc``, ``.DS_Store``) are skipped,
    matching the filter Spark's own file sources apply.  A glob that
    matches DIRECTORIES (e.g. ``base/*`` over partition dirs) lists
    one level inside each match, like Spark's file sources do.
    Sorted for deterministic task assignment."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def is_data(st) -> bool:
        name = st.getPath().getName()
        return st.isFile() and not name.startswith(("_", "."))

    def not_hidden(st) -> bool:
        return not st.getPath().getName().startswith(("_", "."))

    if any(c in path for c in "*?[{"):
        statuses = []
        for st in fs.globStatus(jpath) or []:
            if st.isDirectory() and not_hidden(st):
                # Spark glob semantics: a matched directory stands for
                # the files directly inside it (one level, same
                # hidden-file filter) — not zero archives.
                statuses.extend(fs.listStatus(st.getPath()))
            else:
                statuses.append(st)
    elif fs.isFile(jpath):
        # An explicitly-named file is always honored, hidden or not —
        # the filter exists to skip markers during DIRECTORY listing.
        st = fs.getFileStatus(jpath)
        return [(st.getPath().toString(), st.getLen())]
    else:
        statuses = list(fs.listStatus(jpath))
    return sorted(
        (st.getPath().toString(), st.getLen())
        for st in statuses
        if is_data(st)
    )


def _list_data_files(spark: SparkSession, path: str) -> list[str]:
    return [p for p, _ in _list_data_file_statuses(spark, path)]


# Hadoop URI schemes whose object stores pyarrow reaches under a
# different scheme name (Spark's S3 connector is s3a://; pyarrow's is
# s3://).  Schemes pyarrow has no driver for at all (abfs, wasb,
# viewfs) fail loudly below — use the driver-side
# ``read_zipped_delimited`` or mount-level access for those.
_PYARROW_SCHEME_MAP = {"s3a": "s3", "s3n": "s3"}


def _read_all_bytes(uri: str) -> bytes:
    """Read a whole file by URI inside a task.  Local paths (bare or
    file:) use plain open; other schemes go through pyarrow's
    filesystem layer (hdfs://, s3://..., with s3a/s3n translated to
    pyarrow's s3).  Zip needs random access to the central directory,
    so the archive is buffered fully — the per-task memory bound is
    one archive, which is also the unit of parallelism."""
    from urllib.parse import unquote, urlparse

    u = urlparse(uri)
    if u.scheme in ("", "file"):
        with open(unquote(u.path) if u.scheme else uri, "rb") as f:
            return f.read()
    import pyarrow.fs as pafs

    mapped = _PYARROW_SCHEME_MAP.get(u.scheme)
    if mapped:
        uri = f"{mapped}:{uri.split(':', 1)[1]}"
    try:
        fs, rel = pafs.FileSystem.from_uri(uri)
    except Exception as exc:  # pragma: no cover - scheme-dependent
        raise ValueError(
            f"no task-side reader for scheme {u.scheme!r} ({uri}): pyarrow "
            "supports file/hdfs/s3/gs (s3a/s3n are translated); for other "
            "Hadoop schemes use read_zipped_delimited (driver-side) or a "
            "mounted path"
        ) from exc
    with fs.open_input_stream(rel) as f:
        return f.read()
