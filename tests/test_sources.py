"""Sources/sinks: zip-delimited, xlsx, GeoJSON snapshot, probing,
blue/green publish (SURVEY.md §2.1/§2.9)."""

from __future__ import annotations

import json
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from pyspark.sql import types as T

from gis_city_county_spark.sources.files import (
    probe_first_available,
    publish_snapshot,
    read_delimited,
    read_feature_snapshot,
    read_published,
    read_xlsx,
    rollback_pointer,
    write_staging_csv,
    year_candidates,
)


def test_read_delimited_zip_member(spark, tmp_path):
    zpath = str(tmp_path / "codes.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr(
            "Text/FederalCodes.txt",
            "feature_id|feature_name|state_name\n"
            "1|City of Alameda|California\n"
            "2|Reno|Nevada\n",
        )
    df = read_delimited(spark, zpath, sep="|", member="Text/FederalCodes.txt")
    rows = {r["feature_id"]: r["state_name"] for r in df.collect()}
    assert rows == {"1": "California", "2": "Nevada"}


def test_feature_service_pages_datasource(spark, tmp_path):
    """Python DataSource V2: paged snapshot reads distribute one task
    per page and push equality filters into the page parse."""
    from gis_city_county_spark.sources.feature_service import (
        FeatureServicePages,
        write_pages,
    )

    rows = [
        {"CITY": f"city{i}", "COPRI": str(i % 3), "POP": 1000 + i} for i in range(25)
    ]
    dest = str(tmp_path / "pages")
    n_pages = write_pages(rows, dest, page_size=10)
    assert n_pages == 3

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FeatureServicePages)
    df = (
        spark.read.format("feature_service_pages")
        .schema("CITY string, COPRI string, POP long")
        .option("path", dest)
        .load()
    )
    assert df.count() == 25
    # one input partition per page
    assert df.rdd.getNumPartitions() == 3
    got = df.filter((F.col("COPRI") == "1") & F.col("POP").isNotNull()).collect()
    assert {r["CITY"] for r in got} == {f"city{i}" for i in range(25) if i % 3 == 1}


def test_feature_service_live_pager_roundtrip(spark, tmp_path):
    """S1 live half: fetch_feature_pages pages an HTTP /query endpoint
    (resultOffset paging, ArcGIS wire shape — reference
    ``bunny.py:211-219``) into a snapshot dir, then the DSv2 source
    scans it. Served by a real local HTTP server."""
    import threading
    import urllib.parse
    import urllib.request
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from gis_city_county_spark.sources.feature_service import (
        FeatureServicePages,
        fetch_feature_pages,
    )

    all_rows = [{"CITY": f"c{i}", "POP": 100 + i} for i in range(23)]

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            off = int(q["resultOffset"][0])
            n = int(q["resultRecordCount"][0])
            feats = [{"attributes": r} for r in all_rows[off : off + n]]
            body = json.dumps(
                {
                    "features": feats,
                    "exceededTransferLimit": off + n < len(all_rows),
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/query"

        def fetch(params):
            full = url + "?" + urllib.parse.urlencode(params)
            with urllib.request.urlopen(full, timeout=10) as resp:
                return json.loads(resp.read())

        dest = str(tmp_path / "live_pages")
        # stale page from a previous snapshot must be cleared; the
        # snapshot's metadata sidecar must NOT be (only page files are
        # the pager's to manage)
        os.makedirs(dest)
        with open(os.path.join(dest, "page_99999.json"), "w") as fh:
            json.dump({"features": [{"attributes": {"CITY": "stale", "POP": 0}}]}, fh)
        with open(os.path.join(dest, ".metadata.json"), "w") as fh:
            json.dump({"title": "keepme"}, fh)
        n_pages = fetch_feature_pages(url, dest, page_size=10, fetch=fetch)
        assert n_pages == 3
        assert sorted(os.listdir(dest)) == [
            ".metadata.json",
            "page_00000.json", "page_00001.json", "page_00002.json",
        ]

        # A server capped below the requested page size that also omits
        # exceededTransferLimit must still be fully paged (terminate on
        # the empty page, never on a short-page heuristic).
        def capped_fetch(params):
            p = dict(params)
            p["resultRecordCount"] = min(int(p["resultRecordCount"]), 10)
            body = fetch(p)
            body.pop("exceededTransferLimit", None)
            return body

        dest2 = str(tmp_path / "capped_pages")
        n2 = fetch_feature_pages(url, dest2, page_size=25, fetch=capped_fetch)
        assert n2 == 3  # 10 + 10 + 3, then one empty probe

        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        spark.dataSource.register(FeatureServicePages)
        df = (
            spark.read.format("feature_service_pages")
            .schema("CITY string, POP long")
            .option("path", dest)
            .load()
        )
        got = {(r["CITY"], r["POP"]) for r in df.collect()}
        assert got == {(f"c{i}", 100 + i) for i in range(23)}
    finally:
        srv.shutdown()


def test_feature_service_pages_write_roundtrip(spark, tmp_path):
    """DataSourceWriter two-phase commit: staged files promote on
    commit, rows round-trip, and no staging residue survives."""
    from gis_city_county_spark.sources.feature_service import FeatureServicePages

    spark.dataSource.register(FeatureServicePages)
    dest = str(tmp_path / "out_pages")
    src = spark.range(20).selectExpr(
        "CAST(concat('c', id) AS STRING) AS CITY", "id AS POP"
    )
    src.repartition(4).write.format("feature_service_pages").option(
        "path", dest
    ).mode("overwrite").save()

    files = sorted(os.listdir(dest))
    assert all(f.startswith("page_") and f.endswith(".json") for f in files)
    assert len(files) == 4
    back = (
        spark.read.format("feature_service_pages")
        .schema("CITY string, POP long")
        .option("path", dest)
        .load()
    )
    assert {(r["CITY"], r["POP"]) for r in back.collect()} == {
        (f"c{i}", i) for i in range(20)
    }


def test_observed_write_single_pass_gate(spark, tmp_path):
    from gis_city_county_spark.operators.gates import GateError, observed_write

    df = spark.range(100).selectExpr(
        "id", "CASE WHEN id % 10 = 0 THEN NULL ELSE id END AS v"
    )
    got = observed_write(
        df, str(tmp_path / "ok"), min_rows=50, max_null_frac={"v": 0.2}
    )
    assert got["n_rows"] == 100 and abs(got["null_frac_v"] - 0.1) < 1e-12
    assert spark.read.parquet(str(tmp_path / "ok")).count() == 100

    with pytest.raises(GateError):
        observed_write(df, str(tmp_path / "bad"), min_rows=500)
    with pytest.raises(GateError):
        observed_write(
            df, str(tmp_path / "bad2"), min_rows=1, max_null_frac={"v": 0.05}
        )


def test_read_fixed_width(spark, tmp_path):
    from gis_city_county_spark.sources.files import read_fixed_width

    p = str(tmp_path / "legacy.dat")
    with open(p, "w") as f:
        f.write("ID   NAME      AMT \n")   # header to skip
        f.write("001  alameda   1250\n")
        f.write("002  reno       bad\n")   # malformed numeric -> NULL
        f.write("003\n")                    # short line: blanks -> NULL
    df = read_fixed_width(
        spark,
        p,
        [("id", 1, 5, "string"), ("name", 6, 10, "string"), ("amt", 16, 4, "bigint")],
        skip_header_lines=1,
    )
    rows = {r["id"]: (r["name"], r["amt"]) for r in df.collect()}
    assert rows["001"] == ("alameda", 1250)
    assert rows["002"] == ("reno", None)
    assert rows["003"][0] is None


def _write_min_xlsx(path: str, shared: list[str], sheet_rows: str) -> None:
    """Hand-assemble a minimal OOXML workbook (zip of XML parts)."""
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sst = (
        f'<?xml version="1.0"?><sst {ns} count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    ws = f'<?xml version="1.0"?><worksheet {ns}><sheetData>{sheet_rows}</sheetData></worksheet>'
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", ws)


def test_read_xlsx_skiprows_and_dtypes(spark, tmp_path):
    """skiprows + declared string dtype preserving leading-zero FIPS
    (the reference's Census read, retrieve.py:97-106)."""
    xpath = str(tmp_path / "geocodes.xlsx")
    # rows: 1 junk banner row, header, 2 data rows
    rows_xml = (
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="s"><v>2</v></c>'
        '<c r="C2" t="s"><v>3</v></c></row>'
        '<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3"><v>06</v></c>'
        '<c r="C3"><v>12.5</v></c></row>'
        '<row r="4"><c r="A4" t="s"><v>5</v></c><c r="B4"><v>04</v></c>'
        '<c r="C4"><v>7</v></c></row>'
    )
    shared = ["Banner", "Area Name", "State FIPS Code", "Pop", "Alameda County", "Yuma"]
    _write_min_xlsx(xpath, shared, rows_xml)
    df = read_xlsx(
        spark, xpath, skiprows=1,
        dtypes={"State FIPS Code": "str", "Pop": "double"},
    )
    assert df.schema["State FIPS Code"].dataType == T.StringType()
    assert df.schema["Pop"].dataType == T.DoubleType()
    got = {r["Area Name"]: (r["State FIPS Code"], r["Pop"]) for r in df.collect()}
    # leading zero preserved because the column is declared string
    assert got == {"Alameda County": ("06", 12.5), "Yuma": ("04", 7.0)}


def test_read_feature_snapshot(spark, tmp_path):
    snap = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": 1,
                "properties": {"CITY": "Alameda", "COUNTY": "Alameda", "COPRI": "01001"},
                "geometry": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
            },
            {
                "type": "Feature",
                "id": 2,
                "properties": {"CITY": "Unincorporated", "COUNTY": "Alpine", "COPRI": "02000"},
                "geometry": {"type": "Polygon", "coordinates": [[[2, 2], [3, 2], [3, 3], [2, 3], [2, 2]]]},
            },
        ],
    }
    path = str(tmp_path / "cdtfa_snapshot.json")
    with open(path, "w") as fh:
        json.dump(snap, fh)
    df = read_feature_snapshot(spark, path, ["CITY", "COUNTY", "COPRI"])
    rows = {r["feature_id"]: r for r in df.collect()}
    assert rows[1]["CITY"] == "Alameda"
    assert rows[2]["COPRI"] == "02000"
    assert json.loads(rows[1]["geometry_json"])["type"] == "Polygon"


def test_probe_first_available(tmp_path):
    hit = tmp_path / "all-geocodes-v2023.xlsx"
    hit.write_bytes(b"x")
    cands = year_candidates(str(tmp_path / "all-geocodes-v{year}.xlsx"), 2025, 2020)
    assert probe_first_available(cands) == str(hit)
    assert probe_first_available(year_candidates("nope-{year}", 2025, 2024)) is None


def test_staging_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    out = str(tmp_path / "staged")
    write_staging_csv(df, out)
    back = spark.read.option("header", "true").csv(out)
    assert {(r["k"], r["v"]) for r in back.collect()} == {("a", "1"), ("b", "2")}


def test_blue_green_publish_swap_rollback(spark, tmp_path):
    base = str(tmp_path / "pub")
    v1 = spark.createDataFrame([(1, "blue")], ["id", "color"])
    v2 = spark.createDataFrame([(1, "green"), (2, "green")], ["id", "color"])

    p1 = publish_snapshot(v1, base, "boundaries")
    assert read_published(spark, base, "boundaries").count() == 1

    p2 = publish_snapshot(v2, base, "boundaries")
    assert p1 != p2
    cur = read_published(spark, base, "boundaries")
    assert cur.count() == 2

    # old version still on disk -> rollback is a pointer flip
    rollback_pointer(base, "boundaries", "v1")
    assert read_published(spark, base, "boundaries").count() == 1
    assert os.path.isdir(p2)


def test_read_jsonl_permissive_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from gis_city_county_spark.sources.files import read_jsonl, split_corrupt

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha", "n": 10}\n'
        '{"doc_id": 2, "text": "beta", "n": 20}\n'
        "{broken json line\n"
        '{"doc_id": 3, "text": "gamma", "n": null}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    clean, bad = split_corrupt(read_jsonl(spark, str(p), schema))
    rows = {(r.doc_id, r.text, r.n) for r in clean.collect()}
    assert rows == {(1, "alpha", 10), (2, "beta", 20), (3, "gamma", None)}
    assert clean.columns == ["doc_id", "text", "n"]
    quarantined = [r["_corrupt_record"] for r in bad.collect()]
    assert quarantined == ["{broken json line"]


def test_read_evolved_schema_union(spark, tmp_path):
    from gis_city_county_spark.sources.files import read_evolved

    old = str(tmp_path / "gen1")
    new = str(tmp_path / "gen2")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(old)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(new)

    merged = read_evolved(spark, old, new)
    assert set(merged.columns) == {"id", "name", "score"}
    got = {(r.id, r.name, r.score) for r in merged.collect()}
    assert got == {(1, "a", None), (2, "b", 9.5)}


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC is the second columnar format Spark supports natively; the
    engine's scans get the same predicate pushdown there (PushedFilters
    in the scan node), so a reference user with ORC data needs no code
    changes — only format('orc')."""
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(1000)],
        "id long, name string, score double",
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t.orc")
    df.write.orc(path)
    back = spark.read.orc(path).filter(F.col("id") > 900).select("id", "score")
    assert back.count() == 99
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters", 1)[1][:120]


def test_publish_snapshot_metadata_sidecar(spark, tmp_path):
    from gis_city_county_spark.sources.files import (
        publish_snapshot,
        read_published,
        read_published_metadata,
    )

    base = str(tmp_path / "pub")
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    publish_snapshot(df, base, "svc", metadata={"description": "first release"})
    meta = read_published_metadata(base, "svc")
    assert meta["description"] == "first release"
    assert meta["version"] == "v1"
    assert meta["columns"] == ["id", "name"]
    # underscore-prefixed sidecar is invisible to the parquet reader
    assert read_published(spark, base, "svc").count() == 1
    # metadata swaps with the data
    publish_snapshot(df, base, "svc", metadata={"description": "second"})
    assert read_published_metadata(base, "svc")["version"] == "v2"


def test_expect_schema_contract(spark):
    from gis_city_county_spark.operators.gates import GateError, expect_schema

    df = spark.range(3).selectExpr("id", "CAST(id AS STRING) AS name")
    expect_schema(df, "id bigint, name string")  # passes
    with pytest.raises(GateError, match="missing column extra"):
        expect_schema(df, "id bigint, name string, extra double")
    with pytest.raises(GateError, match="expected int, got bigint"):
        expect_schema(df, "id int, name string")
    with pytest.raises(GateError, match="unexpected column name"):
        expect_schema(df, "id bigint")


def test_feature_service_pages_abort_cleans_staging(spark, tmp_path):
    """A failing write aborts: no committed pages, no staged residue."""
    from gis_city_county_spark.sources.feature_service import FeatureServicePages

    spark.dataSource.register(FeatureServicePages)
    dest = str(tmp_path / "abort_pages")
    # bytes are not JSON-serializable -> every task raises in write()
    bad = spark.range(4).selectExpr("CAST('x' AS BINARY) AS payload")
    with pytest.raises(Exception):
        bad.write.format("feature_service_pages").option("path", dest).save()
    leftover = os.listdir(dest) if os.path.exists(dest) else []
    assert not [f for f in leftover if f.endswith(".json") and not f.startswith(".")]


# ----------------- r3 (VERDICT 8): live halves against a REAL local
# HTTP stub — no injected fetchers, the actual requests/urllib paths.


class _ArcgisStub:
    """Minimal ArcGIS-REST-shaped server: pages a fixed feature set
    through /query (resultOffset protocol) and records any
    updateDefinition POST."""

    def __init__(self, rows, page_cap=7):
        import http.server
        import json
        import threading
        import urllib.parse

        stub = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                qs = urllib.parse.parse_qs(parsed.query)
                off = int(qs.get("resultOffset", ["0"])[0])
                want = int(qs.get("resultRecordCount", ["1000"])[0])
                n = min(want, page_cap)  # server-side maxRecordCount
                feats = [
                    {"attributes": r} for r in rows[off : off + n]
                ]
                body = {"features": feats}
                if off + n < len(rows) and feats:
                    body["exceededTransferLimit"] = True
                else:
                    body["exceededTransferLimit"] = False
                data = json.dumps(body).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_POST(self):
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length).decode()
                stub.posts.append((self.path, urllib.parse.parse_qs(raw)))
                data = b'{"success": true}'
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self.posts = []
        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def test_fetch_feature_pages_against_live_http_stub(spark, tmp_path):
    """S1 live half end-to-end: the DEFAULT requests-backed fetcher
    pages a real (local) /query endpoint — including the server-side
    maxRecordCount cap returning short-but-full pages — and the DSv2
    scan reads the snapshot back complete."""
    from gis_city_county_spark.sources.feature_service import (
        FeatureServicePages,
        fetch_feature_pages,
    )

    rows = [{"CITY": f"c{i}", "POP": i * 10} for i in range(23)]
    stub = _ArcgisStub(rows, page_cap=7)
    try:
        dest = str(tmp_path / "snap")
        n_pages = fetch_feature_pages(
            f"http://127.0.0.1:{stub.port}/arcgis/rest/services/x/FeatureServer/0/query",
            dest,
            page_size=10,  # server caps to 7 → short-but-full pages
        )
        assert n_pages == 4  # ceil(23 / 7)
        spark.dataSource.register(FeatureServicePages)
        df = (
            spark.read.format("feature_service_pages")
            .schema("CITY string, POP bigint")
            .option("path", dest)
            .load()
        )
        got = {(r["CITY"], r["POP"]) for r in df.collect()}
        assert got == {(f"c{i}", i * 10) for i in range(23)}
    finally:
        stub.close()


def test_update_service_definition_against_live_http_stub():
    """K2 remote half: the REST-shaped updateDefinition POST hits the
    admin endpoint with the reference's exact payload contract
    (scripts/update_service_definitions.py:44-52): rest/services →
    rest/admin/services URL transform, form field updateDefinition
    carrying JSON with the lastEditDate null-out."""
    import json

    from gis_city_county_spark.sources.files import update_service_definition

    stub = _ArcgisStub([])
    try:
        service_url = (
            f"http://127.0.0.1:{stub.port}/arcgis/rest/services/CityCounty/FeatureServer"
        )
        admin_url, form = update_service_definition(
            service_url, "City boundaries", "<b>html metadata</b>"
        )
        assert admin_url.endswith(
            "/arcgis/rest/admin/services/CityCounty/FeatureServer/updateDefinition"
        )
        assert len(stub.posts) == 1
        path, body = stub.posts[0]
        assert path.endswith("/rest/admin/services/CityCounty/FeatureServer/updateDefinition")
        payload = json.loads(body["updateDefinition"][0])
        assert payload["serviceDescription"] == "City boundaries"
        assert payload["description"] == "<b>html metadata</b>"
        assert payload["editingInfo"] == {"lastEditDate": None}
    finally:
        stub.close()


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from gis_city_county_spark.sources.files import read_orc, write_orc_snapshot
    from gis_city_county_spark.sources.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc_snapshot(nation, path)
    back = read_orc(spark, path, columns=["n_nationkey", "n_name"])
    assert back.columns == ["n_nationkey", "n_name"]
    want = {(r["n_nationkey"], r["n_name"]) for r in nation.collect()}
    assert {tuple(r) for r in back.collect()} == want


def test_compact_snapshot_merges_small_files(spark, sf_dir, tmp_path):
    from gis_city_county_spark.sources.layout import compact_snapshot
    from gis_city_county_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(2000)
    src = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(src)  # 64 tiny files
    import os
    n_src = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_src >= 32
    dest = str(tmp_path / "compacted")
    n_out = compact_snapshot(spark, src, dest, target_file_bytes=64 * 1024 * 1024)
    assert n_out < n_src
    # content preserved exactly
    a = spark.read.parquet(src).count()
    b = spark.read.parquet(dest).count()
    assert a == b == 2000
    # clustered rewrite keeps row count and sorts within files
    dest2 = str(tmp_path / "clustered")
    n2 = compact_snapshot(
        spark, src, dest2, target_file_bytes=64 * 1024 * 1024,
        sort_cols=["l_orderkey"],
    )
    assert n2 >= 1
    assert spark.read.parquet(dest2).count() == 2000


def test_read_binary_assets_feeds_multimodal_features(spark, tmp_path):
    """binaryFile ingest → multimodal feature pass end-to-end: the
    content column is the opaque payload the mm operators expect;
    glob and size-guard predicates prune at file-status level."""
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.multimodal import binary_features
    from gis_city_county_spark.sources.files import read_binary_assets

    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.bmp").write_bytes(b"BM" + bytes(range(64)))
    (d / "b.bmp").write_bytes(b"BM" + bytes(range(128)))
    (d / "big.bmp").write_bytes(b"BM" + bytes(300))
    (d / "notes.txt").write_text("not an asset")

    assets = read_binary_assets(spark, str(d), glob="*.bmp", max_bytes=200)
    rows = assets.select("path", "length").collect()
    names = {r["path"].rsplit("/", 1)[-1] for r in rows}
    assert names == {"a.bmp", "b.bmp"}  # txt globbed out, big size-guarded

    payloads = assets.select(
        F.monotonically_increasing_id().alias("asset_id"),
        F.col("content").alias("payload"),
    )
    feats = binary_features(payloads, "asset_id", "payload")
    got = {r["n_bytes"] for r in feats.collect()}
    assert got == {66, 130}


def test_zipped_delimited_distributed(spark, tmp_path):
    """Distributed zip-corpus parse: many archives → one task each →
    member-pattern selection + declared string columns + provenance."""
    import zipfile

    from gis_city_county_spark.sources.files import (
        read_zipped_delimited_distributed,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(3):
        with zipfile.ZipFile(d / f"batch{i}.zip", "w") as zf:
            zf.writestr(
                f"data/codes_{i}.txt",
                "code|name\n" + "\n".join(f"0{i}{j}|place{i}{j}" for j in range(4)),
            )
            zf.writestr("README.txt", "decoy member, must be skipped")
    df = read_zipped_delimited_distributed(
        spark, str(d), r"data/codes_\d+\.txt", ["code", "name"], sep="|"
    )
    rows = df.collect()
    assert len(rows) == 12
    # leading zeros survive (declared strings, never inferred)
    assert all(r["code"].startswith("0") for r in rows)
    # provenance points back into the right archive member
    assert all("!data/codes_" in r["source_member"] for r in rows)
    assert df.schema["code"].dataType.simpleString() == "string"


def test_update_service_definition_rewrites_only_first_rest_services():
    """A service NAME containing 'rest/services' must survive the
    admin-URL transform untouched (ADVICE r3: str.replace rewrote
    every occurrence)."""
    from gis_city_county_spark.sources.files import update_service_definition

    posts = []
    admin_url, _form = update_service_definition(
        "http://host/arcgis/rest/services/rest/services_mirror/FeatureServer",
        "d", "m", post=lambda url, data: posts.append((url, data)),
    )
    assert admin_url == (
        "http://host/arcgis/rest/admin/services/rest/services_mirror"
        "/FeatureServer/updateDefinition"
    )
    assert posts[0][0] == admin_url


def test_compact_snapshot_counts_partitioned_output_recursively(
    spark, sf_dir, tmp_path
):
    """Hive-partitioned (subdirectory) output must be counted fully —
    the os.listdir version saw only top-level files (ADVICE r3)."""
    from gis_city_county_spark.sources.layout import (
        _parquet_bytes_and_files,
        compact_snapshot,
    )
    from gis_city_county_spark.sources.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    src = str(tmp_path / "part_src")
    nation.write.partitionBy("n_regionkey").parquet(src)
    total, n = _parquet_bytes_and_files(spark, src)
    assert total > 0 and n >= 5  # one+ file per region subdirectory
    dest = str(tmp_path / "part_dest")
    n_out = compact_snapshot(spark, src, dest)
    assert n_out >= 1
    assert spark.read.parquet(dest).count() == nation.count()


def test_zipped_distributed_one_task_per_archive(spark, tmp_path):
    """The 100 TB corpus path: a many-archive fixture must plan exactly
    one task per archive (VERDICT r3 item 7) — a binaryFile scan packs
    small archives many-per-task, hiding the parallelism the stage
    actually has at scale."""
    import zipfile

    from gis_city_county_spark.sources.files import (
        read_zipped_delimited_distributed,
    )

    d = tmp_path / "many"
    d.mkdir()
    n_archives = 48
    for i in range(n_archives):
        with zipfile.ZipFile(d / f"a{i:03d}.zip", "w") as zf:
            zf.writestr(f"m_{i}.csv", "code|name\n" + f"{i:04d}|p{i}")
    df = read_zipped_delimited_distributed(
        spark, str(d), r"m_\d+\.csv", ["code", "name"], sep="|"
    )
    assert df.rdd.getNumPartitions() == n_archives
    rows = df.collect()
    assert len(rows) == n_archives
    assert {r["code"] for r in rows} == {f"{i:04d}" for i in range(n_archives)}
    # every task parsed exactly one archive
    per_part = df.rdd.glom().map(len).collect()
    assert per_part == [1] * n_archives


def test_zipped_distributed_skips_hidden_and_expands_globs(spark, tmp_path):
    """Hidden/metadata files (_SUCCESS, .crc) in the archive dir must
    be skipped — Spark's own file sources filter them, and ZipFile on
    a marker file would fail the whole job — and glob paths must
    expand like every Spark file source."""
    import zipfile

    from gis_city_county_spark.sources.files import (
        read_zipped_delimited_distributed,
    )

    d = tmp_path / "arch"
    d.mkdir()
    for i in range(3):
        with zipfile.ZipFile(d / f"a{i}.zip", "w") as zf:
            zf.writestr(f"m_{i}.csv", "code|name\n" + f"{i:04d}|p{i}")
    (d / "_SUCCESS").write_text("")
    (d / ".a0.zip.crc").write_text("not a zip")

    df = read_zipped_delimited_distributed(
        spark, str(d), r"m_\d+\.csv", ["code", "name"], sep="|"
    )
    assert {r["code"] for r in df.collect()} == {"0000", "0001", "0002"}

    globbed = read_zipped_delimited_distributed(
        spark, str(d / "a[01].zip"), r"m_\d+\.csv", ["code", "name"], sep="|"
    )
    assert {r["code"] for r in globbed.collect()} == {"0000", "0001"}


def test_zipped_distributed_glob_over_directories(spark, tmp_path):
    """A glob that matches DIRECTORIES (e.g. base/* over partition
    dirs) must list one level inside each match — Spark file-source
    semantics — not silently yield zero archives."""
    import zipfile

    from gis_city_county_spark.sources.files import (
        read_zipped_delimited_distributed,
    )

    base = tmp_path / "base"
    for part in ("p=0", "p=1"):
        d = base / part
        d.mkdir(parents=True)
        i = int(part[-1])
        with zipfile.ZipFile(d / f"a{i}.zip", "w") as zf:
            zf.writestr(f"m_{i}.csv", "code|name\n" + f"{i:04d}|x")
        (d / "_SUCCESS").write_text("")
    (base / ".hidden_dir").mkdir()

    df = read_zipped_delimited_distributed(
        spark, str(base / "*"), r"m_\d+\.csv", ["code", "name"], sep="|"
    )
    assert {r["code"] for r in df.collect()} == {"0000", "0001"}


def test_zipped_distributed_rejects_bad_on_oversize(spark, tmp_path):
    import pytest

    from gis_city_county_spark.sources.files import (
        read_zipped_delimited_distributed,
    )

    with pytest.raises(ValueError, match="on_oversize"):
        read_zipped_delimited_distributed(
            spark, str(tmp_path), r".*", ["c"], max_archive_bytes=1,
            on_oversize="raise",
        )


def test_zipped_distributed_oversize_guard(spark, tmp_path):
    """Planning-time per-task memory guard: oversize archives fail
    loudly by default (naming the offenders) or are skipped with
    on_oversize='skip'; no archive bytes are read either way."""
    import zipfile

    import pytest

    from gis_city_county_spark.sources.files import (
        read_zipped_delimited_distributed,
    )

    d = tmp_path / "arch"
    d.mkdir()
    with zipfile.ZipFile(d / "small.zip", "w") as zf:
        zf.writestr("m_0.csv", "code|name\n0001|a")
    with zipfile.ZipFile(d / "big.zip", "w") as zf:
        zf.writestr("m_1.csv", "code|name\n" + "\n".join(
            f"{i:04d}|{'x' * 200}" for i in range(2000)
        ))
    cap = (d / "small.zip").stat().st_size + 10

    with pytest.raises(ValueError, match="big.zip"):
        read_zipped_delimited_distributed(
            spark, str(d), r"m_\d+\.csv", ["code", "name"], sep="|",
            max_archive_bytes=cap,
        )
    kept = read_zipped_delimited_distributed(
        spark, str(d), r"m_\d+\.csv", ["code", "name"], sep="|",
        max_archive_bytes=cap, on_oversize="skip",
    )
    assert {r["code"] for r in kept.collect()} == {"0001"}
