"""Round-9 second-wave operators: AMS F2, deterministic DP release,
one-pass correlation matrix (and later additions this round)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


# ----------------------------------------------------------- ams_f2


def test_ams_f2_exact_audit_and_bounds(spark):
    """Known distribution: counts (3,2,1) → F2 = 9+4+1 = 14, 3 keys.
    The estimate is deterministic (hash-seeded) and its mean over
    signs is F2-unbiased in expectation; here we pin the exact audit
    and the determinism across two independent builds."""
    from gis_city_county_spark.operators.sketch import ams_f2

    df = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)], "v string"
    )
    r1 = ams_f2(df, "v", n_seeds=16).collect()[0]
    r2 = ams_f2(df, "v", n_seeds=16).collect()[0]
    assert r1 == r2  # deterministic: same input, same sketch
    assert r1["n_keys"] == 3 and r1["f2_exact"] == 14.0
    # X_s ∈ [-6, 6] ⇒ X² ≤ 36 ⇒ the floor-mean is bounded
    assert 0 <= r1["f2_estimate"] <= 36


def test_ams_f2_all_distinct_has_exact_f2_n(spark):
    """Every value unique ⇒ F2 = n exactly; the estimate concentrates
    near n (signs cancel in the cross terms only in expectation, so
    just assert the audit and the err_ppm consistency)."""
    from gis_city_county_spark.operators.sketch import ams_f2

    df = spark.createDataFrame([(i,) for i in range(200)], "v long")
    r = ams_f2(df, "v", n_seeds=32).collect()[0]
    assert r["n_keys"] == 200 and r["f2_exact"] == 200.0
    import math

    assert r["err_ppm"] == math.floor(
        (r["f2_estimate"] - r["f2_exact"]) / r["f2_exact"] * 1_000_000
    )


def test_ams_f2_matches_duckdb_on_events(spark, sf_dir):
    from gis_city_county_spark.operators.sketch import ams_f2, ams_f2_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = [tuple(r) for r in ams_f2(ev, "user_id").collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            ams_f2_sql("SELECT * FROM events", "user_id")
        ).fetchall()
    ]
    assert got == want and len(got) == 1


# ------------------------------------------------------- dp_release


def test_dp_release_noise_bounded_and_deterministic(spark):
    """Noise is clamped to ±bound, the release floor-clamps at 0, and
    the same input yields the SAME release on every run (the whole
    point of the hash-seeded draw)."""
    from gis_city_county_spark.operators.privacy import dp_release

    df = spark.createDataFrame(
        [(f"g{i % 7}",) for i in range(300)], "seg string"
    )
    out1 = {r["group"]: tuple(r) for r in dp_release(df, "seg", bound=8).collect()}
    out2 = {r["group"]: tuple(r) for r in dp_release(df, "seg", bound=8).collect()}
    assert out1 == out2 and len(out1) == 7
    for _, noisy, exact, eps in out1.values():
        assert abs(noisy - exact) <= 8
        assert noisy >= 0 and eps == 500


def test_dp_release_salt_changes_noise_not_audit(spark):
    """A different salt redraws the noise but never the exact audit —
    the release is keyed, not re-randomized."""
    from gis_city_county_spark.operators.privacy import dp_release

    df = spark.createDataFrame(
        [(f"s{i % 5}",) for i in range(200)], "seg string"
    )
    a = {r["group"]: r for r in dp_release(df, "seg", salt="k1").collect()}
    b = {r["group"]: r for r in dp_release(df, "seg", salt="k2").collect()}
    assert all(
        a[g]["audit_exact"] == b[g]["audit_exact"] for g in a
    )
    assert any(a[g]["noisy_count"] != b[g]["noisy_count"] for g in a)


def test_dp_release_cdf_thresholds_shape():
    """2·bound thresholds, strictly increasing, inside (0, 1)."""
    from gis_city_county_spark.operators.privacy import (
        _dlaplace_cdf_thresholds,
    )

    t = _dlaplace_cdf_thresholds(0.5, 16)
    assert len(t) == 32
    assert all(0.0 < a < 1.0 for a in t)
    assert all(a < b for a, b in zip(t, t[1:]))


def test_dp_release_matches_duckdb_on_customer(spark, sf_dir):
    from gis_city_county_spark.operators.privacy import (
        dp_release,
        dp_release_sql,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = sorted(tuple(r) for r in dp_release(cust, "c_mktsegment").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            dp_release_sql("SELECT * FROM customer", "c_mktsegment")
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------------ corr_matrix


def test_corr_matrix_known_correlations(spark):
    """y = 2x ⇒ r = 1; z = −x ⇒ r = −1; a constant column has zero
    variance ⇒ NULL."""
    from gis_city_county_spark.operators.mlprep import corr_matrix

    rows = [(float(i), float(2 * i), float(-i), 5.0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    out = {
        (r["x_name"], r["y_name"]): r
        for r in corr_matrix(
            df,
            {
                "x": F.col("x"),
                "y": F.col("y"),
                "z": F.col("z"),
                "c": F.col("c"),
            },
        ).collect()
    }
    assert len(out) == 6
    assert abs(out[("x", "y")]["pearson_r"] - 1.0) < 1e-12
    assert abs(out[("x", "z")]["pearson_r"] + 1.0) < 1e-12
    assert out[("x", "c")]["pearson_r"] is None
    assert out[("x", "y")]["n"] == 10


def test_corr_matrix_matches_duckdb_on_lineitem(spark, sf_dir):
    from gis_city_county_spark.operators.mlprep import (
        corr_matrix,
        corr_matrix_sql,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = sorted(
        tuple(r)
        for r in corr_matrix(
            li,
            {
                "qty": F.col("l_quantity"),
                "price": F.col("l_extendedprice"),
                "disc": F.col("l_discount"),
                "tax": F.col("l_tax"),
            },
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            corr_matrix_sql(
                "SELECT * FROM lineitem",
                {
                    "qty": "l_quantity",
                    "price": "l_extendedprice",
                    "disc": "l_discount",
                    "tax": "l_tax",
                },
            )
        ).fetchall()
    )
    assert got == want and len(got) == 6
