"""Property-based invariants for relational operators (hypothesis).

The geometry kernel has exact algebraic properties
(test_geo_properties); these are the relational counterparts — the
contracts that make the operators safe at scale: partition
independence (same result under any repartitioning), sample
monotonicity, CDC idempotence, and as-of join equivalence to the
brute-force definition. Example counts are kept small because every
example runs Spark jobs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

EX = dict(max_examples=6, deadline=None)


sizes_lists = st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=12)


@settings(**EX)
@given(sizes_lists, st.integers(min_value=4, max_value=20))
def test_pack_sequences_partition_independent_and_contiguous(sizes, budget):
    from gis_city_county_spark.operators.packing import pack_sequences

    spark = test_pack_sequences_partition_independent_and_contiguous.spark
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n long").withColumn(
        "shard", F.lit(0)
    )
    out1 = {
        (r.doc_id, r.pack_id, r.pack_offset)
        for r in pack_sequences(df, ["shard"], "doc_id", "n", budget).collect()
    }
    # partition independence: any physical layout gives the same packs
    out2 = {
        (r.doc_id, r.pack_id, r.pack_offset)
        for r in pack_sequences(
            df.repartition(5), ["shard"], "doc_id", "n", budget
        ).collect()
    }
    assert out1 == out2
    # offsets are the cumulative sizes of the (deterministic) order:
    # sorted by offset they chain exactly, and pack_id = offset//budget
    chain = sorted(
        (r for r in pack_sequences(df, ["shard"], "doc_id", "n", budget).collect()),
        key=lambda r: r.pack_offset,
    )
    acc = 0
    by_id = dict(rows)
    for r in chain:
        assert r.pack_offset == acc
        assert r.pack_id == acc // budget
        acc += by_id[r.doc_id]
    assert {r.doc_id for r in chain} == {i for i, _ in rows}


events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=50),  # ts (seconds)
        st.integers(min_value=0, max_value=99),  # payload / tiebreak
    ),
    min_size=1,
    max_size=14,
)


@settings(**EX)
@given(events, events)
def test_asof_join_matches_bruteforce(lrows, rrows):
    from gis_city_county_spark.operators.temporal import asof_join

    spark = test_asof_join_matches_bruteforce.spark
    # unique right (key, ts, tiebreak) rows so the expected pick is well-defined
    rrows = sorted(set(rrows))
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts, _) in enumerate(lrows)],
        "k long, s long, lid long",
    ).select("k", F.timestamp_seconds("s").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(k, ts, tb) for (k, ts, tb) in rrows], "k long, s long, rid long"
    ).select("k", F.timestamp_seconds("s").alias("ts"), "rid")

    got = {
        (r.lid, r.rid_r)
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["rid"], right_tiebreak="rid"
        ).collect()
    }
    want = set()
    for i, (k, ts, _) in enumerate(lrows):
        cands = [(rts, tb) for (rk, rts, tb) in rrows if rk == k and rts <= ts]
        want.add((i, max(cands)[1] if cands else None))
    assert got == want


weights = st.lists(st.floats(min_value=0.0, max_value=1.2), min_size=1, max_size=20)


@settings(**EX)
@given(weights, st.floats(min_value=0.1, max_value=0.9))
def test_weighted_sample_monotone_in_weight(ws, shrink):
    from gis_city_county_spark.operators.sketch import weighted_hash_sample

    spark = test_weighted_sample_monotone_in_weight.spark
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(ws)], "id long, w double"
    )
    full = {r.id for r in weighted_hash_sample(df, "id", F.col("w")).collect()}
    small = {
        r.id
        for r in weighted_hash_sample(df, "id", F.col("w") * shrink).collect()
    }
    # lowering every weight can only shrink the kept set
    assert small <= full


changes_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=99),  # value
        st.sampled_from(["U", "D"]),
    ),
    min_size=0,
    max_size=8,
)


@settings(**EX)
@given(changes_lists)
def test_merge_upsert_idempotent(chs):
    from gis_city_county_spark.operators.cdc import merge_upsert

    spark = test_merge_upsert_idempotent.spark
    base = spark.createDataFrame(
        [(k, -1) for k in range(3)], "k long, v long"
    )
    # one change per key (last wins deterministically via max value)
    latest = {}
    for k, v, op in chs:
        if k not in latest or v > latest[k][0]:
            latest[k] = (v, op)
    if latest:
        ch = spark.createDataFrame(
            [(k, v, op) for k, (v, op) in latest.items()], "k long, v long, op string"
        )
    else:
        ch = spark.createDataFrame([], "k long, v long, op string")
    once = merge_upsert(base, ch, ["k"])
    twice = merge_upsert(once, ch, ["k"])
    assert {(r.k, r.v) for r in once.collect()} == {
        (r.k, r.v) for r in twice.collect()
    }


def pytest_generate_tests(metafunc):
    pass


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _attach_spark(spark):
    # hypothesis @given wraps the test, so the pytest fixture can't be
    # a parameter; attach the session to each function instead.
    for fn in (
        test_pack_sequences_partition_independent_and_contiguous,
        test_asof_join_matches_bruteforce,
        test_weighted_sample_monotone_in_weight,
        test_merge_upsert_idempotent,
    ):
        fn.spark = spark
    yield
