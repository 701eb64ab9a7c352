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



docs_lists = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        min_size=1,
        max_size=6,
    ),
    min_size=2,
    max_size=8,
)


@settings(**EX)
@given(docs_lists)
def test_prefix_jaccard_join_matches_bruteforce(token_lists):
    """Prefix filtering is EXACT: the join returns precisely the pairs
    with token-set Jaccard >= 3/5 — nothing missed (the completeness
    theorem), nothing extra (the verify stage)."""
    from gis_city_county_spark.operators.dedup import prefix_jaccard_join

    spark = test_prefix_jaccard_join_matches_bruteforce.spark
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.a_id, r.b_id)
        for r in prefix_jaccard_join(df, "doc_id", "text", 3, 5).collect()
    }
    sets = {i: set(toks) for i, toks in enumerate(token_lists)}
    want = set()
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if inter * 5 >= union * 3:
                    want.add((a, b))
    assert got == want


intervals = st.lists(
    st.integers(min_value=0, max_value=120),  # start second
    min_size=1,
    max_size=12,
)


@settings(**EX)
@given(intervals, st.integers(min_value=1, max_value=90))
def test_peak_concurrency_matches_bruteforce(starts, dur):
    """The sweep-line daily peak equals the brute-force maximum over
    all interval start points (a half-open-interval overlap max is
    always attained at some start)."""
    from gis_city_county_spark.operators.temporal import peak_concurrency

    spark = test_peak_concurrency_matches_bruteforce.spark
    base = 1_700_000_000  # fixed epoch seconds anchor
    rows = [(i, (base + s)) for i, s in enumerate(starts)]
    df = spark.createDataFrame(rows, "i long, sec long").select(
        F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = {r.day: r.peak for r in peak_concurrency(df, "ts", dur).collect()}
    # brute force: for each interval start, count overlapping intervals,
    # attribute the overlap to the day containing that start
    day_us = 86_400_000_000
    peaks = {}
    for s in starts:
        t = (base + s) * 1_000_000
        cnt = sum(1 for o in starts if (base + o) * 1_000_000 <= t < (base + o + dur) * 1_000_000)
        d = t // day_us
        peaks[d] = max(peaks.get(d, 0), cnt)
    got_by_day = {int(k.timestamp() * 1_000_000) // day_us: v for k, v in out.items()}
    for d, want_peak in peaks.items():
        assert got_by_day.get(d, 0) >= want_peak
    assert max(got_by_day.values()) == max(peaks.values())


merge_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=8),
    min_size=1,
    max_size=6,
)


@settings(**EX)
@given(merge_docs, st.integers(min_value=1, max_value=3))
def test_pair_merge_rounds_matches_bruteforce(token_lists, rounds):
    """The relational merge induction (run-parity greedy) must equal
    the sequential reference implementation — including the w1==w2
    runs ("a a a" merges positions 1 and 3) and cross-round
    interactions."""
    from gis_city_county_spark.operators.corpus import pair_merge_rounds

    spark = test_pair_merge_rounds_matches_bruteforce.spark
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.round, r.w1, r.w2, r.pair_count)
        for r in pair_merge_rounds(df, "doc_id", "text", rounds=rounds).collect()
    ]

    # sequential reference
    docs = [list(t) for t in token_lists]
    want = []
    for rnd in range(1, rounds + 1):
        counts = {}
        for d in docs:
            for i in range(len(d) - 1):
                counts[(d[i], d[i + 1])] = counts.get((d[i], d[i + 1]), 0) + 1
        if not counts:
            break
        (w1, w2), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rnd, w1, w2, c))
        new_docs = []
        for d in docs:
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == w1 and d[i + 1] == w2:
                    out.append(d[i] + "_" + d[i + 1])
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            new_docs.append(out)
        docs = new_docs
    assert got == want

@settings(**EX)
@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=14),
    st.integers(min_value=1, max_value=120),
)
def test_interval_union_matches_bruteforce(starts, dur):
    """Merged islands cover exactly the union of the input intervals:
    covered microseconds equal the brute-force measure of the union,
    islands are disjoint with true gaps between them, and member
    counts add up to the inputs."""
    from gis_city_county_spark.operators.temporal import interval_union

    spark = test_interval_union_matches_bruteforce.spark
    base = 1_700_000_000
    rows = [(i, base + s) for i, s in enumerate(starts)]
    df = spark.createDataFrame(rows, "user long, sec long").select(
        F.lit(1).alias("key"), F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = sorted(
        interval_union(df, "key", "ts", dur).collect(),
        key=lambda r: r.island_start_us,
    )
    # brute-force union measure in whole seconds
    covered = set()
    for s in starts:
        covered.update(range(base + s, base + s + dur))
    assert sum(r.covered_us for r in out) == len(covered) * 1_000_000
    assert sum(r.n_intervals for r in out) == len(starts)
    for a, b in zip(out, out[1:]):
        assert a.island_end_us < b.island_start_us  # true gap between islands
        assert a.island_end_us - a.island_start_us == a.covered_us


@settings(**EX)
@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=20
    )
)
def test_clamped_balance_matches_sequential(deltas):
    """The two-window identity equals the sequential definition
    b_t = max(0, b_{t-1} + d_t) exactly."""
    from gis_city_county_spark.operators.temporal import clamped_running_balance

    spark = test_clamped_balance_matches_sequential.spark
    base = 1_700_000_000
    rows = [(i, base + i, float(d)) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, "i long, sec long, d double").select(
        F.lit(1).alias("k"),
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        F.col("i"),
        F.col("d"),
    )
    out = {
        r.i: r.balance
        for r in clamped_running_balance(df, "k", "ts", "i", F.col("d")).collect()
    }
    b = 0.0
    for i, d in enumerate(deltas):
        b = max(0.0, b + d)
        assert out[i] == b


@settings(**EX)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=16,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=30),
)
def test_bounded_funnel_matches_bruteforce(events, hop):
    """Per-hop reach counts equal the brute-force first-within-bound
    chase over the event list."""
    from gis_city_county_spark.operators.temporal import bounded_funnel

    spark = test_bounded_funnel_matches_bruteforce.spark
    base = 1_700_000_000
    rows = [(i, base + sec, cls) for i, (sec, cls) in enumerate(events)]
    df = spark.createDataFrame(rows, "i long, sec long, cls string").select(
        F.lit(1).alias("k"),
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        F.col("i"),
        F.col("cls"),
    )
    got = bounded_funnel(df, "k", "ts", "i", "cls", ["a", "b", "c"], hop).collect()
    evs = sorted(((base + s) * 1_000_000, i, c) for i, (s, c) in enumerate(events))
    a_events = [(t, i) for t, i, c in evs if c == "a"]
    n1 = n2 = 0
    for t0, _ in a_events:
        bs = [(t, i) for t, i, c in evs if c == "b" and t0 < t <= t0 + hop * 1_000_000]
        if not bs:
            continue
        n1 += 1
        t1 = min(bs)[0]
        cs = [t for t, i, c in evs if c == "c" and t1 < t <= t1 + hop * 1_000_000]
        if cs:
            n2 += 1
    if not a_events:
        assert got == []
    else:
        (row,) = got
        assert row.n_stage0 == len(a_events)
        assert row.n_reached_1 == n1
        assert row.n_reached_2 == n2


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
        test_prefix_jaccard_join_matches_bruteforce,
        test_peak_concurrency_matches_bruteforce,
        test_pair_merge_rounds_matches_bruteforce,
        test_interval_union_matches_bruteforce,
        test_clamped_balance_matches_sequential,
        test_bounded_funnel_matches_bruteforce,
        test_grid_knn_neighbor_cells_complete,
        test_bitmap_distinct_exact_and_partition_independent,
        test_lsh_bucket_cap_bounds_adversarial_corpus,
    ):
        fn.spark = spark
    yield


@settings(**EX)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=10,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=15,
    ),
)
def test_grid_knn_neighbor_cells_complete(a_pts, b_pts):
    """The 3×3 neighbor-cell equi-join finds EXACTLY the within-radius
    pairs brute force finds (cell size = radius guarantees coverage),
    and per-probe ranks follow (dist², id)."""
    from pyspark.sql import Window

    spark = test_grid_knn_neighbor_cells_complete.spark
    r = 7.0
    a = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(a_pts)],
        "aid long, ax double, ay double",
    )
    b = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(b_pts)],
        "bid long, bx double, by double",
    )
    bc = b.withColumns(
        {
            "cx": F.floor(F.col("bx") / r).cast("long"),
            "cy": F.floor(F.col("by") / r).cast("long"),
        }
    )
    probes = a.select(
        "aid", "ax", "ay",
        F.explode(
            F.expr(f"sequence(CAST(floor(ax/{r}) AS BIGINT) - 1, CAST(floor(ax/{r}) AS BIGINT) + 1)")
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.expr(f"sequence(CAST(floor(ay/{r}) AS BIGINT) - 1, CAST(floor(ay/{r}) AS BIGINT) + 1)")
        ).alias("cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    got = {
        (row.aid, row.bid)
        for row in probes.join(bc, ["cx", "cy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= r * r)
        .select("aid", "bid")
        .collect()
    }
    want = {
        (i, j)
        for i, (x1, y1) in enumerate(a_pts)
        for j, (x2, y2) in enumerate(b_pts)
        if (x1 - x2) ** 2 + (y1 - y2) ** 2 <= r * r
    }
    assert got == want


@settings(**EX)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_bitmap_distinct_exact_and_partition_independent(rows):
    """Bitmap popcount distinct equals countDistinct on any data and
    any physical partitioning."""
    from gis_city_county_spark.operators.sketch import bitmap_distinct

    spark = test_bitmap_distinct_exact_and_partition_independent.spark
    df = spark.createDataFrame(rows, "g string, id long")
    got = {
        r.g: r.n_distinct
        for r in bitmap_distinct(df, ["g"], "id").collect()
    }
    got_re = {
        r.g: r.n_distinct
        for r in bitmap_distinct(df.repartition(7), ["g"], "id").collect()
    }
    want = {}
    for g, i in rows:
        want.setdefault(g, set()).add(i)
    want = {g: len(s) for g, s in want.items()}
    assert got == want == got_re


@settings(**EX)
@given(
    st.integers(min_value=4, max_value=12),   # constant-text block size
    st.integers(min_value=0, max_value=6),    # unique-text docs
)
def test_lsh_bucket_cap_bounds_adversarial_corpus(n_const, n_uniq):
    """Adversarial constant-text corpus: every duplicate doc lands in
    ONE band bucket per band, so the uncapped self-join emits
    C(n,2)·bands rows — quadratic in the boilerplate flood. The
    max_bucket cap must (a) drop exactly the pathological buckets,
    (b) keep pairs among docs outside them, and (c) report the dropped
    mass."""
    from gis_city_county_spark.operators.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        lsh_skew_report,
        minhash_signatures,
        shingle_df,
    )

    spark = test_lsh_bucket_cap_bounds_adversarial_corpus.spark
    const_text = "the same boilerplate text repeated everywhere again"
    uniq = [
        f"document number {i} talks about entirely distinct topic {i * 7}"
        for i in range(n_uniq)
    ]
    rows = [(i, const_text) for i in range(n_const)] + [
        (1000 + i, t) for i, t in enumerate(uniq)
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    bands = lsh_bands(
        minhash_signatures(shingle_df(df, "doc_id", "body"), "doc_id"), "doc_id"
    ).cache()

    # Uncapped: the constant block pairs completely (4 matching bands).
    full = lsh_candidate_pairs(bands, "doc_id")
    const_pairs = full.filter(F.col("b_id") < 1000)
    assert const_pairs.count() == n_const * (n_const - 1) // 2

    # Cap below the block size: its buckets drop, so no constant-block
    # pair survives; everything NOT in a hot bucket is untouched.
    cap = n_const - 1
    capped = lsh_candidate_pairs(bands, "doc_id", max_bucket=cap)
    assert capped.filter(F.col("b_id") < 1000).count() == 0
    uncapped_rest = {
        (r.a_id, r.b_id, r.n_bands)
        for r in full.filter(F.col("b_id") >= 1000).collect()
    }
    capped_rest = {
        (r.a_id, r.b_id, r.n_bands)
        for r in capped.filter(F.col("b_id") >= 1000).collect()
    }
    assert capped_rest == uncapped_rest

    # The report accounts for the dropped mass: 4 bands' worth of the
    # constant block (its docs share identical signatures).
    rep = lsh_skew_report(bands, cap).collect()[0]
    assert rep.n_buckets_dropped == 4
    assert rep.n_rows_dropped == 4 * n_const
    # a cap nothing exceeds drops nothing
    rep2 = lsh_skew_report(bands, n_const).collect()[0]
    assert rep2.n_buckets_dropped == 0 and rep2.n_rows_dropped == 0
    bands.unpersist()


# ----------------- r3: two-phase global-order helpers (scale.ranged_*)

rank_values = st.lists(
    st.one_of(
        st.none(),
        st.just(float("nan")),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=30,
)


@settings(**EX)
@given(rank_values, st.integers(min_value=1, max_value=6))
def test_ranged_rank_fuzz_matches_global_window(vals, n_ranges):
    """Any value multiset (duplicates, negatives, NULLs) and any
    bucket count must reproduce the single-window global rank."""
    from pyspark.sql import SparkSession, Window

    from gis_city_county_spark.operators.scale import ranged_rank

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame(
        [(i, None if v is None else float(v)) for i, v in enumerate(vals)],
        "k long, v double",
    )
    got = {
        r["k"]: int(r["rnk"])
        for r in ranged_rank(
            df, "v", "k", rank_col="rnk", descending=True, n_ranges=n_ranges
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc())
    want = {
        r["k"]: int(r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w)).collect()
    }
    assert got == want


key_sets = st.sets(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=40)


@settings(**EX)
@given(key_sets, st.integers(min_value=2, max_value=64))
def test_ranged_gaps_fuzz_matches_global_lead(keys, width):
    from pyspark.sql import SparkSession, Window

    from gis_city_county_spark.operators.scale import ranged_gaps

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = sorted(
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in ranged_gaps(df, "k", bucket_width=width).collect()
    )
    w = Window.orderBy("k")
    ref = (
        df.withColumn("nxt", F.lead("k").over(w))
        .filter(F.col("nxt") > F.col("k") + 1)
        .select(
            (F.col("k") + 1).alias("s"),
            (F.col("nxt") - 1).alias("e"),
            (F.col("nxt") - F.col("k") - 1).alias("l"),
        )
    )
    want = sorted((r["s"], r["e"], r["l"]) for r in ref.collect())
    assert got == want


def test_curriculum_phases_null_difficulty_matches_duckdb(spark):
    """NULL difficulties: Spark asc ranks NULLS FIRST and ranged_rank
    routes NULL to the first bucket; the oracle must say NULLS FIRST
    explicitly because DuckDB's ASC default is NULLS LAST (review
    finding r4)."""
    import duckdb
    import pandas as pd

    from gis_city_county_spark.operators.mlprep import (
        curriculum_phases,
        curriculum_phases_sql,
    )

    rows = [(1, 10), (2, None), (3, 30), (4, 20), (5, None), (6, 40)]
    df = spark.createDataFrame(rows, "id long, diff long")
    got = {
        (r["phase"], r["n_rows"], r["min_difficulty"], r["max_difficulty"])
        for r in curriculum_phases(df, "id", "diff", n_phases=3).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "diff"]))
    sql = curriculum_phases_sql("t", "id", "diff", n_phases=3)
    want = {
        (r[0], r[1], r[2], r[3]) for r in con.execute(sql).fetchall()
    }
    assert got == want
    # the two NULLs land in the FIRST phase on both engines
    first = [t for t in got if t[0] == 0]
    assert first and first[0][1] == 2 and first[0][2] is None


def test_target_encode_shrinkage_invariants(spark):
    """m-estimate algebra: every encoded value lies between the raw
    category mean and the global prior (shrinkage never overshoots),
    and grows toward the prior as m grows."""
    from gis_city_county_spark.operators.mlprep import target_encode

    rows = [("a", 10.0), ("a", 20.0), ("b", 100.0),
            ("c", 1.0), ("c", 2.0), ("c", 3.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    prior = sum(v for _, v in rows) / len(rows)
    for m in (1.0, 10.0, 1000.0):
        out = {r["cat"]: r for r in target_encode(df, "cat", "y", m=m).collect()}
        for cat, r in out.items():
            raw_mean = r["sum_y"] / r["n"]
            lo, hi = sorted((raw_mean, prior))
            assert lo - 1e-9 <= r["encoded"] <= hi + 1e-9, (cat, m)
            assert abs(r["prior"] - prior) < 1e-9
    big = {r["cat"]: r["encoded"]
           for r in target_encode(df, "cat", "y", m=1e9).collect()}
    assert all(abs(v - prior) < 1e-3 for v in big.values())


def test_calibration_bins_partition_and_bounds(spark):
    """Bins partition the rows (counts sum to n), avg_pred stays inside
    its bin's milli-range, and frac_pos is within [0, 1]."""
    from gis_city_county_spark.operators.mlprep import calibration_bins

    rows = [(i * 37 % 1000, i % 3 == 0) for i in range(500)]
    df = spark.createDataFrame(rows, "pred_milli long, label boolean")
    out = calibration_bins(df, "pred_milli", "label", n_bins=10).collect()
    assert sum(r["n"] for r in out) == 500
    for r in out:
        lo, hi = r["bin"] * 100 / 1000.0, (r["bin"] + 1) * 100 / 1000.0
        assert lo - 1e-9 <= r["avg_pred"] < hi + 1e-9
        assert 0.0 <= r["frac_pos"] <= 1.0
        assert abs(r["abs_gap"] - abs(r["avg_pred"] - r["frac_pos"])) < 1e-12


def test_kfold_stratified_partitions_and_is_stable(spark):
    """Fold cells partition each stratum, folds land in [0, k), and
    the assignment is identical across recomputation (md5-keyed, no
    RNG state)."""
    from gis_city_county_spark.operators.mlprep import kfold_stratified

    rows = [(i, ["x", "y", "z"][i % 3], float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, s string, y double")
    a = kfold_stratified(df, "id", "s", "y", n_folds=5).collect()
    b = kfold_stratified(df, "id", "s", "y", n_folds=5).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    per_stratum: dict[str, int] = {}
    for r in a:
        assert 0 <= r["fold"] < 5
        per_stratum[r["s"]] = per_stratum.get(r["s"], 0) + r["n"]
    assert per_stratum == {"x": 100, "y": 100, "z": 100}


def test_vocab_coverage_bounds_and_ppm_monotonicity(spark):
    """coverage ∈ [0,1], covered ≤ total, and raising the ppm
    threshold (smaller vocabulary) never increases any group's
    coverage."""
    from gis_city_county_spark.operators.corpus import vocab_coverage

    rows = [(i, "common words everywhere" if i % 2 else f"rare{i} token{i}",
             ["g1", "g2"][i % 2]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, text string, grp string")

    def cov(ppm):
        return {
            r["grp"]: (r["coverage"], r["covered_occ"], r["total_occ"])
            for r in vocab_coverage(df, "id", "text", "grp", ppm=ppm).collect()
        }

    loose, tight = cov(1000), cov(200000)
    for got in (loose, tight):
        for c, covd, tot in got.values():
            assert 0.0 <= c <= 1.0 and 0 <= covd <= tot
    for g in loose:
        assert tight[g][0] <= loose[g][0] + 1e-12


def test_randomized_response_debias_is_exact_inverse(spark):
    """With the deterministic md5 coins, the debiased estimate applied
    to the *expected* observation identity must recover a value whose
    error equals (den·flips_diff)/(den−2) — i.e. est_err is exactly
    determined by how many coins flipped each way; verify via direct
    recomputation."""
    from gis_city_county_spark.operators.privacy import randomized_response
    from gis_city_county_spark.operators.sketch import _h60
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "g", i % 4 == 0) for i in range(200)], "id long, g string, b boolean"
    )
    out = randomized_response(df, "id", "g", "b", flip_den=4).collect()[0]
    flips = df.select(
        (
            (_h60(F.concat(F.lit("rr|"), F.col("id").cast("string"))) % 4) == 0
        ).alias("f"),
        "b",
    ).collect()
    obs = sum((not r["b"]) if r["f"] else r["b"] for r in flips)
    n, true = len(flips), sum(r["b"] for r in flips)
    assert out["n"] == n and out["true_cnt"] == true and out["observed_cnt"] == obs
    assert abs(out["est_cnt"] - (4 * obs - n) / 2.0) < 1e-12

    import pytest as _pytest
    with _pytest.raises(ValueError):
        randomized_response(df, "id", "g", "b", flip_den=2)


def test_connected_components_long_chain_converges_fast(spark):
    """Pointer-jumping must make rounds O(log diameter): a 200-node
    path (diameter 199) exceeds any plausible plain-propagation cap,
    and every node must still land on the component minimum."""
    from gis_city_county_spark.operators.dedup import connected_components

    n = 200
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    out = connected_components(nodes, pairs, "doc_id", max_iters=12).collect()
    assert len(out) == n
    assert all(r["component"] == 0 for r in out)
    assert sum(r["is_keeper"] for r in out) == 1
    assert all(r["component_size"] == n for r in out)


def test_connected_components_multi_component(spark):
    """Two separate clusters plus singletons: keepers are per-cluster
    minima and singletons keep themselves."""
    from gis_city_county_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 8)], "a_id long, b_id long"
    )
    got = {r["doc_id"]: (r["component"], r["component_size"], r["is_keeper"])
           for r in connected_components(nodes, pairs, "doc_id").collect()}
    assert got[1] == (1, 3, True) and got[3] == (1, 3, False)
    assert got[5] == (1, 3, False)
    assert got[6] == (6, 2, True) and got[8] == (6, 2, False)
    for s in (0, 2, 4, 7, 9):
        assert got[s] == (s, 1, True)


def test_cluster_keeper_keeps_best_member_of_planted_clusters(spark):
    """Recall fixture with KNOWN ground truth: planted near-duplicate
    families (shared long boilerplate; one member truncated, i.e.
    genuinely lower quality) plus unrelated singletons. The keeper
    must (a) recover exactly the planted clusters, (b) keep the
    HIGHEST-quality member of each — not the min id — and (c) keep
    every singleton."""
    from gis_city_county_spark.operators.dedup import cluster_quality_keeper
    from gis_city_county_spark.operators.textstats import quality_score

    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays on and the crowd watches the game in the warm summer "
        "evening near the old stone bridge by the river as the vendors "
        "sell roasted chestnuts to the children walking home from the "
        "school with their heavy bags full of books and papers"
    )
    rows = []
    # family A (ids 10..12): id 11 is a TRUNCATED copy (lower length
    # component -> lower quality); 10 vs 12 decide by quality then id.
    rows.append((10, base + " alpha edition"))
    rows.append((11, " ".join(base.split()[:-12])))
    rows.append((12, base + " alpha print"))
    # family B (ids 20..21): its own boilerplate (disjoint from A's);
    # 21 longer and richer (higher quality).
    base_b = (
        "when the committee convened on tuesday the minutes recorded a "
        "long discussion about the harbor dredging schedule and the "
        "allocation of funds for the lighthouse repairs next spring"
    )
    rows.append((20, base_b + " beta"))
    rows.append((21, base_b + " beta with an extra careful closing sentence"))
    # singletons with disjoint vocabularies (no shared shingles)
    rows.append((30, "completely different short text about volcanoes erupting basalt"))
    rows.append((31, "unrelated quarterly report revenue margins guidance outlook numbers"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = cluster_quality_keeper(df, "doc_id", "text").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {r[0] for r in rows}

    # (a) exact planted clusters
    comp_members: dict[int, set[int]] = {}
    for r in out:
        comp_members.setdefault(r["component"], set()).add(r["doc_id"])
    clusters = {frozenset(m) for m in comp_members.values()}
    assert clusters == {
        frozenset({10, 11, 12}),
        frozenset({20, 21}),
        frozenset({30}),
        frozenset({31}),
    }

    # (b) keeper is the quality argmax (id tiebreak), recomputed
    # independently from the same score the operator uses
    q = {
        r["doc_id"]: r["q"]
        for r in df.select("doc_id", quality_score("text").alias("q")).collect()
    }
    for members in (frozenset({10, 11, 12}), frozenset({20, 21})):
        best = min(members, key=lambda i: (-q[i], i))
        for i in members:
            assert by_id[i]["keep"] == (i == best), (members, best, q)
        assert by_id[best]["component_size"] == len(members)
    # the truncated member is strictly lower quality -> never the keeper
    assert q[11] < min(q[10], q[12])
    assert not by_id[11]["keep"]
    # and the fixture is non-trivial: the quality argmax of family B is
    # NOT its min id (a min-id keeper would get this wrong)
    assert q[21] > q[20]
    assert by_id[21]["keep"] and not by_id[20]["keep"]

    # (c) singletons keep themselves
    assert by_id[30]["keep"] and by_id[31]["keep"]


def test_incremental_dedup_survives_null_fingerprints(spark):
    """A NULL text (NULL md5 fingerprint) in the base must not poison
    the oracle (NOT IN semantics would return zero 'fresh' rows) and
    NULL-fp incoming rows behave like Spark's left_anti: kept as
    fresh.  Engine and DuckDB twin must agree cell-for-cell."""
    import duckdb

    from gis_city_county_spark.operators.dedup import (
        incremental_dedup_report,
        incremental_dedup_report_sql,
    )

    base_rows = [(1, "g", "alpha beta"), (2, "g", None)]
    inc_rows = [
        (10, "g", "alpha beta"),   # dup vs base
        (11, "g", None),           # NULL fp: fresh (anti-join keeps)
        (12, "g", None),           # second NULL fp: also fresh/kept
        (13, "g", "gamma delta"),  # genuinely new
        (14, "g", "gamma delta"),  # in-batch dup of 13
    ]
    schema = "doc_id long, source string, text string"
    base = spark.createDataFrame(base_rows, schema)
    inc = spark.createDataFrame(inc_rows, schema)
    got = incremental_dedup_report(base, inc, "doc_id", "text", "source").collect()
    assert len(got) == 1
    r = got[0]
    # NULL fps: row_number partitions NULLs together on both engines,
    # so of 11/12 one is the keeper; 13 keeps, 14 in-batch dup.
    assert r["n_incoming"] == 5
    assert r["n_dup_vs_base"] == 1
    assert r["n_dup_in_batch"] == 2
    assert r["n_ingested"] == 2

    con = duckdb.connect()
    con.execute("CREATE TABLE b (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.execute("CREATE TABLE i (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO b VALUES (?, ?, ?)", base_rows)
    con.executemany("INSERT INTO i VALUES (?, ?, ?)", inc_rows)
    sql = incremental_dedup_report_sql(
        "SELECT * FROM b", "SELECT * FROM i", "doc_id", "text", "source"
    )
    want = con.execute(sql).fetchall()
    assert want == [("g", 5, 1, 2, 2)]


def test_shingle_df_non_unique_id_dedupes_across_rows(spark):
    """r12 regression pin: with a grouping id that spans rows (a
    SOURCE key, not a doc key), a shingle repeated by two documents of
    the same id must count ONCE — the row-local array_distinct alone
    is not enough (caught by the r12 driver-sim sweep on
    corpus_source_similarity). unique_id_rows=True documents the
    one-row-per-id contract and must agree wherever that contract
    holds."""
    from gis_city_county_spark.operators.dedup import shingle_df

    rows = [
        ("feedA", "the quick brown fox jumps"),
        ("feedA", "the quick brown fox sleeps"),   # repeats 2 shingles
        ("feedB", "another entirely different text here"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")

    got = {
        (r["source"], r["shingle"])
        for r in shingle_df(df, "source", "text", k=3).collect()
    }
    # feedA: doc1 has 3 shingles, doc2 has 3, sharing 'the quick brown'
    # and 'quick brown fox' -> 4 distinct; feedB: 3.
    assert len([1 for s, _ in got if s == "feedA"]) == 4
    assert len([1 for s, _ in got if s == "feedB"]) == 3

    # On a one-row-per-id input both modes are set-identical.
    uniq = df.withColumn(
        "rid",
        F.monotonically_increasing_id().cast("string"),
    )
    a = {
        (r["rid"], r["shingle"])
        for r in shingle_df(uniq, "rid", "text", k=3).collect()
    }
    b = {
        (r["rid"], r["shingle"])
        for r in shingle_df(
            uniq, "rid", "text", k=3, unique_id_rows=True
        ).collect()
    }
    assert a == b
