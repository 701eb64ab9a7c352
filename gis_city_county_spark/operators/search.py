"""Keyword search scoring: TF-IDF top-k over a document corpus.

Fully relational full-text scoring for a fixed term list: one token
explode → per-document conditional term counts (map-side-combinable
aggregate, one pass) → corpus document frequencies as a 1-row
broadcast → score and rank.

Determinism across engines: the score uses the rational inverse
document frequency ``N / df`` (one double division, one multiply per
term, terms summed in FIXED expression order) — every operation is an
IEEE primitive with identical operands on Spark and the oracle, so
results are bit-equal. Production rankers swap in the damped
``ln((N - df + 0.5) / (df + 0.5))`` BM25 idf — a one-line change that
costs only cross-engine bit-equality (libm ``log`` is not correctly
rounded), not determinism within an engine.

Scale: the explode fans out ~tokens-per-doc ×; the conditional
aggregate collapses it right back to one row per matching document
before any shuffle (partial aggregation), so shuffle volume is
O(matching docs), not O(tokens). The df/N side is a single 1-row
frame — broadcast, never a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gis_city_county_spark.operators.scale import rebalance_for_fanout
from gis_city_county_spark.operators.textstats import tokens, tokens_sql


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 20,
) -> DataFrame:
    """Top-k documents by summed TF-IDF over ``terms``:
    (id, tf_<term>..., score, rank). Ties broken by id ascending."""
    toks = (
        rebalance_for_fanout(df, multiplier=64.0)
        .select(F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok").isin(terms))
    )
    # r12: df_t derives from the tf frame (docs with tf_t > 0) —
    # materialize the bounded per-matching-doc frame once instead of
    # evaluating the filtered explode a second time for the old
    # countDistinct census (guide §3.3; same rewrite as bm25_topk).
    tf = toks.groupBy("__id").agg(
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf_{t}")
            for t in terms
        ]
    ).localCheckpoint(eager=False)
    dfs = tf.groupBy().agg(
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .alias(f"df_{t}")
            for t in terms
        ]
    )
    n_docs = df.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))

    scored = tf.crossJoin(F.broadcast(dfs)).crossJoin(F.broadcast(n_docs))
    score = None
    for t in terms:
        term_score = F.col(f"tf_{t}").cast("double") * (
            F.col("n_docs").cast("double") / F.col(f"df_{t}").cast("double")
        )
        score = term_score if score is None else score + term_score
    # Global top-k as sort+limit (TakeOrdered: per-partition top-k,
    # driver merge of k×partitions rows) — NOT a global rank window,
    # which would funnel the whole corpus through one partition. The
    # rank window then runs over just the k survivors.
    topk = (
        scored.withColumn("score", score)
        .select(
            F.col("__id").alias(id_col), *[F.col(f"tf_{t}") for t in terms], "score"
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w))


def tfidf_topk_sql(
    table_sql: str, id_col: str, text_col: str, terms: list[str], k: int = 20
) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    # BIGINT cast: DuckDB SUM(int) is HUGEINT → pandas float64, which
    # the driver's type-sensitive hash rejects against Spark's long.
    tf_aggs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf_{t}"
        for t in terms
    )
    df_aggs = ",\n         ".join(
        f"COUNT(DISTINCT CASE WHEN tok = '{t}' THEN id END) AS df_{t}" for t in terms
    )
    # Fixed left-associative sum — must mirror the Spark expression
    # order exactly for bit-equal doubles.
    score = " + ".join(
        f"(CAST(tf_{t} AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df_{t} AS DOUBLE)))"
        for t in terms
    )
    tf_cols = ", ".join(f"tf_{t}" for t in terms)
    return f"""
WITH toks AS (
  SELECT id, t.tok
  FROM (SELECT {id_col} AS id, {tokens_sql(text_col)} AS tl FROM ({table_sql})) s,
       LATERAL UNNEST(s.tl) AS t(tok)
  WHERE t.tok IN ({in_list})
),
tf AS (
  SELECT id,
         {tf_aggs}
  FROM toks GROUP BY id
),
dfs AS (
  SELECT {df_aggs}
  FROM toks
),
n AS (SELECT COUNT(*) AS n_docs FROM ({table_sql})),
scored AS (
  SELECT tf.id, {tf_cols}, {score} AS score
  FROM tf CROSS JOIN dfs CROSS JOIN n
)
SELECT id AS {id_col}, {tf_cols}, score,
       ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rank
FROM scored
QUALIFY rank <= {k}
"""


# ------------------------------------------------------------- BM25


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by Okapi BM25 over ``terms`` — the production
    ranker TF-IDF approximates. Same one-pass plan shape as
    :func:`tfidf_topk` (explode → conditional tf aggregate → 1-row
    broadcast df/avgdl frame → score, TakeOrdered top-k), plus the
    document-length normalization BM25 adds: dl = full token count per
    doc, avgdl = corpus mean.

    Determinism: the idf is the RATIONAL ``n_docs / df`` (one IEEE
    division — libm ``ln`` is not bit-identical across engines; the
    damping constant +0.5s are dropped with it), and every double op
    appears in a fixed order mirrored exactly by :func:`bm25_topk_sql`,
    so scores are engine-bit-equal. Output: (id, dl, score, rank)."""
    from gis_city_county_spark.operators.textstats import token_count

    toks = (
        rebalance_for_fanout(df, multiplier=64.0)
        .select(F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok").isin(terms))
    )
    # r12: tf feeds the scoring join AND the df census (df_t = docs
    # with tf_t > 0 — same value the old countDistinct over a SECOND
    # evaluation of the filtered explode computed); materialize the
    # bounded per-matching-doc frame once (guide §3.3; the truncation
    # also licenses the crossJoin with its own aggregate).
    tf = toks.groupBy("__id").agg(
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf_{t}")
            for t in terms
        ]
    ).localCheckpoint(eager=False)
    dls = df.select(
        F.col(id_col).alias("__id"), token_count(text_col).alias("dl")
    )
    stats = dls.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    scored = (
        tf.join(dls, "__id")
        .crossJoin(F.broadcast(tf.groupBy().agg(
            *[
                F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
                .alias(f"df_{t}")
                for t in terms
            ]
        )))
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score = None
    for t in terms:
        tf_d = F.col(f"tf_{t}").cast("double")
        idf = F.col("n_docs").cast("double") / F.col(f"df_{t}").cast("double")
        denom = tf_d + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
        # df = 0 (term absent from the corpus): contribute 0 instead of
        # dividing by zero (ANSI mode raises; DuckDB would yield NaN).
        term_score = F.when(
            F.col(f"df_{t}") > 0, idf * ((tf_d * F.lit(k1 + 1.0)) / denom)
        ).otherwise(F.lit(0.0))
        score = term_score if score is None else score + term_score
    topk = (
        scored.withColumn("score", score)
        .select(F.col("__id").alias(id_col), "dl", "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w))


def bm25_topk_sql(
    table_sql: str,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle twin of :func:`bm25_topk` — operand-order-exact."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    tf_aggs = ",\n         ".join(
        f"SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS tf_{t}" for t in terms
    )
    df_aggs = ",\n         ".join(
        f"COUNT(DISTINCT CASE WHEN tok = '{t}' THEN id END) AS df_{t}" for t in terms
    )
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    score = " + ".join(
        f"(CASE WHEN df_{t} > 0 THEN"
        f" ((CAST(n_docs AS DOUBLE) / CAST(df_{t} AS DOUBLE))"
        f" * ((CAST(tf_{t} AS DOUBLE) * {k1 + 1.0!r})"
        f" / (CAST(tf_{t} AS DOUBLE) + {k1!r} * ({1.0 - b!r}"
        f" + {b!r} * (CAST(dl AS DOUBLE) / {avgdl})))))"
        f" ELSE CAST(0.0 AS DOUBLE) END)"
        for t in terms
    )
    from gis_city_county_spark.operators.textstats import tokens_sql as _tok

    return f"""
WITH base AS (SELECT {id_col} AS id, {text_col} AS txt FROM ({table_sql})),
toks AS (
  SELECT id, t.tok
  FROM (SELECT id, {_tok('txt')} AS tl FROM base) s,
       LATERAL UNNEST(s.tl) AS t(tok)
  WHERE t.tok IN ({in_list})
),
tf AS (
  SELECT id,
         {tf_aggs}
  FROM toks GROUP BY id
),
dfs AS (
  SELECT {df_aggs}
  FROM toks
),
dls AS (SELECT id, len({_tok('txt')}) AS dl FROM base),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dls),
scored AS (
  SELECT tf.id, dls.dl, {score} AS score
  FROM tf JOIN dls USING (id) CROSS JOIN dfs CROSS JOIN stats
)
SELECT id AS {id_col}, CAST(dl AS BIGINT) AS dl, score,
       ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rank
FROM scored
QUALIFY rank <= {k}
"""


# ------------------------------------------------------- fuzzy lookup


def fuzzy_lookup(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    name_col: str,
    k: int = 3,
    max_dist: int | None = None,
    max_probes: int | None = 10_000,
) -> DataFrame:
    """Top-k nearest names by Levenshtein distance for each probe —
    the fuzzy crosswalk the reference maintains by hand as a
    name-fix table (``tests/data/inputs/Names_Crosswalk.xlsx``,
    GNIS_ADJUSTMENTS ``config.py:115-123``): instead of curating exact
    replacement pairs, match misspelled/variant names to their nearest
    canonical entry.

    Edit distance with unit costs is engine-exact. The probe set is
    broadcast (crosswalks are small); the corpus streams through one
    scan and only (probe, candidate, dist) survivors reach the
    per-probe top-k window. Ties break on candidate id.

    Work is |corpus|×|probes|: the ``max_probes`` guard fails loudly on
    an oversized probe side — the scale path is
    :func:`fuzzy_join_blocked` (length-band blocking keeps candidate
    generation bucket-local). ``max_probes=None`` overrides.
    """
    if max_probes is not None:
        if probes.limit(max_probes + 1).count() > max_probes:
            raise ValueError(
                f"fuzzy_lookup probe side exceeds max_probes={max_probes}: "
                "the distance scan is |corpus|x|probes| — use "
                "fuzzy_join_blocked for large probe sets, or pass "
                "max_probes=None to override"
            )
    # The distance scan is CPU-bound at |corpus|×|probes| rows; a
    # single-split corpus file would serialize it on one slot.
    c = rebalance_for_fanout(
        corpus.select(
            F.col(id_col).alias("cand_id"), F.col(name_col).alias("cand_name")
        ),
        multiplier=8.0,
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(name_col).alias("probe_name")
    )
    scored = c.crossJoin(F.broadcast(p)).withColumn(
        "dist", F.levenshtein(F.col("cand_name"), F.col("probe_name"))
    )
    if max_dist is not None:
        scored = scored.filter(F.col("dist") <= max_dist)
    w = Window.partitionBy("probe_id").orderBy(F.asc("dist"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "probe_name", "cand_id", "cand_name", "dist", "rank")
    )


def fuzzy_lookup_sql(
    corpus_sql: str,
    probes_sql: str,
    id_col: str,
    name_col: str,
    k: int = 3,
    max_dist: int | None = None,
) -> str:
    having = f"WHERE dist <= {max_dist}" if max_dist is not None else ""
    return f"""
WITH c AS (SELECT {id_col} AS cand_id, {name_col} AS cand_name FROM ({corpus_sql})),
p AS (SELECT {id_col} AS probe_id, {name_col} AS probe_name FROM ({probes_sql})),
scored AS (
  SELECT probe_id, probe_name, cand_id, cand_name,
         levenshtein(cand_name, probe_name) AS dist
  FROM c CROSS JOIN p
)
SELECT probe_id, probe_name, cand_id, cand_name, dist, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
              ORDER BY dist ASC, cand_id ASC) AS BIGINT) AS rank
  FROM scored {having}
) WHERE rank <= {k}
"""


def fuzzy_join_blocked(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int,
    k: int | None = None,
) -> DataFrame:
    """Bounded-distance fuzzy join via length-band blocking — the
    scale path next to :func:`fuzzy_lookup`'s brute-force scan.

    Any pair within Levenshtein distance ``d`` satisfies
    ``|len(a) - len(b)| <= d`` (each edit changes length by at most
    one), so each probe is exploded to the ``2d+1`` lengths in its
    band and candidates are paired through a **hash equi-join on
    length** — no product join; only same-band pairs are ever scored.
    Scoring uses the threshold form of ``levenshtein`` (early exit
    once the running distance exceeds ``d``), and ``k`` optionally
    keeps the k nearest per probe (ties on candidate id).

    Scale notes: comparisons drop from ``n·m`` to the sum over length
    bands; length alone is a low-cardinality key, so at extreme corpus
    sizes the join inherits the length distribution's skew — AQE skew
    -join splitting handles the hot bands (oversized partitions split
    at runtime), and the probe side is typically small enough to
    broadcast anyway.
    """
    # Same single-split concern as fuzzy_lookup: spread the CPU-bound
    # scoring join across slots before fanning out.
    c = rebalance_for_fanout(
        corpus.select(
            F.col(id_col).alias("cand_id"),
            F.col(name_col).alias("cand_name"),
            F.length(name_col).alias("__blk"),
        ),
        multiplier=8.0,
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(name_col).alias("probe_name"),
        F.explode(
            F.sequence(
                F.length(name_col) - max_dist, F.length(name_col) + max_dist
            )
        ).alias("__blk"),
    )
    scored = (
        c.join(F.broadcast(p), "__blk")
        .withColumn(
            "dist",
            F.levenshtein(F.col("cand_name"), F.col("probe_name"), max_dist),
        )
        .filter(F.col("dist") >= 0)
    )
    out = scored.select("probe_id", "probe_name", "cand_id", "cand_name", "dist")
    if k is None:
        return out
    w = Window.partitionBy("probe_id").orderBy(F.asc("dist"), F.asc("cand_id"))
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def fuzzy_join_blocked_sql(
    corpus_sql: str,
    probes_sql: str,
    id_col: str,
    name_col: str,
    max_dist: int,
    k: int | None = None,
) -> str:
    base = f"""
WITH c AS (SELECT {id_col} AS cand_id, {name_col} AS cand_name,
                  length({name_col}) AS blk FROM ({corpus_sql})),
p AS (SELECT {id_col} AS probe_id, {name_col} AS probe_name,
             length({name_col}) + g.d AS blk
      FROM ({probes_sql}),
           LATERAL UNNEST(generate_series(-{max_dist}, {max_dist})) AS g(d)),
scored AS (
  SELECT probe_id, probe_name, cand_id, cand_name,
         levenshtein(cand_name, probe_name) AS dist
  FROM c JOIN p USING (blk)
)
SELECT probe_id, probe_name, cand_id, cand_name, dist
FROM scored WHERE dist <= {max_dist}
"""
    if k is None:
        return base
    return f"""
SELECT probe_id, probe_name, cand_id, cand_name, dist, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
              ORDER BY dist ASC, cand_id ASC) AS BIGINT) AS rank
  FROM ({base})
) WHERE rank <= {k}
"""


# ------------------------------------------------- inverted index


def build_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Inverted-index posting relation: one row per (token, doc, tf).
    The layout a 100 TB search index wants — thin, hash-partitionable
    by token (write it bucketed on ``token`` via sources.layout and
    every term lookup is a pruned scan; conjunctions become
    co-bucketed joins that never shuffle the corpus)."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def conjunctive_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 20,
) -> DataFrame:
    """AND-of-terms keyword search through the inverted index: the
    documents containing *every* term, ranked by summed term frequency
    (ties → lowest id first), top-k.

    Relational shape: postings filtered to the query terms (an ``IN``
    filter that reaches the scan / prunes token buckets), then a
    count-matching-terms aggregation per document — an n-way posting
    intersection as ONE group-by instead of (n−1) self-joins. Shuffle
    volume is the matched postings only. Top-k is
    TakeOrderedAndProject. Exact integer ranking — no floats anywhere.
    """
    nterms = len(set(terms))
    postings = build_postings(df, id_col, text_col)
    hits = postings.filter(F.col("token").isin(*terms))
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n_terms"),
            F.sum("tf").alias("total_tf"),
        )
        .filter(F.col("__n_terms") == nterms)
        .drop("__n_terms")
        .orderBy(F.col("total_tf").desc(), F.col(id_col).asc())
        .limit(k)
    )


def conjunctive_search_sql(
    table_sql: str, id_col: str, text_col: str, terms: list[str], k: int = 20
) -> str:
    """DuckDB oracle twin of :func:`conjunctive_search`."""
    nterms = len(set(terms))
    lits = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH postings AS (
  SELECT t.token, {id_col}, COUNT(*) AS tf
  FROM ({table_sql}), LATERAL UNNEST({tokens_sql(text_col)}) AS t(token)
  GROUP BY 1, 2
),
hits AS (
  SELECT {id_col}, COUNT(*) AS n_terms, SUM(tf) AS total_tf
  FROM postings WHERE token IN ({lits}) GROUP BY 1
)
SELECT {id_col}, CAST(total_tf AS BIGINT) AS total_tf
FROM hits WHERE n_terms = {nterms}
ORDER BY total_tf DESC, {id_col} ASC LIMIT {k}
"""


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: list[str],
    k: int = 20,
) -> DataFrame:
    """Exact-phrase search through *positional* postings: documents
    containing the words of ``phrase`` consecutively, ranked by
    occurrence count (ties → lowest id), top-k.

    The positional index is (doc, position, token) from one
    ``posexplode`` — the standard next step up from
    :func:`build_postings` when queries need adjacency, not just
    co-occurrence. An m-word phrase is m−1 equi-joins on
    ``(doc, pos + i)``: each join input is pre-filtered to ONE term's
    postings, so join volume is the postings of the rarest terms, not
    the corpus. Partitioning by (doc) would co-locate every join; at
    index-build time `sources.layout` bucketing on doc id makes the
    whole chain shuffle-free. Exact integer ranking; top-k is
    TakeOrderedAndProject, never a global sort."""
    if len(phrase) < 2:
        raise ValueError("phrase_search wants >= 2 words")
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    cur = (
        toks.filter(F.col("tok") == phrase[0])
        .select("__id", F.col("pos").alias("p0"))
    )
    for i, word in enumerate(phrase[1:], start=1):
        nxt = toks.filter(F.col("tok") == word).select(
            "__id", F.col("pos").alias(f"p{i}")
        )
        cur = cur.join(
            nxt,
            (cur["__id"] == nxt["__id"]) & (nxt[f"p{i}"] == cur["p0"] + i),
        ).select(cur["__id"], cur["p0"])
    return (
        cur.groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("__id").alias(id_col), "n_hits")
        .orderBy(F.col("n_hits").desc(), F.col(id_col).asc())
        .limit(k)
    )


def phrase_search_sql(
    table_sql: str, id_col: str, text_col: str, phrase: list[str], k: int = 20
) -> str:
    """DuckDB oracle twin of :func:`phrase_search` (1-based list
    indices shifted to the 0-based positions Spark's posexplode
    emits)."""
    quoted = ["'" + w.replace("'", "''") + "'" for w in phrase]
    joins = "\n  ".join(
        f"JOIN toks t{i} ON t{i}.id = t0.id AND t{i}.pos = t0.pos + {i} "
        f"AND t{i}.tok = {quoted[i]}"
        for i in range(1, len(phrase))
    )
    return f"""
WITH s AS (SELECT {id_col} AS id, {tokens_sql(text_col)} AS tl FROM ({table_sql})),
toks AS (
  SELECT id, g.i - 1 AS pos, tl[g.i] AS tok
  FROM s, LATERAL UNNEST(generate_series(1, len(tl))) AS g(i)
),
m AS (
  SELECT t0.id, t0.pos FROM toks t0
  {joins}
  WHERE t0.tok = {quoted[0]}
)
SELECT id AS {id_col}, COUNT(*) AS n_hits
FROM m GROUP BY 1
ORDER BY n_hits DESC, id ASC LIMIT {k}
"""


def proximity_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    term_a: str,
    term_b: str,
    within: int = 3,
    k: int = 20,
) -> DataFrame:
    """Proximity search: documents where ``term_a`` and ``term_b``
    occur within ``within`` token positions of each other (either
    order), ranked by pair count then closest distance — the NEAR/k
    operator between conjunctive AND (no position constraint) and
    exact phrase (distance exactly 1, fixed order).

    Same positional-postings shape as :func:`phrase_search`: each
    term's postings are a thin pre-filtered relation and the pairing
    is an equi-join on the doc id with the distance bound as a join
    condition — never a corpus-wide product. Exact integers.

    Output: ``(id, n_pairs, min_dist, rank)``."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    a = toks.filter(F.col("tok") == term_a).select("__id", F.col("pos").alias("pa"))
    b = toks.filter(F.col("tok") == term_b).select(
        F.col("__id").alias("__idb"), F.col("pos").alias("pb")
    )
    dist = F.abs(F.col("pa") - F.col("pb"))
    pairs = a.join(
        b,
        (F.col("__id") == F.col("__idb")) & (dist <= within) & (dist >= 1),
    )
    w_rank = F.row_number().over(
        Window.orderBy(
            F.col("n_pairs").desc(), F.col("min_dist").asc(), F.col(id_col).asc()
        )
    )
    agg = (
        pairs.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.abs(F.col("pa") - F.col("pb"))).alias("min_dist"),
        )
        .select(F.col("__id").alias(id_col), "n_pairs", "min_dist")
        .orderBy(F.col("n_pairs").desc(), F.col("min_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
    return agg.withColumn("rank", w_rank)


def proximity_search_sql(
    table_sql: str,
    id_col: str,
    text_col: str,
    term_a: str,
    term_b: str,
    within: int = 3,
    k: int = 20,
) -> str:
    """DuckDB oracle twin of :func:`proximity_search`."""
    qa = "'" + term_a.replace("'", "''") + "'"
    qb = "'" + term_b.replace("'", "''") + "'"
    return f"""
WITH s AS (SELECT {id_col} AS id, {tokens_sql(text_col)} AS tl FROM ({table_sql})),
toks AS (
  SELECT id, g.i - 1 AS pos, tl[g.i] AS tok
  FROM s, LATERAL UNNEST(generate_series(1, len(tl))) AS g(i)
),
pairs AS (
  SELECT a.id, abs(a.pos - b.pos) AS dist
  FROM (SELECT id, pos FROM toks WHERE tok = {qa}) a
  JOIN (SELECT id, pos FROM toks WHERE tok = {qb}) b
    ON b.id = a.id AND abs(a.pos - b.pos) BETWEEN 1 AND {within}
)
SELECT id AS {id_col}, n_pairs, min_dist,
       CAST(ROW_NUMBER() OVER (ORDER BY n_pairs DESC, min_dist ASC, id ASC)
            AS INTEGER) AS rank
FROM (
  SELECT id, COUNT(*) AS n_pairs, CAST(MIN(dist) AS BIGINT) AS min_dist
  FROM pairs GROUP BY id
  ORDER BY n_pairs DESC, min_dist ASC, id ASC LIMIT {k}
) t
"""


def best_window(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    window_tokens: int = 10,
) -> DataFrame:
    """Snippet locator: for every document containing at least one
    query term, the ``window_tokens``-wide token window holding the
    MOST query-term hits — the "why did this match" highlight a
    search result page renders next to each hit.

    Scale shape: only HIT positions survive the explode filter (∝
    matches, not tokens), the per-hit window count is a range frame
    over positions within the document (hits t with
    p ≤ pos(t) < p+w — one partitioned window, no self-join), and the
    per-doc argmax is a (hits desc, start asc) rank.  Ties break to
    the earliest window.

    Returns (id, best_start, window_hits, total_hits) — best_start is
    the 0-based token position opening the best window.
    """
    from gis_city_county_spark.operators.textstats import tokens

    terms = [t.lower() for t in query_terms]
    hits = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
        )
        .filter(F.col("token").isin(terms))
        .select("id", F.col("pos").cast("bigint").alias("pos"))
    )
    wr = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rangeBetween(0, window_tokens - 1)
    )
    wc = Window.partitionBy("id")
    wk = Window.partitionBy("id").orderBy(
        F.col("window_hits").desc(), F.col("pos").asc()
    )
    return (
        hits.select(
            "id",
            "pos",
            F.count(F.lit(1)).over(wr).cast("bigint").alias("window_hits"),
            F.count(F.lit(1)).over(wc).cast("bigint").alias("total_hits"),
        )
        .withColumn("__rk", F.row_number().over(wk))
        .filter(F.col("__rk") == 1)
        .select(
            "id",
            F.col("pos").alias("best_start"),
            "window_hits",
            "total_hits",
        )
    )


def best_window_sql(
    source_sql: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    window_tokens: int = 10,
) -> str:
    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, t.token,
         CAST(t.ord - 1 AS BIGINT) AS pos
  FROM ({source_sql}),
       LATERAL (
         SELECT UNNEST({tokens_sql(text_col)}) AS token,
                generate_subscripts({tokens_sql(text_col)}, 1) AS ord
       ) t
),
hits AS (SELECT id, pos FROM toks WHERE token IN ({terms})),
counted AS (
  SELECT id, pos,
         CAST(COUNT(*) OVER (PARTITION BY id ORDER BY pos
              RANGE BETWEEN CURRENT ROW AND {window_tokens - 1} FOLLOWING)
              AS BIGINT) AS window_hits,
         CAST(COUNT(*) OVER (PARTITION BY id) AS BIGINT) AS total_hits
  FROM hits
)
SELECT id, pos AS best_start, window_hits, total_hits
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY id
             ORDER BY window_hits DESC, pos ASC) AS rk
  FROM counted
) WHERE rk = 1
"""
