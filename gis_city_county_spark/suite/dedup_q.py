"""Deduplication queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.dedup import (
    cluster_quality_keeper,
    cluster_quality_keeper_sql,
    containment_pairs_sql,
    dedup_components,
    dedup_components_sql,
    dedup_yield_report,
    dedup_yield_report_sql,
    exact_dedup,
    exact_dedup_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_sql,
    prefix_jaccard_join,
    prefix_jaccard_join_sql,
    simhash16,
    simhash16_sql,
)
from gis_city_county_spark.operators.similarity import (
    embedding_cosine_pairs,
    embedding_cosine_pairs_sql,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def q_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text")


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection + cross-document
    sharing audit over the documents corpus: guaranteed detection of
    any shared w+k-1-token run at ~2/(w+1) of the shingle density."""
    from gis_city_county_spark.operators.dedup import winnowing_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, "doc_id", "text", k=4, w=4)


def _winnowing_oracle() -> str:
    from gis_city_county_spark.operators.dedup import (
        winnowing_fingerprints_sql,
    )

    return winnowing_fingerprints_sql("documents", "doc_id", "text", k=4, w=4)


def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication pairs: longest shared contiguous
    token span per pair via positioned k-token windows + diagonal
    gaps-and-islands (rare-window blocked candidates)."""
    from gis_city_county_spark.operators.dedup import substring_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return substring_dup_pairs(docs, "doc_id", "text")


def _substring_oracle() -> str:
    from gis_city_county_spark.operators.dedup import substring_dup_pairs_sql

    return substring_dup_pairs_sql("documents", "doc_id", "text")


def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text")


def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)


def q_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard ≥ 4/5 shingle-set self-join by prefix filtering
    (operators.dedup.prefix_jaccard_join) — the LSH-free exact scale
    path: only each document's rarest prefix shingles become join
    keys, and every threshold test (prefix length, size ratio,
    positional overlap bound, final Jaccard) is integer arithmetic.
    3-word shingles, not raw tokens: the synthetic corpus's tiny
    vocabulary makes every long document's token *set* ≈ the whole
    vocabulary (everything similar to everything); the shingle
    universe stays sparse. Deterministic 1-in-3 subset keeps bench
    runtime proportionate; the hypothesis suite proves exactness
    against brute force."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return prefix_jaccard_join(
        docs, "doc_id", "text", tau_num=4, tau_den=5, shingle_k=3
    )


def q_cluster_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup retention policy: MinHash-LSH clusters keep their
    highest-quality member (quality desc, id asc tiebreak) — the
    transitive-closure upgrade of pipeline_quality_keeper's
    exact-fingerprint groups."""
    docs = load_table(spark, sf_dir, "documents")
    return cluster_quality_keeper(docs, "doc_id", "text")


def q_dedup_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup funnel report: documents contributed vs.
    surviving exact dedup vs. surviving near-dup dedup — all-integer,
    the per-feed regression dashboard of a corpus build."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_yield_report(docs, "doc_id", "text", "source")


def q_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup keeper policy: within each exact-duplicate
    group (md5 fingerprint of normalized text), keep the HIGHEST
    quality-score document — not the arbitrary min-id — with id as the
    deterministic tiebreak. The retention decision a curation pipeline
    actually wants; one fingerprint projection, one (group) window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.textstats import (
        fingerprint_md5,
        quality_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        fingerprint_md5("text").alias("fp"),
        quality_score("text").alias("quality"),
    )
    w = Window.partitionBy("fp").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "group_size", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .select(
            "doc_id",
            "fp",
            "group_size",
            "quality",
            (F.col("rk") == 1).alias("keep"),
        )
    )


def _keeper_oracle() -> str:
    from gis_city_county_spark.operators.textstats import (
        normalized_text_sql,
        quality_score_sql,
    )

    return f"""
WITH scored AS (
  SELECT doc_id, md5({normalized_text_sql('text')}) AS fp,
         {quality_score_sql('text')} AS quality
  FROM documents
)
SELECT doc_id, fp,
       COUNT(*) OVER (PARTITION BY fp) AS group_size,
       quality,
       ROW_NUMBER() OVER (PARTITION BY fp
                          ORDER BY quality DESC, doc_id ASC) = 1 AS keep
FROM scored
"""


_KEEPER_ORACLE = _keeper_oracle()


_PREFIX_JACCARD_ORACLE = prefix_jaccard_join_sql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0",
    "doc_id",
    "text",
    tau_num=4,
    tau_den=5,
    shingle_k=3,
)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash16(docs, "doc_id", "text")


def q_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (LSH-bucketed, threshold 0.4 —
    the test embeddings have no planted duplicates; max pairwise
    cosine is ~0.51, so 0.4 exercises real output)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.4)


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs clustered to duplicate groups (transitive
    closure) with the canonical keeper per group."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_components(docs, "doc_id", "text")


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: an incoming batch (doc_id % 3 == 0)
    is deduped AGAINST the already-ingested corpus (the rest) by
    normalized-text fingerprint — broadcast/shuffle anti-join on the
    fingerprint — then within-batch (keep lowest id per fingerprint).
    This is the arriving-data path of a continuously-built corpus: the
    existing side would be the fingerprint index read from the last
    snapshot, so each batch costs one scan of itself plus an equi-join,
    never a rescan of the corpus body."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.textstats import fingerprint_md5

    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint_md5("text")
    existing = docs.filter(F.col("doc_id") % 3 != 0).select(fp.alias("fp")).distinct()
    incoming = docs.filter(F.col("doc_id") % 3 == 0).withColumn("fp", fp)
    fresh = incoming.join(existing, "fp", "left_anti")
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = fresh.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_ingested"),
        F.sum("n_chars").cast("long").alias("chars_ingested"),
    )


def _incremental_oracle() -> str:
    from gis_city_county_spark.operators.textstats import normalized_text_sql

    fp = f"md5({normalized_text_sql('text')})"
    return f"""
WITH existing AS (
  SELECT DISTINCT {fp} AS fp FROM documents WHERE doc_id % 3 <> 0
),
incoming AS (
  SELECT *, {fp} AS fp FROM documents WHERE doc_id % 3 = 0
),
fresh AS (
  SELECT * FROM incoming WHERE fp NOT IN (SELECT fp FROM existing)
),
kept AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fresh
  ) WHERE rn = 1
)
SELECT lang, COUNT(*) AS n_ingested,
       CAST(SUM(n_chars) AS BIGINT) AS chars_ingested
FROM kept GROUP BY lang
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end semantic dedup: documents joined to their embedding
    rows, near-dup pairs from the cosine-LSH path, transitive closure
    to duplicate groups, then the per-language release report (total
    docs, canonical keepers kept, dropped dups) — the full "dedupe the
    corpus by meaning, keep one per cluster" pipeline as one plan.
    Threshold 0.4 (the synthetic embeddings' max pairwise cosine is
    ~0.51, so real groups form without planted duplicates)."""
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.4)
    comp = connected_components(emb, pairs, "vec_id")
    labeled = docs.join(comp, docs.doc_id == comp.vec_id)
    return labeled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_keeper").cast("long")).alias("n_kept"),
        F.sum((~F.col("is_keeper")).cast("long")).alias("n_dropped"),
    )


_SEMANTIC_ORACLE = f"""
WITH RECURSIVE cand AS (
  SELECT * FROM ({embedding_cosine_pairs_sql("embeddings", "vec_id", "embedding", threshold=0.4)})
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM cand
  UNION ALL
  SELECT b_id AS src, a_id AS dst FROM cand
),
reach AS (
  SELECT vec_id AS src, vec_id AS dst FROM embeddings
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
comp AS (SELECT src AS vec_id, MIN(dst) AS component FROM reach GROUP BY src)
SELECT d.lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN c.vec_id = c.component THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN c.vec_id = c.component THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM documents d JOIN comp c ON c.vec_id = d.doc_id
GROUP BY d.lang
"""


def q_novelty(spark, sf_dir):
    """Per-document novelty vs everything earlier (fraction of 3-gram
    shingles first seen in an earlier doc) — the corpus redundancy
    curve that tells you where dedup stops paying."""
    from gis_city_county_spark.operators.dedup import novelty_scores

    docs = load_table(spark, sf_dir, "documents")
    return novelty_scores(docs, "doc_id", "text", k=3)


def _novelty_oracle() -> str:
    from gis_city_county_spark.operators.dedup import novelty_scores_sql

    return novelty_scores_sql("documents", "doc_id", "text", 3)


def q_source_similarity(spark, sf_dir):
    """Exact Jaccard similarity matrix between SOURCES' 3-gram
    shingle sets (one row per source pair) — the corpus-composition
    scan that finds mirrored/overlapping feeds before per-document
    dedup even starts. Shuffle keys are shingles; the matrix is
    |sources|² bounded."""
    from gis_city_county_spark.operators.dedup import shingle_df
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    docs = load_table(spark, sf_dir, "documents")
    # three consumers (sizes + both self-join legs): materialize the
    # tokenize+shingle explode+cross-row dedup ONCE instead of
    # replaying it per reference (guide §3.3; the r12-before plan held
    # 22 Exchange / 8 parquet scans)
    sh = _materialize_for_multipass(
        shingle_df(
            docs.select(F.col("source"), F.col("text")), "source", "text", k=3
        )
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "shingle")
    b = sh.select(F.col("source").alias("src_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_inter",
            F.expr(
                "CAST((CAST(n_inter AS DECIMAL(38,0)) * 1000000)"
                " div (n_a + n_b - n_inter) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


def _source_sim_oracle() -> str:
    from gis_city_county_spark.operators.dedup import shingle_sql

    return f"""
WITH sh AS ({shingle_sql("(SELECT source, text FROM documents)", "source", "text", 3)}),
sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, n_inter,
       CAST(CAST(n_inter AS HUGEINT) * 1000000
            // (sa.n + sb.n - n_inter) AS BIGINT) AS jaccard_ppm
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
"""


def q_source_keywords(spark, sf_dir):
    """Per-source keyword extraction: the 5 most source-characteristic
    tokens by group-level TF-IDF (term count in the source × inverse
    source-frequency, exact rational score, fixed tiebreak) — the
    'what is this feed about' summary. Two bounded aggregates keyed on
    tokens; no per-document state."""
    from pyspark.sql import Window

    from gis_city_county_spark.operators.textstats import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens("text")).alias("tok"))
    tf = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("sf"))
    # source count rides along as a 1-row broadcast (no driver collect)
    n = docs.agg(
        F.countDistinct("source").cast("double").alias("__ns")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.asc("tok")
    )
    return (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("__ns") / F.col("sf").cast("double")),
        )
        .drop("__ns")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("source", "rank", "tok", "tf", "sf", "score")
    )


def _source_keywords_oracle() -> str:
    from gis_city_county_spark.operators.textstats import tokens_sql

    return f"""
WITH toks AS (
  SELECT source, t.tok
  FROM (SELECT source, {tokens_sql("text")} AS tl FROM documents) s,
       LATERAL UNNEST(s.tl) AS t(tok)
),
tf AS (SELECT source, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
sfreq AS (SELECT tok, COUNT(*) AS sf FROM tf GROUP BY tok),
n AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS ns FROM documents)
SELECT source, CAST(rank AS INTEGER) AS rank, tok, tf, sf, score
FROM (
  SELECT tf.source, tf.tok, tf.tf, sfreq.sf,
         CAST(tf.tf AS DOUBLE) * (n.ns / CAST(sfreq.sf AS DOUBLE)) AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.source
                            ORDER BY CAST(tf.tf AS DOUBLE)
                                     * (n.ns / CAST(sfreq.sf AS DOUBLE)) DESC,
                                     tf.tok ASC) AS rank
  FROM tf JOIN sfreq USING (tok) CROSS JOIN n
) t
WHERE rank <= 5
"""


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (|A∩B|/min) over rare-shingle
    blocked candidates — the subset-duplicate detector symmetric
    Jaccard misses."""
    from gis_city_county_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text")


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest funnel: the doc_id%2==0 half arrives as the
    incoming batch against a doc_id%3!=0 accumulated base; per source,
    exact-fingerprint dups vs base, dups within the batch, and net
    ingested."""
    from gis_city_county_spark.operators.dedup import incremental_dedup_report

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 0)
    return incremental_dedup_report(base, incoming, "doc_id", "text", "source")


def _incremental_oracle() -> str:
    from gis_city_county_spark.operators.dedup import (
        incremental_dedup_report_sql,
    )

    return incremental_dedup_report_sql(
        "SELECT * FROM documents WHERE doc_id % 3 != 0",
        "SELECT * FROM documents WHERE doc_id % 2 = 0",
        "doc_id", "text", "source",
    )


def q_blocking_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit: MinHash-LSH candidate pairs vs
    ground-truth shingle-Jaccard ≥ 0.7 pairs — recall and precision
    of the banding configuration, in exact ppm.  The budget knob
    (``sample_fraction``) is 1.0 here because the whole test corpus
    fits the quadratic-truth budget; at real scale it shrinks so the
    truth pass stays a fixed absolute cost."""
    from gis_city_county_spark.operators.dedup import blocking_recall

    docs = load_table(spark, sf_dir, "documents")
    return blocking_recall(docs, "doc_id", "text", sample_fraction=1.0)


def _blocking_recall_oracle() -> str:
    from gis_city_county_spark.operators.dedup import blocking_recall_sql

    return blocking_recall_sql(
        "documents", "doc_id", "text", sample_fraction=1.0
    )


def q_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster population shape: clusters per size, docs held
    and docs removable by a keeper policy — long-tail-of-pairs vs
    mega-cluster diagnosis over the same shingle→MinHash→components
    chain as dedup_connected_components."""
    from gis_city_county_spark.operators.dedup import cluster_size_histogram

    docs = load_table(spark, sf_dir, "documents")
    return cluster_size_histogram(docs, "doc_id", "text")


def _cluster_histogram_oracle() -> str:
    from gis_city_county_spark.operators.dedup import cluster_size_histogram_sql

    return cluster_size_histogram_sql("documents", "doc_id", "text")


def q_threshold_yield(spark, sf_dir):
    """Jaccard-cutoff sweep from ONE LSH+exact-verify run: pairs and
    affected docs at each permille threshold — the planning row for
    picking the production dedup cutoff."""
    from gis_city_county_spark.operators.dedup import threshold_yield_curve

    docs = load_table(spark, sf_dir, "documents")
    return threshold_yield_curve(docs, "doc_id", "text")


def _threshold_yield_oracle() -> str:
    from gis_city_county_spark.operators.dedup import (
        threshold_yield_curve_sql,
    )

    return threshold_yield_curve_sql("documents", "doc_id", "text")


def q_minhash_accuracy(spark, sf_dir):
    """MinHash estimator calibration over verified candidate pairs:
    (estimate - exact) permille histogram in 100-permille buckets —
    the audit that justifies a 16-hash signature before trusting it."""
    from gis_city_county_spark.operators.dedup import minhash_accuracy

    docs = load_table(spark, sf_dir, "documents")
    return minhash_accuracy(docs, "doc_id", "text")


def _minhash_accuracy_oracle() -> str:
    from gis_city_county_spark.operators.dedup import minhash_accuracy_sql

    return minhash_accuracy_sql("documents", "doc_id", "text")


SPECS = [
    QuerySpec("dedup_minhash_accuracy", q_minhash_accuracy,
              _minhash_accuracy_oracle()),
    QuerySpec("dedup_threshold_yield", q_threshold_yield,
              _threshold_yield_oracle()),
    QuerySpec("dedup_exact", q_exact, exact_dedup_sql("documents", "doc_id", "text")),
    QuerySpec(
        "dedup_cluster_size_histogram",
        q_cluster_size_histogram,
        _cluster_histogram_oracle(),
    ),
    QuerySpec(
        "dedup_blocking_recall",
        q_blocking_recall,
        _blocking_recall_oracle(),
    ),
    QuerySpec(
        "dedup_containment_pairs",
        q_containment,
        containment_pairs_sql("documents", "doc_id", "text"),
    ),
    QuerySpec("cdc_incremental_dedup", q_incremental_dedup, _incremental_oracle()),
    QuerySpec("corpus_source_keywords", q_source_keywords, _source_keywords_oracle()),
    QuerySpec("corpus_novelty_scores", q_novelty, _novelty_oracle()),
    QuerySpec("corpus_source_similarity", q_source_similarity, _source_sim_oracle()),
    QuerySpec(
        "dedup_connected_components",
        q_components,
        dedup_components_sql("documents", "doc_id", "text"),
    ),
    QuerySpec(
        "dedup_minhash_lsh_pairs",
        q_minhash,
        minhash_lsh_pairs_sql("documents", "doc_id", "text"),
    ),
    QuerySpec(
        "dedup_ngram_jaccard",
        q_jaccard,
        ngram_jaccard_pairs_sql("documents", "doc_id", "text", threshold=0.5),
    ),
    QuerySpec("dedup_simhash", q_simhash, simhash16_sql("documents", "doc_id", "text")),
    QuerySpec(
        "dedup_embedding_cosine",
        q_embedding_cosine,
        embedding_cosine_pairs_sql("embeddings", "vec_id", "embedding", threshold=0.4),
    ),
    QuerySpec("dedup_prefix_jaccard_join", q_prefix_jaccard, _PREFIX_JACCARD_ORACLE),
    QuerySpec("dedup_substring_spans", q_substring_spans, _substring_oracle()),
    QuerySpec("dedup_winnowing", q_winnowing, _winnowing_oracle()),
    QuerySpec(
        "dedup_cluster_keeper",
        q_cluster_keeper,
        cluster_quality_keeper_sql("documents", "doc_id", "text"),
    ),
    QuerySpec(
        "pipeline_dedup_yield",
        q_dedup_yield,
        dedup_yield_report_sql("documents", "doc_id", "text", "source"),
    ),
    QuerySpec("pipeline_quality_keeper", q_quality_keeper, _KEEPER_ORACLE),
    QuerySpec("pipeline_semantic_dedup", q_semantic_dedup, _SEMANTIC_ORACLE),
    QuerySpec("pipeline_incremental_dedup", q_incremental_dedup, _incremental_oracle()),
]
