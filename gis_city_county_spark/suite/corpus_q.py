"""Corpus-shaping queries: chunking, decontamination, deterministic
splits, repetition stats (operators.corpus)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.functions.numeric import dec_sum
from gis_city_county_spark.operators.corpus import (
    chunk_documents,
    chunk_documents_sql,
    contamination,
    contamination_sql,
    mixture_duplicate,
    mixture_duplicate_sql,
    mixture_resample,
    mixture_resample_sql,
    ngram_topk,
    ngram_topk_sql,
    pair_merge_rounds,
    pair_merge_rounds_sql,
    pmi_pairs,
    pmi_pairs_sql,
    quantile_band_filter,
    quantile_band_filter_sql,
    repetition_stats,
    repetition_stats_sql,
    shard_assign,
    shard_assign_sql,
    split_assign,
    split_case_sql,
    vocab_coverage,
    vocab_coverage_sql,
)
from gis_city_county_spark.operators.mlprep import (
    curriculum_phases,
    curriculum_phases_sql,
)
from gis_city_county_spark.operators.textstats import token_count, tokens_sql
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec

_CHUNK, _STRIDE = 64, 48
_DECON_K, _DECON_MOD = 5, 37


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: overlapping 64-token windows with a
    48-token stride over every document."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", chunk=_CHUNK, stride=_STRIDE)


_CHUNK_ORACLE = chunk_documents_sql(
    "documents", "doc_id", "text", chunk=_CHUNK, stride=_STRIDE
)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate signal: within-document token repetition ratios."""
    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text")


_REP_ORACLE = repetition_stats_sql("documents", "doc_id", "text")


def q_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split keyed on doc_id, summarized per
    (split, lang): document count + whitespace-token budget. The
    assignment is a projection; the only shuffle is the final
    2-column aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = split_assign(docs, "doc_id")
    return (
        assigned.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dec_sum(token_count("text"), "total_tokens"),
        )
        .orderBy("split", "lang")
    )


_SPLIT_ORACLE = f"""
SELECT {split_case_sql('doc_id')} AS split, lang,
       COUNT(*) AS n_docs,
       CAST(CAST(SUM(CAST(len({tokens_sql('text')}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
         AS total_tokens
FROM documents
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 37th document is the held-out
    eval set; training documents are scored by the fraction of their
    5-token shingles that appear anywhere in the eval set."""
    docs = load_table(spark, sf_dir, "documents")
    heldout = docs.filter(F.col("doc_id") % _DECON_MOD == 0)
    train = docs.filter(F.col("doc_id") % _DECON_MOD != 0)
    return contamination(train, heldout, "doc_id", "text", k=_DECON_K)


_DECON_ORACLE = contamination_sql(
    f"(SELECT * FROM documents WHERE doc_id % {_DECON_MOD} <> 0)",
    f"(SELECT * FROM documents WHERE doc_id % {_DECON_MOD} = 0)",
    "doc_id",
    "text",
    k=_DECON_K,
)


_NGRAM_N, _NGRAM_K, _N_SHARDS = 2, 10, 16


def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate signal: the 10 most frequent bigrams
    per language (every occurrence counted, lexicographic tiebreak)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_topk(docs, "lang", "text", n=_NGRAM_N, k=_NGRAM_K)


_NGRAM_ORACLE = ngram_topk_sql(
    "SELECT lang, text FROM documents", "lang", "text", n=_NGRAM_N, k=_NGRAM_K
)


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard id + within-shard hash order for
    every document; stable across runs, engines, and partitionings."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return shard_assign(docs, "doc_id", n_shards=_N_SHARDS)


_SHARD_ORACLE = shard_assign_sql(
    "SELECT doc_id, lang, n_chars FROM documents", "doc_id", n_shards=_N_SHARDS
)


def q_length_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language p05–p95 document-length trim: keep mid-band docs,
    report per-language survivor counts and kept-length extremes."""
    docs = load_table(spark, sf_dir, "documents")
    kept = quantile_band_filter(docs, "lang", "n_chars", 0.05, 0.95)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").alias("min_kept"),
            F.max("n_chars").alias("max_kept"),
        )
        .orderBy("lang")
    )


_BAND_ORACLE = f"""
SELECT lang, COUNT(*) AS n_kept, MIN(n_chars) AS min_kept, MAX(n_chars) AS max_kept
FROM ({quantile_band_filter_sql('SELECT * FROM documents', 'lang', 'n_chars',
                                'lang, n_chars', 0.05, 0.95)})
GROUP BY lang ORDER BY lang
"""


_MIX_SHARES = {"en": 0.35, "zh": 0.25, "de": 0.15, "es": 0.15, "fr": 0.10}


def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward a target language mixture at half
    the current token budget, then report the per-language result —
    the data-mix stage of a training pipeline (deterministic: the same
    docs survive on any engine/partitioning)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_resample(
        docs, "lang", "doc_id", "n_chars", _MIX_SHARES, budget_frac=0.5
    )
    return kept.groupBy("lang", "rate").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
    )


_MIX_ORACLE = f"""
SELECT lang, rate, COUNT(*) AS n_docs_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
FROM ({mixture_resample_sql("documents", "lang", "doc_id", "n_chars", _MIX_SHARES, budget_frac=0.5)})
GROUP BY lang, rate
"""


def q_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsample the corpus to twice the token budget at the target
    mixture: deterministic stochastic rounding duplicates each doc
    floor(rate)+Bernoulli(frac) times; report per-language row/doc/
    char totals (expected chars land on target share × 2 × total)."""
    docs = load_table(spark, sf_dir, "documents")
    out = mixture_duplicate(
        docs, "lang", "doc_id", "n_chars", _MIX_SHARES, budget_frac=2.0
    )
    return out.groupBy("lang", "rate").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
        F.max("copy_idx").cast("long").alias("max_copies"),
    )


_UPSAMPLE_ORACLE = f"""
SELECT lang, rate, COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(MAX(copy_idx) AS BIGINT) AS max_copies
FROM ({mixture_duplicate_sql("documents", "lang", "doc_id", "n_chars", _MIX_SHARES, budget_frac=2.0)})
GROUP BY lang, rate
"""


def q_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: the table-function chunker must reproduce
    the native array-expression chunker bit-for-bit (same oracle SQL).
    Row-at-a-time Python — the API-parity witness, not the production
    path."""
    from gis_city_county_spark.operators.pyapi import chunk_documents_udtf

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents_udtf(docs, "doc_id", "text", chunk=_CHUNK, stride=_STRIDE)


_PMI_V, _PMI_K = 120, 25


def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top PMI-scored co-occurring vocabulary
    pairs across documents (operators.corpus.pmi_pairs) — exact
    integer scoring, vocab-bounded pair fan-out."""
    docs = load_table(spark, sf_dir, "documents")
    return pmi_pairs(docs, "doc_id", "text", vocab_k=_PMI_V, top_k=_PMI_K)


_PMI_ORACLE = pmi_pairs_sql(
    "SELECT doc_id, text FROM documents", "doc_id", "text", vocab_k=_PMI_V, top_k=_PMI_K
)


_MERGE_ROUNDS = 3


def q_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training kernel: 3 rounds of corpus-wide top-pair
    merge induction (operators.corpus.pair_merge_rounds) — the learned
    merge table, BPE's inner loop as a relational program. Runs on a
    deterministic 1-in-5 document subset to keep the benched round
    count honest without scanning the whole corpus thrice."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return pair_merge_rounds(docs, "doc_id", "text", rounds=_MERGE_ROUNDS)


_MERGES_ORACLE = pair_merge_rounds_sql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0",
    "doc_id",
    "text",
    rounds=_MERGE_ROUNDS,
)


def q_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization of every document into a 128-dim
    sparse vector (sorted indices/counts arrays) — stateless
    vocabulary-free encoding, explode + two bounded aggregates.

    The operator's natural output is parallel arrays; the suite emits
    them CSV-serialized because the driver canonicalizer can't sort
    list cells (same constraint as ``sim_kmeans_refine``, r2)."""
    from gis_city_county_spark.operators.mlprep import hash_features

    docs = load_table(spark, sf_dir, "documents")
    hf = hash_features(docs, "doc_id", "text", n_buckets=128)
    return hf.select(
        "doc_id",
        "n_tokens",
        "n_active",
        F.concat_ws(",", F.col("indices").cast("array<string>")).alias("indices_csv"),
        F.concat_ws(",", F.col("counts").cast("array<string>")).alias("counts_csv"),
    )


def _hash_features_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import hash_features_sql

    inner = hash_features_sql("SELECT * FROM documents", "doc_id", "text", 128)
    return f"""
SELECT doc_id, n_tokens, n_active,
       COALESCE(array_to_string(list_transform(indices, x -> CAST(x AS VARCHAR)), ','), '')
         AS indices_csv,
       COALESCE(array_to_string(list_transform(counts, x -> CAST(x AS VARCHAR)), ','), '')
         AS counts_csv
FROM ({inner}) t
"""


def q_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-vocabulary one-hot of the customer market segment (dense
    0/1 array in category order), plus a per-nation sum of the vectors
    — the categorical-encode + vector-aggregate shape."""
    from gis_city_county_spark.operators.mlprep import one_hot

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    cust = load_table(spark, sf_dir, "customer")
    enc = one_hot(cust, "c_mktsegment", segs)
    return enc.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        *[
            F.sum(F.col("onehot")[i]).alias(f"n_{s.lower()}")
            for i, s in enumerate(segs)
        ],
    )


_ONE_HOT_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_mktsegment = 'AUTOMOBILE' AS INTEGER)) AS BIGINT) AS n_automobile,
       CAST(SUM(CAST(c_mktsegment = 'BUILDING' AS INTEGER)) AS BIGINT) AS n_building,
       CAST(SUM(CAST(c_mktsegment = 'FURNITURE' AS INTEGER)) AS BIGINT) AS n_furniture,
       CAST(SUM(CAST(c_mktsegment = 'HOUSEHOLD' AS INTEGER)) AS BIGINT) AS n_household,
       CAST(SUM(CAST(c_mktsegment = 'MACHINERY' AS INTEGER)) AS BIGINT) AS n_machinery
FROM customer GROUP BY 1
"""


# Priority-ordered merge rules; the third chains on the first's output
# token, exercising cross-rule composition.
_BPE_RULES = [("table", "hash"), ("part", "filter"), ("table_hash", "value")]


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer encode step: apply a fixed ordered merge list to
    every document as chained higher-order array folds — zero
    shuffles, zero joins (operators.corpus.apply_merges); the oracle
    replays the induction-style positional rewrite."""
    from gis_city_county_spark.operators.corpus import apply_merges

    docs = load_table(spark, sf_dir, "documents")
    return apply_merges(docs, "doc_id", "text", _BPE_RULES)


def _bpe_encode_oracle() -> str:
    from gis_city_county_spark.operators.corpus import apply_merges_sql

    return apply_merges_sql("SELECT * FROM documents", "doc_id", "text", _BPE_RULES)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: every document scored by how
    English-target-like its hashed-unigram distribution is (add-one
    smoothed target/source bucket ratios, decimal-exact per-doc
    mean) — the data-selection step before mixture resampling."""
    from gis_city_county_spark.operators.corpus import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, "doc_id", "text", F.col("lang") == "en", n_buckets=256)


def _dsir_oracle() -> str:
    from gis_city_county_spark.operators.corpus import dsir_weights_sql

    return dsir_weights_sql(
        "SELECT * FROM documents", "doc_id", "text", "lang = 'en'", n_buckets=256
    )


def q_array_set_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-algebra battery over token arrays: sorted distinct /
    union / intersect / except against a fixed vocabulary, plus
    contains/overlap flags — the nested-type surface a document
    pipeline leans on (tag algebra, field merging). Results sorted so
    both engines' set-op orderings normalize, then '|'-joined to the
    driver-safe scalar shape (the canonicalizer can't sort list
    cells)."""
    from gis_city_county_spark.operators.textstats import tokens

    vocab = F.array(*[F.lit(t) for t in ["table", "join", "scan", "vector"]])
    docs = load_table(spark, sf_dir, "documents")
    toks = F.slice(tokens("text"), 1, 8)

    def joined(arr):
        return F.concat_ws("|", F.array_sort(F.array_distinct(arr)))

    return docs.select(
        "doc_id",
        joined(toks).alias("distinct_toks"),
        joined(F.array_union(toks, vocab)).alias("union_v"),
        joined(F.array_intersect(toks, vocab)).alias("inter_v"),
        joined(F.array_except(toks, vocab)).alias("except_v"),
        F.array_contains(toks, "table").alias("has_table"),
        F.arrays_overlap(toks, vocab).alias("overlaps_v"),
    )


def _array_set_oracle() -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         list_slice({tokens_sql("text")}, 1, 8) AS toks,
         ['table', 'join', 'scan', 'vector'] AS vocab
  FROM documents
)
SELECT doc_id,
       COALESCE(array_to_string(list_sort(list_distinct(toks)), '|'), '') AS distinct_toks,
       COALESCE(array_to_string(list_sort(list_distinct(list_concat(toks, vocab))), '|'), '')
         AS union_v,
       COALESCE(array_to_string(list_sort(list_distinct(list_intersect(toks, vocab))), '|'), '')
         AS inter_v,
       COALESCE(array_to_string(
         list_sort(list_distinct(list_filter(toks, x -> NOT list_contains(vocab, x)))),
         '|'), '') AS except_v,
       list_contains(toks, 'table') AS has_table,
       list_has_any(toks, vocab) AS overlaps_v
FROM t
"""



def q_scalar_iter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas-UDF witness: iterator-batched per-row text
    features with closure-amortized setup (the model-loading surface
    of the pandas-UDF family)."""
    from gis_city_county_spark.operators.pyapi import scalar_iter_text_stats

    docs = load_table(spark, sf_dir, "documents")
    return scalar_iter_text_stats(docs, "doc_id", "text")


def _scalar_iter_oracle() -> str:
    from gis_city_county_spark.operators.pyapi import scalar_iter_text_stats_sql

    return scalar_iter_text_stats_sql("SELECT * FROM documents", "doc_id", "text")


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style denoising prep: hash-deterministic ~20% token masking
    with numbered sentinels, emitting (inputs, targets) seq2seq pairs
    — reproducible across runs, engines, and partitionings."""
    from gis_city_county_spark.operators.corpus import span_corruption

    docs = load_table(spark, sf_dir, "documents")
    return span_corruption(docs, "doc_id", "text", mask_rate_denom=5)


def _span_oracle() -> str:
    from gis_city_county_spark.operators.corpus import span_corruption_sql

    return span_corruption_sql("SELECT * FROM documents", "doc_id", "text", 5)


def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via the pigeonhole banded hamming join
    (bucket-local candidate generation — never all-pairs). Registered
    here because the dedup_* window block is full; same family as
    ``dedup_simhash``."""
    from gis_city_county_spark.operators.dedup import simhash_near_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, "doc_id", "text", max_hamming=3, bands=4)


def _simhash_pairs_oracle() -> str:
    from gis_city_county_spark.operators.dedup import simhash_near_pairs_sql

    return simhash_near_pairs_sql("documents", "doc_id", "text", max_hamming=3, bands=4)


def q_ngram_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-style modified n-gram precision (n=1..4): each document's
    first-40-token 'summary' as candidate against its full text as
    reference — the overlap-eval harness shape."""
    from gis_city_county_spark.operators.corpus import ngram_precision_eval
    from gis_city_county_spark.operators.textstats import tokens

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id",
        F.array_join(F.slice(tokens("text"), 1, 40), " ").alias("cand"),
        F.col("text").alias("ref"),
    )
    return ngram_precision_eval(pairs, "doc_id", "cand", "ref", max_n=4)


def _ngram_precision_oracle() -> str:
    from gis_city_county_spark.operators.corpus import ngram_precision_eval_sql
    from gis_city_county_spark.operators.textstats import tokens_sql

    # COALESCE: DuckDB array_to_string([], ' ') is NULL where Spark's
    # array_join gives '' — diverges on zero-token documents.
    return ngram_precision_eval_sql(
        "SELECT * FROM documents",
        "doc_id",
        f"COALESCE(array_to_string(list_slice({tokens_sql('text')}, 1, 40), ' '), '')",
        "text",
        max_n=4,
    )


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocab coverage per source: vocabulary = tokens with
    ≥ 1000 ppm of corpus occurrences; report each source's covered
    token mass and fully-in-vocab document count."""
    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs, "doc_id", "text", "source", ppm=1000)


_VOCAB_COV_ORACLE = vocab_coverage_sql(
    "documents", "doc_id", "text", "source", ppm=1000
)


def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: documents ranked easy→hard by length
    (n_chars asc, doc_id tiebreak) via the two-phase ranged rank and
    banded into 4 equal-width phases."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return curriculum_phases(docs, "doc_id", "n_chars", n_phases=4)


_CURRICULUM_ORACLE = curriculum_phases_sql(
    "(SELECT doc_id, n_chars FROM documents)", "doc_id", "n_chars", n_phases=4
)


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) source mixture over the corpus
    character mass: the mT5-style flattening that keeps tail sources
    represented in the training mix; one aggregate to |sources| rows,
    sqrt-chain weights, canonical-order normalizer."""
    from gis_city_county_spark.operators.corpus import temperature_mixture

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mixture(docs, "source", "n_chars", alpha=0.5,
                               budget=1_000_000)


def _temperature_oracle() -> str:
    from gis_city_county_spark.operators.corpus import temperature_mixture_sql

    return temperature_mixture_sql(
        "documents", "source", "n_chars", alpha=0.5, budget=1_000_000
    )


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc corpus-LM fluency score (Laplace-smoothed bigram ppm,
    no logs) — the engine-exact perplexity-filter stage."""
    from gis_city_county_spark.operators.corpus import bigram_lm_score

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_score(docs, "doc_id", "text")


def _bigram_lm_oracle() -> str:
    from gis_city_county_spark.operators.corpus import bigram_lm_score_sql

    return bigram_lm_score_sql("documents", "doc_id", "text")


def q_repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc inter-document repeated-chunk coverage (8-token
    windows, stride 4) — the memorized-boilerplate audit; linear in
    corpus tokens, no pairwise stage."""
    from gis_city_county_spark.operators.corpus import repeated_chunk_report

    docs = load_table(spark, sf_dir, "documents")
    return repeated_chunk_report(docs, "doc_id", "text")


def _repeated_chunks_oracle() -> str:
    from gis_city_county_spark.operators.corpus import repeated_chunk_report_sql

    return repeated_chunk_report_sql("documents", "doc_id", "text")


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row publishable dataset card: volume, provenance breadth,
    exact-dup rate, quality distribution — byte-identical across
    builds of the same data."""
    from gis_city_county_spark.operators.corpus import dataset_card

    docs = load_table(spark, sf_dir, "documents")
    return dataset_card(docs, "doc_id", "text", "lang", "source")


def _dataset_card_oracle() -> str:
    from gis_city_county_spark.operators.corpus import dataset_card_sql

    return dataset_card_sql("documents", "doc_id", "text", "lang", "source")


def q_quality_rule_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style per-rule drop accounting per source: how many
    docs each quality rule (short/long/stopword/symbol/digit/
    repetitive) would remove and what survives them all — exact
    integer comparisons only, one scan."""
    from gis_city_county_spark.operators.corpus import quality_rule_audit

    docs = load_table(spark, sf_dir, "documents")
    return quality_rule_audit(docs, "source", "text")


def _rule_audit_oracle() -> str:
    from gis_city_county_spark.operators.corpus import quality_rule_audit_sql

    return quality_rule_audit_sql("documents", "source", "text")


def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary Jaccard (distinct-token types,
    exact ppm) — the redundancy map between sources; per-token
    fan-out bounded by sources²."""
    from gis_city_county_spark.operators.corpus import vocab_overlap_pairs

    docs = load_table(spark, sf_dir, "documents")
    return vocab_overlap_pairs(docs, "source", "text")


def _vocab_overlap_oracle() -> str:
    from gis_city_county_spark.operators.corpus import vocab_overlap_pairs_sql

    return vocab_overlap_pairs_sql("documents", "source", "text")


def q_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top token-share movers (exact ppm) between the even- and
    odd-doc_id halves of the corpus — the content-shift monitor a
    feed pipeline runs between drops."""
    from gis_city_county_spark.operators.corpus import token_drift

    docs = load_table(spark, sf_dir, "documents")
    return token_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "text",
        k=30,
    )


def _token_drift_oracle() -> str:
    from gis_city_county_spark.operators.corpus import token_drift_sql

    return token_drift_sql(
        "SELECT * FROM documents WHERE doc_id % 2 = 0",
        "SELECT * FROM documents WHERE doc_id % 2 = 1",
        "text",
        k=30,
    )


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch reshuffle audit: per-(epoch, shard) balance + how
    many documents an epoch keeps in its epoch-0 shard (should be near
    the 1/S collision rate, proving the reshuffle actually moves
    data)."""
    from gis_city_county_spark.operators.corpus import epoch_shuffle_plan

    docs = load_table(spark, sf_dir, "documents")
    return epoch_shuffle_plan(docs, "doc_id")


def _epoch_shuffle_oracle() -> str:
    from gis_city_county_spark.operators.corpus import epoch_shuffle_plan_sql

    return epoch_shuffle_plan_sql("SELECT * FROM documents", "doc_id")


def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level Simpson concentration + effective vocabulary per
    source — the log-free diversity alarm for template rot."""
    from gis_city_county_spark.operators.corpus import simpson_diversity

    docs = load_table(spark, sf_dir, "documents")
    return simpson_diversity(docs, "source", "text")


def _simpson_oracle() -> str:
    from gis_city_county_spark.operators.corpus import simpson_diversity_sql

    return simpson_diversity_sql("documents", "source", "text")


def q_token_burstiness(spark, sf_dir):
    """Top-30 token burstiness (Fano factor, exact milli) over the
    documents corpus — topical-vs-function-word dispersion."""
    from gis_city_county_spark.operators.corpus import token_burstiness

    docs = load_table(spark, sf_dir, "documents")
    return token_burstiness(docs, "doc_id", "text", top_k=30)


def _burstiness_oracle() -> str:
    from gis_city_county_spark.operators.corpus import token_burstiness_sql

    return token_burstiness_sql(
        "SELECT * FROM documents", "doc_id", "text", top_k=30
    )


def q_split_balance(spark, sf_dir):
    """Per-(split, label) balance audit of the deterministic 80/10/10
    assignment: label share within each split vs the corpus share,
    exact ppm."""
    from gis_city_county_spark.operators.corpus import split_balance_audit

    docs = load_table(spark, sf_dir, "documents")
    return split_balance_audit(docs, "doc_id", "lang")


def _split_balance_oracle() -> str:
    from gis_city_county_spark.operators.corpus import (
        split_balance_audit_sql,
    )

    return split_balance_audit_sql(
        "SELECT * FROM documents", "doc_id", "lang"
    )


def q_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness lower bound per language, with the
    Good-Turing unseen mass riding along — exact integer
    frequency-of-frequencies (see operators.corpus.chao1_richness)."""
    from gis_city_county_spark.operators.corpus import chao1_richness

    docs = load_table(spark, sf_dir, "documents")
    return chao1_richness(docs, "lang", "text")


def _chao1_oracle() -> str:
    from gis_city_county_spark.operators.corpus import chao1_richness_sql

    return chao1_richness_sql("documents", "lang", "text")


def q_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between each source's unigram
    distribution and the rest of the corpus — the log-free mixture
    novelty read, exact over the common denominator with the
    never-seen-token mass in closed form (see
    operators.corpus.tv_distance)."""
    from gis_city_county_spark.operators.corpus import tv_distance

    docs = load_table(spark, sf_dir, "documents")
    return tv_distance(docs, "source", "text")


def _tv_oracle() -> str:
    from gis_city_county_spark.operators.corpus import tv_distance_sql

    return tv_distance_sql("documents", "source", "text")


def q_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth at power-of-two token checkpoints
    in doc_id order (see operators.corpus.heaps_curve)."""
    from gis_city_county_spark.operators.corpus import heaps_curve

    docs = load_table(spark, sf_dir, "documents")
    return heaps_curve(docs, "doc_id", "text")


def _heaps_oracle() -> str:
    from gis_city_county_spark.operators.corpus import heaps_curve_sql

    return heaps_curve_sql("documents", "doc_id", "text")


# q_tokenizer_fertility was registered here for one round-11 session
# as ``corpus_tokenizer_fertility``; it duplicated the round-5
# ``text_tokenizer_fertility`` spec (same operator semantics, same
# table/columns) and was retired in round 12 — the surviving textstats
# spec now also covers the chars_per_token_milli column.


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-leakage audit of the deterministic doc-level split:
    sources whose documents land in more than one of train/val/test
    (see operators.corpus.split_leakage_audit)."""
    from gis_city_county_spark.operators.corpus import split_leakage_audit

    docs = load_table(spark, sf_dir, "documents")
    return split_leakage_audit(docs, "doc_id", "source")


def _leakage_oracle() -> str:
    from gis_city_county_spark.operators.corpus import (
        split_leakage_audit_sql,
    )

    return split_leakage_audit_sql("documents", "doc_id", "source")


SPECS = [
    QuerySpec("pipeline_split_balance", q_split_balance,
              _split_balance_oracle()),
    QuerySpec("corpus_token_burstiness", q_token_burstiness,
              _burstiness_oracle()),
    QuerySpec("corpus_chunk_documents", q_chunk_documents, _CHUNK_ORACLE),
    QuerySpec("corpus_token_drift", q_token_drift, _token_drift_oracle()),
    QuerySpec("pipeline_dataset_card", q_dataset_card, _dataset_card_oracle()),
    QuerySpec("corpus_repeated_chunks", q_repeated_chunks,
              _repeated_chunks_oracle()),
    QuerySpec("corpus_bigram_lm_score", q_bigram_lm_score, _bigram_lm_oracle()),
    QuerySpec("pipeline_temperature_mixture", q_temperature_mixture,
              _temperature_oracle()),
    QuerySpec("corpus_vocab_coverage", q_vocab_coverage, _VOCAB_COV_ORACLE),
    QuerySpec("mlprep_curriculum_phases", q_curriculum_phases, _CURRICULUM_ORACLE),
    QuerySpec("corpus_ngram_precision_eval", q_ngram_precision, _ngram_precision_oracle()),
    QuerySpec("corpus_simhash_near_pairs", q_simhash_near_pairs, _simhash_pairs_oracle()),
    QuerySpec("corpus_bpe_encode", q_bpe_encode, _bpe_encode_oracle()),
    QuerySpec("corpus_dsir_weights", q_dsir_weights, _dsir_oracle()),
    QuerySpec("corpus_span_corruption", q_span_corruption, _span_oracle()),
    QuerySpec("pyapi_scalar_iter_stats", q_scalar_iter_stats, _scalar_iter_oracle()),
    QuerySpec("func_array_set_battery", q_array_set_battery, _array_set_oracle()),
    QuerySpec("mlprep_hash_features", q_hash_features, _hash_features_oracle()),
    QuerySpec("mlprep_one_hot_segments", q_one_hot, _ONE_HOT_ORACLE),
    QuerySpec("corpus_pmi_pairs", q_pmi_pairs, _PMI_ORACLE),
    QuerySpec("corpus_pair_merges", q_pair_merges, _MERGES_ORACLE),
    QuerySpec("pyapi_chunk_udtf", q_chunk_udtf, _CHUNK_ORACLE),
    QuerySpec("corpus_ngram_topk", q_ngram_topk, _NGRAM_ORACLE),
    QuerySpec("corpus_length_band_filter", q_length_band, _BAND_ORACLE),
    QuerySpec("pipeline_shard_assign", q_shard_assign, _SHARD_ORACLE),
    QuerySpec("pipeline_epoch_shuffle", q_epoch_shuffle, _epoch_shuffle_oracle()),
    QuerySpec("corpus_simpson_diversity", q_simpson_diversity,
              _simpson_oracle()),
    QuerySpec("corpus_repetition_stats", q_repetition_stats, _REP_ORACLE),
    QuerySpec("pipeline_train_val_test", q_train_val_test, _SPLIT_ORACLE),
    QuerySpec("pipeline_decontaminate", q_decontaminate, _DECON_ORACLE),
    QuerySpec("pipeline_mixture_resample", q_mixture_resample, _MIX_ORACLE),
    QuerySpec("pipeline_mixture_upsample", q_mixture_upsample, _UPSAMPLE_ORACLE),
    QuerySpec("corpus_quality_rule_audit", q_quality_rule_audit,
              _rule_audit_oracle()),
    QuerySpec("corpus_vocab_overlap", q_vocab_overlap, _vocab_overlap_oracle()),
    QuerySpec("corpus_chao1_richness", q_chao1_richness, _chao1_oracle()),
    QuerySpec("pipeline_split_leakage", q_split_leakage, _leakage_oracle()),
    QuerySpec("corpus_heaps_curve", q_heaps_curve, _heaps_oracle()),
    QuerySpec("corpus_tv_distance", q_tv_distance, _tv_oracle()),
]
