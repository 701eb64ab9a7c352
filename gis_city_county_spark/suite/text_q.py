"""Text-analysis queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.textstats import (
    STOPWORDS,
    bpe_token_count,
    bpe_token_count_sql,
    cjk_char_count,
    cjk_count_sql,
    fingerprint_md5,
    normalized_text_sql,
    predicted_lang,
    punct_char_count,
    quality_score,
    quality_score_sql,
    stopword_count,
    stopword_count_sql,
    token_count,
    tokens_sql,
)
from gis_city_county_spark.operators.scale import rebalance_for_fanout
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + basic character stats — pure scan+project."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_token_count("text").alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
        punct_char_count("text").alias("n_punct"),
    )


_TOKEN_ORACLE = f"""
SELECT doc_id,
       len({tokens_sql('text')}) AS n_tokens,
       {bpe_token_count_sql('text')} AS n_bpe_tokens,
       length(text) AS n_chars_measured,
       length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS n_punct
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/n-gram language-ID heuristic with deterministic
    tie-break; emits the per-language scores for inspection."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        *[stopword_count("text", L).alias(f"score_{L}") for L in STOPWORDS],
        cjk_char_count("text").alias("score_zh"),
        predicted_lang("text").alias("predicted_lang"),
    )


_LANG_SCORES = ",\n       ".join(
    f"{stopword_count_sql('text', L)} AS score_{L}" for L in STOPWORDS
)
_LANG_ORACLE = f"""
SELECT doc_id, lang,
       {_LANG_SCORES},
       {cjk_count_sql('text')} AS score_zh,
       CASE
         WHEN {stopword_count_sql('text', 'en')} >= {stopword_count_sql('text', 'es')}
          AND {stopword_count_sql('text', 'en')} >= {stopword_count_sql('text', 'de')}
          AND {stopword_count_sql('text', 'en')} >= {stopword_count_sql('text', 'fr')}
          AND {stopword_count_sql('text', 'en')} >= {cjk_count_sql('text')} THEN 'en'
         WHEN {stopword_count_sql('text', 'es')} >= {stopword_count_sql('text', 'de')}
          AND {stopword_count_sql('text', 'es')} >= {stopword_count_sql('text', 'fr')}
          AND {stopword_count_sql('text', 'es')} >= {cjk_count_sql('text')} THEN 'es'
         WHEN {stopword_count_sql('text', 'de')} >= {stopword_count_sql('text', 'fr')}
          AND {stopword_count_sql('text', 'de')} >= {cjk_count_sql('text')} THEN 'de'
         WHEN {stopword_count_sql('text', 'fr')} >= {cjk_count_sql('text')} THEN 'fr'
         ELSE 'zh'
       END AS predicted_lang
FROM documents
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        quality_score("text").alias("quality"),
    )


_QUALITY_ORACLE = f"""
SELECT doc_id, source, {quality_score_sql('text')} AS quality
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text plus a
    position-weighted rolling token hash (order-sensitive — permuted
    documents get different prints, unlike a bag-of-words hash)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    exploded = rebalance_for_fanout(docs, multiplier=64.0).select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    )
    rolled = exploded.select(
        "doc_id",
        (
            (F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long") % 1000003)
            * (F.col("pos") + 1)
        ).alias("term"),
    ).groupBy("doc_id").agg((F.sum("term") % 2147483647).alias("rolling_fp"))
    base = docs.select("doc_id", fingerprint_md5("text").alias("fp_md5"))
    return base.join(rolled, "doc_id")


_FP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
),
rolled AS (
  SELECT doc_id,
         CAST(SUM((CAST('0x' || substr(md5(list_extract(t, i)), 1, 15) AS BIGINT) % 1000003)
             * i) % 2147483647 AS BIGINT) AS rolling_fp
  FROM toks, LATERAL UNNEST(generate_series(1, len(t))) AS g(i)
  GROUP BY doc_id
)
SELECT d.doc_id, md5({normalized_text_sql('text')}) AS fp_md5, r.rolling_fp
FROM documents d JOIN rolled r ON d.doc_id = r.doc_id
"""


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-ingest data census of the documents table: one pass, one
    wide aggregate, unpivoted to a row per column."""
    from gis_city_county_spark.operators.profile import profile

    docs = load_table(spark, sf_dir, "documents")
    return profile(docs, ["doc_id", "source", "lang", "text"])


def _profile_oracle() -> str:
    from gis_city_county_spark.operators.profile import profile_sql

    return profile_sql("documents", ["doc_id", "source", "lang", "text"])


def q_histogram_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of document lengths (20 bins over
    [0, 4000), clamped edge bins) — single-pass profiling."""
    from gis_city_county_spark.operators.profile import histogram

    docs = load_table(spark, sf_dir, "documents")
    return histogram(docs, "n_chars", 0.0, 4000.0, 20)


def _histogram_oracle() -> str:
    from gis_city_county_spark.operators.profile import histogram_sql

    return histogram_sql("SELECT * FROM documents", "n_chars", 0.0, 4000.0, 20)


def q_zscore_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length from exact decimal
    moments — length-normalization feature, engine-exact."""
    from gis_city_county_spark.operators.profile import zscore

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return zscore(docs, "lang", "n_chars")


def _zscore_oracle() -> str:
    from gis_city_county_spark.operators.profile import zscore_sql

    return zscore_sql(
        "SELECT doc_id, lang, n_chars FROM documents",
        "lang",
        "n_chars",
        "doc_id, lang, n_chars",
    )


def q_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data shape: language-ID filter →
    quality threshold → exact dedup on the normalized-text fingerprint
    (keep lowest doc_id) → per-source document/token accounting.
    Single scan, one window shuffle on the fingerprint, one
    aggregation shuffle on source — the composition adds no extra
    passes over the corpus."""
    from pyspark.sql import Window

    from gis_city_county_spark.functions.numeric import dec_sum

    from gis_city_county_spark.operators.scale import (
        checkpoint_lazy,
        rebalance_for_fanout,
    )

    docs = load_table(spark, sf_dir, "documents")
    # lazy-checkpointed BEFORE the filter: live, pushdown substitutes
    # the interpreted predicted_lang/quality_score HOF chains into a
    # per-row Filter below the projection (re-evaluated inside the
    # single-task scan stage); materializing pins the filter to the
    # computed columns.  The rebalance spreads the heavy per-row
    # expression work over the cluster slots (guide §2.5) — the sf0.1
    # scan is one split.
    enriched = checkpoint_lazy(
        rebalance_for_fanout(docs, multiplier=8.0).select(
            "doc_id",
            "source",
            predicted_lang("text").alias("plang"),
            quality_score("text").alias("quality"),
            bpe_token_count("text").alias("n_tokens"),
            fingerprint_md5("text").alias("fp"),
        )
    ).filter((F.col("plang") == "en") & (F.col("quality") >= 0.45))
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = enriched.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return (
        deduped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dec_sum("n_tokens", "total_tokens"),
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
        )
        .orderBy("source")
    )


_PIPELINE_ORACLE = f"""
WITH enriched AS (
  SELECT doc_id, source,
         {quality_score_sql('text')} AS quality,
         {bpe_token_count_sql('text')} AS n_tokens,
         md5({normalized_text_sql('text')}) AS fp
  FROM documents
  WHERE CASE
          WHEN {stopword_count_sql('text', 'en')} >= {stopword_count_sql('text', 'es')}
           AND {stopword_count_sql('text', 'en')} >= {stopword_count_sql('text', 'de')}
           AND {stopword_count_sql('text', 'en')} >= {stopword_count_sql('text', 'fr')}
           AND {stopword_count_sql('text', 'en')} >= {cjk_count_sql('text')} THEN 'en'
          ELSE 'other'
        END = 'en'
    AND {quality_score_sql('text')} >= 0.45
),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM enriched) t
  WHERE rn = 1
)
SELECT source, COUNT(*) AS n_docs,
       CAST(CAST(SUM(CAST(n_tokens AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total_tokens,
       MIN(quality) AS min_quality,
       MAX(quality) AS max_quality
FROM deduped
GROUP BY source
ORDER BY source
"""


def q_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language linear fit of BPE-token count against character
    count — integer-exact moments, bit-deterministic slope (see
    operators.profile.ols_slope). The chars-per-token trend is the
    standard sanity check that a tokenizer treats each language
    comparably."""
    from gis_city_county_spark.operators.profile import ols_slope

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        bpe_token_count("text").cast("long").alias("y"),
    )
    return ols_slope(docs, "lang", "x", "y")


def _ols_oracle() -> str:
    from gis_city_county_spark.operators.profile import ols_slope_sql

    src = (
        "SELECT lang, CAST(n_chars AS BIGINT) AS x, "
        f"CAST({bpe_token_count_sql('text')} AS BIGINT) AS y FROM documents"
    )
    return ols_slope_sql(src, "lang", "x", "y")


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation shape: confusion matrix of the language-ID
    heuristic against the labeled lang column, with per-cell counts —
    the accuracy report a pipeline runs before trusting a filter
    stage. One aggregate over the scored scan."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", predicted_lang("text").alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


_CONFUSION_ORACLE = f"""
SELECT lang, predicted_lang, COUNT(*) AS n_docs
FROM ({_LANG_ORACLE})
GROUP BY lang, predicted_lang ORDER BY lang, predicted_lang
"""


def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pearson correlation of character count vs BPE
    token count from exact integer moments (deterministic twin of the
    float-accumulating built-in corr)."""
    from gis_city_county_spark.operators.profile import correlation

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        bpe_token_count("text").cast("long").alias("y"),
    )
    return correlation(docs, "lang", "x", "y")


def _corr_oracle() -> str:
    from gis_city_county_spark.operators.profile import correlation_sql

    src = (
        "SELECT lang, CAST(n_chars AS BIGINT) AS x, "
        f"CAST({bpe_token_count_sql('text')} AS BIGINT) AS y FROM documents"
    )
    return correlation_sql(src, "lang", "x", "y")


def q_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-rarity scoring (model-free perplexity stand-in):
    mean corpus-frequency-rank of each document's tokens."""
    from gis_city_county_spark.operators.textstats import rarity_score

    docs = load_table(spark, sf_dir, "documents")
    return rarity_score(docs, "doc_id", "text")


def _rarity_oracle() -> str:
    from gis_city_county_spark.operators.textstats import rarity_score_sql

    return rarity_score_sql("documents", "doc_id", "text")


def q_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation scorecard: document count, mean quality
    score, exact-duplicate rate (1 − distinct fingerprints ∕ docs, in
    exact ppm), and token budget — the table a crawl-intake review
    reads before admitting a source into the training mix. One
    aggregation keyed on source; the dup rate needs the per-source
    distinct fingerprint count (exact here; swap to approx at 10⁹+
    fingerprints per source)."""
    from gis_city_county_spark.operators.textstats import fingerprint_md5

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            fingerprint_md5("text").alias("fp"),
            # floor-quantize the quality double to integer ppm BEFORE
            # aggregating: floor of identical doubles is identical on
            # any engine, so the mean is exact integer arithmetic
            # (summing raw doubles through decimal would hinge on the
            # engines' double→decimal rounding agreeing).
            F.floor(quality_score("text") * 1_000_000).alias("q_ppm"),
            token_count("text").alias("toks"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("CAST(sum(q_ppm) AS DECIMAL(38,0)) div count(1)")
            .cast("long")
            .alias("mean_quality_ppm"),
            F.countDistinct("fp").alias("n_unique"),
            F.expr(
                "(CAST(count(1) - count(DISTINCT fp) AS DECIMAL(38,0)) * 1000000)"
                " div count(1)"
            )
            .cast("long")
            .alias("dup_ppm"),
            F.sum("toks").alias("total_tokens"),
        )
        .orderBy("source")
    )


def _source_report_oracle() -> str:
    from gis_city_county_spark.operators.textstats import normalized_text_sql

    return f"""
WITH scored AS (
  SELECT source, md5({normalized_text_sql('text')}) AS fp,
         CAST(floor(({quality_score_sql('text')}) * 1000000) AS BIGINT) AS q_ppm,
         len({tokens_sql('text')}) AS toks
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(CAST(SUM(q_ppm) AS HUGEINT) // COUNT(*) AS BIGINT) AS mean_quality_ppm,
       COUNT(DISTINCT fp) AS n_unique,
       CAST((CAST(COUNT(*) - COUNT(DISTINCT fp) AS HUGEINT) * 1000000)
            // COUNT(*) AS BIGINT) AS dup_ppm,
       CAST(SUM(toks) AS BIGINT) AS total_tokens
FROM scored GROUP BY source ORDER BY source
"""


_SOURCE_REPORT_ORACLE = _source_report_oracle()


_DRIFT_BINS, _DRIFT_LO, _DRIFT_HI = 10, 0.0, 4000.0


def q_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: χ² statistic of each source's
    document-length distribution against the corpus-wide distribution
    over 10 fixed bins — the "did this source's content shift?" alarm.
    Exact integer bin counts; each bin's (o−e)²∕e term is an IEEE
    expression on identical operands, floor-quantized to integer ppm
    before summing so the statistic is engine-exact (no reliance on
    double→decimal rounding agreement). Two keyed aggregations (bin
    counts, then per-source fold) + a broadcast 10-row corpus margin."""
    docs = load_table(spark, sf_dir, "documents")
    w = (_DRIFT_HI - _DRIFT_LO) / _DRIFT_BINS
    bin_ = F.least(
        F.lit(_DRIFT_BINS - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("n_chars").cast("double") - _DRIFT_LO) / w).cast("int"),
        ),
    )
    binned = docs.select("source", bin_.alias("bin"))
    per_src = binned.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("o"))
    margins = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("m"))
    totals = binned.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    grand = binned.agg(F.count(F.lit(1)).alias("n_all"))
    joined = (
        per_src.join(F.broadcast(margins), "bin")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(grand))
    )
    e = (
        F.col("m").cast("double")
        * F.col("n_src").cast("double")
        / F.col("n_all").cast("double")
    )
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    return (
        joined.select("source", "n_src", F.floor(term * 1_000_000).alias("__t_ppm"))
        .groupBy("source")
        .agg(
            F.max("n_src").alias("n_docs"),
            F.sum("__t_ppm").alias("chi2_ppm"),
        )
        .orderBy("source")
    )


def _length_drift_oracle() -> str:
    w = (_DRIFT_HI - _DRIFT_LO) / _DRIFT_BINS
    bin_ = (
        f"least({_DRIFT_BINS - 1}, greatest(0, "
        f"CAST(floor((CAST(n_chars AS DOUBLE) - {_DRIFT_LO!r}) / {w!r}) AS INTEGER)))"
    )
    return f"""
WITH binned AS (SELECT source, {bin_} AS bin FROM documents),
per_src AS (SELECT source, bin, COUNT(*) AS o FROM binned GROUP BY 1, 2),
margins AS (SELECT bin, COUNT(*) AS m FROM binned GROUP BY 1),
totals AS (SELECT source, COUNT(*) AS n_src FROM binned GROUP BY 1),
grand AS (SELECT COUNT(*) AS n_all FROM binned),
terms AS (
  SELECT p.source, t.n_src,
         CAST(floor(
           (CAST(p.o AS DOUBLE) - CAST(m.m AS DOUBLE) * CAST(t.n_src AS DOUBLE) / CAST(g.n_all AS DOUBLE))
           * (CAST(p.o AS DOUBLE) - CAST(m.m AS DOUBLE) * CAST(t.n_src AS DOUBLE) / CAST(g.n_all AS DOUBLE))
           / (CAST(m.m AS DOUBLE) * CAST(t.n_src AS DOUBLE) / CAST(g.n_all AS DOUBLE))
           * 1000000) AS BIGINT) AS t_ppm
  FROM per_src p
  JOIN margins m USING (bin)
  JOIN totals t USING (source)
  CROSS JOIN grand g
)
SELECT source, MAX(n_src) AS n_docs, CAST(SUM(t_ppm) AS BIGINT) AS chi2_ppm
FROM terms GROUP BY source ORDER BY source
"""


_LENGTH_DRIFT_ORACLE = _length_drift_oracle()


def q_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow surface: per-document UTF-8 byte vs codepoint counts
    through zero-copy pyarrow.compute kernels
    (operators.pyapi.arrow_byte_stats)."""
    from gis_city_county_spark.operators.pyapi import arrow_byte_stats

    docs = load_table(spark, sf_dir, "documents")
    return arrow_byte_stats(docs, "doc_id", "text")


def _arrow_bytes_oracle() -> str:
    from gis_city_county_spark.operators.pyapi import arrow_byte_stats_sql

    return arrow_byte_stats_sql("SELECT doc_id, text FROM documents", "doc_id", "text")


_ARROW_BYTES_ORACLE = _arrow_bytes_oracle()


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-dedup URL canonicalization: five deterministic raw
    variants per document (case/www/ports/tracking-params/trailing
    slash/fragments/param order) collapse onto canonical forms; output
    = canonical URL with raw-row and distinct-raw-form counts."""
    from gis_city_county_spark.operators.textstats import canonical_url

    docs = load_table(spark, sf_dir, "documents")
    k = F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    m = F.pmod(F.col("doc_id"), F.lit(5))
    url = (
        F.when(m == 0, F.concat(F.lit("HTTP://WWW.H"), k, F.lit(".Example.com:80/path/a/?utm_source=x&b=2&a=1#frag")))
        .when(m == 1, F.concat(F.lit("https://h"), k, F.lit(".example.com/path/a?a=1&b=2")))
        .when(m == 2, F.concat(F.lit("https://h"), k, F.lit(".example.com:443/path/a/?b=2&a=1&gclid=zz")))
        .when(m == 3, F.concat(F.lit("http://h"), k, F.lit(".example.com/path/a?a=1&utm_campaign=c&b=2")))
        .otherwise(F.concat(F.lit("https://h"), k, F.lit(".example.com/other")))
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return (
        with_url.withColumn("canonical", canonical_url("url"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("url").alias("n_forms"),
        )
    )


def _url_canonicalize_oracle() -> str:
    from gis_city_county_spark.operators.textstats import canonical_url_sql

    inject = """
SELECT doc_id,
       CASE doc_id % 5
         WHEN 0 THEN 'HTTP://WWW.H' || CAST(doc_id % 7 AS VARCHAR)
                  || '.Example.com:80/path/a/?utm_source=x&b=2&a=1#frag'
         WHEN 1 THEN 'https://h' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example.com/path/a?a=1&b=2'
         WHEN 2 THEN 'https://h' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example.com:443/path/a/?b=2&a=1&gclid=zz'
         WHEN 3 THEN 'http://h' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example.com/path/a?a=1&utm_campaign=c&b=2'
         ELSE 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/other'
       END AS url
FROM documents
"""
    return f"""
SELECT {canonical_url_sql("url")} AS canonical,
       COUNT(*) AS n_raw, COUNT(DISTINCT url) AS n_forms
FROM ({inject}) GROUP BY 1
"""


def q_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination: the 10 customers after cursor
    (acctbal 5000.0, custkey 0) in (acctbal DESC, custkey ASC) order —
    the OFFSET-free pagination pattern: the cursor predicate prunes at
    the scan and the page is a TakeOrdered, so page N costs the same
    as page 1 (OFFSET N scans and discards N rows)."""
    cust = load_table(spark, sf_dir, "customer")
    bal0, key0 = 5000.0, 0
    return (
        cust.filter(
            (F.col("c_acctbal") < bal0)
            | ((F.col("c_acctbal") == bal0) & (F.col("c_custkey") > key0))
        )
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


_KEYSET_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal < 5000.0 OR (c_acctbal = 5000.0 AND c_custkey > 0)
ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10
"""


def q_char_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Gini impurity — the
    no-logarithm entropy proxy for repetition/garbage detection
    (exact Σcnt² integers, one IEEE division)."""
    from gis_city_county_spark.operators.textstats import char_gini

    docs = load_table(spark, sf_dir, "documents")
    return char_gini(docs, "doc_id", "text")


def _char_gini_oracle() -> str:
    from gis_city_county_spark.operators.textstats import char_gini_sql

    return char_gini_sql("documents", "doc_id", "text")


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (BPE subwords per whitespace
    word) — the per-script vocab-budget signal; exact integer counts,
    one division."""
    from gis_city_county_spark.operators.textstats import tokenizer_fertility

    docs = load_table(spark, sf_dir, "documents")
    return tokenizer_fertility(docs, "lang", "text")


def _fertility_oracle() -> str:
    from gis_city_county_spark.operators.textstats import (
        tokenizer_fertility_sql,
    )

    return tokenizer_fertility_sql("documents", "lang", "text")


def q_hapax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical-richness report: token/type/hapax counts
    with exact ppm ratios — hapax explosions flag OCR noise, hapax
    collapse flags boilerplate farms."""
    from gis_city_county_spark.operators.textstats import hapax_stats

    docs = load_table(spark, sf_dir, "documents")
    return hapax_stats(docs, "lang", "text")


def _hapax_oracle() -> str:
    from gis_city_county_spark.operators.textstats import hapax_stats_sql

    return hapax_stats_sql("documents", "lang", "text")


def q_ttr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-controlled vocabulary diversity: micro-averaged
    type-token ratio at fixed 16/64/256-token document prefixes, per
    language — scan-side array expressions only."""
    from gis_city_county_spark.operators.textstats import ttr_curve

    docs = load_table(spark, sf_dir, "documents")
    return ttr_curve(docs, "lang", "text")


def _ttr_oracle() -> str:
    from gis_city_county_spark.operators.textstats import ttr_curve_sql

    return ttr_curve_sql("documents", "lang", "text")


def q_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-class census (letters / digits /
    whitespace / CJK / other, in exact ppm of total chars) — the
    script-vs-label consistency and mojibake probe, one scan-side
    regex-count aggregate."""
    from gis_city_county_spark.operators.textstats import charclass_profile

    docs = load_table(spark, sf_dir, "documents")
    return charclass_profile(docs, "lang", "text")


def _charclass_oracle() -> str:
    from gis_city_county_spark.operators.textstats import charclass_profile_sql

    return charclass_profile_sql("documents", "lang", "text")


def q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity of the corpus source mixture: one exact-
    integer row (concentration/diversity ppm + inverse-Simpson
    effective source count in milli) — the mixture-balance health
    number a corpus build publishes per release."""
    from gis_city_county_spark.operators.profile import simpson_diversity

    docs = load_table(spark, sf_dir, "documents")
    return simpson_diversity(docs, "source")


def _diversity_oracle() -> str:
    from gis_city_county_spark.operators.profile import simpson_diversity_sql

    return simpson_diversity_sql("SELECT source FROM documents", "source")


def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sentence-segmentation profile ([.!?]+ split):
    sentence counts, exact milli words-per-sentence, and the longest
    sentence — the prose-vs-headline-soup structure signal."""
    from gis_city_county_spark.operators.textstats import sentence_stats

    docs = load_table(spark, sf_dir, "documents")
    return sentence_stats(docs, "lang", "text")


def _sentence_oracle() -> str:
    from gis_city_county_spark.operators.textstats import sentence_stats_sql

    return sentence_stats_sql("documents", "lang", "text")


def q_case_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language letter-case census: uppercase ppm of letters and
    SHOUTING-document counts — the all-caps spam signal the charclass
    census can't see."""
    from gis_city_county_spark.operators.textstats import case_profile

    docs = load_table(spark, sf_dir, "documents")
    return case_profile(docs, "lang", "text")


def _case_oracle() -> str:
    from gis_city_county_spark.operators.textstats import case_profile_sql

    return case_profile_sql("documents", "lang", "text")


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coleman-Liau readability per source: exact letter/word/sentence
    sums, milli-floored per-100-word rates, one fixed-order IEEE
    grade."""
    from gis_city_county_spark.operators.textstats import readability_report

    docs = load_table(spark, sf_dir, "documents")
    return readability_report(docs, "source", "text")


def _readability_oracle() -> str:
    from gis_city_county_spark.operators.textstats import (
        readability_report_sql,
    )

    return readability_report_sql("documents", "source", "text")


def q_best_window(spark, sf_dir):
    """Snippet locator: the 10-token window with the most query-term
    hits per matching document (range-frame count over hit positions
    only, earliest-window tie-break)."""
    from gis_city_county_spark.operators.search import best_window

    docs = load_table(spark, sf_dir, "documents")
    return best_window(docs, "doc_id", "text", ["data", "model"],
                       window_tokens=10)


def _best_window_oracle() -> str:
    from gis_city_county_spark.operators.search import best_window_sql

    return best_window_sql(
        "SELECT * FROM documents", "doc_id", "text", ["data", "model"],
        window_tokens=10,
    )


def q_strip_markup(spark, sf_dir):
    """Markup-removal cleaning pass with per-doc accounting, over
    documents with deterministically injected tags/entities (doc_id
    mod 5 picks the contamination kind) — the PII-injection pattern,
    so every removal path is exercised identically on both engines."""
    from gis_city_county_spark.operators.textstats import strip_markup

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.col("text"), F.lit(" &amp; more &#38; tail")),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(F.lit("<div class='a'><b>x</b></div> "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return strip_markup(docs, "doc_id", "text")


def _strip_markup_oracle() -> str:
    from gis_city_county_spark.operators.textstats import strip_markup_sql

    injected = """
SELECT doc_id,
       CASE doc_id % 5
         WHEN 0 THEN '<p>' || text || '</p>'
         WHEN 1 THEN text || ' &amp; more &#38; tail'
         WHEN 2 THEN '<div class=''a''><b>x</b></div> ' || text
         ELSE text
       END AS text
FROM documents
"""
    return strip_markup_sql(injected, "doc_id", "text")


def q_sentence_dedup(spark, sf_dir):
    """Sentence-level duplication audit over documents: per doc, how
    many of its distinct sentences appear verbatim in other docs (the
    C4-style boilerplate signal; see
    operators.textstats.sentence_dedup_ratio)."""
    from gis_city_county_spark.operators.textstats import (
        sentence_dedup_ratio,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sentence_dedup_ratio(docs, "doc_id", "text")


def _sentence_dedup_oracle() -> str:
    from gis_city_county_spark.operators.textstats import (
        sentence_dedup_ratio_sql,
    )

    return sentence_dedup_ratio_sql("documents", "doc_id", "text")



def q_loop_detection(spark, sf_dir):
    """Degenerate-repetition (generation-loop) flags over documents:
    shortest tail period and looping-suffix share (see
    operators.textstats.loop_detection)."""
    from gis_city_county_spark.operators.textstats import loop_detection

    docs = load_table(spark, sf_dir, "documents")
    return loop_detection(docs, "doc_id", "text")


def _loop_oracle() -> str:
    from gis_city_county_spark.operators.textstats import loop_detection_sql

    return loop_detection_sql("documents", "doc_id", "text")


def q_script_profile(spark, sf_dir):
    """Unicode-script composition per language label: exact-ppm
    character shares per script class — the pre-language-ID screen
    (see operators.textstats.script_profile)."""
    from gis_city_county_spark.operators.textstats import script_profile

    docs = load_table(spark, sf_dir, "documents")
    return script_profile(docs, "lang", "text")


def _script_oracle() -> str:
    from gis_city_county_spark.operators.textstats import script_profile_sql

    return script_profile_sql("documents", "lang", "text")


def q_encoding_anomaly(spark, sf_dir):
    """Encoding-damage census per language label: mojibake
    signatures, U+FFFD replacement chars, C0 control chars — exact
    literal-substring flags and ppm rates, entirely scan-side (see
    operators.textstats.encoding_anomaly)."""
    from gis_city_county_spark.operators.textstats import (
        encoding_anomaly,
    )

    docs = load_table(spark, sf_dir, "documents")
    return encoding_anomaly(docs, "lang", "text")


def _encoding_anomaly_oracle() -> str:
    from gis_city_county_spark.operators.textstats import (
        encoding_anomaly_sql,
    )

    return encoding_anomaly_sql("documents", "lang", "text")


def q_mixed_script(spark, sf_dir):
    """Homoglyph/script-spoof audit per language label: tokens mixing
    Latin/Cyrillic/Greek letters, exact ppm share (see
    operators.textstats.mixed_script_tokens)."""
    from gis_city_county_spark.operators.textstats import (
        mixed_script_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    return mixed_script_tokens(docs, "lang", "text")


def _mixed_script_oracle() -> str:
    from gis_city_county_spark.operators.textstats import (
        mixed_script_tokens_sql,
    )

    return mixed_script_tokens_sql("documents", "lang", "text")


def q_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty: the share of a doc's distinct
    shingles whose canonical owner (lowest doc_id) is the doc itself
    (see operators.textstats.ngram_novelty)."""
    from gis_city_county_spark.operators.textstats import ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(docs, "doc_id", "text")


def _novelty_oracle() -> str:
    from gis_city_county_spark.operators.textstats import ngram_novelty_sql

    return ngram_novelty_sql("documents", "doc_id", "text")



SPECS = [
    QuerySpec("text_strip_markup", q_strip_markup, _strip_markup_oracle()),
    QuerySpec("search_best_window", q_best_window, _best_window_oracle()),
    # Order matters: the token/lang/quality core must stay inside the
    # driver's first-50 correctness window (tests/test_contract_shapes).
    QuerySpec("text_readability", q_readability, _readability_oracle()),
    QuerySpec("text_hapax_stats", q_hapax_stats, _hapax_oracle()),
    QuerySpec("text_ttr_curve", q_ttr_curve, _ttr_oracle()),
    QuerySpec("text_char_gini", q_char_gini, _char_gini_oracle()),
    QuerySpec("text_tokenizer_fertility", q_tokenizer_fertility,
              _fertility_oracle()),
    QuerySpec("text_token_stats", q_token_stats, _TOKEN_ORACLE),
    QuerySpec("text_lang_id", q_lang_id, _LANG_ORACLE),
    QuerySpec("text_quality_score", q_quality, _QUALITY_ORACLE),
    QuerySpec("text_url_canonicalize", q_url_canonicalize, _url_canonicalize_oracle()),
    QuerySpec("olap_keyset_page", q_keyset_page, _KEYSET_ORACLE),
    QuerySpec("text_fingerprint", q_fingerprint, _FP_ORACLE),
    QuerySpec("pipeline_training_data", q_training_data_pipeline, _PIPELINE_ORACLE),
    QuerySpec("profile_documents", q_profile_documents, _profile_oracle()),
    QuerySpec("profile_histogram_nchars", q_histogram_nchars, _histogram_oracle()),
    QuerySpec("text_zscore_nchars", q_zscore_nchars, _zscore_oracle()),
    QuerySpec("profile_ols_slope", q_ols_slope, _ols_oracle()),
    QuerySpec("text_rarity_score", q_rarity_score, _rarity_oracle()),
    QuerySpec("eval_lang_id_confusion", q_lang_confusion, _CONFUSION_ORACLE),
    QuerySpec("profile_correlation", q_correlation, _corr_oracle()),
    QuerySpec("pyapi_arrow_byte_stats", q_arrow_byte_stats, _ARROW_BYTES_ORACLE),
    QuerySpec("corpus_source_report", q_source_report, _SOURCE_REPORT_ORACLE),
    QuerySpec("profile_length_drift_chi2", q_length_drift, _LENGTH_DRIFT_ORACLE),
    QuerySpec("text_charclass_profile", q_charclass_profile, _charclass_oracle()),
    QuerySpec("profile_source_diversity", q_source_diversity, _diversity_oracle()),
    QuerySpec("text_sentence_stats", q_sentence_stats, _sentence_oracle()),
    QuerySpec("text_sentence_dedup", q_sentence_dedup,
              _sentence_dedup_oracle()),
    QuerySpec("text_loop_detection", q_loop_detection, _loop_oracle()),
    QuerySpec("text_script_profile", q_script_profile, _script_oracle()),
    QuerySpec("text_ngram_novelty", q_ngram_novelty, _novelty_oracle()),
    QuerySpec("text_mixed_script", q_mixed_script, _mixed_script_oracle()),
    QuerySpec("text_encoding_anomaly", q_encoding_anomaly,
              _encoding_anomaly_oracle()),
    QuerySpec("text_case_profile", q_case_profile, _case_oracle()),
]
