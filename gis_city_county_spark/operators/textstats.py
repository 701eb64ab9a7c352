"""Text-analysis operators for large-scale document pipelines.

Greenfield relative to the reference (SURVEY.md §7 phase 7): language
ID, quality scoring, token counting, fingerprinting. Everything is a
JVM-side Column expression (split/filter/transform over token arrays)
— no Python UDFs, so the operators fuse into whole-stage codegen and
scan-project pipelines at 100 TB without a serialization boundary.

Determinism contract: every expression here has an exact DuckDB SQL
twin (same regex semantics, same double arithmetic order), so the
operators are oracle-testable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
# Deliberately small + hardcoded: the operator's job is the *plumbing*
# (set-membership scoring over token arrays at scale); swapping in a
# real lexicon is a config change.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}
# CJK unicode block (literal chars so Java regex and RE2 agree).
CJK_CLASS = "[一-鿿]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokenization (empty text → empty array)."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.lower(c), r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-style pretokenizer (GPT-2-shaped, simplified): contraction
# suffixes, letter runs, digit runs, punctuation runs. Restricted to
# constructs Java regex and RE2 treat identically (alternation is
# leftmost-first in both; no lookaround).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s']+"


def bpe_tokens(col: Column | str) -> Column:
    """Subword-ish tokens via the BPE pretokenizer regex — the token
    accounting a training-data pipeline budgets by (whitespace tokens
    undercount CJK/punctuation-heavy text)."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_tokens(col))


def stopword_count(col: Column | str, lang: str) -> Column:
    words = STOPWORDS[lang]
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def cjk_char_count(col: Column | str) -> Column:
    c = _c(col)
    return F.length(c) - F.length(F.regexp_replace(c, CJK_CLASS, ""))


def predicted_lang(col: Column | str) -> Column:
    """Argmax over per-language scores with a fixed priority order
    (en > es > de > fr > zh on ties) — the when-chain encodes the
    tie-break deterministically."""
    c_en = stopword_count(col, "en")
    c_es = stopword_count(col, "es")
    c_de = stopword_count(col, "de")
    c_fr = stopword_count(col, "fr")
    c_zh = cjk_char_count(col)
    return (
        F.when((c_en >= c_es) & (c_en >= c_de) & (c_en >= c_fr) & (c_en >= c_zh), "en")
        .when((c_es >= c_de) & (c_es >= c_fr) & (c_es >= c_zh), "es")
        .when((c_de >= c_fr) & (c_de >= c_zh), "de")
        .when(c_fr >= c_zh, "fr")
        .otherwise("zh")
    )


def punct_char_count(col: Column | str) -> Column:
    c = _c(col)
    return F.length(c) - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9\s]", ""))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length, stopword ratio, and
    average token length, combined with fixed weights. Arithmetic is
    written in a fixed order so DuckDB reproduces it bit-for-bit."""
    n_tok = token_count(col).cast("double")
    n_stop = stopword_count(col, "en").cast("double")
    c = _c(col)
    n_alpha = F.length(F.regexp_replace(c, r"\s", "")).cast("double")
    safe_tok = F.when(n_tok > 0, n_tok).otherwise(F.lit(1.0))
    len_component = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_component = F.least(n_stop / safe_tok * F.lit(5.0), F.lit(1.0))
    tok_len_component = F.least(n_alpha / safe_tok / F.lit(8.0), F.lit(1.0))
    return (
        len_component * F.lit(0.3)
        + stop_component * F.lit(0.4)
        + tok_len_component * F.lit(0.3)
    )


def normalized_text(col: Column | str) -> Column:
    """Whitespace-collapsed, lowercased, trimmed — the canonical form
    for exact-duplicate fingerprints."""
    return F.lower(F.trim(F.regexp_replace(_c(col), r"\s+", " ")))


def fingerprint_md5(col: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(col))


# ------------------------------------------------------------------ SQL twins

def tokens_sql(expr: str) -> str:
    return (
        f"CASE WHEN length(trim({expr})) = 0 THEN [] "
        f"ELSE regexp_split_to_array(lower(trim({expr})), '\\s+') END"
    )


def stopword_count_sql(expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tokens_sql(expr)}, t -> t IN ({words})))"


def cjk_count_sql(expr: str) -> str:
    return f"length({expr}) - length(regexp_replace({expr}, '{CJK_CLASS}', '', 'g'))"


def quality_score_sql(expr: str) -> str:
    n_tok = f"CAST(len({tokens_sql(expr)}) AS DOUBLE)"
    n_stop = f"CAST({stopword_count_sql(expr, 'en')} AS DOUBLE)"
    n_alpha = f"CAST(length(regexp_replace({expr}, '\\s', '', 'g')) AS DOUBLE)"
    safe_tok = f"CASE WHEN {n_tok} > 0 THEN {n_tok} ELSE 1.0 END"
    return (
        f"least({n_tok} / 100.0, 1.0) * 0.3"
        f" + least({n_stop} / {safe_tok} * 5.0, 1.0) * 0.4"
        f" + least({n_alpha} / {safe_tok} / 8.0, 1.0) * 0.3"
    )


def normalized_text_sql(expr: str) -> str:
    return f"lower(trim(regexp_replace({expr}, '\\s+', ' ', 'g')))"


def bpe_token_count_sql(expr: str) -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def rarity_score(df, id_col: str, text_col: str):
    """Per-document vocabulary-rarity score: every corpus token gets a
    frequency rank (1 = most common; ties broken by token string so
    the rank is a total order), and each document scores the mean rank
    of its token occurrences — a self-trained, model-free stand-in for
    LM-perplexity filtering (documents full of rare vocabulary score
    high; boilerplate scores low). All counting/ranking is integer,
    the mean goes through the decimal convention, so the score is
    bit-deterministic.

    Plan shape: one explode + token count (shuffle on token), a
    two-phase range rank over the vocabulary (``scale.ranged_rank`` —
    no single-partition window even when the vocabulary itself is
    large), then a broadcast-sized join of ranks back onto the token
    stream and one aggregate keyed on the document."""
    from pyspark.sql import DataFrame

    from gis_city_county_spark.functions.numeric import dec_avg
    from gis_city_county_spark.operators.scale import (
        checkpoint_lazy,
        ranged_rank,
    )

    assert isinstance(df, DataFrame)
    # (r12: a one-tokenize rewrite through a (doc, token) occurrence
    # aggregate measured 1.7× SLOWER here — the pre-aggregate's
    # shuffle + checkpoint cost more than the second scan-side
    # tokenize, which runs in parallel with the first inside one
    # action.  The two-pass shape below is the measured winner.)
    # (r13: a rebalance_for_fanout before this explode measured
    # SLOWER here — 0.86-1.03s -> 1.23s — the repartition exchange
    # costs more than the fan-out parallelism buys on this frame.)
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    # lazy-checkpointed (NOT .persist()): ranged_rank's bounded
    # cuts/counts jobs and the final join reuse the one materialized
    # copy within THIS invocation, but a fresh call re-computes — a
    # plan-keyed .persist() here made bench pass 2 reuse pass 1's
    # cache (driver runs read [7.0, 0.74]), reporting a warm number
    # the cold query never sees (r12 verdict item 3).
    counts = checkpoint_lazy(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = ranged_rank(
        counts, "cnt", "tok", rank_col="rank", descending=True
    )
    return (
        toks.join(F.broadcast(ranked.select("tok", "rank")), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            dec_avg(F.col("rank").cast("double"), "mean_rank"),
            F.max("rank").alias("max_rank"),
        )
    )


def rarity_score_sql(table: str, id_col: str, text_col: str) -> str:
    from gis_city_county_spark.functions.numeric import dec_avg_sql

    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({tokens_sql(text_col)}) AS tok FROM {table}
),
counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
ranked AS (
  SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT) AS rank
  FROM counts
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       {dec_avg_sql('CAST(rank AS DOUBLE)', 'mean_rank')},
       MAX(rank) AS max_rank
FROM toks JOIN ranked USING (tok)
GROUP BY {id_col}
"""


def canonical_url(col: Column | str) -> Column:
    """Canonicalize a URL for dedup/grouping — the crawl-pipeline
    normalizer: scheme forced to https, host lowercased with ``www.``
    and default ports stripped, trailing path slash dropped, tracking
    params (utm_*/fbclid/gclid) removed, surviving params sorted,
    fragment discarded. Pure regexp/array expressions (codegen'd,
    no UDF); every step has an identical SQL twin."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)),
            r"^www\.",
            "",
        ),
        r":(80|443)$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1),
        r"/$",
        "",
    )
    q = F.regexp_extract(c, r"\?([^#]*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda x: (x != "") & ~x.rlike("^(utm_[^=]*|fbclid|gclid)="),
            )
        ),
        "&",
    )
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` (expression fragment)."""
    host = (
        "regexp_replace(regexp_replace(lower(regexp_extract("
        f"{expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), "
        "'^www\\.', ''), ':(80|443)$', '')"
    )
    path = (
        f"regexp_replace(regexp_extract({expr}, "
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/$', '')"
    )
    q = f"regexp_extract({expr}, '\\?([^#]*)', 1)"
    kept = (
        "array_to_string(list_sort(list_filter(string_split("
        f"{q}, '&'), x -> x != '' AND NOT regexp_matches(x, "
        "'^(utm_[^=]*|fbclid|gclid)='))), '&')"
    )
    return (
        f"'https://' || {host} || {path} || "
        f"CASE WHEN {kept} != '' THEN '?' || {kept} ELSE '' END"
    )


def char_gini(
    df, id_col: str, text_col: str
):
    """Per-document character-distribution Gini impurity:
    ``1 − Σ_c (cnt_c/n)²`` — the no-logarithm entropy proxy (low value
    = one character dominates = repetition/garbage; high = diverse
    text).  A standard cheap quality signal next to length/stopword
    ratios, chosen over Shannon entropy because libm ``log`` is not
    bit-portable across engines while ``Σ cnt²`` is exact integer
    arithmetic with ONE final IEEE division.

    Plan: split-to-chars explode (scan-side array op), a per-(doc,
    char) count — map-combinable, shuffle rows bounded by |alphabet|
    per doc — then one per-doc roll-up.

    Returns (id, n_chars_counted, sum_sq, gini) where
    ``gini = 1 − sum_sq/n²`` via exact BIGINTs.
    """
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    # per-CHARACTER explode is the largest fanout in the suite —
    # spread the narrow doc scan across slots first, like every other
    # text/corpus explode operator
    chars = rebalance_for_fanout(df, multiplier=64.0).select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(_c(text_col), "")).alias("__ch"),
    ).filter(F.col("__ch") != "")
    per_char = chars.groupBy("__id", "__ch").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return (
        per_char.groupBy("__id")
        .agg(
            F.sum("__c").cast("bigint").alias("n_chars_counted"),
            F.sum(F.col("__c") * F.col("__c")).cast("bigint").alias("sum_sq"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_chars_counted",
            "sum_sq",
            (
                F.lit(1.0)
                - F.col("sum_sq").cast("double")
                / (F.col("n_chars_counted") * F.col("n_chars_counted")).cast(
                    "double"
                )
            ).alias("gini"),
        )
    )


def char_gini_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin: string_split_regex('') spells char explosion."""
    return f"""
WITH chars AS (
  SELECT {id_col} AS id, c.ch
  FROM (SELECT {id_col}, string_split_regex({text_col}, '') AS cl FROM {table}) s,
       LATERAL UNNEST(s.cl) AS c(ch)
  WHERE c.ch != ''
),
per_char AS (
  SELECT id, ch, COUNT(*) AS c FROM chars GROUP BY id, ch
)
SELECT id AS {id_col},
       CAST(SUM(c) AS BIGINT) AS n_chars_counted,
       CAST(SUM(c * c) AS BIGINT) AS sum_sq,
       1.0 - CAST(SUM(c * c) AS BIGINT)::DOUBLE
           / (CAST(SUM(c) AS BIGINT) * CAST(SUM(c) AS BIGINT))::DOUBLE AS gini
FROM per_char GROUP BY id
"""


def tokenizer_fertility(df, group_col: str, text_col: str):
    """Per-group tokenizer fertility: subword tokens emitted per
    whitespace word (the standard "how expensive is this language for
    the tokenizer" metric — fertility ≫ 1 flags scripts the vocab
    underserves, the signal behind per-language vocab budgeting).

    One map-combinable aggregate of exact BIGINT counters
    (BPE-regex subwords over whitespace words, plus the raw character
    count), fertility = one IEEE division — engine-exact, no shuffle
    beyond the group aggregate.  ``chars_per_token_milli`` (exact
    milli floor division) is the sibling compression read — how many
    characters one subword token buys per language (round-12
    consolidation: this column absorbed the round-11
    ``corpus.tokenizer_fertility`` near-duplicate, which is retired;
    ONE implementation and ONE registered spec measure the metric).

    Degenerate input: a group whose docs contain zero whitespace words
    (n_words = 0) has undefined fertility — both engines emit NULL for
    ``fertility_ppm``/``fertility`` (Spark's ``div`` NULLs on a zero
    divisor while DuckDB's ``//`` raises, so the guard is explicit);
    likewise ``chars_per_token_milli`` is NULL when n_subwords = 0.

    Returns (group, n_docs, n_words, n_subwords, n_chars,
    fertility_ppm, fertility, chars_per_token_milli).
    """
    from pyspark.sql import functions as F

    return (
        df.groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(token_count(text_col)).cast("bigint").alias("n_words"),
            F.sum(bpe_token_count(text_col)).cast("bigint").alias("n_subwords"),
            F.sum(F.length(text_col)).cast("bigint").alias("n_chars"),
        )
        .select(
            group_col,
            "n_docs",
            "n_words",
            "n_subwords",
            "n_chars",
            F.expr(
                "CASE WHEN n_words = 0 THEN CAST(NULL AS BIGINT) ELSE"
                " (n_subwords * CAST(1000000 AS BIGINT)) div n_words END"
            ).alias("fertility_ppm"),
            F.when(
                F.col("n_words") == 0, F.lit(None).cast("double")
            ).otherwise(
                F.col("n_subwords").cast("double") / F.col("n_words").cast("double")
            ).alias("fertility"),
            F.expr(
                "CASE WHEN n_subwords = 0 THEN CAST(NULL AS BIGINT) ELSE"
                " (n_chars * CAST(1000 AS BIGINT)) div n_subwords END"
            ).alias("chars_per_token_milli"),
        )
    )


def tokenizer_fertility_sql(table: str, group_col: str, text_col: str) -> str:
    words = f"len({tokens_sql(text_col)})"
    return f"""
SELECT {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({words}) AS BIGINT) AS n_words,
       CAST(SUM({bpe_token_count_sql(text_col)}) AS BIGINT) AS n_subwords,
       CAST(SUM(length({text_col})) AS BIGINT) AS n_chars,
       CASE WHEN CAST(SUM({words}) AS BIGINT) = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST((CAST(SUM({bpe_token_count_sql(text_col)}) AS BIGINT)
             * CAST(1000000 AS BIGINT))
            // CAST(SUM({words}) AS BIGINT) AS BIGINT) END AS fertility_ppm,
       CASE WHEN CAST(SUM({words}) AS BIGINT) = 0 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(SUM({bpe_token_count_sql(text_col)}) AS BIGINT)::DOUBLE
         / CAST(SUM({words}) AS BIGINT)::DOUBLE END AS fertility,
       CASE WHEN COALESCE(CAST(SUM({bpe_token_count_sql(text_col)})
                               AS BIGINT), 0) = 0
            THEN CAST(NULL AS BIGINT)
            ELSE CAST((CAST(SUM(length({text_col})) AS BIGINT)
             * CAST(1000 AS BIGINT))
            // CAST(SUM({bpe_token_count_sql(text_col)}) AS BIGINT)
              AS BIGINT) END AS chars_per_token_milli
FROM {table} GROUP BY {group_col}
"""


def hapax_stats(df, group_col: str, text_col: str):
    """Per-group lexical-richness report: token/type/hapax counts and
    their exact ppm ratios — hapax legomena (types occurring exactly
    once in the group's corpus) are the standard vocabulary-richness /
    OCR-noise signal a data pipeline tracks per source (a noisy
    scanned source shows a hapax explosion of garbled types; a
    boilerplate farm shows the opposite collapse).

    Relational shape: one explode to (group, token) instances, one
    map-combinable (group, token) count, one group rollup — shuffle
    volume is the distinct (group, token) pairs, never the corpus.
    All counts exact BIGINTs; ratios are integer-ppm ``div`` (NULL on
    an empty group's zero denominator, both engines).

    Returns (group, n_tokens, n_types, n_hapax, hapax_per_type_ppm,
    ttr_ppm) — ttr = types/tokens.
    """
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    tok = rebalance_for_fanout(
        df.select(F.col(group_col).alias("__g"), tokens(text_col).alias("__t")),
        multiplier=16.0,
    ).select("__g", F.explode("__t").alias("__tok"))
    per_type = tok.groupBy("__g", "__tok").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return (
        per_type.groupBy("__g")
        .agg(
            F.sum("__c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr(
                "CASE WHEN n_types = 0 THEN CAST(NULL AS BIGINT) ELSE"
                " (n_hapax * CAST(1000000 AS BIGINT)) div n_types END"
            ).alias("hapax_per_type_ppm"),
            F.expr(
                "CASE WHEN n_tokens = 0 THEN CAST(NULL AS BIGINT) ELSE"
                " (n_types * CAST(1000000 AS BIGINT)) div n_tokens END"
            ).alias("ttr_ppm"),
        )
    )


def hapax_stats_sql(table: str, group_col: str, text_col: str) -> str:
    return f"""
WITH tok AS (
  SELECT {group_col} AS g, unnest({tokens_sql(text_col)}) AS tok
  FROM {table}
),
per_type AS (SELECT g, tok, COUNT(*) AS c FROM tok GROUP BY g, tok),
agg AS (
  SELECT g,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM per_type GROUP BY g
)
SELECT g AS {group_col}, n_tokens, n_types, n_hapax,
       CASE WHEN n_types = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST((n_hapax * CAST(1000000 AS BIGINT)) // n_types
                      AS BIGINT) END AS hapax_per_type_ppm,
       CASE WHEN n_tokens = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST((n_types * CAST(1000000 AS BIGINT)) // n_tokens
                      AS BIGINT) END AS ttr_ppm
FROM agg
"""


def ttr_curve(df, group_col: str, text_col: str, prefixes=(16, 64, 256)):
    """Type-token-ratio curve at fixed per-document prefix lengths —
    the length-controlled vocabulary-diversity probe (raw TTR falls
    with document length, so pipelines compare TTR at FIXED prefix
    sizes; a flat curve across prefixes flags template/boilerplate
    sources, a steep one natural text).

    Per document: distinct-type count within the first ``N`` tokens
    for each N in ``prefixes`` — pure scan-side array expressions
    (slice + array_distinct), no explode, no shuffle beyond the final
    group rollup of exact integer sums.  Per group it reports, for
    each N, Σ types-in-prefix and Σ min(tokens, N), and their ppm
    ratio — a micro-averaged TTR@N.

    Returns (group, n_docs, then per N: tokens_atN, types_atN,
    ttr_atN_ppm).
    """
    from pyspark.sql import functions as F

    base = df.select(
        F.col(group_col).alias("__g"), tokens(text_col).alias("__t")
    )
    cols = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    for n in prefixes:
        cols.append(
            F.sum(F.least(F.size("__t"), F.lit(n)))
            .cast("bigint")
            .alias(f"tokens_at{n}")
        )
        cols.append(
            F.sum(F.size(F.array_distinct(F.slice("__t", 1, n))))
            .cast("bigint")
            .alias(f"types_at{n}")
        )
    out = base.groupBy("__g").agg(*cols)
    sel = [F.col("__g").alias(group_col), "n_docs"]
    for n in prefixes:
        sel += [
            f"tokens_at{n}",
            f"types_at{n}",
            F.expr(
                f"CASE WHEN tokens_at{n} = 0 THEN CAST(NULL AS BIGINT) ELSE"
                f" (types_at{n} * CAST(1000000 AS BIGINT)) div tokens_at{n} END"
            ).alias(f"ttr_at{n}_ppm"),
        ]
    return out.select(*sel)


def ttr_curve_sql(
    table: str, group_col: str, text_col: str, prefixes=(16, 64, 256)
) -> str:
    t = tokens_sql(text_col)
    aggs = []
    outs = []
    for n in prefixes:
        aggs.append(
            f"CAST(SUM(LEAST(len(tl), {n})) AS BIGINT) AS tokens_at{n}"
        )
        aggs.append(
            "CAST(SUM(len(list_distinct(list_slice(tl, 1, "
            f"{n})))) AS BIGINT) AS types_at{n}"
        )
        outs.append(f"tokens_at{n}")
        outs.append(f"types_at{n}")
        outs.append(
            f"CASE WHEN tokens_at{n} = 0 THEN CAST(NULL AS BIGINT)"
            f" ELSE CAST((types_at{n} * CAST(1000000 AS BIGINT))"
            f" // tokens_at{n} AS BIGINT) END AS ttr_at{n}_ppm"
        )
    return f"""
WITH base AS (SELECT {group_col} AS g, {t} AS tl FROM {table}),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs, {", ".join(aggs)}
  FROM base GROUP BY g
)
SELECT g AS {group_col}, n_docs, {", ".join(outs)}
FROM agg
"""


def charclass_profile(df, group_col: str, text_col: str):
    """Per-group character-class census: what fraction of a source's
    bytes are letters, digits, whitespace, CJK, or "other" (symbols,
    accents, control chars) — the script/garbage profile a multilingual
    corpus build watches per source (an "en" source whose other_ppm
    spikes is mojibake or markup; a "zh" source with low cjk_ppm is
    mislabeled).

    Pure scan-side counting: each class count is one
    ``length - length(regexp_replace(...))`` over character classes
    Java regex and DuckDB's RE2 treat identically (explicit ranges,
    no named classes), summed map-combinably per group.  All counts
    exact BIGINTs; ratios integer-ppm ``div`` of total chars (NULL on
    an empty group's zero denominator, both engines).

    Returns (group, n_docs, total_chars, letter_ppm, digit_ppm,
    space_ppm, cjk_ppm, other_ppm).
    """

    def _cnt(cls: str):
        c = _c(text_col)
        return F.length(c) - F.length(F.regexp_replace(c, cls, ""))

    agg = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length(_c(text_col))).cast("bigint").alias("total_chars"),
        F.sum(_cnt("[A-Za-z]")).cast("bigint").alias("__letters"),
        F.sum(_cnt("[0-9]")).cast("bigint").alias("__digits"),
        F.sum(_cnt(r"[ \t\n\r]")).cast("bigint").alias("__spaces"),
        F.sum(_cnt(CJK_CLASS)).cast("bigint").alias("__cjk"),
    )
    ppm = (
        "CASE WHEN total_chars = 0 THEN CAST(NULL AS BIGINT) ELSE"
        " ({n} * CAST(1000000 AS BIGINT)) div total_chars END"
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_docs",
        "total_chars",
        F.expr(ppm.format(n="__letters")).alias("letter_ppm"),
        F.expr(ppm.format(n="__digits")).alias("digit_ppm"),
        F.expr(ppm.format(n="__spaces")).alias("space_ppm"),
        F.expr(ppm.format(n="__cjk")).alias("cjk_ppm"),
        F.expr(
            ppm.format(
                n="(total_chars - __letters - __digits - __spaces - __cjk)"
            )
        ).alias("other_ppm"),
    )


def charclass_profile_sql(table: str, group_col: str, text_col: str) -> str:
    def _cnt(cls: str) -> str:
        return (
            f"length({text_col}) -"
            f" length(regexp_replace({text_col}, '{cls}', '', 'g'))"
        )

    ppm = (
        "CASE WHEN total_chars = 0 THEN CAST(NULL AS BIGINT) ELSE"
        " CAST(({n} * CAST(1000000 AS BIGINT)) // total_chars AS BIGINT) END"
    )
    space_cls = "[ \\t\\n\\r]"
    return f"""
WITH agg AS (
  SELECT {group_col} AS g,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(length({text_col})) AS BIGINT) AS total_chars,
         CAST(SUM({_cnt('[A-Za-z]')}) AS BIGINT) AS letters,
         CAST(SUM({_cnt('[0-9]')}) AS BIGINT) AS digits,
         CAST(SUM({_cnt(space_cls)}) AS BIGINT) AS spaces,
         CAST(SUM({_cnt(CJK_CLASS)}) AS BIGINT) AS cjk
  FROM {table} GROUP BY {group_col}
)
SELECT g AS {group_col}, n_docs, total_chars,
       {ppm.format(n='letters')} AS letter_ppm,
       {ppm.format(n='digits')} AS digit_ppm,
       {ppm.format(n='spaces')} AS space_ppm,
       {ppm.format(n='cjk')} AS cjk_ppm,
       {ppm.format(n='(total_chars - letters - digits - spaces - cjk)')}
         AS other_ppm
FROM agg
"""


def sentence_stats(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-group sentence segmentation profile: sentence counts and
    exact milli-scaled words-per-sentence — the doc-structure signal
    (headline soup vs running prose) a quality pipeline reads next to
    the token stats.

    Segmentation is the portable regex split on terminal punctuation
    runs ``[.!?]+`` (no lookarounds — Java regex and RE2 agree on
    character-class splits).  Fragments are stripped of ALL leading/
    trailing whitespace — an explicit ``[ \\t\\n\\x0B\\f\\r]`` class,
    NOT ``trim()``, which strips only spaces on both engines, so a
    newline-separated sentence would otherwise survive as a phantom
    fragment and split into a phantom empty word — then empties drop;
    a text with no terminal punctuation counts as one sentence.  All
    outputs exact integers: scan-side array expressions, one
    map-combinable aggregate.

    Returns (group, n_docs, n_sentences, n_sentence_words,
    words_per_sentence_milli, max_sentence_words).
    """
    ws = "[ \t\n\x0B\f\r]"
    frags = F.filter(
        F.transform(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.regexp_replace(s, f"^{ws}+|{ws}+$", ""),
        ),
        lambda s: s != F.lit(""),
    )
    words_per = F.transform(
        F.col("__frags"), lambda s: F.size(F.split(s, f"{ws}+"))
    )
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(group_col).alias("__g"), frags.alias("__frags"))
        .select(
            "__g",
            F.greatest(F.size("__frags"), F.lit(1)).cast("bigint").alias(
                "__n_sent"
            ),
            words_per.alias("__wp"),
        )
        .select(
            "__g",
            "__n_sent",
            F.coalesce(
                F.aggregate(
                    "__wp", F.lit(0).cast("bigint"), lambda a, x: a + x
                ),
                F.lit(0),
            ).cast("bigint").alias("__n_words"),
            F.coalesce(F.array_max("__wp"), F.lit(0))
            .cast("bigint")
            .alias("__max_words"),
        )
    )
    return (
        base.groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__n_sent").cast("bigint").alias("n_sentences"),
            F.sum("__n_words").cast("bigint").alias("n_sentence_words"),
            F.max("__max_words").cast("bigint").alias("max_sentence_words"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_docs",
            "n_sentences",
            "n_sentence_words",
            F.expr(
                "(n_sentence_words * CAST(1000 AS BIGINT)) div n_sentences"
            ).alias("words_per_sentence_milli"),
            "max_sentence_words",
        )
    )


def sentence_stats_sql(table: str, group_col: str, text_col: str) -> str:
    # explicit whitespace class (Java \s), 'g' flag so BOTH the
    # leading and the trailing run strip; trim() strips only spaces
    ws = "[ \\t\\n\\x0B\\f\\r]"
    frags = (
        f"list_filter(list_transform(regexp_split_to_array({text_col},"
        f" '[.!?]+'), s -> regexp_replace(s, '^{ws}+|{ws}+$', '', 'g')),"
        " s -> s != '')"
    )
    wp = (
        f"list_transform(frags, s -> len(regexp_split_to_array(s, '{ws}+')))"
    )
    return f"""
WITH base AS (
  SELECT {group_col} AS g, {frags} AS frags
  FROM {table} WHERE {text_col} IS NOT NULL
),
per_doc AS (
  SELECT g,
         CAST(GREATEST(len(frags), 1) AS BIGINT) AS n_sent,
         CAST(COALESCE(list_sum({wp}), 0) AS BIGINT) AS n_words,
         CAST(COALESCE(list_max({wp}), 0) AS BIGINT) AS max_words
  FROM base
)
SELECT g AS {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_sent) AS BIGINT) AS n_sentences,
       CAST(SUM(n_words) AS BIGINT) AS n_sentence_words,
       CAST((SUM(n_words) * CAST(1000 AS BIGINT)) // SUM(n_sent) AS BIGINT)
         AS words_per_sentence_milli,
       CAST(MAX(max_words) AS BIGINT) AS max_sentence_words
FROM per_doc GROUP BY g
"""


def case_profile(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-group letter-case census: uppercase share of letters in
    exact ppm plus the count of SHOUTING documents (more uppercase
    than lowercase letters) — the all-caps spam / headline-soup
    signal the charclass census can't see (it counts letters without
    case).  ASCII classes only, scan-side regex counts, one
    map-combinable aggregate, exact integers throughout.

    Returns (group, n_docs, n_letters, n_upper, upper_ppm,
    n_shouting_docs).
    """
    c = F.col(text_col)
    n_upper = F.length(c) - F.length(F.regexp_replace(c, "[A-Z]", ""))
    n_lower = F.length(c) - F.length(F.regexp_replace(c, "[a-z]", ""))
    return (
        df.filter(c.isNotNull())
        .select(
            F.col(group_col).alias("__g"),
            n_upper.cast("bigint").alias("__u"),
            n_lower.cast("bigint").alias("__l"),
        )
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("__u") + F.col("__l")).cast("bigint").alias(
                "n_letters"
            ),
            F.sum("__u").cast("bigint").alias("n_upper"),
            F.sum((F.col("__u") > F.col("__l")).cast("int"))
            .cast("bigint")
            .alias("n_shouting_docs"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_docs",
            "n_letters",
            "n_upper",
            F.expr(
                "CASE WHEN n_letters = 0 THEN CAST(NULL AS BIGINT)"
                " ELSE (n_upper * CAST(1000000 AS BIGINT)) div n_letters"
                " END"
            ).alias("upper_ppm"),
            "n_shouting_docs",
        )
    )


def case_profile_sql(table: str, group_col: str, text_col: str) -> str:
    up = (
        f"length({text_col}) - length(regexp_replace({text_col},"
        " '[A-Z]', '', 'g'))"
    )
    lo = (
        f"length({text_col}) - length(regexp_replace({text_col},"
        " '[a-z]', '', 'g'))"
    )
    return f"""
WITH per_doc AS (
  SELECT {group_col} AS g,
         CAST({up} AS BIGINT) AS u, CAST({lo} AS BIGINT) AS l
  FROM {table} WHERE {text_col} IS NOT NULL
),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(u + l) AS BIGINT) AS n_letters,
         CAST(SUM(u) AS BIGINT) AS n_upper,
         CAST(SUM(CASE WHEN u > l THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shouting_docs
  FROM per_doc GROUP BY g
)
SELECT g AS {group_col}, n_docs, n_letters, n_upper,
       CASE WHEN n_letters = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST((n_upper * CAST(1000000 AS BIGINT)) // n_letters
                      AS BIGINT) END AS upper_ppm,
       n_shouting_docs
FROM agg
"""


def readability_report(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Per-group Coleman–Liau readability over exact corpus-level
    counts — the grade-level signal a quality pipeline reads next to
    the stopword/length scores, chosen over Flesch because its inputs
    (letters, words, sentences) need no syllable model and count
    identically on any engine.

    Letters are ``[A-Za-z]`` occurrences, words the whitespace tokens,
    sentences the non-empty ``[.!?]+`` fragments with the explicit
    whitespace-class strip (the ``sentence_stats`` conventions; a text
    with no terminal punctuation is one sentence).  Counts sum exactly
    per group; the two Coleman–Liau inputs are floored at milli
    precision (L = letters per 100 words, S = sentences per 100
    words), and the grade is the fixed-order IEEE chain

        cli = 0.0588·(L_milli/1000) − 0.296·(S_milli/1000) − 15.8

    over those exact integers — bit-identical on both engines (single
    mul/div/sub ops on exact inputs, no accumulation).

    Returns (group, n_docs, n_letters, n_words, n_sentences,
    letters_per_100w_milli, sentences_per_100w_milli, cli_grade);
    the ratios and grade are NULL for a wordless group.
    """
    ws = "[ \t\n\x0B\f\r]"
    frags = F.filter(
        F.transform(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.regexp_replace(s, f"^{ws}+|{ws}+$", ""),
        ),
        lambda s: s != F.lit(""),
    )
    letters = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), "[A-Za-z]", "")
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(group_col).alias("__g"),
        letters.cast("bigint").alias("__letters"),
        F.size(tokens(text_col)).cast("bigint").alias("__words"),
        F.greatest(F.size(frags), F.lit(1)).cast("bigint").alias("__sents"),
    )
    agg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__letters").cast("bigint").alias("n_letters"),
        F.sum("__words").cast("bigint").alias("n_words"),
        F.sum("__sents").cast("bigint").alias("n_sentences"),
    )
    lm = F.expr(
        "CASE WHEN n_words > 0 THEN"
        " (n_letters * CAST(100000 AS BIGINT)) div n_words END"
    )
    sm = F.expr(
        "CASE WHEN n_words > 0 THEN"
        " (n_sentences * CAST(100000 AS BIGINT)) div n_words END"
    )
    milli = agg.select(
        F.col("__g").alias(group_col),
        "n_docs",
        "n_letters",
        "n_words",
        "n_sentences",
        lm.cast("bigint").alias("letters_per_100w_milli"),
        sm.cast("bigint").alias("sentences_per_100w_milli"),
    )
    return milli.withColumn(
        "cli_grade",
        F.lit(0.0588)
        * (F.col("letters_per_100w_milli").cast("double") / F.lit(1000.0))
        - F.lit(0.296)
        * (F.col("sentences_per_100w_milli").cast("double") / F.lit(1000.0))
        - F.lit(15.8),
    )


def readability_report_sql(table: str, group_col: str, text_col: str) -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    frags = (
        f"list_filter(list_transform(regexp_split_to_array({text_col},"
        f" '[.!?]+'), s -> regexp_replace(s, '^{ws}+|{ws}+$', '', 'g')),"
        " s -> s != '')"
    )
    return f"""
WITH base AS (
  SELECT {group_col} AS g,
         CAST(length({text_col})
              - length(regexp_replace({text_col}, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS letters,
         CAST(len({tokens_sql(text_col)}) AS BIGINT) AS words,
         CAST(GREATEST(len({frags}), 1) AS BIGINT) AS sents
  FROM {table} WHERE {text_col} IS NOT NULL
),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(letters) AS BIGINT) AS n_letters,
         CAST(SUM(words) AS BIGINT) AS n_words,
         CAST(SUM(sents) AS BIGINT) AS n_sentences
  FROM base GROUP BY g
),
milli AS (
  SELECT *,
         CASE WHEN n_words > 0 THEN
           CAST((n_letters * CAST(100000 AS BIGINT)) // n_words AS BIGINT)
         END AS letters_per_100w_milli,
         CASE WHEN n_words > 0 THEN
           CAST((n_sentences * CAST(100000 AS BIGINT)) // n_words AS BIGINT)
         END AS sentences_per_100w_milli
  FROM agg
)
SELECT g AS {group_col}, n_docs, n_letters, n_words, n_sentences,
       letters_per_100w_milli, sentences_per_100w_milli,
       (0.0588 * (CAST(letters_per_100w_milli AS DOUBLE) / 1000.0))
       - (0.296 * (CAST(sentences_per_100w_milli AS DOUBLE) / 1000.0))
       - 15.8 AS cli_grade
FROM milli
"""


# Markup stripping: tags, entities, and whitespace collapse — kept to
# constructs Java regex and RE2/DuckDB treat identically (no
# lookaround, leftmost-first alternation).  The whitespace run is an
# EXPLICIT class, not ``\s``: Java's ``\s`` includes vertical tab
# (\x0B) while RE2's does not, so a document containing \x0B would
# clean differently on the two engines (round-9 ADVICE).
_TAG_RX = r"<[^>]*>"
_ENTITY_RX = r"&[a-zA-Z]+;|&#[0-9]+;"
_WS_RUN_RX = "[ \\t\\n\\x0B\\f\\r]+"


def strip_markup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Markup removal + cleanup accounting — the first cleaning pass a
    web-scrape corpus goes through: drop ``<...>`` tags, decode-strip
    ``&amp;``-style entities, collapse runs of whitespace, and REPORT
    what was removed per document (chars before/after, tag and entity
    counts) so the pipeline can gate on "this doc was mostly markup".

    Everything is scan-side regex (no explode, no UDF); counts use
    the same patterns as the rewrite so the audit can't drift from
    the transformation.

    Returns (id, clean_text, n_chars_before, n_chars_after, n_tags,
    n_entities).
    """
    c = _c(text_col)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, _TAG_RX, " "),
                _ENTITY_RX, " ",
            ),
            _WS_RUN_RX, " ",
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        cleaned.alias("clean_text"),
        F.length(c).cast("bigint").alias("n_chars_before"),
        F.length(cleaned).cast("bigint").alias("n_chars_after"),
        F.size(F.regexp_extract_all(c, F.lit(_TAG_RX), 0)).cast("bigint")
        .alias("n_tags"),
        F.size(F.regexp_extract_all(c, F.lit(_ENTITY_RX), 0)).cast("bigint")
        .alias("n_entities"),
    )


def strip_markup_sql(source_sql: str, id_col: str, text_col: str) -> str:
    tag = _TAG_RX
    ent = _ENTITY_RX
    cleaned = (
        f"trim(regexp_replace(regexp_replace(regexp_replace({text_col},"
        f" '{tag}', ' ', 'g'), '{ent}', ' ', 'g'), '{_WS_RUN_RX}', ' ', 'g'))"
    )
    return f"""
SELECT {id_col} AS id,
       {cleaned} AS clean_text,
       CAST(length({text_col}) AS BIGINT) AS n_chars_before,
       CAST(length({cleaned}) AS BIGINT) AS n_chars_after,
       CAST(len(regexp_extract_all({text_col}, '{tag}')) AS BIGINT)
         AS n_tags,
       CAST(len(regexp_extract_all({text_col}, '{ent}')) AS BIGINT)
         AS n_entities
FROM ({source_sql})
"""


def sentence_dedup_ratio(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Sentence-level duplication audit — the C4-style cleaning
    signal (boilerplate sentences repeat across pages long before
    whole documents do): segment each document with the SAME portable
    ``[.!?]+`` split as :func:`sentence_stats`, hash each distinct
    sentence, and report per document how many of its sentences also
    appear verbatim in at least one OTHER document.

    Scale shape: scan-side split/explode, one distinct, one
    map-combinable docs-per-sentence count, one equi-join back — the
    exact relational shape of the winnowing audit at sentence
    granularity.  All integers exact.

    Returns (id, n_sentences, n_distinct_sentences,
    n_shared_sentences, shared_ppm) for documents with at least one
    sentence; ``shared_ppm`` is over DISTINCT sentences.
    """
    ws = "[ \t\n\x0B\f\r]"
    frags = F.filter(
        F.transform(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.regexp_replace(s, f"^{ws}+|{ws}+$", ""),
        ),
        lambda s: s != F.lit(""),
    )
    # `frags` is composed INLINE into size() and explode(): aliasing
    # it to a column and filtering/exploding that attribute lets
    # pushdown + InferFiltersFromGenerate duplicate the interpreted
    # filter(transform(...)) expression into per-row Filter nodes
    # (2 extra evaluations inside the single-task scan stage — the
    # r12 shingle-regression mechanism).  The explicit ``size >= 1``
    # filter is redundant: explode() of an empty array emits nothing.
    # (r13: a rebalance_for_fanout here measured slower — see
    # rarity_score.)
    sent = df.select(
        F.col(id_col).alias("__id"),
        F.size(frags).cast("bigint").alias("__n_raw"),
        F.explode(frags).alias("__s"),
    )
    per_doc_sent = sent.select(
        "__id", "__n_raw", F.md5("__s").alias("__h")
    ).distinct()
    hdocs = (
        per_doc_sent.select("__h", "__id").distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__nd"))
    )
    return (
        per_doc_sent.join(hdocs, "__h")
        .groupBy("__id", "__n_raw")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_sentences"),
            F.sum(F.when(F.col("__nd") >= 2, 1).otherwise(0))
            .cast("bigint").alias("n_shared_sentences"),
        )
        .select(
            F.col("__id").alias("id"),
            F.col("__n_raw").alias("n_sentences"),
            "n_distinct_sentences",
            "n_shared_sentences",
            F.expr(
                "CAST((n_shared_sentences * CAST(1000000 AS BIGINT))"
                " div n_distinct_sentences AS BIGINT)"
            ).alias("shared_ppm"),
        )
    )


def sentence_dedup_ratio_sql(table: str, id_col: str, text_col: str) -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    frags = (
        f"list_filter(list_transform(regexp_split_to_array({text_col},"
        f" '[.!?]+'), s -> regexp_replace(s, '^{ws}+|{ws}+$', '', 'g')),"
        " s -> s != '')"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {frags} AS frags FROM {table}
),
sent AS (
  SELECT id, CAST(len(frags) AS BIGINT) AS n_raw, unnest(frags) AS s
  FROM base WHERE len(frags) >= 1
),
per_doc_sent AS (
  SELECT DISTINCT id, n_raw, md5(s) AS h FROM sent
),
hdocs AS (
  SELECT h, COUNT(*) AS nd
  FROM (SELECT DISTINCT h, id FROM per_doc_sent) GROUP BY h
)
SELECT p.id AS id,
       p.n_raw AS n_sentences,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_sentences,
       CAST(SUM(CASE WHEN hdocs.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_sentences,
       CAST((SUM(CASE WHEN hdocs.nd >= 2 THEN 1 ELSE 0 END)
             * CAST(1000000 AS BIGINT)) // COUNT(*) AS BIGINT)
         AS shared_ppm
FROM per_doc_sent p JOIN hdocs ON p.h = hdocs.h
GROUP BY p.id, p.n_raw
"""


def loop_detection(
    df: DataFrame, id_col: str, text_col: str,
    tail_tokens: int = 32, max_period: int = 8,
) -> DataFrame:
    """Degenerate-repetition detector — the filter that catches
    model-GENERATED text stuck in a loop ("the the the", "I'm sorry.
    I'm sorry."), which cross-document dedup misses because the
    repetition is WITHIN one document's tail: over the last
    ``tail_tokens`` tokens, for each candidate period p ≤
    ``max_period``, measure the longest suffix where every token
    equals the token p positions earlier; a loop is declared when
    that run covers at least one full extra period beyond the seed.

    Entirely scan-side array expressions (transform / slice /
    array_position — no explode, no UDF, no join): per row the work
    is O(tail·max_period) with both factors constant.  Ties prefer
    the SHORTEST period (the true loop length; a period-2 loop is
    also periodic at 4 and 6), encoded by packing (loop_len,
    16 − p) into one integer so a single ``greatest`` picks the
    winner.

    Returns (id, n_tokens, loop_period, loop_len, loop_ppm) —
    ``loop_period`` 0 when no loop; ``loop_ppm`` is the looping
    suffix's share of the inspected tail.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    tail = F.when(
        n <= tail_tokens, toks
    ).otherwise(F.slice(toks, -tail_tokens, tail_tokens))
    base = df.select(
        F.col(id_col).alias("id"),
        n.cast("bigint").alias("n_tokens"),
        tail.alias("__tail"),
    ).filter(F.col("n_tokens") > 0)

    # Per period p: matches[i] = tail[p+i] == tail[i] (1-based); the
    # longest ALL-TRUE SUFFIX of matches is
    #   size − (index of the last false)        [size if never false]
    # computed as array_position(reverse(matches), false) − 1, with
    # array_position's 0 = "no false" case mapping to size.
    def run_len(p: int):
        m = F.expr(
            f"transform(sequence({p} + 1, size(__tail)),"
            f" i -> element_at(__tail, i) = element_at(__tail, i - {p}))"
        )
        first_false_rev = F.array_position(F.reverse(m), F.lit(False))
        return F.when(F.size(m) <= 0, F.lit(0)).otherwise(
            F.when(first_false_rev == 0, F.size(m)).otherwise(
                (first_false_rev - 1).cast("int")
            )
        )

    # Outer CASE guards docs shorter than the period: sequence(p+1,
    # size) DESCENDS when p+1 > size (unlike DuckDB generate_series,
    # which returns empty), driving element_at out of bounds under
    # ANSI.  CASE branches evaluate lazily, so the descending sequence
    # is never built for short docs; the oracle's empty-list path
    # yields run_len = 0 → score 0, matched here by the otherwise(0).
    scores = [
        F.when(
            F.size("__tail") > p,
            F.when(
                run_len(p) >= p,  # one full extra period beyond seed
                (run_len(p) + F.lit(p)) * 16 + F.lit(16 - p),
            ).otherwise(F.lit(0)),
        ).otherwise(F.lit(0))
        for p in range(1, max_period + 1)
    ]
    scored = base.withColumn("__best", F.greatest(*scores))
    tail_n = F.least(F.col("n_tokens"), F.lit(tail_tokens))
    return scored.select(
        "id",
        "n_tokens",
        F.when(F.col("__best") > 0, 16 - F.col("__best") % 16)
        .otherwise(0).cast("bigint").alias("loop_period"),
        F.expr("CAST(__best div 16 AS BIGINT)").alias("loop_len"),
        F.expr(
            f"CAST((CAST(__best div 16 AS BIGINT)"
            f" * CAST(1000000 AS BIGINT))"
            f" div LEAST(n_tokens, {tail_tokens}) AS BIGINT)"
        ).alias("loop_ppm"),
    )


def loop_detection_sql(
    table: str, id_col: str, text_col: str,
    tail_tokens: int = 32, max_period: int = 8,
) -> str:
    def run_len(p: int) -> str:
        m = (
            f"list_transform(generate_series({p} + 1, len(tail)),"
            f" i -> list_extract(tail, i) = list_extract(tail, i - {p}))"
        )
        # list_position returns 0 for "not found" (same convention as
        # Spark's array_position) — 0 means the tail is fully periodic.
        return (
            f"(CASE WHEN len({m}) <= 0 THEN 0"
            f" WHEN COALESCE(list_position(list_reverse({m}), false), 0)"
            f"   = 0 THEN len({m})"
            f" ELSE list_position(list_reverse({m}), false) - 1 END)"
        )

    scores = ", ".join(
        f"(CASE WHEN {run_len(p)} >= {p}"
        f" THEN ({run_len(p)} + {p}) * 16 + {16 - p} ELSE 0 END)"
        for p in range(1, max_period + 1)
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CASE WHEN len(t) <= {tail_tokens} THEN t
              ELSE t[len(t) - {tail_tokens} + 1 : len(t)] END AS tail
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS t FROM {table})
  WHERE len(t) > 0
),
scored AS (
  SELECT id, n_tokens, GREATEST({scores}) AS best
  FROM base
)
SELECT id, n_tokens,
       CAST(CASE WHEN best > 0 THEN 16 - best % 16 ELSE 0 END AS BIGINT)
         AS loop_period,
       CAST(best // 16 AS BIGINT) AS loop_len,
       CAST((best // 16 * CAST(1000000 AS BIGINT))
            // LEAST(n_tokens, {tail_tokens}) AS BIGINT) AS loop_ppm
FROM scored
"""


# Unicode-script character classes as LITERAL range characters (the
# Python source embeds the actual codepoints), so Java regex (Spark)
# and RE2 (DuckDB) read the identical class — neither engine's escape
# syntax appears in the pattern.  Whitespace is the explicit
# [ \t\n\x0B\f\r] class (Java \s includes \x0B, RE2's does not).
_SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("latin", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("space", "[ \t\n\x0B\f\r]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("cjk", "[一-鿿]"),
    ("arabic", "[؀-ۿ]"),
]


def script_profile(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Unicode-script composition per group — the pre-language-ID
    screen a multilingual corpus census runs first (a "lang = en" doc
    that is 40% Cyrillic is mislabeled; a CJK share tells you whether
    whitespace tokenization applies at all).  Character counts per
    script class via ``length(s) − length(regexp_replace(s, class,
    ''))`` — scan-side, no explode; per-group shares in exact ppm of
    total characters; ``other`` is the exact remainder.

    Scale shape: one map-combinable aggregate; output bounded by the
    group count.

    Returns (group, n_chars, latin_ppm, digit_ppm, space_ppm,
    cyrillic_ppm, greek_ppm, cjk_ppm, arabic_ppm, other_ppm) ordered
    by group.
    """
    return script_profile_from_counts(
        script_profile_counts(df, group_col, text_col), group_col
    )


#: Per-group BIGINT counter columns of the script-profile build path
#: (the streaming twin's fold state) — exact sums, so folding
#: per-batch partials with + reproduces the batch aggregate exactly.
SCRIPT_PROFILE_COUNTERS: list[str] = ["n_chars"] + [
    f"__{name}" for name, _ in _SCRIPT_CLASSES
]


def script_profile_counts(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """The map-combinable half of :func:`script_profile`: per-group
    character totals and per-script counts (columns
    ``SCRIPT_PROFILE_COUNTERS``, group aliased ``__g``).  Shared by
    the batch operator and the streaming twin
    (``streaming/script.py``), which folds these rows by exact BIGINT
    addition."""
    cnt = {
        name: F.sum(
            (F.length(text_col)
             - F.length(F.regexp_replace(F.col(text_col), cls, "")))
            .cast("bigint")
        ).alias(f"__{name}")
        for name, cls in _SCRIPT_CLASSES
    }
    return df.filter(F.col(text_col).isNotNull()).groupBy(
        F.col(group_col).alias("__g")
    ).agg(
        F.sum(F.length(text_col).cast("bigint")).alias("n_chars"),
        *cnt.values(),
    )


def script_profile_from_counts(
    agg: DataFrame, group_col: str
) -> DataFrame:
    """The exact-division tail of :func:`script_profile` over a
    counter relation shaped like :func:`script_profile_counts`."""
    known = " + ".join(f"__{name}" for name, _ in _SCRIPT_CLASSES)
    ppm = [
        F.expr(
            f"CASE WHEN n_chars > 0 THEN"
            f" (__{name} * CAST(1000000 AS BIGINT)) div n_chars"
            f" ELSE 0 END"
        ).cast("bigint").alias(f"{name}_ppm")
        for name, _ in _SCRIPT_CLASSES
    ]
    return agg.select(
        F.col("__g").alias(group_col),
        "n_chars",
        *ppm,
        F.expr(
            f"CASE WHEN n_chars > 0 THEN"
            f" ((n_chars - ({known})) * CAST(1000000 AS BIGINT))"
            f" div n_chars ELSE 0 END"
        ).cast("bigint").alias("other_ppm"),
    ).orderBy(group_col)


def script_profile_sql(table: str, group_col: str, text_col: str) -> str:
    cnt = ",\n         ".join(
        f"CAST(SUM(length({text_col})"
        f" - length(regexp_replace({text_col}, '{cls}', '', 'g')))"
        f" AS BIGINT) AS c_{name}"
        for name, cls in _SCRIPT_CLASSES
    )
    known = " + ".join(f"c_{name}" for name, _ in _SCRIPT_CLASSES)
    ppm = ",\n       ".join(
        f"CASE WHEN n_chars > 0 THEN"
        f" CAST((c_{name} * CAST(1000000 AS BIGINT)) // n_chars AS BIGINT)"
        f" ELSE 0 END AS {name}_ppm"
        for name, _ in _SCRIPT_CLASSES
    )
    return f"""
WITH agg AS (
  SELECT {group_col} AS g,
         CAST(SUM(length({text_col})) AS BIGINT) AS n_chars,
         {cnt}
  FROM {table} WHERE {text_col} IS NOT NULL GROUP BY 1
)
SELECT g AS {group_col}, n_chars,
       {ppm},
       CASE WHEN n_chars > 0 THEN
         CAST(((n_chars - ({known})) * CAST(1000000 AS BIGINT))
              // n_chars AS BIGINT)
       ELSE 0 END AS other_ppm
FROM agg
ORDER BY g
"""


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document n-gram novelty — the curation signal that ranks
    documents by how much NEW text they contribute to the corpus:
    a shingle's canonical owner is the lowest doc_id containing it
    (deterministic, order-free); a document's novelty is the share of
    its distinct k-shingles it owns.  Boilerplate-heavy docs score
    near 0; the corpus's first copy of any passage scores it.

    Scale shape: the distinct (doc, shingle) relation, one
    min-aggregate per shingle (map-combinable), one equi-join back,
    one per-doc aggregate — linear end to end, the first-seen rewrite
    (``cumulative_distinct`` precedent) applied to shingles.

    Docs with fewer than ``k`` tokens have no shingles and drop.
    Returns (id, n_shingles, n_novel, novelty_ppm).
    """
    from gis_city_county_spark.operators.dedup import shingle_df
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # sh feeds the owner aggregate AND the join back — materialize
    # the scan-side shingle explode once (guide §3.3; r12-before
    # plan of text_ngram_novelty: 8 Exchange / 4 scans)
    sh = _materialize_for_multipass(
        shingle_df(df, id_col, text_col, k, unique_id_rows=True)
    )
    owner = sh.groupBy("shingle").agg(
        F.min(id_col).alias("__owner")
    )
    return (
        sh.join(owner, "shingle")
        .groupBy(F.col(id_col).alias("id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("__owner") == F.col(id_col), 1).otherwise(0)
            ).cast("bigint").alias("n_novel"),
        )
        .select(
            "id",
            "n_shingles",
            "n_novel",
            F.expr(
                "(n_novel * CAST(1000000 AS BIGINT)) div n_shingles"
            ).cast("bigint").alias("novelty_ppm"),
        )
    )


def ngram_novelty_sql(
    table: str, id_col: str, text_col: str, k: int = 3
) -> str:
    from gis_city_county_spark.operators.dedup import shingle_sql

    return f"""
WITH sh AS MATERIALIZED ({shingle_sql(table, id_col, text_col, k)}),
owner AS (
  SELECT shingle, MIN({id_col}) AS owner FROM sh GROUP BY 1
)
SELECT sh.{id_col} AS id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN owner = sh.{id_col} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST((SUM(CASE WHEN owner = sh.{id_col} THEN 1 ELSE 0 END)
             * CAST(1000000 AS BIGINT)) // COUNT(*) AS BIGINT)
         AS novelty_ppm
FROM sh JOIN owner USING (shingle)
GROUP BY 1
"""


# Letter-script classes for the homoglyph audit (literal codepoints —
# see _SCRIPT_CLASSES).
_LETTER_SCRIPTS: list[tuple[str, str]] = [
    ("latin", "[A-Za-z]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
]


def mixed_script_tokens(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Homoglyph / script-spoof audit: tokens mixing letters from two
    or more alphabets ("pаypal" with a Cyrillic а) — the classic
    phishing/SEO-spam signal a crawl-quality gate screens for, and a
    tokenizer-health check (mixed-script tokens explode subword
    vocabularies).  A token is MIXED when it matches at least two of
    the Latin/Cyrillic/Greek letter classes; per group the audit
    reports exact token counts and the mixed share in ppm.

    Scan-side only: one array filter over the token array per row
    (regex per class, literal-codepoint classes Java and RE2 read
    identically), one map-combinable aggregate.

    Returns (group, n_tokens, n_mixed, mixed_ppm) ordered by group.
    """
    toks = tokens(text_col)

    def is_mixed(t):
        lat = t.rlike(_LETTER_SCRIPTS[0][1])
        cyr = t.rlike(_LETTER_SCRIPTS[1][1])
        grk = t.rlike(_LETTER_SCRIPTS[2][1])
        return (lat & cyr) | (lat & grk) | (cyr & grk)

    per_row = df.select(
        F.col(group_col).alias("__g"),
        F.size(toks).cast("bigint").alias("__n"),
        F.size(F.filter(toks, is_mixed)).cast("bigint").alias("__m"),
    )
    return (
        per_row.groupBy("__g")
        .agg(
            F.sum("__n").cast("bigint").alias("n_tokens"),
            F.sum("__m").cast("bigint").alias("n_mixed"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_tokens",
            "n_mixed",
            F.expr(
                "CASE WHEN n_tokens > 0 THEN"
                " (n_mixed * CAST(1000000 AS BIGINT)) div n_tokens"
                " ELSE 0 END"
            ).cast("bigint").alias("mixed_ppm"),
        )
        .orderBy(group_col)
    )


def mixed_script_tokens_sql(table: str, group_col: str, text_col: str) -> str:
    lat, cyr, grk = (c for _, c in _LETTER_SCRIPTS)
    cond = (
        f"(regexp_matches(t, '{lat}') AND regexp_matches(t, '{cyr}'))"
        f" OR (regexp_matches(t, '{lat}') AND regexp_matches(t, '{grk}'))"
        f" OR (regexp_matches(t, '{cyr}') AND regexp_matches(t, '{grk}'))"
    )
    return f"""
WITH per_row AS (
  SELECT {group_col} AS g,
         CAST(len({tokens_sql(text_col)}) AS BIGINT) AS n,
         CAST(len(list_filter({tokens_sql(text_col)},
                              t -> {cond})) AS BIGINT) AS m
  FROM {table}
)
SELECT g AS {group_col},
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(m) AS BIGINT) AS n_mixed,
       CASE WHEN SUM(n) > 0 THEN
         CAST((SUM(m) * CAST(1000000 AS BIGINT)) // SUM(n) AS BIGINT)
       ELSE 0 END AS mixed_ppm
FROM per_row
GROUP BY g
ORDER BY g
"""


# C0 control characters minus \t \n \r (legitimate whitespace) — the
# class is spelled with explicit \xHH escapes interpreted by the REGEX
# engines (Java and RE2 agree on \xHH), never by the SQL parser.
_CTRL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
# Classic UTF-8-read-as-Latin-1 signatures: 'Ã' starts every mangled
# 2-byte sequence (Ã©, Ã¼, Ã±...), 'â€' every mangled punctuation
# (â€™, â€œ, â€").  Literal substrings — no regex dialect involved.
_MOJIBAKE_A = "Ã"
_MOJIBAKE_B = "â€"
_REPLACEMENT = "�"


def encoding_anomaly(df, group_col: str, text_col: str):
    """Per-group encoding-damage census — the corpus-quality screen
    that catches what language-ID and quality scores miss: mojibake
    (UTF-8 decoded as Latin-1: 'Ã©', 'â€™'), U+FFFD replacement
    characters (a decoder already gave up upstream), and C0 control
    characters (binary junk in "text").  A source with a few percent
    of damaged docs usually means a broken extraction stage, and the
    damage poisons tokenizers downstream — these docs should be
    repaired or dropped BEFORE dedup (mojibake breaks shingle
    matching against the clean twin of the same document).

    Engine-exact by construction: mojibake and replacement flags are
    literal-substring CONTAINS tests (no regex dialect), the control
    count is length-minus-stripped with an explicit ``\\xHH`` class
    both Java regex and RE2 read identically (the ``\\s``-dialect
    lesson), and rates are BIGINT ppm floor divisions.  NULL texts
    count toward n_docs but set no flags (documented contract).

    Scale shape: entirely scan-side — one map-combinable aggregate,
    no joins, no windows.

    Returns (group, n_docs, replacement_docs, mojibake_docs,
    ctrl_char_total, replacement_doc_ppm, mojibake_doc_ppm) ordered
    by group.
    """
    return encoding_anomaly_from_counts(
        encoding_anomaly_counts(df, group_col, text_col), group_col
    )


#: Per-group BIGINT counter columns of the encoding-census build path
#: (the streaming twin's fold state) — all additive, so folding
#: per-batch partials with + reproduces the batch aggregate exactly.
ENCODING_ANOMALY_COUNTERS: list[str] = [
    "n_docs",
    "replacement_docs",
    "mojibake_docs",
    "ctrl_char_total",
]


def encoding_anomaly_counts(df, group_col: str, text_col: str):
    """The map-combinable half of :func:`encoding_anomaly`: per-group
    doc totals and damage counters (columns
    ``ENCODING_ANOMALY_COUNTERS``).  Shared by the batch operator and
    the streaming twin (``streaming/encoding.py``)."""
    flag_repl = F.when(
        F.col(text_col).contains(_REPLACEMENT), 1
    ).otherwise(0)
    flag_moji = F.when(
        F.col(text_col).contains(_MOJIBAKE_A)
        | F.col(text_col).contains(_MOJIBAKE_B),
        1,
    ).otherwise(0)
    ctrl = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), _CTRL_CLASS, "")
    )
    return df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(flag_repl).cast("bigint").alias("replacement_docs"),
        F.sum(flag_moji).cast("bigint").alias("mojibake_docs"),
        F.coalesce(F.sum(ctrl), F.lit(0)).cast("bigint")
        .alias("ctrl_char_total"),
    )


def encoding_anomaly_from_counts(agg, group_col: str):
    """The exact-division tail of :func:`encoding_anomaly` over a
    counter relation shaped like :func:`encoding_anomaly_counts`."""
    return (
        agg
        .select(
            group_col,
            "n_docs",
            "replacement_docs",
            "mojibake_docs",
            "ctrl_char_total",
            F.expr(
                "CASE WHEN n_docs > 0 THEN"
                " (replacement_docs * CAST(1000000 AS BIGINT)) div n_docs"
                " ELSE 0 END"
            ).cast("bigint").alias("replacement_doc_ppm"),
            F.expr(
                "CASE WHEN n_docs > 0 THEN"
                " (mojibake_docs * CAST(1000000 AS BIGINT)) div n_docs"
                " ELSE 0 END"
            ).cast("bigint").alias("mojibake_doc_ppm"),
        )
        .orderBy(group_col)
    )


def encoding_anomaly_sql(table: str, group_col: str, text_col: str) -> str:
    # DuckDB regexp_replace needs the 'g' flag (first-match-only by
    # default, unlike Spark's replace-all).
    return f"""
SELECT {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN position('{_REPLACEMENT}' IN {text_col}) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS replacement_docs,
       CAST(SUM(CASE WHEN position('{_MOJIBAKE_A}' IN {text_col}) > 0
                       OR position('{_MOJIBAKE_B}' IN {text_col}) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS mojibake_docs,
       CAST(COALESCE(SUM(length({text_col})
             - length(regexp_replace({text_col},
                      '{_CTRL_CLASS}', '', 'g'))), 0) AS BIGINT)
         AS ctrl_char_total,
       CASE WHEN COUNT(*) > 0 THEN
         CAST((SUM(CASE WHEN position('{_REPLACEMENT}' IN {text_col}) > 0
                        THEN 1 ELSE 0 END) * CAST(1000000 AS BIGINT))
              // COUNT(*) AS BIGINT)
       ELSE 0 END AS replacement_doc_ppm,
       CASE WHEN COUNT(*) > 0 THEN
         CAST((SUM(CASE WHEN position('{_MOJIBAKE_A}' IN {text_col}) > 0
                          OR position('{_MOJIBAKE_B}' IN {text_col}) > 0
                        THEN 1 ELSE 0 END) * CAST(1000000 AS BIGINT))
              // COUNT(*) AS BIGINT)
       ELSE 0 END AS mojibake_doc_ppm
FROM {table}
GROUP BY {group_col}
ORDER BY {group_col}
"""
