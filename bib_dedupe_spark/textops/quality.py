"""Text analysis for training-data curation: language ID, quality
scoring, token counting, document fingerprinting. Native column
expressions end-to-end (whole-stage codegen; no Python UDFs).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny function-word profiles; enough for a coarse n-gram-free heuristic
LANGUAGE_PROFILES = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "nicht"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
    "it": ("il", "che", "di", "non", "per"),
    "nl": ("het", "een", "van", "niet", "ik"),
    "pt": ("não", "uma", "por", "como", "mais"),
}

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

# a BPE-ish token boundary: word pieces, numbers, or single punctuation
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _membership_count(words_col, vocab: tuple):
    """COUNT of tokens that appear in ``vocab`` (multiset semantics)."""
    return F.size(
        F.filter(
            words_col,
            lambda w: w.isin(*vocab),
        )
    )


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace + regex token counts and length statistics."""
    ws_tokens = F.split(F.col(text_col), r"\s+")
    regex_tokens = F.expr(
        f"regexp_extract_all({text_col}, '{TOKEN_PATTERN}', 0)"
    )
    return df.select(
        F.col(id_col).alias("doc"),
        F.size(ws_tokens).alias("n_ws_tokens"),
        F.size(regex_tokens).alias("n_regex_tokens"),
        F.size(F.array_distinct(ws_tokens)).alias("n_uniq_tokens"),
        F.length(text_col).alias("n_chars"),
        F.aggregate(
            F.transform(ws_tokens, F.length), F.lit(0), lambda a, x: a + x
        ).alias("token_chars"),
    )


def quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style heuristic quality gates: length, stopword density,
    repetition, symbol ratio."""
    words = F.split(F.col(text_col), r"\s+")
    n_tokens = F.size(words)
    n_uniq = F.size(F.array_distinct(words))
    n_stop = _membership_count(words, STOPWORDS)
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    n_chars = F.length(text_col)
    scored = df.select(
        F.col(id_col).alias("doc"),
        n_tokens.alias("n_tokens"),
        (n_uniq / n_tokens).alias("uniq_ratio"),
        (n_stop / n_tokens).alias("stop_ratio"),
        (n_alpha / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        n_chars.alias("n_chars"),
    )
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("uniq_ratio") >= 0.2)
        & (F.col("alpha_ratio") >= 0.6)
    )
    return scored.withColumn("keep", keep)


FUNNEL_GATES = ("too_short", "low_uniq", "low_alpha", "repetitive")


def quality_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """First-failing-gate funnel accounting — the per-shard table a
    training-data filtering pipeline reports.

    Each document is attributed to the FIRST gate it fails (sequential
    funnel semantics: too_short → low_uniq → low_alpha → repetitive) or
    to 'kept'. One projection + one partial-aggregable groupBy; every
    gate is a native column expression (whole-stage codegen), so the
    funnel costs one scan at any corpus size. Returns (gate, n_docs).
    """
    words = F.split(F.col(text_col), r"\s+")
    n_tokens = F.size(words)
    uniq_ratio = F.size(F.array_distinct(words)) / n_tokens
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    alpha_ratio = n_alpha / F.greatest(F.length(text_col), F.lit(1))

    wnz = F.filter(words, lambda w: w != "")
    n_words = F.size(wnz)
    grams = F.when(
        n_words >= ngram,
        F.transform(
            F.sequence(F.lit(0), n_words - ngram),
            lambda i: F.array_join(F.slice(wnz, i + 1, ngram), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_ng = F.size(grams)
    dup_ngram_frac = F.when(
        n_ng > 0, (n_ng - F.size(F.array_distinct(grams))) / n_ng
    ).otherwise(F.lit(0.0))

    gate = (
        F.when(n_tokens < 10, F.lit("too_short"))
        .when(uniq_ratio < 0.2, F.lit("low_uniq"))
        .when(alpha_ratio < 0.6, F.lit("low_alpha"))
        .when(dup_ngram_frac > 0.3, F.lit("repetitive"))
        .otherwise(F.lit("kept"))
    )
    return (
        df.select(gate.alias("gate"))
        .groupBy("gate")
        .agg(F.count("*").alias("n_docs"))
    )


def language_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Coarse language ID: argmax of function-word profile hit counts."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    scores = [
        _membership_count(words, vocab).alias(f"score_{lang}")
        for lang, vocab in LANGUAGE_PROFILES.items()
    ]
    scored = df.select(F.col(id_col).alias("doc"), *scores)
    langs = list(LANGUAGE_PROFILES)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), lang
        ).otherwise(pred)
    return scored.withColumn("predicted_lang", pred)


def fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
) -> DataFrame:
    """Winnowing-style document fingerprints: minimum md5 per hash window
    over word 4-gram rolling shingles (robust to local edits)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - 3, F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at(words, i),
                F.element_at(words, i + 1),
                F.element_at(words, i + 2),
                F.element_at(words, i + 3),
            )
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(grams).alias("pos", "h"),
    )
    return (
        exploded.withColumn("win", F.floor(F.col("pos") / window))
        .groupBy("doc", "win")
        .agg(F.min("h").alias("fingerprint"))
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Gopher-style repetition signals: duplicate-sentence fraction and
    duplicate word-n-gram fraction.

    Boilerplate-heavy or spun web text repeats itself; these two ratios
    are the standard cheap gates. All native expressions — sentence
    split, n-gram construction via transform over index sequence, and
    distinct-counting stay inside whole-stage codegen.
    """
    sentences = F.filter(
        F.transform(
            F.split(F.col(text_col), r"\."), lambda s: F.trim(s)
        ),
        lambda s: s != "",
    )
    n_sent = F.size(sentences)
    dup_sent_frac = F.when(n_sent > 0, (n_sent - F.size(F.array_distinct(sentences))) / n_sent).otherwise(F.lit(0.0))

    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    n_grams = F.when(
        n_words >= ngram,
        F.transform(
            F.sequence(F.lit(0), n_words - ngram),
            lambda i: F.array_join(F.slice(words, i + 1, ngram), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_ng = F.size(n_grams)
    dup_ngram_frac = F.when(
        n_ng > 0, (n_ng - F.size(F.array_distinct(n_grams))) / n_ng
    ).otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col).alias("doc"),
        n_sent.alias("n_sentences"),
        F.round(dup_sent_frac, 6).alias("dup_sentence_frac"),
        n_ng.alias("n_ngrams"),
        F.round(dup_ngram_frac, 6).alias("dup_ngram_frac"),
    )
