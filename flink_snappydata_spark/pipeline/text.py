"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting (north star, SURVEY.md
§2.9).

All but the fingerprint are pure JVM column expressions with exact
integer counts (+ deterministic double ratios), so the DuckDB oracle
reproduces them bit-for-bit. The fingerprint is a numpy rolling hash —
the documented Arrow-batched Python path for a kernel SQL can't express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_snappydata_spark.util import spread

TOKEN_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

#: Distinctive stopwords per language for the n-gram/keyword heuristic.
LANG_KEYWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "to", "of"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "los", "las", "es", "y"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "is", "are", "to", "of", "in"]


def _words(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\W+"), lambda w: w != F.lit(""))


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens + char count per doc."""
    text = F.col("text")
    ws_tokens = F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))
    return documents.select(
        "doc_id",
        F.size(ws_tokens).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.length(text).cast("long").alias("n_chars"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality features: word stats, punctuation and stopword
    ratios, and a keep/drop flag — the standard pre-training filters."""
    text = F.col("text")
    words = _words(text)
    n_words = F.size(words).cast("long")
    n_chars = F.length(text).cast("long")
    word_chars = F.length(F.regexp_replace(F.lower(text), r"\W+", "")).cast("long")
    n_punct = (n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).cast("long")
    mean_wl = word_chars.cast("double") / n_words
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_words
    keep = (
        (n_words >= 5)
        & (mean_wl >= 2.0)
        & (mean_wl <= 12.0)
        & (punct_ratio <= 0.2)
    )
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        keep.alias("keep"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Keyword-hit language ID over {en, fr, de, es}.

    Hit counts use the replace-trick (non-overlapping occurrences of
    ``' kw '`` in the space-padded lowered text) — identical semantics in
    Spark and the SQL oracle. Deterministic argmax with fixed tie order;
    'und' when nothing hits.
    """
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))

    def hits(kw: str) -> Column:
        needle = f" {kw} "
        return (
            (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
            / F.lit(len(needle))
        ).cast("long")

    scores = {
        lang: sum_hits
        for lang, kws in LANG_KEYWORDS.items()
        for sum_hits in [sum((hits(k) for k in kws[1:]), hits(kws[0]))]
    }
    langs = list(LANG_KEYWORDS)
    pred = F.lit("und")
    # reversed fold so earlier languages win ties
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return documents.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )


# --- rolling-hash fingerprint (Python kernel, Arrow-batched) -------------

_B = 257
_M = (1 << 61) - 1
FP_WINDOW = 8


def _fingerprint_series(texts: pd.Series) -> pd.Series:
    import numpy as np

    out = []
    powers = np.array([pow(_B, FP_WINDOW - 1 - j, _M) for j in range(FP_WINDOW)],
                      dtype=object)
    for t in texts:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < FP_WINDOW:
            b = np.pad(b, (0, FP_WINDOW - len(b)))
        wins = np.lib.stride_tricks.sliding_window_view(b, FP_WINDOW)
        # object dtype → python ints → exact modular arithmetic
        hashes = (wins.astype(object) * powers).sum(axis=1) % _M
        out.append(int(hashes.min()))
    return pd.Series(out)


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Winnowing-style fingerprint: min polynomial rolling hash over all
    8-byte windows of the UTF-8 text (mod 2^61-1).

    Python kernel by necessity (per-byte loop), vectorized with numpy and
    Arrow-batched via pandas_udf — the engine's sanctioned slow path.
    """
    fp_udf = F.pandas_udf(_fingerprint_series, "long")
    return spread(documents, "doc_id").select(
        "doc_id", fp_udf(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")
