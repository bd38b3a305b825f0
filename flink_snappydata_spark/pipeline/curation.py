"""End-to-end corpus curation: the engine's flagship LLM-data pipeline.

Composes the individual operators this package provides into the
standard pre-training curation flow:

1. exact dedup (one representative per distinct text, copy count kept);
2. quality filtering (word stats / punctuation ratio gates);
3. language ID (keyword-hit heuristic);

returning one row per surviving document with its curation metadata.
Downstream, :func:`flink_snappydata_spark.pipeline.sampling.hash_split`
assigns train/val/test, and the near-dup passes
(:mod:`flink_snappydata_spark.pipeline.dedup`) remove fuzzier copies —
both are separate declared queries.

Scale: dedup is one digest-keyed shuffle; quality and langid are pure
column expressions (no shuffle); the final joins are on doc_id —
Catalyst plans broadcast or shuffle joins by size. Nothing here is
quadratic or driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_snappydata_spark.pipeline.dedup import exact_dedup
from flink_snappydata_spark.pipeline.text import language_id, quality_scores


def curation_pipeline(documents: DataFrame) -> DataFrame:
    """(doc_id, n_copies, pred_lang, n_words) for every document that
    survives dedup + quality gates."""
    reps = exact_dedup(documents).select("doc_id", "n_copies")
    quality = quality_scores(documents).select("doc_id", "n_words", "keep")
    lang = language_id(documents).select("doc_id", "pred_lang")
    return (
        reps.join(quality, "doc_id")
        .join(lang, "doc_id")
        .filter(F.col("keep"))
        .select("doc_id", "n_copies", "pred_lang", "n_words")
        .orderBy("doc_id")
    )
