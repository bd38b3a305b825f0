"""Large-scale training-data pipeline operators (north star, beyond the
reference surface — SURVEY.md §2.9 "North-star additions").

Modules: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity (brute-force + bucketed ANN), text
(language-ID, quality, token counts, fingerprints), multimodal (binary
columns + typed metadata with stubbed codecs).

Design rule: everything is expressed over DataFrames with JVM built-ins
where possible; Python appears only as Arrow-batched pandas UDFs for
genuinely non-relational kernels (shingling, numpy linear algebra),
and every candidate-generation step is sub-quadratic (LSH banding,
bucketed blocking) so the operator survives 100 TB.
"""
