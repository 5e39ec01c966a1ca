"""Pure ``DataFrame -> DataFrame`` operators.

Modules group the engine's operator inventory (SURVEY.md §2):

  * ``projection``  — silver-curation scalar ops (trim/lower/concat_ws/cast)
  * ``quality``     — single-pass data-quality gate
  * ``aggregates``  — hash aggregation, rollup/cube, date_trunc & tumbling
  * ``joins``       — equi / outer / semi / anti / star joins
  * ``windows``     — ranking & running-sum window functions, top-k
  * ``setops``      — distinct, union, intersect, except
  * ``semistructured`` — JSON extraction, array ops
  * ``dedup``       — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
  * ``similarity``  — cosine top-k, LSH-bucketed ANN, embedding near-dup
  * ``text``        — text stats, language ID, token counts, fingerprints
  * ``multimodal``  — binary-column (image/audio) plumbing
"""
