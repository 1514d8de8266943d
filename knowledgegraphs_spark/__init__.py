"""knowledgegraphs_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation (NOT a port) of the data-processing
capabilities of the reference KnowledgeGraphs pipeline
(ChristinaK97/KnowledgeGraphs, surveyed in /root/repo/SURVEY.md):

* rule/ontology-driven row-to-triple mapping over tabular / transcript inputs
  (reference stages B, C, E — ``E_CreateKG/InsertDataRDB.java``),
* embedding-scored entity matching with BES/PJ rank-and-threshold selection
  (reference stage D — ``mapping_prediction.py`` / ``MappingSelection.java``),
* union-find canonicalization over candidate match edges
  (``AAExpansion/source/util/UnionFind.py``),
* deterministic triple materialization with a stable URI scheme
  (``InsertDataRDB.java:116-132``),

re-expressed as idiomatic Spark: declarative DataFrame plans optimized by
Catalyst/AQE, vectorized pandas/Arrow UDFs for the few genuinely non-SQL
kernels, explicit partitioning on ``conv_id``, broadcast joins for the tiny
ontology dims, salted/AQE-skew joins for head-entity skew, and iterative
large-star/small-star connected components for canonicalization.

Layout:
    functions/   pure column-level functions (naming contract, nulls, dates,
                 string similarity, hashing embeddings)
    sources/     readers + deterministic synthetic transcript generation
    operators/   the pipeline's relational/graph operators (PO extraction,
                 mention detection, matching, canonicalization, triple
                 emission, dedup, similarity search, text analysis)
    plans/       staged pipeline runner with checkpoint manifest / resume
    streaming/   structured-streaming ingest (incremental variant)
"""

__version__ = "0.1.0"
