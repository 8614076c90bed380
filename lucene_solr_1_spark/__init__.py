"""lucene_solr_1_spark — a PySpark-native full-text indexing + BM25 engine.

A from-scratch reimplementation of the indexing and query core of Apache
Lucene (reference: tflobbe/lucene-solr-1 at /root/reference), re-expressed
idiomatically on Spark DataFrames + vectorized Arrow/pandas UDFs:

- analysis chain (StandardTokenizer-like tokenize, lowercase, stop filter)
- partition-parallel segment builds (posting lists, FOR block compression,
  block-max impact metadata, SmallFloat norms)
- tiered segment merging with docID rebasing
- document-at-a-time BM25 top-k search with block-max WAND pruning
- a pure-SQL relational BM25 path (Catalyst-optimized) used for oracles

plus large-scale training-data pipeline operators (dedup, similarity
search, text stats) over plain DataFrames.
"""

__version__ = "0.1.0"
