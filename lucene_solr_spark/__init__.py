"""lucene_solr_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch rebuild of the observable semantics of Apache Lucene/Solr
(reference: /root/reference, Lucene 6.0.0-SNAPSHOT) on Spark DataFrames:

- Arrow-vectorized analysis chain (StandardAnalyzer subset:
  tokenize -> lowercase -> stopwords, reference
  lucene/analysis/common/.../standard/StandardAnalyzer.java:83-97).
- Segment-style inverted-index construction per partition
  (docID-delta VByte blocks of 128, per-block max-score metadata,
  smallfloat-quantized doc-length norms), merged shard-wise with
  skew-aware salting (reference index/DefaultIndexingChain.java,
  codecs/lucene50/Lucene50PostingsFormat.java).
- BM25 top-k query answering (TermQuery / BooleanQuery AND/OR) that is
  rank-identical (docIDs + float32 scores, k1=1.2 b=0.75) to the
  reference semantics (search/similarities/BM25Similarity.java), with
  block-max pruning (Ding & Suel, SIGIR 2011) as an output-identical
  fast path.

Everything is DataFrame-first: Spark SQL/Catalyst orchestrates scans,
pushdown, shuffles and joins; custom logic lives in vectorized
numpy/pandas kernels behind applyInPandas/pandas_udf (never per-row
Python).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128  # reference: Lucene50PostingsFormat.java:398 (BLOCK_SIZE=128)
