"""PySpark-native full-text index build + BM25 query engine.

From-scratch re-implementation of the query/data-processing capabilities of
``krickert/solr-sematic-importer`` (reference snapshot at /root/reference,
surveyed in SURVEY.md): a Spark-first inverted-index build over multi-turn
transcript tables plus a BM25 (k1=1.2, b=0.75) top-k query engine, with the
training-data-pipeline operators (dedup, similarity search, text analysis)
a 100 TB corpus needs.

Layout:
  functions/  analyzer chains, Porter stemmer, Lucene BM25 + SmallFloat math
  operators/  docid assignment, index build, posting codec, scoring, dedup,
              similarity, text stats
  sources/    synthetic transcript generator + table readers
  plans/      lineage manifest / resume
  streaming/  incremental build hooks
"""

__version__ = "0.1.0"
