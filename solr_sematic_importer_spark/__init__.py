"""PySpark-native full-text index build + BM25 query engine.

From-scratch re-implementation of the query/data-processing capabilities of
``krickert/solr-sematic-importer`` (reference snapshot at /root/reference,
surveyed in SURVEY.md): a Spark-first inverted-index build over multi-turn
transcript tables plus a BM25 (k1=1.2, b=0.75) top-k query engine, with the
training-data-pipeline operators (dedup, similarity search, text analysis)
a 100 TB corpus needs.

Layout:
  functions/  analyzer chains (incl. positional), Porter stemmer, synonyms
              (multi-token, config-zip defaults), posting codec, Lucene
              BM25 + SmallFloat math
  operators/  docid assignment, index build (in-memory + single-shuffle
              disk build), block postings + block-max WAND, scoring,
              phrase queries, highlighting, segments/manifest/compaction
              with durable deletes, enrichment, flatten, chunking,
              embeddings (batched UDF + stub registry), dedup
              (exact/minhash-LSH/simhash), similarity search
              (brute/LSH/IVF/HNSW), text stats, multimodal plumbing
  sources/    synthetic transcript generator, TSV/JSON/Solr-envelope
              readers, proto3 wire decoder
  plans/      physical-plan introspection (pushdown/pruning assertions)
  streaming/  incremental (segment-per-micro-batch) build
"""

__version__ = "0.2.0"
