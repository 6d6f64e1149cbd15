"""mapreduceindex_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the query/data-processing
capabilities of the reference ``dandominicstaicu/MapReduceIndex`` (a C/Pthreads
MapReduce inverted-index generator; see SURVEY.md), re-expressed Spark-first:

- the flagship **inverted index** pipeline (reference ``src/mapper.c`` /
  ``src/reducer.c`` semantics: whitespace tokenize, ASCII-only normalize,
  per-doc dedup, posting-list aggregation, (df DESC, word ASC) global order,
  per-letter text sink),
- a full relational surface (filters/joins/aggregations/windows/set-ops) over
  the star-schema fixture tables,
- LLM-data-pipeline operators: exact + near-duplicate detection (MinHash-LSH,
  SimHash, n-gram Jaccard, embedding cosine), similarity search, text
  analysis (language ID, quality scoring, token stats, fingerprinting),
- multimodal (binary column) plumbing, and Structured Streaming variants.

Everything is declared through the DataFrame/SQL API so Catalyst/Tungsten
pick the physical strategy; Python UDFs appear only where built-ins cannot
express the semantics (and then always Arrow-vectorized).
"""

__version__ = "0.1.0"

from mapreduceindex_spark.session import get_spark  # noqa: F401
