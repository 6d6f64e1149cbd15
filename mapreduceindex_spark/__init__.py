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

# Curated public API: the operators a reference user reaches for first.
# Submodules hold the full surface (see SURVEY.md §2.1 for the map).
from mapreduceindex_spark.operators.corpus import (  # noqa: F401
    split_by_hash,
    training_corpus,
)
from mapreduceindex_spark.operators.dedup import (  # noqa: F401
    dup_spans,
    exact_dedup,
    minhash_lsh_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
    resolve_components,
)
from mapreduceindex_spark.operators.inverted_index import (  # noqa: F401
    index_delete,
    inverted_index,
    merge_index,
    phrase_search,
    reindex_docs,
    search_docs,
)
from mapreduceindex_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
)
from mapreduceindex_spark.operators.text_analysis import (  # noqa: F401
    quality_score,
    tf_idf,
)
from mapreduceindex_spark.session import (  # noqa: F401
    get_spark,
    load_table,
    load_tables,
    register_views,
)
from mapreduceindex_spark.sinks.letter_sink import (  # noqa: F401
    write_letter_files,
)
from mapreduceindex_spark.sources.manifest import (  # noqa: F401
    corpus_from_manifest,
)
