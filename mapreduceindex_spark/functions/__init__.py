from mapreduceindex_spark.functions.text import (  # noqa: F401
    normalize_token,
    stable_hash64,
    tokenize,
    words,
)
from mapreduceindex_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
