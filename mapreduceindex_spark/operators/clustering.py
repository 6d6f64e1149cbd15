"""Iterative clustering over embedding columns (SURVEY.md EXT2 adjacency;
no reference file:line — the C reference has no vector surface).

Lloyd's k-means as a DataFrame loop: the canonical *iterative* algorithm.
The loop shape — broadcast small model state out, aggregate new state
back — is how every iterative fitted model (k-means, logistic regression,
ALS) runs on Spark: per-iteration data movement is one map pass plus one
k×dim-sized aggregate, never a shuffle of the corpus by cluster.

Exactness (round 4): the whole fit runs in INTEGER micro space so a
DuckDB oracle can replay it bit-for-bit (``_kmeans_sql`` in the entry
module unrolls the loop to ``max_iter`` rounds of plain SQL). Vectors
are quantized once with the tie-free ``exact.micro`` transform
(JVM-side); distances are int64 ``Σ(x−c)²``; centroid updates are BIGINT
sums with explicit round-half-away-from-zero division. No float enters
any comparison or aggregate, so assignment and the final model are
identical across engines, partitionings, and BLAS implementations —
which upgrades the driver-correctness row from rows-only to a full
value-hash match (the last ``no_oracle`` entry in CORRECTNESS_r03).

Scale: assignment AND the centroid-update partial sums happen inside one
Arrow-batched ``mapInPandas`` pass per iteration — each batch emits at
most k rows of (count, Σx per dim), so the per-iteration shuffle carries
``batches×k×dim`` integers (not ``N×dim``), the distributed reduce
returns exactly k·dim rows, and the driver only ever holds model state.
The quantized corpus is persisted once, so iterations never re-scan
parquet or re-run the quantization transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mapreduceindex_spark.functions import caching as _caching

#: single-slot memo of the fitted k-means model keyed
#: ``plan_fingerprint|k|max_iter`` — see fit_kmeans_micro
_KMEANS_MEMO: dict = _caching.scalar_memo({})


def _halfdiv(s: int, n: int) -> int:
    """BIGINT round-half-away-from-zero division — the Python twin of
    ``exact.mean_of_micro`` / the oracle's ``//``-based CASE."""
    return (2 * s + n) // (2 * n) if s >= 0 else -((2 * (-s) + n) // (2 * n))


def fit_kmeans_micro(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 5,
):
    """Run the integer-micro Lloyd's loop; return
    ``(centroids, counts)`` — the k×dim int64 micro centroid matrix and
    the per-centroid member counts under the FINAL model. This is the
    shared fit behind ``kmeans_embeddings`` (reporting) and
    ``similarity.ivf_topk_trained`` (trained ANN cells).

    Deterministic setup: vectors quantize to int64 micro units (tie-free
    half-away ``exact.micro``); centroids initialize to the first ``k``
    quantized vectors (vec_id < k); every assignment minimizes the exact
    integer ``Σ(x−c)²`` and tie-breaks toward the lower centroid id; the
    centroid update is the exact integer mean (half-away division) per
    dimension, empty clusters keeping their previous centroid. Iterating
    past a fixpoint is a no-op, so the SQL oracle replays a fixed
    ``max_iter`` rounds while this loop breaks early — same model.
    """
    import numpy as np
    import pandas as pd

    from mapreduceindex_spark.functions.exact import micro

    # single-slot memo of the fitted model keyed on the input plan's
    # semantic hash + hyperparameters (the _FRONT_STATS discipline: a
    # pure function of the input, k·dim ints of state):
    # kmeans_embeddings and ivf_topk_trained fit the SAME model over
    # the same table — the second fit re-paid max_iter collect jobs.
    fp = f"{_caching.plan_fingerprint(embeddings)}|{k}|{max_iter}"
    hit = _KMEANS_MEMO.get(fp)
    if hit is not None:
        cids_, cents_, counts_ = hit
        return cids_.copy(), cents_.copy(), dict(counts_)

    qvecs = (
        embeddings.select(
            "vec_id",
            F.transform(
                F.col("embedding"), lambda x: micro(x.cast("double"))
            ).alias("e"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    init = qvecs.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    if not init:
        qvecs.unpersist()
        raise ValueError(
            f"fit_kmeans_micro: no seed vectors with vec_id < {k}"
        )
    # centroid IDS are the seed vectors' ACTUAL vec_ids (matching the
    # SQL oracle's `vec_id AS cid`), not list positions — they differ
    # whenever ids below k are sparse or non-zero-based. Rows of
    # `centroids` stay position-indexed internally; cids maps out.
    cids = np.array([r["vec_id"] for r in init], dtype="int64")
    pos_of = {int(c): i for i, c in enumerate(cids)}
    centroids = np.array([r["e"] for r in init], dtype="int64")
    kk, dim = centroids.shape

    def _partials(cents: np.ndarray) -> DataFrame:
        C = cents  # captured by value per iteration
        c_norm2 = (C * C).sum(axis=1)

        def _gen(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                E = np.stack(pdf["e"].to_numpy()).astype("int64")
                # argmin over exact integer distance; ||x||² is
                # row-constant so the argmin needs only −2·x·cᵀ + ||c||²
                # (|x_i|,|c_i| ≤ ~2e6 micro → |Σ| ≤ 64·8e12 ≪ 2⁶³).
                # np.argmin returns the FIRST minimum = lowest cid.
                a = (-2 * (E @ C.T) + c_norm2).argmin(axis=1)
                sums = np.zeros((kk, dim), dtype="int64")
                np.add.at(sums, a, E)
                cnt = np.bincount(a, minlength=kk)
                nz = np.nonzero(cnt)[0]
                yield pd.DataFrame(
                    {
                        "centroid_id": cids[nz],  # actual vec_id cids
                        "n": cnt[nz].astype("int64"),
                        "s": list(sums[nz]),
                    }
                )

        return qvecs.mapInPandas(
            _gen, "centroid_id long, n long, s array<long>"
        )

    def _reduce(cents: np.ndarray):
        """One job: per-batch partials → distributed (cid, dim) reduce →
        k·dim-row model-state collect (bounded at any corpus size)."""
        rows = (
            _partials(cents)
            .select("centroid_id", "n", F.posexplode("s").alias("dim", "x"))
            .groupBy("centroid_id", "dim")
            .agg(F.sum("x").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        counts: dict[int, int] = {}
        nxt = cents.copy()
        for r in rows:
            # n re-sums the batch counts inside every dim group, so any
            # dim row carries the cid's total member count
            counts[r["centroid_id"]] = r["n"]
            nxt[pos_of[r["centroid_id"]], r["dim"]] = _halfdiv(
                r["s"], r["n"]
            )
        return nxt, counts

    counts: dict[int, int] = {}
    converged = False
    for _ in range(max_iter):
        nxt, counts = _reduce(centroids)
        if np.array_equal(nxt, centroids):
            converged = True  # counts already reflect the final model
            break
        centroids = nxt
    if not converged and max_iter > 0:
        # centroids moved on the last round: one more assignment pass for
        # the member counts under the FINAL model (counts only — k rows)
        counts = {
            r["centroid_id"]: r["n"]
            for r in _partials(centroids)
            .groupBy("centroid_id")
            .agg(F.sum("n").alias("n"))
            .collect()
        }
    qvecs.unpersist()
    _KMEANS_MEMO.clear()  # single slot, bounded like the front-end memos
    _KMEANS_MEMO[fp] = (cids.copy(), centroids.copy(), dict(counts))
    return cids, centroids, counts


def kmeans_embeddings(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 5,
) -> DataFrame:
    """Fit k-means (Lloyd, :func:`fit_kmeans_micro`) on the embedding
    column; return per-cluster size plus an L1 fingerprint of the fitted
    centroid.

    Output: (centroid_id, n_members, centroid_l1_micro) per non-empty
    cluster ordered by centroid_id, where centroid_l1_micro = Σ_d |c_d|
    in micro units — pinning the fitted centroid values, not just the
    partition sizes, into the correctness hash.
    """
    import numpy as np

    cids, centroids, counts = fit_kmeans_micro(embeddings, k, max_iter)
    pos_of = {int(c): i for i, c in enumerate(cids)}
    out = [
        (
            int(cid),
            int(counts[cid]),
            int(np.abs(centroids[pos_of[cid]]).sum()),
        )
        for cid in sorted(counts)
    ]
    return embeddings.sparkSession.createDataFrame(
        out, "centroid_id bigint, n_members bigint, centroid_l1_micro bigint"
    )


def embedding_power_iteration(
    embeddings: DataFrame, iters: int = 4
) -> DataFrame:
    """Dominant principal direction of the embedding table (PCA's first
    component) by integer power iteration — the "is there one axis
    explaining most variance" screen run before committing to a
    dimensionality reduction.

    Exactness contract (every step replayed verbatim by the SQL
    oracle): elements quantize with the tie-free signed micro formula;
    the centered covariance numerator is the exact integer
    ``Cn_ij = n·S_ij − S_i·S_j``; all divisions are EXPLICIT truncating
    divisions (sign split + non-negative div, so flooring and
    truncating engines agree); each iteration renormalizes by the L∞
    norm (max |y| — no sqrt, no floats anywhere); ``v₀ = 1e6`` in every
    dimension. Covariance is PSD so the dominant eigenvalue is
    non-negative and the iteration's sign is pinned by v₀.

    Scale shape: the d×d Gram matrix accumulates as per-partition numpy
    partials (one d²-row emission per task — the
    ``embedding_covariance_topk`` pattern, with its int64 overflow
    guard), so the only shuffle is d²-bounded. The iteration itself
    runs driver-side on the collected d² sufficient statistics —
    model-sized state (d=64 → 4096 ints), the same documented bound as
    ``kmeans_embeddings``' k×d collect. Output: d rows
    (dim, component_micro), BIGINT.
    """
    rows = _gram_stats(embeddings).collect()  # d² stats — model-sized
    spark = embeddings.sparkSession
    out_schema = "dim long, component_micro long"
    v = _power_iterate_from_stats(rows, iters)
    if v is None:
        return spark.createDataFrame([], out_schema)
    return spark.createDataFrame(
        [(i, int(v[i])) for i in range(len(v))], out_schema
    ).orderBy("dim")


def _gram_stats(embeddings: DataFrame) -> DataFrame:
    """(i, j, n, s_i, s_ij) exact integer Gram sufficient statistics of
    the signed-micro-quantized embedding table — d²-bounded, built from
    per-partition numpy partials (the only shuffle is d² rows)."""
    import numpy as np
    import pandas as pd

    from mapreduceindex_spark.functions.linalg import accumulate_gram

    schema = "i long, j long, n long, s_i long, s_ij long"

    def _partials(batches):
        gram, sums, n = accumulate_gram(
            batches, "embedding_power_iteration"
        )
        if n == 0:
            return
        d = gram.shape[0]
        ii, jj = np.meshgrid(
            np.arange(d, dtype=np.int64), np.arange(d, dtype=np.int64),
            indexing="ij",
        )
        yield pd.DataFrame(
            {
                "i": ii.ravel(),
                "j": jj.ravel(),
                "n": np.full(d * d, n, dtype=np.int64),
                "s_i": np.repeat(sums, d),
                "s_ij": gram.ravel(),
            }
        )

    agg = (
        embeddings.select("embedding")
        .mapInPandas(_partials, schema)
        .groupBy("i", "j")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s_i").cast("long").alias("s_i"),
            F.sum("s_ij").cast("long").alias("s_ij"),
        )
    )
    return agg


def _power_iterate_from_stats(rows, iters: int) -> list[int] | None:
    """The driver-side integer power iteration over collected
    (i, j, n, s_i, s_ij) sufficient statistics — shared by
    ``embedding_power_iteration`` (emits the component) and
    ``similarity.embedding_pca_projection`` (applies it). Returns the
    component in micro units, or None on an empty table."""
    if not rows:
        return None

    def tdiv(a: int, b: int) -> int:
        # explicit truncating division (Python // floors)
        return a // b if a >= 0 else -((-a) // b)

    # cross-partition ragged-dims check: the per-partition guard can't
    # see other partitions, but raggedness always surfaces here — cells
    # outside the smaller dimensionality accumulate fewer rows, so the
    # merged per-cell n values disagree
    ns = {r["n"] for r in rows}
    if len(ns) != 1:
        raise ValueError(
            "embedding_power_iteration: ragged embedding dims across "
            f"partitions (per-cell row counts {sorted(ns)})"
        )
    n = rows[0]["n"]
    d = max(r["i"] for r in rows) + 1
    s_col = {}
    for r in rows:
        s_col[r["i"]] = r["s_i"]
    # s'_ij = tdiv(n·S_ij − S_i·S_j, n²·1000): covariance numerator
    # rescaled so the 64-term matvec stays far inside BIGINT
    s_small = {}
    den = n * n * 1000
    for r in rows:
        cn = n * r["s_ij"] - s_col[r["i"]] * s_col[r["j"]]
        s_small[(r["i"], r["j"])] = tdiv(cn, den)
    v = [1_000_000] * d
    for _ in range(iters):
        y = [
            sum(s_small[(i, j)] * v[j] for j in range(d)) for i in range(d)
        ]
        m = max(tdiv(max(abs(x) for x in y), 1_000_000), 1)
        v = [tdiv(x, m) for x in y]
    return [int(c) for c in v]


def embedding_pca_projection(
    embeddings: DataFrame, iters: int = 4, bucket_width: int = 10**10
) -> DataFrame:
    """APPLY the fitted first principal direction — the fit→transform
    closure for ``embedding_power_iteration`` (the same loop ``bpe_train``
    → ``bpe_fertility_learned`` closes for the tokenizer): fit the
    integer micro component on the table, project every vector onto it,
    and report the projection HISTOGRAM — the one-axis separability
    readout (bimodal → the corpus has two regimes on its dominant axis).

    Exactness: elements quantize with the same signed micro formula as
    the fit; ``proj = Σ_d x_micro[d] · v_micro[d]`` is exact int64
    (|x|,|v| ≤ ~2e6 micro → |Σ| ≤ 64·4e12 ≪ 2⁶³); buckets are TRUE
    floored division (``exact.floor_div_sql``) so negative projections
    land on their real buckets on both engines. The oracle replays the
    unrolled power iteration (the ``_power_iteration_sql`` prefix) and
    joins the component back — one ground truth, two physical routes
    (numpy Gram partials + driver loop here; element self-join there).

    Scale shape: one d²-bounded stats collect (the fit), then ONE scan
    with the d-length component as literals — no second shuffle beyond
    the bucket-sized histogram aggregate.
    """
    from mapreduceindex_spark.functions.exact import floor_div_sql

    rows = _gram_stats(embeddings).collect()
    v = _power_iterate_from_stats(rows, iters)
    spark = embeddings.sparkSession
    out_schema = (
        "bucket bigint, n_vecs bigint, min_proj bigint, max_proj bigint"
    )
    if v is None:
        return spark.createDataFrame([], out_schema)
    v_arr = F.array(*[F.lit(int(c)).cast("long") for c in v])

    def _q(x):
        xd = x.cast("double")
        return (
            F.when(xd >= 0, F.floor(xd * 1e6 + F.lit(0.5)))
            .otherwise(-F.floor(-xd * 1e6 + F.lit(0.5)))
            .cast("long")
        )

    prods = F.transform(
        F.col("embedding"), lambda x, i: _q(x) * F.element_at(v_arr, i + 1)
    )
    proj = F.aggregate(
        prods, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        embeddings.select(proj.alias("proj"))
        .select(
            F.expr(floor_div_sql("proj", int(bucket_width))).alias(
                "bucket"
            ),
            "proj",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("proj").cast("long").alias("min_proj"),
            F.max("proj").cast("long").alias("max_proj"),
        )
        .orderBy("bucket")
    )


def centroid_classifier(
    embeddings: DataFrame, train_pct: int = 80
) -> DataFrame:
    """Supervised nearest-centroid (Rocchio) classifier over the
    embedding table with a deterministic hash train/test split — the
    model-based curation-filter shape (fit a cheap classifier on weakly
    labeled vectors, score the held-out set, read the confusion matrix
    before trusting it as a corpus gate). The supervised counterpart of
    ``kmeans_embeddings``: same integer-micro geometry, but centroids
    come from the TRAIN labels and quality is measured on held-out rows
    the fit never saw.

    Split: bucket = portable 60-bit md5 hash of the vec_id string mod
    100 (the ``split_by_hash`` formula); train = bucket < ``train_pct``.
    Fit: per (label, dim) FLOORED integer mean of the micro-quantized
    train components (``exact.floor_div_sql`` — any component sign,
    translation-equivariant, the ``label_outliers`` centroid). Predict:
    each held-out vector takes the label of the integer-squared-distance
    argmin over the fitted centroids, ties toward the lower label id.

    Exactness: quantization is the ``label_outliers`` family formula
    (floor(x·1e6 + 0.5), identical text on both engines); distances and
    sums are BIGINT end to end; no float enters any comparison, so fit,
    argmin, and the confusion matrix are bit-identical across engines
    and partitionings.

    Scale shape: one exploded scan aggregates the train centroids
    (|labels|×d rows — model-sized), which broadcast onto a second
    exploded scan of the held-out rows; the per-vector argmin is a
    window partitioned BY vec_id (never a global sort), and the output
    is the |labels|²-bounded confusion matrix. Both scans are one
    shuffle each (hash aggregates); nothing driver-side but the plan.

    Output: (label, predicted, n_vecs, sum_dist2_u) per confusion cell,
    ordered — sum_dist2_u pins the winning distances (hence the fitted
    centroid values) into the correctness hash, not just the cell
    counts.
    """
    from pyspark.sql.window import Window

    from mapreduceindex_spark.functions.exact import floor_div_sql
    from mapreduceindex_spark.functions.text import stable_hash64

    ex = embeddings.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        (stable_hash64(F.col("vec_id").cast("string")) % 100).alias(
            "bucket"
        ),
        F.posexplode("embedding").alias("dim", "_x"),
    ).select(
        "vec_id",
        "label",
        "bucket",
        "dim",
        F.expr(
            "CAST(floor(CAST(_x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        ).alias("_xm"),
    )
    cent = (
        ex.filter(F.col("bucket") < train_pct)
        .groupBy(F.col("label").alias("cand"), "dim")
        .agg(F.expr(floor_div_sql("sum(_xm)", "count(1)", "DIV")).alias("_c"))
    )
    dist = (
        ex.filter(F.col("bucket") >= train_pct)
        .join(F.broadcast(cent), ["dim"])
        .groupBy("vec_id", "label", "cand")
        .agg(
            F.sum((F.col("_xm") - F.col("_c")) * (F.col("_xm") - F.col("_c")))
            .cast("long")
            .alias("dist2_u")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2_u").asc(), F.col("cand").asc()
    )
    return (
        dist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy("label", F.col("cand").alias("predicted"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("dist2_u").cast("long").alias("sum_dist2_u"),
        )
        .orderBy("label", "predicted")
    )


def _exact_knn_neighbors(train: DataFrame, test: DataFrame, k: int) -> DataFrame:
    """(sid, slabel, tid, tlabel) of each test vector's ``k`` nearest
    train vectors under EXACT integer squared distance — the shared
    scoring core of both k-NN classifier tiers.

    Execution: the bounded test side (≤ ``max_query_ids`` rows by the
    callers' construction) collects into the kernel closure as one
    int64 matrix; one ``mapInPandas`` pass over the train side computes
    ``d² = |x|² + |t|² − 2·x·t`` with an int64 numpy matmul — EXACT
    integer arithmetic, bit-identical to the per-pair
    ``aggregate(zip_with(...))`` fold it replaces, which ran
    interpreted (outside codegen) and cost ~8 s at sf0.1's 1600×400
    pair grid vs ~1 s for BLAS. Each batch emits its LOCAL top-k per
    query under the global (d², tid) order — a superset of every
    batch's contribution to the global top-k — and one window settles
    the final ranking over the batches·k·|test|-bounded candidate set.

    Headroom: micro components |v| ≤ ~1e6 give cross terms ≤ d·1e12 and
    d² ≤ 4·d·1e12 — int64-safe to ~10⁵ dimensions.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.window import Window

    spark = train.sparkSession
    schema = "sid long, slabel long, tid long, tlabel long, dist2_u long"
    rows = test.collect()  # bounded by construction (max_query_ids)
    if not rows:
        return spark.createDataFrame([], schema)
    T = np.array([r["sv"] for r in rows], dtype=np.int64)
    sids = np.array([r["sid"] for r in rows], dtype=np.int64)
    slabels = np.array([r["slabel"] for r in rows], dtype=np.int64)
    t_norm2 = (T * T).sum(axis=1)

    def _kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["tv"].to_numpy()).astype(np.int64)
            tids = pdf["tid"].to_numpy()
            tlabels = pdf["tlabel"].to_numpy()
            x_norm2 = (X * X).sum(axis=1)
            d2 = (
                x_norm2[:, None] + t_norm2[None, :] - 2 * (X @ T.T)
            )  # |batch| × |test|, exact int64
            kk = min(k, len(tids))
            out = {c: [] for c in
                   ("sid", "slabel", "tid", "tlabel", "dist2_u")}
            for j in range(len(sids)):
                order = np.lexsort((tids, d2[:, j]))[:kk]
                out["sid"].extend([int(sids[j])] * len(order))
                out["slabel"].extend([int(slabels[j])] * len(order))
                out["tid"].extend(tids[order].tolist())
                out["tlabel"].extend(tlabels[order].tolist())
                out["dist2_u"].extend(d2[order, j].tolist())
            yield pd.DataFrame(out)

    cand = train.mapInPandas(_kernel, schema=schema)
    wk = Window.partitionBy("sid").orderBy(
        F.col("dist2_u").asc(), F.col("tid").asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= k)
        .select("sid", "slabel", "tid", "tlabel", "dist2_u")
    )


def knn_classifier(
    embeddings: DataFrame,
    k: int = 5,
    train_pct: int = 80,
    max_query_ids: int = 2000,
) -> DataFrame:
    """Supervised k-nearest-neighbor classifier over the embedding table
    with the same deterministic hash train/test split as
    ``centroid_classifier`` — the non-parametric counterpart: where
    Rocchio compresses each label to one centroid, k-NN votes the raw
    train neighborhood, so the two confusion matrices bracket how much
    label structure a single prototype loses.

    Predict: each held-out vector takes the majority label of its ``k``
    nearest TRAIN vectors under integer squared distance (micro-
    quantized components, the ``label_outliers`` formula); neighbor
    ties break toward the lower train vec_id, vote ties toward the
    lower label id — a total order, so both engines pick identical
    neighbors and winners.

    Scale shape: this is the exact/calibration tier (the
    ``cosine_topk`` discipline — brute-force scoring IS the oracle
    baseline; ``knn_classifier_ann`` is the IVF-probed production
    path, recall-calibrated against this one). The broadcast query
    side is BOUNDED: held-out vectors restricted to the deterministic
    ``vec_id < max_query_ids`` sample (the ``jl_distortion_report``
    pattern — r09 VERDICT: the full 20% held-out fraction grows with
    the corpus, so the broadcast was a corpus fraction, not a
    constant), so one pass over the train side carries at most
    ``max_query_ids`` query rows regardless of scale. Scoring runs in
    the shared int64-BLAS kernel (``_exact_knn_neighbors`` — exact
    integer arithmetic, one Arrow pass over the train side, ~8× the
    interpreted per-pair fold it replaced); the vote argmax is a
    window partitioned BY query vector — never a global sort; output
    is the |labels|²-bounded confusion matrix.

    Output: (label, predicted, n_vecs, sum_votes) per confusion cell —
    sum_votes (Σ winning vote counts) pins the neighbor sets into the
    correctness hash, not just the argmax.
    """
    from pyspark.sql.window import Window

    from mapreduceindex_spark.functions.text import stable_hash64

    q = embeddings.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        (stable_hash64(F.col("vec_id").cast("string")) % 100).alias(
            "bucket"
        ),
        F.expr(
            "transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
        ).alias("qv"),
    )
    train = q.filter(F.col("bucket") < train_pct).select(
        F.col("vec_id").alias("tid"),
        F.col("label").alias("tlabel"),
        F.col("qv").alias("tv"),
    )
    test = q.filter(
        (F.col("bucket") >= train_pct)
        & (F.col("vec_id") < max_query_ids)
    ).select(
        F.col("vec_id").alias("sid"),
        F.col("label").alias("slabel"),
        F.col("qv").alias("sv"),
    )
    votes = (
        _exact_knn_neighbors(train, test, k)
        .groupBy("sid", "slabel", "tlabel")
        .agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
    )
    wv = Window.partitionBy("sid").orderBy(
        F.col("n_votes").desc(), F.col("tlabel").asc()
    )
    return (
        votes.withColumn("_rw", F.row_number().over(wv))
        .filter(F.col("_rw") == 1)
        .groupBy(F.col("slabel").alias("label"),
                 F.col("tlabel").alias("predicted"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("n_votes").cast("long").alias("sum_votes"),
        )
        .orderBy("label", "predicted")
    )


def knn_classifier_ann(
    embeddings: DataFrame,
    k: int = 5,
    train_pct: int = 80,
    n_centroids: int = 16,
    n_probe: int = 4,
    max_query_ids: int = 2000,
) -> DataFrame:
    """The APPROXIMATE-tier k-NN classifier, recall-calibrated against
    the exact one — the missing twin the r09 VERDICT named: ANN
    retrieval has ``ann_recall_curve``; classification now has this.

    Retrieval: train vectors assign to their nearest of ``n_centroids``
    anchor cells (``vec_id < n_centroids``, the ``ivf_topk`` anchor
    convention) under the SAME integer squared distance as
    ``knn_classifier``; each query probes its ``n_probe`` closest cells
    and votes only among train vectors living there — the IVF plan
    whose 100 TB candidate volume is ``n_probe/n_centroids`` of the
    corpus instead of all of it. Ties: assignment and probe rankings
    break toward the lower cent_id, neighbors toward the lower train
    id, votes toward the lower label — total orders, both engines
    identical.

    Calibration readout (per label): how often the IVF-probed
    prediction AGREES with the exact brute-force one (``n_agree``),
    both tiers' correctness against ground truth, and the NEIGHBOR
    recall of the probed candidate sets against the exact top-k sets —
    ``n_truth`` is the ACTUAL exact-neighbor row count (the
    ``lsh_band_sweep`` denominator discipline), so the ppm is honest
    on short tables. A query whose probed cells hold no train vector
    has no ANN prediction (counted in ``n_vecs`` but not
    ``n_pred_ann``) — the exact-tier join is inner on sid, so both
    engines drop or keep identical rows.

    Scale shape: the query side is the SAME bounded deterministic
    sample as ``knn_classifier`` (≤ ``max_query_ids`` broadcast rows);
    the anchor frame is model-sized and broadcast; the one corpus-scale
    pass is the train→cell assignment (|train|·n_centroids distance
    evaluations, embarrassingly parallel, no shuffle besides the
    assignment window).

    Output: (label, n_vecs, n_pred_ann, n_agree, n_correct_ann,
    n_correct_exact, nbr_overlap, n_truth, nbr_recall_ppm), by label.
    """
    from pyspark.sql.window import Window

    from mapreduceindex_spark.functions.text import stable_hash64

    dist2 = (
        "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, v) -> acc + v)"
    )
    q = embeddings.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        (stable_hash64(F.col("vec_id").cast("string")) % 100).alias(
            "bucket"
        ),
        F.expr(
            "transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
        ).alias("qv"),
    )
    train = q.filter(F.col("bucket") < train_pct).select(
        F.col("vec_id").alias("tid"),
        F.col("label").alias("tlabel"),
        F.col("qv").alias("tv"),
    )
    test = q.filter(
        (F.col("bucket") >= train_pct)
        & (F.col("vec_id") < max_query_ids)
    ).select(
        F.col("vec_id").alias("sid"),
        F.col("label").alias("slabel"),
        F.col("qv").alias("sv"),
    )
    cent = q.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("qv").alias("cv")
    )
    # train → cell assignment (the corpus-scale pass)
    wa = Window.partitionBy("tid").orderBy(
        F.col("cdist").asc(), F.col("cent_id").asc()
    )
    cells = (
        train.join(F.broadcast(cent))
        .select(
            "tid", "tlabel", "tv", "cent_id",
            F.expr(dist2.format(a="tv", b="cv")).alias("cdist"),
        )
        .withColumn("_cr", F.row_number().over(wa))
        .filter(F.col("_cr") == 1)
        .select("tid", "tlabel", "tv", "cent_id")
    )
    # query → probed cells (bounded frame)
    wp = Window.partitionBy("sid").orderBy(
        F.col("cdist").asc(), F.col("cent_id").asc()
    )
    qprobe = (
        test.join(F.broadcast(cent))
        .select(
            "sid", "cent_id",
            F.expr(dist2.format(a="sv", b="cv")).alias("cdist"),
        )
        .withColumn("_cr", F.row_number().over(wp))
        .filter(F.col("_cr") <= n_probe)
        .select("sid", "cent_id")
    )
    # probed-cell candidate scoring: per-CELL int64 BLAS (the
    # _exact_knn_neighbors kernel shape restricted to each cell's
    # members × the queries probing it — the IVF plan's per-cell work,
    # vectorized; the interpreted per-pair fold it replaces cost 3.5 s
    # of the query's 5.2 s at sf0.1). Closure state is bounded: the
    # test matrix (≤ max_query_ids) and the m·n_probe probe map.
    import numpy as np
    import pandas as pd

    test_rows = test.collect()  # bounded by max_query_ids
    probe_rows = qprobe.collect()  # ≤ |test| · n_probe
    T = (
        np.array([r["sv"] for r in test_rows], dtype=np.int64)
        if test_rows
        else np.zeros((0, 1), dtype=np.int64)
    )
    s_index = {int(r["sid"]): i for i, r in enumerate(test_rows)}
    slabel_by_sid = {
        int(r["sid"]): int(r["slabel"]) for r in test_rows
    }
    t_norm2 = (T * T).sum(axis=1) if len(test_rows) else None
    probes_by_cell: dict[int, list[int]] = {}
    for r in probe_rows:
        probes_by_cell.setdefault(int(r["cent_id"]), []).append(
            int(r["sid"])
        )

    def _cell_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ("sid", "slabel", "tid", "tlabel", "dist2_u")
        empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        probing = probes_by_cell.get(int(key[0]), [])
        if not probing or pdf.empty:
            return empty
        X = np.stack(pdf["tv"].to_numpy()).astype(np.int64)
        tids = pdf["tid"].to_numpy()
        tlabels = pdf["tlabel"].to_numpy()
        x_norm2 = (X * X).sum(axis=1)
        kk = min(k, len(tids))
        out = {c: [] for c in cols}
        for sid in probing:
            j = s_index[sid]
            d2 = x_norm2 + t_norm2[j] - 2 * (X @ T[j])
            order = np.lexsort((tids, d2))[:kk]
            out["sid"].extend([sid] * len(order))
            out["slabel"].extend([slabel_by_sid[sid]] * len(order))
            out["tid"].extend(tids[order].tolist())
            out["tlabel"].extend(tlabels[order].tolist())
            out["dist2_u"].extend(d2[order].tolist())
        return pd.DataFrame(out)

    wk = Window.partitionBy("sid").orderBy(
        F.col("dist2_u").asc(), F.col("tid").asc()
    )
    ann_nn = (
        cells.groupBy("cent_id")
        .applyInPandas(
            _cell_kernel,
            schema="sid long, slabel long, tid long, tlabel long, "
            "dist2_u long",
        )
        .withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= k)
        .select("sid", "slabel", "tid", "tlabel")
    )
    exact_nn = _exact_knn_neighbors(train, test, k).select(
        "sid", "slabel", "tid", "tlabel"
    )

    def _pred(nn):
        wv = Window.partitionBy("sid").orderBy(
            F.col("n_votes").desc(), F.col("tlabel").asc()
        )
        return (
            nn.groupBy("sid", "tlabel")
            .agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
            .withColumn("_rw", F.row_number().over(wv))
            .filter(F.col("_rw") == 1)
            .select("sid", F.col("tlabel").alias("pred"))
        )

    ann_pred = _pred(ann_nn).withColumnRenamed("pred", "pred_ann")
    exact_pred = _pred(exact_nn).withColumnRenamed("pred", "pred_exact")
    overlap = (
        ann_nn.select("sid", "tid")
        .join(exact_nn.select("sid", "tid"), ["sid", "tid"], "left_semi")
        .groupBy("sid")
        .agg(F.count(F.lit(1)).cast("long").alias("_ov"))
    )
    truth_n = exact_nn.groupBy("sid").agg(
        F.count(F.lit(1)).cast("long").alias("_nt")
    )
    per_sid = (
        test.select("sid", "slabel")
        .join(exact_pred, "sid")
        .join(ann_pred, "sid", "left")
        .join(overlap, "sid", "left")
        .join(truth_n, "sid")
    )
    return (
        per_sid.groupBy(F.col("slabel").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.count("pred_ann").cast("long").alias("n_pred_ann"),
            F.sum(
                F.when(F.col("pred_ann") == F.col("pred_exact"), 1)
                .otherwise(0)
            ).cast("long").alias("n_agree"),
            F.sum(
                F.when(F.col("pred_ann") == F.col("slabel"), 1)
                .otherwise(0)
            ).cast("long").alias("n_correct_ann"),
            F.sum(
                F.when(F.col("pred_exact") == F.col("slabel"), 1)
                .otherwise(0)
            ).cast("long").alias("n_correct_exact"),
            F.sum(F.coalesce("_ov", F.lit(0)))
            .cast("long")
            .alias("nbr_overlap"),
            F.sum("_nt").cast("long").alias("n_truth"),
        )
        .select(
            "label", "n_vecs", "n_pred_ann", "n_agree",
            "n_correct_ann", "n_correct_exact", "nbr_overlap", "n_truth",
            F.expr(
                "CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT) "
                "ELSE nbr_overlap * 1000000 DIV n_truth END"
            ).cast("long").alias("nbr_recall_ppm"),
        )
        .orderBy("label")
    )


def embedding_drift_report(embeddings: DataFrame) -> DataFrame:
    """Embedding-DISTRIBUTION drift between the first and second half
    of the table (by vec_id rank — ingestion order in the fixture):
    per label, both halves' populations and the integer squared
    distance between their floored-mean centroids — the vector-space
    counterpart of ``domain_divergence``/``streaming_event_mix_drift``
    and the check a training pipeline runs before concatenating two
    crawl snapshots (an encoder change or a topic shift moves the
    centroids; stable data keeps drift2 near the sampling floor).

    Exactness: the ``label_outliers`` micro-quantization and floored
    integer mean (both halves' centroids and the gap are BIGINT end to
    end). The half boundary is ``2·vec_id < N`` with N the table count
    — carried as a broadcast scalar frame, so the plan stays fully
    lazy. Labels present in only one half drop from the report
    (an inner centroid join; their absence IS the drift signal, and
    the populations of surviving labels still expose imbalance).

    Scale shape: one exploded scan → (labels × 2 × dims)-bounded
    centroid aggregate; the gap is a model-frame join. Output:
    (label, n_first, n_second, drift2_u), ordered by label.
    """
    from mapreduceindex_spark.functions.exact import floor_div_sql

    nfrm = embeddings.agg(F.count(F.lit(1)).alias("_n"))
    base = embeddings.crossJoin(F.broadcast(nfrm)).select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.when(F.col("vec_id") * 2 < F.col("_n"), 0)
        .otherwise(1)
        .alias("half"),
        "embedding",
    )
    counts = (
        base.groupBy("label")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_first"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_second"),
        )
    )
    ex = base.select(
        "label",
        "half",
        F.posexplode("embedding").alias("dim", "_x"),
    ).select(
        "label",
        "half",
        "dim",
        F.expr(
            "CAST(floor(CAST(_x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        ).alias("_xm"),
    )
    cent = ex.groupBy("label", "half", "dim").agg(
        F.expr(floor_div_sql("sum(_xm)", "count(1)", "DIV")).alias("_c")
    )
    a = cent.filter(F.col("half") == 0).select(
        "label", "dim", F.col("_c").alias("_ca")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "dim", F.col("_c").alias("_cb")
    )
    drift = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum(
                (F.col("_ca") - F.col("_cb"))
                * (F.col("_ca") - F.col("_cb"))
            )
            .cast("long")
            .alias("drift2_u")
        )
    )
    return (
        drift.join(counts, "label")
        .select("label", "n_first", "n_second", "drift2_u")
        .orderBy("label")
    )


def label_compactness(embeddings: DataFrame) -> DataFrame:
    """Cluster-quality readout over the labeled embedding table: per
    label, how TIGHT the class is (mean and max integer squared
    distance of members to their own centroid) and how SEPARATED
    (squared distance from the label's centroid to the nearest OTHER
    centroid, ties to the lower label id) — the compactness/separation
    pair behind Davies-Bouldin/silhouette-style diagnostics, kept as
    raw exact integers instead of a float index so both engines agree
    bit-for-bit. Read it before trusting ``label`` as a curation
    signal: a label with max_dist2 ≫ mean_dist2 is polluted; one whose
    centroid_gap2 < its mean_dist2 overlaps its neighbor.

    Exactness: the ``label_outliers``/``centroid_classifier`` centroid
    formula (micro-quantized components, FLOORED per-dim integer mean);
    distances are BIGINT end to end; the mean is the floored integer
    quotient (distances are non-negative, so plain ``DIV`` IS the
    floor).

    Scale shape: one exploded scan fits the |labels|·d centroid frame
    (model-sized, broadcast back); one more pass aggregates per-member
    distances; the centroid-vs-centroid gap is a |labels|² self-join of
    the model frame. Output: |labels| rows.

    Output: (label, n_vecs, mean_dist2_u, max_dist2_u,
    nearest_other_label, centroid_gap2_u), ordered by label.
    """
    from mapreduceindex_spark.functions.exact import floor_div_sql

    ex = embeddings.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("dim", "_x"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.expr(
            "CAST(floor(CAST(_x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        ).alias("_xm"),
    )
    cent = ex.groupBy("label", "dim").agg(
        F.expr(floor_div_sql("sum(_xm)", "count(1)", "DIV")).alias("_c")
    )
    dist = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                (F.col("_xm") - F.col("_c")) * (F.col("_xm") - F.col("_c"))
            )
            .cast("long")
            .alias("_d2")
        )
    )
    per_label = dist.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.expr("sum(_d2) DIV count(1)").cast("long").alias("mean_dist2_u"),
        F.max("_d2").cast("long").alias("max_dist2_u"),
    )
    ca = cent.select(
        F.col("label").alias("_la"), "dim", F.col("_c").alias("_ca")
    )
    cb = cent.select(
        F.col("label").alias("_lb"), "dim", F.col("_c").alias("_cb")
    )
    gaps = (
        ca.join(cb, "dim")
        .filter(F.col("_la") != F.col("_lb"))
        .groupBy("_la", "_lb")
        .agg(
            F.sum(
                (F.col("_ca") - F.col("_cb")) * (F.col("_ca") - F.col("_cb"))
            )
            .cast("long")
            .alias("_g2")
        )
    )
    from pyspark.sql.window import Window

    wg = Window.partitionBy("_la").orderBy(
        F.col("_g2").asc(), F.col("_lb").asc()
    )
    nearest = (
        gaps.withColumn("_rn", F.row_number().over(wg))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_la").alias("label"),
            F.col("_lb").alias("nearest_other_label"),
            F.col("_g2").alias("centroid_gap2_u"),
        )
    )
    return (
        per_label.join(nearest, "label")
        .select(
            "label",
            "n_vecs",
            "mean_dist2_u",
            "max_dist2_u",
            F.col("nearest_other_label").cast("long"),
            F.col("centroid_gap2_u").cast("long"),
        )
        .orderBy("label")
    )


def _sil_ppm_expr(a: str, b: str, div: str) -> str:
    """The silhouette ppm ratio ``floor((b−a)·1e6 / max(a,b))`` with
    int64 headroom, as one SQL fragment shared VERBATIM by the Spark
    plan (div='DIV') and the DuckDB oracle (div='//').

    ``(b−a)·1e6`` overflows int64 once distances pass ~9.2e12, which
    real micro-quantized embeddings reach (a 1.0-magnitude component
    gap contributes 1e12 per dimension). Deterministic scale-reduction:
    when max(a,b) exceeds 4e12, BOTH the numerator difference and the
    denominator shift down by 2^20 (floored) before the ppm division —
    identical formula on both engines, so results stay bit-equal; the
    shifted branch deviates from the unshifted ratio by < 1 ppm (the
    ``jl_distortion_report`` shift discipline). |b−a| ≤ max(a,b), so
    the shifted numerator·1e6 is bounded by the shifted denominator
    magnitude, which the d² accumulator bound (|x| ≲ 9 at 1024 dims)
    keeps under 2^63.
    """
    from mapreduceindex_spark.functions.exact import floor_div_sql

    m = f"greatest({a}, {b})"
    d = f"(CASE WHEN {m} > 4000000000000 THEN 1048576 ELSE 1 END)"
    x2 = floor_div_sql(f"({b}) - ({a})", d, div)
    m2 = f"({m} {div} {d})"
    # b IS NULL = single-label table (no "other" centroid exists): the
    # silhouette is undefined; score 0 explicitly — the engines'
    # greatest() NULL conventions differ, so never let it decide
    return (
        f"CASE WHEN ({b}) IS NULL THEN 0 WHEN {m} = 0 THEN 0 ELSE "
        + floor_div_sql(f"({x2}) * 1000000", m2, div)
        + " END"
    )


def silhouette_simplified(embeddings: DataFrame) -> DataFrame:
    """Per-label SIMPLIFIED silhouette over the labeled embedding table:
    for every vector, a = squared distance to its OWN label centroid,
    b = squared distance to the nearest OTHER centroid, and the
    silhouette s = (b − a) / max(a, b) in integer ppm — the per-member
    cluster-quality score that ``label_compactness`` (label-level
    aggregates only) deliberately stops short of. A member with s < 0
    sits closer to another label's centroid than to its own — the
    mislabel candidate list a curation pass reviews first.

    Simplified (centroid-based) silhouette is the standard O(N·L·d)
    form of the O(N²·d) original — the only silhouette anyone can
    compute at corpus scale; on well-separated clusters the two agree
    closely (Hruschka et al. 2004).

    Exactness: components micro-quantize with the ``label_outliers``
    formula, centroids are FLOORED per-dim integer means, distances are
    BIGINT, and the ppm ratio is the FLOORED integer division
    (``exact.floor_div_sql`` — s goes negative for misassigned
    members). The a = b = 0 degenerate point scores 0 by explicit
    branch on both engines. The per-label mean is likewise floored.

    Scale shape: one exploded scan fits the |labels|·d centroid frame;
    scoring joins each member's exploded rows against ALL centroids by
    dim (N·d·|labels| intermediate — labels-bounded, the declared
    simplified-silhouette cost), then two bounded aggregates. Output:
    |labels| rows.

    Output: (label, n_vecs, mean_sil_ppm, min_sil_ppm, n_negative),
    ordered by label.
    """
    from mapreduceindex_spark.functions.exact import floor_div_sql

    ex = embeddings.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("dim", "_x"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.expr(
            "CAST(floor(CAST(_x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        ).alias("_xm"),
    )
    cent = ex.groupBy("label", "dim").agg(
        F.expr(floor_div_sql("sum(_xm)", "count(1)", "DIV")).alias("_c")
    )
    # every member × every centroid, joined on dim (centroid frame is
    # |labels|·d — broadcast), then one aggregate to (vec, cent-label)
    d2 = (
        ex.join(
            F.broadcast(
                cent.select(
                    F.col("label").alias("_cl"), "dim", F.col("_c")
                )
            ),
            "dim",
        )
        .groupBy("vec_id", "label", "_cl")
        .agg(
            F.sum(
                (F.col("_xm") - F.col("_c")) * (F.col("_xm") - F.col("_c"))
            )
            .cast("long")
            .alias("_d2")
        )
    )
    per_vec = d2.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("_cl") == F.col("label"), F.col("_d2"))).alias(
            "_a"
        ),
        F.min(F.when(F.col("_cl") != F.col("label"), F.col("_d2"))).alias(
            "_b"
        ),
    )
    sil = per_vec.select(
        "vec_id",
        "label",
        F.expr(_sil_ppm_expr("_a", "_b", "DIV")).cast("long").alias("_s"),
    )
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.expr(floor_div_sql("sum(_s)", "count(1)", "DIV"))
            .cast("long")
            .alias("mean_sil_ppm"),
            F.min("_s").cast("long").alias("min_sil_ppm"),
            F.sum(F.when(F.col("_s") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_negative"),
        )
        .orderBy("label")
    )


def silhouette_simplified_oracle_sql() -> str:
    """DuckDB twin of :func:`silhouette_simplified` — identical
    quantization, floored centroid means, distance algebra, and the
    floored ppm ratio with the same degenerate-point branch."""
    from mapreduceindex_spark.functions.exact import floor_div_sql

    ratio = _sil_ppm_expr("a", "b", "//")
    return f"""
WITH dims AS (
  SELECT CAST(range AS BIGINT) AS dim FROM range(0, 1024)
), ex AS (
  SELECT vec_id, label::BIGINT AS label, d.dim,
         CAST(floor(CAST(embedding[CAST(d.dim + 1 AS INT)]
              AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xm
  FROM embeddings, dims d WHERE d.dim < len(embedding)
), cent AS (
  SELECT label, dim,
         {floor_div_sql("sum(xm)", "count(1)", "//")} AS c
  FROM ex GROUP BY label, dim
), d2 AS (
  SELECT ex.vec_id, ex.label, cent.label AS cl,
         sum((ex.xm - cent.c) * (ex.xm - cent.c))::BIGINT AS d2
  FROM ex JOIN cent ON cent.dim = ex.dim
  GROUP BY ex.vec_id, ex.label, cent.label
), per_vec AS (
  SELECT vec_id, label,
         min(CASE WHEN cl = label THEN d2 END) AS a,
         min(CASE WHEN cl <> label THEN d2 END) AS b
  FROM d2 GROUP BY vec_id, label
), sil AS (
  SELECT vec_id, label, {ratio} AS s
  FROM per_vec
)
SELECT label,
       count(*)::BIGINT AS n_vecs,
       CAST({floor_div_sql("sum(s)", "count(1)", "//")} AS BIGINT)
         AS mean_sil_ppm,
       min(s)::BIGINT AS min_sil_ppm,
       sum(CASE WHEN s < 0 THEN 1 ELSE 0 END)::BIGINT AS n_negative
FROM sil GROUP BY label ORDER BY label
"""


def dbscan_embeddings(
    embeddings: DataFrame, eps_micro: int = 20000, min_pts: int = 4
) -> DataFrame:
    """Grid-bucketed DBSCAN over the embedding table's first two
    dimensions: (vec_id, n_neighbors, role, cluster_rep) per vector,
    role ∈ {core, border, noise}, ordered by vec_id — the
    density-based complement to ``kmeans_embeddings`` (no k, arbitrary
    cluster shapes, an explicit noise class for outliers).

    Semantics (Ester et al., KDD'96, on the L∞ metric): quantize dims
    0–1 to integer micro units (tie-free ``exact.micro``), a point's
    ε-neighborhood is all points within L∞ ``eps_micro`` (itself
    included); core ⟺ |N(p)| ≥ ``min_pts``; clusters are the connected
    components of the core-core proximity graph (shared
    ``resolve_components`` tail — min-reachable-id labels); border
    points (non-core with ≥ 1 core neighbor) take the MINIMUM adjacent
    core's cluster label (a deterministic pick of DBSCAN's documented
    border ambiguity); everything else is noise (NULL cluster).

    Scale shape: the neighbor search is grid-bucketed — each point
    probes only its 3×3 ε-cells (a bounded ×9 fan-out of the POINTS
    frame joined on cell id), so the join cost is Σ|cell|·|3×3 nbhd|,
    never n². That is the standard spatial-join plan at 100 TB: cell id
    is the shuffle key, density bounds the per-task work, and a skewed
    cell is exactly a dense region — real neighbors, not wasted
    candidates. The L∞ metric makes the cell filter EXACT (a point's
    ε-ball lies entirely within the 3×3 cells), so no candidate beyond
    the guarantee is ever scored. 2-D projection keeps the
    per-candidate filter 2 subtractions; the full-dimensional variant
    swaps the distance expression, not the plan.

    Everything is integer arithmetic end-to-end (micro coords, floored
    cell division for negatives, integer L∞) — the DuckDB oracle
    replays it bit-for-bit including the recursive min-label reach.
    """
    from mapreduceindex_spark.functions.exact import floor_div_sql, micro
    from mapreduceindex_spark.operators.dedup import resolve_components

    pts = embeddings.select(
        "vec_id",
        micro(F.col("embedding").getItem(0).cast("double")).alias("x"),
        micro(F.col("embedding").getItem(1).cast("double")).alias("y"),
    ).select(
        "vec_id",
        "x",
        "y",
        F.expr(floor_div_sql("x", eps_micro, "DIV")).alias("cx"),
        F.expr(floor_div_sql("y", eps_micro, "DIV")).alias("cy"),
    )
    probe = pts.select(
        F.col("vec_id").alias("va"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(F.expr("array(-1L, 0L, 1L)")).alias("dx"),
        (F.col("cx")).alias("cx0"),
        "cy",
    ).select(
        "va",
        "xa",
        "ya",
        (F.col("cx0") + F.col("dx")).alias("ncx"),
        F.explode(F.expr("array(-1L, 0L, 1L)")).alias("dy"),
        "cy",
    ).select(
        "va", "xa", "ya", "ncx", (F.col("cy") + F.col("dy")).alias("ncy")
    )
    nb = (
        probe.join(
            pts.select(
                F.col("vec_id").alias("vb"),
                F.col("x").alias("xb"),
                F.col("y").alias("yb"),
                F.col("cx").alias("ncx"),
                F.col("cy").alias("ncy"),
            ),
            ["ncx", "ncy"],
        )
        .filter(
            F.greatest(
                F.abs(F.col("xa") - F.col("xb")),
                F.abs(F.col("ya") - F.col("yb")),
            )
            <= eps_micro
        )
        .select("va", "vb")
    )
    nn = nb.groupBy("va").agg(F.count(F.lit(1)).alias("n_neighbors"))
    core = nn.filter(F.col("n_neighbors") >= min_pts).select(
        F.col("va").alias("vec_id")
    )
    core_pairs = (
        nb.join(core.withColumnRenamed("vec_id", "va"), "va")
        .join(core.withColumnRenamed("vec_id", "vb"), "vb")
        .filter(F.col("va") < F.col("vb"))
        .select(F.col("va").alias("doc_a"), F.col("vb").alias("doc_b"))
        .distinct()
    )
    comp = resolve_components(
        core_pairs, core.withColumnRenamed("vec_id", "doc_id")
    ).select(F.col("doc_id").alias("vec_id"), "cluster_rep")
    border = (
        nb.join(core.withColumnRenamed("vec_id", "vb"), "vb")
        .filter(F.col("va") != F.col("vb"))
        .join(
            comp.select(
                F.col("vec_id").alias("vb"), F.col("cluster_rep").alias("crep")
            ),
            "vb",
        )
        .groupBy(F.col("va").alias("vec_id"))
        .agg(F.min("crep").alias("border_rep"))
    )
    return (
        nn.select(F.col("va").alias("vec_id"), "n_neighbors")
        .join(comp, "vec_id", "left")
        .join(border, "vec_id", "left")
        .select(
            "vec_id",
            "n_neighbors",
            F.when(F.col("cluster_rep").isNotNull(), F.lit("core"))
            .when(F.col("border_rep").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("cluster_rep", "border_rep").alias("cluster_rep"),
        )
        .orderBy("vec_id")
    )


def coreset_sample(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """Greedy k-center (farthest-point-first) coreset selection over
    the embedding table: pick the seed (min vec_id), then k−1 times the
    point FARTHEST from every chosen center — Gonzalez's 2-approximation
    to the k-center cover (Gonzalez, TCS 1985), the deterministic
    diversity-sampling primitive behind "pick a small training subset
    that still spans the space" (coreset/active-learning selection),
    the opposite pull of ``weighted_sample``'s mass-proportional draw.

    Exactness: vectors quantize once to int64 micro units (tie-free
    ``exact.micro``); distances are exact integer squared L2
    (≤ 64·(4e6)² ≈ 1e15 ≪ 2⁶³); the argmax tie-break is min vec_id
    (``max(struct(dist, -vec_id))``). ``dist_sq`` at selection is the
    point's distance to the ALREADY-chosen set — i.e. the k-center
    covering radius before that round — so the column traces the
    radius-vs-k curve; the seed row carries NULL.

    Scale shape: the selection loop is k DRIVER-SIDE rounds (k is the
    sample size — single digits to hundreds), each ONE scan computing
    min-distance-to-centers as a literal-array expression (one parsed
    SQL string — the manifest-map py4j discipline) and ONE max
    reduction; no shuffle at all, and model state is k·dim integers.
    The K-unrolled DuckDB oracle (the ``kmeans`` discipline) replays
    every pick.

    Columns: (round, vec_id, dist_sq), min(k, n) rows, ordered by
    round.
    """
    from mapreduceindex_spark.functions.exact import micro

    spark = embeddings.sparkSession
    pts = embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: micro(x.cast("double"))
        ).alias("xm"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out_schema = "round long, vec_id long, dist_sq long"
    try:
        seed = pts.agg(F.min("vec_id").alias("v")).collect()[0]["v"]
        if seed is None:
            return spark.createDataFrame([], out_schema)
        chosen = [
            (
                0,
                int(seed),
                None,
                [int(v) for v in pts.filter(F.col("vec_id") == seed)
                 .collect()[0]["xm"]],
            )
        ]
        for rnd in range(1, k):
            dists = [
                "aggregate(zip_with(xm, array("
                + ", ".join(f"{v}L" for v in c[3])
                + "), (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
                for c in chosen
            ]
            mind = (
                dists[0] if len(dists) == 1 else "least(" + ", ".join(dists) + ")"
            )
            excl = ", ".join(str(c[1]) for c in chosen)
            picked = (
                pts.filter(F.expr(f"vec_id NOT IN ({excl})"))
                .agg(
                    F.max(
                        F.expr(
                            f"struct({mind} AS d, -vec_id AS nv, xm AS xm)"
                        )
                    ).alias("m")
                )
                .collect()[0]["m"]
            )
            if picked is None:
                break
            chosen.append(
                (rnd, int(-picked["nv"]), int(picked["d"]),
                 [int(v) for v in picked["xm"]])
            )
        return spark.createDataFrame(
            [(r, v, d) for r, v, d, _ in chosen], out_schema
        ).orderBy("round")
    finally:
        pts.unpersist()
