"""Sketch operators: cardinality estimation and exact distributed quantiles.

The scale problem these solve: at 100 TB, ``count(DISTINCT x)`` and exact
percentiles are the two aggregates that stop being "just a shuffle" —
distinct needs a full dedup pass, percentiles a global sort. The standard
engine answers (HyperLogLog, t-digest/GK) are approximate AND
engine-specific, so their outputs can't be cross-checked against another
engine. These operators use deterministic formulations instead:

- **KMV (k-minimum-values) sketch** for distinct counts: hash every value
  with the portable 60-bit md5 hash (``stable_hash64``), keep the k
  smallest distinct hashes, estimate N ≈ (k-1)·2^60 / kth_min. Same
  accuracy class as HLL (relative error ~1/sqrt(k)), but the sketch
  content is a pure function of the data — the DuckDB oracle reproduces
  it bit-for-bit, which no engine-native HLL allows. At cluster scale the
  k-smallest pass is a per-partition top-k (TakeOrdered) — no full
  shuffle, driver traffic is k values per partition.
- **Two-phase exact quantiles**: a bucket histogram (one map-side-combined
  aggregate, bounded output) locates each target rank's bucket and local
  offset; a second pass sorts ONLY within the few hit buckets
  (window partitioned by bucket — never a single-task global window).
  This is the distributed exact-percentile algorithm; the only driver
  materialization is the bounded histogram.

SURVEY.md §2 EXT-adjacent (training-pipeline statistics surface); no
reference-file citation — the reference has no sketch/quantile surface
(SURVEY §2 "operators the reference does NOT have").
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceindex_spark.functions.text import stable_hash64, token_rows

#: hash space size of stable_hash64 (60-bit), as an exact double
_HASH_SPACE = float(2**60)


def kmv_distinct_tokens(documents: DataFrame, k: int = 256) -> DataFrame:
    """Global KMV distinct-count sketch over the corpus vocabulary.

    One row out: (k, n_mins, kth_min, est_distinct). When the true
    distinct count is below k the sketch is exhaustive and the estimate
    is exact; otherwise est = (k-1)·2^60/kth_min (the classic KMV
    estimator — kth_min/2^60 estimates the fraction of hash space that
    k distinct values span).

    Plan: tokenize → distinct word (one shuffle, map-side partial) →
    hash → TakeOrdered(k) → 1-row aggregate. The distinct-word shuffle
    is the same one the flagship index already pays; everything after it
    is O(k).
    """
    mins = (
        token_rows(documents)
        .filter(F.length("word") > 0)
        .select("word")
        .distinct()
        .select(stable_hash64("word").alias("u"))
        .orderBy("u")
        .limit(k)
    )
    return mins.agg(
        F.lit(k).cast("long").alias("k"),
        F.count(F.lit(1)).alias("n_mins"),
        F.max("u").alias("kth_min"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.max("u").cast("double")
            ),
            4,
        ).alias("est_distinct"),
    )


def kmv_distinct_users(events: DataFrame, k: int = 32) -> DataFrame:
    """Grouped KMV sketch: estimated distinct users per event type.

    The grouped variant can't use TakeOrdered (that's global), so the
    k-smallest-per-group is a row_number window over the *distinct*
    (type, user-hash) pairs — the window sorts each group's distinct
    hashes only, spillable and skew-bounded, never a global sort. This
    is the shape a per-key HLL rollup takes at 100 TB: dedup shuffle,
    then O(group · k) state.
    """
    pairs = (
        events.select(
            "event_type",
            stable_hash64(F.col("user_id").cast("string")).alias("u"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("u")
    mins = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return (
        mins.groupBy("event_type")
        .agg(
            F.lit(k).cast("long").alias("k"),
            F.count(F.lit(1)).alias("n_mins"),
            F.max("u").alias("kth_min"),
            F.round(
                F.when(
                    F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
                ).otherwise(
                    F.lit(float(k - 1))
                    * F.lit(_HASH_SPACE)
                    / F.max("u").cast("double")
                ),
                4,
            ).alias("est_users"),
        )
        .orderBy("event_type")
    )


#: Shared HLL estimate expression (SQL text, identical on both engines so
#: the doubles are bit-equal): raw HLL α·m²·2^zcap / Z with the standard
#: small-range linear-counting fallback m·ln(m/V) when the raw estimate
#: is ≤ 2.5·m and zero registers remain. Callers format with
#: m / mm (=m²) / alpha / zcap / z (Z column name) / np (n_present col).
_HLL_EST_SQL = (
    "round(CASE WHEN {np} < {m} AND ({alpha} * {mm} * pow(2.0, {zcap}) "
    "/ CAST({z} AS DOUBLE)) <= {lim} "
    "THEN {m}.0 * ln({m}.0 / CAST({m} - {np} AS DOUBLE)) "
    "ELSE {alpha} * {mm} * pow(2.0, {zcap}) / CAST({z} AS DOUBLE) END, 4)"
)


def hll_distinct_users(events: DataFrame, m: int = 64) -> DataFrame:
    """Grouped HyperLogLog sketch: estimated distinct users per event
    type, with the exact count joined alongside as the calibration
    column — (event_type, m, n_zero_regs, z_scaled, est_users, n_exact).

    Why next to KMV: the KMV sketch needs a *distinct* pass (a dedup
    shuffle) before the k-smallest selection; HLL registers need none —
    ``max`` is idempotent, so duplicate users fold away inside the
    map-side partial aggregate. At 100 TB this is the cheaper shape by
    far: two hash aggregates (``(type, register) → max ρ`` then
    ``type → Σ``), both map-side combined, state O(types · m), never a
    window and never a distinct. This operator is the readout of that
    register state plus the standard estimator; the exact leg exists to
    make the sketch's error visible (the ``minhash_accuracy`` /
    ``cms_hot_tokens`` calibration discipline).

    Deterministic + engine-portable, unlike engine-native HLLs: the
    register index is ``stable_hash64(user) % m`` and ρ counts the
    leading zeros of the remaining ``60 - log2(m)`` hash bits via
    ``length(bin(w))`` — integer-exact string length, no float log —
    so the DuckDB oracle rebuilds the identical register vector.
    ``z_scaled = Σ_j 2^(zcap - M_j)`` (absent registers contribute
    ``2^zcap``) is an exact BIGINT (≤ m·2^zcap = 2^62); only the final
    estimate is a double, computed from that integer by the SAME
    expression text on both engines and rounded to the 1e-6-safe grid
    (``floataudit`` contract; the KMV precedent).
    """
    regs = hll_registers(events, ["event_type"], F.col("user_id"), m)
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return (
        hll_estimate(regs, ["event_type"], m)
        .join(exact, "event_type")
        .select(
            "event_type",
            "m",
            "n_zero_regs",
            "z_scaled",
            "est_users",
            F.col("n_exact").cast("long").alias("n_exact"),
        )
        .orderBy("event_type")
    )


def hll_registers(
    df: DataFrame, keys: list, value, m: int = 64
) -> DataFrame:
    """Per-key HLL register state: (keys..., reg, mj). ``max`` is
    idempotent and commutative, so this aggregate is micro-batch- and
    partitioning-order-independent — the property that makes it valid
    streaming state (``streaming_hll_distinct``) as well as a plain
    batch aggregate."""
    lb = m.bit_length() - 1
    assert m == 1 << lb, "m must be a power of two"
    rho_max = (60 - lb) + 1
    hashed = df.select(
        *keys, stable_hash64(value.cast("string")).alias("u")
    )
    return (
        hashed.select(
            *keys,
            (F.col("u") % m).alias("reg"),
            F.expr(
                f"CASE WHEN u DIV {m} = 0 THEN {rho_max} "
                f"ELSE {rho_max} - length(bin(u DIV {m})) END"
            ).alias("rho"),
        )
        .groupBy(*keys, "reg")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate(regs: DataFrame, keys: list, m: int = 64) -> DataFrame:
    """Estimate readout over an ``hll_registers``-shaped frame: per key,
    (m, n_zero_regs, z_scaled BIGINT, est_users double). The only float
    is produced by ``_HLL_EST_SQL`` — callers' oracles render the SAME
    template."""
    lb = m.bit_length() - 1
    zcap = (60 - lb) + 2
    z = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_present"),
        (
            F.sum(F.expr(f"shiftleft(1L, CAST({zcap} - mj AS INT))"))
            + (m - F.count(F.lit(1))) * F.lit(1 << zcap)
        ).alias("z_scaled"),
    )
    est = _HLL_EST_SQL.format(
        np="n_present", m=m, mm=float(m * m), alpha=0.709, zcap=zcap,
        z="z_scaled", lim=float(2.5 * m),
    )
    return z.select(
        *keys,
        F.lit(m).cast("long").alias("m"),
        (m - F.col("n_present")).cast("long").alias("n_zero_regs"),
        F.col("z_scaled").cast("long").alias("z_scaled"),
        F.expr(est).alias("est_users"),
    )


def nearest_rank_pick(bucketed, value_col, tiebreak_col, rank_for,
                      label_schema):
    """The shared two-phase percentile_disc engine (``price_quantiles``
    and ``events.conversion_latency_quantiles``): collect the bounded
    bucket histogram, map each caller-computed nearest rank to
    (bucket, local rank) on the driver, then window ONLY the hit
    buckets — no global window at any scale.

    ``bucketed`` must carry (bucket, value_col, tiebreak_col);
    ``rank_for(n)`` returns [(label, global_rank)] given the total
    count; ``label_schema`` names/types the label column (e.g.
    ``"p double"`` or ``"p_ppm long"``). Returns (label, value_col)
    rows, or None when the input is empty. Callers whose ``bucketed``
    lineage is expensive should persist it — the histogram collect and
    the returned plan each traverse it once.
    """
    from pyspark.sql.window import Window as _W

    hist = (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
        .collect()  # bounded: value-range/bucket-width rows
    )
    n = sum(r["cnt"] for r in hist)
    if n == 0:
        return None
    label_name = label_schema.split()[0]
    targets = []  # (bucket, local_rank, label)
    for label, r in rank_for(n):
        cum = 0
        for row in hist:
            if cum + row["cnt"] >= r:
                targets.append((row["bucket"], int(r - cum), label))
                break
            cum += row["cnt"]
    spark = bucketed.sparkSession
    tdf = spark.createDataFrame(
        targets, f"bucket long, local_rank long, {label_schema}"
    )
    hit = sorted({t[0] for t in targets})
    w = _W.partitionBy("bucket").orderBy(value_col, tiebreak_col)
    ranked = bucketed.filter(F.col("bucket").isin(hit)).withColumn(
        "rn", F.row_number().over(w).cast("long")
    )
    return ranked.join(
        F.broadcast(tdf),
        (ranked["bucket"] == tdf["bucket"])
        & (ranked["rn"] == tdf["local_rank"]),
    ).select(label_name, value_col)



def price_quantiles(
    orders: DataFrame,
    ps: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
    bucket_width: float = 1000.0,
) -> DataFrame:
    """Exact order-price percentiles (percentile_disc semantics: the value
    at 1-based rank ceil(p·n) under (price, orderkey) ascending order),
    computed distributed in two passes via the shared
    ``nearest_rank_pick`` engine (see its docstring for the plan shape).

    percentile_disc (pick, not interpolate) is chosen because picked
    values are engine-exact; interpolation arithmetic is too, but pick
    semantics also survive decimal/float type differences.
    """
    bucketed = orders.select(
        F.floor(F.col("o_totalprice") / bucket_width).alias("bucket"),
        "o_totalprice",
        "o_orderkey",
    )

    def rank_for(n):
        return [
            (float(p), min(max(int(math.ceil(p * n)), 1), n)) for p in ps
        ]

    picked = nearest_rank_pick(
        bucketed, "o_totalprice", "o_orderkey", rank_for, "p double"
    )
    spark = orders.sparkSession
    if picked is None:
        return spark.createDataFrame([], "p double, value double")
    return picked.select(
        "p", F.round("o_totalprice", 2).alias("value")
    ).orderBy("p")


def bloom_prefilter_stats(
    events: DataFrame,
    m_bits: int = 16384,
    k: int = 3,
    min_value: float = 200.0,
) -> DataFrame:
    """Bloom-filter semi-join prefilter, measured: how many events would a
    runtime filter on "high-value purchasers" (any purchase with value >
    ``min_value`` — ~20% of users on the fixture, so the filter actually
    filters) let through, versus the exact semi-join truth — per event
    type.

    This is the engine technique behind runtime row-group pruning and
    bloom-joins: build a compact bitmap over the build side's keys
    (distinct purchase users), probe the big side with it BEFORE the real
    join, and pay the exact join only for survivors. The filter is
    one-sided (no false negatives, bounded false positives), so
    ``n_pass_bloom ≥ n_true_semi`` per group with equality iff no
    false positives — both counts are emitted so the false-positive rate
    is visible in the result.

    Wholly distributed AND engine-portable: the bitmap is ``m_bits``
    positions packed into 63-bit BIGINT words built with a ``bit_or``
    hash aggregate (~m/63 rows, broadcast to the probe); positions come
    from the portable md5 hash (``stable_hash64(user#i) % m``), so the
    DuckDB oracle reconstructs the IDENTICAL bitmap bit-for-bit — false
    positives included — which is what makes a probabilistic structure
    exactly testable. Probe events explode to their k positions, join the
    broadcast words, and pass iff all k bits are set.
    """
    from mapreduceindex_spark.functions.text import stable_hash64

    def _positions(user_col):
        return [
            (
                stable_hash64(
                    F.concat(user_col.cast("string"), F.lit(f"#{i}"))
                )
                % m_bits
            ).alias(f"p{i}")
            for i in range(k)
        ]

    users = (
        events.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") > min_value)
        )
        .select("user_id")
        .distinct()
    )
    pos = users.select(
        F.explode(F.array(*_positions(F.col("user_id")))).alias("p")
    )
    bloom_words = (
        pos.select(
            F.expr("p div 63").alias("w"),
            # SQL expr: pyspark's shiftleft() only takes a literal shift
            F.expr("shiftleft(1L, cast(p % 63 as int))").alias("msk"),
        )
        .groupBy("w")
        .agg(F.bit_or("msk").alias("bits"))
    )
    probe = events.select("event_id", "user_id", "event_type")
    ppos = probe.select(
        "event_id",
        "user_id",
        "event_type",
        F.explode(F.array(*_positions(F.col("user_id")))).alias("p"),
    )
    hits = (
        ppos.join(
            F.broadcast(bloom_words),
            F.expr("p div 63") == F.col("w"),
            "left",
        )
        .select(
            "event_id",
            "event_type",
            "user_id",
            F.when(
                F.col("bits").isNotNull()
                & (
                    F.col("bits").bitwiseAND(
                        F.expr("shiftleft(1L, cast(p % 63 as int))")
                    )
                    != 0
                ),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("event_id", "event_type", "user_id")
        .agg((F.sum("hit") == k).cast("int").alias("pass_bloom"))
    )
    truth = hits.join(
        users.withColumn("_in", F.lit(1)), "user_id", "left"
    ).select(
        "event_type",
        "pass_bloom",
        F.coalesce("_in", F.lit(0)).alias("in_truth"),
    )
    return (
        truth.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("pass_bloom").cast("long").alias("n_pass_bloom"),
            F.sum("in_truth").cast("long").alias("n_true_semi"),
        )
        .orderBy("event_type")
    )


def cms_hot_tokens(
    documents: DataFrame, depth: int = 4, width: int = 1024, k: int = 20
) -> DataFrame:
    """Count-min-sketch calibration over the corpus token stream: the
    exact top-``k`` hottest words joined against their CMS estimates —
    (word, n_exact, cms_est, overestimate). The sketch is THE skew
    detector at 100 TB: a ``depth×width`` cell grid (4096 counters here)
    answers "which keys are heavy?" with one bounded aggregate, which is
    what decides salting/broadcast strategies before any expensive
    shuffle. This operator reports the sketch's error against exact
    truth on the heaviest keys — the calibration readout (same pattern
    as ``minhash_accuracy`` for MinHash).

    Deterministic + engine-portable: row ``i``'s hash is
    ``stable_hash64(i || ':' || word) % width`` (md5-based), so the
    DuckDB oracle rebuilds the identical grid; the CMS one-sided
    guarantee (estimate ≥ exact, always) is asserted by a unit test.

    Plan: one word-count aggregate (the same shuffle word_counts pays)
    feeds BOTH the 4096-cell grid (cells = Σ counts of colliding words —
    summing pre-aggregated counts is exactly the classic per-occurrence
    CMS) and the exact top-k; estimates come from a broadcast join of
    the k×depth probe rows against the grid. Everything after the first
    aggregate is O(depth·(width + k)); the grid is mergeable (a sum),
    so at any scale it composes map-side.
    """
    wc = (
        token_rows(documents)
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows_i = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i")

    def _col(i, word):
        return (
            stable_hash64(
                F.concat(i.cast("string"), F.lit(":"), word)
            )
            % width
        ).alias("col")

    cells = (
        wc.select("word", "n", rows_i)
        .select("i", _col(F.col("i"), F.col("word")), "n")
        .groupBy("i", "col")
        .agg(F.sum("n").alias("v"))
    )
    top = wc.orderBy(F.col("n").desc(), F.col("word").asc()).limit(k)
    probes = top.select("word", "n", rows_i).select(
        "word", "n", "i", _col(F.col("i"), F.col("word"))
    )
    return (
        probes.join(F.broadcast(cells), ["i", "col"])
        .groupBy("word", "n")
        .agg(F.min("v").alias("_est"))
        .select(
            "word",
            F.col("n").cast("long").alias("n_exact"),
            F.col("_est").cast("long").alias("cms_est"),
            (F.col("_est") - F.col("n")).cast("long").alias("overestimate"),
        )
        .orderBy(F.col("n_exact").desc(), F.col("word").asc())
    )


def kmv_set_ops(events: DataFrame, k: int = 64) -> DataFrame:
    """KMV sketch **set algebra**: estimated distinct-user union and
    intersection for every event-type pair, with the exact counts
    joined alongside as calibration columns.

    This is the operation the single-set sketches can't do: "how many
    users do `view` and `purchase` share?" at 100 TB without a
    per-pair distinct pass. KMV sketches are closed under union — the
    k smallest of (A-sketch ∪ B-sketch) IS the k-minimum-values sketch
    of A∪B — and the intersection follows from inclusion: with K = the
    union sketch's k mins, ρ = |{h ∈ K : h ∈ A-sketch ∧ h ∈ B-sketch}|
    estimates the Jaccard overlap, so est_inter = (ρ/|K|)·est_union
    (Beyer et al., "On Synopses for Distinct-Value Estimation Under
    Multiset Operations", SIGMOD'07). When the union sketch holds fewer
    than k hashes, both inputs were exhaustive and every readout is
    exact — the estimator degrades to truth on small sets.

    Plan shape: ONE dedup shuffle over (type, user-hash) — the same one
    `kmv_distinct_users` pays — then everything downstream operates on
    the types·k sketch rows: the pair merge is sketch×types (bounded by
    types²·k), never data×data. The exact legs (per-pair distinct
    intersection via a user-keyed self-join of the distinct frame) are
    the CALIBRATION tier — at production scale you run the sketch legs
    only, the `minhash_accuracy` discipline.

    Determinism: hashes are `stable_hash64`; the only floats are the
    KMV estimates, computed from exact BIGINTs by the same expression
    text on both engines and rounded to 4dp (the `kmv_distinct_users`
    precedent).

    Columns: (type_a, type_b, k, n_mins, n_both, est_a, est_b,
    est_union, est_inter, exact_a, exact_b, exact_union, exact_inter),
    one row per unordered type pair a<b, ordered by (type_a, type_b).
    """
    pairs = (
        events.select(
            "event_type",
            stable_hash64(F.col("user_id").cast("string")).alias("u"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("u")
    mins = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "u")
    )
    types = mins.select("event_type").distinct()

    # single-set summaries (for est_a / est_b)
    per = mins.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t"), F.max("u").alias("kth_t")
    )

    # pair-merged sketch: each sketch row fans out to its pairs (a<b),
    # shared hashes collapse with membership flags
    b_side = types.withColumnRenamed("event_type", "type_b")
    a_side = types.withColumnRenamed("event_type", "type_a")
    merged = (
        mins.join(b_side, F.col("event_type") < F.col("type_b"))
        .select(
            F.col("event_type").alias("type_a"),
            "type_b",
            "u",
            F.lit(1).alias("in_a"),
            F.lit(0).alias("in_b"),
        )
        .unionByName(
            mins.join(a_side, F.col("type_a") < F.col("event_type")).select(
                "type_a",
                F.col("event_type").alias("type_b"),
                "u",
                F.lit(0).alias("in_a"),
                F.lit(1).alias("in_b"),
            )
        )
        .groupBy("type_a", "type_b", "u")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w2 = Window.partitionBy("type_a", "type_b").orderBy("u")
    usk = (
        merged.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_mins"),
            F.max("u").alias("kth"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        )
    )

    # exact calibration legs
    pu = events.select("event_type", "user_id").distinct()
    ex = pu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    inter = (
        pu.alias("x")
        .join(
            pu.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )

    def _est(n, kth):
        return F.round(
            F.when(n < k, n.cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth.cast("double")
            ),
            4,
        )

    est_union_raw = F.when(
        F.col("n_mins") < k, F.col("n_mins").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("kth").cast("double")
    )
    return (
        usk.join(
            per.select(
                F.col("event_type").alias("type_a"),
                F.col("n_t").alias("n_a"),
                F.col("kth_t").alias("kth_a"),
            ),
            "type_a",
        )
        .join(
            per.select(
                F.col("event_type").alias("type_b"),
                F.col("n_t").alias("n_b"),
                F.col("kth_t").alias("kth_b"),
            ),
            "type_b",
        )
        .join(
            ex.select(
                F.col("event_type").alias("type_a"),
                F.col("n_exact").alias("exact_a"),
            ),
            "type_a",
        )
        .join(
            ex.select(
                F.col("event_type").alias("type_b"),
                F.col("n_exact").alias("exact_b"),
            ),
            "type_b",
        )
        .join(inter, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.lit(k).cast("long").alias("k"),
            "n_mins",
            "n_both",
            _est(F.col("n_a"), F.col("kth_a")).alias("est_a"),
            _est(F.col("n_b"), F.col("kth_b")).alias("est_b"),
            F.round(est_union_raw, 4).alias("est_union"),
            F.round(
                est_union_raw * F.col("n_both") / F.col("n_mins"), 4
            ).alias("est_inter"),
            F.col("exact_a").cast("long").alias("exact_a"),
            F.col("exact_b").cast("long").alias("exact_b"),
            (
                F.col("exact_a")
                + F.col("exact_b")
                - F.coalesce(F.col("n_inter"), F.lit(0))
            ).cast("long").alias("exact_union"),
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("long").alias(
                "exact_inter"
            ),
        )
        .orderBy("type_a", "type_b")
    )


def log2_quantile_sketch(orders: DataFrame, ps: tuple = (50, 90, 99)) -> DataFrame:
    """Mergeable log2-bucket quantile sketch per order priority, with
    the exact nearest-rank value joined alongside as the calibration
    column — the DDSketch shape (Masson, Rim, Lee, "DDSketch: a fast
    and fully-mergeable quantile sketch", VLDB'19) at γ=2, made
    engine-portable: the bucket of a positive cents value is
    ``length(bin(cents)) - 1`` = ⌊log2 cents⌋ — integer-exact string
    length, no float log — so the DuckDB oracle rebuilds the identical
    histogram.

    Why this next to the exact two-phase ``price_quantiles``: the exact
    algorithm needs a second targeted pass; the sketch is ONE map-side-
    combined aggregate with O(groups · 64) state that merges across
    partitions, days, and machines by plain addition — the only
    quantile shape that survives pre-aggregated/rolled-up storage at
    100 TB. The price: relative error ≤ 1/2 at the bucket's lower edge
    (γ=2 is the coarsest grid; production picks γ=1.02 for 2% — the
    mechanism is identical, the bucket count just grows to
    log_γ(range)). The exact leg and ``err_ppm`` make the realized
    error visible (the ``hll_distinct_users`` calibration discipline).

    Estimate = the bucket's arithmetic midpoint ⌊3·2^b/2⌋; rank =
    nearest-rank ⌈p·n/100⌉ computed in integers as (p·n + 99) DIV 100.

    Columns: (priority, p, n, rank, bucket, est_cents, exact_cents,
    err_ppm), ordered by (priority, p).
    """
    cents_expr = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
    base = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(cents_expr).alias("cents"),
        "o_orderkey",
    )
    hist = (
        base.select(
            "priority",
            F.expr(
                "CASE WHEN cents <= 0 THEN -1 "
                "ELSE length(bin(cents)) - 1 END"
            ).alias("bucket"),
        )
        .groupBy("priority", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = hist.groupBy("priority").agg(F.sum("cnt").alias("n"))
    ranks = totals.select(
        "priority",
        "n",
        F.explode(F.array(*[F.lit(p).cast("long") for p in ps])).alias("p"),
    ).withColumn("rank", F.expr("(p * n + 99) DIV 100"))
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(Window.partitionBy("priority").orderBy("bucket")),
    )
    pick = (
        ranks.join(cum, "priority")
        .filter(
            (F.col("cum") >= F.col("rank"))
            & (F.col("cum") - F.col("cnt") < F.col("rank"))
        )
        .select(
            "priority",
            "p",
            "n",
            "rank",
            "bucket",
            F.expr(
                "CASE WHEN bucket < 0 THEN 0L "
                "ELSE shiftleft(1L, CAST(bucket AS INT)) * 3L DIV 2 END"
            ).alias("est_cents"),
        )
    )
    w = Window.partitionBy("priority").orderBy("cents", "o_orderkey")
    exact = base.withColumn("rn", F.row_number().over(w)).select(
        "priority", F.col("rn").alias("rank"), F.col("cents").alias("exact_cents")
    )
    return (
        pick.join(exact, ["priority", "rank"])
        .select(
            "priority",
            "p",
            "n",
            "rank",
            "bucket",
            "est_cents",
            "exact_cents",
            F.expr(
                "CAST(abs(est_cents - exact_cents) * 1000000 DIV exact_cents"
                " AS BIGINT)"
            ).alias("err_ppm"),
        )
        .orderBy("priority", "p")
    )
