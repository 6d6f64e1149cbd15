"""Event-time operators over the ``events`` table (SURVEY.md §2 EXT4:
the reference has no streaming constructs — noted in §2 "Operators the
reference does NOT have" — so this surface exists for the driver's
``events`` fixture and the north-star contract, not for parity).

Tumbling/sliding window aggregation, sessionization, JSON payload
extraction, and per-user activity pivots — the batch forms. The streaming
forms of the same aggregations live in ``streaming/pipelines.py`` and
share these column expressions, so batch and streaming results are
definitionally consistent.

Window starts are emitted as **epoch seconds (BIGINT)** rather than
timestamps: engine-portable, timezone-proof, and exactly what
``F.window`` computes internally (epoch-aligned buckets).

Scale notes: all aggregations shuffle once on their (bucket, key) group;
sessionization shuffles once on user_id and sorts within partitions — the
standard lag/cumsum plan whose state is bounded per user, and which maps
1:1 onto ``session_window`` in streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


from mapreduceindex_spark.functions.exact import (
    avg4,
    floor_div_sql,
    floor_mod_sql,
    sum_dec,
)

#: Epoch seconds of the event timestamp as BIGINT (second truncation is
#: the registry's ``unix_timestamp`` discipline).
_EPOCH = "CAST(unix_seconds(ts) AS BIGINT)"


def _epoch_day() -> F.Column:
    """Calendar-correct epoch-day bucket: FLOORED division by 86400
    (``functions.exact.floor_div_sql``), valid for pre-1970 (negative)
    epochs where Spark's truncating ``DIV`` would lump epoch −1 into
    day 0. The DuckDB oracles carry the same formula with ``//``."""
    return F.expr(floor_div_sql(_EPOCH, 86400, "DIV"))


def _sum_value4() -> F.Column:
    """Exact order-independent 4-dp sum of ``value`` (functions.exact)."""
    return sum_dec("value", 4)


def _avg_value4() -> F.Column:
    """Exact 4-dp BIGINT-cents average of ``value`` (functions.exact)."""
    return avg4("value")


def tumbling_counts(events: DataFrame, width_sec: int = 600) -> DataFrame:
    """Tumbling event-time windows: per (window, event_type) count + sum.

    Uses ``F.window`` (the Catalyst TimeWindow operator, same bucketing the
    streaming engine uses) and projects the start as epoch seconds.
    """
    return (
        events.groupBy(
            F.window("ts", f"{width_sec} seconds").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_value4().alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def sliding_counts(
    events: DataFrame, width_sec: int = 600, slide_sec: int = 300
) -> DataFrame:
    """Sliding windows (width 10 min, slide 5 min): each event lands in
    width/slide buckets; ``F.window`` handles the replication."""
    return (
        events.groupBy(
            F.window("ts", f"{width_sec} seconds", f"{slide_sec} seconds").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _avg_value4().alias("avg_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "n_events",
            "avg_value",
        )
        .orderBy("window_start")
    )


def sessionize(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Gap-based sessionization: per-user sessions split at >30-min silences.

    lag → gap flag → running sum = session index: one shuffle on user_id,
    per-user sorted state. Mirrors ``F.session_window`` semantics
    (used by the streaming variant) for gap-delimited sessions.

    Boundary convention (registry-wide note): EVERY sessionizer —
    the lag-based batch ops (this one, ``top_event_paths``,
    ``events_markov_transitions``, the streaming Markov replay) AND
    the ``session_window``-based streaming ops
    (``streaming_sessions``, ``streaming_session_funnel``) — keeps an
    event at a gap of EXACTLY ``gap_sec`` in the same session (split
    strictly on ``> gap_sec``). Spark's native session window is the
    half-open ``[t, t+gap)``, so the streaming ops declare the window
    ``gap_sec`` + 1 µs wide to land on the same convention; the
    boundary-gap fixture test runs one fixture through both
    sessionizers and asserts identical membership.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts", 1).over(by_user))
            > gap_sec,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    with_sid = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("duration_sec"),
        )
        .orderBy("user_id", "session_id")
    )


def json_payload_stats(events: DataFrame) -> DataFrame:
    """JSON extraction from the ``props`` payload + aggregation.

    ``get_json_object`` is a codegen'd JVM expression (no Python); the
    extracted ``k`` is aggregated per event type.
    """
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            _sum_value4().alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def user_activity_pivot(events: DataFrame) -> DataFrame:
    """Per-user event-type counts pivoted to columns (conditional agg)."""
    types = ["click", "view", "purchase", "signup", "error"]
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in types
    ]
    return (
        events.groupBy("user_id")
        .agg(*aggs, _sum_value4().alias("sum_value"))
        .orderBy("user_id")
    )


def asof_prior_purchase(events: DataFrame) -> DataFrame:
    """As-of join: each event paired with the latest prior purchase.

    The canonical time-series operator Spark lacks natively. For the
    self-table case it collapses to one window pass — a running
    ``last_value`` of purchase timestamps over the per-user event order —
    which is the optimal plan: one shuffle on user_id, no join at all.
    (The two-table general case buckets both sides by time range and
    merges per bucket via ``applyInPandas``; the fixture's single events
    table makes the window form exact.) Output: one row per non-purchase
    event with the purchase it trails, plus the lag in seconds.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    with_prior = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(purchase_ts, ignorenulls=True)
        .over(by_user.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prior_purchase_ts"),
    )
    return (
        with_prior.filter(
            (F.col("event_type") != "purchase")
            & F.col("prior_purchase_ts").isNotNull()
        )
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("ts_sec"),
            F.unix_timestamp("prior_purchase_ts").alias("purchase_ts_sec"),
            (
                F.unix_timestamp("ts") - F.unix_timestamp("prior_purchase_ts")
            ).alias("lag_sec"),
        )
        .orderBy("user_id", "event_id")
    )


def purchasers_without_errors(events: DataFrame) -> DataFrame:
    """Set op: users who purchased EXCEPT users who errored."""
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    errs = events.filter(F.col("event_type") == "error").select("user_id")
    return buyers.subtract(errs).orderBy("user_id")


def range_join_error_context(
    events: DataFrame, window_sec: int = 600
) -> DataFrame:
    """Range join: for every purchase, count error events by the same user
    within ±``window_sec`` — the interval-join operator Spark has no
    native physical strategy for (a naive theta-join is a cartesian
    explosion per user).

    Scale formulation: **time bucketization**. Both sides key by
    (user_id, floor(ts / window)); the probe side expands to its bucket
    ±1 (a bounded 3× fan-out), so every true pair shares a bucket key
    and the join is a plain equi-join — shuffle on a compound key,
    never a range scan. The exact |Δt| ≤ window predicate then filters
    the bucket-candidates. This is the same candidates→verify shape as
    the LSH operators: a lossless bucket cover, because two timestamps
    within `window` differ by at most one bucket index.
    """
    bucket = (F.unix_timestamp("ts") / F.lit(window_sec)).cast("long")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_timestamp("ts").alias("p_sec"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bkt"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id",
        F.unix_timestamp("ts").alias("e_sec"),
        bucket.alias("bkt"),
    )
    hits = (
        purchases.join(errors, ["user_id", "bkt"])
        .filter(F.abs(F.col("e_sec") - F.col("p_sec")) <= window_sec)
        # a (purchase, error) pair can match in at most one shared bucket
        # key per expansion step, but the error's single bucket meets the
        # purchase's 3-bucket cover exactly once — no dedup needed
        .groupBy("user_id", "purchase_id", "p_sec")
        .agg(F.count(F.lit(1)).alias("n_errors_nearby"))
    )
    all_purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_timestamp("ts").alias("p_sec"),
    )
    return (
        all_purchases.join(hits, ["user_id", "purchase_id", "p_sec"], "left")
        .select(
            "user_id",
            "purchase_id",
            "p_sec",
            F.coalesce("n_errors_nearby", F.lit(0)).cast("long").alias(
                "n_errors_nearby"
            ),
        )
        .orderBy("user_id", "purchase_id")
    )


def funnel_conversion(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel: how many users reach each stage, where stage k
    requires an event of type ``stages[k]`` STRICTLY AFTER the user's
    qualifying stage-(k−1) event (first-touch semantics: each user's
    funnel clock starts at their earliest qualifying event per stage).

    The product-analytics staple. Plan: one filtered aggregate per stage,
    each shuffling on ``user_id``; the stage-to-stage join is on
    ``user_id`` too, so under AQE the exchanges reuse one partitioning.
    The per-stage frames shrink monotonically (funnel property), and the
    final counts are single-row aggregates. No windows over raw events,
    no per-user state larger than one timestamp.

    Output: (stage_idx, stage, n_users) — integers, one row per stage.
    """
    prev = None  # DataFrame(user_id, _t): users who reached the prior stage
    counts = []
    for idx, stage in enumerate(stages):
        ev = events.filter(F.col("event_type") == stage)
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("_t"))
        else:
            cur = (
                ev.join(prev, "user_id")
                .filter(F.col("ts") > F.col("_t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("_t"))
            )
        counts.append(
            cur.agg(
                F.lit(idx).cast("long").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out.orderBy("stage_idx")


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week
    (cohort), counted in each subsequent activity week.

    Cohort assignment is one per-user aggregate (shuffle on user_id);
    activity weeks are a distinct projection joined back on user_id.
    Weeks are ``date_trunc('week')`` (ISO Monday on both engines), the
    offset an exact integer day-diff // 7. The cohort week is emitted as
    an ISO yyyy-MM-dd STRING — date values round-trip differently per
    engine/driver (date vs ns-timestamp), strings are portable. Output:
    (cohort_week, week_offset, n_users).
    """
    cohorts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    return (
        active.join(cohorts, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("week", "cohort_week") / 7).cast("long").alias(
                "week_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def debounce(events: DataFrame, gap_sec: int = 300) -> DataFrame:
    """Event-stream debounce: keep an event only if the previous event of
    the same (user, event_type) is at least ``gap_sec`` older (or there is
    none) — the standard collapse of client retries / double-fires before
    events feed counters or training labels.

    Time deltas are compared in integer epoch-microseconds
    (``unix_micros``), never float seconds, so the keep/drop decision is
    bit-identical on any engine. The lag window shuffles once on the
    (user, event_type) key — the same partitioning every downstream
    per-user aggregate wants, so at scale this step is free if the
    pipeline co-partitions. Ties on ``ts`` break by ``event_id`` for a
    deterministic survivor.

    Output: the surviving (event_id, user_id, event_type, ts) rows.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    return (
        events.select("event_id", "user_id", "event_type", "ts")
        .withColumn("_prev_us", prev_us)
        .filter(
            F.col("_prev_us").isNull()
            | (F.unix_micros("ts") - F.col("_prev_us") >= gap_sec * 1_000_000)
        )
        .drop("_prev_us")
        .orderBy("event_id")
    )


def anomaly_windows(
    events: DataFrame, width_sec: int = 600, trail: int = 3, factor: int = 2
) -> DataFrame:
    """Volume-anomaly detection over tumbling windows: per event type,
    flag windows whose count exceeds ``factor``× the average of the
    ``trail`` preceding windows — the monitoring query an event pipeline
    runs on itself (error-burst / bot-spike detection).

    Two-layer plan: the heavy tumbling aggregate first (fact-scale, one
    exchange), then the frame window over the per-type window series —
    tiny by construction (windows × types), so the unbounded-frame cost
    the fact table could never pay is paid by rows that number in the
    thousands. The comparison is pure integer cross-multiplication
    (``trail_n · count > factor · trail_sum`` with the frame row count
    riding along), so no float threshold can disagree across engines;
    windows with no complete trailing frame (series head) compare
    against the rows that exist, matching the SQL frame semantics.
    """
    from pyspark.sql.window import Window

    counts = (
        events.groupBy(
            F.window("ts", f"{width_sec} seconds").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    frame = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(-trail, -1)
    )
    trailed = counts.select(
        "window_start",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.coalesce(F.sum("n_events").over(frame), F.lit(0))
        .cast("long")
        .alias("trail_sum"),
        F.count(F.lit(1)).over(frame).cast("long").alias("trail_n"),
    )
    return (
        trailed.filter(
            (F.col("trail_n") > 0)
            & (
                F.col("n_events") * F.col("trail_n")
                > F.lit(factor) * F.col("trail_sum")
            )
        )
        .orderBy("event_type", "window_start")
    )


def asof_error_purchase(
    events: DataFrame,
    n_buckets: int | None = None,
    target_bucket_rows: int = 1_000_000,
    max_bucket_rows: int = 8_000_000,
) -> DataFrame:
    """General two-table as-of join via cogrouped ``applyInPandas``: each
    error event matched to the latest purchase at-or-before it, per
    user. ``asof_prior_purchase`` is the single-table window shortcut;
    this is the production shape — two independent tables cogrouped on
    a key, ``pandas.merge_asof`` inside — that works when the sides are
    different tables with no shared event order (here: the purchase and
    error slices standing in for two tables). Oracle: DuckDB's native
    ``ASOF JOIN``.

    The cogroup key is a user BUCKET (``user_id % n_buckets``), not the
    user: cogrouped ``applyInPandas`` pays one Python invocation + Arrow
    round-trip **per group**, which at one-group-per-user dominated
    everything (measured 20.8 s for 1 500 users at sf0.1 → 1.2 s with 64
    buckets). Per-user as-of semantics are preserved exactly by
    ``merge_asof(by="user_id")`` — a vectorized per-key backward search
    within the bucket.

    Bucket count is SIZED FROM THE DATA (r03 verdict scale caveat: a
    fixed 64 meant one bucket = 1/64 of all matching events at any
    volume). One scalar probe (total + max-single-user row counts over
    the error/purchase slice) sets ``n_buckets = ceil(total /
    target_bucket_rows)`` floored at 64, so the expected bucket stays
    under ``target_bucket_rows`` pandas rows at any corpus size while
    call count stays O(buckets). A user's rows are unsplittable by this
    cogroup (``merge_asof(by=)`` needs the whole user), so a single user
    exceeding ``max_bucket_rows`` raises with the remedy (a time-range
    secondary key) named, rather than OOMing an executor mid-job. Pass
    ``n_buckets`` explicitly to skip the probe.

    Determinism: purchases are pre-deduped to one canonical row per
    (user, timestamp) — min event_id — because both the SQL ASOF and
    ``merge_asof`` pick an arbitrary survivor among equal-timestamp
    matches; with unique timestamps the match is unique.
    """
    import math

    import pandas as pd

    relevant = events.filter(F.col("event_type").isin("error", "purchase"))
    if n_buckets is None:
        stats = (
            relevant.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum("c").alias("total"), F.max("c").alias("mx"))
            .collect()[0]
        )
        total, mx = stats["total"] or 0, stats["mx"] or 0
        if mx > max_bucket_rows:
            raise ValueError(
                f"asof_error_purchase: one user has {mx} error/purchase "
                f"rows (> max_bucket_rows={max_bucket_rows}); a user is "
                "unsplittable under merge_asof(by=user_id) — add a "
                "time-range secondary cogroup key or raise the cap"
            )
        n_buckets = max(64, math.ceil(total / target_bucket_rows))

    bucket = (F.col("user_id") % n_buckets).alias("bucket")
    errors = events.filter(F.col("event_type") == "error").select(
        bucket, "user_id", "event_id", "ts"
    )
    # EVERY purchase-side column shared with the error side (ts AND
    # user_id) is renamed IN THE PLAN, not in pandas: both sides descend
    # from the same source attributes, and Spark's cogroup
    # attribute-dedup silently drops the duplicate from one side's Arrow
    # batch when a downstream projection exists (observed for both
    # columns); distinct names keep them.
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
        .select(
            bucket,
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            "purchase_id",
        )
    )

    def _asof(err: pd.DataFrame, pur: pd.DataFrame) -> pd.DataFrame:
        # one side of a cogroup key can be rowless — Spark passes a
        # zero-COLUMN frame then, so bail before touching columns
        if err.empty or pur.empty:
            return pd.DataFrame(
                columns=["user_id", "event_id", "e_sec", "purchase_id", "p_sec"]
            )
        # merge_asof(by=...) needs both sides sorted by the ON key only
        err = err.sort_values(["ts", "event_id"])
        pur = pur.sort_values("p_ts")
        merged = pd.merge_asof(
            err,
            pur[["p_user", "p_ts", "purchase_id"]],
            left_on="ts",
            right_on="p_ts",
            left_by="user_id",
            right_by="p_user",
            direction="backward",
        )
        hit = merged.dropna(subset=["purchase_id"])
        return pd.DataFrame(
            {
                "user_id": hit["user_id"].astype("int64"),
                "event_id": hit["event_id"].astype("int64"),
                "e_sec": hit["ts"].astype("int64") // 1_000_000_000,
                "purchase_id": hit["purchase_id"].astype("int64"),
                "p_sec": hit["p_ts"].astype("int64") // 1_000_000_000,
            }
        )

    out = (
        errors.groupBy("bucket")
        .cogroup(purchases.groupBy("bucket"))
        .applyInPandas(
            lambda e, p: _asof(e, p),
            schema=(
                "user_id bigint, event_id bigint, e_sec bigint, "
                "purchase_id bigint, p_sec bigint"
            ),
        )
    )
    return out.select(
        "user_id",
        "event_id",
        "e_sec",
        "purchase_id",
        "p_sec",
        (F.col("e_sec") - F.col("p_sec")).alias("lag_sec"),
    ).orderBy("user_id", "event_id")


def events_resample(events: DataFrame, freq_sec: int = 3600) -> DataFrame:
    """Gap-filled time-series resample: per event_type, event counts in
    fixed ``freq_sec`` buckets over the type's OWN [min, max] time range,
    with empty buckets emitted as explicit zeros — the densification
    every downstream charting/anomaly/forecast consumer needs (a missing
    bucket and a zero bucket mean different things; ``tumbling_counts``
    only emits observed windows).

    Plan: one hash aggregate to (type, bucket) counts; per-type bounds
    ride the same aggregate's second stage (k-group); the dense grid is
    ``sequence()``-exploded FROM THE BOUNDS ROWS — grid size is
    (range/freq) rows per type, a property of the time span, not the
    event volume, so densification never touches the raw events again;
    one left join fills observed counts in. At 100 TB the grid for a
    year of hourly buckets is 8 760 rows per type — broadcastable
    noise next to the event scan.
    """
    # floor, not cast-truncation: they differ on negative epochs
    # (pre-1970 timestamps), and the oracle's // floors
    bucket = (
        F.floor(F.unix_timestamp("ts") / freq_sec).cast("long") * freq_sec
    ).alias("bucket_start")
    counts = (
        events.select("event_type", bucket)
        .groupBy("event_type", "bucket_start")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.lit(freq_sec).cast("long")
            )
        ).alias("bucket_start"),
    )
    return (
        grid.join(counts, ["event_type", "bucket_start"], "left")
        .select(
            "event_type",
            "bucket_start",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias(
                "n_events"
            ),
        )
        .orderBy("event_type", "bucket_start")
    )


def top_event_paths(
    events: DataFrame,
    gap_sec: int = 1800,
    top_k: int = 20,
) -> DataFrame:
    """Sequential path mining: the ``top_k`` most frequent 3-step
    ``event_type`` sequences occurring inside one session (gap-delimited
    as in ``sessionize``) — the "what do users actually do" readout
    behind funnel design, next-action models, and bot-pattern triage.

    One exchange total for the sequence extraction: session ids AND the
    two look-ahead steps all come from windows over the SAME
    ``(user_id | ts, event_id)`` spec, so Catalyst plans a single hash
    exchange + sort and evaluates the three window functions in one
    pass — no per-session re-partition (a ``partitionBy(user, session)``
    second window would pay a second shuffle for nothing: comparing
    ``lead(session_id, i)`` against the row's own session id filters
    cross-session trigrams identically). The trailing aggregate is
    key-bounded (|event_type|³ paths at most) and the top-k order is
    fully tied down (count DESC, path ASC).
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts", 1).over(by_user))
            > gap_sec,
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    sid = (
        F.sum("_new")
        .over(by_user.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
    )
    steps = flagged.withColumn("_sid", sid).select(
        "event_type",
        "_sid",
        F.lead("event_type", 1).over(by_user).alias("_t1"),
        F.lead("_sid", 1).over(by_user).alias("_s1"),
        F.lead("event_type", 2).over(by_user).alias("_t2"),
        F.lead("_sid", 2).over(by_user).alias("_s2"),
    )
    paths = steps.filter(
        (F.col("_s1") == F.col("_sid")) & (F.col("_s2") == F.col("_sid"))
    ).select(F.concat_ws(">", "event_type", "_t1", "_t2").alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sequences"))
        .orderBy(F.col("n_sequences").desc(), F.col("path").asc())
        .limit(top_k)
    )


def timeseries_gap_fill(
    events: DataFrame, width_sec: int = 600
) -> DataFrame:
    """Dense per-type time series: ``tumbling_counts`` with the EMPTY
    buckets materialized as zero rows — the gap-fill every downstream
    moving-average / anomaly / charting consumer needs (a missing bucket
    and a zero bucket mean different things only until someone computes
    a rate over the series).

    Probe-then-plan: the global [min, max] bucket range is one scalar
    aggregate collected to the driver and re-planted as literals, so the
    dense grid is ``sequence(lo, hi, width)`` exploded against the
    (tiny, broadcast) distinct event-type frame — grid size is
    ``types × buckets``, a METADATA quantity independent of row count.
    The actual per-bucket aggregate joins onto the grid by (type,
    bucket); gaps coalesce to exact zeros. At 100 TB the data path is
    exactly ``tumbling_counts``' one aggregate — the grid costs nothing.

    Output: (event_type, window_start, n_events, sum_value), zero-filled.
    """
    # the sparse series IS tumbling_counts — one source of truth for
    # the bucketing and the exact-decimal sum, so the densified series
    # can never diverge from the operator it claims to fill
    actual = tumbling_counts(events, width_sec).select(
        "event_type",
        "window_start",
        F.col("n_events").alias("_n"),
        F.col("sum_value").alias("_sv"),
    )
    lo_hi = actual.agg(
        F.min("window_start").alias("lo"), F.max("window_start").alias("hi")
    ).collect()[0]
    if lo_hi["lo"] is None:
        return events.sparkSession.createDataFrame(
            [],
            "event_type string, window_start long, n_events long,"
            " sum_value double",
        )
    grid = (
        events.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                events.sparkSession.range(1).select(
                    F.explode(
                        F.sequence(
                            F.lit(int(lo_hi["lo"])),
                            F.lit(int(lo_hi["hi"])),
                            F.lit(int(width_sec)),
                        )
                    ).alias("window_start")
                )
            )
        )
    )
    return (
        grid.join(actual, ["event_type", "window_start"], "left")
        .select(
            "event_type",
            "window_start",
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("_sv", F.lit(0.0)).cast("double").alias("sum_value"),
        )
        .orderBy("event_type", "window_start")
    )


def events_markov_transitions(
    events: DataFrame, gap_sec: int = 1800
) -> DataFrame:
    """First-order Markov transition matrix of ``event_type`` within
    sessions: for every (from, to) pair, the transition count and its
    row-conditional probability in ppm — the next-action model readout
    behind ``top_event_paths``' raw trigram mining (paths tell you what
    sequences exist; this tells you the per-step conditional model).

    Same one-exchange shape as ``top_event_paths``: session ids and the
    single look-ahead both come from windows over the SAME
    ``(user_id | ts, event_id)`` spec — one hash exchange + sort, with
    cross-session transitions filtered by comparing the lead's session
    id (never a second partitioning). The trailing aggregate is
    |event_type|²-bounded, the per-from totals join is broadcast
    (type-bounded), and prob_ppm is BIGINT floor division — exact on
    both engines.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts", 1).over(by_user))
            > gap_sec,
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    sid = (
        F.sum("_new")
        .over(by_user.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
    )
    steps = flagged.withColumn("_sid", sid).select(
        F.col("event_type").alias("from_type"),
        "_sid",
        F.lead("event_type", 1).over(by_user).alias("to_type"),
        F.lead("_sid", 1).over(by_user).alias("_s1"),
    )
    counts = (
        steps.filter(F.col("_s1") == F.col("_sid"))
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    totals = counts.groupBy("from_type").agg(F.sum("_n").alias("_row_n"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("_n").cast("long").alias("n_transitions"),
            F.expr("(_n * 1000000) DIV _row_n")
            .cast("long")
            .alias("prob_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


def inactivity_churn(
    events: DataFrame, churn_days: int = 7
) -> DataFrame:
    """Days-since-last-activity distribution with a churn-risk flag:
    per whole-day inactivity bucket (measured back from the stream's
    own horizon = max event time), how many users last acted there —
    the retention team's "who is going quiet" curve, bucket count
    bounded by the stream's day span.

    One user-keyed aggregate (the only data-scale exchange), the
    horizon as a broadcast single-row aggregate, and integer day
    arithmetic on second-truncated timestamps (the registry's
    ``unix_timestamp`` discipline) — no floats, no windows.
    """
    last = events.groupBy("user_id").agg(F.max("ts").alias("_last"))
    horizon = events.agg(F.max("ts").alias("_h"))
    return (
        last.crossJoin(F.broadcast(horizon))
        .select(
            F.expr(
                "(unix_timestamp(_h) - unix_timestamp(_last)) DIV 86400"
            )
            .cast("long")
            .alias("days_inactive"),
        )
        .groupBy("days_inactive")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            "days_inactive",
            "n_users",
            (F.col("days_inactive") >= churn_days).alias("churn_risk"),
        )
        .orderBy("days_inactive")
    )


def active_user_rollup(events: DataFrame) -> DataFrame:
    """Per-day DAU / trailing-7-day WAU / trailing-30-day MAU distinct
    user counts — the engagement rollup every product dashboard leads
    with, and the canonical "sliding distinct count" problem.

    Scale shape: a sliding DISTINCT can't be windowed (distinct doesn't
    decompose over frames), so each deduped (user, day) membership is
    EMITTED into every window it affects — ``explode`` of a constant
    38-element offset array (1 DAU + 7 WAU + 30 MAU tags) over the
    (user, day)-DISTINCT frame, then one (day, tag) count-distinct.
    Amplification is the constant window-size sum, never data-shaped;
    the alternative day×activity range join re-scans the activity set
    per day. Leading days report partial windows (standard dashboard
    semantics); trailing phantom days (windows extending past the last
    active day) are semi-joined away against the observed-day set.
    Output: one row per active day, BIGINT.
    """
    day = _epoch_day()
    ud = events.select(
        "user_id", day.alias("_day")
    ).distinct()
    offsets = F.array(
        *(
            [F.struct(F.lit(0).alias("_k"), F.lit("d").alias("_w"))]
            + [
                F.struct(F.lit(k).alias("_k"), F.lit("w").alias("_w"))
                for k in range(7)
            ]
            + [
                F.struct(F.lit(k).alias("_k"), F.lit("m").alias("_w"))
                for k in range(30)
            ]
        )
    )
    emitted = ud.select(
        "user_id", "_day", F.explode(offsets).alias("_o")
    ).select(
        "user_id",
        (F.col("_day") + F.col("_o._k")).alias("day_num"),
        F.col("_o._w").alias("_w"),
    )
    counts = (
        emitted.join(
            ud.select(F.col("_day").alias("day_num")).distinct(),
            "day_num",
            "left_semi",
        )
        .groupBy("day_num")
        .agg(
            F.count_distinct(
                F.when(F.col("_w") == "d", F.col("user_id"))
            ).cast("long").alias("dau"),
            F.count_distinct(
                F.when(F.col("_w") == "w", F.col("user_id"))
            ).cast("long").alias("wau"),
            F.count_distinct(
                F.when(F.col("_w") == "m", F.col("user_id"))
            ).cast("long").alias("mau"),
        )
    )
    return counts.orderBy("day_num")


def events_ohlc(events: DataFrame) -> DataFrame:
    """Daily OHLC (open/high/low/close) of ``value`` per event type —
    the time-series downsample every metrics store ships: first and
    last reading plus extremes per (day, type) bucket.

    Scale shape: ONE hash aggregate over (day, type) — ``min_by`` /
    ``max_by`` keyed on the total order (ts, event_id) pick open/close
    with no window and no second scan; high/low/n are plain partial
    aggregates. Values are exact 1e-4 BIGINT units (the registry's
    tie-free quantization); the (ts, event_id) struct key makes
    open/close deterministic under tied timestamps at any parallelism.
    Output: days × types rows, BIGINT-keyed.
    """
    v4 = F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)")
    base = events.select(
        _epoch_day().alias("day_num"),
        "event_type",
        v4.alias("_v4"),
        F.struct("ts", "event_id").alias("_ord"),
    )
    return (
        base.groupBy("day_num", "event_type")
        .agg(
            F.expr("min_by(_v4, _ord)").cast("long").alias("open_u4"),
            F.max("_v4").cast("long").alias("high_u4"),
            F.min("_v4").cast("long").alias("low_u4"),
            F.expr("max_by(_v4, _ord)").cast("long").alias("close_u4"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy("day_num", "event_type")
    )


def cumulative_unique_users(events: DataFrame) -> DataFrame:
    """Running distinct-user count per active day — the "total users
    ever" growth curve. A cumulative DISTINCT can't be windowed, but it
    decomposes exactly into a cumsum of FIRST-SEEN counts: each user
    contributes 1 on their first active day and 0 after.

    Scale shape: one per-user min-day aggregate (the only data-scale
    exchange), a day-keyed count, and a running sum over the
    DAY-cardinality frame (the documented bounded-frame exception —
    thousands of rows at any data scale, on the lint allowlist). Days
    with activity but no new users still report (cum flat). Output:
    one BIGINT row per active day.
    """
    day = _epoch_day()
    first_seen = (
        events.select("user_id", day.alias("_day"))
        .groupBy("user_id")
        .agg(F.min("_day").alias("day_num"))
    )
    new_per_day = first_seen.groupBy("day_num").agg(
        F.count(F.lit(1)).alias("_new")
    )
    active_days = events.select(day.alias("day_num")).distinct()
    per_day = active_days.join(new_per_day, "day_num", "left").select(
        "day_num", F.coalesce("_new", F.lit(0)).alias("_new")
    )
    w = Window.orderBy("day_num").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_day.select(
        "day_num",
        F.col("_new").cast("long").alias("new_users"),
        F.sum("_new").over(w).cast("long").alias("cum_users"),
    ).orderBy("day_num")


def changepoint_scan(events: DataFrame) -> DataFrame:
    """Level-shift scan over the daily event-count series: for every
    candidate split day s, the left/right mean daily volumes (days ≤ s
    vs days > s) and their absolute gap — the classic single-changepoint
    screen ("did traffic step up/down, and when"). The argmax row is
    flagged with (gap desc, day asc) determinism.

    Exactness: counts are integers; means are explicit micro-quantized
    floor divisions (non-negative operands, so flooring and truncating
    engines agree); the gap is their absolute difference — identical
    integer arithmetic on both engines. Scale shape: ONE fact-scale
    day aggregate; the dense day grid between the collected [min, max]
    probe is metadata-sized (``sequence`` of literals, the
    ``timeseries_gap_fill`` pattern), and every window runs over that
    day-cardinality frame (documented bounded-frame exception, lint
    allowlisted). Output: one BIGINT row per split candidate.
    """
    day = _epoch_day()
    daily = events.select(day.alias("day_num")).groupBy("day_num").agg(
        F.count(F.lit(1)).alias("_c")
    )
    # ONE probe collects bounds AND totals, embedded as literals — a
    # derived total.agg crossJoined back would re-execute the daily
    # aggregate + grid join once per plan branch (the documented
    # zorder_layout re-derivation shape)
    bounds = daily.agg(
        F.min("day_num").alias("lo"),
        F.max("day_num").alias("hi"),
        F.sum("_c").alias("total"),
    ).collect()[0]
    if bounds["lo"] is None:
        return events.sparkSession.createDataFrame(
            [],
            "day_num long, n_left long, n_right long, mean_left_micro long,"
            " mean_right_micro long, gap_micro long, is_best long",
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    ts_lit, td_lit = int(bounds["total"]), hi - lo + 1
    grid = events.sparkSession.range(lo, hi + 1).select(
        F.col("id").alias("day_num")
    )
    dense = grid.join(daily, "day_num", "left").select(
        "day_num", F.coalesce("_c", F.lit(0)).alias("_c")
    )
    wcum = Window.orderBy("day_num").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scan = (
        dense.select(
            "day_num",
            F.sum("_c").over(wcum).alias("_sl"),
            F.row_number().over(Window.orderBy("day_num")).alias("_nl"),
        )
        .withColumn("_ts", F.lit(ts_lit).cast("long"))
        .withColumn("_td", F.lit(td_lit).cast("long"))
        .filter(F.col("_nl") < F.col("_td"))  # a split needs a right side
        .select(
            "day_num",
            F.col("_nl").cast("long").alias("n_left"),
            (F.col("_td") - F.col("_nl")).cast("long").alias("n_right"),
            F.expr("(_sl * 1000000) DIV _nl").cast("long").alias(
                "mean_left_micro"
            ),
            F.expr("((_ts - _sl) * 1000000) DIV (_td - _nl)")
            .cast("long")
            .alias("mean_right_micro"),
        )
        .withColumn(
            "gap_micro",
            F.abs(
                F.col("mean_left_micro") - F.col("mean_right_micro")
            ).cast("long"),
        )
    )
    wbest = Window.orderBy(F.col("gap_micro").desc(), F.col("day_num").asc())
    return (
        scan.withColumn(
            "is_best",
            F.when(F.row_number().over(wbest) == 1, 1)
            .otherwise(0)
            .cast("long"),
        )
        .orderBy("day_num")
    )


def conversion_latency_quantiles(
    events: DataFrame,
    ps_ppm: tuple[int, ...] = (500_000, 900_000, 990_000),
    bucket_sec: int = 3600,
) -> DataFrame:
    """Exact view→purchase latency percentiles across converting users:
    per user, the first view and the first purchase strictly after it
    (full-microsecond comparison); then percentile_disc over the
    per-user latencies — the "how long does conversion take" readout.

    Scale shape: one user-keyed aggregate produces the latency set
    (user-cardinality), then the ``price_quantiles`` two-phase
    discipline: an hour-bucket histogram (bounded rows, the only
    collect), rank→(bucket, local rank) mapping on the driver, and a
    per-bucket window over ONLY the hit buckets — no global window at
    any scale. percentile_disc (pick) semantics survive engine type
    differences; rank ties break on user_id.
    """
    mic = F.unix_micros("ts")
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", mic)
            ).alias("_v"),
        )
        .join(
            events.select("user_id", "event_type", mic.alias("_m")),
            "user_id",
        )
        .groupBy("user_id", "_v")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("_m") > F.col("_v")),
                    F.col("_m"),
                )
            ).alias("_p")
        )
        .filter(F.col("_v").isNotNull() & F.col("_p").isNotNull())
        .select(
            "user_id",
            F.expr("(_p - _v) DIV 1000000").cast("long").alias(
                "latency_sec"
            ),
        )
    )
    from mapreduceindex_spark.functions import caching
    from mapreduceindex_spark.operators.sketches import nearest_rank_pick

    caching.release("conversion_latency_quantiles")
    # persisted: the lineage above (events self-join + two aggregates)
    # is the operator's heaviest part, and the two-phase engine
    # traverses it twice (histogram collect + the returned ranked plan)
    bucketed = caching.track(
        per_user.select(
            F.expr(f"latency_sec DIV {int(bucket_sec)}").alias("bucket"),
            "latency_sec",
            "user_id",
        ).persist(),
        "conversion_latency_quantiles",
    )

    def rank_for(n):
        return [
            (int(p), min(max(-(-(p * n) // 1_000_000), 1), n))
            for p in ps_ppm
        ]

    picked = nearest_rank_pick(
        bucketed, "latency_sec", "user_id", rank_for, "p_ppm long"
    )
    spark = events.sparkSession
    out_schema = "p_ppm long, latency_sec long"
    if picked is None:
        return spark.createDataFrame([], out_schema)
    return picked.select("p_ppm", "latency_sec").orderBy("p_ppm")


def events_ewma(events: DataFrame, alpha_ppm: int = 300_000) -> DataFrame:
    """Exponentially-weighted moving average of the daily event count —
    the smoothed baseline behind alerting thresholds, and the
    registry's sequential-fold surface: an EWMA is inherently
    recursive (each value feeds the next), the one time-series shape
    the window family genuinely cannot express.

    Exact integer recursion in micro-units, identical on both engines
    (all operands non-negative, so truncating division IS floor):

        e(lo) = c(lo) · 1e6
        e(t)  = α·c(t) + ((1e6 − α) · e(t−1)) DIV 1e6

    over the DENSE day grid (gap days decay with c = 0). Scale shape:
    ONE day-keyed fact aggregate (the only data-scale exchange), then
    the fold runs DRIVER-SIDE over the collected day series — the
    probe-then-plan discipline (``changepoint_scan``'s grid,
    ``nearest_rank_pick``'s histogram): the series is day-cardinality
    (metadata-sized at any data scale), and the measured alternative —
    Spark 4's ``WITH RECURSIVE``, which this repo pins as working in
    ``tests/test_round8_ops.py`` — costs one scheduled join job PER
    DAY (~0.3 s each, 10 s for a 30-day fixture): per-iteration
    scheduling dwarfs the arithmetic, exactly the wrong trade for a
    bounded sequential fold. The DuckDB oracle runs the recursion as a
    recursive CTE — same formula, engine-appropriate physical shape on
    each side. A per-day count beyond ~9.2e6 would overflow the micro
    fold and raises loudly (the ``yoy`` guard discipline).
    """
    spark = events.sparkSession
    a = int(alpha_ppm)
    daily = (
        events.select(_epoch_day().alias("day"))
        .groupBy("day")
        .agg(
            F.expr(
                "CASE WHEN count(1) > 9000000 THEN raise_error("
                "'events_ewma: daily count overflows the micro fold') "
                "ELSE CAST(count(1) AS BIGINT) END"
            ).alias("c")
        )
    )
    rows = {int(r["day"]): int(r["c"]) for r in daily.collect()}
    out_schema = "day_num long, n_events long, ewma_micro long"
    if not rows:
        return spark.createDataFrame([], out_schema)
    lo, hi = min(rows), max(rows)
    out = []
    e = rows[lo] * 1_000_000
    out.append((lo, rows[lo], e))
    for day in range(lo + 1, hi + 1):
        c = rows.get(day, 0)
        e = a * c + ((1_000_000 - a) * e) // 1_000_000
        out.append((day, c, e))
    return spark.createDataFrame(out, out_schema)


def ewma_recursive_cte(
    events: DataFrame, alpha_ppm: int = 300_000
) -> DataFrame:
    """The ``WITH RECURSIVE`` formulation of :func:`events_ewma` —
    result-identical (pinned by test), kept OUT of the registry path
    because Spark schedules one join job per recursion step (measured
    ~0.3 s/day; the driver fold is the right physical shape for a
    metadata-sized sequential series). Exists to pin the recursive-CTE
    API surface and as the reference for day-bounded recursions that
    DO belong in-engine on an unbounded-width state."""
    from mapreduceindex_spark.functions import caching

    spark = events.sparkSession
    a = int(alpha_ppm)
    # tracked persist (released on the next call, the repo discipline):
    # the recursion's iterations must hit the cache, not re-scan
    caching.release("ewma_recursive_cte")
    daily = caching.track(
        events.select(_epoch_day().alias("day"))
        .groupBy("day")
        .agg(F.expr("CAST(count(1) AS BIGINT)").alias("c"))
        .persist(),
        "ewma_recursive_cte",
    )
    daily.count()
    # application-id suffix: session-scoped view either way, but never
    # rebindable by a concurrent session/thread mid-recursion
    view = "mrix_ewma_daily_" + spark.sparkContext.applicationId.replace(
        "-", "_"
    )
    daily.createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH RECURSIVE b AS (
          SELECT min(day) AS lo, max(day) AS hi FROM {view}
        ), ew (day_num, hi, ewma_micro) AS (
          SELECT b.lo, b.hi,
                 (SELECT c FROM {view} WHERE day = b.lo)
                   * CAST(1000000 AS BIGINT)
          FROM b WHERE b.lo IS NOT NULL
          UNION ALL
          SELECT e.day_num + 1, e.hi,
                 {a} * coalesce(d.c, 0)
                   + (({1_000_000 - a}) * e.ewma_micro) DIV 1000000
          FROM ew e LEFT JOIN {view} d ON d.day = e.day_num + 1
          WHERE e.day_num < e.hi
        )
        SELECT ew.day_num,
               CAST(coalesce(d.c, 0) AS BIGINT) AS n_events,
               CAST(ew.ewma_micro AS BIGINT) AS ewma_micro
        FROM ew LEFT JOIN {view} d ON d.day = ew.day_num
        ORDER BY day_num
    """)


def outer_attribution(
    events: DataFrame, window_sec: int = 600, delay_sec: int = 3600
) -> DataFrame:
    """Maturity-gated view→purchase attribution — the batch twin of
    ``streaming.pipelines.streaming_outer_join``, sharing its oracle:
    every view pairs with same-user purchases in ``[v_ts, v_ts +
    window]``; a view is declared UNCONVERTED (NULL purchase columns)
    only once the data horizon proves its window closed, and a view
    whose window is still open at the horizon is withheld — exactly the
    verdict set a continuously-running outer join would have emitted by
    now. Declaring "no purchase" for a still-open window is the
    attribution mistake this gate exists to prevent.

    The horizon replicates the stream's final watermark bit-for-bit:
    per event side, the max event time truncated to MILLISECONDS minus
    the delay; global = min of sides; comparison strict ``<`` against
    ``unix_micros(v_ts) + window·1e6``. Horizon maxes are a single-row
    collected probe embedded as literals (no per-row re-derivation);
    the join itself is one user-keyed left join with the range
    predicate pushed into the join condition.
    """
    v = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    probe = events.agg(
        F.max(
            F.when(F.col("event_type") == "view", F.unix_millis("ts"))
        ).alias("_vmax"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.unix_millis("ts"))
        ).alias("_pmax"),
    ).collect()[0]
    wm_us = (
        (min(probe["_vmax"], probe["_pmax"]) - delay_sec * 1000) * 1000
        if probe["_vmax"] is not None and probe["_pmax"] is not None
        else None
    )
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.unix_micros("p_ts") >= F.unix_micros("v_ts"))
        & (
            F.unix_micros("p_ts")
            <= F.unix_micros("v_ts") + window_sec * 1_000_000
        ),
        "left",
    )
    return (
        joined.filter(
            F.col("purchase_id").isNotNull()
            | (
                F.unix_micros("v_ts") + window_sec * 1_000_000
                < F.lit(wm_us).cast("long")
            )
        )
        .select(
            "view_id",
            "user_id",
            F.col("purchase_id").cast("long").alias("purchase_id"),
            (F.unix_micros("p_ts") - F.unix_micros("v_ts"))
            .cast("long")
            .alias("lag_usec"),
        )
        .orderBy("view_id", "purchase_id")
    )


def weekday_seasonality(events: DataFrame) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap with traffic share —
    the seasonality profile behind capacity planning and anomaly
    baselines ("is Tuesday 3am supposed to be this busy").

    Engine-proof calendar arithmetic: day-of-week derives from epoch-day
    modulo (``floor_mod(epoch_day + 3, 7)``, 0 = Monday — 1970-01-01 was
    a Thursday), never an engine's ``dayofweek`` whose week origin
    differs between Spark (1 = Sunday) and DuckDB (0 = Sunday); the
    hour is ``floor_mod(epoch_sec, 86400) DIV 3600``. Both the epoch-day
    and the modulos are FLOORED (``functions.exact.floor_div_sql`` /
    ``floor_mod_sql``), so pre-1970 (negative-epoch) timestamps land on
    their true calendar day/dow/hour — a truncating ``DIV``/``%`` would
    put 1969-12-31 23:59:59 in Thursday hour 0 instead of Wednesday
    hour 23. Identical formula text on both engines. One fact
    aggregate, ≤ 168 output rows, share in integer ppm against the
    broadcast total.
    """
    ed = floor_div_sql(_EPOCH, 86400, "DIV")
    base = events.select(
        F.expr(floor_mod_sql(f"({ed}) + 3", 7)).alias("dow"),
        F.expr(f"{floor_mod_sql(_EPOCH, 86400)} DIV 3600").alias("hour"),
    )
    counts = base.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    total = counts.agg(F.sum("n_events").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("hour").cast("long").alias("hour"),
            "n_events",
            F.expr("(n_events * 1000000) DIV _t").cast("long").alias(
                "share_ppm"
            ),
        )
        .orderBy("dow", "hour")
    )


def user_event_sequences(events: DataFrame) -> DataFrame:
    """Per user, the full time-ordered event-type sequence as one
    string — the session-mining/export shape (and the ordered
    ``collect_list`` surface done right: ``sort_array`` over
    ``(ts, event_id, type)`` structs makes the order a property of the
    DATA, not of partition arrival — a bare collect_list would be
    nondeterministic under any parallelism).

    Scale shape: ONE user-keyed aggregate; per-user state is that
    user's event count (the same per-key bound every sessionizer here
    carries). Output strings serialize the arrays for the driver's
    hash compare (the registry's array-column discipline).
    """
    arr = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return (
        events.groupBy("user_id")
        .agg(arr.alias("_a"))
        .select(
            "user_id",
            F.size("_a").cast("long").alias("n_events"),
            F.array_join(
                F.transform(F.col("_a"), lambda x: x["event_type"]), " "
            ).alias("sequence"),
        )
        .orderBy("user_id")
    )


def event_mix_drift(events: DataFrame) -> DataFrame:
    """Day-over-day drift of the event-type mix: per day, the L1
    distance (in ppm) between today's and yesterday's event-type share
    vectors — the cheap distribution-shift alarm a pipeline puts in
    front of expensive retraining ("did the traffic composition jump").

    Exact integers end to end: shares are ``count·1e6 DIV total`` and
    the drift sums |share − prev_share| over the union of types (a
    type absent one day contributes its full share). Consecutive-day
    pairs come from an equi-join on ``day_num − 1`` — never a window —
    so the whole plan is day×type-bounded aggregates after ONE fact
    scan. Days with no previous active day report nothing (no
    denominator exists).
    """
    day = _epoch_day()
    counts = (
        events.select(day.alias("day_num"), "event_type")
        .groupBy("day_num", "event_type")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return mix_drift_from_counts(counts)


def mix_drift_from_counts(counts: DataFrame) -> DataFrame:
    """The share/L1 fold of ``event_mix_drift`` over a prebuilt
    (day_num, event_type, _c) count frame — shared with the streaming
    twin, whose counts arrive from a stateful aggregate instead of a
    batch scan (one ground truth, two count sources)."""
    totals = counts.groupBy("day_num").agg(F.sum("_c").alias("_t"))
    shares = counts.join(totals, "day_num").select(
        "day_num",
        "event_type",
        F.expr("(_c * 1000000) DIV _t").alias("_s"),
    )
    prev = shares.select(
        (F.col("day_num") + 1).alias("day_num"),
        "event_type",
        F.col("_s").alias("_p"),
    )
    # full outer on (day, type) within the joined day pair; keep only
    # days where BOTH sides were active (drift vs silence is vacuous)
    both_days = totals.select("day_num").join(
        totals.select((F.col("day_num") + 1).alias("day_num")),
        "day_num",
        "left_semi",
    )
    paired = (
        shares.join(prev, ["day_num", "event_type"], "full")
        .join(both_days, "day_num", "left_semi")
        .select(
            "day_num",
            F.abs(
                F.coalesce("_s", F.lit(0)) - F.coalesce("_p", F.lit(0))
            ).alias("_d"),
        )
    )
    return (
        paired.groupBy("day_num")
        .agg(F.sum("_d").cast("long").alias("drift_ppm"))
        .orderBy("day_num")
    )


def events_holt(
    events: DataFrame, alpha_ppm: int = 300_000, beta_ppm: int = 100_000
) -> DataFrame:
    """Holt double exponential smoothing of the daily event count —
    ``events_ewma`` plus a TREND state, the forecasting shape for
    series that drift (an EWMA lags a ramp forever; Holt's trend term
    closes the gap), and the second member of the sequential-fold
    family the window API cannot express.

    Exact integer recursion in micro-units over the dense day grid
    (gap days decay with c = 0), both engines verbatim:

        l(lo) = c(lo)·1e6,  b(lo) = 0
        l(t)  = α·c(t) + fdiv((1e6−α)·(l(t−1)+b(t−1)), 1e6)
        b(t)  = fdiv(β·(l(t)−l(t−1)), 1e6) + fdiv((1e6−β)·b(t−1), 1e6)

    where ``fdiv`` is the FLOORED division (``exact.floor_div_sql``'s
    formula; Python's ``//`` natively) — required, unlike the EWMA,
    because the trend state goes NEGATIVE on declining series and a
    truncating DIV would round the two engines apart. Per-day counts
    past ~9.2e6 raise loudly (the micro-fold overflow guard).

    Scale shape: ONE day-keyed fact aggregate (the only data-scale
    exchange); the fold runs driver-side over the collected
    day-cardinality series — the ``events_ewma`` physical trade,
    measured there against Spark 4's per-day-join ``WITH RECURSIVE``.
    The DuckDB oracle runs the same recursion as a recursive CTE.

    Output: (day_num, n_events, level_micro, trend_micro), day order.
    """
    spark = events.sparkSession
    a, b_ = int(alpha_ppm), int(beta_ppm)
    daily = (
        events.select(_epoch_day().alias("day"))
        .groupBy("day")
        .agg(
            F.expr(
                "CASE WHEN count(1) > 9000000 THEN raise_error("
                "'events_holt: daily count overflows the micro fold') "
                "ELSE CAST(count(1) AS BIGINT) END"
            ).alias("c")
        )
    )
    rows = {int(r["day"]): int(r["c"]) for r in daily.collect()}
    out_schema = "day_num long, n_events long, level_micro long, trend_micro long"
    if not rows:
        return spark.createDataFrame([], out_schema)
    lo, hi = min(rows), max(rows)
    lev = rows[lo] * 1_000_000
    trend = 0
    out = [(lo, rows[lo], lev, trend)]
    for day in range(lo + 1, hi + 1):
        c = rows.get(day, 0)
        prev = lev
        lev = a * c + ((1_000_000 - a) * (prev + trend)) // 1_000_000
        trend = (b_ * (lev - prev)) // 1_000_000 + (
            (1_000_000 - b_) * trend
        ) // 1_000_000
        out.append((day, c, lev, trend))
    return spark.createDataFrame(out, out_schema)


def holt_oracle_sql(
    alpha_ppm: int = 300_000, beta_ppm: int = 100_000
) -> str:
    """DuckDB twin of :func:`events_holt` — the same recursion as a
    recursive CTE. The new trend depends on the NEW level, which SQL
    cannot alias inside one SELECT, so the level expression is inlined
    twice (built here programmatically to keep the two copies
    identical). ``fdiv`` is the floored division valid for the
    negative trend state (``exact.floor_div_sql`` with ``//``)."""
    from mapreduceindex_spark.functions.exact import floor_div_sql

    a, b_ = int(alpha_ppm), int(beta_ppm)

    def fdiv(x: str) -> str:
        return floor_div_sql(x, 1_000_000, "//")

    lev_new = (
        f"{a} * coalesce(d.c, 0) + "
        + fdiv(f"{1_000_000 - a} * (e.lev + e.tr)")
    )
    tr_new = (
        fdiv(f"{b_} * (({lev_new}) - e.lev)")
        + " + "
        + fdiv(f"{1_000_000 - b_} * e.tr")
    )
    return f"""
        WITH RECURSIVE daily AS (
          SELECT day, count(1)::BIGINT AS c FROM (
            SELECT ((epochb - (((epochb % 86400) + 86400) % 86400))
                    // 86400) AS day
            FROM (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS epochb
                  FROM events)
          ) GROUP BY day
        ), b AS (
          SELECT min(day) AS lo, max(day) AS hi FROM daily
        ), hw(day_num, hi, lev, tr) AS (
          SELECT b.lo, b.hi,
                 (SELECT c FROM daily WHERE day = b.lo)
                   * CAST(1000000 AS BIGINT),
                 CAST(0 AS BIGINT)
          FROM b WHERE b.lo IS NOT NULL
          UNION ALL
          SELECT e.day_num + 1, e.hi, {lev_new}, {tr_new}
          FROM hw e LEFT JOIN daily d ON d.day = e.day_num + 1
          WHERE e.day_num < e.hi
        )
        SELECT hw.day_num,
               coalesce(d.c, 0)::BIGINT AS n_events,
               hw.lev::BIGINT AS level_micro,
               hw.tr::BIGINT AS trend_micro
        FROM hw LEFT JOIN daily d ON d.day = hw.day_num
        ORDER BY day_num
    """


def events_stl_decompose(events: DataFrame, period: int = 7) -> DataFrame:
    """Classical additive decomposition of the daily revenue series into
    trend + seasonal + remainder — the "is this dip a trend break or
    just a weekend" readout behind every capacity forecast, done the
    textbook way (moving-average trend, periodic-mean seasonal):

    1. **trend** — centered ``period``-observation moving average over
       the day-ordered series (rows-based frame; defined only where the
       full window exists, so the series head/tail carry NULL trend).
    2. **seasonal** — per day-of-week floored mean of the detrended
       values (value − trend) across the rows where trend exists.
    3. **remainder** — value − trend − seasonal.

    Exactness: revenue is summed in 4-dp integer units (the
    ``events_resample`` v4 formula); the trend mean and the seasonal
    mean are FLOORED integer divisions (``exact.floor_div_sql`` — the
    detrended values go negative below trend, where a truncating DIV
    would round the engines apart). Day-of-week derives from the
    epoch-day modulo (``floor_mod(day+3, 7)``, 0 = Monday), never an
    engine ``dayofweek``. Everything BIGINT end to end.

    Scale shape: one day-keyed fact aggregate is the only data-scale
    exchange; the windows and the seasonal join run over the
    day-cardinality series (thousands of rows for years of data), so
    the unbounded ORDER BY window is paid by a frame that fits one
    task. Output: one row per observed day, ordered by day.
    """
    p = int(period)
    daily = (
        events.select(
            _epoch_day().alias("day_num"),
            F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").alias("_v4"),
        )
        .groupBy("day_num")
        .agg(F.sum("_v4").cast("long").alias("revenue_u4"))
    )
    w = Window.orderBy("day_num").rowsBetween(-(p // 2), p // 2)
    trended = daily.select(
        "day_num",
        F.expr(floor_mod_sql("day_num + 3", 7)).alias("dow"),
        "revenue_u4",
        F.when(
            F.count(F.lit(1)).over(w) == p,
            F.expr(floor_div_sql(f"sum(revenue_u4) OVER (ORDER BY day_num ROWS BETWEEN {p // 2} PRECEDING AND {p // 2} FOLLOWING)", p, "DIV")),
        ).alias("trend_u4"),
    )
    seasonal = (
        trended.filter(F.col("trend_u4").isNotNull())
        .groupBy("dow")
        .agg(
            F.expr(
                floor_div_sql("sum(revenue_u4 - trend_u4)", "count(1)", "DIV")
            )
            .cast("long")
            .alias("seasonal_u4")
        )
    )
    return (
        trended.join(F.broadcast(seasonal), "dow", "left")
        .select(
            F.col("day_num").cast("long"),
            F.col("dow").cast("long"),
            "revenue_u4",
            F.col("trend_u4").cast("long").alias("trend_u4"),
            F.when(F.col("trend_u4").isNotNull(), F.col("seasonal_u4"))
            .cast("long")
            .alias("seasonal_u4"),
            F.when(
                F.col("trend_u4").isNotNull(),
                F.col("revenue_u4") - F.col("trend_u4") - F.col("seasonal_u4"),
            )
            .cast("long")
            .alias("remainder_u4"),
        )
        .orderBy("day_num")
    )


def events_stl_decompose_oracle_sql(period: int = 7) -> str:
    """DuckDB twin of :func:`events_stl_decompose` — identical frames,
    floored divisions, and NULL-edge semantics."""
    p = int(period)
    h = p // 2
    ed = floor_div_sql("CAST(FLOOR(epoch(ts)) AS BIGINT)", 86400, "//")
    ma_sum = (
        f"sum(revenue_u4) OVER (ORDER BY day_num "
        f"ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING)"
    )
    ma_n = (
        f"count(*) OVER (ORDER BY day_num "
        f"ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING)"
    )
    return f"""
WITH daily AS (
  SELECT {ed} AS day_num,
         sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))::BIGINT
           AS revenue_u4
  FROM events GROUP BY 1
), trended AS (
  SELECT day_num,
         {floor_mod_sql("day_num + 3", 7)} AS dow,
         revenue_u4,
         CASE WHEN {ma_n} = {p}
              THEN {floor_div_sql(ma_sum, p, "//")} END AS trend_u4
  FROM daily
), seasonal AS (
  SELECT dow,
         {floor_div_sql("sum(revenue_u4 - trend_u4)", "count(1)", "//")}::BIGINT
           AS seasonal_u4
  FROM trended WHERE trend_u4 IS NOT NULL GROUP BY dow
)
SELECT t.day_num::BIGINT AS day_num,
       t.dow::BIGINT AS dow,
       t.revenue_u4,
       t.trend_u4::BIGINT AS trend_u4,
       CASE WHEN t.trend_u4 IS NOT NULL THEN s.seasonal_u4 END::BIGINT
         AS seasonal_u4,
       CASE WHEN t.trend_u4 IS NOT NULL
            THEN t.revenue_u4 - t.trend_u4 - s.seasonal_u4 END::BIGINT
         AS remainder_u4
FROM trended t LEFT JOIN seasonal s USING (dow)
ORDER BY day_num
"""


def ks_drift_test(events: DataFrame) -> DataFrame:
    """Exact-integer two-sample Kolmogorov–Smirnov drift test per event
    type: did the value distribution shift between the corpus's early
    and late halves? The snapshot-drift alarm for a continuously
    ingested training stream, next to ``event_mix_drift`` (which
    compares SHARES of types; this compares each type's value
    DISTRIBUTION against itself over time).

    The statistic is computed without a single float until the ppm
    readout: with n1/n2 the half sizes and c1(v)/c2(v) the cumulative
    counts at each observed cents value, D = max |F1−F2| =
    max |c1·n2 − c2·n1| / (n1·n2) — the numerator is BIGINT-exact, so
    ``d_ppm`` is a floored integer. The α=0.05 decision
    D > 1.358·√((n1+n2)/(n1·n2)) is cross-multiplied into integers too:
    reject ⟺ 10⁶·D_scaled² > 1 844 164·(n1+n2)·n1·n2 — both sides in
    DECIMAL(38,0), no sqrt anywhere (the ``price_qty_regression``
    HUGEINT-moment discipline). c² = 1.358² = 1.844164 exactly.

    The early/late cut is the probe-free floored midpoint of the
    event-time range (the ``rfm_migration`` pattern): a 1-row bounds
    frame broadcast onto the scan, never a collected literal.

    Plan shape: one aggregate to (type, cents, side counts) — map-side
    combined, output bounded by distinct values per type — then a
    window cumsum over that bounded frame and a per-type max. Two
    shuffles, no data×data joins; the ECDF comparison never
    materializes either sample. Types with an empty half are excluded
    (the statistic is undefined).

    Columns: (event_type, n_early, n_late, n_values, d_scaled, d_ppm,
    reject_05), ordered by event_type.
    """
    mid = floor_div_sql("min(unix_micros(ts)) + max(unix_micros(ts))", 2, "DIV")
    bounds = events.agg(F.expr(mid).alias("mid_us"))
    sided = (
        events.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
            F.expr(
                "CASE WHEN unix_micros(ts) <= mid_us THEN 0 ELSE 1 END"
            ).alias("side"),
        )
    )
    per_value = sided.groupBy("event_type", "cents").agg(
        F.sum(F.expr("CASE WHEN side = 0 THEN 1 ELSE 0 END")).alias("d1"),
        F.sum(F.expr("CASE WHEN side = 1 THEN 1 ELSE 0 END")).alias("d2"),
    )
    return ks_stat_from_value_counts(per_value)


def ks_stat_from_value_counts(per_value: DataFrame) -> DataFrame:
    """Shared KS readout over a (event_type, cents, d1, d2) value-count
    frame — the exact-integer statistic, ppm, and cross-multiplied
    α=0.05 decision documented on :func:`ks_drift_test`. Shared with
    ``streaming_ks_drift`` so the batch and streaming forms are
    definitionally consistent (the ``events``/``streaming`` discipline
    from the module docstring)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_value.select(
        "event_type",
        "cents",
        F.sum("d1").over(w).alias("c1"),
        F.sum("d2").over(w).alias("c2"),
    )
    totals = per_value.groupBy("event_type").agg(
        F.sum("d1").cast("long").alias("n1"), F.sum("d2").cast("long").alias("n2")
    )
    return (
        cum.join(totals, "event_type")
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .groupBy("event_type")
        .agg(
            F.max("n1").alias("n_early"),
            F.max("n2").alias("n_late"),
            F.count(F.lit(1)).alias("n_values"),
            F.max(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).cast("long").alias("d_scaled"),
        )
        .select(
            "event_type",
            "n_early",
            "n_late",
            "n_values",
            "d_scaled",
            F.expr("d_scaled * 1000000L DIV (n_early * n_late)").alias("d_ppm"),
            F.expr(
                "CAST(CASE WHEN CAST(d_scaled AS DECIMAL(38,0))"
                " * CAST(d_scaled AS DECIMAL(38,0)) * 1000000"
                " > CAST(1844164 AS DECIMAL(38,0))"
                " * (n_early + n_late) * n_early * n_late"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("reject_05"),
        )
        .orderBy("event_type")
    )


def kaplan_meier_retention(events: DataFrame, censor_days: int = 7) -> DataFrame:
    """Kaplan–Meier user-retention curve: the survival probability that
    a user's active lifetime (days between first and last event)
    exceeds t, with users still active near the corpus edge treated as
    CENSORED rather than churned — the estimator that makes "average
    lifetime" honest when the observation window cuts lives short
    (Kaplan & Meier, JASA 1958). The time-to-event companion of
    ``inactivity_churn``'s fixed-cutoff rate.

    Semantics: lifetime t = last_day − first_day per user; a user whose
    last event falls within ``censor_days`` of the corpus's last day is
    censored at t (they exit the risk set but contribute no death).
    S(t) = Π_{u ≤ t, d_u > 0} (n_u − d_u)/n_u over the ordered life
    table, computed as a floored ppm integer fold — d = 0 rows multiply
    by n/n and leave S exactly unchanged, so one uniform formula runs
    on both engines.

    Scale shape: ONE user-keyed aggregate (the only data-scale
    exchange) folds the corpus to per-user (first, last); a second
    bounded aggregate folds users to the life table — at most one row
    per distinct lifetime, i.e. day-range-bounded at ANY scale
    (the ``revenue_acf`` argument). The sequential survival product
    then runs DRIVER-SIDE over that bounded table (the ``events_ewma``
    probe-then-plan discipline and its measured WITH-RECURSIVE
    trade-off); the DuckDB oracle replays it as a recursive CTE — same
    formula, engine-appropriate shape on each side.

    Columns: (t_days, n_risk, n_events, n_censored, s_ppm), one row
    per distinct observed lifetime, ordered by t_days.
    """
    spark = events.sparkSession
    ed = _epoch_day()
    life = (
        events.select(F.col("user_id"), ed.alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("f"), F.max("d").alias("l"))
    )
    end = life.agg(F.max("l").alias("e"))
    tab = (
        life.crossJoin(F.broadcast(end))
        .select(
            (F.col("l") - F.col("f")).alias("t"),
            F.expr(
                f"CASE WHEN l <= e - {int(censor_days)} THEN 1 ELSE 0 END"
            ).alias("ev"),
        )
        .groupBy("t")
        .agg(
            F.sum("ev").cast("long").alias("d"),
            F.sum(1 - F.col("ev")).cast("long").alias("c"),
        )
    )
    rows = sorted(
        ((int(r["t"]), int(r["d"]), int(r["c"])) for r in tab.collect())
    )
    out_schema = (
        "t_days long, n_risk long, n_events long, n_censored long, s_ppm long"
    )
    if not rows:
        return spark.createDataFrame([], out_schema)
    remaining = sum(d + c for _, d, c in rows)
    s = 1_000_000
    out = []
    for t, d, c in rows:
        s = s * (remaining - d) // remaining
        out.append((t, remaining, d, c, s))
        remaining -= d + c
    return spark.createDataFrame(out, out_schema).orderBy("t_days")


def sequential_patterns(events: DataFrame, min_support: int = 5) -> DataFrame:
    """GAPPED sequential-pattern support (the PrefixSpan/GSP counting
    semantics, Pei et al. ICDE'01): for every ordered event-type pair
    a→b, how many USERS ever did b strictly after their first a —
    regardless of what happened in between. The complement of
    ``top_event_paths`` (contiguous 3-step paths inside one session):
    gapped patterns catch "viewed, then eventually purchased days
    later", which contiguous path mining structurally cannot.

    Support counting uses the first-occurrence reduction: user u
    supports a→b ⟺ u has a b-event strictly after u's FIRST a-event
    (if any b follows any a, one follows the first a). So the corpus
    folds to per-(user, type) first/last timestamps — ONE user-keyed
    aggregate, the only data-scale exchange — and the pattern test is
    ``last_b > first_a`` over the per-user type summaries, a self-join
    bounded by users × types², never events². ``lift_ppm`` compares
    the support against independence (support_a · support_b / n_users)
    in floored ppm.

    Ties: an a and b at the SAME timestamp do not count as a→b
    (strict >), so a→a requires two distinct a-timestamps.

    int64 headroom: ``lift_ppm``'s numerator is n_users_ab · n_users ·
    1e6, valid while n_users_ab · n_users < 9.2e12 (e.g. 3M users at
    full support) — beyond that, rescale the ppm factor before the
    product (the ``jl_distortion_report`` discipline).

    Columns: (type_a, type_b, n_users_ab, n_users_a, n_users_b,
    support_ppm, lift_ppm), support ≥ ``min_support``, ordered by
    (n_users_ab desc, type_a, type_b).
    """
    per = events.groupBy("user_id", "event_type").agg(
        F.min(F.expr("unix_micros(ts)")).alias("first_us"),
        F.max(F.expr("unix_micros(ts)")).alias("last_us"),
    )
    return patterns_from_first_last(per, min_support)


def patterns_from_first_last(
    per: DataFrame, min_support: int = 5
) -> DataFrame:
    """Shared pattern-support tail over a (user_id, event_type,
    first_us, last_us) summary frame — used by the batch
    :func:`sequential_patterns` and the streaming twin (where min/max
    timestamps ARE the streaming state: both are commutative and
    idempotent, so the summary — and therefore every pattern count —
    is micro-batching- and order-independent)."""
    n_users = per.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    type_support = per.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sup")
    )
    # renamed projections, not alias+col: the streaming twin feeds a
    # memory-sink frame whose self-join would otherwise trip Spark's
    # ambiguous-self-join column resolution
    a_side = per.select(
        F.col("user_id").alias("uid"),
        F.col("event_type").alias("type_a"),
        F.col("first_us").alias("first_a"),
    )
    b_side = per.select(
        F.col("user_id").alias("uid"),
        F.col("event_type").alias("type_b"),
        F.col("last_us").alias("last_b"),
    )
    ab = (
        a_side.join(b_side, "uid")
        .filter(F.col("last_b") > F.col("first_a"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users_ab"))
        .filter(F.col("n_users_ab") >= min_support)
    )
    return (
        ab.join(
            F.broadcast(
                type_support.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n_sup").alias("n_users_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                type_support.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n_sup").alias("n_users_b"),
                )
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_users_ab",
            "n_users_a",
            "n_users_b",
            F.expr("n_users_ab * 1000000L DIV n_users").alias("support_ppm"),
            F.expr(
                "(n_users_ab * n_users * 1000000L)"
                " DIV (n_users_a * n_users_b)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("n_users_ab").desc(), "type_a", "type_b")
    )


def theil_sen_trend(events: DataFrame) -> DataFrame:
    """Theil–Sen robust trend of the daily revenue series: the MEDIAN
    of all pairwise slopes — up to ~29% of the days can be corrupted
    (holiday spikes, outages, backfills) without moving the estimate,
    where ``price_qty_regression``-style OLS follows every outlier.

    Exactness: daily revenue in 4-dp integer units; each pair's slope
    is quantized to a floored MILLI integer (sign-aware floored
    division — ``exact.floor_div_sql`` with the always-positive day
    gap); the reported slope is the percentile_disc-style nearest-rank
    MEDIAN of those integer slopes (value at 1-based rank ⌈n/2⌉ under
    (slope, day-pair) order), so both engines pick the identical
    element. The intercept is the same nearest-rank median of the
    per-day residual levels ``rev − (slope · (day − day₀)) DIV 1000``
    under the chosen slope (day₀ = the series start) — the standard
    Theil–Sen intercept, anchored at day₀. Milli (not micro) slope
    units + day offsets keep every product under ~5e15, far inside
    int64 (the ``jl_distortion_report`` headroom discipline).

    Scale shape: ONE day-keyed fact aggregate (the only data-scale
    exchange); the C(n,2) pair enumeration runs over the DAY series —
    day-range-bounded at any data scale (the ``revenue_acf`` argument:
    TPC-H spans ~7 years ⇒ ≤ ~3.3M pairs formed from ≤ ~2.6k rows),
    and the median is a sort of that bounded pair frame, never of
    data. Output: ONE row (n_days, n_pairs, slope_milli_per_day,
    intercept_u4).
    """
    daily = (
        events.select(
            _epoch_day().alias("day"),
            F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").alias("v4"),
        )
        .groupBy("day")
        .agg(F.sum("v4").cast("long").alias("rev"))
    )
    bounds = daily.agg(
        F.min("day").alias("day0"), F.count(F.lit(1)).alias("n_days")
    )
    d0 = daily.crossJoin(F.broadcast(bounds)).select(
        (F.col("day") - F.col("day0")).alias("day"), "rev", "n_days"
    )
    pairs = (
        d0.alias("i")
        .join(d0.alias("j"), F.col("j.day") > F.col("i.day"))
        .select(
            F.col("i.day").alias("di"),
            F.col("j.day").alias("dj"),
            F.expr(
                floor_div_sql(
                    "(j.rev - i.rev) * 1000", "(j.day - i.day)", "DIV"
                )
            ).alias("slope_milli"),
        )
    )
    w = Window.orderBy("slope_milli", "di", "dj")
    med = (
        pairs.withColumn("rn", F.row_number().over(w))
        .crossJoin(
            F.broadcast(pairs.agg(F.count(F.lit(1)).alias("n_pairs")))
        )
        .filter(F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
        .select("slope_milli", "n_pairs")
    )
    resid = d0.crossJoin(F.broadcast(med)).select(
        (
            F.col("rev")
            - F.expr(floor_div_sql("slope_milli * day", 1000, "DIV"))
        ).alias("level"),
        "n_days",
        "n_pairs",
        "slope_milli",
    )
    w2 = Window.orderBy("level")
    return (
        resid.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == F.expr("(n_days + 1) DIV 2"))
        .select(
            "n_days",
            "n_pairs",
            F.col("slope_milli").alias("slope_milli_per_day"),
            F.col("level").alias("intercept_u4"),
        )
    )


def mad_outliers(events: DataFrame) -> DataFrame:
    """Robust per-type outlier census via median/MAD — the
    median-absolute-deviation rule (|x − med| > 3·1.4826·MAD, the
    normal-consistency constant) that ``events_anomaly``-style
    mean/stddev flags cannot give: one 1000× spike inflates a stddev
    enough to hide every other anomaly, while the median and MAD are
    50%-breakdown robust (Hampel; Leys et al. 2013).

    Exactness: values in integer cents; both medians are nearest-rank
    picks at 1-based rank ⌈n/2⌉ under (value, event_id) order — exact
    elements, not interpolations — and the flag is the pure-integer
    cross-multiplication ``1000·|x − med| > 4448·MAD`` (3·1.4826 =
    4.4478 → the exact rational 4448/1000, biased 0.005% conservative;
    both engines share the literal). MAD = 0 (over half the group at
    the median) flags every value off the median — the documented
    degenerate MAD case, deliberately not special-cased.

    Scale shape: two per-group nearest-rank windows (partitioned by
    event_type — spillable, skew-bounded, never global) and two
    aggregates; at extreme group sizes the same readout rides the
    ``nearest_rank_pick`` bucket-histogram two-phase — the expression
    is what's pinned here. Columns: (event_type, n, med_cents,
    mad_cents, n_outliers, outlier_ppm), ordered by event_type.
    """
    base = events.select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    wn = Window.partitionBy("event_type")
    w1 = Window.partitionBy("event_type").orderBy("cents", "event_id")
    med = (
        base.select(
            "event_type",
            "cents",
            F.row_number().over(w1).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("cents").alias("med_cents"), "n")
    )
    devs = base.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "n",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("dev"),
    )
    w2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
    mad = (
        devs.select(
            "event_type",
            "dev",
            "n",
            F.row_number().over(w2).alias("rn"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("dev").alias("mad_cents"))
    )
    return (
        devs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("med_cents").alias("med_cents"),
            F.max("mad_cents").alias("mad_cents"),
            F.sum(
                F.expr(
                    "CASE WHEN 1000 * dev > 4448 * mad_cents"
                    " THEN 1 ELSE 0 END"
                )
            ).cast("long").alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "med_cents",
            "mad_cents",
            "n_outliers",
            F.expr("n_outliers * 1000000L DIV n").alias("outlier_ppm"),
        )
        .orderBy("event_type")
    )
