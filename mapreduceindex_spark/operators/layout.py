"""Physical data-layout planning: Z-order clustering and join-skew scouting.

At 100 TB the dominant cost is often not the query plan but the data
layout it scans: files clustered so min/max footer stats prune most of
them, and shuffles planned around the keys that would otherwise melt a
single reducer. These operators produce those layout decisions as
ordinary DataFrames, so they run through the same oracle gate as every
query.

No reference file:line — the reference's only layout decision is its
per-letter output partitioning (``reducer.c:96-141``, the 26-way
split); Z-ordering and skew scouting generalize "choose where each row
lives" to multi-dimensional predicates and shuffle planning.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from mapreduceindex_spark.functions import caching

#: single-slot memo of the layout bounds probe keyed on the base
#: plan's semantic hash — see _bounds_probe
_BOUNDS_MEMO: dict = caching.scalar_memo({})


def _interleave(xn, yn, bits: int):
    """Morton code: bit i of x lands at 2i, bit i of y at 2i+1.

    Unrolled to ``2*bits`` shift/mask terms so the whole key stays one
    codegen'd integer expression — no UDF, no loop at runtime.
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xn, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yn, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms)


def zorder_layout(
    lineitem: DataFrame, bits: int = 8, rows_per_file: int = 4096
) -> DataFrame:
    """Plan a Z-order rewrite of ``lineitem`` clustered on
    ``(l_partkey, l_suppkey)`` and report each target file's bounding
    box — the min/max footer stats a scan would prune on.

    Each dimension is min/max-normalized to ``bits`` bits with pure
    integer arithmetic (``(v - lo) * (2^bits - 1) DIV (hi - lo)`` — no
    float division, so both engines agree bit-for-bit), then
    interleaved into a Morton key. The bounds come from one collected
    probe aggregate (seven scalars of model state) embedded as
    literals, and the keyed frame is persisted (tracked per-operator,
    released on re-entry) so the offsets aggregate and the rank join
    read one materialization instead of re-scanning per branch. Rows sort globally by
    ``(zkey, l_orderkey, l_linenumber)`` and cut into
    ``rows_per_file``-row files; the output is one row per file with
    its row count and per-dimension bounds. Tight, non-overlapping
    boxes are the whole point: a predicate on either dimension can skip
    every file whose box misses it.

    The global sort rank is assembled two-phase (the
    ``order_value_percent_rank`` pattern): per-zkey counts give each
    key's cumulative offset — the offset frame is bounded by the
    4^bits key space (65 536 at the default), never by row count — and
    a window partitioned BY KEY adds the local row number. At 100 TB
    the same plan is ``repartitionByRange(zkey)`` +
    ``sortWithinPartitions`` + a size-targeted writer; the one
    unpartitioned window here runs over the bounded key frame only.
    """
    caching.release("zorder_layout")
    base = _zorder_base(lineitem)
    b = _bounds_probe(base)
    return _zorder_boxes(base, b, bits, rows_per_file)


def _zorder_base(lineitem: DataFrame) -> DataFrame:
    return lineitem.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.col("l_partkey").cast("long").alias("x"),
        F.col("l_suppkey").cast("long").alias("y"),
    )


def _bounds_probe(base: DataFrame) -> dict:
    """One aggregate scan collecting the seven scalars every layout
    decision needs (dimension mins/maxes, orderkey span, row count) —
    bounded model state, the same probe-then-plan move as the dedup
    tier probes. Embedding the scalars as literals keeps the heavy
    plan from re-deriving the bounds once per referencing branch.
    Memoized per input fingerprint (the _FRONT_STATS discipline):
    zorder_layout and zorder_skipping probe the same base."""
    fp = caching.plan_fingerprint(base)
    hit = _BOUNDS_MEMO.get(fp)
    if hit is not None:
        return dict(hit)
    row = base.agg(
        F.min("x").alias("xlo"),
        F.max("x").alias("xhi"),
        F.min("y").alias("ylo"),
        F.max("y").alias("yhi"),
        F.min("l_orderkey").alias("olo"),
        F.max("l_orderkey").alias("ohi"),
        F.count(F.lit(1)).alias("nrows"),
    ).collect()[0]
    out = {k: (0 if row[k] is None else int(row[k])) for k in row.asDict()}
    _BOUNDS_MEMO.clear()  # single slot, bounded like the front-end memos
    _BOUNDS_MEMO[fp] = dict(out)
    return out


def _zorder_boxes(
    base: DataFrame, b: dict, bits: int, rows_per_file: int
) -> DataFrame:
    M = (1 << bits) - 1

    # the Morton-keyed frame depends only on (base, bounds, bits) —
    # zorder_layout and zorder_skipping differ only in rows_per_file,
    # so the keyed frame is family-shared through the memo
    fingerprint = (
        f"{caching.plan_fingerprint(base)}|{bits}"
        f"|{sorted(b.items())}"
    )

    def _build() -> list:
        return [
            base.select(
                "l_orderkey",
                "l_linenumber",
                "x",
                "y",
                _interleave(
                    F.expr(
                        f"(x - {b['xlo']}) * {M} "
                        f"DIV greatest({b['xhi'] - b['xlo']}, 1)"
                    ),
                    F.expr(
                        f"(y - {b['ylo']}) * {M} "
                        f"DIV greatest({b['yhi'] - b['ylo']}, 1)"
                    ),
                    bits,
                ).cast("long").alias("zkey"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        ]

    keyed = caching.memo("zorder_keyed", fingerprint, _build)[0]
    wz = Window.orderBy("zkey").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        keyed.groupBy("zkey")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select("zkey", F.coalesce(F.sum("_cnt").over(wz), F.lit(0)).alias("_off"))
    )
    local = Window.partitionBy("zkey").orderBy("l_orderkey", "l_linenumber")
    ranked = (
        keyed.join(offsets, "zkey")
        .withColumn("_rn", F.col("_off") + F.row_number().over(local))
        .withColumn(
            "file_id", F.expr(f"CAST((_rn - 1) DIV {rows_per_file} AS BIGINT)")
        )
    )
    return (
        ranked.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_part"),
            F.max("x").alias("max_part"),
            F.min("y").alias("min_supp"),
            F.max("y").alias("max_supp"),
            F.min("zkey").alias("min_z"),
            F.max("zkey").alias("max_z"),
        )
        .orderBy("file_id")
    )


def zorder_layout_oracle_sql(bits: int = 8, rows_per_file: int = 4096) -> str:
    """DuckDB twin of :func:`zorder_layout` — same unrolled Morton
    expression, same integer normalization, same file cuts."""
    M = (1 << bits) - 1
    z = " + ".join(
        f"(((xn >> {i}) & 1) << {2 * i}) + (((yn >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    return f"""
WITH b AS (
  SELECT min(l_partkey) AS xlo, max(l_partkey) AS xhi,
         min(l_suppkey) AS ylo, max(l_suppkey) AS yhi
  FROM lineitem
), n AS (
  SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
         CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y,
         (l_partkey - xlo) * {M} // greatest(xhi - xlo, 1) AS xn,
         (l_suppkey - ylo) * {M} // greatest(yhi - ylo, 1) AS yn
  FROM lineitem, b
), z AS (
  SELECT *, CAST({z} AS BIGINT) AS zkey FROM n
), r AS (
  SELECT *, row_number() OVER (ORDER BY zkey, l_orderkey, l_linenumber) AS rn
  FROM z
)
SELECT CAST((rn - 1) // {rows_per_file} AS BIGINT) AS file_id,
       count(*) AS n_rows,
       min(x) AS min_part, max(x) AS max_part,
       min(y) AS min_supp, max(y) AS max_supp,
       min(zkey) AS min_z, max(zkey) AS max_z
FROM r
GROUP BY 1
ORDER BY file_id
"""


def zorder_skipping(
    lineitem: DataFrame, bits: int = 8, rows_per_file: int = 1024
) -> DataFrame:
    """Quantify what :func:`zorder_layout` buys: for a narrow
    ``l_partkey`` predicate (an off-center 5% band of the key span —
    centered bands straddle the Morton top-bit boundary, the curve's
    worst case, derived
    in-query so both engines use identical integer bounds), count how
    many files a min/max-pruning scan must read under (a) the Z-order
    layout vs (b) the natural ingest-order layout (files cut along
    ``l_orderkey`` spans — what a pipeline that just appends gets).

    One output row: the predicate bounds, file counts, and files
    scanned under each layout. The natural baseline needs no global
    rank at all — ``file_id = l_orderkey DIV step`` with ``step`` sized
    from the key span and row count — so the whole comparison is three
    aggregates and a broadcast of two single-row bound frames. The
    Z-order side reuses the exact :func:`zorder_layout` boxes; on the
    clustered layout a dimension predicate hits a contiguous minority
    of boxes, on the append layout it hits nearly all of them — the
    measured gap IS the 100 TB scan-cost argument for Z-ordering.
    """
    # own cache key: releasing/tracking under zorder_layout's key here
    # would void THAT operator's still-unmaterialized persisted frame
    # whenever this one's plan is merely built (ADVICE r04 #3)
    caching.release("zorder_skipping")
    base = _zorder_base(lineitem)
    b = _bounds_probe(base)
    zboxes = _zorder_boxes(base, b, bits, rows_per_file)
    # one probe feeds the layout AND the predicate/step arithmetic:
    # Python // on non-negative ints == Spark DIV == DuckDB //
    empty = b["nrows"] == 0
    pred_lo = b["xlo"] + (b["xhi"] - b["xlo"]) * 10 // 100
    pred_hi = b["xlo"] + (b["xhi"] - b["xlo"]) * 15 // 100
    step = max(1, (b["ohi"] - b["olo"] + 1) * rows_per_file // max(b["nrows"], 1))
    pl = F.lit(None if empty else pred_lo).cast("long")
    ph = F.lit(None if empty else pred_hi).cast("long")

    def _scan_count(alias: str):
        return F.sum(
            F.when(
                (F.col("max_part") >= F.lit(pred_lo))
                & (F.col("min_part") <= F.lit(pred_hi)),
                1,
            ).otherwise(0)
        ).alias(alias)

    z = zboxes.agg(
        F.count(F.lit(1)).alias("n_files_zorder"),
        _scan_count("n_scan_zorder"),
    )
    nat = (
        base.groupBy(
            F.expr(f"(l_orderkey - {b['olo']}) DIV {step}").alias("_fid")
        )
        .agg(
            F.min("x").alias("min_part"),
            F.max("x").alias("max_part"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_files_natural"),
            _scan_count("n_scan_natural"),
        )
    )
    return z.join(F.broadcast(nat)).select(
        pl.alias("pred_lo"),
        ph.alias("pred_hi"),
        F.col("n_files_zorder").cast("long").alias("n_files_zorder"),
        F.col("n_scan_zorder").cast("long").alias("n_scan_zorder"),
        F.col("n_files_natural").cast("long").alias("n_files_natural"),
        F.col("n_scan_natural").cast("long").alias("n_scan_natural"),
    )


def zorder_skipping_oracle_sql(bits: int = 8, rows_per_file: int = 1024) -> str:
    """DuckDB twin of :func:`zorder_skipping` — composes the
    :func:`zorder_layout` oracle as a subquery and replays the natural
    layout's span cut with identical integer arithmetic."""
    zsql = zorder_layout_oracle_sql(bits=bits, rows_per_file=rows_per_file)
    return f"""
WITH zbox AS ({zsql}),
b AS (
  SELECT CAST(min(l_partkey) AS BIGINT) AS xlo,
         CAST(max(l_partkey) AS BIGINT) AS xhi,
         CAST(min(l_orderkey) AS BIGINT) AS olo,
         CAST(max(l_orderkey) AS BIGINT) AS ohi,
         count(*) AS nrows
  FROM lineitem
), p AS (
  SELECT olo, ohi, nrows,
         xlo + (xhi - xlo) * 10 // 100 AS pred_lo,
         xlo + (xhi - xlo) * 15 // 100 AS pred_hi,
         greatest(1, (ohi - olo + 1) * {rows_per_file} // nrows) AS step
  FROM b
), z AS (
  SELECT count(*) AS n_files_zorder,
         sum(CASE WHEN max_part >= pred_lo AND min_part <= pred_hi
             THEN 1 ELSE 0 END) AS n_scan_zorder
  FROM zbox, p
), natbox AS (
  SELECT (l_orderkey - olo) // step AS fid,
         min(l_partkey) AS min_part, max(l_partkey) AS max_part
  FROM lineitem, p
  GROUP BY 1
), nat AS (
  SELECT count(*) AS n_files_natural,
         sum(CASE WHEN max_part >= pred_lo AND min_part <= pred_hi
             THEN 1 ELSE 0 END) AS n_scan_natural
  FROM natbox, p
)
SELECT CAST(pred_lo AS BIGINT) AS pred_lo,
       CAST(pred_hi AS BIGINT) AS pred_hi,
       CAST(n_files_zorder AS BIGINT) AS n_files_zorder,
       CAST(n_scan_zorder AS BIGINT) AS n_scan_zorder,
       CAST(n_files_natural AS BIGINT) AS n_files_natural,
       CAST(n_scan_natural AS BIGINT) AS n_scan_natural
FROM z, nat, p
"""


def join_hotspots(events: DataFrame, orders: DataFrame, top_k: int = 20) -> DataFrame:
    """Scout the skew of a planned ``events ⋈ orders`` join on
    ``user_id = o_custkey`` BEFORE running it: per-key row counts on
    both sides, their product (that key's share of the join output),
    and its parts-per-million share of the total — the readout that
    decides between a plain shuffle join, AQE skew splitting, or
    salting the hot keys.

    Two map-side-combined aggregates (each output-bounded by key
    cardinality, not row count), an inner join of the two count frames,
    and a single-row total broadcast for the exact integer ppm — the
    probe costs two small shuffles regardless of input size, which is
    why a planner can afford to run it ahead of every big join. The
    joined count frame is persisted (tracked, released on re-entry) so
    the total and the per-key ppm both read it once instead of
    re-running the aggregates per referencing branch. All arithmetic
    is BIGINT (``DIV``), so the oracle comparison is exact.
    """
    return _join_hotspots_cached(
        events, orders, top_k, cache_key="join_hotspots"
    )


def _join_hotspots_cached(
    events: DataFrame, orders: DataFrame, top_k: int, cache_key: str
) -> DataFrame:
    """Body of :func:`join_hotspots`, parameterized on the cache key so
    internal callers (``salted_affinity_join``) track the probe frame
    under their OWN key — running the salted join must not unpersist a
    live ``join_hotspots`` frame another caller holds (ADVICE r05 #1,
    the same cross-operator cache-voiding class fixed for
    ``zorder_skipping`` in round 5).
    """
    caching.release(cache_key)
    left = (
        events.groupBy(F.col("user_id").cast("long").alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    right = (
        orders.groupBy(F.col("o_custkey").cast("long").alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = caching.track(
        left.join(right, "join_key")
        .select(
            "join_key",
            "n_events",
            "n_orders",
            (F.col("n_events") * F.col("n_orders")).alias("out_rows"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK),
        key=cache_key,
    )
    total = j.agg(F.sum("out_rows").alias("_total"))
    return (
        j.join(F.broadcast(total))
        .select(
            "join_key",
            "n_events",
            "n_orders",
            "out_rows",
            F.expr("CAST(out_rows * 1000000 DIV _total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy(F.col("out_rows").desc(), F.col("join_key").asc())
        .limit(top_k)
    )


def salted_affinity_join(
    events: DataFrame,
    orders: DataFrame,
    salts: int = 8,
    hot_top_k: int = 20,
) -> DataFrame:
    """Execute the ``events ⋈ orders`` join that ``join_hotspots``
    scouts, with the scouted hot keys SALTED — the mitigation the
    scout's readout exists to trigger, closing the plan-then-execute
    loop: per (event_type, o_orderpriority), the number of co-occurring
    (event, order) pairs for the same user and the exact cents sum of
    the order prices over those pairs.

    Salting (the standard skew spreader AQE generalizes): the fat
    (events) side of a hot key gets a deterministic salt
    ``xxhash64(event_id) mod S`` — pure row-local arithmetic, no state
    — while the orders side replicates each hot row S× (one per salt)
    via an exploded literal sequence; cold keys ride along with salt 0
    and NO replication, so the replication cost is |hot orders|·S, not
    |orders|·S. The join key becomes ``(user, salt)``: the hot key's
    output rows now land on S reduce partitions instead of one, which
    is the difference between a straggler-free stage and a single
    reducer holding the whole stage hostage at 100 TB. The final
    aggregate is salt-blind, so the result is provably identical to the
    plain join (pinned by test), and the oracle runs the plain join.

    The hot list comes from ``join_hotspots`` itself (top-k by join
    output share) — a bounded ``top_k``-row collect embedded as
    literals, the probe-then-plan pattern ``zorder_layout`` uses.
    """
    hot = [
        r.join_key
        for r in _join_hotspots_cached(
            events, orders, hot_top_k, cache_key="salted_affinity_join"
        )
        .select("join_key")
        .collect()
    ]
    # the probe is fully consumed into literals — drop its cache now
    # rather than holding it until the next salted-join entry
    caching.release("salted_affinity_join")
    e_key = F.col("user_id").cast("long")
    o_key = F.col("o_custkey").cast("long")
    e = events.select(
        e_key.alias("_k"),
        "event_type",
        F.when(
            e_key.isin(hot) if hot else F.lit(False),
            F.pmod(F.xxhash64("event_id"), F.lit(salts)),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_salt"),
    )
    o = orders.select(
        o_key.alias("_k"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("_cents"),
        F.explode(
            F.when(
                o_key.isin(hot) if hot else F.lit(False),
                F.sequence(
                    F.lit(0).cast("long"), F.lit(salts - 1).cast("long")
                ),
            ).otherwise(F.array(F.lit(0).cast("long")))
        ).alias("_salt"),
    )
    return (
        e.join(o, ["_k", "_salt"])
        .groupBy("event_type", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("_cents").alias("pair_price_cents"),
        )
        .orderBy("event_type", "o_orderpriority")
    )


def compaction_plan(
    file_stats: DataFrame, target_bytes: int, bucket_width: int = 1024
) -> DataFrame:
    """Small-file compaction planner: assign files (ordered by
    ``file_id``) to merge groups of ~``target_bytes`` each — the
    maintenance job every long-lived table needs once streaming/
    incremental writers have littered it with kilobyte files, and the
    same cumulative-quota packing Spark's own scan uses to build
    ``FilePartition``s under ``files.maxPartitionBytes``.

    Assignment is ``group = exclusive_cumulative_bytes DIV target`` —
    whole files only, each group overflowing by less than one file, and
    every engine agrees because it is pure BIGINT arithmetic on an
    explicit total order. The exclusive cumsum is built two-phase (the
    ``zorder_layout`` rank pattern): per-bucket byte sums first
    (``file_id DIV bucket_width`` — the only unpartitioned window runs
    over THIS bounded bucket frame), then a bucket-partitioned window
    adds the within-bucket prefix. File metadata is ~1 row per 100 MB
    at 100 TB (≈10⁶ rows); the two-phase shape keeps even that off a
    single task.

    Input: ``(file_id, bytes)``. Output: one row per merge group with
    file count, byte total, and the contiguous ``[first_file,
    last_file]`` range it covers (contiguity is what lets the rewrite
    job be expressed as a range scan per group).
    """
    fs = file_stats.select(
        F.col("file_id").cast("long").alias("file_id"),
        F.col("bytes").cast("long").alias("bytes"),
        F.expr(f"CAST(file_id AS BIGINT) DIV {bucket_width}").alias("_b"),
    )
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    boff = (
        fs.groupBy("_b")
        .agg(F.sum("bytes").alias("_bb"))
        .select(
            "_b",
            F.coalesce(F.sum("_bb").over(wb), F.lit(0)).alias("_boff"),
        )
    )
    wl = (
        Window.partitionBy("_b")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = fs.join(boff, "_b").select(
        "file_id",
        "bytes",
        (
            F.col("_boff") + F.coalesce(F.sum("bytes").over(wl), F.lit(0))
        ).alias("_cum_excl"),
    )
    return (
        cum.select(
            "file_id",
            "bytes",
            F.expr(f"CAST(_cum_excl DIV {target_bytes} AS BIGINT)").alias(
                "group_id"
            ),
        )
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("group_bytes"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
        .orderBy("group_id")
    )


def docs_compaction_plan(
    documents: DataFrame, docs_per_file: int = 10, target_bytes: int = 8192
) -> DataFrame:
    """``compaction_plan`` driven end-to-end: pseudo-files carved from
    the documents table (``doc_id DIV docs_per_file``, byte size =
    Σ ``n_chars``) stand in for a littered table's file listing."""
    fs = documents.groupBy(
        F.expr(f"CAST(doc_id AS BIGINT) DIV {docs_per_file}").alias("file_id")
    ).agg(F.sum("n_chars").cast("long").alias("bytes"))
    return compaction_plan(fs, target_bytes)


def partitioned_scan_prune(events: DataFrame, last_days: int = 7) -> DataFrame:
    """Hive-partition lifecycle: rewrite ``events`` into a
    ``day_num=<epoch day>``-partitioned parquet layout, read it back
    with a recency predicate, and aggregate only the surviving
    partitions — DIRECTORY-level partition pruning, the coarsest (and
    at 100 TB the most important) skipping tier. ``zorder_skipping``
    proves file-FOOTER pruning inside a partition; this proves the tier
    above it: a date predicate on a date-partitioned table must never
    list, open, or footer-read the out-of-range partitions at all.

    Shape: one write pass (``partitionBy`` on the calendar-correct
    floored epoch day — ``functions.exact.floor_div_sql``, the
    registry's epoch-day convention), one single-row probe for the max
    day (model-sized, the ``zorder_layout`` bounds discipline), then a
    fresh read of the partitioned artifact filtered to the trailing
    ``last_days`` days. The filter lands in the scan's
    ``PartitionFilters`` (plan-asserted in tests), so at a 1000-file
    30-day table the scan touches only the ~``last_days``/30 of files.
    The artifact is session-scoped scratch (app-id suffixed, stale dirs
    purged — the ``formats._scratch`` lifecycle).

    Exactness: the day key is BIGINT floored division (pre-1970-safe);
    the readout is count + the exact order-independent 4-dp decimal sum
    of ``value`` (``functions.exact.sum_dec``) per (day_num,
    event_type) — identical formula text in the DuckDB oracle, which
    computes the same trailing window over the raw events view (one
    ground truth, two physical routes: the oracle never sees the
    partitioned artifact).

    Output: (day_num, event_type, n_events, sum_value), ordered.
    """
    from mapreduceindex_spark.functions.exact import floor_div_sql, sum_dec
    from mapreduceindex_spark.operators.formats import _scratch

    spark = events.sparkSession
    path = _scratch("partdays", spark)
    day = F.expr(
        floor_div_sql("CAST(unix_seconds(ts) AS BIGINT)", 86400, "DIV")
    ).cast("long")
    (
        events.select(
            "event_id", "user_id", "event_type", "value", day.alias("day_num")
        )
        .write.partitionBy("day_num")
        .parquet(path)
    )
    # single-row probe: the newest day in the artifact (model-sized).
    # Empty input: nothing was written (parquet leaves no readable
    # schema), so emit the empty readout directly.
    max_day = events.agg(F.max(day).alias("mx")).collect()[0]["mx"]
    if max_day is None:
        return spark.createDataFrame(
            [],
            "day_num long, event_type string, n_events long, "
            "sum_value double",
        )
    part = spark.read.parquet(path)
    return (
        part.filter(F.col("day_num") >= F.lit(max_day - (last_days - 1)))
        .groupBy(F.col("day_num").cast("long").alias("day_num"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            sum_dec("value", 4).alias("sum_value"),
        )
        .orderBy("day_num", "event_type")
    )
