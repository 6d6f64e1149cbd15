"""Round-7 operator semantics, pinned on hand-computed fixtures."""

from tests.conftest import spark  # noqa: F401


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, d string"
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "CAST(d AS TIMESTAMP) AS o_orderdate",
    )


def test_orders_cube_all_grouping_sets(spark):
    """2 years × 2 statuses: the cube must emit the 3 detail cells that
    exist, 2 year rollups, 2 status rollups, and one grand total, with
    grp_id = grouping(year)*2 + grouping(status) and sentinel keys —
    from the Expand-free detail re-aggregation."""
    from mapreduceindex_spark.operators.relational import orders_cube

    orders = _orders(
        spark,
        [
            (1, 1, "F", 1.00, "2023-03-01"),
            (2, 1, "O", 2.00, "2023-06-01"),
            (3, 1, "F", 4.00, "2024-01-01"),
        ],
    )
    got = {
        (r.order_year, r.o_orderstatus, r.grp_id): (
            r.n_orders,
            r.revenue_cents,
        )
        for r in orders_cube(orders).collect()
    }
    assert got == {
        (2023, "F", 0): (1, 100),
        (2023, "O", 0): (1, 200),
        (2024, "F", 0): (1, 400),
        (2023, "ALL", 1): (2, 300),
        (2024, "ALL", 1): (1, 400),
        (-1, "F", 2): (2, 500),
        (-1, "O", 2): (1, 200),
        (-1, "ALL", 3): (3, 700),
    }


def test_order_status_pivot_zero_fills_missing_cells(spark):
    """A month with only F orders must report 0 (not NULL) for O and P,
    and the explicit status domain keeps unseen statuses out."""
    from mapreduceindex_spark.operators.relational import order_status_pivot

    orders = _orders(
        spark,
        [
            (1, 1, "F", 1.50, "2023-03-05"),
            (2, 1, "F", 2.00, "2023-03-09"),
            (3, 1, "P", 4.00, "2023-04-01"),
        ],
    )
    got = {
        r.month_key: (r.rev_F_cents, r.rev_O_cents, r.rev_P_cents)
        for r in order_status_pivot(orders).collect()
    }
    assert got == {"2023-03": (350, 0, 0), "2023-04": (0, 0, 400)}


def test_fk_integrity_audit_counts_orphans_not_nulls(spark):
    """An orders row pointing at a missing customer is an orphan; a NULL
    foreign key is NOT (SQL FK semantics) — checked on the
    orders->customer edge with the other six edges intact."""
    from mapreduceindex_spark.operators.profiling import fk_integrity_audit

    customer = spark.createDataFrame(
        [(1, "a", 1, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, "F", 1.0, "2023-01-01"),
         (11, 99, "F", 1.0, "2023-01-01"),   # orphan: customer 99 absent
         (12, None, "F", 1.0, "2023-01-01")],  # NULL FK: not a violation
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, d string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(d AS TIMESTAMP) AS o_orderdate",
    )
    nation = spark.createDataFrame(
        [(1, "N", 1)], "n_nationkey int, n_name string, n_regionkey int"
    )
    region = spark.createDataFrame([(1, "R")], "r_regionkey int, r_name string")
    supplier = spark.createDataFrame(
        [(5, "s", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(7, "p", "B", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    lineitem = spark.createDataFrame(
        [(10, 7, 5, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2023-01-02")],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, d string",
    ).selectExpr("* except (d)", "CAST(d AS TIMESTAMP) AS l_shipdate")
    got = {
        r.fk_edge: (r.n_child, r.n_orphans)
        for r in fk_integrity_audit(
            lineitem, orders, customer, nation, region, supplier, part
        ).collect()
    }
    assert got["orders.o_custkey->customer.c_custkey"] == (3, 1)
    assert got["lineitem.l_orderkey->orders.o_orderkey"] == (1, 0)
    assert len(got) == 7
    assert all(v == 0 for e, (_, v) in got.items()
               if e != "orders.o_custkey->customer.c_custkey")


def test_benford_prices_digit_from_cents_string(spark):
    """$0.95 -> cents 95 -> digit 9 (the leading digit of the CENTS
    integer, not the dollar part); ppm cross-multiplication exact."""
    from mapreduceindex_spark.operators.profiling import benford_prices

    orders = _orders(
        spark,
        [
            (1, 1, "F", 0.95, "2023-01-01"),   # 95 cents  -> digit 9
            (2, 1, "F", 1.23, "2023-01-01"),   # 123 cents -> digit 1
            (3, 1, "F", 19.00, "2023-01-01"),  # 1900      -> digit 1
            (4, 1, "F", 2.00, "2023-01-01"),   # 200       -> digit 2
        ],
    )
    got = {
        r.digit: (r.n_orders, r.observed_ppm, r.benford_ppm, r.delta_ppm)
        for r in benford_prices(orders).collect()
    }
    assert got == {
        1: (2, 500_000, 301_030, 198_970),
        2: (1, 250_000, 176_091, 73_909),
        9: (1, 250_000, 45_757, 204_243),
    }


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, t string, user_id long, event_type string, "
        "value double"
    ).selectExpr(
        "event_id", "CAST(t AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "'{}' AS props",
    )


def test_active_user_rollup_trailing_windows(spark):
    """Three active days (0, 3, 10): WAU on day 3 still sees day 0's
    users (trailing 7), MAU on day 10 sees everyone (trailing 30), and
    inactive days between are NOT emitted."""
    from mapreduceindex_spark.operators.events import active_user_rollup

    ev = _events(
        spark,
        [
            (1, "1970-01-01 01:00:00", 1, "view", 1.0),
            (2, "1970-01-01 02:00:00", 2, "view", 1.0),
            (3, "1970-01-01 03:00:00", 2, "click", 1.0),  # dup user same day
            (4, "1970-01-04 01:00:00", 2, "view", 1.0),
            (5, "1970-01-11 01:00:00", 3, "view", 1.0),
        ],
    )
    got = {
        r.day_num: (r.dau, r.wau, r.mau)
        for r in active_user_rollup(ev).collect()
    }
    assert got == {0: (2, 2, 2), 3: (1, 2, 2), 10: (1, 1, 3)}


def test_events_ohlc_tiebreaks_on_event_id(spark):
    """Two events share the open timestamp: the smaller event_id's value
    is the open; close takes the largest (ts, event_id); high/low span
    the day; 1e-4 quantization exact."""
    from mapreduceindex_spark.operators.events import events_ohlc

    ev = _events(
        spark,
        [
            (2, "2024-01-01 09:00:00", 1, "trade", 5.5),   # tied open, bigger id
            (1, "2024-01-01 09:00:00", 1, "trade", 3.25),  # open (id 1)
            (3, "2024-01-01 12:00:00", 1, "trade", 9.0),   # high
            (4, "2024-01-01 16:00:00", 1, "trade", 1.0),   # low + close
            (5, "2024-01-01 10:00:00", 1, "ping", 7.0),    # other type
        ],
    )
    got = {
        (r.day_num, r.event_type): (
            r.open_u4, r.high_u4, r.low_u4, r.close_u4, r.n_events
        )
        for r in events_ohlc(ev).collect()
    }
    # derive the day number from the data itself to avoid calendar math
    d = next(iter({k[0] for k in got}))
    assert got[(d, "trade")] == (32500, 90000, 10000, 10000, 4)
    assert got[(d, "ping")] == (70000, 70000, 70000, 70000, 1)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )


def test_repetition_profile_count_weighted_ppm(spark):
    """'a a b': 2 of 3 word occurrences repeat (666666 ppm) but both
    2-grams are unique (0); 'x y x y x' repeats everything (1e6 both);
    a single-word doc scores 0/0 on its one degenerate shingle; a
    zero-word doc is excluded."""
    from mapreduceindex_spark.operators.text_analysis import repetition_profile

    docs = _docs(
        spark,
        [
            (1, "a a b", "en", "s", 5),
            (2, "x y x y x", "en", "s", 9),
            (3, "z", "en", "s", 1),
            (4, "42 !!", "en", "s", 5),   # zero normalized words
        ],
    )
    got = {
        r.doc_id: (r.n_words, r.dup_word_ppm, r.dup_2gram_ppm)
        for r in repetition_profile(docs).collect()
    }
    assert got == {
        1: (3, 666_666, 0),
        2: (5, 1_000_000, 1_000_000),
        3: (1, 0, 0),
    }


def test_copurchase_pairs_dedupes_within_order(spark):
    """Part 2 appearing on two lines of order 1 is ONE co-occurrence;
    pair (2,3) spans both orders; top-k cut is deterministic."""
    from mapreduceindex_spark.operators.relational import copurchase_pairs

    li = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2), (1, 3), (2, 2), (2, 3)],
        "l_orderkey long, l_partkey long",
    )
    got = [
        (r.p_a, r.p_b, r.n_orders)
        for r in copurchase_pairs(li, top_k=2).collect()
    ]
    assert got == [(2, 3, 2), (1, 2, 1)]


def test_label_outliers_centroid_distance_and_ties(spark):
    """Three 1-hot-ish vectors on one axis: centroid lands at the
    middle, the two extremes tie on distance and break by vec_id."""
    from mapreduceindex_spark.operators.similarity import label_outliers

    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0),
            (2, [0.3, 0.0], 0),
            (3, [0.6, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = [
        (r.label, r.rank, r.vec_id, r.dist2_u)
        for r in label_outliers(emb).collect()
    ]
    d = 300_000 ** 2
    assert got == [(0, 1, 1, d), (0, 2, 3, d), (0, 3, 2, 0)]


def test_cumulative_unique_users_first_seen_decomposition(spark):
    """User 2 active on days 0 and 3: counts once (day 0); day 3 is
    still emitted with 0 new users and a flat cumulative."""
    from mapreduceindex_spark.operators.events import cumulative_unique_users

    ev = _events(
        spark,
        [
            (1, "1970-01-01 01:00:00", 1, "view", 1.0),
            (2, "1970-01-01 02:00:00", 2, "view", 1.0),
            (3, "1970-01-04 01:00:00", 2, "view", 1.0),   # returning only
            (4, "1970-01-06 01:00:00", 3, "view", 1.0),
        ],
    )
    got = [
        (r.day_num, r.new_users, r.cum_users)
        for r in cumulative_unique_users(ev).collect()
    ]
    assert got == [(0, 2, 2), (3, 0, 2), (5, 1, 3)]


def test_shipping_sla_report_boundary_inclusive(spark):
    """A line shipped exactly 30 days after the order is ON time
    (<= boundary); 31 days is late; ppm is the integer cross-multiply."""
    from mapreduceindex_spark.operators.relational import shipping_sla_report

    orders = _orders(
        spark,
        [(1, 1, "F", 1.0, "2024-01-01"), (2, 1, "F", 1.0, "2024-01-01")],
    ).selectExpr("o_orderkey", "o_orderdate", "'1-URGENT' AS o_orderpriority")
    li = spark.createDataFrame(
        [(1, "2024-01-31"), (1, "2024-02-01"), (2, "2024-01-02")],
        "l_orderkey long, d string",
    ).selectExpr("l_orderkey", "CAST(d AS TIMESTAMP) AS l_shipdate")
    (r,) = shipping_sla_report(orders, li).collect()
    assert (r.o_orderpriority, r.n_lines, r.n_on_time, r.on_time_ppm) == (
        "1-URGENT", 3, 2, 666_666
    )


def test_embedding_power_iteration_finds_dominant_axis(spark):
    """All variance on axis 0: the iteration converges to exactly
    (1e6, 0) — every rescale divides evenly on this fixture, so the
    result is bit-pinned, and the v0 convention fixes the sign."""
    from mapreduceindex_spark.operators.clustering import (
        embedding_power_iteration,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [-1.0, 0.0], 0),
            (3, [0.5, 0.0], 0),
            (4, [-0.5, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = [
        (r.dim, r.component_micro)
        for r in embedding_power_iteration(emb).collect()
    ]
    assert got == [(0, 1_000_000), (1, 0)]


def test_streaming_ohlc_equals_batch(spark):
    """The streaming twin must equal the batch events_ohlc bit-for-bit
    on the bounded fixture (same quantization, same tiebreak key)."""
    from tests.conftest import SF_SMALL
    from mapreduceindex_spark.operators.events import events_ohlc
    from mapreduceindex_spark.session import load_table
    from mapreduceindex_spark.streaming.pipelines import streaming_ohlc

    batch = sorted(
        tuple(r) for r in events_ohlc(
            load_table(spark, SF_SMALL, "events")
        ).collect()
    )
    stream = sorted(
        tuple(r) for r in streaming_ohlc(spark, SF_SMALL).collect()
    )
    assert stream == batch
    assert len(batch) > 0


def test_benford_prices_magnitudes_and_zero_drop(spark):
    """Benford counts by |amount|: a -$1.23 refund lands on digit 1 and
    an exact $0.00 drops — neither crashes the digit cast (the sign
    character never reaches it)."""
    from mapreduceindex_spark.operators.profiling import benford_prices

    orders = _orders(
        spark,
        [
            (1, 1, "F", -1.23, "2023-01-01"),  # |cents| 123 -> digit 1
            (2, 1, "F", 0.00, "2023-01-01"),   # dropped
            (3, 1, "F", 9.00, "2023-01-01"),   # digit 9
        ],
    )
    got = {r.digit: r.n_orders for r in benford_prices(orders).collect()}
    assert got == {1: 1, 9: 1}


def test_power_iteration_rejects_ragged_dims_across_partitions(spark):
    """3-dim and 2-dim vectors forced into different partitions: the
    per-partition guard can't see both, but the merged per-cell row
    counts disagree and the driver check raises instead of silently
    returning a wrong direction."""
    import pytest as _pytest

    from mapreduceindex_spark.operators.clustering import (
        embedding_power_iteration,
    )

    a = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
    ).repartition(1)
    b = spark.createDataFrame(
        [(2, [1.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
    ).repartition(1)
    with _pytest.raises(Exception, match="ragged"):
        embedding_power_iteration(a.union(b)).collect()


def test_copurchase_clusters_support_filter(spark):
    """Parts 1-2 co-occur in two orders (edge); 2-3 only once (no edge
    at min_support=2): {1,2} cluster to min-id 1, parts 3 and 4 stay
    singletons."""
    from mapreduceindex_spark.operators.graph import copurchase_clusters

    li = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 2), (3, 3)],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(i, "p", "B", "T", 1, 1.0) for i in (1, 2, 3, 4)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    got = {
        r.p_partkey: r.cluster_rep
        for r in copurchase_clusters(li, part).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


def test_changepoint_scan_finds_level_shift(spark):
    """Daily counts [1, 1, 5, 5]: the gap peaks at the split after day 1
    (1e6 vs 5e6) and only that row is flagged."""
    from mapreduceindex_spark.operators.events import changepoint_scan

    rows = []
    eid = 0
    for day, n in [(0, 1), (1, 1), (2, 5), (3, 5)]:
        for k in range(n):
            eid += 1
            rows.append(
                (eid, f"1970-01-0{day + 1} 0{k}:00:00", 1, "view", 1.0)
            )
    ev = _events(spark, rows)
    got = {
        r.day_num: (
            r.n_left, r.n_right, r.mean_left_micro, r.mean_right_micro,
            r.gap_micro, r.is_best,
        )
        for r in changepoint_scan(ev).collect()
    }
    assert got == {
        0: (1, 3, 1_000_000, 3_666_666, 2_666_666, 0),
        1: (2, 2, 1_000_000, 5_000_000, 4_000_000, 1),
        2: (3, 1, 2_333_333, 5_000_000, 2_666_667, 0),
    }


def test_conversion_latency_quantiles_nearest_rank(spark):
    """Latencies 10/20/30/40 s over 4 converters: p50 = rank 2 = 20,
    p90 = rank 4 = 40, p99 = rank 4 = 40; a purchase BEFORE the first
    view never converts."""
    from mapreduceindex_spark.operators.events import (
        conversion_latency_quantiles,
    )

    rows = []
    eid = 0
    for u, lat in [(1, 10), (2, 20), (3, 30), (4, 40)]:
        eid += 1
        rows.append((eid, "2024-01-01 10:00:00", u, "view", 1.0))
        eid += 1
        rows.append(
            (eid, f"2024-01-01 10:00:{lat:02d}", u, "purchase", 1.0)
        )
    rows += [
        (98, "2024-01-01 09:00:00", 9, "purchase", 1.0),  # before the view
        (99, "2024-01-01 10:00:00", 9, "view", 1.0),
    ]
    got = {
        r.p_ppm: r.latency_sec
        for r in conversion_latency_quantiles(_events(spark, rows)).collect()
    }
    assert got == {500_000: 20, 900_000: 40, 990_000: 40}


def test_repeat_buyers_intersect_distinct_set(spark):
    """Customer 1 ordered in both years (twice in one — still one output
    row: distinct-set semantics); 2 only in year A; 3 only in year B."""
    from mapreduceindex_spark.operators.relational import (
        repeat_buyers_intersect,
    )

    orders = _orders(
        spark,
        [
            (1, 1, "F", 1.0, "1995-03-01"),
            (2, 1, "F", 1.0, "1996-02-01"),
            (3, 1, "F", 1.0, "1996-07-01"),
            (4, 2, "F", 1.0, "1995-01-01"),
            (5, 3, "F", 1.0, "1996-01-01"),
        ],
    )
    got = [r.o_custkey for r in repeat_buyers_intersect(orders).collect()]
    assert got == [1]


def test_yoy_nation_revenue_signed_ppm_and_first_year_null(spark):
    """Nation doubles revenue year 2 (+1e6 ppm), halves year 3
    (-500000 ppm); the first year has NULL prev and NULL growth."""
    from mapreduceindex_spark.operators.relational import yoy_nation_revenue

    orders = _orders(
        spark,
        [
            (1, 1, "F", 1.00, "1995-01-01"),
            (2, 1, "F", 2.00, "1996-01-01"),
            (3, 1, "F", 1.00, "1997-01-01"),
        ],
    )
    customer = spark.createDataFrame(
        [(1, "c", 7, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    nation = spark.createDataFrame(
        [(7, "GERMANY", 1)], "n_nationkey int, n_name string, n_regionkey int"
    )
    got = {
        r.order_year: (r.revenue_cents, r.prev_cents, r.yoy_growth_ppm)
        for r in yoy_nation_revenue(orders, customer, nation).collect()
    }
    assert got == {
        1995: (100, None, None),
        1996: (200, 100, 1_000_000),
        1997: (100, 200, -500_000),
    }


def test_top_parts_dense_rank_ties_share_rank(spark):
    """Two parts tied at the top price both take rank 1 and the next
    distinct price is rank 2 (dense: no gap), so rank<=2 keeps 3 parts
    and drops the 4th price level."""
    from mapreduceindex_spark.operators.relational import top_parts_dense_rank

    part = spark.createDataFrame(
        [
            (1, "p", "B1", "T", 1, 9.99),
            (2, "p", "B1", "T", 1, 9.99),   # tie at rank 1
            (3, "p", "B1", "T", 1, 5.00),   # rank 2
            (4, "p", "B1", "T", 1, 1.00),   # rank 3 — cut at k=2
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    got = [
        (r.price_rank, r.p_partkey)
        for r in top_parts_dense_rank(part, k=2).collect()
    ]
    assert got == [(1, 1), (1, 2), (2, 3)]


def test_streaming_benford_equals_batch(spark):
    """The streaming twin must equal the batch benford_prices on the
    bounded fixture (shared digit projection and report fold)."""
    from tests.conftest import SF_SMALL
    from mapreduceindex_spark.operators.profiling import benford_prices
    from mapreduceindex_spark.session import load_table
    from mapreduceindex_spark.streaming.pipelines import streaming_benford

    batch = sorted(
        tuple(r)
        for r in benford_prices(load_table(spark, SF_SMALL, "orders")).collect()
    )
    stream = sorted(
        tuple(r) for r in streaming_benford(spark, SF_SMALL).collect()
    )
    assert stream == batch
    assert len(batch) > 0


def test_weekday_seasonality_epoch_modulo_dow(spark):
    """1970-01-01 (a Thursday) maps to dow 3 under the 0=Monday
    convention; 1970-01-05 is Monday (0); hours bucket by epoch
    remainder; shares cross-multiply exactly."""
    from mapreduceindex_spark.operators.events import weekday_seasonality

    ev = _events(
        spark,
        [
            (1, "1970-01-01 00:30:00", 1, "view", 1.0),  # Thu, hour 0
            (2, "1970-01-01 23:59:59", 1, "view", 1.0),  # Thu, hour 23
            (3, "1970-01-05 12:00:00", 1, "view", 1.0),  # Mon, hour 12
            (4, "1970-01-05 12:30:00", 2, "view", 1.0),  # Mon, hour 12
        ],
    )
    got = {
        (r.dow, r.hour): (r.n_events, r.share_ppm)
        for r in weekday_seasonality(ev).collect()
    }
    assert got == {
        (3, 0): (1, 250_000),
        (3, 23): (1, 250_000),
        (0, 12): (2, 500_000),
    }
