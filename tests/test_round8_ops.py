"""Round-8 semantics tests: the unified gap_sec boundary convention,
the ADVICE floor-division calendar fixes, and the containment df-basis
equivalence across tiers."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_events_fixture(tmp_path, rows):
    """Write a single-file events.parquet matching the driver fixture's
    schema (TIMESTAMP-µs ts), readable by both the batch loader and the
    file-stream source."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[1] for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_gap_boundary_convention_unified(spark, tmp_path):
    """An event at EXACTLY gap_sec after its predecessor stays
    in-session in BOTH the lag-based batch sessionizer and the
    session_window-based streaming ops (split strictly > gap_sec).

    Fixture: view @10:00, click @10:30:00 (gap == 1800 s — the
    boundary), purchase @10:40, then view @12:00 (gap 4800 s — splits).
    Under the unified convention the first session holds all three
    funnel stages; under session_window's native >= split the click
    would start a view-less session and the funnel would report
    click = purchase = 0 — so this fixture discriminates the two.
    """
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, 7, "view"),
        (2, t0 + dt.timedelta(seconds=1800), 7, "click"),
        (3, t0 + dt.timedelta(seconds=2400), 7, "purchase"),
        (4, t0 + dt.timedelta(seconds=7200), 7, "view"),
    ]
    sf_dir = _write_events_fixture(tmp_path, rows)

    # batch lag-based sessionizer: membership {1,2,3} + {4}
    from mapreduceindex_spark.operators.events import sessionize
    from mapreduceindex_spark.session import load_table

    batch = sessionize(load_table(spark, sf_dir, "events"))
    by_sid = {
        r["session_id"]: r["n_events"]
        for r in batch.collect()
    }
    assert by_sid == {0: 3, 1: 1}

    # streaming session_window sessionizer: identical membership
    from mapreduceindex_spark.streaming.pipelines import (
        streaming_session_counts,
        streaming_session_funnel,
    )

    ss = streaming_session_counts(spark, sf_dir).collect()
    assert [(r["n_events"], r["duration_sec"]) for r in ss] == [
        (3, 2400),
        (1, 0),
    ]

    funnel = {
        r["stage"]: r["n_sessions"]
        for r in streaming_session_funnel(spark, sf_dir).collect()
    }
    # session 1 reaches all three stages in order; session 2 only views
    assert funnel == {"view": 2, "click": 1, "purchase": 1}


def test_epoch_day_floor_semantics_pre_1970(spark):
    """The floored epoch-day/dow/hour formulas put 1969-12-31 23:59:59
    (epoch −1) on its true calendar coordinates — Wednesday (dow 2),
    hour 23, day −1 — where truncating DIV/% would claim Thursday
    hour 0 day 0."""
    from mapreduceindex_spark.operators.events import (
        events_ohlc,
        weekday_seasonality,
    )

    events = spark.createDataFrame(
        [
            (1, dt.datetime(1969, 12, 31, 23, 59, 59), 1, "view", 2.0, "{}"),
            (2, dt.datetime(1970, 1, 1, 0, 0, 1), 1, "view", 3.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    heat = {
        (r["dow"], r["hour"]): r["n_events"]
        for r in weekday_seasonality(events).collect()
    }
    assert heat == {(2, 23): 1, (3, 0): 1}

    days = [r["day_num"] for r in events_ohlc(events).collect()]
    assert days == [-1, 0]


def test_label_outliers_handles_components_below_minus_one(spark):
    """The floored-centroid formula needs no [-1, 1] component range:
    a vector with a −2.5 component still yields an exact integer
    centroid and non-negative squared distances."""
    from mapreduceindex_spark.operators.similarity import label_outliers

    emb = spark.createDataFrame(
        [
            (1, [-2.5, 0.0], 0),
            (2, [0.5, 0.0], 0),
            (3, [0.5, 1.0], 0),
        ],
        "vec_id long, embedding array<double>, label long",
    )
    out = label_outliers(emb, top_k=3).collect()
    # centroid = (floor(-1500000/3), floor(1000000/3)) = (-500000, 333333)
    # v1: 2000000^2 + 333333^2; v2: 1000000^2 + 333333^2;
    # v3: 1000000^2 + 666667^2
    d = {r["vec_id"]: r["dist2_u"] for r in out}
    assert d[1] == 4_000_000_000_000 + 111_110_888_889
    assert d[2] == 1_000_000_000_000 + 111_110_888_889
    assert d[3] == 1_000_000_000_000 + 444_444_888_889
    assert [r["vec_id"] for r in out] == [1, 3, 2]


def test_copurchase_clusters_ignores_orphan_partkeys(spark):
    """FK-orphan l_partkeys (lineitem keys absent from part) neither
    appear as nodes nor become component labels — dirty data is
    fk_integrity_audit's job to report, not this operator's to
    cluster."""
    from mapreduceindex_spark.operators.graph import copurchase_clusters

    lineitem = spark.createDataFrame(
        # orders 1 & 2 pair part 10 with ORPHAN part 5 (min_support=2);
        # orders 3 & 4 pair parts 10 and 20
        [(1, 10), (1, 5), (2, 10), (2, 5), (3, 10), (3, 20), (4, 10), (4, 20)],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame([(10,), (20,)], "p_partkey long")
    out = {
        r["p_partkey"]: r["cluster_rep"]
        for r in copurchase_clusters(lineitem, part).collect()
    }
    # orphan 5 gone; 10-20 cluster under rep 10 (not orphan-min 5)
    assert out == {10: 10, 20: 10}


def test_outer_join_eviction_and_null_completion(spark, tmp_path):
    """Forced multi-batch replay of the stream-stream outer join
    (maxFilesPerTrigger=1, three files in mtime order) pinning all
    three emission behaviors on the SHIPPED join plan:

    - batch B's purchase matches batch A's view held in state
      (cross-batch state retention);
    - once the watermark passes a view's window end, its NULL row
      emits (watermark NULL-completion);
    - batch C's purchase for that view — in-window by EVENT time but
      arriving after eviction — produces NO match row (state eviction:
      the outer verdict, once emitted, is final).
    """
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mapreduceindex_spark.streaming.pipelines import _outer_join_plan

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    src = tmp_path / "src"
    src.mkdir()

    def write(rows, name, mtime):
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        path = str(src / name)
        pq.write_table(table, path)
        os.utime(path, (mtime, mtime))

    base = time.time() - 1000
    sec = dt.timedelta(seconds=1)
    # A: two views at t0; a sentinel view keeps the v-side watermark
    # from being the global minimum later
    write(
        [(1, t0, 1, "view"), (2, t0, 2, "view"),
         (9, t0 + 2000 * sec, 9, "view")],
        "a.parquet", base,
    )
    # B: u2's purchase (matches the batch-A view from state) + a
    # purchase sentinel pushing the p-side watermark to t0+2000-10s,
    # past view 1's window end (t0+600)
    write(
        [(12, t0 + 100 * sec, 2, "purchase"),
         (19, t0 + 2000 * sec, 99, "purchase")],
        "b.parquet", base + 10,
    )
    # C: sentinel-only batch — the watermark visible DURING a batch is
    # computed from the PREVIOUS batch's data, so this batch is where
    # view 1 (window end t0+600 < 1990) is evicted and NULL-completed
    write([(18, t0 + 2001 * sec, 98, "purchase")], "c.parquet", base + 20)
    # D: u1's purchase, in-window by event time (t0+50) but arriving
    # after view 1 was evicted and NULL-completed
    write([(11, t0 + 50 * sec, 1, "purchase")], "d.parquet", base + 30)

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    joined = _outer_join_plan(stream, window_sec=600, delay_sec=10)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["view_id"], r["purchase_id"])
        for r in spark.read.parquet(out_dir).collect()
    )
    # view 1: NULL-completed, and NOT matched by the late batch-C
    # purchase; view 2: cross-batch match; view 9: window still open at
    # the final watermark — withheld
    assert rows == [(1, None), (2, 12)]


def test_ewma_recursive_cte_matches_driver_fold(spark, tmp_path):
    """Spark 4's WITH RECURSIVE produces bit-identical EWMA output to
    the registry's driver-side fold — pins the recursive-CTE API
    surface AND that the two physical shapes share one definition
    (gap days decaying included)."""
    from mapreduceindex_spark.operators.events import (
        events_ewma,
        ewma_recursive_cte,
    )

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    # days 0,1,2 then a 3-day gap, then day 6 — gap days must decay
    for day, n in ((0, 5), (1, 2), (2, 9), (6, 4)):
        for _ in range(n):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(days=day, seconds=eid), 1, "view"))
    sf_dir = _write_events_fixture(tmp_path, rows)
    from mapreduceindex_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    a = [tuple(r) for r in events_ewma(ev).collect()]
    b = [tuple(r) for r in ewma_recursive_cte(ev).collect()]
    assert a == b
    assert len(a) == 7 and a[0] == (a[0][0], 5, 5_000_000)
    # decay on the empty day 3: e = 0.3*0 + floor(0.7*e2)
    e2 = a[2][2]
    assert a[3] == (a[0][0] + 3, 0, (700_000 * e2) // 1_000_000)


def test_timeout_sessions_emission_paths(spark, tmp_path):
    """The three emission behaviors of the EventTimeTimeout sessionizer
    on one fixture: an in-stream split emits immediately; the last
    session of a quiet user emits via TIMEOUT once the watermark
    strictly passes its horizon (fired in the trailing no-data batch);
    a session still open at the horizon emits nothing."""
    from mapreduceindex_spark.streaming.pipelines import (
        streaming_timeout_sessions,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, t0, 1, "view"),
        (2, t0 + 100 * s, 1, "view"),          # session 1: 2 events
        (3, t0 + 5000 * s, 1, "view"),         # splits -> session 2
        # sentinel: watermark = this - 3600 = t0 + 6801 s, strictly
        # past session 2's horizon t0 + 5000 + 1800 -> timeout fires;
        # the sentinel's own session stays open -> withheld
        (9, t0 + (5000 + 3600 + 1801) * s, 9, "view"),
    ]
    sf_dir = _write_events_fixture(tmp_path, rows)
    out = [
        (r["user_id"], r["n_events"], r["session_end_us"] - r["session_start_us"])
        for r in streaming_timeout_sessions(spark, sf_dir).collect()
    ]
    assert out == [(1, 2, 100_000_000), (1, 1, 0)]


def test_pii_scrub_counts_and_redaction(spark):
    """Synthetic PII through the scrubber: class counts on the original
    text, redacted_chars from the fixed email->ipv4->digit scrub order
    (the email's digits must be gone before the digit pass)."""
    from mapreduceindex_spark.operators.text_analysis import pii_scrub_stats

    docs = spark.createDataFrame(
        [
            (1, "mail bob123456@example.com and 10.0.0.1 plus 1234567", "a"),
            (2, "clean text only", "a"),
            (3, "ip 192.168.001.255 twice 10.1.2.3", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in pii_scrub_stats(docs).collect()}
    a, b = out["a"], out["b"]
    # counts are per class on the ORIGINAL text: the email's embedded
    # 123456 run counts for the digit class too (exposure, not a
    # partition)
    assert (a["n_emails"], a["n_ipv4"], a["n_digit_runs"]) == (1, 1, 2)
    # redaction: email bob123456@example.com (21 ch) + ip 10.0.0.1
    # (8 ch) + standalone 1234567 (7 ch); the email's digits are
    # consumed by the email pass, not re-counted by the digit pass
    assert a["redacted_chars"] == 21 + 8 + 7
    # dotted octets never form a 6+ digit run
    assert (b["n_emails"], b["n_ipv4"], b["n_digit_runs"]) == (0, 2, 0)
    assert b["redacted_chars"] == 15 + 8


def test_price_qty_regression_matches_numpy(spark):
    """The exact integer OLS equals numpy's float fit to micro
    precision on a small frame (sanity beyond the cross-engine
    hash: the formula itself is right)."""
    import numpy as np

    from mapreduceindex_spark.operators.relational import (
        price_qty_regression,
    )

    rng = np.random.default_rng(7)
    qty = rng.integers(1, 51, 200).astype(float)
    price = 912.34 * qty + 1000 + rng.normal(0, 50, 200).round(2)
    li = spark.createDataFrame(
        [(float(q), float(p)) for q, p in zip(qty, price)],
        "l_quantity double, l_extendedprice double",
    )
    row = price_qty_regression(li).collect()[0]
    x = np.round(qty * 100).astype(np.int64)
    y = np.round(price * 100).astype(np.int64)
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row["slope_micro"] / 1e6 - slope) < 1e-3
    assert abs(row["intercept_micro"] / 1e6 - intercept) < 1.0
    assert row["n"] == 200


def test_pii_scrub_cross_engine_on_pii_bearing_text(spark):
    """The Spark scrubber and the registry's DuckDB oracle agree on
    text that ACTUALLY contains every PII class — the fixture corpus
    has none, so the driver drive alone would leave the IPv4/digit
    legs vacuous (the round-8 review caught exactly that: a \\b typed
    in a non-raw oracle literal parsed as a backspace and never
    matched)."""
    import duckdb
    import importlib.util

    from mapreduceindex_spark.operators.text_analysis import pii_scrub_stats
    from tests.conftest import assert_df_matches_oracle

    spec = importlib.util.spec_from_file_location(
        "entry_for_pii", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sql = mod.oracle_sql()["pii_scrub_stats"]

    rows = [
        (1, "mail bob123456@example.com and 10.0.0.1 plus 1234567", "a"),
        (2, "clean text only", "a"),
        (3, "ip 192.168.001.255 twice 10.1.2.3", "b"),
        (4, "a.b+c_d%e@sub.domain.org then 99999 short", "b"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    con = duckdb.connect()
    import pandas as pd

    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "source"]),
    )
    assert_df_matches_oracle(pii_scrub_stats(docs), con, sql)


def test_csv_roundtrip_survives_embedded_newlines(spark):
    """Text with embedded newlines round-trips through the CSV
    write/read path intact (multiLine reader default — without it each
    physical line parses as a record and the histogram corrupts;
    round-8 review catch)."""
    from mapreduceindex_spark.sources.documents import documents_from_csv

    import shutil
    import tempfile

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\ngamma", "s"),
            (2, 'quote " comma, and\r\nmore', "s"),
        ],
        "doc_id long, text string, source string",
    )
    path = tempfile.mkdtemp(prefix="csv_nl_")
    try:
        (
            docs.select("doc_id", "text")
            .write.mode("overwrite")
            .options(header="true", escape='"')
            .csv(path)
        )
        back = {
            r["doc_id"]: r["text"]
            for r in documents_from_csv(spark, path).collect()
        }
        assert back == {
            1: "alpha beta\ngamma",
            2: 'quote " comma, and\r\nmore',
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_full_outer_join_completes_both_sides(spark, tmp_path):
    """The full-outer form NULL-completes BOTH directions with their
    distinct horizons: an unmatched view needs its whole match WINDOW
    below the watermark; an unmatched purchase needs only its OWN
    timestamp passed (no earlier-or-equal view can still arrive);
    rows with open horizons emit nothing."""
    from mapreduceindex_spark.streaming.pipelines import (
        streaming_full_outer_join,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    s = dt.timedelta(seconds=1)
    late = t0 + (3600 + 700) * s  # watermark lands at t0 + 700 s
    rows = [
        (1, t0, 1, "view"),
        (11, t0 + 100 * s, 1, "purchase"),     # match
        (12, t0 + 50 * s, 2, "purchase"),      # expired -> NULL view
        (3, t0 + 10 * s, 3, "view"),           # window end 610 < 700 -> NULL
        (4, late, 4, "view"),                  # open window -> withheld
        (15, late, 5, "purchase"),             # own ts == max > wm -> withheld
    ]
    sf_dir = _write_events_fixture(tmp_path, rows)
    rows_out = [
        (r["view_id"], r["user_id"], r["purchase_id"])
        for r in streaming_full_outer_join(spark, sf_dir).collect()
    ]
    got = sorted(rows_out, key=lambda t: t[1])
    assert got == [(1, 1, 11), (None, 2, 12), (3, 3, None)]
