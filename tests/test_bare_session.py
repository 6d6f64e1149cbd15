"""Regression test for the round-1 driver failure: the engine must run on a
SparkSession it did NOT build.

The driver's correctness harness constructs its own bare
``SparkSession.builder.getOrCreate()`` without ``get_spark()``'s configs, so
every read-time dependency (``nanosAsLong`` for the TIMESTAMP(NANOS) events
parquet, UTC session timezone for ``unix_timestamp``/``date_trunc`` parity
with DuckDB) must be (re)established by ``load_table`` /
``_stream_events`` themselves, not assumed from session construction.

We simulate the bare session by stripping those runtime confs from the
shared test session, then run every query that round 1's harness flagged
(9 err + 6 unchecked) end-to-end against the DuckDB oracle.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, assert_df_matches_oracle

AFFECTED = [
    "events_tumbling",
    "events_sliding",
    "sessionize",
    "events_json_stats",
    "user_activity_pivot",
    "purchasers_without_errors",
    "asof_prior_purchase",
    "streaming_tumbling",
    "streaming_sessions",
    "streaming_first_seen",
    "streaming_inverted_index",
    "media_metadata_stats",
    "media_features",
    "media_resize",
    "media_frame_sample",
]


@pytest.fixture()
def bare_spark(spark):
    """The shared session with the engine-critical runtime confs stripped —
    what a driver-built bare session looks like to the engine."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev_tz)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_ensure_session_confs_is_the_single_conf_site(bare_spark):
    """Every read-dependent runtime conf — including the parallel-discovery
    threshold the manifest source needs — is (re)established by
    ``ensure_session_confs`` on a bare session, and the manifest source
    routes through it rather than setting session conf as a side effect
    of its own (round-2 advice: one conf site, same class of bug as
    round 1's nanos failure)."""
    import inspect

    from mapreduceindex_spark.session import ensure_session_confs
    from mapreduceindex_spark.sources import manifest

    bare_spark.conf.unset(
        "spark.sql.sources.parallelPartitionDiscovery.threshold"
    )
    ensure_session_confs(bare_spark)
    assert (
        bare_spark.conf.get(
            "spark.sql.sources.parallelPartitionDiscovery.threshold"
        )
        == "100000"
    )
    assert bare_spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert bare_spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # the manifest source must not carry its own spark.conf.set side effect
    src = inspect.getsource(manifest)
    assert "conf.set" not in src
    assert "ensure_session_confs" in src


@pytest.mark.parametrize("name", AFFECTED)
def test_query_runs_and_matches_oracle_on_bare_session(bare_spark, duck, name):
    import __spark_entry__ as entry

    q = entry.queries()[name]
    df = q(bare_spark, SF_SMALL)
    oracle = entry.oracle_sql().get(name)
    if oracle is None:
        # weaker rows-only contract (mirrors the driver's fallback)
        assert df.count() >= 0
    else:
        assert_df_matches_oracle(df, duck, oracle, check_schema=False)
