"""SQL entry point: `catalog.register_views` + `spark.sql` must be a
first-class way to drive the engine (the DataFrame queries and raw
SQL share Catalyst, so results must agree)."""

from __future__ import annotations

from ml_feature_store_enterprise_grade_spark import registry
from ml_feature_store_enterprise_grade_spark.catalog import register_views
from tests.conftest import SF_SMOKE


def test_sql_over_registered_views_matches_dataframe_query(spark):
    register_views(spark, SF_SMOKE, "events", "customer", "nation")
    got = spark.sql(
        """
        SELECT n.n_name AS nation,
               c.c_mktsegment AS segment,
               COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users,
               ROUND(SUM(e.value), 2) AS sum_value
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
        """
    )
    want = registry.queries()["event_customer_enrichment"](spark, SF_SMOKE)
    assert sorted(got.columns) == sorted(want.columns)
    assert got.exceptAll(want.select(*got.columns)).count() == 0
    assert want.select(*got.columns).exceptAll(got).count() == 0


def test_sql_window_tvf_matches_hourly_features(spark):
    """The windowed feature core must be reachable from raw Spark SQL
    (window() in GROUP BY) with results identical to the DataFrame
    operator — same Catalyst plan family, same numbers."""
    register_views(spark, SF_SMOKE, "events")
    got = spark.sql(
        """
        SELECT user_id,
               window.start AS window_start,
               window.end AS feature_timestamp,
               COUNT(*) AS total_events,
               COUNT(*) FILTER (WHERE event_type = 'click') AS click_count,
               ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
                   AS total_revenue
        FROM events
        WHERE user_id IS NOT NULL
        GROUP BY user_id, window(ts, '1 hour')
        """
    )
    want = registry.queries()["user_hourly_features"](spark, SF_SMOKE).select(
        *got.columns
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
