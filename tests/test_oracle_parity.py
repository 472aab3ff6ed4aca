"""Local clone of the driver's correctness gate (SURVEY §5.1).

Every declared query with an oracle runs on Spark AND DuckDB at sf0.001
and must match on row count, schema, and order-insensitive values.
The driver does the same at sf0.01 — run with
``SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01`` to mirror it exactly.
"""

from __future__ import annotations

import pytest

from hello_flink_spark.oracle import compare, duck_connection
from hello_flink_spark.registry import all_specs

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spec = SPECS[name]
    result = compare(name, spec.fn(spark, sf_dir), spec.oracle, duck)
    assert result.ok, f"{name}: {result.detail}"


# Hand-authored from the Flink Pattern#next semantics directly (VERDICT
# r07 #3) — NOT generated via oracle_sql(STRICT3), so a common-mode bug
# in the pattern→SQL generator cannot hide here. Different formulation
# on purpose: RANK-over-window tie group + BOOL_OR for the strict stage
# (the generator uses LEFT JOIN + two MINs), ROW_NUMBER for the relaxed
# first-purchase promotion (the generator uses JOIN + MIN + GROUP BY).
# Semantics encoded: (1) every view anchors a partial; (2) the match's
# click must sit at the EARLIEST strictly-later event timestamp of the
# user's stream, any type counted, within 24 h — if some event exists
# there but no click does, the partial dies silently (ties at that
# timestamp resolve as "some earliest event matches"); (3) the FIRST
# purchase strictly after the click within 24 h completes the match.
STRICT3_HAND_ORACLE = """
WITH nxt AS (
    SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
           e.ts AS click_ts, e.event_type AS etype
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN events e
      ON e.user_id = v.user_id
     AND e.ts > v.ts
     AND e.ts <= v.ts + INTERVAL 1440 MINUTE
    QUALIFY RANK() OVER (PARTITION BY v.event_id ORDER BY e.ts) = 1
),
clicked AS (
    SELECT user_id, view_id, view_ts, click_ts
    FROM nxt
    GROUP BY user_id, view_id, view_ts, click_ts
    HAVING BOOL_OR(etype = 'click')
)
SELECT c.user_id, c.view_id, c.view_ts, c.click_ts, p.ts AS purchase_ts
FROM clicked c
JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND p.ts > c.click_ts
 AND p.ts <= c.click_ts + INTERVAL 1440 MINUTE
QUALIFY ROW_NUMBER() OVER (PARTITION BY c.view_id ORDER BY p.ts) = 1
"""


def test_cep_strict_hand_oracle(spark, sf_dir, duck):
    """The independently-authored SQL must hash-match the declared
    Spark query — and, transitively, the generated oracle that the
    driver gate already pins the query to."""
    spec = SPECS["cep_pattern_strict"]
    result = compare(
        "cep_pattern_strict[hand]", spec.fn(spark, sf_dir), STRICT3_HAND_ORACLE, duck
    )
    assert result.ok, f"hand-written strict oracle diverged: {result.detail}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    """Rows-only ops must at least execute and return a stable schema."""
    df = SPECS[name].fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    df.collect()  # must not raise


def test_cep_rel_guard_timeout_chain_matches_oracle(spark, sf_dir, duck):
    """The rel-guard pattern's TIMEOUT side-output chain (LEFT joins
    with the carried value column and NULL-propagating MIN_BY) must
    match its generated oracle — the left-chain value-carry path has
    no declared query of its own, so pin it here."""
    import pandas as pd

    from hello_flink_spark.sources.readers import load_table
    from hello_flink_spark.streaming.cep import (
        RELGUARD3,
        compile_batch_timeouts,
        oracle_sql_timeouts,
    )

    sp = compile_batch_timeouts(
        RELGUARD3, load_table(spark, sf_dir, "events")
    ).toPandas()
    dp = duck.execute(oracle_sql_timeouts(RELGUARD3)).df()
    cols = sorted(sp.columns)
    assert sorted(dp.columns) == cols
    s = sp[cols].sort_values(cols).reset_index(drop=True)
    d = dp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        d[c] = d[c].astype(s[c].dtype)
    assert len(s) and s.equals(d)
