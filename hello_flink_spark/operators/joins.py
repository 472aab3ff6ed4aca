"""Join combinators beyond Spark's built-in ``df.join`` (SURVEY §2.3).

The built-in joins (inner/outer/semi/anti/cross/theta) need no wrapper —
declared queries call ``df.join`` directly and Catalyst picks
broadcast-hash / sort-merge / nested-loop. This module holds the joins
Spark lacks natively:

- ``asof_join`` — Flink's temporal table join, ``FOR SYSTEM_TIME AS OF``
  [F org.apache.flink.table.api: temporal table function join]. For each
  left row, the latest right row with ``right_ts <= left_ts`` per key.

Scale notes (100 TB): the naive formulation (range join + ROW_NUMBER)
explodes to O(|L|·|R|/keys) intermediate rows before the rank filter.
We instead cogroup both sides by key and run ``pandas.merge_asof``
per key partition — shuffle is one exchange per side on the join key
(exactly what a sort-merge join would do), memory is bounded by the
per-key group, and there is no intermediate blowup. Skewed keys can be
salted upstream with ``repartition``; AQE skew handling does not apply
inside cogroup, so extremely hot keys are the caller's responsibility.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    schema: str,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of (backward) join: latest right row with right_ts <= left_ts per key.

    ``schema`` is the output schema DDL: all left columns followed by the
    right columns to attach (right columns other than ``key`` are kept).
    Unmatched left rows keep nulls on the right side (LEFT ASOF).
    """
    left_cols = left.columns
    right_cols = [c for c in right.columns if c != key]

    def merge(left_pdf: pd.DataFrame, right_pdf: pd.DataFrame) -> pd.DataFrame:
        left_pdf = left_pdf.sort_values(left_ts)
        right_pdf = right_pdf.sort_values(right_ts)
        out = pd.merge_asof(
            left_pdf,
            right_pdf.drop(columns=[key]),
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            allow_exact_matches=allow_exact_matches,
        )
        out = out[left_cols + right_cols]
        # pandas fills unmatched numeric columns with NaN; Spark must see
        # SQL NULL (NaN != NULL in Spark), so rewrite misses explicitly.
        for c in right_cols:
            col = out[c]
            if col.isna().any():
                out[c] = col.astype(object).where(col.notna(), None)
        return out

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, schema=schema)
    )


def lookup_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Flink lookup join [F LookupTableSource]: per-record dim enrichment.

    In Spark the scalable equivalent is a broadcast hash join against the
    dim snapshot — map-side, no shuffle of the fact table.
    """
    return fact.join(F.broadcast(dim), on, how)
