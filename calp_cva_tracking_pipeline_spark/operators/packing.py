"""Sequence packing: assign documents to fixed token-budget packs for
LLM training-example assembly.

Training pipelines concatenate documents up to a context-length budget;
the engine-side half of that is the ASSIGNMENT (which docs share a pack),
which must be distributed, deterministic, and high-occupancy. The actual
byte concatenation happens at dataloader time from the assignment.

Scale shape: docs are hashed to ``num_shards`` independent shards, and
each shard is packed locally with first-fit-decreasing inside ONE
``applyInPandas`` group — the only shuffle is the shard hash partition
(narrow (id, n_tokens) rows, never text), and pack ids are globally
unique by construction (``shard * 2^32 + local``). Determinism: the
shard hash is a fixed function of the id and FFD's order is (tokens
desc, id asc), so the same input yields the same packs under any input
partitioning — required for resumable training-data builds.

SIZING ``num_shards``: a whole shard's (id, n_tokens) rows materialize
as one pandas DataFrame on one executor, and the FFD inner loop is
O(docs × open_bins) Python per shard — so ``num_shards`` must scale
with the corpus, not stay at the default. Budget roughly
``rows_per_shard = corpus_rows / num_shards`` ≤ a few tens of millions
(~16 bytes/row in pandas plus sort overhead, and keep the Python loop
minutes-not-hours); at 100 TB / ~10^10 docs that means num_shards in
the 10^3-10^4 range. Shards are independent, so more shards only adds
parallelism; the cost is pack-count overhead of at most one partially
filled bin per shard."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.functions.hashing import stable_hash64
from calp_cva_tracking_pipeline_spark.functions.text import bpe_token_count

def _out_schema(id_type: str) -> str:
    # the id keeps its source type (string doc ids are common in crawl
    # corpora; an ANSI cast to bigint would throw on them)
    return (
        f"id {id_type}, n_tokens bigint, shard int, pack_id bigint, "
        "pack_tokens bigint, oversized boolean"
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    budget: int,
    token_col: str | None = None,
    text_col: str = "text",
    num_shards: int = 64,
) -> DataFrame:
    """(id, n_tokens, shard, pack_id, pack_tokens, oversized): one row per
    input doc, grouped into packs whose token totals are ≤ ``budget``.

    Token counts come from ``token_col`` if given, else the BPE pre-token
    proxy over ``text_col``. Docs with n_tokens > budget are each their
    own single-doc pack, flagged ``oversized=True`` (the dataloader
    truncates them); empty docs (0 tokens) still receive a pack so no
    row is ever dropped. ``pack_tokens`` repeats the pack's total on
    every member row so occupancy is auditable without a self-join.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    tokens: Column = (
        F.col(token_col)
        if token_col
        else bpe_token_count(F.col(text_col))
    )
    narrow = df.select(
        F.col(id_col).alias("id"),
        # null text/token counts pack as 0-token docs (they must still be
        # assigned — "no row is ever dropped"); a null would crash the
        # pandas FFD loop as NaN
        F.coalesce(tokens.cast("bigint"), F.lit(0)).alias("n_tokens"),
        F.pmod(
            stable_hash64(F.col(id_col).cast("string")), F.lit(num_shards)
        )
        .cast("int")
        .alias("shard"),
    )
    id_type = narrow.schema["id"].dataType.simpleString()

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        # first-fit-decreasing: sort tokens desc (id asc tie-break), drop
        # each doc into the first open bin with room; ≤ (1.22·OPT + 1)
        # bins and deterministic under any arrival order
        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        base = shard << 32
        bins: list[int] = []  # residual capacity per open bin
        assign = []
        oversized = []
        for t in pdf["n_tokens"]:
            t = int(t)
            if t > budget:
                bins.append(-1)  # closed: oversized singleton
                assign.append(len(bins) - 1)
                oversized.append(True)
                continue
            for b in range(len(bins)):
                if bins[b] >= t:
                    bins[b] -= t
                    assign.append(b)
                    break
            else:
                bins.append(budget - t)
                assign.append(len(bins) - 1)
            oversized.append(False)
        pdf["pack_id"] = [base + a for a in assign]
        pdf["oversized"] = oversized
        totals = pdf.groupby("pack_id")["n_tokens"].transform("sum")
        pdf["pack_tokens"] = totals
        return pdf[
            ["id", "n_tokens", "shard", "pack_id", "pack_tokens",
             "oversized"]
        ]

    return narrow.groupBy("shard").applyInPandas(
        pack_shard, _out_schema(id_type)
    )
