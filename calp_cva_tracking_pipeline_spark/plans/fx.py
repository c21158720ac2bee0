"""USD exchange-rates program (reference code/util_exchange_rates.R:8-85)
as one DataFrame plan.

Waterfall of three sources — OECD (authoritative), World Bank, IMF IFS —
where each later source contributes only (iso3, year) pairs unseen so far
(J14 anti-waterfall), scaffolded onto the dense iso3 × [start, end] grid
(J15) so downstream joins see every key with value null where no source
reported. All three inputs arrive as already-decoded DataFrames (the
network/JSON decode layer is sources.external: S11 SDMX for OECD, S12 for
WB/IFS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.cascade import apply_patch_map
from calp_cva_tracking_pipeline_spark.operators.joins import (
    anti_waterfall_union,
    grid_scaffold,
)

# OECD country-name fixes (reference code/util_exchange_rates.R:43-48) —
# names the isos dimension spells differently.
OECD_NAME_PATCHES = [
    ("Russia", "Russian Federation"),
    ("Czechia", "Czech Republic"),
    ("Euro area (20 countries)", "Euro area"),
]


def build_usd_exchange_rates(
    oecd_raw: DataFrame,
    wb: DataFrame,
    ifs: DataFrame,
    isos: DataFrame,
    start_year: int = 1950,
    end_year: int = 2025,
) -> DataFrame:
    """→ (iso3, year, value) over the full iso3 × year grid.

    ``oecd_raw``: (country_name, year, value) — SDMX-decoded (S11);
    ``wb`` / ``ifs``: (iso3, year, value) — S12-decoded;
    ``isos``: (countryname_oecd, iso3).
    """
    # CC6 name patches, then resolve names through the isos dimension
    oecd = apply_patch_map(oecd_raw, "country_name", OECD_NAME_PATCHES)
    oecd = (
        oecd.join(
            F.broadcast(
                isos.select(
                    F.col("countryname_oecd").alias("country_name"), "iso3"
                )
            ),
            "country_name",
        )
        .select("iso3", "year", "value")
    )
    # F9: drop null/zero observations (code/util_exchange_rates.R:51)
    oecd = oecd.filter(F.col("value").isNotNull() & (F.col("value") != 0))

    # J14: OECD → WB → IFS, later sources only for unseen (iso3, year)
    merged = anti_waterfall_union(
        [
            oecd,
            wb.filter(F.col("value").isNotNull()),
            ifs.filter(F.col("value").isNotNull()),
        ],
        ["iso3", "year"],
    )

    # J15: dense iso3 × [start, end] scaffold, nulls kept (code/util:30,83)
    grid = grid_scaffold(
        isos.select("iso3"), "iso3", start_year, end_year, "year", merged
    )
    return grid.select("iso3", "year", "value").orderBy("iso3", "year")
