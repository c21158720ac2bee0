"""Driver-facing query catalog.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
ANSI-SQL (DuckDB-dialect-compatible) oracle string that computes the same
result on the same parquet tables. Names map 1:1 to SURVEY.md §2 operator ids
(prefix = inventory row) plus the beyond-reference scale operators.

Float discipline (why results hash-match bit-for-bit):
- money/metric sums run through exact DECIMAL accumulation cast back to
  double on BOTH sides (functions.numeric);
- analytic chains through libm (exp/ln/pow, cosine) are rounded to 6 dp on
  BOTH sides;
- every computed column is aliased identically on both sides.
"""

from calp_cva_tracking_pipeline_spark.catalog.relational import (
    RELATIONAL_QUERIES,
)
from calp_cva_tracking_pipeline_spark.catalog.scale import SCALE_QUERIES

ALL_QUERIES = {**RELATIONAL_QUERIES, **SCALE_QUERIES}


def queries():
    return {name: spec[0] for name, spec in ALL_QUERIES.items()}


def oracle_sql():
    return {
        name: spec[1] for name, spec in ALL_QUERIES.items() if spec[1] is not None
    }
