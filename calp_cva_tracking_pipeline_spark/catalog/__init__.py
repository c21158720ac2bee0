"""Driver-facing query catalog.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
ANSI-SQL (DuckDB-dialect-compatible) oracle string that computes the same
result on the same parquet tables. Names map 1:1 to SURVEY.md §2 operator ids
(prefix = inventory row) plus the beyond-reference scale operators.

ORDERING CONTRACT: the external driver's correctness gate reads exactly
the FIRST 50 entries of queries() in dict insertion order
(RELATIONAL_QUERIES first, then SCALE_QUERIES). Every gated entry must
carry an oracle twin; entries 51+ are verified by the local parity suite
(tests/test_oracle_parity.py) instead and may be rows-only when declared
in tests/test_coverage_map.py::NON_SQL_QUERIES. The exact gate set is
pinned by tests/test_coverage_map.py::DRIVER_GATE — adding a query means
consciously choosing gate placement (edit the pinned list) or local-parity
placement (append after position 50).

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
