"""calp_cva_tracking_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of The-CALP-Network/CALP-CVA-Tracking-Pipeline (reference studied
read-only at /root/reference; see SURVEY.md for the operator inventory this
package implements). Nothing here is a port: every operator is declared with
the DataFrame/SQL API so Catalyst + Tungsten (predicate pushdown, column
pruning, broadcast joins, whole-stage codegen, AQE) pick the physical plan.

Layout
------
- ``session``    SparkSession factory tuned for large-cluster defaults.
- ``functions``  column-level helpers (text canonicalization, exact money
                 arithmetic, stable hashing) shared by the operators.
- ``operators``  the SURVEY.md §2 operator inventory as reusable DataFrame
                 transformations (reshape, dedup, joins, windows, cascades,
                 aggregates, similarity search, text analysis, ML stub).
- ``sources``    ingestion adapters (paginated REST JSON, CSV/TSV/Excel with
                 null-token normalization) — SURVEY.md §2.1.
- ``plans``      end-to-end pipeline builders mirroring the reference's three
                 entry points (curate → relevance/amounts → global matching).
- ``streaming``  Structured Streaming ingest + windowed aggregation of the
                 events stream (beyond-reference capability).
"""

__version__ = "0.1.0"
