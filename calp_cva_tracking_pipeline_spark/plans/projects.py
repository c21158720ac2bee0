"""Project-feature program (reference code/07_process_project_data.R:94-165).

Builds the (project_id, cva_percentage, cva) features that EP2's
classify_cva consumes, from the long Q&A table: labeled-question splits,
the branch-ordered percentage standardizer re-expressed as ONE native
when-chain (M3 — no Python UDF, stays in codegen), boolean normalization
(C3), clamp-sum (A1) and bool-max (A2) aggregates, the two-way overlap
reconciliation (SO1 anti-joins), the J5 full-outer merge, and the final
cva override rules. All shuffles are per-project aggregations; question
label sets broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the quant answer screen (code/07:100-101)
ANSWER_NUMBER_PATTERN = "\\d+\\.\\d+|\\d+%|\\d+"

_PCT = "(\\d+(\\.\\d+)?)%"
_PCT_WORD = "(\\d+(\\.\\d+)?) percent"


def standardize_percentage(answer: Column) -> Column:
    """code/07:104-128's sapply UDF as a native expression, branch order
    preserved EXACTLY — order matters: 'less than 1%' hits the '%' branch
    (→ 1.0) before the 'less than 1' branch (→ 0) ever runs.

    1. contains '%'            → first \\d+(\\.\\d+)?% match, '%' stripped
    2. contains 'less than 1'  → 0
    3. contains 'percent'      → first \\d+(\\.\\d+)? percent match
    4. ^[0-9]+(\\.[0-9]+)?$    → the number itself
    5. else                    → R's gsub returns the input unchanged when
       the pattern misses, so the fallback strips non-numeric chars from
       the whole answer; empty → null.
    Every branch then strips [^0-9.] and casts to double (null on failure).
    """
    x = F.trim(F.lower(answer))
    branch = (
        F.when(x.contains("%"), F.regexp_extract(x, _PCT, 1))
        .when(x.contains("less than 1"), F.lit("0"))
        .when(x.contains("percent"), F.regexp_extract(x, _PCT_WORD, 1))
        .when(x.rlike("^[0-9]+(\\.[0-9]+)?$"), x)
        .otherwise(F.regexp_replace(x, "[^0-9.]", ""))
    )
    cleaned = F.regexp_replace(branch, "[^0-9.]", "")
    return F.when(cleaned == "", F.lit(None)).otherwise(
        cleaned.cast("double")
    )


def standardize_boolean(answer: Column) -> Column:
    """C3 — tolower(x) %in% c('true','qui','yes') (code/07:134-139)."""
    return F.lower(F.trim(answer)).isin("true", "qui", "yes")


def build_project_features(
    projects_qa: DataFrame,
    question_labels: DataFrame,
) -> DataFrame:
    """→ (project_id, cva_percentage, cva) — the cash_projects.csv contract.

    ``projects_qa``: long (project_id, question, answer);
    ``question_labels``: (question, question_type) with types from
    {quantC, quantV, flagCVA, ...} (reference cva_project_questions.csv).
    """
    quant_qs = question_labels.filter(
        F.col("question_type").isin("quantC", "quantV")
    ).select("question")
    flag_qs = question_labels.filter(
        F.col("question_type") == "flagCVA"
    ).select("question")

    # quant side: labeled questions, digit-bearing answers (F10), branch
    # chain, A1 clamp-sum (code/07:100-132)
    quant = (
        projects_qa.join(F.broadcast(quant_qs), "question")
        .filter(F.col("answer").rlike(ANSWER_NUMBER_PATTERN))
        .withColumn("__pct", standardize_percentage(F.col("answer")))
        .groupBy("project_id")
        .agg(
            (
                F.least(F.lit(100.0), F.sum("__pct")) / 100.0
            ).alias("cva_percentage")
        )
    )
    # boolean side: C3 + A2 (code/07:134-143)
    flags = (
        projects_qa.join(F.broadcast(flag_qs), "question")
        .withColumn("__b", standardize_boolean(F.col("answer")))
        .groupBy("project_id")
        .agg((F.max(F.col("__b").cast("int")) == 1).alias("cva"))
    )

    # overlap reconciliation (code/07:146-160): projects quantified at 0%
    # gain cva=FALSE rows if absent from the flag side; flagged-FALSE
    # projects gain 0% rows if absent from the quant side (SO1 anti-joins)
    zero_to_bool = (
        quant.filter(F.col("cva_percentage") == 0)
        .join(flags.select("project_id"), "project_id", "left_anti")
        .select("project_id", F.lit(False).alias("cva"))
    )
    flags = flags.unionByName(zero_to_bool)
    bool_to_zero = (
        flags.filter(~F.col("cva"))
        .join(quant.select("project_id"), "project_id", "left_anti")
        .select("project_id", F.lit(0.0).alias("cva_percentage"))
    )
    quant = quant.unionByName(bool_to_zero)

    # J5 full outer + final override: pct>0 → TRUE, pct==0 → FALSE
    # (code/07:158-160)
    merged = quant.join(flags, "project_id", "full_outer")
    cva = (
        F.when(F.col("cva_percentage") > 0, F.lit(True))
        .when(F.col("cva_percentage") == 0, F.lit(False))
        .otherwise(F.col("cva"))
    )
    return merged.withColumn("cva", cva)


def project_text(projects_qa: DataFrame) -> DataFrame:
    """project_text.csv contract — distinct id/name/objective rows
    (code/07:164-165, D3)."""
    return projects_qa.select(
        "project_id", "project_name", "project_objective"
    ).dropDuplicates()
