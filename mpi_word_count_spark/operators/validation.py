"""Declarative data-quality validation (Deequ-style, reduced to the
Spark-native core): a rule set compiles into ONE conditional-aggregate
pass per table — never one job per rule — plus one anti-join per
referential rule. The output is a (rule, violations, checked) report,
the artifact a 100 TB ingest job gates publication on.

Scale shape: N predicate rules over a table cost exactly one scan
(each rule is a `sum(case when violated)` running inside the same
partial aggregate; the exchange carries one row per rule set).
Referential rules are the only shuffles — a left-anti join on the
foreign key, which AQE converts to broadcast when the primary side is
small. Nothing collects to the driver but the report rows themselves.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named row-level expectation: `violated` marks BAD rows."""

    name: str
    violated: Column


def check_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """All predicate rules over one DataFrame in a single scan:
    (rule, violations, checked)."""
    aggs = [
        F.sum(F.when(r.violated, 1).otherwise(0)).alias(r.name)
        for r in rules
    ]
    wide = df.agg(*aggs, F.count(F.lit(1)).alias("_checked"))
    stacked = ", ".join(f"'{r.name}', {r.name}" for r in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stacked}) as (rule, violations)",
        "_checked as checked",
    )


def check_unique(df: DataFrame, name: str, key_cols: list[str]) -> DataFrame:
    """Uniqueness expectation: violations = rows beyond the first per
    key (total − distinct keys) — one partial-aggregated count-distinct
    pass, no self-join."""
    return df.agg(
        F.lit(name).alias("rule"),
        (F.count(F.lit(1)) - F.countDistinct(*key_cols)).alias("violations"),
        F.count(F.lit(1)).alias("checked"),
    ).select("rule", "violations", "checked")


def check_reference(
    child: DataFrame,
    parent: DataFrame,
    name: str,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential expectation: child rows whose key has no parent —
    a left-anti join (the one shuffle a referential rule genuinely
    needs; AQE broadcasts the parent side when it fits)."""
    total = child.agg(F.count(F.lit(1)).alias("checked"))
    orphans = (
        child.select(F.col(child_key).alias("_k"))
        .join(
            parent.select(F.col(parent_key).alias("_k")).distinct(),
            "_k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return (
        orphans.crossJoin(total)  # two 1-row aggregates
        .select(
            F.lit(name).alias("rule"),
            "violations",
            "checked",
        )
    )


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-table rule results into one report, ordered by
    rule name for a stable artifact."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule")
