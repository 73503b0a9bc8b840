"""Declarative data-contract validation (the dbt-tests / Great
Expectations analog, engine-side).

A pipeline ingesting 100 TB/day needs its contracts checked WITHOUT
extra passes: every expectation here compiles to a conditional
aggregate, and the whole rule set runs as ONE aggregation over ONE scan
(plus one exact-distinct shuffle per uniqueness rule and one broadcast
anti-join per referential rule — those genuinely need a rendezvous).
The result is a per-rule violation count, the shape a run log or a
notify gate consumes directly (sinks/ops.py).

Rules (dicts, declarative):
- {"rule": "not_null", "col": c}
- {"rule": "unique", "cols": [c, ...]}
- {"rule": "accepted_values", "col": c, "values": [...]}  (NULL passes,
  as in dbt/GE — pair with not_null to demand presence)
- {"rule": "in_range", "col": c, "lo": x, "hi": y}   (inclusive; NULLs
  are not range violations — pair with not_null to demand presence)
- {"rule": "matches", "col": c, "pattern": regex}    (same caveat)
- {"rule": "references", "col": c, "ref": DataFrame, "ref_col": r}
  (NULL FKs are not violations, SQL semantics)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["validate"]


def _name(rule: dict) -> str:
    if rule["rule"] == "unique":
        return f"unique_{'_'.join(rule['cols'])}"
    if rule["rule"] == "references":
        return f"references_{rule['col']}"
    return f"{rule['rule']}_{rule['col']}"


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate every rule; returns ``(rule, violations)`` one row per
    rule, violations = 0 means the contract holds. Conditional-count
    rules share a single aggregation pass. Two rules of the same kind
    on the same column (e.g. a warn range and a hard range) get
    ``_2``, ``_3`` suffixes so verdicts never collide."""
    agg_exprs = []
    extra_rows: list[DataFrame] = []
    spark = df.sparkSession
    if not rules:
        return spark.createDataFrame([], "rule string, violations long")
    seen: dict[str, int] = {}
    for rule in rules:
        kind, name = rule["rule"], _name(rule)
        seen[name] = seen.get(name, 0) + 1
        if seen[name] > 1:
            name = f"{name}_{seen[name]}"
        if kind == "not_null":
            cond = F.col(rule["col"]).isNull()
        elif kind == "accepted_values":
            # NULL passes, matching in_range/matches (and dbt/GE): pair
            # with not_null to demand presence. None in the list would
            # poison the IN with three-valued logic (every violation
            # comparison goes NULL and counts as zero) — reject it.
            if any(v is None for v in rule["values"]):
                raise ValueError(
                    "accepted_values may not contain None (SQL IN NULL "
                    "semantics would silently void the rule); use not_null"
                )
            c = F.col(rule["col"])
            cond = c.isNotNull() & ~c.isin(*rule["values"])
        elif kind == "in_range":
            c = F.col(rule["col"])
            cond = c.isNotNull() & ((c < rule["lo"]) | (c > rule["hi"]))
        elif kind == "matches":
            c = F.col(rule["col"])
            cond = c.isNotNull() & ~c.rlike(rule["pattern"])
        elif kind == "unique":
            # rows beyond the first per key = violations
            dup = (
                df.groupBy(*rule["cols"])
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.coalesce(
                        F.sum(F.col("_n") - 1), F.lit(0)
                    ).cast("long").alias("violations")
                )
                .select(F.lit(name).alias("rule"), "violations")
            )
            extra_rows.append(dup)
            continue
        elif kind == "references":
            orphans = (
                df.select(F.col(rule["col"]).alias("_fk"))
                .filter(F.col("_fk").isNotNull())
                .join(
                    F.broadcast(
                        rule["ref"].select(
                            F.col(rule["ref_col"]).alias("_fk")
                        ).distinct()
                    ),
                    "_fk",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .select(F.lit(name).alias("rule"), "violations")
            )
            extra_rows.append(orphans)
            continue
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        agg_exprs.append(F.sum(cond.cast("long")).alias(name))

    parts: list[DataFrame] = []
    if agg_exprs:
        wide = df.agg(*agg_exprs)
        names = wide.columns
        stacked = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("rule"),
                            F.coalesce(F.col(n), F.lit(0)).cast("long").alias(
                                "violations"
                            ),
                        )
                        for n in names
                    ]
                )
            ).alias("kv")
        ).select("kv.rule", "kv.violations")
        parts.append(stacked)
    parts.extend(extra_rows)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mixture_drift_report(
    old: DataFrame,
    new: DataFrame,
    group_col: str,
    weight_col: str | None = None,
    tol_ppt: int = 50,
) -> DataFrame:
    """Training-MIXTURE drift between two corpus snapshots — the ops
    dial for "did today's ingest shift what the model trains on":
    per group (language, source, domain bucket) the old/new doc and
    weight totals, both sides' shares in exact ppm, and an integer
    cross-multiplied drift verdict. ``weight_col`` is the share unit
    (token counts for a training mixture); None weighs by doc count.

    Share algebra never divides: with old group weight ``a`` of total
    ``A`` and new ``b`` of ``B``, the share delta |b/B - a/A| exceeds
    ``tol_ppt`` thousandths iff ``|b*A - a*B| * 1000 > tol_ppt * A *
    B`` — cross products ride DECIMAL(38,0) so a 100 TB token total
    (~1e14) squared stays exact where BIGINT would overflow. Groups
    only one side has are reported (``is_new`` / ``is_gone``) and
    judged by the same rule (a vanished 6% slice IS drift).

    Plan: one rollup per snapshot (map-side partial, |groups| rows
    out), a full outer join of two bounded sides, totals via a
    single-row broadcast cross (the scalar-cross discipline). Nothing
    doc-sized moves; output is |groups| rows."""
    wexp = (
        F.lit(1).cast("long") if weight_col is None
        else F.col(weight_col).cast("long")
    )

    def roll(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy(F.col(group_col).alias("grp")).agg(
            F.count(F.lit(1)).cast("long").alias(f"{side}_docs"),
            F.sum(wexp).cast("long").alias(f"{side}_w"),
        )

    j = (
        roll(old, "old")
        .join(roll(new, "new"), "grp", "full_outer")
        .select(
            "grp",
            F.coalesce("old_docs", F.lit(0)).cast("long").alias("old_docs"),
            F.coalesce("old_w", F.lit(0)).cast("long").alias("old_w"),
            F.coalesce("new_docs", F.lit(0)).cast("long").alias("new_docs"),
            F.coalesce("new_w", F.lit(0)).cast("long").alias("new_w"),
            (F.col("old_docs").isNull()).cast("int").alias("is_new"),
            (F.col("new_docs").isNull()).cast("int").alias("is_gone"),
        )
    )
    totals = j.agg(
        F.sum("old_w").cast("long").alias("tot_old"),
        F.sum("new_w").cast("long").alias("tot_new"),
    )
    t = int(tol_ppt)
    # exact ppm shares via integral DIV; drift via DECIMAL(38,0) cross
    # products — |b*A - a*B|*1000 vs tol*A*B, never a float division
    return j.crossJoin(F.broadcast(totals)).selectExpr(
        "grp",
        "old_docs",
        "new_docs",
        "old_w",
        "new_w",
        "CAST(CASE WHEN tot_old > 0 THEN "
        "(1000000 * CAST(old_w AS DECIMAL(38,0))) div tot_old "
        "ELSE 0 END AS BIGINT) AS old_share_x1e6",
        "CAST(CASE WHEN tot_new > 0 THEN "
        "(1000000 * CAST(new_w AS DECIMAL(38,0))) div tot_new "
        "ELSE 0 END AS BIGINT) AS new_share_x1e6",
        "is_new",
        "is_gone",
        "CAST(abs(CAST(new_w AS DECIMAL(38,0)) * tot_old"
        "        - CAST(old_w AS DECIMAL(38,0)) * tot_new) * 1000"
        f"     > CAST({t} AS DECIMAL(38,0)) * tot_old * tot_new "
        "AS INT) AS drifted",
    )
