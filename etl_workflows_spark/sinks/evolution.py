"""Schema evolution for managed tables: converge a live table to a new
declared schema without losing data or rewriting more than necessary.

Corpora and fact tables outlive their first schema; the operations that
come up are ranked by cost and handled accordingly:

* **Added columns** — metadata-only ``ALTER TABLE ADD COLUMNS``: zero
  data movement; historical files simply read NULL for the new field
  (parquet's missing-column semantics). At 100 TB this is the only
  acceptable default path.
* **Safe type widenings** (int→long, float→double, int/long→double,
  decimal precision growth) — require a one-time staged rewrite with a
  cast (parquet physical types differ), scoped to the whole table; the
  rewrite preserves nothing-else semantics and is explicit opt-in via
  ``allow_rewrite=True`` so a 100 TB rewrite can never be triggered by
  accident.
* **Anything else** (narrowing, renames, type changes across families,
  dropped columns) — fail fast with the exact offending field; silent
  coercion is how replicas drift.

The declared schema is authoritative in the same sense as ingestion's
(SURVEY.md §1.3): evolution is driven by an explicit target, never
inferred from arriving data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL

# keys are DataType.simpleString() names (SQL spelling: int/bigint/…)
_WIDENINGS: dict[tuple[str, str], bool] = {
    ("int", "bigint"): True,
    ("int", "double"): True,
    ("bigint", "double"): True,
    ("float", "double"): True,
    ("smallint", "int"): True,
    ("smallint", "bigint"): True,
    ("tinyint", "smallint"): True,
    ("tinyint", "int"): True,
    ("tinyint", "bigint"): True,
}


def plan_evolution(
    current: T.StructType, target: T.StructType
) -> dict[str, list]:
    """Diff two schemas into {'add': [StructField], 'widen':
    [(name, from, to)]}; raises ValueError on any unsupported change."""
    cur = {f.name: f for f in current.fields}
    tgt = {f.name: f for f in target.fields}
    dropped = [n for n in cur if n not in tgt]
    if dropped:
        raise ValueError(
            f"unsupported evolution: target drops column(s) {dropped} — "
            "dropping data must be an explicit delete, not an evolution"
        )
    add, widen = [], []
    for name, f in tgt.items():
        if name not in cur:
            add.append(f)
            continue
        a, b = cur[name].dataType, f.dataType
        if a == b:
            continue
        key = (a.simpleString(), b.simpleString())
        if _WIDENINGS.get(key):
            widen.append((name, a.simpleString(), b.simpleString()))
        else:
            raise ValueError(
                f"unsupported evolution for column {name!r}: "
                f"{a.simpleString()} -> {b.simpleString()} (only lossless "
                f"widenings are supported: {sorted(_WIDENINGS)})"
            )
    return {"add": add, "widen": widen}


def evolve_table(
    spark: SparkSession,
    table: str,
    target: T.StructType,
    allow_rewrite: bool = False,
) -> dict[str, list[str]]:
    """Converge ``table`` to ``target``. Returns
    {'added': [...], 'widened': [...]}. Widenings require
    ``allow_rewrite=True`` (full-table rewrite) or raise."""
    current = spark.table(table).schema
    plan = plan_evolution(current, target)
    out = {"added": [], "widened": []}

    if plan["add"]:
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in plan["add"]
        )
        spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({cols})")
        out["added"] = [f.name for f in plan["add"]]

    if plan["widen"]:
        if not allow_rewrite:
            raise ValueError(
                f"type widenings {plan['widen']} need a full-table rewrite; "
                "pass allow_rewrite=True to authorize it"
            )
        # staged rewrite + catalog swap (same mechanics as delete_from's
        # unpartitioned path); casts are lossless by _WIDENINGS
        df = spark.table(table)
        casts = {n: to for n, _frm, to in plan["widen"]}
        cols = [
            F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
            for c in df.columns
        ]
        rewritten = df.select(*cols).localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
        rewritten.write.mode("overwrite").saveAsTable(f"{table}__evolve_staging")
        spark.sql(f"DROP TABLE {table}")
        spark.sql(f"ALTER TABLE {table}__evolve_staging RENAME TO {table}")
        out["widened"] = [n for n, _f, _t in plan["widen"]]
    return out
