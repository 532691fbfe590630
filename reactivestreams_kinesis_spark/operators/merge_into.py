"""MERGE INTO with the full conditional clause surface — the Delta /
Iceberg / ANSI SQL:2003 MERGE statement over the snapshot substrate:

    WHEN MATCHED [AND <cond>] THEN DELETE
    WHEN MATCHED [AND <cond>] THEN UPDATE SET col = <expr>, ...
    WHEN NOT MATCHED [AND <cond>] THEN INSERT (expr rows)

`snapshot_commit`-era `merge_upsert` is the last-writer-wins fast path
(whole-row replace, optional delete flag); this operator adds what real
CDC/SCD pipelines need: per-column update EXPRESSIONS over both sides
(``t.<col>`` target, ``s.<col>`` source), clause CONDITIONS, and
insert projections — while keeping the same file-granular copy-on-write
mechanics: stats/bloom-pruned candidate targeting, only files owning a
matched key rewrite, untouched files republish verbatim.

Clause order is fixed and documented (Delta evaluates clauses in
statement order; this API has one slot per clause so the order is the
contract): a matched row checks DELETE first, then UPDATE, else keeps
its current values. A source row with a NULL key matches nothing (SQL
equality) and flows to the NOT MATCHED clause.

Duplicate non-null keys in the source are refused — the
Delta/Iceberg "multiple rows matched" error — because which duplicate
wins is the caller's ordering decision, made before the merge.

At 100 TB the cost model is merge_upsert's: candidate files via
min/max + bloom prune, one semi-join names the touched files, rewrite
cost ∝ touched data, commit is optimistic (require_parent) so a
concurrent writer conflicts loudly instead of losing updates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.snapshots import (
    _commit_rewrite,
    _merge_schema,
    _read_data_files,
    _read_manifest,
    find_txn,
    latest_version,
    prune_files,
)


def _as_expr(e) -> Column:
    return e if isinstance(e, Column) else F.expr(e)


def _cond(e, default: bool) -> Column:
    if e is None:
        return F.lit(default)
    # SQL clause semantics: UNKNOWN (NULL) does not fire the clause
    return F.coalesce(_as_expr(e), F.lit(False))


def merge_into(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    on: str,
    *,
    when_matched_update: dict | None = None,
    matched_update_condition=None,
    when_matched_delete: bool = False,
    matched_delete_condition=None,
    when_not_matched_insert=True,
    not_matched_condition=None,
    txn_id: str | None = None,
) -> int:
    """Run the MERGE and return the committed version.

    - ``on``: the equality key — one column name shared by both sides,
      or a ``(target_key, source_key)`` pair when the names differ.
    - ``when_matched_update``: ``{target_col: expr}`` where expr is a
      Column or SQL string over ``t.*`` / ``s.*``; unlisted columns
      keep their target values.
    - ``when_matched_delete``: enable the DELETE clause (checked BEFORE
      update), optionally gated by ``matched_delete_condition``.
    - ``when_not_matched_insert``: True inserts the source row's
      same-named columns (missing table columns NULL); a dict gives
      per-column insert expressions over ``s.*``; None/False disables
      inserts.
    - conditions are SQL strings/Columns over ``t.*``/``s.*`` (insert
      condition sees ``s.*`` only); NULL evaluates as not-fired.
    """
    if not (when_matched_update or when_matched_delete or when_not_matched_insert):
        raise ValueError("merge_into needs at least one WHEN clause")
    t_key, s_key = (on, on) if isinstance(on, str) else on
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)

    keyed = source.filter(F.col(s_key).isNotNull())
    bounds = keyed.agg(
        F.min(s_key).alias("lo"),
        F.max(s_key).alias("hi"),
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct(s_key).alias("n"),
    ).collect()[0]
    if bounds["rows"] > bounds["n"]:
        raise ValueError(
            f"merge_into: source carries {bounds['rows'] - bounds['n']} "
            f"extra row(s) for duplicated {s_key!r} values — the SQL MERGE "
            "multiple-match error; compact to one row per key first"
        )

    # candidate targeting: min/max range prune (clustered layouts) —
    # files outside the source keys' range cannot own a match
    candidates = manifest["files"]
    if bounds["lo"] is not None:
        candidates = prune_files(
            manifest, [(t_key, ">=", bounds["lo"]), (t_key, "<=", bounds["hi"])]
        )
    touched: set = set()
    if candidates and bounds["rows"]:
        cand_df = _read_data_files(
            spark, table_dir, manifest, candidates, keep_file_col="__file"
        )
        skeys = keyed.select(F.col(s_key).alias("__mkey")).distinct()
        touched = {
            r["__file"]
            for r in cand_df.join(
                skeys, cand_df[t_key] == skeys["__mkey"], "semi"
            )
            .select("__file")
            .distinct()
            .collect()
        }
    untouched = [f for f in manifest["files"] if f not in touched]
    table_cols = [
        f["name"] for f in (manifest.get("schema") or {}).get("fields", [])
    ] or _read_data_files(spark, table_dir, manifest, manifest["files"][:1]).columns
    # NULL padding for table columns absent from the source must carry
    # the DECLARED type: an untyped lit(None) is VoidType, which survives
    # to the parquet writer when NO file is touched (insert-only merge,
    # nothing to unionByName-coerce against) and fails the write there
    if manifest.get("schema") is not None:
        from pyspark.sql.types import StructType

        _declared = {
            f.name: f.dataType
            for f in StructType.fromJson(manifest["schema"]).fields
        }
    else:
        _declared = {}

    def _null_for(c: str) -> Column:
        lit = F.lit(None)
        return lit.cast(_declared[c]) if c in _declared else lit

    parts: list[DataFrame] = []
    if touched:
        touched_list = [f for f in manifest["files"] if f in touched]
        t = _read_data_files(spark, table_dir, manifest, touched_list).alias("t")
        s = keyed.alias("s")
        j = t.join(s, F.col(f"t.{t_key}") == F.col(f"s.{s_key}"), "left")
        matched = F.col(f"s.{s_key}").isNotNull()
        delete_fires = (
            matched & _cond(matched_delete_condition, True)
            if when_matched_delete
            else F.lit(False)
        )
        update_fires = (
            matched & ~delete_fires & _cond(matched_update_condition, True)
            if when_matched_update
            else F.lit(False)
        )
        upd = {k: _as_expr(v) for k, v in (when_matched_update or {}).items()}
        unknown = sorted(set(upd) - set(table_cols))
        if unknown:
            raise ValueError(f"when_matched_update names unknown columns: {unknown}")
        rows = j.filter(~delete_fires).select(
            *[
                (
                    F.when(update_fires, upd[c]).otherwise(F.col(f"t.{c}"))
                    if c in upd
                    else F.col(f"t.{c}")
                ).alias(c)
                for c in table_cols
            ]
        )
        parts.append(rows)

    if when_not_matched_insert:
        # not-matched = source keys absent from the touched files' keys
        # (a matched key's file is by definition touched) + NULL-key rows
        existing = (
            _read_data_files(
                spark, table_dir, manifest,
                [f for f in manifest["files"] if f in touched],
            ).select(F.col(t_key).alias("__ekey"))
            if touched
            else None
        )
        nm = source.alias("s")
        if existing is not None:
            nm = nm.join(existing, nm[s_key] == existing["__ekey"], "anti")
        nm = nm.filter(_cond(not_matched_condition, True))
        if isinstance(when_not_matched_insert, dict):
            ins_exprs = {
                k: _as_expr(v) for k, v in when_not_matched_insert.items()
            }
            unknown = sorted(set(ins_exprs) - set(table_cols))
            if unknown:
                raise ValueError(
                    f"when_not_matched_insert names unknown columns: {unknown}"
                )
            inserts = nm.select(
                *[
                    (ins_exprs[c] if c in ins_exprs else _null_for(c)).alias(c)
                    for c in table_cols
                ]
            )
        else:
            inserts = nm.select(
                *[
                    (F.col(c) if c in nm.columns else _null_for(c)).alias(c)
                    for c in table_cols
                ]
            )
        parts.append(inserts)

    if not parts:
        return tip  # delete-only merge that matched nothing
    rewrite = parts[0]
    for p in parts[1:]:
        rewrite = rewrite.unionByName(p, allowMissingColumns=True)
    return _commit_rewrite(
        table_dir,
        rewrite,
        untouched=untouched,
        schema=_merge_schema(manifest.get("schema"), rewrite.schema.jsonValue()),
        txn_id=txn_id,
        require_parent=tip,
        parent_manifest=manifest,
        change={"kind": "rewrite", "key": t_key},
    )
