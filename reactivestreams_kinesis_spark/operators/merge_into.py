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
      a ``(target_key, source_key)`` pair when the names differ, or a
      LIST of names/pairs for a composite key (the SQL
      ``ON t.a = s.a AND t.b = s.b`` conjunction): matching, duplicate
      detection, file targeting, and the insert anti-join all range
      over the column tuple.
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
    # normalize `on` to parallel (target, source) column lists
    if isinstance(on, str):
        pairs = [(on, on)]
    elif on and isinstance(on[0], str) and len(on) == 2 and not isinstance(on, list):
        pairs = [tuple(on)]  # a bare (t_key, s_key) tuple
    else:
        pairs = [(p, p) if isinstance(p, str) else tuple(p) for p in on]
    if not pairs:
        raise ValueError("merge_into needs at least one key column")
    t_keys = [p[0] for p in pairs]
    s_keys = [p[1] for p in pairs]
    t_key, s_key = t_keys[0], s_keys[0]  # single-key fast-path names
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)

    keyed = source
    for k in s_keys:
        keyed = keyed.filter(F.col(k).isNotNull())
    stat_exprs = [
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct(*s_keys).alias("n"),
    ]
    for i, k in enumerate(s_keys):
        stat_exprs.append(F.min(k).alias(f"lo{i}"))
        stat_exprs.append(F.max(k).alias(f"hi{i}"))
    bounds = keyed.agg(*stat_exprs).collect()[0]
    if bounds["rows"] > bounds["n"]:
        raise ValueError(
            f"merge_into: source carries {bounds['rows'] - bounds['n']} "
            f"extra row(s) for duplicated {s_keys!r} values — the SQL MERGE "
            "multiple-match error; compact to one row per key first"
        )

    # candidate targeting: min/max range prune (clustered layouts) —
    # files outside any key column's range cannot own a match
    candidates = manifest["files"]
    range_preds = [
        p
        for i, tk in enumerate(t_keys)
        if bounds[f"lo{i}"] is not None
        for p in ((tk, ">=", bounds[f"lo{i}"]), (tk, "<=", bounds[f"hi{i}"]))
    ]
    if range_preds:
        candidates = prune_files(manifest, range_preds)
    touched: set = set()
    if candidates and bounds["rows"]:
        cand_df = _read_data_files(
            spark, table_dir, manifest, candidates, keep_file_col="__file"
        )
        skeys = keyed.select(
            *[F.col(sk).alias(f"__mkey{i}") for i, sk in enumerate(s_keys)]
        ).distinct()
        mcond = None
        for i, tk in enumerate(t_keys):
            c = cand_df[tk] == skeys[f"__mkey{i}"]
            mcond = c if mcond is None else (mcond & c)
        touched = {
            r["__file"]
            for r in cand_df.join(skeys, mcond, "semi")
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
        jcond = None
        for tk, sk in pairs:
            c = F.col(f"t.{tk}") == F.col(f"s.{sk}")
            jcond = c if jcond is None else (jcond & c)
        j = t.join(s, jcond, "left")
        # keyed rows carry no NULL key columns, so a non-null joined key
        # column means the join found a match (any key column works)
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
        # not-matched = source key tuples absent from the touched files'
        # keys (a matched tuple's file is by definition touched) +
        # NULL-key rows (a NULL key matches nothing, SQL equality)
        existing = (
            _read_data_files(
                spark, table_dir, manifest,
                [f for f in manifest["files"] if f in touched],
            ).select(
                *[F.col(tk).alias(f"__ekey{i}") for i, tk in enumerate(t_keys)]
            )
            if touched
            else None
        )
        nm = source.alias("s")
        if existing is not None:
            acond = None
            for i, sk in enumerate(s_keys):
                c = nm[sk] == existing[f"__ekey{i}"]
                acond = c if acond is None else (acond & c)
            nm = nm.join(existing, acond, "anti")
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
        change={"kind": "rewrite", "key": t_key if len(t_keys) == 1 else t_keys},
    )
