"""SQL statement front-end for the snapshot warehouse — the thin
dispatcher that lets the Delta/Iceberg-shaped surface be driven by the
SQL texts users actually type (``spark.sql("MERGE INTO ...")`` is most
users' first contact with a lakehouse), without building a planner:
every statement parses onto an EXISTING operator whose semantics are
already oracle-proven per query.

Supported dialect (the shared Delta/Iceberg statement shapes):

- ``SELECT ...`` — any Spark SQL over the registered tables; a table
  reference may carry time travel: ``t VERSION AS OF <n>`` or
  ``t TIMESTAMP AS OF '<iso>'`` (resolved via ``read_snapshot`` /
  ``version_at_timestamp``, then handed to Spark's own planner).
- ``MERGE INTO t [AS a] USING s [AS b] ON a.k = b.k [AND a.k2 = b.k2
  ...]`` (composite keys merge on the column tuple) with any of
  ``WHEN MATCHED [AND c] THEN DELETE``,
  ``WHEN MATCHED [AND c] THEN UPDATE SET col = expr, ...``,
  ``WHEN NOT MATCHED [AND c] THEN INSERT *`` or
  ``INSERT (cols) VALUES (exprs)`` → ``operators/merge_into.py``.
- ``DELETE FROM t WHERE <conjunction>`` → ``delete_where`` (the WHERE
  must be an AND-conjunction of ``col op literal`` / ``col IN (...)``
  comparisons — the operator's pruning-predicate vocabulary; anything
  richer is refused loudly rather than silently scanned).
- ``UPDATE t SET col = expr, ... [WHERE <conjunction>]`` →
  ``update_where`` (SET expressions are full Spark SQL over the row).
- ``INSERT INTO t VALUES (...), (...)`` and ``INSERT INTO t SELECT
  ...`` (the SELECT runs through the same time-travel-aware resolver)
  → an append ``snapshot_commit``; column count/names must line up
  with the table's declared schema. ``INSERT OVERWRITE t ...``
  replaces the whole table (one overwrite commit);
  ``INSERT INTO t REPLACE WHERE <conjunction> SELECT ...`` replaces
  exactly the predicate's rows (delete + append — two commits; a
  retry after a crash between them completes the replacement) and
  REFUSES batches whose rows fall outside the predicate — Delta's
  replaceWhere constraint check.
- ``SELECT ... FROM table_changes('t', v1[, v2])`` → the change data
  feed (``snapshot_change_feed``) as a table-valued read, rows
  stamped ``_change_type`` / ``_commit_version``.
- ``ALTER TABLE t RENAME COLUMN a TO b`` → ``rename_column``.
- ``ALTER TABLE t ADD COLUMN c <type>`` → ``add_column``.
- ``ALTER TABLE t ALTER COLUMN c TYPE <type>`` → ``alter_column_type``
  (metadata-only widening along byte→short→int→long, float→double,
  decimal least-upper-bound; narrowing refuses).
- ``ALTER TABLE t DROP COLUMN c`` → ``drop_column``.
- ``ALTER TABLE t ADD CONSTRAINT name CHECK (expr)`` /
  ``DROP CONSTRAINT name`` → ``add_constraint`` / ``drop_constraint``
  (Delta's CHECK-constraint DDL; enforced on every subsequent commit).
- ``ALTER TABLE t CREATE TAG name [AS OF VERSION n]`` / ``DROP TAG
  name`` → ``tag_snapshot`` / ``delete_tag`` (Iceberg's named refs);
  a SELECT may read ``t VERSION AS OF '<tag>'`` (quoted = tag name).
- ``ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS a, b`` →
  ``set_ndv_columns`` (per-file HLL NDV stats into the manifests);
  ``CREATE BLOOMFILTER INDEX ON TABLE t FOR COLUMNS (a, b)`` →
  ``set_bloom_columns`` (Delta's bloom-index DDL — point-lookup file
  skipping). Both metadata/stats-only, no table rewrite.
- ``TRUNCATE TABLE t`` → one overwrite commit of zero rows under the
  declared schema (history and time travel to it survive — Delta's
  TRUNCATE semantics; RESTORE undoes it).
- ``RESTORE TABLE t TO VERSION AS OF n`` → ``restore_snapshot``.
- ``DESCRIBE HISTORY t`` → ``describe_history``; ``DESCRIBE DETAIL t``
  → the metadata-only summary (version, file count, exact row count
  when manifest stats allow, partition spec); ``SHOW TABLES`` lists
  the registered tables and materialized views.
- ``OPTIMIZE t`` → ``compact_snapshot`` (``ZORDER BY (cols)`` maps to
  its z-order clustering).
- ``VACUUM t RETAIN <n> HOURS [DRY RUN]`` → ``vacuum_by_retention``
  (DRY RUN returns the would-delete list without removing anything).
- ``CREATE TABLE name [PARTITIONED BY (col | day(col) |
  bucket(n, col), ...)] [CLUSTERED BY (k) INTO n BUCKETS] AS SELECT
  ...`` (needs a warehouse ``root``) → an initial ``snapshot_commit``
  under ``root/name`` carrying the declared partition/bucket spec —
  the layout levers (hidden-partition pruning, the co-located join)
  are SQL-reachable; the new name is registered and immediately
  usable by every other statement.
- A ``SELECT`` joining two warehouse tables bucket-partitioned
  compatibly on the join keys routes onto the ZERO-EXCHANGE
  co-located bucket join (``sources/colocated.py``) automatically;
  ineligible joins fall through to Spark's generic plan (this path
  upgrades, never refuses).
- A ``SELECT <keys and aggregates> FROM t ... GROUP BY <keys>`` whose
  group keys include the table's bucket column routes onto the
  ZERO-EXCHANGE bucket-local aggregation
  (``sources/colocated.py:colocated_groupby``) — the aggregation
  happens inside the scan, no partial/final HashAggregate exchange;
  requires a fully-pushable WHERE conjunction (the source applies it
  in-scan) and plain-column count/sum/min/max/avg items; everything
  else falls through to the generic plan (upgrade, never refuse).
- ``CREATE TABLE name SHALLOW CLONE source [VERSION AS OF n]`` →
  ``clone_snapshot`` (one metadata write, zero data copied; the clone
  evolves independently).
- ``CREATE MATERIALIZED VIEW name AS SELECT <keys and aggregates>
  FROM <table> [WHERE <expr>] GROUP BY <keys>`` →
  ``create_materialized_view`` (aggregate vocabulary: COUNT(*) /
  COUNT / SUM / MIN / MAX / AVG / APPROX_COUNT_DISTINCT /
  HIST_QUANTILE(col, q, lo, hi[, bins]) — the incremental-percentile
  histogram sketch — each aliased; the WHERE is the view's standing
  row filter). A two-table FROM —
  ``FROM fact f JOIN dim d ON f.k = d.k`` — maps onto
  ``create_materialized_view_over_join`` (the star-schema view: fact
  feed maintains, dim pinned at its current version). ``REFRESH
  MATERIALIZED VIEW name [STRATEGY MERGE|OVERWRITE] [ON DIM CHANGE
  INCREMENTAL|REBUILD|REFUSE]`` folds the source's change feed —
  ``ON DIM CHANGE INCREMENTAL`` additionally folds the dimension's
  own change feed through the two-term delta algebra
  (``matview.py:_dim_delta_partials``); SELECTs over the view's name
  read ``read_materialized_view`` (aggregate semantics, not raw
  state).

Unsupported syntax refuses with a pointed error (never a silent
misread): multi-table FROM in DELETE, OR-predicates in DELETE WHERE,
subqueries as MERGE sources, multiple UPDATE clauses, etc.

Scale note: the front-end adds NOTHING to the execution path — each
statement becomes exactly the operator call a Python caller would have
made, so the 100 TB cost model (stats-pruned rewrites, metadata-only
DDL, manifest-bounded time travel) is the operators', unchanged.

Reference lineage: the reference engine exposes no SQL (it is a Kinesis
record publisher, ShardPublisher.java:16-77); this surface exists for
parity with the lakehouse engines whose storage semantics the snapshot
substrate re-implements.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from reactivestreams_kinesis_spark.operators.snapshots import (
    add_column,
    delete_where,
    describe_history,
    drop_column,
    latest_version,
    read_snapshot,
    rename_column,
    restore_snapshot,
    update_where,
    version_at_timestamp,
)

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


class SnapshotWarehouse:
    """Bind table names to snapshot dirs and dispatch SQL statements.

    ``sql(text)`` returns a DataFrame for reads (SELECT / DESCRIBE
    HISTORY) and the committed snapshot version (int) for DML/DDL —
    the same value the underlying operator returns, so txn replay
    semantics surface unchanged."""

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, str],
        *,
        root: str | None = None,
    ):
        self._spark = spark
        self._tables = dict(tables)
        self._views: dict[str, str] = {}  # materialized views by name
        self._root = root

    def _dir(self, name: str) -> str:
        if name not in self._tables:
            raise ValueError(
                f"unknown warehouse table {name!r} "
                f"(registered: {sorted(self._tables)})"
            )
        return self._tables[name]

    def _new_dir(self, name: str, kind: str) -> str:
        import os

        if self._root is None:
            raise ValueError(
                f"CREATE {kind} needs a warehouse root — construct "
                "SnapshotWarehouse(..., root=<dir>) to allow creating "
                "new objects"
            )
        if name in self._tables or name in self._views:
            raise ValueError(f"{name!r} already exists in this warehouse")
        return os.path.join(self._root, name)

    # -- dispatch ------------------------------------------------------------

    def sql(self, text: str):
        stmt = text.strip().rstrip(";").strip()
        head = stmt.split(None, 1)[0].upper() if stmt else ""
        if head == "SELECT" or stmt.upper().startswith("WITH"):
            return self._select(stmt)
        if head == "MERGE":
            return self._merge(stmt)
        if head == "DELETE":
            return self._delete(stmt)
        if head == "UPDATE":
            return self._update(stmt)
        if head == "INSERT":
            return self._insert(stmt)
        if head == "CREATE":
            return self._create(stmt)
        if head == "REFRESH":
            return self._refresh_mv(stmt)
        if head == "ALTER":
            return self._alter(stmt)
        if head == "RESTORE":
            return self._restore(stmt)
        if head == "OPTIMIZE":
            return self._optimize(stmt)
        if head == "VACUUM":
            return self._vacuum(stmt)
        if head == "ANALYZE":
            return self._analyze(stmt)
        if head == "TRUNCATE":
            m = re.fullmatch(rf"TRUNCATE\s+TABLE\s+({_IDENT})", stmt, re.I)
            if not m:
                raise ValueError("only TRUNCATE TABLE <table> is supported")
            from reactivestreams_kinesis_spark.operators.snapshots import (
                snapshot_commit,
            )

            d = self._dir(m.group(1))
            # one overwrite commit of zero rows under the declared
            # schema: history (and time travel to it) survives, exactly
            # Delta's TRUNCATE
            empty = read_snapshot(self._spark, d).limit(0)
            return snapshot_commit(empty, d, mode="overwrite")
        if head == "DESCRIBE":
            m = re.fullmatch(
                rf"DESCRIBE\s+HISTORY\s+({_IDENT})", stmt, re.I | re.S
            )
            if m:
                return describe_history(self._spark, self._dir(m.group(1)))
            m = re.fullmatch(
                rf"DESCRIBE\s+DETAIL\s+({_IDENT})", stmt, re.I | re.S
            )
            if m:
                return self._describe_detail(m.group(1))
            raise ValueError(
                "only DESCRIBE HISTORY <table> and DESCRIBE DETAIL <table> "
                "are supported"
            )
        if head == "SHOW":
            if re.fullmatch(r"SHOW\s+TABLES", stmt, re.I):
                rows = [(n, "table") for n in sorted(self._tables)] + [
                    (n, "materialized_view") for n in sorted(self._views)
                ]
                return self._spark.createDataFrame(
                    rows, "name string, kind string"
                )
            raise ValueError("only SHOW TABLES is supported")
        raise ValueError(
            f"unsupported statement {head or '<empty>'!r} — supported: "
            "SELECT/WITH, MERGE INTO, INSERT INTO, DELETE FROM, UPDATE, "
            "ALTER TABLE, RESTORE TABLE, DESCRIBE HISTORY/DETAIL, SHOW "
            "TABLES, OPTIMIZE, VACUUM, ANALYZE TABLE, TRUNCATE TABLE, "
            "CREATE TABLE AS, CREATE BLOOMFILTER INDEX, CREATE/REFRESH "
            "MATERIALIZED VIEW"
        )

    def _describe_detail(self, name: str) -> DataFrame:
        """DESCRIBE DETAIL: the metadata-only table summary — version,
        file count, exact row count when the manifest stats allow it
        (``table_stats_summary``'s honesty contract: None when any file
        predates stats or equality deletes pend), and the declared
        partition spec. Zero data I/O."""
        from reactivestreams_kinesis_spark.operators.snapshots import (
            _read_manifest,
            _transform_name,
            table_stats_summary,
        )

        d = self._dir(name)
        tip = latest_version(d)
        man = _read_manifest(d, tip)
        stats = table_stats_summary(d)
        spec = ", ".join(
            _transform_name(e) for e in (man.get("partition_spec") or [])
        )
        return self._spark.createDataFrame(
            [
                (
                    name,
                    int(tip),
                    len(man["files"]),
                    stats["rows"],
                    spec or None,
                )
            ],
            "name string, version long, num_files long, num_rows long, "
            "partition_spec string",
        )

    # -- SELECT with time travel --------------------------------------------

    def _select(self, stmt: str) -> DataFrame:
        names = "|".join(re.escape(n) for n in sorted(self._tables, key=len, reverse=True))
        if not names:
            return self._spark.sql(stmt)
        out = stmt
        # table_changes('t', v1[, v2]) → the change feed as a pinned
        # temp view (Delta's CDF table-valued function shape); the feed
        # carries _change_type/_commit_version alongside the row
        def _cfsub(m, text):
            name = text[m.start(1) : m.end(1)]
            v1 = int(m.group(2))
            v2 = None if m.group(3) is None else int(m.group(3))
            from pyspark.sql import functions as F

            from reactivestreams_kinesis_spark.operators.snapshots import (
                QuietRangeError,
                snapshot_change_feed,
            )

            view = f"__wh_cf_{name}_{v1}_{v2 if v2 is not None else 'tip'}"
            try:
                feed = snapshot_change_feed(
                    self._spark,
                    self._dir(name),
                    from_version=v1,
                    to_version=v2,
                )
            except QuietRangeError:
                # a quiet range (metadata-only / reorg commits) is ZERO
                # row changes — a table-valued READ surfaces the empty
                # feed under the table's schema, it doesn't error (the
                # refresh path treats quiet ranges differently: it must
                # still advance its watermark)
                feed = (
                    read_snapshot(self._spark, self._dir(name), v2)
                    .limit(0)
                    .withColumn("_change_type", F.lit(None).cast("string"))
                    .withColumn("_commit_version", F.lit(None).cast("long"))
                )
            feed.createOrReplaceTempView(view)
            return f" {view} "

        out = _sub_blind(
            r"table_changes\s*\(\s*'(\x00+)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)",
            _cfsub,
            out,
            flags=re.I,
        )

        # co-located fast path FIRST (it understands VERSION AS OF
        # natively — the source takes per-side versions): a two-table
        # equi-join whose sides are bucket-partitioned compatibly on
        # the join keys plans through the zero-exchange source;
        # anything else falls through to the substitutions below
        routed = self._try_colocated_select(out)
        if routed is not None:
            return routed
        routed = self._try_bucketed_agg_select(out)
        if routed is not None:
            return routed

        # VERSION AS OF n → a pinned temp view per (table, version);
        # matched over the quote-blinded text so a literal containing
        # the phrase is never rewritten (the module's refusal contract)
        def _vsub(m, text):
            name, ver = m.group(1), int(m.group(2))
            view = f"__wh_{name}_v{ver}"
            read_snapshot(self._spark, self._dir(name), ver).createOrReplaceTempView(view)
            return f" {view} "

        out = _sub_blind(
            rf"\b({names})\s+VERSION\s+AS\s+OF\s+(\d+)", _vsub, out, flags=re.I
        )

        # VERSION AS OF '<tag>' (quoted = a named tag, Iceberg's ref
        # read) → resolve through the tag registry, then pin like any
        # numeric version; the tag NAME is a literal — sliced from the
        # original text, matched over the blinded text
        def _tagsub(m, text):
            from reactivestreams_kinesis_spark.operators.snapshots import (
                resolve_tag,
            )

            name, tag = m.group(1), text[m.start(2) : m.end(2)]
            ver = resolve_tag(self._dir(name), tag)
            view = f"__wh_{name}_v{ver}"
            read_snapshot(self._spark, self._dir(name), ver).createOrReplaceTempView(view)
            return f" {view} "

        out = _sub_blind(
            rf"\b({names})\s+VERSION\s+AS\s+OF\s+'(\x00+)'",
            _tagsub,
            out,
            flags=re.I,
        )

        # TIMESTAMP AS OF '<iso>' → resolve to a version first (the
        # timestamp's CONTENT is a literal — sliced from the original)
        def _tsub(m, text):
            import datetime as _dt

            name, ts = m.group(1), text[m.start(2) : m.end(2)]
            when = _dt.datetime.fromisoformat(ts)
            if when.tzinfo is None:
                when = when.replace(tzinfo=_dt.timezone.utc)
            ver = version_at_timestamp(self._dir(name), when.timestamp())
            view = f"__wh_{name}_v{ver}"
            read_snapshot(self._spark, self._dir(name), ver).createOrReplaceTempView(view)
            return f" {view} "

        out = _sub_blind(
            rf"\b({names})\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'",
            _tsub,
            out,
            flags=re.I,
        )
        # bare table names resolve at the current tip; materialized view
        # names read through read_materialized_view (aggregate
        # semantics, never the raw __mv_* state). Detection is
        # quote-blind: a literal mentioning a table is data.
        blind = _quote_blind(out)
        for name in self._tables:
            if re.search(rf"\b{re.escape(name)}\b", blind):
                read_snapshot(self._spark, self._dir(name)).createOrReplaceTempView(name)
        for name, vdir in self._views.items():
            if re.search(rf"\b{re.escape(name)}\b", blind):
                from reactivestreams_kinesis_spark.operators.matview import (
                    read_materialized_view,
                )

                read_materialized_view(self._spark, vdir).createOrReplaceTempView(name)
        return self._spark.sql(out)

    def _try_colocated_select(self, stmt: str) -> DataFrame | None:
        """Route ``SELECT ... FROM a [x] JOIN b [y] ON x.k = y.j ...``
        onto the zero-exchange co-located bucket join when BOTH sides
        are registered warehouse tables bucket-partitioned on their
        join keys with commensurable counts. Returns None (→ generic
        Spark plan) for every other shape or on ANY eligibility
        failure — this path refuses nothing, it only upgrades.

        Scale note: this is the planner hook that makes the layout
        levers pay off from SQL — the generic plan shuffles both sides
        on the key; the routed plan reads N bucket pairs with zero
        exchanges (sources/colocated.py)."""
        m = re.fullmatch(
            rf"SELECT\s+(.*?)\s+FROM\s+({_IDENT})"
            rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?(?:\s+AS)?(?:\s+({_IDENT}))?"
            rf"\s+JOIN\s+({_IDENT})"
            rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?(?:\s+AS)?(?:\s+({_IDENT}))?"
            rf"\s+ON\s+({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})"
            rf"(?:\s+((?:WHERE|GROUP|ORDER|HAVING|LIMIT)\b.*))?",
            _quote_blind(stmt),
            re.I | re.S,
        )
        if not m:
            return None
        (
            items, lname, lver, lal, rname, rver, ral, q1, c1, q2, c2,
        ) = m.groups()[:11]
        tail_span = m.span(12)
        tail = stmt[tail_span[0] : tail_span[1]] if m.group(12) else ""
        items = stmt[m.start(1) : m.end(1)]
        if lal and lal.upper() == "JOIN":
            return None
        if lname not in self._tables or rname not in self._tables:
            return None
        lal, ral = lal or lname, ral or rname
        if q1 == lal and q2 == ral:
            lk, rk = c1, c2
        elif q1 == ral and q2 == lal:
            lk, rk = c2, c1
        else:
            return None
        from reactivestreams_kinesis_spark.operators.snapshots import (
            _read_manifest,
        )

        try:
            from reactivestreams_kinesis_spark.sources.colocated import (
                _spec_bucket_entry,
                colocated_join,
            )

            ldir, rdir = self._tables[lname], self._tables[rname]
            lv = latest_version(ldir) if lver is None else int(lver)
            rv = latest_version(rdir) if rver is None else int(rver)
            lman = _read_manifest(ldir, lv)
            rman = _read_manifest(rdir, rv)
            le = _spec_bucket_entry(lman, lk)
            re_ = _spec_bucket_entry(rman, rk)
            ln, rn = int(le["n"]), int(re_["n"])
            if ln % rn != 0 and rn % ln != 0:
                return None  # incommensurable bucket counts
        except Exception:
            return None  # not co-locatable — the generic plan is correct
        # rewrite references onto the joined relation's unqualified
        # namespace BEFORE planning, so the WHERE can be inspected for
        # pushdown: strip the two aliases, map the coalesced-away right
        # key onto the (left-named) output key
        strip = rf"\b(?:{re.escape(lal)}|{re.escape(ral)})\."

        def _strip(mm, text):
            return ""

        items = _sub_blind(strip, _strip, items, flags=0)
        tail = _sub_blind(strip, _strip, tail, flags=0) if tail else ""
        if rk != lk:
            _to_lk = lambda mm, text: lk
            items = _sub_blind(rf"\b{re.escape(rk)}\b", _to_lk, items)
            tail = _sub_blind(rf"\b{re.escape(rk)}\b", _to_lk, tail) if tail else ""
        # predicate pushdown: simple one-sided conjuncts of the WHERE
        # become the source's pruning predicates (manifest-stats file
        # prune + row-exact re-apply inside the source); the SQL
        # residual keeps the FULL WHERE — double application of a
        # deterministic predicate is harmless, a missed pushdown is
        # just a scan tax. Anything the conjunction parser refuses
        # (OR, functions, column-to-column) stays SQL-only.
        lcols = {f["name"] for f in (lman.get("schema") or {}).get("fields", [])}
        rcols = {f["name"] for f in (rman.get("schema") or {}).get("fields", [])}
        left_where: list | None = []
        right_where: list | None = []
        wm = (
            re.match(r"(?is)^WHERE\s+(.*?)(?:\s+(?:GROUP|ORDER|HAVING|LIMIT)\b.*)?$",
                     _quote_blind(tail))
            if tail
            else None
        )
        if wm:
            try:
                preds = _parse_conjunction(tail[wm.start(1) : wm.end(1)])
            except ValueError:
                preds = []
            for col, op, val in preds:
                if col in lcols and col not in rcols:
                    left_where.append((col, op, val))
                elif col in rcols and col not in lcols:
                    right_where.append((col, op, val))
                elif col == lk and rk != lk:
                    # a key predicate holds on both sides through the
                    # join equality — push to both for symmetric pruning
                    left_where.append((col, op, val))
                    right_where.append((rk, op, val))
                elif col == lk:
                    left_where.append((col, op, val))
                    right_where.append((col, op, val))
        try:
            joined = colocated_join(
                self._spark, ldir, rdir, left_key=lk, right_key=rk,
                left_version=lv, right_version=rv,
                left_where=left_where or None,
                right_where=right_where or None,
            )
        except Exception:
            return None
        # the joined relation's columns are unqualified; a duplicate
        # non-key name would make alias-stripped references ambiguous —
        # fall back to the generic two-view plan
        if len(set(joined.columns)) != len(joined.columns):
            return None
        view = f"__wh_coloc_{lname}_{rname}"
        joined.createOrReplaceTempView(view)
        sql = f"SELECT {items} FROM {view}"
        if tail:
            sql = f"{sql} {tail}"
        try:
            return self._spark.sql(sql)
        except Exception:
            return None  # any resolution miss → generic plan

    def _try_bucketed_agg_select(self, stmt: str) -> DataFrame | None:
        """Route ``SELECT <keys and aggregates> FROM t [VERSION AS OF n]
        [WHERE <conjunction>] GROUP BY <keys> [ORDER BY ...] [LIMIT n]``
        onto the zero-exchange bucket-local aggregation
        (``sources/colocated.py:colocated_groupby``) when ``t`` is a
        registered table bucket-partitioned on one of the group keys,
        every select item is a group key or a count/sum/min/max/avg over
        a plain column (aliased), and the WHERE — if any — is a simple
        conjunction the source can apply IN-SCAN (the aggregation
        happens inside the source, so a residual WHERE could not
        re-apply afterwards; an unparsable WHERE falls back). Returns
        None for every other shape — this path upgrades, never
        refuses."""
        m = re.fullmatch(
            rf"SELECT\s+(.*?)\s+FROM\s+({_IDENT})"
            rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?"
            rf"(?:\s+WHERE\s+(.*?))?"
            rf"\s+GROUP\s+BY\s+([A-Za-z0-9_,\s]+?)"
            rf"(\s+ORDER\s+BY\s+[A-Za-z0-9_,\s()]+?)?"
            rf"(\s+LIMIT\s+\d+)?",
            _quote_blind(stmt),
            re.I | re.S,
        )
        if not m:
            return None
        name = m.group(2)
        if name not in self._tables:
            return None
        items_txt = stmt[m.start(1) : m.end(1)]
        where_txt = stmt[m.start(4) : m.end(4)] if m.group(4) else None
        keys = [k.strip() for k in m.group(5).split(",") if k.strip()]
        order_txt = stmt[m.start(6) : m.end(6)] if m.group(6) else ""
        limit_txt = m.group(7) or ""
        if not keys or any(not re.fullmatch(_IDENT, k) for k in keys):
            return None
        aggs: dict = {}
        out_items: list[str] = []
        for item in _split_top_level(items_txt):
            km = re.fullmatch(
                rf"({_IDENT})(?:\s+AS\s+({_IDENT}))?", item, re.I
            )
            if km and km.group(1) in keys:
                out_items.append(
                    f"{km.group(1)} AS {km.group(2)}" if km.group(2) else km.group(1)
                )
                continue
            am = re.fullmatch(
                rf"(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(\*|{_IDENT})\s*\)"
                rf"\s+AS\s+({_IDENT})",
                item,
                re.I,
            )
            if not am:
                return None  # expression/unaliased/unsupported → generic
            fn, col, alias = am.group(1).lower(), am.group(2), am.group(3)
            if col == "*":
                if fn != "count":
                    return None
                col = None
            if alias in aggs or alias in keys:
                return None
            aggs[alias] = (fn, col)
            out_items.append(alias)
        if not aggs:
            return None  # a pure key projection is not an aggregation
        preds = None
        if where_txt:
            try:
                preds = _parse_conjunction(where_txt)
            except ValueError:
                return None  # must apply IN-scan or not at all
        avg_cols = [c for (fn, c) in aggs.values() if fn == "avg"]
        if avg_cols:
            # the routed AVG divides exact sum/count into a DOUBLE;
            # Spark's generic AVG over a DECIMAL column returns decimal
            # — a result-type change, so decimal AVG stays generic
            from reactivestreams_kinesis_spark.operators.snapshots import (
                _read_manifest,
            )

            try:
                tv = latest_version(self._tables[name]) \
                    if m.group(3) is None else int(m.group(3))
                fields = (_read_manifest(self._tables[name], tv).get("schema")
                          or {}).get("fields", [])
                types = {f["name"]: str(f.get("type", "")) for f in fields}
            except Exception:
                return None
            if any("decimal" in types.get(c, "") for c in avg_cols):
                return None
        from reactivestreams_kinesis_spark.sources.colocated import (
            colocated_groupby,
        )

        try:
            rel = colocated_groupby(
                self._spark,
                self._tables[name],
                group_by=keys,
                aggs=aggs,
                where=preds,
                version=None if m.group(3) is None else int(m.group(3)),
            )
            rel.schema  # force plan-time eligibility checks NOW
        except Exception:
            return None  # no bucket spec on a group key, etc. → generic
        view = f"__wh_bagg_{name}"
        rel.createOrReplaceTempView(view)
        sql = f"SELECT {', '.join(out_items)} FROM {view}{order_txt}{limit_txt}"
        try:
            return self._spark.sql(sql)
        except Exception:
            return None

    # -- MERGE INTO ----------------------------------------------------------

    def _merge(self, stmt: str) -> int:
        from reactivestreams_kinesis_spark.operators.merge_into import merge_into

        m = re.match(
            rf"MERGE\s+INTO\s+({_IDENT})(?:\s+AS)?(?:\s+({_IDENT}))?\s+"
            rf"USING\s+({_IDENT})(?:\s+AS)?(?:\s+({_IDENT}))?\s+"
            rf"ON\s+(.*?)\s+(WHEN\s+.*)$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported MERGE shape — expected MERGE INTO <table> [AS t] "
                "USING <table-or-view> [AS s] ON <cond> WHEN ... (subquery "
                "sources are not supported; register a temp view instead)"
            )
        tname, talias, sname, salias, on_text, clauses_text = m.groups()
        talias = talias or tname
        salias = salias or sname
        if talias.upper() in ("WHEN",) or salias.upper() in ("WHEN",):
            raise ValueError("MERGE aliases may not be the keyword WHEN")
        table_dir = self._dir(tname)
        if sname in self._tables:
            source = read_snapshot(self._spark, self._tables[sname])
        else:
            try:
                source = self._spark.table(sname)
            except Exception:
                raise ValueError(
                    f"MERGE source {sname!r} is neither a warehouse table "
                    "nor a registered view"
                )

        def _norm(expr: str) -> str:
            # rewrite the statement's aliases onto the operator's fixed
            # t./s. namespace (whole-word, qualified references only;
            # quote-blind so alias-shaped text inside literals is data)
            expr = _sub_blind(rf"\b{re.escape(talias)}\.", lambda m, _t: "t.", expr)
            expr = _sub_blind(rf"\b{re.escape(salias)}\.", lambda m, _t: "s.", expr)
            return expr.strip()

        # the ON key: an AND-conjunction of alias-qualified equalities
        # (one term = the single-key merge, several = a composite key)
        on_clean = on_text.strip()
        if on_clean.startswith("(") and on_clean.endswith(")"):
            on_clean = on_clean[1:-1].strip()
        pairs: list[tuple[str, str]] = []
        for term in _split_blind(r"\s+AND\s+", on_clean, flags=re.I):
            on_m = re.fullmatch(
                rf"\(?\s*({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})\s*\)?",
                term.strip(),
            )
            if not on_m:
                raise ValueError(
                    "unsupported MERGE ON condition — an AND-conjunction of "
                    "alias-qualified equalities: ON t.<col> = s.<col> "
                    "[AND t.<col2> = s.<col2> ...]"
                )
            q1, c1, q2, c2 = on_m.groups()
            if q1 == talias and q2 == salias:
                pairs.append((c1, c2))
            elif q1 == salias and q2 == talias:
                pairs.append((c2, c1))
            else:
                raise ValueError(
                    f"MERGE ON must compare the target alias {talias!r} with "
                    f"the source alias {salias!r}"
                )
        t_key, s_key = pairs[0]

        kw: dict = {}
        # clause boundaries anchor on WHEN [NOT] MATCHED only — an
        # interior WHEN (a CASE WHEN in a SET expression or condition)
        # is NOT a boundary; matching runs over the quote-blinded text
        # (clause keywords inside string literals are data) with group
        # content sliced back out of the original by span
        clause_re = re.compile(
            r"WHEN\s+(NOT\s+)?MATCHED\s*(?:AND\s+(.*?))?\s*THEN\s+"
            r"(DELETE|UPDATE\s+SET\s+.*?|INSERT\s+.*?)\s*"
            r"(?=WHEN\s+(?:NOT\s+)?MATCHED\b|$)",
            re.I | re.S,
        )
        consumed = 0
        for cm in clause_re.finditer(_quote_blind(clauses_text)):
            if cm.start() != consumed:
                break
            consumed = cm.end()
            is_not = cm.group(1)
            cond = (
                clauses_text[cm.start(2) : cm.end(2)] if cm.group(2) else None
            )
            action = clauses_text[cm.start(3) : cm.end(3)].strip()
            cond = _norm(cond) if cond else None
            a_up = action.upper()
            if a_up == "DELETE":
                if is_not:
                    raise ValueError("WHEN NOT MATCHED THEN DELETE is not valid SQL")
                if kw.get("when_matched_delete"):
                    raise ValueError("at most one WHEN MATCHED ... DELETE clause")
                kw["when_matched_delete"] = True
                kw["matched_delete_condition"] = cond
            elif a_up.startswith("UPDATE"):
                if is_not:
                    raise ValueError("WHEN NOT MATCHED THEN UPDATE is not valid SQL")
                if "when_matched_update" in kw:
                    raise ValueError("at most one WHEN MATCHED ... UPDATE clause")
                sets = _split_assignments(
                    re.sub(r"(?is)^UPDATE\s+SET\s+", "", action)
                )
                kw["when_matched_update"] = {
                    _strip_target_prefix(cname, talias): _norm(expr)
                    for cname, expr in sets
                }
                kw["matched_update_condition"] = cond
            else:  # INSERT
                if not is_not:
                    raise ValueError("WHEN MATCHED THEN INSERT is not valid SQL")
                if "when_not_matched_insert" in kw:
                    raise ValueError("at most one WHEN NOT MATCHED ... INSERT clause")
                body = action[len("INSERT"):].strip()
                if body == "*":
                    kw["when_not_matched_insert"] = True
                else:
                    im = re.fullmatch(
                        r"\((.*?)\)\s*VALUES\s*\((.*)\)", body, re.I | re.S
                    )
                    if not im:
                        raise ValueError(
                            "unsupported INSERT shape — INSERT * or "
                            "INSERT (cols) VALUES (exprs)"
                        )
                    cols = [c.strip() for c in im.group(1).split(",")]
                    exprs = _split_top_level(im.group(2))
                    if len(cols) != len(exprs):
                        raise ValueError(
                            f"INSERT column/value arity mismatch "
                            f"({len(cols)} vs {len(exprs)})"
                        )
                    kw["when_not_matched_insert"] = {
                        c: _norm(e) for c, e in zip(cols, exprs)
                    }
                kw["not_matched_condition"] = cond
        if clauses_text[consumed:].strip():
            raise ValueError(
                f"unparsed MERGE clause text: {clauses_text[consumed:].strip()!r}"
            )
        if "when_not_matched_insert" not in kw:
            kw["when_not_matched_insert"] = False
        return merge_into(
            self._spark,
            table_dir,
            source,
            (t_key, s_key) if len(pairs) == 1 else pairs,
            **kw,
        )

    # -- DELETE / UPDATE -----------------------------------------------------

    def _delete(self, stmt: str) -> int:
        m = re.fullmatch(
            rf"DELETE\s+FROM\s+({_IDENT})\s+WHERE\s+(.*)", stmt, re.I | re.S
        )
        if not m:
            raise ValueError(
                "unsupported DELETE shape — expected DELETE FROM <table> "
                "WHERE <conjunction> (an unqualified delete-all is refused; "
                "state WHERE TRUE via predicates if you mean it)"
            )
        return delete_where(
            self._spark, self._dir(m.group(1)), _parse_conjunction(m.group(2))
        )

    def _update(self, stmt: str) -> int:
        # matched over the quote-blinded text: a WHERE inside a SET
        # string literal is data, not the clause boundary
        m = re.fullmatch(
            rf"UPDATE\s+({_IDENT})\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?",
            _quote_blind(stmt),
            re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported UPDATE shape — expected UPDATE <table> SET "
                "col = expr[, ...] [WHERE <conjunction>]"
            )
        name = m.group(1)
        sets_text = stmt[m.start(2) : m.end(2)]
        where = stmt[m.start(3) : m.end(3)] if m.group(3) else None
        from pyspark.sql import functions as F

        # update_where treats plain strings as LITERAL values; the SQL
        # statement's right-hand sides are expressions over the row
        assignments = {c: F.expr(e) for c, e in _split_assignments(sets_text)}
        preds = _parse_conjunction(where) if where else []
        return update_where(
            self._spark, self._dir(name), preds, assignments
        )

    # -- INSERT INTO ---------------------------------------------------------

    def _insert(self, stmt: str) -> int:
        from pyspark.sql import functions as F

        from reactivestreams_kinesis_spark.operators.snapshots import (
            snapshot_commit,
        )

        m = re.fullmatch(
            rf"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?({_IDENT})\s*"
            rf"(?:\(([^)]*)\))?\s*(?:REPLACE\s+WHERE\s+(.*?)\s+(?=SELECT|WITH|VALUES))?(.*)",
            _quote_blind(stmt),
            re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported INSERT shape — expected INSERT INTO|OVERWRITE "
                "<table> [(cols)] [REPLACE WHERE <conjunction>] "
                "VALUES (...)[, ...] or SELECT ..."
            )
        mode_kw = m.group(1).upper()
        name, col_list = m.group(2), m.group(3)
        replace_where = stmt[m.start(4) : m.end(4)] if m.group(4) else None
        body = stmt[m.start(5) : m.end(5)].strip()
        if replace_where is not None and mode_kw == "OVERWRITE":
            raise ValueError(
                "REPLACE WHERE composes with INSERT INTO (a scoped "
                "replacement); INSERT OVERWRITE already replaces the whole "
                "table"
            )
        table_dir = self._dir(name)
        head = body.split(None, 1)[0].upper() if body else ""
        if head in ("SELECT", "WITH"):
            df = self._select(body)
        elif head == "VALUES":
            df = self._spark.sql(body)  # VALUES rows are a valid query
        else:
            raise ValueError(
                f"INSERT body must be VALUES or SELECT, got {head or '<empty>'!r}"
            )
        declared = {
            f.name: f.dataType
            for f in read_snapshot(self._spark, table_dir).schema.fields
        }
        table_cols = list(declared)
        targets = (
            [c.strip() for c in col_list.split(",")] if col_list else table_cols
        )
        unknown = [c for c in targets if c not in declared]
        if unknown:
            raise ValueError(f"INSERT columns not in {name!r}: {unknown}")
        if len(df.columns) != len(targets):
            raise ValueError(
                f"INSERT arity mismatch: {len(df.columns)} values for "
                f"{len(targets)} columns"
            )
        # positional resolution (the SQL INSERT contract), cast to the
        # declared types; unmentioned table columns pad typed NULL.
        # toDF renames by POSITION first — name-based resolution would
        # be ambiguous when the SELECT repeats a source column next to
        # an expression over it (auto-named to the same identifier)
        uniq = df.toDF(*[f"__ins_c{i}" for i in range(len(df.columns))])
        aligned = uniq.select(
            *[
                F.col(f"__ins_c{i}").cast(declared[t]).alias(t)
                for i, t in enumerate(targets)
            ]
        )
        rows = aligned.select(
            *[
                F.col(c) if c in targets else F.lit(None).cast(declared[c]).alias(c)
                for c in table_cols
            ]
        )
        if replace_where is not None:
            # Delta's REPLACE WHERE: replace the predicate's rows with
            # the batch as delete + append — TWO commits, so a reader
            # between them sees the deleted-not-yet-replaced window and
            # a crash between them leaves the delete committed (the
            # retried statement's delete then matches nothing and the
            # append completes the replacement — net state correct,
            # not exactly-once: a bare SQL statement carries no replay
            # identity to derive txn ids from; callers needing that use
            # the Python operators with explicit txn_id). The inserted
            # rows MUST satisfy the predicate (Delta's constraint
            # check): silently landing rows outside the replaced
            # region would corrupt the "replace" contract.
            preds = _parse_conjunction(replace_where)
            cond = _preds_to_column(preds)
            n_bad = rows.filter(~F.coalesce(cond, F.lit(False))).limit(1).count()
            if n_bad:
                raise ValueError(
                    "REPLACE WHERE refused: the inserted rows do not all "
                    f"satisfy the predicate {replace_where.strip()!r} "
                    "(Delta's replaceWhere constraint check)"
                )
            delete_where(self._spark, table_dir, preds)
            return snapshot_commit(rows, table_dir)
        return snapshot_commit(
            rows,
            table_dir,
            mode="overwrite" if mode_kw == "OVERWRITE" else "append",
        )

    # -- CREATE / REFRESH ----------------------------------------------------

    _MV_FNS = {
        "count": "count",
        "sum": "sum",
        "min": "min",
        "max": "max",
        "avg": "avg",
        "approx_count_distinct": "approx_distinct",
    }

    def _create(self, stmt: str):
        from reactivestreams_kinesis_spark.operators.snapshots import (
            snapshot_commit,
        )

        m = re.fullmatch(
            rf"CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+TABLE\s+({_IDENT})\s+"
            rf"FOR\s+COLUMNS\s*\(\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)",
            stmt,
            re.I,
        )
        if m:
            # Delta's bloom-filter index DDL: per-file bloom sketches
            # recorded in the manifests for point-lookup file skipping
            from reactivestreams_kinesis_spark.operators.snapshots import (
                set_bloom_columns,
            )

            cols = [c.strip() for c in m.group(2).split(",")]
            return set_bloom_columns(self._spark, self._dir(m.group(1)), cols)
        m = re.fullmatch(
            rf"CREATE\s+TABLE\s+({_IDENT})\s+SHALLOW\s+CLONE\s+({_IDENT})"
            rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?",
            stmt,
            re.I,
        )
        if m:
            from reactivestreams_kinesis_spark.operators.snapshots import (
                clone_snapshot,
            )

            name, src, ver = m.groups()
            src_dir = self._dir(src)
            d = self._new_dir(name, "TABLE")
            v = clone_snapshot(
                src_dir, d, version=None if ver is None else int(ver)
            )
            self._tables[name] = d
            return v
        m = re.fullmatch(
            rf"CREATE\s+TABLE\s+({_IDENT})"
            rf"(?:\s+PARTITIONED\s+BY\s*\(((?:[^()]|\([^()]*\))*)\))?"
            rf"(?:\s+CLUSTERED\s+BY\s*\(\s*({_IDENT})\s*\)\s+INTO\s+(\d+)\s+BUCKETS)?"
            rf"\s+AS\s+(.*)",
            stmt,
            re.I | re.S,
        )
        if m:
            name, part_text, clus_col, clus_n, body = m.groups()
            # the layout levers, SQL-reachable: PARTITIONED BY entries
            # are identity cols / day(col) / bucket(n, col) (Iceberg's
            # transform spellings); CLUSTERED BY (k) INTO n BUCKETS is
            # the Hive/Spark spelling of the bucket transform — the
            # co-located join's prerequisite
            partition_by: list = []
            for item in _split_top_level(part_text) if part_text else []:
                fm = re.fullmatch(
                    rf"(?:({_IDENT})"
                    rf"|day\s*\(\s*({_IDENT})\s*\)"
                    rf"|bucket\s*\(\s*(\d+)\s*,\s*({_IDENT})\s*\))",
                    item,
                    re.I,
                )
                if not fm:
                    raise ValueError(
                        f"unsupported PARTITIONED BY entry {item!r} — "
                        "<col>, day(<col>), or bucket(<n>, <col>)"
                    )
                ident, day_col, bn, bcol = fm.groups()
                if ident:
                    partition_by.append(ident)
                elif day_col:
                    partition_by.append((day_col, "day"))
                else:
                    partition_by.append((bcol, "bucket", int(bn)))
            if clus_col:
                partition_by.append((clus_col, "bucket", int(clus_n)))
            d = self._new_dir(name, "TABLE")
            v = snapshot_commit(
                self._select(body.strip()),
                d,
                partition_by=partition_by or None,
            )
            self._tables[name] = d
            return v
        m = re.fullmatch(
            rf"CREATE\s+MATERIALIZED\s+VIEW\s+({_IDENT})\s+AS\s+"
            rf"SELECT\s+(.*?)\s+FROM\s+(.*?)"
            rf"(?:\s+WHERE\s+(.*?))?\s+GROUP\s+BY\s+(.*)",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported CREATE shape — CREATE TABLE <name> AS SELECT "
                "... | SHALLOW CLONE <table> [VERSION AS OF n], or CREATE "
                "MATERIALIZED VIEW <name> AS SELECT <keys and aggregates> "
                "FROM <table>[ JOIN <dim> ON ...] [WHERE ...] GROUP BY <keys>"
            )
        from reactivestreams_kinesis_spark.operators.matview import (
            create_materialized_view,
            create_materialized_view_over_join,
        )

        name, items_text, from_text, where, group_text = m.groups()
        join_spec = self._parse_mv_from(from_text.strip())
        group_by = [c.strip() for c in group_text.split(",")]
        aggs: dict = {}
        keys_seen: list[str] = []
        for item in _split_top_level(items_text):
            bare = re.fullmatch(_IDENT, item)
            if bare:
                keys_seen.append(item)
                continue
            num = r"[-+]?\d+(?:\.\d+)?"
            hm = re.fullmatch(
                rf"HIST_QUANTILE\s*\(\s*({_IDENT})\s*,\s*({num})\s*,"
                rf"\s*({num})\s*,\s*({num})\s*(?:,\s*(\d+)\s*)?\)"
                rf"\s+AS\s+({_IDENT})",
                item,
                re.I | re.S,
            )
            if hm:
                # incremental percentile sketch: HIST_QUANTILE(col, q,
                # lo, hi[, bins]) — params validated by the operator
                col, q, lo, hi, bins, alias = hm.groups()
                prm = {"q": float(q), "lo": float(lo), "hi": float(hi)}
                if bins is not None:
                    prm["bins"] = int(bins)
                aggs[alias] = ("hist_quantile", col, prm)
                continue
            fm = re.fullmatch(
                rf"({_IDENT})\s*\(\s*(\*|{_IDENT})\s*\)\s+AS\s+({_IDENT})",
                item,
                re.I | re.S,
            )
            if not fm:
                raise ValueError(
                    f"unsupported MV select item {item!r} — bare group keys "
                    "and <fn>(col|*) AS <alias> only (the maintenance "
                    "algebra needs each output to be one named aggregate)"
                )
            fn, arg, alias = fm.group(1).lower(), fm.group(2), fm.group(3)
            if fn not in self._MV_FNS:
                raise ValueError(
                    f"unsupported MV aggregate {fn!r} "
                    f"(supported: {sorted(self._MV_FNS)})"
                )
            if arg == "*" and fn != "count":
                raise ValueError(f"{fn}(*) is not a thing — only COUNT(*)")
            aggs[alias] = (self._MV_FNS[fn], None if arg == "*" else arg)
        if sorted(keys_seen) != sorted(group_by):
            raise ValueError(
                f"MV select keys {sorted(keys_seen)} must equal the GROUP "
                f"BY list {sorted(group_by)}"
            )
        d = self._new_dir(name, "MATERIALIZED VIEW")
        if join_spec["dim_dir"] is None:
            v = create_materialized_view(
                self._spark,
                d,
                join_spec["fact_dir"],
                group_by=group_by,
                aggs=aggs,
                where=where.strip() if where else None,
            )
        else:
            v = create_materialized_view_over_join(
                self._spark,
                d,
                join_spec["fact_dir"],
                join_spec["dim_dir"],
                join_on=(join_spec["fact_key"], join_spec["dim_key"]),
                group_by=group_by,
                aggs=aggs,
                where=where.strip() if where else None,
            )
        self._views[name] = d
        return v

    def _parse_mv_from(self, text: str) -> dict:
        """The MV statement's FROM: one warehouse table, or the
        star-schema pair ``fact [AS a] JOIN dim [AS b] ON a.k = b.k``
        (inner join, dim frozen — the left relation is the maintained
        FACT side). Select/GROUP BY columns stay UNQUALIFIED: the
        joined relation's names are collision-checked by the operator,
        so qualification would add nothing but parse surface."""
        single = re.fullmatch(_IDENT, text)
        if single:
            return {
                "fact_dir": self._dir(text),
                "dim_dir": None,
                "fact_key": None,
                "dim_key": None,
            }
        m = re.fullmatch(
            rf"({_IDENT})(?:\s+AS)?(?:\s+({_IDENT}))?\s+JOIN\s+"
            rf"({_IDENT})(?:\s+AS)?(?:\s+({_IDENT}))?\s+ON\s+"
            rf"({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})",
            text,
            re.I,
        )
        if not m:
            raise ValueError(
                f"unsupported MV FROM {text!r} — a warehouse table, or "
                "<fact> [AS a] JOIN <dim> [AS b] ON a.<col> = b.<col>"
            )
        fact, fa, dim, da, q1, c1, q2, c2 = m.groups()
        fa, da = fa or fact, da or dim
        if q1 == fa and q2 == da:
            fk, dk = c1, c2
        elif q1 == da and q2 == fa:
            fk, dk = c2, c1
        else:
            raise ValueError(
                f"MV join ON must compare the fact alias {fa!r} with the "
                f"dim alias {da!r}"
            )
        return {
            "fact_dir": self._dir(fact),
            "dim_dir": self._dir(dim),
            "fact_key": fk,
            "dim_key": dk,
        }

    def _refresh_mv(self, stmt: str) -> int:
        from reactivestreams_kinesis_spark.operators.matview import (
            refresh_materialized_view,
        )

        m = re.fullmatch(
            rf"REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})"
            rf"(?:\s+STRATEGY\s+(MERGE|OVERWRITE))?"
            rf"(?:\s+ON\s+DIM\s+CHANGE\s+(INCREMENTAL|REBUILD|REFUSE))?",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported REFRESH shape — REFRESH MATERIALIZED VIEW "
                "<name> [STRATEGY MERGE|OVERWRITE] "
                "[ON DIM CHANGE INCREMENTAL|REBUILD|REFUSE]"
            )
        name = m.group(1)
        if name not in self._views:
            raise ValueError(
                f"unknown materialized view {name!r} "
                f"(registered: {sorted(self._views)})"
            )
        return refresh_materialized_view(
            self._spark,
            self._views[name],
            strategy=(m.group(2) or "overwrite").lower(),
            on_dim_change=(m.group(3) or "refuse").lower(),
        )

    # -- ALTER / RESTORE -----------------------------------------------------

    # a datatype token: bare name, parameterized (DECIMAL(12,2),
    # VARCHAR(10)), or nested (ARRAY<INT>, MAP<STRING,INT>) — balanced
    # parens required so the parenthesized ADD COLUMNS (...) wrapper
    # can't eat a parameterized type's closing paren
    _TYPE = r"[A-Za-z_][A-Za-z0-9_<>,\s]*?(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?"

    def _alter(self, stmt: str) -> int:
        m = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})",
            stmt,
            re.I,
        )
        if m:
            return rename_column(self._dir(m.group(1)), m.group(2), m.group(3))
        # the bare and parenthesized ADD COLUMN forms parse as SEPARATE
        # alternatives: a shared optional \)? once consumed the closing
        # paren of a parameterized type (DECIMAL(12,2) parsed as
        # 'DECIMAL(12,2'), so each form owns its own parens now
        m = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMNS?\s+({_IDENT})\s+({self._TYPE})",
            stmt,
            re.I,
        ) or re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMNS?\s+\(\s*({_IDENT})\s+({self._TYPE})\s*\)",
            stmt,
            re.I,
        )
        if m:
            return add_column(self._dir(m.group(1)), m.group(2), m.group(3).strip())
        m = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})\s+TYPE\s+({self._TYPE})",
            stmt,
            re.I,
        )
        if m:
            from reactivestreams_kinesis_spark.operators.snapshots import (
                alter_column_type,
            )

            return alter_column_type(
                self._dir(m.group(1)), m.group(2), m.group(3).strip()
            )
        m = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+COLUMNS?\s+\(?\s*({_IDENT})\s*\)?",
            stmt,
            re.I,
        )
        if m:
            return drop_column(self._dir(m.group(1)), m.group(2))
        m = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+CONSTRAINT\s+({_IDENT})"
            rf"\s+CHECK\s*\((.+)\)",
            stmt,
            re.I | re.S,
        )
        if m:
            # Delta's CHECK-constraint DDL: enforced on every subsequent
            # commit by the snapshot layer (existing rows validate now)
            from reactivestreams_kinesis_spark.operators.snapshots import (
                add_constraint,
            )

            return add_constraint(
                self._spark, self._dir(m.group(1)), m.group(2), m.group(3).strip()
            )
        m = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+CONSTRAINT\s+({_IDENT})",
            stmt,
            re.I,
        )
        if m:
            from reactivestreams_kinesis_spark.operators.snapshots import (
                drop_constraint,
            )

            return drop_constraint(self._dir(m.group(1)), m.group(2))
        m = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+CREATE\s+TAG\s+({_IDENT})"
            rf"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?",
            stmt,
            re.I,
        )
        if m:
            # Iceberg's named-ref DDL: pin a human name to a version;
            # SELECT ... <t> VERSION AS OF '<tag>' reads through it
            from reactivestreams_kinesis_spark.operators.snapshots import (
                tag_snapshot,
            )

            name, tag, ver = m.groups()
            return tag_snapshot(
                self._dir(name), tag, None if ver is None else int(ver)
            )
        m = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+TAG\s+({_IDENT})",
            stmt,
            re.I,
        )
        if m:
            from reactivestreams_kinesis_spark.operators.snapshots import (
                delete_tag,
            )

            delete_tag(self._dir(m.group(1)), m.group(2))
            return 0
        raise ValueError(
            "unsupported ALTER TABLE shape — supported: RENAME COLUMN a TO b, "
            "ADD COLUMN c <type>, ALTER COLUMN c TYPE <type>, DROP COLUMN c, "
            "ADD CONSTRAINT n CHECK (expr), DROP CONSTRAINT n, "
            "CREATE TAG t [AS OF VERSION n], DROP TAG t"
        )

    def _analyze(self, stmt: str) -> int:
        """ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS a, b — the
        SQL lever onto the per-file NDV (HLL) statistics collection
        (``set_ndv_columns``), whose sketches the stats-pruned scan and
        ``approx_distinct_count`` consume. Metadata-and-stats-only: one
        bounded pass per listed column over each data file, recorded in
        the manifests — no table rewrite."""
        m = re.fullmatch(
            rf"ANALYZE\s+TABLE\s+({_IDENT})\s+COMPUTE\s+STATISTICS\s+"
            rf"FOR\s+COLUMNS\s+({_IDENT}(?:\s*,\s*{_IDENT})*)",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported ANALYZE shape — ANALYZE TABLE <t> COMPUTE "
                "STATISTICS FOR COLUMNS a[, b ...]"
            )
        from reactivestreams_kinesis_spark.operators.snapshots import (
            set_ndv_columns,
        )

        cols = [c.strip() for c in m.group(2).split(",")]
        return set_ndv_columns(self._spark, self._dir(m.group(1)), cols)

    def _restore(self, stmt: str) -> int:
        m = re.fullmatch(
            rf"RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported RESTORE shape — expected RESTORE TABLE <t> TO "
                "VERSION AS OF <n>"
            )
        return restore_snapshot(self._dir(m.group(1)), int(m.group(2)))

    def _optimize(self, stmt: str) -> int:
        from reactivestreams_kinesis_spark.operators.snapshots import (
            compact_snapshot,
        )

        m = re.fullmatch(
            rf"OPTIMIZE\s+({_IDENT})(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported OPTIMIZE shape — expected OPTIMIZE <table> "
                "[ZORDER BY (cols)]"
            )
        cols = (
            [c.strip() for c in m.group(2).split(",")] if m.group(2) else None
        )
        return compact_snapshot(
            self._spark,
            self._dir(m.group(1)),
            cluster_by=cols,
            zorder=bool(cols),
        )

    def _vacuum(self, stmt: str) -> list:
        from reactivestreams_kinesis_spark.operators.snapshots import (
            vacuum_by_retention,
        )

        m = re.fullmatch(
            rf"VACUUM\s+({_IDENT})\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS?"
            rf"(?:\s+(DRY\s+RUN))?",
            stmt,
            re.I,
        )
        if not m:
            # Delta's bare VACUUM implies a 7-day default; this surface
            # requires the retention stated (explicit beats implicit for
            # an operation that deletes history)
            raise ValueError(
                "unsupported VACUUM shape — expected VACUUM <table> RETAIN "
                "<n> HOURS [DRY RUN] (the retention must be explicit)"
            )
        return vacuum_by_retention(
            self._dir(m.group(1)),
            retention_seconds=float(m.group(2)) * 3600.0,
            dry_run=m.group(3) is not None,
        )


# -- small parsers -----------------------------------------------------------


def _quote_blind(text: str) -> str:
    """``text`` with every string-literal's CONTENT replaced by \\x00
    (same length, quotes kept) — regex matching over the blinded text
    can never match inside a literal, while match SPANS map 1:1 back
    onto the original. This is what keeps the front-end's rewrites
    (time travel, alias normalization, clause splitting) refusal-safe:
    a literal containing ``'orders VERSION AS OF 3'`` or
    ``'WHEN MATCHED'`` is DATA, never syntax."""
    out, quote = [], None
    for ch in text:
        if quote:
            if ch == quote:
                out.append(ch)
                quote = None
            else:
                out.append("\x00")
        elif ch in ("'", '"'):
            out.append(ch)
            quote = ch
        else:
            out.append(ch)
    return "".join(out)


def _sub_blind(pattern: str, repl, text: str, flags: int = 0) -> str:
    """``re.sub`` that matches over the quote-blinded text but splices
    replacements into the ORIGINAL — string literals pass through
    verbatim and are never rewritten. ``repl`` receives
    ``(match, text)`` so group content can be sliced from the original
    via spans (a group that covers a literal's interior would otherwise
    read \\x00s)."""
    blind = _quote_blind(text)
    out, last = [], 0
    for m in re.finditer(pattern, blind, flags):
        out.append(text[last : m.start()])
        out.append(repl(m, text))
        last = m.end()
    out.append(text[last:])
    return "".join(out)


def _search_blind(pattern: str, text: str, flags: int = 0):
    """``re.search`` over the quote-blinded text (matches in literals
    don't count)."""
    return re.search(pattern, _quote_blind(text), flags)


def _split_blind(pattern: str, text: str, flags: int = 0) -> list[str]:
    """``re.split`` at separators found OUTSIDE string literals; the
    returned pieces are slices of the original text."""
    blind = _quote_blind(text)
    out, last = [], 0
    for m in re.finditer(pattern, blind, flags):
        out.append(text[last : m.start()])
        last = m.end()
    out.append(text[last:])
    return out


def _split_top_level(text: str) -> list[str]:
    """Split on commas not nested in parens/quotes."""
    out, depth, cur, quote = [], 0, [], None
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def _strip_target_prefix(col: str, talias: str) -> str:
    col = col.strip()
    if col.startswith(f"{talias}."):
        return col[len(talias) + 1:]
    if col.startswith("t."):
        return col[2:]
    return col


def _split_assignments(text: str) -> list[tuple[str, str]]:
    out = []
    for part in _split_top_level(text):
        if "=" not in part:
            raise ValueError(f"malformed SET assignment {part!r}")
        cname, expr = part.split("=", 1)
        out.append((cname.strip(), expr.strip()))
    return out


_CMP = re.compile(
    rf"({_IDENT})\s*(=|!=|<>|<=|>=|<|>)\s*(.+)", re.S
)
_IN = re.compile(rf"({_IDENT})\s+IN\s*\((.*)\)", re.I | re.S)


def _parse_literal(text: str):
    t = text.strip()
    if re.fullmatch(r"-?\d+", t):
        return int(t)
    if re.fullmatch(r"-?\d*\.\d+([eE][-+]?\d+)?", t) or re.fullmatch(
        r"-?\d+[eE][-+]?\d+", t
    ):
        return float(t)
    if len(t) >= 2 and t[0] == "'" and t[-1] == "'":
        return t[1:-1]
    raise ValueError(
        f"unsupported literal {text!r} in WHERE — numbers and "
        "single-quoted strings only"
    )


def _preds_to_column(preds: list[tuple]):
    """The pruning-predicate triples as one Spark Column conjunction —
    the row-exact twin of the file-level prune, used where a statement
    must VALIDATE rows against the predicate (REPLACE WHERE's
    constraint check)."""
    from pyspark.sql import functions as F

    ops = {
        "=": lambda c, v: F.col(c) == v,
        "<": lambda c, v: F.col(c) < v,
        "<=": lambda c, v: F.col(c) <= v,
        ">": lambda c, v: F.col(c) > v,
        ">=": lambda c, v: F.col(c) >= v,
        "in": lambda c, v: F.col(c).isin(list(v)),
    }
    cond = None
    for col, op, val in preds:
        c = ops[op](col, val)
        cond = c if cond is None else (cond & c)
    return cond if cond is not None else F.lit(True)


def _parse_conjunction(text: str) -> list[tuple]:
    """An AND-conjunction of simple comparisons onto the operators'
    pruning-predicate triples. OR / NOT / functions / column-to-column
    comparisons refuse loudly — those need a different operator, not a
    silent full scan under a misread predicate."""
    preds: list[tuple] = []
    for raw in _split_blind(r"\s+AND\s+", text.strip(), flags=re.I):
        part = raw.strip()
        if part.startswith("(") and part.endswith(")"):
            part = part[1:-1].strip()
        if _search_blind(r"\s+OR\s+", part, re.I):
            raise ValueError(
                f"unsupported WHERE term {part!r} — OR is outside the "
                "pruning-predicate vocabulary (use two statements or the "
                "Python operator surface)"
            )
        im = _IN.fullmatch(part)
        if im:
            vals = tuple(_parse_literal(v) for v in _split_top_level(im.group(2)))
            preds.append((im.group(1), "in", vals))
            continue
        cm = _CMP.fullmatch(part)
        if not cm:
            raise ValueError(
                f"unsupported WHERE term {part!r} — expected "
                "<col> <op> <literal> or <col> IN (...)"
            )
        col, op, lit = cm.groups()
        if op in ("!=", "<>"):
            raise ValueError(
                "!= is outside the pruning-predicate vocabulary — "
                "express the complement or use the Python surface"
            )
        preds.append((col, op, _parse_literal(lit)))
    return preds
