"""SQL DDL/utility surface over txlog tables — the statement vocabulary a
lakehouse user types (published Delta SQL forms), mapped onto the engine's
metadata commits. The reference's users speak SQL at every layer
(/root/reference/README.md:131-192: CREATE CHANGEFEED, OPENROWSET,
JSON_VALUE); this closes the gap for the table-maintenance side so a
switcher never needs the Python API for day-2 operations:

    ALTER TABLE t RENAME COLUMN after.city TO town
    ALTER TABLE t ADD COLUMN score double
    ALTER TABLE t DROP COLUMN score
    ALTER TABLE t SET TBLPROPERTIES ('checkpoint.interval' = '8')
    ALTER TABLE t UNSET TBLPROPERTIES ('checkpoint.interval')
    ALTER TABLE t ADD CONSTRAINT positive CHECK (qty > 0)
    ALTER TABLE t DROP CONSTRAINT positive
    ALTER TABLE t ALTER COLUMN src SET DEFAULT 'crawl'
    ALTER TABLE t ALTER COLUMN src DROP DEFAULT
    ALTER TABLE t ALTER COLUMN k TYPE bigint        (type widening)
    ALTER TABLE t ADD COLUMN uid BIGINT GENERATED ALWAYS AS IDENTITY
        (START WITH 100 INCREMENT BY 5)
    ALTER TABLE t ADD PARTITION FIELD day    (Iceberg partition evolution)
    ALTER TABLE t DROP PARTITION FIELD day
    OPTIMIZE t [ZORDER BY (c1, c2)]
    GENERATE symlink_format_manifest FOR TABLE t
    REORG TABLE t APPLY (PURGE)
    CREATE TABLE c SHALLOW CLONE t [VERSION AS OF 3]
    FSCK REPAIR TABLE t [DRY RUN]
    COPY INTO t FROM '/loads/*.parquet' [FILEFORMAT = PARQUET|NDJSON]
    VACUUM t [RETAIN 168 HOURS]
    RESTORE t TO VERSION AS OF 3
    DESCRIBE DETAIL t
    DESCRIBE HISTORY t
    SHOW TBLPROPERTIES t
    CREATE TABLE t AS SELECT ...            (views over the tables map)
    INSERT INTO t SELECT ... | VALUES (...) (positional, cast to schema)
    RESTORE t TO TIMESTAMP AS OF '2026-01-01T00:00:00Z'
    DELETE FROM t WHERE k >= 10 AND k < 20
    UPDATE t SET v = <sql expr> WHERE k = 3
    MERGE INTO t USING u ON k
        [WHEN MATCHED AND (<src cond>) THEN DELETE]
        [WHEN MATCHED THEN UPDATE SET *]
        [WHEN NOT MATCHED THEN INSERT *]

Statements parse with a deliberately small, anchored grammar (one
statement per call, conjunctive comparison predicates for DML — the same
triple vocabulary ``read(predicates=)`` and file pruning speak, so a SQL
DELETE prunes files exactly like the Python call). Anything outside the
grammar raises with the supported forms listed; SELECT belongs to
``Engine.sql_tx`` (full Spark SQL over snapshot views)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .localrel import local_df
from pyspark.sql import functions as F

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_PATH_IDENT = rf"{_IDENT}(?:\.{_IDENT})*"


def _parse_predicates(where: str) -> list[tuple]:
    """Conjunctive ``col op literal`` triples — the pruning vocabulary.
    Literals: numbers and single-quoted strings. ``col LIKE '%needle%'``
    (both wildcards, none inside) maps to the ``contains`` triple so a
    trigram bloom index can skip files for it."""
    preds: list[tuple] = []
    for clause in re.split(r"(?i)\s+AND\s+", where.strip()):
        lk = re.fullmatch(
            rf"\s*({_PATH_IDENT})\s+(?i:LIKE)\s+'%((?:[^'%]|'')+)%'\s*",
            clause,
        )
        if lk:
            needle = lk.group(2).replace("''", "'")
            if "_" in needle:
                # SQL LIKE's '_' is a single-char wildcard; mapping it to
                # a literal 'contains' would silently match only the
                # literal text and mutate the wrong rows
                raise ValueError(
                    f"LIKE needle {needle!r} contains '_', SQL's "
                    "single-character wildcard — only literal needles "
                    "map to the contains predicate; escape is not "
                    "supported, rewrite the statement without LIKE"
                )
            preds.append((lk.group(1), "contains", needle))
            continue
        m = re.fullmatch(
            rf"\s*({_PATH_IDENT})\s*(==|=|>=|<=|>|<)\s*"
            r"('(?:[^']|'')*'|-?\d+(?:\.\d+)?)\s*",
            clause,
        )
        if not m:
            raise ValueError(
                f"unsupported WHERE clause {clause!r}: use conjunctive "
                "`col <op> literal` comparisons (=, ==, >, >=, <, <=) or "
                "col LIKE '%needle%'"
            )
        col, op, lit = m.group(1), m.group(2), m.group(3)
        if op == "=":
            op = "=="
        value: object
        if lit.startswith("'"):
            value = lit[1:-1].replace("''", "'")
        elif re.fullmatch(r"-?\d+", lit):
            value = int(lit)
        else:
            value = float(lit)
        preds.append((col, op, value))
    return preds


def _split_quoted_list(body: str) -> list[str]:
    """Comma-split a TBLPROPERTIES/constraint argument list, respecting
    single quotes."""
    parts, buf, inq = [], [], False
    for ch in body:
        if ch == "'":
            inq = not inq
            buf.append(ch)
        elif ch == "," and not inq:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        parts.append("".join(buf).strip())
    return parts


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        return s[1:-1].replace("''", "'")
    return s


def execute_ddl(spark: SparkSession, statement: str, tables: dict[str, str]):
    """Run ONE DDL/maintenance statement against txlog tables.

    ``tables`` maps SQL table names to table directories (the same
    resolution ``Engine.sql_tx`` uses). Returns a DataFrame for DESCRIBE
    forms, a result dict for DML/maintenance, and the new version (int)
    for metadata DDL."""
    from .txlog import TxTable

    stmt = statement.strip().rstrip(";").strip()

    def t(name: str) -> "TxTable":
        if name not in tables:
            raise ValueError(
                f"unknown table {name!r}: known tables are {sorted(tables)}"
            )
        return TxTable(spark, tables[name])

    # -- ALTER TABLE ... ADD/DROP PARTITION FIELD (Iceberg's published
    # partition-evolution statements) --------------------------------------
    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+PARTITION\s+FIELD\s+"
        rf"({_IDENT})",
        stmt,
    )
    if m:
        tbl = t(m.group(1))
        cur = tbl.partitioning()
        if m.group(2) in cur:
            return tbl.version()  # idempotent, like Iceberg
        return tbl.set_partitioning(cur + [m.group(2)])

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+PARTITION\s+FIELD\s+"
        rf"({_IDENT})",
        stmt,
    )
    if m:
        tbl = t(m.group(1))
        cur = tbl.partitioning()
        if m.group(2) not in cur:
            raise ValueError(
                f"{m.group(2)!r} is not in the partition spec ({cur})"
            )
        return tbl.set_partitioning([c for c in cur if c != m.group(2)])

    # -- ALTER TABLE ... RENAME COLUMN (incl. dotted nested paths) ---------
    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+COLUMN\s+"
        rf"({_PATH_IDENT})\s+TO\s+({_PATH_IDENT})",
        stmt,
    )
    if m:
        return t(m.group(1)).rename_column(m.group(2), m.group(3))

    # identity declaration must parse BEFORE the generic ADD COLUMN (whose
    # dtype charclass would otherwise swallow the GENERATED clause)
    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMNS?\s+\(?\s*"
        rf"({_IDENT})\s+(?:BIGINT|LONG)\s+GENERATED\s+"
        r"(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY"
        r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)"
        r"(?:\s+INCREMENT\s+BY\s+(-?\d+))?\s*\))?\s*\)?",
        stmt,
    )
    if m:
        return t(m.group(1)).set_identity_column(
            m.group(2),
            start=int(m.group(4) or 1),
            step=int(m.group(5) or 1),
            always=m.group(3).strip().upper() == "ALWAYS",
        )

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMNS?\s+\(?\s*"
        rf"({_IDENT})\s+([A-Za-z0-9_()<>, ]+?)\s*\)?",
        stmt,
    )
    if m:
        return t(m.group(1)).add_column(m.group(2), m.group(3).strip())

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})\s+"
        r"SET\s+DEFAULT\s+(.+)",
        stmt,
    )
    if m:
        return t(m.group(1)).set_column_default(m.group(2), m.group(3).strip())

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})\s+"
        r"DROP\s+DEFAULT",
        stmt,
    )
    if m:
        return t(m.group(1)).drop_column_default(m.group(2))

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})\s+"
        r"TYPE\s+([A-Za-z0-9_(), ]+)",
        stmt,
    )
    if m:
        return t(m.group(1)).widen_column_type(m.group(2), m.group(3).strip())

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+COLUMN\s+({_IDENT})", stmt
    )
    if m:
        return t(m.group(1)).drop_column(m.group(2))

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+SET\s+TBLPROPERTIES\s*\((.*)\)",
        stmt,
    )
    if m:
        props: dict[str, str | None] = {}
        for item in _split_quoted_list(m.group(2)):
            km = re.fullmatch(r"(?s)\s*(.+?)\s*=\s*(.+?)\s*", item)
            if not km:
                raise ValueError(f"bad TBLPROPERTIES item {item!r}")
            props[_unquote(km.group(1))] = _unquote(km.group(2))
        return t(m.group(1)).set_properties(props)

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+UNSET\s+TBLPROPERTIES\s*\((.*)\)",
        stmt,
    )
    if m:
        return t(m.group(1)).set_properties(
            {_unquote(k): None for k in _split_quoted_list(m.group(2))}
        )

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+CONSTRAINT\s+({_IDENT})\s+"
        r"CHECK\s*\((.*)\)",
        stmt,
    )
    if m:
        return t(m.group(1)).add_check(m.group(2), m.group(3).strip())

    m = re.fullmatch(
        rf"(?is)ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+CONSTRAINT\s+({_IDENT})",
        stmt,
    )
    if m:
        return t(m.group(1)).drop_check(m.group(2))

    m = re.fullmatch(
        rf"(?is)FSCK\s+REPAIR\s+TABLE\s+({_IDENT})(\s+DRY\s+RUN)?", stmt
    )
    if m:
        return t(m.group(1)).fsck(dry_run=bool(m.group(2)))

    m = re.fullmatch(
        rf"(?is)COPY\s+INTO\s+({_IDENT})\s+FROM\s+'([^']+)'"
        r"(?:\s+FILEFORMAT\s*=\s*(PARQUET|NDJSON|JSON))?",
        stmt,
    )
    if m:
        import glob as _glob

        files = sorted(_glob.glob(m.group(2)))
        fmt = (m.group(3) or "PARQUET").upper()
        return t(m.group(1)).copy_into(
            files, fmt="parquet" if fmt == "PARQUET" else "ndjson"
        )

    # -- maintenance -------------------------------------------------------
    m = re.fullmatch(
        rf"(?is)OPTIMIZE\s+({_IDENT})"
        r"(?:\s+WHERE\s+(.*?))?"
        r"(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?",
        stmt,
    )
    if m:
        z = (
            [c.strip() for c in m.group(3).split(",")] if m.group(3) else None
        )
        preds = _parse_predicates(m.group(2)) if m.group(2) else None
        v = t(m.group(1)).compact(z_order=z, predicates=preds)
        return {"version": v}

    # GENERATE symlink_format_manifest FOR TABLE t: the Delta statement —
    # publish the snapshot's active-file URI lists for external engines
    m = re.fullmatch(
        rf"(?is)GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+({_IDENT})",
        stmt,
    )
    if m:
        written = t(m.group(1)).generate_manifest()
        return {"manifests": written}

    # REORG TABLE t APPLY (PURGE): Delta's DV-purge rewrite — compact()
    # already applies deletion vectors before writing, so the rewrite IS
    # the purge (plain coalesce layout; clustering policy still applies
    # through compact's defaults)
    m = re.fullmatch(
        rf"(?is)REORG\s+TABLE\s+({_IDENT})\s+APPLY\s*\(\s*PURGE\s*\)", stmt
    )
    if m:
        tbl = t(m.group(1))
        v = tbl.compact(target_files=max(1, len(tbl.snapshot()[1])))
        return {"version": v}

    m = re.fullmatch(
        rf"(?is)CREATE\s+TABLE\s+({_IDENT})\s+SHALLOW\s+CLONE\s+({_IDENT})"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?",
        stmt,
    )
    if m:
        if m.group(1) not in tables:
            raise ValueError(
                f"unknown clone target {m.group(1)!r}: map a directory for "
                "it in the tables dict first"
            )
        src = t(m.group(2))
        as_of = int(m.group(3)) if m.group(3) else None
        src.clone_to(tables[m.group(1)], as_of=as_of)
        return {"version": 0}

    m = re.fullmatch(
        rf"(?is)VACUUM\s+({_IDENT})"
        r"(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?(\s+DRY\s+RUN)?",
        stmt,
    )
    if m:
        tbl = t(m.group(1))
        hours = float(m.group(2)) if m.group(2) else None
        dry = bool(m.group(3))
        explicit = hours is not None
        if hours is None:
            # Bare `VACUUM t` must behave like the Delta statement it
            # imitates: default to the table's own vacuum.retainHours
            # policy, else the conservative 168h (7-day) default — NOT
            # delete-everything-but-current. A user typing the familiar
            # statement keeps a week of time travel/CDF/RESTORE history.
            prop = tbl.properties().get("vacuum.retainHours")
            try:
                hours = float(prop) if prop is not None else 168.0
            except ValueError:
                hours = 168.0
        deleted = tbl.vacuum(
            retain_versions=1, retain_hours=hours, dry_run=dry,
            # log pruning is a separate, more destructive decision (it ends
            # time travel past the horizon even for retained-window
            # readers of old logs); only an explicit RETAIN clause — the
            # operator stating a policy — opts in. Delta's bare VACUUM
            # never touches the log.
            prune_log=explicit and not dry,
        )
        return {("would_delete_files" if dry else "deleted_files"): deleted}

    m = re.fullmatch(
        rf"(?is)RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)",
        stmt,
    )
    if m:
        return t(m.group(1)).restore(int(m.group(2)))

    m = re.fullmatch(
        rf"(?is)RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+TO\s+TIMESTAMP\s+AS\s+OF\s+"
        r"'([^']+)'",
        stmt,
    )
    if m:
        tbl = t(m.group(1))
        return tbl.restore(tbl.version_at(m.group(2)))

    m = re.fullmatch(rf"(?is)DESCRIBE\s+DETAIL\s+({_IDENT})", stmt)
    if m:
        d = t(m.group(1)).describe()
        import json as _json

        return local_df(spark, 
            [(k, _json.dumps(v)) for k, v in d.items()], "item string, value string"
        )

    m = re.fullmatch(rf"(?is)SHOW\s+TBLPROPERTIES\s+({_IDENT})", stmt)
    if m:
        props = t(m.group(1))._state()["props"]
        return local_df(spark, 
            sorted((str(k), str(v)) for k, v in props.items()),
            "key string, value string",
        )

    m = re.fullmatch(rf"(?is)DESCRIBE\s+HISTORY\s+({_IDENT})", stmt)
    if m:
        hist = t(m.group(1)).history()
        return local_df(spark, 
            [
                (
                    int(c["version"]),
                    str(c.get("op")),
                    str(c.get("utc")),
                    len(c.get("added") or []),
                    len(c.get("removed") or []),
                )
                for c in hist
            ],
            "version int, op string, utc string, n_added int, n_removed int",
        )

    # -- lifecycle: INSERT INTO / CREATE TABLE AS --------------------------
    def _register_views() -> None:
        # snapshot-consistent temp views over every known table, the
        # sql_tx registration — resolved once, so a self-referencing
        # INSERT INTO t SELECT ... FROM t reads the pre-insert snapshot
        from .txlog import TxTable as _T

        for vname, d in tables.items():
            tv = _T(spark, d)
            if tv.version() >= 0:
                tv.read().createOrReplaceTempView(vname)

    m = re.fullmatch(
        rf"(?is)INSERT\s+INTO\s+({_IDENT})\s+(SELECT\s+.*|VALUES\s*\(.*)",
        stmt,
    )
    if m:
        target = t(m.group(1))
        body = m.group(2)
        if re.match(r"(?is)SELECT", body):
            _register_views()
        df = spark.sql(body)
        # SQL INSERT is POSITIONAL: align the produced columns to the
        # target schema by position and cast (both SELECT and VALUES
        # forms — `INSERT INTO t SELECT k+10, v FROM t` must not require
        # the caller to alias `k+10` back to the target name)
        import json as _json

        from pyspark.sql import types as _T

        schema = target.snapshot()[2]
        if schema is not None:
            st = _T.StructType.fromJson(_json.loads(schema))
            names = st.fieldNames()
            if len(df.columns) != len(names):
                raise ValueError(
                    f"INSERT INTO {m.group(1)}: {len(df.columns)} values "
                    f"per row, table has {len(names)} columns"
                )
            df = df.toDF(*names).select(
                *[F.col(n).cast(f.dataType) for n, f in zip(names, st.fields)]
            )
        return {"version": target.append(df)}

    m = re.fullmatch(
        rf"(?is)CREATE\s+TABLE\s+({_IDENT})\s+AS\s+(SELECT\s+.*)", stmt
    )
    if m:
        target = t(m.group(1))
        if target.version() >= 0:
            raise ValueError(
                f"CREATE TABLE {m.group(1)}: already a table "
                f"(v{target.version()}); use INSERT INTO or DROP it first"
            )
        _register_views()
        return {"version": target.overwrite(spark.sql(m.group(2)))}

    # -- DML ---------------------------------------------------------------
    m = re.fullmatch(
        rf"(?is)MERGE\s+INTO\s+({_IDENT})\s+USING\s+({_IDENT})\s+ON\s+"
        r"(.+?)"
        r"(\s+WHEN\s+MATCHED\s+AND\s+\((.+?)\)\s+THEN\s+DELETE)?"
        r"(\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*)?"
        r"(\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*)?",
        stmt,
    )
    if m:
        # key list: `k1, k2` or `t.k = s.k [AND ...]` (equi-keys only —
        # merge_into's contract; the whole-row UPDATE SET * / INSERT *
        # forms are Delta's star shorthand, which is exactly the replace-
        # matched-row semantics the engine's merge implements)
        keys: list[str] = []
        on_clause = m.group(3).strip()
        for part in re.split(r"(?i)\s+AND\s+|,", on_clause):
            part = part.strip()
            if not part:
                continue
            km = re.fullmatch(
                rf"(?:{_IDENT}\.)?({_IDENT})\s*=\s*(?:{_IDENT}\.)?({_IDENT})",
                part,
            )
            if km:
                if km.group(1) != km.group(2):
                    raise ValueError(
                        f"MERGE ON must equate the SAME column name on both "
                        f"sides (got {part!r}); rename the source column first"
                    )
                keys.append(km.group(1))
            elif re.fullmatch(_IDENT, part):
                keys.append(part)
            else:
                raise ValueError(
                    f"unsupported MERGE ON term {part!r}: use `key` or "
                    "`t.key = s.key` conjunctions"
                )
        if not keys:
            raise ValueError("MERGE ON clause has no key columns")
        delete_when = F.expr(m.group(5)) if m.group(5) else None
        do_update = bool(m.group(6))
        do_insert = bool(m.group(7))
        if not (do_update or do_insert or delete_when is not None):
            raise ValueError(
                "MERGE needs at least one WHEN clause: WHEN MATCHED "
                "[AND (...) THEN DELETE | THEN UPDATE SET *] / "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        return t(m.group(1)).merge_into(
            t(m.group(2)).read(),
            on=keys,
            delete_when=delete_when,
            update=do_update,
            insert=do_insert,
        )

    m = re.fullmatch(
        rf"(?is)DELETE\s+FROM\s+({_IDENT})\s+WHERE\s+(.*)", stmt
    )
    if m:
        return t(m.group(1)).delete_where(_parse_predicates(m.group(2)))

    m = re.fullmatch(
        rf"(?is)UPDATE\s+({_IDENT})\s+SET\s+({_IDENT})\s*=\s*(.+?)\s+WHERE\s+(.*)",
        stmt,
    )
    if m:
        return t(m.group(1)).update_where(
            _parse_predicates(m.group(4)), {m.group(2): F.expr(m.group(3))}
        )

    raise ValueError(
        f"unsupported statement: {stmt[:80]!r}. Supported: ALTER TABLE "
        "(RENAME/ADD/DROP COLUMN, ALTER COLUMN SET/DROP DEFAULT, ALTER "
        "COLUMN TYPE, ADD COLUMN ... GENERATED AS IDENTITY, SET/UNSET "
        "TBLPROPERTIES, ADD/DROP CONSTRAINT), OPTIMIZE [ZORDER BY], "
        "GENERATE symlink_format_manifest FOR TABLE, "
        "REORG TABLE ... APPLY (PURGE), CREATE TABLE ... SHALLOW CLONE, "
        "FSCK REPAIR TABLE, COPY INTO ... FROM, VACUUM [RETAIN n HOURS], "
        "RESTORE TO VERSION/TIMESTAMP AS OF, DESCRIBE DETAIL/HISTORY, "
        "CREATE TABLE ... AS SELECT, INSERT INTO ... SELECT/VALUES, "
        "DELETE FROM ... WHERE, UPDATE ... SET ... WHERE, MERGE INTO ... "
        "USING ... ON ... WHEN [NOT] MATCHED (SET */INSERT */DELETE "
        "forms). Standalone SELECT goes through Engine.sql_tx."
    )
