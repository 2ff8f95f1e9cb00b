"""SQL script runner: template params + multi-statement execution.

Models SURVEY.md §2.8 rows 40-42 (the reference's ``replace_params`` +
``split(';')`` loop in ``plugins/operator/clickhouse_operator.py:36-64``):
literal ``{{ params.k }}`` substitution, statement split, sequential
``spark.sql`` execution returning the last statement's DataFrame.
"""

from __future__ import annotations

import re
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession

_PARAM_RE = re.compile(r"\{\{\s*(?:params|custom_template_fields)\.(\w+)\s*\}\}")


def render_params(sql: str, params: Mapping[str, object] | None) -> str:
    """Substitute ``{{ params.k }}`` / ``{{ custom_template_fields.k }}``.

    Literal substitution like the reference (not Jinja — the reference
    deliberately avoids Jinja on sql_file, op.py:9-12). Values are meant
    for identifiers/paths; pass data values via Spark SQL named args
    instead of splicing.
    """
    params = params or {}

    def sub(m: re.Match) -> str:
        k = m.group(1)
        if k not in params:
            raise KeyError(f"missing template param: {k}")
        return str(params[k])

    return _PARAM_RE.sub(sub, sql)


def split_statements(script: str) -> list[str]:
    """Split a script into statements on ';', dropping empty ones.

    QUOTE-AWARE, unlike the reference's blind ``split(';')``
    (``plugins/operator/clickhouse_operator.py:45-64``), which breaks
    any statement containing a ';' inside a string literal. The scanner
    tracks single-quoted strings, double-quoted strings/identifiers,
    backtick identifiers (with doubled-quote and backslash escapes),
    ``--`` line comments and ``/* */`` block comments — a ';' inside
    any of those is content, not a separator. Divergence from the
    reference is deliberate and regression-tested."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    state: str | None = None  # one of ' " ` -- /*
    while i < n:
        c = script[i]
        if state is None:
            if c == ";":
                s = "".join(buf).strip()
                if s:
                    stmts.append(s)
                buf = []
                i += 1
                continue
            if c in ("'", '"', "`"):
                state = c
            elif script.startswith("--", i):
                state = "--"
            elif script.startswith("/*", i):
                state = "/*"
                buf.append("/*")
                i += 2
                continue
            buf.append(c)
            i += 1
            continue
        if state in ("'", '"', "`"):
            buf.append(c)
            # Backslash escapes apply in ALL three quote states —
            # ClickHouse's lexer honors \` inside backticks (and
            # quote_ident emits it), so skipping it here would close
            # the identifier early and mis-split on a later ';'.
            if c == "\\" and i + 1 < n:
                buf.append(script[i + 1])
                i += 2
                continue
            if c == state:
                if i + 1 < n and script[i + 1] == state:  # doubled escape
                    buf.append(state)
                    i += 2
                    continue
                state = None
            i += 1
            continue
        if state == "--":
            buf.append(c)
            if c == "\n":
                state = None
            i += 1
            continue
        # state == "/*"
        if script.startswith("*/", i):
            buf.append("*/")
            state = None
            i += 2
            continue
        buf.append(c)
        i += 1
    s = "".join(buf).strip()
    if s:
        stmts.append(s)
    return stmts


def run_script(
    spark: SparkSession,
    script: str | None = None,
    path: str | None = None,
    params: Mapping[str, object] | None = None,
) -> DataFrame | None:
    """Run a multi-statement SQL script; returns the last statement's result."""
    if script is None:
        if path is None:
            raise ValueError("provide script or path")
        with open(path) as f:
            script = f.read()
    rendered = render_params(script, params)
    result: DataFrame | None = None
    for stmt in split_statements(rendered):
        result = spark.sql(stmt)
    return result
