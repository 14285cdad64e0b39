"""Optimized-plan equivalence checker for exprification rewrites.

The strongest cheap proof that a Column-builder -> F.expr/selectExpr
rewrite is a no-op: Catalyst's optimizedPlan strings for the old and
new builds match modulo expression ids (the JVM sees the same tree).
Used by the r20/r21 py4j-chatter reworks.

Usage (library):
    from tools.plan_equiv import normalized_plan, assert_equiv
"""

from __future__ import annotations

import re

_ID = re.compile(r"#\d+")
_PLANID = re.compile(r"plan_id=\d+")
_RDD = re.compile(r"MapPartitionsRDD\[\d+\]")
# bound lambda variables are alpha-renamable: python-built HOF lambdas
# name them x_1/y_2..., SQL-parsed ones keep the source names — same
# tree either way once the names are canonicalized (ids are already
# normalized, so positional identity is preserved by the body shape)
_LAMBDA_VAR = re.compile(r"lambda [A-Za-z_][A-Za-z0-9_]*#x")
# CSE-synthesized aliases carry a global counter — name only, not shape
_CSE = re.compile(r"_common_expr_\d+")
# SQL-registered alias names of the SAME expression class print
# differently from the Column-API name (first_value -> First,
# last_value -> Last, power -> Pow): canonicalize the rendering
_FN_ALIASES = (
    (re.compile(r"\bfirst_value\("), "first("),
    (re.compile(r"\blast_value\("), "last("),
    (re.compile(r"\bPOWER\("), "pow("),
)


def normalized_plan(df) -> str:
    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = _ID.sub("#x", s)
    s = _PLANID.sub("plan_id=x", s)
    s = _RDD.sub("MapPartitionsRDD[x]", s)
    s = _CSE.sub("_common_expr_x", s)
    for pat, repl in _FN_ALIASES:
        s = pat.sub(repl, s)
    return _LAMBDA_VAR.sub("lambda v#x", s)


def assert_equiv(old_df, new_df, label: str = "") -> None:
    a, b = normalized_plan(old_df), normalized_plan(new_df)
    if a != b:
        import difflib

        diff = "\n".join(
            difflib.unified_diff(a.splitlines(), b.splitlines(), lineterm="")
        )
        raise AssertionError(f"plan mismatch {label}:\n{diff[:8000]}")
