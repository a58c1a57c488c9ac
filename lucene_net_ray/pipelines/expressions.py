"""Expression scoring: compile formula strings to vectorized score functions.

Reference: /root/reference/src/Lucene.Net.Expressions/ (6k LoC) compiles
JS-like formulas to ValueSource trees bound to the score and per-doc fields;
/root/reference/src/Lucene.Net.Queries/Function/ evaluates them per doc.
Here a formula compiles (via a whitelisted Python AST) to a numpy expression
over ``score`` and stored doc-values columns, evaluated batch-wise inside
the segment actors through ``function_rescore`` — per-doc trees become one
vectorized kernel, the idiomatic equivalent.

Grammar: numbers, identifiers (``score`` or any stored column), + - * / %
** and unary -, comparisons (yield 0/1 floats), and the functions
log, log1p, log2, sqrt, abs, exp, min, max, pow, where(cond, a, b).
"""

from __future__ import annotations

import ast

import numpy as np

_FUNCS = {
    "log": np.log,
    "log1p": np.log1p,
    "log2": np.log2,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "exp": np.exp,
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
    "where": np.where,
}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.divide,
    ast.Mod: np.mod,
    ast.Pow: np.power,
}

_CMPOPS = {
    ast.Gt: np.greater,
    ast.GtE: np.greater_equal,
    ast.Lt: np.less,
    ast.LtE: np.less_equal,
    ast.Eq: np.equal,
    ast.NotEq: np.not_equal,
}


class ExpressionError(ValueError):
    pass


def expression_fields(expr: str) -> list[str]:
    """Identifiers the expression reads, minus the implicit ``score``."""
    tree = ast.parse(expr, mode="eval")
    names = {
        n.id for n in ast.walk(tree) if isinstance(n, ast.Name) and n.id not in _FUNCS
    }
    return sorted(names - {"score", "scale"})


def scale_fields(expr: str) -> list[str]:
    """Fields wrapped in scale(field, a, b) calls — they need global min/max
    before compilation (ScaleFloatFunction semantics)."""
    tree = ast.parse(expr, mode="eval")
    out = []
    for n in ast.walk(tree):
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Name) and n.func.id == "scale":
            if (
                len(n.args) != 3
                or not isinstance(n.args[0], ast.Name)
                or not all(isinstance(a, ast.Constant) for a in n.args[1:])
            ):
                raise ExpressionError("scale() takes (field, min_const, max_const)")
            out.append(n.args[0].id)
    return sorted(set(out))


def compile_expression(expr: str, scale_stats: dict | None = None):
    """-> fn(scores: np.ndarray, values: dict[str, np.ndarray]) -> np.ndarray.

    ``scale_stats`` maps field -> (global_min, global_max) and enables the
    ScaleFloatFunction analog (reference
    Queries/Function/ValueSources/ScaleFloatFunction.cs): scale(field, a, b)
    maps the field's GLOBAL value range onto [a, b]; a degenerate range
    (min == max) yields a."""
    tree = ast.parse(expr, mode="eval")
    scale_stats = scale_stats or {}

    def ev(node, scores, values):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "scale"
        ):
            field = node.args[0].id
            a, b = float(node.args[1].value), float(node.args[2].value)
            if field not in scale_stats:
                raise ExpressionError(
                    f"scale({field},...) needs global stats — use function_query"
                )
            mn, mx = (float(v) for v in scale_stats[field])
            vals = values[field].astype(np.float64)
            if mx == mn:
                return np.full_like(vals, a)
            return (vals - mn) / (mx - mn) * (b - a) + a
        if isinstance(node, ast.Expression):
            return ev(node.body, scores, values)
        if isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ExpressionError(f"non-numeric constant {node.value!r}")
            return float(node.value)
        if isinstance(node, ast.Name):
            if node.id == "score":
                return scores.astype(np.float64)
            if node.id in values:
                return values[node.id].astype(np.float64)
            raise ExpressionError(f"unknown identifier {node.id!r}")
        if isinstance(node, ast.BinOp):
            op = _BINOPS.get(type(node.op))
            if op is None:
                raise ExpressionError(f"operator {type(node.op).__name__} not allowed")
            return op(ev(node.left, scores, values), ev(node.right, scores, values))
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return -ev(node.operand, scores, values)
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            op = _CMPOPS.get(type(node.ops[0]))
            if op is None:
                raise ExpressionError("comparison not allowed")
            return op(
                ev(node.left, scores, values), ev(node.comparators[0], scores, values)
            ).astype(np.float64)
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                raise ExpressionError(f"function not allowed: {ast.dump(node.func)}")
            args = [ev(a, scores, values) for a in node.args]
            return _FUNCS[node.func.id](*args)
        raise ExpressionError(f"syntax not allowed: {type(node).__name__}")

    # validate eagerly with dummy inputs so bad expressions fail at compile
    fields = expression_fields(expr)
    dummy = {f: np.ones(1) for f in fields}
    ev(tree, np.ones(1, dtype=np.float32), dummy)

    def fn(scores, values):
        return np.asarray(ev(tree, scores, values), dtype=np.float64)

    return fn


def function_query(searcher, expr: str, *, q=None, k: int = 10):
    """FunctionQuery analog (reference Queries/Function/FunctionQuery.cs:
    the ValueSource IS the score): every doc matching ``q`` (default
    MatchAllDocs) is scored by the compiled formula — no BM25 candidate
    window, the expression is the primary ranking. ``score`` inside the
    formula refers to the underlying query's score (1.0 under MatchAll,
    mirroring FunctionQuery's boost-only behavior).

    Doubles as sort-by-ValueSource (Function/FunctionAllGroupHeadsCollector
    style ordering): sorting by an expression is scoring by it.
    """
    from ..query import MatchAllDocsQuery
    from .collectors import field_stats, function_rescore

    q = q if q is not None else MatchAllDocsQuery()
    need_scale = scale_fields(expr)
    stats = field_stats(searcher, need_scale) if need_scale else None
    fn = compile_expression(expr, scale_stats=stats)
    # window == k: the per-segment partial evaluates the formula over ALL
    # matching docs and returns its top-k — exact, not an approximation.
    return function_rescore(
        searcher, q, fn, fields=expression_fields(expr), k=k, window=k
    )


def expression_rescore(searcher, q, expr: str, *, k: int = 10, window: int = 100):
    """CustomScoreQuery-with-expression analog: BM25 candidates rescored by
    the compiled formula inside the segment actors."""
    from .collectors import function_rescore

    fn = compile_expression(expr)
    return function_rescore(
        searcher, q, fn, fields=expression_fields(expr), k=k, window=window
    )
