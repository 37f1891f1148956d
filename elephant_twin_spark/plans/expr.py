"""Predicate IR: pushable (index-servable) vs residual predicate split.

Mirrors the reference's serializable expression tree and its pushdown
contract — only ``col == const`` leaves composed with AND/OR are index
servable (reference: core/retrieval/Expression.java:199-227,
core/retrieval/IndexedPigLoader.java:207-216) — but lifts the reference's
string-only restriction: any scalar equality is accepted (keys are stored
as their string cast), and arbitrary Catalyst expressions are allowed as
residual-only predicates (reference rejects them up-front; Catalyst gives
us the full operator set for free, SURVEY §2.9).

The residual filter is ALWAYS applied on rows, exactly as the reference's
FilterRecordReader re-checks every record because block-level pruning is
coarse (core/retrieval/FilterRecordReader.java:58-106). File-level pruning
here is coarse in the same way, so row re-check is load-bearing.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F


class Expr:
    """Base of the predicate tree. Compose with ``&`` and ``|``."""

    def __and__(self, other: "Expr") -> "Expr":
        return And(self, _coerce(other))

    def __or__(self, other: "Expr") -> "Expr":
        return Or(self, _coerce(other))

    def to_column(self, resolver=None) -> Column:
        """Render to a Spark Column. ``resolver(name) -> Column`` maps
        column names; defaults to ``F.col`` — expression indexes pass a
        resolver that expands virtual index names to their defining
        expression."""
        raise NotImplementedError

    def columns(self) -> set:
        """All column names referenced by the tree (best effort for Raw)."""
        raise NotImplementedError


def _coerce(x: Any) -> "Expr":
    if isinstance(x, Expr):
        return x
    if isinstance(x, Column):
        return Raw(x)
    raise TypeError(f"cannot build predicate from {type(x)}")


class Eq(Expr):
    """``column == value`` leaf — the only index-servable leaf.

    ``value`` is compared typed in the residual filter and as ``str(value)``
    against the stringified index key (the reference indexes Text keys only,
    core/indexing/BlockIndexingMapper.java:17-19; we keep string keys in the
    postings table but accept any scalar here).
    """

    def __init__(self, column: str, value: Any):
        if value is None:
            raise ValueError("Eq(col, None) is not a servable predicate; use Raw(col.isNull())")
        self.column = column
        self.value = value

    def to_column(self, resolver=None) -> Column:
        name = (resolver or F.col)(self.column)
        return name == F.lit(self.value)

    def columns(self) -> set:
        return {self.column}

    @property
    def key(self) -> str:
        """Index key representation of the constant."""
        if isinstance(self.value, bool):
            return "true" if self.value else "false"
        return str(self.value)

    def __repr__(self):
        return f"Eq({self.column!r}, {self.value!r})"


class Cmp(Expr):
    """Comparison leaf (``!= > >= < <=``) — residual-only, never pruned on
    (the reference declares these OpTypes but rejects them in pushdown,
    core/retrieval/Expression.java:33-45,205-227; Catalyst evaluates them
    in the residual filter). Column construction is lazy so predicate
    trees can be built/parsed/serialized without an active SparkSession."""

    OPS = {"!=", ">", ">=", "<", "<="}

    def __init__(self, column: str, op: str, value: Any):
        if op not in self.OPS:
            raise ValueError(f"unsupported comparison {op!r}")
        self.column, self.op, self.value = column, op, value

    def to_column(self, resolver=None) -> Column:
        c, v = (resolver or F.col)(self.column), F.lit(self.value)
        return {
            "!=": c != v,
            ">": c > v,
            ">=": c >= v,
            "<": c < v,
            "<=": c <= v,
        }[self.op]

    def columns(self) -> set:
        return {self.column}

    def __repr__(self):
        return f"Cmp({self.column!r}, {self.op!r}, {self.value!r})"


class And(Expr):
    def __init__(self, left: Expr, right: Expr):
        self.left, self.right = _coerce(left), _coerce(right)

    def to_column(self, resolver=None) -> Column:
        return self.left.to_column(resolver) & self.right.to_column(resolver)

    def columns(self) -> set:
        return self.left.columns() | self.right.columns()

    def __repr__(self):
        return f"And({self.left!r}, {self.right!r})"


class Or(Expr):
    def __init__(self, left: Expr, right: Expr):
        self.left, self.right = _coerce(left), _coerce(right)

    def to_column(self, resolver=None) -> Column:
        return self.left.to_column(resolver) | self.right.to_column(resolver)

    def columns(self) -> set:
        return self.left.columns() | self.right.columns()

    def __repr__(self):
        return f"Or({self.left!r}, {self.right!r})"


class Raw(Expr):
    """Arbitrary Spark Column predicate — residual-only, never pruned on."""

    def __init__(self, column: Column):
        self.raw = column

    def to_column(self, resolver=None) -> Column:
        return self.raw

    def columns(self) -> set:
        return set()  # unknown; treated as unpushable

    def __repr__(self):
        return f"Raw({self.raw!r})"


class _ColBuilder:
    """``col('a') == 'x'`` sugar producing Eq leaves (falls back to Raw)."""

    def __init__(self, name: str):
        self._name = name

    def __eq__(self, other: Any) -> Expr:  # type: ignore[override]
        return Eq(self._name, other)

    def __ne__(self, other: Any) -> Expr:  # type: ignore[override]
        return Cmp(self._name, "!=", other)

    def __gt__(self, other):
        return Cmp(self._name, ">", other)

    def __ge__(self, other):
        return Cmp(self._name, ">=", other)

    def __lt__(self, other):
        return Cmp(self._name, "<", other)

    def __le__(self, other):
        return Cmp(self._name, "<=", other)

    def isin(self, *values) -> Expr:
        vals = values[0] if len(values) == 1 and isinstance(values[0], (list, tuple)) else values
        expr: Optional[Expr] = None
        for v in vals:
            leaf = Eq(self._name, v)
            expr = leaf if expr is None else Or(expr, leaf)
        if expr is None:
            raise ValueError("isin() needs at least one value")
        return expr

    __hash__ = None  # type: ignore[assignment]


def col(name: str) -> _ColBuilder:
    return _ColBuilder(name)


def to_json_dict(expr: Expr) -> dict:
    """F3 analog: serializable predicate tree (the reference base64-Java-
    serializes its Expression into the job conf,
    core/retrieval/Expression.java:268-301; we use plain JSON — only
    Eq/And/Or are serializable, matching what the reference can ship)."""
    if isinstance(expr, Eq):
        return {"op": "eq", "column": expr.column, "value": expr.value}
    if isinstance(expr, Cmp):
        return {"op": "cmp", "cmp": expr.op, "column": expr.column, "value": expr.value}
    if isinstance(expr, And):
        return {"op": "and", "left": to_json_dict(expr.left), "right": to_json_dict(expr.right)}
    if isinstance(expr, Or):
        return {"op": "or", "left": to_json_dict(expr.left), "right": to_json_dict(expr.right)}
    raise ValueError(f"not serializable (Raw predicates are driver-only): {expr!r}")


def from_json_dict(d: dict) -> Expr:
    op = d["op"]
    if op == "eq":
        return Eq(d["column"], d["value"])
    if op == "cmp":
        return Cmp(d["column"], d["cmp"], d["value"])
    if op == "and":
        return And(from_json_dict(d["left"]), from_json_dict(d["right"]))
    if op == "or":
        return Or(from_json_dict(d["left"]), from_json_dict(d["right"]))
    raise ValueError(f"unknown op {op!r}")


def parse_predicate(s: str) -> Expr:
    """Parse a SQL-ish predicate string into the IR — the engine-side
    analog of the Pig pushdown negotiation (M4,
    core/retrieval/IndexedPigLoader.java:207-216): ``col = 'v'`` leaves
    (also ``==``) compose with AND/OR and parentheses and are index
    servable; comparison leaves (``!= > >= < <=``) are accepted but
    become residual-only Raw nodes, mirroring the reference's contract of
    pushing only EQ/AND/OR while Catalyst evaluates the rest.
    """
    import re

    # negative numeric literals tokenize as one unit (placed before the
    # generic word pattern); any character the tokenizer cannot claim is
    # a LOUD error — the previous findall silently dropped unmatched
    # characters, so ``value > -5`` became ``value > 5`` and returned
    # wrong rows with no signal (r9 review finding)
    token_re = re.compile(
        r"""\(|\)|,|!=|>=|<=|==|=|>|<|AND\b|OR\b|'[^']*'|"[^"]*"|"""
        r"""-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|[\w.]+""",
        flags=re.IGNORECASE,
    )
    tokens = []
    last = 0
    for m in token_re.finditer(s):
        gap = s[last:m.start()]
        if gap.strip():
            raise ValueError(
                f"unparsable characters {gap.strip()!r} in predicate {s!r}"
            )
        tokens.append(m.group())
        last = m.end()
    if s[last:].strip():
        raise ValueError(
            f"unparsable trailing characters {s[last:].strip()!r} in predicate {s!r}"
        )
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else None

    def take():
        nonlocal pos
        if pos >= len(tokens):
            raise ValueError(f"unexpected end of predicate {s!r}")
        t = tokens[pos]
        pos += 1
        return t

    def unquote(t: str):
        if (t.startswith("'") and t.endswith("'")) or (t.startswith('"') and t.endswith('"')):
            return t[1:-1]
        try:
            return int(t)
        except ValueError:
            try:
                return float(t)
            except ValueError:
                return t

    def atom() -> Expr:
        if peek() == "(":
            take()
            node = or_expr()
            if peek() != ")":
                raise ValueError(f"expected ')' in {s!r}")
            take()
            return node
        column = take()
        op = take()
        if op.upper() == "IN":
            # IN-list sugar: expands to an OR chain of Eq leaves, so every
            # member is index-servable (the reference accepts only EQ
            # leaves; an IN is just their disjunction)
            if take() != "(":
                raise ValueError(f"expected '(' after IN in {s!r}")
            values = []
            while peek() is not None and peek() != ")":
                if peek() == ",":
                    take()
                    continue
                values.append(unquote(take()))
            if peek() != ")":
                raise ValueError(f"unterminated IN list in {s!r}")
            take()
            if not values:
                raise ValueError(f"empty IN list in {s!r}")
            node: Expr = Eq(column, values[0])
            for v in values[1:]:
                node = Or(node, Eq(column, v))
            return node
        if op.upper() == "BETWEEN":
            # inclusive-both-ends sugar: col >= lo AND col <= hi
            lo = unquote(take())
            if peek() is not None and peek().upper() == "AND":
                take()
            hi = unquote(take())
            return And(Cmp(column, ">=", lo), Cmp(column, "<=", hi))
        value = unquote(take())
        if op in ("=", "=="):
            return Eq(column, value)
        if op in Cmp.OPS:
            return Cmp(column, op, value)
        raise ValueError(f"unsupported operator {op!r} in {s!r}")

    def and_expr() -> Expr:
        node = atom()
        while peek() is not None and peek().upper() == "AND":
            take()
            node = And(node, atom())
        return node

    def or_expr() -> Expr:
        node = and_expr()
        while peek() is not None and peek().upper() == "OR":
            take()
            node = Or(node, and_expr())
        return node

    if not tokens:
        raise ValueError("empty predicate")
    out = or_expr()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens {tokens[pos:]} in {s!r}")
    return out


def extract_pushable(
    expr: Expr, indexed_columns: set, range_columns: set = frozenset()
) -> Optional[Expr]:
    """Return the strongest index-servable predicate implied by ``expr``.

    Generalizes the reference's all-or-nothing ``Expression.isSupported``
    (core/retrieval/Expression.java:205-227): instead of rejecting the whole
    tree when any node is unsupported, we extract a *weaker* servable tree
    whose matching file set is a superset of the true one — always safe
    because the full predicate runs as the residual row filter.

    Rules: Eq leaf on an indexed column → itself; AND → push either/both
    sides; OR → both sides must push (a half-pushable OR cannot prune).
    ``range_columns`` (zone-map-indexed) additionally accept ordered Cmp
    leaves (``> >= < <=``; ``!=`` prunes nothing at file granularity) —
    pushdown the reference's EQ-only contract never had.
    """
    if isinstance(expr, Eq):
        return expr if expr.column in (indexed_columns | range_columns) else None
    if isinstance(expr, Cmp):
        if expr.column in range_columns and expr.op != "!=":
            return expr
        return None
    if isinstance(expr, And):
        l = extract_pushable(expr.left, indexed_columns, range_columns)
        r = extract_pushable(expr.right, indexed_columns, range_columns)
        if l is not None and r is not None:
            return And(l, r)
        return l if l is not None else r
    if isinstance(expr, Or):
        l = extract_pushable(expr.left, indexed_columns, range_columns)
        r = extract_pushable(expr.right, indexed_columns, range_columns)
        if l is not None and r is not None:
            return Or(l, r)
        return None
    return None  # Raw / unknown
