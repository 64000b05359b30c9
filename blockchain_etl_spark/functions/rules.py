"""Rule-DSL → Spark SQL expression translator.

The reference vendors a boolean-expression DSL (rule_engine v3.3.2 —
grammar at /root/reference/rule_engine/parser.py:178-500: arithmetic,
comparisons, fuzzy regex ``=~``/``!~``, membership ``in``, ternary,
and/or/not, null-safe attribute access) and evaluates rules per item in
Python (`Rule.filter`, /root/reference/blockchainetl/alert/rule.py:25-34).

That is a per-row Python interpreter — the exact thing the north rule
bans. The Spark-first translation: compile the rule text ONCE into a
Spark SQL expression and let Catalyst codegen it. The DSL is close to a
SQL WHERE clause; this module is a small recursive-descent parser over
the shared surface (the alert rules in the reference's configs use
exactly these constructs), emitting `F.expr`-compatible SQL.

DSL → SQL mapping:
  and/or/not            → AND / OR / NOT
  == / != / < etc.      → = / <> / < ...
  x =~ 'pat'            → x RLIKE 'pat'        (fuzzy match)
  x !~ 'pat'            → NOT (x RLIKE 'pat')
  x in ['a','b']        → x IN ('a','b')
  c ? a : b             → CASE WHEN c THEN a ELSE b END
  null / true / false   → NULL / TRUE / FALSE
  wei2eth(v)            → v / 1e18             (rule_udf.py:7-20)
  toDateTime(st)        → from_unixtime(st)    (rule_udf.py:23-27)
  safe_int(x)           → try_cast(x AS BIGINT) (rule_udf.py:30-40)
  safe_round(x, n)      → round(x, n)          (rule_udf.py:43-49)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<name>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<op>=~|!~|==|!=|<=|>=|&&|\|\||[-+*/%<>()\[\],?:])
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "true", "false", "null"}

def _label_of(args: list[str]) -> str:
    """≙ rule UDF ``label_of`` (rule_udf.py:7-18): address → label from the
    labels dim, '' when absent. The reference does a per-row DB lookup;
    Spark-first this is a BROADCAST-joined column — pre-join the dim with
    ``operators.alerts.with_labels(df, labels, cols=[...])`` which adds
    ``<col>_label``, and the rule references that column. Compiling to the
    joined column keeps the rule a pure Catalyst expression (no per-row
    lookup anywhere)."""
    col = args[0].strip("()")
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", col):
        raise RuleSyntaxError(
            f"label_of() takes a column reference, got {args[0]!r}"
        )
    return f"coalesce({col}_label, '')"


def _tag_value_usd(args: list[str]) -> str:
    """≙ rule UDF ``tag_value_usd`` (rule_udf.py:21-33): threshold ladder →
    'Level N risk control alert' (highest threshold exceeded = level 1),
    '' otherwise — compiled to a CASE chain over the sorted literal
    thresholds."""
    value, raw = args[0], args[1:]
    try:
        ts = sorted((float(t) for t in raw), reverse=True)
    except ValueError as e:
        raise RuleSyntaxError(f"tag_value_usd thresholds must be literals: {e}")
    whens = " ".join(
        f"WHEN {value} > {t:g} THEN 'Level {i + 1} risk control alert'"
        for i, t in enumerate(ts)
    )
    return f"CASE {whens} ELSE '' END"


_FUNC_MAP = {
    "wei2eth": lambda args: f"({args[0]}) / 1e18",
    "toDateTime": lambda args: f"from_unixtime({args[0]})",
    "safe_int": lambda args: f"try_cast({args[0]} AS BIGINT)",
    "safe_round": lambda args: f"round({', '.join(args)})",
    "abs": lambda args: f"abs({args[0]})",
    "lower": lambda args: f"lower({args[0]})",
    "upper": lambda args: f"upper({args[0]})",
    "length": lambda args: f"length({args[0]})",
    "label_of": _label_of,
    "tag_value_usd": _tag_value_usd,
}


class RuleSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise RuleSyntaxError(f"bad token at {text[i:i+20]!r}")
        i = m.end()
        if m.lastgroup != "ws":
            out.append(m.group())
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def pop(self, expect: str | None = None) -> str:
        t = self.peek()
        if t is None or (expect is not None and t != expect):
            raise RuleSyntaxError(f"expected {expect!r}, got {t!r}")
        self.i += 1
        return t

    # ternary: or_expr ('?' expr ':' expr)?
    def expr(self) -> str:
        cond = self.or_expr()
        if self.peek() == "?":
            self.pop()
            a = self.expr()
            self.pop(":")
            b = self.expr()
            return f"CASE WHEN {cond} THEN {a} ELSE {b} END"
        return cond

    def or_expr(self) -> str:
        left = self.and_expr()
        while self.peek() in ("or", "||"):
            self.pop()
            left = f"({left} OR {self.and_expr()})"
        return left

    def and_expr(self) -> str:
        left = self.not_expr()
        while self.peek() in ("and", "&&"):
            self.pop()
            left = f"({left} AND {self.not_expr()})"
        return left

    def not_expr(self) -> str:
        if self.peek() == "not":
            self.pop()
            return f"(NOT {self.not_expr()})"
        return self.comparison()

    def comparison(self) -> str:
        left = self.additive()
        t = self.peek()
        if t in ("==", "!=", "<", ">", "<=", ">="):
            self.pop()
            op = {"==": "=", "!=": "<>"}.get(t, t)
            right = self.additive()
            return f"({left} {op} {right})"
        if t == "=~":
            self.pop()
            return f"({left} RLIKE {self.additive()})"
        if t == "!~":
            self.pop()
            return f"(NOT ({left} RLIKE {self.additive()}))"
        if t == "in":
            self.pop()
            items = self.list_literal()
            return f"({left} IN ({', '.join(items)}))"
        return left

    def additive(self) -> str:
        left = self.multiplicative()
        while self.peek() in ("+", "-"):
            op = self.pop()
            left = f"({left} {op} {self.multiplicative()})"
        return left

    def multiplicative(self) -> str:
        left = self.unary()
        while self.peek() in ("*", "/", "%"):
            op = self.pop()
            left = f"({left} {op} {self.unary()})"
        return left

    def unary(self) -> str:
        if self.peek() == "-":
            self.pop()
            return f"(- {self.unary()})"
        return self.primary()

    def list_literal(self) -> list[str]:
        self.pop("[")
        items = []
        while self.peek() != "]":
            items.append(self.expr())
            if self.peek() == ",":
                self.pop()
        self.pop("]")
        return items

    def primary(self) -> str:
        t = self.peek()
        if t is None:
            raise RuleSyntaxError("unexpected end of rule")
        if t == "(":
            self.pop()
            inner = self.expr()
            self.pop(")")
            return f"({inner})"
        if re.fullmatch(r"\d+\.\d+|\d+", t):
            return self.pop()
        if t[0] in "'\"":
            self.pop()
            body = t[1:-1].replace("'", "\\'")
            return f"'{body}'"
        if t in ("true", "false", "null"):
            self.pop()
            return t.upper()
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", t):
            self.pop()
            if self.peek() == "(":  # function call
                self.pop()
                args = []
                while self.peek() != ")":
                    args.append(self.expr())
                    if self.peek() == ",":
                        self.pop()
                self.pop(")")
                fn = _FUNC_MAP.get(t)
                if fn is None:
                    raise RuleSyntaxError(f"unknown function {t!r}")
                return fn(args)
            return t  # column reference (dots → struct field access, as in SQL)
        raise RuleSyntaxError(f"unexpected token {t!r}")


def rule_to_sql(rule_text: str) -> str:
    """Compile a rule to a SQL boolean expression string."""
    p = _Parser(_tokenize(rule_text))
    out = p.expr()
    if p.peek() is not None:
        raise RuleSyntaxError(f"trailing tokens: {p.toks[p.i:]}")
    return out


def rule_filter(rule_text: str) -> Column:
    """Compile a rule to a Spark Column predicate (Catalyst-codegen'd —
    replaces the reference's per-item Python eval)."""
    return F.expr(rule_to_sql(rule_text))
