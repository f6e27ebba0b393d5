"""Graphviz visualization of plan trees (reference src/Dot.hs + TreeParser.y).

The reference re-parses the plan with a permissive grammar keeping arg
lists as raw strings; here the structured parse tree is rendered directly:
relational operators as nodes, argument lists as blue boxes (Dot.hs:44-61).
"""

from __future__ import annotations

from typing import List

from .fe import plan_parser as P


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _expr_text(e: P.Expr) -> str:
    inner = e.expr
    if isinstance(inner, P.Ref):
        return ".".join(inner.name)
    if isinstance(inner, P.Literal):
        return f'{inner.tspec.tname} "{inner.rep}"'
    if isinstance(inner, P.Call):
        return ".".join(inner.fname) + "(...)"
    if isinstance(inner, P.Cast):
        return f"{inner.tspec.tname}[...]"
    if isinstance(inner, P.Infix):
        return f"{_expr_text(inner.left)} {inner.op} {_expr_text(inner.right)}"
    return type(inner).__name__


def to_dot_string(rel: P.Rel) -> str:
    lines: List[str] = ["digraph plan {", "  node [shape=box];"]
    counter = [0]

    def fresh() -> int:
        counter[0] += 1
        return counter[0]

    def walk(r: P.Rel) -> int:
        me = fresh()
        if isinstance(r, P.Leaf):
            lines.append(
                f'  n{me} [label="table {_esc(".".join(r.source))}"];')
            args = fresh()
            cols = ", ".join(_expr_text(c) for c in r.columns)
            lines.append(
                f'  n{args} [label="{_esc(cols)}", color=blue,'
                f' fontcolor=blue];')
            lines.append(f"  n{me} -> n{args};")
            return me
        lines.append(f'  n{me} [label="{_esc(r.relop)}"];')
        for ch in r.children:
            c = walk(ch)
            lines.append(f"  n{me} -> n{c};")
        for arglist in r.arg_lists:
            a = fresh()
            txt = ", ".join(_expr_text(x) for x in arglist) or "(empty)"
            lines.append(
                f'  n{a} [label="{_esc(txt)}", color=blue, fontcolor=blue];')
            lines.append(f"  n{me} -> n{a};")
        return me

    walk(rel)
    lines.append("}")
    return "\n".join(lines)
