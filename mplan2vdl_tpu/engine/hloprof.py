"""Per-op HBM traffic attribution from optimized HLO (SURVEY §5: replace
the reference's Driver-side timing JSON with structured on-device
accounting).

``compiled.cost_analysis()`` gives one number for the whole program; this
module parses the optimized HLO's ENTRY computation instead and charges
each top-level instruction its operand + output buffer bytes — the
where-do-the-bytes-go table that directs kernel work (e.g. proving a
query is sort- vs gather-bound before writing a kernel).

Estimates, not measurements: XLA may keep a buffer in registers/VMEM
across consumers, and fusions re-read operands at most once.  Still
faithful enough to rank: the dominant instructions of Q3/Q5 match the
measured kernel wins (gathers), and Q1's reduce-window chains match its
VPU-bound profile.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

_DT_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}
_SHAPE_RE = re.compile(r"(pred|[suf]\d+|bf16)\[([\d,]*)\]")
_INSTR_RE = re.compile(r"^\s+(?:ROOT\s+)?%([\w.\-]+)\s+=\s+(.*)$")
_OPND_RE = re.compile(r"%([\w.\-]+)")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _shape_bytes(text: str) -> int:
    """Total bytes of every array shape in ``text`` (tuples sum)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DT_BYTES.get(dt, 4)
    return total


def _opcode(rhs: str) -> str:
    """The HLO opcode: first identifier after the shape(s)."""
    depth, i = 0, 0
    while i < len(rhs):  # skip a leading tuple shape "(s64[..], ...)"
        ch = rhs[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch == " ":
            break
        i += 1
    m = re.match(r"\s*([\w\-]+)", rhs[i:])
    return m.group(1) if m else "?"


def traffic_report(hlo_text: str, top: int = 12) -> dict:
    """Parse optimized HLO -> per-instruction and per-opcode traffic.

    Returns {"total_bytes", "by_opcode": {op: bytes},
    "top_ops": [(label, bytes, out_shape)]}."""
    entry, sizes, rows = False, {}, []
    for ln in hlo_text.splitlines():
        if ln.startswith("ENTRY"):
            entry = True
            continue
        if entry and ln.startswith("}"):
            break
        if not entry:
            continue
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, rhs = m.groups()
        out_b = _shape_bytes(rhs.split(" ", 1)[0] if rhs.startswith("(")
                             else rhs.split("{", 1)[0].split(" ")[0])
        sizes[name] = out_b
        op = _opcode(rhs)
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast"):
            continue
        in_b = 0
        paren = rhs.find("(", rhs.find(op))
        if paren >= 0:
            depth, j = 0, paren
            while j < len(rhs):
                if rhs[j] == "(":
                    depth += 1
                elif rhs[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            for opnd in _OPND_RE.findall(rhs[paren:j]):
                in_b += sizes.get(opnd, 0)
        label = op
        nm = _OPNAME_RE.search(ln)
        if nm and op in ("fusion", "custom-call"):
            tail = nm.group(1).split("/")
            label = f"{op}:{tail[-1][:40]}" if tail else op
        rows.append((label, op, in_b + out_b, out_b))

    by_opcode: Dict[str, int] = {}
    for _, op, b, _ in rows:
        by_opcode[op] = by_opcode.get(op, 0) + b
    rows.sort(key=lambda r: -r[2])
    return {
        "total_bytes": sum(b for _, _, b, _ in rows),
        "by_opcode": dict(sorted(by_opcode.items(), key=lambda kv: -kv[1])),
        "top_ops": [(label, b, ob) for label, _, b, ob in rows[:top]],
    }
