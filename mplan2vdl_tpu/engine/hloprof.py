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


# --- VPU compute roofline -------------------------------------------------
# Elementwise-op weights (ops per output element).  int64 on TPU is
# emulated in 32-bit lanes: ~2x for add/logic, ~3x for multiply.
_EW_CHEAP = {
    "add", "subtract", "and", "or", "xor", "not", "negate", "abs",
    "minimum", "maximum", "compare", "select", "convert", "sign",
    "shift-left", "shift-right-logical", "shift-right-arithmetic",
    "clamp", "is-finite", "ceil", "floor", "round-nearest-afz", "copy",
    "iota", "broadcast",
}
_EW_COST = {"multiply": 2, "divide": 8, "remainder": 8, "power": 10,
            "exponential": 4, "log": 4, "rsqrt": 4, "sqrt": 4, "tanh": 6}
# VPU elementwise throughput (32-bit ops/s): sublanes x lanes x ALUs x clock
# (8 x 128 x 4 x ~0.94 GHz on v5e) — the denominator that makes
# "VPU-bound" a checkable claim instead of an assertion.
VPU_OPS = {"TPU v5 lite": 3.85e12, "TPU v5": 7.4e12, "TPU v4": 3.7e12,
           "TPU v6 lite": 7.4e12}

_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->")


def _shape_elems(text: str) -> int:
    total = 0
    for _, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n
    return total


def vpu_report(hlo_text: str) -> dict:
    """Estimate the VPU elementwise work the optimized HLO schedules.

    Walks EVERY computation (fusion bodies included — that is where the
    elementwise ops live after fusion) and charges each elementwise
    instruction ``output_elements x weight``; ``reduce`` charges its
    input elements.  64-bit types double the weight (TPU emulates i64 in
    32-bit lanes).  Comparator/scalar-reduce bodies contribute their
    scalar cost once (negligible) rather than per-invocation — this is a
    LOWER bound for sort-heavy programs, which should use the sort
    roofline instead.  Returns {"vpu_ops", "ew_elems", "opaque_elems"}
    where opaque = gather/scatter/sort/custom-call output elements the
    VPU model does not cover."""
    vpu_ops = 0
    ew_elems = 0
    opaque = 0
    sizes_e: Dict[str, int] = {}
    for ln in hlo_text.splitlines():
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, rhs = m.groups()
        shape_txt = (rhs.split(" ", 1)[0] if rhs.startswith("(")
                     else rhs.split("{", 1)[0].split(" ")[0])
        out_e = _shape_elems(shape_txt)
        sizes_e[name] = out_e
        op = _opcode(rhs)
        wide = 2 if re.match(r"^\(?[suf]64", shape_txt) else 1
        if op in _EW_CHEAP or op in _EW_COST:
            vpu_ops += out_e * _EW_COST.get(op, 1) * wide
            ew_elems += out_e
        elif op == "reduce":
            # charge input elements once through the combiner
            paren = rhs.find("(", rhs.find(op))
            in_e = sum(sizes_e.get(o, 0)
                       for o in _OPND_RE.findall(
                           rhs[paren:rhs.find(")", paren)+1] if paren >= 0
                           else ""))
            vpu_ops += in_e * wide
            ew_elems += in_e
        elif op in ("gather", "scatter", "sort", "custom-call",
                    "dynamic-slice", "dynamic-update-slice"):
            opaque += out_e
    return {"vpu_ops": int(vpu_ops), "ew_elems": int(ew_elems),
            "opaque_elems": int(opaque)}


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
