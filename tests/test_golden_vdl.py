"""Golden VDL conformance (VERDICT r1 missing #2/#3, weak #7).

Byte-diffs the compiler's VDL output for every tpch10noorder query against
the committed goldens in tests/golden_vdl/, pins the Q6 statement count to
the reference README's documented 42 (/root/reference/README.md:37-53),
and pins the genplans SUCCESS/TOTAL at 22/22 on the committed metadata
snapshot (r3: a column-level dictionary miss — Q22's absent c_phone
entries — degrades to a never-match sentinel like a literal miss, the
way the reference stays compilable by deferring strings to the backend
heap, Vdl.hs:244-247).

Regenerate goldens intentionally with tools/gen_golden_vdl.py.
"""
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
META = "/root/reference/tests/tpch10noorder"
GOLD = os.path.join(REPO, "tests", "golden_vdl")

QUERIES = [f"{i:02d}" for i in range(1, 23)]


def _compile(name, extra=()):
    from mplan2vdl_tpu.cli import compile_to_text

    return compile_to_text(
        os.path.join(META, f"{name}.sql.mplan"),
        bounds=f"{META}/bounds.csv", storage=f"{META}/storage.csv",
        schema=f"{META}/schema.msqldump",
        dictionary=f"{META}/dictionary.csv", extra=extra)


@pytest.mark.parametrize("name", QUERIES)
def test_golden_byte_exact(name):
    with open(os.path.join(GOLD, f"{name}.vdl")) as f:
        golden = f.read().rstrip("\n")
    assert _compile(name) == golden, (
        f"VDL drift for {name}; if intentional, regenerate with "
        "tools/gen_golden_vdl.py")


def test_q6_reference_statement_count():
    # /root/reference/README.md:37-53 documents Q6 at 42 statements with
    # the same final three lines
    txt = _compile("06")
    lines = txt.splitlines()
    assert len(lines) == 42
    assert lines[-3] == "40,FoldSum,val,Id 34,val,Id 39,val"
    assert lines[-2] == "41,Project,revenue,Id 40,val"
    assert lines[-1] == "42,MaterializeCompact,Id 41"


def test_q6_id_arg_format():
    # args print through the reference Id newtype's Show ("Id 7"); the
    # statement's own id prints bare (Vdl.hs printLine :455-477)
    txt = _compile("06")
    assert "2,Project,val,Id 1,l_quantity" in txt


def test_genplans_success_total():
    """Pin 22/22 on the committed snapshot (reference harness reported
    SUCCESS/TOTAL the same way, /root/reference/genplans:24-33; the
    reference itself managed <=17)."""
    ok, fails = 0, []
    for i in range(1, 23):
        name = f"{i:02d}"
        try:
            _compile(name)
            ok += 1
        except Exception as e:
            fails.append((name, type(e).__name__))
    assert ok == 22, f"genplans success drift: {ok}/22, failures: {fails}"


def test_push_joins_variant_compiles():
    # the -p rewrite path must keep producing valid numbered output
    txt = _compile("06", extra=("-p",))
    assert txt.splitlines()[-1].split(",")[1] == "MaterializeCompact"
