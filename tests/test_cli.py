"""Reference CLI UX contract (MainFuns.hs:34-75,140; SURVEY Appendix A):
``mplan2vdl [FILE|stdin] -b … -t … -s … --dictionary …`` with no
subcommand defaults to compile; ``genplans META DIR`` infers the four
metadata files from one directory (genplans:12-33 + tpchrun:2-4)."""

import io
import os
import sys

TPCH10 = "/root/reference/tests/tpch10noorder"

META = ["-b", os.path.join(TPCH10, "bounds.csv"),
        "-t", os.path.join(TPCH10, "storage.csv"),
        "-s", os.path.join(TPCH10, "schema.msqldump"),
        "--dictionary", os.path.join(TPCH10, "dictionary.csv")]
Q6 = os.path.join(TPCH10, "06.sql.mplan")


def _main(argv, capsys):
    from mplan2vdl_tpu.cli import main

    main(argv)
    return capsys.readouterr().out


def test_no_subcommand_defaults_to_compile(capsys):
    out = _main([Q6] + META, capsys)
    lines = [ln for ln in out.strip().splitlines() if ln]
    assert len(lines) == 42  # README.md:37-53 Q6 statement count
    assert lines[-1].startswith("42,MaterializeCompact")


def test_no_subcommand_reads_stdin(capsys, monkeypatch):
    monkeypatch.setattr(sys, "stdin", io.StringIO(open(Q6).read()))
    out = _main(META, capsys)
    assert out.strip().splitlines()[-1].startswith("42,MaterializeCompact")


def test_explicit_subcommand_unchanged(capsys):
    out = _main(["compile", Q6] + META, capsys)
    assert out.strip().splitlines()[-1].startswith("42,MaterializeCompact")


def test_genplans_meta_dir_form(capsys):
    out = _main(["genplans", TPCH10, TPCH10], capsys)
    assert "SUCCESS/TOTAL: 22/22" in out


def test_genplans_flag_form_still_22(capsys):
    out = _main(["genplans", TPCH10] + META, capsys)
    assert "SUCCESS/TOTAL: 22/22" in out


def test_q22_compiles_without_cphone_dictionary(capsys):
    """VERDICT r2 missing #3: the committed tpch10noorder dictionary has
    no customer.c_phone entries; a column-level dictionary miss must
    degrade to never-match (like a literal miss), not VirError."""
    q22 = os.path.join(TPCH10, "22.sql.mplan")
    out = _main([q22] + META, capsys)
    assert "MaterializeCompact" in out


def test_quirks_flag_traces_dictionary_lookups(capsys):
    """--quirks reproduces the reference's dictionary-lookup stderr
    trace (Mplan.hs:44 prints ",,<string>,<code>" per char literal);
    stdout stays byte-identical, and the default path emits no trace."""
    q3 = os.path.join(TPCH10, "03.sql.mplan")
    from mplan2vdl_tpu.cli import main

    main([q3] + META + ["-p", "--quirks"])
    cap = capsys.readouterr()
    assert ",,BUILDING,16" in cap.err
    main([q3] + META + ["-p"])
    plain = capsys.readouterr()
    assert ",," not in plain.err
    assert plain.out == cap.out


def test_no_quirks_drops_conformance_rewrites(capsys):
    """--no-quirks compiles without the reference's hardcoded >32000
    sparse-domain shuffle / agg-strategy rewrites (Vlite.hs:1076-1079,
    1173-1194): the program still materializes, and the Q18 orderkey
    group-by (domain > 32000) loses its shuffle stage."""
    q18 = os.path.join(TPCH10, "18.sql.mplan")
    from mplan2vdl_tpu.cli import main

    main([q18] + META + ["-p"])
    with_quirks = capsys.readouterr().out
    main([q18] + META + ["-p", "--no-quirks"])
    without = capsys.readouterr().out
    assert "MaterializeCompact" in without
    assert len(without.splitlines()) < len(with_quirks.splitlines())
