"""Command-line driver mirroring the reference UX (MainFuns.hs:34-75;
SURVEY.md Appendix A), extended with execution subcommands.

Compile a plan to VDL text (the reference's only mode)::

    python -m mplan2vdl_tpu.cli compile QUERY.mplan \
        -b bounds.csv -t storage.csv -s schema.msqldump --dictionary d.csv \
        [-p/--push-joins] [-c/--cleanup] [--metadata] \
        [--aggserial|--agghierarchical -g N|--aggshuffle] \
        [--sparsity X] [--goffset N] [--use-cross-product] [--dot]

Run a plan on the TPU engine against a generated dataset::

    python -m mplan2vdl_tpu run QUERY.mplan --sf 0.01 [--cpu] [--decode]

Run distributed over an N-device mesh (virtual host devices under --cpu)::

    python -m mplan2vdl_tpu run QUERY.mplan --cpu --devices 8

Batch-compile a directory (the reference's ``genplans``)::

    python -m mplan2vdl_tpu.cli genplans DIR -b ... -t ... -s ... --dictionary ...
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def _add_meta_args(p):
    p.add_argument("-b", "--bounds", required=True)
    p.add_argument("-t", "--storage", required=True)
    p.add_argument("-s", "--schema", required=True)
    p.add_argument("--dictionary", required=True)


def _add_flag_args(p):
    p.add_argument("-p", "--push-joins", action="store_true",
                   help="apply pushFKJoins/fuseSelects rewrites")
    p.add_argument("-c", "--cleanup", action="store_true", default=True)
    p.add_argument("--no-cleanup", dest="cleanup", action="store_false")
    p.add_argument("--metadata", action="store_true")
    p.add_argument("--aggserial", action="store_true")
    p.add_argument("--agghierarchical", action="store_true")
    p.add_argument("--aggshuffle", action="store_true")
    p.add_argument("-g", "--grainsize", type=int, default=1)
    p.add_argument("--sparsity", type=float, default=1.0)
    p.add_argument("--goffset", type=int, default=0)
    p.add_argument("--use-cross-product", action="store_true")
    p.add_argument("--vdlformat", action="store_true", default=True)
    p.add_argument("--vliteformat", dest="vdlformat", action="store_false",
                   help="one-value-per-vector output labels")
    p.add_argument("--dot", action="store_true",
                   help="emit a graphviz digraph of the plan tree")
    p.add_argument("--quirks", action="store_true", default=None,
                   help="reproduce the reference's behavioral quirks "
                        "byte-for-byte: the dictionary-lookup stderr "
                        "trace (Mplan.hs:44) on top of the always-on "
                        "conformance rewrites")
    p.add_argument("--no-quirks", dest="quirks", action="store_false",
                   help="drop the reference quirk set (conformance-agg "
                        "rewrites incl. the hardcoded >32000 shuffle, "
                        "Vlite.hs:1076-1079) from the emitted VDL")


def _config_from_args(args):
    from .catalog import (AGG_HIERARCHICAL, AGG_SERIAL, AGG_SHUFFLE,
                          load_config)

    strat = AGG_SERIAL
    if args.agghierarchical:
        strat = AGG_HIERARCHICAL
    elif args.aggshuffle:
        strat = AGG_SHUFFLE
    g = args.grainsize
    assert g >= 1 and (g & (g - 1)) == 0, "grainsize must be a power of two"
    return load_config(
        args.bounds, args.storage, args.schema, args.dictionary,
        cross_product=args.use_cross_product,
        sparsity_threshold=args.sparsity,
        show_metadata=args.metadata,
        gboffset=args.goffset,
        agg_strategy=strat,
        grainsize_log=g.bit_length() - 1,
        # the CLI compile path produces the reference-conformance VDL
        # artifact: apply the aggregation-strategy rewrites (the engine's
        # `run` path builds its own Config and keeps them off).
        # --no-quirks drops them; --quirks additionally turns on the
        # dictionary-lookup stderr trace (the full reference quirk set)
        conformance_agg=args.quirks is not False,
        quirk_trace_dict=args.quirks is True,
    )


def _compile_to_vexps(text, cfg, push_joins, cleanup):
    from . import mplan, passes, vir
    from .fe import lexer, plan_parser

    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.mplan_from_parse_tree(rel, cfg)
    if push_joins:
        m = mplan.fuse_selects(mplan.push_fk_joins(m))
    vexps = vir.vexps_from_mplan(m, cfg)
    if cleanup:
        vexps = passes.reference_passes(vexps)
    return vexps


def compile_to_text(plan_path, bounds, storage, schema, dictionary,
                    extra=()):
    """Programmatic `compile` (golden-VDL generation and tests): returns
    the VDL text for a plan file against a metadata snapshot."""
    ap = argparse.ArgumentParser()
    ap.add_argument("plan")
    _add_meta_args(ap)
    _add_flag_args(ap)
    args = ap.parse_args([plan_path, "-b", bounds, "-t", storage,
                          "-s", schema, "--dictionary", dictionary,
                          *extra])
    cfg = _config_from_args(args)
    from .vdl_emit import emit_vdl, emit_vlite

    vexps = _compile_to_vexps(open(plan_path).read(), cfg, args.push_joins,
                              args.cleanup)
    if args.vdlformat:
        return emit_vdl(vexps, cfg, show_metadata=args.metadata)
    return emit_vlite(vexps, cfg)


def cmd_compile(args):
    cfg = _config_from_args(args)
    text = open(args.plan).read() if args.plan != "-" else sys.stdin.read()
    if args.dot:
        # permissive re-parse: --dot renders plans the strict grammar or
        # codegen rejects (reference MainFuns.hs:165-170, TreeParser.y)
        from .fe import lexer
        from .dot import plan_text_to_dot

        print(plan_text_to_dot(lexer.strip_plan_comments(text)))
        return
    from .vdl_emit import emit_vdl, emit_vlite

    vexps = _compile_to_vexps(text, cfg, args.push_joins, args.cleanup)
    if getattr(args, "vdlformat", True):
        print(emit_vdl(vexps, cfg, show_metadata=args.metadata))
    else:
        print(emit_vlite(vexps, cfg))


def cmd_genplans(args):
    """Batch compile; reports SUCCESS/TOTAL (reference genplans:12-33)."""
    cfg = _config_from_args(args)
    files = sorted(glob.glob(os.path.join(args.dir, "*plan")))
    ok = 0
    for f in files:
        try:
            vexps = _compile_to_vexps(open(f).read(), cfg, args.push_joins,
                                      args.cleanup)
            print(f"{os.path.basename(f)}: OK ({len(vexps)} outputs)")
            ok += 1
        except Exception as e:
            print(f"{os.path.basename(f)}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")
    print(f"SUCCESS/TOTAL: {ok}/{len(files)}")


def cmd_explain(args):
    cfg = _config_from_args(args)
    text = open(args.plan).read() if args.plan != "-" else sys.stdin.read()
    from . import passes
    from .explain import explain_vexps

    vexps = _compile_to_vexps(text, cfg, args.push_joins, False)
    if args.cleanup:
        vexps = passes.engine_passes(vexps)
    print(explain_vexps(vexps))


def cmd_run(args):
    n_dev = getattr(args, "devices", 0) or 0
    if args.cpu:
        if n_dev > 1 and "xla_force_host_platform_device_count" not in \
                os.environ.get("XLA_FLAGS", ""):
            # must land before jax initializes its backends
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n_dev}")
        import jax

        jax.config.update("jax_platforms", "cpu")
    from .engine import datagen
    from .engine.lower import CompiledQuery, plan_to_vexps

    if getattr(args, "tbl", None):
        from .engine import tblingest

        store = tblingest.from_tbl(args.tbl)
    else:
        store = datagen.generate(sf=args.sf, seed=args.seed,
                                 legacy_fk_names=args.legacy_fk_names)
    cfg = store.make_catalog(cross_product=args.use_cross_product)
    text = open(args.plan).read() if args.plan != "-" else sys.stdin.read()
    vexps = plan_to_vexps(text, cfg)

    runner, cq = None, None
    if n_dev > 1:
        import jax
        from .parallel import auto, dist

        devs = jax.devices()
        if len(devs) < n_dev:
            sys.exit(f"--devices {n_dev}: only {len(devs)} device(s) "
                     "available (use --cpu for a virtual mesh)")
        try:
            dq = auto.distribute(cfg, store, vexps,
                                 dist.make_mesh(devs[:n_dev]))
            runner = dq.result
            if getattr(args, "explain_dist", False):
                for ln in dq.describe().splitlines():
                    print(f"# {ln}", file=sys.stderr)
        except auto.NotDistributable as e:
            print(f"# not distributable ({e}); running single-chip",
                  file=sys.stderr)
    if runner is None:
        cq = CompiledQuery(cfg, vexps, store)
        runner = cq
    if getattr(args, "profile", None):
        import jax

        with jax.profiler.trace(args.profile):
            res = runner()
        print(f"# profiler trace written to {args.profile}", file=sys.stderr)
    else:
        res = runner()
    if getattr(args, "roofline", False):
        if cq is None:
            print("# --roofline accounts the single-chip program; "
                  "ignored under --devices", file=sys.stderr)
        else:
            rep = cq.cost_report(hbm_gbps=args.hbm_gbps, per_op=True)
            per_op = rep.pop("per_op", None)
            for k, v in rep.items():
                print(f"# {k}: {v}", file=sys.stderr)
            if per_op:
                print("# per-op traffic (estimated operand+output bytes):",
                      file=sys.stderr)
                for op, b in list(per_op["by_opcode"].items())[:8]:
                    print(f"#   {op:<28} {b/1e6:10.2f} MB", file=sys.stderr)
                print("# top instructions:", file=sys.stderr)
                for label, b, ob in per_op["top_ops"][:8]:
                    print(f"#   {label:<44} {b/1e6:10.2f} MB",
                          file=sys.stderr)
    if args.decode:
        cols = res.decoded(store)
    else:
        cols = [(str(nm[-1]) if nm else f"col{i}", c)
                for i, (nm, c) in enumerate(zip(res.names, res.columns))]
    hdr = [c[0] for c in cols]
    print(",".join(hdr))
    n = len(cols[0][1]) if cols else 0
    for i in range(n):
        print(",".join(str(c[1][i]) for c in cols))


# flags that consume the next argv token (for the no-subcommand rewrite)
_VALUE_FLAGS = {"-b", "--bounds", "-t", "--storage", "-s", "--schema",
                "--dictionary", "-g", "--grainsize", "--sparsity",
                "--goffset", "--sf", "--seed", "--devices", "--profile",
                "--tbl",
                "--hbm-gbps"}
_SUBCOMMANDS = ("compile", "genplans", "explain", "run")


def _normalize_argv(argv):
    """Reference UX (MainFuns.hs:34-75,140; SURVEY Appendix A): the binary
    takes ``[FILE] -b … -t … -s … --dictionary …`` with NO subcommand,
    defaulting to compile and reading the plan from stdin when FILE is
    absent.  Rewrite such invocations into the ``compile`` subcommand;
    explicit subcommands pass through untouched."""
    if not argv or "-h" in argv or "--help" in argv:
        return argv
    positionals = []
    skip = False
    for i, tok in enumerate(argv):
        if skip:
            skip = False
            continue
        if tok in _VALUE_FLAGS:
            skip = True
            continue
        if tok.startswith("--") and "=" in tok:
            continue
        if tok.startswith("-") and tok != "-":
            continue
        positionals.append(tok)
    if positionals and positionals[0] in _SUBCOMMANDS:
        return argv
    if not positionals:
        # no FILE: read the plan from stdin (MainFuns.hs:140)
        return ["compile", "-"] + list(argv)
    return ["compile"] + list(argv)


def _expand_genplans_meta(argv):
    """Reference ``genplans META DIR`` convenience (genplans:12-33 +
    tpchrun:2-4): a metadata DIRECTORY as the first genplans operand
    expands to the four conventional file flags inside it."""
    if len(argv) >= 3 and argv[0] == "genplans" and \
            os.path.isdir(argv[1]) and \
            os.path.isfile(os.path.join(argv[1], "bounds.csv")) and \
            not any(a in ("-b", "--bounds") for a in argv):
        meta, rest = argv[1], argv[2:]
        return ["genplans", *rest,
                "-b", os.path.join(meta, "bounds.csv"),
                "-t", os.path.join(meta, "storage.csv"),
                "-s", os.path.join(meta, "schema.msqldump"),
                "--dictionary", os.path.join(meta, "dictionary.csv")]
    return argv


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    argv = _normalize_argv(list(argv))
    argv = _expand_genplans_meta(argv)
    ap = argparse.ArgumentParser(prog="mplan2vdl_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("compile", help="mplan -> VDL text")
    pc.add_argument("plan")
    _add_meta_args(pc)
    _add_flag_args(pc)
    pc.set_defaults(fn=cmd_compile)

    pg = sub.add_parser("genplans", help="batch compile a directory")
    pg.add_argument("dir")
    _add_meta_args(pg)
    _add_flag_args(pg)
    pg.set_defaults(fn=cmd_genplans)

    pe = sub.add_parser("explain", help="dump the vector-IR DAG + metadata")
    pe.add_argument("plan")
    _add_meta_args(pe)
    _add_flag_args(pe)
    pe.set_defaults(fn=cmd_explain)

    pr = sub.add_parser("run", help="execute a plan on the engine")
    pr.add_argument("plan")
    pr.add_argument("--sf", type=float, default=0.01)
    pr.add_argument("--seed", type=int, default=7)
    pr.add_argument("--tbl", metavar="DIR", default=None,
                    help="load the database from dbgen .tbl files in DIR "
                         "instead of generating synthetic data")
    pr.add_argument("--cpu", action="store_true")
    pr.add_argument("--devices", type=int, default=0, metavar="N",
                    help="distribute over an N-device mesh (with --cpu, "
                         "spawns N virtual host devices); plans outside "
                         "the distribution algebra fall back single-chip")
    pr.add_argument("--explain-dist", action="store_true",
                    help="print the distribution plan (sharded vs "
                         "replicated columns, partitioned joins, domains)")
    pr.add_argument("--decode", action="store_true",
                    help="decode dictionary codes / dates / decimals")
    pr.add_argument("--use-cross-product", action="store_true")
    pr.add_argument("--legacy-fk-names", action="store_true",
                    help="name FK join-index columns %%<tab>_fkN (the "
                         "monetpch/simple corpora's convention)")
    pr.add_argument("--profile", metavar="DIR",
                    help="write a jax.profiler trace of the run")
    pr.add_argument("--roofline", action="store_true",
                    help="print HBM-roofline accounting (scan bytes, XLA "
                         "bytes accessed, amplification, floor time)")
    pr.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="device HBM bandwidth for the roofline floor "
                         "(default: TPU v5e)")
    pr.set_defaults(fn=cmd_run)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
