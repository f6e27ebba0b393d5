"""Streaming sorted-position gather kernel (kernels/sorted_gather.py) vs
the numpy oracle, in Pallas interpret mode (the real-TPU path is the same
trace; on-chip validation lives in tools/bench_ops.py + CLI runs)."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("MPLAN2VDL_PL_INTERPRET", "1")


def _run(src_np, pos_np, valid=None):
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine.kernels.sorted_gather import sorted_gather

    valid = len(pos_np) if valid is None else valid
    out = sorted_gather(jnp.asarray(src_np), jnp.asarray(pos_np), valid)
    return np.asarray(out)[:valid]


@pytest.mark.parametrize("sel", [0.9, 0.5, 0.2])
def test_matches_oracle_int32(sel):
    rng = np.random.default_rng(3)
    n = 40_000
    src = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int32)
    pos = np.sort(rng.choice(n, int(n * sel), replace=False)).astype(np.int32)
    np.testing.assert_array_equal(_run(src, pos), src[pos])


def test_int64_hi_lo_planes():
    rng = np.random.default_rng(4)
    n = 20_000
    src = rng.integers(-(1 << 60), 1 << 60, n).astype(np.int64)
    pos = np.sort(rng.choice(n, n // 2, replace=False)).astype(np.int32)
    np.testing.assert_array_equal(_run(src, pos), src[pos])


def test_masked_tail_ignored():
    rng = np.random.default_rng(5)
    n = 20_000
    src = rng.integers(0, 1 << 30, n).astype(np.int32)
    pos = np.sort(rng.choice(n, 4000, replace=False)).astype(np.int32)
    m = 2500
    # garbage (non-monotone zeros) past valid, as _mask_tail leaves it
    posm = pos.copy()
    posm[m:] = 0
    np.testing.assert_array_equal(_run(src, posm, valid=m), src[pos[:m]])


def test_sparse_spans_fall_back_to_xla():
    """Selectivity far below the window coverage: the cond must take the
    XLA-gather branch and stay exact."""
    rng = np.random.default_rng(6)
    n = 600_000
    src = rng.integers(0, 1 << 30, n).astype(np.int32)
    pos = np.sort(rng.choice(n, 2048, replace=False)).astype(np.int32)
    np.testing.assert_array_equal(_run(src, pos), src[pos])


def test_duplicates_and_clusters():
    rng = np.random.default_rng(7)
    n = 30_000
    src = rng.integers(0, 1 << 30, n).astype(np.int32)
    # clustered duplicated monotone positions (fk-style runs)
    base = np.sort(rng.choice(n, 3000, replace=False))
    pos = np.sort(np.concatenate([base, base, base]))[:6144].astype(np.int32)
    np.testing.assert_array_equal(_run(src, pos), src[pos])


def test_small_table_random_positions():
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine.kernels.sorted_gather import \
        small_table_gather

    rng = np.random.default_rng(8)
    for n, m in [(25, 5000), (7000, 20000), (60000, 8192)]:
        src = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int32)
        pos = rng.integers(0, n, m).astype(np.int32)  # arbitrary order
        out = np.asarray(small_table_gather(jnp.asarray(src),
                                            jnp.asarray(pos), m))[:m]
        np.testing.assert_array_equal(out, src[pos])


def test_small_table_int64():
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine.kernels.sorted_gather import \
        small_table_gather

    rng = np.random.default_rng(9)
    n, m = 4000, 9000
    src = rng.integers(-(1 << 60), 1 << 60, n).astype(np.int64)
    pos = rng.integers(0, n, m).astype(np.int32)
    out = np.asarray(small_table_gather(jnp.asarray(src),
                                        jnp.asarray(pos), m))[:m]
    np.testing.assert_array_equal(out, src[pos])


@pytest.mark.parametrize("q", ["03", "12"])
def test_engine_hook_interpret_mode(monkeypatch, q):
    """The ENGINE integration (lower.py gather branch): force the gate on
    and run whole queries through the kernels in interpret mode — results
    must match the pure-XLA path exactly (on TPU the same trace runs
    compiled; chip validation lives in the CLI comparisons)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import mplan2vdl_tpu.engine.lower as L
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.002, seed=7)
    cfg = store.make_catalog()
    with open(f"/root/reference/tests/tpch10noorder/{q}.sql.mplan") as f:
        text = f.read()

    plain = L.compile_plan_text(text, cfg, store)()
    want = sorted(zip(*[np.asarray(c, np.int64).tolist()
                        for c in plain.columns]))

    monkeypatch.setenv("MPLAN2VDL_PL_INTERPRET", "1")
    monkeypatch.setattr(L, "_sorted_gather_on", lambda: True)
    kern = L.compile_plan_text(text, cfg, store)()
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for c in kern.columns]))
    assert got == want


def test_monotone_predicate():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mplan2vdl_tpu import mplan, passes, vir
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import _monotone_positions
    from mplan2vdl_tpu.fe import lexer, plan_parser

    store = datagen.generate(sf=0.002, seed=7)
    cfg = store.make_catalog()
    with open("/root/reference/tests/tpch10noorder/03.sql.mplan") as f:
        text = f.read()
    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.mplan_from_parse_tree(rel, cfg)
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    # Q3 materializes selection compactions: every gather applying them
    # must be recognized as monotone
    from mplan2vdl_tpu import vir as V
    from mplan2vdl_tpu.engine.lower import _children

    def has_fsel(x, seen=None):
        seen = set() if seen is None else seen
        if x.skey in seen:
            return False
        seen.add(x.skey)
        if isinstance(x.vx, V.Fold) and x.vx.foldop == V.FSEL:
            return True
        return any(has_fsel(c, seen) for c in _children(x.vx))

    seen, mono, direct = set(), [], []

    def go(x):
        if x.skey in seen:
            return
        seen.add(x.skey)
        vx = x.vx
        if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
            if has_fsel(vx.shpos):
                mono.append(_monotone_positions(vx.shpos))
            # a DIRECT FSel position (pure compaction apply) is always
            # monotone; fk VALUES gathered through one are not
            pv = vx.shpos.vx
            if isinstance(pv, V.Fold) and pv.foldop == V.FSEL:
                direct.append(_monotone_positions(vx.shpos))
    # (gather(values, FSel) chains legitimately classify non-monotone)
        for c in _children(vx):
            go(c)

    for v in vexps:
        go(v)
    assert direct and all(direct), direct
    assert any(mono), mono


def test_static_fit_paths_match_cond(monkeypatch):
    """sorted_gather(static_fit=True/False/None) agree elementwise —
    the baked branch must be exactly what the runtime cond would pick."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    monkeypatch.setenv("MPLAN2VDL_PL_INTERPRET", "1")
    import jax.numpy as jnp
    import numpy as np

    from mplan2vdl_tpu.engine.kernels.sorted_gather import (resolve_fit,
                                                            sorted_gather)

    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.integers(0, 1 << 20, 20_000), jnp.int32)
    pos = jnp.asarray(np.sort(rng.integers(0, 20_000, 8192)), jnp.int32)
    valid = 8000
    want = np.asarray(src)[np.asarray(pos)][:valid]
    fit = resolve_fit(int(src.shape[0]), pos, valid)
    # verdicts are now False (XLA) or the smallest covering window size
    assert fit is False or (isinstance(fit, int) and fit in
                            (1024, 2048, 4096, 8192)), fit
    got_static = np.asarray(sorted_gather(src, pos, valid,
                                          static_fit=fit))[:valid]
    got_cond = np.asarray(sorted_gather(src, pos, valid))[:valid]
    np.testing.assert_array_equal(got_static, want)
    np.testing.assert_array_equal(got_cond, want)
    # the False branch is plain XLA gather — also exact
    got_xla = np.asarray(sorted_gather(src, pos, valid,
                                       static_fit=False))[:valid]
    np.testing.assert_array_equal(got_xla, want)
    # legacy True (records written before per-site windows) still works
    got_legacy = np.asarray(sorted_gather(src, pos, valid,
                                          static_fit=True))[:valid]
    np.testing.assert_array_equal(got_legacy, want)
    # every window size the resolver can pick is exact at a span it covers
    if isinstance(fit, int) and not isinstance(fit, bool):
        for w in (1024, 2048, 4096, 8192):
            if w >= fit:
                got_w = np.asarray(sorted_gather(src, pos, valid,
                                                 static_fit=w))[:valid]
                np.testing.assert_array_equal(got_w, want)


def test_span_fit_resolved_and_persisted(monkeypatch):
    """The size-resolution pass resolves every streaming-gather site's
    span fit, the verdicts ride sizes_record() across processes, and a
    preset-built query compiles with NO HLO conditional (the runtime
    cond was Q3's top-traffic instruction)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import mplan2vdl_tpu.engine.lower as L
    from mplan2vdl_tpu.engine import datagen

    monkeypatch.setenv("MPLAN2VDL_PL_INTERPRET", "1")
    monkeypatch.setenv("MPLAN2VDL_SIZE_CACHE", "0")
    monkeypatch.setattr(L, "_sorted_gather_on", lambda: True)
    # Q3's half-selective date filters keep compactions above the
    # kernel's 4096-row gate, so its column gathers are streaming sites
    store = datagen.generate(sf=0.02, seed=7)
    cfg = store.make_catalog()
    with open("/root/reference/tests/tpch10noorder/03.sql.mplan") as f:
        text = f.read()
    cq = L.compile_plan_text(text, cfg, store)
    assert cq.span_fits, "no span-fit verdict resolved on Q3"
    rec = cq.sizes_record()
    kinds = {e[0] for e in rec}
    assert "spanfit" in kinds
    got = cq()

    cq2 = L.CompiledQuery(cfg, L.plan_to_vexps(text, cfg, True, False),
                          store, preset_sizes=rec)
    assert cq2.span_fits == cq.span_fits
    got2 = cq2()
    for a, b in zip(got.columns, got2.columns):
        np.testing.assert_array_equal(a, b)
    hlo = cq2._jitted.lower(cq2.device_args()).compile().as_text()
    # the gather's runtime cond lowers as a TOP-LEVEL conditional
    # (op_name ".../cond"); interpret-mode Pallas emulation adds nested
    # while/body/cond internals that do not exist on real TPU compiles
    import re
    tops = [n for n in re.findall(r'conditional[^\n]*op_name="([^"]*)"',
                                  hlo) if n.endswith("jit(_run)/cond")]
    assert not tops, f"runtime cond survived the baking: {tops}"
