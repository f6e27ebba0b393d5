"""Distributed shuffle equijoin: range-partitioned build + probe routing.

The auto-distribution default evaluates a join's right side at FULL width
on every shard (parallel/auto.py) — correct, but right-side memory does
not scale with the mesh.  This module is the memory-scaling alternative,
the TPU-native form of the classic distributed hash join (SURVEY §2.3:
"hash-partitioned tables; distributed shuffle for joins"):

  build exchange:  each shard routes its LOCAL right rows (key + payload
                   columns) to the key's range-owner shard — ONE
                   all_to_all; after it, each owner holds exactly its key
                   range of the whole right side
  probe exchange:  each shard routes its local left (probe) keys, tagged
                   with their bucket slot, to the same owners — ONE
                   all_to_all
  owner match:     sort the received right set once; binary-search every
                   received probe key (the single-chip engine's
                   sort-merge core, lower.py _join_artifacts); expand
                   match pairs grouped by the probe's SOURCE shard
  route back:      per-probe-row match counts and the expanded pairs
                   (right payloads attached) return to the probe shard —
                   two all_to_alls — so downstream fact-frame work stays
                   shard-local; semi/anti/outer variants derive from the
                   returned counts

Every shape is static: per-destination bucket capacities are fixed up
front and overflow is DETECTED (psum'd counter) so the caller can retry
with doubled capacity (ShuffleJoin.__call__ does, like the shuffle
group-by's skew retries).  Key ranges come from catalog bounds — the
reference's static-bounds discipline (SURVEY §0) applied to partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Sequence

import numpy as np

import jax

from .. import jaxcfg  # noqa: F401  (x64 + persistent compilation cache)

import jax.numpy as jnp

from ..engine import scan
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import mergesearch

SENT_R = jnp.int64(2**62)      # invalid right key: sorts after all keys
SENT_L = jnp.int64(2**62 - 1)  # invalid left key: never equals a right key


def key_sents(dtype):
    """(SENT_R, SENT_L) for a key dtype.  int32 keys (bounds permitting)
    halve the exchange's key bytes over ICI and compile ~2.6x faster
    (int32 sorts, see jaxcfg.py notes)."""
    if dtype == jnp.int32:
        return jnp.int32(2**31 - 1), jnp.int32(2**31 - 2)
    return SENT_R, SENT_L


def _fused_all_to_all(arrays):
    """The build keys, build payloads and probe keys are independent
    subgraphs, so their exchanges CAN combine into one collective per
    dtype group (MPLAN2VDL_FUSED_EXCHANGE=1).  Measured A/B on the
    8-device virtual mesh (r3): combining via concatenation is
    NEUTRAL-TO-SLOWER (Q17 117->128 ms, Q21 99->112 ms median) — the
    concat + re-slice copies cost more than the saved collective
    launches, and the per-array form already exposes the independence
    XLA's latency-hiding scheduler needs to overlap exchanges with the
    owner sort on real ICI.  Default: one all_to_all per array."""
    import os

    if os.environ.get("MPLAN2VDL_FUSED_EXCHANGE", "0") in ("", "0"):
        return [lax.all_to_all(a, "d", 0, 0) for a in arrays]
    groups: dict = {}
    for i, a in enumerate(arrays):
        groups.setdefault(a.dtype, []).append(i)
    out = [None] * len(arrays)
    for dt, idxs in groups.items():
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = lax.all_to_all(arrays[i], "d", 0, 0)
            continue
        widths = [int(arrays[i].shape[1]) for i in idxs]
        cat = jnp.concatenate([arrays[i] for i in idxs], axis=1)
        ex = lax.all_to_all(cat, "d", 0, 0)
        off = 0
        for i, w in zip(idxs, widths):
            out[i] = ex[:, off:off + w]
            off += w
    return out


def _bucket(dest, n_dev, cap, arrays, fills):
    """Scatter rows into (n_dev, cap) per-destination buckets.

    ``dest`` in [0, n_dev]; n_dev = drop.  Rows past a bucket's capacity
    overwrite its last slot and are counted in ``overflow`` (the caller
    retries with doubled cap, so the corruption never escapes)."""
    n = dest.shape[0]
    order = jnp.argsort(dest)
    ds = dest[order]
    onehot = jax.nn.one_hot(jnp.clip(ds, 0, n_dev - 1), n_dev,
                            dtype=jnp.int64)
    within = (scan.cumsum(onehot)
              [jnp.arange(n), jnp.clip(ds, 0, n_dev - 1)] - 1)
    overflow = jnp.sum((within >= cap) & (ds < n_dev))
    slot = jnp.where(ds < n_dev, ds * cap + jnp.minimum(within, cap - 1),
                     n_dev * cap)
    outs = []
    for a, fill in zip(arrays, fills):
        buf = jnp.full((n_dev * cap + 1,), fill, a.dtype)
        outs.append(buf.at[slot].set(a[order], mode="drop")
                    [:n_dev * cap].reshape(n_dev, cap))
    return outs, overflow


def owner_dest(keys, key_lo, key_hi, n_dev):
    """HASH-partition owner of each key; invalid (>= SENT_L) -> n_dev.

    Hashing (Fibonacci multiply + xor-shift, wrap-around int arithmetic)
    instead of key-range splitting: the owner's sort-merge never exploits
    range order, and equal-width ranges from catalog bounds hotspot one
    owner whenever the live keys cluster in a narrow band (skew-aware
    repartitioning, BASELINE north star).  key_lo/key_hi are kept for
    signature stability; only the sentinel check uses the dtype."""
    _, sent_l = key_sents(keys.dtype)
    h = keys.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    h = h ^ (h >> jnp.uint32(16))
    d = (h % jnp.uint32(n_dev)).astype(keys.dtype)
    return jnp.where(keys < sent_l, d, n_dev)


def dest_histogram(dest, n_dev):
    """Rows per destination (n_dev,), dropped rows excluded."""
    oh = jax.nn.one_hot(jnp.clip(dest, 0, n_dev - 1), n_dev, dtype=jnp.int64)
    return jnp.sum(oh * (dest < n_dev)[:, None], axis=0)


# --------------------------------------------------------------- skew/heavy
# A heavy-hitter key sends ALL its build rows and ALL its probes to one
# hash owner; capacity-doubling retries then inflate EVERY shard's buffers
# to fit that one owner's load (VERDICT r2 weak 5).  Skew-aware plan
# (BASELINE north star "skew-aware repartitioning"): detect heavy keys in
# the counting round, BROADCAST their build rows to every shard
# (all_gather of a small exact-capacity buffer), and match their probes
# LOCALLY — heavy probes never enter the exchange, so they stay evenly
# spread wherever they were loaded and no owner hotspots.


def _member_lohi(keys, hs):
    """(lo, hi, hit) of each key against a small sorted sentinel-padded
    table ``hs`` (replicated heavy-key list, <= a few hundred entries —
    the binary search runs over a VMEM-resident table)."""
    lo = jnp.searchsorted(hs, keys)
    i = jnp.minimum(lo, hs.shape[0] - 1)
    return i, hs[i] == keys


def shard_heavy_detect(lkeys, rkeys, n_dev, H=16, min_cnt=64,
                       frac=0.5):
    """Heavy-hitter detection round (shard-side, inside shard_map 'd').

    Each shard sorts its local keys once per side, takes its top-``H``
    keys by run length as candidates, and all-gathers them; exact GLOBAL
    per-candidate counts come from local searchsorted + psum.  A key is
    heavy when its global count on either side exceeds
    max(min_cnt, frac * total_side / n_dev) — i.e. it alone would occupy
    >= ``frac`` of one owner's fair share of the exchange.

    Returns (heavy_sorted (2*H*n_dev,) sentinel-padded ascending,
             rcnt_sorted  global BUILD count aligned with heavy_sorted,
             n_heavy, cap_hb, cap_hp) where cap_hb = max local heavy
    build rows on any shard and cap_hp = max local heavy pairs on any
    shard — both EXACT, so the heavy path needs no capacity retries."""
    sent_r, sent_l = key_sents(lkeys.dtype)
    big = sent_r  # sorts after every real key on either side
    ls = jnp.sort(lkeys)
    rs = jnp.sort(rkeys)

    def top_keys(s, sent):
        n = s.shape[0]
        start = jnp.concatenate(
            [jnp.ones((1,), bool), s[1:] != s[:-1]])
        rid = scan.cumsum_flags(start) - 1
        per_run = jnp.zeros((n,), jnp.int32).at[rid].add(1)
        cnt = jnp.where(start & (s < sent), per_run[rid], 0)
        _, pos = lax.top_k(cnt, min(H, n))
        keys = s[pos]
        if n < H:  # tiny shard: pad candidates to the static width
            keys = jnp.concatenate(
                [keys, jnp.full((H - n,), big, keys.dtype)])
        return keys

    cand = jnp.concatenate([top_keys(ls, sent_l), top_keys(rs, sent_r)])
    allc = lax.all_gather(cand, "d").reshape(-1)  # (2*H*n_dev,)
    allc = jnp.sort(allc)
    dup = jnp.concatenate([jnp.zeros((1,), bool), allc[1:] == allc[:-1]])
    allc = jnp.sort(jnp.where(dup | (allc >= sent_l), big, allc))

    def counts(sorted_side):
        lo = jnp.searchsorted(sorted_side, allc)
        hi = jnp.searchsorted(sorted_side, allc, side="right")
        return (hi - lo).astype(jnp.int64)

    lc_loc, rc_loc = counts(ls), counts(rs)
    lc_g = lax.psum(lc_loc, "d")
    rc_g = lax.psum(rc_loc, "d")
    total_l = lax.psum(jnp.sum((lkeys < sent_l).astype(jnp.int64)), "d")
    total_r = lax.psum(jnp.sum((rkeys < sent_r).astype(jnp.int64)), "d")
    th_l = jnp.maximum(jnp.int64(min_cnt),
                       (total_l * int(frac * 1024)) // (1024 * n_dev))
    th_r = jnp.maximum(jnp.int64(min_cnt),
                       (total_r * int(frac * 1024)) // (1024 * n_dev))
    # a key is ALSO heavy when its pair product alone would blow one
    # owner's per-source pair block (cap_pairs ~ 2*max(rows)/n_dev): all
    # lc*rc pairs of a key land on a single owner in the exchange plan
    th_p = jnp.maximum(jnp.int64(min_cnt),
                       (jnp.maximum(total_l, total_r) * int(frac * 1024))
                       // (1024 * n_dev))
    heavy = ((lc_g >= th_l) | (rc_g >= th_r)
             | (lc_g * rc_g >= th_p)) & (allc < sent_l)
    hk = jnp.where(heavy, allc, big)
    hk_s, rc_s, lc_ls, rc_ls = lax.sort(
        (hk, jnp.where(heavy, rc_g, 0), jnp.where(heavy, lc_loc, 0),
         jnp.where(heavy, rc_loc, 0)), num_keys=1)
    n_heavy = jnp.sum(heavy.astype(jnp.int64))
    cap_hb = lax.pmax(jnp.sum(rc_ls), "d")
    cap_hp = lax.pmax(jnp.sum(lc_ls * rc_s), "d")
    return hk_s, rc_s, n_heavy, cap_hb, cap_hp


def _extract_heavy(keys, payloads, hmask, cap_hb, sent):
    """Compact this shard's heavy build rows into a (cap_hb,) buffer
    (exact-capacity, overflow counted for the retry contract)."""
    pos = scan.cumsum_flags(hmask) - 1
    slot = jnp.where(hmask, jnp.minimum(pos, cap_hb - 1), cap_hb)
    ovr = jnp.maximum(jnp.sum(hmask.astype(jnp.int64)) - cap_hb, 0)
    outs = []
    for a, fill in zip([keys] + list(payloads),
                       [sent] + [0] * len(payloads)):
        buf = jnp.full((cap_hb + 1,), fill, a.dtype)
        outs.append(buf.at[slot].set(a, mode="drop")[:cap_hb])
    return outs, ovr


def _heavy_local_match(lkeys, lheavy, hb_keys, hb_pays, cap_hp):
    """Match this shard's heavy probes against the broadcast heavy build
    set — all local, no exchange, so heavy work stays where the probe
    rows already live (even by construction)."""
    sent_r, sent_l = key_sents(lkeys.dtype)
    kb = hb_keys.shape[0]
    hbs, *hbp = lax.sort((hb_keys, *hb_pays), num_keys=1)
    lkh = jnp.where(lheavy, lkeys, sent_l)
    if mergesearch.use_merge(int(lkh.shape[0])):
        lo, hi = mergesearch.merge_lo_hi(hb_keys, lkh)
    else:
        lo = jnp.searchsorted(hbs, lkh)
        hi = jnp.searchsorted(hbs, lkh, side="right")
    cnt_h = (hi - lo).astype(jnp.int64)  # sentinel probes count 0
    nl = lkeys.shape[0]
    cum = scan.cumsum(cnt_h)
    total = cum[-1] if nl else jnp.int64(0)
    k = jnp.arange(cap_hp, dtype=jnp.int64)
    if mergesearch.use_merge(cap_hp):
        j = mergesearch.merge_searchsorted(cum, k, side="right")
    else:
        j = jnp.searchsorted(cum, k, side="right")
    j_c = jnp.clip(j, 0, nl - 1)
    base = cum[j_c] - cnt_h[j_c]
    rpos = jnp.clip(lo[j_c] + (k - base), 0, kb - 1)
    ok = k < jnp.minimum(total, cap_hp)
    ovr = jnp.maximum(total - cap_hp, 0)
    return dict(lidx=j_c, ok=ok, pays=[p[rpos] for p in hbp],
                cnt=cnt_h, overflow=ovr)


def shard_join_count_stats(lkeys, rkeys, *, key_lo, key_hi, n_dev,
                           cap_r, cap_l, heavy_keys=None, heavy_rcnt=None):
    """Exchange-count round (no pair expansion): the exact static
    capacities the main join program needs.  Returns
    (max pairs in any (owner, source-shard) block  -> cap_pairs,
     max pairs landing on any probe shard          -> cap_exp,
     max UNMATCHED probe rows on any shard         -> cap_un (outer),
     global pair total, global unmatched total, exchange overflow).

    With ``heavy_keys`` (sorted sentinel-padded, + aligned global build
    counts ``heavy_rcnt`` from shard_heavy_detect), heavy rows are
    EXCLUDED from the exchange (they take the broadcast-local path in
    shard_shuffle_join), so the returned capacities stay bounded under
    skew; unmatched accounting still sees the heavy matches."""
    nl = lkeys.shape[0]
    sent_r, sent_l = key_sents(lkeys.dtype)
    lvalid = lkeys < sent_l
    heavy_cnt_row = jnp.zeros((nl,), jnp.int64)
    if heavy_keys is not None:
        hi_l, hit_l = _member_lohi(lkeys, heavy_keys)
        heavy_cnt_row = jnp.where(hit_l & lvalid, heavy_rcnt[hi_l], 0)
        lkeys = jnp.where(hit_l, sent_l, lkeys)
        _, hit_r = _member_lohi(rkeys, heavy_keys)
        rkeys = jnp.where(hit_r, sent_r, rkeys)
    (bk,), ovr_r = _bucket(owner_dest(rkeys, key_lo, key_hi, n_dev),
                           n_dev, cap_r, [rkeys], [sent_r])
    (lk_b, lidx_b), ovr_l = _bucket(
        owner_dest(lkeys, key_lo, key_hi, n_dev), n_dev, cap_l,
        [lkeys, jnp.arange(nl, dtype=jnp.int64)], [sent_l, jnp.int64(nl)])
    rk_own = lax.all_to_all(bk, "d", 0, 0).reshape(-1)
    lk_own = lax.all_to_all(lk_b, "d", 0, 0)
    # probe via tagged co-sort (mergesearch): XLA searchsorted serializes
    # ~7ns/element/step on TPU; the merge ranks every probe in two sorts.
    # Sentinel keys sit at dtype max, so the 2-key (key, tag) comparator
    # path is used (key_hi=None).
    lkf = lk_own.reshape(-1)
    if mergesearch.use_merge(int(lkf.shape[0])):
        lo, hi = mergesearch.merge_lo_hi(rk_own, lkf)
    else:
        rs = jnp.sort(rk_own)
        lo = jnp.searchsorted(rs, lkf)
        hi = jnp.searchsorted(rs, lkf, side="right")
    cnt_own = (hi - lo).astype(jnp.int64).reshape(n_dev, cap_l)
    totals_src = jnp.sum(cnt_own, axis=1)  # per source shard, at this owner
    cnt_back = lax.all_to_all(cnt_own, "d", 0, 0)
    my_total = jnp.sum(cnt_back)
    # per-local-row counts -> unmatched VALID probe rows on this shard
    # (heavy probes count via their key's global build count)
    cnt = jnp.zeros((nl + 1,), jnp.int64).at[lidx_b.reshape(-1)].add(
        cnt_back.reshape(-1), mode="drop")[:nl] + heavy_cnt_row
    my_un = jnp.sum(((cnt == 0) & lvalid).astype(jnp.int64))
    my_heavy = jnp.sum(heavy_cnt_row)  # heavy pairs stay on this shard
    return (lax.pmax(jnp.max(totals_src), "d"),
            lax.pmax(my_total + my_heavy, "d"),
            lax.pmax(my_un, "d"),
            lax.psum(jnp.sum(totals_src) + my_heavy, "d"),
            lax.psum(my_un, "d"),
            lax.psum(ovr_r + ovr_l, "d"))


def shard_shuffle_join(lkeys, rkeys, rpayloads, *, key_lo, key_hi, n_dev,
                       cap_r, cap_l, cap_pairs, heavy_keys=None,
                       cap_hb=0, cap_hp=0):
    """The shard-side join body; callable inside any shard_map over 'd'.

    ``lkeys``/``rkeys``: this shard's local probe/build keys, invalid rows
    pre-set to SENT_L/SENT_R.  ``rpayloads``: columns riding with each
    right row (at minimum its global right position).

    ``heavy_keys`` (sorted, sentinel-padded, replicated — from
    shard_heavy_detect) activates the skew path: heavy BUILD rows are
    extracted into a (cap_hb,) buffer and all-gathered (broadcast join),
    heavy PROBES match against that broadcast set locally and never enter
    the exchange — no owner hotspot, per-shard buffers stay at the
    uniform-keys size.  Heavy pairs are appended after the exchange pairs
    (extra cap_hp slots per shard).

    Returns dict:
      lidx       (n_dev*cap_pairs + cap_hp,) local probe row of each pair
      pair_ok    bool mask of real pairs
      payloads   right payload value per pair
      cnt        (len(lkeys),) per-local-probe-row global match count
      overflow   scalar: total dropped rows across all exchanges (psum'd)
    """
    sent_r, sent_l = key_sents(lkeys.dtype)
    heavy = None
    ovr_h = jnp.int64(0)
    if heavy_keys is not None:
        # the pad value in heavy_keys is a sentinel, so AND with validity
        # (an invalid row must never ride the broadcast buffer)
        _, lheavy = _member_lohi(lkeys, heavy_keys)
        lheavy = lheavy & (lkeys < sent_l)
        _, rheavy = _member_lohi(rkeys, heavy_keys)
        rheavy = rheavy & (rkeys < sent_r)
        (hb_k, *hb_p), ovr_hb = _extract_heavy(rkeys, rpayloads, rheavy,
                                               cap_hb, sent_r)
        hb_keys = lax.all_gather(hb_k, "d").reshape(-1)
        hb_pays = [lax.all_gather(p, "d").reshape(-1) for p in hb_p]
        heavy = _heavy_local_match(lkeys, lheavy, hb_keys, hb_pays, cap_hp)
        ovr_h = ovr_hb + heavy["overflow"]
        # the exchange sees sentinels where the broadcast path took over
        lkeys = jnp.where(lheavy, sent_l, lkeys)
        rkeys = jnp.where(rheavy, sent_r, rkeys)
    S = _pipeline_stages()
    if S > 1:
        # ---- pipelined exchange (opt-in, VERDICT r2 item 10): keys are
        # split into S hash sub-ranges and each sub-range runs the full
        # exchange→sort→probe→route-back chain independently.  The S
        # chains share NO data, so XLA's latency-hiding scheduler is free
        # to run sub-range 1's all_to_all while sub-range 0's owner sort
        # is on the VPU — the double-buffer overlap the north star asks
        # for, expressed as dataflow instead of manual scheduling.  Each
        # sub-range's buffers are ~1/S of the full caps (margin +64);
        # sub-range skew is caught by the normal overflow retry.  NOTE:
        # the per-sub-range caps assume keys spread evenly across the S
        # hash sub-ranges — a single non-heavy hot key lands all its
        # pairs in ONE sub-range and can overflow it, and each retry
        # doubles the FULL caps (every sub-range's buffers inflate), so
        # convergence may take several recompiles.  Exact per-sub-range
        # histograms in the counting round would fix this; deferred
        # while the flag stays opt-in (virtual-mesh A/B was negative).
        # Measured on the 8-device VIRTUAL mesh (r3, 128K probes / 64K
        # builds): S=1 545ms, S=2 813ms, S=4 529ms median — CPU
        # collectives are synchronous memcpys, so the split only adds
        # bucketing overhead there; the overlap this buys is real only
        # on hardware ICI, hence opt-in until a pod-slice measurement.
        sub_l = _subrange_id(lkeys, n_dev, S)
        sub_r = _subrange_id(rkeys, n_dev, S)
        caps = [max(-(-c // S) + 64, 128)
                for c in (cap_r, cap_l, cap_pairs)]
        parts = []
        for s in range(S):
            lk_s = jnp.where(sub_l == s, lkeys, sent_l)
            rk_s = jnp.where(sub_r == s, rkeys, sent_r)
            parts.append(_exchange_match(
                lk_s, rk_s, rpayloads, key_lo=key_lo, key_hi=key_hi,
                n_dev=n_dev, cap_r=caps[0], cap_l=caps[1],
                cap_pairs=caps[2]))
        lidx_out = jnp.concatenate([p[0] for p in parts])
        pair_ok = jnp.concatenate([p[1] for p in parts])
        pays_out = [jnp.concatenate(cols)
                    for cols in zip(*[p[2] for p in parts])]
        cnt = sum(p[3] for p in parts)
        ovr_x = sum(p[4] for p in parts)
    else:
        lidx_out, pair_ok, pays_out, cnt, ovr_x = _exchange_match(
            lkeys, rkeys, rpayloads, key_lo=key_lo, key_hi=key_hi,
            n_dev=n_dev, cap_r=cap_r, cap_l=cap_l, cap_pairs=cap_pairs)
    overflow = lax.psum(ovr_x + ovr_h, "d")
    if heavy is not None:  # broadcast-path pairs appended per shard
        lidx_out = jnp.concatenate(
            [lidx_out, jnp.where(heavy["ok"], heavy["lidx"], 0)])
        pair_ok = jnp.concatenate([pair_ok, heavy["ok"]])
        pays_out = [jnp.concatenate([p, hp.astype(p.dtype)])
                    for p, hp in zip(pays_out, heavy["pays"])]
        cnt = cnt + heavy["cnt"]
    return dict(lidx=lidx_out, pair_ok=pair_ok, payloads=pays_out,
                cnt=cnt, overflow=overflow)


def _pipeline_stages() -> int:
    """MPLAN2VDL_PIPELINE_EXCHANGE=S splits the join exchange into S
    independent hash sub-ranges (0/1 = off, the single fused exchange).
    Read at trace time."""
    import os

    try:
        return max(int(os.environ.get(
            "MPLAN2VDL_PIPELINE_EXCHANGE", "0")), 1)
    except ValueError:
        return 1


def _subrange_id(keys, n_dev, S):
    """Pipeline sub-range of each key, decorrelated from the owner hash
    (owner_dest uses h % n_dev; this uses a second multiplicative mix),
    so every (owner, sub-range) cell sees ~1/(n_dev*S) of the keys.
    Invalid (sentinel) keys map to S — outside every sub-range."""
    _, sent_l = key_sents(keys.dtype)
    h = keys.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    h = h ^ (h >> jnp.uint32(16))
    h2 = (h // jnp.uint32(n_dev)) * jnp.uint32(0x85EBCA6B)
    h2 = h2 ^ (h2 >> jnp.uint32(13))
    s = (h2 % jnp.uint32(S)).astype(jnp.int32)
    return jnp.where(keys < sent_l, s, jnp.int32(S))


def _exchange_match(lkeys, rkeys, rpayloads, *, key_lo, key_hi, n_dev,
                    cap_r, cap_l, cap_pairs):
    """One complete exchange→owner-sort-merge→expand→route-back chain
    over the given key set (sentinel rows ignored).  Returns
    (lidx (n_dev*cap_pairs,), pair_ok, payload list, per-local-row cnt,
    local overflow — NOT yet psum'd)."""
    sent_r, sent_l = key_sents(lkeys.dtype)
    # ---- build + probe exchange, fused: right rows to their key's
    # owner and left keys (tagged with local row) to the same owners —
    # independent buckets ride ONE collective per dtype group
    nl = lkeys.shape[0]
    (bk, *bps), ovr_r = _bucket(
        owner_dest(rkeys, key_lo, key_hi, n_dev), n_dev, cap_r,
        [rkeys] + list(rpayloads), [sent_r] + [0] * len(rpayloads))
    lidx_all = jnp.arange(nl, dtype=jnp.int64)
    (lk_b, lidx_b), ovr_l = _bucket(
        owner_dest(lkeys, key_lo, key_hi, n_dev), n_dev, cap_l,
        [lkeys, lidx_all], [sent_l, jnp.int64(nl)])
    bk_x, lk_own, *bps_x = _fused_all_to_all([bk, lk_b] + list(bps))
    rk_own = bk_x.reshape(-1)
    rp_own = [b.reshape(-1) for b in bps_x]
    # lk_own: (n_dev=src, cap_l)

    # ---- owner-side sort-merge (single sort of the owned right range);
    # payloads ride the sort as extra operands — a multi-operand lax.sort
    # moves them at sort-network speed instead of argsort + random
    # gathers (XLA's dynamic gather serializes at ~7 ns/element)
    m = rk_own.shape[0]
    rs, *rp_sorted = lax.sort((rk_own, *rp_own), num_keys=1)
    lkf = lk_own.reshape(-1)
    if mergesearch.use_merge(int(lkf.shape[0])):
        lo, hi = mergesearch.merge_lo_hi(rk_own, lkf)
    else:
        lo = jnp.searchsorted(rs, lkf)
        hi = jnp.searchsorted(rs, lkf, side="right")
    lo = lo.reshape(n_dev, cap_l)
    hi = hi.reshape(n_dev, cap_l)
    cnt_own = (hi - lo).astype(jnp.int64)  # SENT_L probes: cnt 0

    # ---- expand pairs per SOURCE shard (each row block returns home)
    def expand_block(cnt_s, lo_s):
        cum = scan.cumsum(cnt_s)
        total = cum[-1]
        k = jnp.arange(cap_pairs, dtype=jnp.int64)
        if mergesearch.use_merge(cap_pairs):
            j = mergesearch.merge_searchsorted(cum, k, side="right")
        else:
            j = jnp.searchsorted(cum, k, side="right")
        j_c = jnp.clip(j, 0, cap_l - 1)
        base = cum[j_c] - cnt_s[j_c]
        rpos = jnp.clip(lo_s[j_c] + (k - base), 0, m - 1)
        ok = k < jnp.minimum(total, cap_pairs)
        return j_c, rpos, ok, jnp.maximum(total - cap_pairs, 0)

    slot_p, rpos_p, ok_p, dropped = jax.vmap(expand_block)(cnt_own, lo)
    ovr_p = jnp.sum(dropped)
    pay_p = [p[rpos_p] for p in rp_sorted]  # (n_dev, cap_pairs) each

    # ---- route back, fused: counts and pairs land on the probe shard
    cnt_back, slot_back, *pay_back = _fused_all_to_all(
        [cnt_own, jnp.where(ok_p, slot_p, cap_l)] + list(pay_p))
    # cnt_back: (n_dev=owner, cap_l); slot_back invalid slots -> cap_l

    # per-local-row count: each probe row went to exactly ONE owner, so a
    # scatter-add over bucket slots reassembles it (invalid slots drop)
    cnt = jnp.zeros((nl + 1,), jnp.int64).at[lidx_b.reshape(-1)].add(
        cnt_back.reshape(-1), mode="drop")[:nl]
    # pair probe rows: bucket slot -> the local row this shard put there
    lidx_pad = jnp.concatenate(
        [lidx_b, jnp.full((n_dev, 1), nl, jnp.int64)], axis=1)
    lidx_pairs = jnp.take_along_axis(
        lidx_pad, jnp.minimum(slot_back, cap_l), axis=1).reshape(-1)
    pair_ok = (slot_back.reshape(-1) < cap_l) & (lidx_pairs < nl)

    lidx_out = jnp.where(pair_ok, lidx_pairs, 0)
    pays_out = [p.reshape(-1) for p in pay_back]
    return lidx_out, pair_ok, pays_out, cnt, ovr_r + ovr_l + ovr_p


@dataclass
class ShuffleJoin:
    """Compiled distributed equijoin over pre-sharded keys.

    ``key_bounds``: (lo, hi] key value range from catalog bounds — the
    static range-partitioning function.  ``n_payload`` right columns ride
    the exchange (ship the global right position to reconstruct pairs).
    Capacities start at a uniform-keys estimate and double on overflow.
    """

    mesh: Mesh
    shard_rows_l: int
    shard_rows_r: int
    key_bounds: tuple
    n_payload: int = 1
    cap_scale: int = field(default=1)
    heavy: bool = True  # skew-aware broadcast path for heavy-hitter keys
    _heavy_plan: tuple = field(default=None, repr=False)

    def _detect(self, lkeys, rkeys):
        """Heavy-hitter round: returns None (no heavy keys) or
        (heavy_keys ndarray, cap_hb, cap_hp)."""
        n_dev = self.mesh.devices.size

        @partial(jax.shard_map, mesh=self.mesh, in_specs=(P("d"), P("d")),
                 out_specs=(P(),) * 5, check_vma=False)
        def det(lk, rk):
            return shard_heavy_detect(lk.reshape(-1), rk.reshape(-1), n_dev)

        hk, _, n_heavy, cap_hb, cap_hp = jax.jit(det)(lkeys, rkeys)
        if int(n_heavy) == 0:
            return None
        return np.asarray(hk), max(int(cap_hb), 1), max(int(cap_hp), 1)

    def _build(self):
        n_dev = self.mesh.devices.size
        s = self.cap_scale
        cap_r = s * (2 * -(-self.shard_rows_r // n_dev) + 64)
        cap_l = s * (2 * -(-self.shard_rows_l // n_dev) + 64)
        cap_pairs = s * (2 * -(-max(self.shard_rows_l,
                                    self.shard_rows_r) // n_dev) + 64)
        lo, hi = self.key_bounds
        np_ = self.n_payload
        hplan = self._heavy_plan
        hk = jnp.asarray(hplan[0]) if hplan else None
        cap_hb, cap_hp = (hplan[1], hplan[2]) if hplan else (0, 0)

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P("d"),) * (2 + np_),
                 out_specs=(P("d"),) * (3 + np_) + (P(),),
                 check_vma=False)
        def step(lk, rk, *rps):
            r = shard_shuffle_join(
                lk.reshape(-1), rk.reshape(-1), [p.reshape(-1) for p in rps],
                key_lo=lo, key_hi=hi, n_dev=n_dev, cap_r=cap_r,
                cap_l=cap_l, cap_pairs=cap_pairs, heavy_keys=hk,
                cap_hb=cap_hb, cap_hp=cap_hp)
            one = lambda a: a.reshape(1, -1)
            return ((one(r["lidx"]), one(r["pair_ok"].astype(jnp.int8)),
                     one(r["cnt"]))
                    + tuple(one(p) for p in r["payloads"])
                    + (r["overflow"],))

        self._caps = (cap_r, cap_l, cap_pairs)
        return jax.jit(step)

    def __call__(self, lkeys: jax.Array, rkeys: jax.Array,
                 rpayloads: Sequence[jax.Array]):
        """Returns per-shard numpy views:
        (lidx (n_dev, cap_pairs [+cap_hp]), pair_ok, cnt
        (n_dev, shard_rows_l), payload list).  Heavy keys take the
        broadcast path; residual overflow doubles capacities."""
        if self.heavy and self._heavy_plan is None:
            self._heavy_plan = self._detect(lkeys, rkeys) or ()
        for _ in range(8):
            step = self._build()
            outs = step(lkeys, rkeys, *rpayloads)
            if int(np.asarray(outs[-1])) == 0:
                n_dev = self.mesh.devices.size
                lidx = np.asarray(outs[0]).reshape(n_dev, -1)
                ok = np.asarray(outs[1]).reshape(n_dev, -1).astype(bool)
                cnt = np.asarray(outs[2]).reshape(n_dev, -1)
                pays = [np.asarray(o).reshape(n_dev, -1) for o in outs[3:-1]]
                return lidx, ok, cnt, pays
            self.cap_scale *= 2
        raise RuntimeError(
            "shuffle join exchange overflow after capacity retries — "
            "key distribution is pathologically skewed")
