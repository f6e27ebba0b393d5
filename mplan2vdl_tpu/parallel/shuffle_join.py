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
    within = (jnp.cumsum(onehot, axis=0)
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


def shard_join_count_stats(lkeys, rkeys, *, key_lo, key_hi, n_dev,
                           cap_r, cap_l):
    """Exchange-count round (no pair expansion): the exact static
    capacities the main join program needs.  Returns
    (max pairs in any (owner, source-shard) block  -> cap_pairs,
     max pairs landing on any probe shard          -> cap_exp,
     max UNMATCHED probe rows on any shard         -> cap_un (outer),
     global pair total, global unmatched total, exchange overflow)."""
    nl = lkeys.shape[0]
    sent_r, sent_l = key_sents(lkeys.dtype)
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
    cnt = jnp.zeros((nl + 1,), jnp.int64).at[lidx_b.reshape(-1)].add(
        cnt_back.reshape(-1), mode="drop")[:nl]
    my_un = jnp.sum(((cnt == 0) & (lkeys < sent_l)).astype(jnp.int64))
    return (lax.pmax(jnp.max(totals_src), "d"),
            lax.pmax(my_total, "d"),
            lax.pmax(my_un, "d"),
            lax.psum(jnp.sum(totals_src), "d"),
            lax.psum(my_un, "d"),
            lax.psum(ovr_r + ovr_l, "d"))


def shard_shuffle_join(lkeys, rkeys, rpayloads, *, key_lo, key_hi, n_dev,
                       cap_r, cap_l, cap_pairs):
    """The shard-side join body; callable inside any shard_map over 'd'.

    ``lkeys``/``rkeys``: this shard's local probe/build keys, invalid rows
    pre-set to SENT_L/SENT_R.  ``rpayloads``: columns riding with each
    right row (at minimum its global right position).

    Returns dict:
      lidx       (n_dev*cap_pairs,) local probe-row index of each pair
      pair_ok    bool mask of real pairs
      payloads   right payload value per pair
      cnt        (len(lkeys),) per-local-probe-row global match count
      overflow   scalar: total dropped rows across all exchanges (psum'd)
    """
    sent_r, sent_l = key_sents(lkeys.dtype)
    # ---- build exchange: right rows to their key's owner
    (bk, *bps), ovr_r = _bucket(
        owner_dest(rkeys, key_lo, key_hi, n_dev), n_dev, cap_r,
        [rkeys] + list(rpayloads), [sent_r] + [0] * len(rpayloads))
    rk_own = lax.all_to_all(bk, "d", 0, 0).reshape(-1)
    rp_own = [lax.all_to_all(b, "d", 0, 0).reshape(-1) for b in bps]

    # ---- probe exchange: left keys (tagged with local row) to owners
    nl = lkeys.shape[0]
    lidx_all = jnp.arange(nl, dtype=jnp.int64)
    (lk_b, lidx_b), ovr_l = _bucket(
        owner_dest(lkeys, key_lo, key_hi, n_dev), n_dev, cap_l,
        [lkeys, lidx_all], [sent_l, jnp.int64(nl)])
    lk_own = lax.all_to_all(lk_b, "d", 0, 0)  # (n_dev=src, cap_l)

    # ---- owner-side sort-merge (single sort of the owned right range)
    m = rk_own.shape[0]
    order = jnp.argsort(rk_own)
    rs = rk_own[order]
    rp_sorted = [p[order] for p in rp_own]
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
        cum = jnp.cumsum(cnt_s)
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

    # ---- route back: counts and pairs land on the probe shard
    cnt_back = lax.all_to_all(cnt_own, "d", 0, 0)      # (n_dev=owner, cap_l)
    slot_back = lax.all_to_all(
        jnp.where(ok_p, slot_p, cap_l), "d", 0, 0)     # invalid -> cap_l
    pay_back = [lax.all_to_all(p, "d", 0, 0) for p in pay_p]

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

    overflow = lax.psum(ovr_r + ovr_l + ovr_p, "d")
    return dict(lidx=jnp.where(pair_ok, lidx_pairs, 0), pair_ok=pair_ok,
                payloads=[p.reshape(-1) for p in pay_back],
                cnt=cnt, overflow=overflow)


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

    def _build(self):
        n_dev = self.mesh.devices.size
        s = self.cap_scale
        cap_r = s * (2 * -(-self.shard_rows_r // n_dev) + 64)
        cap_l = s * (2 * -(-self.shard_rows_l // n_dev) + 64)
        cap_pairs = s * (2 * -(-max(self.shard_rows_l,
                                    self.shard_rows_r) // n_dev) + 64)
        lo, hi = self.key_bounds
        np_ = self.n_payload

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P("d"),) * (2 + np_),
                 out_specs=(P("d"),) * (3 + np_) + (P(),),
                 check_vma=False)
        def step(lk, rk, *rps):
            r = shard_shuffle_join(
                lk.reshape(-1), rk.reshape(-1), [p.reshape(-1) for p in rps],
                key_lo=lo, key_hi=hi, n_dev=n_dev, cap_r=cap_r,
                cap_l=cap_l, cap_pairs=cap_pairs)
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
        (lidx (n_dev, cap_pairs), pair_ok, cnt (n_dev, shard_rows_l),
        payload list).  Doubles capacities on exchange overflow."""
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
