"""URL-seen set, cuckoo-filter variant: partitioned cuckoo filter +
exact confirmation.

The north-star design names "a partitioned bloom/cuckoo filter keyed by
canonicalized-URL 64-bit hash" — :mod:`dedup` implements the bloom arm;
this module implements the cuckoo arm (Fan, Andersen, Kaminsky,
Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom", CoNEXT
2014 — public paper; partial-key cuckoo hashing, 4-slot buckets,
16-bit fingerprints). What the cuckoo filter buys over the bloom:

- **deletion** — a crawl frontier that retracts URLs (recrawl
  scheduling, robots rule changes, quarantine reversal) can remove
  keys without rebuilding the filter; a bloom cannot.
- ~same space at lower false-positive rate for the 10-16 bits/key
  regime (16-bit fingerprints, 4-slot buckets, load factor <= 0.95).

Partitioning mirrors the bloom exactly (SURVEY.md §2.2 P7 scale
design): the 64-bit hash space splits into ``n_blocks`` blocks by
``pmod(url_hash, n_blocks)``; each block is a numpy ``uint16`` table of
``n_buckets x 4`` slots living whole inside one task; build / update /
probe are applyInPandas / cogroup over ``block_id`` so candidates
shuffle only a slim (block_id, url_hash) projection and a block's
table is deserialized once per task, never per row.

Same exactness contract as the bloom path: the filter only
*accelerates* — "definitely new" skips the exact check, "maybe seen"
is confirmed against the exact seen table, so a false positive can
never drop a genuinely-new URL. Items that lose an eviction chain (at
load factors beyond ~0.95, never at our sizing) go to a per-block
stash of full hashes, preserving no-false-negatives.

Sizing at 10^10 keys: 16 bits/slot / 0.95 load -> ~21 GB total, e.g.
n_blocks = 8192 x ~2.6 MB blocks — same order as the bloom's 12.5 GB
with deletability on top.

Determinism / retry-safety: inserts are insert-if-absent (re-applying
a round's delta is a no-op — same idempotence class as the bloom's
bitwise OR); eviction victims are chosen by a deterministic
kick-counter hash, so the serialized block bytes are identical across
retries of the same update.

Caveats inherited from the data structure (documented in the paper):
deleting a key that was never inserted can evict a colliding key's
fingerprint, so callers must only delete previously-inserted keys;
and two distinct keys sharing BOTH fingerprint and bucket pair are
one stored fingerprint, so deleting one un-members the other
(probability ~1/(2^16 * n_buckets) per pair; the pinned hypothesis
example 0 vs 2^56 in tests/test_cuckoo.py exhibits it). The crawl
loop never deletes — its filter verdicts stay exact — and a
frontier-retraction user accepts that a collided key degrades to
"will be re-confirmed against the exact table on next sight".
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import BLOOM_BLOCK_SCHEMA

_SLOTS = 4
_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing multiplier
_FP_MIX = np.uint64(0x5BD1E995)  # MurmurHash2 multiplier (paper's choice)
_MAX_KICKS = 500


@dataclass(frozen=True)
class CuckooParams:
    n_blocks: int = 32
    n_buckets: int = 1 << 15  # buckets per block; power of two
    # capacity/block = n_buckets * 4 slots * 0.95 load

    @property
    def table_bytes(self) -> int:
        return self.n_buckets * _SLOTS * 2  # uint16 slots


def block_id_col(url_hash, params: CuckooParams):
    return F.pmod(url_hash, F.lit(params.n_blocks)).cast("int")


def _fp_i1_i2(hashes: np.ndarray, params: CuckooParams):
    """(fingerprint, bucket1, bucket2) per hash, all vectorized.

    fp is 16-bit nonzero (0 is the empty-slot sentinel) taken from the
    upper hash bits (block_id consumes the low bits via pmod, so fp and
    bucket index stay independent of the partitioning key).
    i2 = i1 XOR mix(fp) — partial-key cuckoo hashing: either bucket is
    recoverable from (other bucket, fp) alone, which is what lets
    eviction re-home a fingerprint without the original key.
    """
    mask = np.uint64(params.n_buckets - 1)
    h = hashes.astype(np.int64).view(np.uint64)
    fp = ((h >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    i1 = ((h * _MIX) >> np.uint64(20)) & mask
    i2 = i1 ^ ((fp.astype(np.uint64) * _FP_MIX) & mask)
    return fp, i1.astype(np.int64), i2.astype(np.int64)


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, params: CuckooParams):
    mask = np.uint64(params.n_buckets - 1)
    alt = bucket.astype(np.uint64) ^ ((fp.astype(np.uint64) * _FP_MIX) & mask)
    return alt.astype(np.int64)


def _empty_block(params: CuckooParams) -> tuple[np.ndarray, np.ndarray]:
    return (
        np.zeros((params.n_buckets, _SLOTS), dtype=np.uint16),
        np.zeros(0, dtype=np.int64),
    )


def _serialize(table: np.ndarray, stash: np.ndarray) -> bytes:
    head = np.array([table.shape[0], stash.shape[0]], dtype=np.uint32)
    return head.tobytes() + table.tobytes() + stash.tobytes()


def _deserialize(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    head = np.frombuffer(blob[:8], dtype=np.uint32)
    n_buckets, n_stash = int(head[0]), int(head[1])
    tbl_end = 8 + n_buckets * _SLOTS * 2
    table = (
        np.frombuffer(blob[8:tbl_end], dtype=np.uint16)
        .reshape(n_buckets, _SLOTS)
        .copy()
    )
    stash = np.frombuffer(blob[tbl_end:], dtype=np.int64).copy()
    return table, stash


def _contains_mask(
    table: np.ndarray,
    stash: np.ndarray,
    hashes: np.ndarray,
    params: CuckooParams,
) -> np.ndarray:
    """Vectorized membership probe: fp present in bucket i1 or i2,
    or full hash in the stash."""
    fp, i1, i2 = _fp_i1_i2(hashes, params)
    hit = (table[i1] == fp[:, None]).any(axis=1) | (
        table[i2] == fp[:, None]
    ).any(axis=1)
    if stash.size:
        hit |= np.isin(hashes, stash)
    return hit


def _insert_new(
    table: np.ndarray,
    stash_list: list[int],
    hashes: np.ndarray,
    params: CuckooParams,
) -> None:
    """Insert hashes (pre-filtered to not-present) in ascending-hash
    order (determinism under retries). Mutates table / stash_list.

    The probe arithmetic is vectorized up front; the placement loop is
    per-item because cuckoo eviction is inherently sequential — this
    is the accepted cost of deletability, paid only on NEW keys and
    only inside one block's task.
    """
    order = np.argsort(hashes, kind="stable")
    fps, i1s, i2s = _fp_i1_i2(hashes, params)
    for j in order:
        fp = np.uint16(fps[j])
        placed = False
        for b in (int(i1s[j]), int(i2s[j])):
            empt = np.flatnonzero(table[b] == 0)
            if empt.size:
                table[b, empt[0]] = fp
                placed = True
                break
        if placed:
            continue
        # Eviction walk, victim slot chosen deterministically from
        # (hash, kick count). The chain is recorded so a failed walk
        # can be undone exactly — displaced fingerprints belong to
        # OLD keys, and abandoning one mid-chain would turn it into a
        # false negative.
        cur = int(i1s[j])
        h = int(np.int64(hashes[j]).view(np.uint64))
        hmix = (h * int(_MIX)) & 0xFFFFFFFFFFFFFFFF  # uint64 wraparound
        chain: list[tuple[int, int, np.uint16]] = []
        for kick in range(_MAX_KICKS):
            slot = (hmix + kick) % _SLOTS
            victim = table[cur, slot]
            chain.append((cur, slot, victim))
            table[cur, slot] = fp
            fp = victim
            cur = int(_alt_bucket(np.array([cur]), np.array([fp]), params)[0])
            empt = np.flatnonzero(table[cur] == 0)
            if empt.size:
                table[cur, empt[0]] = fp
                placed = True
                break
        if not placed:
            # undo the whole chain (restores every old fingerprint to
            # its pre-walk slot), then stash the NEW key's full hash —
            # membership checks the stash first, so no false negative.
            for b, s, old in reversed(chain):
                table[b, s] = old
            stash_list.append(int(hashes[j]))
            # At our sizing (load <= 0.95) a 500-kick failure is not
            # observed; the stash is a backstop, not a hot path.


def build_blocks(hashes_df: DataFrame, params: CuckooParams) -> DataFrame:
    """hashes_df: (url_hash long) -> cuckoo blocks (block_id, bits)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table, _ = _empty_block(params)
        stash: list[int] = []
        hashes = np.unique(pdf["url_hash"].to_numpy(np.int64))
        _insert_new(table, stash, hashes, params)
        return pd.DataFrame(
            {
                "block_id": [int(pdf["block_id"].iloc[0])],
                "bits": [_serialize(table, np.array(stash, dtype=np.int64))],
            }
        )

    return (
        hashes_df.select(
            "url_hash", block_id_col(F.col("url_hash"), params).alias("block_id")
        )
        .groupBy("block_id")
        .applyInPandas(build, schema=BLOOM_BLOCK_SCHEMA)
    )


def update_blocks(
    blocks: DataFrame, hashes_df: DataFrame, params: CuckooParams
) -> DataFrame:
    """Fused insert-if-absent of new hashes into existing blocks in ONE
    cogroup pass (mirrors dedup.update_blocks). Idempotent: re-applying
    the same delta changes nothing."""

    def upd(hashes: pd.DataFrame, blk: pd.DataFrame) -> pd.DataFrame:
        if blk.empty:
            table, stash = _empty_block(params)
            bid = int(hashes["block_id"].iloc[0])
        else:
            table, stash = _deserialize(blk["bits"].iloc[0])
            bid = int(blk["block_id"].iloc[0])
        stash_list = [int(x) for x in stash]
        if not hashes.empty:
            hs = np.unique(hashes["url_hash"].to_numpy(np.int64))
            fresh = hs[~_contains_mask(table, stash, hs, params)]
            _insert_new(table, stash_list, fresh, params)
        return pd.DataFrame(
            {
                "block_id": [bid],
                "bits": [
                    _serialize(table, np.array(stash_list, dtype=np.int64))
                ],
            }
        )

    hashed = hashes_df.select(
        "url_hash", block_id_col(F.col("url_hash"), params).alias("block_id")
    )
    return (
        hashed.groupBy("block_id")
        .cogroup(blocks.groupBy("block_id"))
        .applyInPandas(lambda h, b: upd(h, b), schema=BLOOM_BLOCK_SCHEMA)
    )


def delete_from_blocks(
    blocks: DataFrame, hashes_df: DataFrame, params: CuckooParams
) -> DataFrame:
    """Remove previously-inserted hashes (ONE fingerprint copy per
    key, checking stash first) — the operation the bloom arm cannot
    do. Caller contract: hashes must have been inserted (standard
    cuckoo-filter deletion precondition)."""

    def dele(hashes: pd.DataFrame, blk: pd.DataFrame) -> pd.DataFrame:
        if blk.empty:
            if hashes.empty:
                return pd.DataFrame(
                    {"block_id": pd.Series([], dtype="int32"), "bits": []}
                )
            table, stash = _empty_block(params)
            return pd.DataFrame(
                {
                    "block_id": [int(hashes["block_id"].iloc[0])],
                    "bits": [_serialize(table, stash)],
                }
            )
        table, stash = _deserialize(blk["bits"].iloc[0])
        bid = int(blk["block_id"].iloc[0])
        if not hashes.empty:
            hs = np.unique(hashes["url_hash"].to_numpy(np.int64))
            in_stash = np.isin(hs, stash)
            if in_stash.any():
                stash = stash[~np.isin(stash, hs[in_stash])]
            rest = hs[~in_stash]
            fps, i1s, i2s = _fp_i1_i2(rest, params)
            for j in range(rest.shape[0]):
                for b in (int(i1s[j]), int(i2s[j])):
                    hit = np.flatnonzero(table[b] == fps[j])
                    if hit.size:
                        table[b, hit[0]] = 0
                        break
        return pd.DataFrame({"block_id": [bid], "bits": [_serialize(table, stash)]})

    hashed = hashes_df.select(
        "url_hash", block_id_col(F.col("url_hash"), params).alias("block_id")
    )
    return (
        hashed.groupBy("block_id")
        .cogroup(blocks.groupBy("block_id"))
        .applyInPandas(lambda h, b: dele(h, b), schema=BLOOM_BLOCK_SCHEMA)
    )


def cuckoo_maybe_hashes(
    candidates: DataFrame, blocks: DataFrame, params: CuckooParams
) -> DataFrame:
    """(url_hash) rows the filter flags as possibly-seen — cogroup by
    block, table deserialized once per task (mirror of
    dedup.bloom_maybe_hashes)."""

    def check(cand: pd.DataFrame, blk: pd.DataFrame) -> pd.DataFrame:
        if cand.empty or blk.empty:
            return pd.DataFrame({"url_hash": pd.Series([], dtype="int64")})
        table, stash = _deserialize(blk["bits"].iloc[0])
        hashes = cand["url_hash"].to_numpy(np.int64)
        hit = _contains_mask(table, stash, hashes, params)
        return pd.DataFrame({"url_hash": hashes[hit]})

    cand_slim = candidates.select(
        "url_hash", block_id_col(F.col("url_hash"), params).alias("block_id")
    )
    return (
        cand_slim.groupBy("block_id")
        .cogroup(blocks.groupBy("block_id"))
        .applyInPandas(lambda c, b: check(c, b), schema="url_hash long")
    )


def split_new_urls_cuckoo(
    candidates: DataFrame,
    blocks: DataFrame | None,
    exact_seen: DataFrame,
    params: CuckooParams,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Same contract as dedup.split_new_urls: (new_rows, definite_new,
    fp_confirm_checked) — exact semantics, filter only accelerates."""
    if blocks is None:
        new_rows = candidates.join(
            exact_seen.select("canonical_url"), "canonical_url", "left_anti"
        ).withColumn("via", F.lit("exact"))
        empty = new_rows.limit(0)
        return new_rows, empty, empty

    maybe = cuckoo_maybe_hashes(candidates, blocks, params)
    definite_new = candidates.join(maybe, "url_hash", "left_anti").withColumn(
        "via", F.lit("cuckoo_definite")
    )
    maybe_rows = candidates.join(maybe, "url_hash", "left_semi")
    fp_new = maybe_rows.join(
        exact_seen.select("canonical_url"), "canonical_url", "left_anti"
    ).withColumn("via", F.lit("cuckoo_fp"))
    return definite_new.unionByName(fp_new), definite_new, fp_new
