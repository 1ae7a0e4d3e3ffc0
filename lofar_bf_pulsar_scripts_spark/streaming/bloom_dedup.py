"""Bounded-state streaming dedup via a Bloom-bitmap state store.

``streaming_dedup_new_urls`` (stateful dropDuplicates) keeps EVERY
seen key in the state store until the watermark expires it — exact,
but on an unbounded key space (crawl URLs, document fingerprints) the
state grows with the stream. The Bloom dual trades exactness the safe
way around: state per group is a FIXED-SIZE bitmap (m/8 bytes,
regardless of how many keys it has absorbed), a true duplicate is
NEVER re-emitted (bits only turn on), and the failure mode is a
false DROP of a novel key at the standard (1-e^{-kn/m})^k rate — the
right trade for dedup, where letting a duplicate through poisons the
corpus but losing the odd novel row is noise.

Sharding: the stream groups by a hash bucket of the key, so the state
store holds n_buckets bitmaps and each micro-batch updates its
buckets in parallel — total state = n_buckets * m/8 bytes, chosen up
front, forever. This is the batch ``dedup.bloom_build/bloom_screen``
pair turned into an applyInPandasWithState accumulator (the batch
variant is md5/engine-portable for its DuckDB gate; here the hash
only needs to be stable within the stream, and md5 keeps the two
implementations directly comparable).

Cited reference behavior: the staging loop's incremental
ready-minus-downloaded set (/root/reference/LTA/lta-retrieve.py:
504-519), whose streaming dual the exact dedup already covers —
this is its bounded-memory form.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string"
STATE_SCHEMA = "bits binary"
BLOOM_K = 4


def _positions(key: str, m_bits: int) -> list[int]:
    return [
        int.from_bytes(
            hashlib.md5(f"{key}:b{i}".encode()).digest()[:4], "big"
        )
        % m_bits
        for i in range(BLOOM_K)
    ]


def make_bloom_dedup_fn(m_bits: int = 1 << 16):
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bitmap = bytearray(state.get[0])
        else:
            bitmap = bytearray(m_bits // 8)
        novel: list[str] = []
        for pdf in pdfs:
            for kv in pdf["key"]:
                kv = str(kv)
                pos = _positions(kv, m_bits)
                if all(bitmap[p >> 3] >> (p & 7) & 1 for p in pos):
                    continue  # seen (or false-dropped): never re-emit
                for p in pos:
                    bitmap[p >> 3] |= 1 << (p & 7)
                novel.append(kv)
        state.update((bytes(bitmap),))
        if novel:
            yield pd.DataFrame({"key": novel})

    return update


def streaming_bloom_dedup(
    stream: DataFrame,
    key_col: str = "filename",
    m_bits: int = 1 << 16,
    n_buckets: int = 8,
) -> DataFrame:
    """Emit each key's (probabilistic) first occurrence; state is
    n_buckets fixed-size bitmaps. See module docstring for the
    guarantee direction."""
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
        .alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        make_bloom_dedup_fn(m_bits),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
