"""Content-defined chunking (functions/cdc): boundary invariants, the
insertion-locality property that justifies CDC over fixed-size chunking,
and a first-principles recomputation of the gated stats query."""

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from intraarchivededuplicator_spark.functions.cdc import (
    CDC_MOD,
    CDC_W,
    cdc_chunks,
    chunk_bounds,
)
from intraarchivededuplicator_spark.plans import queries as q

SF = "/root/testdata/sf0.001"


def _py_chunks(text: str) -> list[str]:
    out, prev = [], 0
    for e in chunk_bounds(text):
        out.append(text[prev:e])
        prev = e
    return out


def test_chunk_bounds_partition_invariants():
    texts = [
        "",
        "a",
        "short",
        "exactly8",
        "the quick brown fox jumps over the lazy dog " * 10,
    ]
    for t in texts:
        ends = chunk_bounds(t)
        if not t:
            assert ends == []
            continue
        assert ends == sorted(set(ends))
        assert ends[-1] == len(t)
        assert "".join(_py_chunks(t)) == t


def test_insertion_locality():
    """The CDC selling point: a single-char insertion only disturbs chunks
    whose windows overlap the edit — everything downstream re-aligns,
    unlike fixed-size chunking where one insertion shifts every later
    chunk. The boundary predicate depends only on the trailing W chars, so
    boundaries strictly past the edit survive (shifted by one) with
    identical chunk content."""
    # non-repeating deterministic text (md5 counter stream) so every chunk
    # is distinct and set intersection measures alignment, not repetition
    base = "".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(60)
    )
    edited = base[:100] + "X" + base[100:]
    a = {hashlib.md5(c.encode()).digest() for c in _py_chunks(base)}
    b = {hashlib.md5(c.encode()).digest() for c in _py_chunks(edited)}
    # the shared-chunk fraction must stay high; with ~16-char average
    # chunks over an 1800-char text only the chunk(s) covering the edit
    # may differ
    assert len(a & b) >= len(a) - 3
    # and fixed-size chunking would NOT survive this edit: every 16-char
    # slice after position 100 shifts
    fixed_a = {base[i : i + 16] for i in range(0, len(base), 16)}
    fixed_b = {edited[i : i + 16] for i in range(0, len(edited), 16)}
    assert len(fixed_a & fixed_b) < len(a & b)


def test_cdc_chunk_stats_first_principles(spark):
    """q_cdc_chunk_stats at sf0.001 == pure-Python recomputation: chunk
    every doc, count distinct-doc df per chunk md5, fold per-doc stats."""
    pdf = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    per_doc: dict[int, list[bytes]] = {}
    lens: dict[int, list[int]] = {}
    for r in pdf.itertuples():
        cs = _py_chunks(r.text)
        if cs:
            per_doc[int(r.doc_id)] = [
                hashlib.md5(c.encode()).digest() for c in cs
            ]
            lens[int(r.doc_id)] = [len(c) for c in cs]
    df: dict[bytes, int] = {}
    for hs in per_doc.values():
        for h in set(hs):
            df[h] = df.get(h, 0) + 1

    got = {
        r["doc_id"]: (
            r["n_chunks"],
            r["n_bytes"],
            r["n_dup_chunks"],
            r["dup_bytes"],
            r["dup_byte_ratio"],
        )
        for r in q.q_cdc_chunk_stats(spark, SF).collect()
    }
    assert set(got) == set(per_doc)
    for d, hs in per_doc.items():
        n_dup = sum(1 for h in hs if df[h] >= 2)
        dup_b = sum(l for h, l in zip(hs, lens[d]) if df[h] >= 2)
        n_b = sum(lens[d])
        gn, gb, gd, gdb, gr = got[d]
        assert (gn, gb, gd, gdb) == (len(hs), n_b, n_dup, dup_b), d
        # F.round / DuckDB round are HALF_UP, not banker's
        assert gr == float(
            Decimal(dup_b / n_b).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
    # both predicate branches must be live on the pinned corpus
    flat = [(h, df[h]) for hs in per_doc.values() for h in hs]
    assert any(v >= 2 for _, v in flat) and any(v < 2 for _, v in flat)


def test_cdc_kernel_matches_python(spark):
    """The Arrow kernel's (doc_id, chunk_idx, hash, len) stream == the pure
    chunker, including null-text drop and int32 chunk_idx."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 5),
        (2, None),
        (3, "tiny"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_idx"], bytes(r["chunk_hash"]), r["chunk_len"])
        for r in cdc_chunks(d).collect()
    )
    want = []
    for i, t in rows:
        if t is None:
            continue
        for j, c in enumerate(_py_chunks(t)):
            want.append((i, j, hashlib.md5(c.encode()).digest(), len(c)))
    assert got == sorted(want)
