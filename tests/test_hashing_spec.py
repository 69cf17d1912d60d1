"""Pure-function golden tests for the signature spec.

Ports the reference's converter/distance test layers:
- bit-conversion round-trips incl. randomized fuzz
  (/root/reference/Tests/Test_BinaryConverter.py:98-143)
- Hamming-distance goldens on signed int64 edge cases
  (/root/reference/Tests/Test_BKTree.py:142-158)
"""

import numpy as np
import pytest

from intraarchivededuplicator_spark.functions.hashing import (
    BAD_SIMHASHES,
    INT64_MIN,
    MinHashParams,
    bin_str_to_int64,
    hamming64,
    int64_to_bin_str,
    minhash_sig,
    shingle_hash32,
    shingles,
    simhash64,
    simhash64_batch,
    to_signed64,
    token_hash64,
    tokenize,
)

B = bin_str_to_int64


class TestBinaryConverters:
    def test_all_zero(self):
        assert B("0" * 64) == 0

    def test_all_one(self):
        assert B("1" * 64) == -1

    def test_msb_only(self):
        assert B("1" + "0" * 63) == INT64_MIN

    def test_lsb_only(self):
        assert B("0" * 63 + "1") == 1

    def test_wrong_length_raises(self):
        with pytest.raises(ValueError):
            B("01")

    def test_roundtrip_fuzz(self):
        # randomized round-trip, mirrors Test_BinaryConverter.py:128-133
        rng = np.random.RandomState(42)
        for _ in range(1000):
            bits = "".join(rng.choice(["0", "1"], size=64))
            assert int64_to_bin_str(B(bits)) == bits


class TestHammingGoldens:
    """Exact vectors from /root/reference/Tests/Test_BKTree.py:142-158."""

    def test_reference_vectors(self):
        v1 = B("0" * 64)
        v2 = B("1" * 64)
        v3 = B("0000000000000000000000000000000000000001111111111111111000000000")
        v4 = B("1" + "0" * 63)
        v5 = B("0" * 63 + "1")
        v6 = B("11" + "0" * 62)
        assert hamming64(v1, v2) == 64
        assert hamming64(v3, v2) == 48
        assert hamming64(v2, v4) == 63
        assert hamming64(v2, v5) == 63
        assert hamming64(v1, v4) == 1
        assert hamming64(v1, v5) == 1
        assert hamming64(v1, v6) == 2


class TestTokenizeAndShingles:
    def test_tokenize_ws_runs(self):
        assert tokenize("a  b\tc\nd ") == ["a", "b", "c", "d"]
        assert tokenize("") == []
        assert tokenize("   \n\t ") == []

    def test_shingles(self):
        assert shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
        assert shingles(["a", "b"], 3) == []


class TestSimHash:
    def test_degenerate_is_zero(self):
        assert simhash64("") == 0
        assert simhash64("   \n ") == 0
        assert 0 in BAD_SIMHASHES

    def test_deterministic(self):
        assert simhash64("the quick brown fox") == simhash64("the quick brown fox")

    def test_near_dup_close_far_dup_far(self):
        base = " ".join(f"tok{i % 97}" for i in range(300))
        perturbed = base.replace("tok5 ", "tok999 ", 2)
        other = " ".join(f"w{i * 7 % 1013}" for i in range(300))
        d_near = hamming64(simhash64(base), simhash64(perturbed))
        d_far = hamming64(simhash64(base), simhash64(other))
        assert d_near < d_far
        assert d_near <= 10

    def test_batch_matches_scalar(self):
        texts = [
            "",
            "a",
            "the quick brown fox jumps over the lazy dog",
            "a a a b b c",
            " ".join(f"tok{i % 13}" for i in range(500)),
            "Ünïcode tøkens ærå 日本語 テスト",
        ]
        batch = simhash64_batch(texts)
        for t, got in zip(texts, batch):
            assert int(got) == simhash64(t), t


class TestMinHash:
    def test_params_deterministic(self):
        p1 = MinHashParams.make(8, seed=42)
        p2 = MinHashParams.make(8, seed=42)
        assert p1 == p2
        assert all(a >= 1 for a in p1.a)

    def test_sig_none_when_too_short(self):
        p = MinHashParams.make(8)
        assert minhash_sig("a b", 5, p) is None

    def test_identical_texts_identical_sigs(self):
        p = MinHashParams.make(16)
        t = " ".join(f"tok{i}" for i in range(50))
        assert minhash_sig(t, 5, p) == minhash_sig(t, 5, p)

    def test_similarity_monotone(self):
        p = MinHashParams.make(128)
        base = [f"tok{i}" for i in range(200)]
        near = list(base)
        near[10] = "XX"
        far = [f"w{i}" for i in range(200)]
        s_base = minhash_sig(" ".join(base), 5, p)
        s_near = minhash_sig(" ".join(near), 5, p)
        s_far = minhash_sig(" ".join(far), 5, p)
        agree_near = sum(a == b for a, b in zip(s_base, s_near))
        agree_far = sum(a == b for a, b in zip(s_base, s_far))
        assert agree_near > 100
        assert agree_far < 10


class TestSpecVsDuckDB:
    """The oracle-SQL builders must agree with the Python spec bit-for-bit."""

    TEXTS = [
        "",
        "one",
        "a b c a b a",
        "the quick brown fox jumps over the lazy dog the quick",
        " ".join(f"tok{i % 23}" for i in range(150)),
        "Ünïcode tøkens ærå 日本語 テスト again Ünïcode",
        "  leading and   trailing   ",
    ]

    @pytest.fixture(scope="class")
    def con(self):
        duckdb = pytest.importorskip("duckdb")
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        for i, t in enumerate(self.TEXTS):
            con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
        return con

    def test_token_hash64_sql(self, con):
        from intraarchivededuplicator_spark.plans.oracle import sql_token_hash64

        for tok in ["hello", "a", "tok999", "日本語"]:
            got = con.sql(
                f"SELECT {sql_token_hash64('?')} ".replace("?", f"'{tok}'")
            ).fetchone()[0]
            assert got == token_hash64(tok), tok

    def test_simhash_sql(self, con):
        from intraarchivededuplicator_spark.plans.oracle import sql_simhash_signatures

        rows = con.sql(sql_simhash_signatures("documents")).fetchall()
        assert len(rows) == len(self.TEXTS)
        for doc_id, sh in rows:
            assert sh == simhash64(self.TEXTS[doc_id]), self.TEXTS[doc_id]

    def test_minhash_sql(self, con):
        from intraarchivededuplicator_spark.plans.oracle import sql_minhash_long

        p = MinHashParams.make(16)
        rows = con.sql(sql_minhash_long(p, 5, "documents")).fetchall()
        by_doc: dict[int, dict[int, int]] = {}
        for doc_id, i, v in rows:
            by_doc.setdefault(doc_id, {})[i] = v
        for doc_id, t in enumerate(self.TEXTS):
            expect = minhash_sig(t, 5, p)
            if expect is None:
                assert doc_id not in by_doc
            else:
                got = [by_doc[doc_id][i] for i in range(16)]
                assert got == expect, t

    def test_shingle_hash_sql(self, con):
        from intraarchivededuplicator_spark.plans.oracle import sql_shingle_hash32

        got = con.sql(
            f"SELECT {sql_shingle_hash32(chr(39) + 'a b c d e' + chr(39))}"
        ).fetchone()[0]
        assert got == shingle_hash32("a b c d e")
