"""Extraction round-trip: extract(render(text)) == text, byte-identical.

The per-row invariant from BASELINE input_hint; analog of the reference's
pHash/MD5 per-member goldens (/root/reference/Tests/Test_phashArch.py:25-99).
"""

import numpy as np

from intraarchivededuplicator_spark.fixtures.synth import (
    TEMPLATES,
    gen_pages,
    render_html,
)
from intraarchivededuplicator_spark.functions.suffix import sa_contains, suffix_array
from intraarchivededuplicator_spark.functions.textprep import extract_text_py


class TestExtractionRoundTrip:
    def test_all_templates(self):
        texts = [
            "plain body text",
            "",
            "   ",
            "with <angle> brackets & ampersands",
            'quotes "double" and \'single\'',
            "unicode 日本語 ærø",
            "a " * 500,
        ]
        for t in texts:
            for tid in range(len(TEMPLATES)):
                assert extract_text_py(render_html(t, tid)) == t, (t[:30], tid)

    def test_none_html(self):
        assert extract_text_py(None) == ""

    def test_tag_strip_fallback(self):
        raw = b"<html><body><p>hello <b>world</b></p><script>var x=1;</script></body></html>"
        assert extract_text_py(raw) == "hello world"

    def test_corpus_roundtrip(self):
        c = gen_pages(300, seed=7)
        for _, row in c.pages.iterrows():
            assert extract_text_py(row["html"]) == row["text"], row["url"]


class TestSynthCorpus:
    def test_deterministic(self):
        a = gen_pages(200, seed=42)
        b = gen_pages(200, seed=42)
        assert a.pages.equals(b.pages)
        assert a.truth.equals(b.truth)

    def test_class_mix_and_truth(self):
        c = gen_pages(1000, seed=42)
        counts = c.truth["dup_class"].value_counts()
        assert counts["unique"] > 400
        assert counts["exact_dup"] > 50
        assert counts["hot_cluster"] > 20
        # hot cluster is one ground-truth component
        hot = c.truth[c.truth["dup_class"] == "hot_cluster"]
        assert hot["cluster_gt"].nunique() == 1
        # exact dups really are byte-identical to their base
        by_url = dict(zip(c.pages["url"], c.pages["text"]))
        ex = c.truth[c.truth["dup_class"] == "exact_dup"]
        for _, r in ex.iterrows():
            assert by_url[r["url"]] == by_url[r["base_url"]]
        # containment really contains
        co = c.truth[c.truth["dup_class"] == "containment"]
        assert len(co) > 0
        for _, r in co.iterrows():
            assert by_url[r["base_url"]] in by_url[r["url"]]


class TestSuffixArray:
    def test_known(self):
        s = b"banana"
        sa = suffix_array(s)
        suffixes = [s[i:] for i in sa]
        assert suffixes == sorted(s[i:] for i in range(len(s)))

    def test_fuzz_vs_sorted(self):
        rng = np.random.RandomState(3)
        for _ in range(20):
            n = int(rng.randint(1, 200))
            s = bytes(rng.randint(97, 100, size=n).astype(np.uint8))
            sa = suffix_array(s)
            assert [s[i:] for i in sa] == sorted(s[i:] for i in range(n))

    def test_contains(self):
        s = b"the quick brown fox jumps over the lazy dog"
        sa = suffix_array(s)
        assert sa_contains(s, sa, b"quick brown")
        assert sa_contains(s, sa, b"the lazy dog")
        assert sa_contains(s, sa, b"t")
        assert not sa_contains(s, sa, b"quick black")
        assert not sa_contains(s, sa, b"dogs")
        assert sa_contains(s, sa, b"")

    def test_contains_fuzz(self):
        rng = np.random.RandomState(5)
        for _ in range(10):
            s = bytes(rng.randint(97, 101, size=500).astype(np.uint8))
            sa = suffix_array(s)
            for _ in range(30):
                i = int(rng.randint(0, 490))
                m = int(rng.randint(1, 10))
                assert sa_contains(s, sa, s[i : i + m])
                probe = bytes(rng.randint(97, 103, size=6).astype(np.uint8))
                assert sa_contains(s, sa, probe) == (probe in s)


class TestJunkAndMime:
    """P6 junk gate + H7 mime fixup (functions/junk.py)."""

    def test_fix_mime(self, spark):
        from intraarchivededuplicator_spark.functions.junk import fix_mime

        rows = [
            ("text/html; charset=UTF-8", "text/html"),
            ("application/XHTML+xml", "text/html"),
            ("application/CDFV2-corrupt", "application/cdfv2"),
            ("IMAGE/PNG", "image/png"),
        ]
        df = spark.createDataFrame(rows, "m string, want string")
        for r in df.select(fix_mime("m").alias("got"), "want").collect():
            assert r["got"] == r["want"]

    def test_is_junk_page(self, spark):
        from intraarchivededuplicator_spark.functions.junk import is_junk_page

        rows = [
            ("http://a/robots.txt", "User-agent: *", 3, True),
            ("http://a/favicon.ico", "", 0, True),
            ("http://a/page", "404 Not Found nginx", 4, True),
            ("http://a/page2", "Error 503 Service Unavailable", 5, True),
            ("http://a/blank", "   ", 0, True),
            ("http://a/article", "a long article " * 20 + "mentions 404 not found", 64, False),
            ("http://a/real", "perfectly normal content here", 4, False),
        ]
        df = spark.createDataFrame(rows, "url string, text string, n_tokens int, want boolean")
        for r in df.select("url", is_junk_page("url", "text", "n_tokens").alias("got"), "want").collect():
            assert r["got"] == r["want"], r["url"]

    def test_mime_dispatch_in_extraction(self, spark):
        """S3 content-type dispatch: html -> extraction, text/* -> verbatim
        decode, binary -> empty (/root/reference/pArch.py:31-53 analog)."""
        from intraarchivededuplicator_spark.functions.textprep import (
            with_extracted_text,
        )

        rows = [
            ("h", b"<html><body><main>hello world</main></body></html>",
             "text/html; charset=utf-8"),
            ("t", b"plain text body", "text/plain"),
            ("x", b"\x89PNG...", "image/png"),
        ]
        df = spark.createDataFrame(rows, "url string, html binary, mime string")
        got = {
            r["url"]: r["text"]
            for r in with_extracted_text(df, mime_col="mime").collect()
        }
        assert got["h"] == "hello world"
        assert got["t"] == "plain text body"
        assert got["x"] == ""


class TestWriteParquetLayout:
    def test_sharded_splittable_files(self, tmp_path):
        """A parquet row group is the unit of scan parallelism: a corpus
        written as one single-row-group file serializes every Spark read
        (measured: an ~11% fixed serial term on the 8-core flagship leg).
        write_parquet must emit multiple small-row-group files."""
        import pandas as pd
        import pyarrow.parquet as pq

        from intraarchivededuplicator_spark.fixtures.synth import (
            gen_pages,
            write_parquet,
        )

        c = gen_pages(12000, seed=3)
        write_parquet(c, str(tmp_path))
        pages_dir = tmp_path / "pages.parquet"
        parts = sorted(pages_dir.glob("part-*.parquet"))
        assert len(parts) == 2  # 12000 // 5000
        for p in parts:
            f = pq.ParquetFile(str(p))
            assert f.metadata.row_group(0).num_rows <= 5000
        # the shards together are the exact corpus, rows unchanged
        back = (
            pd.concat([pd.read_parquet(p) for p in parts])
            .sort_values("url")
            .reset_index(drop=True)
        )
        orig = c.pages.sort_values("url").reset_index(drop=True)
        # timestamps were coerced to micros on write
        assert back["url"].equals(orig["url"])
        assert back["html"].equals(orig["html"])
        assert back["text"].equals(orig["text"])
