"""ANN scale path (hyperplane LSH) + multimodal plumbing tests.

ANN mirrors the reference's differential pattern (index result vs exact
result, /root/reference/Tests/Test_db_BKTree_Compare.py:30-70): recall of the
LSH-bucketed top-k is measured against brute-force cosine top-k.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from intraarchivededuplicator_spark.functions.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    frame_sample,
    media_near_dup_pairs,
)
from intraarchivededuplicator_spark.operators.ann import (
    ann_topk,
    cosine,
    make_hyperplane_udf,
)

DIM = 16


def _clustered_vectors(n_clusters=12, per_cluster=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, DIM))
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            v = c + 0.05 * rng.standard_normal(DIM)
            rows.append(Row(vec_id=vid, embedding=[float(x) for x in v]))
            vid += 1
    return rows


class TestHyperplaneSignature:
    def test_deterministic_across_invocations(self, spark):
        df = spark.createDataFrame(_clustered_vectors())
        udf = make_hyperplane_udf(DIM, seed=42)
        a = {r["vec_id"]: r["s"] for r in df.select("vec_id", udf(F.col("embedding").cast("array<double>")).alias("s")).collect()}
        udf2 = make_hyperplane_udf(DIM, seed=42)
        b = {r["vec_id"]: r["s"] for r in df.select("vec_id", udf2(F.col("embedding").cast("array<double>")).alias("s")).collect()}
        assert a == b

    def test_close_vectors_get_close_signatures(self, spark):
        df = spark.createDataFrame(_clustered_vectors())
        udf = make_hyperplane_udf(DIM)
        sigs = df.select(
            "vec_id", udf(F.col("embedding").cast("array<double>")).alias("s")
        ).collect()
        by_id = {r["vec_id"]: r["s"] for r in sigs}
        # same-cluster ids (0..7) should be much closer in Hamming space than
        # cross-cluster ids
        same = bin((by_id[0] ^ by_id[1]) & (2**64 - 1)).count("1")
        cross = bin((by_id[0] ^ by_id[95]) & (2**64 - 1)).count("1")
        assert same < 12 and cross > same


class TestAnnTopK:
    def test_recall_vs_brute_force(self, spark):
        rows = _clustered_vectors()
        df = spark.createDataFrame(rows)
        approx = ann_topk(df, k=3, dim=DIM, hamming_radius=20, n_bands=8)
        got = {
            (r["vec_id"], r["neighbor_id"]) for r in approx.collect()
        }
        # brute force oracle
        a = df.select(F.col("vec_id").alias("q"), F.col("embedding").cast("array<double>").alias("qv"))
        b = df.select(F.col("vec_id").alias("n"), F.col("embedding").cast("array<double>").alias("nv"))
        from pyspark.sql.window import Window

        scored = (
            a.join(b, F.col("q") != F.col("n"))
            .select("q", "n", cosine(F.col("qv"), F.col("nv")).alias("c"))
            .withColumn(
                "rank",
                F.row_number().over(Window.partitionBy("q").orderBy(F.desc("c"), F.asc("n"))),
            )
            .filter(F.col("rank") <= 3)
        )
        want = {(r["q"], r["n"]) for r in scored.collect()}
        recall = len(got & want) / len(want)
        assert recall >= 0.9, f"ANN recall {recall:.3f} < 0.9"

    def test_near_pairs_recall_vs_brute_force(self, spark):
        """Differential check for the ANN-routed near-pairs scale path (the
        Test_db_BKTree_Compare.py:30-70 pattern): LSH-bucketed pairs vs the
        exact O(n^2) threshold join."""
        from intraarchivededuplicator_spark.operators.ann import ann_near_pairs

        df = spark.createDataFrame(_clustered_vectors())
        t = 0.9
        got = {
            (r["id_lo"], r["id_hi"])
            for r in ann_near_pairs(
                df, threshold=t, dim=DIM, hamming_radius=20, n_bands=8
            ).collect()
        }
        a = df.select(F.col("vec_id").alias("id_lo"), F.col("embedding").cast("array<double>").alias("va"))
        b = df.select(F.col("vec_id").alias("id_hi"), F.col("embedding").cast("array<double>").alias("vb"))
        exact = (
            a.join(b, F.col("id_lo") < F.col("id_hi"))
            .select("id_lo", "id_hi", cosine(F.col("va"), F.col("vb")).alias("c"))
            .filter(F.col("c") >= t)
        )
        want = {(r["id_lo"], r["id_hi"]) for r in exact.collect()}
        assert want, "fixture must produce in-threshold pairs"
        assert got <= want or all(
            # ANN pairs are cosine-verified, so any extras can only come from
            # float rounding at the threshold boundary — none expected
            False
            for _ in got - want
        )
        recall = len(got & want) / len(want)
        assert recall >= 0.9, f"ANN near-pairs recall {recall:.3f} < 0.9"

    def test_rank_is_dense_per_query(self, spark):
        df = spark.createDataFrame(_clustered_vectors())
        out = ann_topk(df, k=3, dim=DIM, hamming_radius=20, n_bands=8)
        per_q = out.groupBy("vec_id").agg(
            F.collect_list("rank").alias("ranks")
        ).collect()
        for r in per_q:
            assert sorted(r["ranks"]) == list(range(1, len(r["ranks"]) + 1))


class TestEmbeddingFamilyNullParity:
    """Every embedding query shape vs its DuckDB oracle on a corpus WITH
    planted null/empty embeddings (the gate testdata is null-free, so the
    null-drop guards in ann.py / ivf.py / the brute-force twins are only
    proven here)."""

    DIM, SCALE = 8, 1_000_000

    @pytest.fixture()
    def corpus(self, tmp_path):
        import pandas as pd

        rng = np.random.default_rng(23)
        base = rng.standard_normal(self.DIM)
        vecs = [base + 0.02 * rng.standard_normal(self.DIM) for _ in range(4)]
        vecs += [rng.standard_normal(self.DIM) for _ in range(26)]
        pdf = pd.DataFrame(
            {
                "vec_id": list(range(30)) + [900, 901],
                "embedding": [np.asarray(v, dtype=np.float32) for v in vecs]
                + [None, np.array([], dtype=np.float32)],
            }
        )
        path = str(tmp_path / "embeddings.parquet")
        pdf.to_parquet(path)
        return tmp_path, path

    def _compare(self, sdf, sql, path):
        import duckdb

        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
        got = sorted(tuple(r) for r in sdf.collect())
        want = sorted(map(tuple, con.sql(sql).fetchall()))
        assert got == want and not any(900 in t or 901 in t for t in got)
        return got

    def test_brute_force_twins(self, spark, corpus):
        from intraarchivededuplicator_spark.plans import oracle as o
        from intraarchivededuplicator_spark.plans import queries as q

        sf_dir, path = corpus
        rows = self._compare(
            q.q_embedding_knn(spark, str(sf_dir)),
            o.sql_embedding_knn(self.SCALE, 3),
            path,
        )
        assert rows  # non-vacuous
        pairs = self._compare(
            q.q_embedding_near_pairs(spark, str(sf_dir)),
            o.sql_embedding_near_pairs(self.SCALE, 0.4),
            path,
        )
        assert pairs  # planted near-dup cluster guarantees >= 1 pair

    def test_lsh_ann_twins(self, spark, corpus):
        from intraarchivededuplicator_spark.operators.ann import (
            ann_near_pairs,
            ann_topk,
        )
        from intraarchivededuplicator_spark.plans import oracle as o

        _, path = corpus
        df = spark.read.parquet(path)
        rows = self._compare(
            ann_topk(df, k=3, dim=self.DIM, hamming_radius=28, n_bands=8),
            o.sql_embedding_knn_ann(
                self.DIM, self.SCALE, k=3, hamming_radius=28, n_bands=8
            ),
            path,
        )
        assert rows
        self._compare(
            ann_near_pairs(
                df, threshold=0.4, dim=self.DIM, hamming_radius=28, n_bands=8
            ),
            o.sql_embedding_near_pairs_ann(
                self.DIM, self.SCALE, threshold=0.4, hamming_radius=28, n_bands=8
            ),
            path,
        )

    def test_ivf_near_pairs(self, spark, corpus):
        from intraarchivededuplicator_spark.operators.ivf import ivf_near_pairs
        from intraarchivededuplicator_spark.plans import oracle as o

        _, path = corpus
        pairs = self._compare(
            ivf_near_pairs(
                spark.read.parquet(path), threshold=0.4, n_cells=4, nprobe=2
            ),
            o.sql_embedding_near_pairs_ivf(
                self.SCALE, threshold=0.4, n_cells=4, nprobe=2
            ),
            path,
        )
        assert pairs  # same-cell planted cluster keeps this non-vacuous


class TestIvfTopK:
    """IVF-flat scale path (operators/ivf.py) — same differential pattern
    as the LSH path: index-routed result vs brute-force exact."""

    def _brute_force(self, df, k=3):
        from pyspark.sql.window import Window

        a = df.select(F.col("vec_id").alias("q"), F.col("embedding").cast("array<double>").alias("qv"))
        b = df.select(F.col("vec_id").alias("n"), F.col("embedding").cast("array<double>").alias("nv"))
        return {
            (r["q"], r["n"])
            for r in (
                a.join(b, F.col("q") != F.col("n"))
                .select("q", "n", cosine(F.col("qv"), F.col("nv")).alias("c"))
                .withColumn(
                    "rank",
                    F.row_number().over(
                        Window.partitionBy("q").orderBy(F.desc("c"), F.asc("n"))
                    ),
                )
                .filter(F.col("rank") <= k)
            ).collect()
        }

    def test_full_probe_degenerates_to_exact(self, spark):
        """nprobe == n_cells means every inverted list is scanned — the IVF
        result must EQUAL brute force, not just approximate it."""
        from intraarchivededuplicator_spark.operators.ivf import ivf_topk

        df = spark.createDataFrame(_clustered_vectors())
        got = {
            (r["vec_id"], r["neighbor_id"])
            for r in ivf_topk(df, k=3, n_cells=8, nprobe=8).collect()
        }
        assert got == self._brute_force(df, k=3)

    def test_recall_vs_brute_force_with_pruning(self, spark):
        from intraarchivededuplicator_spark.operators.ivf import ivf_topk

        df = spark.createDataFrame(_clustered_vectors())
        got = {
            (r["vec_id"], r["neighbor_id"])
            for r in ivf_topk(df, k=3, n_cells=12, nprobe=4).collect()
        }
        want = self._brute_force(df, k=3)
        recall = len(got & want) / len(want)
        assert recall >= 0.9, f"IVF recall {recall:.3f} < 0.9"

    def test_deterministic_under_repartition(self, spark):
        from intraarchivededuplicator_spark.operators.ivf import ivf_topk

        df = spark.createDataFrame(_clustered_vectors())
        a = sorted(map(tuple, ivf_topk(df, k=3, n_cells=8, nprobe=3).collect()))
        b = sorted(
            map(tuple, ivf_topk(df.repartition(7), k=3, n_cells=8, nprobe=3).collect())
        )
        assert a == b

    def test_null_and_empty_embeddings_excluded(self, spark):
        """Null/empty vectors are absent from the SQL oracle by construction
        (unnest emits no rows) — the engine must drop them identically."""
        from intraarchivededuplicator_spark.operators.ivf import ivf_topk

        rows = [(r.vec_id, [float(x) for x in r.embedding])
                for r in _clustered_vectors()[:20]]
        rows += [(900, None), (901, [])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = ivf_topk(df, k=3, n_cells=4, nprobe=4).collect()
        seen = {r["vec_id"] for r in out} | {r["neighbor_id"] for r in out}
        assert seen and not seen & {900, 901}

    def test_null_parity_vs_duckdb_oracle(self, spark, tmp_path):
        """The full differential on a corpus WITH planted null/empty
        embeddings: the engine's IVF top-k must match the SQL oracle
        row-for-row (the driver-gate testdata is null-free, so this is the
        only place the null-drop parity is actually exercised)."""
        import duckdb
        import pandas as pd

        from intraarchivededuplicator_spark.operators.ivf import ivf_topk
        from intraarchivededuplicator_spark.plans.oracle import (
            sql_embedding_knn_ivf,
        )

        rng = np.random.default_rng(11)
        vecs = [[float(x) for x in rng.standard_normal(8)] for _ in range(30)]
        pdf = pd.DataFrame(
            {
                "vec_id": list(range(30)) + [900, 901],
                "embedding": [np.array(v, dtype=np.float32) for v in vecs]
                + [None, np.array([], dtype=np.float32)],
            }
        )
        path = str(tmp_path / "embeddings.parquet")
        pdf.to_parquet(path)

        got = sorted(
            (r["vec_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in ivf_topk(
                spark.read.parquet(path), k=3, n_cells=4, nprobe=2
            ).collect()
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
        want = sorted(
            map(tuple, con.sql(
                sql_embedding_knn_ivf(1_000_000, k=3, n_cells=4, nprobe=2)
            ).fetchall())
        )
        assert got == want

    def test_near_pairs_full_probe_equals_exact(self, spark):
        """nprobe == n_cells: IVF near-pairs must EQUAL the exact O(n^2)
        threshold join (every inverted list scanned)."""
        from intraarchivededuplicator_spark.operators.ivf import ivf_near_pairs

        df = spark.createDataFrame(_clustered_vectors())
        t = 0.9
        got = {
            (r["id_lo"], r["id_hi"])
            for r in ivf_near_pairs(df, threshold=t, n_cells=8, nprobe=8).collect()
        }
        a = df.select(F.col("vec_id").alias("id_lo"), F.col("embedding").cast("array<double>").alias("va"))
        b = df.select(F.col("vec_id").alias("id_hi"), F.col("embedding").cast("array<double>").alias("vb"))
        want = {
            (r["id_lo"], r["id_hi"])
            for r in (
                a.join(b, F.col("id_lo") < F.col("id_hi"))
                .select("id_lo", "id_hi", cosine(F.col("va"), F.col("vb")).alias("c"))
                .filter(F.col("c") >= t)
            ).collect()
        }
        assert want and got == want

    def test_near_pairs_pruned_is_subset_with_recall(self, spark):
        """With pruning, IVF pairs are a subset of the exact pair set
        (precision exact) at recall >= 0.9 on clustered vectors."""
        from intraarchivededuplicator_spark.operators.ivf import ivf_near_pairs

        df = spark.createDataFrame(_clustered_vectors())
        t = 0.9
        got = {
            (r["id_lo"], r["id_hi"])
            for r in ivf_near_pairs(df, threshold=t, n_cells=12, nprobe=3).collect()
        }
        a = df.select(F.col("vec_id").alias("id_lo"), F.col("embedding").cast("array<double>").alias("va"))
        b = df.select(F.col("vec_id").alias("id_hi"), F.col("embedding").cast("array<double>").alias("vb"))
        want = {
            (r["id_lo"], r["id_hi"])
            for r in (
                a.join(b, F.col("id_lo") < F.col("id_hi"))
                .select("id_lo", "id_hi", cosine(F.col("va"), F.col("vb")).alias("c"))
                .filter(F.col("c") >= t)
            ).collect()
        }
        assert got <= want
        recall = len(got & want) / len(want)
        assert recall >= 0.9, f"IVF near-pairs recall {recall:.3f} < 0.9"

    def test_hot_cap_excludes_megacells(self, spark):
        """Cells whose inverted list exceeds hot_cap are dropped from
        candidacy (the S13 skew-registry analog for cosine space): no capped
        neighbor may belong to an over-cap cell, recomputed independently."""
        from collections import Counter

        from intraarchivededuplicator_spark.operators.ann import INT_SCALE
        from intraarchivededuplicator_spark.operators.ivf import (
            centroid_rows,
            ivf_topk,
        )

        rows = _clustered_vectors()
        df = spark.createDataFrame(rows)
        n_cells, cap = 4, 10
        cents = centroid_rows(df, "vec_id", "embedding", n_cells)
        scaled = {
            r.vec_id: np.copysign(
                np.floor(np.abs(np.array(r.embedding, dtype=np.float64)) * INT_SCALE + 0.5),
                np.array(r.embedding, dtype=np.float64),
            )
            for r in rows
        }

        def cell_of(vid):
            v = scaled[vid]
            best = None
            for cid, cv in cents:
                c = np.array(cv, dtype=np.float64)
                ccos = round(float(v @ c) / (np.sqrt(v @ v) * np.sqrt(c @ c)), 6)
                key = (-ccos, cid)
                if best is None or key < best[0]:
                    best = (key, cid)
            return best[1]

        cell = {vid: cell_of(vid) for vid in scaled}
        sizes = Counter(cell.values())
        over = {c for c, n in sizes.items() if n > cap}
        assert over, "fixture must produce at least one over-cap cell"

        uncapped = ivf_topk(df, k=3, n_cells=n_cells, nprobe=2).collect()
        capped = ivf_topk(df, k=3, n_cells=n_cells, nprobe=2, hot_cap=cap).collect()
        assert any(cell[r["neighbor_id"]] in over for r in uncapped)
        assert all(cell[r["neighbor_id"]] not in over for r in capped)
        got, full = {(r["vec_id"], r["neighbor_id"]) for r in capped}, {
            (r["vec_id"], r["neighbor_id"]) for r in uncapped
        }
        # capping only removes candidates; survivors that remain top-k agree
        assert got - full == set() or all(
            cell[n] not in over for _, n in got - full
        )


def _pix_grid(w, h, phase):
    """Deterministic (r, g, b) pixel grid, varied by phase for distinct frames."""
    return [
        [((x * 31 + phase) % 256, (y * 53 + phase) % 256, ((x + y) * 17 + phase) % 256)
         for x in range(w)]
        for y in range(h)
    ]


def _make_avi(frames_pix, w, h):
    """Minimal-but-genuine RIFF AVI: hdrl(avih, strl(strh 'vids'/'DIB ', strf
    BITMAPINFOHEADER BI_RGB 24bpp)) + movi('00db' bottom-up padded BGR frames)."""

    def chunk(cid, body):
        pad = b"\0" if len(body) % 2 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    stride = (w * 3 + 3) & ~3
    avih = b"\0" * 32 + w.to_bytes(4, "little") + h.to_bytes(4, "little") + b"\0" * 16
    strh = b"vids" + b"DIB " + b"\0" * 48
    strf = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + b"\0" * 20
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(
        b"movi",
        b"".join(
            chunk(
                b"00db",
                b"".join(
                    bytes(b for (r, g, bl) in row for b in (bl, g, r)).ljust(stride, b"\0")
                    for row in reversed(pix)
                ),
            )
            for pix in frames_pix
        ),
    )
    inner = b"AVI " + hdrl + movi
    return b"RIFF" + len(inner).to_bytes(4, "little") + inner


def _media(spark):
    rows = [
        Row(media_id=1, url="http://m/a.png", media_type="image", payload=b"PNG" * 40),
        Row(media_id=2, url="http://m/a2.png", media_type="image", payload=b"PNG" * 40),
        Row(media_id=3, url="http://m/b.mp4", media_type="video", payload=b"MP4" * 99),
        Row(media_id=4, url="http://m/null", media_type="image", payload=None),
    ]
    return spark.createDataFrame(rows)


class TestMultimodal:
    def test_decode_schema_and_determinism(self, spark):
        out = decode_media(_media(spark))
        assert out.schema == DECODED_SCHEMA
        rows = {r["media_id"]: r for r in out.collect()}
        assert rows[1]["features"] == rows[2]["features"]  # same bytes
        assert len(rows[1]["features"]) == FEATURE_DIM
        assert rows[1]["n_frames"] == 1 and rows[3]["n_frames"] > 1
        assert rows[4]["features"] is None and rows[4]["n_bytes"] == 0

    def test_real_backend_decodes_avi_dib_golden(self, spark):
        """decode_backend='real' on genuine video bytes (RIFF AVI with
        uncompressed 24-bit DIB frames — real container, no codec lib):
        dims + frame count from the container, features = temporal mean of
        per-frame aHash, checked against the module's own aHash on the
        independently-decoded pixel grids."""
        import numpy as np

        from intraarchivededuplicator_spark.functions.multimodal import (
            _ahash_features,
        )

        w = h = 16
        f1 = _pix_grid(w, h, 0)
        f2 = _pix_grid(w, h, 5)
        avi = _make_avi([f1, f2], w, h)
        rows = [Row(media_id=1, url="a.avi", media_type="video", payload=avi)]
        out = decode_media(
            spark.createDataFrame(rows, schema=MEDIA_SCHEMA), decode_backend="real"
        ).collect()[0]
        assert (out["width"], out["height"], out["n_frames"]) == (w, h, 2)
        assert len(out["features"]) == FEATURE_DIM
        want = []
        for pix in (f1, f2):
            gray = np.array(
                [[r * 0.299 + g * 0.587 + b * 0.114 for (r, g, b) in row] for row in pix]
            )
            want.append(_ahash_features(gray, grid=8))
        v = np.mean(np.array(want, dtype=np.float64), axis=0)
        v = v / np.linalg.norm(v)
        assert max(abs(a - b) for a, b in zip(out["features"], v)) < 1e-5

    def test_real_backend_single_frame_avi_matches_bmp_features(self, spark):
        """A one-frame AVI and a BMP of the same pixels must yield identical
        features — the temporal pool of a single frame is that frame's aHash,
        so the video pathway is signature-compatible with the image one."""
        w = h = 12
        pix = _pix_grid(w, h, 3)
        avi = _make_avi([pix], w, h)
        stride = (w * 3 + 3) & ~3
        bmp_rows = b"".join(
            bytes(b for (r, g, bl) in row for b in (bl, g, r)).ljust(stride, b"\0")
            for row in reversed(pix)
        )
        bmp = (
            b"BM" + (54 + len(bmp_rows)).to_bytes(4, "little") + b"\0\0\0\0"
            + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(bmp_rows).to_bytes(4, "little")
            + b"\0" * 16 + bmp_rows
        )
        rows = [
            Row(media_id=1, url="a.avi", media_type="video", payload=avi),
            Row(media_id=2, url="a.bmp", media_type="image", payload=bmp),
        ]
        got = {
            r["media_id"]: r
            for r in decode_media(
                spark.createDataFrame(rows, schema=MEDIA_SCHEMA),
                decode_backend="real",
            ).collect()
        }
        assert got[1]["n_frames"] == 1
        assert got[1]["features"] == pytest.approx(got[2]["features"], abs=1e-6)

    def test_real_backend_compressed_or_truncated_video_quarantined(self, spark):
        """Codec-compressed video (no pyav in this container) and truncated
        AVI payloads quarantine (null features) — never a job abort, the same
        contract as audio/images."""
        avi = _make_avi([_pix_grid(16, 16, 0)], 16, 16)
        rows = [
            Row(media_id=1, url="b.mp4", media_type="video", payload=b"MP4" * 99),
            Row(media_id=2, url="t.avi", media_type="video", payload=avi[:100]),
            Row(media_id=3, url="g.avi", media_type="video", payload=avi),
        ]
        got = {
            r["media_id"]: r
            for r in decode_media(
                spark.createDataFrame(rows, schema=MEDIA_SCHEMA),
                decode_backend="real",
            ).collect()
        }
        assert got[1]["features"] is None
        assert got[2]["features"] is None
        assert got[3]["features"] is not None  # the intact twin still decodes

    def test_real_backend_decodes_wav_pcm_golden(self, spark):
        """decode_backend='real' on genuine audio bytes (RIFF WAVE PCM16, no
        codec lib needed), checked against an independently computed RMS
        energy envelope."""
        import math
        import struct

        rate, n = 8000, 1600
        samples = [
            int(12000 * math.sin(2 * math.pi * 440 * t / rate)) for t in range(n)
        ]
        data = b"".join(struct.pack("<h", s) for s in samples)
        wav = (
            b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"data" + len(data).to_bytes(4, "little") + data
        )
        rows = [Row(media_id=1, url="a.wav", media_type="audio", payload=wav)]
        out = decode_media(
            spark.createDataFrame(rows, schema=MEDIA_SCHEMA), decode_backend="real"
        ).collect()[0]
        assert out["n_frames"] == n
        assert len(out["features"]) == FEATURE_DIM
        # independent expectation: plain-Python RMS over 64 equal bins
        xs = [s / 32768.0 for s in samples]
        binsz = n // FEATURE_DIM
        pooled = [
            math.sqrt(
                sum(v * v for v in xs[i * binsz : (i + 1) * binsz]) / binsz
            )
            for i in range(FEATURE_DIM)
        ]
        mean = sum(pooled) / FEATURE_DIM
        cent = [v - mean for v in pooled]
        norm = sum(v * v for v in cent) ** 0.5
        want = [v / norm for v in cent]
        assert max(abs(a - b) for a, b in zip(out["features"], want)) < 1e-5

    def test_real_backend_stereo_8bit_wav_and_bad_audio_quarantined(self, spark):
        """8-bit stereo PCM decodes (channel-mean mono); compressed/garbage
        audio quarantines instead of aborting."""
        n = 256
        # stereo u8: L = 128+i%64, R = 128-(i%64) -> mono mean = exactly 128 (silence)
        data = bytes(
            b for i in range(n) for b in (128 + (i % 64), 128 - (i % 64))
        )
        wav = (
            b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (8).to_bytes(2, "little")
            + b"data" + len(data).to_bytes(4, "little") + data
        )
        rows = [
            Row(media_id=1, url="s.wav", media_type="audio", payload=wav),
            Row(media_id=2, url="x.mp3", media_type="audio", payload=b"\xff\xfb" * 99),
        ]
        got = {
            r["media_id"]: r
            for r in decode_media(
                spark.createDataFrame(rows, schema=MEDIA_SCHEMA),
                decode_backend="real",
            ).collect()
        }
        assert got[1]["n_frames"] == n and len(got[1]["features"]) == FEATURE_DIM
        assert got[2]["features"] is None

    def test_real_backend_decodes_ppm_golden(self, spark):
        """decode_backend='real' on genuine image bytes (binary PPM, no codec
        needed), checked against an independently computed luma + mean-pool."""
        w = h = 16
        px = bytearray()
        for y in range(h):
            for x in range(w):
                px += bytes([(x * 16) % 256, (y * 16) % 256, (x * y) % 256])
        ppm = b"P6\n# golden\n16 16\n255\n" + bytes(px)
        rows = [Row(media_id=1, url="p.ppm", media_type="image", payload=ppm)]
        out = decode_media(
            spark.createDataFrame(rows, schema=MEDIA_SCHEMA), decode_backend="real"
        ).collect()[0]
        assert (out["width"], out["height"]) == (16, 16)
        assert len(out["features"]) == FEATURE_DIM
        # independent expectation: plain-Python luma + 2x2 block means
        gray = [
            [
                px[(y * w + x) * 3] * 0.299
                + px[(y * w + x) * 3 + 1] * 0.587
                + px[(y * w + x) * 3 + 2] * 0.114
                for x in range(w)
            ]
            for y in range(h)
        ]
        pooled = [
            sum(gray[2 * gy + dy][2 * gx + dx] for dy in (0, 1) for dx in (0, 1)) / 4
            for gy in range(8)
            for gx in range(8)
        ]
        mean = sum(pooled) / 64
        cent = [v - mean for v in pooled]
        norm = sum(v * v for v in cent) ** 0.5
        want = [v / norm for v in cent]
        got = out["features"]
        assert max(abs(a - b) for a, b in zip(got, want)) < 1e-5

    def test_real_backend_ppm_bmp_same_pixels_same_features(self, spark):
        """The same pixel grid through two real container formats (PPM P6 and
        bottom-up 24-bit BMP) must decode to identical features — format
        plumbing must not leak into the signature."""
        w = h = 8
        pix = [
            [(x * 31 % 256, y * 53 % 256, (x + y) * 17 % 256) for x in range(w)]
            for y in range(h)
        ]
        ppm = b"P6\n8 8\n255\n" + bytes(
            b for row in pix for (r, g, bl) in row for b in (r, g, bl)
        )
        stride = (w * 3 + 3) & ~3
        bmp_rows = b"".join(
            bytes(b for (r, g, bl) in row for b in (bl, g, r)).ljust(stride, b"\0")
            for row in reversed(pix)
        )
        bmp = (
            b"BM"
            + (54 + len(bmp_rows)).to_bytes(4, "little")
            + b"\0\0\0\0"
            + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little")
            + h.to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(bmp_rows).to_bytes(4, "little")
            + b"\0" * 16
            + bmp_rows
        )
        rows = [
            Row(media_id=1, url="a.ppm", media_type="image", payload=ppm),
            Row(media_id=2, url="a.bmp", media_type="image", payload=bmp),
        ]
        got = {
            r["media_id"]: r
            for r in decode_media(
                spark.createDataFrame(rows, schema=MEDIA_SCHEMA),
                decode_backend="real",
            ).collect()
        }
        assert (got[1]["width"], got[1]["height"]) == (8, 8)
        assert got[1]["features"] == got[2]["features"]

    def test_real_backend_pil_png(self, spark):
        """PIL pathway when installed; skips cleanly in codec-free containers."""
        PILImage = pytest.importorskip("PIL.Image")
        import io

        im = PILImage.new("RGB", (16, 16), (120, 30, 200))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        rows = [
            Row(media_id=1, url="c.png", media_type="image", payload=buf.getvalue())
        ]
        out = decode_media(
            spark.createDataFrame(rows, schema=MEDIA_SCHEMA), decode_backend="real"
        ).collect()[0]
        assert (out["width"], out["height"]) == (16, 16)
        assert len(out["features"]) == FEATURE_DIM

    def test_real_backend_undecodable_image_quarantined(self, spark):
        rows = [
            Row(media_id=1, url="x.bin", media_type="image", payload=b"\xff" * 64)
        ]
        out = decode_media(
            spark.createDataFrame(rows, schema=MEDIA_SCHEMA), decode_backend="real"
        ).collect()[0]
        assert out["features"] is None and out["n_bytes"] == 64

    def test_real_backend_truncated_ppm_quarantined_not_abort(self, spark):
        """ADVICE r4: a header that declares more pixels than the payload
        carries (truncated/corrupt file) must quarantine, never abort the job
        — np.frombuffer with count= raises ValueError without the pre-check."""
        ppm = b"P6\n10000 10000\n255\n" + b"\x01" * 300  # header lies
        rows = [Row(media_id=1, url="t.ppm", media_type="image", payload=ppm)]
        out = decode_media(
            spark.createDataFrame(rows, schema=MEDIA_SCHEMA), decode_backend="real"
        ).collect()[0]
        assert out["features"] is None

    def test_real_backend_tiny_image_features_quarantined(self, spark):
        """ADVICE r4: images smaller than the 8x8 pooling grid (1x1 tracking
        pixels etc.) must yield null features, not NaN vectors that poison the
        downstream cosine-LSH. Dims are still recorded — the decode worked."""
        tiny = b"P6\n2 2\n255\n" + bytes(range(12))
        rows = [Row(media_id=1, url="t.ppm", media_type="image", payload=tiny)]
        out = decode_media(
            spark.createDataFrame(rows, schema=MEDIA_SCHEMA), decode_backend="real"
        ).collect()[0]
        assert out["features"] is None
        assert (out["width"], out["height"]) == (2, 2)

    def test_real_backend_builtin_parser_beats_pil_for_ppm(self):
        """ADVICE r4: PPM/BMP must decode through the dependency-free parsers
        even when PIL is installed, so a given payload yields bit-identical
        features on heterogeneous executors (PIL's convert('L') rounds luma
        to uint8; the built-ins keep float). Direct-kernel test: the batch
        output must equal the built-in parser's features exactly."""
        import pandas as pd

        from intraarchivededuplicator_spark.functions.multimodal import (
            _ahash_features,
            _parse_ppm,
            _real_decode_batch,
        )

        w = h = 8
        px = bytes((x * 37 + y * 11) % 256 for y in range(h) for x in range(w * 3))
        ppm = b"P6\n8 8\n255\n" + px
        out = _real_decode_batch(pd.Series([ppm]), pd.Series(["image"]))
        want = _ahash_features(_parse_ppm(ppm), grid=8)
        assert out["features"][0] == want

    def test_frame_sample(self, spark):
        dec = decode_media(_media(spark))
        frames = frame_sample(dec, every_n=10, max_frames=4).collect()
        assert all(r["media_id"] == 3 for r in frames)
        assert len(frames) <= 4 and frames[0]["frame_idx"] == 0

    def test_media_near_dup_identical_payloads_pair_up(self, spark):
        dec = decode_media(_media(spark))
        pairs = media_near_dup_pairs(dec, hamming_radius=4).collect()
        assert {(p["id_lo"], p["id_hi"]) for p in pairs} == {(1, 2)}

    def test_media_near_dup_ivf_route_matches_lsh_and_planted_set(self, spark):
        """The IVF candidate route and the hyperplane-LSH route recover the
        SAME pair set on the planted-duplicate synth corpus — and it is
        exactly the arithmetic planted set (the oracle the driver gates
        media_near_dup_pairs_ivf against). Planted payloads are byte-equal,
        so their features quantize to the same cell (candidacy guaranteed)
        with exact cosine 1.0; measured non-planted candidate cosines top
        out ~0.68, well under the 0.98 threshold."""
        from intraarchivededuplicator_spark.fixtures.synth import synthesize_media
        from intraarchivededuplicator_spark.functions.multimodal import (
            media_near_dup_pairs_ivf,
        )

        docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
        dec = decode_media(
            synthesize_media(docs, dup_stride=3), decode_backend="real"
        ).persist()
        planted = {(i - 3, i) for i in range(3, 200) if i % 10 == 7}
        lsh = {
            (p["id_lo"], p["id_hi"])
            for p in media_near_dup_pairs(dec, hamming_radius=4).collect()
        }
        ivf = {
            (p["id_lo"], p["id_hi"])
            for p in media_near_dup_pairs_ivf(dec, threshold=0.98).collect()
        }
        assert lsh == planted
        assert ivf == planted
        # the IVF route also holds under the Lloyd-refined quantizer — the
        # (cell_id, cvec) swap-in contract leaves exactness untouched
        km = {
            (p["id_lo"], p["id_hi"])
            for p in media_near_dup_pairs_ivf(
                dec, threshold=0.98, quantizer="kmeans"
            ).collect()
        }
        dec.unpersist()
        assert km == planted


class TestStreamingMediaDecode:
    """decode_media is a stateless mapInPandas stage, so the batch operator
    chain runs unchanged on a Structured Streaming file source — and the
    file-source log gives exactly-once per landed file across restarts."""

    def test_stream_decode_matches_batch_and_is_incremental(self, spark, tmp_path):
        from intraarchivededuplicator_spark.functions.multimodal import (
            MEDIA_SCHEMA,
            decode_media,
        )
        from intraarchivededuplicator_spark.streaming.ingest_stream import (
            stream_media,
        )

        landing = str(tmp_path / "landing")
        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "decoded")
        avi = _make_avi([_pix_grid(16, 16, 0)], 16, 16)
        batch1 = [
            Row(media_id=1, url="a.avi", media_type="video", payload=avi),
            Row(media_id=2, url="x.mp4", media_type="video", payload=b"MP4" * 9),
        ]
        spark.createDataFrame(batch1, schema=MEDIA_SCHEMA).write.mode(
            "append"
        ).parquet(landing)

        def run_stream():
            q = (
                decode_media(stream_media(spark, landing), decode_backend="real")
                .writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_stream()
        got1 = {
            r["media_id"]: r for r in spark.read.parquet(out_dir).collect()
        }
        assert set(got1) == {1, 2}
        # stream output equals the batch operator on the same rows
        want = {
            r["media_id"]: r
            for r in decode_media(
                spark.createDataFrame(batch1, schema=MEDIA_SCHEMA),
                decode_backend="real",
            ).collect()
        }
        assert got1[1]["features"] == want[1]["features"]
        assert got1[2]["features"] is None  # quarantine flows through the stream

        # land a second file; restart from the checkpoint: only the new row
        # is decoded (file-source exactly-once), previous rows not re-emitted
        batch2 = [Row(media_id=3, url="b.avi", media_type="video", payload=avi)]
        spark.createDataFrame(batch2, schema=MEDIA_SCHEMA).write.mode(
            "append"
        ).parquet(landing)
        run_stream()
        ids = sorted(r["media_id"] for r in spark.read.parquet(out_dir).collect())
        assert ids == [1, 2, 3], ids


class TestIvfOracleContract:
    def test_hot_cap_parity_vs_duckdb_oracle(self, spark, tmp_path):
        """hot_cap is part of the differential spec: the oracle's
        members-cap CTE (GROUP BY cell_id HAVING count(*) <= cap semi-join)
        must reproduce the engine's capped candidacy row-for-row (ADVICE r4:
        previously the cap had no SQL counterpart, so capped plans silently
        left the hash-exact contract)."""
        import duckdb
        import pandas as pd

        from intraarchivededuplicator_spark.operators.ivf import ivf_topk
        from intraarchivededuplicator_spark.plans.oracle import (
            sql_embedding_knn_ivf,
        )

        rows = _clustered_vectors()
        pdf = pd.DataFrame(
            {
                "vec_id": [r.vec_id for r in rows],
                "embedding": [
                    np.array(r.embedding, dtype=np.float32) for r in rows
                ],
            }
        )
        path = str(tmp_path / "embeddings.parquet")
        pdf.to_parquet(path)
        n_cells, nprobe, cap = 4, 2, 10

        emb = spark.read.parquet(path)
        capped = sorted(
            (r["vec_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in ivf_topk(
                emb, k=3, n_cells=n_cells, nprobe=nprobe, hot_cap=cap
            ).collect()
        )
        uncapped = sorted(
            (r["vec_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in ivf_topk(emb, k=3, n_cells=n_cells, nprobe=nprobe).collect()
        )
        assert capped != uncapped  # the cap must actually bite here

        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
        from intraarchivededuplicator_spark.operators.ann import INT_SCALE

        want = sorted(
            map(tuple, con.sql(
                sql_embedding_knn_ivf(
                    INT_SCALE, k=3, n_cells=n_cells, nprobe=nprobe, hot_cap=cap
                )
            ).fetchall())
        )
        assert capped == want


class TestNegativeZeroNormalization:
    def test_rounded_negative_zero_ranks_and_hashes_as_plus_zero(
        self, spark, tmp_path
    ):
        """A cosine whose 6-decimal rounding lands on -0.0 must come out of
        BOTH engines as +0.0 (the `+ 0.0` normalization, ADVICE r4): the
        driver's value hash distinguishes '-0.0' from '0.0', and a mixed
        {-0.0, +0.0} candidate set could otherwise rank differently."""
        import math

        import duckdb
        import pandas as pd

        from intraarchivededuplicator_spark.operators.ivf import ivf_topk
        from intraarchivededuplicator_spark.plans.oracle import (
            sql_embedding_knn_ivf,
        )

        # scaled (INT_SCALE) vectors: v0=[1000000,1], v1=[1,-1000001],
        # v2=[-1,1000001]. dot(v0,v1) = -1 -> cosine ~ -1e-12 -> round6
        # = -0.0; dot(v0,v2) = +1 -> +0.0. One zero pair on each side of
        # the sign exercises the tie normalization.
        vecs = [
            (0, [1.0, 1e-6]),
            (1, [1e-6, -1.000001]),
            (2, [-1e-6, 1.000001]),
            (3, [0.9, 0.1]),
        ]
        pdf = pd.DataFrame(
            {
                "vec_id": [v[0] for v in vecs],
                "embedding": [np.array(v[1], dtype=np.float32) for v in vecs],
            }
        )
        path = str(tmp_path / "embeddings.parquet")
        pdf.to_parquet(path)

        # nprobe == n_cells: exhaustive probing, so every pair is scored and
        # the zero-cosine rows are guaranteed into the output window
        got = sorted(
            (r["vec_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in ivf_topk(
                spark.read.parquet(path), k=3, n_cells=2, nprobe=2
            ).collect()
        )
        zeros = [t for t in got if t[3] == 0.0]
        assert zeros, "fixture must produce a rounded-zero cosine"
        for t in zeros:
            assert math.copysign(1.0, t[3]) == 1.0, f"-0.0 leaked: {t}"

        from intraarchivededuplicator_spark.operators.ann import INT_SCALE

        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
        want = sorted(
            map(tuple, con.sql(
                sql_embedding_knn_ivf(INT_SCALE, k=3, n_cells=2, nprobe=2)
            ).fetchall())
        )
        assert got == want
        for t in want:
            if t[3] == 0.0:
                assert math.copysign(1.0, t[3]) == 1.0


class TestBatchSignatureKernel:
    def test_batch_kernel_bit_identical(self, spark):
        """The batched (m x dim) @ (dim x n_planes) kernel must reproduce the
        per-row matvec reference bit-for-bit, including null / wrong-dim
        rows (VERDICT r4 "What's wrong" #1: same int64 fixed-point sign
        test, one matmul per Arrow batch instead of a Python loop)."""
        from intraarchivededuplicator_spark.operators.ann import (
            INT_SCALE,
            hyperplanes_int,
            make_hyperplane_udf,
        )

        rng = np.random.default_rng(123)
        rows = [(i, [float(x) for x in rng.standard_normal(DIM)])
                for i in range(200)]
        rows += [(900, None), (901, [0.5] * (DIM - 1))]  # null + wrong dim
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        udf = make_hyperplane_udf(DIM, seed=42)
        got = {
            r["vec_id"]: r["s"]
            for r in df.select(
                "vec_id", udf(F.col("embedding").cast("array<double>")).alias("s")
            ).collect()
        }

        planes = hyperplanes_int(DIM, seed=42)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for vid, v in rows:
            if v is None or len(v) != DIM:
                assert got[vid] == 0
                continue
            x = np.asarray(v, dtype=np.float64) * INT_SCALE
            xi = np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)
            bits = (planes @ xi) >= 0
            want = np.int64(np.uint64((bits.astype(np.uint64) * weights).sum()))
            assert got[vid] == want, vid


class TestKmeansQuantizer:
    def test_zero_iter_is_the_sampled_quantizer(self, spark):
        from intraarchivededuplicator_spark.operators.ivf import (
            _scaled_vecs,
            _sample_centroids,
            kmeans_centroids,
        )

        df = spark.createDataFrame(_clustered_vectors())
        vecs = _scaled_vecs(df, "vec_id", "embedding")
        assert kmeans_centroids(vecs, 4, n_iter=0) == _sample_centroids(vecs, 4)

    def test_deterministic_across_partitionings(self, spark):
        from intraarchivededuplicator_spark.operators.ivf import (
            _scaled_vecs,
            kmeans_centroids,
        )

        df = spark.createDataFrame(_clustered_vectors())
        a = kmeans_centroids(_scaled_vecs(df, "vec_id", "embedding"), 6, 3)
        b = kmeans_centroids(
            _scaled_vecs(df.repartition(7), "vec_id", "embedding"), 6, 3
        )
        assert a == b

    def test_full_probe_equals_exact_regardless_of_quantizer(self, spark):
        """nprobe == n_cells must degenerate to exhaustive search whatever
        the quantizer — the downstream-contract check for the swap-in."""
        from intraarchivededuplicator_spark.operators.ivf import ivf_topk

        df = spark.createDataFrame(_clustered_vectors()[:40])
        kw = dict(k=3, n_cells=4, nprobe=4)
        got = sorted(
            map(tuple, ivf_topk(df, quantizer="kmeans", kmeans_iter=2, **kw).collect())
        )
        want = sorted(map(tuple, ivf_topk(df, **kw).collect()))
        assert got == want

    def test_refined_quantizer_recall_not_worse_on_clustered_data(self, spark):
        """On cluster-structured vectors Lloyd refinement should recover at
        least the sampled quantizer's near-pair recall at the same
        (n_cells, nprobe) — the reason the swap-in exists."""
        from intraarchivededuplicator_spark.operators.ivf import ivf_near_pairs

        df = spark.createDataFrame(_clustered_vectors())
        t = 0.9
        exact = {
            (r["id_lo"], r["id_hi"])
            for r in ivf_near_pairs(df, threshold=t, n_cells=8, nprobe=8).collect()
        }
        assert exact
        kw = dict(threshold=t, n_cells=8, nprobe=2)
        sampled = {
            (r["id_lo"], r["id_hi"]) for r in ivf_near_pairs(df, **kw).collect()
        }
        kmeans = {
            (r["id_lo"], r["id_hi"])
            for r in ivf_near_pairs(
                df, quantizer="kmeans", kmeans_iter=3, **kw
            ).collect()
        }
        r_sampled = len(sampled & exact) / len(exact)
        r_kmeans = len(kmeans & exact) / len(exact)
        assert r_kmeans >= r_sampled
        assert r_kmeans >= 0.9


class TestAnnRecallAudit:
    @pytest.mark.parametrize("family", ["ivf", "lsh"])
    def test_composition_and_floor(self, spark, family):
        """The recall audits recomputed from the two gated top-k outputs
        they intersect (set intersection in Python): counts and the rounded
        recall must match, and the sf0.001 config must exercise both
        perfect and imperfect recall rows so the audit is non-trivial."""
        from intraarchivededuplicator_spark.plans import queries as q

        sf = "/root/testdata/sf0.001"
        ann_q = (
            q.q_embedding_knn_ivf if family == "ivf" else q.q_embedding_knn_ann
        )
        audit_q = (
            q.q_ann_recall_audit if family == "ivf" else q.q_lsh_recall_audit
        )
        exact: dict[int, set[int]] = {}
        for r in q.q_embedding_knn(spark, sf).collect():
            exact.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        ann: dict[int, set[int]] = {}
        for r in ann_q(spark, sf).collect():
            ann.setdefault(r["vec_id"], set()).add(r["neighbor_id"])

        got = {
            r["vec_id"]: (
                r["n_exact"],
                r["n_ann"],
                r["n_matched"],
                r["recall"],
            )
            for r in audit_q(spark, sf).collect()
        }
        assert set(got) == set(exact)
        for v, e in exact.items():
            a = ann.get(v, set())
            m = len(e & a)
            assert got[v][:3] == (len(e), len(a), m), v
            assert got[v][3] == round(m / len(e), 6), v
        recalls = [g[3] for g in got.values()]
        assert any(r > 0.0 for r in recalls)
        assert any(r < 1.0 for r in recalls)
        # random sf0.001 vectors: IVF (nprobe 4/16) measured mean ~0.486,
        # LSH (radius 28) is far sparser on non-clustered data; the floors
        # only guard against a degenerate all-zero-recall audit
        floor = 0.3 if family == "ivf" else 0.01
        assert sum(recalls) / len(recalls) >= floor
