"""Quarantine-contract fuzzing for the dependency-free media parsers.

ADVICE r3 flagged two parser crash paths (PPM frombuffer on truncated
payloads, NaN features below the pooling grid) that violated the documented
contract — undecodable payloads must yield None, NEVER an exception that
aborts the Spark job (the scanner's per-file IOError discipline,
/root/reference/scanner/fileHasher.py:406-430). This module pins that class
of bug for every built-in parser at once: arbitrary bytes, truncations at
every prefix length, and adversarial header-size lies must all return None
or a well-formed value. Pure Python (no SparkSession) so the whole matrix
runs in seconds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from intraarchivededuplicator_spark.functions.multimodal import (
    _builtin_video,
    _energy_features,
    _parse_avi_dib,
    _parse_bmp,
    _parse_ppm,
    _parse_wav_pcm,
)
from tests.test_ann_multimodal import _make_avi, _pix_grid

PARSERS = [_parse_ppm, _parse_bmp, _parse_wav_pcm, _parse_avi_dib, _builtin_video]


def _valid_payloads() -> dict[str, bytes]:
    w = h = 16
    pix = _pix_grid(w, h, 0)
    ppm = b"P6\n16 16\n255\n" + bytes(
        b for row in pix for (r, g, bl) in row for b in (r, g, bl)
    )
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
    data = bytes((i * 7) % 256 for i in range(512))
    wav = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    avi = _make_avi([pix, _pix_grid(w, h, 9)], w, h)
    return {"ppm": ppm, "bmp": bmp, "wav": wav, "avi": avi}


class TestFuzzQuarantine:
    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=4096))
    def test_arbitrary_bytes_never_raise(self, raw):
        for p in PARSERS:
            p(raw)  # None or a value — any exception fails the test

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=1, max_size=512))
    def test_arbitrary_bytes_with_magic_prefixes_never_raise(self, tail):
        """Payloads that pass the magic-byte check but carry garbage bodies —
        the adversarial region the plain-binary strategy rarely reaches."""
        for magic in (b"P6\n", b"P5\n", b"BM", b"RIFF" + tail[:4] + b"WAVE",
                      b"RIFF" + tail[:4] + b"AVI "):
            for p in PARSERS:
                p(magic + tail)

    def test_every_prefix_truncation_never_raises(self):
        """Each valid payload cut at EVERY prefix length: None or a value,
        no exception (the exact ADVICE r3 PPM failure mode, generalized)."""
        for name, payload in _valid_payloads().items():
            for cut in range(len(payload)):
                for p in PARSERS:
                    p(payload[:cut])

    def test_header_size_lies_never_raise(self):
        """Flip every 4-byte window of the header region to 0xFFFFFFFF (the
        'header-declared size lies' class): parsers must bound all reads by
        the actual buffer length."""
        for name, payload in _valid_payloads().items():
            hdr = min(len(payload), 96)
            for off in range(0, hdr - 4):
                mutated = payload[:off] + b"\xff\xff\xff\xff" + payload[off + 4 :]
                for p in PARSERS:
                    out = p(mutated)
                    if out is not None and name in ("ppm", "bmp") and p in (
                        _parse_ppm, _parse_bmp
                    ):
                        assert np.isfinite(np.asarray(out)).all()

    def test_valid_payloads_still_parse(self):
        """The fuzz guards must not have been satisfied by rejecting
        everything: the intact payloads decode."""
        v = _valid_payloads()
        assert _parse_ppm(v["ppm"]) is not None
        assert _parse_bmp(v["bmp"]) is not None
        assert _parse_wav_pcm(v["wav"]) is not None
        parsed = _parse_avi_dib(v["avi"])
        assert parsed is not None and len(parsed[0]) == 2
        out = _builtin_video(v["avi"])
        assert out is not None and out[2] == 2
        assert np.isfinite(out[3]).all()

    def test_energy_features_never_nan(self):
        """Sub-grid and degenerate audio quarantines (None), never NaN —
        the audio twin of the ADVICE r3 tiny-image NaN finding."""
        assert _energy_features(np.zeros(3)) is None
        silent = _energy_features(np.zeros(4096))
        assert silent is not None and np.isfinite(silent).all()


class TestEncoderRoundtrip:
    """The resize stage's encoders must be exact inverses of the parsers —
    a resize->decode pipeline otherwise drifts per hop."""

    def test_pgm_roundtrip_exact(self):
        from intraarchivededuplicator_spark.functions.multimodal import _encode_pgm

        rng = np.random.default_rng(11)
        g = rng.uniform(0, 255, (9, 13))
        back = _parse_ppm(_encode_pgm(g))
        assert back is not None and back.shape == (9, 13)
        assert np.array_equal(back, np.round(g))

    def test_wav_pcm16_roundtrip_close(self):
        from intraarchivededuplicator_spark.functions.multimodal import (
            _encode_wav_pcm16,
        )

        rng = np.random.default_rng(12)
        mono = rng.uniform(-1, 1, 500)
        parsed = _parse_wav_pcm(_encode_wav_pcm16(mono, 4000))
        assert parsed is not None
        back, rate = parsed
        assert rate == 4000 and len(back) == 500
        # encode scales by 32767, decode divides by 32768: half-LSB rounding
        # plus the scale mismatch bounds the error at ~1.5 LSB
        assert np.abs(back - mono).max() < 2.0 / 32768

    def test_avi_dib_roundtrip_exact(self):
        from intraarchivededuplicator_spark.functions.multimodal import (
            _encode_avi_dib,
        )

        rng = np.random.default_rng(13)
        frames = [rng.uniform(0, 255, (11, 7)) for _ in range(3)]
        parsed = _parse_avi_dib(_encode_avi_dib(frames))
        assert parsed is not None
        back, w, h = parsed
        assert (w, h, len(back)) == (7, 11, 3)
        for orig, got in zip(frames, back):
            # luma of gray replicated to BGR is the gray value exactly
            assert np.allclose(got, np.round(orig))

    def test_resize_gray_nearest_semantics(self):
        from intraarchivededuplicator_spark.functions.multimodal import _resize_gray

        g = np.arange(16, dtype=np.float64).reshape(4, 4)
        up = _resize_gray(g, 8, 8)
        assert up.shape == (8, 8)
        # each source pixel becomes a 2x2 block (nearest-neighbor upscale)
        assert np.array_equal(up[::2, ::2], g) and np.array_equal(up[1::2, 1::2], g)
        down = _resize_gray(g, 2, 2)
        assert np.array_equal(down, g[np.ix_([0, 2], [0, 2])])


class TestPlantedDupMargin:
    def test_signature_margin_supports_radius4_oracle(self):
        """q_media_near_dup_pairs' DuckDB oracle is exact only while planted
        pairs are signature-identical AND every non-planted pair — cross-type
        included, since the LSH join does not partition by media_type — sits
        well above the radius-4 join. Pin both properties over the full
        sf0.01 id range (500 docs, all type/dim/length combinations) so a
        content-kernel change that flattens features fails here, not in the
        driver gate."""
        from intraarchivededuplicator_spark.fixtures.synth import media_payload
        from intraarchivededuplicator_spark.functions import multimodal as mm
        from intraarchivededuplicator_spark.operators.ann import (
            INT_SCALE,
            hyperplanes_int,
        )

        def decode_one(mt, raw):
            if mt == "image":
                return mm._ahash_features(mm._parse_ppm(raw), grid=8)
            if mt == "audio":
                return mm._energy_features(mm._parse_wav_pcm(raw)[0])
            return mm._builtin_video(raw)[3]

        planes = hyperplanes_int(64, 64, 42)

        def sig(v):
            x = np.asarray(v, dtype=np.float64) * INT_SCALE
            xi = np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)
            return ((planes @ xi) >= 0).astype(np.uint8)

        n = 500  # the full sf0.01 doc_id range the driver gate runs
        sigs = np.empty((n, 64), dtype=np.uint8)
        for d in range(n):
            mt, raw = media_payload(d, dup_stride=3)
            f = decode_one(mt, raw)
            assert f is not None, (d, mt)
            sigs[d] = sig(f)
        planted = {(d - 3, d) for d in range(n) if d % 10 == 7 and d >= 3}
        # all-pairs Hamming matrix in one vectorized pass
        ham = (sigs[:, None, :] != sigs[None, :, :]).sum(axis=2)
        for i in range(n):
            for j in range(i + 1, n):
                if (i, j) in planted:
                    assert ham[i, j] == 0, f"planted pair {(i, j)} not identical"
                else:
                    assert ham[i, j] >= 8, (
                        f"margin eroded: pair {(i, j)} at {ham[i, j]} bits"
                    )


class TestUnknownMediaTypeQuarantine:
    """Unknown/null media_type must quarantine, not raise: under a
    streaming source a raise re-fails on every restart (the file-source log
    re-reads the same poison file forever). Pure-Python check of the batch
    kernels the stream reuses."""

    def test_decode_batch_quarantines_unknown_type(self):
        import pandas as pd

        from intraarchivededuplicator_spark.functions.multimodal import (
            _real_decode_batch,
        )

        out = _real_decode_batch(
            pd.Series([b"GIF89a....", b"x", None]),
            pd.Series(["gif", None, "image"]),
        )
        assert list(out["features"]) == [None, None, None]
