"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md).

Schema per BASELINE input_hint: (url, warc_ts, html:binary, text, lang) plus
a sidecar truth table (url, dup_class, cluster_gt, base_url). Duplicate
classes mirror the reference's fixture corpus structure
(/root/reference/Tests/baseArchiveTestSetup.py:20-228): unique / exact_dup /
near_dup / containment / template_clone / degenerate / hot_cluster.

Single numpy seed drives everything; no global random state; text is plain
space-joined tokens so the HTML round-trip invariant (extract(render(text))
== text, byte-identical) is testable.
"""

from __future__ import annotations

import html as _html
import shutil
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

CLASS_FRACTIONS = [
    ("unique", 0.55),
    ("exact_dup", 0.10),
    ("near_dup", 0.15),
    ("containment", 0.05),
    ("template_clone", 0.05),
    ("degenerate", 0.05),
    ("hot_cluster", 0.05),
]

TEMPLATES = [
    (
        "<html><head><title>{title}</title></head><body>"
        '<nav class="top">home | about | contact</nav>'
        "<main>{body}</main>"
        "<footer>(c) example {year}</footer></body></html>"
    ),
    (
        "<html><body><header><h1>{title}</h1><ul><li>a</li><li>b</li></ul></header>"
        "<main>{body}</main>"
        '<div class="ads">buy things</div><footer>legal</footer></body></html>'
    ),
    (
        '<html><body><div id="wrap"><aside>sidebar junk</aside>'
        "<main>{body}</main>"
        "<script>var x = 1;</script></div></body></html>"
    ),
]


def render_html(text: str, template_id: int, title: str = "page") -> bytes:
    """Wrap body text in boilerplate; body is HTML-escaped so extraction can
    recover it byte-identically."""
    tpl = TEMPLATES[template_id % len(TEMPLATES)]
    return tpl.format(title=title, body=_html.escape(text), year=2025).encode("utf-8")


@dataclass
class SynthCorpus:
    pages: pd.DataFrame  # url, warc_ts, html, text, lang
    truth: pd.DataFrame  # url, dup_class, cluster_gt, base_url


def _zipf_text(rng: np.random.RandomState, n_tokens: int, vocab: int = 2000) -> list[str]:
    # zipfian token ids; clip to vocab
    ids = rng.zipf(1.3, size=n_tokens) % vocab
    return [f"w{i}" for i in ids]


def gen_pages(
    n_rows: int = 1000,
    seed: int = 42,
    n_sites: int | None = None,
    min_tokens: int = 200,
    max_tokens: int = 2000,
    class_fractions: list[tuple[str, float]] | None = None,
) -> SynthCorpus:
    rng = np.random.RandomState(seed)
    n_sites = n_sites or max(4, n_rows // 25)

    fractions = class_fractions or CLASS_FRACTIONS
    names = [c for c, _ in fractions]
    probs = np.array([f for _, f in fractions])
    classes = rng.choice(len(names), size=n_rows, p=probs / probs.sum())

    # hot cluster shares one base text
    hot_base_tokens = _zipf_text(rng, int(rng.randint(min_tokens, max_tokens)))

    texts: list[str] = []
    dup_class: list[str] = []
    base_of: list[int] = []  # ground-truth linked base row (-1 = none)
    token_store: list[list[str] | None] = []
    base_pool: list[int] = []  # rows eligible to serve as dup bases

    for i in range(n_rows):
        cls = names[classes[i]]
        if cls in ("exact_dup", "near_dup", "containment") and not base_pool:
            cls = "unique"
        if cls == "unique" or cls == "template_clone":
            toks = _zipf_text(rng, int(rng.randint(min_tokens, max_tokens)))
            texts.append(" ".join(toks))
            token_store.append(toks)
            base_of.append(-1)
            if cls == "unique":
                base_pool.append(i)
        elif cls == "exact_dup":
            b = int(base_pool[rng.randint(len(base_pool))])
            texts.append(texts[b])
            token_store.append(token_store[b])
            base_of.append(b)
        elif cls == "near_dup":
            b = int(base_pool[rng.randint(len(base_pool))])
            toks = list(token_store[b])
            # perturb 1-3 token positions; drop a small tail (quality_pair:
            # asymmetric lengths, /root/reference/deduplicator/ProcessArchive.py:451-457)
            for _ in range(int(rng.randint(1, 4))):
                toks[int(rng.randint(len(toks)))] = f"x{int(rng.randint(10_000))}"
            if rng.rand() < 0.5 and len(toks) > 20:
                toks = toks[: -int(rng.randint(1, 6))]
            texts.append(" ".join(toks))
            token_store.append(toks)
            base_of.append(b)
        elif cls == "containment":
            b = int(base_pool[rng.randint(len(base_pool))])
            pad = max(10, int(0.2 * len(token_store[b])))
            prefix = _zipf_text(rng, int(rng.randint(pad, 2 * pad)))
            suffix = _zipf_text(rng, int(rng.randint(pad, 2 * pad)))
            toks = prefix + list(token_store[b]) + suffix
            texts.append(" ".join(toks))
            token_store.append(toks)
            base_of.append(b)
        elif cls == "degenerate":
            texts.append("" if rng.rand() < 0.5 else "   ")
            token_store.append(None)
            base_of.append(-1)
        elif cls == "hot_cluster":
            toks = list(hot_base_tokens)
            k = int(rng.randint(0, 3))
            for _ in range(k):
                toks[int(rng.randint(len(toks)))] = f"h{int(rng.randint(1000))}"
            texts.append(" ".join(toks))
            token_store.append(toks)
            base_of.append(-2)  # member of the hot component
        dup_class.append(cls)

    # urls / sites / templates / langs
    sites = rng.randint(0, n_sites, size=n_rows)
    template_ids = rng.randint(0, len(TEMPLATES), size=n_rows)
    langs = rng.choice(["en", "de", "ja"], size=n_rows, p=[0.9, 0.05, 0.05])
    urls = [
        f"https://site{sites[i]:04d}.example/p/{i:06d}" for i in range(n_rows)
    ]
    # exact_dup must live under a different site + template than its base
    for i in range(n_rows):
        if dup_class[i] == "exact_dup":
            b = base_of[i]
            if sites[i] == sites[b]:
                sites[i] = (sites[b] + 1) % n_sites
                urls[i] = f"https://site{sites[i]:04d}.example/p/{i:06d}"
            if template_ids[i] == template_ids[b]:
                template_ids[i] = (template_ids[b] + 1) % len(TEMPLATES)

    htmls = [
        render_html(texts[i], int(template_ids[i]), title=f"doc {i}")
        for i in range(n_rows)
    ]
    ts = [EPOCH + timedelta(seconds=17 * i) for i in range(n_rows)]

    # ground-truth clusters: transitive closure over injected relations
    parent = list(range(n_rows))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    hot_members = [i for i in range(n_rows) if base_of[i] == -2]
    for i in range(n_rows):
        if base_of[i] >= 0:
            union(i, base_of[i])
    for i in hot_members[1:]:
        union(i, hot_members[0])

    cluster_gt = [find(i) for i in range(n_rows)]

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )
    truth = pd.DataFrame(
        {
            "url": urls,
            "dup_class": dup_class,
            "cluster_gt": cluster_gt,
            "base_url": [urls[b] if b >= 0 else None for b in base_of],
        }
    )
    return SynthCorpus(pages=pages, truth=truth)


def write_parquet(corpus: SynthCorpus, out_dir: str) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    # Layout matters for scan parallelism: pandas' default to_parquet writes
    # ONE file with ONE row group, and a row group is assignable to exactly
    # one Spark scan task — every read of the corpus then starts with a
    # single-threaded decompress of the whole table, a fixed serial term that
    # caps measured scaling efficiency (and Spark's 128 MiB maxPartitionBytes
    # split floor means finer row groups alone don't help). Shard into ~8 MiB
    # files so the scan fans out at any parallelism level — the miniature of
    # writing a 100 TB table as many cluster-splittable files.
    # Spark's parquet reader rejects NANOS timestamps -> coerce to micros.
    n = len(corpus.pages)
    n_files = max(1, min(64, n // 5000))
    pages_dir = f"{out_dir}/pages.parquet"
    # A rewrite with fewer shards must not leave stale part files from a
    # previous larger corpus (they'd silently pollute every read), and a
    # leftover single-FILE pages.parquet from the pre-shard layout would make
    # makedirs fail — clear whatever is there first.
    if os.path.isdir(pages_dir):
        shutil.rmtree(pages_dir)
    elif os.path.exists(pages_dir):
        os.remove(pages_dir)
    os.makedirs(pages_dir)
    for i in range(n_files):
        corpus.pages.iloc[i::n_files].to_parquet(
            f"{pages_dir}/part-{i:05d}.parquet",
            index=False,
            coerce_timestamps="us",
            row_group_size=5000,
        )
    corpus.truth.to_parquet(
        f"{out_dir}/pages_truth.parquet", index=False, row_group_size=5000
    )


# --- deterministic media fixtures (multimodal driver gate) -------------------
#
# Per-doc media payloads whose decoded dimensions are pure arithmetic in
# doc_id, so a DuckDB oracle can predict every cell of the REAL decode path
# (plans/queries.q_media_decode_dims) without any codec: doc_id % 3 cycles
# image (binary PPM P6) / audio (RIFF WAVE PCM8 mono) / video (RIFF AVI
# uncompressed 24-bit DIB frames). Beyond-reference scope — the reference is
# image-only (/root/reference/scanner/hashFile.py:95-106).

def media_dims(doc_id: int) -> tuple[int, int]:
    """(width, height) for image/video payloads — >= the 8x8 pooling grid."""
    return 8 + doc_id % 8, 8 + doc_id % 5


def media_n_samples(doc_id: int) -> int:
    """PCM sample count for audio payloads — >= the 64-bin energy grid."""
    return 64 + (doc_id % 100) * 16


def media_n_video_frames(doc_id: int) -> int:
    return 1 + doc_id % 4


def _media_grid(seed: int, tag: bytes) -> np.ndarray:
    """64 deterministic bytes per (seed, tag) — the content kernel for all
    media builders. Blocky-by-construction so mean-pooling feature kernels
    (aHash, RMS envelope) recover seed-rich values: distinct seeds give
    far-apart features, equal seeds bit-identical ones. A smooth pattern
    (e.g. a mod-256 sawtooth) would pool to near-uniform means whose signs
    are numerically fragile — unusable for exact-match feature oracles."""
    import hashlib

    d = hashlib.blake2b(str(seed).encode(), digest_size=64, person=tag).digest()
    return np.frombuffer(d, dtype=np.uint8)


def _ppm_payload(doc_id: int) -> bytes:
    from ..functions.multimodal import _resize_gray

    w, h = media_dims(doc_id)
    grid = _media_grid(doc_id, b"img").reshape(8, 8)
    gray = _resize_gray(grid, w, h)  # nearest-neighbor upscale of the 8x8 grid
    px = np.repeat(gray.reshape(h, w, 1), 3, axis=2).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def _wav_payload(doc_id: int) -> bytes:
    n = media_n_samples(doc_id)
    # alternating-sign samples whose amplitude envelope encodes the seed
    # grid: bin RMS ~ amplitude, so the 64-bin energy features are seed-rich.
    # amp must stay <= 127 — 128 + amp above 255 would wrap under uint8 and
    # fold the envelope (amp and 256-amp indistinguishable), weakening the
    # distinct-seeds-give-distinct-features invariant the near-dup oracle
    # rests on. grid//4 + 24 spans 24..87: no wrap, still 64 levels.
    amp = _media_grid(doc_id, b"aud")[(64 * np.arange(n)) // n] // 4 + 24
    sign = np.where(np.arange(n) % 2 == 0, 1, -1)
    data = (128 + sign * amp).astype(np.uint8).tobytes()
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")  # PCM, mono
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")  # align, bits
        + b"data" + len(data).to_bytes(4, "little") + data
    )


def _avi_payload(doc_id: int) -> bytes:
    from ..functions.multimodal import _encode_avi_dib, _resize_gray

    w, h = media_dims(doc_id)
    nf = media_n_video_frames(doc_id)
    frames = [
        _resize_gray(
            _media_grid(doc_id * 16 + f, b"vid").reshape(8, 8), w, h
        ).astype(np.float64)
        for f in range(nf)
    ]
    return _encode_avi_dib(frames)


_MEDIA_BUILDERS = (_ppm_payload, _wav_payload, _avi_payload)
MEDIA_TYPE_CYCLE = ("image", "audio", "video")


def media_payload(doc_id: int, dup_stride: int | None = None) -> tuple[str, bytes]:
    """dup_stride plants exact duplicates: rows with doc_id % 10 == 7 (and
    doc_id >= dup_stride) reuse the payload of doc_id - dup_stride. The
    stride must be a multiple of 3 so the partner shares the media type —
    the planted pair set is then pure arithmetic, so an exact-match
    near-dup query over the decoded features is DuckDB-oracle-able."""
    mt = MEDIA_TYPE_CYCLE[doc_id % 3]
    seed = doc_id
    if dup_stride is not None and doc_id % 10 == 7 and doc_id >= dup_stride:
        assert dup_stride % 3 == 0, "dup partner must share the media type"
        seed = doc_id - dup_stride
    return mt, _MEDIA_BUILDERS[doc_id % 3](seed)


def synthesize_media(docs, dup_stride: int | None = None):
    """docs(doc_id) -> MEDIA_SCHEMA frame via Arrow-batched mapInPandas.

    Fixture generation, not a hot-path operator: payload construction is
    per-row byte packing inside Arrow batches — the same batch shape the
    decode stage itself uses, so the pair composes into one e2e pipeline."""
    from ..functions.multimodal import MEDIA_SCHEMA

    def _gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            mts, payloads = [], []
            for did in ids:
                mt, raw = media_payload(int(did), dup_stride)
                mts.append(mt)
                payloads.append(raw)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "url": ["synth://media/" + str(i) for i in ids],
                    "media_type": mts,
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(_gen, schema=MEDIA_SCHEMA)
