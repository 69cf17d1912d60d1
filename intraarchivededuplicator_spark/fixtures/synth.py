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
