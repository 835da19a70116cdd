"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the ``pages`` table of BASELINE.json's input_hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)`` —
entirely from a seeded RNG: no wall clock, no external data.  Same seed +
same n_docs => byte-identical parquet content at any scale (FIXTURES.md §1).

Term distribution is Zipfian over a synthetic vocabulary with a handful of
deliberate HEAD terms injected into >30% of documents to exercise the
north-rule skew handling (salted repartition + split posting blocks).
The html column carries adversarial markup: nested/malformed tags, entities,
script/style blocks, comments, CDATA.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HEAD_TERMS = ["web", "page", "data"]  # injected into >30% of docs
VOCAB_SIZE = 10_000
_BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")

_ADVERSARIAL_SNIPPETS = [
    "<script type='text/javascript'>var x = '<div>not text</div>';</script>",
    "<style>.c{color:red}</style>",
    "<!-- a comment with words comment_noise inside -->",
    "<![CDATA[cdata kept words]]>",
    "<p attr=\"x > y\">",
    "<br/><BR><hr >",
    "&amp; &lt;tag&gt; &#65; &#x42; &nbsp;",
    "<div><b>bold <i>nested</i></b></div>",
    "<unclosed",
    "5 < 6 but & unescaped",
]


def _vocab() -> list[str]:
    # deterministic pseudo-words: base26 ids, 3-9 chars, no RNG needed
    words = []
    for i in range(VOCAB_SIZE):
        n = i
        w = []
        for _ in range(3 + (i % 7)):
            w.append(chr(ord("a") + n % 26))
            n = n // 26 + 7 * (i % 13)
        words.append("".join(w))
    return words


def generate_pages(n_docs: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    # Zipf ranks for body terms
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    urls, tss, htmls, texts, langs = [], [], [], [], []
    # zipfian host distribution -> url skew
    host_ids = rng.zipf(1.3, size=n_docs) % 997
    doc_lens = rng.integers(5, 220, size=n_docs)
    head_draws = rng.random(size=(n_docs, len(HEAD_TERMS)))
    has_text_col = rng.random(size=n_docs) < 0.3  # 30% arrive pre-extracted
    lang_draws = rng.random(size=n_docs)

    for i in range(n_docs):
        body_terms = list(rng.choice(vocab, size=doc_lens[i], p=probs))
        for j, ht in enumerate(HEAD_TERMS):
            if head_draws[i, j] < 0.35 + 0.1 * j:  # 35-55% of docs
                reps = int(1 + (head_draws[i, j] * 10) % 4)
                body_terms.extend([ht] * reps)
        # stopwords + mixed case + punctuation in the raw text
        body = []
        for k, t in enumerate(body_terms):
            if k % 11 == 3:
                body.append("the")
            if k % 17 == 5:
                body.append(t.upper() + ",")
            elif k % 13 == 7:
                body.append(t.capitalize() + ".")
            else:
                body.append(t)
        raw = " ".join(body)
        snippet = _ADVERSARIAL_SNIPPETS[i % len(_ADVERSARIAL_SNIPPETS)]
        title_words = " ".join(body_terms[:3])
        html = (
            f"<html><head><title>{title_words}</title>{snippet}</head>"
            f"<body><h1>{title_words}</h1><p>{raw}</p>{snippet}</body></html>"
        )
        urls.append(f"https://host{host_ids[i]}.example/p/{seed}/{i}")
        tss.append(_BASE_TS + np.timedelta64(int(i) * 1000, "us"))
        htmls.append(html.encode("utf-8"))
        texts.append(None)  # engine must derive; some rows get text below
        langs.append("en" if lang_draws[i] < 0.9 else "xx")
        if has_text_col[i]:
            # pre-extracted text present (and authoritative for those rows)
            texts[-1] = f"{title_words} {title_words} {raw}"

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def generate_queries(seed: int = 42) -> list[dict]:
    """The reference query set (FIXTURES.md §2): stable across rounds."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    mid = [vocab[i] for i in rng.integers(20, 400, size=12)]
    rare = [vocab[i] for i in rng.integers(5000, 9999, size=4)]
    qs: list[dict] = []
    qid = 0

    def add(q: str, k: int) -> None:
        nonlocal qid
        qs.append({"qid": qid, "query": q, "k": k})
        qid += 1

    for t in [HEAD_TERMS[0], mid[0], rare[0]]:
        add(t, 10)
    add(f"{mid[1]} {mid[2]}", 10)  # default OR
    add(f"{mid[3]} {mid[4]} {mid[5]} {rare[1]}", 100)
    add(f"{HEAD_TERMS[1]} {mid[6]}", 10)  # head+mid OR
    add(f"{mid[7]} AND {mid[8]}", 10)
    add(f"{HEAD_TERMS[0]} AND {HEAD_TERMS[2]} AND {mid[9]}", 100)
    add(f"{mid[10]} AND {rare[2]}", 10)
    add("zzznotaterm", 10)  # absent from corpus
    add("the and of", 10)  # stopword-only -> empty
    add(f"{HEAD_TERMS[0]} {HEAD_TERMS[1]} {HEAD_TERMS[2]}", 100)  # heads OR
    add(f"{mid[11]} -{HEAD_TERMS[0]}", 10)  # negation
    add(f"{rare[3]}", 100)
    return qs


def write_pages_parquet(
    path: str,
    n_docs: int,
    seed: int = 42,
    docs_per_file: int = 5000,
    n_jobs: int = 1,
) -> None:
    """Write the corpus as a DIRECTORY of part files so Spark's scan
    parallelizes (a single parquet file caps the input stage at
    ~size/maxPartitionBytes tasks — a real Common-Crawl dump is thousands of
    WARC files, so multi-file is also the realistic shape).

    Chunks are generated per-file from the same deterministic generator
    (chunk seed = seed + file index), so content is reproducible for a given
    (n_docs, seed, docs_per_file) regardless of ``n_jobs`` (chunks are
    independent; n_jobs only parallelizes their generation)."""
    import os

    os.makedirs(path, exist_ok=True)
    specs = []
    written = 0
    i = 0
    while written < n_docs:
        n = min(docs_per_file, n_docs - written)
        specs.append((path, n, seed, i, written))
        written += n
        i += 1
    if n_jobs <= 1 or len(specs) <= 1:
        for spec in specs:
            _write_chunk(spec)
    else:
        from multiprocessing import Pool

        with Pool(min(n_jobs, len(specs))) as pool:
            pool.map(_write_chunk, specs)


def _write_chunk(spec) -> None:
    path, n, seed, chunk_idx, doc_offset = spec
    table = _generate_pages_chunk(n, seed, chunk_idx, doc_offset)
    pq.write_table(table, os.path.join(path, f"part-{chunk_idx:05d}.parquet"))


def _generate_pages_chunk(n: int, seed: int, chunk_idx: int, doc_offset: int) -> pa.Table:
    """A chunk with globally-unique urls: same generator, chunk-local seed,
    urls offset by the chunk's global position."""
    t = generate_pages(n, seed=seed + 7919 * chunk_idx)
    urls = [
        f"https://host{h}.example/p/{seed}/{doc_offset + j}"
        for j, h in enumerate(
            int(u.split("host")[1].split(".")[0]) for u in t.column("url").to_pylist()
        )
    ]
    return t.set_column(0, "url", pa.array(urls, pa.string()))
