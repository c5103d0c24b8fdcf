"""Deterministic synthetic fixtures (seed 42) for the pages table.

Schema per BASELINE.json input_hint:
``(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)``.
The ``html`` column is GB2312-encoded bytes; ``text`` is the oracle's
extraction output (the byte-identity invariant target), stored as a
string after a lossless gb2312 round-trip.

The token vocabulary is drawn with a Zipf(1.2) law so one hot term
exercises salting (FIXTURES.md §1); it mixes ASCII words of byte length
1 (dropped by the 2-8-byte index filter), 2-8 (indexed) and >= 9
(dropped), plus GB2312 hanzi words present in a miniature dictionary
(FMM hit path), out-of-dictionary hanzi runs (FMM back-off path) and GB
punctuation delimiters.

Everything here is generated — no external data.  Do not modify
/root/testdata.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pandas as pd

from tse_spark import oracle

SEED = 42
ENCODING = "gb2312"

# -- miniature segmentation dictionary (words.dict analogue; Dict.cpp:17-33) --
# 1..4-char GB2312 words; 4 chars = 8 bytes = MAX_WORD_LENGTH.
DICT_WORDS: tuple[str, ...] = (
    "中", "国", "人", "大", "学", "网",
    "中国", "人民", "大学", "搜索", "引擎", "网络", "系统", "数据",
    "中文", "分词", "北京", "信息", "检索", "实验", "原理", "技术",
    "计算机", "互联网", "实验室",
    "搜索引擎", "北京大学", "中国人民", "网络实验",
)
# Out-of-dictionary hanzi (forces FMM 2-byte back-off / single emission).
OOD_HANZI: tuple[str, ...] = ("鑫", "森", "淼", "焱", "磊")

# GB2312 punctuation (lead byte 0xA1/0xA3 — the 161-175 delimiter region).
GB_PUNCT: tuple[str, ...] = ("，", "。", "、", "！")

ASCII_WORDS: tuple[str, ...] = (
    # hot head of the Zipf law first
    "web", "search", "index", "spark", "data", "query", "page", "link",
    "rank", "text", "html", "crawl", "token", "term", "score", "match",
    "engine1", "cluster9", "shuffle8",
    # 1-byte (dropped by the index filter)
    "a", "i", "x",
    # >= 9 bytes (dropped by the index filter)
    "wonderful9", "information", "distributed",
    # uppercase (lowercase-path coverage)
    "Spark", "WEB",
)

# Long-tail vocabulary: realistic web corpora have power-law dfs with a
# vast rare tail; without it every fixture term is stopword-hot (df ~ N,
# idf ~ 0), which both misrepresents posting-list shapes and makes WAND
# skipping impossible.  5-byte ASCII words -> index-eligible (2..8 B).
TAIL_WORDS: tuple[str, ...] = tuple(f"w{i:04x}" for i in range(4096))

VOCAB: tuple[str, ...] = (
    ASCII_WORDS + DICT_WORDS + OOD_HANZI
    + ("搜索引擎原理", "北京大学网络实验室", "中国人民大学")  # multi-word runs
    + TAIL_WORDS
)

# bump when generated fixture CONTENT changes (invalidates the parquet
# cache markers used by write_pages_parquet*)
FIXTURE_VERSION = 3


def mini_dict_bytes() -> frozenset[bytes]:
    """The broadcastable dictionary as GB2312 byte strings (S9)."""
    return frozenset(w.encode(ENCODING) for w in DICT_WORDS)


def _zipf_probs(n: int, s: float = 1.2) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


# HTML garnish cycled across rows: comments, attributes containing '>',
# stray '<' / '>', &nbsp;, tab/CR/LF runs, a script block.  The extraction
# automaton defines what survives (oracle.extract_text is the truth).
_GARNISH: tuple[str, ...] = (
    '<a href="http://x.cn/a>b">anchor text</a>',
    "<!-- a comment > with a gt -->",
    "stray > follows",
    "<script>var x = 1; if (x) { x = 2; }</script>",
    "&nbsp;entity&nbsp;runs",
    "tab\there\r\nand\nnewlines",
    "plain middle sentence",
)


def gen_pages(
    n_rows: int, seed: int = SEED, length_scale: int = 1, start: int = 0
) -> pd.DataFrame:
    """Deterministic pages table as a pandas DataFrame.

    ~1% exact-duplicate urls (with identical html, so dedup survivor
    choice cannot affect downstream results) and a few uppercase-scheme
    url variants.  ``length_scale`` multiplies tokens-per-doc (1 ->
    15-60 tokens, tiny unit-test pages; 8 -> 120-480 tokens ~ 1-4 KB
    text, Common-Crawl-like body sizes for throughput benchmarks).

    ``start`` offsets the global row index used for urls / lang / garnish
    so independently generated chunks (parallel sharded generation) have
    globally unique urls — content is then a function of
    (chunk seed, start, n_rows) only, independent of who generates it.
    """
    rng = np.random.RandomState(seed)
    probs = _zipf_probs(len(VOCAB))
    lengths = rng.randint(15 * length_scale, 60 * length_scale, size=n_rows)
    flat = rng.choice(len(VOCAB), size=int(lengths.sum()), p=probs)
    offsets = np.concatenate(([0], np.cumsum(lengths)))

    langs = ("zh", "en", "mixed")
    epoch = _dt.datetime(2004, 1, 1, tzinfo=_dt.timezone.utc)

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    lang_col: list[str] = []
    ts_col: list[_dt.datetime] = []

    for i in range(n_rows):
        g = start + i  # global row index (url identity / garnish cycle)
        if g % 101 == 7 and i > 0:
            # exact duplicate of the previous row's url AND content
            urls.append(urls[-1])
            htmls.append(htmls[-1])
            texts.append(texts[-1])
            lang_col.append(lang_col[-1])
            ts_col.append(epoch + _dt.timedelta(seconds=137 * g))
            continue
        scheme = "HTTP" if g % 97 == 13 else "http"
        urls.append(f"{scheme}://site{g % 97}.example.cn/p/{g}")
        toks = [VOCAB[t] for t in flat[offsets[i] : offsets[i + 1]]]
        # sprinkle GB punctuation attached between tokens
        body_parts: list[str] = []
        for j, t in enumerate(toks):
            body_parts.append(t)
            if j % 7 == 3:
                body_parts.append(GB_PUNCT[j % len(GB_PUNCT)])
        body = " ".join(body_parts)
        title = " ".join(toks[:3])
        garnish = _GARNISH[g % len(_GARNISH)]
        html = (
            f"<html>\n<head><title>{title}</title></head>\n"
            f"<body class=\"m\">\n<h1>{title}</h1>\n"
            f"<p>{body}</p>\n{garnish}\n"
            f"<div id=\"f\">footer {g % 13}</div>\n</body>\n</html>\n"
        )
        hb = html.encode(ENCODING)
        htmls.append(hb)
        texts.append(oracle.extract_text(hb).decode(ENCODING))
        lang_col.append(langs[g % 3])
        ts_col.append(epoch + _dt.timedelta(seconds=137 * g))

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts_col,
            "html": htmls,
            "text": texts,
            "lang": lang_col,
        }
    )


def gen_queries() -> list[tuple[int, str, int]]:
    """Reference query set (FIXTURES.md §2): (qid, query, k)."""
    qs: list[str] = [
        # single indexed ASCII terms
        "web", "search", "spark", "index", "query", "rank", "html",
        "crawl", "score", "term",
        # multi-term (conjunctive / disjunctive coverage)
        "web search", "spark index", "data query page", "search engine1",
        "rank score match", "web data", "index crawl", "token term",
        "spark data query", "page link",
        # terms absent from the index
        "zzzz", "qqqq xxxx", "web zzzz",
        # 1-byte and >=9-byte terms (filter coverage)
        "a", "i web", "wonderful9", "information web", "x",
        # uppercase ASCII (lowercase path)
        "WEB", "Spark Search", "HTML", "WEB search",
        # hanzi requiring FMM segmentation
        "搜索引擎", "北京大学", "中国人民", "搜索引擎原理", "网络实验",
        "中文分词", "数据", "信息检索", "计算机", "互联网",
        # out-of-dictionary hanzi
        "鑫森", "淼",
        # mixed ASCII + hanzi
        "spark 中国", "web 搜索引擎", "数据 query", "北京 index html",
        # punctuation embedded
        "web，search", "搜索，引擎。",
        # long-tail terms (selective postings; WAND skip path)
        "w0001", "w0010 web", "w0003 w0007", "w00ff search", "w0a00",
    ]
    return [(i, q, 10) for i, q in enumerate(qs)]


def _gen_chunk_to_parquet(task: tuple) -> str:
    """Worker for the parallel sharded writer: generate one chunk with
    its own deterministic seed and write it as a part file."""
    path, idx, start, n, seed, length_scale = task
    pdf = gen_pages(n, seed, length_scale, start=start)
    fname = os.path.join(path, f"part-{idx:05d}.parquet")
    pdf.to_parquet(
        fname,
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return fname


def write_pages_parquet_sharded(
    path: str,
    n_rows: int,
    n_files: int = 32,
    seed: int = SEED,
    length_scale: int = 1,
) -> str:
    """Generate (or reuse) the pages fixture as a DIRECTORY of parquet
    part files.  Multiple files give the Spark scan enough input splits
    that extraction parallelism is not capped by file count — the
    sandbox stand-in for a many-file Common-Crawl-scale table.  Cache
    key is (n_rows, n_files, seed, length_scale); generation is
    deterministic.

    Chunks are generated in PARALLEL (mp.Pool), each from its own
    chunk-derived seed and global row offset — content is a pure
    function of the cache key, independent of pool size (the serial
    pandas loop at 400k docs took ~15 min, longer than the whole bench
    budget; 32-way it is ~30 s).
    """
    os.makedirs(path, exist_ok=True)
    marker = os.path.join(
        path, f"_gen_v{FIXTURE_VERSION}_{n_rows}_{n_files}_{seed}_{length_scale}"
    )
    if os.path.exists(marker):
        return path
    import multiprocessing as mp

    per = (n_rows + n_files - 1) // n_files
    tasks = []
    for i in range(n_files):
        start = i * per
        n = min(per, n_rows - start)
        if n <= 0:
            break
        tasks.append((path, i, start, n, seed + 7919 * (i + 1), length_scale))
    procs = min(len(tasks), os.cpu_count() or 8)
    if procs > 1:
        with mp.Pool(procs) as pool:
            pool.map(_gen_chunk_to_parquet, tasks)
    else:
        for t in tasks:
            _gen_chunk_to_parquet(t)
    with open(marker, "w") as f:
        f.write("ok")
    return path


def write_expected_tf_parquet(pages_dir: str) -> str:
    """Expected ``(doc_id, term, tf)`` parquet for the pages fixture at
    ``pages_dir``, computed by the pure-Python oracle — the DuckDB twin
    for the GB2312/FMM pipeline, which has no SQL tokenizer equivalent
    (driver query ``pages_bm25``): the oracle SQL scores BM25 straight
    from this table, turning the one rows-only correctness entry into a
    full hash-match row.

    Reproduces the Spark side exactly:
    - dedup by url (fixture duplicates share content, survivor moot);
    - doc_id = rank over md5(url) (index_build.assign_doc_ids /
      build_docs — reference Url.idx order, index/readme.txt:14);
    - tf = oracle.BM25Oracle counters (FMM + eligibility), the same
      pure-Python truth the pytest conformance suite pins the Arrow
      tokenizer UDF to (tests/test_index_build.py).

    Cached next to the pages fixture, keyed by FIXTURE_VERSION.
    """
    import glob
    import hashlib

    # sibling of the pages dir, NOT inside it: Spark's pages scan globs
    # every *.parquet in the directory and would ingest this table
    out = pages_dir.rstrip("/") + "_expected_tf.parquet"
    marker = out + f"._v{FIXTURE_VERSION}"
    if os.path.exists(marker) and os.path.exists(out):
        return out
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(pages_dir, "part-*.parquet")))
    frames = [
        pq.read_table(f, columns=["url", "text"]).to_pandas() for f in files
    ]
    pdf = pd.concat(frames, ignore_index=True).drop_duplicates("url")
    by_md5 = sorted(
        zip(pdf["url"], pdf["text"]),
        key=lambda ut: hashlib.md5(ut[0].encode()).hexdigest(),
    )
    texts = {i: t.encode(ENCODING) for i, (_, t) in enumerate(by_md5)}
    engine = oracle.BM25Oracle(texts, mini_dict_bytes())
    ids, terms, tfs = [], [], []
    for doc_id, counter in engine.tf.items():
        for term, tf in counter.items():
            ids.append(doc_id)
            terms.append(term.decode(ENCODING))
            tfs.append(tf)
    pd.DataFrame(
        {
            "doc_id": np.asarray(ids, dtype=np.int64),
            "term": terms,
            "tf": np.asarray(tfs, dtype=np.int64),
        }
    ).to_parquet(out, index=False)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def write_pages_parquet(path: str, n_rows: int, seed: int = SEED) -> str:
    """Generate (or reuse a cached copy of) the pages fixture as parquet.

    The cache key is (n_rows, seed); regeneration is deterministic so a
    cached file is always byte-equivalent.
    """
    os.makedirs(path, exist_ok=True)
    marker = os.path.join(path, f"_gen_v{FIXTURE_VERSION}_{n_rows}_{seed}")
    fname = os.path.join(path, "pages.parquet")
    if os.path.exists(marker) and os.path.exists(fname):
        return fname
    pdf = gen_pages(n_rows, seed)
    # microsecond timestamps: Spark cannot read TIMESTAMP(NANOS) parquet
    pdf.to_parquet(
        fname, index=False, coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    with open(marker, "w") as f:
        f.write("ok")
    return fname
