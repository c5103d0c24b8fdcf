"""Oracle semantics tests: golden byte cases + fast==pure properties."""

import math

import pytest

from tse_spark import fixtures, oracle
from tse_spark.functions import extraction

GB = "gb2312"


# ---------------------------------------------------------------------------
# T2: RemoveTags automaton (reference index/Document.cpp:31-71)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "html,expected",
    [
        (b"<b>hi</b>", b" hi "),
        (b"a<b", b"a "),                      # stray '<' eats the tail
        (b"a>b", b"ab"),                      # stray '>' dropped
        (b"<a href=\"x>y\">t</a>", b" y\"t "),  # '>' in quotes ends the tag
        (b"<<x>>", b"  "),                    # '<' inside tag emits again
        # '<' of "<2" and '<' of "</script" EACH emit a space
        (b"<script>var x=1<2;</script>ok", b" var x=1  ok"),
        (b"", b""),
        (b"plain", b"plain"),
        ("<p>中文</p>".encode(GB), b" " + "中文".encode(GB) + b" "),
    ],
)
def test_remove_tags_golden(html, expected):
    assert oracle.remove_tags(html) == expected
    assert extraction.remove_tags_fast(html) == expected


def test_extract_chain_order():
    # &nbsp; replaced AFTER tag strip, squeeze last, no trim
    html = b"<p>a&nbsp;&nbsp;b\t\r\n c</p>"
    assert oracle.extract_text(html) == b" a b c "
    assert extraction.extract_text_fast(html) == b" a b c "


def test_squeeze_no_trim():
    assert oracle.squeeze_ws(b"  a \t\r\n b  ") == b" a b "


def test_ascii_lower_gb_safe():
    s = "AZaz09" + "中"
    b = s.encode(GB)
    out = oracle.ascii_lower(b)
    assert out == ("azaz09" + "中").encode(GB)


# ---------------------------------------------------------------------------
# K1/K2: tokenizer (reference index/ChSeg/HzSeg.cpp:20-166, spec mode)
# ---------------------------------------------------------------------------

DICT = fixtures.mini_dict_bytes()


def toks(s: str, lowercase=True):
    return [
        t.decode(GB) for t in oracle.tokenize(s.encode(GB), DICT, lowercase)
    ]


def test_ascii_whitespace_split_and_lower():
    assert toks("Hello  World\tX\r\nY") == ["hello", "world", "x", "y"]
    assert toks("Hello", lowercase=False) == ["Hello"]


def test_fmm_dictionary_hit_max_match():
    # 搜索引擎 (8 bytes) is in dict -> emitted whole, then 原理
    assert toks("搜索引擎原理") == ["搜索引擎", "原理"]


def test_fmm_backoff_to_single():
    # OOD hanzi: back-off emits single chars: 鑫 森 both out-of-dict
    assert toks("鑫森") == ["鑫", "森"]


def test_fmm_longer_than_max():
    # 北京大学网络实验室: FMM window is 8 bytes (4 hanzi):
    # 北京大学 in dict -> emit; 网络实验 in dict -> emit; 室 single
    assert toks("北京大学网络实验室") == ["北京大学", "网络实验", "室"]


def test_gb_punct_delimits():
    assert toks("中国，人民。") == ["中国", "人民"]
    assert toks("web，search") == ["web", "search"]


def test_mixed_ascii_hanzi_no_space():
    assert toks("data中国web") == ["data", "中国", "web"]


def test_eligibility_filter():
    assert not oracle.eligible(b"a")             # 1 byte
    assert oracle.eligible(b"ab")                # 2
    assert oracle.eligible(b"12345678")          # 8
    assert not oracle.eligible(b"123456789")     # 9
    assert oracle.eligible("中".encode(GB))      # 2 bytes
    assert oracle.eligible("北京大学".encode(GB))  # 8 bytes
    assert not oracle.eligible("北京大学网".encode(GB))  # 10 bytes


def test_index_terms_filters():
    got = [
        t.decode(GB)
        for t in oracle.index_terms("a web wonderful9 中国".encode(GB), DICT)
    ]
    assert got == ["web", "中国"]


# ---------------------------------------------------------------------------
# fast == pure over the deterministic fixture corpus
# ---------------------------------------------------------------------------

def test_fast_equals_pure_on_fixtures():
    pdf = fixtures.gen_pages(300)
    for html, text in zip(pdf["html"], pdf["text"]):
        assert oracle.extract_text(html) == text.encode(GB)
        assert extraction.extract_text_fast(html) == text.encode(GB)
        tb = text.encode(GB)
        assert extraction.tokenize_fast(tb, DICT) == oracle.tokenize(tb, DICT)


def test_fixture_determinism_and_dups():
    a = fixtures.gen_pages(300)
    b = fixtures.gen_pages(300)
    assert a.equals(b)
    dups = a[a.duplicated("url", keep=False)]
    assert len(dups) > 0
    # duplicate urls carry identical html (survivor-independence)
    for _, grp in dups.groupby("url"):
        assert len(set(grp["html"])) == 1


# ---------------------------------------------------------------------------
# BM25 oracle sanity
# ---------------------------------------------------------------------------

def test_bm25_hand_computed():
    docs = {
        0: b"web search web",
        1: b"web index",
        2: b"data data data",
    }
    eng = oracle.BM25Oracle(docs)
    # N=3, df(web)=2, avgdl=(3+2+3)/3
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    avgdl = 8 / 3
    tfc = lambda tf, dl: tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    res = eng.search(b"web", k=10)
    assert [d for d, _ in res] == [0, 1]
    assert res[0][1] == pytest.approx(idf * tfc(2, 3), abs=1e-12)
    assert res[1][1] == pytest.approx(idf * tfc(1, 2), abs=1e-12)


def test_bm25_conjunctive():
    docs = {0: b"web search", 1: b"web", 2: b"search"}
    eng = oracle.BM25Oracle(docs)
    res = eng.search(b"web search", conjunctive=True)
    assert [d for d, _ in res] == [0]
    assert eng.search(b"web zzzz", conjunctive=True) == []


def test_bm25_query_filters_and_lowercase():
    docs = {0: b"web search", 1: b"web"}
    eng = oracle.BM25Oracle(docs)
    assert [d for d, _ in eng.search(b"WEB")] == [
        d for d, _ in eng.search(b"web")
    ]
    assert eng.search(b"a") == []            # 1-byte term filtered
    assert eng.search(b"wonderful9") == []   # 9-byte term filtered


# ---------------------------------------------------------------------------
# raw-TSE fidelity mode quirks
# ---------------------------------------------------------------------------

def test_raw_tse_ascii_fuses_on_space():
    # post-squeeze ASCII text: run terminates only at LF/CR/non-ASCII
    got = oracle.raw_tse_segment(b"hello world", DICT)
    assert got == [b"hello world"]


def test_raw_tse_punct_token_and_fullwidth_space():
    # '，' (0xA3AC) is stop-punct -> emitted as its own 2-byte token
    s = "中国，人民".encode(GB)
    got = oracle.raw_tse_segment(s, DICT)
    assert got == ["中国".encode(GB), "，".encode(GB), "人民".encode(GB)]
    # fullwidth space 0xA1A1 is dropped
    s2 = "中国".encode(GB) + b"\xa1\xa1" + "人民".encode(GB)
    assert oracle.raw_tse_segment(s2, DICT) == [
        "中国".encode(GB),
        "人民".encode(GB),
    ]


def test_raw_tse_search_tf_order_discarded():
    docs = {
        2: [b"web", b"web", b"data"],
        10: [b"web", b"data"],
        3: [b"data"],
    }
    # conjunctive AND + lexicographic docid-string order ("10" < "2")
    assert oracle.raw_tse_search(docs, [b"web", b"data"]) == ["10", "2"]


# ---------------------------------------------------------------------------
# T1: HTTP-header skip (reference index/DocSegment.cpp:133-156)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [
        (b"H1\n\nH2\n\nbody", b"body"),
        (b"H1\n\nH2\n\n", b""),
        # \r resets the consecutive-\n counter: CRLF headers drop
        (b"H1\r\n\r\nH2\r\n\r\nbody", None),
        # \n\r\n is NOT a pair (reset in the middle)
        (b"a\n\r\nb\n\nc\n\nd", b"c\n\nd"[3:]),
        (b"no pair at all", None),
        # triple newline: block 2 starts at the leftover \n
        (b"H1\n\n\nX\n\nbody", b"body"),
    ],
)
def test_skip_http_headers_golden(raw, expected):
    assert oracle.skip_http_headers(raw) == expected


@pytest.mark.parametrize(
    "pad,kept",
    [
        # pair starting at byte p (1-based): second \n read as byte p+1;
        # drop when 1023 bytes were read, i.e. keep iff p <= 1021
        (1020, True),   # p = 1021
        (1021, False),  # p = 1022: pair found AS the limit hits -> drop
        (1022, False),  # p = 1023: limit hits first
    ],
)
def test_skip_http_headers_limit(pad, kept):
    raw = b"h" * pad + b"\n\nH2\n\nbody"
    got = oracle.skip_http_headers(raw)
    assert (got == b"body") if kept else (got is None)


def test_skip_http_headers_second_block_limit():
    raw = b"H1\n\n" + b"h" * 1021 + b"\n\nbody"
    assert oracle.skip_http_headers(raw) is None
    raw = b"H1\n\n" + b"h" * 1019 + b"\n\nbody"
    assert oracle.skip_http_headers(raw) == b"body"


# ---------------------------------------------------------------------------
# T6/K3: Translate (%xx) + URL segmenter (reference HzSeg.cpp:169-263)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [
        (b"a%41b", b"aAb"),            # uppercase hex letter path
        (b"a%61b", b"aab"),            # digit+lowercase-letter mix
        (b"%2Fx", b"/x"),
        (b"no-escapes", b"no-escapes"),
        (b"tail%4", b"tail%4"),        # % within 2 bytes of end: pass through
        (b"a+b", b"a+b"),              # '+' NOT mapped to space (Translate)
    ],
)
def test_cgi_decode_golden(raw, expected):
    assert oracle.cgi_decode(raw) == expected


def test_segment_url_ascii():
    toks = oracle.segment_url(b"http://img.example.com/cgi-bin/Pic42.jpg")
    assert toks == [b"cgi-bin", b"pic42"]  # host cut, ext cut, lowercased


def test_segment_url_last_dot_chops_later_pieces():
    # rfind('.') runs over the whole remaining path: the dot in the
    # FIRST piece erases everything after it (faithful reference quirk)
    toks = oracle.segment_url(b"http://h.example.cn/a.b/c/d")
    assert toks == [b"a"]


def test_segment_url_no_scheme_keeps_path():
    assert oracle.segment_url(b"/p/q42") == [b"p", b"q42"]


def test_segment_url_cgi_and_fmm():
    d = fixtures.mini_dict_bytes()
    word = next(iter(sorted(d)))  # a known dictionary word (GB2312)
    enc = "".join(f"%{b:02X}" for b in word).encode("ascii")
    toks = oracle.segment_url(b"http://x.cn/" + enc + b"/v", d)
    assert toks == [word, b"v"]
