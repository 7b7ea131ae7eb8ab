"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
    url:string, warc_ts:timestamp, html:binary, text:string (null — the
    engine fills it), lang:string ("zh" | "en")

Every page is a pure function of its integer index ``i`` (seeded per
page), so generation is embarrassingly parallel: ``pages_df`` generates
directly on executors with ``mapInPandas`` over ``spark.range(n)`` — no
driver-side materialization, scales to any row count.

The HTML deliberately exercises every branch of the reference extractor
(FIXTURES.md synthesis requirements): pages with and without a main
content region, noise-classed elements, filtered tags, headings/paragraphs
straddling the 5/20/30-char thresholds, a >100-link page, duplicate
content under distinct urls, near-empty pages, Zipfian vocabulary with
heavy head terms (skew), and reference rule words (重要/紧急/算法/方案...).
"""

from __future__ import annotations

import datetime as dt
import random
from collections.abc import Iterator

import pandas as pd

BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)

# Zipfian English vocabulary: head terms are very heavy (skew fixture).
EN_VOCAB = (
    "data search index query engine document ranking score term corpus "
    "crawl page token partition shuffle cluster executor spark parquet "
    "vector model training learning neural network language text feature "
    "system distributed storage compression posting block pruning wand "
    "algorithm framework architecture code development plan strategy "
    "market customer important critical core urgent immediate quality "
    "throughput latency benchmark scaling efficiency checkpoint lineage "
    "merge salt skew broadcast join aggregate window stream batch arrow "
    "pandas python scala java memory disk cache spill codegen catalyst "
    "iceberg table snapshot schema column row group statistics filter "
    "pushdown prune sort limit topk heap cursor posting docid delta "
    "varbyte encode decode bitmap signature minhash simhash shingle "
    "jaccard cosine embedding nearest neighbor bucket band hash dedup "
    "web crawl frontier fetch parse extract tokenize stem stopword"
).split()

ZH_WORDS = (
    "人工智能 大数据 机器学习 深度学习 搜索 引擎 索引 倒排 文档 查询 "
    "检索 排序 分布式 计算 系统 数据 数据库 模型 训练 神经网络 自然语言 "
    "处理 信息 技术 应用 平台 服务 用户 分析 存储 压缩 性能 优化 集群 "
    "节点 内存 磁盘 网页 爬虫 内容 标题 段落 链接 新闻 科技 互联网 公司 "
    "产品 研究 论文 实验 结果 方法 问题 解决 提升 支持 实现 功能 算法 "
    "框架 架构 代码 开发 方案 规划 战略 市场 客户 重要 关键 核心 紧急 "
    "立即 向量 空间 权重 频率 位置 词项 相似度 评估 指标 质量 速度"
).split()

ZH_STOP_FILLER = "的 了 和 是 就 都 而 及 与 在 有 中 为".split()

_EN_WEIGHTS = [1.0 / (r + 1) for r in range(len(EN_VOCAB))]
_ZH_WEIGHTS = [1.0 / (r + 1) for r in range(len(ZH_WORDS))]


# --- topic clustering (docID-locality corpora) -----------------------------
#
# With ``topics=T`` pages carry a topic id in the URL HOST prefix, and 40%
# of each English page's tokens draw from a 16-word vocabulary unique to
# its topic (Zipf within the slice) — the URL-sorted-crawl shape of real
# web corpora, where pages of one host/topic share vocabulary and sort
# adjacent.  Because index ordinals are assigned in URL order, each
# topical term's postings then concentrate in a contiguous docID range
# per shard, which is the structure block-max WAND pruning exploits
# (i.i.d. token draws make every block bound identical and pruning
# impossible for ANY block-max scheme).  Default topics=0 keeps the
# r1-r3 corpus byte-identical.

TOPIC_MIX = 0.4  # fraction of en word draws taken from the topic slice
# letter-only (the analyzer strips digits) and Porter-inert finals, so
# every topical word survives analysis as a distinct term
_TOPIC_SUFFIX = "bcfgjkmnpqrtvwxz"
TOPIC_WORDS_PER_TOPIC = len(_TOPIC_SUFFIX)
_TOPIC_VOCAB_CACHE: dict[int, list[str]] = {}
_TOPIC_WEIGHTS = [1.0 / (r + 1) for r in range(TOPIC_WORDS_PER_TOPIC)]


def topic_vocab(topic: int) -> list[str]:
    if topic not in _TOPIC_VOCAB_CACHE:
        a, b = chr(97 + topic // 26), chr(97 + topic % 26)
        _TOPIC_VOCAB_CACHE[topic] = [
            f"topic{a}{b}word{s}" for s in _TOPIC_SUFFIX
        ]
    return _TOPIC_VOCAB_CACHE[topic]


def _en_sentence(rng: random.Random, n: int, topic: int = -1) -> str:
    words = rng.choices(EN_VOCAB, weights=_EN_WEIGHTS, k=n)
    if topic >= 0:
        tv = topic_vocab(topic)
        for p in range(len(words)):
            if rng.random() < TOPIC_MIX:
                words[p] = rng.choices(tv, weights=_TOPIC_WEIGHTS, k=1)[0]
    if rng.random() < 0.3:
        words.insert(rng.randrange(len(words) + 1), str(rng.randrange(1900, 2030)))
    return " ".join(words).capitalize() + rng.choice([".", "!", "?", "..."])


def _zh_sentence(rng: random.Random, n: int) -> str:
    parts = []
    for _ in range(n):
        parts.append(rng.choices(ZH_WORDS, weights=_ZH_WEIGHTS, k=1)[0])
        if rng.random() < 0.4:
            parts.append(rng.choice(ZH_STOP_FILLER))
    if rng.random() < 0.3:
        parts.append(str(rng.randrange(10, 9999)))
    return "".join(parts) + rng.choice(["。", "，继续。", "！", "？"])


def _paragraphs(rng: random.Random, lang: str, n_para: int,
                topic: int = -1) -> list[str]:
    out = []
    for _ in range(n_para):
        n_sent = rng.randint(1, 4)
        if lang == "zh":
            out.append("".join(_zh_sentence(rng, rng.randint(3, 10)) for _ in range(n_sent)))
        else:
            out.append(" ".join(
                _en_sentence(rng, rng.randint(4, 14), topic) for _ in range(n_sent)
            ))
    return out


_NOISE_BLOCKS = [
    '<div class="ads-banner">BUY NOW cheap deals 12345 广告</div>',
    '<div class="sidebar"><ul><li>nav one two three</li><li>nav four five six</li></ul></div>',
    '<footer class="footer">copyright 2025 some site footer text here</footer>',
    '<div class="comment-area">troll comment short</div>',
    '<div class="social-share">share on social networks now</div>',
]
_FILTERED_BLOCKS = [
    "<script>var x = 42; console.log('should never appear in text');</script>",
    "<style>.main { color: red; } /* styling noise */</style>",
    '<iframe src="https://ads.example.com/frame"></iframe>',
    "<noscript>enable javascript please</noscript>",
]


def gen_page(i: int, seed: int = 42, size_scale: int = 1,
             topics: int = 0) -> tuple[str, dt.datetime, bytes, str]:
    """Generate page ``i`` deterministically: (url, warc_ts, html, lang).

    ``size_scale`` multiplies paragraph counts — benchmarks use >1 for
    realistic Common-Crawl-ish page sizes; tests keep 1.

    ``topics``: >0 produces a topic-clustered corpus (see the topic
    clustering note above): the topic id prefixes the URL host, so
    URL-ordered docIDs group by topic.  0 (default) is byte-identical
    to the r1-r3 corpus.
    """
    rng = random.Random((seed << 32) ^ i)
    lang = "zh" if i % 3 == 0 else "en"
    topic = (i % topics) if topics > 0 else -1
    host_prefix = f"t{topic:03d}." if topic >= 0 else ""
    url = f"https://{host_prefix}site{i % 97}.example.com/{lang}/page/{i}"
    warc_ts = BASE_TS + dt.timedelta(seconds=(i * 9973) % (360 * 86400))

    # duplicate-content fixture: every 53rd page clones the previous page's
    # body under a distinct url (exact-dedup + tie-break determinism).
    body_idx = i - 1 if (i % 53 == 0 and i > 0) else i
    brng = random.Random((seed << 32) ^ body_idx ^ 0xBEEF)
    # body follows the BODY page's topic so the clone stays byte-identical
    btopic = (body_idx % topics) if topics > 0 else -1

    title_words = (_zh_sentence(brng, 3) if lang == "zh" else _en_sentence(brng, 5))
    paras = _paragraphs(brng, lang, brng.randint(2, 7) * size_scale, btopic)
    short_para = "tiny" if lang == "en" else "短句"
    long_heading = (_zh_sentence(brng, 4) if lang == "zh" else _en_sentence(brng, 6))
    short_heading = "Hi"  # len <= 5: must be skipped by the extractor

    layout = i % 10
    noise = "".join(brng.sample(_NOISE_BLOCKS, k=brng.randint(1, 3)))
    filtered = "".join(brng.sample(_FILTERED_BLOCKS, k=brng.randint(1, 2)))
    paras_html = "".join(f"<p>{p}</p>" for p in paras)

    if layout < 4:  # main region found by id
        body = (
            f"{noise}{filtered}"
            f'<div id="main-content"><h1>{long_heading}</h1><h3>{short_heading}</h3>'
            f"{paras_html}<p>{short_para}</p>"
            f"<ul><li>{paras[0]}</li><li>ok</li></ul></div>"
            f'<div class="related">should be removed related box</div>'
        )
    elif layout < 6:  # main region found by class
        body = (
            f"{noise}"
            f'<article class="article-text"><h2>{long_heading}</h2>'
            f"{paras_html}</article>{filtered}"
        )
    elif layout < 9:  # no main region: headings + <p> fallback
        body = (
            f"{filtered}<h1>{long_heading}</h1><h2>{short_heading}</h2>"
            f"{noise}{paras_html}<p>{short_para}</p>"
        )
    else:  # sparse page: triggers the <5-parts content-tag fallback (len>30)
        body = (
            f"{noise}<h3>{long_heading}</h3>"
            f"<section><td>{paras[0]}</td></section><p>{short_para}</p>"
        )

    if i % 101 == 13:  # >100 links page (link cap fixture)
        links = "".join(
            f'<a href="/l/{j}">link {j} text</a>' for j in range(120)
        )
        body += f"<div>{links}</div>"
    if i % 89 == 41:  # near-empty page: nothing survives the thresholds
        body = "<p>no</p><div>eh</div>"

    html = (
        "<html><head>"
        f"<title>{title_words}</title>"
        f'<meta name="description" content="page {i} about things">'
        f'<meta property="og:type" content="article">'
        "</head><body>"
        f"{body}"
        "</body></html>"
    )
    return url, warc_ts, html.encode("utf-8"), lang


def gen_pages_pandas(n: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    rows = [gen_page(i, seed) for i in range(start, start + n)]
    return pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "warc_ts": [r[1] for r in rows],
            "html": [r[2] for r in rows],
            "text": pd.Series([None] * len(rows), dtype="object"),
            "lang": [r[3] for r in rows],
        }
    )


PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, n: int, seed: int = 42, size_scale: int = 1,
             topics: int = 0):
    """Distributed generation: each executor task generates its id range."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = [gen_page(int(i), seed, size_scale, topics) for i in ids]
            yield pd.DataFrame(
                {
                    "url": [r[0] for r in rows],
                    "warc_ts": [r[1] for r in rows],
                    "html": [r[2] for r in rows],
                    "text": pd.Series([None] * len(rows), dtype="object"),
                    "lang": [r[3] for r in rows],
                }
            )

    # tasks per core for the heavy per-page python stage: >1 reduces the
    # stage-end straggler (per-page cost varies zh/en/size); too many adds
    # per-task Arrow/setup overhead.  Env-tunable for scaling probes.
    import os

    tpc = int(os.environ.get("SPARK_GRAFT_GEN_TASKS_PER_CORE", "2"))
    parallelism = spark.sparkContext.defaultParallelism
    return spark.range(0, n, 1, max(tpc * parallelism, 8)).mapInPandas(gen, PAGES_DDL)


# The reference query set (FIXTURES.md §2): mixed ZH/EN, single/multi-term,
# OOV, all-stopword, boolean forms, phrase, NEAR, rule-word queries.
REFERENCE_QUERIES: list[dict] = [
    {"query_id": 1, "query": "人工智能", "algorithm": "bm25", "max_results": 20, "min_score": 0.3},
    {"query_id": 2, "query": "人工智能 大数据 机器学习", "algorithm": "bm25", "max_results": 20, "min_score": 0.3},
    {"query_id": 3, "query": "search engine index", "algorithm": "bm25", "max_results": 20, "min_score": 0.3},
    {"query_id": 4, "query": "distributed compression ranking", "algorithm": "bm25", "max_results": 10, "min_score": 0.0},
    {"query_id": 5, "query": "qzxv nonexistentterm", "algorithm": "bm25", "max_results": 10, "min_score": 0.3},
    {"query_id": 6, "query": "的 了 和", "algorithm": "bm25", "max_results": 10, "min_score": 0.3},
    {"query_id": 7, "query": "数据", "algorithm": "tfidf", "max_results": 20, "min_score": 0.3},
    {"query_id": 8, "query": "search engine index", "algorithm": "tfidf", "max_results": 20, "min_score": 0.0},
    {"query_id": 9, "query": "数据 AND 算法", "algorithm": "boolean", "max_results": 20, "min_score": 0.3},
    {"query_id": 10, "query": "数据 OR 算法", "algorithm": "boolean", "max_results": 20, "min_score": 0.3},
    {"query_id": 11, "query": "数据 NOT 算法", "algorithm": "boolean", "max_results": 20, "min_score": 0.3},
    {"query_id": 12, "query": "数据 算法", "algorithm": "boolean", "max_results": 20, "min_score": 0.3},
    {"query_id": 13, "query": "搜索", "algorithm": "boolean", "max_results": 20, "min_score": 0.05},
    {"query_id": 14, "query": "重要 紧急", "algorithm": "bm25", "max_results": 20, "min_score": 0.0},
    {"query_id": 15, "query": "算法 方案", "algorithm": "bm25", "max_results": 20, "min_score": 0.0},
    {"query_id": 16, "query": "spark partition shuffle", "algorithm": "bm25", "max_results": 20, "min_score": 0.0},
]
