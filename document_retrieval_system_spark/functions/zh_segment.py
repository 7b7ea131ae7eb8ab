"""Deterministic Chinese word segmentation (jieba stand-in).

The reference segments Chinese with ``jieba.lcut``
(/root/reference/core/utils/text_processor.py:148).  jieba is not
installed in this environment and its HMM path is data-dependent, so we
implement a deterministic **forward maximum-matching** segmenter over an
embedded dictionary.  Properties that matter for the engine:

- fully deterministic (no model files, no global state, no parallel mode);
- identical between the single-process oracle and the Arrow UDFs;
- covers the vocabulary used by the synthetic web corpus and the reference
  query set ("人工智能 大数据 机器学习", rule boost/domain words, …).

If a compatible ``jieba`` is importable it is used instead (gated import),
restoring byte-parity with the reference on real jieba output.
"""

from __future__ import annotations

# Embedded dictionary: reference query/rule vocabulary + common web/IR/tech
# words used by the synthetic corpus generator. Forward max-match prefers
# the longest dictionary word at each position.
ZH_DICT = frozenset({
    # reference benchmark queries (main.py:27,205) and rule words
    # (config/rules_config.yaml:12-36)
    "人工智能", "大数据", "机器学习", "深度学习", "重要", "关键", "核心",
    "紧急", "立即", "算法", "框架", "架构", "代码", "开发", "方案",
    "规划", "战略", "市场", "客户", "广告", "赞助内容", "赞助",
    # corpus/tech vocabulary
    "搜索", "引擎", "索引", "倒排", "文档", "查询", "检索", "排序",
    "分布式", "计算", "系统", "数据", "数据库", "模型", "训练",
    "神经网络", "神经", "网络", "自然语言", "语言", "处理", "信息",
    "技术", "应用", "平台", "服务", "用户", "分析", "存储", "压缩",
    "性能", "优化", "集群", "节点", "内存", "磁盘", "网页", "爬虫",
    "内容", "标题", "段落", "链接", "图片", "视频", "音频", "评论",
    "新闻", "科技", "互联网", "公司", "产品", "研究", "论文", "实验",
    "结果", "方法", "问题", "解决", "提升", "支持", "实现", "功能",
    "版本", "发布", "更新", "安全", "测试", "部署", "监控", "日志",
    "向量", "空间", "权重", "频率", "位置", "词项", "相似", "相似度",
    "精确", "召回", "评估", "指标", "效果", "质量", "速度", "吞吐",
    "并行", "任务", "调度", "资源", "管理", "工具", "开源", "社区",
    "学习", "智能", "机器", "人工",
})
_MAX_WORD_LEN = max(len(w) for w in ZH_DICT)

try:  # optional byte-parity path when jieba exists
    import jieba as _jieba  # type: ignore

    _jieba.setLogLevel(60)
    _HAVE_JIEBA = True
except Exception:  # pragma: no cover - jieba absent in this environment
    _jieba = None
    _HAVE_JIEBA = False


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


from functools import lru_cache


@lru_cache(maxsize=1 << 16)
def _fmm_cached(chunk: str) -> tuple[str, ...]:
    return tuple(_fmm_raw(chunk))


def _fmm(chunk: str) -> list[str]:
    if len(chunk) <= 24:  # short runs dominate; cache them
        return list(_fmm_cached(chunk))
    return _fmm_raw(chunk)


def _fmm_raw(chunk: str) -> list[str]:
    """Forward maximum matching over one CJK run."""
    out: list[str] = []
    i = 0
    n = len(chunk)
    while i < n:
        matched = None
        for L in range(min(_MAX_WORD_LEN, n - i), 1, -1):
            cand = chunk[i : i + L]
            if cand in ZH_DICT:
                matched = cand
                break
        if matched is None:
            matched = chunk[i]
        out.append(matched)
        i += len(matched)
    return out


def zh_cut(text: str) -> list[str]:
    """Segment mixed ZH/latin text.

    Mirrors ``jieba.lcut`` contract loosely: CJK runs are segmented,
    non-CJK runs (latin words already space-separated by clean_text) are
    kept whole; whitespace produces no tokens.
    """
    if _HAVE_JIEBA:
        return _jieba.lcut(text)
    tokens: list[str] = []
    buf: list[str] = []  # current non-CJK, non-space run
    cjk: list[str] = []  # current CJK run

    def flush_buf() -> None:
        if buf:
            tokens.append("".join(buf))
            buf.clear()

    def flush_cjk() -> None:
        if cjk:
            tokens.extend(_fmm("".join(cjk)))
            cjk.clear()

    for ch in text:
        if ch.isspace():
            flush_buf()
            flush_cjk()
        elif _is_cjk(ch):
            flush_buf()
            cjk.append(ch)
        else:
            flush_cjk()
            buf.append(ch)
    flush_buf()
    flush_cjk()
    return tokens
