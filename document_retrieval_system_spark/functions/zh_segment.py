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

import re

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

# General high-frequency vocabulary (public word-frequency knowledge:
# the same everyday compounds that dominate jieba's dict.txt top ranks /
# HSK lists).  FMM agrees with jieba exactly where the dictionary covers
# the compounds a text uses, so widening coverage from the corpus-only
# vocabulary to common web Chinese directly raises boundary parity on
# out-of-corpus text; the gated parity test below measures it whenever a
# real jieba is importable.
_COMMON_WORDS = frozenset("""
我们 你们 他们 她们 它们 自己 大家 这个 那个 这些 那些 这里 那里 什么
怎么 为什么 时候 现在 今天 明天 昨天 今年 去年 明年 已经 还是 就是
但是 因为 所以 如果 虽然 然后 而且 或者 以及 通过 对于 关于 根据
按照 由于 为了 除了 可以 可能 应该 必须 需要 希望 认为 觉得 知道
了解 理解 发现 发生 进行 使用 提供 包括 成为 开始 结束 继续 停止
完成 实现 达到 超过 增加 减少 提高 降低 改变 保持 获得 失去 选择
决定 同意 反对 支持 帮助 影响 造成 导致 引起 出现 存在 表示 表明
说明 介绍 解释 描述 讨论 研究 调查 报告 会议 活动 组织 参加 举行
非常 十分 特别 尤其 比较 更加 最终 突然 逐渐 一直 总是 经常 有时
几乎 大约 左右 以上 以下 之间 之后 之前 以后 以前 后来 同时 目前
未来 过去 发展 经济 社会 国家 政府 世界 中国 美国 国际 国内 历史
文化 教育 学校 大学 学生 老师 教授 工作 生活 时间 地方 城市 农村
地区 人口 家庭 父母 孩子 朋友 同事 关系 企业 公司 银行 金融 投资
市场 价格 增长 改革 政策 法律 制度 建设 环境 能源 交通 医疗 健康
疾病 医院 医生 药物 食品 农业 工业 生产 产品 消费 贸易 出口 进口
合作 竞争 创新 科学 项目 计划 目标 过程 阶段 情况 状态 条件 要求
标准 水平 能力 经验 知识 音乐 电影 艺术 文学 小说 作者 读者 媒体
记者 报道 电视 广播 手机 电脑 软件 硬件 程序 编程 数字 网站 邮件
价值 意义 作用 效率 方式 方法 方向 意见 建议 交流 沟通 表达 证明
观察 注意 重视 关注 兴趣 爱好 习惯 传统 现代 变化 差异 特点 特征
优势 缺点 困难 挑战 机会 风险 危机 事故 灾害 战争 和平 自由 民主
权利 责任 义务 道德 精神 思想 理论 观点 态度 行为 行动 措施 手段
基础 结构 体系 机制 模式 类型 种类 数量 部分 全部 整个 主要 重点
直接 间接 明显 严重 复杂 简单 容易 困难 快速 缓慢 巨大 微小 丰富
积极 消极 正确 错误 成功 失败 努力 坚持 相信 怀疑 担心 害怕 高兴
满意 失望 惊讶 生气 紧张 轻松 舒服 痛苦 幸福 快乐 悲伤 孤独 温暖
寒冷 炎热 凉爽 美丽 漂亮 干净 整洁 安静 热闹 方便 困扰 安全 危险
重要性 可能性 必要性 积极性 创造性 多样性 稳定性 灵活性
""".split())

ZH_DICT = ZH_DICT | _COMMON_WORDS
_MAX_WORD_LEN = max(len(w) for w in ZH_DICT)

try:  # optional byte-parity path when jieba exists
    import jieba as _jieba  # type: ignore

    _jieba.setLogLevel(60)
    _HAVE_JIEBA = True
except Exception:  # pragma: no cover - jieba absent in this environment
    _jieba = None
    _HAVE_JIEBA = False


from functools import lru_cache


@lru_cache(maxsize=1 << 16)
def _fmm_cached(chunk: str) -> tuple[str, ...]:
    return tuple(_fmm_raw(chunk))


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
    return fmm_cut(text)


# maximal CJK runs | maximal non-CJK non-space runs, in document order —
# the C-level regex scan replaces a per-character Python loop that was
# >50% of analyzer time (equivalence with the char loop differentially
# fuzz-tested incl. every codepoint where isspace() could diverge from \s)
_RUN_RE = re.compile(r"[一-鿿]+|[^一-鿿\s]+")


def fmm_cut(text: str) -> list[str]:
    """The FMM stand-in itself, callable regardless of jieba — the gated
    parity test measures THIS against jieba.lcut (zh_cut would compare
    jieba with itself when jieba is importable)."""
    tokens: list[str] = []
    extend, append, cached = tokens.extend, tokens.append, _fmm_cached
    for m in _RUN_RE.finditer(text):
        run = m.group()
        if "一" <= run[0] <= "鿿":
            # extend straight from the memo tuple; only long runs pay
            # the uncached FMM scan
            if len(run) <= 24:
                extend(cached(run))
            else:
                extend(_fmm_raw(run))
        else:
            append(run)
    return tokens
