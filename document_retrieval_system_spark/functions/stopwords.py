"""Stopword sets.

- ``EN_STOPWORDS``: the standard NLTK English stopword list (public data;
  the reference loads it via ``nltk_stopwords.words('english')``,
  /root/reference/core/utils/text_processor.py:76-77).  Embedded verbatim
  because NLTK is unavailable in this environment.
- ``ZH_STOPWORDS``: the reference's built-in "basic Chinese stopwords"
  fallback set (/root/reference/core/utils/text_processor.py:88-90), used
  when no stopword file is present — which is the live default.
"""

EN_STOPWORDS = frozenset("""
i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself it
it's its itself they them their theirs themselves what which who whom this
that that'll these those am is are was were be been being have has had
having do does did doing a an the and but if or because as until while of
at by for with about against between into through during before after
above below to from up down in out on off over under again further then
once here there when where why how all any both each few more most other
some such no nor not only own same so than too very s t can will just don
don't should should've now d ll m o re ve y ain aren aren't couldn
couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't
isn isn't ma mightn mightn't mustn mustn't needn needn't shan shan't
shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
""".split())

ZH_STOPWORDS = frozenset({
    "的", "了", "和", "是", "就", "都", "而", "及", "与", "着",
    "或", "一个", "没有", "我们", "你们", "他们", "她们", "这个",
    "那个", "这些", "那些", "不", "在", "有", "个", "中", "为",
})
