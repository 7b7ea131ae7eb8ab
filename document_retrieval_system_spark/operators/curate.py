"""Training-data curation operators: duplicate clustering, deterministic
stratified sampling, and token-budget selection.

These compose the dedup / text-analysis primitives into the decisions an
LLM-data pipeline actually ships: which duplicate group a document
belongs to (keep one per cluster), which documents enter a mixture at
what per-language rate, and which quality-ranked prefix of a corpus fits
a token budget.  All three are pure DataFrame plans — no Python in the
hot path — and each is mirrored by a DuckDB oracle in entry_queries.

Scale notes:
- ``connected_components`` is iterative min-label propagation over the
  near-dup pair list.  Near-dup graphs are almost all tiny star/clique
  components, so the loop converges in a handful of rounds; each round
  is one shuffle on the edge key, and labels are localCheckpoint'd so
  the plan does not grow with iterations.  This is the standard
  large-graph CC recipe (GraphX/GraphFrames use the same shape).
- ``stratified_sample`` is a map-only filter: the sampling decision is
  a pure function of (doc_id, salt) via md5, so it is reproducible
  across runs, engines, and cluster sizes, and needs no global count —
  at 100 TB there is no shuffle at all.
- ``token_budget_select`` sorts each language by (quality desc, doc_id)
  and keeps documents whose cumulative token count starts under the
  budget — one window aggregation per language partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, src_col: str = "id_a",
                         dst_col: str = "id_b", max_iter: int = 25) -> DataFrame:
    """(node, component) for every node in ``pairs``; the component id is
    the minimum node id reachable through the pair edges (self
    included).  Deterministic for any edge order.

    Each round combines one hop of neighbor-min propagation with one
    pointer-jump through the current labels (label <- label of my
    label), so the minimum travels ~2^r nodes after r rounds — path
    components of astronomical diameter converge well inside
    ``max_iter``.  Returning silently unconverged labels would report
    one real cluster as several, so exhaustion RAISES instead."""
    # materialize the pair list once (r6): the fwd/rev union consumes
    # `pairs` twice, and without this the whole upstream pipeline that
    # produced it (e.g. LSH + exact-Jaccard verify) executed twice
    pairs = pairs.localCheckpoint(eager=True)
    fwd = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    rev = pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    for it in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src").agg(F.min("label").alias("nbr_min"))
        )
        hopped = (
            labels.join(nbr, labels["id"] == nbr["src"], "left")
            .select(
                labels["id"],
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                labels["label"].alias("_prev"),
            )
        )
        # pointer jump: follow my label's own label one step
        jump = labels.select(
            F.col("id").alias("_jid"), F.col("label").alias("_jlabel")
        )
        # convergence is read off an Observation during the checkpoint
        # job itself (r6) — the former labels-vs-new-labels comparison
        # join was a second driver-synchronized job per round
        obs = Observation(f"cc-changed-{it}")
        new_labels = (
            hopped.join(jump, hopped["label"] == jump["_jid"], "left")
            .select(
                hopped["id"],
                F.least(
                    F.col("label"), F.coalesce(F.col("_jlabel"), F.col("label"))
                ).alias("label"),
                F.col("_prev"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("_prev"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("id", "label")
            .localCheckpoint(eager=True)  # bound plan growth per round
        )
        changed = int(obs.get["changed"] or 0)
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def duplicate_clusters(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", ngram: int = 3,
                       threshold: float = 0.6, n_hashes: int = 16,
                       band_size: int = 2, bucket_cap: int = 64) -> DataFrame:
    """Near-duplicate clusters: LSH-fed exact-Jaccard pairs → connected
    components.  A pipeline keeps ``doc_id == cluster_id`` (the minimum
    member) and drops the rest."""
    from document_retrieval_system_spark.operators.dedup import lsh_jaccard_pairs

    pairs = lsh_jaccard_pairs(
        df, id_col=id_col, text_col=text_col, ngram=ngram,
        threshold=threshold, n_hashes=n_hashes, band_size=band_size,
        bucket_cap=bucket_cap,
    )
    return connected_components(pairs.select("id_a", "id_b"))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.0, salt: str = "drs",
                      id_col: str = "doc_id",
                      lang_col: str = "lang") -> DataFrame:
    """Deterministic per-language sampling: keep a document iff the
    first 6 hex digits of md5(doc_id || salt) fall under the language's
    rate.  Reproducible across runs/engines; resampling with a new salt
    draws an independent sample."""
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
                    1, 6), 16, 10
    ).cast("long")
    rate = F.lit(default_rate)
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col(lang_col) == lang, F.lit(r)).otherwise(rate)
    thresh = (rate * (1 << 24)).cast("long")
    return (
        df.withColumn("_bucket", bucket)
        .filter(F.col("_bucket") < thresh)
        .select(F.col(id_col), F.col(lang_col), F.col("_bucket").alias("sample_key"))
    )


def token_budget_select(df: DataFrame, budget_per_lang: int,
                        id_col: str = "doc_id", text_col: str = "text",
                        lang_col: str = "lang") -> DataFrame:
    """Quality-ranked token budgeting: per language, order documents by
    (quality score desc, doc_id) and keep each document whose cumulative
    whitespace-token count BEFORE adding it is under the budget (so the
    budget may be exceeded once, by the straddling document — the usual
    greedy mixture fill)."""
    from document_retrieval_system_spark.operators.textstats import quality_score

    q = quality_score(df, id_col=id_col, text_col=text_col).select(
        F.col(id_col), F.col("quality")
    )
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = F.size(F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0))
    base = df.select(F.col(id_col), F.col(lang_col), n_tok.alias("n_tokens")).join(
        q, id_col
    )
    w = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("quality").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        base.withColumn("cum_tokens", cum)
        .filter((F.col("cum_tokens") - F.col("n_tokens")) < F.lit(budget_per_lang))
        .select(id_col, lang_col, "n_tokens", "cum_tokens")
    )


def decontaminate(train: DataFrame, eval_df: DataFrame, ngram: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  eval_id_col: str = "eval_id") -> DataFrame:
    """Benchmark decontamination: (train doc, eval doc, n shared word
    n-grams) for every pair sharing at least one n-gram — the standard
    leakage check before training on web text.  Self-pairs (the same id
    on both sides) are excluded.

    Scale shape: the eval/benchmark side is small, so its exploded gram
    list broadcasts; the training side streams map-side through the
    broadcast hash join — no shuffle of training grams, only the tiny
    (train, eval) pair aggregation."""
    from document_retrieval_system_spark.operators.textstats import (
        simple_tokens,
        word_ngrams,
    )

    def grams(df, idc, alias):
        return df.select(
            F.col(idc).alias(alias),
            F.explode(
                F.array_distinct(
                    word_ngrams(simple_tokens(F.col(text_col)), ngram)
                )
            ).alias("gram"),
        )

    tr = grams(train, id_col, "doc_id")
    ev = grams(eval_df, id_col if eval_id_col not in eval_df.columns
               else eval_id_col, "eval_id")
    return (
        tr.join(F.broadcast(ev), "gram")
        .filter(F.col("doc_id") != F.col("eval_id"))
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )


def bloom_decontaminate(train: DataFrame, eval_df: DataFrame,
                        ngram: int = 8, m_bits: int = 8192, k: int = 3,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Bloom-prefiltered decontamination — the scale path when the
    eval/benchmark side outgrows a raw gram broadcast (`decontaminate`
    broadcasts the exploded gram list itself; at 10^8 eval grams that
    is gigabytes, while the Bloom summary is ``m_bits`` BITS forever).

    Mechanics: each eval gram sets k bit indices derived from
    disjoint 32-bit slices of md5(gram), mod m_bits.  The filter is
    materialized RELATIONALLY as its set-bit-index table (<= m_bits
    rows — the bit-array and the set-of-set-bits are the same object),
    built with one distinct aggregation, never collected to the
    driver.  A training gram is bloom-positive iff all k of its bit
    indices appear — identical false-positive semantics to the packed
    bit array (collisions mod m), exact in both engines.

    Output per training doc (docs with >= 1 gram):
    (doc_id, n_grams, bloom_hits, exact_hits) — exact_hits from the
    true gram join, so ``bloom_hits - exact_hits`` IS the measured
    false-positive count; downstream, only bloom-positive docs need
    the exact verify join (the two-tier shape every 100 TB filter here
    uses).

    Scale shape: eval side one explode + distinct agg into a <= m_bits
    row table, broadcast; training side map-only against it (explode,
    k slot probes, two small aggs) — no shuffle of training grams.
    """
    if not 1 <= k <= 4:
        raise ValueError("k must be 1..4 (md5 yields four 32-bit slices)")
    from document_retrieval_system_spark.operators.textstats import (
        simple_tokens,
        word_ngrams,
    )

    def grams(df):
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(
                    word_ngrams(simple_tokens(F.col(text_col)), ngram)
                )
            ).alias("gram"),
        )

    slot = F.explode(F.expr(f"sequence(0, {k - 1})")).alias("slot")
    idx = (
        F.conv(F.expr("substring(md5(gram), slot * 8 + 1, 8)"), 16, 10)
        .cast("long") % m_bits
    ).alias("idx")

    ev_bits = (
        grams(eval_df).select("gram").distinct()
        .select("gram", slot).select(idx).distinct()
    )
    ev_grams = grams(eval_df).select("gram").distinct() \
        .withColumn("_exact", F.lit(1))

    # r6 probe shape: ONE md5 per training gram (its k probe indices are
    # substrings of the same digest), and the k membership tests are k
    # map-side broadcast left-joins ANDed together — the former
    # slot-explode tripled the gram rows and then paid a full
    # (doc_id, gram) re-aggregation shuffle just to undo it.
    # min-over-slots of hit == AND of the k per-slot hits, exactly;
    # ev_bits has distinct idx rows, so no join multiplies rows and the
    # output stays one row per (doc, gram).  Everything up to the final
    # tiny per-doc aggregate is now shuffle-free.
    tr = grams(train).withColumn("_h", F.md5("gram"))
    for j in range(k):
        slot_idx = (
            F.conv(F.substring("_h", j * 8 + 1, 8), 16, 10)
            .cast("long") % m_bits
        )
        bits_j = ev_bits.withColumnRenamed("idx", f"_idx{j}") \
            .withColumn(f"_hit{j}", F.lit(1))
        tr = (
            tr.withColumn(f"_idx{j}", slot_idx)
            .join(F.broadcast(bits_j), f"_idx{j}", "left")
        )
    bloom = F.when(
        sum(F.coalesce(F.col(f"_hit{j}"), F.lit(0)) for j in range(k))
        == F.lit(k), F.lit(1)
    ).otherwise(F.lit(0))
    probes = tr.select("doc_id", "gram", bloom.alias("_bloom"))
    return (
        probes.join(F.broadcast(ev_grams), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("_bloom").cast("long").alias("bloom_hits"),
            F.sum(F.coalesce(F.col("_exact"), F.lit(0)))
            .cast("long").alias("exact_hits"),
        )
    )


def contamination_verdicts(train: DataFrame, eval_df: DataFrame,
                           ngram: int = 8, threshold: float = 0.1,
                           id_col: str = "doc_id", text_col: str = "text",
                           eval_id_col: str = "eval_id") -> DataFrame:
    """The decision layer over `decontaminate`: a per-TRAINING-doc
    verdict — (doc_id, n_grams, max_shared, worst_eval_id,
    overlap_frac, drop_flag) — so the e2e story is "which docs leave the
    corpus", not just "which pairs overlap".

    overlap_frac = max over eval docs of n_shared_grams / n_grams(train
    doc); ``drop_flag`` when that fraction reaches ``threshold``.  Docs with
    zero overlap keep a 0.0 fraction (left join), so the output covers
    EVERY training doc.

    Scale shape: the pair stage inherits decontaminate's broadcast
    (eval side small); the per-doc gram counts are map-only; the final
    join attaches the (tiny — contaminated docs only) per-doc maxima
    back to the counts, and the verdict comparison is one double
    division per doc — order-free, engine-exact."""
    from document_retrieval_system_spark.operators.textstats import (
        simple_tokens,
        word_ngrams,
    )

    pairs = decontaminate(train, eval_df, ngram, id_col, text_col,
                          eval_id_col)
    # NULL text must count as 0 grams (F.size of a NULL array is NULL /
    # legacy -1, either of which diverges from the SQL twin)
    counts = train.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.array_distinct(word_ngrams(
                simple_tokens(F.coalesce(F.col(text_col), F.lit(""))), ngram))
        ).cast("long").alias("n_grams"),
    )
    # worst eval doc per train doc: max shared count, ties to the
    # smallest eval id (deterministic across engines)
    worst = pairs.groupBy("doc_id").agg(
        F.max("n_shared_grams").alias("max_shared"),
        F.expr("min_by(eval_id, struct(-n_shared_grams, eval_id))")
        .alias("worst_eval_id"),
    )
    out = counts.join(F.broadcast(worst), "doc_id", "left")
    frac = F.when(
        F.col("max_shared").isNull() | (F.col("n_grams") == 0), F.lit(0.0)
    ).otherwise(F.col("max_shared").cast("double") / F.col("n_grams").cast("double"))
    return out.select(
        "doc_id", "n_grams",
        F.coalesce(F.col("max_shared"), F.lit(0).cast("long")).alias("max_shared"),
        F.coalesce(F.col("worst_eval_id"), F.lit(-1).cast("long")).alias("worst_eval_id"),
        frac.alias("overlap_frac"),
        (frac >= F.lit(float(threshold))).alias("drop_flag"),
    )


def canonical_url(url):
    """Canonicalize a web URL column: strip the fragment, lowercase the
    scheme+authority, drop scheme-DEFAULT ports only (http:80 / https:443
    — ':443' on an http origin is a different origin and is kept), remove
    tracking parameters anchored at a '?'/'&' separator (so a legitimate
    '?myfbclid=2' param survives), collapse duplicate slashes and the
    trailing slash in the PATH component only (query values embedding
    URLs are untouched) — the normalization pass URL-level dedup keys on.
    Pure column expressions (identical regex semantics in the DuckDB
    oracle: every pattern is lookahead-free, replacements are global)."""
    u0 = F.regexp_replace(url, r"#.*$", "")
    pre_raw = F.regexp_extract(u0, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", 0)
    pre = F.lower(pre_raw)
    pre = F.regexp_replace(pre, r"^(http://[^:]*):80$", "$1")
    pre = F.regexp_replace(pre, r"^(https://[^:]*):443$", "$1")
    rest = F.substr(u0, F.length(pre_raw) + 1, F.length(u0))
    rest = F.regexp_replace(rest, r"([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    path = F.regexp_extract(rest, r"^[^?]*", 0)
    qs = F.substr(rest, F.length(path) + 1, F.length(rest))
    path = F.regexp_replace(path, r"//+", "/")
    path = F.regexp_replace(path, r"/$", "")  # also: dir/?q=1 == dir?q=1
    return F.concat(pre, path, qs)


def url_duplicate_groups(df: DataFrame, url_col: str = "url",
                         id_col: str = "doc_id") -> DataFrame:
    """Group documents whose URLs canonicalize identically: one row per
    canonical URL with more than one variant — (canonical_url,
    n_variants, keep_id) where keep_id is the minimum member (the doc a
    pipeline keeps).  One groupBy on the canonical key; map-side
    partial aggregation makes it a single shuffle of (url, count)."""
    return (
        df.select(F.col(id_col), canonical_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_variants"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_variants") > 1)
    )


def domain_cap_sample(df: DataFrame, max_per_domain: int,
                      id_col: str = "doc_id",
                      domain_col: str = "source",
                      salt: str = "drs-domain") -> DataFrame:
    """Per-domain document cap: keep at most ``max_per_domain`` documents
    from each domain, chosen by a deterministic md5 ranking of doc ids —
    the standard anti-boilerplate / anti-SEO-farm guard in webtext
    mixtures (a handful of hosts otherwise dominate a Common-Crawl-style
    corpus).

    Output: (doc_id, domain, domain_rank) for every KEPT document,
    domain_rank 1-based within its domain.

    Scale: one window ranking per domain partition — a single shuffle on
    the domain key.  Skewed domains (the very hosts the cap exists for)
    concentrate rank work on few partitions; at 100 TB the md5 rank key
    admits a two-stage refinement (per-partition top-N, then global
    top-N per domain) because a row outside its partition's top-N can
    never be in the domain's top-N.  The md5 choice (not min(doc_id),
    not "first seen") makes the kept set a uniform random-but-
    reproducible sample of the domain, invariant to input order and
    cluster size."""
    rk_key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return (
        df.select(F.col(id_col), F.col(domain_col).alias("domain"),
                  rk_key.alias("_rk"))
        .withColumn("domain_rank",
                    F.row_number().over(
                        Window.partitionBy("domain")
                        .orderBy(F.col("_rk"), F.col(id_col))
                    ).cast("long"))
        .filter(F.col("domain_rank") <= F.lit(max_per_domain))
        .select(id_col, "domain", "domain_rank")
    )


def canonical_per_cluster(clusters: DataFrame, quality: DataFrame,
                          id_col: str = "doc_id",
                          cluster_col: str = "cluster_id",
                          quality_col: str = "quality") -> DataFrame:
    """The dedup DECISION layer: for every duplicate cluster, elect the
    single canonical member a pipeline keeps — highest quality score,
    ties broken by lowest id (deterministic across engines and
    partitionings; `quality_col` must already be rounded to a stable
    precision, as textstats.quality_score's 4-decimal output is).

    `clusters` is (id, cluster_id) — e.g. duplicate_clusters output —
    and `quality` is (id, quality).  Returns (id, cluster_id, quality,
    keep): one row per clustered doc, exactly one keep=true per
    cluster.  Docs in no cluster never reach this operator and are
    kept implicitly.

    Scale shape: one equi-join on the doc id and one window over
    cluster_id.  Near-dup clusters are tiny (star/clique components of
    a handful of members), so the window partition is never hot even
    when one boilerplate template produces millions of CLUSTERS — the
    skew lives across clusters, not inside one.
    """
    j = clusters.join(quality.select(F.col(id_col), F.col(quality_col)),
                      id_col)
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc())
    return j.select(
        id_col, cluster_col, quality_col,
        (F.row_number().over(w) == 1).alias("keep"),
    )
