"""Incremental ANN maintenance: vectors stream into a live IVF index
(insert + update), queries stay correct, partition pruning survives, and
the drift trigger knows when a refit-and-rebuild is due — the I6
streaming story, for the vector index."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators import similarity


def _mk(rng, centers, cluster, n, start_id, dim, noise=0.03):
    rows = []
    for i in range(n):
        v = centers[cluster] + noise * rng.standard_normal(dim)
        rows.append((start_id + i, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
    return rows


@pytest.fixture(scope="module")
def ivf_world(spark):
    """14 base clusters x 10 vectors (ids 0..139) + 6 later clusters x 10
    (ids 140..199) + replacement vectors for 5 base ids that MOVE them
    into a later cluster."""
    rng = np.random.default_rng(23)
    dim = 16
    centers = rng.standard_normal((20, dim))
    base = []
    for c in range(14):
        base += _mk(rng, centers, c, 10, c * 10, dim)
    fresh = []
    for j, c in enumerate(range(14, 20)):
        fresh += _mk(rng, centers, c, 10, 140 + j * 10, dim)
    moved = [(vid, vec) for (vid, _), (_, vec) in
             zip(base[:5], _mk(rng, centers, 19, 5, 0, dim))]
    schema = "vec_id long, embedding array<float>"
    return {
        "base": spark.createDataFrame(base, schema),
        "batch": spark.createDataFrame(fresh + moved, schema),
        "full": spark.createDataFrame(
            [r for r in base if r[0] >= 5] + fresh + moved, schema),
        "centers": centers,
        "dim": dim,
    }


def test_ivf_upsert_equals_rebuild_and_prunes(spark, ivf_world, tmp_path):
    """After insert+update maintenance, the index holds EXACTLY what a
    from-scratch build over the merged data (same frozen centroids)
    holds — same rows, same cells — and ivf_topk still carries an
    ivf_cell PartitionFilter."""
    cents = similarity.ivf_centroids(ivf_world["base"], n_clusters=12,
                                     iters=10, seed=7)
    live = str(tmp_path / "ivf_live")
    similarity.build_ivf_index(ivf_world["base"], live, cents)

    stats = similarity.ivf_upsert(spark, live, ivf_world["batch"], cents)
    assert stats["batch_rows"] == 65
    assert 0 < stats["affected_cells"] <= 12

    fresh_dir = str(tmp_path / "ivf_fresh")
    similarity.build_ivf_index(ivf_world["full"], fresh_dir, cents)
    got = {(r["vec_id"], r["ivf_cell"], tuple(r["embedding"]))
           for r in spark.read.parquet(live).collect()}
    want = {(r["vec_id"], r["ivf_cell"], tuple(r["embedding"]))
            for r in spark.read.parquet(fresh_dir).collect()}
    assert got == want
    # every id exactly once: updates replaced, never duplicated
    assert len({g[0] for g in got}) == len(got) == 200

    # queries after maintenance: pruning pinned + exact same-cluster recall
    q = [float(x) for x in
         ivf_world["batch"].filter(F.col("vec_id") == 150).head()["embedding"]]
    res = similarity.ivf_topk(spark, live, q, cents, k=10, nprobe=3,
                              pre_filter=F.col("vec_id") != 150)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "ivf_cell" in plan.split("PartitionFilters", 1)[1][:500]
    exact = similarity.cosine_topk(
        ivf_world["full"].filter(F.col("vec_id") != 150), q, k=10).collect()
    got_top = res.collect()
    assert [(r["vec_id"], r["cosine"]) for r in got_top[:9]] == [
        (r["vec_id"], r["cosine"]) for r in exact[:9]
    ]


def test_ivf_upsert_moves_updated_ids_across_cells(spark, ivf_world, tmp_path):
    """A resent vec_id whose new vector belongs to a different cell must
    leave its old partition (no stale row shadowing the update)."""
    cents = similarity.ivf_centroids(ivf_world["base"], n_clusters=12,
                                     iters=10, seed=7)
    live = str(tmp_path / "ivf_live2")
    similarity.build_ivf_index(ivf_world["base"], live, cents)
    before = {r["vec_id"]: r["ivf_cell"]
              for r in spark.read.parquet(live).filter("vec_id < 5").collect()}
    similarity.ivf_upsert(spark, live, ivf_world["batch"], cents)
    after_rows = spark.read.parquet(live).filter("vec_id < 5").collect()
    after = {r["vec_id"]: r["ivf_cell"] for r in after_rows}
    assert len(after_rows) == 5 == len(after)
    # ids 0..4 were re-sent with vectors from a far cluster: cell changed
    assert any(after[i] != before[i] for i in range(5))
    # and the stored vector is the NEW one (matches the batch payload)
    batch_vec = {r["vec_id"]: tuple(r["embedding"])
                 for r in ivf_world["batch"].filter("vec_id < 5").collect()}
    for r in after_rows:
        assert tuple(r["embedding"]) == batch_vec[r["vec_id"]]


def test_ivf_refit_trigger(spark, ivf_world, tmp_path):
    """Frozen centroids on unchanged data: no drift. After six unseen
    clusters stream in, candidate centroids refit on the merged data
    reassign enough vectors to trip the rebuild trigger."""
    cents = similarity.ivf_centroids(ivf_world["base"], n_clusters=12,
                                     iters=10, seed=7)
    live = str(tmp_path / "ivf_live3")
    similarity.build_ivf_index(ivf_world["base"], live, cents)
    assert not similarity.ivf_refit_needed(spark, live, cents,
                                           max_drift_frac=0.0)
    similarity.ivf_upsert(spark, live, ivf_world["batch"], cents)
    merged = spark.read.parquet(live).select("vec_id", "embedding")
    cand = similarity.ivf_centroids(merged, n_clusters=12, iters=10, seed=7)
    assert similarity.ivf_refit_needed(spark, live, cand, max_drift_frac=0.05)
    # the rebuild restores zero drift against the candidates
    rebuilt = str(tmp_path / "ivf_rebuilt")
    similarity.build_ivf_index(merged, rebuilt, cand)
    assert not similarity.ivf_refit_needed(spark, rebuilt, cand,
                                           max_drift_frac=0.0)


def test_ivfpq_upsert_equals_rebuild_and_prunes(spark, ivf_world, tmp_path):
    """IVF-PQ maintenance: after insert+update the code table holds
    EXACTLY what a from-scratch build over the merged data (same frozen
    centroids + codebooks) holds; queries keep partition pruning and
    agree with the rebuilt index."""
    cents = similarity.ivf_centroids(ivf_world["base"], n_clusters=12,
                                     iters=10, seed=7)
    books = similarity.ivfpq_residual_books(ivf_world["base"], cents,
                                            m=8, ksub=16, iters=8, seed=11)
    live = str(tmp_path / "ivfpq_live")
    similarity.build_ivfpq_index(ivf_world["base"], live, cents, books)

    stats = similarity.ivfpq_upsert(spark, live, ivf_world["batch"],
                                    cents, books)
    assert stats["batch_rows"] == 65
    assert 0 < stats["affected_cells"] <= 12

    fresh_dir = str(tmp_path / "ivfpq_fresh")
    similarity.build_ivfpq_index(ivf_world["full"], fresh_dir, cents, books)
    got = {(r["vec_id"], r["ivf_cell"], r["pq_code"])
           for r in spark.read.parquet(live).collect()}
    want = {(r["vec_id"], r["ivf_cell"], r["pq_code"])
            for r in spark.read.parquet(fresh_dir).collect()}
    assert got == want
    assert len({g[0] for g in got}) == len(got) == 200

    # stale codes are gone: a moved id carries the code of its NEW
    # vector's residual, in its NEW cell
    moved = spark.read.parquet(live).filter("vec_id < 5").collect()
    moved_want = {r["vec_id"]: (r["ivf_cell"], r["pq_code"])
                  for r in spark.read.parquet(fresh_dir)
                  .filter("vec_id < 5").collect()}
    assert {r["vec_id"]: (r["ivf_cell"], r["pq_code"]) for r in moved} \
        == moved_want

    # query after maintenance: pruning pinned, result == same query on
    # the rebuilt index
    q = [float(x) for x in
         ivf_world["batch"].filter(F.col("vec_id") == 150).head()["embedding"]]
    res = similarity.ivfpq_topk(spark, live, ivf_world["full"], q,
                                cents, books, k=10, nprobe=3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "ivf_cell" in plan.split("PartitionFilters", 1)[1][:500]
    want_rows = similarity.ivfpq_topk(spark, fresh_dir, ivf_world["full"], q,
                                      cents, books, k=10, nprobe=3).collect()
    assert [(r["vec_id"], r["cosine"]) for r in res.collect()] == \
        [(r["vec_id"], r["cosine"]) for r in want_rows]


def test_upsert_emptied_cell_and_batch_duplicates(spark, tmp_path):
    """Two review-found edge cases: (1) an affected old cell whose only
    row is resent away and which receives nothing new must be DELETED
    (dynamic overwrite alone leaves the stale partition); (2) a vec_id
    repeated within one batch collapses to one stored row."""
    import numpy as np

    dim = 8
    # two tight clusters far apart -> 2 well-separated centroids
    a = [1.0] + [0.0] * (dim - 1)
    b = [0.0] * (dim - 1) + [1.0]
    base = [(1, a), (2, b), (3, [x * 0.9 + 0.01 for x in b])]
    schema = "vec_id long, embedding array<float>"
    base_df = spark.createDataFrame(base, schema)
    cents = similarity.ivf_centroids(base_df, n_clusters=2, iters=5, seed=3)

    for kind in ("ivf", "ivfpq"):
        live = str(tmp_path / f"{kind}_edge")
        if kind == "ivf":
            similarity.build_ivf_index(base_df, live, cents)
        else:
            books = similarity.ivfpq_residual_books(base_df, cents, m=4,
                                                    ksub=2, iters=4, seed=5)
            similarity.build_ivfpq_index(base_df, live, cents, books)
        cell_of_1 = spark.read.parquet(live).filter("vec_id = 1") \
            .head()["ivf_cell"]
        # batch: vec_id 1 moves to the b-cluster (emptying its old cell),
        # sent TWICE in the batch; vec_id 9 is fresh
        batch = spark.createDataFrame(
            [(1, b), (1, b), (9, [x * 1.1 for x in b])], schema)
        if kind == "ivf":
            similarity.ivf_upsert(spark, live, batch, cents)
        else:
            similarity.ivfpq_upsert(spark, live, batch, cents, books)
        rows = spark.read.parquet(live).collect()
        ids = sorted(r["vec_id"] for r in rows)
        assert ids == [1, 2, 3, 9], f"{kind}: {ids}"
        # old cell of vec 1 must be gone or free of vec 1's stale row
        stale = [r for r in rows
                 if r["vec_id"] == 1 and r["ivf_cell"] == cell_of_1]
        assert not stale, f"{kind}: stale row survived in {cell_of_1}"
        assert len([r for r in rows if r["vec_id"] == 1]) == 1
        # the emptied partition directory itself is deleted
        import os
        assert not os.path.exists(os.path.join(live,
                                               f"ivf_cell={cell_of_1}")), kind


def test_lsh_upsert_equals_rebuild_and_prunes(spark, ivf_world, tmp_path):
    """Maintained LSH index == from-scratch rebuild row-for-row, and the
    multi-probe query still partition-prunes after maintenance."""
    idx = str(tmp_path / "lsh_maint")
    dim = ivf_world["dim"]
    kw = dict(sig_bits=12, bucket_bits=6, seed=7, dim=dim)
    similarity.build_lsh_index(ivf_world["base"], idx, **kw)
    res = similarity.lsh_upsert(spark, idx, ivf_world["batch"], **kw)
    assert res["batch_rows"] == 65 and res["rewritten_rows"] >= 65

    fresh_idx = str(tmp_path / "lsh_fresh")
    similarity.build_lsh_index(ivf_world["full"], fresh_idx, **kw)
    got = {(r["vec_id"], r["bucket"], r["sig"]) for r in
           spark.read.parquet(idx).collect()}
    want = {(r["vec_id"], r["bucket"], r["sig"]) for r in
            spark.read.parquet(fresh_idx).collect()}
    assert got == want

    # query correctness + pruning survive maintenance
    q = ivf_world["full"].filter(F.col("vec_id") == 150).head()["embedding"]
    top = similarity.lsh_index_topk(
        spark, idx, [float(x) for x in q], k=5,
        sig_bits=12, bucket_bits=6, hamming_probe=3, seed=7)
    ids = [r["vec_id"] for r in top.collect()]
    assert ids[0] == 150
    from document_retrieval_system_spark.plans.explain import formatted_plan

    plan = formatted_plan(
        spark.read.parquet(idx).filter(F.col("bucket").isin(["b000000"])))
    assert "PartitionFilters" in plan


def test_lsh_upsert_emptied_bucket_and_batch_duplicates(spark, tmp_path):
    """A bucket emptied by the upsert must not keep its stale row, and a
    vec_id duplicated WITHIN the batch writes exactly one row."""
    dim = 4
    idx = str(tmp_path / "lsh_edge")
    # two near-orthogonal vectors land in different buckets
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    base = spark.createDataFrame([(1, a)], "vec_id long, embedding array<float>")
    similarity.build_lsh_index(base, idx, sig_bits=8, bucket_bits=4,
                               seed=7, dim=dim)
    old_bucket = spark.read.parquet(idx).head()["bucket"]
    # resend id 1 with vector b (moves bucket), duplicated in-batch
    batch = spark.createDataFrame(
        [(1, b), (1, b)], "vec_id long, embedding array<float>")
    similarity.lsh_upsert(spark, idx, batch, sig_bits=8, bucket_bits=4,
                          seed=7, dim=dim)
    rows = spark.read.parquet(idx).collect()
    assert len(rows) == 1 and rows[0]["vec_id"] == 1
    new_bucket = rows[0]["bucket"]
    if new_bucket != old_bucket:
        import os

        assert not os.path.exists(os.path.join(idx, f"bucket={old_bucket}"))
