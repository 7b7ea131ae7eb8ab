"""Dedup family + ANN operators on the synthetic corpus (which contains
engineered exact duplicates every 53rd page)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from document_retrieval_system_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs_df(spark, corpus_pages):
    """documents-shaped df from extracted synthetic pages."""
    from document_retrieval_system_spark.sources.html_extract import extract_html

    rows = []
    for i, (url, _ts, html, lang) in enumerate(corpus_pages):
        rows.append((i, extract_html(html, url)["content"], lang))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates_found(docs_df, corpus_pages):
    groups = dedup.exact_duplicate_groups(docs_df).collect()
    # engineered clones: pages 53, 106, 159, 212 clone their predecessor
    dup_members = {r["keep_id"] for r in groups}
    assert {52, 105, 158, 211} & dup_members, groups
    for g in groups:
        assert g["n_dups"] >= 2


def test_exact_dedup_keeps_min_id(docs_df):
    n_before = docs_df.count()
    deduped = dedup.exact_dedup(docs_df)
    n_after = deduped.count()
    assert n_after < n_before
    # survivors must include the min doc_id of each clone pair
    ids = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert 52 in ids and 53 not in ids


def test_minhash_lsh_finds_clones(docs_df):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(docs_df).collect()
    }
    # identical EN docs share every band -> must be candidates (ZH clones
    # are invisible to the [a-z] simple analyzer — covered by exact dedup)
    assert (52, 53) in pairs
    assert (211, 212) in pairs


def test_jaccard_verifies_clones(docs_df):
    pairs = dedup.ngram_jaccard_pairs(docs_df, ngram=3, threshold=0.9).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got.get((52, 53)) == pytest.approx(1.0)


def test_simhash_identical_docs_same_signature(docs_df):
    sig = {r["doc_id"]: r["simhash_bits"] for r in dedup.simhash(docs_df).collect()}
    assert sig[52] == sig[53]
    assert len(sig[52]) == 32 and set(sig[52]) <= {"0", "1"}


def test_lsh_ann_recall_vs_bruteforce(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((200, 32)).astype(np.float32)
    rows = [(int(i), base[i].tolist()) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = base[0].tolist()
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in similarity.lsh_topk(emb, q, k=10, sig_bits=12, hamming_probe=5).collect()
    ]
    assert exact[0] == 0  # self-match is rank 1
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (exact, approx)


def test_lsh_is_deterministic(spark):
    rng = np.random.default_rng(4)
    base = rng.standard_normal((50, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(int(i), base[i].tolist()) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    q = base[1].tolist()
    a = [tuple(r) for r in similarity.lsh_topk(emb, q, k=5).collect()]
    b = [tuple(r) for r in similarity.lsh_topk(emb, q, k=5).collect()]
    assert a == b


def test_embedding_neardup_pairs(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    almost = [0.999, 0.04, 0.0, 0.0]
    ortho = [0.0, 1.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(1, v), (2, almost), (3, ortho)], "vec_id long, embedding array<float>"
    )
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.95).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_multimodal_feature_plumbing(spark):
    from document_retrieval_system_spark.sources.multimodal import (
        extract_features,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, 32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    for r in feats:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
    # deterministic: same payload -> same feature
    again = {r["media_id"]: list(r["feature"]) for r in extract_features(media).collect()}
    first = {r["media_id"]: list(r["feature"]) for r in feats}
    assert again == first


def test_multimodal_resize_and_frame_sampling(spark):
    """Resize + frame-sample plumbing: schemas, deterministic output,
    explode-shaped fan-out proportional to duration, and column pruning
    (payload/metadata only — never url/mime)."""
    from document_retrieval_system_spark.plans.explain import read_schemas
    from document_retrieval_system_spark.sources.multimodal import (
        resize_images,
        sample_frames,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, 30)

    rz = resize_images(media, out_w=8, out_h=8)
    rows = {r["media_id"]: r for r in rz.collect()}
    assert len(rows) == 30
    for r in rows.values():
        assert r["out_w"] == 8 and r["out_h"] == 8
        assert r["pixels"] is not None and len(r["pixels"]) == 64
    rows2 = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    assert all(bytes(rows[i]["pixels"]) == bytes(rows2[i]["pixels"]) for i in rows)
    rs = read_schemas(rz)
    assert "url" not in rs and "mime" not in rs, rs

    fr = sample_frames(media, every_ms=1000)
    got = fr.collect()
    vids = {r["media_id"]: r for r in media.collect() if r["kind"] == "video"}
    # fan-out exactly duration//every per video row (min 1), nothing else
    from collections import Counter

    per = Counter(r["media_id"] for r in got)
    assert set(per) == {
        m for m, r in vids.items() if r["payload"] is not None
    }
    for m, cnt in per.items():
        assert cnt == max(1, vids[m]["duration_ms"] // 1000), m
    from document_retrieval_system_spark.sources.mp4_box import parse_mp4_samples

    for r in got:
        payload = bytes(vids[r["media_id"]]["payload"])
        trk = parse_mp4_samples(payload)
        if trk is not None:
            # REAL container path: frame bytes are the exact sample range
            # covering the grid point, ts is the sample's decode ts
            import bisect

            ts_index = [s.ts_ms for s in trk.samples]
            k = max(0, bisect.bisect_right(ts_index, r["frame_no"] * 1000) - 1)
            s = trk.samples[k]
            assert r["ts_ms"] == s.ts_ms
            assert bytes(r["frame"]) == payload[s.offset : s.offset + s.size]
        else:
            assert r["ts_ms"] == r["frame_no"] * 1000
            assert len(bytes(r["frame"])) == 32


def test_multimodal_real_stdlib_decoders(spark):
    """BMP / PPM / WAV decode is REAL: byte-exact round-trips through the
    fixture writers, correct features from known pixels/samples, and the
    fixture's image+audio rows come back decoded=true while opaque video
    bytes take the documented stub path (decoded=false)."""
    import numpy as np

    from document_retrieval_system_spark.sources.multimodal import (
        decode_bmp,
        decode_media,
        decode_ppm,
        decode_wav,
        extract_features,
        make_bmp,
        make_ppm,
        make_wav,
        resize_images,
        synthetic_media_df,
    )

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (3, 5), (16, 9), (7, 8)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(make_bmp(px)), px)
        assert np.array_equal(decode_ppm(make_ppm(px)), px)
    s = (rng.random(500) * 2 - 1) * 0.9
    dec, rate = decode_wav(make_wav(s, 8000))
    assert rate == 8000 and np.abs(dec - s).max() <= 1.6 / 32768
    # flat image -> exact known features (w, h, means, stds, histogram)
    flat = np.full((4, 6, 3), 100, dtype=np.uint8)
    feat = decode_media(make_bmp(flat))
    assert feat[0] == 6 and feat[1] == 4
    assert abs(feat[2] - 100 / 255) < 1e-6 and abs(feat[5]) < 1e-6
    # a PNG signature with a garbage body must fail the chunk/CRC parse,
    # and a JPEG SOI with a garbage body the marker parse — None, no crash
    assert decode_media(b"\x89PNG\r\n\x1a\ngarbage") is None
    assert decode_media(b"\xff\xd8\xff\xe0jpeg") is None

    rows = extract_features(synthetic_media_df(spark, 12)).collect()
    by_kind: dict = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r["decoded"])
    assert all(by_kind["image"]) and all(by_kind["audio"])
    # video rows: MJPEG MP4s decode end-to-end (container + JPEG), the
    # opaque-codec rows keep the documented decoded=false stub path
    assert sorted(by_kind["video"]) == [False, False, True, True]

    # resize consumes REAL pixels for bmp payloads: a constant image
    # resizes to constant bytes (the stub would give hash noise)
    media = spark.createDataFrame(
        [(0, "u", "image", make_bmp(flat), "image/bmp", 6, 4, 0)],
        "media_id long, url string, kind string, payload binary, "
        "mime string, width int, height int, duration_ms int",
    )
    out = resize_images(media, 3, 2).collect()[0]
    assert bytes(out["pixels"]) == bytes([100] * 6)

def test_png_decoder_round_trips_all_filters(spark):
    """Pure-stdlib PNG decode (zlib IDAT, filters 0-4): byte-exact
    round-trips through make_png for gray/RGB/RGBA at every filter type
    and a mixed per-row cycle; palette images resolve through PLTE;
    corrupt CRC / truncation / interlace are rejected with None, never a
    crash; PNG fixture rows flow decoded=true through the feature and
    resize stages."""
    import struct
    import zlib

    import numpy as np

    from document_retrieval_system_spark.sources.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_media,
        decode_png,
        extract_features,
        make_png,
        resize_images,
        synthetic_media_df,
    )

    rng = np.random.default_rng(23)
    shapes = [(1, 1), (3, 5), (16, 9), (7, 8)]
    for h, w in shapes:
        gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        for f in (0, 1, 2, 3, 4, [0, 1, 2, 3, 4]):
            assert np.array_equal(decode_png(make_png(gray, f)), gray), (h, w, f)
            assert np.array_equal(decode_png(make_png(rgb, f)), rgb), (h, w, f)
            # RGBA decodes to RGB (alpha dropped)
            assert np.array_equal(
                decode_png(make_png(rgba, f)), rgba[:, :, :3]
            ), (h, w, f)

    # palette (color type 3): hand-built PLTE + index rows
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"PLTE", plte.tobytes())
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), plte[idx])

    # rejection: flipped CRC byte, truncation, Adam7 interlace
    good = make_png(np.zeros((4, 4, 3), dtype=np.uint8))
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)  # interlace=1
    interlaced = (_PNG_SIG + _png_chunk(b"IHDR", ihdr_i)
                  + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 52))
                  + _png_chunk(b"IEND", b""))
    assert decode_png(interlaced) is None
    assert decode_png(good[: len(good) // 2]) is None
    corrupt = bytearray(good)
    corrupt[len(_PNG_SIG) + 8 + 3] ^= 0x01  # flip an IHDR payload byte -> CRC fails
    assert decode_png(bytes(corrupt)) is None

    # known-pixel features through the full dispatch
    flat = np.full((4, 6, 3), 100, dtype=np.uint8)
    feat = decode_media(make_png(flat, filters=[0, 1, 2, 3, 4]))
    assert feat is not None and feat[0] == 6 and feat[1] == 4
    assert abs(feat[2] - 100 / 255) < 1e-6

    # fixture PNG rows decode for real in the pipeline stages
    rows = extract_features(synthetic_media_df(spark, 36)).collect()
    png_rows = [r for r in rows if r["kind"] == "image"]
    assert all(r["decoded"] for r in png_rows)
    media = spark.createDataFrame(
        [(0, "u", "image", make_png(flat), "image/png", 6, 4, 0)],
        "media_id long, url string, kind string, payload binary, "
        "mime string, width int, height int, duration_ms int",
    )
    out = resize_images(media, 3, 2).collect()[0]
    assert bytes(out["pixels"]) == bytes([100] * 6)

def test_winnow_overlap_pairs_guarantee_and_cap(spark):
    """Winnowing guarantee: docs sharing a substring of length >=
    window + k - 1 share at least one fingerprint; disjoint docs share
    none; min_shared filters; a fingerprint hotter than bucket_cap is
    dropped before the join (boilerplate guard)."""
    from document_retrieval_system_spark.operators.dedup import (
        winnow_overlap_pairs,
    )
    from document_retrieval_system_spark.operators.textstats import (
        winnowed_sets,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "prefix one " + shared + " suffix alpha"),
        (2, "totally different lead-in " + shared + " other tail text"),
        (3, "no overlap here at all zzz qqq www eee rrr ttt yyy uuu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"]
             for r in winnow_overlap_pairs(df, min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs

    # min_shared filter: identical docs share ~all fingerprints, so a
    # high threshold keeps the clone pair and drops the substring pair
    big = " ".join(f"tok{i:03d}" for i in range(200))
    df2 = spark.createDataFrame(
        [(1, big), (2, big), (3, "prefix " + shared + " tail")],
        "doc_id long, text string",
    )
    n_fp = winnowed_sets(df2).filter("doc_id = 1").collect()[0]["fps"]
    strict = {(r["id_a"], r["id_b"])
              for r in winnow_overlap_pairs(df2, min_shared=len(n_fp)).collect()}
    assert strict == {(1, 2)}

    # cap: the same text in bucket_cap+1 docs -> every fingerprint is
    # hot -> all pairs suppressed (exact dedup owns byte-identical text)
    clones = spark.createDataFrame(
        [(i, big) for i in range(6)], "doc_id long, text string"
    )
    assert winnow_overlap_pairs(clones, min_shared=1, bucket_cap=5).count() == 0
    assert winnow_overlap_pairs(clones, min_shared=1, bucket_cap=6).count() > 0


def test_cap_drop_observation_metrics(spark):
    """NO SILENT CAPS: the skew-cap stages report dropped/total row
    counts through pyspark.sql.Observation — exact ground truth for the
    winnow fingerprint cap and the LSH band-bucket cap."""
    from collections import Counter

    from pyspark.sql import Observation

    from document_retrieval_system_spark.operators.dedup import (
        minhash_lsh_candidates,
        winnow_overlap_pairs,
    )
    from document_retrieval_system_spark.operators.textstats import (
        winnowed_sets,
    )

    big = " ".join(f"tok{i:03d}" for i in range(120))
    docs = [(i, big) for i in range(6)] + [
        (10, "some unrelated text that is long enough to winnow alone"),
        (11, "another distinct document body with no overlap whatsoever"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # ground truth: every fp held by the 6 clones appears 6 times -> all
    # those (id, fp) rows are dropped at cap=5; the two singletons stay
    fp_rows = [(r["doc_id"], fp) for r in winnowed_sets(df).collect()
               for fp in r["fps"]]
    by_fp = Counter(fp for _, fp in fp_rows)
    want_dropped = sum(1 for _, fp in fp_rows if by_fp[fp] > 5)
    assert want_dropped > 0

    obs = Observation("winnow-caps")
    out = winnow_overlap_pairs(df, min_shared=1, bucket_cap=5,
                               observation=obs)
    assert out.count() == 0
    assert obs.get["cap_dropped_rows"] == want_dropped
    assert obs.get["cap_total_rows"] == len(fp_rows)

    # LSH band cap: 6 clones share every band key -> 6 rows per hot
    # bucket dropped at cap=5; a fresh Observation per action
    obs2 = Observation("lsh-caps")
    cand = minhash_lsh_candidates(df, bucket_cap=5, observation=obs2)
    assert cand.count() == 0 or all(
        r["id_a"] >= 10 or r["id_b"] >= 10 for r in cand.collect()
    )
    got = obs2.get
    assert got["cap_dropped_rows"] > 0
    assert got["cap_total_rows"] >= got["cap_dropped_rows"]

    # exact_overlap_spans gram cap: 6 clones make every gram 6-hot ->
    # all (id, pos) gram rows dropped at cap=5, zero spans survive
    from document_retrieval_system_spark.operators.dedup import (
        exact_overlap_spans,
    )

    obs3 = Observation("gram-caps")
    spans = exact_overlap_spans(df, min_len=48, k=16, bucket_cap=5,
                                observation=obs3)
    n_grams_clones = 6 * (len(big) - 15)
    assert spans.filter("id_a < 6 and id_b < 6").count() == 0
    got3 = obs3.get
    assert got3["cap_dropped_rows"] == n_grams_clones
    # singletons' grams are unique (cold), they stay
    assert got3["cap_total_rows"] > n_grams_clones


def test_exact_overlap_spans_bruteforce(spark):
    """exact_overlap_spans == an independent char-level brute force:
    per pair, walk every alignment diagonal of the lowercased texts and
    collect maximal equal-char runs >= min_len.  Covers multi-span
    pairs, identical docs, offsets, case folding, below-threshold
    overlaps, and the lossless-seed configuration."""
    from document_retrieval_system_spark.operators.dedup import (
        exact_overlap_spans,
    )

    shared1 = "the first planted passage travels between documents intact"
    shared2 = "a second, different boilerplate block shared by two pages!!"
    docs = {
        1: "intro " + shared1 + " middle filler text " + shared2 + " end",
        2: shared1.upper() + " unrelated tail material goes here",
        3: "lead " + shared2 + " then " + shared1 + " outro",
        4: "completely unrelated body with no common substrings at all",
        5: "short overlap only: " + shared1[:30],
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    min_len, k = 48, 16

    def brute(sa, ta):
        sa, ta = sa.lower(), ta.lower()
        out = set()
        for d in range(-len(ta) + 1, len(sa)):
            i = max(0, d)
            j = i - d
            run = 0
            while i <= len(sa) and j <= len(ta):
                same = i < len(sa) and j < len(ta) and sa[i] == ta[j]
                if same:
                    run += 1
                else:
                    if run >= min_len:
                        out.add((i - run + 1, j - run + 1, run))
                    run = 0
                i += 1
                j += 1
        return out

    want = set()
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            for s in brute(docs[a], docs[b]):
                want.add((a, b, *s))
    got = {(r["id_a"], r["id_b"], r["a_start"], r["b_start"], r["match_len"])
           for r in exact_overlap_spans(
               df, min_len=min_len, k=k, bucket_cap=None).collect()}
    assert got == want
    # sanity on the fixture itself: multiple spans exist, incl. a pair
    # with two distinct spans (1, 3) and no (4, *) rows
    assert len(want) >= 3
    assert len({s for s in want if s[0] == 1 and s[1] == 3}) == 2
    assert not any(4 in (s[0], s[1]) for s in want)
    # identical docs -> one full-length span
    clone = spark.createDataFrame(
        [(1, docs[1]), (2, docs[1])], "doc_id long, text string"
    )
    one = exact_overlap_spans(clone, min_len=min_len, k=k,
                              bucket_cap=None).collect()
    assert len(one) == 1 and one[0]["match_len"] == len(docs[1])
    assert one[0]["a_start"] == 1 and one[0]["b_start"] == 1

def test_gif_decoder_round_trips(spark):
    """Pure-stdlib GIF decode (full LZW incl. 12-bit dict reset,
    interlace, local color tables): pixel-exact round-trips through
    make_gif; corruption/truncation rejected with None; fixture GIF rows
    flow decoded=true."""
    import numpy as np

    from document_retrieval_system_spark.sources.multimodal import (
        decode_gif,
        decode_media,
        extract_features,
        make_gif,
        synthetic_media_df,
    )

    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    for h, w in [(1, 1), (3, 5), (16, 9), (7, 8), (33, 21)]:
        idx = rng.integers(0, 64, (h, w), dtype=np.uint8)
        for inter in (False, True):
            got = decode_gif(make_gif(idx, pal, interlace=inter))
            assert np.array_equal(got, pal[idx]), (h, w, inter)
    # 2-color palette (1-bit table, min_code floor of 2)
    bw = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = rng.integers(0, 2, (9, 13), dtype=np.uint8)
    assert np.array_equal(decode_gif(make_gif(idx, bw)), bw[idx])
    # large noise image forces LZW codes past 12 bits -> dict-reset path
    big = rng.integers(0, 256, (120, 120), dtype=np.uint8)
    pal256 = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    assert np.array_equal(decode_gif(make_gif(big, pal256)), pal256[big])
    # rejection: wrong magic, truncation, corrupted LZW stream
    good = make_gif(idx, bw)
    assert decode_gif(b"GIF88a" + good[6:]) is None
    assert decode_gif(good[: len(good) // 2]) is None
    # corrupted LZW bytes must never raise (None or a decoded array —
    # LZW corruption may still yield in-table codes)
    corrupt = bytearray(good)
    corrupt[-10] ^= 0xFF
    res = decode_gif(bytes(corrupt))
    assert res is None or hasattr(res, "shape")
    # features through full dispatch: flat image -> known mean
    flat_idx = np.zeros((4, 6), dtype=np.uint8)
    flat_pal = np.full((2, 3), 100, dtype=np.uint8)
    feat = decode_media(make_gif(flat_idx, flat_pal))
    assert feat is not None and feat[0] == 6 and feat[1] == 4
    assert abs(feat[2] - 100 / 255) < 1e-6
    # fixture GIF rows decode for real
    rows = extract_features(synthetic_media_df(spark, 48)).collect()
    gif_rows = [r for r in rows if r["kind"] == "image"]
    assert gif_rows and all(r["decoded"] for r in gif_rows)


def test_jpeg_decoder_hand_crafted_and_round_trips(spark):
    """Baseline JPEG decode is REAL (`sources/jpeg_codec.py`).  Two
    hand-assembled streams (built bit-by-bit here, independent of the
    encoder) pin the DC path (dequant x IDCT x level-shift) and the
    zigzag/orientation of the first AC coefficient; encoder round-trips
    cover gray/4:4:4/4:2:0/restart markers with bounded lossy error;
    non-baseline and corrupt streams reject with None."""
    import struct

    import numpy as np

    from document_retrieval_system_spark.sources.jpeg_codec import (
        ZIGZAG,
        _C,
        decode_jpeg,
        make_jpeg,
    )
    from document_retrieval_system_spark.sources.multimodal import (
        decode_media,
        extract_features,
        make_bmp,
        resize_images,
        synthetic_media_df,
    )

    # structural pins: orthonormal DCT basis, true T.81 zigzag prefix
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]

    def hand_jpeg(dc_vals, ac_vals, scan_bytes):
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([16] * 64)
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
        for tc, vals in ((0, dc_vals), (1, ac_vals)):
            counts = [0] * 16
            # all codes at length ceil(log2(n+1)); here n<=2 -> length 1 or 2
            ln = 1 if len(vals) == 1 else 2
            counts[ln - 1] = len(vals)
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc << 4)
            out += bytes(counts) + bytes(vals)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
        out += scan_bytes + b"\xff\xd9"
        return bytes(out)

    # DC-only: code '0'->category 4, magnitude 1000 (diff=8), EOB '0'
    # bits: 0 1000 0 + pad 11 = 0x43; DC = 8*q(16) = 128 -> every pixel
    # 128/8 + 128 = 144
    img = decode_jpeg(hand_jpeg([4], [0x00], bytes([0x43])))
    assert img is not None and img.shape == (8, 8)
    assert np.all(img == 144)

    # one AC coefficient at zigzag index 1 == raster (0,1): DC table
    # ['0'->s=0], AC table ['00'->(run0,size1), '01'->EOB]; bits
    # 0 00 1 01 + pad 11 = 0x17.  Horizontal cosine: rows identical,
    # columns strictly ordered col0 > col7 (a transposed IDCT or a wrong
    # zigzag would flip this).
    img = decode_jpeg(hand_jpeg([0], [0x01, 0x00], bytes([0x17])))
    assert img is not None
    assert np.all(img == img[0:1, :])          # every row the same
    assert not np.all(img[:, 0] == img[0, 0]) or img[0, 0] != img[0, 7]
    expect0 = round(16 * _C[0, 0] * _C[1, 0] + 128)
    assert img[0, 0] == expect0 and img[0, 0] > img[0, 7]

    # encoder round-trips (lossy: bounded error, flat near-exact)
    rng = np.random.default_rng(5)
    smooth = np.repeat(np.repeat(rng.integers(0, 256, (5, 7, 3)), 8, 0), 8, 1).astype(np.uint8)
    for sub in ("444", "420"):
        for ri in (0, 2):
            dec = decode_jpeg(make_jpeg(smooth, subsample=sub, restart_interval=ri, scale=0.5))
            assert dec.shape == smooth.shape
            # blockwise-constant images survive 4:2:0 chroma averaging
            assert np.abs(dec.astype(float) - smooth).mean() < 3.0
    gray = (np.outer(np.arange(20), np.ones(31)) * 7 % 256).astype(np.uint8)
    dec = decode_jpeg(make_jpeg(gray, scale=0.5))
    assert dec.shape == gray.shape and np.abs(dec.astype(float) - gray).max() <= 2

    # rejection: progressive (SOF2), truncation mid-header, garbage
    prog = bytearray(make_jpeg(smooth))
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None
    assert decode_jpeg(make_jpeg(smooth)[:40]) is None
    assert decode_jpeg(b"\xff\xd8nonsense") is None

    # pipeline: JPEG fixture rows decode for real; resize reads REAL
    # pixels (flat JPEG -> flat resized bytes, not hash noise)
    rows = extract_features(synthetic_media_df(spark, 64)).collect()
    jpeg_rows = [r for r in rows if r["kind"] == "image"]
    assert jpeg_rows and all(r["decoded"] for r in jpeg_rows)
    flat = np.full((8, 8, 3), 90, dtype=np.uint8)
    media = spark.createDataFrame(
        [(0, "u", "image", make_jpeg(flat, scale=0.25), "image/jpeg", 8, 8, 0)],
        "media_id long, url string, kind string, payload binary, "
        "mime string, width int, height int, duration_ms int",
    )
    out = resize_images(media, 2, 2).collect()[0]
    px = np.frombuffer(bytes(out["pixels"]), dtype=np.uint8)
    assert np.abs(px.astype(int) - 90).max() <= 1
    # feature dispatch: flat JPEG -> known mean via decode_media
    feat = decode_media(make_jpeg(flat, scale=0.25))
    assert feat is not None and feat[0] == 8 and feat[1] == 8
    assert abs(feat[2] - 90 / 255) < 0.01


def test_mp4_container_parse_real_sample_tables(spark):
    """`sources/mp4_box.py`: make_mp4 fixtures round-trip exactly —
    every sample's absolute byte range and decode timestamp recovered
    from stts/stsc/stsz/stco across multi-chunk layouts; version-1 and
    co64 variants parse; malformed input rejects with None."""
    import struct

    from document_retrieval_system_spark.sources.mp4_box import (
        make_mp4,
        parse_mp4_samples,
    )

    for n, spc, fms in [(1, 3, 40), (7, 3, 100), (10, 4, 250), (9, 2, 33)]:
        frames = [bytes([k]) * (5 + 7 * k % 23) for k in range(n)]
        buf = make_mp4(frames, frame_ms=fms, samples_per_chunk=spc)
        trk = parse_mp4_samples(buf)
        assert trk is not None and len(trk.samples) == n
        assert trk.duration_ms == n * (fms * trk.timescale // 1000) * 1000 // trk.timescale
        for k, s in enumerate(trk.samples):
            assert buf[s.offset : s.offset + s.size] == frames[k]
            assert s.ts_ms == k * fms
    # malformed: bad magic, truncation, box-size overflow, zero timescale
    buf = make_mp4([b"abc", b"defg"], frame_ms=40)
    assert parse_mp4_samples(b"\x00" * 40) is None
    assert parse_mp4_samples(buf[:60]) is None
    bad = bytearray(buf)
    bad[0:4] = struct.pack(">I", 1 << 30)  # ftyp box size overflows file
    assert parse_mp4_samples(bytes(bad)) is None
    zt = bytearray(buf)
    i = zt.find(b"mdhd")
    # type(4) + version/flags(4) + creation(4) + modification(4) = 16
    zt[i + 16 : i + 20] = b"\x00\x00\x00\x00"  # timescale = 0
    assert parse_mp4_samples(bytes(zt)) is None


def test_mjpeg_mp4_end_to_end_decode(spark):
    """MJPEG-in-MP4 composition: JPEG frames inside an MP4 container
    decode end-to-end — sample_frames emits the exact encoded frame
    bytes, each decodes via decode_jpeg to pixels near the source, and
    decode_media / resize_images treat the whole payload as a decodable
    video (decoded=true, no stub)."""
    import numpy as np

    from document_retrieval_system_spark.sources.jpeg_codec import decode_jpeg
    from document_retrieval_system_spark.sources.multimodal import (
        _image_features,
        decode_media,
        decode_mjpeg_mp4,
        make_mjpeg_mp4,
        resize_images,
        sample_frames,
    )

    rng = np.random.default_rng(17)
    # smooth gradients: JPEG error stays small and measurable
    frames_px = []
    for k in range(4):
        yy, xx = np.mgrid[0:24, 0:16]
        px = ((yy * 5 + xx * 3 + 40 * k) % 256).astype(np.uint8)
        frames_px.append(np.stack([px, 255 - px, px // 2], axis=2))
    buf = make_mjpeg_mp4(frames_px, frame_ms=500, scale=0.25)

    # direct: first frame decodes with bounded error
    first = decode_mjpeg_mp4(buf)
    assert first is not None and first.shape == (24, 16, 3)
    assert np.abs(first.astype(float) - frames_px[0].astype(float)).mean() < 8.0
    # dispatch: decode_media yields REAL image features of that frame
    assert np.allclose(decode_media(buf), _image_features(first))

    media = spark.createDataFrame(
        [(0, "u", "video", buf, "video/mp4", 16, 24, 2000)],
        "media_id long, url string, kind string, payload binary, "
        "mime string, width int, height int, duration_ms int",
    )
    # every sampled frame is valid JPEG decoding near its source frame
    out = sample_frames(media, every_ms=500).collect()
    assert len(out) == 4
    for r in out:
        k = r["frame_no"]
        img = decode_jpeg(bytes(r["frame"]))
        assert img is not None and r["ts_ms"] == 500 * k
        assert np.abs(img.astype(float) - frames_px[k].astype(float)).mean() < 8.0
    # resize consumes the REAL first-frame pixels (not the hash stub):
    # nearest-neighbor of the decoded grayscale, reproducible here
    rz = resize_images(media, 4, 4).collect()[0]
    gray = first.mean(axis=2).astype(np.uint8)
    ys = np.arange(4) * 24 // 4
    xs = np.arange(4) * 16 // 4
    assert bytes(rz["pixels"]) == gray[np.ix_(ys, xs)].tobytes()
    # non-JPEG samples (H.264-class, out of scope) -> None, stub path
    from document_retrieval_system_spark.sources.mp4_box import make_mp4

    opaque = make_mp4([rng.bytes(64) for _ in range(3)], frame_ms=200)
    assert decode_mjpeg_mp4(opaque) is None and decode_media(opaque) is None


def test_mp4_parser_corruption_fuzz_never_raises(spark):
    """Seeded corruption fuzz for the MP4 parser (same contract as the
    JPEG fuzz): byte mutations of valid containers must parse or return
    None — never raise, and never force huge allocations.  Includes
    targeted count-field corruptions (stsz/stts 32-bit counts maxed)
    that would previously materialize multi-GB lists before any bounds
    check."""
    import random
    import struct

    from document_retrieval_system_spark.sources.mp4_box import (
        make_mp4,
        parse_mp4_samples,
    )

    bases = [
        make_mp4([bytes([k]) * (5 + k) for k in range(6)], frame_ms=40),
        make_mp4([b"x" * 9], frame_ms=100),
    ]
    # targeted: max out the stsz sample count -> corrupt, must be None
    buf = bytearray(bases[0])
    i = buf.find(b"stsz")
    buf[i + 12 : i + 16] = struct.pack(">I", 0xFFFFFFFF)
    assert parse_mp4_samples(bytes(buf)) is None
    # targeted: max out the stts entry count — the parser stops reading
    # runs once it has `count` deltas, so this parses to the SAME valid
    # track (bounded work) instead of allocating per claimed entry
    buf = bytearray(bases[0])
    i = buf.find(b"stts")
    buf[i + 8 : i + 12] = struct.pack(">I", 0xFFFFFFFF)
    trk = parse_mp4_samples(bytes(buf))
    assert trk is not None and len(trk.samples) == 6
    # targeted: uniform-size stsz (4 bytes at +8) with a huge count
    buf = bytearray(bases[1])
    i = buf.find(b"stsz")
    buf[i + 8 : i + 16] = struct.pack(">II", 9, 0x7FFFFFFF)
    assert parse_mp4_samples(bytes(buf)) is None

    rng = random.Random(43)
    for _ in range(300):
        buf = bytearray(rng.choice(bases))
        for _ in range(rng.randint(1, 6)):
            op = rng.random()
            if op < 0.5:
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            elif op < 0.8 and len(buf) > 8:
                del buf[rng.randrange(len(buf))]
            else:
                buf.insert(rng.randrange(len(buf)), rng.randrange(256))
        trk = parse_mp4_samples(bytes(buf))  # must not raise
        assert trk is None or trk.timescale > 0


def test_pq_ann_codes_and_recall(spark, tmp_path):
    """Product-quantization ANN: packed BIGINT codes round-trip the
    per-subspace argmin (unpack == recompute), the codebook fit is
    deterministic, ADC+rerank recall beats the no-rerank floor, and the
    ADC scan reads only (vec_id, pq_code) — never the raw vectors."""
    import numpy as np
    from pyspark.sql import functions as F

    from document_retrieval_system_spark.operators import similarity as S
    from document_retrieval_system_spark.plans.explain import read_schemas

    rng = np.random.default_rng(17)
    base = rng.standard_normal((300, 32)).astype(np.float32)
    # plant near-neighbors of vector 0 so PQ has true structure to find
    for i in range(1, 6):
        base[i] = base[0] + rng.standard_normal(32).astype(np.float32) * 0.05
    emb = spark.createDataFrame(
        [(int(i), base[i].tolist()) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    books = S.pq_codebooks(emb, m=8, ksub=16, seed=3, sample=300)
    assert books.shape == (8, 16, 4)
    assert np.array_equal(books, S.pq_codebooks(emb, m=8, ksub=16, seed=3, sample=300))

    idx = str(tmp_path / "pq")
    S.build_pq_index(emb, idx, books)
    codes = {r["vec_id"]: r["pq_code"] for r in spark.read.parquet(idx).collect()}
    assert len(codes) == 300
    # unpacked codes == numpy recompute of the per-subspace argmin
    x = base.astype(np.float64)
    for vid in (0, 7, 123):
        for j in range(8):
            sub = x[vid, j * 4 : (j + 1) * 4]
            d = ((books[j] - sub[None, :]) ** 2).sum(axis=1)
            assert (codes[vid] >> (4 * j)) & 15 == int(d.argmin()), (vid, j)

    q = base[0].astype(float).tolist()
    top = S.pq_topk(spark, idx, emb, q, books, k=5, rerank=40,
                    pre_filter=F.col("vec_id") > 0)
    got = [r["vec_id"] for r in top.collect()]
    exact = [r["vec_id"] for r in
             S.cosine_topk(emb.filter(F.col("vec_id") > 0), q, k=5).collect()]
    assert set(got) & set(exact) >= set(exact[:3]), (got, exact)
    # the planted neighbors dominate
    assert set(got[:3]) <= {1, 2, 3, 4, 5}
    # ADC leg scans the code table only: no embedding column in its scan
    schemas = read_schemas(top).splitlines()
    assert any("pq_code" in s for s in schemas), schemas
    assert not any("pq_code" in s and "embedding" in s for s in schemas), schemas


def test_ivfpq_ann_composed_layout(spark, tmp_path):
    """IVF-PQ composition: residual codes match a numpy recompute, the
    scan prunes to the probed cells' partitions (PartitionFilters), and
    ADC+rerank recovers the planted neighbors."""
    import numpy as np
    from pyspark.sql import functions as F

    from document_retrieval_system_spark.operators import similarity as S
    from document_retrieval_system_spark.plans.explain import formatted_plan

    rng = np.random.default_rng(23)
    # clustered data so IVF cells are meaningful
    centers = rng.standard_normal((4, 32)) * 5
    base = np.vstack([
        centers[i % 4] + rng.standard_normal(32) * 0.5 for i in range(240)
    ]).astype(np.float32)
    for i in range(1, 5):
        base[i] = base[0] + rng.standard_normal(32).astype(np.float32) * 0.03
    emb = spark.createDataFrame(
        [(int(i), base[i].tolist()) for i in range(240)],
        "vec_id long, embedding array<float>",
    )
    cents = S.ivf_centroids(emb, n_clusters=4, seed=5, sample=240)
    books = S.ivfpq_residual_books(emb, cents, m=8, ksub=16, seed=5, sample=240)
    idx = str(tmp_path / "ivfpq")
    S.build_ivfpq_index(emb, idx, cents, books)

    rows = {r["vec_id"]: r for r in spark.read.parquet(idx).collect()}
    assert len(rows) == 240
    x = base.astype(np.float64)
    for vid in (0, 31, 119):
        cell = int(((cents - x[vid][None, :]) ** 2).sum(axis=1).argmin())
        assert rows[vid]["ivf_cell"] == f"b{cell}"
        resid = x[vid] - cents[cell]
        for j in range(8):
            d = ((books[j] - resid[j * 4 : (j + 1) * 4][None, :]) ** 2).sum(axis=1)
            assert (rows[vid]["pq_code"] >> (4 * j)) & 15 == int(d.argmin()), (vid, j)

    q = base[0].astype(float).tolist()
    top = S.ivfpq_topk(spark, idx, emb, q, cents, books, k=5, nprobe=2,
                       rerank=30, pre_filter=F.col("vec_id") > 0)
    got = [r["vec_id"] for r in top.collect()]
    assert set(got[:4]) == {1, 2, 3, 4}, got
    # partition pruning: the plan's scan carries an ivf_cell PartitionFilters
    plan = formatted_plan(top)
    assert "PartitionFilters" in plan and "ivf_cell" in plan


def test_jpeg_decoder_spec_edge_cases(spark):
    """Review-found edge cases: 0xFF fill bytes before markers are legal
    (T.81 B.1.1.2), a single-component scan is non-interleaved so SOF
    sampling factors must be ignored (A.2.2), and a malformed DHT whose
    DC category overflows the int32 block returns None instead of
    raising."""
    import numpy as np

    from document_retrieval_system_spark.sources.jpeg_codec import (
        decode_jpeg,
        make_jpeg,
    )

    gray = (np.add.outer(np.arange(24) * 4, np.arange(17) * 6) % 256).astype(np.uint8)
    enc = make_jpeg(gray, scale=0.5)
    base = decode_jpeg(enc)

    # fill bytes before DQT and before SOS must not change the decode
    filled = enc.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    filled = filled.replace(b"\xff\xda", b"\xff\xff\xda", 1)
    assert np.array_equal(decode_jpeg(filled), base)

    # grayscale with H=V=2 declared in SOF0: non-interleaved scan, the
    # factors must be ignored -> identical pixels to the H=V=1 stream
    sof = enc.find(b"\xff\xc0")
    patched = bytearray(enc)
    assert patched[sof + 11] == 0x11  # comp 1 sampling byte
    patched[sof + 11] = 0x22
    assert np.array_equal(decode_jpeg(bytes(patched)), base)

    # DHT declaring DC category 62: magnitude overflows the int32
    # coefficient block -> None, never an exception.  A FLAT image
    # guarantees category 0 (DC diff 0) is actually emitted for every
    # block after the first, so the patched symbol is exercised.
    flat_enc = make_jpeg(np.full((24, 17), 80, dtype=np.uint8), scale=0.5)
    dht = flat_enc.find(b"\xff\xc4")
    broken = bytearray(flat_enc)
    assert broken[dht + 21] == 0  # first DC symbol (category 0)
    broken[dht + 21] = 62
    assert decode_jpeg(bytes(broken)) is None


def test_jpeg_decoder_corruption_fuzz_never_raises(spark):
    """Seeded corruption fuzz: byte mutations of valid JPEGs (headers,
    tables, entropy data) must decode to pixels or None — never raise.
    This is the contract extract_features/resize_images rely on for the
    decoded=false fallback over a crawled corpus."""
    import random

    import numpy as np

    from document_retrieval_system_spark.sources.jpeg_codec import (
        decode_jpeg,
        make_jpeg,
    )

    rng = random.Random(41)
    nrng = np.random.default_rng(41)
    bases = [
        make_jpeg(nrng.integers(0, 256, (12, 17, 3), dtype=np.uint8),
                  subsample="420", restart_interval=2),
        make_jpeg(nrng.integers(0, 256, (9, 8), dtype=np.uint8)),
    ]
    for _ in range(300):
        buf = bytearray(rng.choice(bases))
        for _ in range(rng.randint(1, 6)):
            op = rng.random()
            if op < 0.5:
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            elif op < 0.8 and len(buf) > 8:
                del buf[rng.randrange(len(buf))]
            else:
                buf.insert(rng.randrange(len(buf)), rng.randrange(256))
        out = decode_jpeg(bytes(buf))  # must not raise
        assert out is None or hasattr(out, "shape")


def test_span_removal_decisions_bruteforce(spark):
    """Span-removal decision layer == independent brute force: per doc,
    the union of removed ranges (higher-id side of every >= min_len
    shared span) merged into islands; covers overlapping ranges from
    multiple partners, whole-doc duplicates (keep_frac 0), and docs
    absent from the output when they only ever appear as the kept
    (lower-id) side."""
    from document_retrieval_system_spark.operators.dedup import (
        exact_overlap_spans,
        span_removal_decisions,
    )

    shared1 = "the first planted passage travels between documents intact"
    shared2 = "a second, different boilerplate block shared by two pages!!"
    docs = {
        1: "intro " + shared1 + " middle filler text " + shared2 + " end",
        2: shared1.upper() + " unrelated tail material goes here",
        3: "lead " + shared2 + " then " + shared1 + " outro",
        4: "completely unrelated body with no common substrings at all",
        5: shared1 + " " + shared2,
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    min_len, k = 48, 16

    spans = exact_overlap_spans(df, min_len=min_len, k=k).collect()
    # brute-force merge per doc of the id_b-side ranges
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for r in spans:
        per_doc.setdefault(r["id_b"], []).append(
            (r["b_start"], r["b_start"] + r["match_len"]))
    want = {}
    for d, ivs in per_doc.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        removed = sum(e - s for s, e in merged)
        total = len(docs[d].lower())
        want[d] = (len(merged), removed, total,
                   0.0 if total == 0 else 1.0 - removed / total)

    got = {r["doc_id"]: (r["n_ranges"], r["removed_chars"],
                         r["total_chars"], r["keep_frac"])
           for r in span_removal_decisions(df, min_len=min_len, k=k).collect()}
    assert got == want
    assert 1 not in got          # doc 1 is the kept side everywhere
    assert set(got) == {2, 3, 5}
    # doc 5 is fully covered by docs 1/3 passages -> keep_frac low
    assert got[5][3] < 0.1


def test_winnow_arrow_matches_expr(spark):
    """The r6 Arrow winnowing path is value-identical to the original
    JVM zip_with expression chain on every text shape that matters:
    ascii prose, repeated text, CJK, astral codepoints, mixed-case
    (JVM lower), short-of-one-gram, short-of-one-window, empty/null."""
    from document_retrieval_system_spark.operators.textstats import (
        _winnowed_sets_expr,
        winnowed_sets,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"),
        (3, "中文分词测试文本，包含标点符号。再来一些中文。"),
        (4, "astral \U0001F600\U0001F680 chars \U00010348 mixed in text"),
        (5, "MiXeD CaSe TeXt With UPPER and lower RUNS"),
        (6, "short"),          # < k chars: no gram
        (7, "exactly12chr"),   # >= k, < window+k-1: one truncated window
        (8, ""),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k, window in ((8, 16), (4, 8)):
        got = {r["doc_id"]: list(r["fps"])
               for r in winnowed_sets(df, k=k, window=window).collect()}
        want = {r["doc_id"]: list(r["fps"])
                for r in _winnowed_sets_expr(df, k=k, window=window).collect()}
        assert got == want
