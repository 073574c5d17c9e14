"""ANN recall vs brute-force, multimodal plumbing, query parser."""

from __future__ import annotations

from pyspark.sql import functions as F


def _qv(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = emb.where(F.col("vec_id") == 0).collect()[0]
    return emb, [float(x) for x in row["embedding"]]


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    from idzebra_spark.operators.similarity import cosine_topk, lsh_topk

    emb, qv = _qv(spark, sf_dir)
    exact = {r.vec_id for r in cosine_topk(emb, qv, 10, exclude_id=0).collect()}
    approx = {r.vec_id for r in
              lsh_topk(emb, qv, 10, n_planes=4, exclude_id=0).collect()}
    # 4 planes → 16 buckets over 500 vecs; neighbors share sign bits
    assert len(exact & approx) >= 3


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from idzebra_spark.operators.similarity import cosine_topk, ivf_topk

    emb, qv = _qv(spark, sf_dir)
    exact = {r.vec_id for r in cosine_topk(emb, qv, 10, exclude_id=0).collect()}
    approx = {r.vec_id for r in
              ivf_topk(emb, qv, 10, n_probe=3, exclude_id=0).collect()}
    assert len(exact & approx) >= 3


def test_ann_results_subset_of_corpus(spark, sf_dir):
    from idzebra_spark.operators.similarity import ivf_topk

    emb, qv = _qv(spark, sf_dir)
    got = ivf_topk(emb, qv, 10, n_probe=2, exclude_id=0)
    assert got.count() == 10
    assert got.where(F.col("vec_id") == 0).count() == 0


def test_multimodal_feature_plumbing(spark):
    from idzebra_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        frame_sample,
        synth_media,
    )

    media = synth_media(spark, 50)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert all(x == x for x in r.features)  # no NaNs
        assert r.n_bytes > 0
        # PPM/BMP/PNG/JPEG/WAV payloads REALLY decode; the h264 stub
        # is marked
        assert r.decoded == (r.codec in ("ppm", "bmp", "png", "jpeg",
                                         "wav"))
    assert {r.codec for r in rows} == {"ppm", "bmp", "png", "jpeg",
                                       "wav", "h264-stub"}
    # determinism: same payload → same features
    again = {r.media_id: r.features for r in extract_features(media).collect()}
    assert all(again[r.media_id] == r.features for r in rows)

    fs = frame_sample(media, every_ms=250)
    per_vid = fs.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per_vid)  # 1000ms / 250ms


def test_ppm_wav_codecs_roundtrip():
    import numpy as np

    from idzebra_spark.operators.multimodal import (
        decode_ppm, decode_wav, encode_ppm, encode_wav, image_features,
        resize_nearest)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (11, 17, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # comment + whitespace tolerant header
    weird = b"P6\n# comment\n17\n11 255\n" + img.tobytes()
    assert (decode_ppm(weird) == img).all()
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    f = image_features(img)
    assert abs(f[0] - img[..., 0].mean() / 255.0) < 1e-5

    s = (rng.normal(0, 2000, 500)).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and (dec == s).all()


def test_audio_frame_sample_real_rms(spark):
    from idzebra_spark.operators.multimodal import (
        audio_frame_sample, synth_media)

    media = synth_media(spark, 30)
    fr = audio_frame_sample(media, every_ms=50).collect()
    assert fr  # audio rows exist
    assert all(r.rms_milli >= 0 for r in fr)
    # windows within one clip vary (real samples, not a constant stub)
    by_id = {}
    for r in fr:
        by_id.setdefault(r.media_id, set()).add(r.rms_milli)
    assert any(len(v) > 1 for v in by_id.values())


def test_query_parser_shapes():
    from idzebra_spark.plans.query import parse

    q = parse('(a OR b OR c) AND d NOT "x y"')
    r = q.root
    assert r.op == "not"
    assert r.children[0].op == "and"
    ors = r.children[0].children[0]
    assert ors.op == "or" and len(ors.children) == 3  # flattened n-ary
    assert r.children[1].op == "phrase" and r.children[1].value == "x y"
    # positive terms only: the NOT branch is excluded from ranking
    assert sorted(q.root.terms()) == ["a", "b", "c", "d"]


def test_lsh_indexed_equals_unindexed(spark, sf_dir, tmp_path):
    """Persisted bucket-partitioned probe == on-the-fly bucketing."""
    from idzebra_spark.operators.similarity import (
        build_lsh_index, lsh_topk, lsh_topk_indexed)

    emb, qv = _qv(spark, sf_dir)
    path = str(tmp_path / "lsh")
    build_lsh_index(emb, path, n_planes=6)
    a = [(r.vec_id, r.sim_micro) for r in
         lsh_topk(emb, qv, 10, n_planes=6, exclude_id=0).collect()]
    b = [(r.vec_id, r.sim_micro) for r in
         lsh_topk_indexed(spark, path, qv, 10, n_planes=6,
                          exclude_id=0).collect()]
    assert a == b
    # partition pruning: the probe plan reads only probed buckets
    plan = lsh_topk_indexed(spark, path, qv, 10, n_planes=6,
                            exclude_id=0)._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_kmeans_deterministic_and_ivf_recall(spark, sf_dir):
    from idzebra_spark.operators.similarity import (
        cosine_topk, ivf_topk, kmeans_labels)

    emb, qv = _qv(spark, sf_dir)
    l1 = {(r.vec_id, r.label) for r in kmeans_labels(emb, 8, 2).collect()}
    l2 = {(r.vec_id, r.label) for r in kmeans_labels(emb, 8, 2).collect()}
    assert l1 == l2  # no RNG anywhere
    labels = kmeans_labels(emb, 8, 3)
    relab = emb.drop("label").join(labels, "vec_id")
    exact = {r.vec_id for r in cosine_topk(emb, qv, 10, exclude_id=0).collect()}
    approx = {r.vec_id for r in
              ivf_topk(relab, qv, 10, n_probe=3, exclude_id=0).collect()}
    assert len(exact & approx) >= 3


def test_quantized_cosine_recall_and_scale_bound(spark, sf_dir):
    """int8-quantized cosine: top-k closely tracks the exact kernel
    (quantization noise ~1/127 per component) and codes stay in
    [-127, 127]."""
    from idzebra_spark.operators.similarity import (
        cosine_topk, cosine_topk_q8, quantize_embeddings)

    emb, qv = _qv(spark, sf_dir)
    exact = [r.vec_id for r in
             cosine_topk(emb, qv, 10, exclude_id=0).collect()]
    quant = [r.vec_id for r in
             cosine_topk_q8(emb, qv, 10, exclude_id=0).collect()]
    assert len(set(exact) & set(quant)) >= 8
    q = quantize_embeddings(emb)
    mx = q.select(
        F.max(F.aggregate(F.transform("qvec", lambda x: F.abs(x)),
                          F.lit(0),
                          lambda a, x: F.greatest(a, x))).alias("m")
    ).collect()[0].m
    assert mx <= 127
    # zero vector: dropped, not NaN-ranked
    zrow = spark.createDataFrame(
        [(999, [0.0] * len(qv))], "vec_id long, embedding array<double>")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("embedding"))
    out = cosine_topk_q8(base.unionByName(zrow), qv, 1000, exclude_id=0)
    assert 999 not in {r.vec_id for r in out.collect()}


def test_cross_contamination_semantics(spark):
    """Full quote of a test doc inside a longer train doc scores
    containment 1.0; the boilerplate df cap drops ubiquitous
    shingles."""
    from idzebra_spark.operators.dedup import cross_contamination

    test = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"])
    train = spark.createDataFrame(
        [(100, "intro words alpha beta gamma delta epsilon zeta outro"),
         (101, "unrelated text about other things entirely here")],
        ["doc_id", "text"])
    out = {(r.test_id, r.train_id): r.contain_milli for r in
           cross_contamination(test, train, n=3, threshold=0.5).collect()}
    assert out == {(1, 100): 10000}
    # cap: a shingle present in > max_shingle_df train docs is dropped
    boiler = [(200 + i, "licensed under apache terms " + f"u{i} v{i} w{i}")
              for i in range(5)]
    train2 = spark.createDataFrame(boiler, ["doc_id", "text"])
    test2 = spark.createDataFrame(
        [(2, "licensed under apache terms")], ["doc_id", "text"])
    full = cross_contamination(test2, train2, n=3, threshold=0.1)
    assert full.count() == 5
    capped = cross_contamination(test2, train2, n=3, threshold=0.1,
                                 max_shingle_df=3)
    assert capped.count() == 0


def test_ivf_indexed_equals_live_and_prunes(spark, sf_dir, tmp_path):
    """Persisted IVF probe == the live kmeans+probe path (labels are
    deterministic), and the vector read is partition-pruned to the
    probed clusters."""
    from idzebra_spark.operators.similarity import (
        build_ivf_index, ivf_topk, ivf_topk_indexed, kmeans_labels)

    emb, qv = _qv(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, k=8, n_iter=3)
    labels = kmeans_labels(emb, 8, 3)
    live = [(r.vec_id, r.sim_micro) for r in
            ivf_topk(emb.drop("label").join(labels, "vec_id"), qv, 10,
                     n_probe=3, exclude_id=0).collect()]
    idxd = [(r.vec_id, r.sim_micro) for r in
            ivf_topk_indexed(spark, path, qv, 10, 3, 0).collect()]
    assert live == idxd
    plan = ivf_topk_indexed(spark, path, qv, 10, 3, 0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [label" in plan
