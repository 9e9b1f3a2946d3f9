"""Training-data ops: dedup, similarity, textops, multimodal, lineage,
streaming."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def test_exact_duplicates(spark, docs):
    from osmquadtree_geometry_spark.dedup import exact_duplicates
    d = exact_duplicates(docs).collect()
    # oracle: pandas
    pdf = docs.toPandas()
    vc = pdf.groupby("text")["doc_id"].agg(["count", "min"])
    exp = vc[vc["count"] > 1]
    assert len(d) == len(exp)
    for r in d:
        assert r.n_dups > 1


def test_minhash_lsh_keeper_semantics(spark, docs):
    """Exact duplicates are collapsed to a keeper BEFORE banding —
    non-keeper doc_ids must never appear in any pair (they'd otherwise
    form O(n²) mega-buckets at scale)."""
    from osmquadtree_geometry_spark.dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(docs, n_hashes=8, bands=4).collect()
    pdf = docs.toPandas()
    keepers = set(pdf.groupby("text")["doc_id"].min())
    for r in pairs:
        assert r.a in keepers and r.b in keepers
        assert 1 <= r.n_bands <= 4


def test_minhash_lsh_near_dups_and_bucket_cap(spark):
    """A near-duplicate (one token changed out of 40) must share a
    band with the original; max_bucket below the bucket size must
    drop the bucket (and hence the pair)."""
    from osmquadtree_geometry_spark.dedup import minhash_lsh_pairs
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" if i != 39 else "CHANGED" for i in range(40))
    rows = [(1, base), (2, base), (3, near)]  # 1,2 exact dups; 3 near
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.a, r.b): r.n_bands
             for r in minhash_lsh_pairs(d, n_hashes=8, bands=4).collect()}
    assert (1, 3) in pairs          # near-dup found via shared band
    assert not any(2 in p for p in pairs)  # 2 collapsed into keeper 1
    # cap of 1 forbids every bucket (needs >=2 to pair at all)
    capped = minhash_lsh_pairs(d, n_hashes=8, bands=4, max_bucket=1).collect()
    assert capped == []


def test_minhash_signature_deterministic(spark, docs):
    from osmquadtree_geometry_spark.dedup import minhash_signatures
    s1 = minhash_signatures(docs.limit(20), n_hashes=4).collect()
    s2 = minhash_signatures(docs.limit(20), n_hashes=4).collect()
    assert sorted(map(str, s1)) == sorted(map(str, s2))


def test_simhash_near_pairs(spark, docs):
    from osmquadtree_geometry_spark.dedup import simhash, simhash_near_pairs
    s = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    # 60-bit fingerprints: non-negative, < 2^60 (round-1's 32-bit
    # width gave only 256 hamming buckets — a scale-killer)
    assert all(0 <= v < 2**60 for v in s.values())
    pairs = simhash_near_pairs(docs, max_hamming=3).collect()
    # exact duplicates are collapsed to keepers before chunking
    pdf = docs.toPandas()
    keepers = set(pdf.groupby("text")["doc_id"].min())
    for r in pairs:
        assert r.a in keepers and r.b in keepers
    # verify hamming against fingerprints
    for r in pairs[:20]:
        assert bin(s[r.a] ^ s[r.b]).count("1") == r.hamming


def test_ngram_jaccard(spark, docs):
    from osmquadtree_geometry_spark.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(docs, threshold=0.99).collect()
    pdf = docs.toPandas()
    dups = pdf[pdf.duplicated("text", keep=False)]
    same_source_dups = 0
    for _, grp in dups.groupby(["text", "source"]):
        n = len(grp)
        same_source_dups += n * (n - 1) // 2
    assert len([p for p in pairs if p.jaccard == 1.0]) >= same_source_dups


def test_embedding_near_dup(spark, emb):
    from osmquadtree_geometry_spark.dedup import embedding_near_dup_pairs
    pairs = embedding_near_dup_pairs(emb, threshold=0.9).collect()
    for r in pairs[:10]:
        assert 0.9 <= r.cosine <= 1.000001


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _queries(spark, emb, n=3):
    rows = emb.orderBy("vec_id").limit(n).collect()
    return spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in rows],
        "query_id long, qe array<float>")


def test_brute_force_topk(spark, emb):
    from osmquadtree_geometry_spark.similarity import brute_force_topk
    q = _queries(spark, emb)
    got = brute_force_topk(emb, q, k=5)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {r.query_id for r in q.collect()}
    # numpy oracle for one query
    E = emb.orderBy("vec_id").toPandas()
    mat = np.stack(E["embedding"].to_numpy())
    ids = E["vec_id"].to_numpy()
    qv = mat[0]
    cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = sorted(((round(c, 6), i) for c, i in zip(cos, ids) if i != ids[0]),
                   key=lambda t: (-t[0], t[1]))
    exp = [i for _, i in order[:5]]
    got0 = [r.vec_id for r in sorted(by_q[ids[0]], key=lambda r: (-r.cosine, r.vec_id))]
    assert got0 == exp


def test_ivf_ann_recall_and_plan(spark, emb):
    """IVF inverted-list ANN: recall vs brute force on the fixture,
    and the 100 TB plan shape — centroid/probe sides broadcast (no
    CartesianProduct; the corpus-side candidate join is a broadcast
    hash join on list_id, so the assigned table never shuffles)."""
    from osmquadtree_geometry_spark.similarity import (
        brute_force_topk, ivf_topk, seed_centroids)
    q = _queries(spark, emb, n=5)
    exact = brute_force_topk(emb, q, k=5).collect()
    approx_df = ivf_topk(emb, q, k=5, n_lists=16, n_probe=8)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    approx = approx_df.collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # seed-quantizer IVF probing half the lists: recall is bounded by
    # list placement of the weak near-random fixture neighbours
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    # scores are exact cosines; every (q, v) at most once
    exact_scores = {(r.query_id, r.vec_id): r.cosine for r in exact}
    assert len(approx_set) == len(approx)
    for r in approx:
        if (r.query_id, r.vec_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.vec_id)] - r.cosine) < 1e-9
    # every vector lands in exactly one list; all lists from the seed
    cents = seed_centroids(emb, 16)
    assert cents.count() == 16
    want = [r.vec_id for r in emb.orderBy("vec_id").limit(16).collect()]
    assert [r.list_id for r in cents.orderBy("list_id").collect()] == want
    # seed selection is a per-partition top-k merge, not a global
    # sort, and carries no un-partitioned window
    cplan = cents._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in cplan
    assert "Window" not in cplan


def test_ivf_trained_centroids(spark, emb):
    """Deterministic sampled-Lloyd's k-means (round-4 verdict Next #6):
    bit-reproducible centroids, pluggable into ivf_topk, recall at
    least as usable as the seeded quantizer's floor."""
    from osmquadtree_geometry_spark.similarity import (
        brute_force_topk, ivf_topk, train_centroids_kmeans)
    c1 = train_centroids_kmeans(emb, n_lists=16, n_iters=5,
                                max_sample=512, seed=7)
    c2 = train_centroids_kmeans(emb, n_lists=16, n_iters=5,
                                max_sample=512, seed=7)
    r1 = sorted(map(tuple, c1.collect()))
    r2 = sorted(map(tuple, c2.collect()))
    assert r1 == r2 and len(r1) == 16  # deterministic
    q = _queries(spark, emb, n=5)
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    approx_df = ivf_topk(emb, q, k=5, n_lists=16, n_probe=8, centroids=c1)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    approx = {(r.query_id, r.vec_id) for r in approx_df.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"trained-IVF recall too low: {recall}"


def test_lsh_ann_recall(spark, emb):
    from osmquadtree_geometry_spark.similarity import brute_force_topk, lsh_ann_topk
    q = _queries(spark, emb, n=5)
    exact = brute_force_topk(emb, q, k=5).collect()
    # testdata embeddings are near-random (top cosine ~0.3) — weak
    # neighbours need shallow buckets + many tables for recall
    approx = lsh_ann_topk(emb, q, k=5, n_planes=3, n_tables=8,
                          dim=64).collect()
    with pytest.raises(ValueError):  # dim is part of the contract
        lsh_ann_topk(emb, q, k=5)
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # approx pairs carry exact cosine scores
    exact_scores = {(r.query_id, r.vec_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in exact_scores:
            assert r.cosine == exact_scores[(r.query_id, r.vec_id)]


# ---------------------------------------------------------------------------
# textops
# ---------------------------------------------------------------------------

def test_language_id(spark, docs):
    from osmquadtree_geometry_spark.textops import language_id
    out = language_id(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    langs = {r.lang_pred for r in rows}
    assert langs <= {"en", "de", "fr", "es", "und"}


def test_quality_and_tokens(spark, docs):
    from osmquadtree_geometry_spark.textops import quality_score, token_counts
    q = quality_score(docs).collect()
    for r in q[:20]:
        assert 0.0 <= r.quality <= 1.0
        assert r.n_tokens > 0
    t = {r.doc_id: r for r in token_counts(docs).collect()}
    pdf = docs.toPandas()
    for _, row in pdf.head(20).iterrows():
        assert t[row.doc_id].ws_tokens == len(row.text.split())
        assert t[row.doc_id].n_chars == len(row.text)


def test_fingerprint_stability(spark, docs):
    from osmquadtree_geometry_spark.textops import fingerprint
    f1 = {r.doc_id: r.fp for r in fingerprint(docs).collect()}
    # identical texts -> identical fingerprints
    pdf = docs.toPandas()
    for _, grp in pdf.groupby("text"):
        fps = {f1[d] for d in grp["doc_id"]}
        assert len(fps) == 1


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_features(spark, decoded):
    from osmquadtree_geometry_spark.multimodal import (
        decode_image, extract_features, synth_media_table)
    mb = synth_media_table(decoded["media"])
    out = extract_features(mb, dim=8, fake=True)
    rows = out.collect()
    assert rows
    for r in rows:
        assert len(r.features) == 8
        assert r.n_bytes == 16  # md5 payload
    from osmquadtree_geometry_spark.multimodal import HAVE_PIL
    if not HAVE_PIL:
        # non-PNG payloads stay an honest stub without an imaging lib
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    # determinism: same payload -> same features
    again = {(r.doc_id, r.media_ref): r.features for r in out.collect()}
    for r in rows:
        assert again[(r.doc_id, r.media_ref)] == r.features


def _tiny_png(pixels):
    """Handcraft an 8-bit grayscale PNG from a square row-major pixel
    list using only stdlib (zlib + struct) — lets the real-decode test
    build its own input without needing PIL to encode."""
    import struct
    import zlib
    k = int(len(pixels) ** 0.5)
    assert k * k == len(pixels)

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    ihdr = struct.pack(">IIBBBBB", k, k, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + bytes(pixels[r * k:(r + 1) * k])
                   for r in range(k))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_multimodal_real_decode(spark):
    """Real decode path — UNCONDITIONAL (round-4 verdict Next #8): PNG
    decodes via PIL when installed, else via the stdlib decoder; same
    mapInPandas shape as the fake path, pixel values pinned against
    the handcrafted source image."""
    from osmquadtree_geometry_spark import multimodal as mm
    pixels = [16 * i for i in range(16)]  # 4x4 gradient
    png = _tiny_png(pixels)
    feats = mm.decode_image(png, dim=16)
    assert len(feats) == 16
    assert feats.tolist() == pytest.approx([p / 256.0 for p in pixels])
    # same Arrow-batched plumbing end-to-end with fake=False
    df = spark.createDataFrame(
        [("d1", "m1", "image/png", bytearray(png), 4, 4)],
        "doc_id string, media_ref string, kind string, "
        "payload binary, width int, height int")
    row = mm.extract_features(df, dim=16, fake=False).collect()[0]
    assert row.features == pytest.approx([p / 256.0 for p in pixels])
    assert row.n_bytes == len(png)


def _png_rgb_filtered(px, filters):
    """Handcraft an 8-bit RGB PNG with an EXPLICIT filter type per row
    (applies the spec's filter transform before deflate) so the
    decoder's Sub/Up/Average/Paeth reconstruction is exercised."""
    import struct
    import zlib
    h, w = len(px), len(px[0])

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = b""
    prev = [0] * (w * 3)
    for y, ft in zip(range(h), filters):
        row = [v for pix in px[y] for v in pix]
        enc = []
        for i, v in enumerate(row):
            left = row[i - 3] if i >= 3 else 0
            up = prev[i]
            ul = prev[i - 3] if i >= 3 else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                    4: paeth(left, up, ul)}[ft]
            enc.append((v - pred) & 0xFF)
        raw += bytes([ft]) + bytes(enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_stdlib_png_decoder_filters_and_luma():
    """decode_png reconstructs all five row filters on an RGB image,
    and the grayscale conversion matches PIL's integer luma formula."""
    from osmquadtree_geometry_spark import multimodal as mm
    px = [[((x * 37 + y * 11) % 256, (x * 91 + 13 * y) % 256,
            (x * 7 + y * 201) % 256)
           for x in range(5)] for y in range(5)]
    png = _png_rgb_filtered(px, filters=[0, 1, 2, 3, 4])
    got = mm.decode_png(png)
    assert got.shape == (5, 5, 3)
    assert got.tolist() == [[list(p) for p in row] for row in px]
    gray = mm._png_to_gray(got)
    for y in range(5):
        for x in range(5):
            r, g, b = px[y][x]
            assert gray[y][x] == (299 * r + 587 * g + 114 * b) // 1000
    # area-average pool at a non-integer ratio stays in range and is
    # deterministic
    feats = mm.decode_image(png, dim=4)
    assert len(feats) == 4 and all(0 <= v < 1 for v in feats)
    assert mm.decode_image(png, dim=4).tolist() == feats.tolist()
    # truncated / corrupt payloads raise cleanly
    with pytest.raises(ValueError):
        mm.decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)


# ---------------------------------------------------------------------------
# lineage / resume
# ---------------------------------------------------------------------------

def test_lineage_resume(spark, tmp_path, docs_path):
    from osmquadtree_geometry_spark.lineage import (
        LineageStore, fingerprint_input, run_stage)
    store = LineageStore(spark, str(tmp_path / "lineage"))
    fp = fingerprint_input(docs_path)
    calls = []

    def build():
        calls.append(1)
        return spark.read.parquet(docs_path).select("doc_id")

    out1, resumed1 = run_stage(store, "decode", fp, build)
    assert not resumed1 and len(calls) == 1
    n1 = out1.count()
    out2, resumed2 = run_stage(store, "decode", fp, build)
    assert resumed2 and len(calls) == 1  # build NOT re-invoked
    assert out2.count() == n1
    # lineage rows recorded per partition
    lin = store.read("decode")
    assert lin is not None
    assert lin.agg(F.sum("rows")).first()[0] == n1
    # different fingerprint -> recompute
    out3, resumed3 = run_stage(store, "decode", "otherfp", build)
    assert not resumed3 and len(calls) == 2
    # bytes are REAL on-disk sizes of the stage's parquet output
    # (north rule: per-partition row/byte metrics), not an estimate
    import glob
    import os as _os
    out_dir = store.output_dir("decode", fp)
    disk = sum(_os.path.getsize(f)
               for f in glob.glob(_os.path.join(out_dir, "part-*")))
    rec = lin.agg(F.sum("bytes")).first()[0]
    assert rec == disk and disk > 0


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------

def test_streaming_decode_and_tiles(spark, docs_path, decoded):
    import os
    from osmquadtree_geometry_spark.streaming import (
        run_stream_to_memory, stream_decode_nodes, stream_docs,
        streaming_tile_counts)
    st = stream_docs(spark, os.path.dirname(docs_path))
    nodes = stream_decode_nodes(st)
    agg = streaming_tile_counts(nodes, tile_depth=8)
    q = run_stream_to_memory(agg, "tile_counts", mode="complete")
    try:
        got = {r.tile: r.n_nodes for r in spark.sql(
            "SELECT * FROM tile_counts").collect()}
    finally:
        q.stop()
    # batch oracle
    from osmquadtree_geometry_spark.kernels.quadtree import sql_round_qt
    exp = {r.tile: r.n for r in decoded["nodes"]
           .withColumn("tile", F.expr(sql_round_qt("quadtree", "8")))
           .groupBy("tile").agg(F.count("*").alias("n")).collect()}
    assert got == exp


def test_streaming_sessionize_stateful(spark):
    """applyInPandasWithState custom stateful operator: per-user
    session state with processing-time timeout."""
    from osmquadtree_geometry_spark.streaming import (
        run_stream_to_memory, streaming_sessionize)
    # NoTimeout mode: deterministic for finite-source replay (a gap
    # timeout keeps firing microbatches until wall-clock elapses)
    agg = streaming_sessionize(spark, f"{SF}/events.parquet",
                               gap_minutes=None)
    q = run_stream_to_memory(agg, "sessionize_state", mode="append")
    try:
        rows = spark.sql("SELECT * FROM sessionize_state").collect()
    finally:
        q.stop()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exp = {r.user_id: r.n for r in
           ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    got = {}
    for r in rows:
        assert r.session_start <= r.session_end
        got[r.user_id] = max(got.get(r.user_id, 0), r.n_events)
    # one batch -> every user's open-session snapshot counts all events
    assert got == exp


def test_streaming_events_rollup(spark):
    from osmquadtree_geometry_spark.streaming import (
        run_stream_to_memory, streaming_events_rollup)
    agg = streaming_events_rollup(spark, f"{SF}/events.parquet")
    q = run_stream_to_memory(agg, "ev_rollup", mode="append")
    try:
        rows = spark.sql("SELECT * FROM ev_rollup").collect()
    finally:
        q.stop()
    # append mode with watermark may withhold the tail window; just
    # check the plumbing produced consistent aggregates
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert ev.count() > 0
    assert all(r.n > 0 for r in rows)


def test_corpus_prep_plan_and_consistency(spark):
    """corpus_prep: one shuffle for the keeper groupBy + one tiny
    rollup — no joins between the fused metric stages — and its
    integer aggregates reconcile with the standalone operators."""
    from osmquadtree_geometry_spark.dedup import _distinct_text_keepers
    from osmquadtree_geometry_spark.textops import (
        corpus_prep, language_id, quality_score, token_counts)
    docs = spark.range(0, 120).selectExpr(
        "cast(id as string) AS doc_id",
        "concat_ws(' ', transform(sequence(1, 1 + cast(id % 40 as int)), "
        "i -> element_at(array('the','fox','and','dog','der','hund'), "
        "1 + cast((id + i) % 6 as int)))) AS text")
    out = {r.lang_pred: r for r in corpus_prep(docs, min_quality=0.05).collect()}
    # no joins in the plan (fused projection), exactly the keeper
    # exchange + the rollup exchange
    plan = corpus_prep(docs, min_quality=0.05)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
    # reconcile against the standalone operators composed the slow way
    keep = _distinct_text_keepers(docs, "text")
    q = {r.doc_id: r.quality for r in quality_score(keep).collect()}
    lang = {r.doc_id: r.lang_pred for r in language_id(keep).collect()}
    toks = {r.doc_id: r for r in token_counts(keep).collect()}
    agg = {}
    for did, qq in q.items():
        if qq < 0.05:
            continue
        a = agg.setdefault(lang[did], [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += toks[did].ws_tokens
        a[2] += toks[did].bpe_ish_tokens
        a[3] += toks[did].n_chars
        a[4] += round(qq * 1000000)
    assert set(out) == set(agg)
    for lg, a in agg.items():
        r = out[lg]
        assert [r.n_docs, r.ws_tokens, r.bpe_ish_tokens, r.n_chars,
                r.sum_quality_micro] == a
