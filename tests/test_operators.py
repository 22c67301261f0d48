"""Operator units: dedup family, similarity, text, masking, export,
multimodal plumbing."""

import pyspark.sql.functions as F
import pytest

from polardbx_tools_spark.operators import dedup, masking, similarity, text
from polardbx_tools_spark.operators import multimodal


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),       # exact dup of 1
        (3, "The quick brown fox, jumps over the lazy dog!"),     # normalized dup
        (4, "the quick brown fox jumps over a lazy dog"),         # near dup
        (5, "completely different text about spark engines and merges"),
        (6, "an unrelated short note"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_and_normalized_dedup(docs):
    ex = {r["canonical_id"]: r["n_docs"] for r in dedup.exact_groups(docs).collect()}
    assert ex[1] == 2                      # docs 1,2
    nm = {r["canonical_id"]: r["n_docs"] for r in dedup.normalized_groups(docs).collect()}
    assert nm[1] == 3                      # docs 1,2,3

    kept = dedup.dedup_exact(docs).count()
    assert kept == 5


def test_jaccard_and_minhash_find_near_dups(docs):
    jp = dedup.jaccard_pairs(docs, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]) for r in jp.collect()}
    assert (1, 2) in pairs and (1, 4) in pairs
    assert not any(5 in p or 6 in p for p in pairs)

    mh = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16, verify_threshold=0.3)
    mpairs = {(r["id_a"], r["id_b"]) for r in mh.collect()}
    assert (1, 2) in mpairs            # identical docs always collide
    assert not any({5, 6} & set(p) for p in mpairs)


def test_duplicate_clusters_connected_components(spark):
    """Min-label propagation must assign every vertex the min id of its
    connected component, across multi-hop chains."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11), (20, 21), (5, 21)],
        "id_a long, id_b long",
    )
    want = {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 20: 5, 21: 5, 5: 5}
    for dme in (100_000, 0):  # driver union-find AND distributed paths
        got = {r["doc_id"]: r["cluster_id"]
               for r in dedup.duplicate_clusters(
                   pairs, driver_max_edges=dme).collect()}
        assert got == want, dme


def test_materialize_id_sequences_bpe_roundtrip(spark):
    """tokenize -> pack ids end-to-end: the concatenation of the packed
    input_ids equals the concatenation of the per-doc BPE ids in id
    order, chopped at the budget with the ragged tail dropped."""
    from polardbx_tools_spark.operators import bpe, packing

    rows = [(i, f"doc {i} alpha beta gamma delta common tail words") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.bpe_train(df, vocab_size=400)
    enc = bpe.bpe_encode(df, merges).select("doc_id", "token_ids")
    budget = 16
    seqs = packing.materialize_id_sequences(enc, budget).collect()
    per_doc = {r["doc_id"]: list(r["token_ids"]) for r in enc.collect()}
    stream = [t for d in sorted(per_doc) for t in per_doc[d]]
    expect_full = len(stream) // budget
    assert len(seqs) == expect_full
    assert all(len(r["input_ids"]) == budget for r in seqs)
    got = [t for r in sorted(seqs, key=lambda r: r["seq_idx"])
           for t in r["input_ids"]]
    assert got == stream[: expect_full * budget]


def test_duplicate_spans_planted(spark):
    """ExactSubstr span profile on planted docs: two docs sharing a
    4-token run (windows w=3: positions 1-2 of the run) are flagged
    exactly on the overlapping windows; a unique doc reports 0 dups;
    a short doc reports (0, 0, NULL); an intra-doc repeat counts too."""
    from polardbx_tools_spark.operators import dedup

    rows = [
        (1, "alpha beta gamma delta unique1 unique2"),
        (2, "prefix alpha beta gamma delta tail"),
        (3, "totally different words here now"),
        (4, "tiny doc"),
        (5, "rep rep rep rep rep"),  # intra-doc repeated windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.duplicate_spans(df, window=3).collect()}
    # doc1: 4 windows, dup = ('alpha beta gamma','beta gamma delta') = 2
    assert got[1]["n_windows"] == 4 and got[1]["n_dup_windows"] == 2
    assert abs(got[1]["dup_window_frac"] - 0.5) < 1e-12
    assert got[2]["n_windows"] == 4 and got[2]["n_dup_windows"] == 2
    assert got[3]["n_dup_windows"] == 0 and got[3]["dup_window_frac"] == 0.0
    assert got[4]["n_windows"] == 0 and got[4]["dup_window_frac"] is None
    # doc5: 3 identical windows 'rep rep rep' -> all duplicated
    assert got[5]["n_windows"] == 3 and got[5]["n_dup_windows"] == 3


def test_remove_duplicate_spans_planted(spark):
    """ExactSubstr REMOVAL on planted docs: the canonical (min (id,pos))
    occurrence survives byte-for-byte, every other occurrence's cover
    is cut, matching is case-insensitive but surviving tokens keep
    their original casing, and sub-window/NULL docs pass through."""
    from polardbx_tools_spark.operators import dedup

    span = "alpha bravo charlie delta"
    rows = [
        (1, f"intro one two {span} tail x y"),
        (2, f"other doc start {span} more words"),
        (3, "totally unique text without repeats at all"),
        (4, span),
        (5, "short"),
        (6, None),
        (7, "UPPER case Alpha Bravo Charlie Delta suffix"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.remove_duplicate_spans(df, window=4).collect()}
    assert got[1]["text"] == f"intro one two {span} tail x y"
    assert got[1]["n_removed"] == 0
    assert got[2]["text"] == "other doc start more words"
    assert (got[2]["n_tokens"], got[2]["n_removed"]) == (5, 4)
    assert got[3]["n_removed"] == 0
    assert got[4]["text"] == "" and got[4]["n_tokens"] == 0
    assert got[4]["n_removed"] == 4
    assert got[5]["text"] == "short" and got[5]["n_removed"] == 0
    assert got[6]["text"] == "" and got[6]["n_removed"] == 0
    assert got[7]["text"] == "UPPER case suffix"
    # corpus token conservation: removed + kept == original totals
    orig = sum(len(t.split()) for _, t in rows if t)
    assert sum(g["n_tokens"] + g["n_removed"] for g in got.values()) == orig


def test_remove_duplicate_spans_overlap_union(spark):
    """Overlapping duplicated windows cut the UNION of their covers:
    doc B repeats A's 5-token run; with window=4 both of B's windows
    are non-canonical, so all 5 covered tokens go, not 4+4."""
    from polardbx_tools_spark.operators import dedup

    rows = [
        (1, "one two three four five uniq_a"),
        (2, "uniq_b one two three four five"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.remove_duplicate_spans(df, window=4).collect()}
    assert got[1]["n_removed"] == 0
    assert got[2]["text"] == "uniq_b" and got[2]["n_removed"] == 5


def test_lm_perplexity_hand_values(spark):
    """CCNet-style bigram LM against hand-computed probabilities:
    T=12 fit tokens, V=8 vocab (V'=9); 'the cat sat' scores
    (-log10(4/21) - log10(3/12) - log10(2/11)) / 3. OOV docs score
    strictly worse; empty docs report (0, NULL)."""
    import math

    from polardbx_tools_spark.operators import lm

    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran"), (3, "a dog sat")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zz qq ww"), (12, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm.lm_perplexity(docs, ref).collect()}
    exp10 = (-math.log10(4 / 21) - math.log10(3 / 12) - math.log10(2 / 11)) / 3
    assert abs(got[10]["log_ppl"] - exp10) < 1e-12
    # all-OOV: first term (0+1)/(12+9), bigrams (0+1)/(0+9)
    exp11 = (-math.log10(1 / 21) - 2 * math.log10(1 / 9)) / 3
    assert abs(got[11]["log_ppl"] - exp11) < 1e-12
    assert got[11]["log_ppl"] > got[10]["log_ppl"]
    assert got[12]["n_tokens"] == 0 and got[12]["log_ppl"] is None
    assert got[10]["n_tokens"] == 3


def test_bpe_train_and_encode(spark):
    """BPE on a planted corpus: deterministic merges, lossless byte
    roundtrip through the vocab, batch-encode parity with the pure
    merge loop, unseen words degrade to finer pieces, and the fold
    hash is order-sensitive."""
    from polardbx_tools_spark.operators import bpe

    rows = [(i, "aaab aaab aaab cd cd xyz") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.bpe_train(df, vocab_size=512, min_pair_count=2)
    assert merges, "planted repeats must produce at least one merge"
    assert merges == bpe.bpe_train(df, vocab_size=512, min_pair_count=2)
    # first merge is the most frequent pair: 'aa' (97,97) appears 2x in
    # each of 12 'aaab'-ish pretokens vs 'cd' 8x
    assert merges[0] == (97, 97)
    vocab = bpe.bpe_vocab(merges)
    # lossless roundtrip: decoding the encoded ids re-yields the bytes
    ranks = {p: r for r, p in enumerate(merges)}
    for w in ("aaab", " aaab", "cd", "xyz", "unseen", "zz"):
        ids = bpe.encode_word(tuple(w.encode()), ranks)
        assert b"".join(vocab[i] for i in ids) == w.encode()
    enc = {r["doc_id"]: r for r in bpe.bpe_encode(df, merges).collect()}
    # Arrow encode == pure-python encode over jvm-split pretokens
    expect = []
    for w in ["aaab", " aaab", " aaab", " cd", " cd", " xyz"]:
        expect.extend(bpe.encode_word(tuple(w.encode()), ranks))
    assert list(enc[0]["token_ids"]) == expect
    # trained words compress well below their byte length
    assert len(enc[0]["token_ids"]) < len(rows[0][1])
    # fold hash flips when order flips
    h = df.select(
        bpe.token_fold_hash(F.array(F.lit(1), F.lit(2))).alias("a"),
        bpe.token_fold_hash(F.array(F.lit(2), F.lit(1))).alias("b"),
    ).first()
    assert h["a"] != h["b"]
    # artifact roundtrip: save -> load yields the identical tokenizer
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        bpe.save_merges(f.name, merges)
        assert bpe.load_merges(f.name) == merges


def test_bpe_decode_roundtrip(spark):
    """bpe_decode inverts bpe_encode byte-for-byte on single-spaced
    text (incl. unicode and punctuation adjacency); for arbitrary
    whitespace one encode/decode pass is a fixed point (the RE2∩Java
    pre-tokenizer collapses whitespace runs by design); NULL stays
    NULL and empty stays empty."""
    from polardbx_tools_spark.operators import bpe

    exact = [
        (0, "aaab aaab aaab cd cd xyz"),
        (1, "Hello, world! punctuation-adjacent text."),
        (2, "unicode: héllo wörld — em-dash and 日本語"),
        (3, ""),
        (4, None),
    ]
    messy = [(5, "Multi  spaces\tand\ntabs"), (6, "  edge spaces  ")]
    df = spark.createDataFrame(exact + messy, "doc_id long, text string")
    merges = bpe.bpe_train(df, vocab_size=300)
    rt1 = bpe.bpe_decode(bpe.bpe_encode(df, merges), merges, out_col="rt") \
        .select("doc_id", F.col("rt").alias("text"))
    got1 = {r["doc_id"]: r["text"] for r in rt1.collect()}
    for i, t in exact:
        assert got1[i] == t, (i, t, got1[i])
    # fixed point: re-encoding the decoded text reproduces it exactly
    rt2 = bpe.bpe_decode(bpe.bpe_encode(rt1, merges), merges, out_col="rt2")
    for r in rt2.collect():
        assert r["rt2"] == r["text"], (r["doc_id"], r["text"], r["rt2"])


def test_semantic_dedup_planted_clusters(spark):
    """SemDeDup keep-lowest-id semantics on planted vectors: exact
    semantic dups drop with dup_of = the lowest covering id, distinct
    vectors survive, NULL embeddings degrade per-row (kept, no cell),
    and a second pass over the kept set is a fixpoint."""
    import math

    base_a = [1.0] + [0.0] * 7
    base_b = [0.0, 1.0] + [0.0] * 6
    rows = [
        (1, base_a),
        (2, [0.999] + [0.001] * 7),                 # near-dup of 1
        (3, base_b),
        (4, [0.001, 0.999] + [0.001] * 6),          # near-dup of 3
        (5, [math.cos(5 + j) for j in range(8)]),   # distinct
        (6, None),                                  # NULL embedding
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semantic_dedup(
        df, dim=8, tau=0.9, n_clusters=2, sample_rows=8
    )
    got = {r["vec_id"]: r for r in out.collect()}
    assert len(got) == 6  # one row per input row, always
    assert got[1]["kept"] == 1 and got[1]["dup_of"] is None
    assert got[2]["kept"] == 0 and got[2]["dup_of"] == 1
    assert got[3]["kept"] == 1 and got[3]["dup_of"] is None
    assert got[4]["kept"] == 0 and got[4]["dup_of"] == 3
    assert got[5]["kept"] == 1
    assert got[6]["kept"] == 1 and got[6]["cell"] is None
    # same-cell invariant: a drop always points at a lower id in its cell
    for r in got.values():
        if r["kept"] == 0:
            assert r["dup_of"] < r["vec_id"]
            assert got[r["dup_of"]]["cell"] == r["cell"]
    # fixpoint: rerunning over the kept docs drops nothing
    kept_ids = [i for i, r in got.items() if r["kept"] == 1]
    again = similarity.semantic_dedup(
        df.filter(F.col("vec_id").isin(kept_ids)), dim=8, tau=0.9,
        n_clusters=2, sample_rows=8,
    )
    assert again.filter("kept = 0").count() == 0


def test_simhash_identical_and_distance(docs, spark):
    sh = {r["id"]: r["simhash"] for r in dedup.simhash64(docs).collect()}
    assert sh[1] == sh[2]              # identical text -> identical simhash
    near = dedup.simhash_near_pairs(docs, max_hamming=10)
    npairs = {(r["id_a"], r["id_b"]) for r in near.collect()}
    assert (1, 2) in npairs


def test_brute_force_vs_lsh_topk(spark):
    import math

    vecs = [
        (i, [math.cos(i * 0.3 + j) for j in range(8)]) for i in range(50)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 3")
    bf = similarity.brute_force_topk(df, q, k=3)
    got = bf.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)
    top1 = {r["query_id"]: r["neighbor_id"] for r in bf.filter("rank=1").collect()}
    # cos(i*0.3 + j) has period ~2π/0.3≈20.9 — nearest vector is not self
    assert len(top1) == 3

    lsh = similarity.lsh_topk(df, q, dim=8, k=3, n_planes=4)
    assert lsh.count() > 0
    assert lsh.filter("cosine > 1.0001 or cosine < -1.0001").count() == 0


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat, happily!",), ("word",), ("",)],
        "text string",
    )
    r = df.select(
        text.token_count(F.col("text")).alias("n"),
        F.round(text.stopword_ratio(F.col("text")), 3).alias("sr"),
        text.lang_id(F.col("text")).alias("lang"),
        text.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert r[0]["n"] == 7 and r[1]["n"] == 1 and r[2]["n"] == 0
    assert r[0]["sr"] > 0.25 and r[0]["lang"] == "en"
    # fingerprint is punctuation-insensitive
    fp2 = df.select(text.fingerprint(F.lit("THE CAT sat on the mat happily"))).collect()
    assert r[0]["fp"] == fp2[0][0]


def test_masking(spark):
    df = spark.createDataFrame([("Customer#001",), ("ab",), (None,)], "v string")
    out = df.select(
        masking.mask_hide(F.col("v"), 4).alias("hide"),
        masking.mask_hash(F.col("v"), "s").alias("hash"),
    ).collect()
    assert out[0]["hide"] == "********#001"
    assert out[1]["hide"] == "ab"
    assert out[2]["hide"] is None
    assert out[0]["hash"] != out[1]["hash"]


def test_aes_roundtrip(spark):
    df = spark.createDataFrame([("secret text",)], "v string")
    key = "0123456789abcdef"
    out = df.select(
        masking.decrypt_aes(masking.encrypt_aes(F.col("v"), key), key).alias("rt")
    ).collect()
    assert out[0]["rt"] == "secret text"


def test_sm4_known_answer_and_roundtrip(spark):
    """SM4 vs the GB/T 32907-2016 standard vector, then a Spark
    pandas-UDF roundtrip (ref Sm4Cipher.java:35-55)."""
    from polardbx_tools_spark.operators import sm4

    key = bytes.fromhex("0123456789abcdeffedcba9876543210")
    plain = bytes.fromhex("0123456789abcdeffedcba9876543210")
    assert sm4.encrypt_block(plain, key).hex() == "681edf34d206965e86b3e94f536e4246"
    assert sm4.decrypt_block(sm4.encrypt_block(plain, key), key) == plain

    df = spark.createDataFrame(
        [("secret text",), ("",), (None,), ("héllo ✓ unicode",)], "v string"
    )
    key_hex = "0123456789abcdeffedcba9876543210"
    out = df.select(
        F.col("v"),
        masking.sm4_decrypt(
            masking.sm4_encrypt(F.col("v"), key_hex), key_hex
        ).alias("rt"),
    ).collect()
    assert all(r["rt"] == r["v"] for r in out)


def test_update_transforms(spark):
    """K4/K5 deterministic update transforms (UpdateUtil.java:198-219,259)."""
    from polardbx_tools_spark.operators import transforms

    df = spark.createDataFrame([("abc", 21.5), (None, -3.0)], "s string, x double")
    out = df.select(
        transforms.update_reverse(F.col("s")).alias("r"),
        transforms.update_double(F.col("x")).alias("d"),
    ).collect()
    assert out[0]["r"] == "cba" and out[0]["d"] == 43.0
    assert out[1]["r"] is None and out[1]["d"] == -6.0


def test_embedding_lsh_index_incremental_equals_one_shot(spark, tmp_path):
    """EmbeddingLshIndex (persistent ANN dedup index): pairs of a new
    batch vs the indexed corpus must equal the (new x corpus) cross
    subset of the one-shot self-join operator (same planes -> same
    candidate recall, same exact-cosine verify values), and building the
    index in two appends must equal one."""
    from polardbx_tools_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    split = 400
    corpus = e.filter(F.col("vec_id") < split)
    new = e.filter(F.col("vec_id") >= split)

    idx = similarity.EmbeddingLshIndex(spark, str(tmp_path / "i1"), dim=64,
                                       n_planes=3, n_tables=8)
    idx.append(corpus.filter("vec_id < 200"))
    idx.append(corpus.filter("vec_id >= 200"))
    got = {(r["new_id"], r["corpus_id"]): round(r["cosine"], 6)
           for r in idx.pairs_against(new, threshold=0.4).collect()}

    one = similarity.EmbeddingLshIndex(spark, str(tmp_path / "i2"), dim=64,
                                       n_planes=3, n_tables=8)
    one.append(corpus)
    got_one = {(r["new_id"], r["corpus_id"]): round(r["cosine"], 6)
               for r in one.pairs_against(new, threshold=0.4).collect()}
    assert got == got_one

    full = similarity.cosine_near_dup_pairs(
        e, dim=64, threshold=0.4, n_planes=3, n_tables=8
    )
    want = {}
    for r in full.collect():
        a, b = r["id_a"], r["id_b"]
        if (a < split) != (b < split):  # exactly one side is corpus
            new_id, corpus_id = (b, a) if a < split else (a, b)
            want[(new_id, corpus_id)] = round(r["cosine"], 6)
    assert got == want

    # compact preserves the result (dedup + re-layout only)
    idx.compact(target_files=2)
    got_c = {(r["new_id"], r["corpus_id"]): round(r["cosine"], 6)
             for r in idx.pairs_against(new, threshold=0.4).collect()}
    assert got_c == got

    # crash-recovery: simulate a compact that died between its two
    # renames (cur gone, _old present) — the next compact() must repair
    # and produce the same result (review finding, round 4)
    import os

    cur = f"{idx.path}/banded"
    os.rename(cur, f"{idx.path}/_banded_old")
    idx.compact(target_files=2)
    got_r = {(r["new_id"], r["corpus_id"]): round(r["cosine"], 6)
             for r in idx.pairs_against(new, threshold=0.4).collect()}
    assert got_r == got


def test_multimodal_real_codecs_end_to_end(spark):
    """REAL stdlib decode through the distributed path: BMP and PNG
    images and PCM WAV audio rows get real features (dimensions /
    duration lead the vector), video rows take the deterministic hash
    fallback, and the default resize round-trips decodable images to
    the target shape — all inside mapInPandas, no external codec
    libs."""
    from polardbx_tools_spark.operators import codecs

    media = multimodal.synthetic_media_real(spark, n=12)
    assert {"image/bmp", "image/png", "image/jpeg", "image/gif"} <= {
        r["mime"] for r in media.filter("kind = 'image'").collect()
    }
    assert {"audio/wav", "audio/aiff", "audio/basic"} <= {
        r["mime"] for r in media.filter("kind = 'audio'").collect()
    }
    assert {"video/x-msvideo", "video/mp4"} <= {
        r["mime"] for r in media.filter("kind = 'video'").collect()
    }
    rows = {r["media_id"]: r for r in
            multimodal.extract_features(media, feature_dim=8).collect()}
    kinds = {r["media_id"]: r["kind"] for r in media.select("media_id", "kind").collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        if kinds[mid] == "image":
            assert r["feat"][0] == 16.0 and r["feat"][1] == 16.0  # w, h
        elif kinds[mid] == "audio":
            assert abs(r["feat"][0] - 0.1) < 1e-6  # 800 samples @ 8 kHz
        else:  # video: deterministic hash fallback
            assert len(r["feat"]) == 8
    # default resize_fn decodes + nearest-neighbor resizes real images
    imgs = media.filter("kind = 'image'")
    out = multimodal.resize_images(imgs, 4, 3).collect()
    assert out and all(
        codecs.decode_image(bytes(r["payload"])).shape == (3, 4, 3) for r in out
    )
    assert all(r["width"] == 4 and r["height"] == 3 for r in out)
    # REAL video frame extraction: MJPEG-AVI rows yield decodable PNG
    # frames; opaque mp4 rows degrade to one NULL-payload row
    frames = multimodal.extract_frames(media, every_ms=250,
                                       frame_format="png").collect()
    mimes_by_id = {r["media_id"]: r["mime"]
                   for r in media.filter("kind = 'video'").collect()}
    got_real = got_null = 0
    for r in frames:
        if mimes_by_id[r["media_id"]] == "video/x-msvideo":
            rgb = codecs.decode_image(bytes(r["frame_payload"]))
            assert rgb.shape == (16, 16, 3)
            got_real += 1
        else:
            assert r["frame_payload"] is None
            got_null += 1
    assert got_real > 0 and got_null > 0


def test_multimodal_resize_and_frame_sample_plumbing(spark):
    """resize/frame-sample Spark plumbing with a deterministic fake
    codec: schema preserved, metadata rewritten, frame positions are
    JVM-side column math."""
    media = multimodal.synthetic_media(spark, n=12)

    def fake_resize(payload: bytes, w: int, h: int) -> bytes:
        return (payload or b"")[: w * h].ljust(w * h, b"\0")

    resized = multimodal.resize_images(media, 4, 3, resize_fn=fake_resize)
    rows = resized.collect()
    assert [(f.name, f.dataType) for f in resized.schema.fields] == [
        (f.name, f.dataType) for f in media.schema.fields
    ]
    assert all(r["width"] == 4 and r["height"] == 3 for r in rows)
    assert all(len(r["payload"]) == 12 for r in rows)

    frames = multimodal.sample_frames(media, every_ms=500).collect()
    assert frames and all(r["frame_ms"] % 500 == 0 for r in frames)
    per_vid = {}
    for r in frames:
        per_vid.setdefault(r["media_id"], []).append(r["frame_ms"])
    vids = {r["media_id"]: r["duration_ms"]
            for r in media.filter("kind = 'video'").collect()}
    assert set(per_vid) == set(vids)
    for mid, stamps in per_vid.items():
        assert stamps == sorted(stamps) and stamps[0] == 0
        assert len(stamps) == vids[mid] // 500 + 1


def test_multimodal_plumbing(spark):
    media = multimodal.synthetic_media(spark, n=30)
    feats = multimodal.extract_features(media, feature_dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feat"]) == 8 for r in rows)
    # deterministic: same payload -> same sha1/features across runs
    again = {r["media_id"]: r["sha1"] for r in multimodal.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["sha1"] for r in rows)

    frames = multimodal.sample_frames(media, every_ms=500)
    vid_cnt = media.filter("kind='video'").count()
    assert frames.select("media_id").distinct().count() == vid_cnt


def test_export_rotation_and_ddl(spark, tmp_path):
    import glob

    from polardbx_tools_spark.export import ddl_export, ddl_import, export_csv
    from polardbx_tools_spark.changelog.generator import transcripts_schema
    from polardbx_tools_spark.lake.table import LakeTable

    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("name-"), F.col("id")).alias("name")
    )
    out = str(tmp_path / "csv")
    export_csv(df, out, order_by=["id"], max_rows_per_file=30, header=True)
    files = glob.glob(out + "/*.csv")
    assert len(files) >= 4  # 100 rows / 30 per file
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 100

    t = LakeTable.create(str(tmp_path / "t1"), transcripts_schema(True))
    ddl_path = str(tmp_path / "t1.ddl.json")
    ddl_export(t, ddl_path)
    t2 = ddl_import(ddl_path, str(tmp_path / "t2"))
    assert t2.schema == t.schema
    # idempotent re-import (ref: "already exists" tolerated)
    t3 = ddl_import(ddl_path, str(tmp_path / "t2"))
    assert t3.path == t2.path


def test_numpy_topk_matches_expression_topk(spark):
    import math

    vecs = [(i, [math.sin(i * 0.7 + j) for j in range(16)]) for i in range(200)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 5")
    expr_res = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 6))
        for r in similarity.brute_force_topk(df, q, k=4).collect()
    }
    np_res = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 6))
        for r in similarity.brute_force_topk_np(df, q, k=4).collect()
    }
    assert expr_res == np_res


def test_asof_join_semantics(spark):
    """Backward as-of: latest right row at-or-before each left ts per
    key; strict mode excludes the equal-ts row; keys with no prior right
    row carry NULL."""
    from polardbx_tools_spark.operators import temporal

    left = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 20), ("b", 7), ("c", 3)],
        "k string, ts long",
    )
    right = spark.createDataFrame(
        [("a", 1, 100.0), ("a", 10, 200.0), ("a", 15, 300.0), ("b", 9, 9.0)],
        "k string, ts long, v double",
    )
    got = {
        (r["k"], r["ts"]): r["v"]
        for r in temporal.asof_join(left, right, on=["k"], value_cols=["v"]).collect()
    }
    assert got == {
        ("a", 5): 100.0,      # only ts=1 is prior
        ("a", 10): 200.0,     # exact match included
        ("a", 20): 300.0,     # latest prior (15)
        ("b", 7): None,       # right row is later (9 > 7)
        ("c", 3): None,       # key absent from right
    }

    strict = {
        (r["k"], r["ts"]): r["v"]
        for r in temporal.asof_join(
            left, right, on=["k"], value_cols=["v"], allow_exact_matches=False
        ).collect()
    }
    assert strict[("a", 10)] == 100.0  # equal-ts row excluded
    assert strict[("a", 20)] == 300.0

    # a MATCHED right row whose payload is NULL must yield NULL (the
    # match), never carry the older non-NULL value (DuckDB/pandas
    # ASOF semantics — review finding)
    right_null = spark.createDataFrame(
        [("a", 1, 100.0), ("a", 10, None)], "k string, ts long, v double"
    )
    got_null = {
        (r["k"], r["ts"]): r["v"]
        for r in temporal.asof_join(
            left, right_null, on=["k"], value_cols=["v"]
        ).collect()
    }
    assert got_null[("a", 5)] == 100.0
    assert got_null[("a", 10)] is None   # matched ts=10, value NULL
    assert got_null[("a", 20)] is None   # latest match is the NULL row


def test_minhash_lsh_index_incremental_equals_batch(spark, tmp_path):
    """The persistent LSH index, built by appending two corpus batches,
    must answer a tail-dedup query identically to the one-shot
    incremental operator over the full corpus — the index is just the
    corpus side's derived relations materialized ahead of time."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus1, corpus2 = d.filter("doc_id < 20"), d.filter("doc_id >= 20 and doc_id < 40")
    tail = d.filter("doc_id >= 40")

    idx = dedup.MinHashLshIndex(spark, str(tmp_path / "lsh_idx"),
                                num_hashes=32, bands=8)
    idx.append(corpus1)
    idx.append(corpus2)
    got = {(r["new_id"], r["corpus_id"]): round(r["jaccard"], 6)
           for r in idx.pairs_against(tail, verify_threshold=0.4).collect()}

    want = {(r["new_id"], r["corpus_id"]): round(r["jaccard"], 6)
            for r in dedup.incremental_minhash_pairs(
                tail, d.filter("doc_id < 40"),
                num_hashes=32, bands=8, verify_threshold=0.4).collect()}
    assert got == want and len(want) > 0


def test_range_join_semantics(spark):
    """Bin equi-join range join must be EXACT: inclusive start,
    exclusive end, key isolation, intervals spanning multiple bins, and
    one output row per qualifying (row, interval) pair even when the
    pair's bin straddles interval chunks."""
    from polardbx_tools_spark.operators import temporal

    left = spark.createDataFrame(
        [("a", 0), ("a", 5), ("a", 10), ("a", 25), ("b", 5)],
        "k string, ts long",
    )
    right = spark.createDataFrame(
        [("a", 1, 0, 10), ("a", 2, 5, 30), ("b", 3, 0, 6)],
        "k string, win long, s long, e long",
    )
    got = sorted(
        (r["k"], r["ts"], r["win"])
        for r in temporal.range_join(
            left, right, on=["k"], left_ts="ts",
            right_start="s", right_end="e", bin_width=4,
        ).collect()
    )
    assert got == [
        ("a", 0, 1),              # inclusive start
        ("a", 5, 1), ("a", 5, 2),
        ("a", 10, 2),             # ts=10 out of win 1 (exclusive end), in win 2
        ("a", 25, 2),             # interval spans many bins
        ("b", 5, 3),              # key isolation; ts=10 excluded from win 1 (exclusive end)
    ]


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized parity vs an independent implementation: pandas
    merge_asof(by=key, direction='backward') on seeded random frames —
    both exact-match and strict modes."""
    import numpy as np
    import pandas as pd

    from polardbx_tools_spark.operators import temporal

    rng = np.random.RandomState(7)
    left_pd = pd.DataFrame({
        "k": rng.randint(0, 6, 300).astype(str),
        "ts": rng.randint(0, 1000, 300).astype("int64"),
        "lid": np.arange(300, dtype="int64"),
    })
    right_pd = pd.DataFrame({
        "k": rng.randint(0, 6, 120).astype(str),
        "ts": rng.randint(0, 1000, 120).astype("int64"),
        "v": np.round(rng.randn(120), 3),
    })
    # asof requires a unique right (key, ts): keep max v per (k, ts)
    right_pd = right_pd.groupby(["k", "ts"], as_index=False)["v"].max()

    for exact in (True, False):
        want = pd.merge_asof(
            left_pd.sort_values(["ts", "lid"], kind="mergesort"),
            right_pd.sort_values("ts", kind="mergesort"),
            on="ts", by="k", direction="backward",
            allow_exact_matches=exact,
        ).set_index("lid")["v"].to_dict()
        got = {
            r["lid"]: r["v"]
            for r in temporal.asof_join(
                spark.createDataFrame(left_pd),
                spark.createDataFrame(right_pd),
                on=["k"], value_cols=["v"], allow_exact_matches=exact,
            ).collect()
        }
        assert len(got) == len(left_pd)
        for lid, w in want.items():
            g = got[lid]
            assert (pd.isna(w) and g is None) or g == w, (exact, lid, g, w)


def test_range_join_matches_bruteforce(spark):
    """Randomized parity vs the O(n*m) definition on seeded frames,
    across bin widths (bin geometry must never change the result)."""
    import numpy as np
    import pandas as pd

    from polardbx_tools_spark.operators import temporal

    rng = np.random.RandomState(11)
    left_pd = pd.DataFrame({
        "k": rng.randint(0, 5, 250).astype(str),
        "ts": rng.randint(0, 500, 250).astype("int64"),
        "lid": np.arange(250, dtype="int64"),
    })
    s = rng.randint(0, 480, 60).astype("int64")
    right_pd = pd.DataFrame({
        "k": rng.randint(0, 5, 60).astype(str),
        "s": s,
        "e": s + rng.randint(1, 120, 60).astype("int64"),
        "win": np.arange(60, dtype="int64"),
    })
    want = {
        (int(l.lid), int(r.win))
        for l in left_pd.itertuples()
        for r in right_pd.itertuples()
        if l.k == r.k and r.s <= l.ts < r.e
    }
    for bw in (7, 64, 1000):
        got = {
            (r["lid"], r["win"])
            for r in temporal.range_join(
                spark.createDataFrame(left_pd),
                spark.createDataFrame(right_pd),
                on=["k"], left_ts="ts", right_start="s", right_end="e",
                bin_width=bw,
            ).collect()
        }
        assert got == want, f"bin_width={bw}"

    # exactness past 2^53 (epoch-nanosecond territory): a double round-
    # trip loses ~256ns there and flips boundary comparisons; the
    # integer path must stay exact (review finding)
    base = (1 << 60) + 7
    left2 = spark.createDataFrame(
        [("a", base), ("a", base + 1), ("a", base + 2)], "k string, ts long"
    )
    right2 = spark.createDataFrame(
        [("a", base + 1, base + 2, 1)], "k string, s long, e long, win long"
    )
    got2 = {(r["ts"] - base, r["win"]) for r in temporal.range_join(
        left2, right2, on=["k"], left_ts="ts", right_start="s",
        right_end="e", bin_width=1_000_000_000,
    ).collect()}
    assert got2 == {(1, 1)}  # only ts=base+1 is in [base+1, base+2)


def test_leakage_safe_split_never_splits_a_cluster(spark):
    """Every duplicate cluster must land entirely in ONE split; docs
    outside any cluster are singletons; all docs covered exactly once."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(d, num_hashes=32, bands=8,
                                    verify_threshold=0.4)
    clusters = dedup.duplicate_clusters(pairs)
    out = dedup.leakage_safe_split(d, clusters)
    assert out.count() == d.count()
    assert out.select("doc_id").distinct().count() == d.count()
    straddling = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter("n_splits > 1")
        .count()
    )
    assert straddling == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}


def test_minhash_lsh_index_compact_preserves_answers(spark, tmp_path):
    """Index compaction (small-file fold + banded dedup) must not change
    any query answer, and must reduce the file count."""
    import glob

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = dedup.MinHashLshIndex(spark, str(tmp_path / "idx"),
                                num_hashes=32, bands=8)
    for lo, hi in ((0, 15), (15, 30), (30, 40)):
        idx.append(d.filter(f"doc_id >= {lo} and doc_id < {hi}"))
    tail = d.filter("doc_id >= 40")
    before = {(r["new_id"], r["corpus_id"], round(r["jaccard"], 6))
              for r in idx.pairs_against(tail, verify_threshold=0.4).collect()}
    n_files_before = len(glob.glob(str(tmp_path / "idx" / "banded" / "*.parquet")))

    idx.compact(target_files=2)
    after = {(r["new_id"], r["corpus_id"], round(r["jaccard"], 6))
             for r in idx.pairs_against(tail, verify_threshold=0.4).collect()}
    n_files_after = len(glob.glob(str(tmp_path / "idx" / "banded" / "*.parquet")))
    assert after == before and len(before) > 0
    assert n_files_after < n_files_before


def test_simhash_empty_and_null_docs_are_zero(spark):
    """Empty/NULL documents must get simhash 0 (no votes), matching the
    pure-Python golden; Spark's xxhash64(NULL)=42 previously leaked the
    seed's bit pattern in as a phantom token (review finding)."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   "), (4, "real words here")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["simhash"] for r in dedup.simhash64(df).collect()}
    assert got[1] == 0 and got[2] == 0 and got[3] == 0
    assert got[4] != 0
    from tools import make_golden
    assert got[4] == make_golden.simhash64("real words here")


def test_numpy_topk_tie_break_matches_exact(spark):
    """Duplicate vectors (tied cosines — the normal case in a dedup
    corpus) must yield the same top-k as the expression baseline: ties
    break by neighbor_id, not by Arrow-batch row order."""
    base = [1.0, 2.0, 3.0, 4.0]
    rows = [(i, base) for i in range(20)]          # 20 identical vectors
    rows += [(100 + i, [float(i + 1), 0.0, 0.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0")
    exact = [(r["neighbor_id"], r["rank"])
             for r in similarity.brute_force_topk(df, q, k=5).collect()]
    fast = [(r["neighbor_id"], r["rank"])
            for r in similarity.brute_force_topk_np(df, q, k=5).collect()]
    assert sorted(exact) == sorted(fast)
    assert sorted(n for n, _ in fast) == [1, 2, 3, 4, 5]  # smallest tied ids win


def test_pq_index_serves_identical_topk(spark, tmp_path):
    """PqIndex (persistent PQ-codes index): top-k served from the codes
    relation must be IDENTICAL to one-shot pq_topk on the same corpus
    (same frozen codebooks); building in fit-half + append-half with the
    same fit basis must equal one build; a replayed (duplicate) append
    must not change results (shortlist dedup); compact() must drop the
    duplicate ids and preserve answers; a compact that crashed between
    its renames is repaired by the next compact()."""
    import glob as _glob
    import os as _os

    from polardbx_tools_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter("vec_id < 8")

    def rows(df):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], round(r["cosine"], 9))
            for r in df.collect()
        )

    want = rows(similarity.pq_topk(e, q, dim=64, k=5, m=8, ks=16, refine=40))

    idx = similarity.PqIndex.fit(spark, str(tmp_path / "full"), e, dim=64)
    assert rows(idx.topk(q, e, k=5, refine=40)) == want

    # incremental build: fit on the even half with the FULL corpus as
    # the codebook sample basis, append the odd half
    inc = similarity.PqIndex.fit(
        spark, str(tmp_path / "inc"), e.filter("vec_id % 2 = 0"),
        dim=64, sample_df=e,
    )
    inc.append(e.filter("vec_id % 2 = 1"))
    assert rows(inc.topk(q, e, k=5, refine=40)) == want

    # replayed append: duplicate ids in codes must not perturb top-k
    inc.append(e.filter("vec_id % 2 = 1"))
    assert rows(inc.topk(q, e, k=5, refine=40)) == want

    # compaction drops the duplicates and preserves answers
    n_before = spark.read.parquet(str(tmp_path / "inc") + "/codes").count()
    inc.compact(target_files=2)
    codes = spark.read.parquet(str(tmp_path / "inc") + "/codes")
    assert codes.count() == e.count() < n_before
    assert len(_glob.glob(str(tmp_path / "inc") + "/codes/*.parquet")) <= 2
    assert rows(inc.topk(q, e, k=5, refine=40)) == want

    # crash window: swap died between renames (codes missing, _codes_old
    # left) — the next compact() repairs, answers unchanged
    _os.rename(str(tmp_path / "inc") + "/codes",
               str(tmp_path / "inc") + "/_codes_old")
    inc.compact(target_files=2)
    assert rows(inc.topk(q, e, k=5, refine=40)) == want


def test_ivfpq_index_prunes_cells_and_matches_reference(spark, tmp_path):
    """IvfPqIndex: (a) probing ALL cells must reproduce pq_topk exactly
    (IVF prunes candidates, never changes scoring); (b) the codes scan
    must be hive-partition-PRUNED to the probed cells; (c) a pruned
    probe must match an independent numpy reference implementation of
    IVF-PQ (cells by max centroid score, ADC over codes in probed
    cells, exact re-rank)."""
    import numpy as np

    from polardbx_tools_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter("vec_id < 6")

    def rows(df):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], round(r["cosine"], 9))
            for r in df.collect()
        )

    idx = similarity.IvfPqIndex.fit(
        spark, str(tmp_path / "ivfpq"), e, dim=64, nlist=8, m=8, ks=16
    )
    # (a) full probe == one-shot PQ (same frozen sample/seed -> books)
    assert rows(idx.topk(q, e, k=5, n_probe=8, refine=40)) == rows(
        similarity.pq_topk(e, q, dim=64, k=5, m=8, ks=16, refine=40)
    )

    # (b) the pruned scan reads only the probed cells' partitions
    pruned_df = idx.topk(q, e, k=5, n_probe=2, refine=40)
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters: [")
    assert len(seg) > 1 and "cell" in seg[1][:120], plan

    # (c) independent numpy reference for the pruned probe
    vec = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in e.collect()}
    ids = sorted(vec)
    V = np.stack([vec[i] for i in ids])
    cents, cnorms, books = idx.cents, idx.cnorms, idx.books
    nlist, m, dsub = 8, 8, 8
    cell = np.argmax(V @ cents.T / cnorms, axis=1)
    codes = np.stack([
        ((V[:, None, j * dsub:(j + 1) * dsub] - books[j][None]) ** 2)
        .sum(axis=2).argmin(axis=1)
        for j in range(m)
    ], axis=1)
    cn2 = np.array([[float((c * c).sum()) for c in books[j]]
                    for j in range(m)])
    want = set()
    for qid in range(6):
        qv = vec[qid]
        qs = qv @ cents.T / cnorms
        probes = sorted(range(nlist), key=lambda c: (-qs[c], c))[:2]
        cand = [i for i, cid in enumerate(ids)
                if cell[i] in probes and cid != qid]
        lut = np.stack([qv[j * dsub:(j + 1) * dsub] @ books[j].T
                        for j in range(m)])
        qn = float(np.sqrt((qv * qv).sum()))
        adc = {
            ids[i]: float(
                sum(lut[j, codes[i, j]] for j in range(m))
                / (qn * np.sqrt(sum(cn2[j, codes[i, j]] for j in range(m))))
            )
            for i in cand
        }
        short = sorted(adc, key=lambda n: (-adc[n], n))[:40]
        cos = {
            n: float(vec[qid] @ vec[n]
                     / (np.linalg.norm(vec[qid]) * np.linalg.norm(vec[n])))
            for n in short
        }
        for rank, n in enumerate(
            sorted(cos, key=lambda n: (-cos[n], n))[:5], start=1
        ):
            want.add((qid, n, rank, round(cos[n], 6)))
    got = {(a, b, r, round(c, 6)) for a, b, r, c in rows(pruned_df)}
    assert got == want


def test_bpe_regex_tokens_planted(spark):
    """GPT-2-style regex pre-tokenizer: contractions split off,
    letter/digit/punctuation runs separate, optional leading space
    attaches, pure whitespace never counts (portable pattern — no
    lookahead — so trailing-space clauses are intentionally absent)."""
    from polardbx_tools_spark.operators import text

    cases = {
        "Hello, world!": ["Hello", ",", " world", "!"],
        "It's 3.14": ["It", "'s", " 3", ".", "14"],
        "can't we've": ["can", "'t", " we", "'ve"],
        "": [],
        "   ": [],
        "a1b2": ["a", "1", "b", "2"],
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, t string"
    )
    got = {
        r["i"]: list(r["toks"])
        for r in df.select(
            "i", text.bpe_regex_tokens(F.col("t")).alias("toks")
        ).collect()
    }
    for i, (src, want) in enumerate(cases.items()):
        assert got[i] == want, (src, got[i], want)
    n = df.select(
        F.sum(text.bpe_regex_token_count(F.col("t"))).alias("n")
    ).collect()[0]["n"]
    assert n == sum(len(v) for v in cases.values())


def test_intra_doc_repetition_metrics(spark):
    """Gopher-style repetition signals on planted documents: duplicate
    line fraction, duplicate 2-gram fraction, and top-2-gram fraction
    (longest-sorted-run fold) must match hand-computed values."""
    from polardbx_tools_spark.operators import text as T

    rows = [
        (1, "a b\na b\nc d"),        # dup line 1/3; grams [ab,ba,ab,bc,cd]
        (2, "x"),                     # no 2-grams, one line
        (3, ""),                      # empty everything
        (4, "spam spam spam spam"),   # one gram repeated 3x
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            round(r["dl"], 6), round(r["dg"], 6), round(r["tg"], 6)
        )
        for r in df.select(
            "doc_id",
            T.dup_line_fraction(F.col("text")).alias("dl"),
            T.dup_ngram_fraction(F.col("text"), 2).alias("dg"),
            T.top_ngram_fraction(F.col("text"), 2).alias("tg"),
        ).collect()
    }
    assert got == {
        1: (round(1 - 2 / 3, 6), round(1 - 4 / 5, 6), round(2 / 5, 6)),
        2: (0.0, 0.0, 0.0),
        3: (0.0, 0.0, 0.0),
        4: (0.0, round(1 - 1 / 3, 6), 1.0),
    }


def test_decontaminate_planted_overlap(spark):
    """A training doc carrying a verbatim 13-word span of a benchmark
    doc must be flagged with exactly that one shared 13-gram; clean and
    too-short docs stay present with zero hits (GPT-3/Pile-style
    decontamination, text.decontaminate)."""
    span = " ".join(f"w{i}" for i in range(13))
    bench = spark.createDataFrame(
        [(1000, f"eval question: {span} answer")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "clean document " + " ".join(f"x{i}" for i in range(20))),
            (2, f"leaky doc contains {span} verbatim inside"),
            (3, "short doc"),  # < 13 tokens: no grams, still one row out
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_contam_grams"], r["contaminated"])
        for r in text.decontaminate(docs, bench, n=13).collect()
    }
    assert got == {1: (0, 0), 2: (1, 1), 3: (0, 0)}


def test_decontaminate_benchmark_side_broadcasts(spark):
    """The benchmark n-gram set must reach the hit join as a broadcast
    (eval suites are MBs vs a 100-TB corpus): no shuffle of the corpus
    gram stream."""
    d = spark.range(200).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 20), i -> concat('t', id, '_', i))) AS text",
    )
    plan = text.decontaminate(
        d.filter("doc_id % 7 != 0"), d.filter("doc_id % 7 = 0"), n=13
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_pii_scan_and_redact(spark):
    """Planted PII of every supported kind: counts per kind are exact,
    redaction replaces every occurrence, and re-scanning the redacted
    text finds nothing."""
    s = (
        "mail a@b.io and bob.smith+x@corp.example.org, "
        "call +1-555-123-4567 or (555) 987-6543, "
        "ssn 123-45-6789, host 10.0.42.7 done"
    )
    df = spark.createDataFrame([(1, s), (2, "no pii here"), (3, None)],
                               "id long, t string")
    got = df.select(
        "id",
        masking.pii_count(F.col("t"), "email").alias("e"),
        masking.pii_count(F.col("t"), "phone").alias("p"),
        masking.pii_count(F.col("t"), "ssn").alias("s"),
        masking.pii_count(F.col("t"), "ipv4").alias("i"),
        masking.pii_redact(F.col("t")).alias("red"),
    ).collect()
    by_id = {r["id"]: r for r in got}
    r1 = by_id[1]
    assert (r1["e"], r1["p"], r1["s"], r1["i"]) == (2, 2, 1, 1)
    assert "[PII]" in r1["red"]
    # nothing recognizable survives redaction
    rescan = df.filter("id = 1").select(
        *[masking.pii_count(masking.pii_redact(F.col("t")), k).alias(k)
          for k in masking.PII_PATTERNS]
    ).collect()[0]
    assert all(rescan[k] == 0 for k in masking.PII_PATTERNS), rescan
    assert (by_id[2]["e"], by_id[2]["red"]) == (0, "no pii here")
    assert by_id[3]["red"] is None


def test_pack_sequences_matches_cumsum_oracle(spark):
    """Concat-and-chop placement must equal the single-threaded cumsum
    oracle on real docs — forced through MANY range partitions so the
    cross-partition carry path actually runs — including empty docs
    (span 0 sequences) and docs longer than the budget (span several)."""
    from polardbx_tools_spark.operators import packing

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    extra = spark.createDataFrame(
        [(100001, ""), (100002, None),
         (100003, " ".join(f"w{i}" for i in range(700)))],
        "doc_id long, text string",
    )
    d = d.unionByName(extra)
    budget = 256
    got = packing.pack_sequences(
        d, budget, num_partitions=13
    ).toPandas().sort_values("doc_id").reset_index(drop=True)

    # oracle: pandas cumsum over id-ordered whitespace token counts
    pdf = d.toPandas().sort_values("doc_id").reset_index(drop=True)
    ntok = pdf["text"].map(
        lambda t: len(t.split()) if isinstance(t, str) else 0
    )
    before = ntok.cumsum() - ntok
    assert list(got["doc_id"]) == list(pdf["doc_id"])
    assert list(got["n_tokens"]) == list(ntok)
    assert list(got["global_offset"]) == list(before)
    assert list(got["seq_idx"]) == list(before // budget)
    assert list(got["seq_offset"]) == list(before % budget)
    exp_span = [
        0 if n == 0 else (b + n - 1) // budget - b // budget + 1
        for b, n in zip(before, ntok)
    ]
    assert list(got["n_seqs"]) == exp_span
    assert max(exp_span) >= 3, "long planted doc must span several seqs"
    assert 0 in exp_span, "empty docs must span zero seqs"

    stats = packing.packing_stats(
        packing.pack_sequences(d, budget, num_partitions=13), budget
    ).collect()[0]
    total = int(ntok.sum())
    assert stats["n_docs"] == len(pdf)
    assert stats["total_tokens"] == total
    assert stats["n_sequences"] == total // budget
    assert stats["boundary_docs"] == sum(1 for s in exp_span if s > 1)


def test_pack_sequences_plan_is_distributed_prefix_sum(spark):
    """The corpus moves exactly once (the range exchange); the running
    total is an in-place Arrow cumsum over the cached sorted partitions
    — no Window at all, hence no hidden single-partition (or even
    second) corpus exchange — and the carry joins back as a broadcast
    of the tiny per-partition offsets."""
    from polardbx_tools_spark.operators import packing

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    plan = packing.pack_sequences(d, 512)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "rangepartitioning" in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "Window" not in plan, plan
    # the cumsum pass is Arrow-native (r06: mapInPandas -> mapInArrow,
    # no pandas round-trip in the worker)
    assert "MapInArrow" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_mix_and_transcripts_plan_shapes(spark):
    """mix_corpora moves NO corpus rows (membership is a per-row hash
    predicate, repetition an explode — the only jobs are the bounded
    per-source mass aggregates); transcripts_to_documents moves the
    corpus exactly once (the conv_id groupBy), rendering inside builtin
    aggregation — no UDF, no Window."""
    from polardbx_tools_spark.operators import mixing, transcripts

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)
    mixed = mixing.mix_corpora({"a": a, "b": b}, {"a": 0.5, "b": 0.5})
    p = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    assert "EvalPython" not in p and "MapInPandas" not in p, p

    frame = d.selectExpr(
        "CAST(doc_id / 4 AS LONG) AS conv_id",
        "doc_id % 4 AS turn_idx",
        "'user' AS role",
        "text",
        "CAST(NULL AS STRING) AS tool",
    )
    rendered = transcripts.transcripts_to_documents(frame)
    p2 = rendered._jdf.queryExecution().executedPlan().toString()
    assert p2.count("Exchange") == 1, p2
    assert "Window" not in p2 and "EvalPython" not in p2, p2


def test_c4_clean_planted_rules(spark):
    """Planted docs exercising every C4 rule: line filter (terminal
    punctuation, >=3 words, javascript boilerplate), page filter (curly
    brace, lorem ipsum, minimum sentences), NULL safety."""
    good = "\n".join(f"This is proper sentence number {i}." for i in range(6))
    docs = spark.createDataFrame(
        [
            (1, good),                                     # keeps all, kept
            (2, good + "\nno terminal punct\nok?\nPlease enable "
                "JavaScript to view this."),               # bad lines drop
            (3, "Lorem ipsum dolor sit amet." + "\n" + good),  # page drop
            (4, "A config block { x: 1 } appears here.\n" + good),  # brace
            (5, "Too short a page."),                      # < 5 sentences
            (6, None),                                     # NULL safe
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.c4_clean(docs).collect()}
    assert got[1]["keep"] == 1 and got[1]["n_lines_kept"] == 6
    # doc 2: the three junk lines vanish, the good ones survive → kept
    assert got[2]["keep"] == 1
    assert got[2]["n_lines_in"] == 9 and got[2]["n_lines_kept"] == 6
    assert "JavaScript" not in got[2]["clean_text"]
    assert "no terminal punct" not in got[2]["clean_text"]
    assert "ok?" not in got[2]["clean_text"]  # terminal punct but < 3 words
    assert got[3]["keep"] == 0 and got[4]["keep"] == 0
    assert got[5]["keep"] == 0  # one sentence < 5
    assert got[6]["clean_text"] is None and got[6]["keep"] == 0


def test_chunk_documents_windows(spark):
    """Overlapping chunking: full coverage, correct overlap, ragged
    tail never empty and never duplicated, short docs yield one chunk,
    empty/NULL docs yield none — checked against a python reference."""
    from polardbx_tools_spark.operators import packing

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # even fit
            (2, " ".join(f"u{i}" for i in range(9))),    # ragged tail
            (3, "a b c"),                                # shorter than window
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = packing.chunk_documents(docs, window=4, stride=2) \
        .orderBy("doc_id", "chunk_idx").collect()

    def ref(words, w, s):
        n = len(words)
        if n == 0:
            return []
        m = 1 if n <= w else -((-(n - w)) // s) + 1
        return [words[i * s: i * s + w] for i in range(m)]

    exp = []
    for did, txt in [(1, [f"t{i}" for i in range(10)]),
                     (2, [f"u{i}" for i in range(9)]),
                     (3, ["a", "b", "c"])]:
        for ci, ch in enumerate(ref(txt, 4, 2)):
            exp.append((did, ci, " ".join(ch), len(ch)))
    assert [(r["doc_id"], r["chunk_idx"], r["chunk_text"],
             r["n_chunk_tokens"]) for r in got] == exp
    # non-overlapping default stride: chunks partition the doc exactly
    nl = packing.chunk_documents(docs, window=4).filter("doc_id = 2") \
        .orderBy("chunk_idx").collect()
    assert [r["chunk_text"] for r in nl] == [
        " ".join(f"u{i}" for i in range(4)),
        " ".join(f"u{i}" for i in range(4, 8)),
        "u8",
    ]
    # expression-only plan: no shuffle, no python
    plan = packing.chunk_documents(docs, 4, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan, plan


def test_materialize_sequences_roundtrip(spark):
    """Physical packing: every materialized sequence is exactly budget
    tokens, and re-concatenating all sequences (tail kept) in order
    reproduces the id-ordered concatenation of the corpus token stream
    — boundary docs are sliced, never duplicated or dropped."""
    from polardbx_tools_spark.operators import packing

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").limit(120)
    budget = 100  # small: forces many boundary docs
    seqs = packing.materialize_sequences(
        d, budget, num_partitions=7, keep_ragged_tail=True
    ).orderBy("seq_idx").collect()

    full = [r["seq_idx"] for r in seqs if r["n_tokens"] == budget]
    assert len(full) >= 10
    # sequence indexes are contiguous from 0; only the last is ragged
    assert [r["seq_idx"] for r in seqs] == list(range(len(seqs)))
    assert all(r["n_tokens"] == budget for r in seqs[:-1])

    stream = " ".join(r["seq_text"] for r in seqs).split()
    pdf = d.toPandas().sort_values("doc_id")
    exp = [t for txt in pdf["text"] if isinstance(txt, str)
           for t in txt.split()]
    assert stream == exp

    # default drops the ragged tail
    full_only = packing.materialize_sequences(
        d, budget, num_partitions=7
    )
    expected = (len(seqs) - 1 if seqs[-1]["n_tokens"] < budget
                else len(seqs))
    assert full_only.count() == expected


def test_transcripts_to_documents_rendering(spark):
    """Lake-state transcripts become deterministic training documents:
    turns render in turn_idx order regardless of row order, tool turns
    show the tool name, NULL text keeps its turn, pre-evolution frames
    (no tool column) work, and the output feeds pack_sequences."""
    from polardbx_tools_spark.operators import packing, transcripts

    rows = [
        ("c1", 2, "assistant", "the answer is 4", None),
        ("c1", 1, "user", "what is 2+2?", None),
        ("c1", 3, "tool", "calc(2+2)=4", "calculator"),
        ("c2", 1, "user", None, None),
        ("c2", 2, "assistant", "hello", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string")
    got = {r["conv_id"]: r
           for r in transcripts.transcripts_to_documents(df).collect()}
    assert got["c1"]["text"] == (
        "user: what is 2+2?\n"
        "assistant: the answer is 4\n"
        "tool(calculator): calc(2+2)=4"
    )
    assert (got["c1"]["n_turns"], got["c1"]["n_assistant_turns"],
            got["c1"]["n_tool_turns"]) == (3, 1, 1)
    assert got["c2"]["text"] == "user: \nassistant: hello"

    # pre-evolution frame: no tool column
    pre = df.drop("tool")
    got2 = {r["conv_id"]: r
            for r in transcripts.transcripts_to_documents(pre).collect()}
    assert got2["c1"]["text"].endswith("tool: calc(2+2)=4")
    assert got2["c1"]["n_tool_turns"] == 0

    # corpus stats: hand-checked
    st = transcripts.conversation_stats(df).collect()[0]
    # tokens: c1 = 3 + 4 + 1, c2 = NULL + 1 → 9; assistant = 4 + 1 = 5
    assert (st["n_conversations"], st["n_turns"], st["n_tokens"]) == (2, 5, 9)
    assert st["avg_turns_per_conv"] == 2.5
    assert st["assistant_token_share"] == round(5 / 9, 6)

    # composes with packing: documents in, placement out, exact cover
    docs = transcripts.transcripts_to_documents(df) \
        .withColumnRenamed("conv_id", "doc_id")
    p = packing.pack_sequences(docs, 8, id_col="doc_id").collect()
    assert sum(r["n_tokens"] for r in p) == \
        sum(len(x["text"].split()) for x in docs.collect())


def test_lake_to_corpus_bridge_end_to_end(spark, tmp_table_path):
    """The tier's defining loop: a changelog (I/U/D, duplicates,
    out-of-order) is CDC-applied into the lake, the final turn state is
    rendered to one training document per conversation, and the
    rendered text byte-matches a python re-render of the same final
    state — then the documents flow into packing placement (exact token
    cover)."""
    from polardbx_tools_spark.changelog.generator import (
        ChangelogSpec, generate_changelog,
    )
    from polardbx_tools_spark.operators import packing, transcripts
    from polardbx_tools_spark.pipeline import CdcPipeline

    cl = generate_changelog(
        spark, ChangelogSpec(n_events=1200, n_convs=50, seed=91)
    )
    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=4)
    pipe.run(cl, batch_lsns=400, with_tool=True)
    state = pipe.read_transcripts()

    docs = transcripts.transcripts_to_documents(state)
    got = {r["conv_id"]: r["text"] for r in docs.collect()}

    # python re-render of the identical final state
    rows = state.select("conv_id", "turn_idx", "role", "text", "tool") \
        .collect()
    want: dict = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        head = f"{r['role']}({r['tool']})" if r["tool"] is not None \
            else (r["role"] or "unknown")
        want.setdefault(r["conv_id"], []).append(
            f"{head}: {r['text'] if r['text'] is not None else ''}"
        )
    assert got == {c: "\n".join(v) for c, v in want.items()}

    # the rendered corpus packs with an exact token cover
    placed = packing.pack_sequences(
        docs.withColumnRenamed("conv_id", "doc_id"), 64
    )
    assert placed.agg(F.sum("n_tokens")).collect()[0][0] == sum(
        len(t.split()) for t in got.values()
    )


def test_sequence_manifest_tiles_and_masks(spark):
    """The loader sidecar: each sequence's manifest rows tile
    [0, budget) exactly; each doc's pieces tile [0, n_doc_tokens); and
    cross-checking against the materialized text, the manifest's
    (seq_offset, doc_offset, n) really addresses the same tokens in
    both — i.e. a loss mask built from it lands on the right spans."""
    from collections import defaultdict

    from polardbx_tools_spark.operators import packing

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").limit(60)
    budget = 90
    man = packing.sequence_manifest(d, budget, num_partitions=5).collect()
    seqs = {r["seq_idx"]: r["seq_text"] for r in
            packing.materialize_sequences(
                d, budget, num_partitions=5, keep_ragged_tail=True
            ).collect()}
    docs = {r["doc_id"]: (r["text"] or "").split() for r in d.collect()}

    by_seq, by_doc = defaultdict(list), defaultdict(list)
    for r in man:
        by_seq[r["seq_idx"]].append(r)
        by_doc[r["doc_id"]].append(r)
    last = max(by_seq)
    for s, rows in by_seq.items():
        rows.sort(key=lambda r: r["seq_offset"])
        pos = 0
        for r in rows:
            assert r["seq_offset"] == pos
            pos += r["n_tokens"]
        assert pos == budget or (s == last and 0 < pos <= budget)
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["doc_offset"])
        pos = 0
        for r in rows:
            assert r["doc_offset"] == pos
            pos += r["n_tokens"]
        assert pos == len(docs[did])
    # address the same tokens on both sides
    for r in man:
        st = seqs[r["seq_idx"]].split()
        a = st[r["seq_offset"]: r["seq_offset"] + r["n_tokens"]]
        b = docs[r["doc_id"]][r["doc_offset"]: r["doc_offset"] + r["n_tokens"]]
        assert a == b


def test_packing_derivations_reuse_placement(spark, tmp_path):
    """manifest/sequences derived from a REUSED placement (the parquet
    a job just wrote, via placement=) are identical to recomputing the
    prefix sum from scratch — the run_packing CLI relies on this to pay
    ONE pass for all three outputs."""
    from polardbx_tools_spark.operators import packing

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").limit(60)
    budget = 90
    pq = str(tmp_path / "placement")
    packing.pack_sequences(d, budget).write.parquet(pq)
    on_disk = spark.read.parquet(pq)

    fresh_m = sorted(map(tuple, packing.sequence_manifest(d, budget).collect()))
    reused_m = sorted(map(tuple, packing.sequence_manifest(
        d, budget, placement=on_disk).collect()))
    assert fresh_m == reused_m

    fresh_s = sorted(map(tuple, packing.materialize_sequences(
        d, budget, keep_ragged_tail=True).collect()))
    reused_s = sorted(map(tuple, packing.materialize_sequences(
        d, budget, keep_ragged_tail=True, placement=on_disk).collect()))
    assert fresh_s == reused_s


def test_mixture_weight_policies():
    """Published mixture policies, hand-checked: temperature weights
    (mT5) interpolate natural→uniform as tau drops; UniMax water-fills
    uniformly under the epoch cap, capping only sources that cannot
    absorb the uniform share."""
    from polardbx_tools_spark.operators import mixing

    masses = {"a": 100.0, "b": 1000.0, "c": 1000.0}
    nat = mixing.temperature_weights(masses, tau=1.0)
    assert abs(nat["a"] - 100 / 2100) < 1e-12
    uni = mixing.temperature_weights(masses, tau=0.0)
    assert all(abs(w - 1 / 3) < 1e-12 for w in uni.values())
    mid = mixing.temperature_weights(masses, tau=0.3)
    assert nat["a"] < mid["a"] < uni["a"]  # small source monotonically up
    assert abs(sum(mid.values()) - 1) < 1e-12

    # UniMax hand case: caps {a:200,b:2000,c:2000}, budget 1500 ->
    # uniform share 500 caps a at 200; residual 1300 splits 650/650
    w = mixing.unimax_weights(masses, budget_tokens=1500, max_epochs=2)
    assert abs(w["a"] - 200 / 1500) < 1e-12
    assert abs(w["b"] - 650 / 1500) < 1e-12 and abs(w["c"] - 650 / 1500) < 1e-12
    assert abs(sum(w.values()) - 1) < 1e-12
    # epoch cap respected: allocation/T_s <= max_epochs for every source
    for s, ws in w.items():
        assert ws * 1500 / masses[s] <= 2 + 1e-9
    # plenty of budget headroom -> pure uniform
    w2 = mixing.unimax_weights(masses, budget_tokens=300, max_epochs=4)
    assert all(abs(ws - 1 / 3) < 1e-12 for ws in w2.values())
    import pytest as _pt

    with _pt.raises(ValueError):
        mixing.unimax_weights(masses, budget_tokens=10**9, max_epochs=1)


def test_mix_corpora_weights_and_epochs(spark):
    """Weighted mixture: achieved token shares track the requested
    weights; a small high-weight source oversamples with epoch counts;
    membership is deterministic under the seed; target_tokens caps the
    mixture."""
    from polardbx_tools_spark.operators import mixing

    big = spark.range(2000).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 10), i -> concat('b', id, '_', i))) AS text",
    )  # 20,000 tokens
    small = spark.range(100).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 10), i -> concat('s', id, '_', i))) AS text",
    )  # 1,000 tokens
    mixed = mixing.mix_corpora(
        {"web": big, "books": small}, {"web": 0.5, "books": 0.5}, seed=7
    )
    st = {r["source"]: r for r in mixing.mixture_stats(mixed).collect()}
    # faithful mixture: M = min(20000/0.5, 1000/0.5) = 2000 tokens
    assert st["books"]["n_tokens"] == 1000      # p = 1.0 exactly: all kept
    assert st["books"]["max_epoch"] == 0
    assert abs(st["web"]["n_tokens"] - 1000) < 300   # p = 0.05 sampled
    assert 0.3 < st["web"]["token_share"] < 0.7

    # oversampling: books weighted 4x its fair share of the pair
    over = mixing.mix_corpora(
        {"web": big, "books": small}, {"web": 0.2, "books": 0.8},
        target_tokens=4000, seed=7,
    )
    st2 = {r["source"]: r for r in mixing.mixture_stats(over).collect()}
    # books needs 3200 of its 1000 tokens → 3 full epochs + 0.2 sampled
    assert st2["books"]["max_epoch"] >= 3
    assert abs(st2["books"]["n_tokens"] - 3200) < 400
    assert abs(st2["web"]["n_tokens"] - 800) < 300

    # determinism: identical membership under the same seed
    a = sorted((r["source"], r["doc_id"], r["epoch"])
               for r in mixed.collect())
    b = sorted((r["source"], r["doc_id"], r["epoch"])
               for r in mixing.mix_corpora(
                   {"web": big, "books": small},
                   {"web": 0.5, "books": 0.5}, seed=7).collect())
    assert a == b
    # different seed shifts the sampled web subset
    c = sorted((r["source"], r["doc_id"], r["epoch"])
               for r in mixing.mix_corpora(
                   {"web": big, "books": small},
                   {"web": 0.5, "books": 0.5}, seed=8).collect())
    assert a != c


def test_mix_corpora_snaps_integer_epoch_ratios(spark):
    """An epoch ratio that is an integer BY CONSTRUCTION (target =
    2*T_a + 3*T_b with proportional float weights) must give exactly
    2 and 3 epochs per doc — float rounding in the weight arithmetic
    (p = 1.9999999999999998) must not flip an epoch into near-total
    hash sampling. Pins the 1e-9 snap in mix_corpora."""
    from polardbx_tools_spark.operators import mixing

    a = spark.range(37).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 7), i -> concat('a', id, '_', i))) AS text",
    )  # 259 tokens
    b = spark.range(11).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 13), i -> concat('b', id, '_', i))) AS text",
    )  # 143 tokens
    ta, tb = 259, 143
    target = 2 * ta + 3 * tb
    mixed = mixing.mix_corpora(
        {"a": a, "b": b},
        {"a": 2 * ta / target, "b": 3 * tb / target},
        target_tokens=target,
    )
    per = {
        (r["source"], r["epoch"]): r["n"]
        for r in mixed.groupBy("source", "epoch").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert per == {
        ("a", 0): 37, ("a", 1): 37,
        ("b", 0): 11, ("b", 1): 11, ("b", 2): 11,
    }


def test_ann_null_vectors_degrade_per_row(spark):
    """Review-fix pins: NULL embeddings degrade per-row on every ANN
    path (np brute force, PQ fit+query, wide-mask LSH pairs) instead of
    crashing a driver collect or an Arrow batch, and an all-NULL query
    set returns an empty correctly-typed result with zero jobs."""
    import math

    vecs = [
        (i, [math.sin(i * 0.7 + j) for j in range(16)]) for i in range(60)
    ]
    df = spark.createDataFrame(
        vecs + [(1000, None)], "vec_id long, embedding array<float>"
    )
    q = df.filter("vec_id < 3 or vec_id = 1000")
    got = similarity.brute_force_topk_np(df, q, k=3).collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    assert all(r["neighbor_id"] != 1000 for r in got)

    empty = similarity.brute_force_topk_np(df, df.filter("vec_id = 1000"), k=3)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields[:2]] == [
        "query_id", "neighbor_id",
    ]

    pq = similarity.pq_topk(
        df, q, dim=16, k=3, m=4, ks=8, sample_rows=64
    ).collect()
    assert {r["query_id"] for r in pq} == {0, 1, 2}
    pq_empty = similarity.pq_topk(
        df, df.filter("vec_id = 1000"), dim=16, k=3, m=4, ks=8, sample_rows=64
    )
    assert pq_empty.count() == 0


def test_wide_mask_lsh_pairs_drop_null_vectors(spark):
    """n_planes*n_tables > 62 takes the exploded-bucket fallback (no
    single int64 mask); a NULL embedding there must degrade per-row —
    the former NULL mask/bucket rows crashed the bucket-local np.stack
    scorer (ADVICE round-5 medium)."""
    base = [1.0] + [0.0] * 15
    near = [1.0, 0.01] + [0.0] * 14
    rows = [(1, base), (2, near), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = similarity.cosine_near_dup_pairs(
        df, dim=16, threshold=0.9, n_planes=8, n_tables=8
    ).collect()
    got = {(r[0], r[1]) for r in pairs}
    assert (1, 2) in got or (2, 1) in got
    assert all(3 not in p for p in got)


def test_multimodal_image_near_dup_composition(spark):
    """End-to-end multimodal dedup: decode image payloads to feature
    vectors (extract_features) and find planted near-duplicate images
    with the embedding near-dup operator — the composition a media
    curation pipeline runs. A JPEG re-encode of the same picture must
    pair with its PNG original; an unrelated picture must not."""
    import numpy as np

    from polardbx_tools_spark.operators import codecs
    from polardbx_tools_spark.operators.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:16, 0:16]
    pic = np.stack([(xx * 9) % 256, (yy * 13) % 256,
                    ((xx + yy) * 5) % 256], -1).astype(np.uint8)
    other = np.stack([255 - (xx * 3) % 256, (yy * 2) % 256,
                      (xx * yy) % 256], -1).astype(np.uint8)
    rows = [
        (1, "image", "image/png", 16, 16, 0, bytearray(codecs.encode_png(pic))),
        (2, "image", "image/jpeg", 16, 16, 0, bytearray(encode_jpeg(pic, 95))),
        (3, "image", "image/png", 16, 16, 0, bytearray(codecs.encode_png(other))),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(media, feature_dim=8).select(
        F.col("media_id").alias("vec_id"),
        F.col("feat").alias("embedding"),
    )
    pairs = similarity.cosine_near_dup_pairs(
        feats, dim=8, threshold=0.9999, n_planes=4, n_tables=8
    ).collect()
    got = {tuple(sorted((r[0], r[1]))) for r in pairs}
    assert (1, 2) in got, got  # same picture across containers
    assert all(3 not in p for p in got), got
