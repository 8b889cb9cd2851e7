"""Similarity-search + multimodal query catalog (embeddings/documents).

- q25: exact brute-force cosine top-k (oracle: DuckDB
  list_cosine_similarity over the same float64 arrays; both engines
  round sim to 9 digits before ranking so accumulation-order noise in
  the last float bits cannot flip ranks).
- q52: bucketed embedding near-dup (the exact all-pairs form is a
  test-only oracle, not a catalog query — see the note above q52).
- q27: SRP-LSH approximate top-k — probabilistic, rows-only check;
  recall vs q25 asserted in tests/test_similarity.py.
- q28/q29: multimodal binary-column plumbing (Arrow-batched
  mapInPandas decode / frame-sampling stubs with deterministic fake
  codecs — oracle-checkable because the fakes are pure functions of
  the bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_spark.catalog import table
from sales_data_pipeline_spark.operators.similarity import group_centroids
from sales_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    sample_frames,
)
from sales_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_lsh,
    hard_negative_topk,
    ivf_topk,
)
from sales_data_pipeline_spark.plans.registry import query

_N_QUERIES = 5  # query set = vec_id < 5
_K = 10


@query(
    "q25_ann_cosine_topk",
    headline=True,
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, round(list_cosine_similarity(qv, cv), 9) AS sim
      FROM q CROSS JOIN c
      WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank"
    FROM scored QUALIFY "rank" <= {_K}
    """,
)
def q25_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors — the ANN baseline.
    Query set broadcast, corpus streamed, similarity fully JVM-side
    (zip_with/aggregate in float64, element order fixed → bit-stable)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(emb, queries, k=_K)


# q26_embedding_neardup (exact all-pairs cosine) is deliberately NOT a
# registered catalog query: it is a true cartesian product, and at 100×
# scale any run of it dies on N². The exact form survives as the pytest
# EXACTNESS ORACLE for q52 (operators/similarity.py
# embedding_neardup_pairs, consumed by tests/test_similarity.py::
# test_neardup_lsh_precision_and_recall_vs_exact); the catalog's answer
# is q52_embedding_neardup_lsh below — bucketed, candidate-only verify.


@query("q52_embedding_neardup_lsh")  # probabilistic recall: rows-only check
def q52_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE path for embedding near-dup: SRP-LSH bucket collisions →
    exact cosine verify of candidates only (never N²). Precision is 1.0
    by construction (every emitted pair is exact-verified ≥ t); recall
    is probabilistic (1-(1-(1-θ/π)^bits)^tables) so there is no SQL
    oracle — covering checks: tests/test_similarity.py::
    test_neardup_lsh_precision_and_recall_vs_exact (subset of exact
    q26 pairs + recall ≥ 0.85) and ::test_neardup_lsh_planted_high_sim_recall
    (recall 1.0 on planted cos≈0.999 near-dups, production parameters). This corpus's pairs top out at cos≈0.51, so the query
    runs the moderate-similarity configuration (n_bits=4, n_tables=16);
    real near-dup corpora (cos ≥ 0.85) use the operator defaults where
    bucketing is genuinely sub-quadratic (see operator docstring)."""
    emb = table(spark, sf_dir, "embeddings")
    return embedding_neardup_lsh(emb, threshold=0.4, n_tables=16, n_bits=4)


_N_ANCHORS = 8  # hard-negative anchor batch = vec_id < 8
_HN_K = 5
_HN_MAX_SIM = 0.45  # semi-hard ceiling (corpus cross-label sims top out ~0.51)


@query(
    "q292_hard_negative_mining",
    oracle=f"""
    WITH a AS (SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS qv, label AS al
               FROM embeddings WHERE vec_id < {_N_ANCHORS}),
    c AS (SELECT vec_id AS neg_id, embedding::DOUBLE[] AS cv, label AS nl
          FROM embeddings),
    scored AS (
      SELECT anchor_id, neg_id,
             round(list_cosine_similarity(qv, cv), 9) AS sim
      FROM a JOIN c ON al <> nl
    )
    SELECT anchor_id, neg_id, sim,
           CAST(row_number() OVER (PARTITION BY anchor_id
                                   ORDER BY sim DESC, neg_id) AS BIGINT) AS "rank"
    FROM scored WHERE sim < {_HN_MAX_SIM} QUALIFY "rank" <= {_HN_K}
    """,
)
def q292_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard negatives for an 8-anchor batch: per anchor the
    5 most-similar OTHER-label vectors below the semi-hard ceiling
    (sim < 0.45 — candidates above it are treated as probable
    mislabeled near-duplicates, the false-negative guard every
    contrastive pipeline applies before mining). Anchors broadcast,
    one corpus scan, and the per-anchor top-k is the two-phase salted
    rank (k per (anchor, salt) bucket, then re-rank ≤ k·32 survivors)
    so no reducer sorts a corpus-sized anchor group
    (operators/similarity.py hard_negative_topk)."""
    emb = table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _N_ANCHORS)
    return hard_negative_topk(
        emb, anchors, k=_HN_K, max_sim=_HN_MAX_SIM, n_salt=32
    )


@query("q27_ann_ivf")  # probabilistic cell probing: rows-only check
def q27_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: 16 coarse k-means cells (trained on a
    driver-side sample, deterministic init), queries probe their 4
    nearest cells, exact cosine re-rank of candidates. The scale path
    for moderate-similarity top-k where SRP-LSH collision probability
    collapses. No SQL oracle — cell recall is data-dependent; the
    covering check is tests/test_similarity.py::
    test_ivf_recall_vs_bruteforce (recall ≥ 0.7 vs exact q25 at
    n_probe=4 on this corpus)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(emb, queries, k=_K, n_cells=16, n_probe=4)


@query(
    "q28_multimodal_decode",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS checksum,
           CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS fake_width,
           CAST(64 + (octet_length(encode(text)) * 7) % 577 AS INTEGER) AS fake_height
    FROM documents
    """,
)
def q28_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing: payload = utf-8 bytes standing in
    for media, decoded via Arrow-batched mapInPandas (deterministic fake
    codec → SQL-checkable: the oracle recomputes the same pure function
    of the bytes)."""
    docs = table(spark, sf_dir, "documents")
    return decode_media(attach_binary_payload(docs, "doc_id"), codec="fake")


@query(
    "q29_frame_sample_stats",
    oracle="""
    SELECT doc_id AS media_id,
           (CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) + 1) // 2
             AS n_frames,
           CAST(least(octet_length(encode(text)), 256) AS BIGINT) AS first_frame_len
    FROM documents
    """,
)
def q29_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (1 payload → N frame rows via mapInPandas,
    every 2nd 256-byte chunk) aggregated back to per-media stats the
    oracle can recompute arithmetically."""
    docs = table(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary_payload(docs, "doc_id"), frame_size=256, stride=2)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max(
            F.when(F.col("frame_no") == 0, F.octet_length("frame_bytes"))
        ).cast("bigint").alias("first_frame_len"),
    )


@query(
    "q64_label_centroids",
    oracle="""
    WITH e AS (
      SELECT label, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) - 1 AS pos
      FROM embeddings
    )
    SELECT label, CAST(pos AS INTEGER) AS pos,
      CAST(count(*) AS BIGINT) AS n_vecs,
      round(avg(CAST(val AS DOUBLE)), 6) AS c
    FROM e GROUP BY label, pos
    """,
)
def q64_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled centroid per label (cluster labeling / per-source
    embedding-drift monitoring / IVF seeding), emitted long-form
    (label, pos, n_vecs, c) so the oracle compares scalars. The corpus
    is scanned once map-only; the shuffle carries (label, pos, partial
    sum/count) — dim × |labels| rows, independent of corpus size
    (operators/similarity.py group_centroids)."""
    emb = table(spark, sf_dir, "embeddings")
    cents = group_centroids(emb, group_col="label")
    return cents.select(
        "label", "n_vecs", F.posexplode("centroid").alias("pos", "c")
    ).select("label", "pos", "n_vecs", "c")


@query("q85_kmeans_clusters", oracle=None)
def q85_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means over the full embeddings table
    (operators/similarity.py kmeans_clusters): per iteration one
    broadcast-centroid assignment map + one (cell, dim)-keyed shuffle
    of partial sums; only the k×dim centroid matrix ever reaches the
    driver. oracle=None: an iterative fixpoint is not expressible as a
    single SQL statement — covering check is
    tests/test_similarity.py::test_kmeans_matches_numpy_reference,
    which asserts EXACT label equality vs a same-init same-iteration
    numpy Lloyd's at sf0.001/sf0.01, plus the rows+schema driver check
    here (deterministic: id-ordered init, tie→lowest cell, sims
    rounded to 9 digits)."""
    from sales_data_pipeline_spark.operators.similarity import kmeans_clusters

    emb = table(spark, sf_dir, "embeddings")
    out = kmeans_clusters(emb, k=8, iters=3)
    return out.select(
        "vec_id", F.col("cluster").cast("int").alias("cluster"),
        F.round("sim", 6).alias("sim"),
    )


@query("q86_semantic_dedup", oracle=None)
def q86_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (cluster, then drop vectors with a
    lower-id in-cluster neighbor at cosine ≥ 0.45 — threshold chosen
    for this synthetic corpus whose near-dup band sits at ~0.4-0.51,
    q26). The pairwise compare is confined within k-means clusters,
    which is the whole scale story: sum(|cluster|²) « N², with k grown
    ~N/20k at corpus scale. oracle=None: depends on the iterative
    clustering; covered by tests/test_similarity.py (planted exact
    duplicates must collapse; every dropped id must have a lower-id
    neighbor at ≥ threshold verified by exact brute force)."""
    from sales_data_pipeline_spark.operators.similarity import semantic_dedup

    emb = table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, k=8, iters=3, threshold=0.45)  # unordered


@query(
    "q88_embedding_norm_profile",
    oracle="""
    WITH n AS (
      SELECT label,
        round(sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 9) AS nrm
      FROM embeddings
    )
    SELECT label,
      CAST(count(*) AS BIGINT) AS n_vecs,
      round(avg(nrm), 6) AS mean_norm,
      round(min(nrm), 6) AS min_norm,
      round(max(nrm), 6) AS max_norm,
      CAST(sum(CASE WHEN abs(nrm - 1.0) < 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_unit
    FROM n GROUP BY label
    """,
)
def q88_embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding L2-norm profile — the sanity scan every
    vector pipeline runs before cosine math (un-normalized or
    zero vectors poison similarity search silently). Norm is a pure
    codegen fold over the array in element order (functions/vectors.py
    l2_norm), rounded to 9 before aggregating so engine accumulation
    order can't leak into min/max; one keyed shuffle on label."""
    from sales_data_pipeline_spark.functions.vectors import as_double_array, l2_norm

    emb = table(spark, sf_dir, "embeddings")
    n = emb.select(
        "label",
        F.round(l2_norm(as_double_array("embedding")), 9).alias("nrm"),
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(F.avg("nrm"), 6).alias("mean_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.sum(F.when(F.abs(F.col("nrm") - 1.0) < 1e-6, 1).otherwise(0))
        .cast("bigint")
        .alias("n_unit"),
    )


@query(
    "q91_audio_decode",
    oracle="""
    WITH s AS (
      SELECT doc_id, i,
             ((doc_id * 7919 + i * 31) % 65536) - 32768 AS v
      FROM documents, unnest(range(0, 100 + doc_id % 50)) AS u(i)
    ),
    p AS (
      SELECT doc_id, i, v,
             lead(v) OVER (PARTITION BY doc_id ORDER BY i) AS nv
      FROM s
    )
    SELECT doc_id AS media_id,
      CAST(1 AS INTEGER) AS n_channels,
      CAST(8000 AS INTEGER) AS sample_rate,
      CAST(16 AS INTEGER) AS bits,
      CAST(count(*) AS BIGINT) AS n_samples,
      round(count(*) / 8000.0, 6) AS duration_s,
      round(sqrt(sum(v * v) / CAST(count(*) AS DOUBLE)), 6) AS rms,
      round(sum(CASE WHEN v * nv < 0 THEN 1 ELSE 0 END)
            / CAST(count(*) - 1 AS DOUBLE), 6) AS zcr,
      CAST(max(abs(v)) AS INTEGER) AS peak
    FROM p GROUP BY doc_id
    """,
)
def q91_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, oracle-checked end to end: deterministic PCM16
    WAV files are synthesized per doc (operators/multimodal.py
    synth_wav_payloads — sample i = ((id·7919+i·31) mod 65536) − 32768),
    then decoded by the real RIFF parser (decode_wav) into duration /
    RMS / zero-crossing / peak features. The oracle recomputes the same
    features straight from the generating arithmetic, so a parser bug
    anywhere (chunk walk, fmt validation, LE int16 raster) breaks the
    hash — this is the audio analogue of the PPM image codec (q28),
    upgraded from numpy-ref-tested to oracle-checked. Both stages are
    Arrow-batched mapInPandas over pruned (id, payload) columns; at
    100 TB the synth stage is replaced by real payload scan, same
    plumbing."""
    from sales_data_pipeline_spark.operators.multimodal import (
        decode_wav,
        synth_wav_payloads,
    )

    docs = table(spark, sf_dir, "documents")
    wavs = synth_wav_payloads(docs, sample_rate=8000)
    decoded = decode_wav(wavs).drop("checksum")
    # round HERE (F.round = half-up, matching the oracle), not in the
    # decoder: Python's banker's round diverges at exact binary ties
    return decoded.select(
        "media_id", "n_channels", "sample_rate", "bits", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("zcr", 6).alias("zcr"),
        "peak",
    )


@query("q159_knn_graph")  # probabilistic recall: rows-only check
def q159_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate corpus-wide kNN graph (top-5 cosine neighbors per
    vector) via SRP buckets — no broadcast of the corpus, no N² pair
    enumeration; the structure SemDeDup-style semantic pruning and
    graph-ANN indexes start from. No SQL oracle (bucket recall is
    probabilistic); covering checks: tests/test_similarity.py::
    test_knn_graph_recall_vs_bruteforce (recall vs exact per-node
    top-k) and ::test_knn_graph_shape (every ranked row exact-cosine
    verified, ranks contiguous from 1). Moderate-similarity corpus →
    the few-bits/many-tables regime, same reasoning as q52."""
    from sales_data_pipeline_spark.operators.similarity import knn_graph

    emb = table(spark, sf_dir, "embeddings")
    return knn_graph(emb, k=5, n_tables=16, n_bits=4)


@query("q180_audio_spectral")  # FFT: no SQL engine can recompute — rows-only
def q180_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain audio features (dominant frequency, spectral
    centroid, 85% rolloff, total power) over the same deterministic
    synthesized WAV clips as q91 — the operator class where the
    Arrow-batched Pandas-UDF escape hatch is GENUINELY required: an
    FFT has no Spark expression form and no DuckDB oracle, so the
    covering check is exact equality against a local numpy reference
    on identical bytes (tests/test_similarity.py::
    test_audio_spectral_matches_numpy_reference). Plumbing identical
    to q91: synth → mapInPandas over pruned (id, payload)."""
    from sales_data_pipeline_spark.operators.multimodal import (
        audio_spectral_features,
        synth_wav_payloads,
    )

    docs = table(spark, sf_dir, "documents")
    return audio_spectral_features(synth_wav_payloads(docs.select("doc_id")))


@query("q194_embedding_standardize", oracle=None)
def q194_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization audit: standardize the
    embeddings table, then report per-label mean/min/max of the
    standardized L2 norm — the preprocessing every distance-based
    downstream op (q85 k-means, q74 quantized dedup, q27 IVF) assumes
    when dimensions are differently scaled. oracle=None: per-dim
    moments are double sums whose accumulation order is
    partition-dependent in the last bits (SQL would have the same
    caveat); the covering test asserts numpy-reference equality to
    1e-9 and exact column-mean≈0 / std≈1 invariants
    (tests/test_similarity.py). Outputs rounded to 6 so residual
    last-bit noise can't reach the result."""
    from sales_data_pipeline_spark.functions.vectors import (
        as_double_array,
        l2_norm,
    )
    from sales_data_pipeline_spark.operators.similarity import (
        standardize_embeddings,
    )

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "embedding", as_double_array("embedding")
    )
    std = standardize_embeddings(emb)
    return (
        std.select("label", F.round(l2_norm(F.col("embedding")), 9).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(F.avg("nrm"), 6).alias("mean_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


def ppm_text_payload(text_col: str = "text") -> "F.Column":
    """16×16 P6/PPM payload synthesized from a document's text: the
    pixel raster is the text's first 768 utf-8 bytes, cycled. Empty
    text falls back to a single space — rpad with an empty pad string
    returns "" (a valid header with a 0-byte raster), which would
    crash the decoder's frombuffer(count=768) for the whole stage
    instead of skipping the row. Exposed as a helper so the
    empty-text edge is covered directly (tests/test_multimodal_phash)."""
    txt = F.coalesce(F.nullif(F.col(text_col), F.lit("")), F.lit(" "))
    return F.concat(
        F.lit(b"P6\n16 16\n255\n"),
        F.encode(
            F.rpad(F.substring(txt, 1, 768), 768, F.substring(txt, 1, 64)),
            "UTF-8",
        ),
    )


@query("q200_image_neardup_ahash", oracle=None)
def q200_image_neardup_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection by perceptual hash: synthesize a REAL
    16×16 P6/PPM image per document (pixel raster = the doc's first
    768 utf-8 bytes, cycled — so near-dup TEXTS become near-identical
    IMAGES, giving the operator honest planted structure), aHash each
    through the real PPM codec, and emit Hamming-≤6 pairs via
    pigeonhole blocking — never an all-pairs compare
    (operators/multimodal.py image_ahash / ahash_near_pairs). This is
    the image-side member of the near-dup family (q22 Jaccard text,
    q23 MinHash, q24 SimHash, q52 embedding LSH). oracle=None: the
    64-bit packing + blocked join isn't one SQL statement; covering
    tests assert exact equality against a pure-python aHash reference,
    planted brightness-shifted near-dups found, and blocking ≡
    brute-force on the same corpus (tests/test_multimodal_phash.py).
    Deterministic end to end (integer luma/means/threshold)."""
    from sales_data_pipeline_spark.operators.multimodal import (
        ahash_near_pairs,
        image_ahash,
    )

    docs = table(spark, sf_dir, "documents")
    imgs = docs.select(
        F.col("doc_id").alias("media_id"),
        ppm_text_payload("text").alias("payload"),
    )
    hashes = image_ahash(imgs)
    return ahash_near_pairs(hashes, max_hamming=6)  # unordered pairs


@query(
    "q232_png_decode",
    oracle="""
    WITH k AS (
      SELECT doc_id, unnest(range(768)) AS k FROM documents
    ),
    px AS (
      SELECT doc_id, k, (doc_id * 31 + k * 7) % 256 AS v FROM k
    )
    SELECT doc_id AS media_id,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(256 AS BIGINT) AS n_pixels,
           CAST(SUM(CASE WHEN k % 3 = 0 THEN v END) AS DOUBLE) / 256.0 AS mean_r,
           CAST(SUM(CASE WHEN k % 3 = 1 THEN v END) AS DOUBLE) / 256.0 AS mean_g,
           CAST(SUM(CASE WHEN k % 3 = 2 THEN v END) AS DOUBLE) / 256.0 AS mean_b
    FROM px GROUP BY doc_id
    """,
)
def q232_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode, oracle-checked end to end: a
    deterministic 16×16 RGB raster is synthesized per doc (pixel byte
    k = (doc_id·31 + k·7) mod 256), zlib-compressed into a real PNG
    (operators/imagecodec.encode_png), then decoded back through the
    magic-byte dispatcher (decode_media codec='image' →
    imagecodec.decode_png: chunk walk, CRC verify, inflate, unfilter).
    PNG is lossless, so the oracle recomputes the per-channel means
    straight from the generating arithmetic — a bug anywhere in the
    codec (chunk framing, CRC, filter reconstruction, channel
    interleave) breaks the hash. Exactness: each channel mean is an
    exact ≤2¹⁶ integer sum divided by 256 (a power of two), so both
    engines produce the identical double with no rounding step. Both
    stages are Arrow-batched mapInPandas over pruned (id, payload)
    columns; at 100 TB the synth stage is replaced by the real payload
    scan, same plumbing (jpeg/png decode is CPU-bound map-only work —
    it scales with executors, no shuffle)."""
    from sales_data_pipeline_spark.operators.multimodal import (
        synth_image_payloads,
    )

    docs = table(spark, sf_dir, "documents")
    pngs = synth_image_payloads(docs, formats=("png",))
    return decode_media(pngs, codec="image").select(
        "media_id", "width", "height", "n_pixels", "mean_r", "mean_g", "mean_b"
    )


@query(
    "q233_cross_format_image_neardup",
    oracle="""
    SELECT doc_id, CAST(0 AS INTEGER) AS hamming FROM documents
    """,
)
def q233_cross_format_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-FORMAT image dedup: every doc's raster is encoded twice —
    raw P6/PPM (media_id = 2·doc) and compressed PNG (2·doc + 1) — and
    the perceptual-hash pipeline (image_ahash over the magic-byte
    dispatcher + pigeonhole-blocked ahash_near_pairs) must find each
    PPM↔PNG re-encode as a 0-distance pair even though the payload
    BYTES share nothing (zlib stream vs raw raster): byte-level dedup
    (q21/q90) is structurally blind to this duplicate class. PNG being
    lossless makes the claim exact — identical decoded raster ⟹
    identical 64-bit ahash ⟹ hamming 0 — so the oracle is simply one
    row per doc. Cross-doc collisions (different pictures that happen
    to share a hash) are filtered by the same-doc pairing convention;
    q234 is the JPEG (lossy) variant with a small hamming bound. Plan:
    map-only decode+hash, one equi-join on the 64-bit signature — no
    all-pairs compare."""
    from sales_data_pipeline_spark.operators.multimodal import (
        ahash_near_pairs,
        image_ahash,
        synth_image_payloads,
    )

    docs = table(spark, sf_dir, "documents")
    imgs = synth_image_payloads(docs, formats=("ppm", "png"))
    pairs = ahash_near_pairs(image_ahash(imgs), max_hamming=0)
    return pairs.filter(
        (F.col("media_a") % 2 == 0) & (F.col("media_b") == F.col("media_a") + 1)
    ).select(
        # integer division: bigint/int would be a DOUBLE (exact only
        # below 2^53) — `div` stays integer-exact at any scale (the
        # q228 discipline)
        F.expr("media_a div 2").alias("doc_id"),
        F.col("hamming").cast("int").alias("hamming"),
    )


@query(
    "q234_jpeg_cross_format_neardup",
    oracle="""
    SELECT doc_id FROM documents
    """,
)
def q234_jpeg_cross_format_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q233's LOSSY sibling: each doc's raster encoded as raw P6/PPM
    (media_id = 2·doc) and baseline JPEG quality-95 (2·doc + 1), run
    through the identical perceptual-hash pipeline with a small
    hamming budget (≤ 6) — the realistic duplicate class, since a
    user's images are JPEG before they are PNG and a JPEG re-encode is
    never byte- or raster-identical. The oracle is still EXACT (one
    row per doc) because the synthetic raster (doc_id·31 + k·7) mod
    256 depends on doc_id only through doc_id mod 256 — 256 distinct
    images total — and tests/test_imagecodec.py::
    test_jpeg_ahash_hamming_bound_exhaustive_residues checks every
    residue at quality 95 (observed worst hamming 3, bound 6 = 2×
    margin), so EVERY possible document at ANY scale factor pairs
    within budget. Hamming itself varies per residue and is not
    SQL-recomputable (it needs the DCT), so the output is doc_id only.
    Plan: map-only mapInPandas encode+decode+hash (CPU-bound,
    embarrassingly parallel), then ahash_near_pairs' pigeonhole
    blocking — band equi-joins on hash fragments, never all-pairs."""
    from sales_data_pipeline_spark.operators.multimodal import (
        ahash_near_pairs,
        image_ahash,
        synth_image_payloads,
    )

    docs = table(spark, sf_dir, "documents")
    imgs = synth_image_payloads(docs, formats=("ppm", "jpeg"))
    pairs = ahash_near_pairs(image_ahash(imgs), max_hamming=6)
    return pairs.filter(
        (F.col("media_a") % 2 == 0) & (F.col("media_b") == F.col("media_a") + 1)
    ).select(F.expr("media_a div 2").alias("doc_id"))


@query("q218_embedding_pca", oracle=None)
def q218_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA over the embeddings table, reported as per-label
    means of the top-2 principal coordinates plus the share of
    variance those axes explain — the standard first look at an
    embedding space (are labels separable along the leading axes?).

    The fit is the two-level Gram-matrix reduction
    (operators/similarity.py pca_fit): mapInPandas partials (one
    numpy XᵀX per Arrow batch), Spark-side positional sum so the
    driver holds exactly d+d² cells, eigh in O(d³) on the driver;
    the projection bakes μ and the two loading vectors in as array
    literals — map-side codegen, no shuffle beyond the final
    per-label aggregate. oracle=None: eigendecomposition isn't one
    SQL statement; covering tests assert spectrum equality vs
    numpy-on-collected-data, component orthonormality, and that
    per-component projected variance equals its eigenvalue
    (tests/test_similarity.py::test_pca_*). Outputs rounded to 4 —
    eigenvectors amplify the covariance's partition-sum noise more
    than plain aggregates do."""
    from sales_data_pipeline_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    emb = table(spark, sf_dir, "embeddings")
    fit = pca_fit(emb)
    total_var = sum(fit.eigvals)
    ratio2 = (fit.eigvals[0] + fit.eigvals[1]) / total_var if total_var else 0.0
    proj = pca_project(emb, fit, k=2)
    return (
        proj.select(
            "label",
            F.col("pca")[0].alias("pc1"),
            F.col("pca")[1].alias("pc2"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(F.avg("pc1"), 4).alias("mean_pc1"),
            F.round(F.avg("pc2"), 4).alias("mean_pc2"),
        )
        .withColumn("top2_var_ratio", F.round(F.lit(ratio2), 4))
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q264 — product-quantization fidelity profile (ANN compression tier)
# ---------------------------------------------------------------------------


@query("q264_pq_fidelity", oracle=None)  # iterative Lloyd training: not SQL-expressible
def q264_pq_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization fidelity profile over the embeddings table:
    train an m=4 × ksub=16 codebook (operators/similarity.
    pq_train_encode — distributed Lloyd per subspace, deterministic
    init/tie rules), encode every vector to 4 codes, and report per
    label: vector count, mean/max squared reconstruction error, and
    the distinct code-word count actually used — the table an ANN
    operator sweeps to pick the recall/compression point before
    building an IVF-PQ index (q27 is the IVF half; this is the PQ
    half). Compression here is dim·32 bits → m·log2(ksub) = 16 bits
    per vector. Rows-only driver check (training is iterative); the
    operator's determinism, numpy-Lloyd parity, planted-codebook
    exactness, and refusal guards are pinned in
    tests/test_r6_operators.py. Scale: per iteration one corpus scan
    + one (sub, code, pos) keyed shuffle; only the dim×ksub-double
    codebook touches the driver."""
    from sales_data_pipeline_spark.operators.similarity import pq_train_encode

    emb = table(spark, sf_dir, "embeddings")
    codes, _book = pq_train_encode(emb, m=4, ksub=16, iters=3)
    labeled = codes.join(emb.select("vec_id", "label"), "vec_id")
    return (
        labeled.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.avg("recon_err").alias("mean_sq_err"),
            F.max("recon_err").alias("max_sq_err"),
            F.countDistinct("codes").cast("bigint").alias("n_codewords"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q265 — PQ asymmetric-distance (ADC) top-k search quality audit
# ---------------------------------------------------------------------------


@query("q265_pq_adc_search", oracle=None)  # PQ training is iterative Lloyd
def q265_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scoring half of IVF-PQ (q264 trains/encodes; this searches):
    for a deterministic 8-query probe set (lowest vec_ids), build each
    query's m×ksub squared-L2 lookup table on the driver — the codebook
    is the ONLY thing that leaves the cluster — and rank the whole
    corpus by Σ_sub LUT[sub][code], m array lookups per vector in pure
    codegen over 16-BIT codes instead of 64-float embeddings. Reported
    per query: top-10 neighbor count (sanity = 10) and the label-match
    fraction of those neighbors — the recall proxy an ANN sweep reads
    next to q264's reconstruction-error profile. Rows-only driver check
    (training is iterative); ADC's bitwise numpy parity, lossless-
    codebook exactness (ADC ≡ exact L2 when reconstruction is exact)
    and tie determinism are pinned in tests/test_r6_operators.py.
    Scale: one scan of the codes table, BroadcastNestedLoopJoin against
    the |Q|-row LUT table, per-query top-k window on the (tiny) scored
    stream — the corpus's raw vectors are never rescanned; the exact
    rerank (cosine_topk) runs on the shortlist only."""
    from sales_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_train_encode,
    )

    emb = table(spark, sf_dir, "embeddings")
    codes, book = pq_train_encode(emb, m=4, ksub=16, iters=3)
    probes = emb.orderBy("vec_id").limit(8)
    hits = pq_adc_topk(codes, book, probes, k=10)
    lbl = emb.select("vec_id", "label")
    return (
        hits.join(
            F.broadcast(lbl.withColumnRenamed("vec_id", "query_id")).withColumnRenamed(
                "label", "q_label"
            ),
            "query_id",
        )
        .join(
            F.broadcast(
                lbl.withColumnRenamed("vec_id", "neighbor_id")
            ).withColumnRenamed("label", "n_label"),
            "neighbor_id",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
            F.round(
                F.avg((F.col("q_label") == F.col("n_label")).cast("double")), 4
            ).alias("label_match_frac"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q272 — standardization invariant audit (oracled sibling of q194)
# ---------------------------------------------------------------------------


@query(
    "q272_standardize_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MAX(len(embedding)) AS BIGINT) AS n_dims,
           TRUE AS means_zero, TRUE AS stds_one
    FROM embeddings
    """,
)
def q272_standardize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable invariant for q194's standardization: after
    per-dimension z-scoring, every dimension's recomputed mean is 0
    and population std is 1 (to 1e-7 — moment sums are double and the
    residual is orders below that at any SF). One row: vector/dim
    counts (the SQL-checkable side) plus the two booleans the oracle
    pins TRUE. A regression in the moment pass, the dim alignment, or
    the eps floor flips a boolean and fails the driver hash. Scale:
    the audit is the same single posexplode aggregation shape as the
    operator itself."""
    from sales_data_pipeline_spark.functions.vectors import as_double_array
    from sales_data_pipeline_spark.operators.similarity import (
        standardize_embeddings,
    )

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "embedding", as_double_array("embedding")
    )
    std = standardize_embeddings(emb)
    dim_stats = (
        std.select(F.posexplode("embedding").alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("val").alias("mu"),
            (F.sum(F.col("val") * F.col("val")) / F.count(F.lit(1))).alias("ms"),
        )
        .select(
            "n",
            F.abs("mu").alias("mu_err"),
            F.abs(F.sqrt(F.greatest(F.col("ms") - F.col("mu") * F.col("mu"), F.lit(0.0))) - 1).alias("sd_err"),
        )
    )
    return dim_stats.agg(
        F.first("n").cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.bool_and(F.col("mu_err") < 1e-7).alias("means_zero"),
        F.bool_and(F.col("sd_err") < 1e-7).alias("stds_one"),
    )


# ---------------------------------------------------------------------------
# q279 — JL projection norm-preservation audit (oracled sibling pattern)
# ---------------------------------------------------------------------------


@query(
    "q279_jl_projection_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(16 AS BIGINT) AS k,
           TRUE AS mean_norm_ratio_ok
    FROM embeddings
    """,
)
def q279_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable invariant for JL random projection (the cheap
    one-pass compression before ANN indexing; PCA q218 is the two-pass
    sibling): with unit-variance Gaussian rows, E[‖x·R/√k‖²] = ‖x‖²
    exactly, so the corpus-mean squared-norm ratio must sit near 1 —
    pinned to (0.8, 1.2), > 10σ of headroom at k=16 over this corpus,
    and deterministic anyway (R is seed-derived, the fold order is
    fixed). Bitwise numpy parity and the planted-neighbor property
    are pinned in tests/test_r6_operators.py. Scale: R is baked into
    ONE map-side transform — zero shuffles before the 1-row agg."""
    from sales_data_pipeline_spark.functions.vectors import as_double_array
    from sales_data_pipeline_spark.operators.similarity import jl_project

    emb = table(spark, sf_dir, "embeddings")
    x2 = F.aggregate(
        as_double_array("embedding"), F.lit(0.0), lambda a, v: a + v * v
    )
    norms = emb.select("vec_id", x2.alias("orig_sq"))
    p2 = F.aggregate(F.col("projected"), F.lit(0.0), lambda a, v: a + v * v)
    proj = jl_project(emb, k=16).select("vec_id", p2.alias("proj_sq"))
    joined = norms.join(proj, "vec_id").select(
        (F.col("proj_sq") / F.col("orig_sq")).alias("ratio")
    )
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.lit(16).cast("bigint").alias("k"),
        ((F.avg("ratio") > 0.8) & (F.avg("ratio") < 1.2)).alias(
            "mean_norm_ratio_ok"
        ),
    )


# ---------------------------------------------------------------------------
# q280 — density clustering census (grid-partitioned exact DBSCAN)
# ---------------------------------------------------------------------------


@query("q280_dbscan_census")  # CC fixpoint is iterative: rows-only check
def q280_dbscan_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-clustering census of the embedding space: project to 2
    dims (jl_project — one map-side pass) and run grid-partitioned
    EXACT DBSCAN (operators/dbscan.py: ε-cell blocking → adjacent-cell
    equi-joins, never all-pairs; cores by self-inclusive ε-counts;
    clusters = connected components over core↔core edges; border→min
    core cluster, noise −1). Report n_points / n_clusters / n_core /
    n_noise / largest cluster — the density profile a curation
    pipeline reads next to k-means' (q85) centroid view: DBSCAN finds
    the arbitrary-shape dense regions and names the outliers, which
    centroid methods cannot. Rows-only driver check (the CC fixpoint
    is iterative); exact parity vs an O(n²) reference DBSCAN with
    identical conventions is pinned across random layouts in
    tests/test_dbscan.py. Scale: map (cell) → 3^d-replicated equi-join
    → counts → pointer-jumping CC; every stage keys on cells or node
    ids, nothing is corpus² anywhere — and the density-saturation
    fence is DEFAULT-ON (r10): past ~1e8 cell-local candidates (mean
    ε-cell occupancy >> 1, the ×99.2/decade quadratic-in-density
    regime measured at sf10) the pair join dies in its first task
    naming the density-independent tiers, exactly like q22's
    max_candidates guard (guard-fires-through-this-registered-body
    test in tests/test_dbscan.py)."""
    from sales_data_pipeline_spark.operators.dbscan import dbscan
    from sales_data_pipeline_spark.operators.similarity import jl_project

    emb = table(spark, sf_dir, "embeddings")
    proj = jl_project(emb, k=2).withColumnRenamed("projected", "vec")
    out = dbscan(proj, eps=0.15, min_pts=4, dims=2)
    sizes = (
        out.filter(F.col("cluster") >= 0)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return out.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.count_distinct(
            F.when(F.col("cluster") >= 0, F.col("cluster"))
        ).cast("bigint").alias("n_clusters"),
        F.sum(F.col("is_core").cast("long")).cast("bigint").alias("n_core"),
        F.sum((F.col("cluster") < 0).cast("long")).cast("bigint").alias("n_noise"),
    ).crossJoin(
        F.broadcast(
            sizes.agg(
                F.coalesce(F.max("sz"), F.lit(0))
                .cast("bigint")
                .alias("largest_cluster")
            )
        )
    )


# ---------------------------------------------------------------------------
# q295 — dense-cell cluster census (served DBSCAN sibling past the fence)
# ---------------------------------------------------------------------------


@query(
    "q295_dense_cell_clusters",
    oracle="""
    WITH RECURSIVE cells AS (
      SELECT CAST(floor(embedding[1] / 0.05) AS BIGINT) AS cx,
             CAST(floor(embedding[2] / 0.05) AS BIGINT) AS cy,
             count(*) AS n
      FROM embeddings GROUP BY 1, 2
    ),
    dense AS (
      SELECT cx, cy, n, cx * 4294967296 + cy AS cell_id
      FROM cells WHERE n >= 4
    ),
    edges AS (
      SELECT a.cell_id AS u, b.cell_id AS v
      FROM dense a JOIN dense b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       AND a.cell_id <> b.cell_id
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u
    ),
    lab AS (
      SELECT least(d.cell_id, COALESCE(m.mv, d.cell_id)) AS cluster, d.n
      FROM dense d
      LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m
        ON m.u = d.cell_id
    ),
    per AS (
      SELECT cluster, count(*) AS ncells, sum(n) AS pts FROM lab GROUP BY 1
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_points,
      (SELECT CAST(count(*) AS BIGINT) FROM dense) AS n_dense_cells,
      CAST(count(*) AS BIGINT) AS n_cell_clusters,
      CAST(COALESCE(max(ncells), 0) AS BIGINT) AS largest_cluster_cells,
      CAST(COALESCE(max(pts), 0) AS BIGINT) AS largest_cluster_points,
      CAST(COALESCE(sum(pts), 0) AS BIGINT) AS clustered_points
    FROM per
    """,
)
def q295_dense_cell_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-cluster evidence that stays SERVEABLE past the DBSCAN
    candidate fence (round 11 — the q294 move applied to the ε
    family): a cell-granularity cluster census whose cost is LINEAR in
    points at ANY density. Exact DBSCAN's melt mode is the cell-local
    candidate join, quadratic in ε-cell occupancy — q280/q283 refuse
    the saturated sf10 corpus by design (~1.4×10⁹ candidates). This
    census never forms a point pair: points → ε-sided cells (one
    linear groupBy), cells with ≥ min_pts points are dense, clusters =
    connected components of the 8-neighbor dense-cell adjacency graph
    (8-offset equi-join, linear in dense cells; pointer-jumping CC).
    Saturation makes it CHEAPER — more points per cell means fewer
    cells — the exact complement of the fenced tier's failure mode.
    Coarsening guarantee: every DBSCAN core point lies in a dense
    cell, and any two points DBSCAN links at ε land in the same cell
    cluster (adjacent cells), so cell clusters over-merge within a
    2√2·ε halo but never split a true ε-linkage. Space: the raw
    leading embedding coordinates (the census question is
    space-agnostic, and raw coordinates are engine-portable where
    jl_project's xxhash sign matrix has no SQL twin) — so the DuckDB
    oracle reproduces the ENTIRE pipeline bitwise, recursive-CTE CC
    included (operators/dbscan.dense_cell_clusters; eps=0.05,
    min_pts=4)."""
    from sales_data_pipeline_spark.operators.dbscan import (
        dense_cell_clusters,
    )

    emb = table(spark, sf_dir, "embeddings")
    return dense_cell_clusters(
        emb, eps=0.05, min_pts=4, vec_col="embedding", dims=2
    )


# ---------------------------------------------------------------------------
# q281 — PQ Lloyd-descent audit (oracled sibling of q264)
# ---------------------------------------------------------------------------


@query(
    "q281_pq_descent_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS error_nonincreasing,
           TRUE AS codes_stay_in_range
    FROM embeddings
    """,
)
def q281_pq_descent_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable Lloyd theorem for the PQ trainer (q264): each
    full assign+update iteration cannot increase total quantization
    error (assignment minimizes per fixed codebook; the mean minimizes
    per fixed assignment), so err(iters=3) ≤ err(iters=1) + fp-noise.
    Also pins every emitted code into [0, ksub). The oracle carries
    the SQL-checkable count and both booleans TRUE — a regression in
    the tie rule, the empty-cell freeze, or the stats shuffle flips
    one. Deterministic: fixed init/tie rounding, exact integer counts;
    the 1e-6 tolerance covers double-sum association only. Cost: two
    trainings over the corpus — the audit tier, not the build tier."""
    from sales_data_pipeline_spark.operators.similarity import pq_train_encode

    emb = table(spark, sf_dir, "embeddings")
    c1, _ = pq_train_encode(emb, m=4, ksub=16, iters=1)
    c3, _ = pq_train_encode(emb, m=4, ksub=16, iters=3)
    e1 = c1.agg(F.sum("recon_err").alias("e")).collect()[0]["e"]
    agg3 = c3.agg(
        F.sum("recon_err").alias("e"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min(F.array_min("codes")).alias("cmin"),
        F.max(F.array_max("codes")).alias("cmax"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                int(agg3["n"]),
                bool(agg3["e"] <= e1 + 1e-6),
                bool(agg3["cmin"] >= 0 and agg3["cmax"] < 16),
            )
        ],
        "n_vectors bigint, error_nonincreasing boolean, codes_stay_in_range boolean",
    )


# ---------------------------------------------------------------------------
# q283 — DBSCAN structural-invariant audit (oracled sibling of q280)
# ---------------------------------------------------------------------------


@query(
    "q283_dbscan_invariant_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           TRUE AS every_core_clustered,
           TRUE AS noise_has_no_core_neighbor,
           TRUE AS labels_are_member_min
    FROM embeddings
    """,
)
def q283_dbscan_invariant_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable DBSCAN theorems (the envelope-audit pattern,
    sibling of q280's census): (1) every core point belongs to a
    cluster — a core is ε-reachable from itself, so cluster ≥ 0;
    (2) no noise row (cluster −1) has a core ε-neighbor — re-derived
    INDEPENDENTLY of the operator's border stage by grid-joining the
    noise set against the core set (eps_pairs) and requiring zero hits:
    a hit is a missed border attachment, the defect class the original
    contrapositive boolean could not see (ADVICE r6); (3) each
    cluster's label equals the minimum member id IN that cluster
    restricted to cores — the pinned determinism convention (labels
    come from CC's min-id contract; border points can only ATTACH to,
    never lower, a label). The oracle carries the SQL-checkable corpus
    count and pins all three booleans TRUE; a regression in the core
    rule, the CC reuse, or the border assignment flips one. Same
    projection and parameters as q280. Scale: the noise×core probe is
    the same 3^d cell-blocked equi-join as the operator itself — never
    all-pairs, and both the operator and the probe carry the
    DEFAULT-ON ~1e8-candidate density fence (r10) that fails fast on
    a saturated ε-space instead of melting."""
    from sales_data_pipeline_spark.operators.dbscan import dbscan, eps_pairs
    from sales_data_pipeline_spark.operators.similarity import jl_project

    emb = table(spark, sf_dir, "embeddings")
    proj = jl_project(emb, k=2).withColumnRenamed("projected", "vec")
    out = dbscan(proj, eps=0.15, min_pts=4, dims=2)
    core_min = (
        out.filter(F.col("is_core") & (F.col("cluster") >= 0))
        .groupBy("cluster")
        .agg(F.min("vec_id").alias("min_core_id"))
    )
    label_ok = core_min.agg(
        F.bool_and(F.col("cluster") == F.col("min_core_id")).alias("ok")
    )
    noise_pts = proj.join(
        out.filter(F.col("cluster") == -1).select("vec_id"), "vec_id"
    )
    core_pts = proj.join(out.filter(F.col("is_core")).select("vec_id"), "vec_id")
    noise_ok = eps_pairs(noise_pts, core_pts, eps=0.15, dims=2).agg(
        (F.count(F.lit(1)) == 0).alias("ok")
    )
    return (
        out.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.bool_and(~F.col("is_core") | (F.col("cluster") >= 0)).alias(
                "every_core_clustered"
            ),
        )
        .crossJoin(
            F.broadcast(
                noise_ok.select(F.col("ok").alias("noise_has_no_core_neighbor"))
            )
        )
        .crossJoin(
            F.broadcast(label_ok.select(F.col("ok").alias("labels_are_member_min")))
        )
        .select(
            "n_points",
            "every_core_clustered",
            "noise_has_no_core_neighbor",
            "labels_are_member_min",
        )
    )
