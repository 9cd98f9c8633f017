"""Dedup / similarity / text / multimodal — SURVEY.md §2.10
(op75–op83), the north-star LLM-data-pipeline operators
(BASELINE.json:6). No reference analog; these are what makes the
engine useful on a 100 TB corpus.

Scale design per family:
- exact dedup: hash-groupBy — one shuffle on the fingerprint, never on
  the payload (op75 hashes, then counts).
- near-dedup: MinHash+LSH banding (op79) — candidate generation is a
  groupBy on (band, band_hash), i.e. O(n·bands) shuffle rows, instead
  of the O(n²) all-pairs join.
- similarity: brute-force top-k (op80) stays exact at test scale; the
  100 TB path is blocking (op81 blocks on the label/IVF-centroid key)
  so the pairwise work is per-bucket.
- vectors stay `array<float>` end-to-end — JVM higher-order functions,
  no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ocdb_server_spark.io import load_embeddings_normed, load_table, load_tables
from ocdb_server_spark.registry import pool_persist, register

# Codec kernels declared as register deps (round-14): op104's decode
# dispatch runs the FLAC and PNG parsers, op130's frame sampler the
# animated-GIF parser — a kernel rewrite must re-front those ops in
# the driver sweep exactly like an oracle edit.
from ocdb_server_spark.sources import flac as _flac_kernel
from ocdb_server_spark.sources import gif as _gif_kernel
from ocdb_server_spark.sources import png as _png_kernel

# shared vector expressions (JVM higher-order functions)
from ocdb_server_spark.functions.vector import dot as _dot, l2_norm as _norm, l2_norm_d as _norm_d

# DuckDB side: unnest-in-lockstep zips two lists; SUM per vec_id gives the
# dot/norm sums. Float fold order differs from Spark's left-to-right →
# similarity values rounded to 6dp on BOTH sides, and ordering/thresholds
# always applied to the ROUNDED value so row sets agree exactly.


@register(
    "op75_dedup_exact",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_text,
           CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS n_dup_rows
    FROM documents
    """,
)
def op75_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup cardinality over documents.text (sf0.1 plants 8
    duplicate texts — FIXTURES.md). At 100 TB: groupBy on xxhash64(text)
    fingerprints, not the text payload; here the distinct count is the
    observable."""
    d = load_table(spark, sf_dir, "documents")
    # Single lazy agg — count + countDistinct in one pass (partial
    # aggregation map-side; countDistinct expands to a two-phase agg
    # under the hood). No eager job at plan-build time.
    return d.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.col("text")).cast("bigint").alias("n_distinct_text"),
        (F.count("*") - F.count_distinct(F.col("text")))
        .cast("bigint")
        .alias("n_dup_rows"),
    )


@register(
    "op76_dedup_keep_latest",
    oracle="""
    SELECT user_id, CAST(ts AS TIMESTAMP) AS last_ts, value AS last_value
    FROM (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def op76_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup events by user keeping the latest row — the keep-latest
    policy for re-crawled/re-ingested documents."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value", "event_id"
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("last_ts"), F.col("value").alias("last_value"))
    )


@register(
    "op77_text_wordcount",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def op77_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize → word frequencies → top-20 (NS text analysis;
    whitespace tokenizer per FIXTURES.md's space-separated corpus)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


@register(
    "op78_text_stats_by_lang",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_words
    FROM documents
    GROUP BY lang
    """,
)
def op78_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc count / avg chars / avg words — quality-scoring
    shape stats (integer sums are exact, so double division is engine-
    identical)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        (
            F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).cast("double")
            / F.count("*")
        ).alias("avg_words"),
    )


def minhash_neardup_pairs(
    d: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_bucket_threshold: int | None = None,
    n_slices: int = 8,
) -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs (Broder '97; cf.
    Spark MLlib MinHashLSH — reimplemented here as pure JVM column ops,
    no MLlib dependency, no Python).

    Pipeline (all built-ins): word 2-shingles → 16 minhashes (xxhash64
    with per-function salt, min over shingles) → 4 bands of 4 →
    explode bands → groupBy (band_idx, band_hash) → within-bucket pairs
    (a < b) → distinct. The shuffle carries (doc_id, band) rows — n·4
    rows — never the O(n²) pair space. Verified against planted
    near-dups in tests/test_northstar.py.

    hot_bucket_threshold: None (default) keeps the direct banding
    self-join — the MEASURED right plan when no band bucket exceeds
    ~10k docs (skew_stress --mode=bucket: below that, any spreading
    loses; this data's largest bucket is the 8-doc planted-dup set).
    An int routes buckets above it through
    functions.skew.hybrid_selfjoin_pairs' blocked triangle (−25% wall
    at 100× with a planted 40%-hot bucket, straggler spread
    28.4×→1.4×) — the production switch for corpora whose template
    pages / boilerplate collapse millions of docs into one band
    bucket. Output is pair-for-pair identical either way (pinned in
    tests/test_northstar.py).

    n_slices: triangle slice count passed through to
    hybrid_selfjoin_pairs when hot-bucket routing is on (round-10
    ADVICE — callers sizing for very large buckets want ~|B|/S rows
    per reducer cell, so S should grow with the expected bucket
    size). Ignored under the default direct self-join."""
    # Every multi-term expression below is built as ONE SQL string
    # parsed JVM-side in a single F.expr/selectExpr round trip — the
    # Column-object formulation cost ~1600 py4j round trips (~0.3 s of
    # plan-build wall, profiled round 4) for the IDENTICAL Catalyst
    # plan; a second flattening pass (round 7: one-string join
    # condition, array-packed signature agg) took the build from
    # ~0.23 s to well under the verdict's 0.2 s per-query line.
    #
    # Materialize the token array BEFORE building shingles: referencing
    # the split() expression inside a HOF lambda re-evaluates it per
    # element (O(n_words²) re-splits — measured 5.5s of the sf0.1
    # runtime). zip_with against the shifted slice is one pass.
    w = d.selectExpr(
        f"{id_col} AS doc_id", f"split(lower({text_col}), ' ') AS w"
    )
    # filter(...) drops the null-padded tail bigram (no space in it).
    # Explode shingles once, hash each with 16 integer salts (one cheap
    # xxhash64 per salt, no string building), then min() per doc —
    # a map-side partial aggregate, so the shuffle carries 16 longs per
    # doc regardless of document length. (A prior formulation — 16
    # nested transforms over the shingle array per row — was 30× slower
    # at sf0.1 and would blow up on long documents.) The 16 mins pack
    # into ONE array column (same 16 partial-min aggregates in the
    # plan; one py4j call instead of 16).
    sh = w.selectExpr(
        "doc_id",
        "explode(array_distinct(filter("
        "  zip_with(w, slice(w, 2, greatest(size(w) - 1, 0)),"
        "           (x, y) -> concat_ws(' ', x, y)),"
        "  s -> contains(s, ' ')))) AS shingle",
    )
    mins = ", ".join(f"min(xxhash64({i}, shingle))" for i in range(16))
    sig = sh.groupBy("doc_id").agg(F.expr(f"array({mins}) AS mhs"))
    # 4 bands × 4 signature values: band hash = xxhash64 of the band's
    # mins (array is 0-indexed via element_at-style [] on the agg output)
    bands = ", ".join(
        f"named_struct('band_idx', {b}, 'band_hash', "
        f"xxhash64(mhs[{b * 4}], mhs[{b * 4 + 1}], mhs[{b * 4 + 2}],"
        f" mhs[{b * 4 + 3}]))"
        for b in range(4)
    )
    exploded = sig.selectExpr(
        "doc_id", f"inline(array({bands}))"
    )
    # Persist the band rows (16 bytes × 4 per doc): the self-join would
    # otherwise run the shingle explode + 16-min aggregation twice. At
    # cluster scale this is the signature table every pass reuses.
    exploded = pool_persist(exploded)
    if hot_bucket_threshold is not None:
        from ocdb_server_spark.functions.skew import hybrid_selfjoin_pairs

        return (
            hybrid_selfjoin_pairs(
                exploded,
                ["band_idx", "band_hash"],
                "doc_id",
                threshold=hot_bucket_threshold,
                n_slices=n_slices,
            )
            .selectExpr("id_a AS doc_a", "id_b AS doc_b")
            .distinct()
        )
    pairs = (
        exploded.alias("l")
        .join(
            exploded.alias("r"),
            F.expr(
                "l.band_idx = r.band_idx AND l.band_hash = r.band_hash"
                " AND l.doc_id < r.doc_id"
            ),
        )
        .selectExpr("l.doc_id AS doc_a", "r.doc_id AS doc_b")
        .distinct()
    )
    return pairs


@register(
    "op79_minhash_neardup",
    oracle=None,  # ROWS: LSH banding is approximate
    # the plan lives in the kernel (round-12 deps rule, applied to the
    # dedup family in round 14): a signature/banding rewrite re-fronts
    deps=(minhash_neardup_pairs,),
)
def op79_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs over the documents table (see
    minhash_neardup_pairs). At sf0.01 the corpus has no near-dups, so
    an empty result is the correct output; sf0.1 plants 8 duplicate
    texts (FIXTURES.md) which must all surface.

    Hot-bucket scale rule (MEASURED, round 10 — skew_stress.py
    --mode=bucket, BASELINE.md): buckets under ~10k docs need no
    mitigation (the one-task pair scan is cheaper than any spreading);
    above it, route ONLY the oversized buckets through the blocked
    triangle self-join (hybrid: −25% wall at 100× data, straggler
    spread 28.4×→1.4×) — blanket triangling inverts at scale because
    the uniform mass pays replication for nothing. op192's fanout cap
    stays the first guard when the oversized bucket's pairs are not
    all wanted."""
    return minhash_neardup_pairs(load_table(spark, sf_dir, "documents"))


_OP80_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
z AS (SELECT e.vec_id,
             CAST(unnest(e.embedding) AS DOUBLE) AS x,
             CAST(unnest(q.qe) AS DOUBLE) AS y
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> 0),
s AS (SELECT vec_id, SUM(x*y) AS dot, SUM(x*x) AS na, SUM(y*y) AS nb
      FROM z GROUP BY vec_id)
SELECT vec_id, ROUND(dot / (sqrt(na) * sqrt(nb)), 6) AS sim
FROM s
ORDER BY sim DESC, vec_id
LIMIT 10
"""


@register("op80_sim_cosine_knn", oracle=_OP80_SQL)
def op80_sim_cosine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of the vec_id=0 query vector
    (NS similarity-search baseline; the serving shape of a kNN lookup).
    The IVF/LSH-bucketed scale paths are op95/op90; op81 is the blocked
    pairwise pattern.

    Production shape: the query vector is a request PARAMETER, so it is
    fetched once at plan time (a 1-row key lookup — the only driver-side
    action here) and inlined as literals, and corpus norms are
    query-independent state precomputed beside the vectors
    (io.load_embeddings_normed). The scan then computes only the dot
    product — a flat codegen sum, no lambda fold and no per-execution
    broadcast-build job — and top-k plans as TakeOrderedAndProject:
    per-partition partial top-10, driver merge, zero shuffles.

    EAGER-CAPTURE CONTRACT (round-5 ADVICE): unlike the package's
    lazy-plan rule (op120/op75), this op deliberately snapshots the
    query vector at BUILD time — a kNN request serves the vector the
    caller asked with, not whatever the row mutates to mid-flight, so
    rebuilding the plan is the way to re-read it (same contract as a
    bound parameter in a prepared statement). A missing query id is a
    caller error and raises ValueError, not TypeError-on-None.

    Float discipline: the aggregate() fold accumulates left-to-right —
    the same sequential IEEE-double order as DuckDB's unnest-ordered
    SUM and as the literal ``+`` chain it replaces (verified
    bit-identical on the full corpus when switching round 9) — and the
    Python-side query norm is the same sequential sum, so
    round(sim, 6) keeps hash-matching the oracle.

    Plan-shape history: round 4 flattened the fold into a 64-term
    literal ``+`` chain because it re-EXECUTED faster — a finding the
    round-8 bench correction exposed as repeat-protocol bias. Under
    the honest fresh-instance protocol the 64-term tree costs more in
    Catalyst analysis than it saves in execution (measured r9 at
    sf0.1: fresh exec 156 ms chain vs 81 ms fold; per-instance repeat
    both ≈ the 1-task job floor), so round 9 restored the fold with
    the query vector as ONE array literal."""
    import math

    from ocdb_server_spark.io import query_vector

    en = load_embeddings_normed(spark, sf_dir)
    # io.query_vector: same 1-row capture job, but served from the warm
    # parameter cache when the table state is frozen by warm_cache —
    # the capture was the largest single line in plan_build_sec
    # (~0.1 s/build, round-6 verdict item 3)
    qvec = query_vector(spark, sf_dir, vec_id=0)
    if qvec is None:
        raise ValueError(
            "op80: query vec_id=0 not present in embeddings table — the "
            "kNN query vector is a bound parameter fetched at plan time "
            "(see eager-capture contract in the docstring)"
        )
    qn = 0.0
    for x in qvec:
        qn += x * x
    qn = math.sqrt(qn)
    arr = "array(" + ",".join(f"cast('{v!r}' as double)" for v in qvec) + ")"
    dot = F.expr(
        f"aggregate(zip_with(embedding, {arr},"
        " (x, y) -> cast(x as double) * y),"
        " cast(0.0 as double), (a, b) -> a + b)"
    )
    sim = F.round(dot / (F.col("nrm") * F.lit(qn)), 6)
    return (
        en.filter(F.col("vec_id") != 0)
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


_OP81_SQL = """
WITH z AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
         CAST(unnest(a.embedding) AS DOUBLE) AS x,
         CAST(unnest(b.embedding) AS DOUBLE) AS y
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id),
s AS (SELECT id_a, id_b, label, SUM(x*y) AS dot, SUM(x*x) AS na, SUM(y*y) AS nb
      FROM z GROUP BY id_a, id_b, label)
SELECT id_a, id_b, CAST(label AS BIGINT) AS label,
       ROUND(dot / (sqrt(na) * sqrt(nb)), 6) AS sim
FROM s
WHERE ROUND(dot / (sqrt(na) * sqrt(nb)), 6) > 0.8
"""


@register("op81_sim_pairwise_threshold", oracle=_OP81_SQL)
def op81_sim_pairwise_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs within the same label with cosine > 0.8 — the
    *blocked* self-join: the equi-key (label; at scale an LSH/IVF bucket
    id) confines the quadratic work to each block. Threshold applied to
    the rounded similarity so both engines keep identical row sets."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    j = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    sim = F.round(
        _dot("a.embedding", "b.embedding")
        / (_norm("a.embedding") * _norm("b.embedding")),
        6,
    )
    return (
        j.select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.label").cast("bigint").alias("label"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") > 0.8)
    )


@register(
    "op82_multimodal_join",
    oracle="""
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents JOIN embeddings ON doc_id = vec_id
    GROUP BY label
    """,
)
def op82_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal columns: text + vector + label in one frame
    (documents ⋈ embeddings on doc_id = vec_id), per-cluster stats.
    The pattern that carries image/audio binary columns too — opaque
    payload travels beside typed metadata (see sources/multimodal.py)."""
    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    j = t["documents"].join(
        t["embeddings"], F.col("doc_id") == F.col("vec_id"), "inner"
    )
    return j.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


_OP83_SQL = """
WITH n AS (
  SELECT vec_id,
         sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm,
         MIN(first_x) AS first_x
  FROM (SELECT vec_id, unnest(embedding) AS x, embedding[1] AS first_x
        FROM embeddings)
  GROUP BY vec_id)
SELECT vec_id,
       ROUND(nrm / nrm, 6) AS unit_norm,
       ROUND(CAST(first_x AS DOUBLE) / nrm, 6) AS first_component
FROM n
"""


@register("op83_vector_normalize", oracle=_OP83_SQL)
def op83_vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize the embedding column (HOF transform + aggregate);
    observable: the normalized norm (≈1) and first component, rounded
    6dp.

    The norm is computed ONCE into a column and the transform divides
    by that column — embedding the norm aggregate inside the lambda
    re-evaluates it per element (O(d²)/row, the HOF-lambda-invariant
    trap; round-12 review). Same values either way — division order
    per element is unchanged — so the oracle hash is unaffected."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    unit = F.transform(
        F.col("embedding"), lambda x: x.cast("double") / F.col("nrm")
    )
    return e.select(
        "vec_id",
        F.round(_norm_d(unit), 6).alias("unit_norm"),
        F.round(F.element_at(unit, 1), 6).alias("first_component"),
    )


# op104 corpus: 40 PNG images + 40 FLAC clips, all from closed-form
# integer formulas, restated by the oracle without seeing a byte.
_OP104_N = 40

_OP104_SQL = f"""
WITH img AS (SELECT range AS i,
                    16 + (range % 5) * 8 AS w,
                    12 + (range % 4) * 6 AS h
             FROM range(0, {_OP104_N})),
imgpx AS (SELECT img.i, img.w, img.h,
                 (img.i * 13 + r.r * 7 + c.c * 3) % 256 AS v
          FROM img, UNNEST(range(0, img.h)) r(r), UNNEST(range(0, img.w)) c(c)),
imgrow AS (SELECT CAST(i AS BIGINT) AS asset_id,
                  'image' AS modality,
                  CAST(ANY_VALUE(w) AS BIGINT) AS dim_a,
                  CAST(ANY_VALUE(h) AS BIGINT) AS dim_b,
                  CAST(SUM(v) AS BIGINT) AS checksum
           FROM imgpx GROUP BY i),
aud AS (SELECT {_OP104_N} + range AS i,
               200 + (({_OP104_N} + range) % 4) * 100 AS n
        FROM range(0, {_OP104_N})),
auds AS (SELECT aud.i, aud.n,
                ((aud.i * 17 + k.k * 13) % 1601) - 800 AS v
         FROM aud, UNNEST(range(0, aud.n)) k(k)),
audrow AS (SELECT CAST(i AS BIGINT) AS asset_id,
                  'audio' AS modality,
                  CAST(ANY_VALUE(n) AS BIGINT) AS dim_a,
                  CAST(8000 AS BIGINT) AS dim_b,
                  CAST(SUM(v) AS BIGINT) AS checksum
           FROM auds GROUP BY i)
SELECT * FROM imgrow UNION ALL SELECT * FROM audrow
"""


@register(
    "op104_multimodal_decode",
    oracle=_OP104_SQL,
    deps=(_flac_kernel, _png_kernel),
)
def op104_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column pipeline end-to-end, on REAL codecs
    (round-7 verdict item 3 — this op ran the stubbed kernel until six
    real decoders existed): ONE asset table carries mixed modalities
    in a single opaque `binary` column beside typed metadata
    (modality, mime), and one Arrow-batched mapInPandas decode stage
    DISPATCHES per payload — image/png through sources/png.py's chunk
    walk + CRC32 + inflate + filter reconstruction, audio/flac through
    sources/flac.py's frame parser + LPC/fixed predictors + CRC/MD5
    verify — emitting one unified fixed-width feature row per asset
    (dim_a/dim_b/checksum = width/height/pixel-sum for images,
    n_samples/rate/sample-sum for audio). Both formats are lossless,
    so the DuckDB oracle recomputes every feature from the generation
    formulas without ever seeing a byte: the hash certifies the
    dispatch AND both codecs end to end.

    Scale shape: encode and decode live inside one mapInPandas task
    each — payload bytes never shuffle, never hit the driver; only
    80 fixed-width rows continue. At 100 TB the same plan reads a
    (modality, date)-partitioned media lake where metadata-only
    queries never touch the binary column."""
    import pandas as pd

    def gen_assets(it):
        import numpy as np

        from ocdb_server_spark.sources.flac import encode_flac
        from ocdb_server_spark.sources.png import encode_png_gray

        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i < _OP104_N:  # PNG image
                    w, h = 16 + (i % 5) * 8, 12 + (i % 4) * 6
                    r = np.arange(h, dtype=np.int64)[:, None]
                    c = np.arange(w, dtype=np.int64)[None, :]
                    px = ((i * 13 + r * 7 + c * 3) % 256).astype(np.uint8)
                    rows.append((i, "image", "image/png", encode_png_gray(px)))
                else:  # FLAC mono clip
                    n = 200 + (i % 4) * 100
                    k = np.arange(n, dtype=np.int64)
                    s = ((i * 17 + k * 13) % 1601 - 800).astype(np.int16)
                    rows.append((i, "audio", "audio/flac",
                                 encode_flac(s, 8000, blocksize=256)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "modality", "mime", "payload"]
            )

    def decode_dispatch(it):
        import numpy as np

        from ocdb_server_spark.sources.flac import decode_flac
        from ocdb_server_spark.sources.png import decode_png_gray

        for pdf in it:
            out = {k: [] for k in
                   ("asset_id", "modality", "dim_a", "dim_b", "checksum")}
            for aid, modality, mime, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["mime"], pdf["payload"]
            ):
                payload = bytes(payload)
                if mime == "image/png":
                    w, h, px = decode_png_gray(payload)
                    a, b, chk = w, h, int(px.astype(np.int64).sum())
                elif mime == "audio/flac":
                    rate, s = decode_flac(payload)
                    s64 = np.asarray(s, dtype=np.int64).reshape(-1)
                    a, b, chk = s64.size, rate, int(s64.sum())
                else:
                    raise ValueError(f"undecodable mime {mime!r}")
                out["asset_id"].append(int(aid))
                out["modality"].append(str(modality))
                out["dim_a"].append(a)
                out["dim_b"].append(b)
                out["checksum"].append(chk)
            yield pd.DataFrame(out)

    assets = spark.range(2 * _OP104_N).repartition(8).mapInPandas(
        gen_assets,
        "asset_id long, modality string, mime string, payload binary",
    )
    return assets.mapInPandas(
        decode_dispatch,
        "asset_id long, modality string, dim_a long, dim_b long,"
        " checksum long",
    )


# op130 corpus: 24 animated GIFs, 2-8 full-size frames each, pixels
# from a closed-form formula; the sampler keeps every 4th frame.
_OP130_N = 24
_OP130_EVERY = 4

_OP130_SQL = f"""
WITH a AS (SELECT range AS i,
                  2 + (range % 7) AS nf,
                  10 + (range % 5) * 4 AS w,
                  8 + (range % 4) * 4 AS h
           FROM range(0, {_OP130_N})),
f AS (SELECT a.i, a.nf, a.w, a.h, k.k
      FROM a, UNNEST(range(0, a.nf)) k(k)
      WHERE k.k % {_OP130_EVERY} = 0),
px AS (SELECT f.i, f.nf, f.k,
              (f.i * 13 + f.k * 29 + r.r * 7 + c.c * 3) % 256 AS v
       FROM f, UNNEST(range(0, f.h)) r(r), UNNEST(range(0, f.w)) c(c))
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(ANY_VALUE(nf) AS BIGINT) AS n_frames,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_sampled,
       CAST(SUM(v) AS BIGINT) AS px_sum
FROM px GROUP BY i
"""


@register(
    "op130_multimodal_frame_sample",
    oracle=_OP130_SQL,
    deps=(_gif_kernel,),
)
def op130_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling on a REAL container (round-7 verdict
    item 3 — synthetic payloads until the GIF codec existed): 24
    multi-frame animated GIF89a streams (sources/gif.py
    encode_gif_anim — NETSCAPE loop block, per-frame Graphic Control
    Extensions, full LZW per frame) are decoded frame-by-frame and
    SAMPLED — every 4th frame's exact pixel sum survives, the rest are
    dropped inside the task. Output per asset: total frame count,
    sampled count, summed sampled pixels. GIF is lossless, so the
    DuckDB oracle regenerates the kept frames' pixels from the
    closed-form formula — the hash certifies the multi-frame container
    walk (extension skipping between frames included), the per-frame
    LZW decode, AND the sampling arithmetic.

    Scale shape: identical to op104 — payload bytes live and die
    inside one mapInPandas task, only (asset_id, 3 counters) rows
    continue; a production frame-sampler over H.264 swaps the codec
    kernel, not the plan."""
    import pandas as pd

    def gen_gifs(it):
        import numpy as np

        from ocdb_server_spark.sources.gif import encode_gif_anim

        for pdf in it:
            ids, payloads = [], []
            for i in pdf["id"]:
                i = int(i)
                nf = 2 + i % 7
                w, h = 10 + (i % 5) * 4, 8 + (i % 4) * 4
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                frames = [
                    ((i * 13 + k * 29 + r * 7 + c * 3) % 256).astype(np.uint8)
                    for k in range(nf)
                ]
                ids.append(i)
                payloads.append(encode_gif_anim(frames))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    def sample_frames(it):
        import numpy as np

        from ocdb_server_spark.sources.gif import decode_gif_frames

        for pdf in it:
            out = {k: [] for k in
                   ("asset_id", "n_frames", "n_sampled", "px_sum")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                frames = decode_gif_frames(bytes(payload))
                kept = frames[::_OP130_EVERY]
                out["asset_id"].append(int(aid))
                out["n_frames"].append(len(frames))
                out["n_sampled"].append(len(kept))
                out["px_sum"].append(
                    int(sum(px.astype(np.int64).sum() for _w, _h, px in kept))
                )
            yield pd.DataFrame(out)

    gifs = spark.range(_OP130_N).repartition(8).mapInPandas(
        gen_gifs, "asset_id long, payload binary"
    )
    return gifs.mapInPandas(
        sample_frames,
        "asset_id long, n_frames long, n_sampled long, px_sum long",
    )
