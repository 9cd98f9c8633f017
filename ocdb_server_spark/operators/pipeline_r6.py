"""Round-6 pipeline extensions — SURVEY.md §2.18 (op211+).

- op211: mergeable GRAM MATRIX (X^T X) over the embedding corpus —
  the covariance/PCA building block: per-partition numpy int64
  partials via mapInPandas, summed by (i, j). The d×d partial is the
  mergeable-sketch pattern applied to linear algebra: the shuffle
  carries #partitions × d(d+1)/2 rows no matter how many vectors
  stream through, and int64 quantization makes the whole thing
  hash-certifiable against a pair-join oracle.
- op212: k-means LLOYD ITERATIONS, integer-exact — two full
  assign/update rounds over quantized embeddings with deterministic
  seeds; the op186 discipline (exact int64 recurrence ≡ unrolled
  CTEs) extended from scalar fixpoints to vector ones.
- op213: BFS reachability (4 hops) over the part↔supplier graph —
  iterative frontier expansion in Spark certified against DuckDB's
  actual WITH RECURSIVE, i.e. the recursive-CTE surface Spark lacks,
  re-expressed as a bounded join loop.
- op214: ranking-quality AUC via the Mann-Whitney rank-sum — the
  "is this quality score actually separating good from bad docs"
  measurement run before gating a corpus on it.
- op215: COUNT-MIN SKETCH point queries — mergeable frequency
  counters, FULLY SQL-oracled because CMS counters are themselves
  exact bucket counts under an engine-portable hash (completes the
  mergeable family: HLL/MinHash/bottom-k/MG/CMS).
- op216/op217: BPE tokenizer TRAINING and APPLY — 3 unrolled merge
  rounds over the word-frequency table, certified against unrolled
  SQL and a pure-python reference tokenizer.
- op220: per-node TRIANGLE COUNTS — oriented 3-way self-join over
  the persisted co-supply edge cache.
- op221: near-dup CANONICALIZATION — op79's LSH pairs → op96's
  components → keep-best rule, the dedup family's shipped decision
  (ROWS; planted-cluster behavioral gate).
- op223: 2-D SKYLINE (Pareto frontier) — mergeable partial skylines
  via a vectorized sort+cummax kernel, certified against the
  quadratic NOT-EXISTS semantics.
- op224: FEATURE HASHING — signed hashing-trick pooling into a fixed
  32-bucket vector, engine-portable hash, int64-exact.
- op225: TEMPORAL train/test split + cold-start leakage audit —
  op176's hash split for the time-ordered eval case.

Same package rules: DataFrame/Catalyst only, Python only inside
Arrow-batched mapInPandas kernels, shuffles carry ids + counters,
cross-engine floats quantized to int64 before any sum.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.registry import pool_persist, register


# --------------------------------------------------------------------------
# op211: mergeable gram matrix (X^T X) — per-partition numpy partials
# --------------------------------------------------------------------------

_GRAM_SCALE = 1000  # q = round(x·1e3): embeddings are in [-0.53, 0.46] so
# |q| ≤ 530, per-pair product ≤ 2.9e5, 64-dim per-row contribution ≤ 1.9e7
# → int64 overflows only past ~4.9e11 vectors; at larger corpora drop the
# scale to 1e2 (one decimal digit of quantization per 100× rows).

_OP211_SQL = f"""
WITH q AS (
  SELECT vec_id, CAST(i - 1 AS INTEGER) AS d,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_GRAM_SCALE}) AS BIGINT) AS qx
  FROM embeddings, range(1, 65) t(i)
)
SELECT a.d AS i, b.d AS j,
       CAST(SUM(a.qx * b.qx) AS BIGINT) AS g
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.d <= b.d
GROUP BY a.d, b.d
"""


@register("op211_gram_matrix", oracle=_OP211_SQL)
def op211_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix G = X^T X over the embedding corpus (upper
    triangle, 2080 rows for d=64) — the one-pass sufficient statistic
    behind PCA/whitening/linear probes on a training corpus.

    Plan: quantize JVM-side (transform(embedding, x -> int64)), then
    ONE mapInPandas pass computes a per-partition numpy ``X.T @ X``
    partial (int64 matmul — exact, no BLAS float path for integer
    dtypes) and emits d(d+1)/2 rows per PARTITION, not per vector;
    the final groupBy(i, j) sums partials. This is the mergeable-
    sketch shape applied to linear algebra: at 100 TB the shuffle
    carries (#partitions × 2080) rows while the vectors themselves
    never leave their scan tasks. Int64 quantization (q = round(x·1e3))
    makes every partial order-insensitive, so the hash match against
    the oracle's pair-join restatement certifies the matmul kernel,
    the partial emission, and the merge.

    Oracle: the O(n·d²) self-join restatement — same quantization,
    exact integer products, grouped on (i, j). Overflow headroom is
    documented at _GRAM_SCALE."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.expr(
            f"transform(embedding, x -> cast(round(cast(x as double) * {_GRAM_SCALE}) as bigint))"
        ).alias("q")
    )

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            part = x.T @ x
            acc = part if acc is None else acc + part
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {"i": iu.astype(np.int32), "j": ju.astype(np.int32), "g": acc[iu, ju]}
        )

    partials = e.mapInPandas(gram, schema="i int, j int, g long")
    return partials.groupBy("i", "j").agg(F.sum("g").cast("bigint").alias("g"))


# --------------------------------------------------------------------------
# op212: k-means Lloyd iterations — integer-exact, hash-certified
# --------------------------------------------------------------------------

_KM_K = 4
_KM_OFF = 1000  # offset puts quantized components in [~474, ~1459] — all
# POSITIVE, so integer division (centroid update) truncates identically in
# Spark (`div`), DuckDB (`//`) and Python; distances are offset-invariant
# ((q+off) − (c+off) = q − c), so the offset changes no assignment.

_OP212_SQL = f"""
WITH q AS (
  SELECT vec_id, CAST(i - 1 AS INTEGER) AS d,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) + {_KM_OFF} AS qx
  FROM embeddings, range(1, 65) t(i)),
c0 AS (SELECT vec_id AS cid, d, qx AS c FROM q WHERE vec_id < {_KM_K}),
d1 AS (
  SELECT q.vec_id, c0.cid, SUM((q.qx - c0.c) * (q.qx - c0.c)) AS dist
  FROM q JOIN c0 ON q.d = c0.d
  GROUP BY q.vec_id, c0.cid),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1),
c1 AS (
  SELECT a1.cid, q.d, SUM(q.qx) // COUNT(*) AS c
  FROM a1 JOIN q ON a1.vec_id = q.vec_id
  GROUP BY a1.cid, q.d),
d2 AS (
  SELECT q.vec_id, c1.cid, SUM((q.qx - c1.c) * (q.qx - c1.c)) AS dist
  FROM q JOIN c1 ON q.d = c1.d
  GROUP BY q.vec_id, c1.cid),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1),
c2 AS (
  SELECT a2.cid, q.d, SUM(q.qx) // COUNT(*) AS c
  FROM a2 JOIN q ON a2.vec_id = q.vec_id
  GROUP BY a2.cid, q.d),
c2s AS (SELECT cid, CAST(SUM(c) AS BIGINT) AS centroid_l1 FROM c2 GROUP BY cid),
m AS (SELECT cid, COUNT(*) AS n, SUM(vec_id) AS s FROM a2 GROUP BY cid)
SELECT m.cid AS cluster_id,
       CAST(m.n AS BIGINT) AS n_members,
       CAST(m.s AS BIGINT) AS sum_vec_ids,
       c2s.centroid_l1 AS centroid_l1
FROM m JOIN c2s ON m.cid = c2s.cid
"""


def _km_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form quantized embeddings: (vec_id, d, qx) with the
    offset-positive int64 components op212's recurrence runs on."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    ).select(
        "vec_id",
        "d",
        (F.round(F.col("x").cast("double") * 1000).cast("bigint") + _KM_OFF).alias(
            "qx"
        ),
    )


def _km_assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """One Lloyd ASSIGN step: nearest centroid per vector, exact int64
    distances, deterministic (dist, cid) tiebreak. cents is k×d rows —
    always broadcast, so the per-iteration cost is one map-side join
    fan-out (k rows per (vec, d)) + one (vec_id, cid) partial agg +
    one per-vec_id window; vectors shuffle as ids + counters only."""
    from pyspark.sql import Window

    d = (
        q.join(F.broadcast(cents), "d")
        .groupBy("vec_id", "cid")
        .agg(F.sum((F.col("qx") - F.col("c")) * (F.col("qx") - F.col("c"))).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        d.withColumn("rn", F.row_number().over(w)).filter("rn = 1").select("vec_id", "cid")
    )


def _km_update(assign: DataFrame, q: DataFrame) -> DataFrame:
    """One Lloyd UPDATE step: per-(cid, d) integer-mean centroid.
    `div` (truncating integer division) on all-positive sums matches
    DuckDB's `//` exactly — the op186 cross-engine-integer rule."""
    return (
        assign.join(q, "vec_id")
        .groupBy("cid", "d")
        .agg(F.expr("sum(qx) div count(*)").alias("c"))
    )


@register("op212_kmeans_lloyd", oracle=_OP212_SQL)
def op212_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two k-means Lloyd iterations (k=4, seeds = vec_id<4), INTEGER-
    EXACT and hash-certified — extending op186's "iterative algorithm
    as unrolled CTEs" discipline from scalar PageRank to vector
    clustering: quantized offset-positive int64 components make every
    distance, argmin and centroid update bit-identical between the
    Spark join loop and the oracle's unrolled SQL, regardless of
    partitioning or summation order.

    Per iteration: centroids (k×d = 256 rows) broadcast into the
    assign join — the classic k-means distribution (centroids move,
    vectors don't); the update groupBy shuffles (cid, d) partials.
    The whole two-iteration program is ONE lazy Catalyst plan — no
    driver-side collect of centroids (op80's eager-capture lesson),
    which stays viable for bounded unrolled iteration counts; a
    convergence-loop variant would persist() each c_t like op96/op186.

    Output: per final cluster — membership count, vec_id checksum,
    centroid L1 checksum (the 64 integer components summed)."""
    # q feeds both assigns, both updates and the final stats (5 uses):
    # persist the quantized long form once — still lazy, no collect
    q = pool_persist(_km_quantized(spark, sf_dir))
    c0 = q.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), "d", F.col("qx").alias("c")
    )
    a1 = _km_assign(q, c0)
    c1 = _km_update(a1, q)
    a2 = _km_assign(q, c1)
    c2 = _km_update(a2, q)
    m = a2.groupBy("cid").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("vec_id").cast("bigint").alias("sum_vec_ids"),
    )
    c2s = c2.groupBy("cid").agg(F.sum("c").cast("bigint").alias("centroid_l1"))
    return (
        m.join(c2s, "cid")
        .select(
            F.col("cid").alias("cluster_id"), "n_members", "sum_vec_ids", "centroid_l1"
        )
    )


# --------------------------------------------------------------------------
# op213: BFS reachability — bounded join loop vs real WITH RECURSIVE
# --------------------------------------------------------------------------

_BFS_HOPS = 4
_BFS_SEEDS = 3  # seed set: suppliers with s_suppkey <= 3

_OP213_SQL = f"""
WITH RECURSIVE
pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
edges AS (
  SELECT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst FROM pairs
  UNION ALL
  SELECT 2 * l_suppkey + 1 AS src, 2 * l_partkey AS dst FROM pairs
),
walk(node, dist) AS (
  SELECT 2 * s_suppkey + 1, 0 FROM supplier WHERE s_suppkey <= {_BFS_SEEDS}
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.dist < {_BFS_HOPS}
),
best AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY node)
SELECT CAST(dist AS INTEGER) AS dist,
       CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node // 2) AS BIGINT) AS sum_key
FROM best
GROUP BY dist, node_type
"""


@register("op213_bfs_reachability", oracle=_OP213_SQL)
def op213_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop BFS (4 hops) from a seed supplier set over the
    symmetrized part↔supplier graph (op186's edge encoding) — the
    RECURSIVE-CTE query surface Spark SQL lacks, re-expressed as the
    bounded frontier loop it compiles to on any engine. The oracle is
    DuckDB's ACTUAL `WITH RECURSIVE` + min-dist rollup, so the hash
    match certifies the loop against a genuinely independent
    recursion implementation, not a restatement of our own unrolling.

    REWRITTEN round 19 (optimization guide §2.4 — remove shuffles/
    stages outright): the loop now implements the oracle's OWN
    algebra directly. walk-level k = {nodes with a walk of length
    exactly k from a seed} (frontier ⋈ edges → distinct, nothing
    else), and BFS distance = MIN(dist) over the unioned levels — one
    aggregation at the end instead of the per-hop anti-join against a
    growing visited set that rounds 6–18 ran ("first discovery is min
    dist" enforced eagerly). Equivalence is by construction: the
    DuckDB recursion's walk contains (node, d) iff a length-d walk
    exists; level k is precisely that set, and the final min is the
    oracle's `best` CTE verbatim. Measured at sf0.1 (interleaved
    best-of-5, noop): 2.55 s → 1.28 s — the anti-join version paid a
    per-hop broadcast build + anti probe whose only effect was to
    shrink late frontiers on an almost-fully-reached graph.

    Per hop: frontier ⋈ edges (the persisted edge table) → distinct —
    one exchange. Distances and keys are integers end to end —
    nothing to quantize. Scale: still the classic Pregel/message-
    passing shape; edges persist()ed once and joined per hop, the hop
    count bounds total work, and the min-dist rollup replaces 4
    anti-join shuffles/broadcasts of the visited set (which at a
    10^10-edge graph is itself node-set-sized — the rollup ships each
    (node, dist) pair once instead of probing visited every hop). On
    parity-alternating graphs like this bipartite one, level k
    re-lists nodes first seen at k-2 — bounded by the reachable set,
    the same O(Σ deg(reachable)) join volume per hop the anti-join
    form pays on its widest hops.

    Output: per (dist, node_type) — node count + key checksum."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    fwd = pairs.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    )
    rev = pairs.select(
        (2 * F.col("l_suppkey") + 1).alias("src"),
        (2 * F.col("l_partkey")).alias("dst"),
    )
    edges = pool_persist(fwd.unionAll(rev))
    sup = load_table(spark, sf_dir, "supplier")
    frontier = sup.filter(F.col("s_suppkey") <= _BFS_SEEDS).select(
        (2 * F.col("s_suppkey") + 1).alias("node")
    )
    levels = [frontier.withColumn("dist", F.lit(0))]
    for hop in range(1, _BFS_HOPS + 1):
        frontier = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        if hop < _BFS_HOPS:
            # persist every level the NEXT hop builds on: without it
            # the lazy union re-derives every earlier hop per level
            # (quadratic recomputation — same lesson as op96's
            # localCheckpoint). The last level is referenced once
            # (the union) — nothing to share, skip the cache.
            frontier = pool_persist(frontier)
        levels.append(frontier.withColumn("dist", F.lit(hop)))
    walk = levels[0]
    for lv in levels[1:]:
        walk = walk.unionByName(lv)
    best = walk.groupBy("node").agg(F.min("dist").alias("dist"))
    return best.groupBy(
        "dist",
        F.when(F.col("node") % 2 == 0, "part").otherwise("supplier").alias(
            "node_type"
        ),
    ).agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.sum(F.expr("node div 2")).cast("bigint").alias("sum_key"),
    )


# --------------------------------------------------------------------------
# op214: ranking-quality AUC — tie-corrected Mann-Whitney, integer-exact
# --------------------------------------------------------------------------

_OP214_SQL = """
WITH scored AS (
  SELECT n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents),
by_score AS (
  SELECT score,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos_g
  FROM scored GROUP BY score),
ranked AS (
  SELECT score, n, n_pos_g,
         COALESCE(SUM(n) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM by_score),
tot AS (
  SELECT CAST(SUM(n_pos_g) AS BIGINT) AS n_pos,
         CAST(SUM(n - n_pos_g) AS BIGINT) AS n_neg,
         CAST(SUM(n_pos_g * (2 * (before + 1) + (n - 1))) AS BIGINT) AS r2_pos
  FROM ranked)
SELECT n_pos, n_neg,
       r2_pos - n_pos * (n_pos + 1) AS u2,
       CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
         / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
FROM tot
"""


@register("op214_auc_ranksum", oracle=_OP214_SQL)
def op214_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality AUC via the tie-corrected Mann-Whitney rank
    sum — the "does this score actually separate the classes"
    measurement a quality-filter pipeline runs before gating a corpus
    on a classifier (here: does document length separate en from
    non-en — AUC ≈ 0.5 says no, as designed for this corpus).

    Scale shape: the naive formulation ranks every row in one GLOBAL
    window (a total sort of the corpus). This one aggregates to the
    DISTINCT-SCORE table first (bounded: a score is a bucketed
    measurement, here ≤ ~600 values), runs the cumulative window over
    those few rows, and weights each group's tie-averaged rank by its
    positive count — one scan + one tiny window, no global sort of
    rows. Integer discipline: tie-averaged ranks kept in HALVED units
    (avg_rank·2 = 2·min_rank + (ties−1) — always integral), so U is
    exact int64 algebra and the only float is the final single
    division (exact ints → IEEE double, bit-identical both engines).

    AUC = [Σ_pos avg_rank − n_pos(n_pos+1)/2] / (n_pos·n_neg)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    by_score = d.groupBy("score").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos_g"),
    )
    # window over DISTINCT scores only — the documented bounded
    # exception to the no-unpartitioned-window rule (op178's metadata
    # argument: cardinality is the score's codomain, not the corpus)
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_score.withColumn(
        "before", F.coalesce(F.sum("n").over(w), F.lit(0))
    )
    tot = ranked.agg(
        F.sum("n_pos_g").cast("bigint").alias("n_pos"),
        F.sum(F.col("n") - F.col("n_pos_g")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("n_pos_g")
            * (2 * (F.col("before") + 1) + (F.col("n") - 1))
        )
        .cast("bigint")
        .alias("r2_pos"),
    )
    u2 = F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return tot.select(
        "n_pos",
        "n_neg",
        u2.alias("u2"),
        (
            u2.cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# op215: count-min sketch point queries — mergeable counters, SQL-certified
# --------------------------------------------------------------------------

_CMS_W = 64  # width (buckets per row)
# depth-3 row hashes: Knuth's multiplicative constant + the two public
# xxhash32 primes — any odd multipliers decorrelate; these are the ones
# already used elsewhere in the package (op174) and in sources/pyds.py.
_CMS_MULTS = (2654435761, 2246822519, 3266489917)
# word -> integer key, portable across engines: first 24 bits of md5.
# Spark: conv(hex, 16, 10); DuckDB: '0x'-prefixed cast. Verified equal.
_CMS_KEY_SPARK = "cast(conv(substr(md5(word), 1, 6), 16, 10) as bigint)"
_CMS_KEY_DUCK = "('0x' || substr(md5(word), 1, 6))::BIGINT"
_CMS_PROBES = ("spark", "batch", "window", "vector", "the", "nonexistentword")


def _cms_mulmod32(col: str, mult: int, int_div: str) -> str:
    """(col · mult) mod 2³² overflow-free — op174's portable hash."""
    u32 = 4294967296
    a = f"(({col}) % {u32})"
    lo = f"({a} % 65536)"
    hi = f"({a} {int_div} 65536)"
    return (
        f"((({lo} * {mult}) % {u32}"
        f" + ((({hi} * {mult}) % {u32}) * 65536) % {u32}) % {u32})"
    )


def _cms_bucket(key_expr: str, mult: int, int_div: str) -> str:
    return f"({_cms_mulmod32(key_expr, mult, int_div)} % {_CMS_W})"


def _cms_py_bucket(word: str, mult: int) -> int:
    """The SAME key → row-hash → bucket arithmetic as _cms_bucket,
    evaluated driver-side on a literal probe word (md5 is stable
    across engines; the modular arithmetic is exact in Python ints,
    so this is bit-identical to what either engine computes)."""
    import hashlib

    key = int(hashlib.md5(word.encode()).hexdigest()[:6], 16)
    return ((key * mult) % 4294967296) % _CMS_W


def _op215_buckets_duck(src: str) -> str:
    """UNION ALL of the depth rows: (r, bucket, word) drawn from src —
    every branch carries its own FROM (a shared trailing FROM binds to
    the last branch only; learned the hard way building this op)."""
    return "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {_cms_bucket(_CMS_KEY_DUCK, m, '//')} AS b, word"
        f" FROM {src}"
        for r, m in enumerate(_CMS_MULTS)
    )


def _op215_sql() -> str:
    probes = ", ".join(f"('{w}')" for w in _CMS_PROBES)
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
w AS (SELECT word FROM toks WHERE word <> ''),
counters AS (
  SELECT r, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({_op215_buckets_duck('w')}) GROUP BY r, b),
probes(word) AS (VALUES {probes}),
probe_buckets AS (
  {_op215_buckets_duck('probes')}),
est AS (
  -- LEFT join + COALESCE 0: an EMPTY probe cell is a zero counter
  -- (true CMS semantics — est is then 0 no matter what the other
  -- rows hold). An inner join would silently drop empty cells and
  -- take MIN over the non-empty ones only, diverging from the
  -- Spark side on token-sparse corpora.
  SELECT pb.word, MIN(COALESCE(c.c, 0)) AS est
  FROM probe_buckets pb LEFT JOIN counters c ON pb.r = c.r AND pb.b = c.b
  GROUP BY pb.word),
exact AS (
  SELECT p.word, CAST(COUNT(w.word) AS BIGINT) AS exact_n
  FROM probes p LEFT JOIN w ON w.word = p.word
  GROUP BY p.word)
SELECT e.word, COALESCE(est.est, 0) AS cms_est, e.exact_n,
       COALESCE(est.est, 0) - e.exact_n AS overcount
FROM exact e LEFT JOIN est ON e.word = est.word
"""


@register("op215_cms_pointquery", oracle=_op215_sql())
def op215_cms_pointquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH (Cormode–Muthukrishnan) frequency estimates
    for a fixed probe set, with the exact counts and the (provably
    ≥ 0) overcount alongside — completing the mergeable-summary
    family: HLL=cardinality (op166), MinHash=similarity (op194),
    bottom-k=quantiles (op201), Misra-Gries=heavy hitters (op185),
    CMS=point frequencies.

    Why this sketch is FULLY SQL-certified where op166 stays ROWS:
    CMS counters are themselves exact aggregates — counter[r][b] =
    COUNT(*) of tokens whose row-r hash lands in bucket b — under an
    engine-portable hash (24-bit md5 prefix → _mulmod32 row mixes).
    So the whole sketch state AND the min-over-rows estimates are
    deterministic relational algebra, and the driver hash certifies
    build + merge + probe end to end.

    Merge = Spark's own partial aggregation — and because the probe
    set is known at PLAN time, the sketch build folds further: the
    probes' (row, bucket) cells are computed driver-side (same md5 →
    _mulmod32 arithmetic, evaluated in Python on the literal words),
    so the whole op is 6×(3 cell counts + 1 exact count) = 24
    conditional aggregates over ONE token scan. Each map task emits a
    single 24-counter partial row (that partial row IS the probed
    slice of its partition's sketch; the union is the final reduce),
    the exchange carries #tasks rows total, and a trailing `stack`
    unpivots the 1-row result to the 6-row answer. One scan, one
    tiny shuffle, zero joins — vs. the round-6 shape's two scans +
    counter/probe/exact three-join cascade (~300 ms of stage floor
    at every sf; round-7 bench profile). Materializing the full
    192-cell sketch for AD-HOC probes is the op174 pattern; this op
    certifies the point-query path where probes are literals.

    Estimate guarantee (est ≥ exact; est ≤ exact + εN w.h.p.) is
    asserted in tests/test_pipeline_r6.py."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    # one projection computes the depth-3 bucket of every token once;
    # the 24 conditional counts below all compare against literals
    bucketed = toks.selectExpr(
        "word",
        *[
            f"{_cms_bucket(_CMS_KEY_SPARK, m, 'div')} as b{r}"
            for r, m in enumerate(_CMS_MULTS)
        ],
    )
    aggs = []
    for i, w in enumerate(_CMS_PROBES):
        for r, m in enumerate(_CMS_MULTS):
            cell = _cms_py_bucket(w, m)
            aggs.append(
                F.count(F.when(F.col(f"b{r}") == cell, True)).alias(
                    f"c_{i}_{r}"
                )
            )
        aggs.append(F.count(F.when(F.col("word") == w, True)).alias(f"x_{i}"))
    one = bucketed.agg(*aggs)
    branches = ", ".join(
        f"'{w}', cast(least(c_{i}_0, c_{i}_1, c_{i}_2) as bigint),"
        f" cast(x_{i} as bigint)"
        for i, w in enumerate(_CMS_PROBES)
    )
    return one.selectExpr(
        f"stack({len(_CMS_PROBES)}, {branches}) as (word, cms_est, exact_n)"
    ).select(
        "word",
        "cms_est",
        "exact_n",
        (F.col("cms_est") - F.col("exact_n")).cast("bigint").alias("overcount"),
    )


# --------------------------------------------------------------------------
# op216: BPE merge training — 3 unrolled rounds, hash-certified
# --------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _op216_sql() -> str:
    """Unrolled BPE trainer in DuckDB: each round counts adjacent
    symbol pairs over the (vocab-sized) word-frequency table, picks
    the argmax pair under a total (cnt DESC, lhs, rhs) order, and
    applies the merge with plain leftmost-non-overlapping REPLACE —
    the exact string semantics Spark's `replace` shares."""
    ctes = ["""
toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM toks WHERE word <> '' GROUP BY word),
seqs0 AS (
  SELECT word, freq,
         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
  FROM words)"""]
    for k in range(1, _BPE_ROUNDS + 1):
        ctes.append(f"""
pairs{k} AS (
  SELECT sym[i] AS lhs, sym[i + 1] AS rhs, SUM(freq) AS cnt
  FROM (SELECT string_split(trim(seq), ' ') AS sym, freq FROM seqs{k - 1}),
       UNNEST(range(1, len(sym))) t(i)
  GROUP BY lhs, rhs),
best{k} AS (
  SELECT lhs, rhs, cnt FROM pairs{k}
  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
seqs{k} AS (
  SELECT word, freq,
         replace(seq, ' ' || b.lhs || ' ' || b.rhs || ' ',
                 ' ' || b.lhs || b.rhs || ' ') AS seq
  FROM seqs{k - 1}, best{k} b)""")
    finals = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, lhs, rhs, lhs || rhs AS merged,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM best{k}"
        for k in range(1, _BPE_ROUNDS + 1)
    )
    return "WITH " + ",".join(ctes) + "\n" + finals


@register("op216_bpe_train", oracle=_op216_sql())
def op216_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE MERGE TRAINING (Sennrich 2016) — the tokenizer-build step
    itself, not a proxy: three merge rounds learned from the corpus,
    hash-certified against the oracle's unrolled restatement.

    The trainer runs on the WORD-FREQUENCY table, not the corpus —
    the classic BPE compression: the corpus is touched once (one
    explode + groupBy to vocab-sized (word, freq)), and every
    subsequent pair-count/merge round is arithmetic over ~|vocab|
    rows. At 100 TB that makes training cost one token scan plus
    per-round vocab-sized aggregates — the reason real tokenizer
    trainers (SentencePiece/HF) do exactly this.

    Determinism: pair selection is argmax under the TOTAL order
    (count DESC, lhs, rhs) — ties cannot diverge; the merge rewrite
    is leftmost-non-overlapping string replace with space sentinels,
    whose greedy-left semantics are identical in Spark, DuckDB and
    Python (pinned vs a pure-python reference BPE in tests). Each
    round's argmax is a 1-row TakeOrdered broadcast-joined into the
    sequence update — the whole 3-round program is one lazy plan.

    The vocab-sized seqs table is persist()ed (round 19): the unrolled
    plan references it from every round's pair branch AND every output
    branch, and exchange reuse left TWO separate corpus scans feeding
    two word-level exchanges (plans/r19/op216_bpe_train_before.txt) —
    the persist makes "the corpus is touched once" true in the
    physical plan, exactly the compression this docstring claimed.

    Output: (merge_rank, lhs, rhs, merged, pair_count) — the learned
    merge table, i.e. the artifact a tokenizer ships."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    seqs = pool_persist(
        words.select(
            "word",
            "freq",
            F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")).alias(
                "seq"
            ),
        )
    )
    merge_rows = []
    for k in range(1, _BPE_ROUNDS + 1):
        pairs = (
            seqs.select(
                F.split(F.trim(F.col("seq")), " ").alias("sym"), "freq"
            )
            # single-symbol words have no pairs — and Spark's
            # sequence(1, 0) is DESCENDING [1, 0], not empty, so the
            # guard is load-bearing, not cosmetic
            .filter(F.expr("size(sym) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sym) - 1), "
                        "i -> struct(element_at(sym, i) as lhs, "
                        "element_at(sym, i + 1) as rhs))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "lhs", "rhs").limit(1)
        merge_rows.append(
            best.select(
                F.lit(k).alias("merge_rank"),
                "lhs",
                "rhs",
                F.concat("lhs", "rhs").alias("merged"),
                F.col("cnt").cast("bigint").alias("pair_count"),
            )
        )
        b = best.select(
            F.col("lhs").alias("_bl"), F.col("rhs").alias("_br")
        )
        seqs = (
            seqs.crossJoin(F.broadcast(b))
            .select(
                "word",
                "freq",
                F.expr(
                    "replace(seq, ' ' || _bl || ' ' || _br || ' ', "
                    "' ' || _bl || _br || ' ')"
                ).alias("seq"),
            )
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


# --------------------------------------------------------------------------
# op217: BPE apply — tokenizer cost report with the learned merges
# --------------------------------------------------------------------------


def _op217_sql() -> str:
    """op216's unrolled trainer, extended: after the merge rounds the
    per-word symbol counts are joined back to the corpus and rolled
    up per language — the 'what does this tokenizer cost on my
    corpus' report."""
    train = _op216_sql()
    # reuse the trainer's CTE chain up to seqs{N}; strip its final SELECT
    ctes = train[: train.rindex("SELECT 1 AS merge_rank")].rstrip()
    assert ctes.endswith(")"), ctes[-80:]
    n = _BPE_ROUNDS
    return f"""{ctes},
wordcost AS (
  SELECT word, len(string_split(trim(seq), ' ')) AS n_bpe,
         length(word) AS n_char
  FROM seqs{n}),
doctoks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.n_char) AS BIGINT) AS char_tokens,
       CAST(SUM(w.n_bpe) AS BIGINT) AS bpe_tokens
FROM doctoks d JOIN wordcost w ON d.word = w.word
WHERE d.word <> ''
GROUP BY d.lang
"""


@register("op217_bpe_apply", oracle=_op217_sql())
def op217_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLY: encode the corpus with op216's learned merge table
    and report per-language token costs (char-level baseline vs
    post-merge BPE count) — the measurement that decides whether a
    tokenizer's merge budget is spent on the right languages.

    Shape: merges apply to the WORD VOCABULARY (op216's compression
    insight — apply is a per-distinct-word rewrite, not a per-token
    one), then the vocab-sized (word → n_bpe) cost table joins back
    to the exploded corpus. That join is vocab⋈corpus — broadcast
    the cost side at any real scale. The merge loop re-derives
    op216's argmax pairs inside the same lazy plan, so train+apply
    is still one Catalyst program with no driver round-trip. The
    vocab-sized seqs table is persist()ed (round 19, op216's fix):
    the unrolled apply plan carried FOUR corpus-scan nodes — three
    re-derivations of the wordcount plus the doctoks leg
    (plans/r19/op217_bpe_apply_before.txt) — now the corpus is
    scanned once for the vocab and once for doctoks, the op's own
    documented shape."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    seqs = pool_persist(
        words.select(
            "word",
            "freq",
            F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")).alias(
                "seq"
            ),
        )
    )
    for _ in range(_BPE_ROUNDS):
        pairs = (
            seqs.select(
                F.split(F.trim(F.col("seq")), " ").alias("sym"), "freq"
            )
            .filter(F.expr("size(sym) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sym) - 1), "
                        "i -> struct(element_at(sym, i) as lhs, "
                        "element_at(sym, i + 1) as rhs))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("cnt"))
        )
        b = (
            pairs.orderBy(F.desc("cnt"), "lhs", "rhs")
            .limit(1)
            .select(F.col("lhs").alias("_bl"), F.col("rhs").alias("_br"))
        )
        seqs = seqs.crossJoin(F.broadcast(b)).select(
            "word",
            "freq",
            F.expr(
                "replace(seq, ' ' || _bl || ' ' || _br || ' ', "
                "' ' || _bl || _br || ' ')"
            ).alias("seq"),
        )
    wordcost = seqs.select(
        "word",
        F.size(F.split(F.trim(F.col("seq")), " ")).alias("n_bpe"),
        F.length("word").alias("n_char"),
    )
    doctoks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        doctoks.join(F.broadcast(wordcost), "word")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_char").cast("bigint").alias("char_tokens"),
            F.sum("n_bpe").cast("bigint").alias("bpe_tokens"),
        )
    )


# --------------------------------------------------------------------------
# op220: triangle counting — oriented 3-way self-join, hash-certified
# --------------------------------------------------------------------------

_OP220_SQL = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM pairs a JOIN pairs b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey),
tri AS (
  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
  FROM edges e1
  JOIN edges e2 ON e1.s2 = e2.s1
  JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2),
nodes AS (
  SELECT a AS s FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT s AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY s
"""


def _parse_size_bytes(s: str) -> int:
    """Parse a Spark size conf value ('67108864', '10MB', '1g', '-1')."""
    s = s.strip().lower()
    for suf, mult in (
        ("kb", 1024),
        ("mb", 1024**2),
        ("gb", 1024**3),
        ("tb", 1024**4),
        ("k", 1024),
        ("m", 1024**2),
        ("g", 1024**3),
        ("t", 1024**4),
        ("b", 1),
    ):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mult)
    return int(float(s))


def _triangle_counts(edges: DataFrame, broadcast_adj: bool) -> DataFrame:
    """Edge-iterator per-node triangle counts over an undirected edge
    list (s1 < s2, deduplicated): build adjacency lists once, count
    |N(u)∩N(v)| per edge with a JVM ``array_intersect``, roll up per
    node as Σ t(e) div 2. ``broadcast_adj`` picks how the adjacency
    relation attaches to the edge probe — broadcast (edge side never
    shuffles, intersect stage inherits the cached edge layout) vs the
    planner's shuffle join (same algebra, O(Σ d) arrays shuffled once;
    the guarded fallback for graphs whose adjacency outgrows the
    broadcast budget — r18-verdict item 2)."""
    adj = (
        edges.select(F.col("s1").alias("s"), F.col("s2").alias("n"))
        .unionAll(edges.select(F.col("s2").alias("s"), F.col("s1").alias("n")))
        .groupBy("s")
        .agg(F.sort_array(F.collect_list("n")).alias("nbrs"))
    )
    if broadcast_adj:
        adj = F.broadcast(adj)
    per_edge = (
        edges.join(
            adj.select(F.col("s").alias("s1"), F.col("nbrs").alias("n1")), "s1"
        )
        .join(
            adj.select(F.col("s").alias("s2"), F.col("nbrs").alias("n2")), "s2"
        )
        .select(
            "s1", "s2", F.size(F.array_intersect("n1", "n2")).alias("t")
        )
    )
    # one pass over per_edge (a unionAll of two projections would
    # re-execute the join+intersect subtree per branch)
    incident = per_edge.select(F.explode(F.array("s1", "s2")).alias("s"), "t")
    return (
        incident.groupBy(F.col("s").alias("s_suppkey"))
        .agg(F.expr("sum(t) div 2").cast("bigint").alias("n_triangles"))
        .filter(F.col("n_triangles") > 0)
    )


def _adjacency_fits_broadcast(
    spark: SparkSession, sf_dir: str, edges: DataFrame
) -> bool:
    """Size guard for op220's forced adjacency broadcast (r18-verdict
    item 2 — an unguarded F.broadcast OOMs on a hub-heavy graph at
    scale). Budget = the session's autoBroadcastJoinThreshold, the
    same scale-adaptive knob the planner's own decisions use.

    Tier 1 (no extra job on the data): worst-case adjacency payload is
    bounded by the supplier dimension — the projection graph's node
    set — at n² neighbor int64s (complete graph). When even that fits,
    broadcast without counting anything. Tier 2 (only reached at
    scales where tier 1's bound overflows): exact payload from the
    already-persisted edge frame — each edge contributes its two
    endpoints' adjacency entries exactly once, so payload ≈ 2·|E|·8
    bytes (+ per-node row overhead, subsumed by the ×2 headroom the
    byte estimate leaves vs Spark's actual broadcast cap)."""
    threshold = _parse_size_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    if threshold <= 0:
        return False
    n_nodes = load_table(spark, sf_dir, "supplier").count()
    if n_nodes * n_nodes * 8 <= threshold:
        return True
    return 2 * edges.count() * 8 <= threshold


@register(
    "op220_triangle_count",
    oracle=_OP220_SQL,
    deps=(_triangle_counts, _adjacency_fits_broadcast),
)
def op220_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node TRIANGLE COUNTS over the supplier co-supply graph
    (suppliers sharing ≥1 part) — the clustering-coefficient /
    community-density primitive, and a third graph-algorithm family
    beside op186's fixpoint and op213's traversal.

    Algorithm (REWRITTEN round 18, optimization guide §1.2/§2.3 —
    change the distributed algorithm before tuning anything): the
    EDGE-ITERATOR form. Per undirected edge (u,v) the number of
    triangles through it is |N(u) ∩ N(v)|; per-node counts follow as
    n_tri(v) = Σ_{edges e incident to v} t(e) / 2, because each
    triangle containing v is seen by exactly its two v-incident
    edges. Adjacency lists are built once (groupBy node,
    collect_list), each edge joins the two endpoint lists, and the
    intersection count is a single JVM ``array_intersect`` — no
    Python boundary, and NO materialized wedge rows. Nodes in no
    triangle never appear (sum 0 filtered), matching the
    enumeration's output exactly; DIV 2 stays in integer arithmetic.

    Rounds 12–17 used the oriented 3-way self-join (e1(a,b)⋈e2(b,c)
    closed by e3(a,c)) — exact, but it MATERIALIZES AND SHUFFLES one
    row per wedge. Measured round 17 (BASELINE 17j): ~30 suppliers/
    part saturates the bipartite projection to the COMPLETE K_1000
    graph at sf0.1 (499,500 edges = C(1000,2), DuckDB-verified), so
    the wedge join emitted all C(1000,3) ≈ 166M rows: 44.5 s noop
    (r18 sweep). The edge-iterator does the same Θ(Σ d(v)²) element
    work as in-memory array intersections inside codegen instead of
    166M shuffled rows — measured r18: 5.1 s sweep-best / 3.5 s
    steady-state after JIT warm (8.8×), bit-identical result at
    sf0.001/0.01/0.1 (plans/r18/op220_*.txt). At 100 TB the
    shuffle payload is O(Σ d(v)) adjacency ints instead of O(Σ d²)
    wedge rows; the residual risk is a hub node's adjacency array,
    and the production bound for dense projections is unchanged —
    cap/sample hub parts BEFORE projecting (op192's df-cap pattern);
    no triangle algorithm beats a dense input's Θ(Σ d²) element
    work. Exact integer counts — nothing to quantize; the oracle is
    the original enumeration algebra in DuckDB, which round 18's
    hash-equivalence run re-certified against this form."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    a = pairs.alias("a")
    b = pairs.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("s1"), F.col("b.l_suppkey").alias("s2")
        )
        .distinct()
    )
    # referenced 3× below (adjacency build ×2 + the edge probe):
    # persist so the projection+distinct runs once (op186's rule).
    # The repartition sizes the intersect stage — the Θ(Σ d²)
    # element-work stage — to the session's core count (the broadcast
    # join below preserves the stream side's partitioning, so the
    # cached layout IS that stage's task count; at 8 interactive
    # shuffle partitions the stage left 3/4 of local[32] idle —
    # measured 9.2 s vs 3.5 s interleaved).
    edges = pool_persist(
        edges.repartition(spark.sparkContext.defaultParallelism)
    )
    # undirected adjacency lists; sort_array for a deterministic
    # layout (content is a set — intersection is order-insensitive).
    # Broadcast WHEN IT FITS: the adjacency side is node-dimension-
    # sized (O(Σ d) total payload — each neighbor list ships ONCE per
    # node, never per edge) and the hint both keeps the big edge side
    # un-shuffled and lets the intersect stage inherit the cached
    # edge layout. r18 forced the hint unconditionally — an OOM on a
    # hub-heavy graph whose adjacency outgrows the broadcast budget;
    # the guard (r18-verdict item 2) sizes it against the session's
    # autoBroadcastJoinThreshold (worst-case node² bound first — free
    # at bench scale — exact 2·|E|·8 from the persisted edge frame
    # only when that overflows) and falls back to the planner's
    # shuffle join, which keeps the same algebra (the shuffle then
    # carries O(Σ d) arrays once). Both paths are value-identical —
    # pinned by tests/test_plans.py (broadcast shape at bench scale)
    # and the synthetic hub-graph fallback test.
    return _triangle_counts(
        edges, broadcast_adj=_adjacency_fits_broadcast(spark, sf_dir, edges)
    )


# --------------------------------------------------------------------------
# op221: near-dup canonicalization — LSH pairs → components → keep-best
# --------------------------------------------------------------------------


def neardup_canonicalize(docs: DataFrame) -> DataFrame:
    """Full dedup DECISION pipeline over a documents frame: exact
    3-gram-Jaccard ≥ 0.5 candidate pairs (pipeline_ext.
    ngram_jaccard_pairs, cross-source — see components.py's threshold
    rationale) → connected components (components.
    connected_components) → one KEPT doc per duplicate cluster
    (longest text wins, doc_id tiebreak — the RefinedWeb keep-best
    rule). Returns one row per cluster: (component, n_members,
    keep_doc_id, kept_n_chars, dropped_docs, dropped_chars)."""
    from pyspark.sql import Window

    from ocdb_server_spark.operators.components import (
        _EXACT_NEARDUP_THRESHOLD,
        connected_components,
    )
    from ocdb_server_spark.operators.pipeline_ext import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        docs, threshold=_EXACT_NEARDUP_THRESHOLD, same_source=False
    )
    labels = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    members = labels.join(
        docs.select("doc_id", "n_chars"), labels.id == docs.doc_id
    ).select("component", "doc_id", "n_chars")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = members.withColumn("rn", F.row_number().over(w))
    kept = ranked.filter("rn = 1").select(
        "component",
        F.col("doc_id").alias("keep_doc_id"),
        F.col("n_chars").alias("kept_n_chars"),
    )
    stats = members.groupBy("component").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    return (
        stats.join(kept, "component")
        .select(
            "component",
            "n_members",
            "keep_doc_id",
            "kept_n_chars",
            (F.col("n_members") - 1).cast("bigint").alias("dropped_docs"),
            (F.col("total_chars") - F.col("kept_n_chars"))
            .cast("bigint")
            .alias("dropped_chars"),
        )
    )


def _op221_sql() -> str:
    from ocdb_server_spark.operators.components import NEARDUP_CC_CTES

    return f"""
WITH RECURSIVE {NEARDUP_CC_CTES},
members AS (
  SELECT c.component, c.id AS doc_id, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rn
  FROM members
),
kept AS (
  SELECT component, doc_id AS keep_doc_id, n_chars AS kept_n_chars
  FROM ranked WHERE rn = 1
),
stats AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM members GROUP BY component
)
SELECT s.component, s.n_members, k.keep_doc_id,
       CAST(k.kept_n_chars AS BIGINT) AS kept_n_chars,
       CAST(s.n_members - 1 AS BIGINT) AS dropped_docs,
       CAST(s.total_chars - k.kept_n_chars AS BIGINT) AS dropped_chars
FROM stats s JOIN kept k USING (component)
"""


@register("op221_neardup_canonicalize", oracle=_op221_sql())
def op221_neardup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END near-dup canonicalization — the integration of the
    dedup family into the decision a corpus build actually ships:
    exact near-dup candidate pairs, op96's connected components, and
    the keep-best-quality rule, composed into 'which doc survives
    each duplicate cluster and how much is dropped'.

    Graduated from ROWS to a SQL oracle in round 9 (round-8 verdict
    item 5) by switching the edge relation from op79's xxhash LSH
    bands to the exact 3-gram-Jaccard ≥ 0.5 relation both engines
    compute (components.py rationale) — the DuckDB oracle restates
    the whole decision: recursive min-reachable-id components, the
    keep-longest window, and the drop accounting. The behavioral
    planted-cluster gate (test_pipeline_r6) still applies; the
    LSH→CC approximate composition keeps its own gate in
    test_components.py.

    Scale: every stage is the already-audited scale path — the
    gram-blocked pair join with the max-df cap (op89's annotated
    5-shuffle plan), min-label propagation with localCheckpoint, one
    keyed window per cluster. The composition adds no new shuffle
    class."""
    return neardup_canonicalize(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# op223: 2-D skyline (Pareto frontier) — partial skylines + merge
# --------------------------------------------------------------------------

_OP223_SQL = """
SELECT a.o_orderkey, a.o_totalprice, a.o_orderdate
FROM orders a
WHERE NOT EXISTS (
  SELECT 1 FROM orders b
  WHERE b.o_totalprice >= a.o_totalprice
    AND b.o_orderdate >= a.o_orderdate
    AND (b.o_totalprice > a.o_totalprice OR b.o_orderdate > a.o_orderdate)
)
"""


def _skyline_kernel(it):
    """Vectorized 2-D skyline of (price, date), both maximized: sort
    by price desc / date desc; a row survives iff its date equals its
    price-group's max AND strictly exceeds the best date seen in any
    strictly-higher price group. Equal (price, date) ties all survive
    (neither strictly dominates)."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        if len(pdf) == 0:
            continue
        price = pdf["o_totalprice"].to_numpy()
        date = pdf["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((-date, -price))
        p, d = price[order], date[order]
        new_group = np.concatenate(([True], p[1:] != p[:-1]))
        grp_id = np.cumsum(new_group) - 1
        cm = np.maximum.accumulate(d)
        last_of_group = np.where(np.concatenate((new_group[1:], [True])))[0]
        best_before_group = np.concatenate(
            ([np.iinfo(np.int64).min], cm[last_of_group[:-1]])
        )
        best_before = best_before_group[grp_id]
        group_max = d[np.where(new_group)[0]][grp_id]
        survive = (d == group_max) & (d > best_before)
        keep = order[survive]
        yield pdf.iloc[keep][["o_orderkey", "o_totalprice", "o_orderdate"]]


@register("op223_skyline", oracle=_OP223_SQL)
def op223_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) of orders maximizing
    (o_totalprice, o_orderdate) — the multi-criteria "best trade-off"
    query (Börzsönyi 2001), a relational surface neither engine has a
    native operator for.

    Distributed algorithm: the skyline is MERGEABLE — phase 1 computes
    each partition's partial skyline with a fully vectorized
    sort + strict-prefix-cummax numpy kernel (O(n log n), no Python
    row loop), phase 2 re-runs the SAME kernel over the union of
    partials in one task. Correct because every dominator of a
    non-skyline point can be chosen from the global skyline, and
    global skyline points survive any partition's partial pass — so
    dominated points cannot sneak through and skyline points cannot
    be lost. At 100 TB the shuffle carries only partial-skyline rows
    (typically O(distinct prices per partition) — tiny vs the scan);
    the final pass is one task over frontier candidates.

    Certified against the oracle's QUADRATIC NOT-EXISTS restatement —
    the naive semantics, independently evaluated, must equal the
    two-phase algorithm exactly (dominance ties included: equal
    (price, date) rows all survive, neither strictly dominates).
    Comparisons only — no arithmetic — so doubles/timestamps need no
    quantization."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    schema = "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    partials = o.mapInPandas(_skyline_kernel, schema)
    return partials.repartition(1).mapInPandas(_skyline_kernel, schema)


# --------------------------------------------------------------------------
# op224: feature hashing (the hashing trick) — integer-exact sparse pooling
# --------------------------------------------------------------------------

_FH_BUCKETS = 32
_FH_MULT = 2654435761  # Knuth; bucket = mulmod32(key) % B, sign from bit 16


def _fh_exprs(key_expr: str, int_div: str) -> tuple[str, str]:
    """(bucket, sign) expressions over an integer key — engine-portable:
    bucket from the low bits of the mixed hash, sign from a mid bit
    (bit 16) so bucket and sign are decorrelated."""
    mixed = _cms_mulmod32(key_expr, _FH_MULT, int_div)
    bucket = f"({mixed} % {_FH_BUCKETS})"
    sign = f"(CASE WHEN ({mixed} {int_div} 65536) % 2 = 0 THEN 1 ELSE -1 END)"
    return bucket, sign


def _op224_sql() -> str:
    key = "('0x' || substr(md5(word), 1, 6))::BIGINT"
    bucket, sign = _fh_exprs(key, "//")
    return f"""
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
w AS (SELECT lang, word FROM toks WHERE word <> '')
SELECT lang, CAST({bucket} AS INTEGER) AS bucket,
       CAST(SUM({sign}) AS BIGINT) AS value,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM w GROUP BY lang, bucket
"""


@register("op224_feature_hashing", oracle=_op224_sql())
def op224_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATURE HASHING (the hashing trick, Weinberger 2009): token
    features pooled into a FIXED 32-dim signed sparse vector per
    language — the no-vocabulary featurization that makes streaming /
    unbounded-cardinality features trainable (no dictionary build, no
    OOV, memory fixed at B buckets). The signed hash keeps pooled
    sums unbiased (E[collision contribution] = 0).

    Engine-portable end to end: token → 24-bit md5 key (op215's
    idiom) → _mulmod32 mix → bucket from low bits, SIGN from bit 16
    (decorrelated), ±1 sums in int64 — deterministic algebra, full
    SQL oracle. Scale: one explode + one map-side-combined groupBy to
    (groups × 32) rows; the pooled vector never exceeds B entries
    per group no matter the vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    bucket, sign = _fh_exprs(_CMS_KEY_SPARK, "div")
    return (
        toks.selectExpr(
            "lang", f"cast({bucket} as int) as bucket", f"{sign} as sgn"
        )
        .groupBy("lang", "bucket")
        .agg(
            F.sum("sgn").cast("bigint").alias("value"),
            F.count("*").cast("bigint").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# op225: temporal train/test split + cold-start leakage audit
# --------------------------------------------------------------------------

_TSPLIT_CUT = "2024-01-20 00:00:00"  # events span Jan 2024: ~2/3 train, 1/3 test


_OP225_SQL = f"""
WITH tagged AS (
  SELECT user_id, event_type,
         CASE WHEN ts < TIMESTAMP '{_TSPLIT_CUT}' THEN 'train' ELSE 'test' END
           AS split
  FROM events),
train_users AS (
  SELECT DISTINCT user_id FROM tagged WHERE split = 'train')
SELECT t.event_type,
       CAST(SUM(CASE WHEN t.split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(SUM(CASE WHEN t.split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_test,
       CAST(SUM(CASE WHEN t.split = 'test'
                      AND tu.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cold_start
FROM tagged t LEFT JOIN train_users tu ON t.user_id = tu.user_id
GROUP BY t.event_type
"""


@register("op225_temporal_split", oracle=_OP225_SQL)
def op225_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL train/test split + cold-start audit — op176's
    hash-split sibling for the time-ordered case: evaluation on
    future data demands a time cutoff, and the first thing to audit
    is COLD-START leakage (test rows from users the train window
    never saw — the rows a per-user model cannot score). Reports per
    event_type: train rows, test rows, cold-start test rows.

    Scale: one scan + one distinct on user_id + one left join keyed
    on user_id (broadcast when the train-user set is small, shuffle
    otherwise — Catalyst's call) + one agg. The cutoff predicate on a
    time-partitioned lake table prunes partitions on both sides."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.when(F.col("ts") < F.lit(_TSPLIT_CUT).cast("timestamp"), "train")
        .otherwise("test")
        .alias("split"),
    )
    train_users = (
        ev.filter("split = 'train'").select("user_id").distinct()
        .withColumn("seen", F.lit(1))
    )
    return (
        ev.join(train_users, "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
            .cast("bigint")
            .alias("n_train"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
            .cast("bigint")
            .alias("n_test"),
            F.sum(
                F.when(
                    (F.col("split") == "test") & F.col("seen").isNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_cold_start"),
        )
    )


# --------------------------------------------------------------------------
# op227: score calibration bins (reliability diagram) — integer-exact
# --------------------------------------------------------------------------

_CAL_BINS = 10

_OP227_SQL = f"""
WITH scored AS (
  SELECT n_chars,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents),
rng AS (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM scored),
binned AS (
  SELECT LEAST(({_CAL_BINS} * (s.n_chars - r.lo))
                    // (r.hi - r.lo + 1), {_CAL_BINS - 1}) AS bin,
         s.pos
  FROM scored s CROSS JOIN rng r)
SELECT CAST(bin AS INTEGER) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(pos) AS DOUBLE) / COUNT(*) AS pos_rate
FROM binned GROUP BY bin
"""


@register("op227_calibration_bins", oracle=_OP227_SQL)
def op227_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score CALIBRATION bins (reliability diagram): equal-width
    score bins × observed positive rate — with op214's AUC this
    completes the pre-gating evaluation pair every quality-classifier
    deployment runs (AUC says the score RANKS; calibration says the
    score's VALUE means what a threshold assumes).

    Integer discipline: bin = floor(B·(x−lo) / (hi−lo+1)) in exact
    integer arithmetic (the +1 keeps the max in the last bin without
    a float epsilon), min/max broadcast from a 1-row aggregate;
    pos_rate is one exact-int IEEE division per bin. Scale: two scans
    (stats + binning — a cached/known-stats table makes it one) and
    a B-row aggregate; nothing shuffles but the bin partials."""
    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    rng = d.agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    )
    binned = d.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.expr(
                f"cast(({_CAL_BINS} * (score - lo)) div (hi - lo + 1) as bigint)"
            ),
            F.lit(_CAL_BINS - 1),
        ).alias("bin"),
        "pos",
    )
    return binned.groupBy(F.col("bin").cast("int").alias("bin")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        (F.sum("pos").cast("double") / F.count("*")).alias("pos_rate"),
    )


# --------------------------------------------------------------------------
# op228: merge-on-read position deletes — Iceberg-v2 semantics, pure Spark
# --------------------------------------------------------------------------

_OP228_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_live,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_cents
FROM orders
WHERE o_orderkey % 7 <> 0
GROUP BY o_orderpriority
"""


@register("op228_mor_position_deletes", oracle=_OP228_SQL)
def op228_mor_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ position deletes — the Iceberg-v2 / Delta
    deletion-vector read path (round-5 verdict "missing" item 3's
    semantics), expressed in pure Spark since the table-format jars
    are absent: a base table written as immutable parquet files, a
    POSITION-delete file of (file_path, row_index) pairs (addressed
    by physical position via Spark's `_metadata` hidden columns, NOT
    by key — the point of position deletes: no key lookup, no base
    rewrite), and the read path = base ANTI-JOIN deletes on
    (file_path, row_index).

    Certification closes the loop end to end: deletes are generated
    from a predicate (o_orderkey % 7 = 0), the MoR read must
    reproduce EXACTLY the oracle's predicate-filtered aggregate —
    any positional misaddressing (row_index drift, file renaming,
    anti-join key bug) breaks the hash.

    Scale: the delete side is (path, bigint) pairs — tiny vs the
    base; real engines push the anti-join into the scan as a bitmap
    filter per file, which is the same join keyed the same way. The
    base never rewrites; deletes accumulate until compaction
    (op178's planner)."""
    # per-process scratch (r9: this op missed the r8 scratch_dir
    # migration — a fixed sf-tagged dir lets one session overwrite
    # the base files another session's lazy deletes-join still reads)
    from ocdb_server_spark.scratch import scratch_dir

    tag = scratch_dir("mor", sf_dir)
    base_path = os.path.join(tag, "base")
    del_path = os.path.join(tag, "deletes")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    o.repartition(4).write.mode("overwrite").parquet(base_path)
    base = spark.read.parquet(base_path).select(
        "o_orderkey",
        "o_totalprice",
        "o_orderpriority",
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.row_index").alias("_pos"),
    )
    # writer-side: resolve the predicate ONCE to physical positions
    (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .select("_file", "_pos")
        .write.mode("overwrite")
        .parquet(del_path)
    )
    deletes = spark.read.parquet(del_path)
    live = base.join(
        F.broadcast(deletes),
        (base["_file"] == deletes["_file"]) & (base["_pos"] == deletes["_pos"]),
        "left_anti",
    )
    return live.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_live"),
        F.sum("o_orderkey").cast("bigint").alias("sum_key"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_price_cents"),
    )


# --------------------------------------------------------------------------
# op229: deterministic negative sampling — contrastive-pair construction
# --------------------------------------------------------------------------

_NEG_K = 3
_NEG_PRIME = 40503  # odd step decorrelated from the Knuth constant


def _op229_sql() -> str:
    ks = ", ".join(str(i) for i in range(_NEG_K))
    mixed = _cms_mulmod32(f"(d.doc_id * {_NEG_K} + t.i)", 2654435761, "//")
    return f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
cand AS (
  SELECT d.doc_id, d.lang, t.i,
         ({mixed} + {_NEG_PRIME} * t.i) % n.n_docs AS raw_neg
  FROM documents d CROSS JOIN n, (SELECT unnest([{ks}]) AS i) t),
pairs AS (
  SELECT c.doc_id, c.lang, c.i,
         CASE WHEN c.raw_neg = c.doc_id
              THEN (c.raw_neg + 1) % n.n_docs
              ELSE c.raw_neg END AS neg_id
  FROM cand c CROSS JOIN n)
SELECT p.lang, d2.lang AS neg_lang,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(d2.n_chars) AS BIGINT) AS sum_neg_chars
FROM pairs p JOIN documents d2 ON p.neg_id = d2.doc_id
GROUP BY p.lang, neg_lang
"""


@register("op229_negative_sampling", oracle=_op229_sql())
def op229_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for contrastive training: each
    document draws k=3 pseudo-random negatives by pure hash
    arithmetic (mulmod32 mix + decorrelated per-slot stride, mod
    corpus size, self-collision bumped) — reproducible across
    re-runs, partitionings and cluster sizes (op176's property,
    extended to PAIR construction), so a training job can rebuild
    the exact pair set from ids alone, no stored pair table.

    Requires contiguous 0..n-1 doc_ids (true of this corpus; a real
    deployment first densifies ids — op98's shard-assign does
    exactly that mapping). Plan: the only data motion is the join of
    (doc_id, neg_id) pairs to the docs table on neg_id — k rows per
    doc, shuffle carries ids; certified via the per-(lang, neg_lang)
    pair-mix aggregate, which any mis-draw perturbs."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()  # scalar corpus size: bounded driver value (like op95's K)
    slots = spark.range(_NEG_K).select(F.col("id").cast("int").alias("i"))
    mixed = _cms_mulmod32(f"(doc_id * {_NEG_K} + i)", 2654435761, "div")
    cand = (
        docs.select("doc_id", "lang")
        .crossJoin(F.broadcast(slots))
        .selectExpr(
            "doc_id",
            "lang",
            "i",
            f"({mixed} + {_NEG_PRIME} * i) % {n} as raw_neg",
        )
        .selectExpr(
            "doc_id",
            "lang",
            "i",
            f"case when raw_neg = doc_id then (raw_neg + 1) % {n} "
            "else raw_neg end as neg_id",
        )
    )
    d2 = docs.select(
        F.col("doc_id").alias("neg_id"),
        F.col("lang").alias("neg_lang"),
        F.col("n_chars").alias("neg_chars"),
    )
    return (
        cand.join(d2, "neg_id")
        .groupBy("lang", "neg_lang")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("neg_chars").cast("bigint").alias("sum_neg_chars"),
        )
    )


# --------------------------------------------------------------------------
# op230: Hilbert-curve layout — unrolled integer recurrence, both engines
# --------------------------------------------------------------------------

_HIL_N = 256  # 256×256 grid → 8 unrolled steps
_HIL_CHUNK = 256  # cells per layout chunk (≙ target file)


def _hilbert_steps(int_div: str) -> list[tuple[str, str, str]]:
    """The xy→d recurrence unrolled: per step s ∈ {128,…,1} emit
    (d_expr, x_expr, y_expr) over columns named x, y, d. flip
    constant N−1 (both the N−1 and s−1 textbook variants were
    property-verified as true Hilbert curves — bijective with
    unit-step adjacency on the full grid; tests pin this one)."""
    steps = []
    s = _HIL_N // 2
    while s > 0:
        rx = f"((x {int_div} {s}) % 2)"
        ry = f"((y {int_div} {s}) % 2)"
        d = (
            f"d + {s * s} * (CASE WHEN {rx} = 1 "
            f"THEN 3 - {ry} ELSE {ry} END)"
        )
        x = (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {_HIL_N - 1} - y ELSE y END) ELSE x END"
        )
        y = (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {_HIL_N - 1} - x ELSE x END) ELSE y END"
        )
        steps.append((d, x, y))
        s //= 2
    return steps


def _op230_sql() -> str:
    ctes = [
        "h0 AS (SELECT o_custkey % 256 AS x,"
        " CAST(epoch(o_orderdate) AS BIGINT) // 86400 % 256 AS y,"
        " CAST(0 AS BIGINT) AS d, o_custkey % 256 AS x0,"
        " CAST(epoch(o_orderdate) AS BIGINT) // 86400 % 256 AS y0"
        " FROM orders"
    ]
    for k, (d, x, y) in enumerate(_hilbert_steps("//"), start=1):
        ctes.append(
            f"h{k} AS (SELECT ({x}) AS x, ({y}) AS y, ({d}) AS d, x0, y0"
            f" FROM h{k - 1}"
        )
    n = len(_hilbert_steps("//"))
    return (
        "WITH "
        + "),\n".join(ctes)
        + f""")
SELECT d // {_HIL_CHUNK} AS chunk,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(x0) AS BIGINT) AS min_x, CAST(MAX(x0) AS BIGINT) AS max_x,
       CAST(MIN(y0) AS BIGINT) AS min_y, CAST(MAX(y0) AS BIGINT) AS max_y
FROM h{n} GROUP BY chunk
"""
    )


@register("op230_hilbert_layout", oracle=_op230_sql())
def op230_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT-CURVE layout keys — op161's Z-order sibling and the
    curve real lakehouses prefer (Hilbert preserves locality strictly
    better: consecutive keys are ALWAYS grid-adjacent, where Z-order
    jumps at quadrant seams). The xy→d recurrence (8 rotation steps
    for a 256×256 grid) is pure integer CASE arithmetic, unrolled
    identically into the Spark plan and the oracle's chained CTEs —
    op186's discipline applied to a bit-twiddling kernel; the python
    property test proves the mapping is a true Hilbert curve
    (bijection + unit-step adjacency over the full grid), and the
    hash proves both engines compute that same curve.

    The layout measurement: rows binned into 256-cell curve chunks
    (≙ one output file each) report their (x, y) bounding boxes —
    the min/max ranges a file-skipping reader (op181) would prune
    on; Hilbert chunks have near-square boxes, which is the whole
    point. One scan + one agg; the key is computed in the row
    projection, exactly how a writer would `ORDER BY hilbert_d`
    (op179's repartition+sort) before writing."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_custkey % 256 AS x",
        "unix_date(cast(o_orderdate as date)) % 256 AS y",
        "cast(0 as bigint) AS d",
        "o_custkey % 256 AS x0",
        "unix_date(cast(o_orderdate as date)) % 256 AS y0",
    )
    for d, x, y in _hilbert_steps("div"):
        o = o.selectExpr(
            f"({x}) AS x", f"({y}) AS y", f"({d}) AS d", "x0", "y0"
        )
    return o.groupBy(
        F.expr(f"d div {_HIL_CHUNK}").alias("chunk")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("x0").cast("bigint").alias("min_x"),
        F.max("x0").cast("bigint").alias("max_x"),
        F.min("y0").cast("bigint").alias("min_y"),
        F.max("y0").cast("bigint").alias("max_y"),
    )


# --------------------------------------------------------------------------
# op231: Holt linear forecasting — grouped sequential recurrence,
#        applyInPandas vs WITH RECURSIVE, integer-exact
# --------------------------------------------------------------------------

_HW_OFF = 1 << 41  # halving with possibly-negative operands: f2(x) =
# (x + 2^41) div 2 − 2^40 equals floor(x/2) in Spark (`div` truncates,
# but x + 2^41 ≥ 0 makes trunc == floor), DuckDB (`//`) and python —
# the op186 portability rule extended to signed recurrences.
_HW_H = 3  # forecast horizon (days)


def _hw_f2(x: str, int_div: str) -> str:
    return f"((({x}) + {_HW_OFF}) {int_div} 2 - {_HW_OFF // 2})"


def _op231_sql() -> str:
    f2 = lambda x: _hw_f2(x, "//")  # noqa: E731
    l2 = f2("d.y + h.l + h.b")
    return f"""
WITH RECURSIVE bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
spine AS (
  SELECT et.event_type, CAST(t.i AS BIGINT) AS t
  FROM (SELECT DISTINCT event_type FROM events) et,
       bounds b, UNNEST(range(0, CAST(b.d1 - b.d0 AS BIGINT) + 1)) t(i)),
counts AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - b.d0 AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events CROSS JOIN bounds b
  GROUP BY event_type, t),
daily AS (
  SELECT s.event_type, s.t, COALESCE(c.y, 0) AS y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s.t = c.t),
maxt AS (SELECT MAX(t) AS m FROM daily),
init AS (
  SELECT d0.event_type, d0.y AS y0, d1.y AS y1
  FROM daily d0 JOIN daily d1
    ON d0.event_type = d1.event_type AND d0.t = 0 AND d1.t = 1),
hw AS (
  SELECT event_type, CAST(0 AS BIGINT) AS t,
         y0 AS l, y1 - y0 AS b
  FROM init
  UNION ALL
  SELECT h.event_type, h.t + 1,
         {l2} AS l,
         {f2(f"h.b + ({l2}) - h.l")} AS b
  FROM hw h
  JOIN daily d ON d.event_type = h.event_type AND d.t = h.t + 1
  CROSS JOIN maxt m
  WHERE h.t + 1 <= m.m
)
SELECT h.event_type, h.l AS level, h.b AS trend,
       h.l + 1 * h.b AS fc_1,
       h.l + 2 * h.b AS fc_2,
       h.l + 3 * h.b AS fc_3
FROM hw h CROSS JOIN maxt m WHERE h.t = m.m
"""


@register("op231_holt_forecast", oracle=_op231_sql())
def op231_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT LINEAR (double-exponential) forecasting of daily event
    volumes per event_type, α=β=1/2 — the grouped SEQUENTIAL
    RECURRENCE family: each day's (level, trend) depends on the
    previous day's, so unlike every aggregate in this package the
    computation is inherently ordered WITHIN a key. The Spark-idiomatic
    shape for that is applyInPandas: one task per key runs the tiny
    ordered loop over its ~30 daily rows (the same per-key-sequential
    argument as sessionization), while keys parallelize freely —
    at 10^6 series this is one shuffle on the series key and a
    30-step python loop per series.

    The oracle is DuckDB's actual WITH RECURSIVE stepping the SAME
    integer recurrence (op213's independent-recursion pairing, now
    over ordered rows): α=1/2 halving is f2(x) = (x+2^41) div 2 −
    2^40, which equals floor(x/2) in Spark/DuckDB/python even for
    negative trends — so level, trend and the h=1..3 forecasts are
    bit-identical. Day spine is zero-filled (a missing day IS a 0
    observation; alignment bug on either side breaks the hash)."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    counts = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).cast("bigint").alias("t"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(cast(0 as bigint), cast(datediff(d1, d0) as bigint))")
            ).alias("t"),
        )
    )
    daily = spine.join(counts, ["event_type", "t"], "left").select(
        "event_type", "t", F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y")
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        ys = pdf["y"].astype(int).tolist()
        f2 = lambda x: (x + _HW_OFF) // 2 - _HW_OFF // 2  # noqa: E731
        l, bt = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            l_new = f2(y + l + bt)
            bt = f2(bt + l_new - l)
            l = l_new
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "level": [l],
                "trend": [bt],
                **{f"fc_{h}": [l + h * bt] for h in range(1, _HW_H + 1)},
            }
        )

    schema = (
        "event_type string, level long, trend long, "
        + ", ".join(f"fc_{h} long" for h in range(1, _HW_H + 1))
    )
    return daily.groupBy("event_type").applyInPandas(holt, schema)


# --------------------------------------------------------------------------
# op232: int64 day-presence bitmaps — bitmap-index algebra in pure SQL
# --------------------------------------------------------------------------

_OP232_SQL = """
WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
bm AS (
  SELECT user_id,
         bit_or(CASE WHEN event_type = 'click'
                     THEN CAST(1 AS BIGINT) << CAST(CAST(ts AS DATE) - d.d0 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END) AS bm_click,
         bit_or(CASE WHEN event_type = 'purchase'
                     THEN CAST(1 AS BIGINT) << CAST(CAST(ts AS DATE) - d.d0 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END) AS bm_purchase
  FROM events CROSS JOIN b d
  GROUP BY user_id)
SELECT CAST(bit_count(bm_click) AS BIGINT) AS click_days,
       CAST(bit_count(bm_purchase) AS BIGINT) AS purchase_days,
       CAST(bit_count(bm_click & bm_purchase) AS BIGINT) AS coactive_days,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id
FROM bm
GROUP BY click_days, purchase_days, coactive_days
"""


@register("op232_day_bitmaps", oracle=_OP232_SQL)
def op232_day_bitmaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITMAP-INDEX algebra on int64 words: per-user day-presence
    bitmaps (bit i = active on day i; the 30-day window fits one
    int64) built with `bit_or(1 << day)` and queried with `&` +
    `bit_count` — the retention/co-activity representation bitmap
    engines (roaring, Pilosa-style) scale to billions of users,
    expressed here entirely in JVM integer aggregates: a bitmap is
    ONE int64 per (user, type) regardless of event count, the AND is
    free, and popcount is a single instruction.

    Output: the (click_days, purchase_days, coactive_days) retention
    histogram with user-checksums — any bit placed on the wrong day
    or a broken AND changes a histogram cell. Scale: one map-side
    combined groupBy(user) — shuffle carries 2 int64 words per user —
    then a histogram agg; longer windows shard into array<bigint>
    word vectors with zip_with(OR), same algebra."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    bm = (
        ev.crossJoin(F.broadcast(b))
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).alias("day"),
            "event_type",
        )
        # ENFORCED single-word guard (round-6 ADVICE): Spark's shiftleft
        # wraps the shift count mod 64 while DuckDB's << does not, so a
        # fixture spanning >63 days would silently fold day 64 onto bit 0
        # on the Spark side only. assert_true makes a widened fixture
        # FAIL the run instead; the documented widening path is
        # array<bigint> word vectors with zip_with(OR).
        .select(
            "user_id",
            F.expr(
                "ifnull(assert_true(day BETWEEN 0 AND 63,"
                " 'op232_day_bitmaps: day offset outside [0, 63] --"
                " widen the bitmap to array<bigint> word vectors'), day)"
            ).alias("day"),
            "event_type",
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "bit_or(CASE WHEN event_type = 'click' "
                "THEN shiftleft(cast(1 as bigint), day) ELSE cast(0 as bigint) END)"
            ).alias("bm_click"),
            F.expr(
                "bit_or(CASE WHEN event_type = 'purchase' "
                "THEN shiftleft(cast(1 as bigint), day) ELSE cast(0 as bigint) END)"
            ).alias("bm_purchase"),
        )
    )
    return (
        bm.select(
            F.bit_count("bm_click").cast("bigint").alias("click_days"),
            F.bit_count("bm_purchase").cast("bigint").alias("purchase_days"),
            F.bit_count(F.expr("bm_click & bm_purchase"))
            .cast("bigint")
            .alias("coactive_days"),
            "user_id",
        )
        .groupBy("click_days", "purchase_days", "coactive_days")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("user_id").cast("bigint").alias("sum_user_id"),
        )
    )


# --------------------------------------------------------------------------
# op233: interval coverage — merge overlapping spans, exact covered time
# --------------------------------------------------------------------------

_COV_SPAN_US = 300_000_000  # each event covers [ts, ts + 5 min)

_OP233_SQL = f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_COV_SPAN_US} AS e
  FROM events),
m AS (
  SELECT user_id, event_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS max_e_before
  FROM iv),
g AS (
  -- grp window MUST order by the same total key (s, event_id) as the
  -- max_e_before window: every span has e = s + span, so (s, e) ties
  -- whenever (s) ties, and a ROWS frame over a nondeterministic tie
  -- order could place a flagged row after its tied peer, assigning the
  -- peer to the PREVIOUS merged span (round-6 ADVICE item).
  SELECT user_id, s, e,
         SUM(CASE WHEN max_e_before IS NULL OR s > max_e_before
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, event_id
                 ROWS UNBOUNDED PRECEDING) AS grp
  FROM m),
merged AS (
  SELECT user_id, grp, MIN(s) AS s, MAX(e) AS e
  FROM g GROUP BY user_id, grp)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(e - s) AS BIGINT) AS covered_us,
       CAST(MIN(s) AS BIGINT) AS first_s,
       CAST(MAX(e) AS BIGINT) AS last_e
FROM merged GROUP BY user_id
"""


@register("op233_interval_coverage", oracle=_OP233_SQL)
def op233_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL COVERAGE (union of overlapping spans): each event
    covers [ts, ts+5 min); per user, overlapping spans merge and the
    op reports merged-span count + exact covered microseconds — the
    uptime/SLA/presence measurement (and op111's continuous-time
    sibling: gaps-and-islands over real intervals, not discrete
    days).

    The sweep is one pass: per-user window orders spans and compares
    each start against the running MAX END of everything before it
    (not the previous row's end — an earlier long span can swallow
    later short ones; using lag(e) is the classic wrong answer,
    which the oracle's identical max-before formulation would catch
    if either side regressed to it). All int64 microseconds — exact.
    Scale: one keyed window + two keyed aggs, shuffle carries
    (user_id, s, e) triples; at 10^12 events this is one
    sort-within-user pass, the same shape as sessionization."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    iv = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("s"),
        (F.expr("unix_micros(ts)") + _COV_SPAN_US).alias("e"),
    )
    w_before = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = iv.withColumn("max_e_before", F.max("e").over(w_before))
    # Ordered by (s, event_id) — the SAME total order as w_before. e is
    # always s + _COV_SPAN_US, so (s, e) ties exactly when (s) ties, and
    # a ROWS running sum over an under-specified tie order could sort a
    # flagged row after its tied peer, double-counting coverage
    # (round-6 ADVICE item; oracle's g CTE mirrors this key).
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = m.withColumn(
        "grp",
        F.sum(
            F.when(
                F.col("max_e_before").isNull()
                | (F.col("s") > F.col("max_e_before")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    merged = g.groupBy("user_id", "grp").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("covered_us"),
        F.min("s").cast("bigint").alias("first_s"),
        F.max("e").cast("bigint").alias("last_e"),
    )


# --------------------------------------------------------------------------
# op235: seasonal Holt-Winters (additive, m=7) — recurrence with a
#        seasonal-state vector, applyInPandas vs WITH RECURSIVE
# --------------------------------------------------------------------------

_HWS_M = 7  # weekly seasonality
_HWS_H = 7  # forecast a full season ahead


def _op235_sql() -> str:
    f2 = lambda x: _hw_f2(x, "//")  # noqa: E731
    s_cols = ", ".join(f"s{i}" for i in range(_HWS_M))
    # seasonal slot of step t+1: CASE (t+1) % 7 over the s columns
    slot = (
        "CASE CAST((h.t + 1) % 7 AS INTEGER) "
        + " ".join(f"WHEN {i} THEN h.s{i}" for i in range(_HWS_M))
        + " END"
    )
    l2 = f2(f"d.y - ({slot}) + h.l + h.b")
    s_updates = ", ".join(
        f"CASE WHEN (h.t + 1) % 7 = {i} "
        f"THEN {f2(f'd.y - ({l2}) + h.s{i}')} ELSE h.s{i} END AS s{i}"
        for i in range(_HWS_M)
    )
    s_inits = ", ".join(
        f"y{i} - l_init AS s{i}" for i in range(_HWS_M)
    )
    y_cols = ", ".join(
        f"MAX(CASE WHEN t = {i} THEN y END) AS y{i}" for i in range(_HWS_M)
    )
    fc = ", ".join(
        f"h.l + {h} * h.b + (CASE CAST((h.t + {h}) % 7 AS INTEGER) "
        + " ".join(f"WHEN {i} THEN h.s{i}" for i in range(_HWS_M))
        + f" END) AS fc_{h}"
        for h in range(1, _HWS_H + 1)
    )
    return f"""
WITH RECURSIVE bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
spine AS (
  SELECT et.event_type, CAST(t.i AS BIGINT) AS t
  FROM (SELECT DISTINCT event_type FROM events) et,
       bounds b, UNNEST(range(0, CAST(b.d1 - b.d0 AS BIGINT) + 1)) t(i)),
counts AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - b.d0 AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events CROSS JOIN bounds b
  GROUP BY event_type, t),
daily AS (
  SELECT s.event_type, s.t, COALESCE(c.y, 0) AS y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s.t = c.t),
maxt AS (SELECT MAX(t) AS m FROM daily),
week1 AS (
  SELECT event_type, {y_cols},
         -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which would propagate
         -- int128 through the whole recurrence and repr-diverge
         CAST((SUM(CASE WHEN t < 7 THEN y ELSE 0 END)) // 7 AS BIGINT)
           AS l_init
  FROM daily WHERE t < 7 GROUP BY event_type),
hw AS (
  SELECT event_type, CAST(6 AS BIGINT) AS t, l_init AS l,
         CAST(0 AS BIGINT) AS b, {s_inits}
  FROM week1
  UNION ALL
  SELECT h.event_type, h.t + 1,
         {l2} AS l,
         {f2(f"h.b + ({l2}) - h.l")} AS b,
         {s_updates}
  FROM hw h
  JOIN daily d ON d.event_type = h.event_type AND d.t = h.t + 1
  CROSS JOIN maxt m
  WHERE h.t + 1 <= m.m
)
SELECT h.event_type, h.l AS level, h.b AS trend, {fc}
FROM hw h CROSS JOIN maxt m WHERE h.t = m.m
"""


@register("op235_holt_winters_seasonal", oracle=_op235_sql())
def op235_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL Holt-Winters (additive, weekly m=7, α=β=γ=1/2) —
    op231's recurrence upgraded with a seasonal-state VECTOR: the
    per-step state is (level, trend, s[0..6]) and only one seasonal
    slot updates per day, so the oracle's WITH RECURSIVE carries the
    seven s-columns and CASE-selects the active slot — the integer
    recurrence discipline extended from scalar state (op186) through
    2-tuple state (op231) to vector state.

    Init, documented and identical both sides: level = week-1 mean
    (integer div — counts are non-negative), trend = 0, s_i =
    y_i − level; recurrence runs t = 7..T; forecasts h = 1..7 are
    l + h·b + s[(T+h) mod 7] — a full season ahead, bit-exact. The
    signed halving is op231's f2 (floor(x/2) in all three engines).

    Same scale shape as op231: applyInPandas runs the ordered loop
    once per series (state is 9 ints, loop is ~30 steps); series
    parallelize across one keyed shuffle."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    counts = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).cast("bigint").alias("t"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(cast(0 as bigint), cast(datediff(d1, d0) as bigint))")
            ).alias("t"),
        )
    )
    daily = spine.join(counts, ["event_type", "t"], "left").select(
        "event_type", "t", F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y")
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        ys = pdf["y"].astype(int).tolist()
        f2 = lambda x: (x + _HW_OFF) // 2 - _HW_OFF // 2  # noqa: E731
        l = sum(ys[:_HWS_M]) // _HWS_M
        bt = 0
        s = [ys[i] - l for i in range(_HWS_M)]
        for t in range(_HWS_M, len(ys)):
            y = ys[t]
            slot = t % _HWS_M
            l_new = f2(y - s[slot] + l + bt)
            bt = f2(bt + l_new - l)
            s[slot] = f2(y - l_new + s[slot])
            l = l_new
        t_last = len(ys) - 1
        out = {
            "event_type": [pdf["event_type"].iloc[0]],
            "level": [l],
            "trend": [bt],
        }
        for h in range(1, _HWS_H + 1):
            out[f"fc_{h}"] = [l + h * bt + s[(t_last + h) % _HWS_M]]
        return pd.DataFrame(out)

    schema = (
        "event_type string, level long, trend long, "
        + ", ".join(f"fc_{h} long" for h in range(1, _HWS_H + 1))
    )
    return daily.groupBy("event_type").applyInPandas(hw, schema)


# --------------------------------------------------------------------------
# op236: python-datasource FILTER PUSHDOWN — predicate → partition pruning
# --------------------------------------------------------------------------

_PDS_ROWS = 2048
_PDS_PARTS = 8
_PDS_LO, _PDS_HI = 600, 1500  # pushed range: prunes 8 chunks down to 4

_OP236_SQL = f"""
SELECT CAST((i * 2654435761) % 10000 // 1000 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((i * 2654435761) % 10000) AS BIGINT) AS checksum,
       CAST(MIN(i) AS BIGINT) AS min_id,
       CAST(MAX(i) AS BIGINT) AS max_id
FROM range(0, {_PDS_ROWS}) t(i)
WHERE i >= {_PDS_LO} AND i < {_PDS_HI}
GROUP BY bucket
"""


@register("op236_pyds_filter_pushdown", oracle=_OP236_SQL)
def op236_pyds_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER PUSHDOWN through the Python DataSource API (Spark 4.1's
    `pushFilters` — op152's connector upgraded from "rows flow" to
    "predicates flow"): range predicates on `id` are absorbed by the
    reader and become PARTITION PRUNING — `partitions()` emits only
    chunks overlapping [lo, hi), so the filtered scan schedules 4 of
    8 tasks and never generates the pruned rows (asserted by task
    count in tests/test_pipeline_r6.py). Unsupported filters are
    yielded back per the API's remainder contract, so absorbing can
    narrow but never change results — the oracle applies the SAME
    predicate to the closed-form stream and must hash-match.

    Conf hygiene (op182's rule): the gate
    `spark.sql.python.filterPushdown.enabled` is flipped on only for
    this plan's construction and restored after."""
    from ocdb_server_spark.sources import pyds

    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        pyds.register_pushdown(spark)
        src = (
            spark.read.format("synth_events_pushdown")
            .option("rows", _PDS_ROWS)
            .option("partitions", _PDS_PARTS)
            .load()
            .filter((F.col("id") >= _PDS_LO) & (F.col("id") < _PDS_HI))
        )
        out = src.groupBy(
            (F.col("hval") / 1000).cast("bigint").alias("bucket")
        ).agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("hval").cast("bigint").alias("checksum"),
            F.min("id").cast("bigint").alias("min_id"),
            F.max("id").cast("bigint").alias("max_id"),
        )
        # materialize the plan while the gate is on (construction is
        # what consults the conf; the driver may execute later)
        out = out.localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)
    return out


# --------------------------------------------------------------------------
# op237: theta-sketch set algebra — intersection cardinality from sketches
# --------------------------------------------------------------------------

_THETA_K = 256


@register("op237_theta_set_ops", oracle=None)  # ROWS: xxhash64-based (op194's rationale)
def op237_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THETA-SKETCH set operations (KMV / bottom-k framework, Cohen;
    Apache DataSketches' theta family): cardinality of UNION and —
    the capability nothing else in the sketch family provides —
    INTERSECTION of two huge sets estimated from their mergeable
    bottom-k signatures, never from the sets: here, the distinct
    vocabularies of the en and de corpus slices.

    Sketch: per slice, the k=256 smallest xxhash64(word) values
    mapped to (0,1) (KMV). Union: min-merge the two sketches, re-cut
    to k — EXACTLY the union's own sketch (op194's min-merge law).
    Estimators: n̂ = (k−1)/θ with θ = k-th smallest in (0,1);
    intersection = the fraction of the union's below-θ sample found
    in BOTH sketches, scaled by the union estimate. Relative error
    ~1/√k ≈ 6%; the ±15% gate plus the exact truths (emitted
    alongside) are asserted in tests.

    ROWS by design (xxhash64 — op79/op194's rationale); everything
    after the per-slice bottom-k cut is k-row arithmetic: at 100 TB
    the only data-sized work is one distinct+cut per slice, and
    set-overlap questions between any two corpus slices become
    256-row math on stored sketches."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")

    def slice_words(lang: str) -> DataFrame:
        # sets are word 2-SHINGLES (op79's shingle space): the
        # synthetic vocabulary is ~100 words — smaller than k — but
        # its bigram space is thousands, so the ESTIMATOR path is
        # genuinely exercised (exact mode still handled below for
        # slices smaller than k)
        w = docs.filter(F.col("lang") == lang).select(
            F.expr("split(text, ' ')").alias("w")
        )
        sh = F.expr(
            "array_distinct(filter("
            "  zip_with(w, slice(w, 2, greatest(size(w) - 1, 0)),"
            "           (x, y) -> concat_ws(' ', x, y)),"
            "  s -> contains(s, ' ')))"
        )
        return w.select(F.explode(sh).alias("word")).distinct()

    def sketch(words: DataFrame, tag: str) -> DataFrame:
        h = words.select(
            F.lit(tag).alias("side"),
            "word",
            # xxhash64 → uniform in (0,1): shift to non-negative 2^63 space
            (
                (F.xxhash64("word").cast("double") / 9.223372036854776e18 + 1.0)
                / 2.0
            ).alias("u"),
        )
        w = Window.partitionBy("side").orderBy("u", "word")
        return (
            h.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _THETA_K)
            .select("side", "word", "u")
        )
    a = pool_persist(sketch(slice_words("en"), "a"))
    b = pool_persist(sketch(slice_words("de"), "b"))
    from pyspark.sql import Window

    merged = a.unionByName(b)
    wu = Window.orderBy("u", "word")  # 2k rows — metadata-sized window
    union_sketch = (
        merged.dropDuplicates(["word"])
        .withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= _THETA_K)
    )
    theta = union_sketch.agg(F.max("u").alias("theta"))
    in_both = (
        union_sketch.join(a.select(F.col("word").alias("wa")), F.col("word") == F.col("wa"), "left_semi")
        .join(b.select(F.col("word").alias("wb")), F.col("word") == F.col("wb"), "left_semi")
        .agg(F.count("*").alias("n_common_sample"))
    )
    th_a = a.agg(F.max("u").alias("th_a"))
    th_b = b.agg(F.max("u").alias("th_b"))
    exact = (
        slice_words("en").withColumn("s", F.lit(1))
        .unionByName(slice_words("de").withColumn("s", F.lit(2)))
        .groupBy("word")
        .agg(F.sum("s").alias("s"))
        .agg(
            F.sum(F.when(F.col("s").isin(1, 3), 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("s").isin(2, 3), 1).otherwise(0)).alias("n_b"),
            F.count("*").alias("n_union"),
            F.sum(F.when(F.col("s") == 3, 1).otherwise(0)).alias("n_inter"),
        )
    )
    k = float(_THETA_K)
    # exact-mode handling (standard theta semantics): a sketch holding
    # fewer than k values RETAINED ITS WHOLE SET — its estimate is its
    # size, and the intersection scale factor degrades to 1
    ka = a.agg(F.count("*").alias("ka"))
    kb = b.agg(F.count("*").alias("kb"))
    ku = union_sketch.agg(F.count("*").alias("ku"))
    est_a = F.when(F.col("ka") < k, F.col("ka")).otherwise((k - 1) / F.col("th_a"))
    est_b = F.when(F.col("kb") < k, F.col("kb")).otherwise((k - 1) / F.col("th_b"))
    est_u = F.when(F.col("ku") < k, F.col("ku")).otherwise((k - 1) / F.col("theta"))
    return (
        exact.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(th_a))
        .crossJoin(F.broadcast(th_b))
        .crossJoin(F.broadcast(in_both))
        .crossJoin(F.broadcast(ka))
        .crossJoin(F.broadcast(kb))
        .crossJoin(F.broadcast(ku))
        .select(
            F.col("n_a").cast("bigint"),
            F.col("n_b").cast("bigint"),
            F.col("n_union").cast("bigint"),
            F.col("n_inter").cast("bigint"),
            F.round(est_a, 2).alias("est_a"),
            F.round(est_b, 2).alias("est_b"),
            F.round(est_u, 2).alias("est_union"),
            F.round(
                F.col("n_common_sample") / F.col("ku") * est_u, 2
            ).alias("est_inter"),
        )
    )


# --------------------------------------------------------------------------
# op238: Wilson confidence intervals — rates with honest uncertainty
# --------------------------------------------------------------------------

_WILSON_Z = 1.96  # 95% two-sided


def _wilson_sql(p_hat: str, n: str) -> tuple[str, str]:
    z2 = f"({_WILSON_Z} * {_WILSON_Z})"
    center = f"(({p_hat}) + {z2} / (2.0 * {n}))"
    margin = (
        f"({_WILSON_Z} * SQRT((({p_hat}) * (1.0 - ({p_hat})) "
        f"+ {z2} / (4.0 * {n})) / {n}))"
    )
    denom = f"(1.0 + {z2} / {n})"
    return (
        f"ROUND(({center} - {margin}) / {denom}, 6)",
        f"ROUND(({center} + {margin}) / {denom}, 6)",
    )


def _op238_sql() -> str:
    lo, hi = _wilson_sql("CAST(k AS DOUBLE) / n", "CAST(n AS DOUBLE)")
    return f"""
WITH agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM events GROUP BY event_type)
SELECT event_type, n, k,
       ROUND(CAST(k AS DOUBLE) / n, 6) AS rate,
       {lo} AS wilson_lo,
       {hi} AS wilson_hi
FROM agg
"""


@register("op238_wilson_ci", oracle=_op238_sql())
def op238_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON score intervals (95%) for per-type success rates
    (success := value > 0.5) — a rate without its uncertainty is the
    classic dashboard lie, and Wilson (unlike the normal
    approximation) behaves at small n and extreme rates. Inputs are
    exact int64 (n, k); the interval arithmetic is a fixed dag of
    IEEE ops on exact integers — division, multiply, one SQRT
    (correctly rounded per IEEE-754, identical both engines) —
    round(6)'d at the boundary (op144's z-score discipline). One
    scan, one partial-agged groupBy; the CI math is per-group
    constant work."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n").cast("double")
    z2 = _WILSON_Z * _WILSON_Z
    center = p + z2 / (2.0 * n)
    margin = _WILSON_Z * F.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)
    denom = 1.0 + z2 / n
    return agg.select(
        "event_type",
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - margin) / denom, 6).alias("wilson_lo"),
        F.round((center + margin) / denom, 6).alias("wilson_hi"),
    )


# --------------------------------------------------------------------------
# op239: GROUP k-fold assignment — leakage-free cross-validation splits
# --------------------------------------------------------------------------

_KFOLD = 5


def _op239_sql() -> str:
    fold = f"({_cms_mulmod32('user_id', 2654435761, '//')} % {_KFOLD})"
    return f"""
WITH tagged AS (
  SELECT {fold} AS fold, user_id, event_type, event_id FROM events)
SELECT CAST(fold AS INTEGER) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(event_id) AS BIGINT) AS checksum
FROM tagged GROUP BY fold
"""


@register("op239_group_kfold", oracle=_op239_sql())
def op239_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP k-fold assignment: folds are a pure hash function of the
    GROUP key (user_id), so every row of a user lands in the same
    fold — the leakage-free cross-validation split (row-level folds
    put one user's behavior in both train and validation, inflating
    every metric; sklearn's GroupKFold exists for exactly this).
    op176 (hash split) and op225 (temporal split) complete the
    eval-split triptych.

    Same reproducibility algebra as op176/op229: _mulmod32 on the
    group key, no RNG, identical across re-runs/partitionings/
    clusters; fold balance is inspectable in the output (hash
    uniformity gives ~n/k users per fold). Map-side arithmetic +
    one groupBy — the split costs one scan at any size. The
    disjointness invariant (each user in exactly one fold) is
    asserted in tests."""
    ev = load_table(spark, sf_dir, "events")
    fold = F.expr(f"({_cms_mulmod32('user_id', 2654435761, 'div')} % {_KFOLD})")
    return (
        ev.select(fold.cast("int").alias("fold"), "user_id", "event_id")
        .groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("event_id").cast("bigint").alias("checksum"),
        )
    )


# --------------------------------------------------------------------------
# op240: two-sample Kolmogorov-Smirnov — exact D over the distinct grid
# --------------------------------------------------------------------------

_OP240_SQL = """
WITH s AS (
  SELECT n_chars AS x,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_a
  FROM documents WHERE lang IN ('en', 'de')),
tot AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
         CAST(SUM(1 - is_a) AS BIGINT) AS n_b
  FROM s),
grid AS (
  SELECT x,
         CAST(SUM(is_a) AS BIGINT) AS a_here,
         CAST(SUM(1 - is_a) AS BIGINT) AS b_here
  FROM s GROUP BY x),
cum AS (
  SELECT x,
         SUM(a_here) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS ca,
         SUM(b_here) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cb
  FROM grid)
SELECT t.n_a, t.n_b,
       CAST(MAX(ABS(c.ca * t.n_b - c.cb * t.n_a)) AS BIGINT) AS d_num,
       t.n_a * t.n_b AS d_den,
       ROUND(CAST(MAX(ABS(c.ca * t.n_b - c.cb * t.n_a)) AS DOUBLE)
             / (t.n_a * t.n_b), 6) AS ks_d
FROM cum c CROSS JOIN tot t
GROUP BY t.n_a, t.n_b
"""


@register("op240_ks_two_sample", oracle=_OP240_SQL)
def op240_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KOLMOGOROV-SMIRNOV statistic (en vs de document
    lengths) — the nonparametric "did the distribution shift"
    test beside op162's binned PSI: D = max |F_a(x) − F_b(x)|,
    computed EXACTLY on the distinct-value grid (the supremum over a
    step function is attained at a step), kept integer as
    max |ca·n_b − cb·n_a| over n_a·n_b — no float until one final
    division. Scale shape is op214's: aggregate to the bounded
    distinct-value grid first, run the cumulative window over those
    few rows — no global row sort."""
    from pyspark.sql import Window

    s = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "de"))
        .select(
            F.col("n_chars").alias("x"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_a"),
        )
    )
    tot = s.agg(
        F.sum("is_a").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("n_b"),
    )
    grid = s.groupBy("x").agg(
        F.sum("is_a").cast("bigint").alias("a_here"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("b_here"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "x",
        F.sum("a_here").over(w).alias("ca"),
        F.sum("b_here").over(w).alias("cb"),
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")))
            .cast("bigint")
            .alias("d_num")
        )
    )
    return d.select(
        "n_a",
        "n_b",
        "d_num",
        (F.col("n_a") * F.col("n_b")).alias("d_den"),
        F.round(
            F.col("d_num").cast("double") / (F.col("n_a") * F.col("n_b")), 6
        ).alias("ks_d"),
    )


# --------------------------------------------------------------------------
# op241: chi-square independence — contingency table, exact-int core
# --------------------------------------------------------------------------

_OP241_SQL = """
WITH o AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
  FROM documents GROUP BY lang, source),
r AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS row_tot FROM o GROUP BY lang),
c AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS col_tot FROM o GROUP BY source),
n AS (SELECT CAST(SUM(obs) AS BIGINT) AS total FROM o),
cells AS (
  SELECT o.lang, o.source, o.obs, r.row_tot, c.col_tot, n.total,
         -- (O*N − R*C)² / (N*R*C): chi² term scaled to avoid
         -- fractional expected counts until the final division
         CAST(o.obs * n.total - r.row_tot * c.col_tot AS DOUBLE) AS num
  FROM o JOIN r ON o.lang = r.lang
        JOIN c ON o.source = c.source
        CROSS JOIN n)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(ANY_VALUE(total) AS BIGINT) AS n_total,
       CAST((SELECT COUNT(*) FROM r) - 1 AS BIGINT)
         * CAST((SELECT COUNT(*) FROM c) - 1 AS BIGINT) AS dof,
       -- per-cell term rounded to micro-units and summed as INT64:
       -- integer addition is order-independent, so the sum cannot
       -- flip a last digit under either engine's aggregation order
       -- (round-6 ADVICE item). floor(x*1e6 + 0.5) not ROUND():
       -- identical IEEE double ops in both engines, no half-even vs
       -- half-away dialect gap.
       CAST(SUM(CAST(FLOOR(num * num
                 / (CAST(total AS DOUBLE) * row_tot * col_tot)
                 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS chi2
FROM cells
"""


@register("op241_chi2_independence", oracle=_OP241_SQL)
def op241_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE independence test for the (lang × source)
    contingency table — "is the language mix the same across
    sources", the categorical sibling of op240's KS: χ² =
    Σ (O−E)²/E restated as Σ (O·N − R·C)² / (N·R·C) so every
    intermediate is a product of EXACT int64 counts and the only
    float work is one per-cell division, after which each term is
    rounded to int64 MICRO-UNITS (floor(x·1e6 + 0.5) — identical
    IEEE ops in both engines) and summed as integers: integer
    addition commutes, so no engine's aggregation order can flip a
    last digit (round-6 ADVICE retired the earlier
    sum-doubles-then-round form, whose coalesce(1) pinned the
    partition but not the row order within it).

    Shape (also round-6 ADVICE — the old form persisted the
    contingency frame without unpersisting and ran two driver-side
    counts): ONE documents scan builds the ≤25-row contingency
    table; row/col/grand marginals are WINDOWS over that tiny frame
    (no persist, no broadcast joins, no driver action anywhere), and
    dof comes from count-distinct in the final agg. The only
    full-data work is the first map-side-combined groupBy; everything
    after moves ≤25 rows."""
    o = load_table(spark, sf_dir, "documents").groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("obs")
    )
    from pyspark.sql import Window

    # Windows over the ≤25-row contingency frame — deliberate tiny
    # unpartitioned frame (same class as op245's report assembly).
    cells = o.select(
        "lang",
        "source",
        "obs",
        F.sum("obs").over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("source")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("total"),
    ).withColumn(
        "num",
        (
            F.col("obs") * F.col("total")
            - F.col("row_tot") * F.col("col_tot")
        ).cast("double"),
    )
    term_micro = F.expr(
        "cast(floor(num * num"
        " / (cast(total as double) * row_tot * col_tot)"
        " * 1000000 + 0.5) as bigint)"
    )
    # dof counts DISTINCT GROUP KEYS — including a NULL lang/source
    # group if the fixture ever grows one, because the oracle's
    # (SELECT COUNT(*) FROM r) counts GROUP BY rows and GROUP BY keeps
    # the NULL group. countDistinct alone would drop it (round-7
    # review); the isNull max-flag adds it back.
    n_lang = F.countDistinct("lang") + F.max(
        F.when(F.col("lang").isNull(), 1).otherwise(0)
    )
    n_src = F.countDistinct("source") + F.max(
        F.when(F.col("source").isNull(), 1).otherwise(0)
    )
    return cells.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.any_value("total").cast("bigint").alias("n_total"),
        ((n_lang - 1) * (n_src - 1)).cast("bigint").alias("dof"),
        (F.sum(term_micro).cast("double") / F.lit(1000000)).alias("chi2"),
    )


# --------------------------------------------------------------------------
# op242: behavioral Markov transitions — per-user event-type chains
# --------------------------------------------------------------------------

_OP242_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events),
t AS (SELECT prev_type, event_type AS next_type FROM o WHERE prev_type IS NOT NULL),
row_tot AS (
  SELECT prev_type, CAST(COUNT(*) AS BIGINT) AS n_from
  FROM t GROUP BY prev_type)
SELECT t.prev_type, t.next_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       r.n_from,
       CAST(COUNT(*) * 1000000 // r.n_from AS BIGINT) AS p_ppm
FROM t JOIN row_tot r ON t.prev_type = r.prev_type
GROUP BY t.prev_type, t.next_type, r.n_from
"""


@register("op242_markov_transitions", oracle=_OP242_SQL)
def op242_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral MARKOV TRANSITION MATRIX: per-user consecutive
    event-type pairs → transition counts and probabilities (exact
    integer ppm: n·10⁶ div n_from — engine-portable floor division,
    no float) — the first-order user-behavior model behind
    next-action prediction, anomaly scoring ("this transition never
    happens") and funnel design; op128's bigram idea lifted from
    token streams to event streams.

    One per-user ordered window (lag) + two aggregates; transitions
    shuffle as (type, type) pairs — |types|² ≤ 25 output rows from
    any volume."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("next_type"))
    )
    row_tot = t.groupBy("prev_type").agg(
        F.count("*").cast("bigint").alias("n_from")
    )
    return (
        t.groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .join(F.broadcast(row_tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            "n_from",
            F.expr("n * 1000000 div n_from").cast("bigint").alias("p_ppm"),
        )
    )


# --------------------------------------------------------------------------
# op243: last-touch attribution — IGNORE NULLS window carry-forward
# --------------------------------------------------------------------------

_ATTR_WINDOW_US = 3_600_000_000  # attribute within 1 hour


_OP243_SQL = f"""
WITH o AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         LAST_VALUE(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type,
         LAST_VALUE(CASE WHEN event_type <> 'purchase'
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_us
  FROM events)
SELECT COALESCE(CASE WHEN us - touch_us <= {_ATTR_WINDOW_US}
                     THEN touch_type END, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(event_id) AS BIGINT) AS checksum
FROM o
WHERE event_type = 'purchase'
GROUP BY channel
"""


@register("op243_last_touch_attribution", oracle=_OP243_SQL)
def op243_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION: each purchase credits the user's most
    recent NON-purchase event within 1 hour, else 'direct' — the
    marketing-attribution query, and the op that pins Spark and
    DuckDB's `IGNORE NULLS` window carry-forward semantics against
    each other (Spark: last(col, ignorenulls) over rows-preceding;
    DuckDB: LAST_VALUE ... IGNORE NULLS) — a forward-fill over a
    conditional column, the same primitive as op131's resample-ffill
    but predicate-driven.

    One per-user ordered window carrying (type, ts) of the last
    touch + one aggregate; integers end to end (µs timestamps)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touch_us = F.last(
        F.when(F.col("event_type") != "purchase", F.col("us")),
        ignorenulls=True,
    ).over(w)
    o = ev.select(
        "event_type",
        "event_id",
        "us",
        touch_type.alias("touch_type"),
        touch_us.alias("touch_us"),
    )
    return (
        o.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(
                    F.col("us") - F.col("touch_us") <= _ATTR_WINDOW_US,
                    F.col("touch_type"),
                ),
                F.lit("direct"),
            ).alias("channel"),
            "event_id",
        )
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum("event_id").cast("bigint").alias("checksum"),
        )
    )


# --------------------------------------------------------------------------
# op244: quantile (rank) normalization — the PIT transform per group
# --------------------------------------------------------------------------

_OP244_SQL = """
WITH pr AS (
  SELECT event_type, value,
         PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value) AS p
  FROM events),
b AS (
  SELECT event_type,
         -- FLOOR, not bare CAST: DuckDB rounds on double→int casts
         -- (op227's gotcha); Spark truncates
         LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS decile,
         p
  FROM pr)
SELECT event_type, CAST(decile AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(p), 6) AS sum_p
FROM b GROUP BY event_type, decile
"""


@register("op244_quantile_normalize", oracle=_OP244_SQL)
def op244_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE (rank) NORMALIZATION per group — the probability-
    integral transform that makes features comparable across
    heterogeneous distributions (the preprocessing step before
    mixing signals with different scales/shapes; op139's min-max
    sibling for the heavy-tailed case). p = PERCENT_RANK(), the
    (rank−1)/(n−1) definition shared verbatim by Spark and DuckDB —
    ties resolve to the min rank in both, so the transform is
    deterministic and this op PINS that cross-engine contract.

    Output: per-(type, decile of p) counts + the quantized p mass —
    a uniform-by-construction histogram whose hash any rank drift
    breaks (CAST truncation of p·10 is floor for the non-negative p
    both engines). Scale: the ordered window runs per group — the
    standard rank-transform cost, one keyed sort; the decile
    histogram collapses it to ≤10 rows/group."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    pr = ev.select(
        "event_type", F.percent_rank().over(w).alias("p")
    )
    return (
        pr.select(
            "event_type",
            F.least((F.col("p") * 10).cast("bigint"), F.lit(9))
            .cast("int")
            .alias("decile"),
            "p",
        )
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("p"), 6).alias("sum_p"),
        )
    )


# --------------------------------------------------------------------------
# op245: dataset card — the one-row datasheet a corpus release ships
# --------------------------------------------------------------------------

_OP245_SQL = """
WITH d AS (SELECT doc_id, text, lang, n_chars FROM documents),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(MIN(n_chars) AS BIGINT) AS min_chars,
         CAST(MAX(n_chars) AS BIGINT) AS max_chars
  FROM d),
toks AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total_tokens,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS vocab
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM d)
  WHERE word <> ''),
dup AS (
  SELECT CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS exact_dups
  FROM d),
top_lang AS (
  SELECT lang AS top_lang, CAST(COUNT(*) AS BIGINT) AS top_lang_docs
  FROM d GROUP BY lang ORDER BY COUNT(*) DESC, lang LIMIT 1)
SELECT b.n_docs, b.n_langs, b.total_chars, b.min_chars, b.max_chars,
       t.total_tokens, t.vocab, u.exact_dups,
       tl.top_lang, tl.top_lang_docs
FROM base b CROSS JOIN toks t CROSS JOIN dup u CROSS JOIN top_lang tl
"""


@register("op245_dataset_card", oracle=_OP245_SQL)
def op245_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET CARD: the one-row datasheet a corpus release ships
    ("Datasheets for Datasets", Gebru 2018) — doc/lang/char counts,
    token count and vocabulary size, exact-duplicate count, dominant
    language — every number an exact integer drawn from the same
    aggregates the dedicated ops compute (op77 tokens, op75 dedup,
    op97 profile), composed into the single publishable row. The op
    certifies the COMPOSITION: four independent aggregate branches
    cross-joined (all 1-row broadcasts), which is how a real report
    assembles without ever collecting to the driver.

    Scale: each branch is one scan + partial-agged fold to one row;
    Catalyst shares nothing between them here (4 scans at this size)
    — a production variant computes multi-branch aggregates over one
    cached scan, the documented trade."""
    d = load_table(spark, sf_dir, "documents")
    base = d.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    toks = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .agg(
            F.count("*").cast("bigint").alias("total_tokens"),
            F.countDistinct("word").cast("bigint").alias("vocab"),
        )
    )
    dup = d.agg(
        (F.count("*") - F.countDistinct(F.md5("text")))
        .cast("bigint")
        .alias("exact_dups")
    )
    top_lang = (
        d.groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("top_lang_docs"))
        .orderBy(F.desc("top_lang_docs"), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"), "top_lang_docs")
    )
    return (
        base.crossJoin(F.broadcast(toks))
        .crossJoin(F.broadcast(dup))
        .crossJoin(F.broadcast(top_lang))
    )


# --------------------------------------------------------------------------
# op246: temperature-sampling mixture weights — sqrt-exact portability
# --------------------------------------------------------------------------

_OP246_SQL = """
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         SQRT(CAST(COUNT(*) AS DOUBLE)) AS w_raw
  FROM documents GROUP BY lang),
t AS (SELECT SUM(w_raw) AS z FROM c)
SELECT c.lang, c.n_docs,
       ROUND(c.w_raw / t.z, 6) AS mix_weight,
       ROUND(c.w_raw / t.z - CAST(c.n_docs AS DOUBLE)
             / SUM(c.n_docs) OVER (), 6) AS upweight
FROM c CROSS JOIN t
"""


@register("op246_temperature_mix", oracle=_OP246_SQL)
def op246_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SAMPLING mixture weights (multilingual training
    mix, XLM-R style): per-language sampling probability ∝ n^(1/τ)
    with τ=2 — upweights low-resource languages relative to their
    natural share, and the `upweight` column reports exactly how
    much. α=1/2 is deliberate: n^0.5 is SQRT, correctly rounded per
    IEEE-754 and bit-identical across engines, where a general POW
    carries no such guarantee (the portability rule that picked this
    temperature is the documented point); the normalization sums ≤
    |langs| doubles — round(6) absorbs association order.

    Scale: one partial-agged groupBy to |langs| rows; everything
    after is constant work."""
    c = load_table(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    c = c.withColumn("w_raw", F.sqrt(F.col("n_docs").cast("double")))
    t = c.agg(F.sum("w_raw").alias("z"), F.sum("n_docs").alias("n_total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "n_docs",
            F.round(F.col("w_raw") / F.col("z"), 6).alias("mix_weight"),
            F.round(
                F.col("w_raw") / F.col("z")
                - F.col("n_docs").cast("double") / F.col("n_total"),
                6,
            ).alias("upweight"),
        )
    )


# --------------------------------------------------------------------------
# op247: rolling OLS slope — trailing-window trend, integer-exact core
# --------------------------------------------------------------------------

_SLOPE_W = 7  # trailing window (days)

_OP247_SQL = f"""
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
spine AS (
  SELECT et.event_type, CAST(t.i AS BIGINT) AS t
  FROM (SELECT DISTINCT event_type FROM events) et,
       bounds b, UNNEST(range(0, CAST(b.d1 - b.d0 AS BIGINT) + 1)) t(i)),
counts AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - b.d0 AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events CROSS JOIN bounds b GROUP BY event_type, t),
daily AS (
  SELECT s.event_type, s.t, COALESCE(c.y, 0) AS y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s.t = c.t),
w AS (
  SELECT event_type, t, y,
         CAST(COUNT(*) OVER tw AS BIGINT) AS n,
         CAST(SUM(t) OVER tw AS BIGINT) AS sx,
         CAST(SUM(y) OVER tw AS BIGINT) AS sy,
         CAST(SUM(t * y) OVER tw AS BIGINT) AS sxy,
         CAST(SUM(t * t) OVER tw AS BIGINT) AS sxx
  FROM daily
  WINDOW tw AS (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN {_SLOPE_W - 1} PRECEDING AND CURRENT ROW))
SELECT event_type, t, y,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx), 6) AS slope
FROM w WHERE n = {_SLOPE_W}
"""


@register("op247_rolling_slope", oracle=_OP247_SQL)
def op247_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING OLS SLOPE: per-series trailing-7-day least-squares
    trend of daily event volume — the "is this growing and how fast"
    feature behind every trend alert, computed from WINDOWED SUFFICIENT
    STATISTICS (n, Σx, Σy, Σxy, Σx²) so the regression is one pass of
    rolling int64 sums (x is the small day index, so every product is
    exact; the µs-epoch formulation would overflow squares — the
    recentring rule documented here) and one final exact-int IEEE
    division, round(6). op108's global regression made rolling; only
    full windows emit. Scale: one keyed ordered window over the day
    spine — series-parallel, constant state per step."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    counts = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).cast("bigint").alias("t"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(cast(0 as bigint), cast(datediff(d1, d0) as bigint))")
            ).alias("t"),
        )
    )
    daily = spine.join(counts, ["event_type", "t"], "left").select(
        "event_type", "t", F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y")
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(-(_SLOPE_W - 1), 0)
    )
    w = daily.select(
        "event_type",
        "t",
        "y",
        F.count("*").over(tw).cast("bigint").alias("n"),
        F.sum("t").over(tw).cast("bigint").alias("sx"),
        F.sum("y").over(tw).cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("y")).over(tw).cast("bigint").alias("sxy"),
        F.sum(F.col("t") * F.col("t")).over(tw).cast("bigint").alias("sxx"),
    )
    return w.filter(F.col("n") == _SLOPE_W).select(
        "event_type",
        "t",
        "y",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("slope"),
    )


# --------------------------------------------------------------------------
# op248: median-of-means — mergeable robust mean, order-statistic exact
# --------------------------------------------------------------------------

_MOM_B = 15  # odd bucket count: the median IS the 8th order statistic


def _op248_sql() -> str:
    bucket = f"({_cms_mulmod32('event_id', 2654435761, '//')} % {_MOM_B})"
    return f"""
WITH q AS (
  SELECT event_type, {bucket} AS bucket,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
  FROM events),
bm AS (
  SELECT event_type, bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v) AS DOUBLE) / COUNT(*) AS bucket_mean
  FROM q GROUP BY event_type, bucket),
r AS (
  SELECT event_type, bucket_mean,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY bucket_mean, bucket) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nb
  FROM bm)
SELECT event_type,
       CAST(nb AS BIGINT) AS n_buckets,
       ROUND(bucket_mean / 1000000, 6) AS mom_mean
FROM r WHERE rn = (nb + 1) // 2
"""


@register("op248_median_of_means", oracle=_op248_sql())
def op248_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN-OF-MEANS robust mean estimator: rows hash into 15
    buckets (portable _mulmod32 of event_id — deterministic, not
    RNG), each bucket's exact int64-quantized mean is computed
    map-side, and the estimate is the MEDIAN bucket mean — the
    estimator with exponential concentration under heavy tails where
    the plain mean is wrecked by one outlier, and the standard trick
    for robust aggregation in one pass.

    Exactness: an ODD bucket count makes the median the
    ((b+1)/2)-th ORDER STATISTIC — row_number, not interpolation, so
    the cross-engine percentile-interpolation minefield (op26's
    hard-won territory) is bypassed entirely; bucket means are exact
    int64 sums over counts with one IEEE division each, tiebroken by
    bucket id. Scale: the bucket aggregation is map-side combined
    (15 rows/group/task); the median runs over 15 rows."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(
        f"({_cms_mulmod32('event_id', 2654435761, 'div')} % {_MOM_B})"
    )
    q = ev.select(
        "event_type",
        bucket.alias("bucket"),
        F.expr("cast(cast(value as decimal(18,6)) * 1000000 as bigint)").alias("v"),
    )
    bm = q.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    ).withColumn("bucket_mean", F.col("s").cast("double") / F.col("n"))
    w = Window.partitionBy("event_type").orderBy("bucket_mean", "bucket")
    r = bm.select(
        "event_type",
        "bucket_mean",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("nb"),
    )
    return r.filter(F.expr("rn = (nb + 1) div 2")).select(
        "event_type",
        F.col("nb").cast("bigint").alias("n_buckets"),
        F.round(F.col("bucket_mean") / 1_000_000, 6).alias("mom_mean"),
    )


# --------------------------------------------------------------------------
# op249: parquet FOOTER statistics read — metadata-only lake planning
# --------------------------------------------------------------------------

_OP249_SQL = """
SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders
GROUP BY month
"""


@register("op249_footer_stats_read", oracle=_OP249_SQL)
def op249_footer_stats_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet FOOTER-ONLY statistics read: per-month row counts and
    column min/max extracted from row-group METADATA via pyarrow on
    the executors — the scan that never touches a data page. This is
    the read pattern behind every lake planner (Delta/Iceberg file
    stats, parquet predicate pruning): at 100 TB, answering "which
    files can this predicate skip" costs kilobytes of footers, not
    terabytes of data — and this op proves the footers TELL THE
    TRUTH, because the metadata-derived numbers must hash-match the
    oracle computed by actually scanning the rows. op181's audit
    recomputed stats from rows; this one reads what the writer
    persisted.

    Mechanics: month-partitioned export (1 file/month), the bounded
    file list parallelized into a DataFrame, ParquetFile(...).metadata
    walked per file in mapInPandas (row groups aggregated per file;
    the month recovered from the hive path so the oracle needs no
    file knowledge). Statistics exactness: int64 and double parquet
    stats are exact value copies (no truncation), which is exactly
    what the hash certifies."""
    import os

    # per-process scratch (r9: migrated off the shared sf-tagged dir
    # — the overwrite-vs-lazy-read cross-session race)
    from ocdb_server_spark.scratch import scratch_dir

    out = os.path.join(scratch_dir("footer_stats", sf_dir), "t")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    (
        o.repartition(F.col("month"))
        .write.mode("overwrite")
        .partitionBy("month")
        .parquet(out)
    )
    import glob

    files = sorted(glob.glob(os.path.join(out, "month=*", "*.parquet")))
    paths = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(min(8, len(files)))

    def read_footers(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in it:
            out_rows = {
                k: []
                for k in (
                    "month",
                    "n_rows",
                    "min_key",
                    "max_key",
                    "min_price",
                    "max_price",
                )
            }
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                names = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }
                ki, pi = names["o_orderkey"], names["o_totalprice"]
                n = 0
                mins_k, maxs_k, mins_p, maxs_p = [], [], [], []
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    n += g.num_rows
                    sk = g.column(ki).statistics
                    sp = g.column(pi).statistics
                    mins_k.append(sk.min)
                    maxs_k.append(sk.max)
                    mins_p.append(sp.min)
                    maxs_p.append(sp.max)
                month = [
                    seg.split("=", 1)[1]
                    for seg in path.split(os.sep)
                    if seg.startswith("month=")
                ][0]
                out_rows["month"].append(month)
                out_rows["n_rows"].append(n)
                out_rows["min_key"].append(min(mins_k))
                out_rows["max_key"].append(max(maxs_k))
                out_rows["min_price"].append(min(mins_p))
                out_rows["max_price"].append(max(maxs_p))
            yield pd.DataFrame(out_rows)

    per_file = paths.mapInPandas(
        read_footers,
        "month string, n_rows long, min_key long, max_key long,"
        " min_price double, max_price double",
    )
    return per_file.groupBy("month").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.min("min_key").cast("bigint").alias("min_key"),
        F.max("max_key").cast("bigint").alias("max_key"),
        F.min("min_price").alias("min_price"),
        F.max("max_price").alias("max_price"),
    )


# --------------------------------------------------------------------------
# op250: end-to-end corpus build — the composed pipeline, certified whole
# --------------------------------------------------------------------------

_CB_MIN_CHARS, _CB_MAX_CHARS = 50, 1000


def _op250_sql() -> str:
    split = f"({_cms_mulmod32('doc_id', 2654435761, '//')} % 100)"
    return f"""
WITH clean AS (
  SELECT doc_id, text, lang
  FROM documents
  WHERE n_chars BETWEEN {_CB_MIN_CHARS} AND {_CB_MAX_CHARS}),
dedup AS (
  SELECT doc_id, text, lang FROM (
    SELECT doc_id, text, lang,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM clean) WHERE rn = 1),
split AS (
  SELECT doc_id, text, lang,
         CASE WHEN {split} < 98 THEN 'train'
              WHEN {split} = 98 THEN 'val'
              ELSE 'test' END AS split
  FROM dedup)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM split GROUP BY split, lang
"""


@register("op250_corpus_build_pipeline", oracle=_op250_sql())
def op250_corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END CORPUS BUILD — the composed pipeline every
    individual op in the north-star family serves, certified as a
    WHOLE: quality gate (length bounds — op92's simplest cut) →
    exact dedup keeping the first occurrence (op75/op76's rule,
    md5-keyed window) → reproducible hash split (op176's 98/1/1,
    _mulmod32) → per-(split, lang) release report (docs, tokens, id
    range). Each stage is individually certified elsewhere; this op
    certifies their COMPOSITION — the interfaces between stages,
    where real pipelines break (a filter reordered after the dedup,
    a split computed pre-dedup, an off-by-one in the keep rule all
    change the hash).

    Scale: filter fuses into the scan; dedup is one digest-keyed
    window (text never shuffles — md5 does); split is map-side
    arithmetic; report is one partial-agged groupBy. The whole build
    is two shuffles end to end at any corpus size."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    clean = d.filter(
        F.col("n_chars").between(_CB_MIN_CHARS, _CB_MAX_CHARS)
    ).select("doc_id", "text", "lang")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = (
        clean.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    split_expr = F.expr(
        f"({_cms_mulmod32('doc_id', 2654435761, 'div')} % 100)"
    )
    split = dedup.withColumn(
        "split",
        F.when(split_expr < 98, "train")
        .when(split_expr == 98, "val")
        .otherwise("test"),
    )
    return split.groupBy("split", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )
