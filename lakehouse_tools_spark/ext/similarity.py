"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the corpus, score with pure Catalyst vector
expressions (functions.vectors — no UDF), rank with a window. The
scale path is LSH bucketing (random-hyperplane signs) that prunes the
corpus per query to one bucket's worth of candidates before the same
exact scoring — turning a 100 TB × Q cross product into Q bucket
probes.

Determinism: hyperplanes are derived from md5 of (plane, dim) — no
RNG state, same buckets in every engine/run. Cosines are rounded to 6
decimals before ranking, with id tiebreaks, so top-k is total-ordered.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_tools_spark.functions.memo import expr_memo
from lakehouse_tools_spark.functions.vectors import cosine_similarity, dot_product, l2_norm


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` is broadcast (it is the small side by construction);
    scoring is one codegen'd pass over the corpus — no shuffle until
    the final per-query top-k, which AQE sizes by the number of
    queries. Output: ``(query_id, vec_id, cos, rank)``.
    """
    # norms are per-vector, not per-pair: compute once in each side's
    # projection so the join scores pay one fold (the dot), not three
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot_product(F.col("_qvec"), F.col("_cvec"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via an Arrow-batched Pandas path (``mapInPandas``).

    Same contract and same results as :func:`cosine_topk`; this is the
    escape hatch for scoring Catalyst can't express (a model forward
    pass, a learned metric). The query matrix rides into every task as
    a closure (small side, same role as the broadcast in the Catalyst
    path); each Arrow batch is scored as one numpy matrix op.

    Bit-exactness with the Catalyst/oracle path: products are formed
    elementwise in float64 and accumulated *sequentially over
    dimensions* (vectorized over rows) — the same left-fold order as
    ``F.aggregate`` and DuckDB's ``list_dot_product``. ``np.dot``'s
    pairwise/SIMD summation would drift in the low bits and flip
    rounded values on ties.
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in qrows], dtype=np.float64)  # (nq, dim)
    qnorm = np.sqrt(_seq_dot(qm, qm))  # (nq,)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (n, dim)
            cnorm = np.sqrt(_seq_dot(cm, cm))  # (n,)
            for qi, qid in enumerate(qids):
                dots = _seq_dot(cm, qm[qi][None, :])  # (n,)
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(ids), qid, dtype=np.int64),
                        "vec_id": ids,
                        "cos": dots / (qnorm[qi] * cnorm),
                    }
                )

    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(score, "query_id long, vec_id long, cos double")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _seq_dot(a, b):
    """Row-wise dot of (n, dim)·(n|1, dim) accumulated dim-by-dim —
    vectorized across rows, sequential across dims, so the fold order
    matches Catalyst's ``aggregate`` exactly."""
    import numpy as np

    prods = a * b  # broadcasting handles (1, dim)
    acc = np.zeros(prods.shape[0], dtype=np.float64)
    for d in range(prods.shape[1]):
        acc = acc + prods[:, d]
    return acc


def _seq_norm(v) -> float:
    """Driver-side L2 norm with the same sequential fold + sqrt as
    ``functions.vectors.l2_norm`` — bit-identical across engines."""
    import math

    acc = 0.0
    for x in v:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, self-join baseline).

    ``(vec_id, vec_id2, cos)`` with vec_id < vec_id2. Quadratic by
    design — the correctness baseline the LSH path is checked against;
    at scale use :func:`lsh_bucket` + per-bucket pairs.
    """
    a = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_va"),
        l2_norm(F.col(vec_col)).alias("_na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_id2"),
        F.col(vec_col).alias("_vb"),
        l2_norm(F.col(vec_col)).alias("_nb"),
    )
    return (
        a.join(b, F.col("vec_id") < F.col("vec_id2"))
        .select(
            "vec_id",
            "vec_id2",
            F.round(
                dot_product(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: bool = False,
) -> DataFrame:
    """Near-dup pairs at scale: same contract as :func:`neardup_pairs`
    but candidates come from an equi-self-join on the LSH bucket id
    instead of the full O(n²) cross product — expected candidate count
    n²/2^planes, and high-cosine pairs land in the same bucket with
    high probability (recall < 1 by design, measured in tests).

    The bucket id is an inline projection (no shuffle to compute); the
    self-join shuffles each side once on the bucket key, and AQE's
    skew-join splitting handles a hot bucket. Exact cosine re-scoring
    + threshold runs only on same-bucket pairs.

    ``multi_probe=True`` also pairs vectors whose buckets differ in
    ONE plane's sign bit (a near-dup on the wrong side of a single
    hyperplane — the dominant recall loss): the right side explodes
    to its own bucket plus the ``num_planes`` Hamming-1 flips, so the
    candidate volume grows ×(planes+1) while recall jumps toward 1.
    Each unordered pair is still discovered exactly once (the left
    side keeps its exact bucket; exactly one flip of the right bucket
    can equal it), so no dedup pass is needed.
    """
    # spread the vectors by id before the bucket/norm projections
    # (r13): each row pays num_planes × dim dot products, and a
    # single-file corpus ran BOTH sides' projections as one-task
    # stages (stage audit at sf0.1: 2.9 s + 1.0 s on 1 task each).
    # UNLIKE the text-side spread_by sites, nothing downstream keys
    # on id (the candidate join shuffles by bucket either way), so
    # this spread is parallelism insurance only — it is the IDENTITY
    # when the input already has enough splits, never an extra
    # vector-volume shuffle at scale. Keyed repartition, so no
    # sort-before-repartition cost locally.
    base = embeddings.select(F.col(id_col), F.col(vec_col))
    _cores = base.sparkSession.sparkContext.defaultParallelism
    if 0 < len(base.inputFiles()) < _cores:
        base = base.repartition(_cores, id_col)
    a = base.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_va"),
        l2_norm(F.col(vec_col)).alias("_na"),
        lsh_bucket_column(F.col(vec_col), num_planes, dim).alias("_b"),
    )
    b = base.select(
        F.col(id_col).alias("vec_id2"),
        F.col(vec_col).alias("_vb"),
        l2_norm(F.col(vec_col)).alias("_nb"),
        lsh_bucket_column(F.col(vec_col), num_planes, dim).alias("_b2"),
    )
    if multi_probe:
        b = b.withColumn(
            "_b2",
            F.explode(
                F.array(
                    F.col("_b2"),
                    *[
                        F.col("_b2").bitwiseXOR(F.lit(1 << p).cast("long"))
                        for p in range(num_planes)
                    ],
                )
            ),
        )
    return (
        a.join(b, (F.col("_b") == F.col("_b2")) & (F.col("vec_id") < F.col("vec_id2")))
        .select(
            "vec_id",
            "vec_id2",
            F.round(
                dot_product(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _hyperplane_value(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived, identical in every run/engine. Computed driver-side
    (same md5 → same value as the SQL expression
    ``conv(substr(md5(p || ':' || d), 1, 8), 16, 10) / 2^31 - 1``)
    so the plan carries one array literal per plane instead of
    64 md5 expression subtrees — keeps analysis/codegen time flat as
    planes × dims grows."""
    h = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return h / float(1 << 31) - 1.0


def lsh_bucket_column(vec_col, num_planes: int = 8, dim: int = 64):
    """Random-hyperplane LSH bucket id as a single Catalyst expression.

    Sign bit of ⟨v, pᵢ⟩ for ``num_planes`` fixed md5-derived
    hyperplanes packs into an int bucket — computable inline on any
    relation (no join, no shuffle). Expected bucket population
    n/2^planes keeps per-bucket exact scoring cheap.

    The plane matrix is one constant-folded ``array<array<double>>``
    literal (single ``F.expr`` — no per-element py4j chatter) and the
    sign bits come from ONE indexed ``transform`` lambda, so the
    generated code is O(1) in ``num_planes`` — same plan-size move as
    :func:`with_ivf_cell`, same bit-identical bucket values (the fold
    inside the lambda is the same sequential dot).
    """
    pm = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                f"CAST('{_hyperplane_value(p, d)!r}' AS DOUBLE)" for d in range(dim)
            )
            + ")"
            for p in range(num_planes)
        )
        + ")"
    )
    # shiftleft needs a literal shift amount; sign * 2^i is the same
    # bit for a lambda-index shift (exact in double pow for i <= 52)
    bits = F.transform(
        pm,
        lambda plane, i: (dot_product(vec_col, plane) >= 0).cast("long")
        * F.pow(F.lit(2.0), i.cast("double")).cast("long"),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def lsh_bucket(
    embeddings: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, bucket)`` via :func:`lsh_bucket_column`."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        lsh_bucket_column(F.col(vec_col), num_planes, dim).alias("bucket"),
    )


def with_ivf_cell(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "cell",
    out_scores: str | None = None,
) -> DataFrame:
    """Add the nearest-centroid id (highest cosine, lowest id on ties)
    — the IVF list assignment — as zero-shuffle projections.

    The centroid matrix is ONE plan literal: a ``CreateArray`` of
    literal ``struct<c,n>`` rows, which ConstantFolding collapses to
    a single ``array<struct>`` Literal before codegen — at 100 TB
    each row computes C dot products in codegen and never moves. The
    per-centroid cosines come from a single ``transform`` lambda over
    that matrix, so the generated code is O(1) in the number of
    centroids — the previous per-centroid fold subtrees made
    analysis+codegen time linear in C (seconds of driver latency per
    plan at C=8, a blown 64 KB codegen budget by C≈100) where the
    lambda compiles once and loops at runtime. Centroid norms are
    precomputed driver-side with the same sequential fold + sqrt as
    the engines, so cosine values are bit-identical to the literal
    formulation. Argmax is ``array_position(array_max)`` —
    first-match ⇒ ties pick the lowest centroid id, matching
    ``ORDER BY cos DESC, cid``.
    """
    # one F.expr = one py4j round trip; per-element F.lit would cost
    # C×dim driver↔JVM calls (~1.2 s at 8×64) before the query even
    # starts. CAST('<repr>' AS DOUBLE) round-trips the exact IEEE
    # value. ConstantFolding collapses the whole tree to one Literal.
    # The whole bundle (cmat + lambdas + argmax) is memoized per
    # (vec_col, centroid values) — the r12 §8 mechanism, here with a
    # correctly DATA-keyed key (same discipline as the histogram-bin
    # memo): changed centroids rebuild, repeat assignments against
    # the same centroid set (k-means iterations, corpus+query sides,
    # bench reps) reuse ~0.14 s of py4j construct per call.
    def _build() -> dict:
        def _d(x: float) -> str:
            return f"CAST('{float(x)!r}' AS DOUBLE)"

        cmat = F.expr(
            "array("
            + ",".join(
                "struct(array("
                + ",".join(_d(x) for x in cv)
                + f") as c, {_d(_seq_norm(cv))} as n)"
                for cv in centroids
            )
            + ")"
        )
        vec = F.col(vec_col)
        # the row norm rides in as a zip_with ARGUMENT (array_repeat),
        # not as a column referenced inside the lambda: CollapseProject
        # inlines a once-referenced column into the lambda body, where
        # the interpreted HOF re-evaluates it per element — the 64-dim
        # norm fold ran once per CENTROID per row (measured 1.94 s vs
        # 1.09 s for the heavier exact scoring pass at sf0.1,
        # optimization r12). An argument is evaluated once per row
        # wherever it is inlined; the division arithmetic is
        # unchanged, so cosines stay bit-identical.
        norms = F.array_repeat(l2_norm(vec), len(centroids))
        return {
            "coss": F.zip_with(
                cmat,
                norms,
                lambda s, nv: F.round(
                    dot_product(vec, s["c"]) / (nv * s["n"]), 6
                ),
            ),
            "cell": (
                F.array_position("_coss", F.array_max("_coss")) - 1
            ).cast("long"),
        }

    bundle = expr_memo(
        (
            "with_ivf_cell",
            vec_col,
            tuple(tuple(float(x) for x in cv) for cv in centroids),
        ),
        _build,
    )
    out = df.withColumn("_coss", bundle["coss"]).withColumn(
        out_col, bundle["cell"]
    )
    if out_scores is None:
        return out.drop("_coss")
    return out.withColumnRenamed("_coss", out_scores)


def seed_centroids(
    corpus: DataFrame,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic centroid seed: the ``num_centroids`` lowest-id
    corpus vectors (oracle-reproducible, no RNG state)."""
    return [
        list(r[1])
        for r in corpus.filter(F.col(id_col) < num_centroids)
        .orderBy(id_col)
        .select(id_col, vec_col)
        .collect()
    ]


def kmeans_refine_centroids(
    corpus: DataFrame,
    centroids: list[list[float]],
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 20,
) -> list[list[float]]:
    """Spherical-k-means refinement (Lloyd's iterations) of an IVF
    centroid set.

    Each iteration: assign every vector to its max-cosine centroid
    (inline, no shuffle — see :func:`with_ivf_cell`; the per-centroid
    cosines are rounded to 1e-6 before the argmax, ties break lowest
    cell id), then recompute each cell's mean via posexplode +
    (cell, dim) aggregate — one shuffle of (cell, dim, partial-sum)
    triples, never the vectors themselves. The k×dim result collects
    to the driver (tiny) and rides into the next iteration's plan as
    literals, so at 100 TB each iteration is one scan + one narrow
    aggregate. Empty cells keep their previous centroid.

    BIT-deterministic (round 5): the mean aggregate sums
    floor-quantized int64 components (the :func:`quantized_covariance`
    contract — associative integer sums, so partition order cannot
    move a bit) and the driver closes each mean with the fixed-order
    expression ``(float(Σq)/scale)/n``. With the rounded-cosine
    argmax this makes every iteration — and hence the final centroid
    set and anything probed through it — exactly replayable by a SQL
    engine, which is what upgrades `sim_ivf_kmeans` to a
    hash-verified oracle. Quantization bias ≤ 1/scale per component
    (~1e-6): noise for clustering, the whole point for the contract.
    """
    from pyspark import StorageLevel

    cents = [list(c) for c in centroids]
    dim = len(cents[0])
    # every iteration re-reads the same (id, vector) projection with
    # different centroid literals; persist it once so iterations 2..N
    # read columnar cache instead of re-scanning (and re-decoding) the
    # source. MEMORY_AND_DISK spills rather than OOMs when the
    # projected corpus outgrows executor memory.
    base = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sc = float(scale)
    try:
        for _ in range(iters):
            assigned = with_ivf_cell(base, "_v", cents, "_cell")
            sums = (
                assigned.select("_cell", F.posexplode("_v").alias("_pos", "_x"))
                .groupBy("_cell", "_pos")
                .agg(
                    F.sum(
                        F.floor(F.col("_x").cast("double") * F.lit(sc)).cast(
                            "long"
                        )
                    ).alias("_sq"),
                    F.count(F.lit(1)).alias("_n"),
                )
                .collect()
            )
            by_cell: dict[int, list[float]] = {}
            for r in sums:
                by_cell.setdefault(int(r["_cell"]), [0.0] * dim)[int(r["_pos"])] = (
                    float(r["_sq"]) / sc
                ) / float(r["_n"])
            cents = [by_cell.get(i, cents[i]) for i in range(len(cents))]
    finally:
        base.unpersist()
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) probing: partition the
    corpus into ``num_centroids`` cells by nearest centroid, probe the
    query's ``nprobe`` closest cells, exact-score the candidates. Same
    output contract as :func:`cosine_topk`; recall < 1 by design.

    Default centroids are the ``num_centroids`` lowest-id corpus
    vectors — deterministic and oracle-reproducible; pass
    ``centroids=kmeans_refine_centroids(...)`` for the recall-tuned
    layout (the assignment/probe plumbing is identical). ``nprobe``
    trades candidates for recall the standard IVF way: the probe set
    for nprobe=p is a superset of nprobe=p−1, so recall is monotone
    in p — and only the tiny broadcast query side fans out, the
    corpus layout is untouched. Assignment is inline (no shuffle, see
    :func:`with_ivf_cell`); the probe is a broadcast equi-join on
    cell id, so the scored candidate set shrinks ~C/p× vs brute force.
    """
    cents = centroids or seed_centroids(corpus, num_centroids, id_col, vec_col)
    cb = with_ivf_cell(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec")),
        "_cvec",
        cents,
        "cell",
    )
    q0 = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    if nprobe <= 1:
        qb = with_ivf_cell(q0, "_qvec", cents, "qcell")
    else:
        scored_cells = with_ivf_cell(
            q0, "_qvec", cents, "qcell", out_scores="_qcoss"
        ).select(
            "query_id",
            "_qvec",
            F.posexplode("_qcoss").alias("qcell_cand", "_qcos"),
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.col("_qcos").desc(), F.col("qcell_cand").asc()
        )
        qb = (
            scored_cells.withColumn("_pr", F.row_number().over(wp))
            .filter(F.col("_pr") <= nprobe)
            .select("query_id", "_qvec", F.col("qcell_cand").alias("qcell"))
        )
    scored = cb.join(
        F.broadcast(qb),
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity(F.col("_qvec"), F.col("_cvec")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, then
    exact-score candidates. Same output shape as :func:`cosine_topk`;
    recall < 1 by design (measured in tests against the exact path).

    The bucket id is computed inline on both sides (one scan each, no
    pre-join); the bucket equi-join replaces the cross product, so
    scored candidates shrink by ~2^planes.
    """
    cb = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cn"),
        lsh_bucket_column(F.col(vec_col), num_planes, dim).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
        lsh_bucket_column(F.col(vec_col), num_planes, dim).alias("qbucket"),
    )
    scored = cb.join(
        F.broadcast(qb),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        "vec_id",
        F.round(
            dot_product(F.col("_qvec"), F.col("_cvec"))
            / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk_lsh_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB'07 shape): probe the
    query's own bucket plus every bucket at Hamming distance 1 (one
    hyperplane sign flipped) — the buckets a near neighbor most likely
    fell into when it straddled one boundary.

    Recall rises toward exact at the cost of scoring ≈(planes+1)× more
    candidates; the corpus side is untouched (still one bucket per
    vector, one scan, no index rebuild), which is the multi-probe
    selling point at 100 TB: recall is tuned query-side only. The
    probe fan-out explodes the tiny broadcast query relation, never
    the corpus. A corpus vector has exactly one bucket and the
    query's probe set is distinct, so no candidate dedup is needed.
    """
    cb = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cn"),
        lsh_bucket_column(F.col(vec_col), num_planes, dim).alias("bucket"),
    )
    probes = F.array(
        F.col("_qbucket"),
        *[
            F.col("_qbucket").bitwiseXOR(F.lit(1 << p)).cast("long")
            for p in range(num_planes)
        ],
    )
    qb = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qn"),
            lsh_bucket_column(F.col(vec_col), num_planes, dim).alias("_qbucket"),
        )
        .withColumn("probe", F.explode(probes))
        .drop("_qbucket")
    )
    scored = cb.join(
        F.broadcast(qb),
        (F.col("bucket") == F.col("probe")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        "vec_id",
        F.round(
            dot_product(F.col("_qvec"), F.col("_cvec"))
            / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_centroids(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group element-wise centroid of an embedding column — the
    aggregation step of cluster labeling, per-domain embedding drift
    monitoring, and IVF-style coarse quantizer training over
    pre-assigned groups.

    Plan shape: posexplode → groupBy(group, pos) → avg. The explode
    never crosses a shuffle: Catalyst's partial aggregation combines
    (group, pos) partial sums map-side within the scan stage, so the
    exchange carries only groups×dim aggregated rows per input
    partition — not rows×dim. Long output ``(group, pos, centroid,
    n_vecs)`` is engine-portable for auditing and re-assembles to
    arrays with ``sort_array(collect_list(struct(pos, centroid)))``
    when a vector shape is needed.
    """
    from lakehouse_tools_spark.functions.portable import floor6

    ex = embeddings.select(
        F.col(group_col).alias("group_key"),
        F.posexplode(F.col(vec_col)).alias("pos", "_val"),
    )
    return ex.groupBy("group_key", "pos").agg(
        floor6(F.avg(F.col("_val").cast("double"))).alias("centroid"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


def cross_neardup_pairs(
    corpus: DataFrame,
    reference: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Near-dup pairs BETWEEN two corpora — semantic contamination
    screening: a training document whose embedding sits within
    ``threshold`` cosine of an eval-set document is a paraphrase-level
    leak the exact-fingerprint and shared-n-gram decontamination
    rules (ext/dedup.decontaminate) can't see.

    ``num_planes=None`` scores every cross pair exactly (|corpus| ×
    |reference| — the audit baseline; fine when the reference side is
    an eval set, i.e. small). With ``num_planes`` set, both sides
    bucket by hyperplane signs and only same-bucket pairs score — the
    corpus×corpus scale path, recall < 1 like the self-join LSH.
    Output: ``(vec_id, ref_id, cos)``.
    """
    a = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_va"),
        l2_norm(F.col(vec_col)).alias("_na"),
    )
    b = reference.select(
        F.col(id_col).alias("ref_id"),
        F.col(vec_col).alias("_vb"),
        l2_norm(F.col(vec_col)).alias("_nb"),
    )
    if num_planes is None:
        joined = a.crossJoin(F.broadcast(b))
    else:
        a = a.withColumn(
            "_b", lsh_bucket_column(F.col("_va"), num_planes, dim)
        )
        b = b.withColumn(
            "_b2", lsh_bucket_column(F.col("_vb"), num_planes, dim)
        )
        joined = a.join(b, F.col("_b") == F.col("_b2")).drop("_b", "_b2")
    return (
        joined.select(
            "vec_id",
            "ref_id",
            F.round(
                dot_product(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: each query's
    top-k most-similar corpus vectors whose ``label_col`` DIFFERS —
    the near-misses that teach an embedding model its decision
    boundary (random negatives are too easy; same-label neighbors are
    positives, not negatives).

    Same exact-scoring shape as :func:`cosine_topk` — broadcast query
    side, codegen'd dot/norm, per-query windowed top-k — with the
    label exclusion applied BEFORE ranking so every returned row is a
    usable negative. Null-labeled corpus rows are excluded outright
    (unknown label can't be certified a negative). For query sets too
    large to broadcast, mine per IVF cell (with_ivf_cell) and accept
    approximate negatives — at which point recall is measured by
    sim_recall_report's pattern, not assumed.

    Output: ``(query_id, vec_id, cos, rank)``, rank 1 = hardest.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("_qlabel"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("_clabel"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            F.col("_clabel").isNotNull()
            & ~F.col("_clabel").eqNullSafe(F.col("_qlabel"))
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot_product(F.col("_qvec"), F.col("_cvec"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _covariance_gram(
    df: DataFrame,
    vec_col: str,
    dims: tuple[int, ...],
    scale: int,
) -> DataFrame:
    """Gram-path physical strategy for :func:`quantized_covariance`
    (see its docstring): exact int64 per-partition Gram blocks via
    Arrow batches, driver reduce in unbounded Python ints, and a
    closing Python-float replay of the SAME fixed-order IEEE
    expression the "agg" strategy compiles — Python floats ARE
    doubles, so the two strategies (and the DuckDB oracle) are
    bit-identical."""
    import math

    import numpy as np
    import pandas as pd

    d = len(dims)
    sc = float(scale)
    spark = df.sparkSession
    idx = list(dims)

    def _part(batches):
        G = np.zeros((d, d), dtype=np.int64)
        t = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            col = pdf[vec_col]
            if len(col) == 0:
                continue
            # fail with a CLEAR contract error instead of an opaque
            # numpy shape/index error deep in the executor (the driver
            # pre-validates nulls and the first row's width; ragged
            # rows can only be caught here)
            if col.isna().any():
                raise ValueError(
                    f"quantized_covariance: null {vec_col!r} vector "
                    "in input (gram strategy)"
                )
            stacked = np.stack(col.to_numpy()).astype(np.float64)
            if stacked.shape[1] <= max(idx):
                raise ValueError(
                    f"quantized_covariance: {vec_col!r} vector of "
                    f"length {stacked.shape[1]} shorter than "
                    f"max(dims)={max(idx)} (ragged corpus)"
                )
            X = np.floor(stacked[:, idx] * sc).astype(np.int64)
            G += X.T @ X
            t += X.sum(axis=0)
            n += X.shape[0]
        yield pd.DataFrame(
            {"g": [G.ravel().tolist()], "t": [t.tolist()], "n": [n]}
        )

    parts = (
        df.select(vec_col)
        .mapInPandas(_part, schema="g array<long>, t array<long>, n long")
        .collect()
    )
    Gt = [[0] * d for _ in range(d)]
    tt = [0] * d
    n = 0
    for row in parts:
        flat = row["g"]
        for a in range(d):
            base = a * d
            ga = Gt[a]
            for b in range(d):
                ga[b] += flat[base + b]
        for a in range(d):
            tt[a] += row["t"][a]
        n += row["n"]
    nd = float(n)
    rows = []
    for a in range(d):
        for b in range(a, d):
            sij = float(Gt[a][b]) / (sc * sc)
            si = float(tt[a]) / sc
            sj = float(tt[b]) / sc
            cov = (sij - si * sj / nd) / (nd - 1.0)
            rows.append(
                (int(dims[a]), int(dims[b]), math.floor((cov + 1e-12) * 1e9) / 1e9)
            )
    return spark.createDataFrame(
        rows, "dim_i int, dim_j int, cov double"
    )


def quantized_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: tuple[int, ...] | None = None,
    scale: int = 1 << 20,
    strategy: str = "auto",
    strict_width: bool = False,
) -> DataFrame:
    """Sample covariance of embedding components over QUANTIZED
    inputs, as (i, j, cov) rows for i ≤ j — the statistic PCA /
    whitening / drift monitors start from.

    Why quantize: a distributed float sum is order-dependent, so two
    engines (or two runs with different partitioning) disagree in the
    last bits — unacceptable for a hash-verified contract. Flooring
    each component to ``1/scale`` units makes every addend an exact
    integer; 64-bit integer sums are associative, so the aggregate is
    BIT-DETERMINISTIC regardless of partitioning, and the closing
    float arithmetic is a fixed-order scalar expression both engines
    replay identically. Quantization bias is ≤ 1/scale (~1e-6 at the
    default) per component — far below estimation noise for any real
    corpus. Overflow headroom: |s| ≤ scale, so Σ s_i·s_j needs
    n·scale² < 2^63 — n up to ~8e6 at scale=2^20; lower ``scale`` for
    bigger corpora (the contract, not the math, is what scale buys).

    Plan — two bit-identical physical strategies, both ONE full scan,
    ZERO shuffles, selected by ``strategy``:

    - ``"agg"``: every (i,j) pair is a ``sum`` branch in a single
      map-side-combined Catalyst aggregate. Pure JVM, but the
      d(d+1)/2 expression width is a FIXED plan-compile/codegen cost:
      measured ~6 s at d=16 (153 aggregates) *independent of data
      volume* (flat from sf0.001 to sf0.1) — fine for narrow blocks,
      dominant for wide ones.
    - ``"gram"``: per-partition exact int64 Gram blocks in Arrow
      batches (``mapInPandas`` + numpy, the :func:`pca_fit` shape),
      reduced driver-side in unbounded Python ints; the closing float
      arithmetic replays the SAME fixed-order expression per element,
      so the output is bit-identical to "agg" (pinned in tests).
      Trivial plan (compiles in ms), driver traffic partitions × d²
      longs; per-row cost is one numpy rank-1 update instead of
      codegen, still far below scan+decode cost.

    ``"auto"`` picks "agg" for d ≤ 8 (36 aggregates compile fast) and
    "gram" above — wide blocks get the flat-compile path, narrow
    probes stay pure-JVM. Since both are exact integer sums closed by
    the same expression, the choice is invisible to the hash-verified
    contract (same DuckDB oracle checks either).

    Input validation probes only the FIRST row's width by default,
    so a *ragged* corpus (some vectors shorter than ``max(dims)``)
    slips past it: "gram" then fails loudly per batch while "agg"
    silently sums nulls. Pass ``strict_width=True`` to pay one
    min-length aggregate scan up front and make both strategies
    reject ragged input identically.
    """
    d = len(dims) if dims is not None else None
    if d is None:
        probe = df.select(F.size(vec_col).alias("n")).first()
        if probe is None or probe["n"] is None:
            raise ValueError(
                "quantized_covariance: input has no rows (or a null "
                f"{vec_col!r} in the first row); pass dims= explicitly "
                "or supply a non-empty DataFrame"
            )
        dims = tuple(range(int(probe["n"])))
        d = len(dims)
    dims = tuple(int(i) for i in dims)
    # sample covariance divides by (n-1): mirror pca_fit's n>=2 guard
    # instead of silently emitting null covariances at n<=1
    n_rows = df.limit(2).count()
    if n_rows < 2:
        raise ValueError(
            f"quantized_covariance needs >= 2 rows, got {n_rows}"
        )
    if strategy not in ("auto", "agg", "gram"):
        raise ValueError(f"unknown strategy {strategy!r}")
    # validate ONCE for both strategies so they fail identically on
    # bad input (pre-fix, "agg" silently emitted null covariances on
    # null vectors / out-of-range dims while "gram" crashed with an
    # opaque numpy error). The width check is the same cheap
    # first-row probe used for dims inference; the null check is a
    # limit(1) early-exit filter that reads only the validity bitmap
    # (parquet definition levels), never decoding vectors.
    #
    # RAGGED-CORPUS ASYMMETRY: the first-row probe cannot see rows
    # SHORTER than max(dims) further down the corpus. On ragged
    # input the two strategies diverge there — "gram" fails loudly
    # per Arrow batch (numpy shape mismatch) while "agg"'s
    # element_at returns null and silently contaminates the sums.
    # strict_width=True closes the gap with a full min(size) scan
    # up front (one lightweight aggregate over array lengths) so
    # both strategies fail identically on ragged corpora; the
    # default keeps the probe cheap for the common fixed-width case.
    first = df.select(F.size(vec_col).alias("n")).first()
    if first is not None and first["n"] is not None and max(dims) >= int(first["n"]):
        raise ValueError(
            f"quantized_covariance: max(dims)={max(dims)} out of range "
            f"for {vec_col!r} vectors of length {int(first['n'])}"
        )
    if strict_width:
        mn = df.agg(F.min(F.size(vec_col)).alias("m")).first()["m"]
        if mn is not None and max(dims) >= int(mn):
            raise ValueError(
                f"quantized_covariance: ragged corpus — min vector "
                f"length {int(mn)} <= max(dims)={max(dims)}; the "
                "statistic is undefined on the short rows"
            )
    if df.filter(F.col(vec_col).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"quantized_covariance: input contains null {vec_col!r} "
            "vectors; filter them out (the statistic is undefined on "
            "nulls and the two physical strategies would diverge)"
        )
    if strategy == "gram" or (strategy == "auto" and d > 8):
        return _covariance_gram(df, vec_col, dims, scale)
    q = df.select(
        *[
            F.floor(
                F.element_at(F.col(vec_col), i + 1).cast("double")
                * F.lit(float(scale))
            )
            .cast("long")
            .alias(f"_s{k}")
            for k, i in enumerate(dims)
        ]
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    aggs += [F.sum(f"_s{k}").alias(f"_t{k}") for k in range(d)]
    for a in range(d):
        for b in range(a, d):
            aggs.append(
                F.sum(F.col(f"_s{a}") * F.col(f"_s{b}")).alias(f"_p{a}_{b}")
            )
    one = q.agg(*aggs)
    sc = float(scale)
    stack_args = []
    for a in range(d):
        for b in range(a, d):
            n = F.col("_n").cast("double")
            sij = F.col(f"_p{a}_{b}").cast("double") / F.lit(sc * sc)
            si = F.col(f"_t{a}").cast("double") / F.lit(sc)
            sj = F.col(f"_t{b}").cast("double") / F.lit(sc)
            cov = (sij - si * sj / n) / (n - F.lit(1.0))
            stack_args.extend(
                [
                    F.lit(dims[a]).cast("int"),
                    F.lit(dims[b]).cast("int"),
                    F.floor((cov + F.lit(1e-12)) * F.lit(1e9)) / F.lit(1e9),
                ]
            )
    n_pairs = d * (d + 1) // 2
    return one.select(
        F.stack(F.lit(n_pairs), *stack_args).alias("dim_i", "dim_j", "cov")
    )


def quantized_covariance_oracle(
    table_sql: str,
    vec_sql: str = "embedding",
    dims: tuple[int, ...] = tuple(range(16)),
    scale: int = 1 << 20,
) -> str:
    """DuckDB SQL replaying :func:`quantized_covariance` bit-for-bit:
    same floor-quantized integer sums (exact, order-free), same
    fixed-order closing float expression, same 1e-9 floor."""
    d = len(dims)
    cols = [
        f"CAST(floor(CAST({vec_sql}[{i + 1}] AS DOUBLE) * {float(scale)!r}) "
        f"AS BIGINT) AS s{k}"
        for k, i in enumerate(dims)
    ]
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    aggs += [f"sum(s{k}) AS t{k}" for k in range(d)]
    for a in range(d):
        for b in range(a, d):
            aggs.append(f"sum(s{a} * s{b}) AS p{a}_{b}")
    sc2 = repr(float(scale) * float(scale))
    sc1 = repr(float(scale))
    selects = []
    for a in range(d):
        for b in range(a, d):
            cov = (
                f"(CAST(p{a}_{b} AS DOUBLE) / {sc2} - "
                f"(CAST(t{a} AS DOUBLE) / {sc1}) * "
                f"(CAST(t{b} AS DOUBLE) / {sc1}) / CAST(n AS DOUBLE)) "
                f"/ (CAST(n AS DOUBLE) - 1.0)"
            )
            selects.append(
                f"SELECT CAST({dims[a]} AS INT) AS dim_i, "
                f"CAST({dims[b]} AS INT) AS dim_j, "
                f"floor(({cov} + 1e-12) * 1e9) / 1e9 AS cov FROM agg"
            )
    return (
        f"WITH q AS (SELECT {', '.join(cols)} FROM {table_sql}),\n"
        f"agg AS (SELECT {', '.join(aggs)} FROM q)\n"
        + "\nUNION ALL\n".join(selects)
    )


def quantized_trace(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: tuple[int, ...] | None = None,
    scale: int = 1 << 20,
) -> DataFrame:
    """Covariance TRACE (total variance) of an embedding column under
    the same floor-quantization contract as
    :func:`quantized_covariance` — the scalar anchor that lets a SQL
    oracle hash-verify an eigendecomposition it cannot perform:
    Σλ must equal this trace, so a drifting PCA is caught by one
    bit-deterministic number.

    Same determinism argument: integer sums are associative (exact
    under any partitioning), and the closing per-dim variance terms
    are chained LEFT-ASSOCIATIVELY in dim order — a fixed-order
    double expression any IEEE engine replays bit-for-bit
    (:func:`quantized_trace_oracle` emits the identical chain). ONE
    scan, ZERO shuffles, 2d+1 aggregates (diagonal only — d-wide,
    not d²-wide, so codegen stays cheap where the full covariance
    block would not). Output: one row ``(n_rows, dim, trace9)`` with
    trace floored to 1e-9.
    """
    if dims is None:
        probe = df.select(F.size(vec_col).alias("n")).first()
        if probe is None or probe["n"] is None:
            raise ValueError(
                "quantized_trace: input has no rows (or a null "
                f"{vec_col!r} in the first row); pass dims= explicitly"
            )
        dims = tuple(range(int(probe["n"])))
    dims = tuple(int(i) for i in dims)
    d = len(dims)
    n_rows = df.limit(2).count()
    if n_rows < 2:
        raise ValueError(f"quantized_trace needs >= 2 rows, got {n_rows}")
    q = df.select(
        *[
            F.floor(
                F.element_at(F.col(vec_col), i + 1).cast("double")
                * F.lit(float(scale))
            )
            .cast("long")
            .alias(f"_s{k}")
            for k, i in enumerate(dims)
        ]
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    aggs += [F.sum(f"_s{k}").alias(f"_t{k}") for k in range(d)]
    aggs += [
        F.sum(F.col(f"_s{k}") * F.col(f"_s{k}")).alias(f"_p{k}")
        for k in range(d)
    ]
    one = q.agg(*aggs)
    sc = float(scale)
    n = F.col("_n").cast("double")
    trace = None
    for k in range(d):
        skk = F.col(f"_p{k}").cast("double") / F.lit(sc * sc)
        sk = F.col(f"_t{k}").cast("double") / F.lit(sc)
        var_k = (skk - sk * sk / n) / (n - F.lit(1.0))
        trace = var_k if trace is None else trace + var_k
    return one.select(
        F.col("_n").cast("long").alias("n_rows"),
        F.lit(d).cast("int").alias("dim"),
        (F.floor((trace + F.lit(1e-12)) * F.lit(1e9)) / F.lit(1e9)).alias(
            "trace9"
        ),
    )


def quantized_trace_oracle(
    table_sql: str,
    vec_sql: str = "embedding",
    dims: tuple[int, ...] = tuple(range(64)),
    scale: int = 1 << 20,
) -> str:
    """DuckDB SQL replaying :func:`quantized_trace` bit-for-bit: same
    floor-quantized integer sums, same left-associative per-dim
    variance chain, same 1e-9 floor. ``dims`` must be pinned at SQL
    build time (the oracle is a static string); fixture embeddings
    are 64-wide at every SF."""
    d = len(dims)
    cols = [
        f"CAST(floor(CAST({vec_sql}[{i + 1}] AS DOUBLE) * {float(scale)!r}) "
        f"AS BIGINT) AS s{k}"
        for k, i in enumerate(dims)
    ]
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    aggs += [f"sum(s{k}) AS t{k}" for k in range(d)]
    aggs += [f"sum(s{k} * s{k}) AS p{k}" for k in range(d)]
    sc1 = repr(float(scale))
    sc2 = repr(float(scale) * float(scale))
    terms = [
        f"((CAST(p{k} AS DOUBLE) / {sc2} - "
        f"(CAST(t{k} AS DOUBLE) / {sc1}) * (CAST(t{k} AS DOUBLE) / {sc1}) "
        f"/ CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))"
        for k in range(d)
    ]
    chain = " + ".join(terms)  # SQL + is left-associative, like the plan
    return (
        f"WITH q AS (SELECT {', '.join(cols)} FROM {table_sql}),\n"
        f"agg AS (SELECT {', '.join(aggs)} FROM q)\n"
        f"SELECT n AS n_rows, CAST({d} AS INT) AS dim,\n"
        f"       floor(({chain} + 1e-12) * 1e9) / 1e9 AS trace9\n"
        f"FROM agg"
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    scale: int = 1 << 20,
    full_stats: bool = False,
) -> tuple:
    """Fit PCA over an embedding column → (components, eigenvalues,
    explained-variance ratios, n). The dimensionality-reduction /
    whitening step before ANN indexing or drift monitoring.

    Distributed part: ONE scan computing the exact Gram matrix of
    floor-quantized (1/``scale`` units) vectors — each partition
    accumulates an int64 ``XᵀX`` / column-sum block in Arrow batches
    (``mapInPandas``), and the per-partition blocks (d² ints each,
    partition-count rows total) reduce to the driver. Integer sums
    are associative, so the covariance is BIT-DETERMINISTIC under any
    partitioning — which makes the eigendecomposition (LAPACK on a
    d×d matrix, microseconds) reproducible too. Nothing vector-sized
    ever collects; driver traffic is partitions × d² longs.

    Overflow contract (same as :func:`quantized_covariance`):
    n·(max|x|·scale)² must stay < 2⁶³ — at the default scale and
    unit-range embeddings that is tens of millions of rows; lower
    ``scale`` for bigger corpora.

    Sign convention: each component is flipped so its
    largest-magnitude coordinate is positive (eigenvectors are
    sign-ambiguous; pinning it makes results comparable across runs).
    Components are returned most-variant first.
    """
    import numpy as np
    import pandas as pd

    d = int(df.select(F.size(vec_col).alias("n")).first()["n"])
    sc = float(scale)

    def _part(batches):
        G = np.zeros((d, d), dtype=np.int64)
        t = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            X = np.floor(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * sc
            ).astype(np.int64)
            G += X.T @ X
            t += X.sum(axis=0)
            n += X.shape[0]
        yield pd.DataFrame(
            {"g": [G.ravel().tolist()], "t": [t.tolist()], "n": [n]}
        )

    parts = (
        df.select(vec_col)
        .mapInPandas(_part, schema="g array<long>, t array<long>, n long")
        .collect()
    )
    # cross-partition reduce in unbounded Python ints (exact)
    Gt = [[0] * d for _ in range(d)]
    tt = [0] * d
    n = 0
    for row in parts:
        flat = row["g"]
        for i in range(d):
            base = i * d
            gi = Gt[i]
            for j in range(d):
                gi[j] += flat[base + j]
        for i in range(d):
            tt[i] += row["t"][i]
        n += row["n"]
    if n < 2:
        raise ValueError(f"pca_fit needs >= 2 rows, got {n}")
    G = np.array(Gt, dtype=np.float64) / (sc * sc)
    t = np.array(tt, dtype=np.float64) / sc
    cov = (G - np.outer(t, t) / n) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = []
    vals = []
    for idx in order:
        v = eigvecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
        vals.append(float(eigvals[idx]))
    trace = float(np.trace(cov))
    ratios = [v / trace for v in vals]
    if not full_stats:
        return comps, vals, ratios, n
    # Derived from the SAME exact integer sums, at zero extra scans:
    # - mean: quantized column means (bias <= 1/scale, same contract)
    # - trace9: the bit-deterministic trace anchor, closed with the
    #   identical left-associative chain :func:`quantized_trace` /
    #   :func:`quantized_trace_oracle` replay — so a caller holding a
    #   fitted PCA can hash-verify it without a second corpus pass
    import math

    mean = [float(tt[i]) / sc / n for i in range(d)]
    tr = None
    nd = float(n)
    for i in range(d):
        skk = float(Gt[i][i]) / (sc * sc)
        sk = float(tt[i]) / sc
        var_i = (skk - sk * sk / nd) / (nd - 1.0)
        tr = var_i if tr is None else tr + var_i
    trace9 = math.floor((tr + 1e-12) * 1e9) / 1e9
    return comps, vals, ratios, n, {"mean": mean, "trace9": trace9}


def pca_project(
    df: DataFrame,
    vec_col: str,
    components: list[list[float]],
    out_col: str = "proj",
) -> DataFrame:
    """Project vectors onto fitted components — zero shuffles: the
    component matrix is ONE constant-folded plan literal (same
    CAST-repr trick as :func:`with_ivf_cell`, one ``F.expr`` so the
    driver pays one py4j round trip, and the ``transform`` lambda
    keeps generated code O(1) in k); each row computes k codegen dot
    products in place. Scores round to 1e-6 for cross-run hash
    stability."""

    def _d(x: float) -> str:
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    cmat = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_d(x) for x in cv) + ")" for cv in components
        )
        + ")"
    )
    vec = F.col(vec_col)
    return df.withColumn(
        out_col,
        F.transform(cmat, lambda c: F.round(dot_product(vec, c), 6)),
    )
