"""Product quantization (X3): the canonical billion-scale compressed-ANN
method (IVF-PQ family — Jégou et al., "Product Quantization for Nearest
Neighbor Search", and the FAISS default) expressed Spark-first.

Design:

- **Train** (``train_pq_codebooks``): split the d-dim space into ``m``
  subspaces of d/m dims; per subspace, run a deterministic Lloyd
  k-means over a bounded md5-ranked sample (collected once; the Lloyd
  iterations are driver-side numpy — the sample and the model are both
  model-scale). The model is m × k × (d/m) floats — a few KB,
  driver-side by design (exactly like the IVF centroid table).
- **Encode** (``pq_encode``): per subspace, the argmin-centroid id; the
  m 4-bit codes pack into ONE bigint per vector (k ≤ 16 → nibbles).
  64 floats (256 bytes) become 8 bytes — 32× compression, 4× smaller
  than even the int8 store. The argmin is literal-expression codegen
  (m·k·(d/m) multiply-adds per row, no Python, no shuffle).
- **Search** (``pq_adc_topk``): asymmetric distance computation — each
  query precomputes its LUT[j][c] = ||q_j − centroid_{j,c}||² (m·k
  doubles, computed as literal expressions on the tiny query side), the
  query+LUT broadcast, and a candidate's distance is m array lookups on
  its unpacked nibbles: ``Σ_j LUT[j][code_j]``. The corpus side touches
  8 bytes per vector and does NO float multiply at query time.

Determinism: sampling is md5-ranked, k-means init is lowest-vec-id,
distance ties break to the lowest centroid id — encode is bit-stable
across runs and partitionings. Scores are float sums over per-query
LUTs, so the driver gate records rows-only (like the IVF probe); the
suite pins determinism, the exact-degenerate case (corpus ⊆ codebook →
ADC distance IS the true distance and top-k equals brute force), and a
measured recall floor vs brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 3,
    sample: int = 4096,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """m per-subspace codebooks of k centroids each, trained with the
    deterministic k-means over an md5-ranked sample of ``sample`` rows
    (seeded-sample device shared with stratified_sample / Z-order cuts).

    The sample is BOUNDED (``sample`` rows, ~1 MB) and the model is
    driver-side nested lists by design, so Lloyd's runs driver-side in
    numpy over the ONE collected sample: the previous grouped-Lloyd
    Spark pipeline paid n_iter broadcast-join + double-aggregate jobs
    over a single-partition relation (measured ~4 s of the knn_pq_adc
    bench entry for microseconds of arithmetic — guide §1.2: fix the
    algorithm before the code). Scale-correct at any corpus size: only
    the md5-ranked sample job touches the corpus. Same deterministic
    semantics as the Spark form — init = the k lowest vec_ids per
    subspace, assignment argmin ties to the lowest cid, empty clusters
    drop out for later iterations, missing final slots re-point at the
    lowest surviving centroid (nothing encodes to them). Centroid
    values agree with the former distributed form up to float-sum
    association order; every PQ/IVF-PQ gate is certified by
    engine-independent contracts (recall floors, partition counts),
    not by centroid bits, exactly for this freedom.
    Returns driver-side nested lists (the model: m·k·(d/m) floats)."""
    import numpy as np

    rows = (
        embeddings.select("vec_id", vec_col)
        .withColumn("__r", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__r")
        .limit(sample)
        .select("vec_id", vec_col)
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    X = np.asarray([[float(x) for x in r[vec_col]] for r in rows], dtype=np.float64)
    dims = int(X.shape[1]) if len(rows) else 0
    if dims % m:
        raise ValueError(f"vector dim {dims} not divisible by m={m}")
    if k > 16:
        raise ValueError("k > 16 does not fit the nibble packing")
    sub = dims // m
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        # init: the k lowest vec_ids of the (vec_id-sorted) sample
        cent: dict[int, "np.ndarray"] = {
            c: S[c].copy() for c in range(min(k, len(S)))
        }
        for _ in range(n_iter):
            order = sorted(cent)
            C = np.stack([cent[c] for c in order])
            d2 = ((S[:, None, :] - C[None]) ** 2).sum(-1)
            a = d2.argmin(1)  # first minimum == lowest cid (order sorted)
            nxt: dict[int, "np.ndarray"] = {}
            for i, c in enumerate(order):
                mask = a == i
                if mask.any():  # empty clusters drop out
                    nxt[c] = S[mask].mean(0)
            cent = nxt
        first = cent[min(cent)]
        books.append(
            [[float(x) for x in cent.get(c, first)] for c in range(k)]
        )
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, pq_code): per-subspace argmin centroid, packed as m
    nibbles in one bigint. Pure literal-expression codegen."""
    m, k = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    # The whole packed-code expression is built as ONE SQL string and
    # parsed JVM-side in a single call: the previous Column-arithmetic
    # loops issued ~m·k·sub (≈1000+) py4j round trips of pure plan
    # construction per encode call (profiled as multi-second driver
    # stalls in every IVF-PQ lifecycle). The parsed tree is the same
    # left-associated accumulation — bit-identical codes.
    def dlit(v: float) -> str:
        # CAST('<repr>' AS DOUBLE) round-trips exactly (shortest repr ->
        # Double.parseDouble) and folds to the same constant as F.lit
        return f"CAST('{float(v)!r}' AS DOUBLE)"

    code = "CAST(0 AS BIGINT)"
    for j in range(m):
        dists = []
        for c in range(k):
            cent = codebooks[j][c]
            d = "CAST(0.0 AS DOUBLE)"
            for t in range(sub):
                x = (
                    f"(CAST(element_at(`{vec_col}`, {j * sub + t + 1}) "
                    f"AS DOUBLE) - {dlit(cent[t])})"
                )
                d = f"({d} + ({x} * {x}))"
            dists.append(d)
        arr = f"array({', '.join(dists)})"
        # first index of the minimum -> ties to the LOWEST centroid id
        cid = f"CAST(array_position({arr}, array_min({arr})) - 1 AS BIGINT)"
        code = f"({code} + shiftleft({cid}, {4 * j}))"
    return embeddings.select("vec_id", F.expr(code).alias("pq_code"))


def pq_encode_arrow(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched twin of ``pq_encode`` (X6 seam, like
    brute_force_topk_arrow): identical nibble-packed codes via one
    numpy argmin per batch. This is the m=16 path — at m·k·(d/m) =
    1024 literal terms the expression form exceeds the JVM codegen
    method budget and silently falls back to interpreted eval (~10×
    slower, logged as a CodeGenerator ERROR); the vectorized batch
    matrix form costs O(B·m·k·sub) flops in C regardless of m."""
    import numpy as np
    import pandas as pd

    m, k = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    cbook = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub)

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ).reshape(len(pdf), m, sub)
            # (B, m, k) squared subdistances; argmin ties -> lowest cid
            # (numpy first-minimum == array_position-of-array_min)
            d2 = ((vecs[:, :, None, :] - cbook[None]) ** 2).sum(-1)
            codes = d2.argmin(-1).astype(np.int64)
            packed = np.zeros(len(pdf), dtype=np.int64)
            for j in range(m):
                packed |= codes[:, j] << np.int64(4 * j)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "pq_code": packed}
            )

    return embeddings.select("vec_id", vec_col).mapInPandas(
        encode, "vec_id long, pq_code long"
    )


def _pq_lut(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    passthrough: dict[str, str] | None = None,
) -> DataFrame:
    """(query_id, __lut): the per-query ADC lookup table — m arrays of k
    squared subdistances, computed Arrow-batched on the (tiny) query
    side and pinned so the corpus join reuses it. (The literal-
    expression form was m·k·(d/m) terms — 1024 at m=16 — which blows
    the JVM codegen method budget: Janino compile fails, logs an ERROR
    and interprets. One numpy einsum per batch is exact IEEE-double
    arithmetic in the same accumulation order.)

    ``passthrough`` carries extra id columns (name -> Spark SQL type)
    through the batch unchanged — the residual-IVFADC read path keys
    its LUTs by (query_id, cid), one per probed list."""
    import numpy as np
    import pandas as pd

    m, kk = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    cbook = np.asarray(codebooks, dtype=np.float64)  # (m, kk, sub)
    extra = dict(passthrough or {})

    def lut(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ).reshape(len(pdf), m, sub)
            d2 = ((vecs[:, :, None, :] - cbook[None]) ** 2).sum(-1)
            out = {"query_id": pdf["query_id"].to_numpy()}
            for c in extra:
                out[c] = pdf[c].to_numpy()
            out[vec_col] = pdf[vec_col]
            out["__lut"] = [row.tolist() for row in d2]
            yield pd.DataFrame(out)

    extra_schema = "".join(f", {c} {t}" for c, t in extra.items())
    out_schema = (
        f"query_id long{extra_schema}, {vec_col} array<double>, "
        "__lut array<array<double>>"
    )
    return (
        queries.select(
            "query_id",
            *[F.col(c) for c in extra],
            F.transform(vec_col, lambda x: x.cast("double")).alias(vec_col),
        )
        .mapInPandas(lut, out_schema)
        .localCheckpoint(eager=True)
    )


def _adc_dist(m: int) -> F.Column:
    """Σ_j LUT[j][code_j] over the packed nibbles — m array lookups.
    One parsed SQL expression (same tree as the former Column loop,
    without its ~10·m py4j round trips of plan construction)."""
    dist = "CAST(0.0 AS DOUBLE)"
    for j in range(m):
        nib = f"(shiftright(pq_code, {4 * j}) & 15)"
        dist = (
            f"({dist} + element_at(element_at(__lut, {j + 1}), "
            f"CAST({nib} + 1 AS INT)))"
        )
    return F.expr(dist)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "vec_id", "adc_dist")
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by asymmetric PQ distance over the FULL code table: the
    query side computes its m×k LUT (literal expressions over the
    codebook), broadcasts, and each corpus code pays m array lookups —
    zero float multiplies per candidate. Returns
    (query_id, rk, vec_id, adc_dist)."""
    q = _pq_lut(queries, codebooks, vec_col).drop(vec_col)
    scored = codes.join(F.broadcast(q)).select(
        "query_id", "vec_id", _adc_dist(len(codebooks)).alias("adc_dist")
    )
    return _topk(scored, k)


def pq_adc_rerank_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    embeddings: DataFrame,
    k: int = 5,
    shortlist: int = 200,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist + exact re-rank — the published two-stage PQ
    retrieval (Jégou et al.'s IVFADC+R refinement stage): the 8-byte
    codes produce a ``shortlist`` of candidates per query at zero float
    multiplies per row, then ONLY those shortlist·|queries| rows pay an
    exact cosine against the raw vectors. At 100 TB the full-precision
    pass touches shortlist/corpus of the data (here 200 rows/query)
    while the scan stays on the 32×-compressed codes; recall is set by
    the shortlist size, not by quantization error. Returns
    (query_id, rk, vec_id, cosine) ranked by EXACT cosine."""
    from .similarity import _dot, _norm

    short = pq_adc_topk(codes, queries, codebooks, k=shortlist, vec_col=vec_col)
    q = queries.select("query_id", F.col(vec_col).alias("__q_vec"))
    scored = (
        short.select("query_id", "vec_id")
        .join(embeddings.select("vec_id", vec_col), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("__q_vec"), F.col(vec_col))
                / (_norm(F.col("__q_vec")) * _norm(F.col(vec_col)))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "vec_id", "cosine")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 2,
    m: int = 8,
    kq: int = 16,
    n_iter: int = 2,
    sample: int = 4096,
    vec_col: str = "embedding",
) -> DataFrame:
    """The full IVF-PQ retrieval architecture (the FAISS default at
    billion scale), composed from the engine's own pieces: a k-means
    COARSE quantizer partitions the corpus into inverted lists
    (operators/clustering.py), vectors store as 8-byte PQ codes, and a
    query ADC-scores ONLY the ``nprobe`` nearest lists — scan cost drops
    from O(corpus) to ~O(corpus · nprobe / n_lists) per query batch, on
    top of PQ's 32× compression. Both the probe relation (query_id ×
    nprobe list ids) and the LUT broadcast; the corpus side is one
    filtered pass over (cid, pq_code) — at 1000 executors the probed
    lists shard like any other partition-pruned scan. Approximate on two
    axes by design (probe recall × PQ quantization); the suite measures
    the floor vs brute force."""
    from .clustering import kmeans

    centroids, assigned = kmeans(
        embeddings, k=n_lists, n_iter=n_iter, vec_col=vec_col
    )
    books = train_pq_codebooks(
        embeddings, m=m, k=kq, n_iter=n_iter, sample=sample, vec_col=vec_col
    )
    codes = pq_encode(embeddings, books).join(
        assigned.select("vec_id", "cid"), "vec_id"
    )
    q_lut = _pq_lut(queries, codebooks=books, vec_col=vec_col)
    # nprobe nearest coarse centroids per query: tiny × tiny broadcast
    # join, ranked — the probe plan, metadata-sized like the IVF probe
    from .clustering import _sq_dist

    probed = (
        q_lut.select("query_id", vec_col)
        .join(F.broadcast(centroids))
        .select(
            "query_id", "cid",
            _sq_dist(F.col(vec_col), F.col("c_vec")).alias("__d"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("__d").asc(), F.col("cid").asc())
    probed = (
        probed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= nprobe)
        .select("query_id", "cid")
    )
    scored = (
        codes.join(F.broadcast(probed), "cid")
        .join(F.broadcast(q_lut.drop(vec_col)), "query_id")
        .select(
            "query_id", "vec_id", _adc_dist(m).alias("adc_dist")
        )
    )
    return _topk(scored, k)
