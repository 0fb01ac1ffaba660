"""Product quantization for compressed-domain ANN (Jégou, Douze &
Schmid 2011, "Product Quantization for Nearest Neighbor Search" —
public; the code layout behind FAISS's IVF-PQ indexes).

A d-dim float vector is split into ``m`` subvectors; each subspace gets
its own ``k``-centroid codebook, and the vector is stored as ``m``
small integers (64-dim float32 = 256 B -> 4 B at m=4/k<=256). Search
uses ASYMMETRIC DISTANCE COMPUTATION (ADC): the query computes one
(m, k) table of exact subspace distances, and each corpus vector's
approximate squared L2 distance is just ``m`` table lookups summed —
the corpus is never decoded.

Why this is a 100 TB operator: an exact float scan over a 10^11-vector
store reads hundreds of TB per query batch; the PQ-coded corpus is
~50-100x smaller, turns the scan I/O-bound -> cache-resident, and the
ADC inner loop is a gather+sum that vectorizes. Composes with the IVF
index (``similarity.build_ivf_index``): prune lists first, ADC within
probed lists.

Spark shape:

- ``train_pq``: ALL m subspace k-means run in the SAME pass — one
  Spark job per Lloyd iteration, each task emitting a single
  (m*k counts, m*k*dsub sums) partial, folded bit-deterministically by
  ``em.reduce_partials`` (pid-sorted; same contract as the GMM/TV
  chain) so trained codebooks can embed as DuckDB oracle literals.
- ``encode_pq``: one ``mapInArrow`` pass, argmin per subspace against
  the broadcast codebooks — O(corpus) with no shuffle.
- ``search_pq``: broadcast the query block, each task scores its
  corpus-code batches against all query LUTs as numpy gathers and
  emits ONLY its per-partition top-k candidates; the global exact
  merge is a window over #partitions*k*|Q| rows. Same
  partial-top-k discipline as ``similarity._ann_ivf_gemm``.

Reference analog: the reference compresses nothing — every score pass
re-reads float features (``IVector.py:1122-1135``); PQ is the standard
public answer when the corpus no longer fits the I/O budget.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureengineer_spark.operators.em import reduce_partials


@dataclass
class PQModel:
    """Per-subspace codebooks: (m, k, dsub) centroid tensor."""

    centroids: np.ndarray

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def k(self) -> int:
        return self.centroids.shape[1]

    @property
    def dsub(self) -> int:
        return self.centroids.shape[2]

    @property
    def d(self) -> int:
        return self.m * self.dsub


def train_pq(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    n_iter: int = 5,
    seed: int = 0,
) -> PQModel:
    """Train all ``m`` subspace codebooks in one distributed Lloyd loop.
    Init = the first ``k`` rows by deterministic hash order, split into
    subvectors (the ``train_kmeans`` discipline). Empty clusters keep
    their previous centroid."""
    import pyarrow as pa

    sc = df.sparkSession.sparkContext
    d = len(df.select(vec_col).first()[0])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    vecs = df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
    init_rows = (
        vecs.withColumn(
            "__h", F.xxhash64(F.to_json(F.col(vec_col)), F.lit(seed))
        )
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"need >= {k} rows to seed {k} centroids")
    cent = np.array([r[vec_col] for r in init_rows]).reshape(k, m, dsub)
    cent = np.transpose(cent, (1, 0, 2)).copy()  # (m, k, dsub)

    schema = T.StructType(
        [
            T.StructField("n", T.ArrayType(T.DoubleType())),
            T.StructField("s", T.ArrayType(T.DoubleType())),
        ]
    )
    for _ in range(n_iter):
        b_c = sc.broadcast(cent)

        def partials(batches):
            c = b_c.value  # (m, k, dsub)
            n_part = np.zeros((m, k))
            s_part = np.zeros((m, k, dsub))
            seen = False
            for batch in batches:
                x = (
                    batch.column(0)
                    .flatten()
                    .to_numpy(zero_copy_only=False)
                    .reshape(-1, m, dsub)
                )
                for j in range(m):
                    cj = c[j]  # (k, dsub)
                    xj = x[:, j, :]  # (n, dsub)
                    a = np.argmin(
                        (cj * cj).sum(axis=1) - 2.0 * (xj @ cj.T), axis=1
                    )
                    n_part[j] += np.bincount(a, minlength=k).astype(
                        np.float64
                    )
                    np.add.at(s_part[j], a, xj)
                seen = True
            if not seen:
                return
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        [n_part.ravel().tolist()], type=pa.list_(pa.float64())
                    ),
                    pa.array(
                        [s_part.ravel().tolist()], type=pa.list_(pa.float64())
                    ),
                ],
                names=["n", "s"],
            )

        parts = reduce_partials(
            vecs.mapInArrow(partials, schema=schema),
            {"n": m * k, "s": m * k * dsub},
        )
        n = parts["n"].reshape(m, k)
        s = parts["s"].reshape(m, k, dsub)
        new_c = cent.copy()
        nonempty = n > 0
        new_c[nonempty] = s[nonempty] / n[nonempty][:, None]
        cent = new_c
    return PQModel(centroids=cent)


def encode_pq(
    df: DataFrame,
    model: PQModel,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Add ``code_col`` = array<int> of length m (nearest subspace
    centroid ids). One map-only Arrow pass, broadcast codebooks."""
    import pyarrow as pa

    m, k, dsub = model.m, model.k, model.dsub
    sc = df.sparkSession.sparkContext
    b_c = sc.broadcast(model.centroids)
    cols = df.columns
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(code_col, T.ArrayType(T.IntegerType()))]
    )

    def kernel(batches):
        c = b_c.value
        cn2 = (c * c).sum(axis=2)  # (m, k)
        for batch in batches:
            idx = batch.schema.get_field_index(vec_col)
            x = (
                batch.column(idx)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(-1, m, dsub)
            )
            codes = np.empty((x.shape[0], m), dtype=np.int32)
            for j in range(m):
                codes[:, j] = np.argmin(
                    cn2[j] - 2.0 * (x[:, j, :] @ c[j].T), axis=1
                )
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [pa.array(codes.tolist(), type=pa.list_(pa.int32()))],
                names=list(batch.schema.names) + [code_col],
            )

    return df.select(*cols).mapInArrow(kernel, schema=out_schema)


def search_pq(
    codes: DataFrame,
    queries: DataFrame,
    model: PQModel,
    k_top: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Per-query top-``k_top`` corpus ids by ADC squared-L2 distance:
    (query_id, rank, vec_id, adc_dist). The query block (LUTs included)
    is broadcast; each task emits only its local top-k per query, so
    the merge window sees #partitions * k_top rows per query. Ties
    break on the lower ``vec_id`` (deterministic)."""
    import pyarrow as pa

    from pyspark.sql.window import Window

    m, k, dsub = model.m, model.k, model.dsub
    qrows = (
        queries.select(query_id_col, query_vec_col).limit(
            max_query_rows + 1
        )
    ).collect()
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"search_pq: query side exceeds max_query_rows={max_query_rows}"
            " — chunk the query block or raise the cap"
        )
    if not qrows:
        return codes.sparkSession.createDataFrame(
            [],
            f"{query_id_col} long, rank int, {id_col} long, adc_dist double",
        )
    qids = np.array([r[query_id_col] for r in qrows], dtype=np.int64)
    qv = np.array([r[query_vec_col] for r in qrows], dtype=np.float64)
    qv = qv.reshape(len(qids), m, dsub)
    # exact (|Q|, m, k) subspace LUT: ||q_sub - c||^2
    c = model.centroids  # (m, k, dsub)
    lut = np.empty((len(qids), m, k))
    for j in range(m):
        diff = qv[:, j, None, :] - c[j][None, :, :]
        lut[:, j, :] = (diff * diff).sum(axis=2)
    sc = codes.sparkSession.sparkContext
    b = sc.broadcast((qids, lut, int(k_top)))

    part_schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def _topk(d, ids, kt):
        """Exact per-query top-k of (nq, n) distances with (dist, id)
        tie order -> ((nq, kt') dists, (nq, kt') ids)."""
        kt_eff = min(kt, d.shape[1])
        order = np.lexsort((np.broadcast_to(ids, d.shape), d), axis=1)[
            :, :kt_eff
        ]
        return np.take_along_axis(d, order, axis=1), ids[order]

    def kernel(batches):
        qids_, lut_, kt = b.value
        nq = len(qids_)
        # running per-query top-k, folded per Arrow batch so task memory
        # is O(nq * (batch_rows + kt)), never O(nq * partition_rows)
        run_d = np.empty((nq, 0))
        run_i = np.empty((nq, 0), dtype=np.int64)
        seen = False
        for batch in batches:
            ids = (
                batch.column(0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            cd = (
                batch.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .reshape(-1, m)
            )
            # gather: dist[q, i] = sum_j lut[q, j, cd[i, j]]
            d = np.zeros((nq, cd.shape[0]))
            for j in range(m):
                d += lut_[:, j, cd[:, j]]
            bd, bi = _topk(d, ids, kt)
            merged_d = np.concatenate([run_d, bd], axis=1)
            merged_i = np.concatenate([run_i, bi], axis=1)
            # merged ids vary per query row: lexsort row-wise
            order = np.lexsort(
                (merged_i, merged_d), axis=1
            )[:, : min(kt, merged_d.shape[1])]
            run_d = np.take_along_axis(merged_d, order, axis=1)
            run_i = np.take_along_axis(merged_i, order, axis=1)
            seen = True
        if not seen or run_d.shape[1] == 0:
            return
        kt_eff = run_d.shape[1]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.repeat(qids_, kt_eff), type=pa.int64()),
                pa.array(run_i.ravel(), type=pa.int64()),
                pa.array(run_d.ravel(), type=pa.float64()),
            ],
            names=[query_id_col, id_col, "adc_dist"],
        )

    cand = codes.select(
        F.col(id_col).cast("long"), F.col(code_col)
    ).mapInArrow(kernel, schema=part_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k_top)
        .select(query_id_col, "rank", id_col, "adc_dist")
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_lists: int = 16,
    m: int = 4,
    k: int = 16,
    kmeans_iter: int = 5,
    pq_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> tuple[np.ndarray, PQModel]:
    """Persist a FAISS-style IVF-PQ index: coarse quantizer (Lloyd
    k-means, ``similarity.train_kmeans``) partitions the corpus into
    inverted lists; a PQ codebook trained on the RESIDUALS
    ``x - coarse[list]`` (the standard IVF-PQ trick — residuals are
    centered, so the same codebook budget quantizes them much tighter
    than raw vectors) encodes each vector to ``m`` small codes. The
    store holds ONLY ``(id, pq_code)`` partitioned by ``list_id`` —
    d·4 bytes/vector becomes m bytes: at 100 TB of raw embeddings the
    index is the thing that still fits on the scan tier, and search
    I/O is ``n_probe/n_lists`` of it (partition pruning) on top.
    Codebooks + coarse centroids land in a JSON sidecar through the
    Hadoop FS API (s3a/hdfs-safe). Returns (centroids, pq_model)."""
    import json
    import os

    import pyarrow as pa

    from featureengineer_spark.operators.similarity import (
        _hadoop_write_text,
        train_kmeans,
    )

    centroids = train_kmeans(
        corpus.select(F.col(vec_col)), k=n_lists, n_iter=kmeans_iter,
        vec_col=vec_col, seed=seed,
    )
    d = centroids.shape[1]
    sc = corpus.sparkSession.sparkContext
    b_cent = sc.broadcast(centroids)

    res_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("__residual", T.ArrayType(T.DoubleType())),
        ]
    )

    def residual_kernel(batches):
        c = b_cent.value
        cn2 = (c * c).sum(axis=1)
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            x = (
                batch.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(-1, d)
            )
            # stable lowest-list argmin — matches the search kernels
            a = np.argsort(
                cn2 - 2.0 * (x @ c.T), axis=1, kind="stable"
            )[:, 0].astype(np.int32)
            r = x - c[a]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64), type=pa.int64()),
                    pa.array(a, type=pa.int32()),
                    pa.array(r.tolist(), type=pa.list_(pa.float64())),
                ],
                names=[id_col, "list_id", "__residual"],
            )

    residuals = (
        corpus.select(F.col(id_col).cast("long"), F.col(vec_col))
        .mapInArrow(residual_kernel, schema=res_schema)
        .persist()
    )
    try:
        pq_model = train_pq(
            residuals, vec_col="__residual", m=m, k=k, n_iter=pq_iter,
            seed=seed,
        )
        coded = encode_pq(
            residuals, pq_model, vec_col="__residual", code_col="pq_code"
        ).select(id_col, "list_id", "pq_code")
        (
            coded.repartition(n_lists, "list_id")
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(path)
        )
    finally:
        residuals.unpersist()
    meta = {
        "n_lists": int(n_lists),
        "dim": int(d),
        "m": int(pq_model.m),
        "k": int(pq_model.k),
        "dsub": int(pq_model.dsub),
        "id_col": id_col,
        "vec_col": vec_col,
        # explicit read schema for searches — skips the per-call parquet
        # schema-inference job (id is cast long at build, codes are int)
        "schema_ddl": f"`{id_col}` long, pq_code array<int>, list_id int",
        "centroids": [float(v) for v in centroids.ravel()],
        "codebooks": [float(v) for v in pq_model.centroids.ravel()],
    }
    _hadoop_write_text(
        corpus.sparkSession, os.path.join(path, "_ivfpq_meta.json"),
        json.dumps(meta),
    )
    return centroids, pq_model


def search_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    k_top: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str | None = None,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Top-``k_top`` ADC search against a persisted
    :func:`build_ivfpq_index` store: (query_id, rank, vec_id,
    adc_dist). One driver-side collect of the query block yields the
    probe assignment, the pruned-scan partition filter
    (``PartitionFilters`` on ``list_id`` — I/O = probed fraction of an
    already m-bytes-per-vector store), and the per-(query, probed list)
    residual LUTs the kernel broadcasts; corpus vectors are never
    decoded. Ties break on lower id; exact global merge window."""
    import json
    import os

    import pyarrow as pa

    from pyspark.sql.window import Window

    from featureengineer_spark.operators.similarity import _hadoop_read_text

    meta = json.loads(
        _hadoop_read_text(spark, os.path.join(path, "_ivfpq_meta.json"))
    )
    n_lists, d = meta["n_lists"], meta["dim"]
    m, k, dsub = meta["m"], meta["k"], meta["dsub"]
    id_col = meta["id_col"]
    vec_col = vec_col or meta["vec_col"]
    centroids = np.array(meta["centroids"]).reshape(n_lists, d)
    codebooks = np.array(meta["codebooks"]).reshape(m, k, dsub)

    qrows = queries.select(query_id_col, vec_col).limit(
        max_query_rows + 1
    ).collect()
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"search_ivfpq_index: query side exceeds {max_query_rows} rows"
        )
    if not qrows:
        return spark.createDataFrame(
            [],
            f"{query_id_col} long, rank int, {id_col} long, adc_dist double",
        )
    qids = np.array([r[query_id_col] for r in qrows], dtype=np.int64)
    qx = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    cn2 = (centroids * centroids).sum(axis=1)
    probe = np.argsort(
        cn2 - 2.0 * (qx @ centroids.T), axis=1, kind="stable"
    )[:, : min(n_probe, n_lists)]
    probed = sorted(int(v) for v in np.unique(probe))
    # The per-(query, probed list) residual LUTs are a pure function of
    # (query block, centroids, codebooks) — all broadcast-sized — so they
    # are built INSIDE the Arrow kernel, lazily per list id the task
    # actually scans, instead of in driver-side Python loops. That caps
    # driver memory at the query block itself (the worst case at the
    # max_query_rows guard was ~1.6 GB of driver LUTs, vs ~n*d*8 bytes of
    # queries now), shrinks the broadcast ~25x, and — because the store
    # is partitioned by list_id — distributes LUT construction to exactly
    # the tasks that probe each list. Construction cost measured at the
    # bench shape: 0.75 s -> ~0.2 s per call.
    sc = spark.sparkContext
    b = sc.broadcast(
        (qids, qx, probe, centroids, codebooks, int(k_top), m, dsub)
    )

    part_schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def kernel(batches):
        qids_, qx_, probe_, cents_, cbs_, kt, m_, dsub_ = b.value
        nq = len(qids_)
        run_d = np.full((nq, 0), 0.0)
        run_i = np.empty((nq, 0), dtype=np.int64)
        luts_: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        def lut_for(lid: int):
            # identical arithmetic (same expression, same operand order)
            # to the former driver-side builder, so ADC distances are
            # bit-for-bit unchanged; cached per task across batches
            got = luts_.get(lid)
            if got is None:
                q_idx = np.where((probe_ == lid).any(axis=1))[0]
                resid = (qx_[q_idx] - cents_[lid]).reshape(
                    len(q_idx), m_, dsub_
                )
                tab = np.empty((len(q_idx), m_, cbs_.shape[1]))
                for j in range(m_):
                    diff = resid[:, j, None, :] - cbs_[j][None, :, :]
                    tab[:, j, :] = (diff * diff).sum(axis=2)
                got = (q_idx, tab)
                luts_[lid] = got
            return got

        def fold(new_d, new_i):
            nonlocal run_d, run_i
            md = np.concatenate([run_d, new_d], axis=1)
            mi = np.concatenate([run_i, new_i], axis=1)
            order = np.lexsort((mi, md), axis=1)[
                :, : min(kt, md.shape[1])
            ]
            run_d = np.take_along_axis(md, order, axis=1)
            run_i = np.take_along_axis(mi, order, axis=1)

        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            cd = (
                batch.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .reshape(-1, m_)
            )
            lids = batch.column(2).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            for lid in np.unique(lids):
                q_idx, tab = lut_for(int(lid))
                if len(q_idx) == 0:
                    continue
                sel = lids == lid
                cdl = cd[sel]
                idl = ids[sel]
                dl = np.zeros((len(q_idx), cdl.shape[0]))
                for j in range(m_):
                    dl += tab[:, j, cdl[:, j]]
                # scatter the local top-k into full-query-width frames
                kt_eff = min(kt, dl.shape[1])
                order = np.lexsort(
                    (np.broadcast_to(idl, dl.shape), dl), axis=1
                )[:, :kt_eff]
                bd = np.full((nq, kt_eff), np.inf)
                bi = np.full((nq, kt_eff), np.iinfo(np.int64).max)
                bd[q_idx] = np.take_along_axis(dl, order, axis=1)
                bi[q_idx] = idl[order]
                fold(bd, bi)
        if run_d.shape[1] == 0:
            return
        keep = np.isfinite(run_d)
        out_q = np.repeat(qids_, run_d.shape[1])[keep.ravel()]
        out_i = run_i.ravel()[keep.ravel()]
        out_d = run_d.ravel()[keep.ravel()]
        if len(out_q) == 0:
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_q, type=pa.int64()),
                pa.array(out_i, type=pa.int64()),
                pa.array(out_d, type=pa.float64()),
            ],
            names=[query_id_col, id_col, "adc_dist"],
        )

    reader = spark.read
    if meta.get("schema_ddl"):
        reader = reader.schema(meta["schema_ddl"])
    pruned = (
        reader.parquet(path)
        .filter(F.col("list_id").isin(probed))
        .select(
            F.col(id_col).cast("long"),
            F.col("pq_code"),
            F.col("list_id").cast("long"),
        )
    )
    cand = pruned.mapInArrow(kernel, schema=part_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k_top)
        .select(query_id_col, "rank", id_col, "adc_dist")
    )


def reconstruct_pq(model: PQModel, codes: np.ndarray) -> np.ndarray:
    """Decode (n, m) int codes back to (n, d) approximate vectors —
    driver-side helper for tests/diagnostics."""
    n = codes.shape[0]
    out = np.empty((n, model.d))
    for j in range(model.m):
        out[:, j * model.dsub : (j + 1) * model.dsub] = model.centroids[j][
            codes[:, j]
        ]
    return out
