"""Incremental ANN index queries — the registry surface for
``streaming/ann_ivm.py`` (incremental IVF maintenance).

Batch protocol shared by all three queries: the coarse quantizer is
FROZEN on the bootstrap subset (``vec_id % 3 == 0`` — exact-decimal
per-label component means, the embedding_centroids recipe), then the
corpus arrives as three add batches (modulo-3 residues) and one pure
removal batch retracting every ``vec_id % 7 == 3``. The oracles
re-derive the frozen quantizer, the assignment, and the probe path in
plain SQL over the base table — so the driver's hash certifies
incremental maintenance == from-scratch index end to end:

  * ``ann_ivf_assign_incremental`` — the maintained posting table's
    (vec_id, cell, min_d2): frozen-centroid argmin assignment of the
    surviving corpus, exactly.
  * ``ann_ivf_incremental`` — full-probe (nprobe = all cells) top-k
    cosine search over the maintained index == brute force over the
    surviving corpus (cell routing cannot change a full probe, so any
    divergence is a maintenance bug: a lost posting, a leaked
    tombstone, a wrong re-add).
  * ``ann_ivf_pruned_incremental`` — the nprobe=2 probe path (cell
    ranking → partition-pruned scan → top-k), certifying the PRUNED
    read over the maintained layout, not just the exhaustive one.

Determinism: DECIMAL(20,8) centroid sums, 6-dp-rounded L2/cosine,
lowest-cell / lowest-vec_id tie-breaks — the similarity module's
cross-engine discipline throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.queries.dedup import _ivm_state_dir
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

TRAIN_MOD = 3  # vec_id % 3 == 0 trains + arrives in batch 0
REMOVE_MOD = 7  # vec_id % 7 == 3 retracted by the removal batch
REMOVE_RESIDUE = 3
QUERY_STRIDE = 50
TOP_K = 5
N_PROBES = 2

# frozen quantizer + surviving corpus, shared by every oracle
_FROZEN_CENT = f"""
cent_long AS (
  SELECT label AS cell, g.i - 1 AS dim,
         CAST(round(CAST(embedding[g.i] AS DOUBLE), 8) AS DECIMAL(20,8)) AS c
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
  WHERE vec_id % {TRAIN_MOD} = 0
),
cent AS (
  SELECT cell, dim, CAST(round(sum(c), 8) AS DOUBLE) / count(*) AS cv
  FROM cent_long GROUP BY cell, dim
),
cent_vec AS (
  SELECT CAST(cell AS BIGINT) AS cell, list(cv ORDER BY dim) AS cvec
  FROM cent GROUP BY cell
),
surv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS nsq
  FROM embeddings
  WHERE vec_id % {REMOVE_MOD} <> {REMOVE_RESIDUE}
)"""


def _maintained_state(spark: SparkSession, sf_dir: str) -> str:
    """Build the maintained index: bootstrap-train, three add batches,
    one removal batch. Returns the state dir (head version = 3)."""
    from codex_data_products_spark.streaming.ann_ivm import (
        apply_ann_batch,
        bootstrap_ann_state,
    )

    emb = T(spark, sf_dir, "embeddings")
    state = _ivm_state_dir("ann_ivm")
    train = emb.filter(F.col("vec_id") % TRAIN_MOD == 0)
    bootstrap_ann_state(spark, state, train)
    for k in range(TRAIN_MOD):
        apply_ann_batch(
            spark,
            state,
            k,
            adds=emb.filter(F.col("vec_id") % TRAIN_MOD == k).select(
                "vec_id", "embedding"
            ),
        )
    apply_ann_batch(
        spark,
        state,
        TRAIN_MOD,
        removes=emb.filter(
            F.col("vec_id") % REMOVE_MOD == REMOVE_RESIDUE
        ).select("vec_id"),
    )
    return state


def _query_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
    )


_ASSIGN_INC_SQL = f"""
WITH {_FROZEN_CENT},
dists AS (
  SELECT surv.vec_id, c.cell,
         round(list_dot_product(surv.v, surv.v)
               - 2 * list_dot_product(surv.v, c.cvec)
               + list_dot_product(c.cvec, c.cvec), 6) AS d2
  FROM surv CROSS JOIN cent_vec c
)
SELECT vec_id, cell, d2 AS min_d2
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY d2, cell
  ) AS rn FROM dists
) WHERE rn = 1
"""


@register("ann_ivf_assign_incremental", sql=_ASSIGN_INC_SQL)
def ann_ivf_assign_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from codex_data_products_spark.streaming.ann_ivm import (
        ann_postings_snapshot,
    )

    state = _maintained_state(spark, sf_dir)
    return ann_postings_snapshot(spark, state).select(
        "vec_id", "cell", "min_d2"
    )


_SEARCH_INC_SQL = f"""
WITH {_FROZEN_CENT},
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS nsq
  FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v) / sqrt(q.nsq * c.nsq), 6)
           AS cosine,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY round(list_dot_product(q.v, c.v)
                          / sqrt(q.nsq * c.nsq), 6) DESC, c.vec_id
         ) AS rn
  FROM q JOIN surv c ON q.query_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
FROM scored WHERE rn <= {TOP_K}
"""


@register("ann_ivf_incremental", sql=_SEARCH_INC_SQL)
def ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.streaming.ann_ivm import search_ann

    state = _maintained_state(spark, sf_dir)
    return search_ann(
        spark, state, _query_set(spark, sf_dir), top_k=TOP_K, nprobe=None
    )


_PRUNED_INC_SQL = f"""
WITH {_FROZEN_CENT},
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS nsq
  FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0
),
probes AS (
  SELECT q.query_id, cv.cell,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY round(list_dot_product(q.v, cv.cvec)
                    / sqrt(q.nsq * list_dot_product(cv.cvec, cv.cvec)), 6)
                    DESC,
                    cv.cell
         ) AS cell_rank
  FROM q CROSS JOIN cent_vec cv
),
probed AS (
  SELECT query_id, cell FROM probes WHERE cell_rank <= {N_PROBES}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT surv.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY surv.vec_id
             ORDER BY round(list_dot_product(surv.v, surv.v)
                   - 2 * list_dot_product(surv.v, c.cvec)
                   + list_dot_product(c.cvec, c.cvec), 6), c.cell
           ) AS rn
    FROM surv CROSS JOIN cent_vec c
  ) WHERE rn = 1
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v) / sqrt(q.nsq * c.nsq), 6)
           AS cosine,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY round(list_dot_product(q.v, c.v)
                          / sqrt(q.nsq * c.nsq), 6) DESC, c.vec_id
         ) AS rn
  FROM q
  JOIN probed p ON p.query_id = q.query_id
  JOIN assign a ON a.cell = p.cell
  JOIN surv c ON c.vec_id = a.vec_id AND c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
FROM scored WHERE rn <= {TOP_K}
"""


@register("ann_ivf_pruned_incremental", sql=_PRUNED_INC_SQL)
def ann_ivf_pruned_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from codex_data_products_spark.streaming.ann_ivm import search_ann

    state = _maintained_state(spark, sf_dir)
    return search_ann(
        spark,
        state,
        _query_set(spark, sf_dir),
        top_k=TOP_K,
        nprobe=N_PROBES,
    )


# ---------------------------------------------------------------------------
# ann_pq_incremental — the compressed-codes half of the maintained
# index: a PQ codebook trained on the SAME bootstrap subset is frozen
# (streaming/ann_ivm.bootstrap_pq_state), deltas are encoded against
# it, removals tombstone — so both halves of a production IVF-PQ
# index (coarse postings + compressed codes) now maintain
# incrementally. The oracle replays the full Lloyd training chain on
# the bootstrap subset, then encodes the surviving corpus — codebook
# freezing, encoding, and log maintenance are all inside the driver's
# hash.
# ---------------------------------------------------------------------------


def _pq_inc_ctes() -> str:
    """The incremental-encode CTE chain (``WITH ... enc_codes``) shared
    verbatim by the PQ / ADC / IVF-PQ incremental oracles. Returned
    separately from the final projection so the downstream oracles
    COMPOSE the chain instead of slicing rendered SQL (the
    ``_pq_cb_sql`` composition pattern) — an edit to ``_pq_inc_sql``'s
    projection can no longer silently corrupt them."""
    from codex_data_products_spark.queries.similarity import (
        N_SUB,
        SUB_DIM,
        _pq_cb_sql,
    )

    return f"""
WITH {_pq_cb_sql(f"WHERE vec_id % {TRAIN_MOD} = 0")},
enc_e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id % {REMOVE_MOD} <> {REMOVE_RESIDUE}
),
enc_sube AS (
  SELECT vec_id, g.s AS s,
         v[g.s * {SUB_DIM} + 1 : g.s * {SUB_DIM} + {SUB_DIM}] AS sv
  FROM enc_e, (SELECT unnest(generate_series(0, {N_SUB - 1})) AS s) g
),
enc_d AS (
  SELECT e.vec_id, e.s, c.code,
         round(list_dot_product(e.sv, e.sv)
               - 2 * list_dot_product(e.sv, c.cvec)
               + list_dot_product(c.cvec, c.cvec), 6) AS d
  FROM enc_sube e JOIN pq_cb c ON c.s = e.s
),
enc_codes AS (
  SELECT vec_id, s, code, d AS min_d FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, s ORDER BY d, code
    ) AS rnk FROM enc_d
  ) WHERE rnk = 1
)"""


def _pq_inc_sql() -> str:
    return f"""{_pq_inc_ctes()}
SELECT vec_id,
       array_to_string(list(code ORDER BY s), '|') AS codes,
       round(CAST(sum(CAST(min_d AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS quant_err
FROM enc_codes
GROUP BY vec_id
"""


def _register_pq_incremental() -> None:
    @register("ann_pq_incremental", sql=_pq_inc_sql())
    def ann_pq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
        from codex_data_products_spark.queries.similarity import (
            _pq_codebook,
        )
        from codex_data_products_spark.streaming.ann_ivm import (
            apply_pq_batch,
            bootstrap_pq_state,
            pq_codes_snapshot,
        )

        emb = T(spark, sf_dir, "embeddings")
        state = _ivm_state_dir("ann_pq_ivm")
        cb = _pq_codebook(
            spark, sf_dir, train_where=f"vec_id % {TRAIN_MOD} = 0"
        )
        bootstrap_pq_state(spark, state, cb)
        for k in range(TRAIN_MOD):
            apply_pq_batch(
                spark,
                state,
                k,
                adds=emb.filter(F.col("vec_id") % TRAIN_MOD == k).select(
                    "vec_id", "embedding"
                ),
            )
        apply_pq_batch(
            spark,
            state,
            TRAIN_MOD,
            removes=emb.filter(
                F.col("vec_id") % REMOVE_MOD == REMOVE_RESIDUE
            ).select("vec_id"),
        )
        codes = pq_codes_snapshot(spark, state)
        return codes.groupBy("vec_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "code"))),
                    lambda p: p.code.cast("string"),
                ),
                "|",
            ).alias("codes"),
            F.round(
                F.sum(F.col("min_d").cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("quant_err"),
        )


_register_pq_incremental()


# ---------------------------------------------------------------------------
# ann_adc_incremental — asymmetric-distance top-k over the MAINTAINED
# code table: the compressed read path of the maintained index. The
# corpus is touched only through its maintained PQ codes (N_SUB
# smallints per vector); each query's distance table folds against
# the frozen codebook. Oracle: training chain on the bootstrap
# subset, encode over survivors, ADC re-derived in SQL.
# ---------------------------------------------------------------------------


def _adc_inc_sql() -> str:
    from codex_data_products_spark.queries.similarity import (
        N_SUB,
        SUB_DIM,
    )

    # reuse the incremental encode CTE chain, then the ADC read on top
    return f"""{_pq_inc_ctes()}
, q_sube AS (
  SELECT vec_id AS query_id, g.s AS s,
         v[g.s * {SUB_DIM} + 1 : g.s * {SUB_DIM} + {SUB_DIM}] AS sv
  FROM (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    WHERE vec_id % {QUERY_STRIDE} = 0
  ), (SELECT unnest(generate_series(0, {N_SUB - 1})) AS s) g
),
qtab AS (
  SELECT q.query_id, c.s, c.code,
         round(list_dot_product(q.sv, q.sv)
               - 2 * list_dot_product(q.sv, c.cvec)
               + list_dot_product(c.cvec, c.cvec), 6) AS d
  FROM q_sube q JOIN pq_cb c ON c.s = q.s
),
adc AS (
  SELECT t.query_id, k.vec_id,
         round(CAST(sum(CAST(t.d AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS est_d2
  FROM enc_codes k
  JOIN qtab t ON t.s = k.s AND t.code = k.code
  WHERE k.vec_id <> t.query_id
  GROUP BY t.query_id, k.vec_id
)
SELECT query_id, vec_id AS neighbor_id, est_d2, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY est_d2, vec_id
  ) AS rn FROM adc
) WHERE rn <= {TOP_K}
"""


def _register_adc_incremental() -> None:
    from pyspark.sql import Window

    @register("ann_adc_incremental", sql=_adc_inc_sql())
    def ann_adc_incremental(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from codex_data_products_spark.queries.similarity import (
            _pq_codebook,
            _pq_subvectors,
            _sub_d2_pre,
        )
        from codex_data_products_spark.streaming.ann_ivm import (
            apply_pq_batch,
            bootstrap_pq_state,
            pq_codes_snapshot,
        )

        emb = T(spark, sf_dir, "embeddings")
        state = _ivm_state_dir("ann_adc_ivm")
        cb = _pq_codebook(
            spark, sf_dir, train_where=f"vec_id % {TRAIN_MOD} = 0"
        )
        bootstrap_pq_state(spark, state, cb)
        for k in range(TRAIN_MOD):
            apply_pq_batch(
                spark,
                state,
                k,
                adds=emb.filter(F.col("vec_id") % TRAIN_MOD == k).select(
                    "vec_id", "embedding"
                ),
            )
        apply_pq_batch(
            spark,
            state,
            TRAIN_MOD,
            removes=emb.filter(
                F.col("vec_id") % REMOVE_MOD == REMOVE_RESIDUE
            ).select("vec_id"),
        )
        codes = pq_codes_snapshot(spark, state).select(
            "vec_id", "s", "code"
        )
        qtab = (
            _pq_subvectors(
                emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
                    "vec_id",
                    F.transform(
                        "embedding", lambda x: x.cast("double")
                    ).alias("v"),
                )
            )
            .select(F.col("vec_id").alias("query_id"), "s", "sv")
            .join(F.broadcast(cb), "s")
            .select(
                "query_id",
                "s",
                "code",
                _sub_d2_pre(F.col("sv"), F.col("cvec")).alias("d"),
            )
        )
        adc = (
            codes.join(F.broadcast(qtab), ["s", "code"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", "vec_id")
            .agg(
                F.round(
                    F.sum(F.col("d").cast("decimal(18,6)")).cast(
                        "double"
                    ),
                    6,
                ).alias("est_d2")
            )
        )
        w = Window.partitionBy("query_id").orderBy("est_d2", "vec_id")
        return (
            adc.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= TOP_K)
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                "est_d2",
                "rn",
            )
        )


_register_adc_incremental()


# ---------------------------------------------------------------------------
# ann_ivfpq_incremental — the deployed 100 TB architecture on FULLY
# MAINTAINED state: coarse cells prune candidates from the maintained
# posting log (L2 probe ranking against the frozen quantizer,
# partition-pruned scan), candidates are scored ONLY through the
# maintained PQ code log (asymmetric distance vs the frozen
# codebook). One batch protocol feeds both halves; the query path
# touches nothing wider than (cell id, N_SUB codes) per corpus
# vector. The oracle re-derives frozen training (both quantizers),
# survivor assignment + encode, probe ranking, and ADC in one SQL
# chain.
# ---------------------------------------------------------------------------


def _ivfpq_inc_sql() -> str:
    from codex_data_products_spark.queries.similarity import (
        N_SUB,
        SUB_DIM,
    )

    return f"""{_pq_inc_ctes()}
, {_FROZEN_CENT.lstrip().lstrip(',')},
qf AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_dot_product(q.v, q.v)
                   - 2 * list_dot_product(q.v, c.cvec)
                   + list_dot_product(c.cvec, c.cvec), 6), c.cell
           ) AS rn
    FROM qf q CROSS JOIN cent_vec c
  ) WHERE rn <= {N_PROBES}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT surv.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY surv.vec_id
             ORDER BY round(list_dot_product(surv.v, surv.v)
                   - 2 * list_dot_product(surv.v, c.cvec)
                   + list_dot_product(c.cvec, c.cvec), 6), c.cell
           ) AS rn
    FROM surv CROSS JOIN cent_vec c
  ) WHERE rn = 1
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p
  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
),
q_sube AS (
  SELECT query_id, g.s AS s,
         v[g.s * {SUB_DIM} + 1 : g.s * {SUB_DIM} + {SUB_DIM}] AS sv
  FROM qf, (SELECT unnest(generate_series(0, {N_SUB - 1})) AS s) g
),
qtab AS (
  SELECT q.query_id, c.s, c.code,
         round(list_dot_product(q.sv, q.sv)
               - 2 * list_dot_product(q.sv, c.cvec)
               + list_dot_product(c.cvec, c.cvec), 6) AS d
  FROM q_sube q JOIN pq_cb c ON c.s = q.s
),
adc AS (
  SELECT c.query_id, c.vec_id,
         round(CAST(sum(CAST(t.d AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS est_d2
  FROM cand c
  JOIN enc_codes k ON k.vec_id = c.vec_id
  JOIN qtab t
    ON t.query_id = c.query_id AND t.s = k.s AND t.code = k.code
  GROUP BY c.query_id, c.vec_id
)
SELECT query_id, vec_id AS neighbor_id, est_d2, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY est_d2, vec_id
  ) AS rn FROM adc
) WHERE rn <= {TOP_K}
"""


def _register_ivfpq_incremental() -> None:
    from pyspark.sql import Window

    @register("ann_ivfpq_incremental", sql=_ivfpq_inc_sql())
    def ann_ivfpq_incremental(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from codex_data_products_spark.queries.similarity import (
            _pq_codebook,
            _pq_subvectors,
            _sub_d2_pre,
        )
        from codex_data_products_spark.streaming.ann_ivm import (
            _dot,
            ann_postings_snapshot,
            apply_pq_batch,
            bootstrap_pq_state,
            frozen_centroids,
            pq_codes_snapshot,
        )

        emb = T(spark, sf_dir, "embeddings")
        # one batch protocol drives BOTH maintained halves in one
        # state dir: postings via the shared builder, codes here
        state = _maintained_state(spark, sf_dir)
        cb = _pq_codebook(
            spark, sf_dir, train_where=f"vec_id % {TRAIN_MOD} = 0"
        )
        bootstrap_pq_state(spark, state, cb)
        for k in range(TRAIN_MOD):
            apply_pq_batch(
                spark,
                state,
                k,
                adds=emb.filter(F.col("vec_id") % TRAIN_MOD == k).select(
                    "vec_id", "embedding"
                ),
            )
        apply_pq_batch(
            spark,
            state,
            TRAIN_MOD,
            removes=emb.filter(
                F.col("vec_id") % REMOVE_MOD == REMOVE_RESIDUE
            ).select("vec_id"),
        )

        q = _query_set(spark, sf_dir)
        cent_vec = frozen_centroids(spark, state)
        qd2 = F.round(
            _dot(F.col("qv"), F.col("qv"))
            - 2 * _dot(F.col("qv"), F.col("cvec"))
            + _dot(F.col("cvec"), F.col("cvec")),
            6,
        )
        w_cells = Window.partitionBy("query_id").orderBy(
            F.col("qd2"), F.col("cell")
        )
        probes = (
            q.crossJoin(F.broadcast(cent_vec))
            .select("query_id", "qv", "cell", qd2.alias("qd2"))
            .withColumn("rn", F.row_number().over(w_cells))
            .filter(F.col("rn") <= N_PROBES)
            .select("query_id", "cell")
            .localCheckpoint()
        )
        probed_cells = sorted(
            {r["cell"] for r in probes.select("cell").distinct().collect()}
        )
        post = ann_postings_snapshot(
            spark, state, cells=probed_cells
        ).select("vec_id", "cell")
        cand = probes.join(post, "cell").filter(
            F.col("vec_id") != F.col("query_id")
        ).select("query_id", "vec_id")
        qtab = (
            _pq_subvectors(
                emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
                    "vec_id",
                    F.transform(
                        "embedding", lambda x: x.cast("double")
                    ).alias("v"),
                )
            )
            .select(F.col("vec_id").alias("query_id"), "s", "sv")
            .join(F.broadcast(cb), "s")
            .select(
                "query_id",
                "s",
                "code",
                _sub_d2_pre(F.col("sv"), F.col("cvec")).alias("d"),
            )
        )
        codes = pq_codes_snapshot(spark, state).select(
            "vec_id", "s", "code"
        )
        adc = (
            cand.join(codes, "vec_id")
            .join(F.broadcast(qtab), ["query_id", "s", "code"])
            .groupBy("query_id", "vec_id")
            .agg(
                F.round(
                    F.sum(F.col("d").cast("decimal(18,6)")).cast(
                        "double"
                    ),
                    6,
                ).alias("est_d2")
            )
        )
        w = Window.partitionBy("query_id").orderBy("est_d2", "vec_id")
        return (
            adc.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= TOP_K)
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                "est_d2",
                "rn",
            )
        )


_register_ivfpq_incremental()
