"""Distributed KG-embedding training (TransE, Bordes et al. 2013) as pure
DataFrame jobs — the embedding-training stage a KG-construction pipeline
feeds (link prediction, entity similarity, downstream features).

Exactness design (same philosophy as graphquery's integer-mass PageRank
and datapipe's decimal k-means): **all arithmetic is integer**, so the
result is bit-identical at any cluster size AND expressible in DuckDB for
the hash gate.

- TransE with **L1 distance**: d(s,p,o) = Σ_k |s_k + p_k − o_k|. The L1
  subgradient per dimension is sign(·) ∈ {−1,0,+1} — integers. With
  integer-initialized embeddings and an integer-ratio learning step,
  every quantity in training is exact int64: no float summation order,
  no RNG state, no nondeterminism anywhere.
- **Full-batch subgradient descent** per epoch (not per-sample SGD —
  sequential SGD is inherently serial; batch descent is the distributed
  formulation): one epoch = join triples to the three embedding tables +
  the corrupted-negative table, compute margin-hinge activity and per-role
  sign gradients, explode to (entity, dim-gradient) contributions, sum
  per entity (map-side combinable — hub entities with 10^6 triples are a
  bigint sum, not a buffered group), and apply a mean-gradient step
  (floor-divide the summed gradient by the entity's contribution count:
  each entity moves ≤ lr per dimension per epoch — the integer analogue
  of gradient averaging, and what keeps full-batch descent stable).
- **Deterministic init**: embedding components are derived from md5 of
  the entity/pred id (ascii-arithmetic hex→int, the identical-expression
  rule — see kgexport.negative_sample), uniform over [−HALF, HALF].
- **Negatives**: kgexport.negative_sample's hash-corrupted objects —
  reproducible draws, accidental positives dropped.

Embedding dimensions are COLUMNS (e0..e{D-1}), not arrays: the oracle
needs per-dimension SQL expressions, and at the production dims where
arrays win (D ≥ 64) you would swap the projection for array + zip_with
without touching the training topology (joins/groupBy are on ids only).

Contract key `kg_transe` trains EPOCHS full-batch epochs on the
cust→in_nation slice (dim 4) and returns the trained nation + predicate
embeddings — small output, but its value hash certifies every join,
sign, hinge, sum, and floor-div of both epochs. The loss-decrease
property is pinned by pytest (test_kgembed.py), not the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mxsparkg.kgexport import BASE_E, N_NATIONS, iri, negative_sample

DIM = 4
MARGIN = 8          # hinge margin γ, integer units
INIT_HALF = 8       # init components uniform in [-8, 8]
EPOCHS = 2
LR_DEN = 1          # mean-gradient step: e -= floordiv(Σg, n) // LR_DEN


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sgn(c: Column) -> Column:
    """Integer sign — when/otherwise keeps it int (signum returns double)."""
    return F.when(c > 0, 1).when(c < 0, -1).otherwise(0)


def _floordiv(a: Column, b: Column) -> Column:
    """True floor division on integers via pmod (Spark's / is float and
    DuckDB's // truncates toward zero — both wrong for negative sums).
    (a - pmod(a, b)) / b is exact and identical in both engines."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def init_embeddings(ids: DataFrame, id_col: str = "id", dim: int = DIM,
                    half: int = INIT_HALF) -> DataFrame:
    """Deterministic integer init: component k from hex chars (2k+1, 2k+2)
    of md5(id), mapped to [-half, half] via ascii arithmetic."""
    h = F.md5(F.col(id_col).cast("binary"))
    cols = [F.col(id_col).alias("id")]
    for k in range(dim):
        v = (
            F.ascii(F.substring(h, 2 * k + 1, 1)) * 256
            + F.ascii(F.substring(h, 2 * k + 2, 1))
        ) % (2 * half + 1) - half
        cols.append(v.cast("long").alias(f"e{k}"))
    return ids.select(cols)


def transe_epoch(
    pairs: DataFrame,
    ent: DataFrame,
    pred: DataFrame,
    dim: int = DIM,
    margin: int = MARGIN,
    lr_den: int = LR_DEN,
) -> tuple[DataFrame, DataFrame]:
    """One full-batch TransE-L1 epoch. `pairs` has (subj, pred, obj,
    obj_neg); `ent`/`pred` are (id, e0..e{dim-1}) integer tables.
    Returns the updated (ent, pred) tables.

    Shape per epoch: 4 equi-joins (one per role — broadcastable when the
    entity table is; shuffle-hash otherwise), one narrow gradient
    projection, a union of per-role contribution projections, one
    map-side-combinable groupBy(id).sum, and a left join to apply
    updates. Nothing buffers a whole group; hub entities stream."""
    d = dim

    def emb(role: str, key: str) -> DataFrame:
        sel = [F.col("id").alias(f"_{role}id")] + [
            F.col(f"e{k}").alias(f"{role}{k}") for k in range(d)
        ]
        return (ent if role != "p" else pred).select(sel)

    j = (
        pairs
        .join(emb("s", "subj"), F.col("subj") == F.col("_sid"))
        .join(emb("p", "pred"), F.col("pred") == F.col("_pid"))
        .join(emb("o", "obj"), F.col("obj") == F.col("_oid"))
        .join(emb("n", "obj_neg"), F.col("obj_neg") == F.col("_nid"))
    )
    # per-dim residuals and L1 distances
    for k in range(d):
        j = j.withColumn(f"dp{k}", F.col(f"s{k}") + F.col(f"p{k}") - F.col(f"o{k}"))
        j = j.withColumn(f"dn{k}", F.col(f"s{k}") + F.col(f"p{k}") - F.col(f"n{k}"))
    dpos = sum(F.abs(F.col(f"dp{k}")) for k in range(d))
    dneg = sum(F.abs(F.col(f"dn{k}")) for k in range(d))
    j = j.filter(F.lit(margin) + dpos - dneg > 0)  # hinge-active triples only
    for k in range(d):
        j = j.withColumn(f"gp{k}", _sgn(F.col(f"dp{k}")))
        j = j.withColumn(f"gn{k}", _sgn(F.col(f"dn{k}")))
    j = j.select(
        "subj", "pred", "obj", "obj_neg",
        *[f"gp{k}" for k in range(d)], *[f"gn{k}" for k in range(d)],
    )

    def contrib(key: str, exprs: list[Column]) -> DataFrame:
        return j.select(
            F.col(key).alias("id"),
            *[e.cast("long").alias(f"g{k}") for k, e in enumerate(exprs)],
        )

    ent_contrib = (
        contrib("subj", [F.col(f"gp{k}") - F.col(f"gn{k}") for k in range(d)])
        .unionByName(contrib("obj", [-F.col(f"gp{k}") for k in range(d)]))
        .unionByName(contrib("obj_neg", [F.col(f"gn{k}") for k in range(d)]))
    )
    pred_contrib = contrib(
        "pred", [F.col(f"gp{k}") - F.col(f"gn{k}") for k in range(d)]
    )

    def apply_updates(table: DataFrame, c: DataFrame) -> DataFrame:
        g = c.groupBy("id").agg(
            F.count("*").alias("_n"),
            *[F.sum(f"g{k}").alias(f"gs{k}") for k in range(d)],
        )
        out = table.join(g, on="id", how="left")
        n = F.coalesce(F.col("_n"), F.lit(1)) * lr_den
        sel = [F.col("id")]
        for k in range(d):
            gs = F.coalesce(F.col(f"gs{k}"), F.lit(0))
            sel.append((F.col(f"e{k}") - _floordiv(gs, n)).alias(f"e{k}"))
        return out.select(sel)

    return apply_updates(ent, ent_contrib), apply_updates(pred, pred_contrib)


def hinge_loss(pairs: DataFrame, ent: DataFrame, pred: DataFrame,
               dim: int = DIM, margin: int = MARGIN) -> int:
    """Total integer hinge loss Σ max(0, γ + d_pos − d_neg) — the training
    objective; used by the loss-decrease pytest."""
    d = dim

    def emb(role, key):
        sel = [F.col("id").alias(f"_{role}id")] + [
            F.col(f"e{k}").alias(f"{role}{k}") for k in range(d)
        ]
        return (ent if role != "p" else pred).select(sel)

    j = (
        pairs
        .join(emb("s", "subj"), F.col("subj") == F.col("_sid"))
        .join(emb("p", "pred"), F.col("pred") == F.col("_pid"))
        .join(emb("o", "obj"), F.col("obj") == F.col("_oid"))
        .join(emb("n", "obj_neg"), F.col("obj_neg") == F.col("_nid"))
    )
    dpos = sum(
        F.abs(F.col(f"s{k}") + F.col(f"p{k}") - F.col(f"o{k}")) for k in range(d)
    )
    dneg = sum(
        F.abs(F.col(f"s{k}") + F.col(f"p{k}") - F.col(f"n{k}")) for k in range(d)
    )
    row = j.select(
        F.sum(F.greatest(F.lit(0), F.lit(margin) + dpos - dneg)).alias("l")
    ).collect()[0]
    return int(row["l"] or 0)


def train_transe(
    pairs: DataFrame,
    ent: DataFrame,
    pred: DataFrame,
    epochs: int = EPOCHS,
    checkpoint_every: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Fixed-epoch full-batch training loop. localCheckpoint truncates the
    lineage every 2 epochs by default: one epoch references `ent` four
    times (three roles + the update join), so un-truncated lineage grows
    ~4^epochs and Catalyst analysis explodes past ~3 epochs — unlike the
    CC loop (2 refs/round), this loop cannot defer truncation for long.
    Every-2 keeps the worst plan at 4²=16 leaf refs while sparing short
    runs the eager materialization cost (~2× on model-sized tables)."""
    for i in range(epochs):
        ent, pred = transe_epoch(pairs, ent, pred)
        if (i + 1) % checkpoint_every == 0 and i + 1 < epochs:
            ent = ent.localCheckpoint(eager=True)
            pred = pred.localCheckpoint(eager=True)
    return ent, pred


# ---------------------------------------------------------- contract key --

def _training_pairs(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer")
    nat = _t(spark, sf, "nation")
    triples = cust.select(
        iri("cust", F.col("c_custkey")).alias("subj"),
        F.lit("in_nation").alias("pred"),
        iri("nat", F.col("c_nationkey")).alias("obj"),
    )
    entities = nat.select(
        F.col("n_nationkey").alias("eid"),
        iri("nat", F.col("n_nationkey")).alias("obj_neg"),
    )
    return negative_sample(triples, entities, n_entities=N_NATIONS)


def kg_transe(spark: SparkSession, sf: str) -> DataFrame:
    """EPOCHS epochs of exact-integer TransE on the cust→in_nation slice;
    output = trained nation + predicate embeddings (25 + 1 rows whose
    values certify every join/sign/hinge/sum/floordiv of both epochs).
    Non-vacuous at the gate scale: at sf0.01 the integer hinge loss drops
    14304 → 7321 over the two certified epochs and 870 of 1525 entity
    embeddings move (measured 2026-08-18)."""
    pairs = _training_pairs(spark, sf)
    nat = _t(spark, sf, "nation")
    ent_ids = (
        _t(spark, sf, "customer")
        .select(iri("cust", F.col("c_custkey")).alias("id"))
        .unionByName(nat.select(iri("nat", F.col("n_nationkey")).alias("id")))
    )
    ent = init_embeddings(ent_ids)
    pred = init_embeddings(
        spark.createDataFrame([("in_nation",)], ["id"])
    )
    ent, pred = train_transe(pairs, ent, pred, epochs=EPOCHS)
    out = ent.filter(F.col("id").startswith(f"<{BASE_E}nat:")).unionByName(pred)
    return out.select(
        "id", *[F.col(f"e{k}").cast("long").alias(f"e{k}") for k in range(DIM)]
    )


def _sql_init(src: str, idexpr: str) -> str:
    """SELECT id, e0..e3 FROM src with the md5/ascii init, as SQL."""
    comps = []
    for k in range(DIM):
        comps.append(
            f"CAST((ascii(substr(md5({idexpr}), {2 * k + 1}, 1)) * 256"
            f" + ascii(substr(md5({idexpr}), {2 * k + 2}, 1)))"
            f" % {2 * INIT_HALF + 1} - {INIT_HALF} AS BIGINT) AS e{k}"
        )
    return f"SELECT {idexpr} AS id, {', '.join(comps)} FROM {src}"


def _sql_epoch(i: int) -> str:
    """CTE block for epoch i (uses ent{i-1}/pred{i-1}, defines ent{i}/
    pred{i}): join → residuals → hinge filter → sign gradients → per-role
    contributions → per-entity sums → floor-div mean update. Every
    expression mirrors transe_epoch term for term (identical-expression
    rule)."""
    d, p = DIM, i - 1
    resid = ", ".join(
        f"se.e{k} + pe.e{k} - oe.e{k} AS dp{k}, "
        f"se.e{k} + pe.e{k} - ne.e{k} AS dn{k}"
        for k in range(d)
    )
    dpos = " + ".join(f"abs(dp{k})" for k in range(d))
    dneg = " + ".join(f"abs(dn{k})" for k in range(d))
    sgn = "CASE WHEN {x} > 0 THEN 1 WHEN {x} < 0 THEN -1 ELSE 0 END"
    grads = ", ".join(
        sgn.format(x=f"dp{k}") + f" AS gp{k}, "
        + sgn.format(x=f"dn{k}") + f" AS gn{k}"
        for k in range(d)
    )
    s_c = ", ".join(f"CAST(gp{k} - gn{k} AS BIGINT) AS g{k}" for k in range(d))
    o_c = ", ".join(f"CAST(-gp{k} AS BIGINT) AS g{k}" for k in range(d))
    n_c = ", ".join(f"CAST(gn{k} AS BIGINT) AS g{k}" for k in range(d))
    gsum = ", ".join(f"SUM(g{k}) AS gs{k}" for k in range(d))

    def upd(prev: str, gtab: str) -> str:
        terms = []
        for k in range(d):
            gs = f"COALESCE(g.gs{k}, 0)"
            # identical-expression rule: the Spark side multiplies the
            # per-id count by LR_DEN (apply_updates, line ~156), so the
            # oracle must emit the same factor — hardcoding 1 would
            # silently diverge the two the day LR_DEN is tuned.
            n = f"(COALESCE(g._n, 1) * {LR_DEN})"
            terms.append(
                f"t.e{k} - CAST(({gs} - (({gs} % {n} + {n}) % {n})) / {n}"
                f" AS BIGINT) AS e{k}"
            )
        return (
            f"SELECT t.id, {', '.join(terms)} "
            f"FROM {prev} t LEFT JOIN {gtab} g ON g.id = t.id"
        )

    return f"""j{i} AS (
        SELECT pr.subj, pr.pred, pr.obj, pr.obj_neg, {resid}
        FROM pairs pr
        JOIN ent{p} se ON se.id = pr.subj
        JOIN pred{p} pe ON pe.id = pr.pred
        JOIN ent{p} oe ON oe.id = pr.obj
        JOIN ent{p} ne ON ne.id = pr.obj_neg),
      act{i} AS (
        SELECT subj, pred, obj, obj_neg, {grads}
        FROM j{i}
        WHERE {MARGIN} + ({dpos}) - ({dneg}) > 0),
      entc{i} AS (
        SELECT subj AS id, {s_c} FROM act{i}
        UNION ALL SELECT obj AS id, {o_c} FROM act{i}
        UNION ALL SELECT obj_neg AS id, {n_c} FROM act{i}),
      predc{i} AS (SELECT pred AS id, {s_c} FROM act{i}),
      entg{i} AS (
        SELECT id, COUNT(*) AS _n, {gsum} FROM entc{i} GROUP BY id),
      predg{i} AS (
        SELECT id, COUNT(*) AS _n, {gsum} FROM predc{i} GROUP BY id),
      ent{i} AS ({upd(f"ent{p}", f"entg{i}")}),
      pred{i} AS ({upd(f"pred{p}", f"predg{i}")})"""


def _transe_cte_chain() -> str:
    """The full training CTE chain — `WITH triples AS (...) ... pred{EPOCHS}
    AS (...)` with NO final SELECT — shared verbatim by kg_transe_sql and
    kg_transe_predict_sql. Exposed as a helper (rather than one function
    string-slicing the other's rendered SQL) so a formatting change to
    either consumer cannot silently corrupt the other."""
    d = DIM
    # deterministic pairs: kg_negsample's hash-corrupted negatives
    neg_hash = (
        "((ascii(substr(md5(subj || '|' || pred || '|neg'), 1, 1)) * 256"
        " + ascii(substr(md5(subj || '|' || pred || '|neg'), 2, 1))) * 256"
        " + ascii(substr(md5(subj || '|' || pred || '|neg'), 3, 1)))"
        f" % {N_NATIONS}"
    )
    init_comps = ", ".join(
        f"CAST((ascii(substr(md5(id), {2 * k + 1}, 1)) * 256"
        f" + ascii(substr(md5(id), {2 * k + 2}, 1)))"
        f" % {2 * INIT_HALF + 1} - {INIT_HALF} AS BIGINT) AS e{k}"
        for k in range(d)
    )
    epochs = ",\n      ".join(_sql_epoch(i) for i in range(1, EPOCHS + 1))
    return f"""
      WITH triples AS (
        SELECT '<{BASE_E}cust:' || CAST(c_custkey AS VARCHAR) || '>' AS subj,
               'in_nation' AS pred,
               '<{BASE_E}nat:' || CAST(c_nationkey AS VARCHAR) || '>' AS obj
        FROM customer),
      pairs AS (
        SELECT t.subj, t.pred, t.obj,
               '<{BASE_E}nat:' || CAST(n.n_nationkey AS VARCHAR) || '>' AS obj_neg
        FROM (SELECT subj, pred, obj, {neg_hash} AS neg_id FROM triples) t
        JOIN nation n ON n.n_nationkey = t.neg_id
        WHERE '<{BASE_E}nat:' || CAST(n.n_nationkey AS VARCHAR) || '>' <> t.obj),
      ids AS (
        SELECT '<{BASE_E}cust:' || CAST(c_custkey AS VARCHAR) || '>' AS id
        FROM customer
        UNION ALL
        SELECT '<{BASE_E}nat:' || CAST(n_nationkey AS VARCHAR) || '>'
        FROM nation),
      ent0 AS (SELECT id, {init_comps} FROM ids),
      pred0 AS (SELECT id, {init_comps} FROM (SELECT 'in_nation' AS id)),
      {epochs}"""


def kg_transe_sql() -> str:
    ecols = ", ".join(f"e{k}" for k in range(DIM))
    return f"""{_transe_cte_chain()}
      SELECT id, {ecols} FROM ent{EPOCHS}
      WHERE id LIKE '<{BASE_E}nat:%'
      UNION ALL
      SELECT id, {ecols} FROM pred{EPOCHS}
    """


def predict_objects(
    subjects: DataFrame,
    pred_id: str,
    ent: DataFrame,
    pred: DataFrame,
    candidates: DataFrame,
    top_k: int = 1,
    dim: int = DIM,
) -> DataFrame:
    """Link-prediction inference with trained TransE embeddings: for each
    subject, rank `candidates` (a column `id` of candidate object entity
    ids — the type-filtered candidate set, model-sized and broadcast) by
    integer L1 distance ||s + p − o||₁ and keep the top_k, deterministic
    tie-break on (distance, candidate id). Shape: subjects ⋈ ent (equi),
    × broadcast candidate embeddings via equi-join on a constant key is
    NOT used — instead candidates are joined by broadcast hash on a dummy
    all-pairs key only when tiny; production keeps candidate sets small
    (type-filtered) — a ranking against 10^9 candidates is ANN territory
    (datapipe's LSH/IVF layer), not exact scoring."""
    d = dim
    pvec = pred.filter(F.col("id") == pred_id).head()  # one model-sized row
    if pvec is None:
        raise ValueError(f"predicate {pred_id!r} has no trained embedding")
    cand = candidates.join(
        ent.withColumnRenamed("id", "_cid"), F.col("id") == F.col("_cid")
    ).select(
        F.col("id").alias("cand"),
        F.lit(1).alias("_one"),
        *[F.col(f"e{k}").alias(f"o{k}") for k in range(d)],
    )
    subj = subjects.join(ent, on="id").select(
        F.col("id").alias("subj"),
        F.lit(1).alias("_one"),
        *[
            (F.col(f"e{k}") + F.lit(int(pvec[f"e{k}"]))).alias(f"sp{k}")
            for k in range(d)
        ],
    )
    # all-pairs against the MODEL-SIZED candidate set as a broadcast
    # equi-join on a constant key: output is |subjects| × |candidates|
    # by design (exact scoring over a type-filtered candidate set);
    # web-scale candidate sets go through the ANN layer instead
    scored = subj.join(F.broadcast(cand), on="_one")
    dist = sum(F.abs(F.col(f"sp{k}") - F.col(f"o{k}")) for k in range(d))
    from pyspark.sql.window import Window

    w = Window.partitionBy("subj").orderBy(dist.asc(), F.col("cand").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("subj", "cand", dist.cast("long").alias("dist"),
                F.col("rk").cast("int").alias("rk"))
    )


def kg_transe_predict(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end train→infer: after the same 2 epochs as kg_transe,
    predict each customer's nation by L1 ranking over the 25-nation
    candidate set (broadcast), top-1 with deterministic tie-break.
    Output (subj, cand, dist, rk) certifies inference arithmetic on top
    of the certified training chain."""
    pairs = _training_pairs(spark, sf)
    nat = _t(spark, sf, "nation")
    cust_ids = _t(spark, sf, "customer").select(
        iri("cust", F.col("c_custkey")).alias("id")
    )
    nat_ids = nat.select(iri("nat", F.col("n_nationkey")).alias("id"))
    ent = init_embeddings(cust_ids.unionByName(nat_ids))
    pred = init_embeddings(spark.createDataFrame([("in_nation",)], ["id"]))
    ent, pred = train_transe(pairs, ent, pred, epochs=EPOCHS)
    return predict_objects(cust_ids, "in_nation", ent, pred, nat_ids, top_k=1)


def kg_transe_predict_sql() -> str:
    d = DIM
    # compose the shared training CTE chain (no string surgery on the
    # rendered sibling SQL — see _transe_cte_chain) and re-open the CTE
    # list with a comma for the inference CTEs
    chain = _transe_cte_chain().rstrip().rstrip(",") + ","
    spk = ", ".join(
        f"s.e{k} + p.e{k} AS sp{k}" for k in range(d)
    )
    dist = " + ".join(f"abs(sp{k} - o.e{k})" for k in range(d))
    return f"""{chain}
      subj AS (
        SELECT id AS sid, {', '.join(f'e{k}' for k in range(d))}
        FROM ent{EPOCHS} WHERE id LIKE '<{BASE_E}cust:%'),
      sp AS (
        SELECT s.sid, {spk}
        FROM subj s, pred{EPOCHS} p),
      scored AS (
        SELECT sp.sid AS subj, o.id AS cand,
               CAST({dist} AS BIGINT) AS dist
        FROM sp, ent{EPOCHS} o WHERE o.id LIKE '<{BASE_E}nat:%'),
      ranked AS (
        SELECT subj, cand, dist,
               CAST(row_number() OVER (
                 PARTITION BY subj ORDER BY dist ASC, cand ASC) AS INT) AS rk
        FROM scored)
      SELECT subj, cand, dist, rk FROM ranked WHERE rk <= 1
    """


def predict_objects_distmult(
    subjects: DataFrame,
    pred_id: str,
    ent: DataFrame,
    pred: DataFrame,
    candidates: DataFrame,
    top_k: int = 1,
    dim: int = DIM,
) -> DataFrame:
    """DistMult inference — the MULTIPLICATIVE embedding family next to
    TransE's additive one (Yang et al. 2015: score(s,r,o) = <s, r, o> =
    sum_k s_k*r_k*o_k, HIGHER is better): rank the type-filtered
    candidate set per subject, deterministic tie-break (score DESC,
    cand ASC). Integer embeddings keep the trilinear form exact (no
    float dot-product drift). Same plan shape as predict_objects: one
    equi-join for the subject vectors, relation vector folded in as
    literals (the 1-row ride-along would constant-fold into a BNLJ),
    broadcast all-pairs against the model-sized candidate set."""
    d = dim
    pvec = pred.filter(F.col("id") == pred_id).head()
    if pvec is None:
        raise ValueError(f"predicate {pred_id!r} has no embedding")
    cand = candidates.join(
        ent.withColumnRenamed("id", "_cid"), F.col("id") == F.col("_cid")
    ).select(
        F.col("id").alias("cand"),
        F.lit(1).alias("_one"),
        *[F.col(f"e{k}").alias(f"o{k}") for k in range(d)],
    )
    subj = subjects.join(ent, on="id").select(
        F.col("id").alias("subj"),
        F.lit(1).alias("_one"),
        *[
            (F.col(f"e{k}") * F.lit(int(pvec[f"e{k}"]))).alias(f"sr{k}")
            for k in range(d)
        ],
    )
    scored = subj.join(F.broadcast(cand), on="_one")
    score = sum(F.col(f"sr{k}") * F.col(f"o{k}") for k in range(d))
    from pyspark.sql.window import Window

    w = Window.partitionBy("subj").orderBy(score.desc(), F.col("cand").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("subj", "cand", score.cast("long").alias("score"),
                F.col("rk").cast("int").alias("rk"))
    )


def kg_distmult(spark: SparkSession, sf: str) -> DataFrame:
    """Gate key: DistMult top-1 object prediction over the deterministic
    md5 init embeddings — certifies the multiplicative scoring family
    end-to-end (init -> trilinear score -> rank -> tie-break) the way
    kg_transe_predict certifies the additive one. Training discipline is
    TransE's certificate (the integer-SGD chain); DistMult training is
    the same machinery with the multiplicative gradient, so the novel
    surface here is exactly the scoring form."""
    cust_ids = _t(spark, sf, "customer").select(
        iri("cust", F.col("c_custkey")).alias("id")
    )
    nat_ids = _t(spark, sf, "nation").select(
        iri("nat", F.col("n_nationkey")).alias("id")
    )
    ent = init_embeddings(cust_ids.unionByName(nat_ids))
    pred = init_embeddings(spark.createDataFrame([("in_nation",)], ["id"]))
    return predict_objects_distmult(
        cust_ids, "in_nation", ent, pred, nat_ids, top_k=1
    )


def kg_distmult_sql() -> str:
    d = DIM
    srk = ", ".join(f"s.e{k} * p.e{k} AS sr{k}" for k in range(d))
    score = " + ".join(f"sr{k} * o.e{k}" for k in range(d))
    return f"""
      WITH ids AS (
        SELECT '<{BASE_E}cust:' || CAST(c_custkey AS VARCHAR) || '>' AS id
        FROM customer
        UNION ALL
        SELECT '<{BASE_E}nat:' || CAST(n_nationkey AS VARCHAR) || '>'
        FROM nation),
      ent AS ({_sql_init('ids', 'id')}),
      pred AS ({_sql_init("(SELECT 'in_nation' AS id)", 'id')}),
      sr AS (
        SELECT s.id AS subj, {srk}
        FROM ent s, pred p WHERE s.id LIKE '<{BASE_E}cust:%'),
      scored AS (
        SELECT sr.subj, o.id AS cand, CAST({score} AS BIGINT) AS score
        FROM sr, ent o WHERE o.id LIKE '<{BASE_E}nat:%'),
      ranked AS (
        SELECT subj, cand, score,
               CAST(row_number() OVER (
                 PARTITION BY subj ORDER BY score DESC, cand ASC)
                 AS INT) AS rk
        FROM scored)
      SELECT subj, cand, score, rk FROM ranked WHERE rk <= 1
    """




HITS_K = 2


def kg_hits_at_k(spark: SparkSession, sf: str) -> DataFrame:
    """Gate key: the EVALUATION closing the embedding lifecycle
    (train -> predict -> evaluate): hits@K of the 2-epoch-trained TransE
    model against the gold (customer -> nation) pairs, as an
    integer-exact one-row certificate (k, n_test, n_hits, hits_ppm) —
    the hits_at_k() library metric with its arithmetic under the
    cross-engine value hash (integer scores, deterministic tie-break,
    multiply-through floor-div ppm; both operands non-negative so Spark
    div == DuckDB //). One prediction join + one equi-join against the
    gold pairs + one aggregate — no driver-side ratio."""
    pairs = _training_pairs(spark, sf)
    cust = _t(spark, sf, "customer")
    nat = _t(spark, sf, "nation")
    cust_ids = cust.select(iri("cust", F.col("c_custkey")).alias("id"))
    nat_ids = nat.select(iri("nat", F.col("n_nationkey")).alias("id"))
    ent = init_embeddings(cust_ids.unionByName(nat_ids))
    pred = init_embeddings(spark.createDataFrame([("in_nation",)], ["id"]))
    ent, pred = train_transe(pairs, ent, pred, epochs=EPOCHS)
    topk = predict_objects(
        cust_ids, "in_nation", ent, pred, nat_ids, top_k=HITS_K
    )
    truth = cust.select(
        iri("cust", F.col("c_custkey")).alias("subj"),
        iri("nat", F.col("c_nationkey")).alias("obj"),
    )
    marked = truth.join(
        topk,
        (truth["subj"] == topk["subj"]) & (truth["obj"] == topk["cand"]),
        "left",
    ).select(
        F.when(topk["cand"].isNotNull(), 1).otherwise(0).alias("hit")
    )
    return marked.agg(
        F.lit(HITS_K).cast("int").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("hit").cast("bigint").alias("n_hits"),
        F.expr("CAST(sum(hit) * 1000000 div count(*) AS BIGINT)")
        .alias("hits_ppm"),
    )


def kg_hits_at_k_sql() -> str:
    d = DIM
    chain = _transe_cte_chain().rstrip().rstrip(",") + ","
    spk = ", ".join(f"s.e{k} + p.e{k} AS sp{k}" for k in range(d))
    dist = " + ".join(f"abs(sp{k} - o.e{k})" for k in range(d))
    return f"""{chain}
      subj AS (
        SELECT id AS sid, {', '.join(f'e{k}' for k in range(d))}
        FROM ent{EPOCHS} WHERE id LIKE '<{BASE_E}cust:%'),
      sp AS (
        SELECT s.sid, {spk}
        FROM subj s, pred{EPOCHS} p),
      scored AS (
        SELECT sp.sid AS subj, o.id AS cand,
               CAST({dist} AS BIGINT) AS dist
        FROM sp, ent{EPOCHS} o WHERE o.id LIKE '<{BASE_E}nat:%'),
      ranked AS (
        SELECT subj, cand,
               row_number() OVER (
                 PARTITION BY subj ORDER BY dist ASC, cand ASC) AS rk
        FROM scored),
      truth AS (
        SELECT '<{BASE_E}cust:' || CAST(c_custkey AS VARCHAR) || '>'
                 AS subj,
               '<{BASE_E}nat:' || CAST(c_nationkey AS VARCHAR) || '>'
                 AS obj
        FROM customer),
      marked AS (
        SELECT CASE WHEN r.cand IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM truth t
        LEFT JOIN ranked r
          ON r.subj = t.subj AND r.cand = t.obj AND r.rk <= {HITS_K})
      SELECT CAST({HITS_K} AS INT) AS k,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(hit) AS BIGINT) AS n_hits,
             CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS hits_ppm
      FROM marked
    """


def hits_at_k(
    triples: DataFrame,
    ent: DataFrame,
    pred: DataFrame,
    candidates: DataFrame,
    k: int = 1,
    dim: int = DIM,
) -> float:
    """Standard KG-completion evaluation: fraction of (subj, pred, obj)
    test triples whose true obj ranks in the top-k of the candidate set
    under the trained embeddings (same scoring + tie-break as
    predict_objects). One prediction join + one equi-join against the
    test triples + two counts; exact because scores are integers.
    `triples` is persisted for the duration (it is scanned three times:
    predicate check, hit join, total)."""
    from mxsparkg.mining import guarded_collect

    triples = triples.persist()
    try:
        # the distinct-predicate set is model-sized (a KG schema has
        # thousands of predicates at most), but raw mined triples fed in
        # by mistake could make it corpus-sized — bound the collect with
        # the same fail-fast guard every model collect in mining.py uses
        preds = [
            r["pred"]
            for r in guarded_collect(
                triples.select("pred").distinct(),
                "hits_at_k predicate vocabulary",
                max_rows=10_000,
            )
        ]
        if len(preds) != 1:
            raise ValueError(
                f"hits_at_k evaluates one predicate at a time, got {preds!r}"
            )
        subjects = triples.select(F.col("subj").alias("id")).distinct()
        topk = predict_objects(
            subjects, preds[0], ent, pred, candidates, top_k=k, dim=dim
        )
        hits = triples.join(
            topk,
            (triples["subj"] == topk["subj"])
            & (triples["obj"] == topk["cand"]),
            "left_semi",
        ).count()
        total = triples.count()
        return hits / total if total else 0.0
    finally:
        triples.unpersist()


# ---------------------------------------------------------------- registry --

def kgembed_queries() -> dict:
    return {"kg_transe": kg_transe, "kg_transe_predict": kg_transe_predict,
            "kg_distmult": kg_distmult, "kg_hits_at_k": kg_hits_at_k}


def kgembed_oracle_sql() -> dict[str, str]:
    return {
        "kg_transe": kg_transe_sql(),
        "kg_transe_predict": kg_transe_predict_sql(),
        "kg_distmult": kg_distmult_sql(),
        "kg_hits_at_k": kg_hits_at_k_sql(),
    }
