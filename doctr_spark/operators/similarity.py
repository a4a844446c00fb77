"""Similarity search over the `embeddings` table (array<float> column).

* `cosine_topk` — brute-force cosine top-k per query vector: the exactness
  baseline. All math is native Spark (`zip_with` + `aggregate` fold), no
  Python; the fold is left-to-right sequential, matching DuckDB's
  `list_dot_product` evaluation so the oracle hashes agree (scores rounded
  to 6dp as belt-and-braces).
* `lsh_bucket_ann` — the scale path: sign-bit LSH bucketing (one bucket key
  from the sign pattern of the leading dimensions), search restricted to
  the query's bucket. At 100 TB this turns an all-pairs scan into an
  equi-join on bucket keys; recall is tunable via number of sign bits.

Embedding-cosine near-duplicate detection (`embedding_near_dups`) reuses
the bucketed join with a high threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F  # noqa: N812

N_QUERIES = 5
TOP_K = 10
SIGN_BITS = 8
NEAR_DUP_COS = 0.9


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def cosine_topk(spark: SparkSession, sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    """Brute-force exact top-k: broadcast the tiny query set against the
    full corpus (a classic broadcast nested-loop that AQE keeps map-side)."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("q"), F.col("embedding")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _bucket(col: Column, bits: int = SIGN_BITS) -> Column:
    b = F.lit(0)
    for d in range(bits):
        b = b + F.when(F.element_at(col, d + 1) >= 0, F.shiftleft(F.lit(1), d)).otherwise(0)
    return b.cast("int")


def lsh_bucket_ann(spark: SparkSession, sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("embedding")))
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"), F.col("bucket").alias("qb")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("bucket") == F.col("qb"))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("q"), F.col("embedding")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def embedding_near_dups(spark: SparkSession, sf_dir: str, threshold: float = NEAR_DUP_COS) -> DataFrame:
    """Near-duplicate vector pairs within LSH buckets (cos >= threshold)."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("embedding")))
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def _bucket_sql(col: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN {col}[{d + 1}] >= 0 THEN (1 << {d}) ELSE 0 END)" for d in range(SIGN_BITS)
    )
    return f"({terms})::INT"


_COS = "round(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"


ORACLES: dict[str, str] = {
    "similarity_cosine_topk": f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT query_id, vec_id, {_COS.format(a="qv", b="embedding")} AS cos
        FROM e CROSS JOIN q WHERE vec_id != query_id
    ), ranked AS (
        SELECT query_id, vec_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, cos, rank::INT AS rank FROM ranked WHERE rank <= {TOP_K}
    """,
    "similarity_lsh_ann": f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS embedding,
               {_bucket_sql("(embedding::DOUBLE[])")} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qb FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT query_id, vec_id, {_COS.format(a="qv", b="embedding")} AS cos
        FROM e JOIN q ON e.bucket = q.qb WHERE vec_id != query_id
    ), ranked AS (
        SELECT query_id, vec_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, cos, rank::INT AS rank FROM ranked WHERE rank <= {TOP_K}
    """,
    "similarity_near_dups": f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS embedding,
               {_bucket_sql("(embedding::DOUBLE[])")} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_COS.format(a="a.embedding", b="b.embedding")} AS cos
    FROM e a JOIN e b ON a.bucket = b.bucket
    WHERE a.vec_id < b.vec_id
      AND {_COS.format(a="a.embedding", b="b.embedding")} >= {NEAR_DUP_COS}
    """,
}
