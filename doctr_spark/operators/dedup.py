"""Deduplication operators over the `documents` table.

Training-data-pipeline primitives, each expressed as native Spark SQL
expressions (no Python UDFs) so Catalyst keeps everything in whole-stage
codegen, with an ANSI-SQL oracle twin (the `ORACLES` dict) that DuckDB runs
on the same parquet for the correctness gate.

Hashing strategy: both engines compute identical lowercase-hex `md5`, so
minhash signatures use the lexicographic minimum of seeded md5 hex strings
— a valid minhash family that is bit-identical across engines. SimHash
derives 16 bit-weights from the leading md5 nibbles via hex->int.

Scale notes (100 TB): every operator here is a shingle-explode followed by
a key-partitioned aggregation — linear shuffles on (doc, seed) or
(shingle) keys with map-side partial aggregation; the LSH band join
replaces the O(n^2) pair scan with an equi-join on band keys, which is the
standard web-scale near-dup design (MinHashLSH as in Spark MLlib, built
here from first principles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

N_MINHASH = 8  # seeds
LSH_BANDS = 4  # bands of 2 seeds each
SHINGLE = 3  # word-shingle width


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shingles(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (SHINGLE - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, SHINGLE)),
    )
    return docs.where(F.size(toks) >= SHINGLE).select("doc_id", F.explode(sh).alias("shingle"))


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: hash-groupBy on full text."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").cast("long").alias("group_size"),
        )
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, seed) minhash over word shingles."""
    sh = _shingles(_docs(spark, sf_dir))
    seeds = spark.range(N_MINHASH).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id", "seed")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle")))).alias("minhash"))
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on all signatures in a band.

    band id = seed div (N_MINHASH / LSH_BANDS); band key = concatenated
    signature values. Self-equi-join on (band, key) — never O(n^2).
    """
    sig = minhash_signatures(spark, sf_dir)
    per_seed = N_MINHASH // LSH_BANDS
    bands = (
        sig.withColumn("band", (F.col("seed") / per_seed).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("minhash"))).alias("band_key"))
    )
    # pair expansion by bucket grouping rather than a self-join: the
    # signature subtree is computed exactly once (a self-join recomputes it
    # per side, or forces a persist whose lifecycle the caller can't manage)
    groups = (
        bands.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pairs = groups.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (a, i) ->"
                " transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over tokens: bit b set iff the signed token-vote sum
    for bit b is non-negative."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h16 = F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long")
    bits = spark.range(16).select(F.col("id").cast("int").alias("bit"))
    votes = (
        toks.withColumn("h", h16)
        .crossJoin(F.broadcast(bits))
        .groupBy("doc_id", "bit")
        .agg(
            F.sum(
                F.when(F.expr("(shiftright(h, bit) & 1) = 1"), 1).otherwise(-1)
            ).alias("vote")
        )
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("vote") >= 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0))
            ).cast("long").alias("simhash")
        )
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard >= threshold pairs, candidate-generated through
    the shared-shingle equi-join (set semantics on distinct shingles)."""
    sh = _shingles(_docs(spark, sf_dir)).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")), "doc_a")
        .join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_SHINGLE_CTE = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), sh AS (
    SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
    FROM toks, UNNEST(range(1, len(ts) - 1)) AS t(i)
    WHERE len(ts) >= 3
)
"""

ORACLES: dict[str, str] = {
    "dedup_exact": (
        "SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,"
        " count(*)::BIGINT AS group_size FROM documents GROUP BY 1"
    ),
    "dedup_minhash": _SHINGLE_CTE
    + """
    SELECT doc_id, seed, min(md5(seed::VARCHAR || '|' || shingle)) AS minhash
    FROM sh, UNNEST([0,1,2,3,4,5,6,7]) AS s(seed)
    GROUP BY doc_id, seed
    """,
    "dedup_minhash_lsh_pairs": _SHINGLE_CTE
    + """
    , sig AS (
        SELECT doc_id, seed, min(md5(seed::VARCHAR || '|' || shingle)) AS minhash
        FROM sh, UNNEST([0,1,2,3,4,5,6,7]) AS s(seed)
        GROUP BY doc_id, seed
    ), bands AS (
        SELECT doc_id, seed // 2 AS band,
               string_agg(minhash, ',' ORDER BY minhash) AS band_key
        FROM sig GROUP BY doc_id, band
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
    WHERE a.doc_id < b.doc_id
    """,
    "dedup_simhash": """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), votes AS (
        SELECT doc_id, bit,
               sum(CASE WHEN (('0x' || substr(md5(tok), 1, 4))::BIGINT >> bit) & 1 = 1
                        THEN 1 ELSE -1 END) AS vote
        FROM toks, UNNEST(range(16)) AS b(bit)
        GROUP BY doc_id, bit
    )
    SELECT doc_id,
           sum(CASE WHEN vote >= 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
    FROM votes GROUP BY doc_id
    """,
    "dedup_ngram_jaccard": _SHINGLE_CTE
    + """
    , dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM dsh a JOIN dsh b ON a.shingle = b.shingle
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(inter / (sa.n + sb.n - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(inter / (sa.n + sb.n - inter), 6) >= 0.5
    """,
}
