"""Deduplication operators for web-scale training-data pipelines.

Five families, each scale-shaped for a 1000-executor cluster:

- exact:        md5(normalized text) group-by, keep min id. One shuffle on
                the 128-bit hash — uniform by construction, no skew.
- ngram-Jaccard: exact token-set Jaccard on candidate pairs produced by a
                cheap blocking key (no O(n^2) cross join).
- MinHash+LSH:  K permutations via (a*h + b) mod p over xxhash64 token ints,
                banded into B buckets; candidate pairs = self-join on
                (band_id, band_hash) — the classic shingle->minhash->band
                pipeline, all in column expressions.
- SimHash:      64-bit signature from per-token xxhash64 bit votes; near-dups
                = equal signature (or banded hamming buckets at scale).
- embedding:    cosine near-dup over array<float> — see similarity.py.

Everything is built-in functions (higher-order array ops, xxhash64) — no
Python UDFs, so it all stays in codegen and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import normalized, tokens

# MinHash parameters: k permutations split into bands of r rows.
MH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne)
MH_K = 32
MH_BANDS = 8
MH_ROWS = MH_K // MH_BANDS
# deterministic permutation coefficients (seeded once, hard-coded so every
# run/cluster/engine agrees)
_A = [1 + 2 * i * 7919 % MH_PRIME for i in range(MH_K)]
_B = [(i * 104729 + 12345) % MH_PRIME for i in range(MH_K)]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the minimum id per exact (normalized) content hash."""
    return (
        df.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def token_set(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def jaccard_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-set Jaccard over blocked candidate pairs.

    Blocking bounds the pair count (pairs only form inside a block), the
    standard trick to avoid the O(n^2) cross join; at 100 TB the block key
    is the LSH band bucket from minhash_signatures().
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        token_set(F.col(text_col)).alias("toks"),
    )
    a = base.alias("a")
    b = base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    jac = F.when(union > 0, inter / union.cast("double")).otherwise(F.lit(0.0))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _token_ints(text: Column) -> Column:
    """Distinct tokens -> positive 31-bit ints via xxhash64 (JVM-side)."""
    return F.transform(
        token_set(text), lambda t: F.pmod(F.xxhash64(t), F.lit(MH_PRIME))
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, signature array<int>[MH_K], band_hashes array<bigint>[MH_BANDS]).

    signature[i] = min over tokens of (a_i * h(tok) + b_i) mod p; band j
    hashes rows [j*r, (j+1)*r) into one bucket key.
    """
    ints = _token_ints(F.col(text_col))

    # NB: pyspark infers the HOF arity from the lambda's parameter count, so
    # binding loop vars via default args (lambda acc, x, i=i) breaks — use a
    # closure factory instead.
    def perm_min(i: int) -> Column:
        return F.aggregate(
            ints,
            F.lit(MH_PRIME).cast("long"),
            lambda acc, x: F.least(
                acc, (F.lit(_A[i]) * x + F.lit(_B[i])) % F.lit(MH_PRIME)
            ),
        )

    sig = F.array(*[perm_min(i) for i in range(MH_K)])
    out = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
    bands = F.array(
        *[
            F.xxhash64(
                F.lit(j), *[F.col("sig")[j * MH_ROWS + r] for r in range(MH_ROWS)]
            )
            for j in range(MH_BANDS)
        ]
    )
    return out.withColumn("bands", bands)


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_est: float = 0.5,
    max_bucket: int = 256,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 LSH band bucket, with the
    minhash-estimated Jaccard >= min_est.

    Scale shape: shuffle key = (band_id, band_hash) — uniform unless many
    docs are true near-dups (AQE skew-split then kicks in). The estimate
    filter runs BEFORE the pair-dedup aggregation so the second shuffle
    only carries surviving pairs; pair-dedup is a groupBy (not distinct)
    so Spark gets a partial (map-side) aggregate for free.
    """
    sigs = minhash_signatures(df, text_col, id_col)
    exploded = sigs.select(
        "id", "sig", F.posexplode("bands").alias("band_id", "band_hash")
    )
    # Degenerate-bucket cap: a band bucket holding b docs yields b^2/2 pairs,
    # so one hot bucket (boilerplate-heavy corpora) turns the join quadratic.
    # Standard LSH hygiene is to drop buckets above a cap — those collisions
    # carry no discriminative signal anyway. Cap is per-BUCKET, so recall for
    # normal near-dup clusters (<< cap) is unaffected.
    bucket_sizes = exploded.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_n")
    )
    keep_buckets = bucket_sizes.filter(F.col("bucket_n") <= max_bucket).select(
        "band_id", "band_hash"
    )
    exploded = exploded.join(keep_buckets, ["band_id", "band_hash"], "left_semi")
    a = exploded.alias("a")
    b = exploded.alias("b")
    matching = F.aggregate(
        F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = matching / F.lit(float(MH_K))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(est, 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est)
        .groupBy("id_a", "id_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: per-bit vote sum of token xxhash64 bits; bit set iff
    the vote is positive. Equal signatures = near-identical token bags."""
    toks = token_set(F.col(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    one = F.lit(1).cast("long")

    # F.shiftleft/shiftright take a Python int shift, so the 64 bit positions
    # unroll at plan-build time (64 codegen'd expressions, still one pass).
    def vote(bit: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(one) == 1, 1).otherwise(-1),
        )

    signature = F.lit(0).cast("long")
    for bit in range(64):
        # 1<<63 overflows signed long; its two's-complement value is the min
        bit_val = F.lit(-(1 << 63)) if bit == 63 else F.lit(1 << bit).cast("long")
        signature = signature.bitwiseOR(
            F.when(vote(bit) > 0, bit_val).otherwise(F.lit(0).cast("long"))
        )
    return df.select(F.col(id_col).alias("id"), signature.alias("simhash"))
