"""Keyword search + hybrid retrieval over the documents table.

The retrieval counterpart of operators/similarity.py: BM25 gives the
engine lexical search next to its vector search, and reciprocal-rank
fusion (RRF) composes the two ranked lists — the standard hybrid
retrieval stack (Lucene-style BM25 + ANN + RRF) re-expressed as
DataFrame plans.

Portability contract (same as the ANN/LM families): corpus statistics
(N, document frequencies, total length) are exact integers computed by
one corpus aggregate; per-doc scoring is a pure column expression whose
float operations appear in the SAME textual order in the DuckDB twin
(position-ordered sums, ln/divisions at matching inputs), rounded at
4 dp; RRF scores are exact fixed-point integers, so fusion is
bit-identical everywhere.

Reference anchor: the reference has no search surface at all — lookups
are key-exact (workers/ocr/db.py); this module is part of the
"training-data pipeline" extension surface SURVEY.md §6 commits to.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60  # the standard RRF damping constant
RRF_SCALE = 1_000_000  # fixed-point: floor(SCALE / (RRF_K + rank)) is exact


def _doc_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (the BM25 analyzer); empty text ->
    empty array — mirrors textstats.tokens + lower, twin-aligned."""
    low = F.lower(F.trim(text))
    return F.when(F.length(low) == 0, F.array().cast("array<string>")).otherwise(
        F.split(low, r"\s+")
    )


def bm25_topk(
    corpus: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k for a bag of query terms.

    Two passes over the corpus: ONE aggregate for the exact integer
    statistics (N, total token length, per-term document frequency — a
    single row collected to the driver, broadcast-equivalent, same
    contract as the IVF centroid sample), then one scoring projection +
    TakeOrdered(k). idf uses the Lucene BM25 form
    ln(1 + (N - df + 0.5)/(df + 0.5)), computed IN-ENGINE from the
    integer stats so Spark and the SQL twin run the same float ops at
    the same inputs. Result: (id_col, bm25_r, rank), score > 0 only.
    """
    # r6: tokenize ONCE per pass — the split is materialized as a column
    # in a lower projection and every consumer references the attribute;
    # inlining it (the old shape) re-ran the regex split per referencing
    # expression because higher-order functions fall out of codegen CSE.
    from .cache import persist_tracked
    from .fastpath import _spread

    tokd = persist_tracked(
        _spread(corpus.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col), _doc_tokens(F.col(text_col)).alias("_toks")
        )
    )
    toks = F.col("_toks")
    stat_row = tokd.agg(
        F.count("*").alias("n"),
        F.sum(F.size(toks)).alias("sumdl"),
        *[
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(query_terms)
        ],
    ).collect()[0]
    n_docs, sumdl = stat_row["n"], stat_row["sumdl"]

    dl = F.size(toks).cast("double")
    avgdl = F.lit(float(sumdl)) / F.lit(float(n_docs))
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        df_t = int(stat_row[f"df_{i}"])
        idf = F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.lit(float(df_t)) + F.lit(0.5))
            / (F.lit(float(df_t)) + F.lit(0.5))
        )
        tf = F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("double")
        score = score + idf * (
            tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl))
        )
    scored = tokd.select(
        F.col(id_col), F.round(score, 4).alias("bm25_r")
    ).filter(F.col("bm25_r") > 0)
    return (
        scored.orderBy(F.col("bm25_r").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("bm25_r").desc(), F.col(id_col).asc())
            ),
        )
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 10,
    id_col: str = "doc_id",
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists (each: (id_col, rank)):
    rrf = sum over lists of floor(RRF_SCALE / (rrf_k + rank)) — exact
    integer arithmetic, so the fused order is engine-independent by
    construction. Ids missing from a list contribute nothing (the
    standard RRF convention). Result: (id_col, rrf_q, rank)."""
    contribs = [
        d.select(
            F.col(id_col),
            F.floor(F.lit(RRF_SCALE) / (F.lit(rrf_k) + F.col("rank")))
            .cast("long")
            .alias("c"),
        )
        for d in ranked_lists
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    fused = unioned.groupBy(id_col).agg(F.sum("c").alias("rrf_q"))
    w = Window.orderBy(F.col("rrf_q").desc(), F.col(id_col).asc())
    return (
        fused.orderBy(F.col("rrf_q").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def build_inverted_index(
    corpus: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the lexical index: a ``postings`` table
    (term, doc_id, tf, dl) — one row per distinct term per doc — and a
    one-row ``stats`` table (n_docs, sumdl). The search sibling of the
    PQ/IVF indexes: tokenization and tf-counting are paid ONCE; a query
    then reads only its own terms' postings (predicate pushdown on the
    term column; at 100 TB the postings table is bucketed/sorted by term
    so a k-term query opens k row-ranges, not the corpus). New crawl
    slices snapshot-append; document frequencies are per-term COUNTs over
    postings, so appends need no stats rebuild beyond the one-row
    totals."""
    from ..sources.tables import append_snapshot, write_table

    toks = _doc_tokens(F.col(text_col))
    base = corpus.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    postings = (
        base.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )
    append_snapshot(postings, index_path, "postings")
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum(F.size("toks")).alias("sumdl")
    )
    write_table(stats, index_path, "stats")


def bm25_query_index(
    spark,
    index_path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 against the materialized postings: reads ONLY the query
    terms' posting rows (an IN-filter the parquet scan pushes down) plus
    the one-row stats table — the corpus text is never touched.
    Byte-identical to the inline bm25_topk when the index was built from
    the same corpus: identical idf/tf/length inputs, identical float
    expression order."""
    from ..sources.tables import read_table

    st = read_table(spark, index_path, "stats").collect()[0]
    n_docs, sumdl = int(st["n_docs"]), int(st["sumdl"])
    post = read_table(spark, index_path, "postings").filter(
        F.col("term").isin(query_terms)
    )
    dfs = {
        r["term"]: r["n"]
        for r in post.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    avgdl = F.lit(float(sumdl)) / F.lit(float(n_docs))
    dl = F.col("dl").cast("double")
    tf = F.col("tf").cast("double")
    # per-term partial score from the posting row, then one sum per doc;
    # the fold order (term list order) matches the inline expression
    contribs = []
    for t in query_terms:
        df_t = int(dfs.get(t, 0))
        idf = F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.lit(float(df_t)) + F.lit(0.5))
            / (F.lit(float(df_t)) + F.lit(0.5))
        )
        contribs.append(
            post.filter(F.col("term") == t).select(
                "doc_id",
                F.lit(query_terms.index(t)).alias("ord"),
                (
                    idf
                    * (
                        tf
                        * F.lit(k1 + 1.0)
                        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl))
                    )
                ).alias("part"),
            )
        )
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    scored = (
        unioned.groupBy("doc_id")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("ord"), F.col("part")))
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["part"],
                ),
                4,
            ).alias("bm25_r")
        )
        .filter(F.col("bm25_r") > 0)
    )
    return (
        scored.orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
            ),
        )
    )
