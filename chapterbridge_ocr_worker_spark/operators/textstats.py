"""Text-analysis operators for training-data pipelines.

All pure column expressions (JVM-side, whole-stage codegen) — no Python in
the hot path. Each has an exact DuckDB SQL twin registered in queries.py so
the driver's oracle can hash-verify it.

Operators: token counting, quality scoring (stopword/punct/length ratios),
n-gram-heuristic language ID, document fingerprinting, distinct-shingle
counts (the substrate for n-gram Jaccard dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny fixed stopword lists — deterministic, mirrored in the SQL oracles
STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "is", "it")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "nicht", "ein", "zu")
STOPWORDS_ES = ("el", "la", "de", "que", "y", "en", "un", "es")
STOPWORDS_FR = ("le", "la", "de", "et", "un", "est", "que", "en")


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text -> empty array.

    split('', pattern) yields [''] in both Spark and DuckDB, so the
    empty-string guard keeps the two engines (and common sense) aligned.
    """
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer, RE2-safe subset: contraction suffixes, then
# space-optional letter runs, digit runs, and other-symbol runs. The real
# GPT-2 pattern uses lookahead for trailing-space handling, which RE2 (and
# hence the DuckDB twin) lacks — dropping it changes only whitespace-run
# token boundaries, not the count profile a quality gate needs.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_ish_token_count(text: Column) -> Column:
    """Subword-ish token count: how many pieces the GPT-2 pre-tokenizer
    stage would hand to BPE. A closer LLM-cost proxy than whitespace words
    (punctuation, contractions and digit runs count separately)."""
    return F.size(F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def normalized(text: Column) -> Column:
    """lowercase + whitespace-collapsed — the canonical form for
    fingerprinting and shingling."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Stable 128-bit content fingerprint of the normalized text."""
    return F.md5(normalized(text))


def distinct_char_ngrams(text: Column, n: int = 5) -> Column:
    """Count of distinct character n-grams of the normalized text —
    the shingle-cardinality primitive for near-dup scoring."""
    norm = normalized(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(0)))
    grams = F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
    return F.size(F.array_distinct(grams))


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lst, F.lower(t))))


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring signals: token count, avg token length, stopword
    ratio (EN list), punctuation ratio, alpha ratio."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    total_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_tokens": n_tok,
        "avg_token_len": F.round(total_tok_len / safe_tok.cast("double"), 4),
        "stopword_ratio": F.round(
            _hits(toks, STOPWORDS_EN) / safe_tok.cast("double"), 4
        ),
        "punct_ratio": F.round(n_punct / safe_chars.cast("double"), 4),
        "alpha_ratio": F.round(n_alpha / safe_chars.cast("double"), 4),
    }


def lang_votes(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {
        "en": _hits(toks, STOPWORDS_EN),
        "de": _hits(toks, STOPWORDS_DE),
        "es": _hits(toks, STOPWORDS_ES),
        "fr": _hits(toks, STOPWORDS_FR),
    }


def predicted_lang(text: Column) -> Column:
    """Stopword-vote language ID with CJK-character shortcut; ties break by
    fixed priority en > de > es > fr > unknown (deterministic, mirrored in
    SQL)."""
    v = lang_votes(text)
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    best = F.greatest(v["en"], v["de"], v["es"], v["fr"])
    return (
        F.when(cjk * 5 > F.length(F.trim(text)), F.lit("zh"))
        .when(best == 0, F.lit("unknown"))
        .when(v["en"] == best, F.lit("en"))
        .when(v["de"] == best, F.lit("de"))
        .when(v["es"] == best, F.lit("es"))
        .otherwise(F.lit("fr"))
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    cols = quality_columns(F.col(text_col))
    return df.select(
        id_col, *[c.alias(name) for name, c in cols.items()]
    )


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-style LM quality score (the CCNet filtering signal,
    self-trained): fit a word-bigram model on the corpus itself, then score
    every document by its average log-probability under that model.
    Low-probability docs are the gibberish/boilerplate tail a pre-training
    pipeline drops; because the model is trained on the scored corpus, every
    observed bigram has a count and no smoothing constant enters the twin.

    Returns one row per document with >=1 bigram:
    (doc_id, n_bigrams, avg_logprob 4dp, ppl 4dp where ppl=exp(-avg)).

    Determinism across engines: float summation is not associative, so the
    per-doc total is NOT a groupBy sum — the log-prob terms are collected,
    sorted by bigram position, and folded left-to-right with F.aggregate;
    the DuckDB twin folds the identically-ordered list with list_reduce.
    Same doubles, same order, bit-identical totals up to the engines'
    1-ulp ln() latitude, absorbed by the 4dp round.

    Scale shape (10^12 docs): two map-side-combined count shuffles build the
    model (bigram vocab grows sublinearly in corpus size); the scoring join
    shuffles exploded pairs on (w1,w2)/(w1) — Zipf-skewed on stopword heads,
    which is exactly the AQE skew-join case (conf.py enables it); the final
    regroup shuffles by doc_id. No Python anywhere; whole-stage codegen
    end-to-end.
    """
    from .cache import persist_tracked

    # r6: the exploded bigram frame has three consumers (both count
    # shuffles + the scoring join) — persist it so tokenize+explode run
    # once (caller-owned lifetime via cache.release_caches)
    pairs = persist_tracked(_doc_bigrams(df, text_col, id_col))
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select(
            "doc_id",
            "pos",
            F.log(F.col("c2") / F.col("c1").cast("double")).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.array_sort(
            F.collect_list(F.struct(F.col("pos").alias("pos"), F.col("lp").alias("lp")))
        ).alias("terms"),
    )
    total = F.aggregate(
        F.col("terms"), F.lit(0.0), lambda acc, s: acc + s["lp"]
    )
    avg = F.round(total / F.col("n_bigrams"), 4)
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        avg.alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("ppl"),
    )


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, pos, w1, w2) — one row per bigram occurrence, position
    kept so per-doc float folds can run in a deterministic order."""
    from .fastpath import _spread

    tk = tokens(F.col(text_col))
    n = F.size(F.col("tk"))
    base = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc_id"), tk.alias("tk")
    )
    bigrams = F.zip_with(
        F.slice(F.col("tk"), F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("tk"), F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return base.select("doc_id", F.posexplode(bigrams).alias("pos", "bg")).select(
        "doc_id", "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_model(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The trainable state of the LM gate: ``(w1, w2, c2)`` bigram counts.
    Head counts (c1) and the corpus total derive from it by re-aggregation,
    so this single table IS the model — and counts are additive, which
    makes the model trivially incremental: next week's slice trains its own
    count table and a groupBy-sum merges the snapshots (the same
    snapshot-append + keyed-compaction lifecycle as the dedup state)."""
    return (
        _doc_bigrams(df, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )


def merge_bigram_models(*models: DataFrame) -> DataFrame:
    """Fold per-slice model snapshots into one corpus model: bigram counts
    are additive, so the merge is a union + groupBy-sum — model state can
    follow the exact snapshot-append lifecycle of the dedup state tables
    (append each weekly slice's bigram_model; merge on read or collapse at
    compaction). Exactness is pinned by
    tests/test_operators.test_bigram_model_counts_are_additive."""
    out = models[0]
    for m in models[1:]:
        out = out.unionByName(m)
    return out.groupBy("w1", "w2").agg(F.sum("c2").alias("c2"))


def frozen_lm_score(
    new_docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a NEW slice against a FROZEN prior bigram model — the real
    CCNet deployment shape (the reference LM is trained once on a clean
    corpus, then every crawl slice is scored against it), and the
    frozen-prior sibling of bigram_lm_score (which self-trains).

    Out-of-vocabulary smoothing, mirrored exactly in the SQL twin:
      seen bigram            ln(c2 / c1)
      seen head, new tail    ln(1 / (c1 + 1))     (+1-smoothed continuation)
      unseen head            ln(1 / (N + 1))      (N = total model bigrams)

    Returns (doc_id, n_bigrams, n_oov, avg_logprob 4dp, ppl 4dp); docs
    with <1 bigram have no row. The float fold is position-ordered (same
    determinism discipline as bigram_lm_score).

    Scale shape: |new|-sized — the prior corpus's text is never re-read;
    the model table joins the exploded new-slice pairs (two left joins on
    (w1,w2)/(w1), broadcastable when the vocab is; AQE skew-join covers the
    Zipf heads otherwise), the N scalar is a 1-row broadcast cross join.
    """
    pairs = _doc_bigrams(new_docs, text_col, id_col)
    c1tab = model.groupBy("w1").agg(F.sum("c2").alias("c1"))
    total = model.agg(F.sum("c2").alias("n_model"))
    scored = (
        pairs.join(model, ["w1", "w2"], "left")
        .join(c1tab, ["w1"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "pos",
            F.when(
                F.col("c2").isNotNull(),
                F.log(F.col("c2") / F.col("c1").cast("double")),
            )
            .when(
                F.col("c1").isNotNull(),
                F.log(F.lit(1.0) / (F.col("c1") + 1).cast("double")),
            )
            .otherwise(F.log(F.lit(1.0) / (F.col("n_model") + 1).cast("double")))
            .alias("lp"),
            F.col("c2").isNull().cast("int").alias("oov"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("oov").alias("n_oov"),
        F.array_sort(
            F.collect_list(F.struct(F.col("pos").alias("pos"), F.col("lp").alias("lp")))
        ).alias("terms"),
    )
    total_lp = F.aggregate(F.col("terms"), F.lit(0.0), lambda acc, s: acc + s["lp"])
    avg = F.round(total_lp / F.col("n_bigrams"), 4)
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "n_oov",
        avg.alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("ppl"),
    )


def _with_pred_lang(df: DataFrame, text_col: str) -> DataFrame:
    """df + (_toks, pred_lang) via LAYERED projections (r6): the old
    inline ``predicted_lang`` expression re-evaluated tokens() and each
    language's vote for every reference (HOFs fall out of codegen CSE),
    ~10 regex splits + vote scans per row. Here the split and the four
    vote counts are materialized once as attributes — the collapse guard
    keeps non-cheap expressions from re-inlining — and the tie-break CASE
    reads cheap columns. Votes are integers, so pred_lang is equal by
    construction to predicted_lang(text)."""
    t = F.col(text_col)
    l1 = df.withColumn("_toks", tokens(t))
    l2 = l1.withColumns(
        {
            "_ven": _hits(F.col("_toks"), STOPWORDS_EN),
            "_vde": _hits(F.col("_toks"), STOPWORDS_DE),
            "_ves": _hits(F.col("_toks"), STOPWORDS_ES),
            "_vfr": _hits(F.col("_toks"), STOPWORDS_FR),
            "_cjk": F.length(F.regexp_replace(t, r"[^一-鿿]", "")),
        }
    )
    best = F.greatest(F.col("_ven"), F.col("_vde"), F.col("_ves"), F.col("_vfr"))
    return l2.withColumn(
        "pred_lang",
        F.when(F.col("_cjk") * 5 > F.length(F.trim(t)), F.lit("zh"))
        .when(best == 0, F.lit("unknown"))
        .when(F.col("_ven") == best, F.lit("en"))
        .when(F.col("_vde") == best, F.lit("de"))
        .when(F.col("_ves") == best, F.lit("es"))
        .otherwise(F.lit("fr")),
    )


def corpus_language_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language corpus inventory: docs / total tokens / total chars —
    THE question a training run asks of a corpus ("how many tokens do I
    have per language?").

    All aggregates are integer sums, so the result is bit-exact across
    engines and partition orders (no float summation-order hazard); one
    hash shuffle on the (tiny-cardinality) language key. Language skew is
    real at web scale (en dominates) but the map-side partial aggregation
    reduces each partition to <=6 rows before the shuffle, so the hot key
    never concentrates rows, only partial sums.
    """
    from .fastpath import _spread

    t = F.col(text_col)
    return (
        _with_pred_lang(_spread(df.select(t)), text_col)
        .select(
            "pred_lang",
            F.size(F.col("_toks")).alias("n_tokens"),
            F.length(t).alias("n_chars"),
        )
        .groupBy("pred_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def topk_quality_per_lang(
    df: DataFrame, k: int = 25, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Curation: the k highest-quality docs per predicted language
    (alpha-ratio primary, token count secondary, id tiebreak).

    The rank<=k filter over a row_number window compiles to Spark's
    WindowGroupLimit: each partition keeps a running top-k per language
    instead of fully sorting the corpus — the per-group-limit shape that
    survives a 10^12-doc corpus (pinned in tests/test_plans.py).
    """
    from pyspark.sql.window import Window

    from .fastpath import _spread

    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    alpha_ratio = F.round(
        n_alpha / F.greatest(n_chars, F.lit(1)).cast("double"), 4
    )
    scored = _with_pred_lang(
        _spread(df.select(F.col(id_col), t)), text_col
    ).select(
        F.col(id_col).alias("doc_id"),
        F.col("pred_lang"),
        alpha_ratio.alias("alpha_ratio"),
        F.size(F.col("_toks")).alias("n_tokens"),
    )
    w = Window.partitionBy("pred_lang").orderBy(
        F.col("alpha_ratio").desc(), F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# Hashed-linear quality classifier (the fastText serving shape)
# ---------------------------------------------------------------------------

FASTTEXT_BUCKETS = 65536  # feature-hash space (fastText default is 2M)
_CLS_SEED = 0xC1A55
_CLS_PRIME = 2_147_483_647


def _hashed_feature_weight(bucket: Column) -> Column:
    """Deterministic stand-in weight for feature bucket b, in [-1, 1) —
    the same portable multiplicative-mix construction as
    similarity._plane_weight, so any SQL engine reproduces it with plain
    integer arithmetic. In production these would be TRAINED parameters
    (see the ``weights`` DataFrame path of hashed_linear_score); the
    arithmetic default exists so the serving plan is testable and
    hash-oracle-able without shipping a model file."""
    h = F.pmod(
        (bucket.cast("long") + 1) * F.lit(2654435761) + F.lit(_CLS_SEED),
        F.lit(_CLS_PRIME),
    )
    return (
        F.pmod(h, F.lit(2_000_003)).cast("double") / F.lit(1_000_001.5)
    ) - F.lit(1.0)


def _feature_buckets(text: Column, n_buckets: int) -> Column:
    """Lowercased whitespace tokens -> portable polynomial hash -> bucket.
    Collisions are the point (feature hashing): memory is fixed at
    n_buckets weights no matter the vocabulary."""
    from .dedup import portable_token_hash

    norm = normalized(text)
    toks = F.when(
        F.length(norm) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(norm, r"\s+"))
    return F.transform(
        toks, lambda tk: F.pmod(portable_token_hash(tk), F.lit(n_buckets))
    )


def hashed_linear_score(
    df: DataFrame,
    weights: DataFrame | None = None,
    n_buckets: int = FASTTEXT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """fastText-shape document quality classifier, as a SERVING plan:
    tokens -> feature-hash buckets -> per-bucket weight -> mean weight =
    margin -> sigmoid prob -> keep decision. The CCNet/Dolma-style
    learned gate next to the heuristic quality_columns and the bigram LM.

    Result: (id_col, margin, prob, keep) with margin rounded at 4 dp
    BEFORE the prob/keep derivation, so the decision is identical in every
    engine (the DuckDB twin hash-matches all four columns).

    Two weight sources, same plan shape at 100 TB:
    - ``weights=None``: weights derived arithmetically from the bucket id
      (deterministic stand-in for trained parameters). ZERO joins — the
      whole classifier is one column expression inside whole-stage codegen.
    - ``weights=DataFrame(bucket, w)``: a trained model table. Buckets
      explode (one row per token), broadcast-join the weight table
      (n_buckets rows — a few MB, always broadcastable), partial-agg back
      to per-doc sums. One narrow shuffle of (id, bucket) rows; the corpus
      text is read once.
    """
    buckets = _feature_buckets(F.col(text_col), n_buckets)
    if weights is None:
        wsum = F.aggregate(
            F.transform(buckets, _hashed_feature_weight),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        n = F.size(buckets)
        margin = F.round(
            F.when(n > 0, wsum / n.cast("double")).otherwise(F.lit(0.0)), 4
        )
        scored = df.select(F.col(id_col), margin.alias("margin"))
    else:
        feat = df.select(F.col(id_col), F.explode_outer(buckets).alias("bucket"))
        joined = feat.join(F.broadcast(weights), "bucket", "left")
        agg = joined.groupBy(id_col).agg(
            F.sum(F.coalesce(F.col("w"), F.lit(0.0))).alias("wsum"),
            F.count("bucket").alias("n"),
        )
        margin = F.round(
            F.when(F.col("n") > 0, F.col("wsum") / F.col("n").cast("double"))
            .otherwise(F.lit(0.0)),
            4,
        )
        scored = agg.select(F.col(id_col), margin.alias("margin"))
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-4.0) * F.col("margin"))), 4)
    return scored.select(
        id_col,
        "margin",
        prob.alias("prob"),
        (F.col("margin") > F.lit(threshold)).alias("keep"),
    )


def hash_weight_table(spark, n_buckets: int = FASTTEXT_BUCKETS) -> DataFrame:
    """The arithmetic default weights materialized as a (bucket, w) model
    table — what a real trained model would be swapped in for. Exists so
    the weights-table serving path can be pinned EQUAL to the zero-join
    default path."""
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        _hashed_feature_weight(F.col("id")).alias("w"),
    )
