"""Corpus-curation operators for training-data pipelines.

The gates a web-scale pretraining pipeline runs AFTER extraction and
dedup, before a corpus becomes a training mix:

- repetition signals (Gopher-style): duplicate-word fraction, top-bigram
  fraction, adjacent-repeat fraction — the "degenerate document" filters.
- benchmark decontamination: token-n-gram overlap of every document
  against a (small, broadcast) benchmark set.
- PII scan/redaction: email / phone / IPv4 counts + a redacted text
  column, pure JVM regex.
- temperature-weighted language mixing: deterministic hash-based
  sampling with per-language rates ~ sqrt(n_lang) (the alpha=0.5
  rebalance every multilingual training mix applies).
- token-budget shard packing: deterministic assignment of documents to
  bounded-size training shards, parallel across hash buckets.

Design rules shared with textstats.py: pure column expressions or
relational explode/agg shapes (no Python in the hot path), and every
decision threshold computed in INTEGER arithmetic so the DuckDB SQL twin
in queries.py is bit-exact (no float rounding divergence at a sampling
boundary). Reference anchor: these extend the corpus-side curation the
reference's pipeline implies but never had an engine for (its scope ends
at per-document OCR output, workers/ocr/pipeline.py) — they are the §2-
adjacent "training-data pipeline" surface SURVEY.md §6 commits to.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import MH_PRIME
from .textstats import token_count, tokens

# Knuth multiplicative constant; (MH_PRIME-1) * KNUTH ~ 5.7e18 stays under
# int64 max, so pmod(pmod(id,P)*KNUTH + seed, P) never overflows. (At a
# true 10^12-doc scale ids exceed P and the first pmod is load-bearing.)
KNUTH = 2654435761
MIX_SEED = 12345
# a DIFFERENT seed for the held-out split: were it MIX_SEED, val docs
# (lowest hash values) would be exactly the docs every hash-threshold
# sampler keeps first — a correlated, biased eval set
SPLIT_SEED = 670617


def doc_hash(doc_id: Column, seed: int = MIX_SEED) -> Column:
    """Portable uniform hash of a numeric id into [0, MH_PRIME): identical
    integer arithmetic in Spark and DuckDB (no engine hash function), so
    sampling decisions survive engine migration — same rationale as
    dedup.portable_token_hash."""
    return F.pmod(
        F.pmod(doc_id.cast("long"), F.lit(MH_PRIME)) * F.lit(KNUTH)
        + F.lit(seed),
        F.lit(MH_PRIME),
    )


def train_val_split(
    df: DataFrame, val_permille: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic held-out split: a doc is 'val' iff its portable hash
    (SPLIT_SEED stream, decorrelated from the mixing sampler's) falls in
    the lowest val_permille/1000 of the hash range — integer threshold
    arithmetic, no float rates.

    The property that matters at 100 TB: membership is a pure function of
    the doc's OWN id, so next week's appended crawl slice never moves an
    existing doc between train and val — eval sets stay frozen under
    corpus growth without storing a membership table, and any engine
    (Spark, DuckDB, the trainer's dataloader) recomputes the identical
    split. Returns (id_col, split) with split in {'train', 'val'}."""
    thr = (MH_PRIME * val_permille) // 1000
    return df.select(
        F.col(id_col),
        F.when(doc_hash(F.col(id_col), seed=SPLIT_SEED) < F.lit(thr), "val")
        .otherwise("train")
        .alias("split"),
    )


# --------------------------------------------------------------------------
# repetition signals (Gopher-style degenerate-text filters)
# --------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals:

    - ``dup_word_fraction``: 1 - distinct/total tokens — bulk repetition.
    - ``adj_repeat_fraction``: fraction of adjacent token pairs that are
      equal — "foo foo foo" stutter.
    - ``top_bigram_fraction``: occurrences of the most frequent token
      bigram / total bigrams — boilerplate loops.

    The first two are per-row array expressions. The bigram mode is NOT
    (mode-of-array via array ops is O(n^2) per document, hostile to the
    long tail of million-token docs), so it runs relationally: explode
    bigrams -> count per (doc, gram) -> max per doc. Two hash shuffles on
    high-cardinality keys, both AQE-coalescible; the join back to the
    per-row signals is doc_id-to-doc_id.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    head = F.slice(toks, 1, F.greatest(n_tok - 1, F.lit(0)))
    tail = F.slice(toks, 2, F.greatest(n_tok - 1, F.lit(0)))
    adj_eq = F.size(
        F.filter(F.zip_with(head, tail, lambda a, b: a == b), lambda x: x)
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        F.round(
            (n_tok - F.size(F.array_distinct(toks)))
            / F.greatest(n_tok, F.lit(1)).cast("double"),
            4,
        ).alias("dup_word_fraction"),
        F.round(
            adj_eq / F.greatest(n_tok - 1, F.lit(1)).cast("double"), 4
        ).alias("adj_repeat_fraction"),
    )

    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bigrams(t)).alias("g"),
    )
    top = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams"))
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_word_fraction",
        "adj_repeat_fraction",
        F.round(
            F.coalesce(F.col("top_c"), F.lit(0))
            / F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)).cast(
                "double"
            ),
            4,
        ).alias("top_bigram_fraction"),
    )


def bigrams(text: Column) -> Column:
    """Token bigrams as space-joined strings; <2 tokens -> empty array."""
    return ngrams_tokens(text, 2)


def ngrams_tokens(text: Column, n: int) -> Column:
    """Token n-grams as space-joined strings; <n tokens -> empty array."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    joined = F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(joined)


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------


def decontaminate_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-n-gram overlap of every corpus document against a benchmark
    set: ``(doc_id, n_grams, n_hit, contaminated)`` where n_hit counts the
    document's DISTINCT n-grams that occur anywhere in the benchmark.

    The standard eval-leakage gate (13-gram in GPT-3's appendix; n is a
    parameter here because the synthetic docs are short). Scale shape: the
    benchmark side is eval-set-sized — thousands of documents, not
    billions — so its distinct-gram set BROADCASTS and the corpus side
    never shuffles for the probe; the only corpus-sized exchange is the
    per-doc count aggregation on doc_id (AQE-coalescible). Pinned in
    tests/test_plans.py.
    """
    bench_grams = (
        benchmark.select(F.explode(ngrams_tokens(F.col(text_col), n)).alias("g"))
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(F.array_distinct(ngrams_tokens(F.col(text_col), n))).alias(
            "g"
        ),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    totals = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.array_distinct(ngrams_tokens(F.col(text_col), n))).alias(
            "n_grams"
        ),
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
        (F.coalesce(F.col("n_hit"), F.lit(0)) > 0).alias("contaminated"),
    )


# --------------------------------------------------------------------------
# PII scan / redaction
# --------------------------------------------------------------------------

# Java-regex AND RE2 compatible (no lookaround, no backrefs) so the DuckDB
# twin runs the byte-identical pattern
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_columns(text: Column) -> dict[str, Column]:
    """PII signals + redacted text. Redaction order is load-bearing:
    emails first (their domains contain dots an IPv4-ish pattern could
    clip), then IPv4, then phones."""
    t = F.coalesce(text, F.lit(""))
    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    return {
        "n_emails": F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0))),
        "n_ipv4": F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0))),
        "redacted": red,
    }


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    cols = pii_columns(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(name) for name, c in cols.items()],
    )


# --------------------------------------------------------------------------
# source-level (domain) quality filtering
# --------------------------------------------------------------------------


def source_quality(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source quality inventory + keep/drop decision — the C4-style
    "filter by domain" gate, scored on the source's pooled alpha ratio
    (alphabetic chars / total chars across all its documents).

    ``(source, n_docs, alpha_chars, total_chars, keep)`` where keep means
    the source's pooled ratio is >= the corpus-wide pooled ratio. The
    comparison is CROSS-MULTIPLIED integer sums
    (alpha_s * total_corpus >= alpha_corpus * total_s) — no float
    division, so the decision is bit-exact across engines and partition
    orders. Scale shape: one map-side-combined aggregate to #sources
    rows, corpus totals broadcast back; a doc-level gate is then a
    broadcast semi-join of kept sources (#sources << corpus).
    int64 headroom: alpha_s * total_corpus needs chars_source *
    chars_corpus < 2^63 — shard the decision per crawl beyond ~3e9 chars
    per side, or widen to decimal.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    per_src = (
        df.select(
            F.col(source_col).alias("source"),
            F.length(F.regexp_replace(t, "[^A-Za-z]", "")).alias("alpha"),
            F.length(t).alias("chars"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("alpha").alias("alpha_chars"),
            F.sum("chars").alias("total_chars"),
        )
    )
    corpus = per_src.groupBy().agg(
        F.sum("alpha_chars").alias("c_alpha"), F.sum("total_chars").alias("c_total")
    )
    return per_src.crossJoin(F.broadcast(corpus)).select(
        "source",
        "n_docs",
        "alpha_chars",
        "total_chars",
        (
            F.col("alpha_chars") * F.col("c_total")
            >= F.col("c_alpha") * F.col("total_chars")
        ).alias("keep"),
    )


# --------------------------------------------------------------------------
# corpus-wide segment (span) dedup — C4's "deduplicate spans" gate
# --------------------------------------------------------------------------


def segment_dedup(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide exact span dedup, the C4-style "deduplicate repeated
    spans" gate (C4 removed duplicate three-sentence spans; the portable
    unit here is the non-overlapping k-token segment): every distinct
    segment survives only at its globally FIRST occurrence — minimal
    ``(doc_id, seg_idx)`` — and each document is reassembled from its
    surviving segments in order.

    Returns ``(doc_id, n_segs, n_removed, text_clean)`` for EVERY input
    document (empty/null text → 0 segments, empty clean text).

    Scale shape: segmentation is pure column HOFs (no Python). The global
    first-occurrence decision is a ``groupBy(seg).agg(min(struct(doc_id,
    seg_idx)))`` — deliberately an aggregate, NOT a row_number window:
    partial (map-side) aggregation collapses a segment's duplicates
    before the shuffle, so a boilerplate segment repeated a billion times
    ships one row per mapper instead of a billion rows into one window
    partition, and the owner join back is an equi-join AQE can skew-split
    (windows it cannot). Reassembly is one groupBy(doc_id) with an
    in-group array sort. Net: two shuffles (segment key, then doc key) —
    the floor for a corpus-global decision plus per-doc reassembly. At
    10^12 docs, shuffle bytes can be cut further by keying on
    (length(seg), xxhash64(seg)) and shipping segment text only in the
    owner table — not done here because the string key keeps the DuckDB
    twin bit-exact and collision-free.
    """
    segs = doc_segments(df, k, id_col=id_col, text_col=text_col)
    owners = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("own")
    )
    flagged = segs.join(owners, "seg").withColumn(
        "keep",
        (F.col("doc_id") == F.col("own.doc_id"))
        & (F.col("seg_idx") == F.col("own.seg_idx")),
    )
    return _reassemble_segments(flagged, df.select(F.col(id_col).alias("doc_id")))


def doc_segments(
    df: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, seg_idx, seg)`` — the non-overlapping k-token segments
    of every document, pure column HOFs + one posexplode."""
    toks = tokens(F.col(text_col))
    n_seg = F.ceil(F.size("tk") / F.lit(float(k))).cast("int")
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
        .select(
            "doc_id",
            F.when(F.size("tk") == 0, F.array().cast("array<string>"))
            .otherwise(
                F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda i: F.array_join(
                        F.slice("tk", i * k + 1, F.lit(k)), " "
                    ),
                )
            )
            .alias("segs"),
        )
        .select("doc_id", F.posexplode("segs").alias("seg_idx", "seg"))
    )


def _reassemble_segments(flagged: DataFrame, ids: DataFrame) -> DataFrame:
    """Fold flagged ``(doc_id, seg_idx, seg, keep)`` rows back into
    ``(doc_id, n_segs, n_removed, text_clean)`` for every id in ``ids``."""
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("seg_idx", "seg"))
                    )
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("text_clean"),
    )
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_segs", F.lit(0)).alias("n_segs"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


def materialize_segment_set(
    df: DataFrame, path: str, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Write the corpus's DISTINCT segment set as a one-column parquet
    table — the persistent state the incremental gate judges new slices
    against. Weekly maintenance is an append of the new slice's SURVIVING
    segments (exactly the ``keep`` rows ``incremental_segment_dedup``
    emits), so the set stays distinct without ever re-reading prior text."""
    (
        doc_segments(df, k, id_col=id_col, text_col=text_col)
        .select("seg")
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )


def incremental_segment_dedup(
    new_docs: DataFrame,
    prior_segments: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frozen-prior weekly-crawl variant of ``segment_dedup``: the prior
    corpus's documents are already emitted, so its segment set is FROZEN —
    a new document's segment survives iff it is absent from the prior set
    AND it is the first occurrence within the new slice (minimal
    ``(doc_id, seg_idx)`` among new docs). Output schema and semantics
    match ``segment_dedup`` restricted to the new slice; when every prior
    doc_id precedes every new doc_id (the weekly-crawl invariant, same as
    ``dedup.incremental_dedup``), the result is IDENTICAL to a full
    recompute over the union restricted to new docs — pinned by test.

    Scale shape: everything is |new|-sized except one pass over the prior
    segment-set table — and that pass is a STREAMING scan, not a shuffle:
    the prior set is semi-joined against the slice's distinct segments
    (|new|-sized, so AQE broadcasts it), producing the small "already
    seen" hit set that then broadcasts back onto the slice. The prior
    table is never shuffled or re-derived from text; at 10^12 docs its
    scan can be cut further to |new|-touched buckets by bucketing both
    sides on hash(seg), the same plan `incremental_dedup` pins for bands.
    """
    segs = doc_segments(new_docs, k, id_col=id_col, text_col=text_col)
    owners = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("own")
    )
    # hits = prior ∩ new-slice segments: |hits| <= |new segs|, so both
    # joins around the corpus-sized prior table avoid shuffling it
    hits = (
        prior_segments.select("seg")
        .join(segs.select("seg").distinct(), "seg", "left_semi")
        .distinct()
        .withColumn("_prior", F.lit(1))
    )
    flagged = (
        segs.join(owners, "seg")
        .join(hits, "seg", "left")
        .withColumn(
            "keep",
            F.col("_prior").isNull()
            & (F.col("doc_id") == F.col("own.doc_id"))
            & (F.col("seg_idx") == F.col("own.seg_idx")),
        )
    )
    return _reassemble_segments(
        flagged, new_docs.select(F.col(id_col).alias("doc_id"))
    )


# --------------------------------------------------------------------------
# temperature-weighted language mixing
# --------------------------------------------------------------------------


def mix_sample(
    df: DataFrame,
    budget_frac_num: int = 1,
    budget_frac_den: int = 2,
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic temperature-weighted (alpha=0.5) language rebalance:
    keep ~ budget docs total, allocated per language proportional to
    sqrt(n_lang) — upsamples the share of tail languages relative to their
    raw counts, the standard multilingual-mix correction.

    Every threshold is INTEGER arithmetic (milli-weights from
    floor(sqrt(n)*1000); `div` for allocation; hash-vs-threshold compare)
    so the keep set is bit-identical across engines AND across runs — a
    training mix must be reproducible, not "approximately resampled".
    sqrt is IEEE-correctly-rounded in both engines, so floor(sqrt(n)*1000)
    cannot diverge. Scale shape: the per-language stats are a
    5-row aggregate; the rate map broadcasts back; the corpus-side
    decision is one projection + filter — no corpus shuffle, no sort.
    NOTE (10^12 docs): target*MH_PRIME overflows int64 around n_docs ~
    4e9; shard the allocation per (lang, crawl) at that scale so `target`
    stays bounded.
    """
    total = df.groupBy().agg(F.count("*").alias("n_total"))
    by_lang = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count("*").alias("n_lang")
    )
    weights = by_lang.select(
        "lang",
        "n_lang",
        F.floor(F.sqrt(F.col("n_lang")) * 1000).cast("long").alias("w_milli"),
    )
    wsum = weights.groupBy().agg(F.sum("w_milli").alias("w_sum"))
    rates = (
        weights.crossJoin(F.broadcast(wsum))
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_lang",
            F.expr(
                f"(n_total * {budget_frac_num} div {budget_frac_den})"
                " * w_milli div w_sum"
            ).alias("target"),
        )
        .select(
            "lang",
            F.least(
                F.lit(MH_PRIME - 1),
                F.expr(f"target * {MH_PRIME}L div n_lang"),
            ).alias("thr"),
        )
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("lang"),
            doc_hash(F.col(id_col)).alias("h"),
        )
        .join(F.broadcast(rates), "lang")
        .filter(F.col("h") < F.col("thr"))
        .select("doc_id", "lang")
    )


# --------------------------------------------------------------------------
# token-budget shard packing
# --------------------------------------------------------------------------


def shard_pack(
    df: DataFrame,
    budget: int = 2000,
    n_buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to token-budget-bounded training shards:
    ``(doc_id, bucket, shard_id, n_tokens)``.

    A single global running sum would serialize the corpus through one
    window partition, so packing is two-level: documents hash into
    ``n_buckets`` independent buckets (deterministic doc_hash — also the
    global training-order shuffle), and a running token sum WITHIN each
    bucket packs greedily: shard = exclusive-prefix-sum div budget. Each
    bucket's window sorts only corpus/n_buckets rows and all buckets run
    in parallel; at 10^12 docs n_buckets is simply sized so a bucket fits
    a task (e.g. 2^20 buckets), the shape is unchanged. A document larger
    than the budget still lands in exactly one shard (its own start
    shard) — packing is by starts, not splits.
    """
    from pyspark.sql.window import Window

    h = doc_hash(F.col(id_col))
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
        h.alias("h"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return scored.withColumn("cum", F.sum("n_tokens").over(w)).select(
        "doc_id",
        "bucket",
        F.expr(f"(cum - n_tokens) div {budget}").alias("shard_id"),
        "n_tokens",
    )


# --------------------------------------------------------------------------
# context-window chunking (docs -> fixed-length training sequences)
# --------------------------------------------------------------------------


def chunk_windows(
    df: DataFrame,
    max_tokens: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's token sequence into training-sequence windows
    of ``max_tokens`` tokens advancing by ``stride`` (overlap =
    max_tokens - stride) — the chunking step between a packed corpus and a
    fixed-context trainer. A doc with n tokens yields
    ceil(max(n - max_tokens, 0) / stride) + 1 windows, so every token is
    covered and the tail window is never empty; empty docs yield no rows
    (no training signal).

    One explode per doc — output rows are bounded by total-tokens/stride,
    and the whole operator is column expressions (slice over the token
    array), no shuffle at all until whatever consumes the chunks. Returns
    (id_col, chunk_idx, n_chunk_tokens, chunk_text)."""
    if not (0 < stride <= max_tokens):
        raise ValueError("need 0 < stride <= max_tokens")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # integer ceil((n - max_tokens) / stride), clamped at 0
    last = F.greatest(
        F.floor((n - F.lit(max_tokens) + F.lit(stride - 1)) / F.lit(stride)),
        F.lit(0),
    ).cast("int")
    base = df.filter(n > 0).select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), last)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_idx") * F.lit(stride) + F.lit(1), F.lit(max_tokens)
    )
    return base.select(
        id_col,
        "chunk_idx",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def unimax_sample(
    df: DataFrame,
    budget_frac_num: int = 1,
    budget_frac_den: int = 2,
    max_epochs: int = 2,
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """UniMax language balancing (Chung et al. 2023): give every language
    an EQUAL share of the budget, capped at ``max_epochs`` passes over its
    data, redistributing what capped languages can't absorb — the
    principled alternative to temperature mixing (mix_sample), which
    still over-allocates to head languages at any alpha.

    Waterfilling, ascending by corpus size: for each language,
    alloc = min(n_lang * max_epochs, remaining_budget // langs_left).
    All integer arithmetic; the loop runs DRIVER-SIDE over the
    n_languages-row stats aggregate (5 rows here; languages are
    thousands at worst — broadcast-equivalent, same contract as the IVF
    centroid sample). Budget counts DOCS; a token-budget variant is the
    same arithmetic over summed token counts.

    Returns every doc with its materialized multiplicity:
    (doc_id, lang, n_copies) where n_copies = alloc_lang // n_lang full
    epochs + 1 more iff the doc's portable hash clears the fractional-
    epoch threshold — deterministic, bit-identical across engines, and
    sums to the allocation (docs a trainer repeats, not a float rate)."""
    stats = sorted(
        (
            (r["lang"], r["n"])
            for r in df.groupBy(F.col(lang_col).alias("lang"))
            .agg(F.count("*").alias("n"))
            .collect()
        ),
        key=lambda t: (t[1], t[0]),
    )
    total = sum(n for _, n in stats)
    remaining = (total * budget_frac_num) // budget_frac_den
    rows, k = [], len(stats)
    for lang, n in stats:
        alloc = min(n * max_epochs, remaining // k)
        remaining -= alloc
        k -= 1
        thr = ((alloc % n) * MH_PRIME) // n
        rows.append((lang, int(alloc // n), int(thr)))
    spark = df.sparkSession
    alloc_df = spark.createDataFrame(rows, "lang: string, epochs: int, thr: long")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("lang"),
            doc_hash(F.col(id_col)).alias("h"),
        )
        .join(F.broadcast(alloc_df), "lang")
        .select(
            "doc_id",
            "lang",
            (F.col("epochs") + (F.col("h") < F.col("thr")).cast("int")).alias(
                "n_copies"
            ),
        )
    )


# --------------------------------------------------------------------------
# DSIR importance resampling (Xie et al., NeurIPS 2023)
# --------------------------------------------------------------------------
# Select raw-corpus documents that look like a small trusted target corpus
# by importance weighting under two bag-of-hashed-ngram unigram models.
# This is the principled upgrade of the classifier gate in
# textstats.quality_classifier_score: instead of hand-set weights, the
# per-feature evidence is ESTIMATED from data (target vs raw counts), and
# the per-doc score is an exact log-likelihood ratio under the two models.
# Reference anchor: extends the corpus-side curation surface SURVEY.md §6
# commits to (the reference's scope ends at per-document OCR output,
# workers/ocr/pipeline.py).

DSIR_BUCKETS = 1024


def dsir_features(text: Column, n_buckets: int = DSIR_BUCKETS) -> Column:
    """Hashed-bigram feature indices of a document, duplicates KEPT —
    occurrence counts are the sufficient statistic of the bag-of-bigrams
    model (array_distinct here would silently change the estimator).
    portable_token_hash keeps bucket assignment engine-portable, exactly
    like the MinHash family."""
    from .dedup import portable_token_hash

    return F.transform(
        ngrams_tokens(text, 2),
        lambda g: F.pmod(portable_token_hash(g), F.lit(n_buckets)),
    )


def dsir_bucket_stats(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """``(bucket, c_raw, c_target)`` hashed-bigram occurrence counts on
    each side of the split.

    Scale shape: tag-union the two sides and aggregate ONCE — a full-outer
    join of the per-side counts would be a SortMergeJoin (Spark cannot
    broadcast full-outer), so the union+conditional-sum shape is strictly
    better: one groupBy on a key with at most n_buckets distinct values,
    whose partial (map-side) aggregation collapses every task's output to
    <= n_buckets rows before the exchange — the shuffle moves
    O(tasks * n_buckets) tiny rows no matter how many documents flow in.
    The result is <= n_buckets rows: always broadcastable, and the natural
    thing to materialize next to a corpus snapshot (same play as the
    MinHash signature tables)."""

    def side(df: DataFrame, is_raw: int) -> DataFrame:
        return df.select(
            F.explode(dsir_features(F.col(text_col), n_buckets)).alias(
                "bucket"
            ),
            F.lit(is_raw).alias("is_raw"),
        )

    return (
        side(raw, 1)
        .unionAll(side(target, 0))
        .groupBy("bucket")
        .agg(
            F.sum("is_raw").alias("c_raw"),
            F.sum(1 - F.col("is_raw")).alias("c_target"),
        )
    )


def _dsir_joined(corpus, stats, text_col, id_col, n_buckets):
    """explode_outer features -> broadcast-join the bucket stats + totals.

    explode_outer (not explode) so zero-bigram documents keep a row and
    surface with n_features = 0 instead of vanishing from the gate's
    output. The totals crossJoin is a 1-row broadcast, not a driver
    round-trip, so the whole score stays one lazy plan."""
    totals = stats.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_target").alias("n_target")
    )
    feats = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(dsir_features(F.col(text_col), n_buckets)).alias(
            "bucket"
        ),
    )
    return feats.join(F.broadcast(stats), "bucket", "left").crossJoin(
        F.broadcast(totals)
    )


def dsir_weights(
    corpus: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR importance weight ``ln p_target(doc)/p_raw(doc)``
    under add-1-smoothed hashed-bigram unigram models:

        weight = sum_i [ln(c_t[b_i]+1) - ln(c_r[b_i]+1)]
                 + n_features * [ln(N_r + B) - ln(N_t + B)]

    (the normalizer difference factors out per occurrence because both
    models share the feature space). Returns (doc_id, n_features, weight)
    with weight rounded to 4 decimals — the float weight is the REPORTING
    surface; the bit-exact selection decision lives in dsir_select, which
    never touches a float. Only corpus-sized exchange: the per-doc sum on
    doc_id (AQE-coalescible); the stats join is broadcast."""
    j = _dsir_joined(corpus, stats, text_col, id_col, n_buckets)
    lr = F.when(F.col("bucket").isNull(), F.lit(0.0)).otherwise(
        F.log(F.coalesce(F.col("c_target"), F.lit(0)) + F.lit(1.0))
        - F.log(F.coalesce(F.col("c_raw"), F.lit(0)) + F.lit(1.0))
    )
    nf = F.when(F.col("bucket").isNull(), 0).otherwise(1)
    # n_raw/n_target are 1-row-broadcast constants; grouping on them keeps
    # them visible after the agg without a second join
    per_doc = j.groupBy("doc_id", "n_raw", "n_target").agg(
        F.sum(lr).alias("s"), F.sum(nf).alias("n_features")
    )
    b = float(n_buckets)
    return per_doc.select(
        "doc_id",
        F.col("n_features").cast("long").alias("n_features"),
        F.round(
            F.col("s")
            + F.col("n_features")
            * (F.log(F.col("n_raw") + F.lit(b)) - F.log(F.col("n_target") + F.lit(b))),
            4,
        ).alias("weight"),
    )


def dsir_select(
    corpus: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Sign-quantized DSIR gate — the SELECTION decision, bit-exact across
    engines: each feature occurrence votes +1 iff its smoothed target
    probability exceeds its raw one, decided by integer cross-
    multiplication

        (c_t + 1) * (N_r + B)  >  (c_r + 1) * (N_t + B)

    (no logs, no floats — a 1-bit quantization of the dsir_weights
    log-ratio, same move as the integer thresholds in train_val_split),
    and a document is selected iff its net vote is positive. Products run
    in decimal(38,0) (HUGEINT on the DuckDB twin) so a 10^12-occurrence
    corpus cannot overflow int64 at a decision boundary. Returns
    (doc_id, votes, selected)."""
    j = _dsir_joined(corpus, stats, text_col, id_col, n_buckets)
    dec = "decimal(38,0)"
    lhs = (F.coalesce(F.col("c_target"), F.lit(0)) + 1).cast(dec) * (
        F.col("n_raw") + F.lit(n_buckets)
    ).cast(dec)
    rhs = (F.coalesce(F.col("c_raw"), F.lit(0)) + 1).cast(dec) * (
        F.col("n_target") + F.lit(n_buckets)
    ).cast(dec)
    vote = (
        F.when(F.col("bucket").isNull(), 0)
        .when(lhs > rhs, 1)
        .when(lhs < rhs, -1)
        .otherwise(0)
    )
    return (
        j.groupBy("doc_id")
        .agg(F.sum(vote).alias("votes"))
        .select(
            "doc_id",
            F.col("votes").cast("long").alias("votes"),
            (F.col("votes") > 0).cast("int").alias("selected"),
        )
    )
