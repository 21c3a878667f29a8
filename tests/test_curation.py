"""Curation-suite semantics: repetition signals, decontamination, PII
redaction, temperature mixing, shard packing (operators/curation.py).

The cross-engine hash equivalence of each is pinned by the DuckDB twins in
queries.py (tools/oracle_check.py); these tests pin the SEMANTICS on
constructed inputs where the right answer is checkable by hand.
"""

from pyspark.sql import functions as F

from chapterbridge_ocr_worker_spark.operators.curation import (
    decontaminate_overlap,
    doc_hash,
    mix_sample,
    pii_scan,
    repetition_stats,
    shard_pack,
)

SF = "/root/testdata/sf0.001"


def test_repetition_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # dup 2/4, adjacent 2/3, top bigram "a a" 2/3
            (2, "x y z w"),          # no repetition
            (3, "go go go go"),      # fully degenerate
            (4, ""),                 # empty -> all zeros
            (5, "solo"),             # single token -> no bigrams
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["dup_word_fraction"] == 0.5
    assert rows[1]["adj_repeat_fraction"] == 0.6667
    assert rows[1]["top_bigram_fraction"] == 0.6667
    assert rows[2]["dup_word_fraction"] == 0.0
    assert rows[2]["adj_repeat_fraction"] == 0.0
    assert rows[2]["top_bigram_fraction"] == 0.3333  # all bigrams tie at 1/3
    assert rows[3]["dup_word_fraction"] == 0.75
    assert rows[3]["adj_repeat_fraction"] == 1.0
    assert rows[3]["top_bigram_fraction"] == 1.0
    assert rows[4]["n_tokens"] == 0 and rows[4]["top_bigram_fraction"] == 0.0
    assert rows[5]["top_bigram_fraction"] == 0.0


def test_decontaminate_overlap_planted(spark):
    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight tail")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark's leading 8-gram verbatim
            (1, "prefix one two three four five six seven eight suffix"),
            # shares words but no 8-gram run
            (2, "one two three four nope five six seven eight"),
            (3, "totally different content here with many words present"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in decontaminate_overlap(corpus, bench).collect()}
    assert out[1]["contaminated"] and out[1]["n_hit"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hit"] == 0
    assert not out[3]["contaminated"]
    assert out[1]["n_grams"] == 3  # 10 tokens -> 3 distinct 8-grams


def test_pii_scan_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 555-123-4567 or visit 10.0.0.1 today"),
            (3, "no pii here at all"),
            (4, "two mails a@b.io c@d.net and ip 192.168.0.255"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert out[1]["n_emails"] == 1 and "<EMAIL>" in out[1]["redacted"]
    assert "bob.smith" not in out[1]["redacted"]
    assert out[2]["n_phones"] == 1 and out[2]["n_ipv4"] == 1
    assert out[2]["redacted"] == "call <PHONE> or visit <IP> today"
    assert out[3]["n_emails"] == out[3]["n_phones"] == out[3]["n_ipv4"] == 0
    assert out[3]["redacted"] == "no pii here at all"
    assert out[4]["n_emails"] == 2 and out[4]["n_ipv4"] == 1
    assert out[4]["redacted"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_mix_sample_budget_and_tail_upweighting(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = mix_sample(docs).collect()
    total = docs.count()
    # half-corpus budget, hash sampling: within 15% of target
    assert abs(len(kept) - total / 2) < total * 0.15
    # alpha=0.5 temperature: the dominant language's keep RATE must be
    # strictly below a tail language's (sqrt rebalance upsamples tails)
    raw = {r["lang"]: r["cnt"] for r in
           docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    kept_by = {}
    for r in kept:
        kept_by[r["lang"]] = kept_by.get(r["lang"], 0) + 1
    head = max(raw, key=raw.get)
    tail = min(raw, key=raw.get)
    assert kept_by[head] / raw[head] < kept_by[tail] / raw[tail]
    # deterministic: a second run returns the identical keep set
    again = {r["doc_id"] for r in mix_sample(docs).collect()}
    assert {r["doc_id"] for r in kept} == again


def test_shard_pack_budget_property(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    budget = 500
    out = shard_pack(docs, budget=budget, n_buckets=4).collect()
    assert len(out) == docs.count()  # every doc lands in exactly one shard
    by_shard = {}
    max_doc = 0
    for r in out:
        by_shard.setdefault((r["bucket"], r["shard_id"]), []).append(r)
        max_doc = max(max_doc, r["n_tokens"])
    for (bucket, shard), rows in by_shard.items():
        tok = sum(r["n_tokens"] for r in rows)
        # exclusive-prefix packing: a shard exceeds the budget by at most
        # its last (straddling) document
        assert tok < budget + max_doc
    # shard ids are contiguous from 0 within every bucket
    buckets = {b for b, _ in by_shard}
    for b in buckets:
        ids = sorted(s for bb, s in by_shard if bb == b)
        assert ids == list(range(len(ids)))


def test_doc_hash_matches_duckdb(spark):
    """The sampling hash is the portable-integer contract: Spark and
    DuckDB agree bit-for-bit (same guarantee dedup.portable_token_hash
    carries for strings)."""
    import duckdb

    ids = [0, 1, 7, 97, 12345, 2147483646, 2147483647, 10**12 + 7]
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", doc_hash(F.col("doc_id")).alias("h")).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT i, ((i % 2147483647) * 2654435761 + 12345) % 2147483647 "
            f"FROM (SELECT unnest({ids}::BIGINT[]) AS i)"
        ).fetchall()
    )
    assert got == want


def test_source_quality_gate(spark):
    df = spark.createDataFrame(
        [
            (1, "clean alpha words only here", "good"),
            (2, "also very clean prose words", "good"),
            (3, "@@@@ #### 1234 %%%% junk !!", "spam"),
            (4, "&&&& ???? 9999 $$$$ more junk", "spam"),
        ],
        ["doc_id", "text", "source"],
    )
    from chapterbridge_ocr_worker_spark.operators.curation import source_quality

    out = {r["source"]: r for r in source_quality(df).collect()}
    assert out["good"]["keep"] and not out["spam"]["keep"]
    assert out["good"]["n_docs"] == 2
    # pooled ratio, not per-doc mean: totals are the sums of both docs
    assert out["good"]["total_chars"] == len("clean alpha words only here") + len(
        "also very clean prose words"
    )


def test_mix_sample_spec_matches_python_reference():
    """Pin the mix-sample SPEC itself (not just Spark==DuckDB, which the
    oracle covers): the DuckDB twin's keep set equals a pure-Python
    re-implementation of the integer allocation on random corpora —
    sqrt-milli weights, integer-div targets, threshold = target*P div n,
    keep iff portable hash < threshold."""
    import math

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    P = 2147483647
    KNUTH = 2654435761
    SEED = 12345

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 10**6), st.sampled_from("abcde")),
            min_size=1,
            max_size=300,
            unique_by=lambda t: t[0],
        )
    )
    def check(rows):
        n_by_lang: dict = {}
        for _, lang in rows:
            n_by_lang[lang] = n_by_lang.get(lang, 0) + 1
        w = {l: int(math.floor(math.sqrt(n) * 1000)) for l, n in n_by_lang.items()}
        w_sum = sum(w.values())
        budget = len(rows) * 1 // 2
        thr = {
            l: min(P - 1, (budget * w[l] // w_sum) * P // n_by_lang[l])
            for l in n_by_lang
        }
        want = {
            i for i, lang in rows if ((i % P) * KNUTH + SEED) % P < thr[lang]
        }

        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, lang VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        from chapterbridge_ocr_worker_spark.queries import QUERIES

        got = {r[0] for r in con.sql(QUERIES["curate_mix_sample"].sql).fetchall()}
        con.close()
        assert got == want

    check()


def test_segment_dedup_hand_computed(spark):
    """k=2 segments; global first occurrence wins by (doc_id, seg_idx)."""
    df = spark.createDataFrame(
        [
            (1, "a b c d a b"),       # segs: "a b", "c d", "a b"(dup of idx0)
            (2, "c d e f"),           # "c d" dup of doc1; "e f" fresh
            (3, ""),                  # no segments
            (4, None),                # no segments
            (5, "e"),                 # short tail segment "e"
        ],
        ["doc_id", "text"],
    )
    from chapterbridge_ocr_worker_spark.operators.curation import segment_dedup

    out = {r["doc_id"]: r for r in segment_dedup(df, k=2).collect()}
    assert len(out) == 5
    assert (out[1]["n_segs"], out[1]["n_removed"]) == (3, 1)
    assert out[1]["text_clean"] == "a b c d"
    assert (out[2]["n_segs"], out[2]["n_removed"]) == (2, 1)
    assert out[2]["text_clean"] == "e f"
    for d in (3, 4):
        assert (out[d]["n_segs"], out[d]["n_removed"], out[d]["text_clean"]) == (
            0,
            0,
            "",
        )
    assert (out[5]["n_segs"], out[5]["n_removed"]) == (1, 0)
    assert out[5]["text_clean"] == "e"


def test_segment_dedup_owner_is_global_min(spark):
    """The survivor of a repeated segment is the minimal (doc_id, seg_idx)
    occurrence — even when a LATER doc repeats it at an EARLIER index."""
    df = spark.createDataFrame(
        [(10, "x y z z"), (2, "z z w w")], ["doc_id", "text"]
    )
    from chapterbridge_ocr_worker_spark.operators.curation import segment_dedup

    out = {r["doc_id"]: r for r in segment_dedup(df, k=2).collect()}
    # "z z" occurs at (10, 1) and (2, 0): doc 2 owns it.
    assert out[2]["text_clean"] == "z z w w"
    assert out[10]["text_clean"] == "x y"
    assert out[10]["n_removed"] == 1


def test_incremental_segment_dedup_equals_full_on_new_slice(spark):
    """Weekly-crawl invariant (all prior ids < all new ids): incremental
    against the frozen prior segment set == full recompute over the union
    restricted to the new slice — rows, counts, and cleaned text."""
    import random

    rng = random.Random(77)
    vocab = "alpha beta gamma delta eps zeta".split()
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from chapterbridge_ocr_worker_spark.operators.curation import (
        doc_segments,
        incremental_segment_dedup,
        segment_dedup,
    )

    split = 36
    prior = df.filter(f"doc_id < {split}")
    new = df.filter(f"doc_id >= {split}")
    full = {
        r["doc_id"]: (r["n_segs"], r["n_removed"], r["text_clean"])
        for r in segment_dedup(df, k=2).collect()
        if r["doc_id"] >= split
    }
    inc = {
        r["doc_id"]: (r["n_segs"], r["n_removed"], r["text_clean"])
        for r in incremental_segment_dedup(
            new, doc_segments(prior, 2).select("seg"), k=2
        ).collect()
    }
    assert inc == full and len(inc) == 24


def test_incremental_segment_dedup_frozen_prior(spark):
    """A segment present in the prior set is removed from EVERY new
    occurrence (no new owner is elected), and prior docs are not emitted."""
    from chapterbridge_ocr_worker_spark.operators.curation import (
        incremental_segment_dedup,
    )

    new = spark.createDataFrame(
        [(100, "a b c d"), (101, "a b e f")], ["doc_id", "text"]
    )
    prior = spark.createDataFrame([("a b",), ("q r",)], ["seg"])
    out = {r["doc_id"]: r for r in incremental_segment_dedup(new, prior, k=2).collect()}
    assert set(out) == {100, 101}
    assert out[100]["text_clean"] == "c d" and out[100]["n_removed"] == 1
    assert out[101]["text_clean"] == "e f" and out[101]["n_removed"] == 1


def test_train_val_split_frozen_under_growth(spark):
    """The held-out split's load-bearing properties: (a) membership is a
    pure function of the doc's own id — appending next week's slice moves
    NO existing doc between train and val; (b) the val fraction lands
    near val_permille/1000; (c) the split stream is decorrelated from the
    mixing sampler's hash (different seeds), not a subset of its keeps."""
    from chapterbridge_ocr_worker_spark.operators.curation import (
        train_val_split,
    )

    week1 = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    both = spark.range(0, 8000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"]: r["split"] for r in train_val_split(week1).collect()}
    s2 = {r["doc_id"]: r["split"] for r in train_val_split(both).collect()}
    assert all(s2[d] == s for d, s in s1.items())  # frozen under growth
    n_val = sum(1 for v in s2.values() if v == "val")
    assert 0.004 < n_val / 8000 < 0.02  # ~1% with hash noise
    # 50% val_permille splits the corpus roughly in half (threshold sanity)
    half = train_val_split(both, val_permille=500).filter("split = 'val'").count()
    assert 0.45 < half / 8000 < 0.55


def test_chunk_windows_coverage_and_tail(spark):
    """Every token is covered, windows advance by stride with the promised
    overlap, the tail window is never empty, short docs yield exactly one
    full-doc window, and empty docs yield nothing."""
    from chapterbridge_ocr_worker_spark.operators.curation import chunk_windows

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [
            (1, " ".join(toks)),      # 10 tokens, max 4 / stride 3
            (2, "a b"),               # shorter than max -> one window
            (3, ""),                  # nothing
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_windows(df, max_tokens=4, stride=3).collect()
    }
    # doc 1: ceil((10-4)/3)+1 = 3 windows at offsets 0,3,6
    assert {i for (d, i) in rows if d == 1} == {0, 1, 2}
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t3 t4 t5 t6")
    assert rows[(1, 2)] == (4, "t6 t7 t8 t9")  # tail clamped, never empty
    assert rows[(2, 0)] == (2, "a b")
    assert not any(d == 3 for (d, i) in rows)
    # coverage: union of window tokens == all tokens
    covered = set()
    for (d, i), (_, txt) in rows.items():
        if d == 1:
            covered.update(txt.split())
    assert covered == set(toks)
    with __import__("pytest").raises(ValueError):
        chunk_windows(df, max_tokens=4, stride=5)


def test_unimax_waterfill_caps_and_redistributes(spark):
    """Designed mix: tiny (10 docs) and mid (100) languages cap at
    max_epochs=2 and the unabsorbed budget waterfalls to the big language.
    Budget 500 of 1000 docs: tiny alloc=20, mid alloc=200, big gets the
    remaining 280 of its 890 (epochs 0 + ~31% fractional). Deterministic:
    a rerun is byte-identical."""
    from chapterbridge_ocr_worker_spark.operators.curation import unimax_sample

    rows = (
        [(i, "tiny") for i in range(10)]
        + [(100 + i, "mid") for i in range(100)]
        + [(1000 + i, "big") for i in range(890)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = unimax_sample(df, 1, 2, max_epochs=2).collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["n_copies"])
    assert set(by_lang["tiny"]) == {2} and len(by_lang["tiny"]) == 10
    assert set(by_lang["mid"]) == {2} and len(by_lang["mid"]) == 100
    assert set(by_lang["big"]) <= {0, 1}
    got_big = sum(by_lang["big"])
    assert abs(got_big - 280) < 60  # hash-uniform fractional epoch
    again = sorted(tuple(r) for r in unimax_sample(df, 1, 2, max_epochs=2).collect())
    assert again == sorted(tuple(r) for r in out)


# --------------------------------------------------------------------------
# DSIR importance resampling
# --------------------------------------------------------------------------


def _py_dsir_buckets(text: str, n_buckets: int = 1024) -> list[int]:
    """Independent pure-Python reference of dsir_features: whitespace
    bigrams -> portable poly hash mod 2^31-1 -> mod n_buckets."""
    toks = text.split()
    out = []
    for i in range(len(toks) - 1):
        g = toks[i] + " " + toks[i + 1]
        acc = 0
        for ch in g:
            acc = (acc * 31 + ord(ch)) % (2**31 - 1)
        out.append(acc % n_buckets)
    return out


def test_dsir_select_prefers_target_like_docs(spark):
    from chapterbridge_ocr_worker_spark.operators.curation import (
        dsir_bucket_stats,
        dsir_select,
    )

    target = spark.createDataFrame(
        [(100, "spam ham spam ham spam ham"), (101, "spam ham eggs spam ham")],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [
            (1, "spam ham spam ham"),          # target-like -> selected
            (2, "cat dog bird fish tree"),     # raw-only features -> rejected
            (3, ""),                           # zero bigrams -> votes 0, not selected
        ],
        ["doc_id", "text"],
    )
    stats = dsir_bucket_stats(raw, target)
    rows = {r["doc_id"]: r for r in dsir_select(raw, stats).collect()}
    assert rows[1]["selected"] == 1 and rows[1]["votes"] > 0
    assert rows[2]["selected"] == 0 and rows[2]["votes"] < 0
    assert rows[3]["selected"] == 0 and rows[3]["votes"] == 0


def test_dsir_weights_match_python_reference(spark):
    """The float log-ratio weight agrees with an independent pure-Python
    computation of the same estimator (hash, smoothing, normalizers)."""
    import math
    from collections import Counter

    from chapterbridge_ocr_worker_spark.operators.curation import (
        dsir_bucket_stats,
        dsir_weights,
    )

    target_docs = {100: "alpha beta alpha beta gamma", 101: "alpha beta delta"}
    raw_docs = {
        1: "alpha beta alpha",
        2: "epsilon zeta eta theta",
        3: "solo",  # one token -> zero bigrams
    }
    c_raw = Counter(b for s in raw_docs.values() for b in _py_dsir_buckets(s))
    c_tgt = Counter(b for s in target_docs.values() for b in _py_dsir_buckets(s))
    n_raw, n_tgt = sum(c_raw.values()), sum(c_tgt.values())
    expected = {}
    for did, s in raw_docs.items():
        feats = _py_dsir_buckets(s)
        w = sum(
            math.log(c_tgt.get(b, 0) + 1.0) - math.log(c_raw.get(b, 0) + 1.0)
            for b in feats
        ) + len(feats) * (math.log(n_raw + 1024.0) - math.log(n_tgt + 1024.0))
        expected[did] = (len(feats), round(w, 4))

    mk = lambda d: spark.createDataFrame(
        [(k, v) for k, v in d.items()], ["doc_id", "text"]
    )
    stats = dsir_bucket_stats(mk(raw_docs), mk(target_docs))
    got = {
        r["doc_id"]: (r["n_features"], r["weight"])
        for r in dsir_weights(mk(raw_docs), stats).collect()
    }
    assert got == expected
