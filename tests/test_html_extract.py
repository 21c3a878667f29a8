"""Main-content extraction: boilerplate strip, DOM heuristics, golden
recovery of the wrapped body text."""

from pyspark.sql import functions as F

from chapterbridge_ocr_worker_spark.operators.html_extract import (
    extract_main_content,
    extract_main_text,
    strip_tags_col,
    wrap_in_boilerplate,
)


def test_extract_pure_function_drops_boilerplate():
    body = " ".join(f"word{i}" for i in range(120))  # 6 paragraphs of 20
    html = wrap_in_boilerplate("d1", body)
    res = extract_main_text(html)
    assert res["title"] == "Doc d1"
    # main text recovers exactly the body words, in order
    assert res["main_text"].replace("\n", " ") == body
    # nav/ads/footer/header dropped
    assert "click here" not in res["main_text"]
    assert "copyright" not in res["main_text"]
    assert "home" not in res["main_text"].split()
    # the two ad blocks survive tag-killing but fail link-density; nav/
    # header/footer text is killed at parse time (not counted as blocks)
    assert res["n_dropped"] >= 2


def test_extract_handles_link_density():
    html = (
        "<html><body><p>" + "x" * 50 + "</p>"
        '<p><a href="/">' + "y" * 50 + "</a></p></body></html>"
    )
    res = extract_main_text(html)
    assert "x" * 50 in res["main_text"]
    assert "y" * 50 not in res["main_text"]  # pure-link block = boilerplate


def test_extract_main_content_distributed(spark):
    flat = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(60))) for i in range(20)],
        ["doc_id", "text"],
    )
    docs = flat.select(
        F.col("doc_id").cast("string"),
        F.udf(wrap_in_boilerplate)(
            F.col("doc_id").cast("string"), F.col("text")
        ).alias("html"),
        "text",
    )
    out = extract_main_content(docs).join(
        docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text"),
        "doc_id",
    )
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["error"] is None
        assert r["main_text"].replace("\n", " ") == r["text"]


def test_strip_tags_col(spark):
    df = spark.createDataFrame(
        [("<p>hello <b>world</b></p>\n<div> spaced   out </div>",)], ["html"]
    )
    out = df.select(strip_tags_col(F.col("html")).alias("t")).first()["t"]
    assert out == "hello world spaced out"


def test_malformed_html_dead_letters(spark):
    docs = spark.createDataFrame(
        [("1", None), ("2", "<p>fine and long enough to keep as a block</p>")],
        ["doc_id", "html"],
    )
    rows = {r["doc_id"]: r for r in extract_main_content(docs).collect()}
    assert rows["2"]["main_text"].startswith("fine")
    # None html -> empty result, not a crash
    assert rows["1"]["main_text"] == "" and rows["1"]["error"] is None


def test_wrap_column_matches_python_wrapper(spark):
    from chapterbridge_ocr_worker_spark.operators.html_extract import (
        wrap_in_boilerplate,
        wrap_in_boilerplate_col,
    )

    rows = [
        ("1", "plain words " * 30),
        ("2", "short"),
        ("3", ""),
        ("4", "with <angle> & amp's and  double  spaces"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["html"]
        for r in df.select(
            "doc_id",
            wrap_in_boilerplate_col(F.col("doc_id"), F.col("text")).alias("html"),
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == wrap_in_boilerplate(doc_id, text), doc_id
