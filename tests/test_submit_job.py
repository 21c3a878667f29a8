"""The spark-submit entrypoint runs end-to-end from a clean subprocess
(no PYTHONPATH), resumes on rerun, and prints one JSON stats line."""

import json
import os
import subprocess
import sys


def test_extract_job_cli(spark, tmp_path):
    from chapterbridge_ocr_worker_spark import datagen, schemas

    docs, media = datagen.generate_corpus(n_docs=15, seed=31, corrupt_fraction=0.07)
    docs_dir = str(tmp_path / "docs")
    media_dir = str(tmp_path / "media")
    spark.createDataFrame(docs, schema=schemas.DOCUMENTS).write.parquet(docs_dir)
    spark.createDataFrame(media, schema=schemas.MEDIA).write.parquet(media_dir)
    wh = str(tmp_path / "wh")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    def run():
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "extract_job.py"),
             "--documents", docs_dir, "--media", media_dir,
             "--warehouse", wh, "--cores", "4"],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    s1 = run()
    assert s1["mode"] == "batch"
    assert s1["docs"] + s1["failed_docs"] == 15
    s2 = run()  # resume: only the failed docs retry, none newly commit
    assert s2["docs"] == 0
    assert s2["failed_docs"] == s1["failed_docs"]


def test_curate_job_cli(spark, tmp_path):
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [
        (1, " ".join(words)),
        (2, " ".join(words[:-1])),       # near-dup of 1 -> same cluster
        (3, "the cat is in the hat and it is a cat"),
        (4, "der hund ist nicht ein hund und das ist"),
    ]
    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(docs_dir)
    out_dir = str(tmp_path / "curated")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "curate_job.py"),
         "--documents", docs_dir, "--out", out_dir, "--cores", "4"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert stats["docs_in"] == 4
    assert stats["docs_kept"] == 3 and stats["dropped_as_dups"] == 1
    assert stats["languages"]["en"]["docs"] == 1  # doc 3 (1/2's rep is 'unknown')
    assert stats["languages"]["de"]["docs"] == 1
    kept = {r["doc_id"] for r in spark.read.parquet(f"{out_dir}/kept_docs").collect()}
    assert kept == {1, 3, 4}  # doc 2 collapsed into cluster rep 1
    topk = spark.read.parquet(f"{out_dir}/curated_topk")
    assert topk.filter("rank = 1").count() == topk.select("pred_lang").distinct().count()
    # the job must set a RELIABLE checkpoint dir on its durable storage so
    # connected_components survives executor loss on a real cluster
    assert os.path.isdir(os.path.join(out_dir, "_checkpoints"))
