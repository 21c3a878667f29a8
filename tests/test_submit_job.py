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
