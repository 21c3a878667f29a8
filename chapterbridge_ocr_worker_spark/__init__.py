"""chapterbridge_ocr_worker_spark — a from-scratch PySpark-native extraction engine.

Re-expresses the data-processing capabilities of the reference OCR worker
(BimBim-lab/chapterbridge-ocr-worker, a single-process job-queue daemon) as ONE
batch DataFrame job over tables of interleaved text+media documents:

    (doc_id: string,
     spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>)

Architecture (Spark-first, not a port):

- All relational glue (idempotency/resume, lineage, span reassembly, metrics,
  key parsing, dedup windows) is declarative DataFrame code so Catalyst gets
  pushdown / pruning / broadcast for free.
- The per-image OCR inner loop (adaptive tiling, selective CLAHE second pass,
  IoU+similarity NMS dedup, reading-order sort — semantics of the reference's
  ocr_engine.py) runs inside an iterator-style ``mapInPandas`` with a
  per-worker engine singleton. No per-row Python UDFs anywhere.
- Resume = LEFT ANTI JOIN against the lineage/checkpoint table (replaces the
  reference's queued→running compare-and-set claim protocol).
- Skew = span-level units of work + explicit repartition by xxhash64 + AQE.

Subpackages:
    engine/     pure-Python OCR inner loop + pluggable engines (stub / paddle)
    operators/  pipeline stages: ocr UDF, reassembly, resume, skew, dedup,
                similarity search, text stats, multimodal plumbing
    functions/  column-expression helpers (key parsing, output docs, lineage)
    sources/    parquet-backed table IO (Iceberg in production)
    plans/      query-plan helpers (explain capture, plan assertions)
    streaming/  incremental (availableNow) variant of the batch pipeline
"""

__version__ = "0.1.0"
