"""F13: the full nested OCR output document, as column expressions.

Clean-room Spark twin of the reference's ``build_ocr_output``
(workers/ocr/ocr_engine.py:872-926) + the JSON upload / asset insert around
it (workers/ocr/main.py:177-205): one output document per OCR'd media span
(the reference processes one page image per job), shaped

    {version: "ocr_v1", engine, source{raw_asset_id, raw_r2_key},
     metadata{work_id, edition_id, segment_id, chapter, page, source_key},
     stats{line_count}, lines}

Graft mapping of reference identifiers (documented, not invented):
- raw_r2_key / source_key  = the span's media_ref (the R2 key analogue);
- raw_asset_id             = sha256(media_ref) — a deterministic surrogate
  for the reference's DB-assigned asset uuid (no DB here); it also feeds
  the unknown/unknown fallback output key exactly like the reference's
  raw_asset_id does (key_parser.py:53-60);
- segment_id               = doc_id (the interleaved document is the
  segment analogue — the unit whose pages the job links together);
- work_id/edition_id/chapter/page parse from the key grammar
  (key_parser.py:14-43), null when the key doesn't match — the reference
  passes None through in the same way.

Everything is JVM-side struct construction; ``to_json`` produces the exact
upload payload, and byte_size/sha256 of that payload mirror the reference's
insert_asset record (supabase_client.py:180-203).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.keys import chapter_number, output_key, page_number, parse_key


def build_output_documents(
    ocr_results: DataFrame, engine_name: str | None = None
) -> DataFrame:
    """OCR result rows -> (doc_id, offset, media_ref, output_ref, doc).

    ocr_results: successful OCR_RESULT rows (doc_id, offset, media_ref,
    lines, line_count, ...). ``doc`` is the reference-shaped nested struct.
    """
    engine_name = engine_name or os.environ.get("OCR_ENGINE", "stub")
    ref = F.col("media_ref")
    parsed = parse_key(ref)
    asset_id = F.sha2(ref, 256)
    doc = F.struct(
        F.lit("ocr_v1").alias("version"),
        F.lit(engine_name).alias("engine"),
        F.struct(
            asset_id.alias("raw_asset_id"), ref.alias("raw_r2_key")
        ).alias("source"),
        F.struct(
            F.nullif(parsed["work_id"], F.lit("")).alias("work_id"),
            F.nullif(parsed["edition_id"], F.lit("")).alias("edition_id"),
            F.col("doc_id").alias("segment_id"),
            chapter_number(ref).alias("chapter"),
            page_number(ref).alias("page"),
            ref.alias("source_key"),
        ).alias("metadata"),
        F.struct(
            F.coalesce(F.col("line_count"), F.lit(0)).alias("line_count")
        ).alias("stats"),
        F.col("lines").alias("lines"),
    )
    return ocr_results.select(
        "doc_id",
        "offset",
        "media_ref",
        output_key(ref, asset_id).alias("output_ref"),
        doc.alias("doc"),
    )


def serialize_output_documents(docs: DataFrame) -> DataFrame:
    """The upload payload: JSON bytes per output document plus the asset
    record columns the reference inserts (byte_size, sha256 — the
    insert_asset twin). This is the blob-put sink's input (S8)."""
    js = F.to_json(F.col("doc"))
    return docs.select(
        "doc_id",
        "offset",
        "output_ref",
        js.alias("json"),
        F.length(js).cast("long").alias("byte_size"),
        F.sha2(js, 256).alias("sha256"),
    )
