"""Key parsing / output-key construction as pure column expressions.

Clean-room Spark equivalents of the reference's regex key mini-schema
(workers/ocr/key_parser.py:14-74): parse
``raw/manhwa/{work}/{edition}/chapter-NNNN/page-NNN.ext`` into typed columns,
build the derived output key, and extract chapter/page integers. Everything
here is JVM-side (regexp_extract / rlike / format_string) so it stays inside
whole-stage codegen — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference key_parser.py:14-17
RAW_KEY_PATTERN = r"^raw/manhwa/([^/]+)/([^/]+)/(chapter-\d+)/(page-\d+)\.\w+$"


def is_valid_key(ref: Column) -> Column:
    return ref.rlike(RAW_KEY_PATTERN)


def parse_key(ref: Column) -> Column:
    """Struct(work_id, edition_id, chapter_dir, page_file, is_valid) —
    the ParsedKey dataclass (key_parser.py:19-43) as a nested column."""
    return F.struct(
        F.regexp_extract(ref, RAW_KEY_PATTERN, 1).alias("work_id"),
        F.regexp_extract(ref, RAW_KEY_PATTERN, 2).alias("edition_id"),
        F.regexp_extract(ref, RAW_KEY_PATTERN, 3).alias("chapter_dir"),
        F.regexp_extract(ref, RAW_KEY_PATTERN, 4).alias("page_file"),
        is_valid_key(ref).alias("is_valid"),
    )


def chapter_number(ref: Column) -> Column:
    """`chapter-(\\d+)` -> int, null when absent (key_parser.py:62-67)."""
    return F.nullif(F.regexp_extract(ref, r"chapter-(\d+)", 1), F.lit("")).cast("int")


def page_number(ref: Column) -> Column:
    """`page-(\\d+)` -> int, null when absent (key_parser.py:69-74)."""
    return F.nullif(F.regexp_extract(ref, r"page-(\d+)", 1), F.lit("")).cast("int")


def output_key(ref: Column, fallback_id: Column) -> Column:
    """Derived output key with the unknown/unknown fallback for refs that
    don't match the grammar (key_parser.py:45-60). The page group keeps its
    ``page-`` prefix — reference build_output_key (key_parser.py:58) emits
    ``derived/manhwa/{work}/{edition}/{chapter}/ocr/{page}.json`` with the
    full ``page-NNN`` stem."""
    parsed = parse_key(ref)
    return F.when(
        parsed["is_valid"],
        F.format_string(
            "derived/manhwa/%s/%s/%s/ocr/%s.json",
            parsed["work_id"],
            parsed["edition_id"],
            parsed["chapter_dir"],
            parsed["page_file"],
        ),
    ).otherwise(
        F.format_string("derived/manhwa/unknown/unknown/ocr/%s.json", fallback_id)
    )
