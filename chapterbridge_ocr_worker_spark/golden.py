"""Single-process golden generator for span-sequence equality tests.

Runs the SAME inner loop (engine/inner.py) the Spark UDF runs, but in plain
Python over the corpus dicts — the oracle the distributed output must match
exactly on (kind, text, media_ref, order) per document (BASELINE.json
input_hint; SURVEY.md §5 item 1)."""

from __future__ import annotations

from .engine.base import Engine
from .engine.inner import lines_to_text, run_adaptive


def golden_output(
    docs: list[dict], media: list[dict], engine: Engine
) -> tuple[dict[str, list[tuple]], dict[str, str]]:
    """Returns (expected_spans_by_doc, errors_by_media_ref).

    expected span tuple = (kind, text, media_ref, offset); media spans whose
    blob fails to decode keep text=None (they are dead-lettered but the
    sequence stays complete)."""
    blob = {m["media_ref"]: m["content"] for m in media}
    expected: dict[str, list[tuple]] = {}
    errors: dict[str, str] = {}
    for doc in docs:
        out = []
        for s in sorted(doc["spans"], key=lambda s: s["offset"]):
            if s["kind"] == "text":
                out.append(("text", s["text"], None, s["offset"]))
            else:
                try:
                    res = run_adaptive(blob[s["media_ref"]], engine)
                    text = lines_to_text(res["lines"])
                except Exception as exc:
                    errors[s["media_ref"]] = str(exc)
                    text = None
                out.append(("media", text, s["media_ref"], s["offset"]))
        expected[doc["doc_id"]] = out
    return expected, errors
