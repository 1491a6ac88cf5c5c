"""URL/HTML ingestion path (reference UrlSourceInput,
llm_processor.py:216-897): html → hybrid extraction → CTI-focus trim
→ LLM summary → shape check → one repair call if malformed.

At table scale the fetch itself is out of scope (html bytes are
already a column — SURVEY.md §2.1 S2); this operator covers
everything after the bytes. Summarization batches per Arrow batch;
the repair call re-runs only the non-compliant subset (the reference
pays the same second call per bad summary).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ctinexus_spark.text.normalize import (
    build_cti_focus_text,
    extract_html_content,
    is_well_formed_cti_paragraph,
    normalize_summary_text,
    normalize_text,
)

INGEST_SCHEMA = (
    "url string, extracted_text string, focused_text string, "
    "summary string, summary_repaired boolean, title string"
)


def ingest_html(df: DataFrame, model, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html binary) → extracted/focused text + CTINexus-ready
    summary paragraph."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                raw = (
                    html.decode("utf-8", errors="replace")
                    if isinstance(html, (bytes, bytearray))
                    else (html or "")
                )
                content = extract_html_content(raw)
                extracted = normalize_text(content["text"])
                focused = build_cti_focus_text(extracted)
                summary = normalize_summary_text(model.summarize(focused))
                repaired = False
                if not is_well_formed_cti_paragraph(summary):
                    summary = normalize_summary_text(model.summarize(focused, repair=True))
                    repaired = True
                rows.append((url, extracted, focused, summary, repaired, content.get("title")))
            yield pd.DataFrame(
                rows,
                columns=["url", "extracted_text", "focused_text",
                         "summary", "summary_repaired", "title"],
            )

    return df.select(url_col, html_col).mapInPandas(run, schema=INGEST_SCHEMA)
