"""Pure-Python extraction core — zero Spark imports.

Doubles as the golden-file oracle (SURVEY.md §5.1) and the body of the
Spark mapInPandas extractor (textextract_spark.pipeline).
"""

from .charset import decode_payload, sniff_charset
from .extract import (
    FMT_HTML,
    FMT_PDF,
    FMT_TEXT,
    ExtractResult,
    extract_document,
    extract_plain,
    sniff_format,
)
from .html_extract import extract_html
from .pdf_extract import extract_pdf

__all__ = [
    "decode_payload", "sniff_charset", "extract_document", "extract_html",
    "extract_pdf", "extract_plain", "sniff_format", "ExtractResult",
    "FMT_HTML", "FMT_PDF", "FMT_TEXT",
]
