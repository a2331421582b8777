"""Binary-format parsers through the DISTRIBUTED path, oracle-gated.

Round-1 gap (VERDICT.md): the binary parsers (pdf, docx, rtf, eml,
zip) were golden-tested in pure Python but never crossed the Spark
boundary under the driver's oracle gate — mime routing of binary
payloads inside mapInPandas was unexercised.

Each query here synthesizes REAL binary payloads deterministically
from ``documents.text`` inside an Arrow-batched builder kernel
(zip containers, classic-xref PDFs with literal-string content
streams, RTF groups, RFC-822 messages), routes them through the real
pipeline (``extract.extract_pages``: sniff -> dispatch -> parse ->
render), and the DuckDB oracle reconstructs the expected extracted
bytes analytically — a per-row byte-identity gate on the whole
distributed extraction path for each parser family.

``documents.text`` is pure ``[a-z0-9 .,]`` ASCII (verified round 1),
so no PDF-string escaping (``()\\``), RTF control chars (``{}\\``),
XML entities (``<&``), or charset ambiguity enters the oracle.

Reference parity anchors: pdf_parser (src/pdf_parser.cpp),
odf_ooxml parser (src/odf_ooxml_parser.cpp), rtf_parser
(src/rtf_parser.cpp), eml_parser (src/eml_parser.cpp),
archives_parser (src/archives_parser.cpp); rendering rules
SURVEY.md §2.5.1.
"""

from __future__ import annotations

import io
import zipfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from docwire_spark.ops.common import load
from docwire_spark.spark.extract import extract_pages

_URL_PREFIX = "https://synth.local/d/"

DOCX_MIME = (
    "application/vnd.openxmlformats-officedocument"
    ".wordprocessingml.document"
)

# ---------------------------------------------------------------------------
# deterministic payload builders (pure functions; run inside the
# Arrow-batched builder kernel on executors)
# ---------------------------------------------------------------------------

#: fixed DOS timestamp so zip payloads are byte-stable across runs
_ZIP_TS = (1980, 1, 1, 0, 0, 0)

_DOCX_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="'
    + DOCX_MIME + '.main+xml"/></Types>'
)


def make_docx(text: str) -> bytes:
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main">'
        "<w:body><w:p><w:r><w:t>" + text + "</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr(zipfile.ZipInfo("[Content_Types].xml", _ZIP_TS), _DOCX_CT)
        z.writestr(zipfile.ZipInfo("word/document.xml", _ZIP_TS), doc)
    return buf.getvalue()


def make_rtf(text: str) -> bytes:
    return (
        "{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Times New Roman;}}\\f0 "
        + text + "\\par}"
    ).encode()


def make_eml(doc_id: int, text: str) -> bytes:
    return (
        "From: sender@synth.local\r\n"
        "To: rcpt@synth.local\r\n"
        f"Subject: doc {doc_id}\r\n"
        "Date: Mon, 01 Jan 2024 00:00:00 +0000\r\n"
        "MIME-Version: 1.0\r\n"
        "Content-Type: text/plain; charset=utf-8\r\n"
        "\r\n"
        + text + "\r\n"
    ).encode()


def make_zip(text: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr(zipfile.ZipInfo("a.txt", _ZIP_TS), text)
    return buf.getvalue()


def make_pdf(text: str) -> bytes:
    """Classic-xref PDF 1.4: one page, one literal-string Tj, Type1
    base font, uncompressed content stream, correct xref offsets."""
    stream = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
        + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for i, o in enumerate(objs, 1):
        offs.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offs:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


_BUILDERS = {
    "pdf": lambda did, text: make_pdf(text),
    "docx": lambda did, text: make_docx(text),
    "rtf": lambda did, text: make_rtf(text),
    "eml": make_eml,
    "zip": lambda did, text: make_zip(text),
}

_PAGES_SCHEMA = StructType(
    [StructField("url", StringType()), StructField("html", BinaryType())]
)


def _builder_batches(iterator):
    """Arrow-batched payload builder: (doc_id, text, fmt) -> (url,
    html BINARY).  Runs on executors; per-batch Python, no per-row
    pickling."""
    import pandas as pd

    for pdf in iterator:
        urls, payloads = [], []
        for did, text, fmt in zip(pdf["doc_id"], pdf["text"], pdf["fmt"]):
            urls.append(f"{_URL_PREFIX}{did}.{fmt}")
            payloads.append(_BUILDERS[fmt](int(did), text or ""))
        yield pd.DataFrame({"url": urls, "html": payloads})


def _synth_pages(docs: DataFrame, fmt_col) -> DataFrame:
    return docs.select("doc_id", "text", fmt_col.alias("fmt")).mapInPandas(
        _builder_batches, _PAGES_SCHEMA
    )


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pages = _synth_pages(docs, F.lit(fmt))
    res = extract_pages(pages, n_shards=16)
    return res.select(
        F.regexp_extract("url", r"/(\d+)\.", 1).cast("bigint").alias("doc_id"),
        "mime",
        "extracted_text",
        "error",
    )


def _roundtrip_sql(mime: str, tail: str) -> str:
    return f"""
SELECT doc_id, '{mime}' AS mime,
       text || {tail} AS extracted_text,
       CAST(NULL AS VARCHAR) AS error
FROM documents
"""


def extract_pdf_roundtrip(spark, sf_dir):
    """PDF parser through the distributed path (content-stream parse,
    reading order, xref walk — kernel/pdfminer_lite.py, kernel/pdf.py;
    reference src/pdf_parser.cpp)."""
    return _roundtrip(spark, sf_dir, "pdf")


def extract_docx_roundtrip(spark, sf_dir):
    """OOXML parser through the distributed path (ZIP container ->
    word/document.xml -> paragraph render — kernel/docx_extract.py;
    reference src/odf_ooxml_parser.cpp)."""
    return _roundtrip(spark, sf_dir, "docx")


def extract_rtf_roundtrip(spark, sf_dir):
    """RTF parser through the distributed path (group/control-word
    machine — kernel/rtf_extract.py; reference src/rtf_parser.cpp)."""
    return _roundtrip(spark, sf_dir, "rtf")


def extract_eml_roundtrip(spark, sf_dir):
    """EML parser through the distributed path (RFC-822 headers +
    text/plain body — kernel/eml_extract.py; reference
    src/eml_parser.cpp)."""
    return _roundtrip(spark, sf_dir, "eml")


def extract_archive_roundtrip(spark, sf_dir):
    """ZIP archive parser through the distributed path (central
    directory walk -> member dispatch -> txt parser — kernel/
    archive_extract.py; reference src/archives_parser.cpp)."""
    return _roundtrip(spark, sf_dir, "zip")


# expected bytes per format, reconstructed analytically: the builders
# emit the document text verbatim (no collapsible whitespace paths in
# these parsers for [a-z0-9 .,] payloads); paragraph close adds "\n\n"
# (pdf/docx/rtf/zip-member-txt), the eml body render ends at the
# body's own newline
EXTRACT_PDF_SQL = _roundtrip_sql("application/pdf", "chr(10) || chr(10)")
EXTRACT_DOCX_SQL = _roundtrip_sql(DOCX_MIME, "chr(10) || chr(10)")
EXTRACT_RTF_SQL = _roundtrip_sql("application/rtf", "chr(10) || chr(10)")
EXTRACT_EML_SQL = _roundtrip_sql("message/rfc822", "chr(10)")
EXTRACT_ZIP_SQL = _roundtrip_sql("application/zip", "chr(10) || chr(10)")


def extract_binary_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed binary corpus through the ONE pipeline: each row is
    synthesized as pdf/docx/rtf/eml/zip by doc_id residue; the
    magic-byte + container sniff cascade must route every payload to
    the right parser (zip-vs-docx disambiguation exercises the
    odf_ooxml ZIP-member sniff)."""
    docs = load(spark, sf_dir, "documents")
    fmt = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("pdf"))
        .when(F.col("doc_id") % 5 == 1, F.lit("docx"))
        .when(F.col("doc_id") % 5 == 2, F.lit("rtf"))
        .when(F.col("doc_id") % 5 == 3, F.lit("eml"))
        .otherwise(F.lit("zip"))
    )
    pages = _synth_pages(docs, fmt)
    res = extract_pages(pages, n_shards=16)
    return (
        res.groupBy("mime")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("extracted_text")).alias("total_chars"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "n_failed"
            ),
        )
        .orderBy("mime")
    )


EXTRACT_BINARY_DISPATCH_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN 'application/pdf'
           WHEN 1 THEN '{DOCX_MIME}'
           WHEN 2 THEN 'application/rtf'
           WHEN 3 THEN 'message/rfc822'
           ELSE 'application/zip' END AS mime,
         CASE doc_id % 5
           WHEN 3 THEN length(text) + 1
           ELSE length(text) + 2
         END AS n_chars
  FROM documents
)
SELECT mime, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(0 AS BIGINT) AS n_failed
FROM m GROUP BY mime ORDER BY mime
"""


QUERIES = {
    "extract_pdf_roundtrip": extract_pdf_roundtrip,
    "extract_docx_roundtrip": extract_docx_roundtrip,
    "extract_rtf_roundtrip": extract_rtf_roundtrip,
    "extract_eml_roundtrip": extract_eml_roundtrip,
    "extract_archive_roundtrip": extract_archive_roundtrip,
    "extract_binary_dispatch": extract_binary_dispatch,
}

ORACLES = {
    "extract_pdf_roundtrip": EXTRACT_PDF_SQL,
    "extract_docx_roundtrip": EXTRACT_DOCX_SQL,
    "extract_rtf_roundtrip": EXTRACT_RTF_SQL,
    "extract_eml_roundtrip": EXTRACT_EML_SQL,
    "extract_archive_roundtrip": EXTRACT_ZIP_SQL,
    "extract_binary_dispatch": EXTRACT_BINARY_DISPATCH_SQL,
}
