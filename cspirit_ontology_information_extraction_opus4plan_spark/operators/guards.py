"""Content-size and encoding guards over raw binary payloads
(SURVEY §2.2's content-size/encoding-guards row).

Reference semantics: BaseParser's validation rules `content_size`
(parsers/__init__.py:546-565 — reject content above max_content_size,
default 100 MB :527) and `content_encoding` (:567-583); file and
stream reads decode bytes with the configured codec and surface
UnicodeDecodeError as a validation failure instead of a crash
(:1459-1464, :1484-1486); the XML path additionally sniffs BOMs and
declared encodings (xml_parser.py:646-697).

Spark mapping: the guard inspects real bytes with JVM-side column
expressions only — octet_length for the size cap, binary-prefix
compares against BOM literals, is_valid_utf8 on the raw binary->string
cast (a bytes reinterpretation, not a decode) for decodability. No
Python touches the payload. At 100 TB this runs as the first
projection above the scan; bad rows fail into a filterable status
column (quarantine), never a driver-side exception.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UTF8_BOM = b"\xef\xbb\xbf"
UTF16LE_BOM = b"\xff\xfe"
UTF16BE_BOM = b"\xfe\xff"

# the reference's max_content_size default (parsers/__init__.py:527)
DEFAULT_MAX_BYTES = 100 * 1024 * 1024


def content_guards(payloads: DataFrame,
                   max_bytes: int = DEFAULT_MAX_BYTES) -> DataFrame:
    """(doc_id, content binary) -> (doc_id, n_bytes, encoding, status).

    encoding: BOM sniff first (utf-8-bom / utf-16le / utf-16be —
    xml_parser.py:646), then UTF-8 validity on the raw bytes; status:
    'oversized' above max_bytes (size outranks encoding, matching the
    reference's rule order parsers/__init__.py:543-544), 'rejected' for
    undecodable bytes, else 'ok'.
    """
    content = F.col("content")
    n_bytes = F.octet_length(content)
    encoding = (
        F.when(F.substring(content, 1, 3) == F.lit(UTF8_BOM), "utf-8-bom")
        .when(F.substring(content, 1, 2) == F.lit(UTF16LE_BOM), "utf-16le")
        .when(F.substring(content, 1, 2) == F.lit(UTF16BE_BOM), "utf-16be")
        .when(F.is_valid_utf8(content.cast("string")), "utf-8")
        .otherwise("invalid"))
    status = (F.when(n_bytes > F.lit(max_bytes), "oversized")
              .when(encoding == "invalid", "rejected")
              .otherwise("ok"))
    return payloads.select("doc_id", n_bytes.alias("n_bytes"),
                           encoding.alias("encoding"),
                           status.alias("status"))
