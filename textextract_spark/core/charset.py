"""Charset sniffing + decoding for raw page payloads.

Reference analog: the client ships base64 PNG bytes and the backend prompt
demands exact text preservation (/root/reference/backend/routes/api_routes.py:78).
Here the payload is raw ``html: binary`` bytes (BASELINE.json input_hint), so
the first step of every branch is a deterministic bytes -> str decode.

Pure stdlib, no Spark imports. Deterministic: the same byte string always
decodes to the same unicode string, regardless of platform or partitioning.
"""

from __future__ import annotations

import re

# <meta charset="..."> or <meta http-equiv=...content="...charset=...">
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
_XML_DECL_RE = re.compile(
    rb"""<\?xml[^>]+encoding\s*=\s*["']([a-zA-Z0-9_\-]+)["']""", re.IGNORECASE
)

# Conservative alias map; anything unknown falls through to utf-8 try.
_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "us-ascii": "ascii",
    "ascii": "ascii",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    # common crawl-scale encodings (all stdlib codecs); anything not
    # listed falls through to the utf-8 try + latin-1 total fallback
    "gb2312": "gbk",
    "gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "euc-jp": "euc_jp",
    "euc-kr": "euc_kr",
    "iso-8859-2": "iso8859-2",
    "iso-8859-15": "iso8859-15",
    "windows-1251": "cp1251",
    "cp1251": "cp1251",
    "koi8-r": "koi8-r",
}


def sniff_charset(payload: bytes) -> str:
    """Return the charset to decode ``payload`` with.

    Order: BOM > declared <meta charset>/<?xml encoding?> (first 2048 bytes)
    > utf-8. The caller applies the latin-1 fallback on decode failure.
    """
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if payload.startswith(b"\xff\xfe"):
        return "utf-16-le"
    if payload.startswith(b"\xfe\xff"):
        return "utf-16-be"
    head = payload[:2048]
    m = _META_CHARSET_RE.search(head) or _XML_DECL_RE.search(head)
    if m:
        name = m.group(1).decode("ascii", "ignore").lower()
        if name in _ALIASES:
            return _ALIASES[name]
    return "utf-8"


def decode_payload(payload: bytes) -> str:
    """Deterministically decode bytes to text.

    Tries the sniffed charset strictly, then utf-8 strictly, then latin-1
    (which never fails). Never raises.
    """
    charset = sniff_charset(payload)
    try:
        return payload.decode(charset)
    except (UnicodeDecodeError, LookupError):
        pass
    if charset != "utf-8":
        try:
            return payload.decode("utf-8")
        except UnicodeDecodeError:
            pass
    return payload.decode("latin-1")
