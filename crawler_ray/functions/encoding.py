"""Response-encoding fixup (M27).

The reference trusts the HTTP-header charset except for the one case
``requests`` is known to lie about: a missing charset defaults to
ISO-8859-1, so on ``response.encoding == 'ISO-8859-1'`` it switches to
``response.apparent_encoding`` — content-sniffed — before parsing
(``utils/http.py:318-319,441-442``).

``apparent_encoding`` there is chardet's statistical guess; no detector
library ships in this environment, so the sniffer here is the
deterministic subset that covers real HTML: BOMs, the in-document
``<meta charset>`` / ``http-equiv`` declaration (what the bytes SAY
they are), then a strict-UTF-8 probe, then the ISO-8859-1 fallback
(which decodes any byte string).  The live corpus stores pre-decoded
html, so the batch stage is exercised by tests and available for a
bytes-corpus source rather than wired into the default crawl path.
"""

from __future__ import annotations

import re

__all__ = ["apparent_encoding", "fix_encoding", "decode_html_batch"]

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)"""
    rb"""|content\s*=\s*["'][^"']*charset=([a-zA-Z0-9_\-]+))""",
    re.IGNORECASE)

# BOM -> the codec chardet would report: the endianness-agnostic
# codecs ('utf-16'/'utf-32'/'utf-8-sig') CONSUME the BOM on decode,
# matching requests' chardet path ('UTF-16' etc.) — the suffixed
# codecs would leave a stray U+FEFF as the first character.  The
# 4-byte UTF-32 BOMs are checked before UTF-16 because \xff\xfe is a
# prefix of the UTF-32-LE BOM.
_BOMS = (
    (b"\xff\xfe\x00\x00", "utf-32"),
    (b"\x00\x00\xfe\xff", "utf-32"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16"),
    (b"\xfe\xff", "utf-16"),
)


def apparent_encoding(raw: bytes, sniff_bytes: int = 1024) -> str:
    """Deterministic stand-in for requests' chardet-backed
    ``apparent_encoding``: BOM, then <meta> declaration (first
    ``sniff_bytes``), then strict-UTF-8 probe, else ISO-8859-1."""
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            return enc
    m = _META_RE.search(raw[:sniff_bytes])
    if m:
        declared = (m.group(1) or m.group(2)).decode("ascii").lower()
        try:
            b"x".decode(declared)
        except LookupError:
            pass
        else:
            return declared
    try:
        raw.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "iso-8859-1"


def fix_encoding(raw: bytes, declared: str | None) -> tuple[str, str]:
    """Decode ``raw`` the way the reference's fetch does: trust the
    declared charset unless it is the requests ISO-8859-1 default (or
    absent/unknown), in which case sniff.  Returns (text, encoding
    actually used); undecodable bytes are replaced, matching
    ``response.text`` behaviour."""
    enc = (declared or "").strip().lower()
    if enc in ("", "iso-8859-1", "latin-1", "latin1"):
        enc = apparent_encoding(raw)
    try:
        return raw.decode(enc, errors="replace"), enc
    except LookupError:  # unknown label from the header
        enc = apparent_encoding(raw)
        return raw.decode(enc, errors="replace"), enc


def decode_html_batch(t):
    """map_batches stage (pyarrow): ``html_bytes`` + optional
    ``declared_encoding`` columns → adds decoded ``html`` and the
    ``encoding`` used.  Per-row Python is inherent (codec calls), but
    the codec hot path is C."""
    import pyarrow as pa

    raws = t["html_bytes"].to_pylist()
    declared = (t["declared_encoding"].to_pylist()
                if "declared_encoding" in t.column_names
                else [None] * len(raws))
    texts, encs = [], []
    for raw, dec in zip(raws, declared):
        text, enc = fix_encoding(raw or b"", dec)
        texts.append(text)
        encs.append(enc)
    return (t.append_column("html", pa.array(texts, pa.string()))
             .append_column("encoding", pa.array(encs, pa.string())))
