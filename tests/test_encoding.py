"""M27 encoding fixup: declared-charset trust, ISO-8859-1 sniffing."""

import pyarrow as pa

from crawler_ray.functions.encoding import (apparent_encoding,
                                            decode_html_batch,
                                            fix_encoding)

PERSIAN = "سلام دنیا"
ARABIC_SUBSET = "سلام"  # cp1256-encodable (U+06CC is not)


def test_declared_charset_is_trusted():
    raw = PERSIAN.encode("utf-8")
    text, enc = fix_encoding(raw, "utf-8")
    assert (text, enc) == (PERSIAN, "utf-8")
    # cp1256 declared and honoured even though bytes are also valid
    # latin-1 — the reference only re-sniffs on the ISO-8859-1 default
    raw = ARABIC_SUBSET.encode("cp1256")
    text, enc = fix_encoding(raw, "cp1256")
    assert (text, enc) == (ARABIC_SUBSET, "cp1256")


def test_iso_8859_1_default_triggers_sniff():
    raw = f"<html><body>{PERSIAN}</body></html>".encode("utf-8")
    text, enc = fix_encoding(raw, "ISO-8859-1")
    assert enc == "utf-8" and PERSIAN in text
    # same for a missing header
    text, enc = fix_encoding(raw, None)
    assert enc == "utf-8" and PERSIAN in text


def test_meta_charset_beats_utf8_probe():
    body = ("<html><head><meta charset='cp1256'></head>"
            f"{ARABIC_SUBSET}</html>")
    raw = body.encode("cp1256")
    text, enc = fix_encoding(raw, "iso-8859-1")
    assert enc == "cp1256" and ARABIC_SUBSET in text
    # http-equiv spelling
    raw = (b"<html><head><meta http-equiv='Content-Type' "
           b"content='text/html; charset=windows-1252'></head>x</html>")
    assert apparent_encoding(raw) == "windows-1252"


def test_bom_and_fallbacks():
    assert apparent_encoding(b"\xef\xbb\xbfhi") == "utf-8-sig"
    # BOM-detected codecs CONSUME the BOM (requests' chardet returns
    # 'UTF-16' whose codec eats it — no stray U+FEFF in the text)
    for enc in ("utf-16-le", "utf-16-be"):
        raw = "hi".encode(enc)
        bom = b"\xff\xfe" if enc == "utf-16-le" else b"\xfe\xff"
        assert apparent_encoding(bom + raw) == "utf-16"
        assert fix_encoding(bom + raw, None) == ("hi", "utf-16")
    # 4-byte UTF-32 BOMs win over their 2-byte UTF-16 prefixes
    assert apparent_encoding("hi".encode("utf-32")) == "utf-32"
    assert fix_encoding("hi".encode("utf-32"), None) == ("hi", "utf-32")
    assert apparent_encoding(
        b"\x00\x00\xfe\xff" + "hi".encode("utf-32-be")) == "utf-32"
    # invalid-utf8, no meta, no bom -> latin-1 fallback
    assert apparent_encoding(b"\xff\xfa\x80abc") == "iso-8859-1"
    # bogus declared label falls back to sniffing instead of raising
    text, enc = fix_encoding(b"abc", "not-a-codec")
    assert (text, enc) == ("abc", "utf-8")
    # unknown meta label is skipped
    assert apparent_encoding(
        b"<meta charset='bogus-enc'>abc") == "utf-8"


def test_decode_html_batch(ray_session):
    import ray.data as rd
    rows = pa.table({
        "url": ["a", "b", "c"],
        "html_bytes": [
            f"<p>{PERSIAN}</p>".encode("utf-8"),
            b"\xef\xbb\xbf<p>bom</p>",
            None,
        ],
        "declared_encoding": ["iso-8859-1", None, "utf-8"],
    })
    out = (rd.from_arrow(rows)
           .map_batches(decode_html_batch, batch_format="pyarrow")
           .to_pandas().set_index("url"))
    assert out.loc["a", "encoding"] == "utf-8"
    assert PERSIAN in out.loc["a", "html"]
    assert out.loc["b", "encoding"] == "utf-8-sig"
    assert out.loc["b", "html"] == "<p>bom</p>"  # BOM stripped
    assert out.loc["c", "html"] == ""
