"""Persian/Latin text normalization, tokenization and content hashing.

Faithful reimplementations of the reference's text utilities (cited per
function into ``/root/reference/``); these define the byte-level contracts
for the similarity-hash dedup key and the normalized text used by the
keyword classifier.
"""

from __future__ import annotations

import hashlib
import re
import string
import unicodedata

__all__ = [
    "PERSIAN_CHARS_MAP", "PERSIAN_STOP_WORDS",
    "normalize_persian_text", "tokenize_persian_text",
    "calculate_text_hash", "similarity_hash", "is_similar_content",
]

# Character unification map — parity with ``utils/text.py:19-39``
# (Arabic kaf/yeh -> Persian, Arabic-Indic digits -> ASCII, teh-marbuta ->
# heh, hamza forms -> plain, zero-width non-joiner -> space).
PERSIAN_CHARS_MAP = {
    "ك": "ک",  # ARABIC KAF -> FARSI KEHEH
    "ي": "ی",  # ARABIC YEH -> FARSI YEH
    "١": "1", "٢": "2", "٣": "3", "٤": "4",
    "٥": "5", "٦": "6", "٧": "7", "٨": "8",
    "٩": "9", "٠": "0",
    "ة": "ه",  # TEH MARBUTA -> HEH
    "ئ": "ی",  # YEH WITH HAMZA -> FARSI YEH
    "إ": "ا",  # ALEF WITH HAMZA BELOW -> ALEF
    "أ": "ا",  # ALEF WITH HAMZA ABOVE -> ALEF
    "آ": "ا",  # ALEF WITH MADDA -> ALEF
    "ؤ": "و",  # WAW WITH HAMZA -> WAW
    "‌": " ",       # ZWNJ -> space
}

_CHAR_TRANSLATION = str.maketrans(PERSIAN_CHARS_MAP)
_WS_RE = re.compile(r"\s+")

# 51 stop words — parity with ``utils/text.py:42-48``.
PERSIAN_STOP_WORDS = [
    "از", "به", "با", "در", "بر", "را", "که", "این", "آن", "و", "یا", "اما", "ولی",
    "برای", "تا", "هر", "چه", "چرا", "اگر", "مگر", "پس", "نیز", "حتی", "همه", "هیچ",
    "خود", "باید", "شاید", "چون", "زیرا", "بنابراین", "سپس", "گرچه", "درباره", "بدون",
    "توسط", "علاوه", "بین", "همچنین", "بسیار", "برخی", "می", "های", "ها", "ی", "است",
    "نیست", "بود", "شد", "شود", "کرد", "کند", "شده", "می‌شود", "می‌کند",
    "دارد", "ندارد",
]
_STOP_WORD_SET = frozenset(PERSIAN_STOP_WORDS)

_PUNCT_TRANSLATION = str.maketrans("", "", string.punctuation + "،؛؟»«!")


# Dropping combining marks via str.translate (C loop) instead of a
# per-character Python genexpr: one table of every combining codepoint,
# built once at import (identical result to `not unicodedata.combining(c)`
# filtering).
_COMBINING_TRANSLATION = {
    cp: None for cp in range(0x110000) if unicodedata.combining(chr(cp))
}

# Search-gates for the two translate passes: one C regex scan decides
# whether the (much slower) per-char dict translate is needed at all.
# Most page text contains no mapped Arabic variants and no combining
# marks, so the common case is two scans and zero translates.
_CHAR_MAP_RE = re.compile(
    "[" + "".join(map(re.escape, PERSIAN_CHARS_MAP)) + "]")
_COMBINING_RE = re.compile(
    "[" + "".join(re.escape(chr(cp)) for cp in _COMBINING_TRANSLATION)
    + "]")


def normalize_persian_text(text: str | None) -> str:
    """Char unification + whitespace collapse + NFKD combining-mark strip.

    Parity with ``utils/text.py:126-150`` (same operation order: char map,
    then whitespace collapse/strip, then NFKD + drop combining marks).
    The gates below skip work without changing the result: translate is
    identity when no mapped char occurs; NFKD is identity on ASCII; the
    combining strip is identity when no combining mark occurs.
    """
    if not text:
        return ""
    if _CHAR_MAP_RE.search(text):
        text = text.translate(_CHAR_TRANSLATION)
    text = _WS_RE.sub(" ", text).strip()
    if text.isascii():
        return text
    text = unicodedata.normalize("NFKD", text)
    if _COMBINING_RE.search(text):
        text = text.translate(_COMBINING_TRANSLATION)
    return text


def tokenize_persian_text(text: str | None, remove_stop_words: bool = True,
                          remove_punctuation: bool = True) -> list[str]:
    """Normalize -> strip punctuation -> split -> drop stop words.

    Parity with ``utils/text.py:153-183`` (punctuation set includes the
    Persian marks ``،؛؟»«!``).
    """
    if not text:
        return []
    text = normalize_persian_text(text)
    if remove_punctuation:
        text = text.translate(_PUNCT_TRANSLATION)
    tokens = text.split()
    if remove_stop_words:
        tokens = [t for t in tokens if t not in _STOP_WORD_SET]
    return tokens


def calculate_text_hash(text: str | None, method: str = "md5") -> str | None:
    """Normalize + collapse spaces, then hex digest.

    Parity with ``utils/text.py:186-213`` (md5 default; sha1/sha256
    variants; ``None`` for empty input).
    """
    if not text:
        return None
    text = normalize_persian_text(text)
    text = " ".join(text.split())
    data = text.encode("utf-8")
    if method == "sha1":
        return hashlib.sha1(data).hexdigest()
    if method == "sha256":
        return hashlib.sha256(data).hexdigest()
    return hashlib.md5(data).hexdigest()


def similarity_hash(content: str | None, method: str = "md5", *,
                    normalized: str | None = None) -> str | None:
    """Dedup key: md5 of the first 1000 chars of the normalized content.

    Parity with ``models/content.py:70-102`` (``calculate_similarity_hash``).
    Only a prefix of the input is normalized when the content is long:
    the first 1000 NORMALIZED chars are a pure function of an input
    prefix (char map and whitespace collapse are streaming-local; NFKD
    divergence from truncation is confined to the final combining
    sequence, and combining marks are stripped anyway), so normalizing a
    4x prefix and requiring ≥1001 normalized chars — falling back to the
    full text otherwise — produces the identical signature at a fraction
    of the cost on large pages.

    ``normalized``: the full ``normalize_persian_text(content)`` when the
    caller already has it (the extract stage normalizes once and shares it
    with classification).  By the same streaming-local argument, the full
    normalization's first 1000 chars equal the prefix path's, so the
    signature is identical either way.
    """
    if not content:
        return None
    if normalized is None:
        if len(content) > 4000:
            normalized = normalize_persian_text(content[:4000])
            if len(normalized) < 1001:
                normalized = normalize_persian_text(content)
        else:
            normalized = normalize_persian_text(content)
    signature = normalized[:1000]
    data = signature.encode("utf-8")
    if method == "sha256":
        return hashlib.sha256(data).hexdigest()
    return hashlib.md5(data).hexdigest()


def is_similar_content(text1: str | None, text2: str | None,
                       threshold: float = 0.8) -> bool:
    """Length-ratio gate + equal-hash check (``utils/text.py:461-501``)."""
    if not text1 or not text2:
        return False
    t1 = " ".join(normalize_persian_text(text1).split())
    t2 = " ".join(normalize_persian_text(text2).split())
    len_ratio = min(len(t1), len(t2)) / max(len(t1), len(t2))
    if len_ratio < threshold:
        return False
    return calculate_text_hash(t1) == calculate_text_hash(t2)
