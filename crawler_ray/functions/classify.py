"""Keyword-based content-type + legal-domain classification.

The reference's ``TextClassifier`` (``core/classifier.py:26-464``) needs
pickled sklearn models discovered on disk; with no model present
``is_ready()`` is False and classification yields no labels, so the
crawler stores everything as content_type='other' with domains=[]
(``core/storage.py:183,147``).  sklearn is not available in this
container, so this module makes the *feature* layer the classifier:

- keyword frequency scoring with the reference's exact dictionaries and
  normalization (``ml/features.py:34-84`` keyword sets;
  ``ml/features.py:400-422,514-534`` scoring: per-keyword
  ``\\b``-bounded case-insensitive counts, normalized by keyword-set size,
  then row-normalized);
- content_type = argmax keyword score (ties: dictionary order
  question/answer/article/profile; all-zero -> 'other');
- domains = all domains with positive score, sorted by score descending
  (reference sorts predictions by probability,
  ``core/classifier.py:242-243``).

The model-backed path lives in ``crawler_ray/ml``: TF-IDF features
(``ml/features.py:197-265``), seeded offline training
(``ml/training/train_content_model.py`` / ``train_domain_model.py``) and
newest-artifact discovery (``core/classifier.py:154-179``) are all
re-derived sklearn-free (numpy logistic heads, ``.npz`` artifacts);
``KeywordClassifier`` loads those artifacts when paths are given and
falls back to this keyword scorer otherwise — the same fallback the
reference takes when no ``.pkl`` exists.
"""

from __future__ import annotations

import re

from crawler_ray.functions.text import normalize_persian_text

__all__ = [
    "LEGAL_DOMAINS_KEYWORDS", "CONTENT_TYPE_KEYWORDS",
    "domain_scores", "content_type_scores", "classify_text",
    "KeywordClassifier",
]

# Parity with ``ml/features.py:34-60`` (legal domain keyword sets).
LEGAL_DOMAINS_KEYWORDS: dict[str, list[str]] = {
    "criminal": [
        "جرم", "مجازات", "زندان", "حبس", "قصاص", "دیه", "تعزیر", "قانون مجازات",
        "جزا", "بزهکار", "متهم", "مجرم", "شاکی", "بزه", "جنایت", "سرقت", "قتل",
        "جرح", "ضرب", "حدود", "کلاهبرداری", "اختلاس", "ارتشا", "قاچاق",
    ],
    "civil": [
        "قرارداد", "عقد", "معامله", "ارث", "وصیت", "قانون مدنی", "مالکیت", "بیع",
        "اجاره", "وقف", "نکاح", "طلاق", "مهریه", "حضانت", "عقود", "تعهد", "تملیک",
        "تملک", "خسارت", "مسئولیت مدنی", "ضمان", "رهن", "اسناد", "شرط", "الزام",
    ],
    "commercial": [
        "تجارت", "شرکت", "سهام", "تاجر", "قانون تجارت", "ورشکستگی", "چک", "سفته",
        "برات", "اوراق بهادار", "بورس", "قرارداد تجاری", "حق العمل کاری",
        "ضمانت نامه", "حمل و نقل", "بیمه", "داوری تجاری", "مالیات", "مناقصه",
        "مزایده",
    ],
    "administrative": [
        "استخدام", "کارگر", "کارفرما", "حقوق کار", "قانون کار", "تأمین اجتماعی",
        "بیمه", "مالیات", "تخلفات اداری", "دیوان عدالت اداری", "قانون شهرداری",
        "امور اداری", "استخدام دولتی", "ترفیع", "انفصال", "کارمند", "خدمات کشوری",
    ],
    "constitutional": [
        "قانون اساسی", "حقوق اساسی", "دولت", "مجلس", "قوه قضاییه", "قوه مجریه",
        "قوه مقننه", "انتخابات", "نظام", "حکومت", "جمهوری", "رهبر",
        "ریاست جمهوری", "وزیر", "وزارت", "نمایندگان", "شورای نگهبان",
    ],
}

# Parity with ``ml/features.py:62-84`` (content-type keyword sets).
CONTENT_TYPE_KEYWORDS: dict[str, list[str]] = {
    "question": [
        "سوال", "پرسش", "سؤال", "چرا", "چگونه", "آیا",
        "چطور", "چیست", "کیست", "کجاست", "کدام",
        "؟", "لطفا پاسخ دهید", "لطفا راهنمایی کنید",
    ],
    "answer": [
        "پاسخ", "جواب", "در پاسخ به", "طبق قانون", "بر اساس قانون",
        "با استناد به", "با توجه به قانون", "به موجب ماده", "طبق ماده",
        "با احترام", "باید گفت", "باید عرض کنم",
    ],
    "article": [
        "مقاله", "مقدمه", "چکیده", "نتیجه‌گیری", "بررسی", "تحلیل",
        "پژوهش", "مطالعه", "یافته‌ها", "منابع", "مآخذ", "نتایج",
        "ادبیات تحقیق", "روش‌شناسی", "روش تحقیق",
    ],
    "profile": [
        "سوابق", "تحصیلات", "تخصص", "وکیل", "مشاور حقوقی", "قاضی",
        "حقوقدان", "دانشگاه", "مدرک", "دکتری", "کارشناسی", "سابقه فعالیت",
        "زمینه فعالیت", "حوزه تخصصی",
    ],
}


def _compile(keyword_sets: dict[str, list[str]]):
    """One ``\\b``-bounded pattern per keyword (``ml/features.py:406-408``);
    counts are summed per set, so overlapping keywords double-count exactly
    as the reference does."""
    return {
        name: [re.compile(r"\b" + re.escape(kw) + r"\b", re.IGNORECASE)
               for kw in kws]
        for name, kws in keyword_sets.items()
    }


_WORD_RUN = re.compile(r"\w+")


def _build_fast(keyword_sets: dict[str, list[str]]):
    """Split each dictionary into the tokenize-once fast path and the
    regex slow path.  For a single-``\\w+``-word keyword, counting
    ``\\b kw \\b`` matches equals counting tokens equal to the keyword
    (a match cannot cross a ``\\w``/``\\W`` boundary), so one tokenize
    pass + dict lookups replaces ~190 per-keyword regex scans per
    document; multi-word keywords keep their compiled patterns."""
    single: dict[str, list[str]] = {}
    multi: dict[str, list[tuple[str | None, re.Pattern]]] = {}
    for name, kws in keyword_sets.items():
        for kw in kws:
            if _WORD_RUN.fullmatch(kw):
                single.setdefault(kw.lower(), []).append(name)
            else:
                # prefilter key: in any \b-bounded phrase match, every
                # \w+ run of the phrase aligns to a complete token of the
                # text (the phrase's own non-word separators and the \b
                # anchors bound each run), so the pattern is skipped
                # (count 0, exactly) unless ALL its words occur as tokens
                words = tuple(dict.fromkeys(
                    w.lower() for w in _WORD_RUN.findall(kw)))
                multi.setdefault(name, []).append((
                    words,
                    re.compile(r"\b" + re.escape(kw) + r"\b",
                               re.IGNORECASE)))
    return single, multi


_DOMAIN_PATTERNS = _compile(LEGAL_DOMAINS_KEYWORDS)
_TYPE_PATTERNS = _compile(CONTENT_TYPE_KEYWORDS)
_DOMAIN_SINGLE, _DOMAIN_MULTI = _build_fast(LEGAL_DOMAINS_KEYWORDS)
_TYPE_SINGLE, _TYPE_MULTI = _build_fast(CONTENT_TYPE_KEYWORDS)


def _keyword_scores(text: str, names, single, multi, sizes,
                    tokens=None, token_counts=None) -> dict[str, float]:
    """Per-set normalized frequency + row normalization
    (``ml/features.py:400-422``).  Counts are identical to per-keyword
    ``\\b``-bounded findall (see ``_build_fast``).  Token counting goes
    through a ``Counter`` so the per-token work is per-DISTINCT-token
    (prose repeats words heavily; the C-level Counter does the tally).
    ``token_counts``: precomputed lowercased-token Counter when the
    caller scores several keyword families over the same text (the
    tally is family-independent, so sharing it is exact)."""
    from collections import Counter

    counts = dict.fromkeys(names, 0)
    if token_counts is None:
        if tokens is None:
            tokens = _WORD_RUN.findall(text)
        token_counts = Counter(map(str.lower, tokens))
    for low, c in token_counts.items():
        hit = single.get(low)
        if hit:
            for name in hit:
                counts[name] += c
    token_set = token_counts.keys()
    for name, pats in multi.items():
        counts[name] += sum(
            len(p.findall(text)) for words, p in pats
            if all(w in token_set for w in words))
    raw = {}
    for name in names:
        count = counts[name]
        raw[name] = (count / sizes[name]) if count > 0 else 0.0
    total = sum(raw.values())
    if total > 0:
        raw = {k: v / total for k, v in raw.items()}
    return raw


_DOMAIN_SIZES = {k: len(v) for k, v in LEGAL_DOMAINS_KEYWORDS.items()}
_TYPE_SIZES = {k: len(v) for k, v in CONTENT_TYPE_KEYWORDS.items()}


def domain_scores(text: str) -> dict[str, float]:
    if not text:
        return {k: 0.0 for k in LEGAL_DOMAINS_KEYWORDS}
    return _keyword_scores(normalize_persian_text(text),
                           LEGAL_DOMAINS_KEYWORDS, _DOMAIN_SINGLE,
                           _DOMAIN_MULTI, _DOMAIN_SIZES)


def content_type_scores(text: str) -> dict[str, float]:
    if not text:
        return {k: 0.0 for k in CONTENT_TYPE_KEYWORDS}
    return _keyword_scores(normalize_persian_text(text),
                           CONTENT_TYPE_KEYWORDS, _TYPE_SINGLE,
                           _TYPE_MULTI, _TYPE_SIZES)


def classify_text(text: str, normalized: str | None = None) -> dict:
    """Classification record in the reference's result shape
    (``core/classifier.py:416-438``: text_summary + content_type block +
    domains block).  Normalizes and tokenizes the text ONCE for both
    score families (the hot path of the extract stage).

    ``normalized``: the precomputed ``normalize_persian_text(text)`` when
    the caller already has it (normalization is deterministic, so the
    result is byte-identical; the extract stage shares one normalization
    between classification and the similarity hash)."""
    if text:
        from collections import Counter

        normed = (normalized if normalized is not None
                  else normalize_persian_text(text))
        tokens = _WORD_RUN.findall(normed)
        # tally once, score both families against the shared Counter
        token_counts = Counter(map(str.lower, tokens))
        ct_scores = _keyword_scores(normed, CONTENT_TYPE_KEYWORDS,
                                    _TYPE_SINGLE, _TYPE_MULTI,
                                    _TYPE_SIZES, token_counts=token_counts)
        d_scores = _keyword_scores(normed, LEGAL_DOMAINS_KEYWORDS,
                                   _DOMAIN_SINGLE, _DOMAIN_MULTI,
                                   _DOMAIN_SIZES, token_counts=token_counts)
    else:
        ct_scores = {k: 0.0 for k in CONTENT_TYPE_KEYWORDS}
        d_scores = {k: 0.0 for k in LEGAL_DOMAINS_KEYWORDS}
    best_type = "other"
    best_score = 0.0
    for name in CONTENT_TYPE_KEYWORDS:  # dict order is the tie-break
        if ct_scores[name] > best_score:
            best_type, best_score = name, ct_scores[name]

    ranked = sorted((d for d in d_scores.items() if d[1] > 0),
                    key=lambda kv: (-kv[1], kv[0]))
    return {
        "text_summary": text[:100] + "..." if len(text) > 100 else text,
        "content_type": {"content_type": best_type,
                         "probabilities": ct_scores, "analysis": {}},
        "domains": {"domains": [k for k, _ in ranked],
                    "domain_details": [{"domain": k, "probability": v}
                                       for k, v in ranked],
                    "probabilities": d_scores},
    }


class KeywordClassifier:
    """Callable-class form for ``map_batches(KeywordClassifier, ...)`` actor
    pools (mirrors the reference's singleton ``TextClassifier``,
    ``core/classifier.py:391-464``, loaded once per worker).

    Without model paths this is the keyword scorer (the reference's
    behavior when no ``.pkl`` artifact exists,
    ``core/classifier.py:181-187``).  With ``content_model_path`` /
    ``domain_model_path`` pointing at trained ``.npz`` artifacts
    (``crawler_ray/ml``), content_type comes from the softmax head and
    domains from the one-vs-rest sigmoid head — loaded ONCE per actor in
    ``__init__``, exactly the reference's predict flow
    (``core/classifier.py:268-293``) re-expressed without pickle."""

    def __init__(self, content_model_path: str | None = None,
                 domain_model_path: str | None = None):
        self.content_model = None
        self.domain_model = None
        if content_model_path is not None:
            from crawler_ray.ml.model import load_model
            self.content_model = load_model(content_model_path)
        if domain_model_path is not None:
            from crawler_ray.ml.model import load_model
            self.domain_model = load_model(domain_model_path)

    def __call__(self, batch):
        import pyarrow as pa
        texts = [t or "" for t in batch["content"].to_pylist()]
        if self.content_model is None or self.domain_model is None:
            # one keyword pass covers both missing heads
            kw = [classify_text(t) for t in texts]
        if self.content_model is not None:
            types = self.content_model.predict_label(texts)
        else:
            types = [r["content_type"]["content_type"] for r in kw]
        if self.domain_model is not None:
            domains = self.domain_model.predict_multilabel(texts)
        else:
            domains = [r["domains"]["domains"] for r in kw]
        return batch.append_column(
            "content_type", pa.array(types, type=pa.string())
        ).append_column(
            "domains", pa.array(domains, type=pa.list_(pa.string())))
