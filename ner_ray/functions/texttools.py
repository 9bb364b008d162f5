"""Text-analysis kernels for large-scale training-data pipelines.

Language-ID (n-gram/char-class heuristic), quality scoring, token counting,
and document fingerprinting — the per-document operators a 100 TB corpus
pipeline runs inside ``map_batches``.  Pure functions here; Ray stages wire
them in ``pipelines.corpus``.

Where an operator has a DuckDB-expressible twin (token counts, fingerprints),
the semantics are pinned to the SQL equivalent (documented per function) so
the driver's oracle comparison is exact.
"""

from __future__ import annotations

import hashlib
import re

_WS = re.compile(r"\s+")

# Tiny stopword inventories for the language-ID heuristic.
_EN_STOP = {
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "for", "on", "with",
    "as", "at", "by", "this", "that", "be", "are", "was", "or", "not",
}


def tokenize_ws(text: str) -> list[str]:
    """Whitespace tokenization, pinned to DuckDB
    ``regexp_split_to_array(trim(text), '\\s+')`` semantics (empty text -> [])."""
    t = text.strip()
    return _WS.split(t) if t else []


_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def tokenize_bpe_ish(text: str) -> list[str]:
    """BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
    marks (CJK chars tokenize one-per-char).  The standard pre-pass before a
    real BPE vocabulary merge."""
    return _BPE_ISH.findall(text)


def char_classes(text: str) -> dict[str, int]:
    """Counts of char classes (vectorizable per batch via codepoint masks)."""
    n_alpha = n_digit = n_space = n_punct = n_cjk = 0
    for ch in text:
        o = ord(ch)
        if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
            n_cjk += 1
        elif ch.isalpha():
            n_alpha += 1
        elif ch.isdigit():
            n_digit += 1
        elif ch.isspace():
            n_space += 1
        else:
            n_punct += 1
    return {
        "n_alpha": n_alpha,
        "n_digit": n_digit,
        "n_space": n_space,
        "n_punct": n_punct,
        "n_cjk": n_cjk,
    }


def lang_id(text: str) -> str:
    """Heuristic language ID: 'zh' when CJK-dense, 'en' when English stopwords
    appear, else 'unk'.  (Deterministic; a stand-in for fastText-style LID —
    the actor interface is what a real model would plug into.)"""
    if not text:
        return "unk"
    cc = char_classes(text)
    total = max(1, len(text) - cc["n_space"])
    if cc["n_cjk"] / total >= 0.25:
        return "zh"
    toks = tokenize_ws(text.lower())
    if not toks:
        return "unk"
    stop_ratio = sum(t in _EN_STOP for t in toks) / len(toks)
    if stop_ratio >= 0.08 or cc["n_alpha"] / total >= 0.6:
        return "en"
    return "unk"


def quality_features(text: str) -> dict[str, float]:
    """Quality-scoring features (length / punct / stopword ratios)."""
    toks = tokenize_ws(text)
    n_tokens = len(toks)
    cc = char_classes(text)
    n = max(1, len(text))
    low = [t.lower() for t in toks]
    stop_ratio = (sum(t in _EN_STOP for t in low) / n_tokens) if n_tokens else 0.0
    mean_tok = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    uniq_ratio = (len(set(low)) / n_tokens) if n_tokens else 0.0
    return {
        "n_chars": float(len(text)),
        "n_tokens": float(n_tokens),
        "mean_token_len": mean_tok,
        "digit_ratio": cc["n_digit"] / n,
        "punct_ratio": cc["n_punct"] / n,
        "stopword_ratio": stop_ratio,
        "unique_token_ratio": uniq_ratio,
    }


def quality_score(text: str) -> float:
    """Scalar quality score in [0, 1] from the features (pinned formula)."""
    f = quality_features(text)
    score = 1.0
    if f["n_tokens"] < 5:
        score *= 0.3
    if f["mean_token_len"] < 2 or f["mean_token_len"] > 12:
        score *= 0.5
    score *= 1.0 - min(1.0, 2.0 * f["digit_ratio"])
    score *= 1.0 - min(1.0, 2.0 * f["punct_ratio"])
    if f["unique_token_ratio"] < 0.2:  # heavy repetition
        score *= 0.5
    return round(score, 6)


# --- Vectorized batch kernels for the curation hot path --------------------
#
# Batch-level equivalents of char_classes / lang_id / quality_score: Arrow
# RE2 count kernels + numpy segment folds instead of a per-char Python scan
# per row (the redact_pii_array idiom).  Unicode parity notes: alpha counts
# \p{L} minus the CJK ranges (== str.isalpha for letter-category chars),
# digit counts \p{Nd} (== str.isdigit for decimal digits; exotic No digits
# like superscripts diverge), space adds the Python-isspace extras
# (\x0b, \x1c-\x1f, \x85, \p{Z}) to RE2's \s.  Exact equality with the
# per-row forms on ASCII+CJK corpora — the classes the SQL twins pin —
# and pytest-gated bit-equality on the fixture corpus.

_CJK_RE2 = r"[\x{4E00}-\x{9FFF}\x{3400}-\x{4DBF}]"
_SPACE_RE2 = r"[\s\x{0B}\x{1C}-\x{1F}\x{85}\p{Z}]"


def _as_string_array(arr):
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.fill_null(pc.cast(arr, pa.string()), "")


def char_classes_batch(arr) -> dict:
    """Vectorized ``char_classes`` over a string array: dict of int64 numpy
    arrays (n_alpha, n_digit, n_space, n_punct, n_cjk) aligned to rows."""
    import numpy as np
    import pyarrow.compute as pc

    arr = _as_string_array(arr)

    def cnt(pat: str) -> np.ndarray:
        return pc.count_substring_regex(arr, pat).to_numpy(zero_copy_only=False).astype(np.int64)

    n = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    n_cjk = cnt(_CJK_RE2)
    n_space = cnt(_SPACE_RE2)
    n_alpha = cnt(r"\p{L}") - n_cjk
    n_digit = cnt(r"\p{Nd}")
    n_punct = n - n_cjk - n_space - n_alpha - n_digit
    return {
        "n_alpha": n_alpha,
        "n_digit": n_digit,
        "n_space": n_space,
        "n_punct": n_punct,
        "n_cjk": n_cjk,
        "n_chars": n,
    }


def _token_segments(arr):
    """``(parent_row, tokens)`` of the nonempty whitespace tokens of a string
    array — the flattened form every per-token statistic folds over."""
    import numpy as np
    import pyarrow.compute as pc

    toks = pc.utf8_split_whitespace(arr)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    return parent[keep_np], flat.filter(keep)


def lang_id_batch(arr):
    """Vectorized ``lang_id`` over a string array -> pyarrow string array."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = _as_string_array(arr)
    cc = char_classes_batch(arr)
    n_rows = len(arr)
    total = np.maximum(1, cc["n_chars"] - cc["n_space"]).astype(np.float64)

    parent, flat = _token_segments(pc.utf8_lower(arr))
    n_tok = np.bincount(parent, minlength=n_rows).astype(np.int64)
    is_stop = pc.is_in(flat, value_set=pa.array(sorted(_EN_STOP))).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(parent[is_stop], minlength=n_rows).astype(np.int64)
    stop_ratio = np.divide(
        n_stop, n_tok, out=np.zeros(n_rows, np.float64), where=n_tok > 0
    )

    empty = cc["n_chars"] == 0
    zh = cc["n_cjk"] / total >= 0.25
    en = (stop_ratio >= 0.08) | (cc["n_alpha"] / total >= 0.6)
    out = np.select(
        [empty, zh, n_tok == 0, en], ["unk", "zh", "unk", "en"], default="unk"
    )
    return pa.array(out.tolist(), pa.string())


def quality_score_batch(arr):
    """Vectorized ``quality_score`` over a string array -> float64 numpy
    array (same pinned formula, rounded to 6 digits)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    arr = _as_string_array(arr)
    cc = char_classes_batch(arr)
    n_rows = len(arr)
    n = np.maximum(1, cc["n_chars"]).astype(np.float64)

    parent, flat = _token_segments(arr)
    n_tok = np.bincount(parent, minlength=n_rows).astype(np.int64)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    len_sum = np.bincount(parent, weights=tok_len, minlength=n_rows)
    mean_tok = np.divide(
        len_sum, n_tok, out=np.zeros(n_rows, np.float64), where=n_tok > 0
    )
    low = pc.utf8_lower(flat)
    dedup = pd.DataFrame(
        {"r": parent, "t": low.to_numpy(zero_copy_only=False)}
    ).drop_duplicates()
    n_uniq = np.bincount(dedup["r"].to_numpy(), minlength=n_rows).astype(np.int64)
    uniq_ratio = np.divide(
        n_uniq, n_tok, out=np.zeros(n_rows, np.float64), where=n_tok > 0
    )

    score = np.ones(n_rows, np.float64)
    score *= np.where(n_tok < 5, 0.3, 1.0)
    score *= np.where((mean_tok < 2) | (mean_tok > 12), 0.5, 1.0)
    score *= 1.0 - np.minimum(1.0, 2.0 * cc["n_digit"] / n)
    score *= 1.0 - np.minimum(1.0, 2.0 * cc["n_punct"] / n)
    score *= np.where(uniq_ratio < 0.2, 0.5, 1.0)
    return np.round(score, 6)


def normalize_for_fingerprint(text: str) -> str:
    """Pinned to DuckDB ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``."""
    return _WS.sub(" ", text).strip().lower()


def md5_fingerprint(text: str) -> str:
    """Content fingerprint = md5 of whitespace-normalized lowercase text
    (DuckDB twin: ``md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))``)."""
    return hashlib.md5(normalize_for_fingerprint(text).encode()).hexdigest()


def hash_embed(text: str, dim: int = 64) -> "np.ndarray":
    """Deterministic feature-hashing document embedding: each token hashes to
    a signed bucket (the hashing trick), L2-normalized.  A stand-in for a
    trained text encoder with the same interface — near-identical texts get
    near-identical vectors, so cosine similarity ranks near-duplicates."""
    import numpy as np

    v = np.zeros(dim, dtype=np.float32)
    for tok in tokenize_ws(text):
        h = _te_hash64(tok)
        v[h % dim] += 1.0 if (h >> 62) & 1 else -1.0
    n = float(np.linalg.norm(v))
    return v / n if n else v


def _te_hash64(s: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def rolling_hashes(text: str, k: int = 8, base: int = 257, mod: int = (1 << 61) - 1) -> list[int]:
    """Rabin-Karp rolling hashes of all k-grams (document fingerprinting /
    shingling primitive).  O(n) per document."""
    n = len(text)
    if n < k:
        return []
    out = []
    h = 0
    power = pow(base, k - 1, mod)
    for i, ch in enumerate(text):
        h = (h * base + ord(ch)) % mod
        if i >= k - 1:
            out.append(h)
            h = (h - ord(text[i - k + 1]) * power) % mod
    return out


def winnow_fingerprint(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): min rolling hash per window —
    the standard local document fingerprint for near-dup/plagiarism sweeps."""
    hs = rolling_hashes(normalize_for_fingerprint(text), k=k)
    if not hs:
        return []
    out = []
    prev = -1
    for i in range(max(1, len(hs) - window + 1)):
        w = hs[i : i + window]
        m = min(w)
        j = i + w.index(m)
        if j != prev:
            out.append(m)
            prev = j
    return out


# --- PII / URL redaction (vectorized, RE2 on BOTH engines) -----------------
#
# pyarrow.compute's regex kernels and DuckDB's regexp_* functions are both
# RE2, so a pattern written in the shared subset (no backrefs, no lookaround)
# redacts byte-for-byte identically in the Ray stage and the SQL twin.
# Order matters and is part of the pinned semantics: URLs first (an email
# inside a URL's query string is the URL's problem), then emails, then
# phone-like digit runs (which would otherwise match digits inside URLs).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9\-]{6,}[0-9]", "<PHONE>"),
]


def redact_pii_array(arr):
    """Vectorized redaction over a pyarrow string array/chunked array.

    Returns ``(clean, n_redactions)`` where ``clean`` replaces every match of
    ``PII_PATTERNS`` (in order) with its tag and ``n_redactions`` counts the
    non-overlapping matches each stage saw.  Entirely Arrow compute kernels —
    no per-row Python — so it is the 100 TB-safe hot path; the SQL twin
    applies the same patterns with nested ``regexp_replace(..., 'g')``."""
    import pyarrow.compute as pc

    cur, n = arr, None
    for _, pat, repl in PII_PATTERNS:
        c = pc.count_substring_regex(cur, pat)
        n = c if n is None else pc.add(n, c)
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
    return cur, n


# --- Unicode text normalization (the first cleaning pass) ------------------
#
# NFC + control-char strip + whitespace collapse — the canonical hygiene
# stage every web-scale corpus runs before anything else.  The regex stages
# are shared-subset RE2 (identical in pyarrow.compute and DuckDB); the
# control-class pattern below is embedded verbatim in the SQL twin.
NORM_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"  # C0 minus \t\n\r, + DEL
_NORM_WS_RE = r"[ \t\r\n]+"


def normalize_text_array(arr):
    """``(norm, n_chars)`` over a pyarrow string array/chunked array.

    Pipeline (order pinned, mirrored by the SQL twin): NFC-compose, strip
    control characters (``NORM_CONTROL_RE``), collapse ``[ \\t\\r\\n]+`` runs
    to one space, trim edge spaces; ``n_chars`` = codepoint length of the
    result (DuckDB ``length()`` semantics).

    NFC parity constraint: this environment's pyarrow (16.1) build of
    ``utf8_normalize(form='NFC')`` only DEcomposes — measured in-session,
    NFC of ``'e'+U+0301`` comes back still decomposed — while DuckDB's
    ``nfc_normalize`` and CPython's ``unicodedata`` both canonically
    compose.  Composition therefore runs through ``unicodedata.normalize``
    (a single C call per row, no per-char Python); the strip / collapse /
    trim / length stages stay fully vectorized Arrow RE2 kernels.
    """
    import unicodedata

    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    composed = pa.array(
        [None if s is None else unicodedata.normalize("NFC", s) for s in arr.to_pylist()],
        pa.string(),
    )
    stripped = pc.replace_substring_regex(composed, pattern=NORM_CONTROL_RE, replacement="")
    collapsed = pc.replace_substring_regex(stripped, pattern=_NORM_WS_RE, replacement=" ")
    out = pc.utf8_trim(collapsed, characters=" ")
    return out, pc.utf8_length(out)


# --- Gopher-style repetition statistics (Rae et al. 2021, §A1.1) -----------
#
# Excess-repetition filters: a document dominated by one repeated n-gram or
# by duplicated n-gram positions is boilerplate/spam and gets dropped before
# training.  Token-based variants (the fixture corpus is single-line, so the
# paper's duplicate-line metrics would be vacuously zero here):
#   top_bigram_frac  — count of the most frequent bigram / total bigrams
#   dup_trigram_frac — fraction of trigram positions whose trigram occurs
#                      more than once in the doc
# Fractions are quantized to 1e-6 with the shared floor idiom; both
# numerator and denominator are exact ints so `c * 1000000 / n` is the
# identical correctly-rounded double in Python and DuckDB.

_REP_TOKEN = re.compile(r"[a-z0-9]+")  # = the corpus-analytics twin idiom


def repetition_stats(text: str | None) -> tuple[int, float, float]:
    """``(n_tokens, top_bigram_frac, dup_trigram_frac)`` for one document."""
    from collections import Counter

    import math

    if text is None:
        return 0, 0.0, 0.0
    toks = _REP_TOKEN.findall(text.lower())
    n = len(toks)
    top_bi = 0.0
    if n >= 2:
        c = Counter(zip(toks, toks[1:]))
        top_bi = math.floor(max(c.values()) * 1000000 / (n - 1) + 0.5) / 1000000.0
    dup_tri = 0.0
    if n >= 3:
        c3 = Counter(zip(toks, toks[1:], toks[2:]))
        dup = sum(v for v in c3.values() if v > 1)
        dup_tri = math.floor(dup * 1000000 / (n - 2) + 0.5) / 1000000.0
    return n, top_bi, dup_tri


# --- frozen linear quality classifier (q63) ------------------------------
# A fastText-style document quality model reduced to its deployable
# essence: integer token/char-class features x frozen integer weights.
# Integer end to end, so the Ray plan and the SQL twin agree bit-exactly
# with no quantization step.  Swap point for a trained model: replace
# _LQ_WEIGHTS/_LQ_BIAS with learned (scaled-int) coefficients — the
# serving plan (stateless vectorized map_batches, weights baked into the
# task closure; an actor pool only once the weight vector is big enough
# to be worth loading once per actor) does not change.
_LQ_WEIGHTS = {"n_stop": 120, "n_uniq": 40, "n_tokens": 8, "n_digit": -30, "n_punct": -50}
_LQ_BIAS = 0
_LQ_THRESHOLD = 400

_LQ_DIGIT = re.compile(r"[0-9]")
_LQ_PUNCT = re.compile(r"[^A-Za-z0-9\s]")


def linear_quality_score(text: str | None) -> tuple[int, bool]:
    """``(score, keep)`` for one document under the frozen linear model.

    Feature classes are pinned to the SQL twin's regex character classes
    ([0-9] digits; anything outside [A-Za-z0-9\\s] is "punct", so CJK
    counts as punct on BOTH sides — deliberately NOT ``char_classes``,
    whose unicode-aware buckets have no cheap SQL equivalent).
    """
    if not text:
        return _LQ_BIAS, _LQ_BIAS >= _LQ_THRESHOLD
    toks = [t.lower() for t in tokenize_ws(text)]
    f = {
        "n_stop": sum(t in _EN_STOP for t in toks),
        "n_uniq": len(set(toks)),
        "n_tokens": len(toks),
        "n_digit": len(_LQ_DIGIT.findall(text)),
        "n_punct": len(_LQ_PUNCT.findall(text)),
    }
    score = _LQ_BIAS + sum(_LQ_WEIGHTS[k] * v for k, v in f.items())
    return score, score >= _LQ_THRESHOLD


# --- URL canonicalization (the crawl-dedup normalization pass) -------------

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonical_url(url: str | None) -> str | None:
    """Normalize a URL for crawl deduplication: lowercase scheme + host,
    strip the scheme's default port, drop the fragment, drop ``utm_*``
    tracking params, sort the remaining query params (by their joined
    ``k=v`` string — the same total order the SQL twin's ``list_sort``
    uses), and strip one trailing path slash (keeping a bare ``/`` root).
    Pure kernel (pytest + twin law); applied per batch in ``map_batches``."""
    if url is None:
        return None
    from urllib.parse import urlsplit

    p = urlsplit(url.strip())
    scheme = p.scheme.lower()
    host = p.netloc.lower()
    if ":" in host:
        h, _, port = host.rpartition(":")
        if port == _DEFAULT_PORTS.get(scheme):
            host = h
    path = p.path
    if path.endswith("/") and len(path) > 1:
        path = path[:-1]
    params = sorted(
        kv for kv in p.query.split("&") if kv and not kv.startswith("utm_")
    )
    out = f"{scheme}://{host}{path}"
    if params:
        out += "?" + "&".join(params)
    return out
