"""M7 — WordPiece tokenization (reference ``bert/tokenization.py`` semantics,
reconstructed from the public BERT release; SURVEY.md §2 M7).

Reimplements the two-phase FullTokenizer pipeline **with character offsets**
(the original discards them; we need offsets to map predicted labels back to
mention spans in the source turn text):

1. Basic tokenization — lowercase (lookup only; offsets index the ORIGINAL
   text), whitespace split, punctuation split (each punct char its own
   token), CJK codepoints isolated one-per-token (`_is_chinese_char` +
   ``_tokenize_chinese_chars`` semantics).
2. WordPiece — greedy longest-match-first against the vocab; continuation
   pieces carry the ``##`` prefix; a word with any unmatchable remainder
   becomes a single ``[UNK]`` covering the whole word
   (``WordpieceTokenizer.tokenize`` semantics, including the
   max_input_chars_per_word=200 guard).
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass

MAX_INPUT_CHARS_PER_WORD = 200

UNK_TOKEN = "[UNK]"
CLS_TOKEN = "[CLS]"
SEP_TOKEN = "[SEP]"
PAD_TOKEN = "[PAD]"


def is_cjk(cp: int) -> bool:
    """CJK Unified Ideograph ranges (reference ``_is_chinese_char``)."""
    return (
        (0x4E00 <= cp <= 0x9FFF)
        or (0x3400 <= cp <= 0x4DBF)
        or (0x20000 <= cp <= 0x2A6DF)
        or (0x2A700 <= cp <= 0x2B73F)
        or (0x2B740 <= cp <= 0x2B81F)
        or (0x2B820 <= cp <= 0x2CEAF)
        or (0xF900 <= cp <= 0xFAFF)
        or (0x2F800 <= cp <= 0x2FA1F)
    )


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


@dataclass(frozen=True)
class Token:
    piece: str  # vocab form (lowercased; "##"-prefixed for continuations)
    start: int  # char offsets into the ORIGINAL text
    end: int
    is_continuation: bool = False


def basic_tokenize_scalar(text: str) -> list[tuple[int, int]]:
    """Reference per-char implementation (kept as the parity oracle for the
    vectorized path below)."""
    spans: list[tuple[int, int]] = []
    start = None
    for i, ch in enumerate(text):
        if ch.isspace():
            if start is not None:
                spans.append((start, i))
                start = None
        elif _is_punct(ch) or is_cjk(ord(ch)):
            if start is not None:
                spans.append((start, i))
                start = None
            spans.append((i, i + 1))
        else:
            if start is None:
                start = i
    if start is not None:
        spans.append((start, len(text)))
    return spans


# per-process cache: rare (non-ASCII, non-CJK) codepoint -> (isspace, ispunct)
_RARE_CLASS: dict[int, tuple[bool, bool]] = {}


def _span_arrays(cps):
    """Codepoint array -> sorted (starts, ends) basic-token span arrays.

    Vectorized: char classes come from numpy range tests over the codepoint
    array (ASCII space/punct ranges match ``str.isspace``/``_is_punct``
    exactly; CJK from ``is_cjk`` ranges); the rare remaining codepoints fall
    back to the exact Python predicates through a process-lifetime cache.
    Tested equal to ``basic_tokenize_scalar`` on ASCII+CJK+unicode inputs."""
    import numpy as np

    space = ((cps >= 9) & (cps <= 13)) | (cps == 32) | ((cps >= 28) & (cps <= 31))
    punct = (
        ((cps >= 33) & (cps <= 47))
        | ((cps >= 58) & (cps <= 64))
        | ((cps >= 91) & (cps <= 96))
        | ((cps >= 123) & (cps <= 126))
    )
    cjk = (
        ((cps >= 0x4E00) & (cps <= 0x9FFF))
        | ((cps >= 0x3400) & (cps <= 0x4DBF))
        | ((cps >= 0x20000) & (cps <= 0x2A6DF))
        | ((cps >= 0x2A700) & (cps <= 0x2B81F))
        | ((cps >= 0x2B820) & (cps <= 0x2CEAF))
        | ((cps >= 0xF900) & (cps <= 0xFAFF))
        | ((cps >= 0x2F800) & (cps <= 0x2FA1F))
    )
    rare = (cps >= 128) & ~cjk
    if rare.any():
        for i in np.nonzero(rare)[0]:
            cp = int(cps[i])
            cls = _RARE_CLASS.get(cp)
            if cls is None:
                ch = chr(cp)
                cls = (ch.isspace(), _is_punct(ch))
                _RARE_CLASS[cp] = cls
            if cls[0]:
                space[i] = True
            elif cls[1]:
                punct[i] = True
    single = punct | cjk
    word = ~(space | single)
    idx = np.nonzero(word)[0]
    if len(idx):
        brk = np.nonzero(np.diff(idx) > 1)[0]
        rs = np.concatenate([[idx[0]], idx[brk + 1]])
        re_ = np.concatenate([idx[brk], [idx[-1]]]) + 1
    else:
        rs = re_ = np.empty(0, dtype=np.int64)
    singles = np.nonzero(single)[0]
    starts = np.concatenate([rs, singles])
    ends = np.concatenate([re_, singles + 1])
    order = np.argsort(starts, kind="stable")
    return starts[order], ends[order]


def basic_tokenize(text: str) -> list[tuple[int, int]]:
    """Whitespace + punctuation + CJK-isolation split; returns (start, end)
    spans over the original text (see ``_span_arrays``)."""
    import numpy as np

    if len(text) == 0:
        return []
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    starts, ends = _span_arrays(cps)
    return list(zip(starts.tolist(), ends.tolist()))


def wordpiece_word(word: str, vocab: set[str], offset: int) -> list[Token]:
    """Greedy longest-match-first split of one basic token."""
    if len(word) > MAX_INPUT_CHARS_PER_WORD:
        return [Token(UNK_TOKEN, offset, offset + len(word))]
    pieces: list[Token] = []
    pos = 0
    while pos < len(word):
        end = len(word)
        cur = None
        while pos < end:
            sub = word[pos:end]
            if pos > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [Token(UNK_TOKEN, offset, offset + len(word))]
        pieces.append(Token(cur, offset + pos, offset + end, is_continuation=pos > 0))
        pos = end
    return pieces


def tokenize(
    text: str,
    vocab: set[str],
    do_lower_case: bool = True,
    cache: dict | None = None,
) -> list[Token]:
    """FullTokenizer.tokenize with offsets (M7).

    ``cache`` (optional, actor-lifetime) memoizes the greedy wordpiece split
    per distinct lowercased word as relative pieces — corpus vocabulary is
    Zipfian, so after warmup tokenization is a dict hit + offset rebase per
    word instead of the greedy longest-match loop."""
    out: list[Token] = []
    for s, e in basic_tokenize(text):
        word = text[s:e]
        if do_lower_case:
            word = word.lower()
        if cache is None:
            out.extend(wordpiece_word(word, vocab, s))
            continue
        hit = cache.get(word)
        if hit is None:
            hit = tuple(
                (t.piece, t.start, t.end, t.is_continuation)
                for t in wordpiece_word(word, vocab, 0)
            )
            cache[word] = hit
        out.extend(Token(p, s + rs, s + re, c) for p, rs, re, c in hit)
    return out


def tokenize_batch(
    texts: list[str],
    vocab: set[str],
    do_lower_case: bool = True,
    cache: dict | None = None,
) -> list[list[Token]]:
    """``[tokenize(t) for t in texts]``, with ONE numpy pass for the basic
    split (tested equal).

    Per-text ``basic_tokenize`` pays ~20 numpy-call fixed overheads on a
    ~50-char array — ~100us/text, the single hottest line of the BERT tagger
    profile (0.5s of a 1.6s batch).  Batch mode joins the whole batch with
    ``"\\n"`` (whitespace, so no token run crosses a text boundary), runs the
    char-class kernels once over the joined codepoints, and assigns spans
    back to texts via one searchsorted.  The remaining per-WORD loop (memo
    lookup + Token build) is shared with ``tokenize``."""
    import numpy as np

    if not texts:
        return []
    joined = "\n".join(texts)
    out: list[list[Token]] = [[] for _ in texts]
    if not joined:
        return out
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    starts, ends = _span_arrays(cps)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    text_starts = np.concatenate(([0], np.cumsum(lens + 1)[:-1]))
    owner = np.searchsorted(text_starts, starts, side="right") - 1
    local = starts - text_starts[owner]
    if cache is None:
        cache = {}
    for o, gs, ge, ls in zip(
        owner.tolist(), starts.tolist(), ends.tolist(), local.tolist()
    ):
        word = joined[gs:ge]
        if do_lower_case:
            word = word.lower()
        hit = cache.get(word)
        if hit is None:
            hit = tuple(
                (t.piece, t.start, t.end, t.is_continuation)
                for t in wordpiece_word(word, vocab, 0)
            )
            cache[word] = hit
        out[o].extend(Token(p, ls + rs, ls + re, c) for p, rs, re, c in hit)
    return out


def build_wordpiece_vocab(corpus_words: list[str], max_whole_word_len: int = 6) -> set[str]:
    """Deterministic vocab: all single chars (plus ``##`` continuations) so
    tokenization never degenerates to [UNK], and whole words up to
    ``max_whole_word_len`` chars; longer words therefore split into pieces,
    exercising the ``##`` path (stand-in for a learned BPE inventory)."""
    import string

    vocab = {UNK_TOKEN, CLS_TOKEN, SEP_TOKEN, PAD_TOKEN}
    vocab.update(string.punctuation)
    for w in corpus_words:
        w = w.lower()
        for ch in w:
            vocab.add(ch)
            vocab.add("##" + ch)
        if len(w) <= max_whole_word_len:
            vocab.add(w)
        # common prefixes/suffix pieces so long words split into few pieces
        if len(w) > max_whole_word_len:
            vocab.add(w[:4])
            vocab.add("##" + w[4:]) if len(w) - 4 <= 8 else None
    return vocab
