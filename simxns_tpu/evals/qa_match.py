"""DPR-style answer-string matching.

Exact behavioral replication of the reference's hit labeling
(``SimANS/utils/dpr_utils.py:300-384``): it decides which retrieved passages
become positives in the mined training data, so any deviation changes the
training distribution (SURVEY.md Appendix A).

Pipeline: NFD-normalize -> regex tokenize (``[\\p{L}\\p{N}\\p{M}]+`` |
non-whitespace) -> uncased sliding-window subsequence match of each answer's
token list inside the passage's token list.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache
from typing import List, Sequence

import regex

_ALPHA_NUM = r"[\p{L}\p{N}\p{M}]+"
_NON_WS = r"[^\p{Z}\p{C}]"
_REGEXP = regex.compile(
    f"({_ALPHA_NUM})|({_NON_WS})",
    flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE,
)


def _normalize(text: str) -> str:
    return unicodedata.normalize("NFD", text)


class SimpleTokenizer:
    """Regex word tokenizer matching DPR's ``SimpleTokenizer`` output."""

    def tokenize(self, text: str) -> List[str]:
        return [m.group() for m in _REGEXP.finditer(text)]

    def words(self, text: str, uncased: bool = True) -> List[str]:
        toks = self.tokenize(text)
        return [t.lower() for t in toks] if uncased else toks


_TOKENIZER = SimpleTokenizer()


@lru_cache(maxsize=100_000)
def _answer_words(answer: str) -> tuple:
    return tuple(_TOKENIZER.words(_normalize(answer)))


def has_answer(answers: Sequence[str], text: str, match_type: str = "string") -> bool:
    """True if any answer appears as a token subsequence of ``text``.

    ``match_type='regex'`` searches the normalized text with each answer as a
    case-insensitive regex (the reference's curated-TREC path).
    """
    text = _normalize(text)
    if match_type == "string":
        words = _TOKENIZER.words(text)
        for answer in answers:
            asw = _answer_words(answer)
            n, m = len(words), len(asw)
            # REFERENCE QUIRK (dpr_utils.py:324-326), replicated: an
            # answer tokenizing to [] matches EVERY passage — the sliding
            # window `[] == text[i:i]` is True at i=0. Skipping it would
            # change the mined-positive distribution for noisy answer
            # lists containing empty/punctuation-only strings.
            if m == 0:
                return True
            for i in range(n - m + 1):
                if tuple(words[i : i + m]) == asw:
                    return True
        return False
    if match_type == "regex":
        for answer in answers:
            try:
                pat = regex.compile(
                    _normalize(answer),
                    flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE,
                )
            except Exception:
                continue
            if pat.search(text):
                return True
        return False
    raise ValueError(f"unknown match_type {match_type!r}")


def check_answer(
    answers: Sequence[str], passage_texts: Sequence[str], match_type: str = "string"
) -> List[bool]:
    """Hit list over ranked passages (``dpr_utils.py:check_answer``)."""
    return [has_answer(answers, t, match_type) for t in passage_texts]
