"""Deterministic tokenizer + sentence/paragraph segmentation.

Replaces the reference's external Frog tokenizer (reference
src/tscan.cxx:3131-3231 streams text to a Frog server over TCP) with a
self-contained, reproducible rule tokenizer, per SURVEY.md §7.0: the
sandbox has no NLP services and the north rule demands determinism.

Also reproduces the reference's input normalization (S1,
src/tscan.cxx:3150-3199): strip BOM, drop ``###`` comment lines and
``<<< >>>`` comment blocks, rewrite ``[ ] { }`` to parentheses.
"""

from __future__ import annotations

import re

_BOM = "﻿"
_COMMENT_LINE = re.compile(r"^\s*###")
_BLOCK_OPEN = "<<<"
_BLOCK_CLOSE = ">>>"
_BRACKETS = str.maketrans({"[": "(", "]": ")", "{": "(", "}": ")"})

# token = word (letters/digits/internal '-. apostrophes) | single punctuation char
_TOKEN_RE = re.compile(r"[^\W_]+(?:[-'’.][^\W_]+)*|[^\w\s]", re.UNICODE)

_SENT_END = {".", "!", "?"}
_PUNCT_RE = re.compile(r"^[^\w\s]+$", re.UNICODE)


def normalize_text(text: str) -> str:
    """Input normalizer (reference S1 semantics, re-expressed)."""
    if text.startswith(_BOM):
        text = text[len(_BOM) :]
    out_lines = []
    in_block = False
    for line in text.split("\n"):
        stripped = line.strip()
        if _COMMENT_LINE.match(stripped):
            continue
        if stripped.startswith(_BLOCK_OPEN):
            in_block = True
        if not in_block:
            out_lines.append(line.translate(_BRACKETS))
        if stripped.endswith(_BLOCK_CLOSE):
            in_block = False
    return "\n".join(out_lines)


def tokenize(text: str) -> list[str]:
    """Split text into word and punctuation tokens. Deterministic, no state."""
    return _TOKEN_RE.findall(text)


def is_punct(token: str) -> bool:
    return bool(_PUNCT_RE.match(token))


def split_sentences(tokens: list[str]) -> list[list[str]]:
    """Greedy sentence segmentation: a sentence ends after `.`, `!` or `?`
    (plus any immediately following closing quotes/brackets).  A text with
    no terminal punctuation is one sentence.
    """
    sents: list[list[str]] = []
    cur: list[str] = []
    for tok in tokens:
        cur.append(tok)
        if tok in _SENT_END:
            sents.append(cur)
            cur = []
    if cur:
        sents.append(cur)
    return sents


def split_paragraphs(text: str) -> list[str]:
    """Paragraphs are blank-line separated (reference reads line-wise and
    treats empty lines as paragraph breaks)."""
    paras = re.split(r"\n\s*\n", text)
    return [p for p in (p.strip() for p in paras) if p]


def segment(text: str) -> list[list[list[str]]]:
    """text -> paragraphs -> sentences -> tokens (the reference's
    doc/par/sent/word containment hierarchy, stats.h:30-108)."""
    return [split_sentences(tokenize(p)) for p in split_paragraphs(normalize_text(text))]
