"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language identification, document fingerprinting.

All stages are vectorized over Arrow batches; the language-ID stage is a
stateful actor (profiles built once per actor in __init__).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_strings
from .util import pool

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "por"},
}


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + distinct token count + char count.

    Token rule (pinned for the SQL oracle): tokens are maximal runs of
    non-whitespace; n_tokens = count of such runs."""
    toks = pc.split_pattern_regex(batch[text_col], r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets)
    flat = toks.values
    empty_mask = np.asarray(pc.equal(flat, "")).astype(np.int64)
    seg_total = offsets[1:] - offsets[:-1]
    if len(flat):
        seg_empty = np.add.reduceat(empty_mask, offsets[:-1])
        seg_empty[seg_total == 0] = 0  # reduceat quirk on empty segments
    else:
        seg_empty = np.zeros(len(seg_total), dtype=np.int64)
    n_tokens = seg_total - seg_empty
    # distinct tokens: no arrow kernel -> python-set per doc (cold path)
    pylists = toks.to_pylist()
    uniq_counts = np.array(
        [len({w for w in ws if w}) for ws in pylists], dtype=np.int64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pc.utf8_length(batch[text_col]),
        "n_tokens": pa.array(n_tokens),
        "n_unique_tokens": pa.array(uniq_counts),
    })


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: length, mean token length, stopword
    ratio, alpha ratio, repetition ratio -- composite score in [0,1]."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, np.int64)
    n_tokens = np.zeros(n, np.int64)
    mean_tok_len = np.zeros(n, np.float64)
    stop_ratio = np.zeros(n, np.float64)
    alpha_ratio = np.zeros(n, np.float64)
    rep_ratio = np.zeros(n, np.float64)
    all_stop = set().union(*_STOPWORDS.values())
    for i, t in enumerate(texts):
        n_chars[i] = len(t)
        toks = t.lower().split()
        n_tokens[i] = len(toks)
        if toks:
            mean_tok_len[i] = sum(map(len, toks)) / len(toks)
            stop_ratio[i] = sum(w in all_stop for w in toks) / len(toks)
            rep_ratio[i] = 1.0 - len(set(toks)) / len(toks)
        if t:
            alpha_ratio[i] = sum(c.isalpha() or c.isspace() for c in t) / len(t)
    length_ok = np.clip(n_tokens / 20.0, 0, 1)
    score = (0.3 * length_ok + 0.3 * alpha_ratio
             + 0.2 * (1 - rep_ratio) + 0.2 * np.clip(stop_ratio * 5, 0, 1))
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars), "n_tokens": pa.array(n_tokens),
        "mean_token_len": pa.array(mean_tok_len),
        "stopword_ratio": pa.array(stop_ratio),
        "alpha_ratio": pa.array(alpha_ratio),
        "repetition_ratio": pa.array(rep_ratio),
        "quality_score": pa.array(score),
    })


class LangId:
    """Language-ID actor: profiles compiled once per actor (__init__, the
    stateful-stage pattern), scored per batch.  Heuristic: stopword hit
    rates per language + CJK codepoint share for zh."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.profiles = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        langs = []
        confs = []
        for t in texts:
            toks = t.lower().split()
            cjk = sum(1 for c in t if "一" <= c <= "鿿")
            if t and cjk / max(1, len(t.replace(" ", ""))) > 0.2:
                langs.append("zh")
                confs.append(min(1.0, cjk / max(1, len(toks) or 1)))
                continue
            best, best_hits = "en", -1.0
            for lang, prof in self.profiles.items():
                hits = sum(w in prof for w in toks)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best)
            confs.append(best_hits / max(1, len(toks)))
        return pa.table({
            self.id_col: batch[self.id_col],
            "pred_lang": pa.array(langs),
            "confidence": pa.array(np.array(confs, dtype=np.float64)),
        })


# GPT-2-style pre-tokenizer pattern, RE2-compatible (no lookahead, so the
# trailing-whitespace rule collapses to \s+): contractions | letter runs |
# digit runs | punctuation runs | whitespace runs.  Both pyarrow and DuckDB
# use RE2, so the SAME pattern string drives the vectorized kernel and the
# SQL oracle.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish token counts: non-overlapping matches of BPE_PATTERN, fully
    vectorized (pc.count_substring_regex -- no python loop)."""
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pc.utf8_length(batch[text_col]),
        "n_bpe_tokens": pc.count_substring_regex(batch[text_col],
                                                 BPE_PATTERN),
    })


def fingerprints(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """Deterministic 64-bit content fingerprint of the normalized text
    (whitespace-collapsed, lowercased) -- rolling content hash usable as an
    exact-dedup key that ignores formatting differences."""
    norm = pc.utf8_lower(
        pc.replace_substring_regex(batch[text_col], r"\s+", " "))
    h = hash_strings(norm)
    return pa.table({
        id_col: batch[id_col],
        "fingerprint": pa.array(h, pa.uint64()),
    })


def language_id(ds, text_col: str = "text", id_col: str = "doc_id",
                concurrency: int = 4):
    return ds.map_batches(
        LangId, batch_format="pyarrow",
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        concurrency=pool(concurrency))
