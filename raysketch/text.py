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
    non-whitespace; n_tokens = count of such runs.  Null texts count as
    empty (a trailing null otherwise crashes np.add.reduceat with a
    segment start == len(flat))."""
    toks = pc.split_pattern_regex(
        pc.fill_null(batch[text_col], ""), r"\s+")
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
    # distinct tokens per doc: vectorized via pandas drop_duplicates on
    # (doc_idx, token) -- no python-set loop
    if len(flat):
        import pandas as pd
        doc_idx = np.repeat(np.arange(len(seg_total)), seg_total)
        df = pd.DataFrame({"d": doc_idx, "t": np.asarray(flat)})
        df = df[df["t"] != ""].drop_duplicates()
        vc = df.groupby("d").size()
        uniq_counts = np.zeros(len(seg_total), dtype=np.int64)
        uniq_counts[vc.index.values] = vc.values
    else:
        uniq_counts = np.zeros(len(seg_total), dtype=np.int64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pc.utf8_length(batch[text_col]),
        "n_tokens": pa.array(n_tokens),
        "n_unique_tokens": pa.array(uniq_counts),
    })


# Unicode-whitespace class matching python str.split()/str.isspace():
# RE2's \s is ASCII-only, but Common-Crawl text is full of NBSP and other
# \p{Z} separators, so quality/langid tokenization must use the full set
# (\p{Z} covers Zs/Zl/Zp incl. NBSP/U+2028/U+2029; \x{85} NEL and
# \x{1C}-\x{1F} separators are White_Space too).  token_stats/BPE keep
# plain \s+ deliberately -- that rule is pinned 1:1 with their DuckDB
# oracles.
UNICODE_WS = r"[\s\p{Z}\x{85}\x{1C}-\x{1F}]"


def _doc_tokens(batch: pa.Table, text_col: str):
    """(flat lowered non-empty tokens, doc_idx per token, n_docs) --
    the shared vectorized tokenization for quality/langid.  Nulls count
    as empty documents."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(batch[text_col], "")),
        UNICODE_WS + "+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets)
    flat = toks.values
    seg_total = offsets[1:] - offsets[:-1]
    doc_idx = np.repeat(np.arange(len(seg_total)), seg_total)
    keep = np.asarray(pc.not_equal(flat, "")) if len(flat) else \
        np.zeros(0, dtype=bool)
    return flat.filter(pa.array(keep)) if len(flat) else flat, \
        doc_idx[keep] if len(flat) else doc_idx, len(seg_total)


def _per_doc_sum(values: np.ndarray, doc_idx: np.ndarray,
                 n_docs: int) -> np.ndarray:
    out = np.zeros(n_docs, dtype=np.float64)
    np.add.at(out, doc_idx, values)
    return out


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: length, mean token length, stopword
    ratio, alpha ratio, repetition ratio -- composite score in [0,1].
    Fully vectorized: RE2 char-class counts + flattened-token reductions
    (no per-document python loop)."""
    import pandas as pd

    n = len(batch)
    # fill nulls BEFORE the int64 cast: utf8_length(null) is null, and
    # np.asarray would cast the resulting NaN to an undefined int64
    text = pc.fill_null(batch[text_col], "")
    n_chars = np.asarray(pc.utf8_length(text), dtype=np.int64)
    flat, doc_idx, _ = _doc_tokens(batch, text_col)
    n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
    safe_tok = np.maximum(n_tokens, 1)

    tok_lens = np.asarray(pc.utf8_length(flat), dtype=np.float64) \
        if len(flat) else np.zeros(0)
    mean_tok_len = _per_doc_sum(tok_lens, doc_idx, n) / safe_tok

    all_stop = sorted(set().union(*_STOPWORDS.values()))
    is_stop = np.asarray(pc.is_in(flat, value_set=pa.array(all_stop))
                         ).astype(np.float64) if len(flat) else np.zeros(0)
    stop_ratio = _per_doc_sum(is_stop, doc_idx, n) / safe_tok

    # distinct tokens per doc (pandas drop_duplicates, C path)
    if len(flat):
        df = pd.DataFrame({"d": doc_idx, "t": np.asarray(flat)})
        vc = df.drop_duplicates().groupby("d").size()
        uniq = np.zeros(n, dtype=np.int64)
        uniq[vc.index.values] = vc.values
    else:
        uniq = np.zeros(n, dtype=np.int64)
    rep_ratio = np.where(n_tokens > 0, 1.0 - uniq / safe_tok, 0.0)

    # alpha-or-whitespace chars via RE2 unicode classes (matches
    # str.isalpha for letters; UNICODE_WS for str.isspace)
    alpha = np.asarray(pc.count_substring_regex(
        text, r"[\p{L}" + UNICODE_WS[1:-1] + "]"),
        dtype=np.float64)
    alpha_ratio = np.where(n_chars > 0, alpha / np.maximum(n_chars, 1), 0.0)
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
    """Language-ID actor: stopword profiles compiled to Arrow value sets
    once per actor (__init__, the stateful-stage pattern), scored per batch
    fully vectorized (flattened-token is_in per language + RE2 Han-class
    counts for zh; no per-document python loop)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.langs = list(_STOPWORDS)     # iteration order = tie order
        self.value_sets = {lang: pa.array(sorted(ws))
                           for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        flat, doc_idx, _ = _doc_tokens(batch, self.text_col)
        n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
        hits = np.zeros((len(self.langs), n), dtype=np.float64)
        for li, lang in enumerate(self.langs):
            m = np.asarray(pc.is_in(flat, value_set=self.value_sets[lang])
                           ).astype(np.float64) if len(flat) else np.zeros(0)
            hits[li] = _per_doc_sum(m, doc_idx, n)
        best = np.argmax(hits, axis=0)       # first max wins = dict order
        best_hits = hits[best, np.arange(n)]
        langs_arr = np.array(self.langs, dtype=object)[best]
        confs = best_hits / np.maximum(1, n_tokens)

        # zh override: CJK share of non-space chars > 0.2
        cjk = np.asarray(pc.count_substring_regex(
            batch[self.text_col], r"[\x{4E00}-\x{9FFF}]"),
            dtype=np.float64)
        n_chars = np.asarray(pc.utf8_length(batch[self.text_col]),
                             dtype=np.float64)
        n_spaces = np.asarray(pc.count_substring_regex(
            batch[self.text_col], r" "), dtype=np.float64)
        nonspace = np.maximum(1, n_chars - n_spaces)
        is_zh = (n_chars > 0) & (cjk / nonspace > 0.2)
        langs_arr = np.where(is_zh, "zh", langs_arr)
        confs = np.where(
            is_zh, np.minimum(1.0, cjk / np.maximum(1, n_tokens)), confs)
        return pa.table({
            self.id_col: batch[self.id_col],
            "pred_lang": pa.array(langs_arr.astype(str)),
            "confidence": pa.array(confs.astype(np.float64)),
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
                 id_col: str = "doc_id", kernel: str = "default") -> pa.Table:
    """Deterministic 64-bit content fingerprint of the normalized text
    (whitespace-collapsed, lowercased) -- rolling content hash usable as an
    exact-dedup key that ignores formatting differences.

    kernel="default": the engine's configured string hash (xxh3) --
    fastest, cross-compatible with the reference's XxHash3 anchor.
    kernel="md5": big-endian u64 of the first 8 md5 digest bytes, the
    value of ``('0x' || substr(md5(norm), 1, 16))::UBIGINT`` -- any SQL
    engine reproduces the fingerprint byte-for-byte (the same
    cross-engine contract as hash_sample's md5 selector)."""
    norm = pc.utf8_lower(
        pc.replace_substring_regex(batch[text_col], r"\s+", " "))
    if kernel == "md5":
        from .pipeline import _md5_u64
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        h = _md5_u64(norm)
    else:
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
