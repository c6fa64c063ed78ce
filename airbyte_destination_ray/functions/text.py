"""Vectorized text-analysis kernels for web-scale training-data pipelines.

All functions take a ``pyarrow`` string array (or ChunkedArray) and return
Arrow arrays, computed with ``pyarrow.compute`` C++ kernels — no Python
per-row loops.  They are used two ways:

- as standalone ``map_batches`` operators over the ``documents`` table
  (language id, quality scoring, token counting, fingerprinting), and
- as the enrichment stage of the CDC ingest pipeline (each upserted page is
  annotated in-flight, the realistic per-byte CPU profile of a
  Common-Crawl-style ingest).

The reference engine has no text analytics (it is connector plumbing); these
operators are the additive training-data surface mandated by the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import stable_hash_array

# --------------------------------------------------------------------------
# token counting
# --------------------------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, contractions, digits runs, punctuation
# runs — the GPT-2 style split pattern reduced to RE2-compatible syntax.
BPE_ISH_PATTERN = r"'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
WHITESPACE_PATTERN = r"\S+"


def token_count(texts, pattern: str = WHITESPACE_PATTERN) -> pa.Array:
    """Number of pattern matches per row (null → null). Vectorized RE2."""
    return pc.count_substring_regex(texts, pattern)


def bpe_ish_token_count(texts) -> pa.Array:
    """Token count under the BPE-style pre-tokenizer split."""
    return pc.count_substring_regex(texts, BPE_ISH_PATTERN)


# --------------------------------------------------------------------------
# byte-level feature engine
# --------------------------------------------------------------------------
# RE2 char-class counting via pc.count_substring_regex runs at ~40 MB/s per
# pattern (measured); the byte engine below computes every char-class count in
# a handful of numpy passes over the raw UTF-8 buffer at memory-bandwidth
# speed.  Multi-word RE2 alternations (stopwords) stay on pyarrow — those are
# cheap (~250 MB/s) and not expressible as byte masks.

_EN_STOPWORDS = r"\b(the|and|of|to|in|is|that|for|with|was|as|on|are|this)\b"


def _utf8_view(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data_bytes, starts, ends) zero-ish-copy view of a string array.

    Null rows become empty rows (counts 0); callers re-apply null masks.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    a = pc.fill_null(texts, "").cast(pa.large_string())
    offsets_buf, data_buf = a.buffers()[1], a.buffers()[2]
    offsets = np.frombuffer(offsets_buf, dtype=np.int64)[
        a.offset : a.offset + len(a) + 1
    ]
    data = np.frombuffer(data_buf, dtype=np.uint8)
    return data, offsets[:-1], offsets[1:]


def _segment_counts(mask: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Per-row count of True in ``mask`` via ``np.add.reduceat`` (int32 —
    measured ~17× faster than an int64 cumsum on first touch).

    Rows are contiguous (``ends[i] == starts[i+1]``), so reduceat over
    ``starts`` sums each row's span; empty rows (reduceat yields the element
    at the repeated index, not 0) are zeroed afterwards.
    """
    if len(mask) == 0 or len(starts) == 0:
        return np.zeros(len(starts), dtype=np.int64)
    # rows starting at/after the end of data (trailing empties) must be
    # EXCLUDED from the index list, not clamped — a clamped index would
    # truncate the preceding row's segment
    valid = starts < len(mask)
    out = np.zeros(len(starts), dtype=np.int64)
    idx = starts[valid]
    if len(idx):
        out[valid] = np.add.reduceat(mask.astype(np.int32), idx)
    # reduceat yields the single element at a repeated index (empty row in
    # the middle); zero all empty rows explicitly
    out[starts == ends] = 0
    return out


def _word_starts_mask(data: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """True at bytes that begin a whitespace-delimited token."""
    is_space = (data == 0x20) | ((data >= 0x09) & (data <= 0x0D))
    nonspace = ~is_space
    word_start = nonspace.copy()
    word_start[1:] &= is_space[:-1]
    # row boundaries: a token at the start of a row is a start regardless of
    # the last byte of the previous row
    inbounds = starts[starts < len(data)]
    word_start[inbounds] = nonspace[inbounds]
    return word_start


def _ratio_np(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    return np.divide(
        num, den, out=np.zeros(len(num), dtype=np.float64), where=den > 0
    )


def _apply_null_mask(arr: pa.Array, texts) -> pa.Array:
    if hasattr(texts, "null_count") and texts.null_count:
        t = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        return pc.if_else(t.is_valid(), arr, pa.scalar(None, type=arr.type))
    return arr


def quality_features(texts) -> dict[str, pa.Array]:
    """Per-document quality feature columns (all float64/int64, null-safe).

    Features follow the standard web-text heuristics (Gopher/C4-style rules):
    length, word stats, symbol/digit/upper ratios, stopword density.
    Char-class counts are ASCII-byte-exact; ``n_chars`` is true UTF-8 length.
    """
    data, starts, ends = _utf8_view(texts)
    is_alpha = ((data | 0x20) >= 0x61) & ((data | 0x20) <= 0x7A)
    is_digit = (data >= 0x30) & (data <= 0x39)
    is_upper = (data >= 0x41) & (data <= 0x5A)
    is_space = (data == 0x20) | ((data >= 0x09) & (data <= 0x0D))
    is_cont = (data >= 0x80) & (data <= 0xBF)  # UTF-8 continuation bytes

    n_bytes = (ends - starts).astype(np.int64)
    n_chars = n_bytes - _segment_counts(is_cont, starts, ends)
    n_alpha = _segment_counts(is_alpha, starts, ends)
    n_digit = _segment_counts(is_digit, starts, ends)
    n_upper = _segment_counts(is_upper, starts, ends)
    n_space = _segment_counts(is_space, starts, ends)
    n_words = _segment_counts(_word_starts_mask(data, starts), starts, ends)
    n_punct = n_chars - n_alpha - n_digit - n_space

    n_stop = (
        pc.count_substring_regex(pc.utf8_lower(texts), _EN_STOPWORDS)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    n_chars_f = n_chars.astype(np.float64)
    n_words_f = n_words.astype(np.float64)
    out = {
        "n_chars": pa.array(n_chars, type=pa.int64()),
        "n_words": pa.array(n_words, type=pa.int64()),
        "mean_word_len": pa.array(_ratio_np(n_alpha.astype(np.float64), n_words_f)),
        "alpha_ratio": pa.array(_ratio_np(n_alpha.astype(np.float64), n_chars_f)),
        "digit_ratio": pa.array(_ratio_np(n_digit.astype(np.float64), n_chars_f)),
        "upper_ratio": pa.array(_ratio_np(n_upper.astype(np.float64), n_chars_f)),
        "punct_ratio": pa.array(
            _ratio_np(np.maximum(n_punct, 0).astype(np.float64), n_chars_f)
        ),
        "stopword_ratio": pa.array(
            _ratio_np(n_stop.astype(np.float64), n_words_f)
        ),
    }
    return {k: _apply_null_mask(v, texts) for k, v in out.items()}


def quality_subscores(texts) -> dict[str, pa.Array]:
    """Integer quality subscores (``qf_chars, qf_words, qf_alpha, qf_digit,
    qf_stop``) — the SQL-expressible decomposition of the quality heuristic
    (each count maps 1:1 onto a DuckDB ``length``/``regexp_extract_all``
    expression, so a filter on integer ratios of these is oracle-checkable
    bit-for-bit, with no float rounding in the predicate)."""
    data, starts, ends = _utf8_view(texts)
    is_alpha = ((data | 0x20) >= 0x61) & ((data | 0x20) <= 0x7A)
    is_digit = (data >= 0x30) & (data <= 0x39)
    is_cont = (data >= 0x80) & (data <= 0xBF)
    n_bytes = (ends - starts).astype(np.int64)
    n_chars = n_bytes - _segment_counts(is_cont, starts, ends)
    n_stop = (
        pc.fill_null(
            pc.count_substring_regex(pc.utf8_lower(texts), _EN_STOPWORDS), 0
        )
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    out = {
        "qf_chars": pa.array(n_chars, type=pa.int64()),
        "qf_words": pa.array(
            _segment_counts(_word_starts_mask(data, starts), starts, ends),
            type=pa.int64(),
        ),
        "qf_alpha": pa.array(
            _segment_counts(is_alpha, starts, ends), type=pa.int64()
        ),
        "qf_digit": pa.array(
            _segment_counts(is_digit, starts, ends), type=pa.int64()
        ),
        "qf_stop": pa.array(n_stop, type=pa.int64()),
    }
    return {k: _apply_null_mask(v, texts) for k, v in out.items()}


def quality_score(texts, features: dict[str, pa.Array] | None = None) -> pa.Array:
    """Scalar quality score in [0, 1] from the heuristic features.

    Deterministic weighted rule — a document scores high when it has a sane
    length, mostly alphabetic characters, moderate digit density and a
    natural-language stopword rate.  Pass precomputed ``features`` to avoid
    recomputing them.
    """
    f = features if features is not None else quality_features(texts)

    def np_of(name):
        return pc.fill_null(f[name], 0).to_numpy(zero_copy_only=False).astype(np.float64)

    n_words = np_of("n_words")
    length_ok = ((n_words >= 5.0) & (n_words <= 100000.0)).astype(np.float64)
    alpha_term = np.minimum(np_of("alpha_ratio") * 1.25, 1.0)
    digit_term = 1.0 - np.minimum(np_of("digit_ratio") * 2.0, 1.0)
    stop_term = np.minimum(np_of("stopword_ratio") * 4.0, 1.0)
    score = 0.4 * alpha_term + 0.2 * digit_term + 0.2 * stop_term + 0.2 * length_ok
    return _apply_null_mask(pa.array(np.round(score, 6)), texts)


# --------------------------------------------------------------------------
# language identification (n-gram / stopword heuristic)
# --------------------------------------------------------------------------

# Highly discriminative function words per language.  One RE2 pass per
# language per batch; argmax of normalized hit counts decides.
_LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|is|that|with|for|you|have|this)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|für|auf|sie)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|que|dans|vous|avec|pas)\b",
    "es": r"\b(el|los|las|es|una|para|que|con|por|del|su|está)\b",
    "it": r"\b(il|la|che|di|non|per|una|sono|con|del|questo)\b",
    "pt": r"\b(o|os|as|é|uma|para|que|com|não|do|da|em)\b",
    "nl": r"\b(de|het|een|en|van|is|dat|niet|met|voor|zijn)\b",
}

def lang_id(texts, *, unknown_threshold: float = 0.01) -> pa.Array:
    """Heuristic language id: ``zh``/``ru`` by script density (UTF-8 lead-byte
    masks), else stopword-density argmax over ``_LANG_MARKERS``; ``und`` when
    nothing scores above the threshold."""
    data, starts, ends = _utf8_view(texts)
    n_bytes = (ends - starts).astype(np.float64)
    is_cont = (data >= 0x80) & (data <= 0xBF)
    n_chars = np.maximum(n_bytes - _segment_counts(is_cont, starts, ends), 1.0)
    n_words = np.maximum(
        _segment_counts(_word_starts_mask(data, starts), starts, ends), 1
    ).astype(np.float64)

    lower = pc.utf8_lower(texts)
    langs = list(_LANG_MARKERS)
    scores = np.stack(
        [
            pc.fill_null(pc.count_substring_regex(lower, pat), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            / n_words
            for pat in _LANG_MARKERS.values()
        ]
    )
    best_idx = scores.argmax(axis=0)
    best_score = scores.max(axis=0)
    out = np.array(langs, dtype=object)[best_idx]
    out[best_score < unknown_threshold] = "und"

    # script density from UTF-8 lead bytes: CJK (mostly E4-E9 three-byte
    # leads), Cyrillic (D0-D1 two-byte leads)
    cjk = _segment_counts((data >= 0xE4) & (data <= 0xE9), starts, ends) / n_chars
    cyr = _segment_counts((data >= 0xD0) & (data <= 0xD1), starts, ends) / n_chars
    out[cjk > 0.05] = "zh"
    out[cyr > 0.05] = "ru"

    return _apply_null_mask(pa.array(out, type=pa.string()), texts)


# --------------------------------------------------------------------------
# fingerprinting
# --------------------------------------------------------------------------


def normalize_text(texts) -> pa.Array:
    """Canonical form for content fingerprints: lowercase, collapse all
    whitespace runs to single spaces, strip."""
    lowered = pc.utf8_lower(texts)
    collapsed = pc.replace_substring_regex(lowered, r"\s+", " ")
    return pc.utf8_trim_whitespace(collapsed)


def content_fingerprint(texts, *, normalize: bool = False) -> pa.Array:
    """64-bit stable content hash (document fingerprint / exact-dup key).

    Default hashes the exact bytes — the right key for the CDC engine's
    byte-identical-text invariant.  ``normalize=True`` canonicalizes first
    (case/whitespace-insensitive near-exact dedup).
    """
    source = normalize_text(texts) if normalize else texts
    h = stable_hash_array(source)
    return _apply_null_mask(pa.array(h, type=pa.uint64()), texts)


def repetition_features(texts) -> dict[str, pa.Array]:
    """Gopher-style repetition signals per document: line count, distinct
    line count, duplicate-line fraction.  High duplicate-line fractions are
    the classic boilerplate/spam signature (navigation bars, scraped
    listings) in web-text filtering.

    Vectorized: one Arrow ``split_pattern`` on newline, line hashes via the
    stable hasher, per-document distinct counts from a single lexsort over
    (doc, hash) — no Python per-row work.  Both counts are SQL-expressible
    (``string_split`` + ``list_distinct``), so the operator is
    hash-checkable against a DuckDB oracle."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lines = pc.split_pattern(pc.fill_null(texts, ""), "\n")
    n_lines = pc.list_value_length(lines).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    flat = lines.flatten()
    h = stable_hash_array(flat)
    row_ids = np.repeat(np.arange(len(n_lines), dtype=np.int64), n_lines)
    order = np.lexsort((h, row_ids))
    rs, hs = row_ids[order], h[order]
    new = np.ones(len(rs), dtype=bool)
    if len(rs) > 1:
        new[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
    n_distinct = np.zeros(len(n_lines), dtype=np.int64)
    np.add.at(n_distinct, rs[new], 1)
    dup_frac = _ratio_np(
        (n_lines - n_distinct).astype(np.float64), n_lines.astype(np.float64)
    )
    out = {
        "n_lines": pa.array(n_lines, type=pa.int64()),
        "n_distinct_lines": pa.array(n_distinct, type=pa.int64()),
        "dup_line_frac": pa.array(dup_frac, type=pa.float64()),
    }
    return {k: _apply_null_mask(v, texts) for k, v in out.items()}


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# RE2-compatible patterns, applied in this order (later patterns see the
# earlier replacements — the order is part of the contract and of the SQL
# oracle).  All are deliberately conservative/precision-oriented; a real
# deployment swaps in its own pattern pack.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d[\d\-\s]{7,}\d", "[PHONE]"),
)


def redact_pii(texts) -> dict[str, pa.Array]:
    """Redact PII-shaped spans (emails, IPv4 addresses, international-format
    phone numbers) and count matches per class.

    Counts are taken on the ORIGINAL text; replacement is sequential in
    :data:`PII_PATTERNS` order.  Vectorized RE2 throughout
    (``count_substring_regex`` / ``replace_substring_regex``), and every
    pattern is DuckDB-compatible, so the whole stage is hash-checkable
    against a nested ``regexp_replace(..., 'g')`` oracle."""
    out: dict[str, pa.Array] = {}
    redacted = texts
    for name, pattern, token in PII_PATTERNS:
        out[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(texts, pattern), pa.int64()
        )
        redacted = pc.replace_substring_regex(redacted, pattern, token)
    out["text_redacted"] = redacted
    return out


# --------------------------------------------------------------------------
# composite enrichment (the CDC in-flight annotator)
# --------------------------------------------------------------------------


def _run_starts(mask: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """True at positions that begin a maximal run of True (per row)."""
    rs = mask.copy()
    rs[1:] &= ~mask[:-1]
    inbounds = starts[starts < len(mask)]
    rs[inbounds] = mask[inbounds]
    return rs


def fast_token_count(texts) -> pa.Array:
    """BPE-ish token count via byte-run analysis (no regex): one token per
    maximal run of letters, of digits, and of non-alphanumeric-non-space
    bytes.  Tracks :data:`BPE_ISH_PATTERN` closely at memory speed."""
    data, starts, ends = _utf8_view(texts)
    is_alpha = ((data | 0x20) >= 0x61) & ((data | 0x20) <= 0x7A) | (data >= 0x80)
    is_digit = (data >= 0x30) & (data <= 0x39)
    is_space = (data == 0x20) | ((data >= 0x09) & (data <= 0x0D))
    is_punct = ~(is_alpha | is_digit | is_space)
    n = (
        _segment_counts(_run_starts(is_alpha, starts), starts, ends)
        + _segment_counts(_run_starts(is_digit, starts), starts, ends)
        + _segment_counts(_run_starts(is_punct, starts), starts, ends)
    )
    return _apply_null_mask(pa.array(n, type=pa.int64()), texts)


def fast_word_count(texts) -> pa.Array:
    """RE2-``\\S+`` word count at memory speed: one word per maximal run
    of non-space bytes.  The space set is EXACTLY RE2's ASCII ``\\s`` =
    ``[\\t\\n\\f\\r ]`` — note NO ``\\v`` (0x0B), which RE2 treats as
    non-space — so this is byte-for-byte equal to
    ``pc.count_substring_regex(texts, r"\\S+")`` (pinned in tests) at
    ~5× the char-class regex throughput."""
    data, starts, ends = _utf8_view(texts)
    is_space = (
        (data == 0x20)
        | (data == 0x09)
        | (data == 0x0A)
        | (data == 0x0C)
        | (data == 0x0D)
    )
    n = _segment_counts(_run_starts(~is_space, starts), starts, ends)
    return _apply_null_mask(pa.array(n, type=pa.int64()), texts)


def annotate(texts, *, lang_prefix_chars: int = 256) -> dict[str, pa.Array]:
    """Fused annotator: ``lang_id, quality, n_tokens, fingerprint`` in one
    pass set with shared byte masks — the ingest-hot-path version of calling
    the individual kernels (which would redo the masks per kernel).

    Language id runs on a bounded prefix of each document (the standard
    langid trick — accuracy is insensitive to length beyond a few hundred
    chars, cost is not).
    """
    data, starts, ends = _utf8_view(texts)
    folded = data | 0x20
    is_alpha = ((folded >= 0x61) & (folded <= 0x7A)) | (data >= 0x80)
    is_digit = (data >= 0x30) & (data <= 0x39)
    is_space = (data == 0x20) | ((data >= 0x09) & (data <= 0x0D))
    is_cont = (data >= 0x80) & (data <= 0xBF)
    is_punct = ~(is_alpha | is_digit | is_space)

    n_bytes = (ends - starts).astype(np.int64)
    n_chars = n_bytes - _segment_counts(is_cont, starts, ends)
    n_alpha = _segment_counts(is_alpha, starts, ends)
    n_digit = _segment_counts(is_digit, starts, ends)
    word_mask = is_alpha | is_digit | is_punct
    n_words = _segment_counts(_run_starts(word_mask, starts), starts, ends)
    n_tokens = (
        _segment_counts(_run_starts(is_alpha, starts), starts, ends)
        + _segment_counts(_run_starts(is_digit, starts), starts, ends)
        + _segment_counts(_run_starts(is_punct, starts), starts, ends)
    )

    lower = pc.utf8_lower(texts)
    n_stop = (
        pc.fill_null(pc.count_substring_regex(lower, _EN_STOPWORDS), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )

    # quality score (same rule as quality_score())
    n_chars_f = np.maximum(n_chars, 1).astype(np.float64)
    n_words_f = n_words.astype(np.float64)
    length_ok = ((n_words_f >= 5.0) & (n_words_f <= 100000.0)).astype(np.float64)
    alpha_term = np.minimum(_ratio_np(n_alpha.astype(np.float64), n_chars_f) * 1.25, 1.0)
    digit_term = 1.0 - np.minimum(
        _ratio_np(n_digit.astype(np.float64), n_chars_f) * 2.0, 1.0
    )
    stop_term = np.minimum(
        _ratio_np(n_stop.astype(np.float64), np.maximum(n_words_f, 1.0)) * 4.0, 1.0
    )
    score = np.round(
        0.4 * alpha_term + 0.2 * digit_term + 0.2 * stop_term + 0.2 * length_ok, 6
    )

    prefix = pc.utf8_slice_codeunits(pc.fill_null(texts, ""), 0, lang_prefix_chars)
    out = {
        "lang_id": lang_id(prefix),
        "quality": pa.array(score),
        "n_tokens": pa.array(n_tokens, type=pa.int64()),
        "fingerprint": pa.array(stable_hash_array(texts), type=pa.uint64()),
    }
    return {k: _apply_null_mask(v, texts) for k, v in out.items()}


def enrich_text_columns(
    batch: pa.Table, text_col: str = "text", *, lang_prefix_chars: int = 256
) -> pa.Table:
    """Append the standard annotation columns to a batch:
    ``lang_id, quality, n_tokens, fingerprint``.  Null text → null feature."""
    cols = annotate(batch.column(text_col), lang_prefix_chars=lang_prefix_chars)
    for name, arr in cols.items():
        batch = batch.append_column(name, arr)
    return batch
