"""Text analysis operators: normalization, tokenization, n-gram shingling,
statistics/quality scoring, language ID, token counting, fingerprinting.

The reference hosts all text logic as opaque Python in DoFns (e.g. the
word-split regex in
`/root/reference/ray_beam_runner/examples/word_count_metrics.py:73-83`);
here every operator is a Catalyst expression (codegen'd, no Python in the
hot path). Each has an exact DuckDB-SQL analog used by the oracle queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small multilingual stopword/marker lists (public, standard function words).
STOPWORDS_EN = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "for", "on", "with")
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}
# BPE-ish tokenizer: letter runs, digit runs, single punctuation marks.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
PUNCT_RE = "[.,!?;:'\"()\\-]"


def normalize_text(col: Column) -> Column:
    """Trim + lowercase + collapse whitespace runs to single spaces."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-gram shingles (array<string>) of the normalized text.

    ONE JVM regex pass: a zero-width token-start anchor `(?<![^ ])` plus a
    lookahead capturing the next n space-separated tokens yields every
    OVERLAPPING n-gram in a single regexp_extract_all — ~5x (n=8) / ~3x
    (n=3) faster than the previous slice+zip_with formulation, whose n-1
    interpreted higher-order rounds cost ~6 ms/doc and dominated every
    near-dup operator. (An indexed element_at formulation is ~100x worse
    still: interpreted HOFs re-evaluate argument expressions per element,
    re-tokenizing the document per gram.) Exact-equality with the HOF
    version is pinned by test_word_ngrams_regex_equivalence. Lookahead is
    Java-regex-only — the DuckDB oracles build grams from token arrays
    (llm._G3), which RE2-based engines can also do. Cost is O(len * gram
    chars) per doc; empty array for docs shorter than n tokens."""
    pat = "(?<![^ ])(?=((?:[^ ]+ ){" + str(n - 1) + "}[^ ]+))"
    return F.regexp_extract_all(normalize_text(col), F.lit(pat), F.lit(1))


def n_tokens(col: Column) -> Column:
    return F.size(tokens(col))


def collapse_repeat_tokens(toks: Column) -> Column:
    """Drop CONSECUTIVE duplicate tokens from a token array ('filter
    filter fast' -> 'filter fast') — the stutter/boilerplate-run cleanup
    step of OCR and crawl pipelines. Keeps the first token of each run.

    ``toks`` must be a bound array column (an attribute reference, e.g. a
    staged projection alias), NOT an inline tokens(text) expression:
    Spark's higher-order functions re-evaluate argument expressions per
    element, so an inline expression would re-tokenize the document for
    every token (see word_ngrams). The (x, i) filter lambda is 0-based;
    element_at is 1-based, so element_at(toks, i) is the PREVIOUS token.
    """
    return F.filter(toks, lambda x, i: (i == F.lit(0)) | (x != F.element_at(toks, i)))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish regex tokens (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), F.lit(0)))


def stopword_count(col: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return stopword_count_from_tokens(tokens(col), stopwords)


def stopword_count_from_tokens(toks: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Stopword count over an already-tokenized array column. Prefer this
    when the token array is materialized once in an upstream projection:
    Spark's higher-order functions are interpreted (no codegen, no CSE), so
    embedding `tokens(text)` in several sibling expressions re-tokenizes
    the document per expression."""
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def quality_from_counts(n_tok: Column, n_stop: Column, n_punct: Column, n_chars: Column) -> Column:
    """Heuristic quality score in [0, 1] from precomputed counts: rewards
    moderate length, low punctuation density, healthy stopword ratio.
    Linear so the DuckDB oracle reproduces it bit-for-bit (after 6-decimal
    rounding). Taking counts (not raw text) keeps the expensive
    tokenization/regex work single-pass — each count is computed once in a
    prior projection and referenced here as a plain attribute."""
    nt = n_tok.cast("double")
    stop_ratio = n_stop.cast("double") / F.greatest(nt, F.lit(1.0))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars.cast("double"), F.lit(1.0))
    len_component = F.least(nt, F.lit(100.0)) / F.lit(100.0)
    return F.round(
        F.lit(0.4) * len_component
        + F.lit(0.4) * F.least(stop_ratio * 4.0, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))),
        6,
    )


def quality_score(col: Column) -> Column:
    """Single-column convenience form of :func:`quality_from_counts`.

    Recomputes tokenization internally — in a projection that also selects
    the individual counts, use quality_from_counts over the count columns
    instead (4-6x measured at sf0.1; see q_text_stats)."""
    return quality_from_counts(
        n_tokens(col), stopword_count(col), punct_count(col), F.length(col)
    )


def lang_id(col: Column) -> Column:
    """Heuristic language ID: CJK characters → zh; otherwise the language
    with the greatest marker-stopword count, ties resolved in fixed
    priority order en > de > fr > es. Expressible identically in DuckDB SQL
    for the oracle."""
    toks = tokens(col)

    def marker_count(markers: tuple[str, ...]) -> Column:
        # Single-arg lambda: F.filter inspects the signature and would pass
        # (element, index) to a two-parameter callable.
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    score = {lang: marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    has_cjk = F.size(F.regexp_extract_all(col, F.lit("[\\u4e00-\\u9fff]"), F.lit(0))) > 0
    en, de, fr, es = score["en"], score["de"], score["fr"], score["es"]
    return (
        F.when(has_cjk, "zh")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )


def fingerprint_md5(col: Column) -> Column:
    """Full-document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def fingerprint_min_shingle(col: Column, n: int = 5) -> Column:
    """Winnowing-style fingerprint: the lexicographic minimum of the md5
    hashes of the document's word n-gram shingles. Robust to local edits
    (unlike the full-doc hash); null for docs shorter than n tokens."""
    return F.array_min(F.transform(word_ngrams(col, n), F.md5))


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data scrubbing). Patterns are written
# in the common subset of Java regex (Spark) and RE2 (DuckDB) so the oracle
# reproduces them exactly: no lookaround, no backreferences.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (pattern, replacement token)
    "email": ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": ("\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?", "<PHONE>"),
    "ipv4": ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
}


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (counted on the raw text)."""
    return F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind][0]), F.lit(0)))


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its placeholder token. Order matters:
    emails are redacted before IPs so a dotted domain is never half-eaten
    by the IPv4 pattern; all passes are single-scan Catalyst
    regexp_replace (codegen'd, no Python)."""
    out = col
    for kind in ("email", "phone", "ipv4"):
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def hash_bucket(col: Column, buckets: int, seed_tag: str) -> Column:
    """Deterministic, engine-portable hash bucket in [0, buckets): the
    first 8 hex digits of md5(tag || ':' || value) mod buckets. Used for
    train/val splits and sampling decisions that must be reproducible
    across engines AND across runs (Spark's xxhash64/hash are not
    portable to other systems; md5 is). DuckDB analog:
    ('0x' || substr(md5(tag || ':' || v), 1, 8))::BIGINT % buckets."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(seed_tag + ":"), col.cast("string"))), 1, 8), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def chunk_starts(toks: Column, stride: int) -> Column:
    """1-based start offsets of sliding token windows: [1, 1+stride, ...]
    up to the token count (a single start for empty docs)."""
    return F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))


def chunk_text(toks: Column, start: Column, chunk_size: int) -> Column:
    """The chunk at a start offset: chunk_size tokens re-joined with
    single spaces (shorter at the tail). Callers must materialize the
    token array in a projection BEFORE exploding starts — slice() re-
    evaluates its array argument per output row, so an inlined
    tokens(text) would re-tokenize the document once per chunk."""
    return F.concat_ws(" ", F.slice(toks, start, chunk_size))


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    divisor: int = 16,
    seed_tag: str = "cdc",
) -> DataFrame:
    """CONTENT-DEFINED chunking (the rolling-hash boundary rule behind
    rsync/LBFS/dedup stores, Muthitacharoen et al., SOSP 2001, at token
    granularity): a chunk boundary opens before token i exactly when
    the hash of the (prev, current) token pair falls in a 1/divisor
    bucket — the decision depends only on LOCAL content, so after any
    insertion/deletion the chunking re-synchronizes at the next
    boundary and every later chunk is byte-identical to the original's.
    Fixed-size chunking (chunk_starts) shifts every subsequent chunk
    after a one-token edit, defeating chunk-level dedup; CDC is what
    makes shared-passage detection and delta storage work on a corpus
    that keeps getting re-crawled. Returns
    (id_col, chunk_idx, n_tok, chunk_md5) — the md5 fingerprint is the
    cross-document chunk identity. Expected chunk length = divisor
    tokens; md5 bucketing (hash_bucket contract) keeps boundaries
    engine-portable, so the whole operator replays in SQL
    (q_chunk_cdc). One explode + one per-doc window + one keyed
    aggregation — no data path leaves the JVM."""
    from pyspark.sql import Window as W

    tok = df.select(
        F.col(id_col).alias("_cdc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = W.partitionBy("_cdc_id").orderBy("pos")
    prev = F.lag("tok").over(w)
    boundary = (
        F.when(
            prev.isNotNull()
            & (
                hash_bucket(
                    F.concat(prev, F.lit(":"), F.col("tok")), divisor, seed_tag
                )
                == 0
            ),
            1,
        )
        .otherwise(0)
    )
    # boundary flag materialized in its own projection: nesting the
    # lag() window inside sum().over() leans on analyzer tolerance;
    # two sequential window ops share the one partition exchange
    flagged = tok.select("_cdc_id", "pos", "tok", boundary.alias("_b"))
    chunked = flagged.select(
        "_cdc_id", "pos", "tok", F.sum("_b").over(w).alias("chunk_idx")
    )
    return (
        chunked.groupBy(F.col("_cdc_id").alias(id_col), "chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("chunk_md5"),
        )
    )
