"""Text-analysis column functions (training-data-pipeline surface).

Everything here is a pure Catalyst ``Column`` expression — built-in
higher-order functions only (``split``/``transform``/``filter``/
``aggregate``/``md5``), no Python UDFs — so the whole text pipeline
stays inside WholeStageCodegen and scales linearly with executors.

Cross-engine determinism contract: every function has an exact DuckDB
SQL equivalent (used by the oracle harness), which constrains the
primitives to the shared subset:

* tokenization: single-space ``split`` (the synthetic corpus is
  single-space separated) and a BPE-ish regex token extractor;
* hashing: ``md5`` hex strings (identical in Spark and DuckDB), with
  lexicographic ``min`` instead of integer conversion — MinHash over
  the md5 ordering is exactly as uniform as over the integer one;
* SimHash bits from md5 nibble parity (``instr``/``strpos`` on a hex
  alphabet), avoiding engine-specific 64-bit hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish token pattern: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: tiny per-language stopword marker sets for the n-gram heuristic
#: language identifier (honest heuristic: the prediction is whatever
#: the markers say, deterministically — both engines agree exactly).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "los", "y", "es", "una"),
}

#: stopwords used by the quality-score ratio (English-ish corpus).
QUALITY_STOPWORDS = ("the", "a", "and", "of", "to", "is", "in", "it")


def ws_tokens(c: Column) -> Column:
    """Whitespace tokens (single-space split, matching the corpus)."""
    return F.split(c, " ")


def token_count_ws(c: Column) -> Column:
    return F.size(ws_tokens(c))


def token_count_bpe(col_name: str) -> Column:
    """BPE-ish token count via regex extraction (still JVM-side)."""
    return F.size(F.expr(f"regexp_extract_all({col_name}, '{BPE_TOKEN_RE}', 0)"))


def word_ngrams_sql(col_name: str, n: int) -> str:
    """Spark SQL text of the word-``n``-gram shingle array — the ONE
    definition every consumer (Column form, distinct form, MinHash)
    builds from, so a tokenization/guard fix can never apply to one
    path and silently miss another."""
    toks = f"split({col_name}, ' ')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def word_ngrams(col_name: str, n: int) -> Column:
    """Word ``n``-gram shingles as an array<string>; empty array when
    the document has fewer than ``n`` tokens (Spark's ``sequence``
    counts *down* when stop < start, so the short case needs a guard —
    DuckDB's ``generate_series`` is naturally empty there)."""
    return F.expr(word_ngrams_sql(col_name, n))


def distinct_shingles(col_name: str, n: int) -> Column:
    return F.array_distinct(word_ngrams(col_name, n))


def minhash_signature(col_name: str, num_hashes: int, shingle_n: int) -> Column:
    """MinHash signature: for seed ``i``, the lexicographic min of
    ``md5(i || ':' || shingle)`` over the document's distinct shingles.

    Lexicographic min over md5 hex strings is a valid MinHash family
    (md5 is uniform; the hex ordering is a fixed total order), and is
    bit-identical across Spark and DuckDB — no 64-bit integer
    conversions needed.  Returns array<string> of length ``num_hashes``
    (nulls for empty documents).
    """
    sh = f"array_distinct({word_ngrams_sql(col_name, shingle_n)})"
    return F.expr(minhash_sig_from_shingles(sh, num_hashes))


def minhash_sig_from_shingles(sh_expr: str, num_hashes: int) -> str:
    """Spark SQL text: MinHash signature over a shingle-array expr.

    One md5 per (seed, shingle) yields FOUR signature words (the 32-hex
    digest sliced into 8-hex substrings), so ``num_hashes`` values cost
    ``ceil(num_hashes/4)`` md5 calls per shingle — 4× cheaper than the
    naive seed-per-value scheme, same uniformity.
    Element h (1-based): seed = (h-1) div 4 + 1, offset = ((h-1) mod 4)*8 + 1.
    """
    return (
        f"transform(sequence(1, {num_hashes}), "
        f"h -> array_min(transform({sh_expr}, "
        f"g -> substr(md5(concat(CAST((h - 1) div 4 + 1 AS STRING), ':', g)), "
        f"((h - 1) % 4) * 8 + 1, 8))))"
    )


def simhash_bits(col_name: str, num_bits: int = 16) -> Column:
    """SimHash signature as a ``num_bits``-char '0'/'1' string.

    Bit ``j`` is 1 iff strictly more than half of the document's tokens
    have an odd ``j``-th md5 nibble — i.e. the sign of the classic
    ±1 accumulation.  Uses one md5 per token (computed once via
    ``transform``), nibble parity via ``instr`` on a hex alphabet.

    Beyond 32 bits a second, salted md5 supplies nibbles 33-64, so the
    ≤32-bit signatures every other entry emits are bit-for-bit
    unchanged while the Hamming-radius index gets the 64-bit space the
    Manku block scheme needs at corpus scale.
    """
    assert 1 <= num_bits <= 64
    if num_bits <= 32:
        hashes = f"transform(split({col_name}, ' '), t -> md5(t))"
    else:
        hashes = (
            f"transform(split({col_name}, ' '), "
            "t -> concat(md5(t), md5(concat(t, '~'))))"
        )
    bits = (
        f"transform(sequence(1, {num_bits}), j -> "
        f"CASE WHEN 2 * size(filter(hs, h -> "
        f"(instr('0123456789abcdef', substr(h, j, 1)) - 1) % 2 = 1)) "
        f"> size(hs) THEN '1' ELSE '0' END)"
    )
    return F.expr(
        f"array_join(transform(array({hashes}), hs -> array_join({bits}, '')), '')"
    )


def lang_id(col_name: str) -> Column:
    """Marker-stopword language heuristic (first matching language in
    a fixed order wins; 'und' if none match).  Deterministic and
    cross-engine identical; on real multilingual text the markers do
    the work, on the synthetic corpus it degenerates to en/und."""
    toks = f"split({col_name}, ' ')"
    expr = "CASE "
    for lang, markers in LANG_MARKERS.items():
        cond = " OR ".join(f"array_contains({toks}, '{m}')" for m in markers)
        expr += f"WHEN {cond} THEN '{lang}' "
    expr += "ELSE 'und' END"
    return F.expr(expr)


def quality_features(col_name: str) -> dict[str, Column]:
    """Quality-scoring feature set (all pure expressions):

    ``n_chars_m``, ``n_tokens``, ``avg_token_len``, ``punct_ratio``,
    ``stopword_ratio``, ``uniq_token_ratio``, and a composite
    ``quality_score`` in [0,1].  All ratios are floor-scaled to 4
    decimals (``floor(x*10000)/10000``) — unlike ``round``, floor has no
    decimal-tie ambiguity, so Spark and DuckDB agree bit-for-bit.
    """
    toks = f"split({col_name}, ' ')"
    n_chars = f"length({col_name})"
    n_tokens = f"size({toks})"
    stop_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    punct = f"length(regexp_replace({col_name}, '[A-Za-z0-9 ]', ''))"
    feats = {
        "n_chars_m": F.expr(n_chars),
        "n_tokens": F.expr(n_tokens),
        "avg_token_len": F.expr(
            f"floor(((CAST({n_chars} AS DOUBLE) - ({n_tokens} - 1)) / {n_tokens}) * 10000) / 10000"
        ),
        "punct_ratio": F.expr(f"floor((CAST({punct} AS DOUBLE) / {n_chars}) * 10000) / 10000"),
        "stopword_ratio": F.expr(
            f"floor((CAST(size(filter({toks}, t -> t IN ({stop_list}))) AS DOUBLE) "
            f"/ {n_tokens}) * 10000) / 10000"
        ),
        "uniq_token_ratio": F.expr(
            f"floor((CAST(size(array_distinct({toks})) AS DOUBLE) / {n_tokens}) * 10000) / 10000"
        ),
    }
    # composite score: favors mid-length docs with diverse tokens and
    # low punctuation; clamped to [0,1].
    feats["quality_score"] = F.expr(
        f"floor((least(1.0D, greatest(0.0D, "
        f"0.4D * least(1.0D, CAST({n_tokens} AS DOUBLE) / 64) "
        f"+ 0.4D * (CAST(size(array_distinct({toks})) AS DOUBLE) / {n_tokens}) "
        f"+ 0.2D * (1.0D - CAST({punct} AS DOUBLE) / {n_chars})))) * 10000) / 10000"
    )
    return feats


def fingerprint_md5(c: Column) -> Column:
    """Whole-document fingerprint: md5 of the trimmed text."""
    return F.md5(F.trim(c))


def fingerprint_min_shingle(col_name: str, shingle_n: int = 4) -> Column:
    """Content-defined fingerprint: lexicographic min md5 over word
    ``shingle_n``-grams (a 1-permutation MinHash) — robust to small
    edits away from the minimizing shingle, unlike the whole-doc md5."""
    toks = f"split({col_name}, ' ')"
    return F.expr(
        f"CASE WHEN size({toks}) >= {shingle_n} THEN "
        f"array_min(transform(sequence(1, size({toks}) - {shingle_n} + 1), "
        f"i -> md5(concat_ws(' ', slice({toks}, i, {shingle_n}))))) "
        f"ELSE md5(trim({col_name})) END"
    )


# ---------------------------------------------------------------------
# DuckDB oracle-side equivalents (SQL snippet builders) — kept next to
# the Spark forms so the pairing is reviewable in one place.
# ---------------------------------------------------------------------


def duck_word_ngrams(col: str, n: int) -> str:
    toks = f"string_split({col}, ' ')"
    return (
        f"list_transform(generate_series(1, len({toks}) - {n} + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )


def duck_distinct_shingles(col: str, n: int) -> str:
    return f"list_distinct({duck_word_ngrams(col, n)})"


def duck_minhash_signature(col: str, num_hashes: int, shingle_n: int) -> str:
    """DuckDB mirror of :func:`minhash_sig_from_shingles` (integer
    division: DuckDB ``//``; 1-based substr like Spark)."""
    sh = duck_distinct_shingles(col, shingle_n)
    return (
        f"list_transform(generate_series(1, {num_hashes}), "
        f"h -> list_min(list_transform({sh}, "
        f"g -> substr(md5(concat(CAST((h - 1) // 4 + 1 AS VARCHAR), ':', g)), "
        f"((h - 1) % 4) * 8 + 1, 8))))"
    )


def duck_simhash_bits(col: str, num_bits: int = 16) -> str:
    if num_bits <= 32:
        hashes = f"list_transform(string_split({col}, ' '), t -> md5(t))"
    else:
        hashes = (
            f"list_transform(string_split({col}, ' '), "
            "t -> concat(md5(t), md5(concat(t, '~'))))"
        )
    return (
        f"(SELECT array_to_string(list_transform(generate_series(1, {num_bits}), j -> "
        f"CASE WHEN 2 * len(list_filter(hs, h -> "
        f"(strpos('0123456789abcdef', substr(h, j, 1)) - 1) % 2 = 1)) "
        f"> len(hs) THEN '1' ELSE '0' END), '') FROM (SELECT {hashes} AS hs))"
    )


def duck_lang_id(col: str) -> str:
    toks = f"string_split({col}, ' ')"
    expr = "CASE "
    for lang, markers in LANG_MARKERS.items():
        cond = " OR ".join(f"list_contains({toks}, '{m}')" for m in markers)
        expr += f"WHEN {cond} THEN '{lang}' "
    expr += "ELSE 'und' END"
    return expr


# ---- Gopher rule-based quality filter (Rae et al. 2021) ----------
# Shared by query_catalog_stats (the filter entry) and
# query_catalog_corpus (the ensemble-vote oracle) — lives here, in
# the cycle-free functions/ tier, so either catalog module can be
# imported directly without re-entering the other's registration.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.7
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def gopher_rule_texts() -> tuple[str, str]:
    """Build the Spark and DuckDB texts of the Gopher rule set from one
    template; the five rule flags and the composite keep decision are
    integer-exact or single-division doubles, so the booleans need no
    rounding."""
    stop_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)

    def build(
        toks: str,
        size_fn: str,
        filter_fn: str,
        distinct_fn: str,
        alpha_pred: str,
        replace_fn: str,
    ) -> str:
        n_words = f"{size_fn}({toks})"
        mean_len = f"(CAST(length(text) - ({n_words} - 1) AS DOUBLE) / {n_words})"
        symbols = f"length({replace_fn})"
        alpha = f"{size_fn}({filter_fn}({toks}, t -> {alpha_pred}))"
        stops = (
            f"{size_fn}({distinct_fn}({filter_fn}({toks}, "
            f"t -> lower(t) IN ({stop_list}))))"
        )
        rules = {
            "r_word_count": f"({n_words} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})",
            "r_mean_word_len": (
                f"({mean_len} >= {GOPHER_MIN_MEAN_LEN} "
                f"AND {mean_len} <= {GOPHER_MAX_MEAN_LEN})"
            ),
            "r_symbol_ratio": (
                f"(CAST({symbols} AS DOUBLE) / {n_words}) < {GOPHER_MAX_SYMBOL_RATIO}"
            ),
            "r_alpha_words": (
                f"(CAST({alpha} AS DOUBLE) / {n_words}) >= {GOPHER_MIN_ALPHA_RATIO}"
            ),
            "r_stopwords": f"{stops} >= {GOPHER_MIN_DISTINCT_STOPWORDS}",
        }
        flags = ", ".join(f"{expr} AS {name}" for name, expr in rules.items())
        keep = " AND ".join(f"({expr})" for expr in rules.values())
        return f"SELECT doc_id, lang, {flags}, ({keep}) AS keep FROM documents"

    spark_text = build(
        "split(text, ' ')",
        "size",
        "filter",
        "array_distinct",
        "t RLIKE '[A-Za-z]'",
        "regexp_replace(text, '[^#*]', '')",
    )
    duck_text = build(
        "string_split(text, ' ')",
        "len",
        "list_filter",
        "list_distinct",
        "regexp_matches(t, '[A-Za-z]')",
        "regexp_replace(text, '[^#*]', '', 'g')",
    )
    return spark_text, duck_text


GOPHER_SPARK_SQL, GOPHER_DUCK_SQL = gopher_rule_texts()
