"""Text-analysis column builders for training-data pipelines.

All pure JVM column expressions (whole-stage codegen; no UDFs) so
they run at scan speed over a 100 TB text column.  Reference analog:
the payload-classification stage (MiscMessage,
crypto-ws-client/src/common/message_handler.rs:4-22) — per-row typed
judgments about an opaque payload.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic (deliberately small + fixed: deterministic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por"],
    "pt": ["o", "a", "os", "que", "de", "um", "uma", "para"],
}


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokenization (the BPE-ish regex variant splits on
    non-word boundaries too)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def bpe_ish_tokens(text_col: str = "text") -> Column:
    """Sub-word-ish tokenization: split on whitespace AND punctuation
    boundaries — a cheap stand-in for a BPE pre-tokenizer."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != ""
    )


def token_count(text_col: str = "text") -> Column:
    return F.size(tokens(text_col))


def stopword_hits(text_col: str = "text", lang: str = "en") -> Column:
    """Count of distinct language-marker stopwords present."""
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens(text_col)), markers))


def lang_scores(text_col: str = "text") -> Column:
    """Map lang -> marker-hit count (the argmax is the predicted
    language; ties -> 'und')."""
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in LANG_MARKERS]),
        F.array(*[stopword_hits(text_col, lang) for lang in LANG_MARKERS]),
    )


def lang_id(text_col: str = "text", min_hits: int = 1) -> Column:
    """Predicted language = argmax of marker hits with deterministic
    tie-break on language code; below min_hits -> 'und'."""
    pairs = [
        F.struct(
            stopword_hits(text_col, lang).alias("hits"), F.lit(lang).alias("lang")
        )
        for lang in sorted(LANG_MARKERS)
    ]
    # max over (hits, reversed-lang) -> highest hits, ties to the
    # lexicographically-smallest lang (deterministic)
    best = reduce(
        lambda a, b: F.when(
            (b["hits"] > a["hits"])
            | ((b["hits"] == a["hits"]) & (b["lang"] < a["lang"])),
            b,
        ).otherwise(a),
        pairs,
    )
    return F.when(best["hits"] >= min_hits, best["lang"]).otherwise(F.lit("und"))


def quality_features(text_col: str = "text") -> list[Column]:
    """Standard quality-scoring ratio features, each aliased."""
    t = tokens(text_col)
    n = F.size(t)
    n_chars = F.length(F.col(text_col))
    safe_n = F.greatest(n, F.lit(1))
    return [
        n.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(n_chars / safe_n, 4).alias("chars_per_token"),
        F.round(F.size(F.array_distinct(t)) / safe_n, 4).alias("distinct_ratio"),
        F.round(
            (n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", "")))
            / F.greatest(n_chars, F.lit(1)),
            4,
        ).alias("punct_ratio"),
        F.round(
            F.size(
                F.array_intersect(
                    F.array_distinct(t),
                    F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]),
                )
            )
            / safe_n,
            4,
        ).alias("stopword_ratio"),
    ]


def gate_count_rows_arrow(df, id_col: str = "doc_id", text_col: str = "text"):
    """``(id, text, _n_tokens, _n_distinct, _n_chars, _n_keep,
    _h_<lang>...)`` — the INTEGER counts under :func:`lang_id` +
    :func:`quality_features`, computed in ONE Arrow pass (r7, guide
    §4).

    Why this exists: the pure-expression gate duplicates the
    ``array_distinct(split(trim(text)))`` subtree once per marker
    comparison (the lang-ID argmax reduce alone holds ~50 copies
    after CollapseProject re-inlines any factoring, measured 645
    ``array_intersect`` nodes in the optimized plan), which is big
    enough that janino REFUSES to compile it and the whole stage
    falls back to interpreted eval.  This pass tokenizes once per
    row in python and emits only exact ints; every float ratio and
    ``round`` stays in the JVM, derived from these ints — so float
    semantics are untouched by construction, and the python boundary
    cannot be re-inlined by the optimizer.

    Exact-parity contract with the JVM expressions (pinned by
    ``tests/test_minhash_sig_arrow.py::test_gate_counts_*``):

    * ``trim`` == stripping the SPACE character (0x20) only —
      UTF8String.trim touches nothing else, NOT python ``str.strip``
      (unicode-aware) and not tabs/newlines (verified against the
      expression path on control-char fixtures);
    * ``split(_, r'\\s+')`` == ``re.split`` with JAVA ``\\s``
      ([ \\t\\n\\x0b\\f\\r], ASCII-only) — a leading "" element for
      empty input survives exactly like Java's split;
    * ``_n_distinct``/``_h_*`` count distinct elements / marker
      intersections — set sizes, order-free;
    * ``_n_chars`` = code points (== UTF8String.numChars);
    * ``_n_keep`` = length after removing ``[^\\w\\s]`` with ASCII
      classes (Java default regex semantics);
    * NULL text emits NULL counts (size/length of NULL), so the JVM
      argmax/ratio expressions see exactly what they saw before.
    """
    import re as _re

    from .partitioning import spread_small_scan

    df = spread_small_scan(df.select(id_col, text_col))
    langs = sorted(LANG_MARKERS)
    marker_sets = {lang: frozenset(LANG_MARKERS[lang]) for lang in langs}
    trim_chars = " "  # UTF8String.trim strips 0x20 only
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")
    punct = _re.compile(r"[^\w\s]", _re.ASCII)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            n_rows = len(pdf)
            ids = pdf[id_col]
            texts = pdf[text_col]
            cols = {
                "_n_tokens": [None] * n_rows,
                "_n_distinct": [None] * n_rows,
                "_n_chars": [None] * n_rows,
                "_n_keep": [None] * n_rows,
            }
            hits = {lang: [None] * n_rows for lang in langs}
            for i, text in enumerate(texts):
                if not isinstance(text, str):
                    continue
                toks = ws.split(text.strip(trim_chars))
                tset = set(toks)
                cols["_n_tokens"][i] = len(toks)
                cols["_n_distinct"][i] = len(tset)
                cols["_n_chars"][i] = len(text)
                cols["_n_keep"][i] = len(punct.sub("", text))
                for lang in langs:
                    hits[lang][i] = len(tset & marker_sets[lang])
            out = {id_col: ids, text_col: texts}
            for name, vals in cols.items():
                out[name] = pd.Series(vals, dtype="Int32")
            for lang in langs:
                out[f"_h_{lang}"] = pd.Series(hits[lang], dtype="Int32")
            yield pd.DataFrame(out)

    id_type = dict(df.select(id_col, text_col).dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, {text_col} string, _n_tokens int, "
        "_n_distinct int, _n_chars int, _n_keep int, "
        + ", ".join(f"_h_{lang} int" for lang in langs)
    )
    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def lang_from_hit_cols(min_hits: int = 1) -> Column:
    """:func:`lang_id`'s argmax rebuilt over the ``_h_<lang>`` integer
    columns of :func:`gate_count_rows_arrow` — the identical
    reduce/when tree with the heavy marker-intersect subtrees replaced
    by plain column references."""
    pairs = [
        F.struct(F.col(f"_h_{lang}").alias("hits"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ]
    best = reduce(
        lambda a, b: F.when(
            (b["hits"] > a["hits"])
            | ((b["hits"] == a["hits"]) & (b["lang"] < a["lang"])),
            b,
        ).otherwise(a),
        pairs,
    )
    return F.when(best["hits"] >= min_hits, best["lang"]).otherwise(F.lit("und"))


def gate_stats_from_counts(counts, text_col: str = "text") -> list[Column]:
    """The ``lang`` + :func:`quality_features` columns rebuilt from
    :func:`gate_count_rows_arrow` output — every expression is the
    ORIGINAL JVM expression with its heavy set-op subtree replaced by
    the equivalent integer column, so floats, rounding and NULL
    propagation are bit-identical to the expression path."""
    lang = lang_from_hit_cols()
    n = F.col("_n_tokens")
    n_chars = F.col("_n_chars")
    safe_n = F.greatest(n, F.lit(1))
    return [
        lang.alias("lang"),
        n.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(n_chars / safe_n, 4).alias("chars_per_token"),
        F.round(F.col("_n_distinct") / safe_n, 4).alias("distinct_ratio"),
        F.round(
            (n_chars - F.col("_n_keep")) / F.greatest(n_chars, F.lit(1)), 4
        ).alias("punct_ratio"),
        F.round(F.col("_h_en") / safe_n, 4).alias("stopword_ratio"),
    ]


def _word_ngrams(text_col: str, n: int) -> Column:
    """Array of word n-grams (space-joined), pure JVM: zip the n
    shifted slices of the token array pairwise with concat — no
    explode, no shuffle, and crucially no outer-array reference inside
    a lambda (an indexed ``transform`` touching ``t[i+j]`` re-evaluates
    the whole tokenization per ELEMENT in interpreted HOF evaluation —
    O(len²) per row, the r5 bench stall).  Each array here is
    referenced a constant number of times: O(n·len) per row."""
    t = tokens(text_col)
    size = F.size(t)
    length = F.greatest(size - F.lit(n - 1), F.lit(0))
    out = F.slice(t, 1, length)
    for j in range(1, n):
        out = F.zip_with(
            out, F.slice(t, 1 + j, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return out


def _run_length_stats(arr: Column) -> Column:
    """Struct ``(top, dup, total)`` over a SORTED string array:
    ``top`` = occurrences of the most frequent element, ``dup`` = total
    occurrences of elements appearing more than once, ``total`` = array
    size.  One ``aggregate`` pass over the array — the per-document
    mode/duplicate computation without any groupBy or explode, which is
    what keeps the repetition filters shuffle-free over 100 TB."""
    sorted_arr = F.array_sort(arr)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc, x):
        same = acc["prev"] == x
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        closed_dup = F.when(
            ~same & (acc["run"] > 1), acc["dup"] + acc["run"]
        ).otherwise(acc["dup"])
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["top"], run).alias("top"),
            closed_dup.alias("dup"),
        )

    def finish(acc):
        return F.struct(
            acc["top"].alias("top"),
            F.when(acc["run"] > 1, acc["dup"] + acc["run"])
            .otherwise(acc["dup"])
            .alias("dup"),
        )

    stats = F.aggregate(sorted_arr, zero, step, finish)
    return F.struct(
        stats["top"].alias("top"),
        stats["dup"].alias("dup"),
        F.size(arr).cast("long").alias("total"),
    )


def repetition_features(text_col: str = "text") -> list[Column]:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    the 'repetition removal' family), adapted to word n-grams:

    * ``top_bigram_frac``  — occurrences of the most frequent word
      bigram / total bigrams ('fraction in most common 2-gram').
    * ``dup_trigram_frac`` — fraction of trigram occurrences whose
      trigram occurs more than once ('fraction in duplicate 3-grams').

    Documents above ~0.18 / ~0.30 respectively are boilerplate or
    generator loops in web corpora.  Both are single-pass array
    aggregates per row: zero shuffle, zero UDF — the filter runs at
    parquet scan speed, so applying it to 100 TB costs one read.
    Empty/short texts (no n-grams) score 0.0.  Reference analog: the
    per-message sanity filters before emit
    (crypto-ws-client/src/common/message_handler.rs:4-22)."""
    bi = _run_length_stats(_word_ngrams(text_col, 2))
    tri = _run_length_stats(_word_ngrams(text_col, 3))

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
        )

    return [
        frac(bi["top"], bi["total"]).alias("top_bigram_frac"),
        frac(tri["dup"], tri["total"]).alias("dup_trigram_frac"),
    ]


def doc_fingerprint(text_col: str = "text") -> Column:
    """Deterministic content fingerprint: md5 of the
    whitespace-normalized, lowercased text (the 'rolling hash'
    normalization step; robust to spacing/case-only edits)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.md5(norm)
