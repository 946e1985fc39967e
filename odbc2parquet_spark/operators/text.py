"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints.

Everything is built-in Catalyst expressions (split/regexp/filter/aggregate)
— whole-stage-codegen'd, no Python in the row path. Ratios are int/int ->
double divisions (bit-deterministic in any IEEE engine); hashes are
md5-derived so the DuckDB oracle reproduces them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: regex token pattern shared with the oracle: words | numbers | one symbol.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: marker stopwords per language for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "los", "que", "y", "una"),
    "fr": ("le", "la", "et", "les", "des"),
}


def words(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: w != "")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens, regex (BPE-ish) tokens, char count per doc."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(words(t)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(TOKEN_RE)).cast("long").alias("n_re_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, alpha ratio, stopword ratio,
    mean word length, and a composite score.

    The composite mirrors common curation filters (C4/Gopher-style rules:
    drop too-short docs, low-stopword docs, symbol-heavy docs) as one
    deterministic expression.
    """
    t = F.col(text_col)
    ws = words(t)
    n_words = F.size(ws)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    stops = F.array(*[F.lit(s) for s in ("the", "a", "and", "of", "to", "in", "is")])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stops, w)))
    alpha_ratio = n_alpha / n_chars
    stop_ratio = n_stop / n_words
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    score = (
        F.when(n_words >= 10, F.lit(0.25)).otherwise(F.lit(0.0))
        + alpha_ratio * F.lit(0.25)
        + stop_ratio * F.lit(0.25)
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_chars.cast("long").alias("n_chars"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID with deterministic argmax.

    Scores each language by marker-word hits; ties break by language code
    (so engines agree even on all-zero scores). 'und' (undetermined) when
    no marker hits at all.
    """
    t = F.col(text_col)
    ws = words(t)
    # array_contains(markers, w) rather than w.isin(...): lambda variables
    # inside higher-order functions don't support the isin predicate. The
    # marker list is captured via closure — pyspark derives the lambda-var
    # count from the function signature, so it must be unary.
    def marker_filter(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(s) for s in markers])
        return lambda w: F.array_contains(arr, w)

    scores = {
        lang: F.size(F.filter(ws, marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best_score = None
    best_lang = None
    for lang in sorted(scores):  # ascending code order => first max wins
        s = scores[lang]
        if best_score is None:
            best_score, best_lang = s, F.lit(lang)
        else:
            cond = s > best_score
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(cond, s).otherwise(best_score)
    pred = F.when(best_score > 0, best_lang).otherwise(F.lit("und"))
    sel = [F.col("doc_id"), pred.alias("pred_lang"), best_score.cast("long").alias("marker_hits")]
    sel += [scores[lang].cast("long").alias(f"hits_{lang}") for lang in sorted(scores)]
    return docs.select(*sel)


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial rolling fingerprint over the word sequence.

    acc = (acc * 31 + (md5_24bit(word))) mod 1_000_000_007 — order-sensitive
    (a permuted document fingerprints differently), overflow-free in int64,
    reproducible in any engine with md5. Left fold via F.aggregate.
    """
    ws = words(F.col(text_col))
    word_h = lambda w: F.conv(F.substring(F.md5(w), 1, 6), 16, 10).cast("long")  # noqa: E731
    fp = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * F.lit(31) + word_h(w)) % F.lit(1_000_000_007),
    )
    return docs.select("doc_id", fp.alias("fingerprint"), F.size(ws).cast("long").alias("n_words"))


def bigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, avg_surprisal): corpus-statistics language-model
    score — the KenLM-style quality signal without an external model.

    Pass 1 builds the corpus word-bigram frequency table (one groupBy);
    pass 2 scores every document by the mean -ln(count/total) of its
    bigrams (a broadcast-sized join at realistic vocabularies, a shuffle
    join beyond that — Spark picks). Gibberish scores high (rare bigrams),
    fluent repeated text scores low. Deterministic: counts are integers,
    the log ratio is fixed-order arithmetic, result rounded to 6 decimals.
    """
    t = F.col(text_col)
    ws = words(t)
    bigram_expr = (
        "CASE WHEN size(ws) < 2 THEN array() ELSE "
        "transform(sequence(1, size(ws) - 1), i -> ws[i - 1] || ' ' || ws[i]) END"
    )
    doc_bigrams = docs.select(
        F.col("doc_id"), ws.alias("ws")
    ).select("doc_id", F.explode(F.expr(bigram_expr)).alias("bg"))
    freqs = doc_bigrams.groupBy("bg").agg(F.count("*").alias("c"))
    total = freqs.agg(F.sum("c").alias("total"))
    scored = (
        doc_bigrams.join(freqs, "bg")
        .join(F.broadcast(total))
        .withColumn("surprisal", -F.log(F.col("c") / F.col("total")))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("surprisal"), 6).alias("avg_surprisal"),
    )
