"""Text-analysis operators over a (doc_id, text, ...) documents table.

Table-level analogues of the reference's string/metric operators
(SURVEY.md §2.8/§2.4): normalization chain (F1), CJK boilerplate
filter (P2), token counting, quality scoring, language-id heuristic,
fingerprinting (A7-ish), histograms (A6), edit distance (A8/F18).

Every computed column is aliased identically to the DuckDB oracle SQL
in __spark_entry__ so the driver's value-hash compare lines up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_spark.config import CJK_HI, CJK_LO
from ocr_spark.functions.text_clean import TRANSLATE_MATCHING, TRANSLATE_REPLACE

CJK_PATTERN = f"[{chr(CJK_LO)}-{chr(CJK_HI)}]"

# a deterministic dirty suffix so the normalization chain has real work
# to do on the (ASCII-only) synthetic documents table
DIRTY_SUFFIX = "１＋２＝３＝４"
CJK_SUFFIX = "口算练习"


def clean_expr(col):
    """Normalization chain as a Catalyst expression: one translate +
    double-'=' repair (no UDF — whole-stage codegen keeps this JVM-side)."""
    c = F.translate(col, TRANSLATE_MATCHING, TRANSLATE_REPLACE)
    parts = F.split(c, "=")
    return F.when(
        F.size(parts) > 2,
        F.concat(F.element_at(parts, 1), F.lit("="), F.element_at(parts, -1)),
    ).otherwise(c)


def clean_documents(docs: DataFrame) -> DataFrame:
    dirty = F.concat(F.substring("text", 1, 40), F.lit(DIRTY_SUFFIX))
    return docs.select("doc_id", clean_expr(dirty).alias("cleaned"))


def cjk_filter_counts(docs: DataFrame) -> DataFrame:
    """Mark half the corpus with CJK boilerplate, count survivors of
    the no-CJK filter per source (P2 at table level)."""
    marked = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(CJK_SUFFIX))
    ).otherwise(F.col("text"))
    return (
        docs.select("source", marked.alias("t"))
        .where(~F.col("t").rlike(CJK_PATTERN))
        .groupBy("source")
        .agg(F.count("*").alias("n_clean"))
    )


def token_counts(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"), F.col("n_chars")
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    consonant_ratio = (
        F.length(F.regexp_replace("text", "[aeiou ]", "")) / F.length("text")
    ).cast("double")
    return docs.select("doc_id", consonant_ratio.alias("consonant_ratio"))


# The closed-class function words of the corpus filter (Gopher-style
# quality rules use the canonical English list; the principle — a text
# with too few function words is boilerplate/gibberish — is list-size
# independent).
STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "it")


def stopword_fractions(docs: DataFrame) -> DataFrame:
    """Stopword fraction per document — the standard LLM-corpus filter
    signal (too-low fraction => listings/boilerplate, not prose).
    Pure array expressions in codegen: one split, one filtered count.
    Returns (doc_id, n_tokens, stop_frac)."""
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = "filter(split(text, ' '), x -> x <> '')"
    return docs.select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(
            f"round(size(filter({toks}, x -> x IN ({sw}))) / "
            f"greatest(size({toks}), 1), 6)"
        ).alias("stop_frac"),
    )


def repetition_ratios(docs: DataFrame, n: int = 10) -> DataFrame:
    """Duplicate word-``n``-gram fraction per document (the Gopher
    repetition filter: high ratio => looping/template text an LLM
    corpus drops). Ratio = 1 - distinct/total over the document's
    rolling word n-grams.

    Expression shape: the token array is LET-BOUND via the
    transform-over-singleton trick — the gram lambda references it once
    per gram, and a plain staged column would be re-inlined by
    CollapseProject and re-split per iteration (the documented 16x
    trap). Short docs (< n tokens) score 0. Returns
    (doc_id, n_grams, rep_ratio)."""
    expr = f"""
        transform(
          array(filter(split(text, ' '), x -> x <> '')),
          toks -> CASE WHEN size(toks) < {n} THEN named_struct('n_grams', 0, 'r', 0.0d)
            ELSE named_struct(
              'n_grams', size(toks) - {n - 1},
              'r', round(1.0d - size(array_distinct(
                       transform(sequence(1, size(toks) - {n - 1}),
                                 i -> concat_ws(' ', slice(toks, i, {n})))))
                     / (size(toks) - {n - 1}), 6))
            END)[0]
    """
    return docs.select("doc_id", F.expr(expr).alias("s")).select(
        "doc_id",
        F.col("s.n_grams").alias("n_grams"),
        F.col("s.r").alias("rep_ratio"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    ratio = (
        F.length(F.regexp_replace("text", "[aeiou ]", "")) / F.length("text")
    ).cast("double")
    label = (
        F.when(ratio < 0.52, "latin_vowelish")
        .when(ratio < 0.60, "latin_mixed")
        .otherwise("latin_consonantish")
    )
    return docs.select(label.alias("lang_guess")).groupBy("lang_guess").agg(
        F.count("*").alias("n_docs")
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.md5(F.lower("text")).alias("fp"))


def char_vocab(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(F.split("source", "")).alias("ch"))
        .where(F.col("ch") != "")
        .distinct()
    )


def distinct_token_check(docs: DataFrame, rsd: float = 0.01, budget: float = 0.05) -> DataFrame:
    """The 100 TB twin of exact vocabulary counting, shipped with its
    own quality gate: HyperLogLog++ ``approx_count_distinct`` (fixed
    ~kB sketch per partition, merged map-side — no shuffle of the
    token universe) checked against the exact distinct count at this
    scale. Emits (n_exact, within_budget): the sketch estimate is
    engine-specific so the cross-engine contract is the exact count
    plus the (deterministic — HLL is a pure function of its input)
    budget verdict at ``budget`` relative error (= 5 sigma for
    rsd=0.01)."""
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    agg = toks.agg(
        F.countDistinct("tok").alias("n_exact"),
        F.approx_count_distinct("tok", rsd).alias("n_approx"),
    )
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(budget)
        ).alias("within_budget"),
    )


def length_histogram(docs: DataFrame) -> DataFrame:
    bin_col = (F.floor(F.col("n_chars") / 100) * 100).cast("long")
    return docs.groupBy(bin_col.alias("bin")).agg(F.count("*").alias("n"))


def edit_distances(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.levenshtein(F.substring("text", 1, 20), F.substring("text", 21, 20)).alias(
            "lev"
        ),
    )


def arith_verdicts(docs: DataFrame) -> DataFrame:
    """Exercise the standalone arithmetic-verdict pandas UDF
    (functions/udfs.py, reference utils.py:50-117) against labels
    synthesized deterministically from doc_id: plain sums, the
    division-with-remainder notation `a÷b=q*r`, a malformed `a+=b`
    case, and a wrong-answer twist — so the DuckDB oracle can derive
    the expected verdict arithmetically while Spark runs the real
    kernel. Returns (doc_id, label, verdict)."""
    from ocr_spark.functions.udfs import arith_state_udf  # noqa: PLC0415

    a = (F.col("doc_id") % 90 + 2).cast("long")
    b = (F.col("doc_id") % 9 + 2).cast("long")
    wrong = (F.col("doc_id") % 5 == 0).cast("long")
    plus_label = F.concat(
        a.cast("string"), F.lit("+"), b.cast("string"),
        F.lit("="), (a + b + wrong).cast("string"),
    )
    q = F.floor(a / b).cast("long") + wrong
    divrem_label = F.concat(
        a.cast("string"), F.lit("÷"), b.cast("string"),
        F.lit("="), q.cast("string"), F.lit("*"), (a % b).cast("string"),
    )
    malformed = F.concat(a.cast("string"), F.lit("+="), b.cast("string"))
    label = (
        F.when(F.col("doc_id") % 11 == 0, malformed)
        .when(F.col("doc_id") % 7 == 0, divrem_label)
        .otherwise(plus_label)
    )
    return docs.select(
        "doc_id", label.alias("label"), arith_state_udf(label).alias("verdict")
    )


def bpe_token_counts(docs: DataFrame) -> DataFrame:
    """Token counting, BPE-ish: alongside the whitespace count, a
    GPT-style pre-tokenizer regex (letter runs | digit runs | single
    non-alphanumeric marks) counts the units a byte-pair encoder would
    start from. Pure regexp_extract_all — stays in codegen; the
    pattern uses only constructs that Java regex and RE2 interpret
    identically so the oracle can replay it (whitespace is an explicit
    class, not \\s: Java's \\s includes vertical tab, RE2's does not)."""
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]"
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


def rolling_fingerprints(docs: DataFrame, window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: hash every ``window``-char
    rolling substring, keep the minimum — robust to edits outside the
    minimizing window, unlike the whole-text md5 (fingerprints()).
    Expression-level sequence/transform; at 100 TB the same expression
    with per-band minima feeds a fuzzy-dup band join."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length(text) - {window - 1}, 1)), "
        f"i -> md5(substr(text, i, {window})))"
    )
    return docs.select("doc_id", F.array_min(grams).alias("rolling_fp"))


def bigram_lm_scores(docs: DataFrame, k: float = 0.5) -> DataFrame:
    """CCNet-style LM quality signal: per-document cross-entropy under
    an add-k-smoothed word-bigram model trained on the corpus itself
    (the distributed stand-in for CCNet's KenLM perplexity bucketing —
    Wenzek et al. 2020; high xent = far from the corpus distribution =
    gibberish/boilerplate candidate).

    P(w2|w1) = (B(w1,w2) + k) / (U(w1) + k*V); the vocabulary size V
    and both count relations come from the SAME tokenization pass. The
    shuffles are bounded by DISTINCT unigrams/bigrams (map-side partial
    counts — a billion copies of one bigram collapse per map partition),
    and the per-doc scoring join is an equi hash join against the
    vocab-sized model relations (AQE broadcasts them when they fit —
    the usual case, since vocab << corpus). Determinism: each bigram's
    log-probability is quantized to micro-nats (BIGINT) before the
    per-doc sum, so the score never depends on float summation order.

    Returns (doc_id, n_bigrams, xent) — xent in nats rounded to 6,
    NULL for docs with < 2 tokens (no bigram evidence)."""
    toks = docs.select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x <> '')").alias("ws")
    )
    # zip_with over the two shifted slices: empty/one-token docs give
    # two empty slices and an empty bigram array (Spark's sequence()
    # would DESCEND for start > stop and emit bogus null pairs)
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)),"
                " slice(ws, 2, greatest(size(ws) - 1, 0)),"
                " (a, b) -> named_struct('w1', a, 'w2', b))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    uni = (
        toks.select(F.explode("ws").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("cu"))
    )
    vocab = uni.agg(F.count("*").alias("v"))
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    lp_micro = F.round(
        F.log((F.col("cb") + F.lit(k)) / (F.col("cu") + F.lit(k) * F.col("v")))
        * 1e6,
        0,
    ).cast("long")
    scored = (
        pairs.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp_micro.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.sum("lp") / 1e6 / F.count("*"), 6).alias("xent"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "xent",
        )
    )
