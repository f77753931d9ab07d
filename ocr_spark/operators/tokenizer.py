"""Distributed BPE tokenizer training over the corpus.

The tokenizer-training step of a training-data build: learn a
byte-pair-encoding merge table from corpus statistics, then segment
documents with it. No reference counterpart (the reference's decode
alphabet is a fixed char table, ocr_spark/config.py); this extends the
corpus-construction family in ocr_spark/operators/corpus.py.

Scale shape (the 100 TB read):

- ``word_counts`` is the ONLY corpus-scale pass: one groupBy whose
  map-side partial aggregation collapses each executor's text to its
  local vocabulary before the exchange — the shuffle carries distinct
  words, never documents. Every training round after that runs over
  the VOCAB relation (|vocab| ~ 10^8 at web scale, vs 10^12 docs),
  optionally pruned by ``min_count`` (rare words contribute ~nothing
  to pair statistics — the standard trainer economy).
- each round of ``bpe_train_merges`` is ONE aggregate over the symbol
  relation plus a 1-row argmax collect (a scalar reduce, same shape as
  similarity.kmeans_codebook's centroid step). The winning pair is
  applied with a pure expression-level left fold — no Python rows —
  and the relation is ``localCheckpoint``-ed per round with the
  superseded round's blocks released (the dedup.dup_clusters
  contract), so lineage stays one fold deep and storage stays flat
  for any number of rounds.
- ties on the pair count are broken lexicographically (sym_a, sym_b)
  — OUR deterministic contract (reference BPE implementations
  tie-break on dict insertion order, which is not reproducible across
  partitionings); this makes the learned merge table bit-identical at
  any cluster size.
- ``bpe_apply_merges`` has TWO engines behind one signature, chosen
  by merge-table size (``engine='auto'``): small tables chain one
  fold per merge inside a single projection (pure codegen, zero
  Python); a production 50k-merge table instead ships the ranked
  merge list into an Arrow-batched ``mapInPandas`` kernel (the
  plans/extract.py pattern — the list rides the serialized closure,
  one copy per executor), because a 50k-deep expression tree
  stresses the analyzer, not the executors. The kernel replays the
  SAME sequential per-rank left-to-right pass as the fold (so the
  two engines are bit-identical by construction, pinned in
  tests/test_tokenizer.py) and memoizes word -> symbols per batch —
  segmentation cost scales with the batch's distinct vocabulary,
  not its token count (Zipf makes that a large constant factor on
  real text).

The greedy left fold applies one merge (a, b) exactly like the
sequential BPE reference: scanning left to right, a freshly-merged
symbol "ab" can itself be the left element of a later merge but never
re-matches ``a`` (concat(a, b) = a only if b = '', which cannot occur:
symbols come from substring(word, i, 1)), so leftmost-non-overlapping
semantics fall out of the fold with no position bookkeeping —
"aaa" + merge (a, a) -> ["aa", "a"].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_spark.operators.corpus import (
    PACK_BLOCK,
    PACK_CAPACITY,
    _pack_from_counts,
)
from ocr_spark.operators.dedup import _spread
from ocr_spark.plans.session import release_local_checkpoint

PAIR_TOP_K = 50

# Frozen demo merge table for the gated ``bpe_pack_plan`` query: the 8
# merges bpe_train_merges learns on the sf0.01 documents corpus,
# committed as a constant so the DuckDB oracle can replay segmentation
# verbatim. ('m', 'er') exercises a multi-character right symbol.
DEMO_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("s", "t"), ("o", "r"), ("o", "w"),
    ("i", "n"), ("m", "er"), ("a", "t"), ("l", "u"),
]


def _sql_str(s: str) -> str:
    """A Spark-SQL single-quoted literal for an arbitrary symbol."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, wc) over the whole corpus — map-side partial count, the
    exchange carries distinct words only."""
    return (
        docs.select(
            F.explode(
                F.expr("filter(split(text, ' '), x -> x <> '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def bpe_pair_counts(docs: DataFrame, k: int = PAIR_TOP_K) -> DataFrame:
    """Top-k adjacent character-pair counts weighted by word frequency
    — round 1 of BPE training and the oracled face of the family.
    Deterministic listing: ORDER BY cnt DESC, sym_a, sym_b is a total
    order, so LIMIT k is reproducible on both engines."""
    w = word_counts(docs)
    pairs = w.where(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), i -> "
                "struct(substring(word, i, 1) AS sym_a, "
                "substring(word, i + 1, 1) AS sym_b))"
            )
        ).alias("p"),
        "wc",
    )
    return (
        pairs.groupBy(
            F.col("p.sym_a").alias("sym_a"), F.col("p.sym_b").alias("sym_b")
        )
        .agg(F.sum("wc").alias("cnt"))
        .orderBy(F.desc("cnt"), "sym_a", "sym_b")
        .limit(k)
    )


def _fold_merge_sql(inner: str, a: str, b: str, lvl: int) -> str:
    """Wrap a symbol-array expression in the greedy left fold that
    applies merge (a, b). Lambda variables carry a per-level suffix so
    chained folds never shadow each other."""
    qa, qb, qm = _sql_str(a), _sql_str(b), _sql_str(a + b)
    acc, s = f"acc{lvl}", f"s{lvl}"
    return (
        f"aggregate({inner}, cast(array() as array<string>), "
        f"({acc}, {s}) -> CASE WHEN size({acc}) > 0 "
        f"AND element_at({acc}, -1) = {qa} AND {s} = {qb} "
        f"THEN concat(slice({acc}, 1, size({acc}) - 1), array({qm})) "
        f"ELSE concat({acc}, array({s})) END)"
    )


_CHARS_OF_WORD = "transform(sequence(1, length({w})), i -> substring({w}, i, 1))"


def bpe_train_merges(
    docs: DataFrame, n_merges: int = 16, min_count: int = 1
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    table in rank order. Each round: one pair-count aggregate over the
    vocab-sized symbol relation, a 1-row argmax collect, and an
    expression-level fold applying the winner; per-round
    localCheckpoint with superseded-block release keeps lineage and
    storage flat. Stops early when no pair remains (every word fully
    merged). ``min_count`` prunes rare words from the statistics (the
    standard trainer economy at web scale)."""
    w = word_counts(docs)
    if min_count > 1:
        w = w.where(F.col("wc") >= min_count)
    syms = w.select(
        F.expr(_CHARS_OF_WORD.format(w="word")).alias("syms"), "wc"
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    prev = syms
    for rnd in range(n_merges):
        best = (
            syms.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2), i -> "
                        "struct(element_at(syms, i + 1) AS a, "
                        "element_at(syms, i + 2) AS b))"
                    )
                ).alias("p"),
                "wc",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        syms = prev.withColumn(
            "syms", F.expr(_fold_merge_sql("syms", a, b, rnd))
        ).localCheckpoint()
        release_local_checkpoint(prev)
        prev = syms
    release_local_checkpoint(prev)  # merges carry the answer
    return merges


# Above this many merges the fold-expression tree is an analyzer
# burden, not an executor one — switch to the Arrow kernel.
EXPR_MAX_MERGES = 64


def _segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """The sequential reference the fold engine implements: one
    left-to-right greedy pass per merge, in rank order."""
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_apply_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    engine: str = "auto",
    expr_max_merges: int = EXPR_MAX_MERGES,
) -> DataFrame:
    """Segment every document with a learned merge table: (doc_id,
    tokens) where tokens = the concatenation of each word's BPE
    symbols in document order.

    ``engine='expr'`` folds the merge chain into a single projection
    (pure codegen — right for small tables); ``engine='arrow'`` runs
    an Arrow-batched ``mapInPandas`` kernel that replays the same
    per-rank pass with per-batch word memoization (right for
    production-sized tables); ``'auto'`` picks by table size. Both
    engines are bit-identical (tests/test_tokenizer.py)."""
    if engine == "auto":
        engine = "expr" if len(merges) <= expr_max_merges else "arrow"
    if engine == "expr":
        per_word = _CHARS_OF_WORD.format(w="w")
        for lvl, (a, b) in enumerate(merges):
            per_word = _fold_merge_sql(per_word, a, b, lvl)
        return docs.select(
            "doc_id",
            F.expr(
                "flatten(transform(filter(split(text, ' '), x -> x <> ''), "
                f"w -> {per_word}))"
            ).alias("tokens"),
        )
    if engine != "arrow":
        raise ValueError(f"engine must be auto/expr/arrow, got {engine!r}")

    table = list(merges)  # rides the closure: one copy per executor
    src = docs.select("doc_id", "text")
    out_schema = src.schema["doc_id"].dataType.simpleString()
    out_schema = f"doc_id {out_schema}, tokens array<string>"

    def _kernel(batches):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            cache: dict[str, list[str]] = {}
            toks = []
            for text in pdf["text"]:
                doc: list[str] = []
                for w in text.split(" "):
                    if not w:
                        continue
                    syms = cache.get(w)
                    if syms is None:
                        syms = _segment_word(w, table)
                        cache[w] = syms
                    doc.extend(syms)
                toks.append(doc)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "tokens": toks})

    return src.mapInPandas(_kernel, out_schema)


def bpe_pack_plan(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    capacity: int = PACK_CAPACITY,
    block: int = PACK_BLOCK,
) -> DataFrame:
    """Tokenize-and-pack: segment every document with a BPE merge
    table and pack by the REAL token counts the tokenizer induces —
    (doc_id, n_tokens, start_bin, start_offset), the corpus.seq_pack
    contract but with n_tokens = the document's BPE symbol count
    instead of its whitespace word count. This is the placement a
    training job actually needs: bins hold ``capacity`` model tokens,
    not ``capacity`` words.

    The count pass never materializes token arrays — ``size()`` over
    the segmentation fold collapses to an int per document before the
    prefix scan — and the scan itself is corpus._pack_from_counts's
    two-phase construction (block windows + tiny offset cumsum), so
    the output stays partition-invariant and the only corpus-scale
    state is one int per document. ``merges`` defaults to the frozen
    DEMO_MERGES so the driver's DuckDB oracle can replay segmentation
    as a separator-encoded replace chain (see the oracle in
    __spark_entry__.py for the encoding argument)."""
    merges = DEMO_MERGES if merges is None else merges
    toks = bpe_apply_merges(_spread(docs), merges)
    counts = toks.select("doc_id", F.size("tokens").alias("n_tokens"))
    return _pack_from_counts(counts, capacity, block)
