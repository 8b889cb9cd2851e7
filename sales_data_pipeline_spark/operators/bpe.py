"""Distributed byte-pair-encoding (BPE) vocabulary induction.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public algorithm). The reference repo has no tokenizer; this is part of
the training-data-pipeline surface the brief asks for beyond it.

Scale design — the corpus is scanned ONCE:

- Pre-tokenize (whitespace) and reduce to the distinct WORD-FREQUENCY
  table: ``groupBy(word).count()``. Everything after runs on that
  table, which is vocabulary-sized (millions of rows at 100 TB), not
  corpus-sized (billions of documents). This is the same trick the
  original C++/Python implementations use (``get_vocab``), expressed
  as one Spark aggregation.
- Each merge iteration is one shuffle over the word table: explode
  adjacent symbol pairs weighted by word frequency, aggregate, take
  the argmax pair (freq desc, then lexicographic — pinned tie rule),
  and rewrite every word's symbol array with a greedy left-to-right
  fold (``F.aggregate`` — whole-stage codegen, no Python). Only ONE
  ROW (the winning pair) ever reaches the driver per iteration.
- Lineage is cut by persisting each iteration's word table and
  unpersisting the previous one; ``checkpoint_every`` localCheckpoints
  to keep the plan tree bounded for large merge counts.

Symbol convention (pinned, tested): a word's initial symbols are its
characters plus a separate trailing end-of-word marker ``</w>`` —
Sennrich's formulation. A merge (a, b) -> a||b applies greedily left
to right; after a merge the scan continues AFTER the merged token
(the fold naturally does this: the merged symbol at the tail no longer
equals ``a`` unless the text genuinely repeats).

ANSI-safety: the fold peeks at the accumulator tail with
``try_element_at`` (NULL on empty, never INVALID_ARRAY_INDEX), and the
when() guard keeps every hoisted subexpression total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EOW = "</w>"

__all__ = ["EOW", "bpe_train", "bpe_apply", "word_freq_table", "pair_census"]


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> the distinct word-frequency table with each
    word's initial symbol array (chars + trailing EOW marker)."""
    w = (
        docs.select(
            F.explode_outer(
                F.split(F.regexp_replace(F.col(text_col), r"\s+", " "), " ")
            ).alias("word")
        )
        .filter(F.col("word").isNotNull() & (F.col("word") != ""))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return w.select(
        "word",
        "freq",
        F.concat(chars, F.array(F.lit(EOW))).alias("symbols"),
    )


def pair_census(words: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies over the word table, weighted
    by word frequency — BPE's ``get_stats`` as one explode+aggregate.
    Every adjacent POSITION counts ('aaa' yields ('a','a') twice),
    matching the reference algorithm. Columns: left_sym, right_sym,
    pair_freq."""
    pairs = F.zip_with(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        words.select("freq", F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("freq").cast("bigint").alias("pair_freq"))
    )


def _merge_symbols(sym_col, left: str, right: str):
    """Greedy left-to-right application of one merge to a symbol array,
    as a pure codegen fold: walk the array; when the accumulator's tail
    is `left` and the current element is `right`, replace the tail with
    the merged symbol, else append."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            F.try_element_at(acc, F.lit(-1)).eqNullSafe(F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_freq: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[dict], DataFrame]:
    """Train `num_merges` BPE merges. Returns (merges, final_words):
    merges is a driver-side list of dicts (rank, left, right, merged,
    pair_freq) — the learned vocabulary artifact, tiny by construction
    — and final_words is the word table with post-merge symbol arrays
    (persisted; caller unpersists). Stops early when the best pair's
    frequency drops below `min_freq` (Sennrich's stopping rule).

    Determinism: argmax tie-break is (pair_freq DESC, left_sym ASC,
    right_sym ASC) — pinned so runs are reproducible across
    partitionings and engines; parity vs an out-of-engine reference
    implementation is tested in tests/test_bpe.py.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    words = word_freq_table(docs, text_col).persist()
    merges: list[dict] = []
    try:
        for rank in range(num_merges):
            top = (
                pair_census(words)
                .orderBy(
                    F.col("pair_freq").desc(),
                    F.col("left_sym"),
                    F.col("right_sym"),
                )
                .limit(1)
                .collect()
            )
            if not top or top[0]["pair_freq"] < min_freq:
                break
            left, right, freq = (
                top[0]["left_sym"],
                top[0]["right_sym"],
                int(top[0]["pair_freq"]),
            )
            merges.append(
                {
                    "rank": rank,
                    "left": left,
                    "right": right,
                    "merged": left + right,
                    "pair_freq": freq,
                }
            )
            nxt = words.select(
                "word", "freq", _merge_symbols("symbols", left, right).alias("symbols")
            )
            if checkpoint_every and (rank + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            words.unpersist()
            words = nxt
    except Exception:
        words.unpersist()
        raise
    return merges, words


def bpe_apply(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a trained merge list. Scale shape: the
    merge folds (one per rank, applied in rank order) run on the
    DISTINCT word table only; the corpus is then re-joined word->tokens
    by a single explode + equi-join + order-pinned reassembly, so the
    per-rank work is vocabulary-sized, never corpus-sized. Output:
    (id_col, tokens array<string>, n_tokens)."""
    split_words = F.split(
        F.regexp_replace(F.col(text_col), r"\s+", " "), " "
    )
    corpus = docs.select(
        F.col(id_col),
        F.posexplode_outer(split_words).alias("pos", "word"),
    ).filter(F.col("word").isNotNull() & (F.col("word") != ""))
    vocab = corpus.select("word").distinct()
    sym = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.array(F.lit(EOW)),
    )
    encoded = vocab.select("word", sym.alias("symbols"))
    for m in sorted(merges, key=lambda m: m["rank"]):
        encoded = encoded.select(
            "word", _merge_symbols("symbols", m["left"], m["right"]).alias("symbols")
        )
    # The encode table scales WITH the corpus vocabulary (and its
    # symbols array is far wider than the word), so it must never be
    # the build side of a broadcast: Catalyst's post-distinct size
    # estimate picked broadcast at sf10 and the collect blew
    # spark.driver.maxResultSize (found by tools/scaling.py measure10,
    # round 7). a sort-merge hint keeps the join shuffle-side and
    # SPILLABLE at every scale (shuffle_hash was tried first and hit
    # per-partition hash-build memory limits at sf10).
    joined = corpus.join(encoded.hint("merge"), "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("symbols")))
            ).alias("__ps")
        )
        .select(
            id_col,
            F.flatten(F.transform("__ps", lambda e: e["symbols"])).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("bigint"))
    )
