"""Distributed BPE tokenizer training and application.

An LLM-data pipeline does not just *count* tokens — it TRAINS the
tokenizer on the corpus it curates (GPT-2/LLaMA-style byte-pair
encoding: repeatedly merge the most frequent adjacent symbol pair).
This module runs Sennrich et al.'s word-level BPE training distributed:

- the corpus collapses to a (word, freq) vocabulary once (Heap's-law
  sublinear in corpus size — the standard trick that makes BPE training
  tractable at any scale: merges apply to the VOCABULARY, weighted by
  frequency, never to the token stream);
- each merge round is one map-side-combined pair-count aggregate over
  the vocabulary plus a TakeOrdered(1) argmax — the single collected
  row is the trained artifact growing by one entry, the same
  bounded-model-state convention as the IVF centroids and LM scalars;
- the merge application is a LEFT-TO-RIGHT NON-OVERLAPPING fold
  expressed on the space-joined symbol string: because a BPE merge
  token is the concatenation a||b, "merge here" is just "append x
  without the separator" — one string conditional per symbol, no
  positional bookkeeping, and the identical lambda runs in DuckDB's
  ``list_reduce``, which is what makes the oracle replay (train AND
  apply) bit-exact. The no-retrigger property holds at the string
  level: after a merge the trailing symbol is a||b, which can never
  equal a again (b is nonempty).

Training is deterministic (ties break on count DESC, then pair
lexicographic — integer counts and ASCII-ordered symbols agree across
engines), so the whole 8-round training run is exactly replayable.

Scale design (100 TB): the only corpus-scale passes are the initial
word count and the final per-doc apply join; both are plain shuffles on
word. The 8 training rounds run over the bounded vocabulary table
(persisted, re-folded in place — recompute depth 1 per round). The
trained model persists to a fingerprint-salted parquet artifact
(ADVICE r4 convention), so serving paths load instead of retrain. The
apply join hints ``shuffle_hash``: the vocabulary is a derived
aggregate whose plan-time size estimate must never pick a broadcast
(the substring-dedup lesson).

Reference parity: the reference pipeline (qopcfdr_stream_loader.py)
ships security events one at a time and has no tokenizer surface at
all — this is beyond-reference capability for the training-data
pipeline, same rationale as the dedup family.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tracked_persist
from ..sources.tables import load_table

N_MERGES = 8


def _word_counts(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold(ws: "F.Column", a: str, b: str) -> "F.Column":
    """Apply merge (a, b) to a space-joined symbol string, left-to-right
    non-overlapping — the exact fold DuckDB's list_reduce replays."""
    syms = F.split(ws, " ")
    return F.aggregate(
        F.slice(syms, F.lit(2), F.size(syms) - 1),
        F.element_at(syms, 1),
        lambda acc, x: F.when(
            ((acc == a) | acc.endswith(" " + a)) & (x == b), F.concat(acc, x)
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


def train_bpe(
    spark: SparkSession, docs: DataFrame
) -> tuple[list[tuple], DataFrame]:
    """Run N_MERGES BPE training rounds over the corpus vocabulary.
    Returns (merge table rows, final vocabulary frame with the merged
    symbol string per word)."""
    words = tracked_persist(
        _word_counts(docs).select(
            "word", "freq", F.array_join(F.split("word", ""), " ").alias("ws")
        )
    )
    merges: list[tuple] = []
    for step in range(1, N_MERGES + 1):
        lists = words.select("freq", F.split("ws", " ").alias("l"))
        prs = lists.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice("l", 1, F.size("l") - 1).alias("a"),
                    F.slice(F.col("l"), F.lit(2), F.size("l") - 1).alias("b"),
                )
            ).alias("pr"),
        )
        best = (
            prs.groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:  # fully merged corpus: nothing left to pair
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((step, a, b, a + b, cnt))
        words = tracked_persist(
            words.select("word", "freq", _merge_fold(F.col("ws"), a, b).alias("ws"))
        )
    return merges, words


def _bpe_model_path(sf_dir: str, fp: str) -> str:
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"qopcfdr_bpe1_model_{os.path.basename(os.path.normpath(sf_dir))}_{fp}",
    )


def _ensure_bpe_model(spark: SparkSession, sf_dir: str) -> str:
    """Train-on-first-use into the fingerprint-salted artifact: merges/
    (the learned merge table) and vocab/ (word -> merged symbol count)."""
    from ..sinks.artifacts import build_once, corpus_fingerprint

    docs = load_table(spark, sf_dir, "documents")

    def _build(path: str) -> None:
        merges, words = train_bpe(spark, docs)
        spark.createDataFrame(
            merges, "step INT, pair_a STRING, pair_b STRING, merged STRING, cnt BIGINT"
        ).repartition(1).write.mode("overwrite").parquet(
            os.path.join(path, "merges")
        )
        words.select(
            "word",
            F.size(F.split("ws", " ")).cast("long").alias("n_syms"),
        ).write.mode("overwrite").parquet(os.path.join(path, "vocab"))

    # vocab/ is written LAST, so its _SUCCESS marks the whole artifact
    return build_once(
        _bpe_model_path(sf_dir, corpus_fingerprint(docs)),
        os.path.join("vocab", "_SUCCESS"),
        _build,
    )


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: (step, pair_a, pair_b, merged, cnt) for
    each of the N_MERGES training rounds."""
    path = _ensure_bpe_model(spark, sf_dir)
    return spark.read.parquet(os.path.join(path, "merges"))


def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained tokenizer: per-document word count and BPE
    token count (sum of each word's merged-symbol count) — the REAL
    token-budget number packing and pricing run on, as opposed to the
    whitespace proxy in text_stats."""
    path = _ensure_bpe_model(spark, sf_dir)
    vocab = spark.read.parquet(os.path.join(path, "vocab"))
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        toks.join(vocab.hint("shuffle_hash"), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
    )


# --------------------------------------------------------------------- #
# Oracles: the full training replay as chained CTEs (one block per merge
# round, the pagerank-unroll pattern), ending in the merge-table union
# (train) or the vocabulary apply join (tokenize).
# --------------------------------------------------------------------- #


def _bpe_cte_chain() -> str:
    blocks = [
        """words0 AS (
  SELECT word, freq,
         array_to_string(list_transform(range(1, len(word)+1), i -> word[i]),
                         ' ') AS ws
  FROM (SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        WHERE tok <> '' GROUP BY 1))"""
    ]
    prev = "words0"
    for t in range(1, N_MERGES + 1):
        blocks.append(
            f"""ex{t} AS (
  SELECT freq, l, unnest(range(1, len(l))) AS i
  FROM (SELECT freq, string_split(ws, ' ') AS l FROM {prev})),
pairs{t} AS (
  SELECT l[i] AS a, l[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM ex{t} GROUP BY 1, 2),
best{t} AS (SELECT a, b, cnt FROM pairs{t} ORDER BY cnt DESC, a, b LIMIT 1),
words{t} AS (
  SELECT word, freq,
         list_reduce(string_split(ws, ' '),
           (acc, x) -> CASE WHEN (acc = bt.a OR ends_with(acc, ' ' || bt.a))
                            AND x = bt.b
                       THEN acc || x ELSE acc || ' ' || x END) AS ws
  FROM {prev} CROSS JOIN best{t} bt)"""
        )
        prev = f"words{t}"
    return ",\n".join(blocks)


def _bpe_train_oracle_sql() -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {t} AS step, a AS pair_a, b AS pair_b, a || b AS merged, cnt"
        f" FROM best{t}"
        for t in range(1, N_MERGES + 1)
    )
    return f"WITH {_bpe_cte_chain()}\nSELECT * FROM (\n{union}\n)"


def _bpe_tokenize_oracle_sql() -> str:
    return f"""
WITH {_bpe_cte_chain()},
vocab AS (
  SELECT word, CAST(len(string_split(ws, ' ')) AS BIGINT) AS n_syms
  FROM words{N_MERGES}
),
toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens
FROM toks JOIN vocab USING (word)
WHERE word <> ''
GROUP BY doc_id
"""


BPE_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "text_bpe_train": (text_bpe_train, _bpe_train_oracle_sql()),
    "text_bpe_tokenize": (text_bpe_tokenize, _bpe_tokenize_oracle_sql()),
}
