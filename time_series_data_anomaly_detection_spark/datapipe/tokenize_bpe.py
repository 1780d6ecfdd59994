"""BPE tokenizer induction over a document corpus (Sennrich et al.
2016, public algorithm) — the "train the tokenizer" step of an LLM
data pipeline, expressed Spark-first.

Every production BPE trainer (HuggingFace tokenizers, SentencePiece)
has the same two-phase shape, and so does this one:

1. **Distributed**: one scan of the corpus produces the word-frequency
   table (``word -> count``).  This is the only phase that touches the
   100 TB; it is a tokenize + groupBy, fully shuffled on the word key
   with map-side partial aggregation, and its output is vocabulary-
   sized (≤ a few million rows), not corpus-sized.
2. **Local**: the merge loop runs on the (tiny, capped) word table —
   each iteration merges the most frequent adjacent symbol pair.
   Iterating over a corpus-sized frame per merge would be thousands of
   shuffles; iterating over the capped word table is how the public
   trainers do it and is exactly equivalent for the merges that matter
   (cap by frequency ⇒ the dropped tail cannot change early merges).

``bpe_pair_counts`` exposes the first merge round (adjacent CHARACTER
pairs weighted by word frequency) as pure column algebra — hash-gated
against a DuckDB oracle.  ``bpe_learn_merges`` runs the full loop.

Words here are ``[a-z0-9]+`` runs of the lowercased text (the word
boundary convention of the engine's TOKEN_RE, minus punctuation — BPE
learns within words).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORD_RE = r"[a-z0-9]+"


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed phase: ``word -> count`` in one scan + one shuffle."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 200
) -> DataFrame:
    """First BPE round: adjacent character-pair counts, frequency-
    weighted, top ``top_n`` by ``(count desc, pair asc)``.

    All native column algebra over the word table (explode of 2-char
    substrings), so it stays in whole-stage codegen; the explode
    multiplies the WORD table (vocab-sized), never the corpus.
    """
    wf = word_freq_table(df, text_col)
    pairs = (
        wf.where(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.substring(F.col("word"), i, 2),
                )
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )
    # deterministic top-N set: total order (cnt desc, pair asc)
    return (
        pairs.orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(top_n)
        .select("pair", F.col("cnt").cast("long").alias("cnt"))
    )


def _merge_loop(
    words: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Local phase: greedy highest-count merge, ties broken by the
    lexicographic pair — deterministic.  Returns
    ``(rank, left, right, count_at_merge)``.

    Incremental pair-count maintenance (the classic Sennrich trainer
    index: pair → count plus pair → containing-word set): the full
    corpus-wide count runs ONCE; each merge then touches only the
    words that actually contain the chosen pair, subtracting their old
    adjacent-pair contributions and adding the new ones.  Bit-exact
    equivalent of recounting from scratch every round (pinned by
    ``test_bpe_merge_loop_known_corpus`` and the incremental-vs-naive
    sweep in ``test_datapipe.py``) but ~10x faster on the 30k-word
    vocab head — recount-per-merge was the single heaviest bench cost
    of ``corpus_to_batches_bpe`` (r08 verdict item #3)."""
    merges: list[tuple[int, str, str, int]] = []
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for k, (syms, freq) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pr = (a, b)
            counts[pr] = counts.get(pr, 0) + freq
            s = where.get(pr)
            if s is None:
                where[pr] = {k}
            else:
                s.add(k)
    for rank in range(n_merges):
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        merged = left + right
        best = (left, right)
        for k in sorted(where.get(best, ())):
            syms, freq = words[k]
            # retract this word's adjacent pairs from the index
            for pr in zip(syms, syms[1:]):
                c = counts[pr] - freq
                if c:
                    counts[pr] = c
                else:
                    del counts[pr]
                    del where[pr]
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[k] = (out, freq)
            # re-add the merged word's pairs
            for pr in zip(out, out[1:]):
                counts[pr] = counts.get(pr, 0) + freq
                s = where.get(pr)
                if s is None:
                    where[pr] = {k}
                else:
                    s.add(k)
            # drop stale membership: pairs this word no longer contains
            still = set(zip(out, out[1:]))
            for pr in set(zip(syms, syms[1:])) - still:
                s = where.get(pr)
                if s is not None:
                    s.discard(k)
    return merges


def bpe_learn_merges(
    df: DataFrame,
    spark: SparkSession,
    n_merges: int = 50,
    max_words: int = 30000,
    text_col: str = "text",
) -> DataFrame:
    """Full BPE training: distributed word count, local merge loop.

    ``max_words`` caps the driver-side table at the most frequent words
    (ties broken by word text) — the standard trainer memory bound.
    Output: ``(merge_rank, left, right, merged, pair_count)``.
    """
    wf_rows = (
        word_freq_table(df, text_col)
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    words = [(list(r["word"]), int(r["freq"])) for r in wf_rows]
    merges = _merge_loop(words, n_merges)
    return spark.createDataFrame(
        [(r, l, rt, l + rt, c) for (r, l, rt, c) in merges],
        "merge_rank int, left string, right string, merged string, pair_count long",
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard greedy BPE apply: repeatedly merge the present pair
    with the LOWEST merge rank until none applies."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_idx = -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_idx = r, j
        if best_rank is None:
            break
        left, right = syms[best_idx], syms[best_idx + 1]
        merged = left + right
        out = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                out.append(merged)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_encode_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Apply a learned merge list to every document: per-doc BPE token
    count, word count, and chars-per-token compression — the
    distributed APPLY side of tokenizer training (the merge table is
    broadcast; encoding runs in Arrow batches via ``mapInPandas``;
    per-batch word memoization collapses the Zipf head so each unique
    word is encoded once per batch).

    ``keep_cols`` are carried through the Arrow batches verbatim —
    downstream consumers (sequence packing needs ``source``) then skip
    a second corpus scan + join against the encoder output.
    """
    import re

    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    word_re = re.compile(WORD_RE)

    def encode_batches(it):
        memo: dict[str, int] = {}
        for pdf in it:
            n_tok = []
            n_words = []
            n_chars = []
            for text in pdf[text_col].astype(str):
                words = word_re.findall(text.lower())
                total = 0
                chars = 0
                for w in words:
                    cnt = memo.get(w)
                    if cnt is None:
                        cnt = len(_encode_word(w, ranks))
                        memo[w] = cnt
                    total += cnt
                    chars += len(w)
                n_tok.append(total)
                n_words.append(len(words))
                n_chars.append(chars)
            out = {
                "doc_id": pdf["doc_id"],
                "n_bpe_tokens": pd.array(n_tok, dtype="int64"),
                "n_words": pd.array(n_words, dtype="int64"),
                "chars_per_token": [
                    (c / t) if t else 0.0 for c, t in zip(n_chars, n_tok)
                ],
            }
            for c in keep_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    keep_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in keep_cols
    )
    return df.select("doc_id", text_col, *keep_cols).mapInPandas(
        encode_batches,
        "doc_id long, n_bpe_tokens long, n_words long, chars_per_token double"
        + keep_schema,
    )
