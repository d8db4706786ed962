"""Byte-pair encoding: a real subword tokenizer (not the regex proxy in
``text.bpe_ish_token_count``), shaped for the cluster the way production
tokenizer pipelines are:

* **train on a bounded sample, driver-side** — BPE training is inherently
  sequential (each merge depends on the last), but its input is a WORD
  FREQUENCY table, which saturates long before the corpus does; a bounded
  deterministic sample gives the same merges as the full corpus for all
  frequent pairs. Same trade as IVF's sampled k-means.
* **tokenize distributed** — the learned merge ranks (a small dict) ship
  as a closure into an Arrow-batched UDF; application is embarrassingly
  parallel, the corpus never moves.

Deterministic end to end: ties in pair frequency break lexicographically,
the sample is id-ordered, and the merge algorithm is the standard
greedy-by-rank application (GPT-2 style), so the same corpus always yields
the same vocabulary and the same token counts.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame, functions as F

END = "</w>"


def train_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn an ordered merge list from a word->frequency table.

    Classic BPE (Sennrich et al. 2016): start from characters (plus an
    end-of-word marker so merges can't cross word boundaries), repeatedly
    merge the most frequent adjacent symbol pair. Ties break on the
    lexicographically smallest pair — determinism over speed."""
    vocab = {
        tuple(list(w) + [END]): f for w, f in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for symbols, f in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for symbols, f in vocab.items():
            out = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word by applying learned merges best-rank-first."""
    if not word:
        return []
    symbols = list(word) + [END]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Distributed word-frequency table — the actual scalable step of BPE
    training (one shuffle of (word, partial count))."""
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    return (
        docs.select(F.explode(F.split(t, r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe_on_corpus(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_vocab_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Distributed word counting, bounded driver-side merge learning: the
    driver holds the top ``max_vocab_words`` (by frequency, then word) —
    the head of the Zipf curve that determines every early merge — never
    the corpus."""
    wf = (
        word_frequencies(docs, text_col)
        .orderBy(F.col("freq").desc(), "word")
        .limit(max_vocab_words)
        .collect()
    )
    return train_bpe({r["word"]: r["freq"] for r in wf}, n_merges)


def bpe_token_count_udf(merges: list[tuple[str, str]]):
    """Arrow-batched per-document token count under the learned merges."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def count(texts):
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            n = 0
            for w in t.strip().lower().split():
                n += len(bpe_encode_word(w, ranks))
            out.append(n)
        return pd.Series(out, dtype="float64").astype("Int64")

    count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(count, "long")


def bpe_tokenize_udf(merges: list[tuple[str, str]]):
    """Arrow-batched full tokenization: text -> array<string> of subwords."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def toks(texts):
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            acc: list[str] = []
            for w in t.strip().lower().split():
                acc.extend(bpe_encode_word(w, ranks))
            out.append(acc)
        return pd.Series(out)

    toks.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(toks, "array<string>")


def bpe_encode_word_sequential(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Tokenize one word by applying merges IN LEARNED ORDER, each
    exhaustively left-to-right (subword-nmt / Sennrich apply_bpe
    semantics) — by construction identical to the segmentation the
    training loop itself produced, and therefore replayable in SQL as a
    chain of delimiter-wrapped string replaces (each symbol rendered
    ' sym ', pair pattern ' a  b ' -> ' ab ': matching consumes exactly
    two whole symbol units, so leftmost non-overlapping replace == the
    greedy scan, including same-symbol runs). `bpe_encode_word`
    (best-rank-first, GPT-2 style) remains the default encoder; the two
    can differ only on words where a later merge creates a string an
    earlier rule references — impossible at train time, exotic at encode
    time, but the sequential form removes the question entirely."""
    if not word:
        return []
    symbols = list(word) + [END]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(symbols):
            if (
                i + 1 < len(symbols)
                and symbols[i] == a
                and symbols[i + 1] == b
            ):
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def bpe_token_count_seq_udf(merges: list[tuple[str, str]]):
    """Arrow-batched per-document token count under SEQUENTIAL merge
    application (`bpe_encode_word_sequential`), memoized per distinct
    word within the Python worker — the oracle-exact counting tier."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    ms = [tuple(p) for p in merges]
    memo: dict[str, int] = {}

    def count(texts):
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            n = 0
            for w in t.strip().lower().split():
                c = memo.get(w)
                if c is None:
                    c = len(bpe_encode_word_sequential(w, ms))
                    memo[w] = c
                n += c
            out.append(n)
        return pd.Series(out, dtype="float64").astype("Int64")

    count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(count, "long")
