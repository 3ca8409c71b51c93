"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016).

The scale shape matters more than the loop body: the corpus is touched
EXACTLY ONCE, collapsing to a distinct-word count table (the classic BPE
reduction — at 100 TB the corpus is ~10^11 documents but the vocabulary is
~10^7 distinct words, so every merge round runs over a table that is 4-6
orders of magnitude smaller than the input).  Each round is then

    vocab(symbols, n) ──map_batches──▶ (left, right, cnt) partials
        ──combiner groupby──▶ pair totals ──per-block argmax──▶ driver fold
    vocab ──map_batches(apply merge)──▶ vocab'   (materialized fixpoint step)

Only the winning pair (a 2-tuple) and one argmax row per block ever reach
the driver; the pair-count table itself stays distributed, so a 10^8-pair
vocabulary cannot OOM the driver.  The per-round ``materialize()`` is over
the vocab table, not the corpus — the same bounded-fixpoint pattern as
``stages.graph.connected_components``.

The per-word Python loops here run over the VOCAB table (once per distinct
word per round), not over corpus rows — the exception the repo's
no-row-loops rule allows, same as ``stages/editdist.py``'s verify kernel.

Reference anchor: the reference tokenizes prompts with pretrained HF
tokenizers (src/run_model.py:75-385 loads them per model family); this
module adds the *training* side a from-scratch corpus pipeline needs.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.arrowio import from_pandas_clean
import pyarrow.compute as pc
import ray.data

END_OF_WORD = "</w>"


def word_counts(
    docs: ray.data.Dataset, text_col: str, n_buckets: int = 8
) -> ray.data.Dataset:
    """Corpus → distinct (word, n) via per-batch combiner + one exchange.

    Whitespace tokenization matches ``analytics.word_frequency`` (RE2
    ``\\s+`` over trimmed text); empty tokens are dropped explicitly so an
    all-whitespace document contributes nothing.
    """
    from .rollup import grouped_agg

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), pattern=r"\s+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        counts = pc.value_counts(flat)
        return pa.table(
            {
                "word": counts.field("values"),
                "n": pc.cast(counts.field("counts"), pa.int64()),
            }
        )

    return grouped_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        keys=["word"],
        aggs={"n": ("n", "sum")},
        n_buckets=n_buckets,
        partial=True,
    )


def _symbolize(batch: pa.Table) -> pa.Table:
    """word → initial symbol sequence: one symbol per char + END_OF_WORD."""
    syms = [list(w) + [END_OF_WORD] for w in batch["word"].to_pylist()]
    return pa.table(
        {
            "symbols": pa.array(syms, type=pa.list_(pa.string())),
            "n": batch["n"],
        }
    )


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Per-batch adjacent-pair counts weighted by word frequency.

    Every adjacent position counts (overlapping identical pairs included:
    'aaa' yields ('a','a') twice) — Sennrich's get_stats semantics, and
    what the serial oracle recomputes.
    """
    counts: dict = {}
    ns = batch["n"].to_pylist()
    for syms, n in zip(batch["symbols"].to_pylist(), ns):
        for i in range(len(syms) - 1):
            key = (syms[i], syms[i + 1])
            counts[key] = counts.get(key, 0) + n
    if not counts:
        return pa.table(
            {
                "left": pa.array([], type=pa.string()),
                "right": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
    lefts, rights = zip(*counts.keys())
    return pa.table(
        {
            "left": pa.array(lefts, type=pa.string()),
            "right": pa.array(rights, type=pa.string()),
            "cnt": pa.array(list(counts.values()), type=pa.int64()),
        }
    )


def _block_argmax(batch: pa.Table) -> pa.Table:
    """One candidate row per block: max cnt, ties to (left asc, right asc)."""
    if batch.num_rows == 0:
        return batch
    df = batch.to_pandas()
    best = df.sort_values(
        ["cnt", "left", "right"], ascending=[False, True, True], kind="stable"
    ).iloc[:1]
    return from_pandas_clean(best, preserve_index=False)


def merge_word(symbols: list[str], left: str, right: str) -> list[str]:
    """Apply one merge left-to-right, non-overlapping (shared with oracle)."""
    out: list[str] = []
    i = 0
    m = len(symbols)
    while i < m:
        if i < m - 1 and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _train_bpe_driver(
    vocab_df: pd.DataFrame, n_merges: int, min_pair_count: int
) -> pd.DataFrame:
    """Driver fold of the SAME loop over an already-collapsed small vocab
    (same rules: overlap-inclusive pair counts, (cnt desc, left, right)
    tie-break, left-to-right non-overlap merge).  pytest pins equality
    with the distributed loop on shared inputs."""
    seqs = [list(s) for s in vocab_df["symbols"]]
    ns = vocab_df["n"].tolist()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: dict = {}
        for syms, n in zip(seqs, ns):
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pairs[k] = pairs.get(k, 0) + n
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, cnt))
        seqs = [merge_word(s, left, right) for s in seqs]
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": "int64", "pair_count": "int64"})


def train_bpe(
    docs: ray.data.Dataset,
    text_col: str,
    n_merges: int,
    n_buckets: int = 8,
    min_pair_count: int = 2,
    driver_bound_bytes: int = 64 << 20,
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges; returns (rank, left, right, pair_count).

    ``pair_count`` is the pair's corpus frequency AT MERGE TIME (before the
    merge is applied), the usual lineage record for a learned tokenizer.
    Stops early when no pair reaches ``min_pair_count``.

    Below ``driver_bound_bytes`` the collapsed vocab folds on the driver
    (driver memory is bounded by the VOCAB, never the corpus — the same
    broadcast-bound pattern as the minhash verify step): each merge round
    over a small vocab is otherwise pure fixed exchange overhead.  Above
    the bound the loop stays fully distributed.
    """
    from .rollup import grouped_agg

    vocab = (
        word_counts(docs, text_col, n_buckets=n_buckets)
        .map_batches(_symbolize, batch_format="pyarrow")
        .materialize()
    )
    if (vocab.size_bytes() or 0) <= driver_bound_bytes:
        return _train_bpe_driver(vocab.to_pandas(), n_merges, min_pair_count)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pair_totals = grouped_agg(
            vocab.map_batches(_pair_partials, batch_format="pyarrow"),
            keys=["left", "right"],
            aggs={"cnt": ("cnt", "sum")},
            n_buckets=n_buckets,
            partial=True,
        )
        # per-block argmax: only #blocks rows reach the driver
        cand = pair_totals.map_batches(
            _block_argmax, batch_format="pyarrow"
        ).to_pandas()
        if len(cand) == 0:
            break
        best = cand.sort_values(
            ["cnt", "left", "right"], ascending=[False, True, True], kind="stable"
        ).iloc[0]
        if int(best["cnt"]) < min_pair_count:
            break
        left, right = str(best["left"]), str(best["right"])
        merges.append((rank, left, right, int(best["cnt"])))

        def apply(batch: pa.Table, left=left, right=right) -> pa.Table:
            syms = [
                merge_word(s, left, right)
                for s in batch["symbols"].to_pylist()
            ]
            return pa.table(
                {
                    "symbols": pa.array(syms, type=pa.list_(pa.string())),
                    "n": batch["n"],
                }
            )

        vocab = vocab.map_batches(apply, batch_format="pyarrow").materialize()

    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": "int64", "pair_count": "int64"})


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge table (lowest rank first)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms = (
            syms[:best_i] + [syms[best_i] + syms[best_i + 1]] + syms[best_i + 2 :]
        )
    return syms


def bpe_token_counts(
    docs: ray.data.Dataset,
    text_col: str,
    merges: pd.DataFrame,
    n_buckets: int = 8,
) -> ray.data.Dataset:
    """Tokenize the corpus with a trained merge table → (token, n) counts.

    The merge table is tiny (n_merges rows) and rides the task closure;
    the corpus collapses to distinct words first, each distinct word is
    encoded ONCE, and token counts fold through one combiner exchange.
    """
    from .rollup import grouped_agg

    ranks = {
        (l, r): k
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }

    def encode_batch(batch: pa.Table) -> pa.Table:
        counts: dict = {}
        for word, n in zip(batch["word"].to_pylist(), batch["n"].to_pylist()):
            for tok in encode_word(word, ranks):
                counts[tok] = counts.get(tok, 0) + n
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    return grouped_agg(
        word_counts(docs, text_col, n_buckets=n_buckets).map_batches(
            encode_batch, batch_format="pyarrow"
        ),
        keys=["token"],
        aggs={"n": ("n", "sum")},
        n_buckets=n_buckets,
        partial=True,
    )
