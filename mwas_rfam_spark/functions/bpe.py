"""Byte-pair-encoding tokenizer kernel (pure Python, deterministic).

The classic Sennrich et al. 2016 word-level BPE: words split into
characters plus an end-of-word marker, then the most frequent adjacent
symbol pair is merged repeatedly until the vocabulary budget is spent.
Ties break lexicographically so training is deterministic across runs
and platforms.

This is the driver/executor-side kernel behind operators/tokenize.py:
training runs on a BOUNDED sample driver-side (the industry norm — a
tokenizer is parameters, like PQ codebooks, not a data-scale object),
and encoding runs inside Arrow-batched ``mapInPandas`` with the merge
table broadcast.
"""

from __future__ import annotations

from collections import Counter

EOW = "</w>"


def word_frequencies(texts: list[str]) -> Counter:
    """Whitespace word frequencies over a text sample (lowercased —
    matching the engine's normalize_text convention)."""
    freq: Counter = Counter()
    for t in texts:
        if t:
            freq.update(t.lower().split())
    return freq


def train_bpe(word_freq: Counter, num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from word frequencies. Returns the
    merge list in rank order (earlier = higher priority)."""
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    # each word as a tuple of symbols; chars + end-of-word marker
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], n) for w, n in word_freq.items() if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, n in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # deterministic: most frequent pair, ties to the
        # lexicographically smallest
        pair = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        joined = pair[0] + pair[1]
        for syms, _n in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    syms[i : i + 2] = [joined]
                else:
                    i += 1
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one (lowercase) word with a merge-rank table: repeatedly
    merge the lowest-rank adjacent pair — exactly the training order,
    so training data re-encodes to the training segmentation."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_text(
    text: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, list[str]] | None = None,
) -> list[str]:
    """Encode whitespace-split lowercased text; ``cache`` memoizes per
    distinct word (Zipf makes this the dominant cost saver)."""
    if not text:
        return []
    out: list[str] = []
    for w in text.lower().split():
        if cache is not None:
            toks = cache.get(w)
            if toks is None:
                toks = encode_word(w, ranks)
                cache[w] = toks
        else:
            toks = encode_word(w, ranks)
        out.extend(toks)
    return out


def decode_tokens(tokens: list[str]) -> str:
    """Inverse of :func:`encode_text` up to whitespace collapsing and
    lowercasing: concatenate, split words at end-of-word markers."""
    return "".join(tokens).replace(EOW, " ").strip()


def ranks_from_merges(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


UNK = "<unk>"


def vocab_from_merges(
    merges: list[tuple[str, str]], alphabet: "list[str] | None" = None
) -> list[str]:
    """Deterministic vocabulary induced by a merge list: id 0 is the
    reserved ``<unk>``, then the end-of-word marker, then the sorted
    base alphabet, then merged symbols in rank order.

    Arbitrary unicode means the single-character base set is not
    enumerable a priori — pass ``alphabet`` (the distinct characters of
    the corpus after the lowercase whitespace normalization; a tiny
    relation to compute at any scale) for full coverage. Without it the
    base set is recovered from the merges' own symbols, and characters
    that never participated in a merge encode as ``<unk>``."""
    base: set[str] = set()
    for a, b in merges:
        for side in (a, b):
            for ch in side.replace(EOW, ""):
                base.add(ch)
    for ch in alphabet or []:
        if ch != EOW:
            base.add(ch)
    vocab = [UNK, EOW] + sorted(base)
    vocab += [a + b for a, b in merges]
    # dedupe preserving first occurrence (keeps ids stable even on
    # degenerate merge lists)
    seen: set[str] = set()
    out = []
    for t in vocab:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out
