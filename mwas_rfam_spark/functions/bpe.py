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
    # incremental pair statistics + pair->word index (the Sennrich
    # reference structure): the former full recount re-scanned EVERY
    # word per merge — ~num_merges x corpus passes in pure Python,
    # tens of minutes at the corpus-training defaults (r12 review
    # finding). Per affected word the delta is the difference of full
    # per-word pair Counters, so the counts are IDENTICAL to a global
    # recount (same ties, same merges — pinned tests unchanged).
    pairs: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, n) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] += n
            where.setdefault(p, set()).add(wi)
    for _ in range(num_merges):
        if not pairs:
            break
        # deterministic: most frequent pair, ties to the
        # lexicographically smallest
        pair = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        joined = pair[0] + pair[1]
        for wi in sorted(where.get(pair, ())):
            syms, n = words[wi]
            old_c: Counter = Counter(
                (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
            )
            i = 0
            changed = False
            while i < len(syms) - 1:
                if syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    syms[i : i + 2] = [joined]
                    changed = True
                else:
                    i += 1
            if not changed:
                continue  # stale index entry
            new_c: Counter = Counter(
                (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
            )
            for p in set(old_c) | set(new_c):
                d = new_c[p] - old_c[p]
                if d:
                    pairs[p] += d * n
                    if pairs[p] == 0:
                        del pairs[p]
                if new_c[p]:
                    where.setdefault(p, set()).add(wi)
                elif p in where:
                    where[p].discard(wi)
        where.pop(pair, None)
        pairs.pop(pair, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one (lowercase) word with a merge-rank table: repeatedly
    merge the lowest-rank adjacent pair (ties leftmost) — exactly the
    training order, so training data re-encodes to the training
    segmentation. Heap + linked list, O(L log L): the former rescan-
    per-merge loop was O(L^2), and one unbroken megabyte 'word'
    (sequence data, base64, minified JS) effectively hung the encode
    kernel (r12 review finding); result is identical — the heap pops
    the globally lowest (rank, leftmost-position) pair, which is what
    the scan selected."""
    import heapq

    syms = list(word) + [EOW]
    m = len(syms)
    if m < 2:
        return syms
    nxt = list(range(1, m)) + [-1]
    prv = [-1] + list(range(0, m - 1))
    alive = [True] * m
    heap = []
    for i in range(m - 1):
        r = ranks.get((syms[i], syms[i + 1]))
        if r is not None:
            heap.append((r, i))
    heapq.heapify(heap)
    while heap:
        r, i = heapq.heappop(heap)
        if not alive[i]:
            continue
        j = nxt[i]
        if j == -1:
            continue
        if ranks.get((syms[i], syms[j])) != r:
            continue  # stale entry: one side already merged away
        syms[i] = syms[i] + syms[j]
        alive[j] = False
        nxt[i] = nxt[j]
        if nxt[j] != -1:
            prv[nxt[j]] = i
        p = prv[i]
        if p != -1:
            rp = ranks.get((syms[p], syms[i]))
            if rp is not None:
                heapq.heappush(heap, (rp, p))
        q = nxt[i]
        if q != -1:
            rq = ranks.get((syms[i], syms[q]))
            if rq is not None:
                heapq.heappush(heap, (rq, i))
    return [syms[k] for k in range(m) if alive[k]]


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
    lowercasing: concatenate, split words at end-of-word markers.

    Documented limitation (r12 review): the markers are NOT escaped in
    input text — a corpus containing the literal strings '</w>' or
    '<unk>' (TEI-tagged XML, already-tokenized logs) decodes those
    spans as word boundaries / collides with the reserved unk id.
    Pre-escape such corpora before tokenization."""
    return "".join(tokens).replace(EOW, " ").strip()


def ranks_from_merges(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


class BoundedWordCache(dict):
    """Word→tokens memo with a hard entry cap enforced on EVERY insert.

    On overflow the whole memo clears: Zipf-distributed corpora
    repopulate the hot head immediately, and a full clear (vs LRU
    bookkeeping) keeps the per-insert cost O(1). The cap lives inside
    ``__setitem__`` — not in the caller's between-batch check — because a
    single high-cardinality Arrow batch (thousands of docs × many
    distinct words) could otherwise grow the memo far past the cap
    before the next check ran (r13 ADVICE item)."""

    def __init__(self, cap: int):
        super().__init__()
        if cap < 1:
            raise ValueError(f"cache cap must be >= 1, got {cap}")
        self.cap = cap

    def __setitem__(self, key, value):
        if len(self) >= self.cap:
            self.clear()
        super().__setitem__(key, value)


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
