#!/usr/bin/env python3
"""Independent reference BPE (Sennrich et al. 2016) used to DERIVE the
pinned oracle fixtures for t19_bpe_merges / t21_bpe_encode. Tie-break:
highest count, then (left, right) lexicographic ascending — the same
deterministic rule graft.text.Bpe documents.

Usage: python3 tools/ref_bpe.py            # prints fixture merges+encodes
"""
from collections import Counter

EOW = "</w>"


def pair_counts(vocab):
    pc = Counter()
    for syms, w in vocab:
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += w
    return pc


def merge_once(syms, pair):
    out = []
    for s in syms:
        if out and out[-1] == pair[0] and s == pair[1]:
            out[-1] = pair[0] + pair[1]
        else:
            out.append(s)
    return out


def learn(words, k):
    vocab = [(list(w) + [EOW], c) for w, c in words.items()]
    merges = []
    for _ in range(k):
        pc = pair_counts(vocab)
        best = max(pc.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0][0]], [-ord(c) for c in kv[0][1]]))
        # max with count, then lexicographically SMALLEST pair: invert via sort
        cands = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        best = cands[0]
        if best[1] < 2:
            break
        merges.append(best[0])
        vocab = [(merge_once(s, best[0]), c) for s, c in vocab]
    return merges


def encode_word(word, merges):
    syms = list(word) + [EOW]
    for m in merges:
        syms = merge_once(syms, m)
    return syms


if __name__ == "__main__":
    corpus = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn(corpus, 8)
    print("merges:")
    for i, (a, b) in enumerate(merges):
        print(f"  {i}: ({a!r}, {b!r})")
    print("encodes:")
    for w in sorted(corpus):
        print(f"  {w}: {encode_word(w, merges)}")
    for w in ["lowest", "newer", "wide", "zz"]:
        print(f"  unseen {w}: {encode_word(w, merges)}")
