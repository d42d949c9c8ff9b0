#!/usr/bin/env python3
"""Provenance tool for the pinned BPE-32 merge table (graft.functions.Bpe).

Learns byte-pair merges from the documents fixture's word-count table
with fully deterministic tie-breaks (pair count DESC, then pair
lexicographic ASC), prints them in merge-rank order. The repo pins the
M=32 output learned from sf0.01 as a FROZEN tokenizer artifact — the
production stance: token budgets are counted under a published, frozen
merge list (gpt2/llama style), never a tokenizer re-learned per corpus.

Fixture-fit record (r17, the sparse-cosine rule applied BEFORE
building): the fixture vocabulary is a closed 31-word set, so an
UNBOUNDED merge budget saturates — at 89 merges every word is a single
token and BPE degenerates to whitespace counting (tokens/word = 1.0),
which would have been coverage padding. At the pinned M=32 the
segmentation is genuinely sub-word (8/31 words whole, 2.85
tokens/word), so the op is real at fixture scale. Saturation sweep on
sf0.01: M=8 -> 3.74 t/w, M=16 -> 3.40, M=32 -> 2.85, M=64 -> 1.77,
M=89+ -> 1.00 (degenerate).

Usage: python3 tools/learn_bpe.py [sf_dir] [n_merges]
"""
import sys
import duckdb


def learn(vocab, n_merges):
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in words.items():
            c = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return words, merges


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    wc = duckdb.sql(
        "select w, count(*) c from (select unnest(string_split(text,' ')) w "
        f"from '{sf}/documents.parquet') group by 1").fetchall()
    vocab = {w: c for w, c in wc}
    words, merges = learn(vocab, m)
    print(f"-- {len(merges)} merges learned from {sf} ({len(vocab)} words)")
    for a, b in merges:
        print(f'("{a}", "{b}"),')
    total_tokens = sum(vocab[w] * len(s) for w, s in words.items())
    total_words = sum(vocab.values())
    whole = sum(1 for s in words.values() if len(s) == 1)
    print(f"-- tokens/word {total_tokens/total_words:.3f}, "
          f"whole-word {whole}/{len(vocab)}")


if __name__ == "__main__":
    main()
