"""BPE merge learning (operators/bpe.py) vs a pure-Python reference
implementation of the public algorithm (Sennrich et al. 2016). The
full-corpus path is driver-attested by the `bpe_merges` registry query
(unrolled-SQL DuckDB oracle); these tests pin the algorithm edges."""

from __future__ import annotations

import re
from collections import Counter

from cassandra_pv_archiver_spark.operators import bpe


def _ref_merges(texts, n=4, max_words=500, maxlen=16):
    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w and re.fullmatch(r"[a-z]+", w) and len(w) <= maxlen:
                words[w] += 1
    vocab = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    syms = {w: [*w, bpe.EOW] for w, _ in vocab}
    cnt = dict(vocab)
    out = []
    for rank in range(1, n + 1):
        pc = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt[w]
        if not pc:
            break
        (l, r), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append((rank, l, r, l + r, c))
        for w, s in syms.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return out


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_learn_matches_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the hat and the cat chat",
        "that that hat is THE hat!",
    ]
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe.bpe_learn(_docs_df(spark, texts), n_merges=4).collect()
    ]
    assert got == _ref_merges(texts)


def test_greedy_nonoverlapping_merge(spark):
    # 'aaaa' + merge (a,a) must become [aa, aa, </w>], never
    # [aa, a, a, </w>]: a wrong merge would make round 2's argmax
    # ('a', '</w>') — the observed ('aa', '</w>') pins the greedy fold
    # ('</w>' sorts before letters, so it beats the tied ('aa', 'aa'))
    texts = ["aaaa aaaa aaaa"]
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe.bpe_learn(_docs_df(spark, texts), n_merges=2).collect()
    ]
    assert got == [(1, "a", "a", 9), (2, "aa", "</w>", 3)]


def test_word_frequency_weighting(spark):
    # 'zz' x 5 outweighs 'qx qx qx'; among zz's two tied pairs the
    # lexicographically smaller ('z', '</w>') wins
    texts = ["zz zz zz zz zz qx qx qx"]
    got = bpe.bpe_learn(_docs_df(spark, texts), n_merges=1).collect()
    assert (got[0]["lhs"], got[0]["rhs"], got[0]["pair_count"]) == ("z", "</w>", 5)


def test_tie_breaks_lexicographic(spark):
    # every pair counts 1; ('a','b') is the lexicographic minimum
    # (word-final pairs all have 'y'/'z' on the left here)
    texts = ["abz bay"]
    got = bpe.bpe_learn(_docs_df(spark, texts), n_merges=1).collect()
    assert (got[0]["lhs"], got[0]["rhs"]) == ("a", "b")


def test_apply_compression_counts(spark):
    texts = ["the the the", "cat"]
    merges_df = bpe.bpe_learn(_docs_df(spark, texts), n_merges=3)
    merges = [(r["lhs"], r["rhs"]) for r in merges_df.collect()]
    got = {
        r["doc_id"]: (r["base_symbols"], r["bpe_tokens"])
        for r in bpe.bpe_apply(_docs_df(spark, texts), merges).collect()
    }
    # python reference apply
    for doc_id, t in enumerate(texts):
        base = bpe_tokens = 0
        for w in re.split(r"\s+", t.lower()):
            if not (w and re.fullmatch(r"[a-z]+", w)):
                continue
            s = [*w, bpe.EOW]
            base += len(s)
            for l, r in merges:
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        ns.append(l + r)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                s = ns
            bpe_tokens += len(s)
        assert got[doc_id] == (base, bpe_tokens), doc_id
    # merges actually compress
    assert got[0][1] < got[0][0]
