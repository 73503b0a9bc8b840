"""Distributed BPE training loop vs a pure-Python reference
implementation (Sennrich et al. recipe, deterministic tie-break)."""

from __future__ import annotations

from collections import Counter

from sstable_migrator_spark.functions.bpe import encode_word, train_bpe


def _ref_train(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # (count desc, a asc, b asc)
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_train_bpe_matches_reference(spark):
    corpus = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "low lower newest",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                                 "doc_id long, text string")
    wc: Counter = Counter(w for t in corpus for w in t.split())
    expect = _ref_train(dict(wc), 10)
    got = train_bpe(docs, n_merges=10)
    assert got == expect
    # determinism: retraining reproduces the identical tokenizer
    assert train_bpe(docs, n_merges=10) == got


def test_encode_word_priority_order():
    # merge order IS priority: earlier merges apply first
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    assert encode_word("lowest", merges) == ["low", "est"]
    assert encode_word("low", merges) == ["low"]
    assert encode_word("xyz", merges) == ["x", "y", "z"]


def test_train_bpe_exhausts_small_corpus(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    got = train_bpe(docs, n_merges=10)
    assert got == [("a", "b")]  # after merging 'ab', no pairs remain


def test_bpe_encode_docs(spark):
    from sstable_migrator_spark.functions.bpe import bpe_encode_docs

    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    docs = spark.createDataFrame(
        [(0, "lowest low"), (1, "test"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["pieces"], r["n_pieces"])
           for r in bpe_encode_docs(docs, merges).collect()}
    assert out[0] == (["low", "est", "low"], 3)
    assert out[1] == (["t", "est"], 2)
    assert out[2] == ([], 0)


def test_bpe_artifact_roundtrip(tmp_path):
    """The tokenizer artifact contract: merges round-trip in order,
    digests verify, corruption fails loudly."""
    import json

    import pytest as _pytest

    from sstable_migrator_spark.functions.bpe import load_bpe, save_bpe

    merges = [("t", "h"), ("th", "e"), ("a", "n")]
    p = str(tmp_path / "tok.json")
    save_bpe(merges, p)
    assert load_bpe(p) == merges
    with open(p) as fh:
        art = json.load(fh)
    art["merges"][0] = ["x", "y"]  # tamper
    with open(p, "w") as fh:
        json.dump(art, fh)
    with _pytest.raises(ValueError, match="digest"):
        load_bpe(p)
    art["version"] = 99
    with open(p, "w") as fh:
        json.dump(art, fh)
    with _pytest.raises(ValueError, match="version"):
        load_bpe(p)
