"""Code-corpus curation (operators/code.py): language ID fires on real
snippets, license gates on real headers, quality screens on planted
pathologies, and the FIM split reassembles and matches an independent
pure-Python md5 replay."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sstable_migrator_spark.operators.code import (
    code_lang_id,
    code_quality_flags,
    fim_split,
    license_flags,
)

SNIPPETS = {
    "c": '#include <stdio.h>\nint main(void) {\n  printf("hi\\n");\n  return 0;\n}\n',
    "go": 'package main\n\nimport "fmt"\n\nfunc main() {\n\tx := 1\n\tfmt.Println(x)\n}\n',
    "java": (
        "public class Hello {\n  public static void main(String[] a) {\n"
        '    System.out.println("hi");\n  }\n}\n'
    ),
    "javascript": (
        "const add = (a, b) => a + b;\nfunction main() {\n"
        "  console.log(add(1, 2));\n}\n"
    ),
    "python": "#!/usr/bin/env python\nimport os\n\ndef main(self):\n    return os.getcwd()\n",
    "rust": 'fn main() {\n    let mut x = 1;\n    println!("{}", x);\n}\n',
    "shell": '#!/bin/bash\nif [ -f x ]; then\n  echo "${HOME}"\nfi\n',
}


def test_lang_id_detects_each_language(spark):
    rows = [(i, lang, text) for i, (lang, text) in enumerate(SNIPPETS.items())]
    docs = spark.createDataFrame(rows, "doc_id long, want string, text string")
    got = {r["doc_id"]: r for r in code_lang_id(docs).collect()}
    for i, (lang, _) in enumerate(SNIPPETS.items()):
        assert got[i]["lang_guess"] == lang, (lang, dict(got[i].asDict()))
        assert got[i]["lang_score"] >= 2


def test_lang_id_prose_is_unknown(spark):
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog near the river."),
            (2, "We met at the cafe; the espresso was excellent, as always."),
        ],
        "doc_id long, text string",
    )
    got = code_lang_id(docs).collect()
    assert all(r["lang_guess"] == "unknown" for r in got), got


def test_lang_id_tie_breaks_alphabetically(spark):
    # One weight-2 signal from javascript and one from rust -> tie at
    # 2; javascript sorts first.
    docs = spark.createDataFrame(
        [(1, "console.log and also println! in one doc")],
        "doc_id long, text string",
    )
    (r,) = code_lang_id(docs).collect()
    assert r["score_javascript"] == r["score_rust"] == 2
    assert r["lang_guess"] == "javascript"


def test_license_flags(spark):
    mit = (
        "Copyright (c) 2020 A. Person\n\nPermission is hereby granted, "
        "free of charge, to any person obtaining a copy..."
    )
    gpl = (
        "This program is free software: you can redistribute it under "
        "the terms of the GNU General Public License."
    )
    spdx_mit = "// SPDX-License-Identifier: MIT\nint x;"
    spdx_gpl = "# SPDX-License-Identifier: GPL-3.0-only\nx = 1"
    spdx_lgpl = "/* SPDX-License-Identifier: LGPL-2.1 */"
    bare = "def f():\n    return 1\n"
    docs = spark.createDataFrame(
        list(enumerate([mit, gpl, spdx_mit, spdx_gpl, spdx_lgpl, bare])),
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in license_flags(docs).collect()}
    assert got[0]["is_permissive"] == 1 and got[0]["keep"] == 1
    assert got[0]["has_copyright"] == 1
    assert got[1]["is_copyleft"] == 1 and got[1]["keep"] == 0
    assert got[2]["spdx_id"] == "MIT" and got[2]["is_permissive"] == 1
    assert got[3]["spdx_id"] == "GPL-3.0-only" and got[3]["is_copyleft"] == 1
    assert got[4]["is_copyleft"] == 1
    assert got[5]["spdx_id"] == "" and got[5]["keep"] == 1
    assert got[5]["is_permissive"] == 0 and got[5]["has_copyright"] == 0


def test_quality_flags_each_screen_fires(spark):
    good = "\n".join(f"let x{i} = {i} + {i};" for i in range(20))
    long_line = good + "\n" + "x" * 1001
    dense = "\n".join("y" * 400 for _ in range(10))
    symbols = "\n".join("+-*/ ~!@ #$%^ &*() []{}" for _ in range(10))
    autogen = "// AUTO-GENERATED file, DO NOT EDIT\n" + good
    blob = good + "\n" + "ABCDEF0123456789" * 10  # 160-char unbroken run
    docs = spark.createDataFrame(
        list(enumerate([good, long_line, dense, symbols, autogen, blob])),
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in code_quality_flags(docs).collect()}
    assert got[0]["keep"] == 1, dict(got[0].asDict())
    assert got[1]["f_max_line"] == 0
    assert got[2]["f_mean_line"] == 0
    assert got[3]["f_alnum"] == 0
    assert got[4]["f_autogen"] == 1 and got[4]["keep"] == 0
    assert got[5]["f_blob"] == 1 and got[5]["keep"] == 0
    for d in (1, 2, 3, 4, 5):
        assert got[d]["keep"] == 0, d


def test_quality_counters_exact(spark):
    text = "ab\ncdef\n"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = code_quality_flags(docs).collect()
    assert r["n_lines"] == 3  # 'ab', 'cdef', ''
    assert r["max_line_chars"] == 4
    assert r["n_chars"] == 8
    assert r["n_alnum"] == 6


def _fim_replay(doc_id: int, text: str, seed: int = 7):
    """Independent pure-Python replay of the md5 cut-point rule."""
    n = len(text)

    def cut(tag: str) -> int:
        h = hashlib.md5(f"{doc_id}:{seed}:{tag}".encode()).hexdigest()
        return int(h[:15], 16) % (n + 1)

    a, b = cut("a"), cut("b")
    lo, hi = min(a, b), max(a, b)
    return lo, hi, f"<PRE>{text[:lo]}<SUF>{text[hi:]}<MID>{text[lo:hi]}"


def test_fim_matches_python_replay_and_reassembles(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    rows = fim_split(docs).collect()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(rows) == len(src)
    for r in rows:
        text = src[r["doc_id"]]
        lo, hi, want = _fim_replay(r["doc_id"], text)
        assert (r["cut_lo"], r["cut_hi"]) == (lo, hi)
        assert r["fim_text"] == want
        # reassembly: prefix + middle + suffix == text
        pre = r["fim_text"][len("<PRE>") : r["fim_text"].index("<SUF>")]
        rest = r["fim_text"][r["fim_text"].index("<SUF>") + len("<SUF>") :]
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == text


def test_fim_empty_and_unicode(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "héllo wörld ünïcode")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in fim_split(docs).collect()}
    assert got[1]["fim_text"] == "<PRE><SUF><MID>"
    lo, hi, want = _fim_replay(2, "héllo wörld ünïcode")
    assert got[2]["fim_text"] == want  # char-based, never mid-rune


def test_all_map_only(spark):
    """The whole family is projection-only: no exchange in any plan."""
    docs = spark.createDataFrame(
        [(1, "x = 1\n")], "doc_id long, text string"
    )
    for fn in (code_lang_id, license_flags, code_quality_flags, fim_split):
        plan = fn(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (fn.__name__, plan[:400])
