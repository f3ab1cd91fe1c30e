"""Differential check of strip_boilerplate and curate_corpus against an
independent pure-Python reimplementation over hostile shapes: NULL
host/text, empty lines (trailing-newline artifacts shared across a
host's docs — classic boilerplate), the same line repeated WITHIN one
document (counts once toward line_docs, strips every occurrence),
single-doc hosts, and exact threshold boundaries.
"""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from parquet_go_spark.ops.curate import curate_corpus, strip_boilerplate


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(20260823)
    rows: list[tuple[int, str | None, str | None]] = []
    footers = ["© example site", "cookie banner text", ""]
    i = 0
    for host_id in range(6):
        host = f"host{host_id}.example"
        n_docs = rng.choice([1, 2, 3, 8, 12])
        for _ in range(n_docs):
            lines = [f"unique content {i} line {j}" for j in range(rng.randrange(0, 4))]
            # host-wide boilerplate on a fraction of docs
            for f in footers:
                if rng.random() < 0.7:
                    lines.append(f)
            # same line twice within ONE doc
            if rng.random() < 0.3 and lines:
                lines.append(lines[0])
            rng.shuffle(lines)
            rows.append((i, "\n".join(lines), host))
            i += 1
    rows += [
        (900, None, "host0.example"),  # NULL text passthrough
        (901, "some text\n© example site", None),  # NULL host passthrough
        (902, None, None),
    ]
    return rows


def _strip_py(rows, max_ratio=0.3, min_docs=2):
    out = {}
    host_docs: dict[str, set[int]] = {}
    line_docs: dict[tuple[str, str], set[int]] = {}
    for i, text, host in rows:
        if text is None or host is None:
            continue
        host_docs.setdefault(host, set()).add(i)
        for line in text.split("\n"):
            line_docs.setdefault((host, line), set()).add(i)
    bp = {
        (h, l)
        for (h, l), docs in line_docs.items()
        if len(docs) >= min_docs and len(docs) > len(host_docs[h]) * max_ratio
    }
    for i, text, host in rows:
        if text is None or host is None:
            out[i] = (host, text if text is not None else "", 0)
            continue
        kept, removed = [], 0
        for line in text.split("\n"):
            if (host, line) in bp:
                removed += 1
            else:
                kept.append(line)
        out[i] = (host, "\n".join(kept), removed)
    return out


def test_strip_boilerplate_differential(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["source"], r["clean_text"], r["n_lines_removed"])
        for r in strip_boilerplate(df).collect()
    }
    want = _strip_py(corpus)
    assert set(got) == set(want)
    mismatches = {i: (got[i], want[i]) for i in want if got[i] != want[i]}
    assert not mismatches, dict(list(mismatches.items())[:3])
    # the fixture must actually exercise stripping
    assert any(v[2] > 0 for v in want.values())


def test_curate_corpus_differential(spark, corpus):
    rows = [(i, t, "en") for i, t, _h in corpus]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dups"])
        for r in curate_corpus(df, min_ttr=0.3, max_punct=0.5).collect()
    }
    groups: dict[str, list[int]] = {}
    for i, t, _l in rows:
        if t is not None:
            groups.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(i)
    want = {}
    texts = {i: t for i, t, _l in rows}
    for ids in groups.values():
        rep = min(ids)
        t = texts[rep]
        words = t.split(" ")
        ttr = len(set(words)) / len(words)
        punct = len(re.findall("[.,;:!?]", t)) / max(len(t), 1)
        if ttr >= 0.3 and punct <= 0.5:
            want[rep] = (len(words), len(ids))
    assert got == want
    assert want, "fixture must keep documents"
