"""Iterated BPE trainer (operators/bpe.py) vs a pure-Python reference
implementation on a planted corpus, plus the persisted-state resume
protocol."""

from __future__ import annotations

import os
import re
from collections import Counter

import pytest

from etl_data_warehouse_spark.operators import bpe


def _python_bpe(texts: list[str], n_merges: int):
    """Classic dictionary BPE, straight from the Sennrich algorithm:
    the independent oracle for the Spark trainer."""
    words = Counter()
    for t in texts:
        for w in re.split(r" +", t.strip()):
            if len(w) >= 2:
                words[w] += 1
    state = {w: tuple(w) for w in words}
    merges = []
    for step in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        # count desc, then (left, right) asc — the trainer's tiebreak
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append(
            {"step": step, "left": left, "right": right, "pair_count": cnt}
        )
        merged = left + right
        new_state = {}
        for w, syms in state.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            new_state[w] = tuple(out)
        state = new_state
    return merges, state, words


_PLANTED = [
    "the cat sat on the mat with the other cat",
    "low lower lowest slow slowly",
    "aaa aaaa aa aaa banana bananas",  # overlap-heavy: greedy matters
    "the lowest cat sat slowly on bananas",
]


class TestTrainBpe:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(_PLANTED)],
            "doc_id long, text string",
        )

    def test_matches_python_reference(self, spark, docs):
        k = 12
        got = bpe.train_bpe(docs, k)
        want, _state, _words = _python_bpe(_PLANTED, k)
        assert got == want

    def test_final_segmentation_matches(self, spark, docs):
        k = 8
        merges = bpe.train_bpe(docs, k)
        _want_merges, want_state, _w = _python_bpe(_PLANTED, k)
        seg = bpe.segment_words(
            bpe.word_freq_dictionary(docs), merges
        ).collect()
        got_state = {r["word"]: tuple(r["symbols"]) for r in seg}
        assert got_state == want_state

    def test_vocabulary_freqs(self, spark, docs):
        k = 6
        merges = bpe.train_bpe(docs, k)
        state = bpe.segment_words(bpe.word_freq_dictionary(docs), merges)
        vocab = {
            r["symbol"]: r["freq"]
            for r in bpe.bpe_vocabulary(state).collect()
        }
        _m, py_state, words = _python_bpe(_PLANTED, k)
        want: Counter = Counter()
        for w, syms in py_state.items():
            for s in syms:
                want[s] += words[w]
        assert vocab == dict(want)

    def test_resume_continues_from_committed_steps(
        self, spark, docs, tmp_path
    ):
        p = str(tmp_path / "bpe_state")
        first = bpe.train_bpe(docs, 4, state_path=p)
        assert bpe._committed_steps(p) == [0, 1, 2, 3]
        # resume to 9: must NOT relearn 0-3, must match one-shot run
        more = bpe.train_bpe(docs, 9, state_path=p)
        assert more[:4] == first
        assert bpe._committed_steps(p) == list(range(9))
        oneshot = bpe.train_bpe(docs, 9)
        assert more == oneshot

    def test_crashed_step_relearned_identically(
        self, spark, docs, tmp_path
    ):
        p = str(tmp_path / "bpe_state")
        bpe.train_bpe(docs, 5, state_path=p)
        # "crash" mid-step-4: drop the commit marker
        os.remove(os.path.join(p, "step=4", "_COMMITTED"))
        assert bpe._committed_steps(p) == [0, 1, 2, 3]
        redo = bpe.train_bpe(docs, 5, state_path=p)
        assert redo == bpe.train_bpe(docs, 5)
        assert bpe._committed_steps(p) == [0, 1, 2, 3, 4]

    def test_exhausts_when_no_pairs_left(self, spark):
        tiny = spark.createDataFrame(
            [(0, "ab ab ab")], "doc_id long, text string"
        )
        merges = bpe.train_bpe(tiny, 10)
        # "ab" -> one merge fuses it into a single symbol; no pairs left
        assert [(m["left"], m["right"]) for m in merges] == [("a", "b")]


def test_segmentation_is_lossless(spark):
    """BPE decode round-trip: merges only CONCATENATE adjacent symbols
    (the initial state is the exact character split), so joining a
    word's final symbols must reproduce the word — the tokenizer's
    decode guarantee. Checked over the real sf0.001 corpus dictionary
    after a 12-merge training run."""
    from pyspark.sql import functions as F

    from etl_data_warehouse_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    words = bpe.word_freq_dictionary(docs)
    merges = bpe.train_bpe(docs, n_merges=12)
    seg = bpe.segment_words(words, merges)
    bad = seg.filter(
        F.concat_ws("", F.col("symbols")) != F.col("word")
    ).count()
    assert bad == 0
    # non-trivial: some word actually merged into fewer symbols
    merged = seg.filter(F.size("symbols") < F.length("word")).count()
    assert merged > 0
