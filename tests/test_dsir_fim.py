"""q122 (DSIR importance weights) and q123 (FIM transform) against
exact Python recomputes of the same math over the same parquet corpus —
independent of both Spark and DuckDB."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from etl_data_warehouse_spark.sources.catalog import load_table


def _doc_tokens(spark, sf_dir) -> dict[int, list[str]]:
    return {
        r["doc_id"]: re.split(r" +", r["text"].strip())
        for r in load_table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .collect()
    }


def _md5_long(salt: str, key) -> int:
    h = hashlib.md5(f"{salt}{key}".encode()).hexdigest()
    return int(h[:8], 16)


class TestDsirWeights:
    def test_matches_python_recompute(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.mixture import (
            _DSIR_BUCKETS,
            _DSIR_TARGET_PCT,
            q122_dsir_weights,
        )

        toks = _doc_tokens(spark, sf_dir)
        t_counts: Counter = Counter()
        r_counts: Counter = Counter()
        doc_feats: dict[int, Counter] = {}
        for doc_id, tok in toks.items():
            if len(tok) < 2:
                continue
            is_target = _md5_long("dsir_t", doc_id) % _DSIR_TARGET_PCT == 0
            feats = Counter(
                _md5_long("dsir_f", f"{a} {b}") % _DSIR_BUCKETS
                for a, b in zip(tok, tok[1:])
            )
            if is_target:
                t_counts.update(feats)
            else:
                r_counts.update(feats)
                doc_feats[doc_id] = feats
        n_t, n_r = sum(t_counts.values()), sum(r_counts.values())

        def weight(feats: Counter) -> float:
            w = 0.0
            for b, cnt in feats.items():
                lt = round(
                    math.log((t_counts[b] + 1) / (n_t + _DSIR_BUCKETS)), 9
                )
                lr = round(
                    math.log((r_counts[b] + 1) / (n_r + _DSIR_BUCKETS)), 9
                )
                w += cnt * (lt - lr)
            return w

        rows = q122_dsir_weights(spark, sf_dir).collect()
        assert {r["doc_id"] for r in rows} == set(doc_feats)
        assert [r["dsir_rank"] for r in rows] == list(range(1, len(rows) + 1))
        by_weight = sorted(
            rows, key=lambda r: (-r["log_weight"], r["doc_id"])
        )
        assert [r["doc_id"] for r in by_weight] == [
            r["doc_id"] for r in rows
        ]
        for r in rows:
            feats = doc_feats[r["doc_id"]]
            assert r["n_feats"] == sum(feats.values())
            assert r["n_feats"] == len(toks[r["doc_id"]]) - 1
            assert r["n_buckets"] == len(feats)
            assert r["log_weight"] == pytest.approx(
                weight(feats), abs=1e-6
            )

    def test_single_shared_explode_in_final_plan(self, spark, sf_dir):
        """The corpus scan+explode+(doc,bucket)-agg subplan must be
        SHARED between the model branch and the scoring branch
        (ReuseExchange / AQE stage reuse) — a pushed-down filter or an
        implicit join null-filter in one branch silently doubles the
        corpus pass (how the first cut of q122 shipped)."""
        from etl_data_warehouse_spark.plans.mixture import (
            q122_dsir_weights,
        )

        # Plan-shape assertions need a cache-free catalog: an earlier
        # test module's `load_table(...).cache()` (test_extensions'
        # corpus fixture — CacheManager is SHARED across sessions)
        # substitutes an all-column InMemoryRelation into ONE branch's
        # scan pattern and silently splits the shared subplan into two
        # Generate explode passes (observed in the r14 sharded run
        # whenever both files land in one worker).
        spark.catalog.clearCache()
        df = q122_dsir_weights(spark, sf_dir)
        df.collect()  # a write would spawn its OWN QueryExecution
        final = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert final.count("Generate explode") == 1


class TestFimTransform:
    def test_matches_python_recompute(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.llm_ops import (
            q123_fim_transform,
        )

        toks = _doc_tokens(spark, sf_dir)
        rows = q123_fim_transform(spark, sf_dir).collect()
        expected_ids = sorted(d for d, t in toks.items() if len(t) >= 3)
        assert [r["doc_id"] for r in rows] == expected_ids
        for r in rows:
            tok = toks[r["doc_id"]]
            n = len(tok)
            cut1 = 1 + _md5_long("fim1", r["doc_id"]) % (n - 2)
            cut2 = cut1 + 1 + _md5_long("fim2", r["doc_id"]) % (n - 1 - cut1)
            assert (r["n_tokens"], r["cut1"], r["cut2"]) == (n, cut1, cut2)
            assert 1 <= cut1 < cut2 <= n - 1
            fim = (
                "<PRE> "
                + " ".join(tok[:cut1])
                + " <SUF> "
                + " ".join(tok[cut2:])
                + " <MID> "
                + " ".join(tok[cut1:cut2])
            )
            assert r["fim_bytes"] == len(fim.encode())
            assert r["fim_md5"] == hashlib.md5(fim.encode()).hexdigest()


class TestSpanCorruption:
    def test_matches_python_recompute(self, spark, sf_dir):
        from etl_data_warehouse_spark.plans.llm_ops import (
            _T5_MASK_PCT,
            q125_span_corruption,
        )

        toks = _doc_tokens(spark, sf_dir)
        # r14: q125 no longer carries a presentation sort (the driver
        # compare is order-insensitive) — sort here before comparing
        rows = sorted(
            q125_span_corruption(spark, sf_dir).collect(),
            key=lambda r: r["doc_id"],
        )
        assert [r["doc_id"] for r in rows] == sorted(toks)
        for r in rows:
            tok = toks[r["doc_id"]]
            masked = [
                _md5_long("t5", f"{r['doc_id']}_{i}") % 100 < _T5_MASK_PCT
                for i in range(len(tok))
            ]
            inp, tgt, span = [], [], -1
            for i, (w, m) in enumerate(zip(tok, masked)):
                if not m:
                    inp.append(w)
                elif i == 0 or not masked[i - 1]:
                    span += 1
                    inp.append(f"<X{span}>")
                    tgt.extend([f"<X{span}>", w])
                else:
                    tgt.append(w)
            input_text, target_text = " ".join(inp), " ".join(tgt)
            assert r["n_tokens"] == len(tok)
            assert r["n_masked"] == sum(masked)
            assert r["n_spans"] == span + 1
            assert r["input_md5"] == hashlib.md5(input_text.encode()).hexdigest()
            assert r["target_md5"] == hashlib.md5(
                target_text.encode()
            ).hexdigest()
            assert r["input_bytes"] == len(input_text.encode())
            assert r["target_bytes"] == len(target_text.encode())
