"""Smoke tests for the root eval/experiment harnesses on the CPU backend:
the scripts must run end-to-end (synthetic data fallback) and produce sane,
resumable results. Mirrors the reference's harness surface
(reference: test_ppl.py, test_mmlu.py, experiments.py)."""

import json
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_ppl_harness_runs(tiny_checkpoint):
    import test_ppl
    r = test_ppl.main(model_path=tiny_checkpoint, num_texts=6)
    assert r["ppl"] > 1.0 and r["total_tokens"] > 0


def test_ppl_quantized_close_to_bf16(tiny_checkpoint):
    import test_ppl
    base = test_ppl.main(model_path=tiny_checkpoint, num_texts=4)
    q = test_ppl.main(model_path=tiny_checkpoint, num_texts=4,
                      quant_kwargs={"quant_type": "per_row", "linear_dtype": "int8"})
    # random tiny model: per-row int8 W8A8 must stay within a few percent
    assert abs(q["ppl"] - base["ppl"]) / base["ppl"] < 0.05


def test_mmlu_harness_runs(tiny_checkpoint):
    import test_mmlu
    r = test_mmlu.main(model_path=tiny_checkpoint, num_samples=4)
    assert r["total"] == 4 and 0.0 <= r["accuracy"] <= 100.0


def test_experiment_results_resume(tmp_path):
    from experiments import ExperimentResults
    path = tmp_path / "results.jsonl"
    er = ExperimentResults(path)
    er.save_or_update({"test": "mmlu", "real": True, "quant": "row",
                       "dtype": "int8", "group_size": None, "accuracy": 50.0})
    er.save_or_update({"test": "mmlu", "real": True, "quant": "row",
                       "dtype": "int8", "group_size": None, "accuracy": 51.0})
    er.save_or_update({"test": "ppl", "real": False, "quant": "", "dtype": "bf16",
                       "group_size": None, "ppl": 33.0})
    # dedup by config key: 2 rows, the mmlu one updated in place
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(rows) == 2
    assert {r["test"]: r for r in rows}["mmlu"]["accuracy"] == 51.0
    er2 = ExperimentResults(path)
    assert er2.exists("mmlu", True, "row", "int8", None)
    assert not er2.exists("mmlu", True, "tensor", "int8", None)


def test_experiments_matmul_cli(tmp_path, monkeypatch):
    """Drive experiments.py matmul end-to-end through its CLI main()."""
    import experiments
    save = str(tmp_path / "matmul.jsonl")
    monkeypatch.setattr(sys, "argv",
                        ["experiments.py", "--test", "matmul", "--quant", "row",
                         "--dtype", "int8", "--real",
                         "--matmul-shape", "128", "128", "128",
                         "--num-tests", "2", "--save", save])
    experiments.main()
    rows = [json.loads(l) for l in open(save)]
    assert rows and rows[0]["avg_relative_error"] < 0.05
