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


@pytest.fixture(scope="module")
def baseline_ppl(tiny_checkpoint):
    import test_ppl
    return test_ppl.main(model_path=tiny_checkpoint, num_texts=4)["ppl"]


# The reference REPORT validates every quant config as a fake/real pair
# (reference: REPORT.md:62-127): the fake (quant-dequant in bf16) run is the
# numeric oracle the real (low-bit storage + quantized matmul) run must
# match. Grid: 3 granularities x int8/fp8, per-group at 3 group sizes
# (16/32/64 on the tiny 64/128-wide model, standing in for the reference's
# 64/128/256 on the 0.6B model).
_QUANT_GRID = [
    ("per_tensor", None), ("per_row", None),
    ("per_group", 16), ("per_group", 32), ("per_group", 64),
]


@pytest.mark.parametrize("ldtype", ["int8", "fp8"])
@pytest.mark.parametrize("quant_type,gs", _QUANT_GRID)
def test_fake_vs_real_ppl_grid(tiny_checkpoint, baseline_ppl, quant_type, gs, ldtype):
    """Engine-level fake-vs-real cross-check per granularity x dtype: the
    real low-bit path's PPL must track its fake-quant oracle within a tight
    bound (weight-only: same rounded weights, only storage/matmul precision
    differs; per-row W8A8 adds dynamic activation quant → looser), and both
    must stay near the bf16 baseline on the tiny model."""
    import test_ppl
    import jax.numpy as jnp
    from functools import partial
    from nanovllm_tpu.ops import quantization as q
    dtype = q.storage_dtype(ldtype)
    fake_fn = {
        "per_tensor": partial(q.fake_per_tensor_quant, dtype=dtype),
        "per_row": partial(q.fake_per_row_quant, dtype=dtype),
        "per_group": partial(q.fake_per_group_quant, group_size=gs or 128,
                             dtype=dtype),
    }[quant_type]
    real = test_ppl.main(model_path=tiny_checkpoint, num_texts=4,
                         quant_kwargs={"quant_type": quant_type,
                                       "group_size": gs or 128,
                                       "linear_dtype": ldtype})["ppl"]
    fake = test_ppl.main(model_path=tiny_checkpoint, num_texts=4,
                         quant_kwargs={"weight_quant_fn": fake_fn})["ppl"]
    tol = 0.05 if quant_type == "per_row" else 0.02
    assert abs(real - fake) / fake < tol, (real, fake)
    assert abs(real - baseline_ppl) / baseline_ppl < 0.10, (real, baseline_ppl)
    assert abs(fake - baseline_ppl) / baseline_ppl < 0.10, (fake, baseline_ppl)


def test_mmlu_harness_runs(tiny_checkpoint):
    import test_mmlu
    r = test_mmlu.main(model_path=tiny_checkpoint, num_samples=4)
    assert r["total"] == 4 and 0.0 <= r["accuracy"] <= 100.0


def test_experiment_results_resume(tmp_path):
    from experiments import ExperimentResults
    path = tmp_path / "results.jsonl"
    er = ExperimentResults(path)
    # harness-shaped rows: _base_result always carries kv_dtype (argparse
    # default "auto")
    er.save_or_update({"test": "mmlu", "real": True, "quant": "row",
                       "dtype": "int8", "group_size": None,
                       "kv_dtype": "auto", "accuracy": 50.0})
    er.save_or_update({"test": "mmlu", "real": True, "quant": "row",
                       "dtype": "int8", "group_size": None,
                       "kv_dtype": "auto", "accuracy": 51.0})
    er.save_or_update({"test": "ppl", "real": False, "quant": "", "dtype": "bf16",
                       "group_size": None, "kv_dtype": "auto", "ppl": 33.0})
    # dedup by config key: 2 rows, the mmlu one updated in place
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(rows) == 2
    assert {r["test"]: r for r in rows}["mmlu"]["accuracy"] == 51.0
    er2 = ExperimentResults(path)
    # a default probe (kv_dtype defaulting to "auto") matches a default row
    assert er2.exists("mmlu", True, "row", "int8", None)
    assert not er2.exists("mmlu", True, "tensor", "int8", None)
    assert er2.exists("mmlu", True, "row", "int8", None, kv_dtype="auto")
    assert not er2.exists("mmlu", True, "row", "int8", None, kv_dtype="int4")


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
