#!/bin/bash
# Experiment grid driver (port of reference experiments.sh): quality, error,
# and throughput sweeps across quant schemes x dtypes x group sizes.
# Results accumulate (resumably) in JSONL files via experiments.py.

# --- quality: MMLU 5-shot ------------------------------------------------
python experiments.py --test mmlu
python experiments.py --test mmlu --quant tensor --dtype int8
python experiments.py --test mmlu --quant row --dtype int8
python experiments.py --test mmlu --quant group --group-size 64 --dtype int8
python experiments.py --test mmlu --quant group --group-size 128 --dtype int8
python experiments.py --test mmlu --quant group --group-size 256 --dtype int8
python experiments.py --test mmlu --quant group --group-size 512 --dtype int8
python experiments.py --test mmlu --quant tensor --dtype fp8
python experiments.py --test mmlu --quant row --dtype fp8
python experiments.py --test mmlu --quant group --group-size 64 --dtype fp8
python experiments.py --test mmlu --quant group --group-size 128 --dtype fp8
python experiments.py --test mmlu --quant group --group-size 256 --dtype fp8
python experiments.py --test mmlu --quant group --group-size 512 --dtype fp8

python experiments.py --test mmlu --quant tensor --dtype int8 --real
python experiments.py --test mmlu --quant row --dtype int8 --real
python experiments.py --test mmlu --quant group --group-size 64 --dtype int8 --real
python experiments.py --test mmlu --quant group --group-size 128 --dtype int8 --real
python experiments.py --test mmlu --quant group --group-size 256 --dtype int8 --real
python experiments.py --test mmlu --quant group --group-size 512 --dtype int8 --real
python experiments.py --test mmlu --quant tensor --dtype fp8 --real
python experiments.py --test mmlu --quant row --dtype fp8 --real
python experiments.py --test mmlu --quant group --group-size 64 --dtype fp8 --real
python experiments.py --test mmlu --quant group --group-size 128 --dtype fp8 --real
python experiments.py --test mmlu --quant group --group-size 256 --dtype fp8 --real
python experiments.py --test mmlu --quant group --group-size 512 --dtype fp8 --real

python experiments.py --test mmlu --quant smooth --dtype int8 --real
python experiments.py --test mmlu --quant smooth --dtype fp8 --real

# --- quality: WikiText-2 PPL --------------------------------------------
python experiments.py --test ppl
python experiments.py --test ppl --quant tensor --dtype int8
python experiments.py --test ppl --quant row --dtype int8
python experiments.py --test ppl --quant group --group-size 64 --dtype int8
python experiments.py --test ppl --quant group --group-size 128 --dtype int8
python experiments.py --test ppl --quant group --group-size 256 --dtype int8
python experiments.py --test ppl --quant group --group-size 512 --dtype int8
python experiments.py --test ppl --quant tensor --dtype fp8
python experiments.py --test ppl --quant row --dtype fp8
python experiments.py --test ppl --quant group --group-size 64 --dtype fp8
python experiments.py --test ppl --quant group --group-size 128 --dtype fp8
python experiments.py --test ppl --quant group --group-size 256 --dtype fp8
python experiments.py --test ppl --quant group --group-size 512 --dtype fp8

python experiments.py --test ppl --quant tensor --dtype int8 --real
python experiments.py --test ppl --quant row --dtype int8 --real
python experiments.py --test ppl --quant group --group-size 64 --dtype int8 --real
python experiments.py --test ppl --quant group --group-size 128 --dtype int8 --real
python experiments.py --test ppl --quant group --group-size 256 --dtype int8 --real
python experiments.py --test ppl --quant group --group-size 512 --dtype int8 --real
python experiments.py --test ppl --quant tensor --dtype fp8 --real
python experiments.py --test ppl --quant row --dtype fp8 --real
python experiments.py --test ppl --quant group --group-size 64 --dtype fp8 --real
python experiments.py --test ppl --quant group --group-size 128 --dtype fp8 --real
python experiments.py --test ppl --quant group --group-size 256 --dtype fp8 --real
python experiments.py --test ppl --quant group --group-size 512 --dtype fp8 --real

python experiments.py --test ppl --quant smooth --dtype int8 --real
python experiments.py --test ppl --quant smooth --dtype fp8 --real

# --- matmul numeric error ------------------------------------------------
python experiments.py --test matmul --matmul-shape 2048 2048 2048 --save matmul_results.jsonl
python experiments.py --test matmul --quant tensor --dtype int8 --matmul-shape 2048 2048 2048 --save matmul_results.jsonl
python experiments.py --test matmul --quant row --dtype int8 --matmul-shape 2048 2048 2048 --save matmul_results.jsonl
python experiments.py --test matmul --quant row --dtype int8 --real --matmul-shape 2048 2048 2048 --save matmul_results.jsonl
python experiments.py --test matmul --quant group --group-size 128 --dtype int8 --real --matmul-shape 2048 2048 2048 --save matmul_results.jsonl
python experiments.py --test matmul --quant tensor --dtype fp8 --matmul-shape 2048 2048 2048 --save matmul_results.jsonl
python experiments.py --test matmul --quant row --dtype fp8 --real --matmul-shape 2048 2048 2048 --save matmul_results.jsonl
python experiments.py --test matmul --quant group --group-size 128 --dtype fp8 --real --matmul-shape 2048 2048 2048 --save matmul_results.jsonl

# --- throughput ----------------------------------------------------------
python experiments.py --test throughput --save throughput_results.jsonl
python experiments.py --test throughput --quant row --dtype int8 --real --save throughput_results.jsonl
python experiments.py --test throughput --quant row --dtype fp8 --real --save throughput_results.jsonl
python experiments.py --test throughput --quant tensor --dtype int8 --real --save throughput_results.jsonl
python experiments.py --test throughput --quant group --group-size 128 --dtype int8 --real --save throughput_results.jsonl
