"""Eval datasets with hermetic fallbacks.

The reference harnesses pull WikiText-2 and MMLU from the HF hub
(reference: test_ppl.py:35, test_mmlu.py:25-28). This environment has no hub
access, so each loader tries ``datasets`` (honoring local caches /
``HF_DATASETS_OFFLINE``) and otherwise synthesizes a deterministic stand-in
marked ``synthetic=True`` in the returned metadata — the harness stays
runnable end-to-end and real data slots in transparently when present.
"""

import os
import random
import string


def _hub_reachable(timeout: float = 2.0) -> bool:
    """Fast reachability probe so hub-less environments skip the datasets
    library's multi-minute retry ladder. Honors explicit offline pins."""
    if os.environ.get("HF_DATASETS_OFFLINE") == "1" \
            or os.environ.get("HF_HUB_OFFLINE") == "1":
        return True  # let datasets resolve from its local cache
    import socket
    try:
        socket.create_connection(("huggingface.co", 443), timeout=timeout).close()
        return True
    except OSError:
        return False


def _load_dataset(*args, **kwargs):
    """load_dataset that is fast in hub-less environments: when the hub is
    unreachable, load from the LOCAL cache (offline mode) before giving up —
    an air-gapped box with a populated cache still gets real data.

    ``datasets`` resolves HF_DATASETS_OFFLINE at *import* time
    (datasets.config is populated on import), so the env var is set before
    the first import, and an explicit offline ``DownloadConfig`` covers
    processes where ``datasets`` was already imported online."""
    if _hub_reachable():
        from datasets import load_dataset
        return load_dataset(*args, **kwargs)
    os.environ.setdefault("HF_DATASETS_OFFLINE", "1")  # before first import
    import datasets
    from datasets import load_dataset
    try:  # belt and braces when datasets was imported before this call
        datasets.config.HF_DATASETS_OFFLINE = True
        kwargs.setdefault(
            "download_config",
            datasets.DownloadConfig(local_files_only=True))
    except Exception:  # noqa: BLE001 - version-dependent knobs
        pass
    return load_dataset(*args, **kwargs)


def load_wikitext(num_texts: int = 100):
    """→ (texts, synthetic). First ``num_texts`` of WikiText-2-raw test split
    (reference: test_ppl.py:35-38)."""
    try:
        ds = _load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
        return ds["text"][:num_texts], False
    except Exception:
        rng = random.Random(1234)
        words = ["the", "of", "and", "to", "in", "a", "is", "was", "for",
                 "on", "as", "with", "by", "at", "from", "city", "state",
                 "world", "time", "year", "people", "model", "system"]
        texts = []
        for _ in range(num_texts):
            n = rng.randint(50, 600)
            texts.append(" ".join(rng.choice(words) for _ in range(n)) + ".")
        return texts, True


def load_mmlu(num_samples: int = 1000, seed: int = 42):
    """→ (test_samples, dev_samples, synthetic). Samples are dicts with
    question/choices/answer; shuffled with the reference's seed
    (reference: test_mmlu.py:26-29)."""
    try:
        dataset = list(_load_dataset("cais/mmlu", "all", split="test"))
        random.seed(seed)
        random.shuffle(dataset)
        dev = list(_load_dataset("cais/mmlu", "all", split="dev"))[:5]
        return dataset[:num_samples], dev, False
    except Exception:
        rng = random.Random(seed)
        def sample(i):
            subjects = ["math", "history", "physics", "law", "biology"]
            q = f"Synthetic {rng.choice(subjects)} question {i}: which option is labeled {i % 4}?"
            choices = [f"option labeled {j}" for j in range(4)]
            return {"question": q, "choices": choices, "answer": i % 4}
        return ([sample(i) for i in range(num_samples)],
                [sample(10_000 + i) for i in range(5)], True)


def format_example(question, choices, answer):
    """5-shot prompt block (reference: test_mmlu.py:11-17)."""
    prompt = f"Question: {question}\n"
    for i, choice in enumerate(choices):
        prompt += f"{'ABCD'[i]}. {choice}\n"
    prompt += f"Answer: {answer}\n\n"
    return prompt


def build_mmlu_prompts(dataset, dev_dataset):
    """→ (prompts, answers) with the reference's exact 5-shot format
    (reference: test_mmlu.py:31-49)."""
    few_shot = "The following are multiple choice questions (with answers).\n\n"
    for ex in dev_dataset[:5]:
        few_shot += format_example(ex["question"], ex["choices"], "ABCD"[ex["answer"]])
    prompts, answers = [], []
    for ex in dataset:
        p = few_shot + format_example(ex["question"], ex["choices"], "").replace(
            "Answer: \n", "Answer:")
        prompts.append(p)
        answers.append("ABCD"[ex["answer"]])
    return prompts, answers


class SyntheticTokenizer:
    """Word-level tokenizer stand-in so the eval harnesses run without a real
    checkpoint's tokenizer files. Deterministic hash → [0, vocab) ids."""

    def __init__(self, vocab_size: int = 151936, eos_token_id: int = 151645):
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id

    def encode(self, text, add_special_tokens=False):
        toks = []
        for w in text.split():
            h = 0
            for c in w:
                h = (h * 131 + ord(c)) % (self.vocab_size - 2)
            toks.append(h + 1)
        return toks

    def decode(self, ids):
        letters = string.ascii_uppercase
        return " ".join(letters[i % 26] for i in ids)
