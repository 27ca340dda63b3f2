"""Closed-loop training regression: contrastive fine-tuning must improve
held-out retrieval on the synthetic corpus (eval/eval_training.py).

This is the end-to-end proof the training subsystem does its job:
corpus -> train/test split -> (ICT + labeled) pairs -> train -> re-index
-> held-out recall. Small scale (~1 min per objective); the committed
eval/out/training_*.json artifacts carry the full-scale numbers.
"""

import pytest

from eval.eval_training import run


@pytest.mark.parametrize("objective", ["cls", "maxsim"])
def test_training_improves_heldout_retrieval(objective):
    metrics = run(n_pages=5, steps=120, seed=0, objective=objective)
    before, after = metrics["before"], metrics["after"]
    assert metrics["loss_last"] < metrics["loss_first"]
    # strict improvement on held-out questions, with margin to spare
    # (measured at this scale: cls 0.52 -> 0.72 mrr, maxsim 0.67 -> 1.00)
    assert after["mrr"] > before["mrr"] + 0.1, (before, after)
    assert after["recall@1"] > before["recall@1"], (before, after)
    assert after["recall@7"] >= before["recall@7"], (before, after)
