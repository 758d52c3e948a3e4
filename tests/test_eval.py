"""Eval metric tests: hand-computed fixtures for gate PRF / relaxed metrics,
torch cross-check for PPL, NLG sanity (perfect match == 100)."""
import numpy as np
import pytest

from streammind_tpu.eval import (
    bleu,
    calculate_metrics,
    cider,
    extract_choice_letter,
    gate_frame_metrics,
    gate_prf,
    gate_timediff,
    get_chunk,
    mcqa_accuracy,
    relaxed_correct,
    rouge_l,
    split_list,
    split_turns_by_eos,
    turn_ppl_correctness,
)


def test_gate_prf_hand_example():
    # targets 10, 30; preds 12 (in ±5 of 10), 50 (miss)
    p, r, f1 = gate_prf([10, 30], [12, 50], tolerance=5)
    assert p == 0.5 and r == 0.5 and f1 == 0.5
    # duplicate preds inside one window each count toward TP (reference quirk)
    p2, r2, f2 = gate_prf([10], [9, 11], tolerance=5)
    assert p2 == 1.0 and r2 == 1.0
    # empty predictions
    p3, r3, f3 = gate_prf([10], [], tolerance=5)
    assert (p3, r3, f3) == (0.0, 0.0, 0.0)


def test_relaxed_and_frame_metrics():
    labels = np.array([0, 0, 1, 0, 0])
    preds = np.array([0, 1, 0, 0, 0])  # fire one frame early
    m = relaxed_correct(labels, preds, 2)
    assert m.all()  # within ±2 everything matches some prediction
    out = gate_frame_metrics(labels, preds, tolerance_frames=2)
    assert out["accuracy"] > 0.99
    assert out["tpr"] > 0.99 and out["tnr"] > 0.99

    strict = gate_frame_metrics(labels, preds, tolerance_frames=0)
    assert strict["accuracy"] == pytest.approx(3 / 5, rel=1e-6)
    assert gate_timediff(labels, preds) == 1.0  # 2 wrong frames / 2


def test_turn_ppl_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((7, 11)).astype(np.float32)
    labels = rng.integers(0, 11, 7)
    ppl, corr, n = turn_ppl_correctness(logits, labels)
    expected = float(
        torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(labels)
        ).exp()
    )
    assert ppl == pytest.approx(expected, rel=1e-5)
    assert n == 7


def test_split_turns():
    labels = np.array([5, 9, 2, 7, 2, 3])
    spans = split_turns_by_eos(labels, eos_id=2)
    assert spans == [(0, 3), (3, 5)]


def test_bleu_perfect_and_partial():
    refs = {0: ["the cat sat on the mat"], 1: ["a goal was scored"]}
    hyps = {0: ["the cat sat on the mat"], 1: ["a goal was scored"]}
    scores = bleu(refs, hyps)
    assert scores[0] == pytest.approx(1.0, abs=1e-6)
    assert scores[3] == pytest.approx(1.0, abs=1e-4)

    hyps2 = {0: ["the cat sat"], 1: ["no match here at all"]}
    scores2 = bleu(refs, hyps2)
    assert 0 < scores2[0] < 1


def test_rouge_cider_and_report():
    refs = {0: ["the quick brown fox"], 1: ["jumps over the lazy dog"]}
    hyps = {0: ["the quick brown fox"], 1: ["jumps over the lazy dog"]}
    rl, _ = rouge_l(refs, hyps)
    assert rl == pytest.approx(1.0)
    cd, _ = cider(refs, hyps)
    assert cd > 0
    report = calculate_metrics(refs, hyps)
    assert float(report["BLEU-1"]) == pytest.approx(100.0, abs=0.01)
    assert float(report["ROUGE-L"]) == pytest.approx(100.0, abs=0.01)


def test_mcqa_helpers():
    assert extract_choice_letter("The best answer is C.") == "C"
    assert extract_choice_letter("(B) because ...") == "B"
    assert extract_choice_letter("this is a very long rambling response that never commits to anything definite") == ""
    lst = list(range(10))
    chunks = split_list(lst, 3)
    assert sum(chunks, []) == lst
    assert get_chunk(lst, 3, 1) == chunks[1]
    acc = mcqa_accuracy([{"pred": "A", "gt": "A"}, {"pred": "B", "gt": "C"}])
    assert acc == 50.0


def test_split_list_empty_worklist():
    """Empty corpora (or a wrong data path) must yield empty chunks, not a
    range()-step-zero ValueError in every eval CLI."""
    from streammind_tpu.eval.mcqa import get_chunk, split_list

    assert split_list([], 4) == []
    assert get_chunk([], 4, 0) == []
    assert get_chunk([1, 2], 4, 3) == []
