"""Eval-runner tests: gate-stream driver with synthetic frames, Ego4D
llm/cls sample evaluators, MCQA scorer, GPT-judge pipeline with fake judge."""
import json

import numpy as np
import pytest

from streammind_tpu.constants import IGNORE_INDEX
from streammind_tpu.eval.gpt_judge import (
    build_judge_messages,
    judge_predictions,
    parse_judge_response,
)
from streammind_tpu.eval.run_ego4d_stream import (
    eval_cls_sample,
    eval_llm_sample,
    score_caption_csv,
    write_caption_csv,
)
from streammind_tpu.eval.run_mcqa import format_mcqa_question, score_answers


class MiniTok:
    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids)


def test_eval_llm_sample_turns(rng):
    V = 16
    # two turns: tokens [5,6,2] and [7,2]; prompt positions ignored
    labels = np.array([IGNORE_INDEX, 5, 6, 2, IGNORE_INDEX, 7, 2])
    logits = rng.standard_normal((7, V)).astype(np.float32)
    # make predictions perfect for turn 2
    logits[4, :] = 0; logits[4, 7] = 10.0
    logits[5, :] = 0; logits[5, 2] = 10.0
    out = eval_llm_sample(logits, labels, MiniTok())
    assert out["lm_ppl"] > 0
    assert 0 <= out["lm_correctness"] <= 1
    assert len(out["rows"]) == 2
    # second turn predicted exactly
    assert out["rows"][1][0] == "t7 t2"


def test_eval_cls_sample():
    labels = np.array([0, 0, 1, 0, 1])
    logits = np.zeros((5, 2)); logits[:, 0] = 1
    logits[2, 1] = 5  # correct fire
    out = eval_cls_sample(logits, labels, tolerance_frames=0)
    assert out["accuracy"] == pytest.approx(4 / 5)
    assert out["time_diff"] == 0.5  # one wrong frame / 2


def test_caption_csv_roundtrip(tmp_path):
    path = str(tmp_path / "cap.csv")
    write_caption_csv(path, [("a goal", "a goal"), ("bad pred", "the truth")])
    scores = score_caption_csv(path)
    assert 0 < float(scores["BLEU-1"]) <= 100


def test_mcqa_format_and_score(tmp_path):
    q = format_mcqa_question("What?", ["apple", "B. banana"])
    assert "A. apple" in q and "B. banana" in q
    path = tmp_path / "ans.jsonl"
    rows = [
        {"pred": "A", "gt": "A", "task_type": "x"},
        {"pred": "B", "gt": "C", "task_type": "x"},
        {"pred": "C", "gt": "C", "task_type": "y"},
    ]
    path.write_text("\n".join(json.dumps(r) for r in rows))
    out = score_answers(str(path))
    assert out["accuracy"] == pytest.approx(100 * 2 / 3)
    assert out["by_task"]["y"] == 100.0


def test_gpt_judge_pipeline(tmp_path):
    msgs = build_judge_messages("q?", "truth", "guess", "correctness")
    assert msgs[0]["role"] == "system" and "factual" in msgs[0]["content"]

    assert parse_judge_response("{'pred': 'yes', 'score': 4}") == {
        "pred": "yes", "score": 4.0,
    }
    assert parse_judge_response("noise {'pred': 'no', 'score': 1} trailing")["score"] == 1.0

    calls = {"n": 0}

    def fake_judge(messages, model=None):
        calls["n"] += 1
        if calls["n"] == 1:
            return "garbage"  # force one retry
        return "{'pred': 'yes', 'score': 5}"

    preds = [
        {"id": "a", "question": "q", "answer": "x", "pred": "x"},
        {"id": "b", "question": "q", "answer": "y", "pred": "z"},
    ]
    out = judge_predictions(preds, str(tmp_path / "judge"), judge_fn=fake_judge,
                            retry_sleep=0)
    assert out["n"] == 2 and out["accuracy"] == 1.0 and out["mean_score"] == 5.0
    # cache hit on rerun: judge_fn not called again
    before = calls["n"]
    out2 = judge_predictions(preds, str(tmp_path / "judge"), judge_fn=fake_judge)
    assert calls["n"] == before and out2 == out


def test_lta_metric():
    from streammind_tpu.eval.run_ego4d_lta import (
        ed_at_k,
        edit_distance,
        parse_action_text,
        score_lta,
    )

    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert edit_distance([1, 2, 3], [1, 9, 3]) == 1
    assert edit_distance([], [1, 2]) == 2

    vv = {"take": 0, "put": 1, "stir": 2}
    nv = {"spoon": 0, "pot": 1, "cup": 2}
    verbs, nouns = parse_action_text("take spoon, stir pot", vv, nv, z=3)
    assert verbs == [0, 2, -1] and nouns == [0, 1, -1]

    # perfect candidate among K → ED 0
    preds = [["take spoon, stir pot", "put cup"]]
    out = score_lta(preds, [[0, 2]], [[0, 1]], vv, nv)
    assert out["verb_ed"] == 0.0 and out["noun_ed"] == 0.0

    # all-wrong → ED 1
    out2 = score_lta([["put cup, put cup"]], [[0, 2]], [[0, 1]], vv, nv)
    assert out2["verb_ed"] == 1.0


def test_parse_srt_and_subtitle_window(tmp_path):
    from streammind_tpu.eval.run_mcqa import parse_srt, subtitles_for_window

    srt = tmp_path / "vid.srt"
    srt.write_text(
        "1\n00:00:01,000 --> 00:00:03,000\nhello there\n\n"
        "2\n00:00:10,500 --> 00:00:12,000\nsecond line\nwrapped\n\n"
        "3\n00:01:00,000 --> 00:01:02,000\nlate line\n\n",
        encoding="utf-8",
    )
    subs = parse_srt(str(srt))
    assert subs == [
        (1000, 3000, "hello there"),
        (10500, 12000, "second line wrapped"),
        (60000, 62000, "late line"),
    ]
    # 4 frames over 8s: instants 1s,3s,5s,7s → only the first cue overlaps
    text = subtitles_for_window(subs, 8000, 4)
    assert text == "hello there"
    # whole video → all three cues
    assert subtitles_for_window(subs, 62000, 62).count("\n") == 2
    assert subtitles_for_window([], 1000, 4) == ""


def test_msvc_judge_messages():
    from streammind_tpu.eval.gpt_judge import (
        build_judge_messages,
        parse_judge_response,
    )

    msgs = build_judge_messages(
        "Describe the video.", ["a cat runs", "a kitten sprints"],
        "a cat is running", dimension="msvc_correctness",
    )
    assert "Correct Answers: ['a cat runs', 'a kitten sprints']" in msgs[1]["content"]
    assert "keys 'score'" in msgs[1]["content"]
    assert "'pred'" not in msgs[1]["content"].split("DO NOT")[0].split("keys")[1]
    # score-only responses parse with pred defaulting to 'no'
    v = parse_judge_response("{'score': 4}")
    assert v["score"] == 4.0 and v["pred"] == "no"
    # detailedness variant renders too
    msgs2 = build_judge_messages("q", ["r1"], "p", dimension="msvc_detailedness")
    assert "detailedness score" in msgs2[1]["content"]
