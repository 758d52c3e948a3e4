"""Offline MCQA benchmark CLI (VideoMME / MVBench / EgoSchema /
Perception-Test).

Reference: eval/inference_video_mcqa_*.py — chunked inference via
x_infer(mode='mcqa') writing JSONL answers, then rule-based scoring
(eval_video_mcqa_*.py).  One driver handles all four via --benchmark
(dataset JSON schemas differ only in field names).
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Iterator, List

from .mcqa import extract_choice_letter, get_chunk, mcqa_accuracy, mcqa_accuracy_by_task

_FIELDS = {
    # benchmark: (video_key, question_key, options_key, answer_key, task_key)
    "videomme": ("videoID", "question", "options", "answer", "task_type"),
    "mvbench": ("video", "question", "candidates", "answer", "task_type"),
    "egoschema": ("q_uid", "question", "options", "answer", None),
    "perception": ("video_id", "question", "options", "answer_id", "task"),
}


def format_mcqa_question(question: str, options: List[str]) -> str:
    letters = "ABCDEFGH"
    lines = [question]
    for i, opt in enumerate(options):
        prefix = f"{letters[i]}." if not opt.strip().startswith(f"{letters[i]}.") else ""
        lines.append(f"{prefix} {opt.strip()}" if prefix else opt.strip())
    return "\n".join(lines)


def run_inference(model, tokenizer, records: List[Dict], benchmark: str,
                  video_root: str, processor, num_frames: int = 8) -> Iterator[Dict]:
    from ..api import x_infer

    vkey, qkey, okey, akey, tkey = _FIELDS[benchmark]
    for rec in records:
        video_path = os.path.join(video_root, str(rec[vkey]))
        if not os.path.splitext(video_path)[1]:
            video_path += ".mp4"
        try:
            video = processor(video_path)
        except Exception as e:  # noqa: BLE001
            yield {**rec, "pred": "", "error": str(e)}
            continue
        question = format_mcqa_question(rec[qkey], rec.get(okey, []))
        response = x_infer(video, question, model, tokenizer, mode="mcqa")
        yield {
            "question_id": rec.get("question_id", rec.get(vkey)),
            "task_type": rec.get(tkey) if tkey else None,
            "pred": extract_choice_letter(response),
            "gt": str(rec.get(akey, "")).strip()[:1].upper(),
            "response": response,
        }


def score_answers(path: str) -> Dict:
    records = [json.loads(line) for line in open(path)]
    records = [r for r in records if r.get("pred") is not None]
    out = {"accuracy": mcqa_accuracy(records)}
    if any(r.get("task_type") for r in records):
        out["by_task"] = mcqa_accuracy_by_task(
            [r for r in records if r.get("task_type")]
        )
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--benchmark", choices=list(_FIELDS), required=True)
    parser.add_argument("--question-file", required=True)
    parser.add_argument("--video-root", required=True)
    parser.add_argument("--answer-file", required=True)
    parser.add_argument("--num-frames", type=int, default=8)
    parser.add_argument("--num-chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", type=int, default=0)
    parser.add_argument("--score-only", action="store_true")
    args = parser.parse_args()

    if args.score_only:
        print(json.dumps(score_answers(args.answer_file), indent=2))
        return

    from ..api import model_init

    model, processor, tokenizer, _ = model_init(args.model_path)
    with open(args.question_file) as f:
        data = json.load(f)
    records = data if isinstance(data, list) else data.get("questions", data)
    records = get_chunk(records, args.num_chunks, args.chunk_idx)

    os.makedirs(os.path.dirname(args.answer_file) or ".", exist_ok=True)
    with open(args.answer_file, "w") as out:
        for row in run_inference(
            model, tokenizer, records, args.benchmark, args.video_root,
            processor, args.num_frames,
        ):
            out.write(json.dumps(row) + "\n")
    print(json.dumps(score_answers(args.answer_file), indent=2))


if __name__ == "__main__":
    main()
